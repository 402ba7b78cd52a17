/* C ABI for the TPU-native video codec framework.
 *
 * Semantic mirror of the reference's encoder contract
 * (video_codec/VideoCodecApi.h: CreateVideoEncoder/DestroyVideoEncoder plus
 * the 6-method VideoEncoder lifecycle, EncoderRetCode 0x00-0x0A) and decoder
 * contract (video_decoder/include/VideoDecoder.h) expressed as C functions
 * over opaque handles, so C/C++ callers of the reference can switch by
 * relinking. The implementation embeds the Python/JAX runtime.
 */

#ifndef MEDIA_TPU_VIDEO_CODEC_API_H_
#define MEDIA_TPU_VIDEO_CODEC_API_H_

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
  VIDEO_ENCODER_SUCCESS = 0x00,
  VIDEO_ENCODER_CREATE_FAIL = 0x01,
  VIDEO_ENCODER_INIT_FAIL = 0x02,
  VIDEO_ENCODER_START_FAIL = 0x03,
  VIDEO_ENCODER_ENCODE_FAIL = 0x04,
  VIDEO_ENCODER_STOP_FAIL = 0x05,
  VIDEO_ENCODER_DESTROY_FAIL = 0x06,
  VIDEO_ENCODER_RESET_FAIL = 0x07,
  VIDEO_ENCODER_NOT_INITED = 0x08,
  VIDEO_ENCODER_INVALID_PARAM = 0x09,
  VIDEO_ENCODER_UNSUPPORTED = 0x0A,
} MtpuEncoderRetCode;

typedef struct MtpuVideoEncoder MtpuVideoEncoder; /* opaque */

/* Factory honoring the ro.vmi.demo.video.encode.format selection, like the
 * reference's CreateVideoEncoder (VideoCodecApi.cpp:21-38). Returns NULL on
 * failure. */
MtpuVideoEncoder* CreateVideoEncoder(void);
MtpuEncoderRetCode DestroyVideoEncoder(MtpuVideoEncoder* enc);

/* Session configuration (the property-store analog; call before Init). */
MtpuEncoderRetCode MtpuEncoderSetParam(MtpuVideoEncoder* enc, const char* key,
                                       const char* value);

MtpuEncoderRetCode InitEncoder(MtpuVideoEncoder* enc);
MtpuEncoderRetCode StartEncoder(MtpuVideoEncoder* enc);
/* Output buffer is owned by the encoder and valid until the next
 * EncodeOneFrame call, matching the reference's aliasing contract. */
MtpuEncoderRetCode EncodeOneFrame(MtpuVideoEncoder* enc, const uint8_t* in,
                                  uint32_t in_len, uint8_t** out,
                                  uint32_t* out_len);
MtpuEncoderRetCode StopEncoder(MtpuVideoEncoder* enc);
MtpuEncoderRetCode ResetEncoder(MtpuVideoEncoder* enc);

#ifdef __cplusplus
}
#endif

#endif /* MEDIA_TPU_VIDEO_CODEC_API_H_ */
