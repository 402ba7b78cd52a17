"""Return-code contracts, mirroring the reference ABIs.

EncoderRetCode: video_codec/VideoCodecApi.h:8-20 (0x00-0x0A).
DecoderRetCode: video_decoder/include/VideoDecoder.h:10-26, including the
backpressure codes (WRITE_OVERFLOW / READ_UNDERFLOW), BAD_PIC_SIZE and EOS.
"""

import enum


class EncoderRetCode(enum.IntEnum):
    VIDEO_ENCODER_SUCCESS = 0x00
    VIDEO_ENCODER_CREATE_FAIL = 0x01
    VIDEO_ENCODER_INIT_FAIL = 0x02
    VIDEO_ENCODER_START_FAIL = 0x03
    VIDEO_ENCODER_ENCODE_FAIL = 0x04
    VIDEO_ENCODER_STOP_FAIL = 0x05
    VIDEO_ENCODER_DESTROY_FAIL = 0x06
    VIDEO_ENCODER_RESET_FAIL = 0x07
    VIDEO_ENCODER_NOT_INITED = 0x08
    VIDEO_ENCODER_INVALID_PARAM = 0x09
    VIDEO_ENCODER_UNSUPPORTED = 0x0A


class DecoderRetCode(enum.IntEnum):
    VIDEO_DECODER_SUCCESS = 0x00
    VIDEO_DECODER_CREATE_FAIL = 0x01
    VIDEO_DECODER_INIT_FAIL = 0x02
    VIDEO_DECODER_START_FAIL = 0x03
    VIDEO_DECODER_DECODE_FAIL = 0x04
    VIDEO_DECODER_STOP_FAIL = 0x05
    VIDEO_DECODER_DESTROY_FAIL = 0x06
    VIDEO_DECODER_NOT_INITED = 0x07
    VIDEO_DECODER_INVALID_PARAM = 0x08
    VIDEO_DECODER_UNSUPPORTED = 0x09
    VIDEO_DECODER_WRITE_OVERFLOW = 0x0A
    VIDEO_DECODER_READ_UNDERFLOW = 0x0B
    VIDEO_DECODER_BAD_PIC_SIZE = 0x0C
    VIDEO_DECODER_EOS = 0x0D


class DecoderEvent(enum.IntEnum):
    """Event indices for the decoder event callback (VideoDecoder.h:51-62)."""

    INDEX_PIC_INFO_CHANGE = 0x01
    INDEX_ERROR = 0x02
    INDEX_EOS = 0x03


class PixelFormat(enum.IntEnum):
    """Decoder output pixel formats (VideoDecoder.h:38-48 subset)."""

    YUV420P = 0
    NV12 = 1


class CodecFormat(enum.IntEnum):
    H264 = 0
    H265 = 1
