"""media_tpu — a TPU-native H.264/H.265 video codec framework.

Built from scratch in JAX/XLA/Pallas with a C++ entropy/runtime core, providing
the capabilities of the kunpengcompute/media adaptation layer (see SURVEY.md):
encoder/decoder lifecycle APIs, runtime parameter reconfiguration, forced
keyframes, flush/resume, backpressure and resolution-change handling — with the
codec compute (motion estimation, intra prediction, integer transform +
quantization, deblocking, CAVLC entropy coding, rate control) implemented as
TPU kernels rather than delegated to vendor libraries.

Layout:
  core/      bitstream I/O, NAL, H.264 syntax (SPS/PPS/slice), config store, log
  ops/       JAX + Pallas codec math (transform, intra, ME, MC, deblock)
  entropy/   CAVLC encode/decode (Python reference + native C++ packer)
  pipeline/  frame encoder/decoder graphs, rate control, GOP/DPB management
  api/       VideoEncoder/VideoDecoder lifecycle contracts (reference parity)
  parallel/  device mesh, MB-row tile sharding, halo exchange, GOP dispatch
"""

__version__ = "0.1.0"
