"""esp-audio-libs-tpu: TPU-native batched audio preprocessing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`kahrendt/esp-audio-libs` (C++11 audio stack for ESP32: FLAC decode, Helix MP3
decode, WAV parsing, windowed-sinc resampling, biquad filters, quantization
utilities).  Where the reference decodes ONE stream on ONE microcontroller
core, this framework decodes THOUSANDS of PCM streams as batched tensor
programs on TPU: entropy/bitstream work runs in native host code, all numeric
work (LPC synthesis, IMDCT, polyphase filterbanks, IIR filters, quantization)
runs as batched XLA/Pallas kernels sharded over a device mesh.

Subpackages
-----------
- ``ops``      device kernels (Pallas + jnp): quantization, biquad, polyphase
               resampling, FLAC LPC, MP3 dequant/IMDCT/subband, dsp primitives
- ``models``   user-facing codec pipelines mirroring the reference's public
               API semantics (reference: ``include/*.h``)
- ``parallel`` mesh construction and batch sharding (`jax.sharding`/pjit)
- ``utils``    result enums, buffer pools, host helpers
"""

__version__ = "0.1.0"

from . import ops, models, parallel, utils  # noqa: F401
