from . import quantization, dsp  # noqa: F401
