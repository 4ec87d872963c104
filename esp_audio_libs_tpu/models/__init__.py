from .wav import WAVDecoder, parse_wav  # noqa: F401

__all__ = ["WAVDecoder", "parse_wav", "FLACDecoder", "MP3Decoder",
           "BatchedFLACDecoder", "BatchedMP3Decoder", "Resampler",
           "BatchedResample"]


def __getattr__(name):
    # heavier decoders import jax/native libs; load lazily
    if name in ("FLACDecoder",):
        from .flac import FLACDecoder
        return FLACDecoder
    if name in ("MP3Decoder",):
        from .mp3 import MP3Decoder
        return MP3Decoder
    if name in ("BatchedFLACDecoder", "BatchedMP3Decoder"):
        from . import batch
        return getattr(batch, name)
    if name == "Resampler":
        from .resampler import Resampler
        return Resampler
    if name == "BatchedResample":
        from .art_resampler import BatchedResample
        return BatchedResample
    raise AttributeError(name)
