from .wav import WAVDecoder, parse_wav  # noqa: F401
