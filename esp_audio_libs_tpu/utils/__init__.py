from .errors import (  # noqa: F401
    WAVDecoderResult,
    WAVDecoderState,
    FLACDecoderResult,
    MP3Error,
)
