"""Debug-mode numeric checks (SURVEY.md §5 sanitizers row, device side).

The integer codec paths are bit-exact by construction and pinned by the
differential suites, and the host parsers run under ASan/UBSan
(native/sanitize_check.sh).  The f32 resampler path is the one place
NaN/Inf can propagate silently — from pathological inputs (a NaN landing
in a PCM float buffer upstream) or a framework regression.  This module
wraps any jittable stage in ``jax.experimental.checkify`` so float errors
(NaN/Inf producing ops, div-by-zero) and out-of-bounds indexing raise on
the host instead of flowing into the output.

Opt-in by design: the checks add guard ops to the compiled program, so
production serving runs unchecked and a debugging session wraps the same
function with ``checked``.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import checkify

__all__ = ["checked", "checked_call"]

_ERRORS = checkify.float_checks | checkify.index_checks


def checked(fn, errors=None):
    """Wrap a jittable ``fn`` so float/index faults raise ``checkify.JaxRuntimeError``.

    Returns a callable with the same signature; the checkified program is
    jitted and cached like any other jit.
    """
    cf = jax.jit(checkify.checkify(fn, errors=errors or _ERRORS))

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cf(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def checked_call(fn, *args, errors=None):
    """One-shot ``checked(fn)(*args)``."""
    return checked(fn, errors=errors)(*args)
