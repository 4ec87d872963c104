"""The committed MP3 ``independent`` conformance corpus, hermetically.

corpus/independent_mp3/ holds the MP3 inputs NOT authored by this repo's
primary generator path (VERDICT r3 "what's missing", the MP3 counterpart of
corpus/independent/): structural mutants — frame reorders, main-data bit
flips, ancillary junk, cross-stream transplants and splices — that the
REFERENCE decoder accepted at generation time (tools/mp3mut.py), each with
frame-for-frame parity (error codes, consumed bytes, PCM) asserted against
the reference before commit.

MP3 frames carry no embedded MD5, so hermeticity comes from a sidecar:
``signatures.json`` pins the SHA256 of the oracle-verified PCM plus the
per-frame error/consumed ladder.  Decoding here and matching the signature
verifies byte parity against PCM the reference produced without the
reference being mounted; the conformance runner re-checks the live
differential wherever it is mounted (examples/test_mp3_decoder.py,
``independent`` category).
"""

import hashlib
import json
from pathlib import Path

import numpy as np
import pytest

from tests.test_mp3_decode import our_decode

CORPUS = Path(__file__).resolve().parent.parent / "corpus" / "independent_mp3"
FILES = sorted(CORPUS.glob("*.mp3")) if CORPUS.is_dir() else []
SIGS = (json.loads((CORPUS / "signatures.json").read_text())
        if (CORPUS / "signatures.json").exists() else {})

MAX_FRAMES = 64


def test_corpus_present_and_sized():
    """>= 10 files, every mutator family represented, every file signed."""
    assert len(FILES) >= 10, f"independent_mp3 has only {len(FILES)} files"
    names = {f.name for f in FILES}
    for family in ("mut_swap_frames", "mut_flip_maindata",
                   "mut_ancillary_junk", "mut_splice_streams"):
        assert any(n.startswith(family) for n in names), family
    assert names <= set(SIGS), sorted(names - set(SIGS))


@pytest.mark.parametrize("path", FILES, ids=lambda p: p.name)
def test_independent_mp3_signature(path):
    sig = SIGS[path.name]
    h = hashlib.sha256()
    errs, consumed, n_pcm = [], [], 0
    for err, pcm, c, _d in our_decode(path.read_bytes(), MAX_FRAMES):
        errs.append(int(err))
        consumed.append(int(c))
        if err == 0 and pcm is not None:
            h.update(np.asarray(pcm, dtype="<i2").tobytes())
            n_pcm += len(pcm)
    assert errs == sig["frame_errs"], f"{path.name}: error ladder differs"
    assert consumed == sig["frame_consumed"]
    assert n_pcm == sig["pcm_samples"] and n_pcm > 0
    assert h.hexdigest() == sig["pcm_sha256"], (
        f"{path.name}: PCM does not match the oracle-anchored signature")
