#!/bin/bash
# Build the reference esp-audio-libs (read-only at $REF) as a host shared
# library + C shim, used only as a differential-test oracle by tests/.
# -ffp-contract=off: keep pure IEEE single-op float semantics so the oracle
# is deterministic and matched by order-preserving XLA elementwise code.
set -euo pipefail
REF="${REF:-/root/reference}"
OUT_DIR="$(dirname "$0")/../../build"
mkdir -p "$OUT_DIR"
OUT="$OUT_DIR/liboracle.so"

if [ -f "$OUT" ] && [ "$OUT" -nt "$(dirname "$0")/oracle_shim.cpp" ]; then
  echo "$OUT up to date"
  exit 0
fi

SRCS=(
  "$REF/src/quantization_utils.cpp"
  "$REF/src/memory_utils.cpp"
  "$REF/src/decode/wav_decoder.cpp"
  "$REF/src/decode/mp3_decoder.cpp"
  "$REF/src/decode/flac/flac_decoder.cpp"
  "$REF/src/decode/flac/flac_lpc.cpp"
  "$REF/src/decode/flac/flac_crc.cpp"
  "$REF/src/resample/art_resampler.cpp"
  "$REF/src/resample/art_biquad.cpp"
  "$REF/src/resample/resampler.cpp"
  "$REF/src/dsp/dsps_dotprod_f32_ansi.c"
  "$REF/src/dsp/dsps_biquad_f32_ansi.c"
  "$REF/src/dsp/dsps_add_s16_ansi.c"
  "$REF/src/dsp/dsps_mulc_s16_ansi.c"
  "$(dirname "$0")/oracle_shim.cpp"
)

# -include cstdint: mp3_decoder.h uses uint32_t without including <cstdint>
# on non-ESP hosts.
g++ -O2 -fPIC -shared -std=c++11 -ffp-contract=off \
  -include cstdint \
  -I"$REF/include" -I"$REF/src" \
  "${SRCS[@]}" -o "$OUT"
echo "built $OUT"
