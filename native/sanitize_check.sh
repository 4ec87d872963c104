#!/bin/bash
# Build the host front-ends + fuzz driver under AddressSanitizer/UBSan and
# run the deterministic parse fuzz (SURVEY.md §5 sanitizers row). Any
# sanitizer report aborts with nonzero status. Pass corpus files as args
# (e.g. build/flac_corpus/subset/*.flac) for valid-stream + truncation
# coverage on top of the builtin garbage fuzz.
set -euo pipefail
DIR="$(cd "$(dirname "$0")" && pwd)"
OUT_DIR="$DIR/../build"
mkdir -p "$OUT_DIR"

# ensure generated tables exist (same fallback logic as build_host.sh)
if [ ! -f "$OUT_DIR/mp3_tables.h" ] || [ ! -f "$OUT_DIR/mp3_huff.h" ]; then
  bash "$DIR/build_host.sh" >/dev/null
fi

BIN="$OUT_DIR/sanitize_driver"
g++ -g -O1 -std=c++17 -ffp-contract=off \
  -fsanitize=address,undefined -fno-sanitize-recover=all \
  -fno-omit-frame-pointer \
  "$DIR"/src/flac_frontend.cpp "$DIR"/src/mp3_frontend.cpp \
  "$DIR"/sanitize_driver.cpp -o "$BIN"

ASAN_OPTIONS=detect_leaks=1 UBSAN_OPTIONS=print_stacktrace=1 "$BIN" "$@"
echo "sanitize check: PASS"
