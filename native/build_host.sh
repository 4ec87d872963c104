#!/bin/bash
# Build the framework's native host library (libeal_host.so).
# -ffp-contract=off keeps pure IEEE f32 op order so host math matches the
# device's order-preserving kernels and the reference's numerics.
set -euo pipefail
DIR="$(cd "$(dirname "$0")" && pwd)"
OUT_DIR="$DIR/../build"
mkdir -p "$OUT_DIR"
OUT="$OUT_DIR/libeal_host.so"

newest_src=$(ls -t "$DIR"/src/*.cpp | head -1)
if [ -f "$OUT" ] && [ "$OUT" -nt "$newest_src" ]; then
  echo "$OUT up to date"
  exit 0
fi

# the MP3 front-end needs the ISO constant tables extracted as a header,
# plus the project's own Huffman node tables generated from them.  When the
# reference source isn't present (CI runners), use the vendored copies in
# native/gen/ (same generated artifacts, committed).
REF="${REF:-/root/reference}"
if [ ! -f "$OUT_DIR/mp3_tables.h" ]; then
  if [ -d "$REF/src" ]; then
    python3 "$DIR/../tools/extract_mp3_tables.py"
  else
    cp "$DIR/gen/mp3_tables.h" "$DIR/gen/mp3_tables.npz" "$OUT_DIR/"
  fi
fi
if [ ! -f "$OUT_DIR/mp3_huff.h" ] || [ "$DIR/../tools/gen_huffman_tables.py" -nt "$OUT_DIR/mp3_huff.h" ]; then
  if [ -f "$OUT_DIR/mp3_tables.npz" ]; then
    python3 "$DIR/../tools/gen_huffman_tables.py"
  else
    cp "$DIR/gen/mp3_huff.h" "$DIR/gen/mp3_huff.npz" "$OUT_DIR/"
  fi
fi

# -O3: autovectorizes the residual min/max + narrowing copies and the
# packers; float semantics stay pinned by -ffp-contract=off (no fast-math)
g++ -O3 -fPIC -shared -std=c++17 -ffp-contract=off -Wall -pthread \
  "$DIR"/src/*.cpp -o "$OUT"
echo "built $OUT"
