#!/bin/sh
# Build the reference Delta-Rice codec (read-only at $DELTARICE_REFERENCE,
# default /root/reference) into .golden/libdeltarice_ref.so for use as a
# bit-exactness test oracle. Built out-of-tree; nothing is copied into the
# repo and no artifacts are committed (.golden/ is gitignored).
set -e
REF="${DELTARICE_REFERENCE:-/root/reference}"
HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
OUT="$REPO/.golden"
mkdir -p "$OUT"
gcc -O2 -fPIC -shared -fopenmp \
    -I "$HERE/hdf5_stub" -I "$REF/src" \
    "$REF/src/deltaRice.c" "$HERE/harness.c" \
    -o "$OUT/libdeltarice_ref.so"
echo "built $OUT/libdeltarice_ref.so"
