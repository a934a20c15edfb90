#!/bin/sh
# Build the reference jpegqs binaries (oracle for differential tests) directly
# from the read-only reference tree into the gitignored .ref/ directory.
# The scalar (SIMD=none) build is the bit-exactness ground truth
# (reference Makefile:35-36 sets -DNO_SIMD for SIMD=none).
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-$(dirname "$0")/../.ref}
mkdir -p "$OUT"
CFLAGS="-Wall -O2 -fopenmp"
if [ ! -x "$OUT/jpegqs_scalar" ] || [ "$REF/quantsmooth.h" -nt "$OUT/jpegqs_scalar" ]; then
  gcc $CFLAGS -DNO_SIMD -DAPPNAME=jpegqs_scalar -o "$OUT/jpegqs_scalar" "$REF/quantsmooth.c" -ljpeg -lm
fi
if [ ! -x "$OUT/jpegqs_native" ] || [ "$REF/quantsmooth.h" -nt "$OUT/jpegqs_native" ]; then
  gcc $CFLAGS -march=native -mtune=native -DAPPNAME=jpegqs_native -o "$OUT/jpegqs_native" "$REF/quantsmooth.c" -ljpeg -lm
fi
HARNESS="$(dirname "$0")/progress_harness.c"
if [ ! -x "$OUT/progress_harness" ] || [ "$HARNESS" -nt "$OUT/progress_harness" ]; then
  gcc $CFLAGS -DNO_SIMD -DQS_HEADER="\"$REF/quantsmooth.h\"" -o "$OUT/progress_harness" "$HARNESS" -ljpeg -lm
fi
# -DPRECISE_PROGRESS build (per-row progress, quantsmooth.h:2632-2665);
# built WITHOUT OpenMP so the row order (and hence the trace and any
# mid-iteration cancel point) is deterministic
if [ ! -x "$OUT/progress_harness_precise" ] || [ "$HARNESS" -nt "$OUT/progress_harness_precise" ]; then
  gcc -Wall -O2 -DNO_SIMD -DPRECISE_PROGRESS -DQS_HEADER="\"$REF/quantsmooth.h\"" -o "$OUT/progress_harness_precise" "$HARNESS" -ljpeg -lm
fi
echo "reference oracles built in $OUT"
