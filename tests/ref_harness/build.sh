#!/bin/sh
# Build the ACTUAL reference goldrush-path (sources compiled directly from
# /root/reference, which is mounted read-only) against the shim headers in
# shims/ (btllib/sdsl/sparsehash stand-ins written for this environment; see
# each header for the exact API contract it reproduces).
#
# The resulting binary is the parity oracle for tests/test_ref_parity.py:
# run single-threaded (OMP_NUM_THREADS=1) its output is fully deterministic.
#
# Usage: sh build.sh [outdir]   (default outdir: /tmp/goldref)
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference/goldrush_path}
OUT=${1:-/tmp/goldref}
mkdir -p "$OUT"
g++ -O2 -std=c++17 -fopenmp \
  -I "$HERE/shims" -I "$REF" -I "$REF/Common" \
  -include iomanip -include limits -include random -include algorithm \
  "$REF/goldrush_path.cpp" \
  "$REF/read_hashing.cpp" \
  "$REF/opt.cpp" \
  "$REF/spaced_seeds.cpp" \
  "$REF/calc_phred_average.cpp" \
  -o "$OUT/goldrush-path-ref" -lpthread
g++ -O2 -std=c++17 \
  -I "$HERE/shims" -I "$REF" \
  -include limits -include algorithm \
  "$HERE/hash_dump.cpp" \
  -o "$OUT/hash_dump"
echo "built $OUT/goldrush-path-ref and $OUT/hash_dump"
