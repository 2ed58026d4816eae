#!/bin/bash
# Round-4 A/B matrix v2: clean reruns (v1 was contaminated by concurrent CPU
# compile load) + calibrated-width variants.  Timeout 1200s per entry.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/ab2_r4.jsonl}
ITERS=${ITERS:-30}
: > "$OUT"
run() {
  local name="$1"; shift
  echo "=== $(date +%H:%M:%S) $name : $* ===" >&2
  local res
  res=$(env EGONN_BENCH_ITERS=$ITERS "$@" timeout 1200 python bench.py 2>/tmp/ab2_stderr.log)
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"name\": \"$name\", \"rc\": $rc}" >> "$OUT"
  else
    echo "{\"name\": \"$name\", \"env\": \"$*\", \"result\": $res}" >> "$OUT"
  fi
  tail -1 "$OUT" >&2
}
run baseline30          EGONN_DUMMY=0
run calib_down          EGONN_BAND_CALIB=/tmp/bands_bench_down.json
run calib_full          EGONN_BAND_CALIB=/tmp/bands_bench.json
run fuse_bn_off         EGONN_FUSE_BN=0
run banded_dw_off       EGONN_BANDED_DW=0
run conv_pack_wsel      EGONN_CONV_PACK=1 EGONN_CONV_PACK_MODE=wsel
run conv_pack_wcat      EGONN_CONV_PACK=1 EGONN_CONV_PACK_MODE=wcat
run stem_lut            EGONN_STEM_LUT=1
run batch16             EGONN_BENCH_BATCH=16
run batch16_calib_down  EGONN_BENCH_BATCH=16 EGONN_BAND_CALIB=/tmp/bands_bench_down.json
run inv_scatter30       EGONN_INV_SCATTER=1
run psort_reshape       EGONN_PSORT=1 EGONN_PSORT_CE=reshape
echo "DONE" >> "$OUT"
