#!/bin/bash
# Round-4 on-chip A/B matrix (VERDICT item 1).  Each row: env overrides -> bench.py.
# Results appended as JSONL to $OUT (one {"name":..., "env":..., "result":...} per line).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/ab_r4.jsonl}
ITERS=${ITERS:-30}
: > "$OUT"

run() {
  local name="$1"; shift
  echo "=== $name : $* ===" >&2
  local res
  res=$(env EGONN_BENCH_ITERS=$ITERS "$@" timeout 600 python bench.py 2>/tmp/ab_stderr.log)
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"name\": \"$name\", \"rc\": $rc, \"stderr\": \"$(tail -1 /tmp/ab_stderr.log | tr '"' "'" )\"}" >> "$OUT"
  else
    echo "{\"name\": \"$name\", \"env\": \"$*\", \"result\": $res}" >> "$OUT"
  fi
  tail -1 "$OUT" >&2
}

run baseline            EGONN_DUMMY=0
run psort_reshape       EGONN_PSORT=1 EGONN_PSORT_CE=reshape
run psort_roll          EGONN_PSORT=1 EGONN_PSORT_CE=roll
run inv_scatter         EGONN_INV_SCATTER=1
run conv_pack_wsel      EGONN_CONV_PACK=1 EGONN_CONV_PACK_MODE=wsel
run fuse_bn_off         EGONN_FUSE_BN=0
run stem_lut            EGONN_STEM_LUT=1
run banded_dw_off       EGONN_BANDED_DW=0
# combos (filled per winners; run the plausible best-case stack now)
run psort_inv           EGONN_PSORT=1 EGONN_PSORT_CE=reshape EGONN_INV_SCATTER=1
run psort_inv_pack      EGONN_PSORT=1 EGONN_PSORT_CE=reshape EGONN_INV_SCATTER=1 EGONN_CONV_PACK=1
run batch16             EGONN_BENCH_BATCH=16
run batch16_psort_inv   EGONN_BENCH_BATCH=16 EGONN_PSORT=1 EGONN_INV_SCATTER=1
echo "DONE" >> "$OUT"
