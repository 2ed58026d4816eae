#!/bin/bash
# Round-5 continuation A/B: serving-batch sweep on the lidar workload at the
# final defaults (center-identity + capacity calibration), plus the capacity
# margin.  Batch was last swept in round 4 on the LEGACY workload (overflowing
# capacities); the lidar workload changes the balance.  Same tunnel-resilient
# methodology as ab_matrix3.sh: fresh process per cell, REQUIRE_TPU aborts on
# probe failure, retried across passes.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/ab_r5b.jsonl}
ITERS=${ITERS:-30}
MAX_PASSES=${MAX_PASSES:-6}
touch "$OUT"

run() {
  local name="$1"; shift
  if grep -q "\"name\": \"$name\", \"env\"" "$OUT"; then return 0; fi
  echo "=== $(date +%H:%M:%S) $name : $* ===" >&2
  local res rc
  # NOTE: every "$@" element must be a VAR=val assignment — env treats the
  # first non-assignment word as the command to exec (a bare "true" would
  # swallow the whole bench invocation and "succeed" with empty output)
  res=$(env EGONN_BENCH_ITERS=$ITERS EGONN_BENCH_REQUIRE_TPU=1 "$@" \
        timeout 900 python bench.py 2>/tmp/ab_r5b_stderr.log)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$res" ]; then
    echo "retry-later: $name rc=$rc ($(tail -1 /tmp/ab_r5b_stderr.log))" >&2
    sleep 30
    return 1
  fi
  echo "{\"name\": \"$name\", \"env\": \"$*\", \"result\": $res}" >> "$OUT"
  tail -1 "$OUT" >&2
  return 0
}

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; \
jax.jit(lambda a: a@a)(jnp.ones((128,128))).block_until_ready(); \
print('ok')" >/dev/null 2>&1
}

for pass in $(seq 1 "$MAX_PASSES"); do
  echo "=== pass $pass ===" >&2
  if ! probe; then
    echo "probe failed; sleeping 60" >&2
    sleep 60
    continue
  fi
  run base_b8 EGONN_BENCH_BATCH=8
  run batch16 EGONN_BENCH_BATCH=16
  run batch32 EGONN_BENCH_BATCH=32
  run margin105 EGONN_CAPCALIB_MARGIN=1.05
  run batch16_m105 EGONN_BENCH_BATCH=16 EGONN_CAPCALIB_MARGIN=1.05
  run base_b8_rep2 EGONN_BENCH_BATCH=8
  n=$(wc -l < "$OUT")
  if [ "$n" -ge 6 ]; then echo "all cells done" >&2; break; fi
done
cat "$OUT"
