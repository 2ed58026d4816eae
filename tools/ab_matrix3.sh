#!/bin/bash
# Round-4 A/B matrix v3: tunnel-resilient. Each entry runs bench.py with
# EGONN_BENCH_REQUIRE_TPU=1 (aborts fast instead of falling back to CPU when
# the tunnel probe fails) and is retried on later passes until it produces a
# TPU number. Already-successful entries are skipped, so the script is safe
# to re-run after an outage.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/ab3_r4.jsonl}
ITERS=${ITERS:-30}
MAX_PASSES=${MAX_PASSES:-6}
touch "$OUT"

run() {
  local name="$1"; shift
  if grep -q "\"name\": \"$name\", \"env\"" "$OUT"; then return 0; fi
  echo "=== $(date +%H:%M:%S) $name : $* ===" >&2
  local res rc
  res=$(env EGONN_BENCH_ITERS=$ITERS EGONN_BENCH_REQUIRE_TPU=1 "$@" \
        timeout 900 python bench.py 2>/tmp/ab3_stderr.log)
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "retry-later: $name rc=$rc" >&2
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
import jax.numpy as j; print('ok')" >/dev/null 2>&1
}

for pass in $(seq 1 "$MAX_PASSES"); do
  echo "=== pass $pass ===" >&2
  if ! probe; then
    echo "tunnel down at pass $pass; sleeping 180s" >&2
    sleep 180
    continue
  fi
  fail=0
  run baseline        EGONN_DUMMY=0                                   || fail=1
  run nocalib         EGONN_BENCH_CALIB=0                             || fail=1
  run fuse_bn_off     EGONN_FUSE_BN=0                                 || fail=1
  run banded_dw_off   EGONN_BANDED_DW=0                               || fail=1
  run batch16         EGONN_BENCH_BATCH=16                            || fail=1
  run batch32         EGONN_BENCH_BATCH=32                            || fail=1
  [ $fail -eq 0 ] && break
done
echo "DONE" >> "$OUT"
