#!/bin/bash
# Round-5 batch-frontier sweep (VERDICT items 2 and 6):
#  - quant (qpack) inference frontier at B=24/32/48 — the old "32 OOMs"
#    note predates qpack removing the float+int8 double residency;
#  - train-step frontier at B=24/32 (retry with LASS_TPU_REMAT=wide on OOM).
# One TPU process at a time; results appended as JSON lines to $OUT.
set -u
OUT=${OUT:-/tmp/sweep_r05.jsonl}
: > "$OUT"
cd /root/repo

run() {
  local tag="$1"; shift
  echo "=== $tag : $* ===" >&2
  local line
  line=$(env "$@" timeout 3000 python bench.py 2>/tmp/sweep_r05_err.log | tail -1)
  local rc=$?
  if [ $rc -ne 0 ] || [ -z "$line" ]; then
    echo "{\"tag\": \"$tag\", \"error\": \"rc=$rc\"}" >> "$OUT"
    tail -5 /tmp/sweep_r05_err.log >&2
    return 1
  fi
  echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
}

# inference + train at each batch (BENCH_SUSTAIN=0: sustained measured
# separately after the loop.py work lands)
for B in 24 32; do
  if ! run "b$B" BENCH_BATCH=$B BENCH_SUSTAIN=0 BENCH_ITERS=50; then
    run "b${B}_rematwide" BENCH_BATCH=$B BENCH_SUSTAIN=0 BENCH_ITERS=50 \
        LASS_TPU_REMAT=wide
  fi
done
# B=48: expected-OOM probe, inference only
run "b48_fwd" BENCH_BATCH=48 BENCH_SUSTAIN=0 BENCH_TRAIN=0 BENCH_ITERS=50 || true
# train-only at 24/32 WITH remat=wide for the frontier comparison (only if
# the no-remat run above succeeded, so we see both sides)
run "b24_train_rematwide" BENCH_BATCH=24 BENCH_SUSTAIN=0 BENCH_ITERS=50 \
    BENCH_QUANT=0 LASS_TPU_REMAT=wide || true
echo "SWEEP DONE" >&2
