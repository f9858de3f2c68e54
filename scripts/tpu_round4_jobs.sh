#!/bin/bash
# Round-4 TPU job queue, fired by scripts/tpu_watch.py when the tunnel
# returns. Priority order = VERDICT round-3 "Next round" list. Every job
# is bounded by `timeout` and appends to docs/results/round4/.
# Jobs re-probe cheaply between stages so a mid-queue tunnel death skips
# the rest instead of hanging.
set -u
cd /root/repo
OUT=docs/results/round4
mkdir -p $OUT
LOG=/tmp/tpu_jobs.log
exec >>$LOG 2>&1

stamp() { date +%H:%M:%S; }
alive() { timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

echo "== $(stamp) round-4 TPU job queue start =="

# ---- 1. on-chip grad parity (VERDICT #1: closes the interpret-only hole)
if [ -f scripts/tpu_verify.py ] && [ ! -f $OUT/tpu_verify.json ]; then
  echo "-- $(stamp) tpu_verify"
  timeout 3600 python scripts/tpu_verify.py --out $OUT/tpu_verify.json
  echo "rc=$?"
fi
alive || { echo "tunnel died; abort"; exit 1; }

# ---- 2. bench grid with profiling on (device_busy_frac archived)
if [ ! -f $OUT/bench_grid.jsonl ]; then
  echo "-- $(stamp) bench grid"
  # mode engine interval etile envs  (etile 0 = auto, envs "" = default 4096)
  for cfg in \
    "rollout soa 33 128 4096" \
    "rollout soa 33 256 4096" \
    "rollout soa 33 512 4096" \
    "train soa 33 0 1024" \
    "train xla 33 0 1024" \
    "train soa 83 0 1024" \
    "train xla 83 0 1024" \
    "train soa 33 0 4096" \
  ; do
    set -- $cfg
    MODE=$1 ENG=$2 IV=$3 ET=$4 NE=$5
    echo "   cfg: mode=$MODE engine=$ENG interval=$IV etile=$ET envs=$NE"
    J=$(PPR_BENCH_MODE=$MODE PPR_BENCH_ENGINE=$ENG PPR_BENCH_INTERVAL=$IV \
        PPR_BENCH_ETILE=$ET PPR_BENCH_ENVS=$NE \
        PPR_BENCH_PROFILE=1 timeout 2400 python bench.py 2>/tmp/bench_err.txt)
    rc=$?
    if [ $rc -eq 0 ] && [ -n "$J" ]; then
      echo "$J" >> $OUT/bench_grid.jsonl
    else
      echo "   FAILED rc=$rc"; tail -3 /tmp/bench_err.txt
      alive || { echo "tunnel died; abort"; exit 1; }
    fi
  done
fi
alive || { echo "tunnel died; abort"; exit 1; }

# ---- 3. serving retune at auto tiles (VERDICT #3)
if [ -f scripts/serve_bench.py ] && [ ! -f $OUT/serve_bench.jsonl ]; then
  echo "-- $(stamp) serve bench"
  timeout 3600 python scripts/serve_bench.py --out $OUT/serve_bench.jsonl
  echo "rc=$?"
fi
alive || { echo "tunnel died; abort"; exit 1; }

# ---- 3b. full-sequence eval cost: padded-soa vs xla (VERDICT #6)
if [ -f scripts/eval_bench.py ] && [ ! -f $OUT/eval_bench.jsonl ]; then
  echo "-- $(stamp) eval bench"
  timeout 3600 python scripts/eval_bench.py --out $OUT/eval_bench.jsonl
  echo "rc=$?"
fi
alive || { echo "tunnel died; abort"; exit 1; }

# ---- 4. quad-class kernel cell (VERDICT #4) — after restructure lands
if [ -f scripts/quad_bench.py ] && [ ! -f $OUT/quad_bench.jsonl ]; then
  echo "-- $(stamp) quad bench"
  timeout 3600 python scripts/quad_bench.py --out $OUT/quad_bench.jsonl
  echo "rc=$?"
fi
alive || { echo "tunnel died; abort"; exit 1; }

# ---- 5. 24 Hz recipe end-to-end (VERDICT #2) — the long one, last
if [ -f scripts/recipe_run.sh ] && [ ! -f $OUT/recipe_done ]; then
  echo "-- $(stamp) 24 Hz recipe runs"
  if timeout 21600 bash scripts/recipe_run.sh $OUT; then
    touch $OUT/recipe_done
  else
    echo "recipe runs failed rc=$?"
  fi
fi

echo "== $(stamp) round-4 TPU job queue done =="
