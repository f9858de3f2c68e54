#!/bin/bash
# 24 Hz recipe end-to-end (VERDICT round-3 #2): the shipped defaults
# (--eval_selection + 24 Hz noise 6e-3) x --num_seeds 5 on the two 24 Hz
# sequences, published next to the pre-recipe floors (sidesteps 0.486,
# turn 0.649 — docs/24hz_adjudication.md).
set -u
# Hold gate: lets an operator slot a short job (e.g. a serve_bench retry)
# onto the chip between the queue's quad bench and this multi-hour run.
while [ -f /tmp/hold_recipe ]; do sleep 20; done
OUT=${1:-docs/results/round4}
mkdir -p "$OUT"
cd /root/repo

for seq in mi-sidesteps mi-turn; do
  LOG=/tmp/ppr_recipe_$seq
  rm -rf "$LOG"
  echo "== recipe run: $seq x 5 seeds =="
  timeout 9000 python main.py --seqname $seq --logname r4 --logroot "$LOG" \
      --num_seeds 5 --norender_vis > "$OUT/recipe_$seq.log" 2>&1
  echo "rc=$? ($seq)"
  grep -E "seed [0-9]+: eval traj|multi-seed selection|best checkpoint" \
      "$OUT/recipe_$seq.log" | tail -12
done

python scripts/recipe_summarize.py --out "$OUT/recipe_summary.json" \
    "$OUT/recipe_mi-sidesteps.log" "$OUT/recipe_mi-turn.log"
