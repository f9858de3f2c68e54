"""Summarize 24 Hz recipe logs into one JSON artifact (VERDICT #2).

Parses main.py multi-seed output: per-seed best full-sequence eval
scores and the final selection, alongside the pre-recipe floors from
docs/24hz_adjudication.md for direct comparison.
"""

import argparse
import json
import re

PRE_RECIPE = {"mi-sidesteps": 0.486, "mi-turn": 0.649}


def parse_log(path):
    seeds = {}
    selected = None
    with open(path) as f:
        for line in f:
            m = re.search(r"seed (\d+): eval traj ([\d.]+|n/a)", line)
            if m and m.group(2) != "n/a":
                seeds[int(m.group(1))] = float(m.group(2))
            m = re.search(
                r"multi-seed selection: best seed (\d+) \(eval traj ([\d.]+)",
                line,
            )
            if m:
                selected = {"seed": int(m.group(1)), "score": float(m.group(2))}
    return seeds, selected


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("logs", nargs="+")
    args = ap.parse_args()

    out = {}
    for path in args.logs:
        seq = None
        for k in PRE_RECIPE:
            if k in path:
                seq = k
        seeds, selected = parse_log(path)
        vals = sorted(seeds.values())
        out[seq or path] = {
            "per_seed_best_eval": seeds,
            "selected": selected,
            "seed_spread": (
                round(vals[-1] / vals[0], 2) if len(vals) > 1 and vals[0] > 0
                else None
            ),
            "pre_recipe_floor": PRE_RECIPE.get(seq),
            "recipe_vs_floor": (
                round(selected["score"] / PRE_RECIPE[seq], 3)
                if selected and seq in PRE_RECIPE else None
            ),
        }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
