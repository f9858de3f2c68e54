"""Profiled train-cell sweep: busy-frac + env scaling (round 5).

Two questions the committed train artifacts cannot answer:

1. What actually binds the train (fwd+bwd) cells? Every committed train
   row ran with PPR_BENCH_PROFILE=0, so its `bound` field fell through
   to an unprofiled guess (bench.py now labels that case honestly).
   This sweep runs with the profiler ON, so `device_busy_frac` is a
   real trace measurement: busy ~1 means in-kernel serialization (like
   the rollout); busy well below 1 means inter-kernel gaps (the
   per-interval fwd/bwd kernel chain leaves the device idle between
   launches) — a different, and differently fixable, bound.

2. Does the laikago train cell cross 3M env-steps/sec at larger env
   counts? The grid rows are all 1024-env; more envs = more grid steps
   per kernel launch, amortizing whatever per-launch overhead the
   busy-frac reveals.

Usage: python scripts/train_profile_bench.py \
           --out docs/results/round5/train_profile_bench.jsonl
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (template, interval, envs)
CELLS = [
    ("laikago", "33", "1024"),
    ("laikago", "33", "2048"),
    ("laikago", "33", "4096"),
    ("laikago", "83", "1024"),
    ("laikago", "83", "2048"),
    ("quad", "33", "1024"),
    ("quad", "33", "2048"),
    ("human", "33", "1024"),
    ("human", "33", "2048"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default="docs/results/round5/train_profile_bench.jsonl"
    )
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    for tpl, iv, envs in CELLS:
        env = dict(os.environ)
        env.update(
            PPR_BENCH_MODE="train", PPR_BENCH_ENGINE="soa",
            PPR_BENCH_INTERVAL=iv, PPR_BENCH_ENVS=envs,
            PPR_BENCH_PROFILE="1",
        )
        if tpl != "laikago":
            env["PPR_URDF"] = (
                "/root/reference/data/urdf_templates/%s.urdf" % tpl
            )
        tag = dict(template=tpl, interval=int(iv), envs_swept=int(envs))
        try:
            r = subprocess.run(
                [sys.executable, "bench.py"], cwd=REPO, env=env,
                capture_output=True, text=True, timeout=2400,
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            row = json.loads(line) if line.startswith("{") else {
                "error": (r.stderr or "no output")[-300:], "rc": r.returncode}
        except Exception as e:
            row = {"error": repr(e)[:300]}
        row.update(tag)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        d = row.get("detail", {})
        print(json.dumps(dict(
            template=tpl, interval=int(iv), envs=int(envs),
            value=row.get("value"), busy=d.get("device_busy_frac"),
            bound=d.get("bound"), error=row.get("error"),
        )))


if __name__ == "__main__":
    main()
