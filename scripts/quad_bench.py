"""Quad-class kernel cell adjudication (VERDICT round-3 #4).

Measures the quad and human train (fwd+bwd) cells at 1024 envs with the
round-3 bench methodology (bench.py, PPR_URDF/PPR_BENCH_*), comparing
the NEW flat contact layout against the round-3 per-body loop and the
XLA scan, at 60 Hz and 24 Hz. Appends one JSON line per cell.

Usage: python scripts/quad_bench.py --out docs/results/round4/quad_bench.jsonl
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELLS = []
for tpl in ("quad", "human"):
    for iv in ("33", "83"):
        for eng, layout in (
            ("soa", "flat"), ("soa", "loop"), ("xla", "-"),
        ):
            CELLS.append((tpl, iv, eng, layout))
# the laikago control cells: flat must NOT have been auto-selected
# (C=1454 > FLAT_MAX_C) and throughput must hold the round-3 level
CELLS.append(("laikago", "33", "soa", "auto"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results/round4/quad_bench.jsonl")
    ap.add_argument("--envs", default="1024")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    for tpl, iv, eng, layout in CELLS:
        env = dict(os.environ)
        env.update(
            PPR_BENCH_MODE="train", PPR_BENCH_ENGINE=eng,
            PPR_BENCH_INTERVAL=iv, PPR_BENCH_ENVS=args.envs,
            PPR_BENCH_PROFILE="0",
        )
        if tpl != "laikago":
            env["PPR_URDF"] = (
                "/root/reference/data/urdf_templates/%s.urdf" % tpl)
        if layout not in ("-", "auto"):
            env["PPR_SOA_CONTACT_LAYOUT"] = layout
        tag = dict(template=tpl, interval=int(iv), engine=eng, layout=layout)
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
        print(json.dumps({k: row.get(k) for k in
                          ("template", "interval", "engine", "layout",
                           "value", "error")}))


if __name__ == "__main__":
    main()
