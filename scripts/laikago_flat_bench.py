"""Dense-contact (laikago C=1454) chunked-flat adjudication (VERDICT
round-4 #3).

Round 4's flat contact layout was capped at FLAT_MAX_C=320, so the
flagship laikago train cell stayed on the per-body fori_loop backward
transpose (1.94M env-steps/sec vs quad 4.5M / human 5.2M). The CHUNKED
flat variant (pallas_soa.FLAT_CHUNK_C uniform ref-indexed chunks)
removes that cap; this measures it against the loop layout on the
laikago train (fwd+bwd) cells at both rates, plus forward-rollout
controls, with the round-4 bench methodology (bench.py subprocess per
cell). Appends one JSON line per cell.

Usage: python scripts/laikago_flat_bench.py \
           --out docs/results/round5/laikago_flat_bench.jsonl
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (mode, interval, envs, layout)
CELLS = [
    ("train", "33", "1024", "flat"),
    ("train", "33", "1024", "loop"),
    ("train", "83", "1024", "flat"),
    ("train", "83", "1024", "loop"),
    ("rollout", "33", "4096", "flat"),
    ("rollout", "33", "4096", "loop"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default="docs/results/round5/laikago_flat_bench.jsonl"
    )
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    for mode, iv, envs, layout in CELLS:
        env = dict(os.environ)
        env.update(
            PPR_BENCH_MODE=mode, PPR_BENCH_ENGINE="soa",
            PPR_BENCH_INTERVAL=iv, PPR_BENCH_ENVS=envs,
            PPR_BENCH_PROFILE="0", PPR_SOA_CONTACT_LAYOUT=layout,
        )
        tag = dict(
            template="laikago", mode=mode, interval=int(iv),
            envs=int(envs), layout=layout,
        )
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
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
