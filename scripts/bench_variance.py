#!/usr/bin/env python
"""Run `bench.py` N times in fresh processes and report the spread —
the evidence for variance-margin claims (VERDICT r4: a 10 FPS target
cleared only on the favorable side of run-to-run variance is not
reliably met). Fresh processes matter: each run draws new input noise
(the TPU relay memoizes identical computations) and pays its own
compile/cache state.

Usage: python scripts/bench_variance.py [--runs 3] [--mode dynamic]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--mode", default="dynamic",
                    choices=["dynamic", "static"])
    ap.add_argument("--eval", action="store_true")
    args = ap.parse_args()

    vals = []
    for r in range(args.runs):
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               f"--{args.mode}"] + (["--eval"] if args.eval else [])
        out = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=REPO)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(f"[variance] run {r}: no JSON line "
                  f"(rc={out.returncode}); stderr tail:",
                  file=sys.stderr)
            print("\n".join(out.stderr.splitlines()[-5:]),
                  file=sys.stderr)
            continue
        v = json.loads(line[-1])["value"]
        vals.append(v)
        print(f"[variance] run {r}: {v}", file=sys.stderr)
    if vals:
        print(json.dumps({
            "mode": args.mode, "eval": bool(args.eval), "runs": vals,
            "min": min(vals), "max": max(vals),
            "mean": round(sum(vals) / len(vals), 3),
        }))


if __name__ == "__main__":
    main()
