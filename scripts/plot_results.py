#!/usr/bin/env python
"""Aggregate + plot evaluation CSVs — the role of the reference's analysis
notebooks (`notebooks/StaticAndDynamicDepthAnalysis.ipynb`,
`notebooks/Voxel GC Stats.ipynb`): per-frame depth accuracy across the
delta_max sweep and map-memory/decay-savings curves, read from the
config-encoded CSV names both frameworks emit.

Usage:
  python scripts/plot_results.py --csv_dir /tmp/run06/csv --out /tmp/plots
"""

import argparse
import glob
import os
import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd


def accuracy_frame(df: pd.DataFrame, source: str = "fusion") -> pd.DataFrame:
    """Per-delta accuracy (correct / (total - missing)) averaged over
    frames, from a unified/static/dynamic depth-result CSV."""
    deltas = sorted(
        {
            float(m.group(1))
            for c in df.columns
            for m in [re.match(rf"{source}-total-([0-9.]+)$", c)]
            if m
        }
    )
    rows = []
    for d in deltas:
        tot = df[f"{source}-total-{d:.2f}"].to_numpy(float)
        miss = df[f"{source}-missing-{d:.2f}"].to_numpy(float)
        cor = df[f"{source}-correct-{d:.2f}"].to_numpy(float)
        # pool counts over frames (a frame with nothing present — e.g. the
        # first, before any fusion — must not drag the average to zero)
        denom = max((tot - miss).sum(), 1.0)
        rows.append({"delta_max": d, "accuracy": float(cor.sum() / denom)})
    return pd.DataFrame(rows)


def plot_depth_accuracy(csv_path: str, out_dir: str) -> str:
    df = pd.read_csv(csv_path)
    fig, ax = plt.subplots(figsize=(6, 4))
    for source, style in (("fusion", "-o"), ("input", "--s")):
        acc = accuracy_frame(df, source)
        if len(acc):
            ax.plot(acc.delta_max, acc.accuracy, style, label=source)
    ax.set_xlabel("delta_max (px)")
    ax.set_ylabel("accuracy (correct / present)")
    ax.set_ylim(0, 1.02)
    ax.grid(alpha=0.3)
    ax.legend()
    ax.set_title(os.path.basename(csv_path)[:60])
    out = os.path.join(
        out_dir, os.path.basename(csv_path).replace(".csv", ".png")
    )
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    return out


def plot_memory(csv_path: str, out_dir: str) -> str:
    df = pd.read_csv(csv_path)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(df.frame_id, df.memory_usage_bytes / 1e6, label="map MB")
    ax.plot(df.frame_id, df.saved_memory_cum_bytes / 1e6,
            label="decay saved MB (cum)")
    ax.set_xlabel("frame")
    ax.set_ylabel("MB")
    ax.grid(alpha=0.3)
    ax.legend()
    ax.set_title(os.path.basename(csv_path)[:60])
    out = os.path.join(
        out_dir, os.path.basename(csv_path).replace(".csv", ".png")
    )
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv_dir", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_dir = args.out or os.path.join(args.csv_dir, "plots")
    os.makedirs(out_dir, exist_ok=True)

    made = []
    for p in sorted(glob.glob(os.path.join(args.csv_dir, "*depth-result.csv"))):
        try:
            made.append(plot_depth_accuracy(p, out_dir))
        except Exception as e:
            print(f"[plot] skipping {p}: {e}", file=sys.stderr)
    for p in sorted(glob.glob(os.path.join(args.csv_dir, "*-memory.csv"))):
        try:
            made.append(plot_memory(p, out_dir))
        except Exception as e:
            print(f"[plot] skipping {p}: {e}", file=sys.stderr)
    for m in made:
        print("[plot] wrote", m)
    if not made:
        print("[plot] no CSVs found in", args.csv_dir, file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
