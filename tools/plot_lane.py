#!/usr/bin/env python
"""Plot learning curves straight from committed lane logs.

The TensorBoard event files under runs/ are wiped by host reboots; the
training lanes' stdout logs (runs_mujoco/*.log) are git-tracked and carry
every printed window (`update=... global_step=N episodic_return=X` for the
PPO-family trainers, `pool_step=... global_step=N episodic_return=X` for
the host-loop DQN/C51 trainers).  This tool parses those lines and renders
the per-algorithm curve panels the docs pages embed — the lane log IS the
provenance, so the plot is reproducible from the repo alone.

    python tools/plot_lane.py --out docs/rl-algorithms/img/brick_value.png \
        --title "BRICK value learning" --ylabel "score/episode" \
        runs_mujoco/c51_brick_s1.log:C51 runs_mujoco/dqn_brick_s1.log:DQN

Mirrors the reference's docs convention of a curve panel per benchmark
table (reference docs/rl-algorithms/td3.md:126-216) without its wandb
dependency.
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmtrl_tpu.utils.plot import smooth

def line_re(field):
    return re.compile(
        rf"global_step=(\d+)\s.*?{re.escape(field)}=(-?[\d.]+|nan)"
    )


SEGMENT_RE = re.compile(r"^=== segment attempt=\d+ done=(\d+) ")


def parse_log(path, field="episodic_return"):
    steps, rets = [], []
    pat = line_re(field)
    offset = 0
    with open(path, errors="replace") as f:
        for line in f:
            seg = SEGMENT_RE.match(line)
            if seg:
                # Reboot-proof lanes restart global_step per segment; the
                # ledger header carries the cumulative offset.
                offset = int(seg.group(1))
                continue
            m = pat.search(line)
            if not m or m.group(2) == "nan":
                continue
            steps.append(offset + int(m.group(1)))
            rets.append(float(m.group(2)))
    if not steps:
        raise SystemExit(f"no curve lines found in {path}")
    # Non-ledger resumed lanes restart global_step logging mid-file with no
    # header; a stable sort keeps the curve reading left-to-right.
    steps = np.asarray(steps)
    rets = np.asarray(rets)
    order = np.argsort(steps, kind="stable")
    return steps[order], rets[order], offset > 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("series", nargs="+", help="log.log:Label entries")
    ap.add_argument("--out", required=True)
    ap.add_argument("--title", default="")
    ap.add_argument("--ylabel", default="episodic return")
    ap.add_argument("--smooth", type=float, default=0.9)
    ap.add_argument("--field", default="episodic_return",
                    help="log field to plot (episodic_return, kills, score)")
    ap.add_argument("--hline", type=float, default=None,
                    help="reference band to draw (e.g. a published mean)")
    ap.add_argument("--hline-label", default="reference")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # Fixed-order categorical slots (pre-validated CVD-safe palette); series
    # are assigned in order, never cycled — keep panels to <= 4 series.
    palette = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
    fig, ax = plt.subplots(figsize=(6.4, 4.0), dpi=120)
    any_resumed = False
    for i, entry in enumerate(args.series):
        path, _, label = entry.partition(":")
        steps, rets, resumed = parse_log(path, args.field)
        any_resumed = any_resumed or resumed
        label = label or os.path.basename(path).removesuffix(".log")
        color = palette[i % len(palette)]
        ax.plot(steps, smooth(rets, args.smooth), linewidth=1.8,
                label=label, color=color)
        ax.plot(steps, rets, alpha=0.15, linewidth=0.8, color=color)
    if args.hline is not None:
        ax.axhline(args.hline, linestyle="--", color="gray", linewidth=1.0,
                   label=args.hline_label)
    ax.set_xlabel(
        "global step"
        + (
            # The ledger's done= counts the last PRINTED step of the prior
            # segment; the checkpoint actually restored can be up to one
            # save interval older, so resumed curves may overlap slightly.
            " (cumulative across resume segments; \u2264 1 save-interval overlap)"
            if any_resumed
            else ""
        )
    )
    ax.set_ylabel(args.ylabel)
    if args.title:
        ax.set_title(args.title)
    ax.legend(fontsize=8)
    ax.grid(alpha=0.25)
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
