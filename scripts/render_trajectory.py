#!/usr/bin/env python3
"""Plot / animate a saved swarm trajectory — the headless replacement for the
reference's live ``env.render()`` windows (reference test_model.py:40,
flocking_gym_test.py:25,33).

Consumes the ``.npz`` written by ``evaluate.py --save-trajectory`` or
``scripts/smoke_env.py --save`` (keys: ``x`` (T, N, 4) = [px, py, vx, vy],
``reward`` (T,)).

    python scripts/render_trajectory.py traj.npz out.png      # summary figure
    python scripts/render_trajectory.py traj.npz out.gif      # animation
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def summary_figure(x: np.ndarray, reward: np.ndarray, out: str) -> None:
    """Three panels: start/end positions+velocities, traces, reward curve."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 5))

    for ax, t, title in ((axes[0], 0, "t = 0"),
                         (axes[1], len(x) - 1, f"t = {len(x) - 1}")):
        ax.quiver(x[t, :, 0], x[t, :, 1], x[t, :, 2], x[t, :, 3],
                  angles="xy", scale_units="xy", scale=8.0, width=0.004,
                  color="#4053d3")
        ax.plot(x[: t + 1, :, 0], x[: t + 1, :, 1],
                color="#b5b5b5", lw=0.3, zorder=0)
        ax.set_title(title)
        ax.set_aspect("equal")

    axes[2].plot(np.arange(len(reward)), reward, color="#4053d3")
    axes[2].set_xlabel("step")
    axes[2].set_ylabel("reward")
    axes[2].set_title(f"episode reward = {reward.sum():.2f}")

    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def animation(x: np.ndarray, out: str, stride: int, fps: int) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    frames = x[::stride]
    lo = frames[..., 0:2].reshape(-1, 2).min(axis=0) - 1.0
    hi = frames[..., 0:2].reshape(-1, 2).max(axis=0) + 1.0

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.set_xlim(lo[0], hi[0])
    ax.set_ylim(lo[1], hi[1])
    ax.set_aspect("equal")
    q = ax.quiver(frames[0, :, 0], frames[0, :, 1],
                  frames[0, :, 2], frames[0, :, 3],
                  angles="xy", scale_units="xy", scale=8.0, width=0.004,
                  color="#4053d3")

    def update(i):
        q.set_offsets(frames[i, :, 0:2])
        q.set_UVC(frames[i, :, 2], frames[i, :, 3])
        ax.set_title(f"step {i * stride}")
        return (q,)

    anim = FuncAnimation(fig, update, frames=len(frames))
    anim.save(out, writer=PillowWriter(fps=fps))
    print(f"wrote {out} ({len(frames)} frames)")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trajectory", help=".npz with x (T,N,4) and reward (T,)")
    ap.add_argument("out", help="output image (.png) or animation (.gif)")
    ap.add_argument("--stride", type=int, default=5,
                    help="animation frame stride (default 5)")
    ap.add_argument("--fps", type=int, default=20)
    args = ap.parse_args(argv)

    with np.load(args.trajectory) as z:
        x, reward = z["x"], z["reward"]
    if args.out.endswith(".gif"):
        animation(x, args.out, args.stride, args.fps)
    else:
        summary_figure(x, reward, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
