#!/usr/bin/env python3
"""Experiment-grid generator (reference cfg/make_config.py as a real CLI).

Appends a cross-product of sweep sections to a default cfg, reproducing the
reference's grids (reference cfg/make_config.py:26-37):

    python cfg/make_config.py vel            # k x v_max grid -> cfg/vel.cfg
    python cfg/make_config.py n --baseline   # centralized x n_agents grid
    python cfg/make_config.py hidden_size    # n_layers x hidden_size grid

One INI section per grid point: section name ``[v1, v2]``, body overriding
just the swept keys; ``header`` lists the swept columns so train.py's CSV
output is self-describing (reference train.py:56-60).
"""

from __future__ import annotations

import argparse
import itertools
import os

HERE = os.path.dirname(os.path.abspath(__file__))

# Reference sweep grids (cfg/make_config.py:28-37).
SWEEPS = {
    "vel": {"v_max": [0.5, 1.5, 2.5, 3.5, 4.5]},
    "rad": {"comm_radius": [3.0, 2.5, 2.0, 1.5, 1.0]},
    "n": {"n_agents": [25, 50, 75, 100, 125, 150, 175, 200]},
    "dt": {"dt": [0.1, 0.075, 0.05, 0.025, 0.01, 0.0075]},
    "hidden_size": {"n_layers": [1, 2, 3, 4],
                    "hidden_size": [4, 8, 16, 32, 64, 128]},
}


def build_grid(param: str, baseline: bool) -> dict:
    sweep = dict(SWEEPS[param])
    if baseline:
        # baseline sweeps cross the expert's information model instead of K
        return {"centralized": ["True", "False"], **sweep}
    if param == "hidden_size":
        # depth x width grid (reference hidden_size.cfg); K fixed by default
        return sweep
    return {"k": [1, 2, 3, 4], **sweep}


def generate(param: str, baseline: bool, default_cfg=None, out=None) -> str:
    default_cfg = default_cfg or os.path.join(
        HERE, "default_baseline.cfg" if baseline else "default.cfg"
    )
    out = out or os.path.join(
        HERE, f"{param}_baseline.cfg" if baseline else f"{param}.cfg"
    )
    grid = build_grid(param, baseline)

    with open(default_cfg) as f:
        text = f.read()
    lines = [text, "", f"header = {', '.join(grid)}, reward", ""]
    for values in itertools.product(*grid.values()):
        lines.append(f"[{', '.join(str(v) for v in values)}]")
        lines.extend(f"{k} = {v}" for k, v in zip(grid, values))
        lines.append("")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("param", choices=sorted(SWEEPS))
    ap.add_argument("--baseline", action="store_true",
                    help="expert-baseline grid (centralized x param)")
    ap.add_argument("--default-cfg", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    print(generate(args.param, args.baseline, args.default_cfg, args.out))


if __name__ == "__main__":
    main()
