#!/usr/bin/env python3
"""On-chip certification gate for the O(N) cell paths (VERDICT r2 item 2).

Runs COMPILED (not interpret-mode) parity checks on the real TPU for the
``cells`` and ``pcells`` graph backends at production sizes — the regime
round 2's interpret-only CI could not cover (the `_frame_kernel` NaN at
N >= ~12k shipped while 151 CPU tests passed):

  * ``frame``      — observation row-sums / degree / expert / min_r2 vs
                     the O(N^2) blocked_frame oracle (ops/blocked.py);
  * ``apply_adjT`` — row-normalized adjacency transpose-apply vs
                     blocked_apply_adjT;
  * ``rollout``    — a short rollout_large episode per path: rewards
                     finite, overflow == 0, and reward parity vs the
                     blocked path at the smallest size.

This is the documented PRE-COMMIT step for any change to ``ops/`` or
``envs/``: run ``python scripts/verify_cells_tpu.py`` (add ``--quick``
to skip N=100k) and commit only on PASS. CPU-interpret equivalents run in
CI (tests/test_pallas_cells.py); this script is the part CI cannot see.

Exit code 0 = all certified; 1 = any check failed.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from multiagent_gnn_policies_tpu.utils.jax_setup import (  # noqa: E402
    enable_persistent_cache,
    respect_platform_env,
)

respect_platform_env()
enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FAILED = []


def check(name: str, ok: bool, detail: str = "") -> None:
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILED.append(name)


def frame_adjT_checks(n: int, rtol: float) -> None:
    """Compiled frame + apply_adjT parity vs the blocked oracle at size n.

    Runs under ``jax.default_matmul_precision('highest')``: the gate
    certifies ALGORITHMIC equivalence of the compiled lowerings. At the
    default (bf16-input MXU) precision the paths legitimately differ —
    blocked/cells put their products on the MXU while the pcells kernel
    is pure-VPU f32 — by up to ~2e-1 relative on the cancelling 1/r^4
    sums; production-precision health is covered by the rollout checks
    (finiteness + overflow + cross-path reward parity) instead.
    """
    from multiagent_gnn_policies_tpu.envs.flocking import (
        FlockingParams,
        _init_candidate,
    )
    from multiagent_gnn_policies_tpu.ops import cells as cc
    from multiagent_gnn_policies_tpu.ops import pallas_cells as pc
    from multiagent_gnn_policies_tpu.ops.blocked import (
        blocked_apply_adjT,
        blocked_frame,
    )

    p = FlockingParams(n_agents=n)
    # positions only — the dense reset()'s (N, N, 4) observe is unbuildable
    # at N=100k (160 GB); the large-N paths never materialize it either
    from multiagent_gnn_policies_tpu.parallel.large_n import pick_block

    x = jax.jit(_init_candidate, static_argnums=1)(jax.random.key(0), p)
    blk = pick_block(n)
    ref = jax.jit(blocked_frame, static_argnums=(1, 2, 3))(x, p, True, blk)
    cols = jnp.concatenate([ref.values, ref.expert], axis=-1)  # (N, 8)
    ref_adjT = jax.jit(
        lambda pos, c, d: blocked_apply_adjT(pos, c, p, blk, deg=d)
    )(x[:, :2], cols, ref.degree)

    # pcells
    spec = pc.make_pcell_spec(p)
    grid = jax.jit(pc.build_pcell_grid, static_argnums=1)(x[:, :2], spec)
    check(f"pcells.grid N={n}", int(grid.overflow) == 0,
          f"overflow={int(grid.overflow)}")
    fq = jax.jit(pc.frame, static_argnums=(2, 3, 4, 5))(
        x, grid, spec, p, True, False
    )
    out_adjT = jax.jit(pc.apply_adjT, static_argnums=(3, 4, 6))(
        x[:, :2], ref.degree, cols, spec, p, grid, False
    )
    _compare(f"pcells.frame N={n}", fq, ref, rtol, n=n)
    _compare_arr(f"pcells.apply_adjT N={n}", out_adjT, ref_adjT, rtol)

    # cells
    cspec = cc.make_cell_spec(p)
    cgrid = jax.jit(cc.build_cell_grid, static_argnums=1)(x[:, :2], cspec)
    check(f"cells.grid N={n}", int(cgrid.overflow) == 0,
          f"overflow={int(cgrid.overflow)}")
    cfq = jax.jit(cc.cells_frame, static_argnums=(2, 3, 4))(
        x, cgrid, cspec, p, True
    )
    cadjT = jax.jit(cc.cells_apply_adjT, static_argnums=(3, 4))(
        x[:, :2], ref.degree, cols, cspec, p, cgrid
    )
    _compare(f"cells.frame N={n}", cfq, ref, rtol, n=n)
    _compare_arr(f"cells.apply_adjT N={n}", cadjT, ref_adjT, rtol)


def _compare(name: str, got, ref, rtol: float, n: int = 0) -> None:
    for field in ("values", "degree", "expert", "min_r2"):
        a, b = np.asarray(getattr(got, field)), np.asarray(getattr(ref, field))
        finite = bool(np.all(np.isfinite(a)))
        if not finite:
            check(f"{name}.{field}", False,
                  f"{np.sum(~np.isfinite(a))} non-finite entries")
            continue
        tol = rtol
        # expert channel: since r4 the cell paths compute the centralized
        # consensus as the well-conditioned N·(v_i - mean(v)) (was
        # N·v_i - Σv, which cancelled ~5 of f32's ~7 digits at N=1e5 and
        # needed a 3.5e-2 tolerance here) — it now certifies at the same
        # rtol as every other channel (measured 4.5e-4 at N=100k on-chip,
        # results/verify_cells_tpu_r4.log; the residual is dominated by
        # the blocked ORACLE's own per-row f32 pairwise summation — the
        # compensated closed form is ~1e-5 of f64 truth,
        # tests/test_precision.py)
        scale = np.maximum(np.abs(b), 1.0)
        err = float(np.max(np.abs(a - b) / scale))
        check(f"{name}.{field}", err <= tol, f"rel_err={err:.2e}")


def _compare_arr(name: str, a, b, rtol: float) -> None:
    a, b = np.asarray(a), np.asarray(b)
    if not np.all(np.isfinite(a)):
        check(name, False, f"{np.sum(~np.isfinite(a))} non-finite entries")
        return
    scale = np.maximum(np.abs(b), 1.0)
    err = float(np.max(np.abs(a - b) / scale))
    check(name, err <= rtol, f"rel_err={err:.2e}")


def rollout_checks(n: int, t_steps: int, paths, ref_path=None) -> None:
    """Short compiled rollout per path: finite rewards + overflow == 0
    (+ reward parity across paths when ref_path given)."""
    from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
    from multiagent_gnn_policies_tpu.models.actor import ActorConfig, init_actor
    from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

    acfg = ActorConfig(n_s=6, n_a=2, hidden=(32, 32), k=3, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    p = FlockingParams(n_agents=n, episode_steps=t_steps)
    totals = {}
    for path in paths:
        t0 = time.perf_counter()
        r, _, ovf = rollout_large(params, acfg, jax.random.key(7), p,
                                  path=path, return_overflow=True)
        tot = float(np.asarray(r).sum())
        dt = time.perf_counter() - t0
        totals[path] = tot
        check(f"{path}.rollout N={n}",
              np.isfinite(tot) and int(ovf) == 0,
              f"reward_sum={tot:.1f} overflow={int(ovf)} ({dt:.1f}s inc. compile)")
    if ref_path and ref_path in totals:
        for path in paths:
            if path == ref_path:
                continue
            a, b = totals[path], totals[ref_path]
            err = abs(a - b) / max(abs(b), 1.0)
            check(f"{path}.rollout_parity N={n}", err < 5e-2,
                  f"vs {ref_path}: {a:.2f} vs {b:.2f}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true",
                    help="skip the N=100k checks (~minutes of compile)")
    ap.add_argument("--rtol", type=float, default=5e-4,
                    help="relative tolerance for frame/adjT parity "
                         "(f32 sum-order differences)")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev} (platform {dev.platform})", flush=True)
    if dev.platform == "cpu":
        print("WARNING: running on CPU — this does NOT certify the TPU "
              "lowering; run on the chip.", flush=True)

    sizes = [2048, 12288] + ([] if args.quick else [100_000])
    for n in sizes:
        t0 = time.perf_counter()
        with jax.default_matmul_precision("highest"):
            frame_adjT_checks(n, args.rtol)
        print(f"  (N={n} frame/adjT block: {time.perf_counter()-t0:.1f}s)",
              flush=True)

    # rollouts: parity across paths at 2048 (blocked is exact O(N^2) there),
    # certification-only at the large sizes
    rollout_checks(2048, 20, ("blocked", "cells", "pcells"), ref_path="blocked")
    rollout_checks(12288, 20, ("cells", "pcells"))
    if not args.quick:
        rollout_checks(100_000, 10, ("pcells",))

    print(f"\n{'ALL CERTIFIED' if not FAILED else 'FAILURES: ' + str(FAILED)}",
          flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
