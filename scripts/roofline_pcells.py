#!/usr/bin/env python3
"""Roofline accounting for the pcells sweep — BASELINE.md's "edges/s/chip
at speed-of-light" target, finally measured (r4 VERDICT weak #1).

Times each component of the fused frame/apply step in isolation (the sort
-based grid build, the slot-table pack, the Pallas frame and apply sweeps,
the band unpack, the delayed-stack y-pass, the actor/dynamics/carry tail)
with the dispatch latency amortized by a ``lax.scan`` of data-chained reps
inside ONE jitted program (the axon tunnel costs ~66 ms per dispatch —
unamortized per-op timing would be pure RTT). For each component it prints
achieved bytes/s and flop/s against the chip's speed-of-light:

* HBM: 819 GB/s (TPU v5e public spec).
* VPU: ~3.9e12 f32 op/s estimate — (8 sublanes x 128 lanes) x 4 ALUs at
  ~940 MHz. The pair sweep is VPU work (no matmuls, no MXU).

Bytes are the ALGORITHMIC minimum for the layout (each table read once,
written once); the sweep's Mosaic pipeline actually re-fetches each grid
row up to 3x (as prev/cur/next of adjacent programs), reported as the
"x3" bound. FLOPs are hand-counted from the kernel source (ops/
pallas_cells.py) and include the cap^2 pair padding — the kernels compute
every (sub-slot a, sub-slot b) pair, occupied or not, so the padding
waste IS the kernel's cost model, not an accounting artifact.

    python -u scripts/roofline_pcells.py --n 100000 --reps 30
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from multiagent_gnn_policies_tpu.utils.jax_setup import (  # noqa: E402
    enable_persistent_cache,
    respect_platform_env,
)

respect_platform_env()
enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

HBM_GBPS = 819.0          # TPU v5e HBM bandwidth, GB/s
VPU_GOPS = 3900.0         # TPU v5e VPU f32 Gop/s (8x128 lanes x 4 ALUs @940MHz)


def timed_scan(fn, args, reps, name):
    """Time ``reps`` data-chained applications of ``fn`` inside one jit.

    ``fn(eps, *args) -> array-ish`` must consume ``eps`` (a scalar) so each
    iteration depends on the previous output — XLA cannot CSE/hoist the
    body. Returns seconds per rep.
    """

    @jax.jit
    def loop(args):
        def body(acc, _):
            out = fn(acc * 1e-30, *args)
            leaves = jax.tree_util.tree_leaves(out)
            acc2 = sum(jnp.sum(l[..., :1].astype(jnp.float32))
                       if l.ndim else l.astype(jnp.float32)
                       for l in leaves)
            return acc2, None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=reps)
        return acc

    t0 = time.perf_counter()
    float(np.asarray(loop(args)))          # compile + first run
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(loop(args)))
    dt = (time.perf_counter() - t0) / reps
    print(f"  [{name}: compile+first {compile_s:.1f}s]", file=sys.stderr)
    return dt


def fmt_row(name, dt, bytes_min=None, flops=None, bytes_3x=None):
    ms = dt * 1e3
    cols = [f"{name:24s}", f"{ms:8.3f} ms"]
    sol = 0.0
    if bytes_min:
        gbps = bytes_min / dt / 1e9
        cols.append(f"{bytes_min/1e6:8.1f} MB  {gbps:6.0f} GB/s "
                    f"({100*gbps/HBM_GBPS:5.1f}% HBM)")
        sol = max(sol, bytes_min / (HBM_GBPS * 1e9))
    if flops:
        gops = flops / dt / 1e9
        cols.append(f"{flops/1e9:7.2f} Gop {gops:7.0f} Gop/s "
                    f"({100*gops/VPU_GOPS:5.1f}% VPU)")
        sol = max(sol, flops / (VPU_GOPS * 1e9))
    if bytes_3x:
        sol3 = max(bytes_3x / (HBM_GBPS * 1e9),
                   (flops or 0) / (VPU_GOPS * 1e9))
        cols.append(f"SoL {sol*1e3:6.3f}-{sol3*1e3:6.3f} ms "
                    f"({dt/max(sol3,1e-12):4.1f}-{dt/max(sol,1e-12):4.1f}x off)")
    elif sol:
        cols.append(f"SoL {sol*1e3:6.3f} ms ({dt/max(sol,1e-12):4.1f}x off)")
    print("  ".join(cols))
    return sol


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--band", type=int, default=0, metavar="D",
                    help="time the banded per-device components of a "
                         "D-chip mesh (device 0's grid-row band; "
                         "collectives excluded, like force_n_dev)")
    ap.add_argument("--edge-mult", type=float, default=1.0,
                    help="cell edge multiple (make_pcell_spec edge_mult: "
                         "occupancy/padding trade)")
    ap.add_argument("--cap", type=int, default=16,
                    help="cell slot capacity (make_pcell_spec cap)")
    args = ap.parse_args(argv)

    from multiagent_gnn_policies_tpu.envs.flocking import (
        FlockingParams,
        _init_candidate,
    )
    from multiagent_gnn_policies_tpu.ops import pallas_cells as pc
    from multiagent_gnn_policies_tpu.ops.pallas_cells import (
        PCellSpec,
        build_pcell_grid,
        make_pcell_spec,
    )

    n, k, reps = args.n, args.k, args.reps
    p = FlockingParams(n_agents=n, episode_steps=8)
    spec = make_pcell_spec(p, cap=args.cap, edge_mult=args.edge_mult)
    cx, cy, cap, cyp = spec.cx, spec.cy, spec.cap, spec.cy_pad
    f = 6
    c_cols = (k - 1) * f                       # fused s=0 apply columns
    print(f"N={n} K={k} grid {cx}x{cy} cap={cap} cy_pad={cyp} "
          f"slots={cx*cap*cy} ({cx*cap*cy/n:.1f}x agents) "
          f"lane fill {cy/cyp:.2f}")

    key = jax.random.key(0)
    x = np.asarray(_init_candidate(key, p))
    x = jnp.asarray(x)
    grid = jax.jit(build_pcell_grid, static_argnums=1)(x[:, :2], spec)
    grid = jax.tree.map(jnp.asarray, grid)
    occ = n / (cx * cy)
    print(f"overflow={int(grid.overflow)} mean occupancy {occ:.2f}/cell")

    cols = jax.random.normal(jax.random.key(1), (n, c_cols))
    interp = jax.default_backend() == "cpu"

    # ---- per-component timings (dispatch amortized) ----
    rows = []

    # grid build: argsort + rank + scatters (irregular; no byte model)
    dt = timed_scan(
        lambda eps, pos: build_pcell_grid(pos + eps, spec),
        (x[:, :2],), reps, "build")
    rows.append(("build (argsort+tables)", dt))
    fmt_row(*rows[-1])

    # pack: the geometry table (5 ch) and the apply-columns table (12 ch)
    tbl = lambda C: (cx + 2) * C * cap * cyp * 4          # slot-table bytes
    for C, name in ((5, "pack 5ch (geo)"), (c_cols, "pack 12ch (cols)")):
        vals = jax.random.normal(jax.random.key(2), (n, C))
        dt = timed_scan(
            lambda eps, v: pc._pack(grid, spec, v + eps),
            (vals,), reps, name)
        rows.append((name, dt, n * C * 4 + tbl(C), None))
        fmt_row(*rows[-1])

    # frame sweep kernel only (pre-packed input)
    import functools
    packed5 = pc._pack(grid, spec, jnp.concatenate(
        [x, jnp.ones((n, 1), x.dtype)], axis=-1))
    fk = functools.partial(pc._frame_kernel, cap=cap,
                           r2cut=float(p.comm_radius) ** 2, centralized=True)
    # hand count (ops/pallas_cells.py:_frame_kernel): ~45 VPU ops per
    # (a, b) pair element per offset incl. the group-sum reduction
    frame_flops = 45 * cap * cap * cyp * 9 * cx
    dt = timed_scan(
        lambda eps, pk: pc._sweep(fk, pk + eps, 10 * cap, interp,
                                  valid_ch=4, cap=cap),
        (packed5,), reps, "frame kernel")
    rows.append(("frame kernel (sweep)", dt,
                 tbl(5) + tbl(10), frame_flops, 3 * tbl(5) + tbl(10)))
    fmt_row(*rows[-1])

    # apply sweep kernel only (split-table fused variant: geo + cols +
    # frame-output degrees)
    colt = pc._pack(grid, spec, cols)
    fout = pc._sweep(fk, packed5, 10 * cap, interp, valid_ch=4, cap=cap)
    fpad = jnp.pad(fout, ((1, 1), (0, 0), (0, 0)))
    ak = functools.partial(pc._apply_deg_kernel, cap=cap, c=c_cols,
                           r2cut=float(p.comm_radius) ** 2)
    apply_flops = (11 + 2 * c_cols) * cap * cap * cyp * 9 * cx
    dt = timed_scan(
        lambda eps, ct, fp: pc._sweep_deg(ak, packed5, ct + eps, fp,
                                          c_cols * cap, interp,
                                          valid_ch=4, cap=cap),
        (colt, fpad), reps, "apply kernel")
    rows.append((f"apply kernel ({c_cols}ch)", dt,
                 tbl(5 + c_cols) + tbl(10) + tbl(c_cols), apply_flops,
                 3 * (tbl(5 + c_cols) + tbl(10)) + tbl(c_cols)))
    fmt_row(*rows[-1])

    # unpack of the concatenated frame+apply output (22 ch per agent)
    both = jnp.concatenate([fout, pc._sweep_deg(
        ak, packed5, colt, fpad, c_cols * cap, interp,
        valid_ch=4, cap=cap)], axis=1)
    q = 10 + c_cols
    dt = timed_scan(
        lambda eps, b: pc._unpack(grid, spec, b + eps),
        (both,), reps, "unpack 22ch")
    rows.append((f"unpack {q}ch", dt, tbl(q) * cx // (cx + 2) + n * q * 4,
                 None))
    fmt_row(*rows[-1])

    # whole fused frame_apply (pack + both sweeps + unpack + consensus)
    dt = timed_scan(
        lambda eps, xx, cc: pc.frame_apply(xx + eps, cc, grid, spec, p,
                                           True, interp)[0].values,
        (x, cols), reps, "frame_apply whole")
    rows.append(("frame_apply (whole)", dt))
    fmt_row(*rows[-1])

    # one historical apply pass of the y-stack (s=1 at K=3: 6 columns)
    deg = jnp.maximum(jax.random.uniform(jax.random.key(3), (n,)) * 8, 1.0)
    dt = timed_scan(
        lambda eps, cc: pc.apply_adjT(x[:, :2], deg, cc + eps, spec, p,
                                      grid=grid, interpret=interp),
        (cols[:, :f],), reps, "apply_adjT 6ch (s>=1)")
    rows.append(("apply_adjT 6ch (s>=1)", dt))
    fmt_row(*rows[-1])

    # ---- banded per-device decomposition (32k-floor accounting) ----
    if args.band > 1:
        D = args.band
        local_rows = cx // D
        rr = (0, local_rows)
        local_n = n // D
        print(f"\n-- banded components: device 0 of a D={D} mesh "
              f"({local_rows}/{cx} grid rows; collectives excluded) --")
        brows = []

        cid = jnp.argsort(jax.random.randint(jax.random.key(7),
                                             (local_n,), 0, cx * cy))
        dt = timed_scan(
            lambda eps, c_: jnp.argsort(c_ + (eps > 1).astype(c_.dtype)),
            (cid,), reps, "local argsort")
        brows.append((f"local argsort ({local_n})", dt)); fmt_row(*brows[-1])

        slot = grid.slot
        dt = timed_scan(
            lambda eps, s: pc._grid_tables(
                spec, s + (eps > 1).astype(s.dtype), jnp.sum(s >= 0)
            ).agent,
            (slot,), reps, "grid tables")
        brows.append(("grid tables (replicated)", dt)); fmt_row(*brows[-1])


        geo5 = jnp.concatenate([x, jnp.ones((n, 1), x.dtype)], axis=-1)
        dt = timed_scan(
            lambda eps, v: pc._pack(grid, spec, v + eps, row_range=rr),
            (geo5,), reps, "band pack5")
        brows.append(("band pack 5ch", dt)); fmt_row(*brows[-1])
        dt = timed_scan(
            lambda eps, v: pc._pack(grid, spec, v + eps, row_range=rr),
            (cols,), reps, "band pack12")
        brows.append(("band pack 12ch", dt)); fmt_row(*brows[-1])

        bgeo = pc._pack(grid, spec, geo5, row_range=rr)
        dt = timed_scan(
            lambda eps, pk: pc._sweep(fk, pk + eps, 10 * cap, interp,
                                      valid_ch=4, cap=cap),
            (bgeo,), reps, "band frame sweep")
        brows.append(("band frame sweep", dt)); fmt_row(*brows[-1])

        bcol = pc._pack(grid, spec, cols, row_range=rr)
        bfout = pc._sweep(fk, bgeo, 10 * cap, interp, valid_ch=4, cap=cap)
        bfpad = jnp.pad(bfout, ((1, 1), (0, 0), (0, 0)))
        dt = timed_scan(
            lambda eps, ct, fp: pc._sweep_deg(
                ak, bgeo, ct + eps, fp, c_cols * cap, interp,
                valid_ch=4, cap=cap),
            (bcol, bfpad), reps, "band apply sweep")
        brows.append(("band apply sweep 12ch", dt)); fmt_row(*brows[-1])

        bboth = jnp.concatenate([bfout, pc._sweep_deg(
            ak, bgeo, bcol, bfpad, c_cols * cap, interp,
            valid_ch=4, cap=cap)], axis=1)
        dt = timed_scan(
            lambda eps, b: pc._unpack_band(grid, spec, b + eps, 0),
            (bboth,), reps, "band unpack")
        brows.append((f"band unpack {q}ch (O(N))", dt)); fmt_row(*brows[-1])

        hist = jax.random.normal(jax.random.key(8), (k, n, f))
        dt = timed_scan(
            lambda eps, h: jnp.transpose(
                (h + eps)[:k - 1], (1, 0, 2)).reshape(n, (k - 1) * f),
            (hist,), reps, "s0 cols transpose")
        brows.append(("s0_cols transpose (O(N))", dt)); fmt_row(*brows[-1])

        vals6 = jax.random.normal(jax.random.key(9), (n, f))
        dt = timed_scan(
            lambda eps, h, v: jnp.concatenate(
                [(v + eps)[None], h[:k - 1]], axis=0),
            (hist, vals6), reps, "carry shift")
        brows.append(("carry shift (O(N))", dt)); fmt_row(*brows[-1])

        dt = timed_scan(
            lambda eps, xx: -jnp.sum(jnp.var(xx[:, 2:4] + eps, axis=0)),
            (x,), reps, "reward reduce")
        brows.append(("reward reduce (O(N))", dt)); fmt_row(*brows[-1])

        from multiagent_gnn_policies_tpu.models.actor import (
            ActorConfig as AC,
            actor_forward,
            init_actor as ia,
        )

        acfg_b = AC(n_s=6, n_a=2, hidden=(32, 32), k=k, ind_agg=0)
        prm = ia(jax.random.key(0), acfg_b)
        y_slice = jax.random.normal(jax.random.key(10), (k, local_n, f))
        dt = timed_scan(
            lambda eps, y_: actor_forward(prm, acfg_b, y_ + eps, None),
            (y_slice,), reps, "actor fwd (slice)")
        brows.append(("actor fwd (1/D slice)", dt)); fmt_row(*brows[-1])

        fixed = sum(r[1] for r in brows
                    if "O(N)" in r[0] or "replicated" in r[0])
        print(f"\nfixed (D-independent) component sum: {fixed*1e3:.3f} ms; "
              f"banded components scale ~1/D")

    # ---- the full policy step for context ----
    from multiagent_gnn_policies_tpu.models.actor import ActorConfig, init_actor
    from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

    acfg = ActorConfig(n_s=6, n_a=2, hidden=(32, 32), k=k, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    T = 25
    pT = FlockingParams(n_agents=n, episode_steps=T, max_resets=2)
    r, _, ovf = rollout_large(params, acfg, jax.random.key(5), pT,
                              path="pcells", return_overflow=True)
    float(np.asarray(r).sum())
    t0 = time.perf_counter()
    r, _, ovf = rollout_large(params, acfg, jax.random.key(6), pT,
                              path="pcells", return_overflow=True)
    float(np.asarray(r).sum())
    dt_step = (time.perf_counter() - t0) / T
    print(f"\nfull policy step ({T}-step episode amortized): "
          f"{dt_step*1e3:.2f} ms/step (overflow={int(ovf)})")
    comp_sum = sum(r[1] for r in rows if "whole" not in r[0]
                   and "adjT" not in r[0])
    print(f"sum of distinct components above (build+pack17+frame+apply+"
          f"unpack): {comp_sum*1e3:.2f} ms")


if __name__ == "__main__":
    main()
