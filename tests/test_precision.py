"""ops/precision.py: the compensated sums must deliver (near-)f64 accuracy
from f32 inputs — and keep delivering it under XLA compilation (an
algebraic-simplification pass that rewrites the TwoSum identities away
would silently destroy the compensation; this test is the tripwire)."""

import numpy as np
import jax
import jax.numpy as jnp

from multiagent_gnn_policies_tpu.ops.precision import (
    centralized_consensus,
    sum_twofloat,
)


def _velocities(n, seed=0):
    rng = np.random.default_rng(seed)
    # uniform [-3, 3] like v_max=3 resets, plus a mean offset so the sum
    # doesn't cancel to zero by luck
    return (rng.uniform(-3.0, 3.0, (n, 2)) + 0.013).astype(np.float32)


def test_sum_twofloat_vs_f64():
    v = _velocities(100_000)
    hi, lo = jax.jit(sum_twofloat)(jnp.asarray(v))
    got = np.float64(np.asarray(hi)) + np.float64(np.asarray(lo))
    want = np.sum(np.asarray(v, np.float64), axis=0)
    err = np.max(np.abs(got - want))
    naive_err = np.max(np.abs(
        np.asarray(jnp.sum(jnp.asarray(v), axis=0), np.float64) - want
    ))
    # two-float pairwise: ~|Σ|v|| * 2^-48 ≈ 1e-9 here; plain f32 summation
    # is typically 1e-2..1e0 absolute at this size
    assert err < 1e-6, f"compensation lost: err={err:.3e} (naive {naive_err:.3e})"


def test_centralized_consensus_vs_f64_pairwise():
    for n in (997, 4096, 100_000):
        v = _velocities(n, seed=n)
        got = np.asarray(jax.jit(centralized_consensus)(jnp.asarray(v)))
        v64 = np.asarray(v, np.float64)
        want = n * v64 - np.sum(v64, axis=0)
        err = np.max(np.abs(got - want))
        # error budget: the ×N of exact-f32 rounding of (v_i - m) where the
        # result is large (clipped downstream anyway) — on the magnitudes
        # that matter (|result| ~ 10) the computation is exact to ~1e-4
        scale = np.maximum(np.abs(want), 1.0)
        rel = np.max(np.abs(got - want) / scale)
        assert rel < 1e-5, f"N={n}: rel={rel:.3e} abs={err:.3e}"


def test_consensus_matches_dense_expert_path():
    """The closed form must agree with the direct pairwise sum the dense
    env oracle uses (envs/flocking.py:expert_action vmask term)."""
    v = _velocities(512, seed=7)
    got = np.asarray(centralized_consensus(jnp.asarray(v)))
    dv = v[:, None, :].astype(np.float64) - v[None, :, :].astype(np.float64)
    want = np.sum(dv, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-6)
