"""Compensated f32 reductions for N-amplified global terms.

The centralized expert's velocity-consensus term is
``sum_{j != i}(v_i - v_j) = N·v_i - Σ_j v_j`` — O(N) as a closed form, which
is what lets the cell paths avoid an all-pairs sweep (ops/pallas_cells.py:
frame). But the closed form multiplies any error in the global sum by N:
at N = 1e5 even a perfectly-rounded f32 mean carries ``0.5·ulp(mean)`` ≈
6e-9 of error, i.e. ~6e-4 after the ×N — and a plain ``jnp.sum`` of 1e5
f32 velocities is orders worse (measured 2e-2 relative on-chip vs the
pairwise-summing blocked oracle, results/verify_cells_tpu_r4.log pre-fix).
TPUs have no f64, so the fix is double-float arithmetic: an error-free
pairwise two-float sum (Dekker/Knuth TwoSum folds), giving ~2^-48-relative
accuracy at ~2N extra VPU flops — nothing for a term that rides an O(N)
frame pass.

Used by ops/pallas_cells.py / ops/cells.py / ops/binned.py. The O(N^2)
oracles (ops/blocked.py, envs/flocking.py) sum the pairwise differences
directly and need no compensation.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _two_sum(a, b):
    """Knuth TwoSum: s = fl(a+b) and the exact rounding error e."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def _df_add(ah, al, bh, bl):
    """Double-float addition: (ah+al) + (bh+bl) -> renormalized (hi, lo)."""
    s, e = _two_sum(ah, bh)
    e = e + (al + bl)
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def sum_twofloat(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum of ``v`` along axis 0 as a double-float (hi, lo) pair.

    Pairwise fold with a TwoSum at every level — error ~|Σv|·2^-48 instead
    of plain f32 summation's magnitude- and order-dependent drift. Works on
    any leading-axis shape; trailing axes are vectorized (the VPU sees
    log2(N) elementwise fold levels, ~2N flops total).
    """
    n = v.shape[0]
    size = 1
    while size < n:
        size *= 2
    pad = [(0, size - n)] + [(0, 0)] * (v.ndim - 1)
    hi = jnp.pad(v, pad)
    lo = jnp.zeros_like(hi)
    while hi.shape[0] > 1:
        h = hi.shape[0] // 2
        hi, lo = _df_add(hi[:h], lo[:h], hi[h:], lo[h:])
    return hi[0], lo[0]


def centralized_consensus(v: jnp.ndarray) -> jnp.ndarray:
    """``out[i] = sum_{j != i}(v[i] - v[j])`` for all i, in O(N).

    Computed as ``N·(v_i - m) - r`` with ``m = fl(S/N)`` and the residual
    ``r = S - N·m`` carried from the two-float sum ``S``:

      * ``v_i - m`` is exact (Sterbenz) exactly where the result is small
        enough for its error to matter, so the ×N amplifies no rounding;
      * ``r`` (~N·ulp(m)/2, the part a plain f32 mean would lose) restores
        the bits that the ×N would have amplified to ~1e-3-absolute.

    Certified ≤ rtol=5e-4 against the pairwise-summing blocked oracle at
    N=100k on-chip (scripts/verify_cells_tpu.py; the pre-fix closed forms
    measured 3.5e-2 (N·v_i - Σv, r3) and 2e-2 (f32 centered mean)).

    The subtlety: ``m`` must be chosen so ``N·m`` is EXACT in f32 (else the
    residual itself carries an eps·|S| rounding that biases every agent by
    ~1e-4 at N=1e5). A Veltkamp split truncates the mean to ``24 - ceil(
    log2 N)`` mantissa bits — ``N·m_t`` then fits 24 bits exactly, ``m_t``
    stays within 2^-(24-⌈log2 N⌉) of the true mean (plenty close for the
    centering), and the residual picks up the difference error-free.

    Args:
      v: (N, C) per-agent values (C components handled independently).

    Returns:
      (N, C) consensus sums.
    """
    n = v.shape[0]
    hi, lo = sum_twofloat(v)
    m = (hi + lo) / n
    # Veltkamp split: keep the top 24 - sigma mantissa bits of m
    sigma = max(int(n - 1).bit_length(), 1)
    phi = float(2**sigma + 1)
    c = m * phi
    m_t = c - (c - m)
    r = (hi - n * m_t) + lo       # exact: n·m_t exact, hi - n·m_t Sterbenz
    return n * (v - m_t) - r
