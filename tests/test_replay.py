"""Tests for the on-device SoA replay buffer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiagent_gnn_policies_tpu.algos.replay import (
    replay_init,
    replay_insert_batch,
    replay_sample,
)

EX = {"a": jnp.zeros((3, 2)), "b": jnp.zeros(())}


def _chunk(start, t):
    return {
        "a": jnp.arange(start, start + t, dtype=jnp.float32)[:, None, None]
        * jnp.ones((t, 3, 2)),
        "b": jnp.arange(start, start + t, dtype=jnp.float32),
    }


def test_insert_and_wraparound():
    buf = replay_init(10, EX)
    buf = replay_insert_batch(buf, _chunk(0, 7))
    assert int(buf.size) == 7 and int(buf.cursor) == 7
    buf = replay_insert_batch(buf, _chunk(100, 7))  # wraps: slots 7..9,0..3
    assert int(buf.size) == 10 and int(buf.cursor) == 4
    b = np.asarray(buf.data["b"])
    np.testing.assert_allclose(b[7:], [100, 101, 102])
    np.testing.assert_allclose(b[:4], [103, 104, 105, 106])
    np.testing.assert_allclose(b[4:7], [4, 5, 6])  # untouched middle


def test_chunk_larger_than_capacity_raises():
    buf = replay_init(5, EX)
    with pytest.raises(ValueError):
        replay_insert_batch(buf, _chunk(0, 6))


def test_sample_without_replacement_and_validity():
    buf = replay_init(50, EX)
    buf = replay_insert_batch(buf, _chunk(0, 20))
    batch = replay_sample(buf, jax.random.key(0), 10)
    vals = np.asarray(batch["b"])
    assert len(np.unique(vals)) == 10          # distinct slots
    assert ((vals >= 0) & (vals < 20)).all()   # only filled slots
    # leaves stay aligned
    np.testing.assert_allclose(np.asarray(batch["a"])[:, 0, 0], vals)


def test_sample_is_uniform_ish():
    buf = replay_init(100, EX)
    buf = replay_insert_batch(buf, _chunk(0, 100))
    counts = np.zeros(100)
    for i in range(300):
        b = replay_sample(buf, jax.random.key(i), 10)
        counts[np.asarray(b["b"]).astype(int)] += 1
    # each slot expected 30 draws; loose 5-sigma band
    assert counts.min() > 5 and counts.max() < 80


def test_insert_sample_under_jit():
    @jax.jit
    def roundtrip(buf, chunk, key):
        buf = replay_insert_batch(buf, chunk)
        return buf, replay_sample(buf, key, 4)

    buf = replay_init(16, EX)
    buf, batch = roundtrip(buf, _chunk(0, 8), jax.random.key(1))
    assert batch["a"].shape == (4, 3, 2)
    assert int(buf.size) == 8
