"""Property tests for the delayed graph-state runtime.

Oracle: an independent NumPy transcription of the reference semantics
(state_with_delay.py:38-53) computed the slow, explicit way — GSO products
assembled from the raw adjacency history.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiagent_gnn_policies_tpu.ops import graph as G

N, F, K = 12, 6, 4


def random_adjacency(rng, n):
    pos = rng.uniform(-2, 2, size=(n, 2))
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    adj = (d2 < 2.0).astype(np.float32)
    deg = np.maximum(adj.sum(1, keepdims=True), 1.0)
    return adj / deg


def rollout_states(rng, t_steps):
    """Run the jittable graph-state update over a random adjacency/feature
    sequence; return (states, adjacency history, feature history)."""
    adjs = [random_adjacency(rng, N) for _ in range(t_steps)]
    xs = [rng.standard_normal((N, F)).astype(np.float32) for _ in range(t_steps)]
    state = G.initial_graph_state(jnp.asarray(xs[0]), jnp.asarray(adjs[0]), K,
                                  with_curr_gso=True)
    states = [state]
    step = jax.jit(lambda s, v, a: G.update_graph_state(s, v, a, with_curr_gso=True))
    for t in range(1, t_steps):
        state = step(state, jnp.asarray(xs[t]), jnp.asarray(adjs[t]))
        states.append(state)
    return states, adjs, xs


def test_delay_gso_matches_explicit_products():
    rng = np.random.default_rng(0)
    t_steps = 7
    states, adjs, _ = rollout_states(rng, t_steps)
    for t in range(t_steps):
        got = np.asarray(states[t].delay_gso)
        # delay_gso[j](t) = A_t · A_{t-1} · … · A_{t-j+1}; zero if the episode
        # is younger than j steps (seeded with zeros at reset).
        for j in range(K):
            if j == 0:
                want = np.eye(N, dtype=np.float32)
            elif t < j:  # reset seeds delay slots with zeros; slot j needs j steps of history
                want = np.zeros((N, N), dtype=np.float32)
            else:
                # explicit left-to-right product A_t @ A_{t-1} @ … @ A_{t-j+1}
                want = adjs[t]
                for s in range(t - 1, t - j, -1):
                    want = want @ adjs[s]
            np.testing.assert_allclose(got[j], want, rtol=1e-5, atol=1e-5)


def test_delay_state_is_shifted_history():
    rng = np.random.default_rng(1)
    t_steps = 6
    states, _, xs = rollout_states(rng, t_steps)
    for t in range(t_steps):
        got = np.asarray(states[t].delay_state)
        for j in range(K):
            want = xs[t - j] if t - j >= 0 else np.zeros((N, F), np.float32)
            np.testing.assert_allclose(got[j], want, rtol=1e-6, atol=1e-6)


def test_curr_gso_is_matrix_powers():
    rng = np.random.default_rng(2)
    adj = random_adjacency(rng, N)
    got = np.asarray(G.gso_powers(jnp.asarray(adj), K))
    want = np.eye(N, dtype=np.float32)
    for j in range(K):
        np.testing.assert_allclose(got[j], want, rtol=1e-5, atol=1e-5)
        want = adj @ want
    assert got.shape == (K, N, N)


def test_aggregate_matches_reference_matmul_orientation():
    """aggregate() must equal torch's x(B,K,F,N) @ gso(B,K,N,N) modulo layout."""
    rng = np.random.default_rng(3)
    gso = rng.standard_normal((K, N, N)).astype(np.float32)
    x_nf = rng.standard_normal((K, N, F)).astype(np.float32)
    got = np.asarray(G.aggregate(jnp.asarray(gso), jnp.asarray(x_nf)))
    # reference: y[k,f,m] = sum_n x[k,f,n] gso[k,n,m]
    x_fn = x_nf.transpose(0, 2, 1)
    want = np.einsum("kfn,knm->kfm", x_fn, gso).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_k1_degenerate():
    rng = np.random.default_rng(4)
    adj = random_adjacency(rng, N)
    x = rng.standard_normal((N, F)).astype(np.float32)
    s0 = G.initial_graph_state(jnp.asarray(x), jnp.asarray(adj), 1)
    s1 = G.update_graph_state(s0, jnp.asarray(x), jnp.asarray(adj))
    np.testing.assert_allclose(np.asarray(s1.delay_gso[0]), np.eye(N))
    np.testing.assert_allclose(np.asarray(s1.delay_state[0]), x)


def test_vmap_batches_cleanly():
    rng = np.random.default_rng(5)
    B = 3
    adj = np.stack([random_adjacency(rng, N) for _ in range(B)])
    x = rng.standard_normal((B, N, F)).astype(np.float32)
    init = jax.vmap(lambda v, a: G.initial_graph_state(v, a, K))
    st = init(jnp.asarray(x), jnp.asarray(adj))
    assert st.delay_gso.shape == (B, K, N, N)
    upd = jax.vmap(G.update_graph_state)
    st2 = upd(st, jnp.asarray(x), jnp.asarray(adj))
    assert st2.delay_state.shape == (B, K, N, F)


def test_normalized_adjacency_handles_isolated_agents():
    adj = np.zeros((4, 4), np.float32)
    adj[0, 1] = adj[1, 0] = 1.0
    out = np.asarray(G.normalized_adjacency(jnp.asarray(adj)))
    np.testing.assert_allclose(out.sum(1), [1.0, 1.0, 0.0, 0.0])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
