import jax
import jax.numpy as jnp
import numpy as np

import ur_mvo_tpu.ops.lie as lie
from ur_mvo_tpu.ops.pose_graph import PoseGraph, optimize_pose_graph


def make_chain_graph(n=10, noise=0.05, loop=False, seed=0):
    """Ground-truth circular-ish trajectory; noisy initial nodes; exact
    relative-pose edges (+ optional loop edge)."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    ts = jnp.linspace(0, 1, n)
    R_true = lie.so3_exp(jnp.stack([0.05 * ts, 0.8 * ts, 0.02 * ts], 1))
    t_true = jnp.stack([jnp.sin(2 * ts), jnp.cos(2 * ts) - 1, 0.2 * ts], 1)

    # exact relative measurements from ground truth
    E = n  # chain (+ optional loop) fits
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    Rm = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    tm = np.zeros((E, 3), np.float32)
    w = np.zeros(E, np.float32)
    for k in range(n - 1):
        i, j = k, k + 1
        ei[k], ej[k] = i, j
        Rm[k] = np.asarray(R_true[i]).T @ np.asarray(R_true[j])
        tm[k] = np.asarray(R_true[i]).T @ np.asarray(t_true[j] - t_true[i])
        w[k] = 1.0
    if loop:
        ei[n - 1], ej[n - 1] = 0, n - 1
        Rm[n - 1] = np.asarray(R_true[0]).T @ np.asarray(R_true[n - 1])
        tm[n - 1] = np.asarray(R_true[0]).T @ np.asarray(t_true[n - 1] - t_true[0])
        w[n - 1] = 1.0

    # noisy initial estimates (first node fixed at truth)
    dR = lie.so3_exp(noise * jax.random.normal(ks[0], (n, 3)))
    R0 = jnp.einsum("nij,njk->nik", dR, R_true)
    t0 = t_true + noise * 3 * jax.random.normal(ks[1], (n, 3))
    R0 = R0.at[0].set(R_true[0])
    t0 = t0.at[0].set(t_true[0])

    g = PoseGraph(
        R_wc=R0, t_wc=t0,
        node_valid=jnp.ones(n, bool),
        node_fixed=jnp.arange(n) < 1,
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        R_ij=jnp.asarray(Rm), t_ij=jnp.asarray(tm),
        edge_weight=jnp.asarray(w),
    )
    return g, R_true, t_true


def test_pose_graph_chain_converges():
    g, R_true, t_true = make_chain_graph(n=12, noise=0.05)
    res = optimize_pose_graph(g, iterations=15)
    assert float(res.cost) < 1e-8
    np.testing.assert_allclose(np.asarray(res.t_wc), np.asarray(t_true), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.R_wc), np.asarray(R_true), atol=1e-3)


def test_pose_graph_loop_closure_corrects_drift():
    # a chain with drift: perturb the initial poses progressively, then
    # the loop edge should pull the end back
    g, R_true, t_true = make_chain_graph(n=15, noise=0.08, loop=True, seed=2)
    res = optimize_pose_graph(g, iterations=25)
    err_end = np.linalg.norm(np.asarray(res.t_wc[-1] - t_true[-1]))
    assert err_end < 5e-3, err_end


def test_pose_graph_fixed_node_unchanged():
    g, R_true, t_true = make_chain_graph(n=8)
    res = optimize_pose_graph(g, iterations=10)
    np.testing.assert_allclose(np.asarray(res.R_wc[0]), np.asarray(g.R_wc[0]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.t_wc[0]), np.asarray(g.t_wc[0]), atol=1e-7)


def test_pose_graph_padding_invariance():
    g, R_true, t_true = make_chain_graph(n=10)
    res1 = optimize_pose_graph(g, iterations=10)
    Fp, Ep = 16, 20
    n, E = 10, 10
    g2 = PoseGraph(
        R_wc=jnp.concatenate([g.R_wc, jnp.tile(jnp.eye(3)[None], (Fp - n, 1, 1))]),
        t_wc=jnp.concatenate([g.t_wc, jnp.zeros((Fp - n, 3))]),
        node_valid=jnp.pad(g.node_valid, (0, Fp - n)),
        node_fixed=jnp.pad(g.node_fixed, (0, Fp - n)),
        edge_i=jnp.pad(g.edge_i, (0, Ep - E)),
        edge_j=jnp.pad(g.edge_j, (0, Ep - E)),
        R_ij=jnp.concatenate([g.R_ij, jnp.tile(jnp.eye(3)[None], (Ep - E, 1, 1))]),
        t_ij=jnp.concatenate([g.t_ij, jnp.zeros((Ep - E, 3))]),
        edge_weight=jnp.pad(g.edge_weight, (0, Ep - E)),
    )
    res2 = optimize_pose_graph(g2, iterations=10)
    np.testing.assert_allclose(np.asarray(res2.t_wc[:n]), np.asarray(res1.t_wc), atol=1e-5)
