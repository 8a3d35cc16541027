"""Multi-device tests on the 8-way virtual CPU mesh: distributed BA must
match the single-chip solver, batched matching must match per-pair
matching, and the DP train step must run and reduce the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tests.test_ba import BF, CX, CY, FX, FY, build_problem
from tests.test_matching_stack import make_bank
from ur_mvo_tpu.models import superglue, superpoint
from ur_mvo_tpu.models.train_superpoint import make_batch, make_optimizer, loss_fn
from ur_mvo_tpu.ops.ba import bundle_adjust
from ur_mvo_tpu.ops.matching import decode_assignment
from ur_mvo_tpu.parallel.dist_ba import dist_bundle_adjust, shard_problem
from ur_mvo_tpu.parallel.dist_matching import make_batched_matcher
from ur_mvo_tpu.parallel.mesh import make_mesh
from ur_mvo_tpu.parallel.train_step import make_dp_train_step


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dist_ba_matches_single_chip():
    mesh = make_mesh(8)
    prob, R_true, t_true, X_true, n_obs = build_problem(jax.random.PRNGKey(0))
    res1 = bundle_adjust(prob, FX, FY, CX, CY)
    prob_s = shard_problem(prob, 8)
    res8 = dist_bundle_adjust(prob_s, mesh, FX, FY, CX, CY)
    # point-side normal terms are bf16-summand (ops/ba.py): shard order
    # changes the rounding path, so agreement is ~1e-3, not bit-level
    np.testing.assert_allclose(np.asarray(res8.t_wc[:6]), np.asarray(res1.t_wc[:6]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res8.R_wc[:6]), np.asarray(res1.R_wc[:6]), atol=1e-3)
    assert int(res8.obs_inlier.sum()) == int(res1.obs_inlier.sum())


def test_dist_ba_with_outliers():
    mesh = make_mesh(8)
    prob, R_true, t_true, X_true, n_obs = build_problem(jax.random.PRNGKey(3), n_outliers=40)
    prob_s = shard_problem(prob, 8)
    res = dist_bundle_adjust(prob_s, mesh, FX, FY, CX, CY)
    Rerr = np.abs(np.asarray(res.R_wc[:6]) - np.asarray(R_true)).max()
    terr = np.abs(np.asarray(res.t_wc[:6]) - np.asarray(t_true)).max()
    assert Rerr < 1e-2 and terr < 5e-2
    # planted outliers land in shard blocks after reordering; count only
    n_inl = int(res.obs_inlier.sum())
    assert n_obs - 45 <= n_inl <= n_obs - 35


def test_batched_matching_matches_sequential():
    mesh = make_mesh(8)
    params = superglue.init_params(jax.random.PRNGKey(0), num_layers=1)
    B, cap = 8, 32
    banks0 = [make_bank(jax.random.PRNGKey(10 + i), 20, cap) for i in range(B)]
    banks1 = [make_bank(jax.random.PRNGKey(50 + i), 24, cap) for i in range(B)]

    def stack(banks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *banks)

    fn = make_batched_matcher(params, mesh, 640, 512, sinkhorn_iterations=20, threshold=0.1)
    out = fn(stack(banks0), stack(banks1))
    for i in range(B):
        Z = superglue.match_scores(params, banks0[i], banks1[i], 640, 512, 20)
        m = decode_assignment(Z, banks0[i].valid, banks1[i].valid, 0.1)
        np.testing.assert_array_equal(np.asarray(out.idx1[i]), np.asarray(m.idx1))


def test_dp_train_step_runs_and_learns():
    mesh = make_mesh(8)
    params = superpoint.init_params(jax.random.PRNGKey(0))
    tx = make_optimizer(1e-3)
    opt_state = tx.init(params)
    step = make_dp_train_step(tx, mesh)
    key = jax.random.PRNGKey(1)
    images = jax.random.uniform(key, (8, 64, 64))
    batch = make_batch(jax.random.PRNGKey(2), images)
    l0 = float(loss_fn(params, batch))
    losses = []
    for i in range(5):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < l0, (l0, losses)
    # frozen encoder: conv1a unchanged, descriptor head changed
    params2 = params
    p0 = superpoint.init_params(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(params2["conv1a"]["w"]), np.asarray(p0["conv1a"]["w"]))
    assert not np.allclose(np.asarray(params2["convDb"]["w"]), np.asarray(p0["convDb"]["w"]))
