"""SuperGlue from-scratch training: loss semantics, a short optimization
run that must improve matching accuracy, and native checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.models import superglue, train_superglue
from ur_mvo_tpu.ops.matching import decode_assignment

W, H = 160, 120
CAP = 64
LAYERS = 2
HEADS = 4
SINKHORN = 10


def test_matching_loss_prefers_correct_assignment():
    rng = np.random.default_rng(0)
    b0, b1, t0, t1 = train_superglue.make_batch(rng, 1, CAP, W, H)
    t0n, t1n = np.asarray(t0[0]), np.asarray(t1[0])
    # build a log-P that puts ~all mass on the GT assignment
    good = np.full((CAP + 1, CAP + 1), -12.0, np.float32)
    for i in range(CAP):
        good[i, t0n[i]] = -1e-3
    for j in range(CAP):
        if t1n[j] == CAP:
            good[CAP, j] = -1e-3
    v0, v1 = b0.valid[0], b1.valid[0]
    loss_good = float(train_superglue.matching_loss(jnp.asarray(good), t0[0], t1[0], v0, v1))
    uniform = np.full((CAP + 1, CAP + 1), -np.log(CAP + 1.0), np.float32)
    loss_unif = float(train_superglue.matching_loss(jnp.asarray(uniform), t0[0], t1[0], v0, v1))
    assert loss_good < 0.01
    assert loss_unif > 3.0


# easy regime for the fast CI check: high matched-cosine (~0.89), few occlusions
EASY = dict(desc_noise=0.5, drop_frac=0.1)


def _accuracy(params, n_pairs=6, seed=99):
    """Fraction of GT matches recovered by the full decode on fresh data."""
    rng = np.random.default_rng(seed)
    b0, b1, t0, t1 = train_superglue.make_batch(rng, n_pairs, CAP, W, H, **EASY)
    hit = tot = 0
    for b in range(n_pairs):
        log_p = superglue.match_scores(
            params, jax.tree.map(lambda a: a[b], b0), jax.tree.map(lambda a: a[b], b1),
            W, H, SINKHORN, num_heads=HEADS,
        )
        m = decode_assignment(log_p, b0.valid[b], b1.valid[b], threshold=0.2)
        idx1 = np.asarray(m.idx1)
        mv = np.asarray(m.valid)
        gt = np.asarray(t0[b])
        real = np.asarray(b0.valid[b]) & (gt < CAP)
        tot += int(real.sum())
        hit += int((mv & real & (idx1 == gt)).sum())
    return hit / max(tot, 1)


def test_short_training_improves_matching():
    params0 = superglue.init_params(jax.random.PRNGKey(0), LAYERS, HEADS)
    acc_before = _accuracy(params0)
    losses = []
    params = train_superglue.train(
        steps=300, batch=4, capacity=CAP, width=W, height=H,
        num_layers=LAYERS, num_heads=HEADS, sinkhorn_iterations=SINKHORN,
        lr=1e-3, seed=1, log_every=0,
        params=params0, log_fn=lambda s: losses.append(s),
        batch_kwargs=EASY,
    )
    acc_after = _accuracy(params)
    # synthetic correspondences are descriptor-dominated: a briefly trained
    # net must already beat random init decisively (0.35-0.6 at ~300 steps
    # depending on the data-stream seed; random init decodes ~0)
    assert acc_after > acc_before + 0.25, (acc_before, acc_after)
    assert acc_after > 0.3, (acc_before, acc_after)


def test_make_batch_device_consistency():
    """On-device generator: tgt0/tgt1 are mutually inverse over kept points,
    matched descriptors have the prescribed cosine, and matched keypoints
    land where tgt0 says."""
    K = 32
    b0, b1, t0, t1 = train_superglue.make_batch_device(jax.random.PRNGKey(0), 3, K, W, H, desc_noise=0.5)
    for b in range(3):
        t0n, t1n = np.asarray(t0[b]), np.asarray(t1[b])
        kept = np.nonzero(t0n < K)[0]
        assert len(kept) > K // 3
        np.testing.assert_array_equal(t1n[t0n[kept]], kept)
        d0 = np.asarray(b0.desc[b])
        d1 = np.asarray(b1.desc[b])
        sims = np.sum(d0[kept] * d1[t0n[kept]], axis=-1)
        assert sims.min() > 0.8  # 1/sqrt(1+0.25) ~ 0.894
        # distractor slots point at the dustbin both ways
        distract = np.nonzero(t1n == K)[0]
        assert np.all(np.isin(distract, t0n[kept]) == False)  # noqa: E712


def test_train_on_device_runs_and_learns():
    """Two scanned chunks of on-device training must beat random init."""
    params0 = superglue.init_params(jax.random.PRNGKey(0), LAYERS, HEADS)
    acc_before = _accuracy(params0)
    params = train_superglue.train_on_device(
        steps=120, chunk=60, batch=4, capacity=CAP, width=W, height=H,
        num_layers=LAYERS, num_heads=HEADS, sinkhorn_iterations=SINKHORN,
        lr=1e-3, seed=5, log_fn=None, params=params0, batch_kwargs=EASY,
    )
    acc_after = _accuracy(params)
    assert all(np.all(np.isfinite(np.asarray(a))) for a in jax.tree_util.tree_leaves(params))
    assert acc_after > acc_before + 0.15, (acc_before, acc_after)


def test_native_checkpoint_roundtrip(tmp_path):
    params = superglue.init_params(jax.random.PRNGKey(3), LAYERS, HEADS)
    path = str(tmp_path / "sg.npz")
    superglue.save_npz(path, params)
    loaded = superglue.load_weights(path, LAYERS, HEADS)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
