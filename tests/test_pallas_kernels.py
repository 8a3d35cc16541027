"""Pallas kernels (interpreter mode on CPU) vs the XLA reference ops."""

import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.ops.pallas_kernels import log_optimal_transport_pallas
from ur_mvo_tpu.ops.sinkhorn import log_optimal_transport


def test_pallas_sinkhorn_matches_xla():
    key = jax.random.PRNGKey(0)
    M, N = 48, 40
    scores = jax.random.normal(key, (M, N))
    v0 = jnp.arange(M) < 30
    v1 = jnp.arange(N) < 25
    alpha = jnp.asarray(0.7)
    Z_ref = log_optimal_transport(scores, v0, v1, alpha, iterations=30)
    Z_pal = log_optimal_transport_pallas(scores, v0, v1, alpha, iterations=30, interpret=True)
    # compare valid block + dustbins
    ref = np.asarray(Z_ref)
    pal = np.asarray(Z_pal)
    mask = np.asarray(jnp.concatenate([v0, jnp.array([True])]))[:, None] & np.asarray(
        jnp.concatenate([v1, jnp.array([True])])
    )[None, :]
    np.testing.assert_allclose(pal[mask], ref[mask], atol=1e-4)


def test_pallas_sinkhorn_full_valid():
    key = jax.random.PRNGKey(1)
    M = N = 33  # deliberately unaligned
    scores = jax.random.normal(key, (M, N)) * 2.0
    v = jnp.ones((M,), bool)
    Z_ref = log_optimal_transport(scores, v, v, jnp.asarray(1.0), iterations=50)
    Z_pal = log_optimal_transport_pallas(scores, v, v, jnp.asarray(1.0), iterations=50, interpret=True)
    np.testing.assert_allclose(np.asarray(Z_pal), np.asarray(Z_ref), atol=1e-4)


def test_pallas_attention_matches_xla():
    from ur_mvo_tpu.ops.pallas_kernels import attention_pallas

    key = jax.random.PRNGKey(2)
    K, H, D = 64, 4, 32
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (K, H, D))
    k = jax.random.normal(k2, (K, H, D))
    v = jax.random.normal(k3, (K, H, D))
    valid = jnp.arange(K) < 40

    # XLA reference (same math as superglue._attention core)
    logits = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(jnp.asarray(D, jnp.float32))
    logits = jnp.where(valid[None, None, :], logits, -1e9)
    ref = jnp.einsum("hqk,khd->qhd", jax.nn.softmax(logits, -1), v)

    out = attention_pallas(q, k, v, valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_pose_opt_matches_xla():
    """The single-program Pallas pose optimizer (interpret mode on CPU)
    must match the XLA 4x10 schedule bit-closely, including Huber, the
    stereo rows and the per-round chi^2 reclassification."""
    import numpy as np

    from ur_mvo_tpu.ops import lie
    from ur_mvo_tpu.ops.pallas_pose import optimize_pose_pallas
    from ur_mvo_tpu.ops.pose_opt import PoseObs, optimize_pose

    rng = np.random.default_rng(3)
    N = 300
    X = rng.uniform([-2, -2, 4], [2, 2, 9], (N, 3)).astype(np.float32)
    R_true = np.asarray(lie.so3_exp(jnp.array([0.03, -0.05, 0.02])))
    t_true = np.array([0.1, -0.05, 0.03], np.float32)
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    bf = 40.0
    pc = X @ R_true.T + t_true
    u = fx * pc[:, 0] / pc[:, 2] + cx + rng.normal(0, 0.5, N)
    v = fy * pc[:, 1] / pc[:, 2] + cy + rng.normal(0, 0.5, N)
    ur = u - bf / pc[:, 2]
    ur[: N // 2] = -1.0  # half mono
    u[:30] += rng.uniform(20, 60, 30)  # outliers
    uv = np.stack([u, v, ur], 1).astype(np.float32)
    valid = np.ones(N, bool)
    valid[280:] = False

    obs = PoseObs(X=jnp.asarray(X), uv=jnp.asarray(uv), valid=jnp.asarray(valid))
    res = optimize_pose(jnp.eye(3), jnp.zeros(3), obs, fx, fy, cx, cy, bf)
    Rp, tp, inlp = optimize_pose_pallas(
        jnp.eye(3), jnp.zeros(3), jnp.asarray(X), jnp.asarray(uv), jnp.asarray(valid),
        fx, fy, cx, cy, bf, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(res.R_cw), np.asarray(Rp), atol=2e-5)
    np.testing.assert_allclose(np.asarray(res.t_cw), np.asarray(tp), atol=2e-4)
    assert (np.asarray(res.inliers) == np.asarray(inlp)).mean() > 0.99
    # converged to the true pose
    assert np.abs(np.asarray(Rp) - R_true).max() < 5e-3
    assert np.abs(np.asarray(tp) - t_true).max() < 2e-2


def test_stage12_slab_conv_matches_xla():
    """The Pallas slab conv kernels (interpret mode) must match the plain
    XLA stage-1/2 path to bf16 tolerance, and the full backbone pallas
    path must match the folded backbone; gradients flow via the XLA VJP."""
    import jax.numpy as jnp
    import numpy as np

    from ur_mvo_tpu.models import superpoint as S

    p = S.init_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 256, 1))
    p12 = {k: p[k] for k in ("conv1a", "conv1b", "conv2a", "conv2b")}
    ref = S._stage12_xla(p12, img.astype(jnp.bfloat16)).astype(jnp.float32)
    out = S._stage12_pallas(p12, img.astype(jnp.bfloat16)).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(out) / scale, np.asarray(ref) / scale, atol=6e-3)

    # full backbone: folded reference runs f32 here while the kernels
    # compute bf16 internally -> bf16-accumulation tolerance
    full_ref = S.backbone(p, img, folded=True, pallas=False)
    full_pl = S.backbone(p, img, pallas=True)
    scale = float(jnp.max(jnp.abs(full_ref)))
    np.testing.assert_allclose(
        np.asarray(full_pl) / scale, np.asarray(full_ref) / scale, atol=2e-2
    )

    g = jax.grad(lambda pp: jnp.sum(S.backbone(pp, img, pallas=True) ** 2))(p)
    assert np.isfinite(float(jnp.sum(g["conv1a"]["w"]))) and float(jnp.sum(jnp.abs(g["conv2b"]["w"]))) > 0


def test_env_gate_semantics(monkeypatch):
    """One shared parser for all TPU-formulation flags: master=0 force-
    disables; var=0/false forces off, other values force on; unset
    defaults to backend-is-TPU (false on the CPU test backend)."""
    from ur_mvo_tpu.ops.pallas_kernels import env_gate

    monkeypatch.delenv("URMVO_PALLAS", raising=False)
    monkeypatch.delenv("URMVO_TESTFLAG", raising=False)
    assert env_gate("URMVO_TESTFLAG") is False  # CPU default
    monkeypatch.setenv("URMVO_TESTFLAG", "1")
    assert env_gate("URMVO_TESTFLAG") is True
    monkeypatch.setenv("URMVO_TESTFLAG", "false")
    assert env_gate("URMVO_TESTFLAG") is False
    monkeypatch.setenv("URMVO_TESTFLAG", "1")
    monkeypatch.setenv("URMVO_PALLAS", "0")
    assert env_gate("URMVO_TESTFLAG") is False  # master wins
    assert env_gate("URMVO_TESTFLAG", master=None) is True


def test_stage123_slab_conv_matches_xla():
    """Stage-3 slab kernel + im2col stage 4 (the H%128==0 backbone path,
    interpret mode) must match the plain XLA stages 1-3 / folded backbone
    to bf16 tolerance; gradients flow via the XLA VJP."""
    import jax.numpy as jnp
    import numpy as np

    from ur_mvo_tpu.models import superpoint as S

    p = S.init_params(jax.random.PRNGKey(2))
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 128, 256, 1))
    keys = ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b")
    p123 = {k: p[k] for k in keys}
    ref = S._stage123_xla(p123, img.astype(jnp.bfloat16)).astype(jnp.float32)
    out = S._stage123_pallas(p123, img.astype(jnp.bfloat16)).astype(jnp.float32)
    assert out.shape == ref.shape == (1, 16, 32, 128)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(out) / scale, np.asarray(ref) / scale, atol=8e-3)

    full_ref = S.backbone(p, img, folded=True, pallas=False)
    full_pl = S.backbone(p, img, pallas=True)
    scale = float(jnp.max(jnp.abs(full_ref)))
    np.testing.assert_allclose(
        np.asarray(full_pl) / scale, np.asarray(full_ref) / scale, atol=2e-2
    )
    g = jax.grad(lambda pp: jnp.sum(S.backbone(pp, img, pallas=True) ** 2))(p)
    assert float(jnp.sum(jnp.abs(g["conv3b"]["w"]))) > 0
