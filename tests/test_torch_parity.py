"""Numeric parity of core ops against torch (CPU) ground truth.

Real SuperPoint/SuperGlue checkpoints are not available in this
environment, so weight-fidelity is verified at the op level: our NHWC
convolution, max-pooling, NMS building blocks and descriptor grid
sampling must match torch's semantics exactly — then a checkpoint import
is just a layout transpose (tested separately via synthetic state dicts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_conv2d_matches_torch():
    from ur_mvo_tpu.models.superpoint import _conv

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 16, 20, 3)).astype(np.float32)  # NHWC
    w = rng.normal(size=(3, 3, 3, 8)).astype(np.float32)  # HWIO
    b = rng.normal(size=(8,)).astype(np.float32)
    ours = np.asarray(_conv(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
    ref = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_maxpool_matches_torch():
    from ur_mvo_tpu.models.superpoint import _pool2

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 16, 20, 4)).astype(np.float32)
    ours = np.asarray(_pool2(jnp.asarray(x)))
    ref = torch.nn.functional.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2, 2)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_simple_nms_matches_torch_impl():
    """Our NMS vs an independent torch formulation of the same maxpool
    trick (radius 4, 2 refinement rounds)."""
    from ur_mvo_tpu.ops.nms import simple_nms

    rng = np.random.default_rng(2)
    scores = rng.random((48, 64)).astype(np.float32)
    ours = np.asarray(simple_nms(jnp.asarray(scores), radius=4))

    t = torch.from_numpy(scores)[None]
    r = 4

    def pool(x):
        return torch.nn.functional.max_pool2d(x[None], 2 * r + 1, stride=1, padding=r)[0]

    zeros = torch.zeros_like(t)
    max_mask = t == pool(t)
    for _ in range(2):
        supp = pool(max_mask.float()) > 0
        supp_scores = torch.where(supp, zeros, t)
        new_max = supp_scores == pool(supp_scores)
        max_mask = max_mask | (new_max & (~supp))
    ref = torch.where(max_mask, t, zeros)[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_grid_sample_matches_torch():
    from ur_mvo_tpu.ops.gridsample import grid_sample_nearest_corners

    rng = np.random.default_rng(3)
    fm = rng.normal(size=(10, 12, 5)).astype(np.float32)  # HWC
    pts = np.stack(
        [rng.uniform(-1, 1, 30), rng.uniform(-1, 1, 30)], axis=1
    ).astype(np.float32)
    ours = np.asarray(grid_sample_nearest_corners(jnp.asarray(fm), jnp.asarray(pts)))
    inp = torch.from_numpy(fm.transpose(2, 0, 1))[None]  # NCHW
    grid = torch.from_numpy(pts)[None, None]  # (1,1,N,2) xy
    ref = torch.nn.functional.grid_sample(
        inp, grid, mode="bilinear", align_corners=True, padding_mode="border"
    )[0, :, 0].numpy().T
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_superpoint_torch_statedict_import_roundtrip(tmp_path):
    """A torch-format state dict (OIHW) imports into the NHWC pytree and
    the conv outputs agree with torch's own execution."""
    from ur_mvo_tpu.models import superpoint

    rng = np.random.default_rng(4)
    state = {}
    # reference layer names/shapes (SP/model.py architecture)
    dims = [("conv1a", 1, 64, 3), ("conv1b", 64, 64, 3), ("conv2a", 64, 64, 3),
            ("conv2b", 64, 64, 3), ("conv3a", 64, 128, 3), ("conv3b", 128, 128, 3),
            ("conv4a", 128, 128, 3), ("conv4b", 128, 128, 3),
            ("convPa", 128, 256, 3), ("convPb", 256, 65, 1),
            ("convDa", 128, 256, 3), ("convDb", 256, 256, 1)]
    for name, cin, cout, k in dims:
        state[f"{name}.weight"] = torch.from_numpy(
            (rng.normal(size=(cout, cin, k, k)) * 0.05).astype(np.float32)
        )
        state[f"{name}.bias"] = torch.from_numpy(rng.normal(size=(cout,)).astype(np.float32) * 0.01)
    path = str(tmp_path / "sp.pth")
    torch.save(state, path)
    params = superpoint.load_torch_weights(path)

    # compare one encoder stage against torch execution
    x = rng.normal(size=(1, 1, 24, 32)).astype(np.float32)
    ref = torch.nn.functional.relu(
        torch.nn.functional.conv2d(torch.from_numpy(x), state["conv1a.weight"], state["conv1a.bias"], padding=1)
    ).numpy()
    ours = np.asarray(
        jax.nn.relu(
            superpoint._conv(jnp.asarray(x.transpose(0, 2, 3, 1)), params["conv1a"])
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_superglue_bn_folding():
    """BatchNorm folding in the SuperGlue import: folded scale/shift must
    reproduce torch's BatchNorm1d in eval mode."""
    from ur_mvo_tpu.models import superglue

    rng = np.random.default_rng(5)
    C = 16
    state = {}
    # one Conv1d + BN pair in the expected layout
    w = rng.normal(size=(C, 8, 1)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    gamma = rng.uniform(0.5, 2.0, C).astype(np.float32)
    beta = rng.normal(size=(C,)).astype(np.float32)
    mean = rng.normal(size=(C,)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, C).astype(np.float32)

    import numpy as _np

    eps = 1e-5
    scale = gamma / _np.sqrt(var + eps)
    shift = beta - mean * scale

    x = rng.normal(size=(4, 8)).astype(np.float32)
    ours = (x @ w[:, :, 0].T + b) * scale + shift

    bn = torch.nn.BatchNorm1d(C).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(gamma))
        bn.bias.copy_(torch.from_numpy(beta))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
        conv = torch.nn.Conv1d(8, C, 1)
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
        ref = bn(conv(torch.from_numpy(x.T[None]))).numpy()[0].T
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_backbone_folded_matches_plain():
    """The column space-to-depth backbone (full-lane TPU layout,
    superpoint._conv_folded) must be numerically identical to the plain
    stage-by-stage conv/pool path it replaces."""
    from ur_mvo_tpu.models import superpoint as sp

    p = sp.init_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 80, 1))
    x = img
    for name, _, _, _ in sp._ENCODER:
        x = jax.nn.relu(sp._conv(x, p[name]))
        if name in sp._POOL_AFTER:
            x = sp._pool2(x)
    out = sp.backbone(p, img, folded=True)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-5)
    # odd sizes fall back to the plain path
    assert sp.backbone(p, jnp.zeros((1, 60, 68, 1)), folded=True).shape == (1, 7, 8, 128)
    # gradients flow (pretraining trains through the backbone)
    g = jax.grad(lambda pp: jnp.sum(sp.backbone(pp, img, folded=True) ** 2))(p)
    assert np.isfinite(float(jnp.sum(g["conv1a"]["w"])))


def test_im2col_formulations_match_plain():
    """The im2col conv and the fused im2col heads (TPU formulations) must
    be numerically identical to the plain conv / separate-head paths."""
    from ur_mvo_tpu.models import superpoint as sp

    p = sp.init_params(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 24, 128))
    a = jax.nn.relu(sp._conv(x, p["conv4a"]))
    b = jax.nn.relu(sp._conv_im2col(x, p["conv4a"]))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)

    s_ref = sp.detector_head(p, x)
    d_ref = sp.descriptor_head(p, x)
    s, d = sp._heads_im2col(p, x)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=2e-5)
