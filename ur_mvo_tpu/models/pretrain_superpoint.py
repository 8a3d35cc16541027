"""SuperPoint pretraining from scratch on synthetic geometry.

The reference assumes a pretrained ``superpoint_v1.pth`` exists and only
fine-tunes the descriptor head (``/root/reference/superpoint/train.py``).
This module closes the remaining gap to a fully self-sufficient
framework: MagicLeap-style synthetic-shapes pretraining — random
polygons / lines / ellipses / checkerboards rendered with exact corner
ground truth, a 65-way per-cell detector cross-entropy (64 positions +
dustbin), combined with the dense descriptor loss on homography-warped
pairs — so usable detector+descriptor weights can be produced entirely
inside this repo (no external checkpoints), then domain-adapted with
``train_superpoint``.

Everything (rendering excepted) is jitted JAX; rendering is vectorized
numpy on the host feeding the device train step.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ur_mvo_tpu.models import superpoint
from ur_mvo_tpu.models.train_superpoint import descriptor_loss, make_pair

GRID = 8


# ---------------------------------------------------------------------------
# Synthetic-shapes rendering (host-side numpy)
# ---------------------------------------------------------------------------

def _draw_line(img, pts, x0, y0, x1, y1, value):
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1))
    xs = np.linspace(x0, x1, 2 * n)
    ys = np.linspace(y0, y1, 2 * n)
    H, W = img.shape
    xi = np.clip(xs.round().astype(int), 0, W - 1)
    yi = np.clip(ys.round().astype(int), 0, H - 1)
    img[yi, xi] = value
    pts.append((x0, y0))
    pts.append((x1, y1))


def render_shapes(rng: np.random.Generator, H: int, W: int) -> Tuple[np.ndarray, np.ndarray]:
    """One synthetic image + (N, 2) ground-truth corner points (x, y)."""
    img = np.full((H, W), rng.uniform(0.1, 0.5), np.float32)
    # mild background gradient
    img += np.linspace(0, rng.uniform(-0.15, 0.15), W)[None, :]
    corners = []

    for _ in range(rng.integers(2, 5)):
        kind = rng.integers(0, 3)
        value = rng.uniform(0.0, 1.0)
        if kind == 0:  # polygon (triangle/quad)
            k = rng.integers(3, 5)
            cx, cy = rng.uniform(0.15, 0.85) * W, rng.uniform(0.15, 0.85) * H
            radius = rng.uniform(0.08, 0.25) * min(H, W)
            angles = np.sort(rng.uniform(0, 2 * np.pi, k))
            xs = cx + radius * np.cos(angles)
            ys = cy + radius * np.sin(angles)
            for i in range(k):
                _draw_line(img, corners, xs[i], ys[i], xs[(i + 1) % k], ys[(i + 1) % k], value)
        elif kind == 1:  # line segment
            x0, y0 = rng.uniform(0.1, 0.9) * W, rng.uniform(0.1, 0.9) * H
            x1, y1 = rng.uniform(0.1, 0.9) * W, rng.uniform(0.1, 0.9) * H
            _draw_line(img, corners, x0, y0, x1, y1, value)
        else:  # filled rectangle (4 corners)
            x0, y0 = rng.uniform(0.1, 0.7) * W, rng.uniform(0.1, 0.7) * H
            w = rng.uniform(0.1, 0.25) * W
            h = rng.uniform(0.1, 0.25) * H
            xi0, yi0 = int(x0), int(y0)
            xi1, yi1 = min(int(x0 + w), W - 1), min(int(y0 + h), H - 1)
            img[yi0:yi1, xi0:xi1] = value
            for c in [(x0, y0), (x0 + w, y0), (x0, y0 + h), (x0 + w, y0 + h)]:
                corners.append(c)

    img = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1).astype(np.float32)
    pts = np.asarray(corners, np.float32) if corners else np.zeros((0, 2), np.float32)
    inb = (pts[:, 0] >= 0) & (pts[:, 0] < W) & (pts[:, 1] >= 0) & (pts[:, 1] < H)
    return img, pts[inb]


def _resize_bilinear_np(a: np.ndarray, H: int, W: int) -> np.ndarray:
    """Pure-numpy bilinear upsample of a small 2D grid."""
    h, w = a.shape
    ys = np.linspace(0, h - 1, H)
    xs = np.linspace(0, w - 1, W)
    y0 = np.clip(ys.astype(int), 0, h - 2)
    x0 = np.clip(xs.astype(int), 0, w - 2)
    dy = (ys - y0)[:, None]
    dx = (xs - x0)[None, :]
    return (
        a[y0][:, x0] * (1 - dy) * (1 - dx)
        + a[y0][:, x0 + 1] * (1 - dy) * dx
        + a[y0 + 1][:, x0] * dy * (1 - dx)
        + a[y0 + 1][:, x0 + 1] * dy * dx
    )


def render_texture(rng: np.random.Generator, H: int, W: int) -> np.ndarray:
    """Multi-octave value-noise texture in [0, 1].

    Descriptor training needs *texture*: flat synthetic shapes give the
    descriptor head nothing local to discriminate, and a head trained on
    them transfers worse than random projections on textured scenes
    (measured: ~100 px median mutual-NN displacement vs 8 px for random
    init on a rendered textured plane). The homography-pair descriptor
    loss is fully self-supervised, so any image content works — octave
    noise supplies dense, scale-diverse structure."""
    img = np.zeros((H, W), np.float32)
    amp_total = 0.0
    for octave, amp in ((4, 1.0), (8, 0.6), (16, 0.35), (32, 0.2)):
        g = rng.uniform(0, 1, (octave, octave)).astype(np.float32)
        img += amp * _resize_bilinear_np(g, H, W)
        amp_total += amp
    # blocky (nearest-neighbor) octave: piecewise-constant noise with
    # sharp edges, the texture class of block-noise renders/sensor
    # mosaics — smooth octaves alone teach descriptors that transfer
    # poorly to high-frequency content
    block = rng.integers(2, 5)
    gh, gw = (H + block - 1) // block, (W + block - 1) // block
    g = rng.uniform(0, 1, (gh, gw)).astype(np.float32)
    amp = rng.uniform(0.3, 0.8)
    img += amp * np.kron(g, np.ones((block, block), np.float32))[:H, :W]
    amp_total += amp
    return img / amp_total


def make_texture_batch(rng: np.random.Generator, batch: int, H: int, W: int) -> np.ndarray:
    """Images for the descriptor pairs: synthetic shapes blended over
    octave-noise texture (shapes keep corner structure in-domain; the
    texture provides discriminative local appearance)."""
    imgs = np.zeros((batch, H, W), np.float32)
    for i in range(batch):
        shapes, _ = render_shapes(rng, H, W)
        tex = render_texture(rng, H, W)
        alpha = rng.uniform(0.35, 0.65)
        imgs[i] = np.clip(alpha * shapes + (1 - alpha) * tex, 0, 1)
    return imgs


def corners_to_cell_labels(pts: np.ndarray, H: int, W: int) -> np.ndarray:
    """(Hc, Wc) int labels in [0, 65): 8*dy+dx of the corner inside its
    cell, or 64 (dustbin) for empty cells — the SuperPoint detector
    target."""
    Hc, Wc = H // GRID, W // GRID
    labels = np.full((Hc, Wc), 64, np.int32)
    for x, y in pts:
        xi, yi = int(x), int(y)
        if 0 <= xi < W and 0 <= yi < H:
            labels[yi // GRID, xi // GRID] = (yi % GRID) * GRID + (xi % GRID)
    return labels


def make_pretrain_batch(rng: np.random.Generator, batch: int, H: int, W: int) -> Dict[str, np.ndarray]:
    imgs = np.zeros((batch, H, W), np.float32)
    labels = np.zeros((batch, H // GRID, W // GRID), np.int32)
    for i in range(batch):
        img, pts = render_shapes(rng, H, W)
        imgs[i] = img
        labels[i] = corners_to_cell_labels(pts, H, W)
    return {"image": imgs, "labels": labels}


# ---------------------------------------------------------------------------
# Losses + train step
# ---------------------------------------------------------------------------

def detector_loss(params: Dict[str, Any], images: jax.Array, labels: jax.Array) -> jax.Array:
    """65-way per-cell cross-entropy on the detector logits."""
    feat = superpoint.backbone(params, images[..., None])
    x = jax.nn.relu(superpoint._conv(feat, params["convPa"]))
    logits = superpoint._conv(x, params["convPb"])  # (B, Hc, Wc, 65)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    # balance: corner cells are rare; upweight them
    is_corner = labels != 64
    w = jnp.where(is_corner, 10.0, 1.0)
    return jnp.sum(nll * w) / jnp.sum(w)


def pretrain_loss(params, det_batch, desc_batch, lambda_desc: float = 0.001, desc_objective: str = "nce",
                  with_detector: bool = True):
    """Joint detector + descriptor loss (descriptor term uses the
    homography Siamese pairs of ``train_superpoint``).

    ``desc_objective``: "nce" (InfoNCE over cell correspondences — the
    effective from-scratch signal) or "hinge" (the reference's
    double-normalized hinge, kept for parity experiments)."""
    det = detector_loss(params, det_batch["image"], det_batch["labels"]) if with_detector else jnp.zeros(())
    if lambda_desc == 0.0:
        # detector-only mode: skip the Siamese descriptor forward entirely
        return det, (det, jnp.zeros(()))
    d0 = superpoint.descriptor_head(params, superpoint.backbone(params, desc_batch["orig"][..., None]))
    d1 = superpoint.descriptor_head(params, superpoint.backbone(params, desc_batch["warped"][..., None]))
    if desc_objective == "nce":
        from ur_mvo_tpu.models.train_superpoint import descriptor_loss_nce

        desc = descriptor_loss_nce(d0, d1, desc_batch["H"], desc_batch["mask"])
    else:
        desc = descriptor_loss(d0, d1, desc_batch["H"], desc_batch["mask"])
    return det + lambda_desc * desc, (det, desc)


def detector_head_mask(params):
    """Trainable mask: detector head (convPa/convPb) only.

    Training the shared VGG backbone for cornerness collapses the
    feature diversity the descriptor path needs — measured: matching
    with a *random* descriptor head on a detector-trained backbone is as
    bad as the fully-trained descriptors (~90 px median mutual-NN
    displacement on a textured render), while a fully random network
    matches coherently (~8 px; random projections of raw patches are
    strong descriptors). Freezing the backbone at its random init keeps
    that property and still lets the detector head learn corners."""
    return {name: jax.tree.map(lambda _: name in ("convPa", "convPb"), p) for name, p in params.items()}


def descriptor_head_mask(params):
    """Trainable mask: descriptor head (convDa/convDb) only — the
    complement experiment to :func:`detector_head_mask`: keep the random
    backbone's feature diversity AND the trained detector, and let only
    the descriptor projection learn warp/photometric invariance.

    Measured (2000 textured-NCE steps warm-started from the shipped v3,
    GT-verified mutual-NN on the textured-plane render): 211 matches/pair
    at 2.09 px median / 60.4% inlier@3px — MORE matches but LOWER
    precision than v3's random projections (184 / 1.79 px / 67.6%; a
    fully random net scores 215 / 1.14 px / 87.4%). Synthetic-trained
    descriptors still lose to random projections cross-domain even at
    head-only granularity, so the shipped checkpoint keeps the random
    head; this scope exists for the reference's real use case — domain
    adaptation on actual target imagery (train.py:12), where in-domain
    is the point."""
    return {name: jax.tree.map(lambda _: name in ("convDa", "convDb"), p) for name, p in params.items()}


def make_pretrain_step(tx: optax.GradientTransformation, lambda_desc: float = 0.001, desc_objective: str = "nce",
                       with_detector: bool = True):
    @jax.jit
    def step(params, opt_state, det_batch, desc_batch):
        (loss, (det, desc)), grads = jax.value_and_grad(pretrain_loss, has_aux=True)(
            params, det_batch, desc_batch, lambda_desc, desc_objective, with_detector
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, det, desc

    return step


def pretrain(
    key: jax.Array,
    steps: int = 1000,
    batch: int = 8,
    H: int = 128,
    W: int = 128,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 100,
    lambda_desc: float = 0.001,
    init_params=None,
    textured_desc: bool = True,
    desc_objective: str = "nce",
    detector_only: bool = False,
    desc_head_only: bool = False,
):
    """Run pretraining; returns trained params.

    ``init_params`` warm-starts from an existing checkpoint (e.g. to
    re-train the descriptor head on textured pairs after the detector
    converged). ``textured_desc`` feeds octave-noise-textured images to
    the descriptor pairs instead of flat synthetic shapes.
    ``detector_only`` freezes everything except the detector head,
    preserving the random backbone/descriptors (see
    :func:`detector_head_mask` for why that matches better)."""
    from ur_mvo_tpu.models.train_superpoint import make_batch as make_desc_batch

    params = init_params if init_params is not None else superpoint.init_params(key)
    if detector_only:
        tx = optax.multi_transform(
            {True: optax.adam(lr), False: optax.set_to_zero()},
            param_labels=detector_head_mask,
        )
    elif desc_head_only:
        tx = optax.multi_transform(
            {True: optax.adam(lr), False: optax.set_to_zero()},
            param_labels=descriptor_head_mask,
        )
    else:
        tx = optax.adam(lr)
    opt_state = tx.init(params)
    step = make_pretrain_step(
        tx,
        0.0 if detector_only else (1.0 if desc_head_only else lambda_desc),
        desc_objective,
        with_detector=not desc_head_only,
    )
    rng = np.random.default_rng(seed)
    jkey = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        det_batch = jax.tree.map(jnp.asarray, make_pretrain_batch(rng, batch, H, W))
        jkey, sub = jax.random.split(jkey)
        desc_imgs = (
            jnp.asarray(make_texture_batch(rng, batch, H, W)) if textured_desc else det_batch["image"]
        )
        # large translations so absolute position cannot shortcut the
        # correspondence task (see make_pair)
        desc_batch = make_desc_batch(sub, desc_imgs, translation=0.35, scale=0.25, rotation=0.3)
        params, opt_state, loss, det, desc = step(params, opt_state, det_batch, desc_batch)
        if log_every and (i + 1) % log_every == 0:
            print(f"pretrain step {i + 1}/{steps}: loss {float(loss):.4f} (det {float(det):.4f} desc {float(desc):.4f})")
    return params
