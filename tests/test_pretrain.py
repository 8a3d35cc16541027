"""SuperPoint from-scratch pretraining: the detector must learn to fire
on synthetic corners (loss drops, corner cells ranked above background)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ur_mvo_tpu.models import superpoint
from ur_mvo_tpu.models.pretrain_superpoint import (
    corners_to_cell_labels,
    detector_loss,
    make_pretrain_batch,
    pretrain,
    render_shapes,
)


def test_render_shapes_and_labels():
    rng = np.random.default_rng(0)
    img, pts = render_shapes(rng, 64, 96)
    assert img.shape == (64, 96)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert len(pts) >= 3
    labels = corners_to_cell_labels(pts, 64, 96)
    assert labels.shape == (8, 12)
    assert (labels != 64).sum() >= 2  # some corner cells
    # label decodes back to the right cell-local position
    ys, xs = np.nonzero(labels != 64)
    lab = labels[ys[0], xs[0]]
    assert 0 <= lab < 64


@pytest.mark.slow
def test_pretrain_learns_corners():
    """Short-budget gate: the loss must drop vs random init and corner
    cells must start out-scoring background (full convergence needs
    thousands of steps — that is the CLI's job, not the test's)."""
    params = pretrain(jax.random.PRNGKey(0), steps=100, batch=8, H=64, W=64, lr=2e-3, log_every=0)
    rng = np.random.default_rng(123)
    batch = jax.tree.map(jnp.asarray, make_pretrain_batch(rng, 8, 64, 64))
    trained = float(detector_loss(params, batch["image"], batch["labels"]))
    p0 = superpoint.init_params(jax.random.PRNGKey(1))
    untrained = float(detector_loss(p0, batch["image"], batch["labels"]))
    assert trained < 0.85 * untrained, (trained, untrained)

    # detector scores at corner cells must rank above background cells
    scores, _ = superpoint.forward(params, batch["image"][..., None])
    s = np.asarray(scores)
    labels = np.asarray(batch["labels"])
    corner_scores, bg_scores = [], []
    for b in range(s.shape[0]):
        cell_max = s[b].reshape(8, 8, 8, 8).max(axis=(1, 3))
        corner_scores.extend(cell_max[labels[b] != 64].tolist())
        bg_scores.extend(cell_max[labels[b] == 64].tolist())
    assert np.mean(corner_scores) > 1.3 * np.mean(bg_scores)
