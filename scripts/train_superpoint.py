#!/usr/bin/env python
"""SuperPoint descriptor fine-tuning CLI (domain adaptation).

Counterpart of the reference's offline trainer
(``/root/reference/superpoint/train.py``): loads a base checkpoint
(torch ``superpoint_v1.pth`` or ``.npz``), builds Siamese
homography-warped pairs with photometric augmentation from a directory of
grayscale images, trains ONLY the descriptor head (convDa/convDb) with
the dense hinge-contrastive loss, and saves an ``.npz`` checkpoint the
engine loads via ``superpoint.weights_path``. Runs data-parallel over all
local devices.

Usage:
  python scripts/train_superpoint.py --images <dir> [--weights base.pth]
      [--out model_ft.npz] [--epochs 100] [--batch 8] [--crop 256 320]
      [--lr 1e-3] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="directory of grayscale images (png/pgm/npy)")
    ap.add_argument("--weights", default=None, help="base checkpoint (.pth/.npz); random init if omitted")
    ap.add_argument("--out", default="superpoint_ft.npz")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, nargs=2, default=(256, 320), metavar=("H", "W"))
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--steps-per-epoch", type=int, default=50)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from ur_mvo_tpu.dataset import load_gray
    from ur_mvo_tpu.models import superpoint
    from ur_mvo_tpu.models.train_superpoint import make_batch, make_optimizer
    from ur_mvo_tpu.parallel.mesh import make_mesh
    from ur_mvo_tpu.parallel.train_step import make_dp_train_step

    names = sorted(
        f for f in os.listdir(args.images) if f.split(".")[-1].lower() in ("png", "jpg", "jpeg", "pgm", "npy")
    )
    assert names, f"no images in {args.images}"
    H, W = args.crop
    rng = np.random.default_rng(0)

    def sample_crops(n):
        out = np.empty((n, H, W), np.float32)
        for i in range(n):
            img = load_gray(os.path.join(args.images, names[rng.integers(len(names))]))
            img = img.astype(np.float32) / 255.0
            if img.shape[0] < H or img.shape[1] < W:
                pad = np.zeros((max(H, img.shape[0]), max(W, img.shape[1])), np.float32)
                pad[: img.shape[0], : img.shape[1]] = img
                img = pad
            r = rng.integers(0, img.shape[0] - H + 1)
            c = rng.integers(0, img.shape[1] - W + 1)
            out[i] = img[r : r + H, c : c + W]
        return out

    params = (
        superpoint.load_torch_weights(args.weights)
        if args.weights
        else superpoint.init_params(jax.random.PRNGKey(0))
    )
    tx = make_optimizer(args.lr)
    opt_state = tx.init(params)
    mesh = make_mesh()
    step = make_dp_train_step(tx, mesh)
    print(f"training on {len(jax.devices())} device(s), {len(names)} images", file=sys.stderr)

    key = jax.random.PRNGKey(1)
    for epoch in range(args.epochs):
        losses = []
        for _ in range(args.steps_per_epoch):
            key, sub = jax.random.split(key)
            batch = make_batch(sub, jnp.asarray(sample_crops(args.batch)))
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        print(f"epoch {epoch + 1}/{args.epochs}  loss {np.mean(losses):.4f}", file=sys.stderr)
        superpoint.save_npz(params, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
