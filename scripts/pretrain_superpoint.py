#!/usr/bin/env python
"""SuperPoint from-scratch pretraining CLI (synthetic shapes).

Produces a detector+descriptor checkpoint with no external weights:

  python scripts/pretrain_superpoint.py --out superpoint_scratch.npz \
      [--steps 5000] [--batch 16] [--size 128 128] [--lr 1e-3]
      [--platform cpu]

Chain with ``scripts/train_superpoint.py`` for domain adaptation, then
point ``superpoint.weights_path`` at the .npz.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="superpoint_scratch.npz")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, nargs=2, default=(128, 128), metavar=("H", "W"))
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lambda-desc", type=float, default=0.001)
    ap.add_argument("--init", default=None, help="warm-start from an existing .npz checkpoint")
    ap.add_argument("--flat-desc", action="store_true", help="descriptor pairs from flat shapes (no texture)")
    ap.add_argument("--desc-objective", default="nce", choices=["nce", "hinge"])
    ap.add_argument("--detector-only", action="store_true",
                    help="train only the detector head; keep the random backbone/descriptors")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ur_mvo_tpu.models import superpoint
    from ur_mvo_tpu.models.pretrain_superpoint import pretrain

    init_params = superpoint.load_torch_weights(args.init) if args.init else None
    params = pretrain(
        jax.random.PRNGKey(args.seed),
        steps=args.steps,
        batch=args.batch,
        H=args.size[0],
        W=args.size[1],
        lr=args.lr,
        seed=args.seed,
        log_every=max(1, args.steps // 50),
        lambda_desc=args.lambda_desc,
        init_params=init_params,
        textured_desc=not args.flat_desc,
        desc_objective=args.desc_objective,
        detector_only=args.detector_only,
    )
    superpoint.save_npz(params, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
