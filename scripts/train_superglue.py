#!/usr/bin/env python
"""Train the JAX SuperGlue matcher from scratch on synthetic warped
correspondences (see ``ur_mvo_tpu/models/train_superglue.py``).

  python scripts/train_superglue.py --out sg.npz [--steps 2000] [--batch 8]
      [--capacity 256] [--layers 9] [--heads 4] [--lr 1e-4] [--platform cpu]

The resulting .npz loads through ``superglue.weights_path`` in the config
(native flat-key format, auto-detected by ``models/superglue.load_weights``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=256)
    ap.add_argument("--size", type=int, nargs=2, default=(512, 640), metavar=("H", "W"))
    ap.add_argument("--layers", type=int, default=9)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--sinkhorn", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--init", default=None, help="warm-start checkpoint (.npz)")
    ap.add_argument("--platform", default=None, choices=(None, "cpu", "tpu"))
    ap.add_argument("--on-device", action="store_true",
                    help="lax.scan training with on-device batch generation "
                         "(no per-step host transfers; use on TPU)")
    ap.add_argument("--chunk", type=int, default=100, help="steps per XLA program with --on-device")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ur_mvo_tpu.models import superglue, train_superglue

    params = None
    if args.init:
        params = superglue.load_weights(args.init, args.layers, args.heads)
    H, W = args.size
    train_fn = train_superglue.train_on_device if args.on_device else train_superglue.train
    kwargs = {"chunk": args.chunk} if args.on_device else {}
    params = train_fn(
        steps=args.steps,
        batch=args.batch,
        capacity=args.capacity,
        width=W,
        height=H,
        num_layers=args.layers,
        num_heads=args.heads,
        sinkhorn_iterations=args.sinkhorn,
        lr=args.lr,
        seed=args.seed,
        params=params,
        **kwargs,
    )
    superglue.save_npz(args.out, params)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
