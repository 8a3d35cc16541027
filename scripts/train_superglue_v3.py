#!/usr/bin/env python
"""Train SuperGlue against the shipped v3 SuperPoint on rendered scenes.

The reference's matcher IS SuperGlue (``/root/reference/src/super_glue.cpp:
166-241``) but its trained weights are not shipped anywhere in this
environment, so round 1 fell back to mutual-NN. This script closes that
gap end-to-end with in-repo supervision:

1. ``data``  — render textured single-plane and 3D multi-plane scenes
   (``ur_mvo_tpu/utils/synthscene.py``), extract feature banks with the
   shipped ``weights/superpoint_scratch_v3.npz`` detector, and label
   ground-truth partial assignments by exact depth transfer with
   occlusion checks. Runs on CPU.
2. ``train`` — train the full JAX SuperGlue (``models/superglue.py``) on
   those banks with the published assignment NLL
   (``models/train_superglue.py::batch_loss``), minibatches gathered
   on-device inside a ``lax.scan`` so a relay-attached TPU trains at
   device speed. Mirror augmentation (x/y flips) quadruples the data.
3. ``eval``  — held-out scenes: decoded-match precision/recall vs GT and
   the mutual-NN baseline next to it.

Usage:
  python scripts/train_superglue_v3.py data  --out /tmp/sg_data.npz
  python scripts/train_superglue_v3.py train --data /tmp/sg_data.npz \
      --steps 3000 --out weights/superglue_v3scene.npz
  python scripts/train_superglue_v3.py eval  --weights weights/superglue_v3scene.npz
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SP_V3 = os.path.join(REPO, "weights", "superpoint_scratch_v3.npz")

H, W, FX = 240, 320, 260.0
CAP = 512


def _make_extractor(cap=CAP, max_kpts=400, H=H, W=W, fx=FX):
    from ur_mvo_tpu.camera import make_pinhole
    from ur_mvo_tpu.config import Configs
    from ur_mvo_tpu.runtime.extractor import NeuralExtractor

    cfg = Configs()
    cfg.superpoint.capacity = cap
    cfg.superpoint.max_keypoints = max_kpts
    cfg.superpoint.keypoint_threshold = 1e-4
    cfg.superpoint.weights_path = SP_V3
    cfg.superglue.matcher = "nn"
    cfg.superglue.image_width = W
    cfg.superglue.image_height = H
    cfg.runtime.compute_dtype = "float32"
    cam = make_pinhole(W, H, fx, fx, W / 2, H / 2)
    return NeuralExtractor(cfg, cam)


def _render_scene(seed: int, frames: int, rng, H=H, W=W, fx=FX, baseline=0.0):
    """One scene: plane-only (1/3 of the time) or 3D multi-plane with
    random brightness decay — the two e2e benchmark families. With
    ``baseline`` also renders right views + right depths (stereo
    supervision)."""
    from ur_mvo_tpu.utils.synthscene import render_sequence

    n_planes = 0 if seed % 3 == 0 else int(rng.integers(2, 5))
    decay = float(rng.uniform(0.0, 0.03))
    # domain randomization: the first shipped (v3scene) matcher trained
    # only at z_background=6.0 and collapsed at gap>=8 on a z=5.0 scene
    # — randomize scene depth so the matcher generalizes across the
    # generator's whole parameter family.
    z_bg = float(rng.uniform(4.0, 8.0))
    return render_sequence(frames, H, W, fx, seed=seed, n_planes=n_planes,
                           brightness_decay=decay, z_background=z_bg,
                           baseline=baseline, with_right_depth=baseline > 0)


def _rectify_roundtrip(img: "np.ndarray", k1: float, fx: float) -> "np.ndarray":
    """Simulate the resampling footprint of right-camera rectification.

    A production right image is ``remap(distorted_capture)`` — one
    bilinear resample whose sub-pixel phase varies radially. Matching
    measurably degrades on that domain (the round-3 stereo
    distorted-right plane failed to init under the shipped matcher).
    A radial warp + its inverse (double bilinear) reproduces the blur
    while the geometry round-trips to O(k1^2) (< 0.2 px at |k1| <=
    0.06), so depth-transfer GT labels stay valid."""
    import numpy as np

    Hh, Ww = img.shape
    cx, cy = Ww / 2.0, Hh / 2.0
    yy, xx = np.mgrid[0:Hh, 0:Ww].astype(np.float64)
    x = (xx - cx) / fx
    y = (yy - cy) / fx
    r2 = x * x + y * y

    def sample(im, u, v):
        u0 = np.clip(np.floor(u).astype(int), 0, Ww - 2)
        v0 = np.clip(np.floor(v).astype(int), 0, Hh - 2)
        du = np.clip(u - u0, 0, 1)
        dv = np.clip(v - v0, 0, 1)
        return (im[v0, u0] * (1 - du) * (1 - dv) + im[v0, u0 + 1] * du * (1 - dv)
                + im[v0 + 1, u0] * (1 - du) * dv + im[v0 + 1, u0 + 1] * du * dv)

    f = 1.0 + k1 * r2
    im1 = sample(img.astype(np.float64), x * f * fx + cx, y * f * fx + cy)
    g = 1.0 - k1 * r2
    out = sample(im1, x * g * fx + cx, y * g * fx + cy)
    return np.clip(out, 0, 255).astype(np.uint8)


def gen_data(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ur_mvo_tpu.utils.synthscene import gt_assignment

    # multi-resolution scene family: the first shipped matcher trained
    # only at 240x320 and collapsed to ~0 matches at 512x640 (the
    # detector's random-projection descriptors shift with patch scale).
    # Keypoints are stored RESCALED into the reference 240x320 frame so
    # the trainer's fixed (W, H) position normalization stays valid.
    res_family = [(120, 160), (240, 320), (360, 480), (480, 640)]
    if not args.multires:
        res_family = [(H, W)]
    exts = {}
    rng = np.random.default_rng(args.seed)
    scores, kpts, desc, valid = [], [], [], []
    pair_fi, pair_fj, tgt0s, tgt1s = [], [], [], []
    n_frames_total = 0
    t0 = time.time()
    for s in range(args.scenes):
        seed = args.seed + 1000 + s
        Hs, Ws = res_family[s % len(res_family)]
        fxs = FX * (Ws / W)
        if (Hs, Ws) not in exts:
            exts[(Hs, Ws)] = _make_extractor(
                cap=args.capacity, max_kpts=args.max_kpts, H=Hs, W=Ws, fx=fxs
            )
        ext = exts[(Hs, Ws)]
        baseline = float(rng.uniform(0.05, 0.2)) if args.stereo else 0.0
        out_r = _render_scene(seed, args.frames, rng, H=Hs, W=Ws, fx=fxs,
                              baseline=baseline)
        imgs, T, depths = out_r[0], out_r[1], out_r[2]
        imgs_r = out_r[3] if args.stereo else None
        depths_r = out_r[4] if args.stereo else None
        base = n_frames_total

        def add_bank(img):
            b = ext.extract(img)
            k_scene = np.asarray(b.kpts, np.float32)
            kpts_scene.append(k_scene)
            scores.append(np.asarray(b.scores, np.float32))
            kpts.append(k_scene * np.array([W / Ws, H / Hs], np.float32))
            desc.append(np.asarray(b.desc, np.float16))
            valid.append(np.asarray(b.valid))

        kpts_scene = []  # scene-resolution coords, for gt reprojection
        for i in range(args.frames):
            add_bank(imgs[i])
        n_frames_total += args.frames
        if args.stereo:
            # right banks appended after the left ones; half of them
            # through the rectification-resampling blur (the production
            # right image is remap(distorted_capture) — see
            # _rectify_roundtrip; the shipped matcher failed to init the
            # distorted-right stereo scene without this domain)
            base_r = n_frames_total
            T_r = T.copy()
            for i in range(args.frames):
                T_r[i, :3, 3] = T[i, :3, 3] + T[i, :3, :3] @ np.array([baseline, 0.0, 0.0])
                img_r = imgs_r[i]
                if s % 2 == 0:
                    img_r = _rectify_roundtrip(img_r, float(rng.uniform(-0.06, 0.06)), fxs)
                add_bank(img_r)
            n_frames_total += args.frames
            # left-right pairs at the SAME timestamp (the stereo
            # disparity-gate matching domain, frame.cc:95-126)
            for i in range(args.frames):
                t_0, t_1 = gt_assignment(
                    kpts_scene[i], valid[base + i],
                    kpts_scene[args.frames + i], valid[base_r + i],
                    depths[i], T[i], T_r[i], fxs, Ws / 2, Hs / 2,
                    depth1=depths_r[i], tol_px=args.tol_px * (Ws / W),
                )
                if (t_0 < args.capacity).sum() < 30:
                    continue
                pair_fi.append(base + i)
                pair_fj.append(base_r + i)
                tgt0s.append(t_0)
                tgt1s.append(t_1)
        for i in range(args.frames):
            # VO matches the CURRENT frame against its reference KEYFRAME,
            # which trails by up to max_num_passed_frame (10) frames —
            # supervision must cover those gaps, not just adjacent pairs
            # (a gap-1..3-trained matcher measured 0.80 precision on
            # adjacent pairs yet DEGRADED VO trajectories).
            for gap in (1, 2, 3, 5, 7, 9):
                j = i + gap
                if j >= args.frames:
                    continue
                t_0, t_1 = gt_assignment(
                    kpts_scene[i], valid[base + i], kpts_scene[j], valid[base + j],
                    depths[i], T[i], T[j], fxs, Ws / 2, Hs / 2, depth1=depths[j],
                    tol_px=args.tol_px * (Ws / W),
                )
                if (t_0 < args.capacity).sum() < 30:
                    continue
                pair_fi.append(base + i)
                pair_fj.append(base + j)
                tgt0s.append(t_0)
                tgt1s.append(t_1)
        print(f"scene {s + 1}/{args.scenes} ({Hs}x{Ws}): {len(pair_fi)} pairs so far "
              f"({time.time() - t0:.0f}s)", flush=True)
    np.savez_compressed(
        args.out,
        scores=np.stack(scores), kpts=np.stack(kpts),
        desc=np.stack(desc), valid=np.stack(valid),
        pair_fi=np.asarray(pair_fi, np.int32), pair_fj=np.asarray(pair_fj, np.int32),
        tgt0=np.stack(tgt0s), tgt1=np.stack(tgt1s),
        width=W, height=H,
    )
    gt_counts = (np.stack(tgt0s) < args.capacity).sum(1)
    print(f"wrote {args.out}: {len(pair_fi)} pairs over {n_frames_total} frames, "
          f"GT matches/pair median {np.median(gt_counts):.0f}")


def train(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ur_mvo_tpu.models import superglue
    from ur_mvo_tpu.models.train_superglue import batch_loss
    from ur_mvo_tpu.ops.keypoints import FeatureBank

    data = np.load(args.data)
    S = len(data["pair_fi"])
    print(f"{S} pairs, {len(data['scores'])} frames; device: {jax.devices()[0]}")
    # device-resident dataset (desc stays f16 until gathered). NOTE: the
    # dataset is passed to the jitted chunk as a TRACED argument — as a
    # closure constant it gets embedded in the XLA program, and multi-
    # hundred-MB programs exceed the dev relay's compile-request limit
    # (HTTP 413) besides defeating the compile cache.
    dset = {
        "scores": jnp.asarray(data["scores"]),
        "kpts": jnp.asarray(data["kpts"]),
        "desc": jnp.asarray(data["desc"]),
        "valid": jnp.asarray(data["valid"]),
        "fi": jnp.asarray(data["pair_fi"]),
        "fj": jnp.asarray(data["pair_fj"]),
        "tgt0": jnp.asarray(data["tgt0"]),
        "tgt1": jnp.asarray(data["tgt1"]),
    }

    # Gap-balanced pair sampling: pairs per temporal gap g scale as
    # (frames - g), so uniform sampling is dominated by small-gap
    # (small-flow) pairs — measured to teach the matcher a positional
    # shortcut ("match the nearest keypoint") that produces CONFIDENT
    # texture-aliased assignments at keyframe-scale gaps: 233/241 fake
    # inliers and a 0.46x-scale RGB-D trajectory on the 3d benchmark.
    # Balancing gives each gap class (and the stereo LR class) equal
    # sampling mass. Gap classes derive from fj - fi: the generator
    # emits temporal gaps {1,2,3,5,7,9} and LR pairs at exactly
    # fj - fi == frames-per-scene (right banks appended after the
    # scene's left banks).
    pair_w = None
    if args.balance_gaps:
        gaps = (data["pair_fj"] - data["pair_fi"]).astype(np.int64)
        classes, counts = np.unique(gaps, return_counts=True)
        w = np.zeros(S, np.float64)
        for c, cnt in zip(classes, counts):
            w[gaps == c] = 1.0 / (len(classes) * cnt)
        pair_w = jnp.asarray((w / w.sum()).astype(np.float32))
        print(f"gap balance: classes {dict(zip(classes.tolist(), counts.tolist()))}")

    params = superglue.init_params(jax.random.PRNGKey(args.seed), args.layers, args.heads)
    if args.init_from:
        params = superglue.load_weights(args.init_from, args.layers, args.heads)
    if "desc_center" not in params:
        # learned descriptor re-centering, initialized at the dataset mean
        # (see superglue.encode: the v3 descriptor space is collapsed onto
        # a common component; centering decompresses match/random cosines
        # from 0.99/0.93 to 0.75/0.07)
        mu = data["desc"][data["valid"]].astype(np.float32).mean(0)
        params["desc_center"] = jnp.asarray(mu)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.warmup_cosine_decay_schedule(
            0.0, args.lr, 200, max(args.steps, 201), args.lr * 0.05
        ), weight_decay=1e-5),
    )
    opt_state = optimizer.init(params)

    def gather_banks(d, idx):
        def bank(f):
            return FeatureBank(
                scores=d["scores"][f], kpts=d["kpts"][f],
                desc=d["desc"][f].astype(jnp.float32), valid=d["valid"][f],
            )

        return bank(d["fi"][idx]), bank(d["fj"][idx]), d["tgt0"][idx], d["tgt1"][idx]

    def augment(key, b0, b1):
        """Correspondence-preserving augmentation:
        - mirror flips applied to BOTH banks (shared);
        - sub-pixel keypoint jitter and small descriptor noise;
        - with --aug strong, an additional independent small similarity
          warp per bank (as if that view's camera rolled/zoomed/shifted).
          VO matches CONSECUTIVE frames (near-identity relative motion) —
          training on wild relative warps makes the task gratuitously
          harder than deployment, measured as a higher loss plateau and
          worse held-out precision; "mild" is the default."""
        kx, ky, k0, k1, kd0, kd1, ksh = jax.random.split(key, 7)
        fx_ = jax.random.bernoulli(kx)
        fy = jax.random.bernoulli(ky)
        c = jnp.array([W / 2.0, H / 2.0])
        strong = args.aug == "strong"
        # vo-hard: mild + a random GLOBAL translation applied to bank 1
        # only. Correspondence labels are unchanged (a rigid shift of
        # every keypoint), but "match the nearest position" stops
        # working — the positional-shortcut breaker for the aliasing
        # failure described at --balance-gaps. Descriptor noise is also
        # halved so descriptor evidence stays crisp.
        vo_hard = args.aug == "vo-hard"
        shift = jax.random.uniform(ksh, (2,), minval=-40.0, maxval=40.0)
        d_noise = 0.02 if vo_hard else 0.05

        def warp(b, k, kd, extra_shift=None):
            ks_ = jax.random.split(k, 4)
            x = jnp.where(fx_, W - 1.0 - b.kpts[..., 0], b.kpts[..., 0])
            y = jnp.where(fy, H - 1.0 - b.kpts[..., 1], b.kpts[..., 1])
            p = jnp.stack([x, y], axis=-1)
            if strong:
                th = jax.random.uniform(ks_[0], (), minval=-0.25, maxval=0.25)
                sc = jax.random.uniform(ks_[1], (), minval=0.9, maxval=1.1)
                t = jax.random.uniform(ks_[2], (2,), minval=-15.0, maxval=15.0)
                R = jnp.array([[jnp.cos(th), -jnp.sin(th)], [jnp.sin(th), jnp.cos(th)]])
                p = (p - c) @ (sc * R).T + c + t
            if extra_shift is not None:
                p = p + extra_shift
            p = p + 0.3 * jax.random.normal(ks_[3], p.shape)
            d = b.desc + d_noise * jax.random.normal(kd, b.desc.shape)
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
            m = b.valid[..., None]
            return b._replace(kpts=p * m, desc=d * m)

        return warp(b0, k0, kd0), warp(b1, k1, kd1, extra_shift=shift if vo_hard else None)

    def one_step(d, carry, key):
        p, s = carry
        ki, ka = jax.random.split(key)
        if pair_w is not None:
            idx = jax.random.choice(ki, S, (args.batch,), p=pair_w)
        else:
            idx = jax.random.randint(ki, (args.batch,), 0, S)
        b0, b1, t0, t1 = jax.vmap(lambda i: gather_banks(d, i))(idx)
        b0, b1 = jax.vmap(augment)(jax.random.split(ka, args.batch), b0, b1)
        loss, grads = jax.value_and_grad(batch_loss)(
            p, b0, b1, t0, t1, W, H, args.sinkhorn_iters, args.heads
        )
        updates, s = optimizer.update(grads, s, p)
        return (optax.apply_updates(p, updates), s), loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(p, s, key, d):
        keys = jax.random.split(key, args.chunk)
        (p, s), losses = jax.lax.scan(lambda c, k: one_step(d, c, k), (p, s), keys)
        return p, s, jnp.mean(losses)

    def save(params):
        superglue.save_npz(args.out, params)
        state = dict(np.load(args.out))
        state["__meta_num_layers__"] = np.asarray(args.layers)
        state["__meta_num_heads__"] = np.asarray(args.heads)
        state["__meta_matching_threshold__"] = np.asarray(args.rec_threshold)
        # validated operating point: the detector/initializer knobs the
        # training banks were generated with (see superglue.
        # checkpoint_operating_point; CLI auto-discovery adopts these)
        state["__meta_op_capacity__"] = np.asarray(args.op_capacity)
        state["__meta_op_max_keypoints__"] = np.asarray(args.op_max_keypoints)
        state["__meta_op_keypoint_threshold__"] = np.asarray(args.op_keypoint_threshold)
        state["__meta_op_min_matches__"] = np.asarray(args.op_min_matches)
        state["__meta_op_min_features_first__"] = np.asarray(args.op_min_features_first)
        np.savez(args.out, **state)

    key = jax.random.PRNGKey(args.seed + 1)
    done = 0
    t0 = time.time()
    last_save = 0
    while done < args.steps:
        key, sub = jax.random.split(key)
        params, opt_state, mean_loss = run_chunk(params, opt_state, sub, dset)
        done += args.chunk
        print(f"step {done}/{args.steps}: loss {float(mean_loss):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if done - last_save >= 5000:
            # periodic checkpoint: the dev TPU relay has crashed mid-run
            # before; losing an hour of training to it is avoidable
            save(jax.device_get(params))
            last_save = done
    save(jax.device_get(params))
    print(f"saved {args.out}")


def evaluate(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from ur_mvo_tpu.utils.synthscene import gt_assignment

    ext = _make_extractor()
    rng = np.random.default_rng(args.seed + 7777)
    if args.weights:
        from ur_mvo_tpu.config import Configs
        from ur_mvo_tpu.camera import make_pinhole
        from ur_mvo_tpu.runtime.extractor import NeuralExtractor

        cfg = Configs()
        cfg.superpoint.capacity = CAP
        cfg.superpoint.max_keypoints = 400
        cfg.superpoint.keypoint_threshold = 1e-4
        cfg.superpoint.weights_path = SP_V3
        cfg.superglue.matcher = "superglue"
        cfg.superglue.weights_path = args.weights
        cfg.superglue.matching_threshold = args.threshold
        cfg.superglue.image_width = W
        cfg.superglue.image_height = H
        cfg.runtime.compute_dtype = "float32"
        cam = make_pinhole(W, H, FX, FX, W / 2, H / 2)
        sg_ext = NeuralExtractor(cfg, cam)
    else:
        sg_ext = None

    stats = {"nn": [0, 0, 0], "sg": [0, 0, 0]}  # matches, correct, gt
    for s in range(args.scenes):
        seed = args.seed + 9000 + s  # disjoint from training seeds
        imgs, T, depths = _render_scene(seed, args.frames, rng)
        banks = [ext.extract(imgs[i]) for i in range(args.frames)]
        for i in range(args.frames):
            for gap in (1, 2, 5, 8):  # include keyframe-scale gaps
                j = i + gap
                if j >= args.frames:
                    continue
                k0 = np.asarray(banks[i].kpts); v0 = np.asarray(banks[i].valid)
                k1 = np.asarray(banks[j].kpts); v1 = np.asarray(banks[j].valid)
                t_0, _ = gt_assignment(k0, v0, k1, v1, depths[i], T[i], T[j],
                                       FX, W / 2, H / 2, depth1=depths[j])
                n_gt = int((t_0 < CAP).sum())
                for name, e in (("nn", ext), ("sg", sg_ext)):
                    if e is None:
                        continue
                    m = e.match(banks[i], banks[j], outlier_rejection=False)
                    idx1 = np.asarray(m.idx1); mv = np.asarray(m.valid)
                    pred = np.where(mv, idx1, -1)
                    correct = int(((pred == t_0) & (t_0 < CAP) & mv).sum())
                    stats[name][0] += int(mv.sum())
                    stats[name][1] += correct
                    stats[name][2] += n_gt
    for name, (n, c, g) in stats.items():
        if n == 0:
            continue
        print(f"{name}: matches {n}, precision {c / max(n, 1):.3f}, "
              f"recall {c / max(g, 1):.3f}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("data")
    d.add_argument("--out", default="/tmp/sg_data.npz")
    d.add_argument("--scenes", type=int, default=200)
    d.add_argument("--frames", type=int, default=10)  # gaps up to 9 need them
    d.add_argument("--tol-px", type=float, default=3.0)
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--capacity", type=int, default=CAP,
                   help="feature-bank capacity of the generated banks (the "
                        "matcher's native K; also its operating point)")
    d.add_argument("--max-kpts", type=int, default=400)
    d.add_argument("--multires", action="store_true",
                   help="cycle scenes through 120x160..480x640 (kpts stored "
                        "rescaled to the 240x320 reference frame)")
    d.add_argument("--stereo", action="store_true",
                   help="also render right views (baseline U(0.05,0.2) m, half "
                        "through rectification-resampling blur) and label "
                        "left-right pairs — the stereo matching domain")

    t = sub.add_parser("train")
    t.add_argument("--data", default="/tmp/sg_data.npz")
    t.add_argument("--out", default=os.path.join(REPO, "weights", "superglue_v3scene.npz"))
    t.add_argument("--steps", type=int, default=3000)
    t.add_argument("--batch", type=int, default=8)
    t.add_argument("--chunk", type=int, default=50)
    t.add_argument("--layers", type=int, default=9)
    t.add_argument("--heads", type=int, default=4)
    t.add_argument("--sinkhorn-iters", type=int, default=20)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--init-from", default=None)
    t.add_argument("--aug", default="mild", choices=["mild", "strong", "vo-hard"])
    t.add_argument("--balance-gaps", action="store_true",
                   help="equalize sampling mass across temporal-gap / LR pair "
                        "classes (uniform sampling is dominated by small-flow "
                        "pairs and teaches a positional shortcut)")
    t.add_argument("--rec-threshold", type=float, default=0.5,
                   help="recommended decode threshold embedded in the checkpoint")
    # validated operating point embedded in the checkpoint (defaults =
    # the sg_data generation geometry: K=512 banks, 400-keypoint budget)
    t.add_argument("--op-capacity", type=int, default=512)
    t.add_argument("--op-max-keypoints", type=int, default=400)
    t.add_argument("--op-keypoint-threshold", type=float, default=1e-4)
    t.add_argument("--op-min-matches", type=int, default=60)
    t.add_argument("--op-min-features-first", type=int, default=100)
    t.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")

    e = sub.add_parser("eval")
    e.add_argument("--weights", default=None)
    e.add_argument("--scenes", type=int, default=4)
    e.add_argument("--frames", type=int, default=5)
    e.add_argument("--threshold", type=float, default=0.5)
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--platform", default="cpu")

    args = ap.parse_args()
    if args.cmd == "data":
        gen_data(args)
    elif args.cmd == "train":
        train(args)
    else:
        evaluate(args)


if __name__ == "__main__":
    main()
