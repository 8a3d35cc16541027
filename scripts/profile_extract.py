"""One-shot sub-profile of the extract stage on TPU.

Breaks ``NeuralExtractor``'s fused extract program into its pieces and
measures each with the slope method (see ``bench.py::sustained_ms`` — the
dev relay adds a ~24 ms completion floor, so never time single calls).
Batch ALL measurements into this one script: remote TPU compiles take
minutes and queue across processes (CLAUDE.md).

Usage:  python scripts/profile_extract.py [--platform cpu] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from bench import _enable_compile_cache, sustained_ms

    _enable_compile_cache()
    import jax.numpy as jnp

    from ur_mvo_tpu.models import superpoint
    from ur_mvo_tpu.ops.keypoints import select_keypoints
    from ur_mvo_tpu.ops.nms import simple_nms

    if args.tiny:
        H, W, CAP, MAXK = 128, 160, 256, 200
    else:
        H, W, CAP, MAXK = 512, 640, 1024, 1000

    dev = jax.devices()[0]
    print(f"# profile_extract on {dev.platform}:{dev.device_kind} H={H} W={W}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    sp = superpoint.init_params(ks[0])
    img = jax.random.uniform(ks[2], (H, W))
    x4 = img[None, :, :, None].astype(jnp.bfloat16)

    P = superpoint._ENCODER
    names = [n for n, _, _, _ in P]

    def run_stage(upto, frm=0, pooled_in=0):
        """Backbone slice [frm:upto) as its own jitted program."""

        def f(x):
            for name in names[frm:upto]:
                x = jax.nn.relu(superpoint._conv(x, sp[name]))
                if name in superpoint._POOL_AFTER:
                    x = superpoint._pool2(x)
            return x

        return jax.jit(f)

    # stage inputs at the right resolutions/channel counts
    s1 = run_stage(2)      # conv1a,conv1b,pool -> (H/2, W/2, 64)
    a1 = s1(x4)
    s2 = run_stage(4, 2)   # conv2a,conv2b,pool -> (H/4, W/4, 64)
    a2 = s2(a1)
    s3 = run_stage(6, 4)   # conv3a,conv3b,pool -> (H/8, W/8, 128)
    a3 = s3(a2)
    s4 = run_stage(8, 6)   # conv4a,conv4b -> (H/8, W/8, 128)
    a4 = s4(a3)

    heads = jax.jit(
        lambda f: (
            superpoint.detector_head(sp, f),
            superpoint.descriptor_head(sp, f),
        )
    )
    scores_raw, desc = heads(a4)
    nms = jax.jit(lambda s: jax.vmap(lambda x: simple_nms(x, radius=4))(s.astype(jnp.float32)))
    scores = nms(scores_raw)

    sel = jax.jit(
        lambda s, d: select_keypoints(
            s[0].astype(jnp.float32), d[0].astype(jnp.float32),
            capacity=CAP, threshold=5e-4, max_keypoints=MAXK,
        )
    )

    full = jax.jit(
        lambda im: superpoint.forward(sp, im[None, :, :, None], compute_dtype=jnp.bfloat16)
    )
    extract = jax.jit(
        lambda im: select_keypoints(
            *[t[0] for t in superpoint.forward(sp, im[None, :, :, None], compute_dtype=jnp.bfloat16)],
            capacity=CAP, threshold=5e-4, max_keypoints=MAXK,
        )
    )

    def run_stage_folded(na, nb):
        def f(x):
            xf = superpoint._fold_cols(x)
            xf = jax.nn.relu(superpoint._conv_folded(xf, sp[na]))
            xf = jax.nn.relu(superpoint._conv_folded(xf, sp[nb]))
            return superpoint._pool2_folded(xf)

        return jax.jit(f)

    s1f = run_stage_folded("conv1a", "conv1b")
    s2f = run_stage_folded("conv2a", "conv2b")
    s3f = run_stage_folded("conv3a", "conv3b")

    # conv-level pieces of stage 1 (plain + folded + NCHW variant)
    c1a = jax.jit(lambda x: jax.nn.relu(superpoint._conv(x, sp["conv1a"])))
    a1a = c1a(x4)
    c1b = jax.jit(lambda x: jax.nn.relu(superpoint._conv(x, sp["conv1b"])))
    a1b = c1b(a1a)
    poolj = jax.jit(superpoint._pool2)
    x4f = superpoint._fold_cols(x4)
    c1af = jax.jit(lambda x: jax.nn.relu(superpoint._conv_folded(x, sp["conv1a"])))
    a1af = c1af(x4f)
    c1bf = jax.jit(lambda x: jax.nn.relu(superpoint._conv_folded(x, sp["conv1b"])))

    def conv_nchw(x, p, stride=1):
        return jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), (stride, stride), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
        )

    x_nchw = jnp.transpose(x4, (0, 3, 1, 2))
    c1a_nchw = jax.jit(lambda x: jax.nn.relu(conv_nchw(x, sp["conv1a"])))
    a1a_nchw = c1a_nchw(x_nchw)
    c1b_nchw = jax.jit(lambda x: jax.nn.relu(conv_nchw(x, sp["conv1b"])))

    # optional: pallas fused stage-1 (if available)
    try:
        from ur_mvo_tpu.ops.pallas_conv import stage1_fused, stage1_pallas_supported

        have_pallas = stage1_pallas_supported()
    except Exception:
        have_pallas = False

    c1a_im2col = jax.jit(lambda x: jax.nn.relu(superpoint._conv_folded_im2col(x, sp["conv1a"])))
    a1af2 = c1a_im2col(x4f)
    err_im2col = float(
        jnp.max(jnp.abs(a1af2.astype(jnp.float32) - a1af.astype(jnp.float32)))
    )
    print(f"# conv1a im2col vs folded max|err|: {err_im2col:.3e}", file=sys.stderr)

    def run_stage1_v2():
        def f(x):
            xf = superpoint._fold_cols(x)
            xf = jax.nn.relu(superpoint._conv_folded_im2col(xf, sp["conv1a"]))
            xf = jax.nn.relu(superpoint._conv_folded(xf, sp["conv1b"]))
            return superpoint._pool2_folded(xf)

        return jax.jit(f)

    s1v2 = run_stage1_v2()

    # cumulative prefixes of the production forward program: differences
    # give IN-CONTEXT stage costs (isolated stages let XLA pick free
    # layouts; the full program may pay transitions the pieces don't).
    def prefix(n_stages, with_heads=False, with_nms=False):
        def f(im):
            x = im[None, :, :, None].astype(jnp.bfloat16)
            for i, (na, nb) in enumerate(
                (("conv1a", "conv1b"), ("conv2a", "conv2b"), ("conv3a", "conv3b"))
            ):
                if i >= n_stages:
                    break
                xf = superpoint._fold_cols(x)
                first = superpoint._conv_folded_im2col if sp[na]["w"].shape[2] <= 2 else superpoint._conv_folded
                xf = jax.nn.relu(first(xf, sp[na]))
                xf = jax.nn.relu(superpoint._conv_folded(xf, sp[nb]))
                x = superpoint._pool2_folded(xf)
            if n_stages < 4:
                return x
            x = jax.nn.relu(superpoint._conv(x, sp["conv4a"]))
            x = jax.nn.relu(superpoint._conv(x, sp["conv4b"]))
            if not with_heads:
                return x
            s = superpoint.detector_head(sp, x)
            d = superpoint.descriptor_head(sp, x)
            if not with_nms:
                return s, d
            s = jax.vmap(lambda m: simple_nms(m.astype(jnp.float32), radius=4))(s)
            return s, d

        return jax.jit(f)

    results = {}
    results["stage1_folded"] = sustained_ms(s1f, (x4,))
    results["stage1_im2col1a"] = sustained_ms(s1v2, (x4,))
    results["stage2_folded"] = sustained_ms(s2f, (a1,))
    results["stage3_folded"] = sustained_ms(s3f, (a2,))
    results["stage1_conv1ab_pool"] = sustained_ms(s1, (x4,))
    results["stage2_conv2ab_pool"] = sustained_ms(s2, (a1,))
    results["stage3_conv3ab_pool"] = sustained_ms(s3, (a2,))
    results["stage4_conv4ab"] = sustained_ms(s4, (a3,))
    results["conv1a_plain"] = sustained_ms(c1a, (x4,))
    results["conv1b_plain"] = sustained_ms(c1b, (a1a,))
    results["conv1a_folded"] = sustained_ms(c1af, (x4f,))
    results["conv1a_im2col"] = sustained_ms(c1a_im2col, (x4f,))
    results["conv1b_folded"] = sustained_ms(c1bf, (a1af,))
    results["conv1a_nchw"] = sustained_ms(c1a_nchw, (x_nchw,))
    results["conv1b_nchw"] = sustained_ms(c1b_nchw, (a1a_nchw,))
    results["heads_P_D"] = sustained_ms(heads, (a4,))
    results["nms_r4"] = sustained_ms(nms, (scores_raw,))
    results["select_keypoints"] = sustained_ms(sel, (scores, desc))
    results["prefix_s1"] = sustained_ms(prefix(1), (img,))
    results["prefix_s12"] = sustained_ms(prefix(2), (img,))
    results["prefix_s123"] = sustained_ms(prefix(3), (img,))
    results["prefix_backbone"] = sustained_ms(prefix(4), (img,))
    results["prefix_heads"] = sustained_ms(prefix(4, True), (img,))
    results["prefix_heads_nms"] = sustained_ms(prefix(4, True, True), (img,))
    results["forward_full"] = sustained_ms(full, (img,))
    results["extract_full"] = sustained_ms(extract, (img,))
    if have_pallas:
        p1 = jax.jit(lambda x: stage1_fused(sp, x))
        out_p = p1(x4)
        err = float(jnp.max(jnp.abs(out_p.astype(jnp.float32) - a1.astype(jnp.float32))))
        results["stage1_pallas"] = sustained_ms(p1, (x4,))
        print(f"# stage1 pallas max|err| vs XLA: {err:.3e}", file=sys.stderr)

    for k, v in results.items():
        print(f"{k:24s} {v:8.3f} ms")
    ssum = sum(v for k, v in results.items() if k.startswith(("stage", "heads", "nms", "select")) and k != "stage1_pallas")
    print(f"{'sum_of_stages':24s} {ssum:8.3f} ms  (vs forward+select {results['extract_full']:.3f})")


if __name__ == "__main__":
    main()
