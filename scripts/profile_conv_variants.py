"""Decisive A/B of backbone conv formulations on TPU.

Long-slope measurements (n2=52: ~50 in-scan iterations) so each number
is accurate to ~±0.02 ms despite the dev relay's noise — the earlier
n2=12 runs disagreed with themselves by ±0.2 ms on sub-ms stages.

Variants per stage:
  plain    — unfolded NHWC convs (Cout=64 half-lane tiles)
  foldedA  — _conv_folded: two Cout=64 convs + concat  (old default)
  foldedB  — _conv_folded2: ONE combined Cout=128 conv (1.5x FLOPs, full lanes)
  im2col   — stage 1 only: _conv_folded_im2col for conv1a (Cin=1)

Usage: python scripts/profile_conv_variants.py [--platform cpu]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from bench import _enable_compile_cache, sustained_ms

    _enable_compile_cache()
    import jax.numpy as jnp

    from ur_mvo_tpu.models import superpoint as S
    from ur_mvo_tpu.ops.keypoints import select_keypoints

    tiny = "--cpu" in sys.argv
    H, W, CAP, MAXK = (128, 160, 256, 200) if tiny else (512, 640, 1024, 1000)
    N2 = 22 if tiny else 52
    dev = jax.devices()[0]
    print(f"# conv variants on {dev.platform}:{dev.device_kind} H={H} W={W} n2={N2}", file=sys.stderr)

    sp = S.init_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(2), (H, W))
    x4 = img[None, :, :, None].astype(jnp.bfloat16)

    def stage_plain(na, nb):
        def f(x):
            x = jax.nn.relu(S._conv(x, sp[na]))
            x = jax.nn.relu(S._conv(x, sp[nb]))
            return S._pool2(x)

        return jax.jit(f)

    def stage_var(na, nb, first, second):
        def f(x):
            xf = S._fold_cols(x)
            xf = jax.nn.relu(first(xf, sp[na]))
            xf = jax.nn.relu(second(xf, sp[nb]))
            return S._pool2_folded(xf)

        return jax.jit(f)

    a1 = stage_plain("conv1a", "conv1b")(x4)
    a2 = stage_plain("conv2a", "conv2b")(a1)

    meas = {}

    def run(name, fn, args):
        meas[name] = sustained_ms(fn, args, n2=N2)
        print(f"{name:28s} {meas[name]:8.3f} ms", flush=True)

    fA, fB, fI = S._conv_folded, S._conv_folded2, S._conv_folded_im2col
    run("s1_plain", stage_plain("conv1a", "conv1b"), (x4,))
    run("s1_foldA", stage_var("conv1a", "conv1b", fA, fA), (x4,))
    run("s1_im2col_foldA", stage_var("conv1a", "conv1b", fI, fA), (x4,))
    run("s1_im2col_foldB", stage_var("conv1a", "conv1b", fI, fB), (x4,))
    run("s2_plain", stage_plain("conv2a", "conv2b"), (a1,))
    run("s2_foldA", stage_var("conv2a", "conv2b", fA, fA), (a1,))
    run("s2_foldB", stage_var("conv2a", "conv2b", fB, fB), (a1,))
    run("s3_plain", stage_plain("conv3a", "conv3b"), (a2,))
    run("s3_foldA", stage_var("conv3a", "conv3b", fA, fA), (a2,))
    run("s3_foldB", stage_var("conv3a", "conv3b", fB, fB), (a2,))

    # Pallas slab kernels (stages 1-2)
    from ur_mvo_tpu.ops.pallas_conv import conv_pallas_supported, stage12_nhwc

    if not conv_pallas_supported(H, W):
        print(f"# pallas slab kernels: shape ({H},{W}) unsupported, skipping", file=sys.stderr)
        return

    s12p = jax.jit(lambda x: stage12_nhwc(sp, x))
    s12x = jax.jit(lambda x: S._stage12_xla(sp, x))
    o_p, o_x = s12p(x4), s12x(x4)
    err = float(jnp.max(jnp.abs(o_p.astype(jnp.float32) - o_x.astype(jnp.float32))))
    print(f"# stage12 pallas-vs-xla max|err|: {err:.3e}", file=sys.stderr)
    run("s12_pallas", s12p, (x4,))
    run("s12_xla_plain", s12x, (x4,))

    from ur_mvo_tpu.ops.nms import simple_nms

    def extract_var(pallas):
        def f(im):
            x = im[None, :, :, None].astype(jnp.bfloat16)
            feat = S.backbone(sp, x, pallas=pallas)
            s = S.detector_head(sp, feat)
            s = jax.vmap(lambda m: simple_nms(m.astype(jnp.float32), radius=4))(s)
            d = S.descriptor_head(sp, feat)
            return select_keypoints(
                s[0], d[0].astype(jnp.float32), capacity=CAP, threshold=5e-4, max_keypoints=MAXK
            )

        return jax.jit(f)

    run("extract_xla_best", extract_var(False), (img,))
    run("extract_pallas", extract_var(True), (img,))

    extract = jax.jit(
        lambda im: select_keypoints(
            *[t[0] for t in S.forward(sp, im[None, :, :, None], compute_dtype=jnp.bfloat16)],
            capacity=CAP, threshold=5e-4, max_keypoints=MAXK,
        )
    )
    run("extract_full(current)", extract, (img,))


if __name__ == "__main__":
    main()
