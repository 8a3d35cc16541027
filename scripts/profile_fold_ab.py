"""A/B the column-folded backbone vs plain, interleaved, on one device.

Interleaves the two measurements several times to beat relay timing
noise; also prints jax.default_backend() to validate the auto-gate in
``superpoint._folding_enabled``.
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

    from ur_mvo_tpu.models import superpoint
    from ur_mvo_tpu.ops.keypoints import select_keypoints

    H, W, CAP, MAXK = (128, 160, 256, 200) if "--cpu" in sys.argv else (512, 640, 1024, 1000)
    print(f"# default_backend={jax.default_backend()} devices[0].platform={jax.devices()[0].platform}", file=sys.stderr)
    print(f"# folding_enabled={superpoint._folding_enabled()}", file=sys.stderr)

    sp = superpoint.init_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(2), (H, W))

    def make(folded):
        @jax.jit
        def extract(im):
            x = im[None, :, :, None].astype(jnp.bfloat16)
            feat = superpoint.backbone(sp, x, folded=folded)
            scores = superpoint.detector_head(sp, feat).astype(jnp.float32)
            scores = jax.vmap(lambda s: __import__("ur_mvo_tpu.ops.nms", fromlist=["simple_nms"]).simple_nms(s, radius=4))(scores)
            desc = superpoint.descriptor_head(sp, feat).astype(jnp.float32)
            return select_keypoints(scores[0], desc[0], capacity=CAP, threshold=5e-4, max_keypoints=MAXK)

        return extract

    f_plain, f_fold = make(False), make(True)
    # interleave A/B measurements
    for r in range(3):
        tp = sustained_ms(f_plain, (img,), n1=2, n2=22)
        tf = sustained_ms(f_fold, (img,), n1=2, n2=22)
        print(f"rep{r}: plain {tp:.3f} ms | folded {tf:.3f} ms")


if __name__ == "__main__":
    main()
