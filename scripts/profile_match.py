"""One-shot sub-profile of the match stage on TPU (long-slope n2=52).

Pieces of bench.py's match program: keypoint encoder, GNN (and a
per-layer slope), final projection + score matrix, Sinkhorn (XLA vs
Pallas), decode, F-RANSAC. Batch everything into one script: remote
compiles are minutes each (CLAUDE.md).

Usage: python scripts/profile_match.py [--cpu]
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

    from ur_mvo_tpu.models import superglue as SG
    from ur_mvo_tpu.ops.keypoints import FeatureBank
    from ur_mvo_tpu.ops.matching import decode_assignment, gather_match_points
    from ur_mvo_tpu.ops.ransac import ransac_fundamental
    from ur_mvo_tpu.ops.sinkhorn import log_optimal_transport
    from ur_mvo_tpu.ops.pallas_kernels import log_optimal_transport_pallas

    tiny = "--cpu" in sys.argv
    K = 256 if tiny else 1024
    W, H = (160, 128) if tiny else (640, 512)
    N2 = 22 if tiny else 52
    dev = jax.devices()[0]
    print(f"# profile_match on {dev.platform}:{dev.device_kind} K={K} n2={N2}", file=sys.stderr)

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    sg = SG.init_params(ks[0])

    def mk_bank(k):
        kk = jax.random.split(k, 3)
        kpts = jax.random.uniform(kk[0], (K, 2)) * jnp.array([W - 1.0, H - 1.0])
        desc = jax.random.normal(kk[1], (K, 256))
        desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
        scores = jax.random.uniform(kk[2], (K,))
        return FeatureBank(kpts=kpts, scores=scores, desc=desc, valid=jnp.arange(K) < K - 24)

    b0, b1 = mk_bank(ks[1]), mk_bank(ks[2])
    bf16 = jnp.bfloat16
    sgb = jax.tree.map(lambda a: a.astype(bf16) if a.dtype == jnp.float32 else a, sg)

    enc = jax.jit(lambda b: SG.encode(sgb, b, W, H).astype(bf16))
    x0, x1 = enc(b0), enc(b1)

    def gnn_n(n):
        p = {**sgb, "layers": sgb["layers"][:n]}

        def f(x0, x1):
            return SG.gnn(p, x0, x1, b0.valid, b1.valid, 4, False)

        return jax.jit(f)

    g_all = gnn_n(len(sg["layers"]))
    y0, y1 = g_all(x0, x1)

    proj_scores = jax.jit(
        lambda y0, y1: (
            jnp.einsum(
                "md,nd->mn",
                y0 @ sgb["final_proj"]["w"] + sgb["final_proj"]["b"],
                y1 @ sgb["final_proj"]["w"] + sgb["final_proj"]["b"],
                preferred_element_type=jnp.float32,
            )
            / (SG.D**0.25)
        )
    )
    scores = proj_scores(y0, y1)
    alpha = sg["bin_score"].astype(jnp.float32)

    sink_xla = jax.jit(lambda s: log_optimal_transport(s, b0.valid, b1.valid, alpha, 20))
    Z = sink_xla(scores)
    dec = jax.jit(lambda Z: decode_assignment(Z, b0.valid, b1.valid, 0.5))
    m = dec(Z)
    gp = jax.jit(lambda m: gather_match_points(m, b0.kpts, b1.kpts))
    p0, p1, valid = gp(m)
    fr = jax.jit(lambda k, p0, p1, v: ransac_fundamental(k, p0, p1, v, iterations=200))

    full = jax.jit(
        lambda k, b0, b1: (
            lambda m: (
                m.idx1,
                fr(k, *gather_match_points(m, b0.kpts, b1.kpts)).inliers,
            )
        )(
            decode_assignment(
                SG.match_scores(
                    sg, b0, b1, W, H, sinkhorn_iterations=20, compute_dtype=bf16
                ),
                b0.valid, b1.valid, 0.5,
            )
        )
    )

    meas = {}

    def run(name, fn, args, n2=N2):
        meas[name] = sustained_ms(fn, args, n2=n2)
        print(f"{name:24s} {meas[name]:8.3f} ms", flush=True)

    run("encode", enc, (b0,))
    run("gnn_6_layers", gnn_n(6), (x0, x1))
    run("gnn_all_layers", g_all, (x0, x1))
    nl = len(sg["layers"])
    print(f"# per-layer slope: {(meas['gnn_all_layers'] - meas['gnn_6_layers']) / (nl - 6):.4f} ms ({nl} layers)", file=sys.stderr)
    run("proj_scores", proj_scores, (y0, y1))
    run("sinkhorn_xla_20", sink_xla, (scores,))
    if not tiny:
        sink_pl = jax.jit(
            lambda s: log_optimal_transport_pallas(s, b0.valid, b1.valid, alpha, 20)
        )
        run("sinkhorn_pallas_20", sink_pl, (scores,))
    run("decode", dec, (Z,))
    run("f_ransac_200", fr, (ks[3], p0, p1, valid))
    run("match_full", full, (ks[3], b0, b1))

    # ---- batched (S=4) variants: why is multi-seq match not flat? ----
    S = 4
    import jax.tree_util as jtu

    banksA = jtu.tree_map(lambda a: jnp.stack([a] * S), b0)
    banksB = jtu.tree_map(lambda a: jnp.stack([a] * S), b1)
    keys_b = jax.random.split(ks[5], S)
    xs0 = jnp.stack([x0] * S)
    xs1 = jnp.stack([x1] * S)
    ys0 = jnp.stack([y0] * S)
    ys1 = jnp.stack([y1] * S)
    Zb = jnp.stack([Z] * S)
    p0b, p1b, vb = jnp.stack([p0] * S), jnp.stack([p1] * S), jnp.stack([valid] * S)

    gnn_b = jax.jit(jax.vmap(lambda a, b: SG.gnn(sgb, a, b, b0.valid, b1.valid, 4, False)))
    sink_b = jax.jit(jax.vmap(lambda y0, y1: log_optimal_transport(
        proj_scores(y0, y1), b0.valid, b1.valid, alpha, 20)))
    sink_plb = jax.jit(jax.vmap(lambda y0, y1: log_optimal_transport_pallas(
        proj_scores(y0, y1), b0.valid, b1.valid, alpha, 20)))
    dec_b = jax.jit(jax.vmap(lambda Z: decode_assignment(Z, b0.valid, b1.valid, 0.5)))
    fr_b = jax.jit(jax.vmap(lambda k, p0, p1, v: ransac_fundamental(k, p0, p1, v, iterations=200)))
    full_b = jax.jit(jax.vmap(full))

    def runb(name, fn, args):
        meas[name] = sustained_ms(fn, args, n2=N2) / S
        print(f"{name:24s} {meas[name]:8.3f} ms/seq", flush=True)

    runb("b4_gnn", gnn_b, (xs0, xs1))
    runb("b4_sinkhorn_xla", sink_b, (ys0, ys1))
    if not tiny:
        runb("b4_sinkhorn_pallas", sink_plb, (ys0, ys1))
    runb("b4_decode", dec_b, (Zb,))
    runb("b4_f_ransac", fr_b, (keys_b, p0b, p1b, vb))
    runb("b4_match_full", full_b, (keys_b, banksA, banksB))


if __name__ == "__main__":
    main()
