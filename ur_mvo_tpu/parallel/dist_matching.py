"""Batched pair matching sharded over a device mesh.

The matcher is embarrassingly batch-parallel (each pair is independent),
so the sharded variant is a vmap over the pair axis with a batch
``NamedSharding`` — XLA partitions every attention/Sinkhorn op along the
batch with zero collectives. This serves multi-sequence VO and offline
map building (N frame pairs at once), the workload class the reference
serializes through one GPU mutex (``tracking.h:134-135``).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ur_mvo_tpu.models import superglue
from ur_mvo_tpu.ops.keypoints import FeatureBank
from ur_mvo_tpu.ops.matching import Matches, decode_assignment


def make_batched_matcher(params, mesh: Mesh, width: int, height: int,
                         sinkhorn_iterations: int = 20, threshold: float = 0.5,
                         axis: str = "data"):
    """Returns ``fn(banks0, banks1) -> Matches`` over leading batch dim.

    ``banks``: FeatureBank pytrees with a leading batch axis divisible by
    the mesh size.
    """
    batch_sharding = NamedSharding(mesh, P(axis))

    def one(bank0: FeatureBank, bank1: FeatureBank) -> Matches:
        from ur_mvo_tpu.ops.pallas_kernels import attention_pallas_wanted

        Z = superglue.match_scores(
            params, bank0, bank1, width, height, sinkhorn_iterations,
            use_pallas_attention=attention_pallas_wanted(batched=True),
        )
        return decode_assignment(Z, bank0.valid, bank1.valid, threshold)

    vfn = jax.vmap(one)

    @jax.jit
    def fn(banks0: FeatureBank, banks1: FeatureBank) -> Matches:
        banks0 = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), banks0)
        banks1 = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), banks1)
        return vfn(banks0, banks1)

    return fn
