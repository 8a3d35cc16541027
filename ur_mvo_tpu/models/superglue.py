"""SuperGlue attentional feature matcher in pure JAX.

The reference runs SuperGlue as an opaque TensorRT engine over six
dynamic-shape inputs (``/root/reference/src/super_glue.cpp:63-99``) and
decodes the score matrix on the CPU. Here the full network — keypoint
encoder MLP, 9 pairs of self/cross multi-head attention layers, final
projection, and masked log-Sinkhorn optimal transport — is one functional
JAX program over *fixed-capacity padded* feature banks, so matching a
frame pair is a single XLA computation dominated by MXU matmuls, batchable
over many pairs with ``vmap`` and shardable over a device mesh.

Architecture follows the published SuperGlue design (Sarlin et al.,
CVPR 2020; indoor weights are what the reference exports): descriptor
dim 256, keypoint-encoder MLP (3 -> 32 -> 64 -> 128 -> 256), 4-head
attention, message MLP (512 -> 512 -> 256), learnable dustbin score.
BatchNorm layers are folded to per-channel scale/shift so trained torch
weights can be imported directly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.ops.keypoints import FeatureBank, normalize_keypoints_for_matching
from ur_mvo_tpu.ops.sinkhorn import log_optimal_transport

D = 256
_KENC_DIMS = (3, 32, 64, 128, 256)
_MLP_DIMS = (2 * D, 2 * D, D)


def _init_linear(key, cin, cout, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    w = jax.random.normal(k1, (cin, cout), dtype) * jnp.sqrt(2.0 / cin)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _init_mlp(key, dims, dtype=jnp.float32, with_norm=True, out_scale=1.0):
    """MLP params: linear layers + folded-BN scale/shift between them.

    ``out_scale`` scales the last layer's init. The public SuperGlue
    trains with live BatchNorm which keeps the residual stream bounded;
    with folded (identity) norms, He-init message MLPs grow activations
    exponentially over 18 residual layers — zero-initializing each
    message-MLP output (``out_scale=0``) starts the GNN at identity so
    from-scratch training is stable at any depth (ReZero-style init;
    gradients to the zero layer are nonzero since its inputs are not).
    """
    layers = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        layer = _init_linear(sub, dims[i], dims[i + 1], dtype)
        if i == len(dims) - 2 and out_scale != 1.0:
            layer["w"] = layer["w"] * out_scale
        if with_norm and i < len(dims) - 2:
            layer["scale"] = jnp.ones((dims[i + 1],), dtype)
            layer["shift"] = jnp.zeros((dims[i + 1],), dtype)
        layers.append(layer)
    return layers


def _mlp(layers, x):
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        if "scale" in layer:
            x = x * layer["scale"] + layer["shift"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def _mlp_T(layers, xT):
    """Lane-major MLP: ``xT`` is (C, K) with keypoints in lanes.

    The keypoint encoder's narrow layers (3->32->64->128) leave (K, C)
    matmul outputs at <25% lane occupancy; transposed, every layer is a
    (Cout, Cin) @ (Cin, K) matmul with all K keypoints filling the lanes
    (profiled ~4x faster on v5e for the encode stage). Numerically
    identical to :func:`_mlp` up to f32 reassociation.
    """
    for i, layer in enumerate(layers):
        xT = layer["w"].T @ xT + layer["b"][:, None]
        if "scale" in layer:
            xT = xT * layer["scale"][:, None] + layer["shift"][:, None]
        if i < len(layers) - 1:
            xT = jax.nn.relu(xT)
    return xT


def init_params(key: jax.Array, num_layers: int = 9, num_heads: int = 4, dtype=jnp.float32) -> Dict[str, Any]:
    # NOTE: num_heads is NOT stored in the pytree (it must stay a python
    # static under jit); pass it to gnn()/match_scores() instead.
    params: Dict[str, Any] = {"layers": []}
    key, sub = jax.random.split(key)
    params["kenc"] = _init_mlp(sub, _KENC_DIMS, dtype)
    for _ in range(2 * num_layers):  # alternating self/cross
        key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
        params["layers"].append(
            {
                "q": _init_linear(k1, D, D, dtype),
                "k": _init_linear(k2, D, D, dtype),
                "v": _init_linear(k3, D, D, dtype),
                "merge": _init_linear(k4, D, D, dtype),
                "mlp": _init_mlp(k5, _MLP_DIMS, dtype, out_scale=0.0),
            }
        )
    key, sub = jax.random.split(key)
    params["final_proj"] = _init_linear(sub, D, D, dtype)
    params["bin_score"] = jnp.asarray(1.0, dtype)
    return params


def _attention(layer, x_q: jax.Array, x_kv: jax.Array, kv_valid: jax.Array, num_heads: int,
               use_pallas: bool = False) -> jax.Array:
    """Multi-head attention with invalid-slot key masking.

    Inputs are batched over the two banks: (B, K, D) queries against
    (B, K, D) keys/values (B=2 for a frame pair). Both banks share the
    layer weights, so projecting them in ONE (B*K, D) x (D, D) matmul and
    running one batched attention einsum halves the number of device ops
    per GNN layer versus per-bank calls — at K~1024 these ops are too
    small to saturate the MXU individually.

    Matmuls run in the input dtype (bf16 on TPU doubles MXU rate, and the
    reference runs this net in TRT fp16); logits/softmax accumulate f32.
    With ``use_pallas`` the logits/softmax/value core runs as a fused
    VMEM-resident kernel (``ops/pallas_kernels.attention_pallas``).
    """
    B, K, _ = x_q.shape
    head_dim = D // num_heads
    q = (x_q.reshape(B * K, D) @ layer["q"]["w"] + layer["q"]["b"]).reshape(B, K, num_heads, head_dim)
    k = (x_kv.reshape(B * K, D) @ layer["k"]["w"] + layer["k"]["b"]).reshape(B, K, num_heads, head_dim)
    v = (x_kv.reshape(B * K, D) @ layer["v"]["w"] + layer["v"]["b"]).reshape(B, K, num_heads, head_dim)
    if use_pallas:
        from ur_mvo_tpu.ops.pallas_kernels import attention_pallas

        msg = jax.vmap(attention_pallas)(q, k, v, kv_valid).reshape(B, K, D)
    else:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) / jnp.sqrt(head_dim)
        logits = jnp.where(kv_valid[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(x_q.dtype)
        msg = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, K, D)
    return (msg.reshape(B * K, D) @ layer["merge"]["w"] + layer["merge"]["b"]).reshape(B, K, D)


def encode(params: Dict[str, Any], bank: FeatureBank, width: int, height: int) -> jax.Array:
    """Descriptor + positional encoding: desc + MLP(x, y, score).

    The encoder MLP runs lane-major (see :func:`_mlp_T`): its narrow
    hidden widths starve vector lanes in the (K, C) orientation.

    Optional ``params['desc_center']`` (D,): descriptors are re-centered
    and re-normalized before encoding. The shipped from-scratch detector's
    descriptor space is nearly collapsed onto a common component (|mean|
    ~0.96; matched-pair cosine 0.99 vs random-pair 0.93) — subtracting a
    learned center (initialized to the dataset mean) decompresses it to
    match 0.75 / random 0.07, the regime the matcher objective separates.
    Checkpoints without the key (e.g. imported public weights) skip it."""
    desc = bank.desc
    if "desc_center" in params:
        c = desc - params["desc_center"]
        c = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-6)
        desc = c * bank.valid[:, None]
    kpts_n = normalize_keypoints_for_matching(bank.kpts, width, height)
    inputs = jnp.concatenate([kpts_n, bank.scores[:, None]], axis=-1)
    return desc + _mlp_T(params["kenc"], inputs.T).T


def gnn(params: Dict[str, Any], x0: jax.Array, x1: jax.Array, valid0: jax.Array, valid1: jax.Array, num_heads: int = 4,
        use_pallas: bool = False):
    """Alternating self/cross attentional message passing.

    The two banks are stacked on a leading axis of 2 so every projection,
    attention and message-MLP runs as one batched op for the whole pair
    (see :func:`_attention`); cross-attention is the same batched op with
    the key/value banks flipped."""
    nh = num_heads
    x = jnp.stack([x0, x1])  # (2, K, D)
    valid = jnp.stack([valid0, valid1])
    valid_flip = valid[::-1]
    K = x.shape[1]
    for i, layer in enumerate(params["layers"]):
        if i % 2 == 0:  # self-attention
            m = _attention(layer, x, x, valid, nh, use_pallas)
        else:  # cross-attention
            m = _attention(layer, x, x[::-1], valid_flip, nh, use_pallas)
        x = x + _mlp(layer["mlp"], jnp.concatenate([x, m], axis=-1).reshape(2 * K, 2 * D)).reshape(2, K, D)
    return x[0], x[1]


def match_scores(
    params: Dict[str, Any],
    bank0: FeatureBank,
    bank1: FeatureBank,
    width: int,
    height: int,
    sinkhorn_iterations: int = 20,
    compute_dtype=jnp.float32,
    num_heads: int = 4,
    use_pallas_sinkhorn: bool = False,
    use_pallas_attention: bool = False,
) -> jax.Array:
    """Full forward: two feature banks -> (K0+1, K1+1) log-assignment
    matrix (dustbins included), masked for invalid slots."""
    if compute_dtype != jnp.float32:
        params = jax.tree.map(
            lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a, params
        )
    x0 = encode(params, bank0, width, height).astype(compute_dtype)
    x1 = encode(params, bank1, width, height).astype(compute_dtype)
    x0, x1 = gnn(params, x0, x1, bank0.valid, bank1.valid, num_heads, use_pallas_attention)
    d0 = x0 @ params["final_proj"]["w"] + params["final_proj"]["b"]
    d1 = x1 @ params["final_proj"]["w"] + params["final_proj"]["b"]
    scores = jnp.einsum("md,nd->mn", d0, d1, preferred_element_type=jnp.float32) / (D**0.25)
    if use_pallas_sinkhorn:
        from ur_mvo_tpu.ops.pallas_kernels import log_optimal_transport_pallas

        return log_optimal_transport_pallas(
            scores, bank0.valid, bank1.valid, params["bin_score"].astype(jnp.float32), sinkhorn_iterations
        )
    return log_optimal_transport(
        scores, bank0.valid, bank1.valid, params["bin_score"].astype(jnp.float32), sinkhorn_iterations
    )


# ---------------------------------------------------------------------------
# Native checkpoint save/load (flat-key .npz of this pytree)
# ---------------------------------------------------------------------------

_NATIVE_MARKER = "__urmvo_superglue__"


def _flatten(node, prefix=""):
    flat = {}
    if isinstance(node, dict):
        for k, v in node.items():
            flat.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            flat.update(_flatten(v, f"{prefix}{i}."))
    else:
        flat[prefix[:-1]] = np.asarray(node)
    return flat


def save_npz(path: str, params: Dict[str, Any]) -> None:
    """Save params trained here (``models/train_superglue.py``) as a flat-key
    .npz; reloadable via :func:`load_weights`."""
    flat = _flatten(params)
    flat[_NATIVE_MARKER] = np.asarray(1)
    np.savez(path, **flat)


def checkpoint_meta(path: str):
    """(num_layers, num_heads) embedded in a native .npz checkpoint, or
    None — lets loaders ignore a disagreeing config (the reference reads
    the architecture from separate YAML keys that can silently drift)."""
    if not path.endswith(".npz"):
        return None
    with np.load(path) as state:
        if "__meta_num_layers__" in state.files:
            heads = int(state["__meta_num_heads__"]) if "__meta_num_heads__" in state.files else 4
            return int(state["__meta_num_layers__"]), heads
    return None


def checkpoint_threshold(path) -> "float | None":
    """Calibrated decode threshold embedded in a native .npz checkpoint
    (``__meta_matching_threshold__``), or None. Trainers calibrate the
    decode threshold jointly with the weights (the reference hard-codes
    0.5 in ``read_configs.h``; a from-scratch matcher's score scale need
    not match), so the checkpoint is the authority when the config does
    not pin an explicit value."""
    if not (path and str(path).endswith(".npz")):
        return None
    with np.load(path) as state:
        if "__meta_matching_threshold__" in state.files:
            return float(state["__meta_matching_threshold__"])
    return None


def checkpoint_operating_point(path) -> "dict | None":
    """Validated operating point embedded in a native .npz checkpoint
    (``__meta_op_*__`` keys, written by train_superglue_v3): the
    detector/initializer knobs the matcher was trained and gate-tested
    with (bank capacity, keypoint budget/threshold, init gates). A
    matcher is only as good as the keypoint distribution it saw in
    training — CLI auto-discovery adopts these so the default path runs
    the validated configuration, not an untested hybrid."""
    if not (path and str(path).endswith(".npz")):
        return None
    keys = {
        "capacity": "__meta_op_capacity__",
        "max_keypoints": "__meta_op_max_keypoints__",
        "keypoint_threshold": "__meta_op_keypoint_threshold__",
        "min_matches": "__meta_op_min_matches__",
        "min_features_first": "__meta_op_min_features_first__",
    }
    with np.load(path) as state:
        if keys["capacity"] not in state.files:
            return None
        out = {}
        for name, k in keys.items():
            if k in state.files:
                v = state[k]
                out[name] = float(v) if name == "keypoint_threshold" else int(v)
    return out


def resolve_matching_threshold(sg_cfg) -> float:
    """Effective decode threshold for a ``SuperGlueConfig``: explicit
    config value > checkpoint-embedded calibration > 0.5 (reference
    default)."""
    if sg_cfg.matching_threshold is not None:
        return float(sg_cfg.matching_threshold)
    thr = checkpoint_threshold(sg_cfg.weights_path)
    return 0.5 if thr is None else thr


def load_npz(path: str, num_layers: int = 9, num_heads: int = 4) -> Dict[str, Any]:
    meta = checkpoint_meta(path)
    if meta is not None:
        num_layers, num_heads = meta
    state = dict(np.load(path))

    def fill(node, prefix=""):
        if isinstance(node, dict):
            return {k: fill(v, f"{prefix}{k}.") for k, v in node.items()}
        if isinstance(node, list):
            return [fill(v, f"{prefix}{i}.") for i, v in enumerate(node)]
        # shipped checkpoints store float16 to halve the repo footprint;
        # compute always runs in f32/bf16, so upcast at load
        arr = state[prefix[:-1]]
        return jnp.asarray(arr, dtype=jnp.float32 if arr.dtype == np.float16 else None)

    template = init_params(jax.random.PRNGKey(0), num_layers, num_heads)
    if "desc_center" in state:
        template["desc_center"] = state["desc_center"].astype(np.float32)
    return fill(template)


def load_weights(path: str, num_layers: int = 9, num_heads: int = 4) -> Dict[str, Any]:
    """Load either a native .npz checkpoint (saved by :func:`save_npz`) or a
    torch state dict / torch-layout .npz (``load_torch_weights``)."""
    if path.endswith(".npz"):
        with np.load(path) as state:
            native = _NATIVE_MARKER in state.files
        if native:
            return load_npz(path, num_layers, num_heads)
    return load_torch_weights(path, num_layers, num_heads)


# ---------------------------------------------------------------------------
# Torch weight import (MagicLeap superglue_indoor.pth layout)
# ---------------------------------------------------------------------------

def load_torch_weights(path: str, num_layers: int = 9, num_heads: int = 4) -> Dict[str, Any]:
    """Map a torch SuperGlue state dict onto this pytree.

    Expected keys follow the public implementation: ``kenc.encoder.*``
    (Conv1d + BatchNorm1d), ``gnn.layers.{i}.attn.proj.{0,1,2}`` (q,k,v),
    ``gnn.layers.{i}.attn.merge``, ``gnn.layers.{i}.mlp.*``,
    ``final_proj``, ``bin_score``. BatchNorms are folded into
    scale/shift.
    """
    if path.endswith(".npz"):
        state = dict(np.load(path))
    else:
        import torch

        state = {k: v.cpu().numpy() for k, v in torch.load(path, map_location="cpu", weights_only=True).items()}

    def conv1d(prefix):
        w = state[f"{prefix}.weight"]  # (cout, cin, 1)
        b = state.get(f"{prefix}.bias")
        out = {"w": jnp.asarray(w[:, :, 0].T)}
        out["b"] = jnp.asarray(b) if b is not None else jnp.zeros((w.shape[0],))
        return out

    def folded_bn(prefix):
        eps = 1e-5
        gamma = state[f"{prefix}.weight"]
        beta = state[f"{prefix}.bias"]
        mean = state[f"{prefix}.running_mean"]
        var = state[f"{prefix}.running_var"]
        scale = gamma / np.sqrt(var + eps)
        return jnp.asarray(scale), jnp.asarray(beta - mean * scale)

    params: Dict[str, Any] = {"layers": []}

    def mlp_from(prefix, n_linear):
        # torch MLP(Sequential): Conv1d, BN, ReLU, Conv1d, BN, ReLU, ..., Conv1d
        layers = []
        idx = 0
        for i in range(n_linear):
            layer = conv1d(f"{prefix}.{idx}")
            idx += 1
            if i < n_linear - 1:
                scale, shift = folded_bn(f"{prefix}.{idx}")
                layer["scale"], layer["shift"] = scale, shift
                idx += 2  # BN, ReLU
            layers.append(layer)
        return layers

    params["kenc"] = mlp_from("kenc.encoder", len(_KENC_DIMS) - 1)
    for i in range(2 * num_layers):
        g = f"gnn.layers.{i}"
        params["layers"].append(
            {
                "q": conv1d(f"{g}.attn.proj.0"),
                "k": conv1d(f"{g}.attn.proj.1"),
                "v": conv1d(f"{g}.attn.proj.2"),
                "merge": conv1d(f"{g}.attn.merge"),
                "mlp": mlp_from(f"{g}.mlp", len(_MLP_DIMS) - 1),
            }
        )
    params["final_proj"] = conv1d("final_proj")
    params["bin_score"] = jnp.asarray(float(state["bin_score"]))
    return params
