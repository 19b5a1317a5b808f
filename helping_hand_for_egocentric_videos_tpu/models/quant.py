"""Optional int8 inference quantization for the frozen backbone.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate; the backbone
is frozen at eval, so its big matmuls (qkv / attention proj / MLP) can be
statically weight-quantized and dynamically activation-quantized:

- weights: per-output-channel symmetric int8 (scale = max|w| / 127);
- activations: per-token dynamic symmetric int8 at matmul time;
- accumulation in int32, dequantised by s_x (per row) * s_w (per column).

Enable by transforming the params tree once with
``quantize_lavila_params`` — ``layers.linear`` dispatches on the presence
of the quantised leaves, so no model-code changes are needed. The bench
headline and the eval CLIs' ``--int8`` flag use this path; rank-order
retrieval stability is test-gated (tests/test_quant.py), and released
weights should additionally be validated by diffing the harnesses' .npz
similarity dumps against an f32 run (TODO.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_linear_params", "quantize_lavila_params", "int8_linear"]

# matmul weights worth quantizing in the visual tower (the hot path);
# embeddings/LN stay f32, the text tower is negligible at eval batch sizes
_QUANT_KEYS = ("qkv", "proj", "mlp_fc1", "mlp_fc2")


def quantize_linear_params(p: dict) -> dict:
    """{'w', 'b'?} -> {'w_q', 's_w', 'b'?} per-channel symmetric int8."""
    w = jnp.asarray(p["w"], jnp.float32)
    s_w = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, 1e-8)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "s_w": s_w[0]}
    if "b" in p:
        out["b"] = p["b"]
    return out


def int8_linear(p: dict, x: jax.Array) -> jax.Array:
    """Dynamic-activation int8 matmul: y = (x_q @ w_q) * s_x * s_w + b.

    The abs-max reduce stays in the activation dtype (bf16); the quantize
    step still upcasts x to f32 (XLA fuses it into the round/clip chain).
    Measured ~11% faster per isolated matmul than reducing an f32 upcast,
    ~neutral in the full model (BENCH_NOTES.md r2)."""
    orig_dtype = x.dtype
    s_x = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    s_x = jnp.maximum(s_x, 1e-8)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s_x)), -127, 127).astype(
        jnp.int8
    )
    acc = jax.lax.dot_general(
        x_q,
        p["w_q"],
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # scales kept f32 regardless of the activation dtype policy
    y = acc.astype(jnp.float32) * s_x * p["s_w"].astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(orig_dtype)


def quantize_lavila_params(params: dict) -> dict:
    """Quantize the visual tower's block matmuls in a LaviLa params tree."""
    import copy

    out = copy.copy(params)
    visual = copy.copy(params["visual"])
    blocks = dict(visual["blocks"])

    for key in ("attn", "timeattn"):
        blk = dict(blocks[key])
        for sub in ("qkv", "proj"):
            blk[sub] = _quantize_stacked(blk[sub])
        blocks[key] = blk
    for sub in ("mlp_fc1", "mlp_fc2"):
        blocks[sub] = _quantize_stacked(blocks[sub])
    visual["blocks"] = blocks
    out["visual"] = visual
    return out


def _quantize_stacked(p: dict) -> dict:
    """Quantize a stacked (L, in, out) linear param dict layer-wise."""
    w = jnp.asarray(p["w"], jnp.float32)  # (L, in, out)
    s_w = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0  # (L, 1, out)
    s_w = jnp.maximum(s_w, 1e-8)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "s_w": s_w[:, 0, :]}
    if "b" in p:
        out["b"] = p["b"]
    return out
