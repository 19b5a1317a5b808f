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

Mixed-precision fallback (``act_outlier_threshold``): per-token dynamic
activation quantization breaks when a few channels carry outlier
magnitudes (the abs-max scale crushes the other channels' resolution) —
the known failure mode of real CLIP-family weights that random init
cannot reproduce. In transformers those outlier channels are produced by
LayerNorm scale amplification, so each BLOCK gets an activation-outlier
score = the max gamma spread (max|g| / median|g|) over its three norms;
blocks above the threshold keep unquantized matmuls for all six of their
matmul families, via a per-layer ``q_on`` flag resolved with
``lax.cond`` inside the block scan. Validity domain measured in
tests/test_quant.py (test_int8_outlier_threshold_and_fallback): plain
int8 holds to ~8x gamma outliers at 2% channel frequency and is broken
at 32x; block-level fallback fully restores rank stability there
(per-matmul fallback of only the LN-fed layers does not — the outliers
ride the residual stream into proj/mlp_fc2).

Note: enabling the fallback also disables the fused activation->int8
kernels (ops/act_quant.py) and the attention quant_out path globally —
the ``q_on`` flag lives in the stacked param structure shared by every
scanned block, so the conservative XLA dynamic-quant path runs instead.
Pure int8 mode (no threshold) keeps the fully fused path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_linear_params",
    "quantize_lavila_params",
    "int8_linear",
    "mixed_linear",
]

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


def mixed_linear(p: dict, x: jax.Array) -> jax.Array:
    """Per-layer int8-or-not dispatch: ``p['q_on']`` (a scalar after the
    block scan slices the stacked (L,) flag) selects the int8 matmul or
    the retained full-precision weight."""

    def q_branch(x):
        return int8_linear(p, x)

    def f_branch(x):
        y = x @ p["w"].astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(x.dtype)
        return y

    return jax.lax.cond(p["q_on"], q_branch, f_branch, x)


def _gamma_spread(g) -> jnp.ndarray:
    """Per-layer LN-gamma outlier score: max|g| / median|g| over channels."""
    a = jnp.abs(jnp.asarray(g, jnp.float32))  # (L, W)
    return jnp.max(a, axis=-1) / jnp.maximum(jnp.median(a, axis=-1), 1e-8)


def int8_linear_prequant(p: dict, x_q: jax.Array, s_x: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
    """int8 matmul on an ALREADY-quantized activation (x_q int8 with
    per-token scales s_x (..., 1) f32) — the consumer of the attention
    kernel's quant_out path (ops/divided_attention.py), which quantizes
    its output in-VMEM so no reduce_max/convert pass over the activation
    ever runs in XLA."""
    acc = jax.lax.dot_general(
        x_q,
        p["w_q"],
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_x * p["s_w"].astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(out_dtype)


def quantize_lavila_params(params: dict, act_outlier_threshold: float | None = None) -> dict:
    """Quantize the visual tower's block matmuls in a LaviLa params tree.

    ``act_outlier_threshold``: enable the per-layer mixed-precision
    fallback (module docstring). Layers whose activation-outlier score
    exceeds the threshold keep their full-precision matmul.
    """
    import copy

    out = copy.copy(params)
    visual = copy.copy(params["visual"])
    blocks = dict(visual["blocks"])

    score = None
    if act_outlier_threshold is not None:
        # block-level score: the max gamma spread over the block's three
        # norms (norm1 feeds space-attn qkv, norm3 time-attn qkv, norm2
        # the MLP — model/LaviLa.py:345-390). Outlier channels the norms
        # amplify propagate through the whole block's residual stream, so
        # per-matmul fallback of just the LN-fed layers leaves residual
        # error in proj/mlp_fc2 (measured: argmax agreement 0.67 vs 1.00
        # for block-level fallback at 32x outliers, BENCH_NOTES.md r3);
        # the whole block falls back together.
        score = jnp.maximum(
            jnp.maximum(
                _gamma_spread(blocks["norm1"]["g"]),
                _gamma_spread(blocks["norm2"]["g"]),
            ),
            _gamma_spread(blocks["norm3"]["g"]),
        )

    for key in ("attn", "timeattn"):
        blk = dict(blocks[key])
        for sub in ("qkv", "proj"):
            blk[sub] = _quantize_stacked(blk[sub], score, act_outlier_threshold)
        blocks[key] = blk
    for sub in ("mlp_fc1", "mlp_fc2"):
        blocks[sub] = _quantize_stacked(blocks[sub], score, act_outlier_threshold)
    visual["blocks"] = blocks
    out["visual"] = visual
    return out


def _quantize_stacked(p: dict, score=None, threshold: float | None = None) -> dict:
    """Quantize a stacked (L, in, out) linear param dict layer-wise.

    With a ``threshold``, layers whose outlier ``score`` (or, for matmuls
    not fed by a LayerNorm, their weight-scale spread) exceeds it keep the
    original weight and a ``q_on=False`` flag for ``mixed_linear``."""
    w = jnp.asarray(p["w"], jnp.float32)  # (L, in, out)
    s_w = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0  # (L, 1, out)
    s_w = jnp.maximum(s_w, 1e-8)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "s_w": s_w[:, 0, :]}
    if "b" in p:
        out["b"] = p["b"]
    if threshold is not None:
        if score is None:
            s = s_w[:, 0, :]
            score = jnp.max(s, axis=-1) / jnp.maximum(jnp.median(s, axis=-1), 1e-12)
        q_on = jnp.asarray(score) <= threshold
        if not bool(jnp.all(q_on)):
            out["q_on"] = q_on
            out["w"] = p["w"]  # retained for the fallback branch
    return out
