"""Functional NN primitives shared by all models.

Parameters are plain nested dicts of ``jnp`` arrays (pytrees) — no module
framework. Linear weights are stored ``(in_features, out_features)`` (the
transpose of torch's Linear) so forward passes are straight ``x @ w`` MXU
matmuls; the checkpoint converter transposes once at load time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "linear_init",
    "linear",
    "layer_norm_init",
    "layer_norm",
    "quick_gelu",
    "mha_init",
    "multi_head_attention",
    "dropout",
]


def linear_init(key, d_in: int, d_out: int, *, bias: bool = True, std: float | None = None):
    """Torch-Linear-style init: U(-1/sqrt(in), 1/sqrt(in)), or normal(std)."""
    wkey, bkey = jax.random.split(key)
    if std is None:
        bound = d_in**-0.5
        w = jax.random.uniform(wkey, (d_in, d_out), jnp.float32, -bound, bound)
    else:
        w = jax.random.normal(wkey, (d_in, d_out), jnp.float32) * std
    p = {"w": w}
    if bias:
        bound = d_in**-0.5
        p["b"] = jax.random.uniform(bkey, (d_out,), jnp.float32, -bound, bound)
    return p


def linear(p, x):
    if "w_q" in p:  # int8-quantized weights (models/quant.py)
        from .quant import int8_linear, mixed_linear

        if "q_on" in p:  # per-layer mixed-precision fallback
            return mixed_linear(p, x)
        return int8_linear(p, x)
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def layer_norm_init(dim: int):
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p, x, eps: float = 1e-5):
    # Stats in f32 even when activations are bf16 — LN is precision-critical.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["g"] + p["b"]).astype(x.dtype)


def quick_gelu(x):
    """OpenAI CLIP's QuickGELU: x * sigmoid(1.702 x) (openai_model.py:177-179)."""
    return x * jax.nn.sigmoid(1.702 * x)


def mha_init(key, dim: int, *, qkv_bias: bool = True):
    kq, kk, kv, ko = jax.random.split(key, 4)
    p = {
        "wq": linear_init(kq, dim, dim, bias=qkv_bias),
        "wk": linear_init(kk, dim, dim, bias=qkv_bias),
        "wv": linear_init(kv, dim, dim, bias=qkv_bias),
        "wo": linear_init(ko, dim, dim, bias=True),
    }
    return p


def _split_heads(x, num_heads):
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * dh)


def multi_head_attention(
    p,
    q_in,
    k_in,
    v_in,
    num_heads: int,
    mask=None,
    return_probs: bool = False,
    dropout_rng=None,
    dropout_rate: float = 0.0,
):
    """Standard MHA matching torch.nn.MultiheadAttention semantics.

    q_in/k_in/v_in: (B, Nq/Nk, D). ``mask``: additive float mask broadcastable
    to (B, H, Nq, Nk) (use -inf/-1e9 for disallowed). With ``return_probs``
    also returns the head-averaged attention map (B, Nq, Nk) — torch's
    default averaged weights, used by the reference's visualisations.
    ``dropout_rng``/``dropout_rate``: torch's attention-probability
    dropout (nn.MultiheadAttention(dropout=p) drops softmax weights,
    inverted-scaled, without renormalising); active only when a rng is
    given. ``return_probs`` reports the pre-dropout weights, like torch.
    """
    h = num_heads
    q = _split_heads(linear(p["wq"], q_in), h)
    k = _split_heads(linear(p["wk"], k_in), h)
    v = _split_heads(linear(p["wv"], v_in), h)
    dh = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (dh**-0.5)
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    p_use = probs
    if dropout_rng is not None and dropout_rate > 0.0:
        p_use = dropout(dropout_rng, probs, dropout_rate, False)
    out = jnp.einsum("bhqk,bhkd->bhqd", p_use, v)
    out = linear(p["wo"], _merge_heads(out))
    if return_probs:
        return out, jnp.mean(probs, axis=1)
    return out


def dropout(rng, x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
