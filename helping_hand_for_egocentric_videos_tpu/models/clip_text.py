"""CLIP text tower (OpenAI architecture), functional JAX implementation.

Matches the reference text path: token embedding + positional embedding ->
N pre-norm residual attention blocks with a causal mask and QuickGELU MLPs
-> ln_final; the sentence embedding is the ln_final output at the EOT
position (= argmax over token ids, EOT having the largest id) projected by
``text_projection``. Reference: model/openai_model.py:182-232 (blocks),
model/LaviLa.py:607-670 (wiring, EOT lookup).

TPU notes: layers run under ``lax.scan`` over stacked parameters (one
compiled block body instead of 12 unrolled), tokens are int32, and all
matmuls hit the MXU in the caller's chosen dtype (bf16 for the frozen
backbone).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .layers import layer_norm, layer_norm_init, linear, linear_init, mha_init, multi_head_attention, quick_gelu

__all__ = ["TextConfig", "init_text_params", "encode_text"]


@dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    heads: int = 12
    layers: int = 12
    embed_dim: int = 256  # projection dim
    ln_eps: float = 1e-5


def _init_block(key, cfg: TextConfig):
    k1, k2, k3, kq, kk, kv, ko = jax.random.split(key, 7)
    width = cfg.width
    attn_std = width**-0.5
    proj_std = (width**-0.5) * ((2 * cfg.layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    p = {
        "ln_1": layer_norm_init(width),
        "attn": mha_init(k1, width),
        "ln_2": layer_norm_init(width),
        "mlp_fc": linear_init(k2, width, width * 4, std=fc_std),
        "mlp_proj": linear_init(k3, width * 4, width, std=proj_std),
    }
    # CLIP initialize_parameters (openai_model.py): in_proj ~ N(0, attn_std)
    # — one (3D, D) draw, i.e. INDEPENDENT q/k/v slices (a shared key
    # would make Wq == Wk == Wv bit-identical) — out_proj ~ N(0, proj_std)
    for w, kw in (("wq", kq), ("wk", kk), ("wv", kv)):
        p["attn"][w]["w"] = jax.random.normal(kw, (width, width)) * attn_std
    p["attn"]["wo"]["w"] = jax.random.normal(ko, (width, width)) * proj_std
    return p


def init_text_params(key, cfg: TextConfig):
    keys = jax.random.split(key, cfg.layers + 3)
    blocks = [_init_block(keys[i], cfg) for i in range(cfg.layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "token_embedding": jax.random.normal(keys[-3], (cfg.vocab_size, cfg.width)) * 0.02,
        "positional_embedding": jax.random.normal(keys[-2], (cfg.context_length, cfg.width)) * 0.01,
        "blocks": stacked,
        "ln_final": layer_norm_init(cfg.width),
        "text_projection": jax.random.normal(keys[-1], (cfg.width, cfg.embed_dim))
        * cfg.width**-0.5,
    }


def _block_forward(p, x, mask, heads: int, eps: float):
    x = x + multi_head_attention(p["attn"], *([layer_norm(p["ln_1"], x, eps)] * 3), heads, mask=mask)
    h = layer_norm(p["ln_2"], x, eps)
    h = linear(p["mlp_proj"], quick_gelu(linear(p["mlp_fc"], h)))
    return x + h


def encode_text(params, cfg: TextConfig, tokens, *, dtype=jnp.float32):
    """tokens: (B, L) int32 -> (text_embed (B, embed_dim), feature_map (B, L, width)).

    ``text_embed`` is the projected EOT feature (unnormalised — callers
    normalise, reference model/LaviLa.py:669-677); ``feature_map`` is the
    pre-projection ln_final output used by the decoder's txt_proj.
    """
    b, n = tokens.shape
    x = params["token_embedding"][tokens].astype(dtype)
    x = x + params["positional_embedding"][:n].astype(dtype)

    # causal mask, (1, 1, L, L); built like model/LaviLa.py:642-648
    causal = jnp.triu(jnp.full((n, n), -1e9, dtype=jnp.float32), k=1)[None, None]

    def body(x, blk):
        return _block_forward(blk, x, causal, cfg.heads, cfg.ln_eps), None

    blocks = jax.tree.map(lambda a: a.astype(dtype), params["blocks"])
    x, _ = jax.lax.scan(body, x, blocks)
    x = layer_norm(params["ln_final"], x, cfg.ln_eps)

    eot = jnp.argmax(tokens, axis=-1)
    x_cls = x[jnp.arange(b), eot] @ params["text_projection"].astype(dtype)
    return x_cls, x
