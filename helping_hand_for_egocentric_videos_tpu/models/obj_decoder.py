"""Object decoder: DETR-style transformer over frozen backbone features.

The paper's trainable module (reference: model/tfm_decoder.py:50-241).
Given the backbone's patch-token grid for a T-frame clip and a set of
learnable queries, a 6-layer pre-norm decoder (self-attention first)
cross-attends into the (LayerNormed) memory and emits:

- per-query per-frame boxes via trajectory conditioning: each query state
  is concatenated with a learned frame embedding and projected, so one
  query decodes T boxes (tfm_decoder.py:210-224);
- class logits (unused by the losses, kept for API parity);
- intermediate states from every layer (aux outputs);
- projection heads: ``txt_proj`` (ReLU -> 768->256), ``vid_proj``
  (768->256), ``obj_proj`` (512->512 -> ReLU -> 512->256)
  (tfm_decoder.py:168-180).

Query layout (model/box_utils.py:433-456, run/train.py:164-191): queries
0:2 predict hand boxes, 2:num_queries-1 predict object boxes, and the last
query is the video summary embedding used for retrieval.

TPU notes: everything is fixed-shape; the decoder keeps batch-first
layouts throughout (the reference shuffles (S, B, D) for torch MHA); the
special num_queries==1 mode (decode one query into ``n_decode`` boxes via
a query-index embedding, tfm_decoder.py:135-139,217-224) is supported.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    dropout,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    mha_init,
    multi_head_attention,
)

__all__ = [
    "DecoderConfig",
    "init_decoder_params",
    "decoder_forward",
    "DecoderOutput",
    "position_embedding_sine",
]


@dataclass(frozen=True)
class DecoderConfig:
    d_model: int = 512
    nhead: int = 8
    num_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    num_queries: int = 13  # 12 object/hand queries + 1 summary
    num_classes: int = 22047  # reference keeps a (unused) class head
    feature_dim: int = 1024  # backbone width
    text_width: int = 768
    embed_dim: int = 256
    num_frames: int = 4
    patches_per_frame: int = 256
    pred_traj: bool = True
    n_decode: int = 10  # boxes per query in the num_queries==1 mode
    ln_eps: float = 1e-5


def _xavier(key, shape, fans=None):
    """xavier_uniform; ``fans`` overrides (fan_in, fan_out) — torch
    computes them on the PACKED (3d, d) in_proj_weight, so per-matrix
    q/k/v draws must use the packed fans or come out sqrt(2)x too wide."""
    fan_in, fan_out = fans if fans is not None else (shape[0], shape[1])
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _init_layer(key, cfg: DecoderConfig):
    ks = jax.random.split(key, 14)
    d, f = cfg.d_model, cfg.dim_feedforward
    p = {
        "norm1": layer_norm_init(d),
        "self_attn": mha_init(ks[0], d),
        "norm2": layer_norm_init(d),
        "cross_attn": mha_init(ks[1], d),
        "norm3": layer_norm_init(d),
        "linear1": linear_init(ks[2], d, f),
        "linear2": linear_init(ks[3], f, d),
    }
    # Cross_Attention._reset_parameters xavier-uniforms every >1D tensor
    # (tfm_decoder.py:71-74); torch sees the PACKED (3d, d)
    # in_proj_weight, so q/k/v use the packed fans. Keys are all distinct
    # (ks[4..13]) — reused keys would correlate linear1/2 with the
    # cross-attention draws.
    i = 4
    for attn in ("self_attn", "cross_attn"):
        for w in ("wq", "wk", "wv", "wo"):
            fans = (3 * d, d) if w != "wo" else None
            p[attn][w]["w"] = _xavier(ks[i], p[attn][w]["w"].shape, fans=fans)
            p[attn][w]["b"] = jnp.zeros_like(p[attn][w]["b"])
            i += 1
    p["linear1"]["w"] = _xavier(ks[12], p["linear1"]["w"].shape)
    p["linear2"]["w"] = _xavier(ks[13], p["linear2"]["w"].shape)
    return p


def init_decoder_params(key, cfg: DecoderConfig):
    keys = jax.random.split(key, cfg.num_layers + 16)
    layers = [_init_layer(keys[i], cfg) for i in range(cfg.num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    k = iter(keys[cfg.num_layers :])
    d = cfg.d_model
    params = {
        "pre_norm": layer_norm_init(d),  # memory norm (tfm_decoder.py:57,86)
        "layers": stacked,
        "decoder_norm": layer_norm_init(d),
        "query_embed": jax.random.normal(next(k), (cfg.num_queries, d)),
        "class_embed": linear_init(next(k), d, cfg.num_classes + 1),
        # bbox head: 3-layer MLP d->d->d->4 (tfm_decoder.py:96-108,132)
        "bbox_mlp": [
            linear_init(next(k), d, d),
            linear_init(next(k), d, d),
            linear_init(next(k), d, 4),
        ],
        "proj": {"w": _xavier(next(k), (cfg.feature_dim, d))},  # no bias (tfm:156)
        "pos_embed": jax.random.normal(next(k), (1, cfg.patches_per_frame + 1, d)) * 0.02,
        "temporal_embed": jax.random.normal(next(k), (1, cfg.num_frames, d)) * 0.02,
        # projection heads
        "txt_proj": linear_init(next(k), cfg.text_width, cfg.embed_dim),
        "vid_proj": linear_init(next(k), cfg.text_width, cfg.embed_dim),
        "obj_proj": [
            linear_init(next(k), d, d),
            linear_init(next(k), d, cfg.embed_dim),
        ],
    }
    if cfg.pred_traj:
        params["frame_index"] = jax.random.normal(next(k), (cfg.num_frames, d))
        params["frame_proj"] = linear_init(next(k), 2 * d, d)
    if cfg.num_queries == 1:
        params["query_index"] = jax.random.normal(next(k), (cfg.n_decode, d))
    return params


def txt_proj(params, x):
    """ReLU -> Linear(768, 256) (tfm_decoder.py:170-171)."""
    return linear(params["txt_proj"], jax.nn.relu(x))


def vid_proj(params, x):
    return linear(params["vid_proj"], x)


def obj_proj(params, x):
    """Linear -> ReLU -> Linear(512, 256) (tfm_decoder.py:176-180)."""
    h = jax.nn.relu(linear(params["obj_proj"][0], x))
    return linear(params["obj_proj"][1], h)


def _bbox_mlp(params, x):
    h = jax.nn.relu(linear(params["bbox_mlp"][0], x))
    h = jax.nn.relu(linear(params["bbox_mlp"][1], h))
    return linear(params["bbox_mlp"][2], h)


def _decoder_layer(
    p, tgt, memory, query_pos, pos, cfg: DecoderConfig, rng, deterministic,
    return_attn: bool = False,
):
    """Pre-norm, self-attention-first layer (tfm_decoder.py:430-461).

    With ``return_attn``, also returns the (head-averaged) self and cross
    attention maps, mirroring the reference's layer outputs
    (tfm_decoder.py:433-441)."""
    eps = cfg.ln_eps
    rngs = jax.random.split(rng, 6) if rng is not None else (None,) * 6
    train = not deterministic and rng is not None
    # torch nn.MultiheadAttention(dropout=p) also drops the softmax
    # weights themselves (tfm_decoder.py:303/365) — in addition to the
    # three residual dropouts — and the FFN drops its hidden activation
    # between relu and linear2 (linear2(dropout(activation(linear1))),
    # tfm_decoder.py:458)
    attn_kw = lambda k: {  # noqa: E731
        "dropout_rng": rngs[k] if train else None,
        "dropout_rate": cfg.dropout,
    }

    t2 = layer_norm(p["norm1"], tgt, eps)
    qk = t2 + query_pos
    sa = multi_head_attention(
        p["self_attn"], qk, qk, t2, cfg.nhead, return_probs=return_attn,
        **attn_kw(3),
    )
    sa, self_attn = sa if return_attn else (sa, None)
    tgt = tgt + dropout(rngs[0], sa, cfg.dropout, deterministic)

    t2 = layer_norm(p["norm2"], tgt, eps)
    ca = multi_head_attention(
        p["cross_attn"], t2 + query_pos, memory + pos, memory, cfg.nhead,
        return_probs=return_attn, **attn_kw(4),
    )
    ca, cross_attn = ca if return_attn else (ca, None)
    tgt = tgt + dropout(rngs[1], ca, cfg.dropout, deterministic)

    t2 = layer_norm(p["norm3"], tgt, eps)
    hidden = dropout(rngs[5], jax.nn.relu(linear(p["linear1"], t2)), cfg.dropout, deterministic)
    ff = linear(p["linear2"], hidden)
    out = tgt + dropout(rngs[2], ff, cfg.dropout, deterministic)
    if return_attn:
        return out, cross_attn, self_attn
    return out


@dataclass
class DecoderOutput:
    pred_logits: jax.Array  # (B', Q', C+1) last layer
    pred_boxes: jax.Array  # (B', Q', 4) last layer, sigmoid cxcywh
    aux_pred_logits: jax.Array  # (L-1, B', Q', C+1)
    aux_pred_boxes: jax.Array  # (L-1, B', Q', 4)
    hs: jax.Array  # (L, B, Q, D) normed intermediate states
    cross_attn: jax.Array | None = None  # (L, B, Q, T*N) head-avg maps
    self_attn: jax.Array | None = None  # (L, B, Q, Q)


def decoder_forward(
    params,
    cfg: DecoderConfig,
    features,
    *,
    rng=None,
    deterministic: bool = True,
    return_attn: bool = False,
) -> DecoderOutput:
    """Run the object decoder.

    Args:
        features: (B, T, N, feature_dim) backbone patch grid (CLS removed),
            T-major token order, matching the train-loop rearrange
            (run/train.py:115-116).
    Returns:
        DecoderOutput. When ``pred_traj`` and T == num_frames, box tensors
        are per-frame: B' = B*T (the train loop flattens GT the same way,
        run/train.py:161-163); otherwise B' = B and Q' = Q (or n_decode
        mode semantics for num_queries == 1).
    """
    b, t, n, _ = features.shape
    d = cfg.d_model

    mem = features.reshape(b, t * n, cfg.feature_dim) @ params["proj"]["w"]

    # 3D pos embed: spatial table tiled over T + temporal repeat-interleave
    # (tfm_decoder.py:161-166)
    pos_spatial = jnp.tile(params["pos_embed"][:, 1:, :], (1, t, 1))
    pos_temporal = jnp.repeat(params["temporal_embed"][:, :t, :], n, axis=1)
    pos = (pos_spatial + pos_temporal).astype(mem.dtype)  # (1, T*N, D)

    memory = layer_norm(params["pre_norm"], mem, cfg.ln_eps)

    q = cfg.num_queries
    query_pos = jnp.broadcast_to(params["query_embed"], (b, q, d)).astype(mem.dtype)
    tgt = jnp.zeros((b, q, d), mem.dtype)

    num_layers = cfg.num_layers
    rngs = jax.random.split(rng, num_layers) if rng is not None else [None] * num_layers

    hs, cross_maps, self_maps = [], [], []
    for i in range(num_layers):
        layer_p = jax.tree.map(lambda a, i=i: a[i], params["layers"])
        out_i = _decoder_layer(
            layer_p, tgt, memory, query_pos, pos, cfg, rngs[i], deterministic,
            return_attn=return_attn,
        )
        if return_attn:
            tgt, ca, sa = out_i
            cross_maps.append(ca)
            self_maps.append(sa)
        else:
            tgt = out_i
        hs.append(layer_norm(params["decoder_norm"], tgt, cfg.ln_eps))
    hs = jnp.stack(hs)  # (L, B, Q, D)

    outputs_class = linear(params["class_embed"], hs)  # (L, B, Q, C+1)

    if cfg.pred_traj and t == cfg.num_frames:
        frame_embed = params["frame_index"][None, None, :, None, :]  # (1,1,T,1,D)
        if cfg.num_queries != 1:
            expand_hs = jnp.broadcast_to(
                hs[:, :, None], (num_layers, b, t, q, d)
            )
            cond = jnp.concatenate(
                [expand_hs, jnp.broadcast_to(frame_embed, expand_hs.shape)], axis=-1
            )
            nq_out = q
        else:
            expand_hs = jnp.broadcast_to(
                hs[:, :, None], (num_layers, b, t, cfg.n_decode, d)
            )
            obj_embed = params["query_index"][None, None, None, :, :]
            cond = jnp.concatenate(
                [
                    expand_hs,
                    jnp.broadcast_to(frame_embed + obj_embed, expand_hs.shape),
                ],
                axis=-1,
            )
            nq_out = cfg.n_decode
        cond_hs = linear(params["frame_proj"], cond)  # (L, B, T, Q', D)
        cond_hs = cond_hs.reshape(num_layers, b * t, nq_out, d)
        # class logits broadcast over frames, and over n_decode in the
        # nq==1 mode (tfm_decoder.py:216,224)
        outputs_class = jnp.broadcast_to(
            outputs_class[:, :, None], (num_layers, b, t, nq_out, cfg.num_classes + 1)
        ).reshape(num_layers, b * t, nq_out, cfg.num_classes + 1)
    else:
        cond_hs = hs

    outputs_coord = jax.nn.sigmoid(_bbox_mlp(params, cond_hs))

    return DecoderOutput(
        pred_logits=outputs_class[-1],
        pred_boxes=outputs_coord[-1],
        aux_pred_logits=outputs_class[:-1],
        aux_pred_boxes=outputs_coord[:-1],
        hs=hs,
        cross_attn=jnp.stack(cross_maps) if return_attn else None,
        self_attn=jnp.stack(self_maps) if return_attn else None,
    )


def position_embedding_sine(
    mask,
    num_pos_feats: int = 64,
    temperature: float = 10000.0,
    normalize: bool = False,
    scale: float | None = None,
):
    """DETR sine positional embedding over a padding mask
    (model/tfm_decoder.py:13-47; unused by the reference's main path —
    the decoder learns a 3D pos embed instead — kept for module parity).

    mask: (B, H, W) bool, True = padded. Returns (B, 2*num_pos_feats, H, W)
    channel-first, matching the reference's output layout.
    """
    if scale is not None and not normalize:
        raise ValueError("normalize should be True if scale is passed")
    if scale is None:
        scale = 2 * np.pi
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t  # (B, H, W, F)
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack(
        (jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])), axis=4
    ).reshape(*pos_x.shape[:3], -1)
    pos_y = jnp.stack(
        (jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])), axis=4
    ).reshape(*pos_y.shape[:3], -1)
    return jnp.concatenate((pos_y, pos_x), axis=3).transpose(0, 3, 1, 2)
