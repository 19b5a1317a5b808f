"""OpenAI CLIP image towers (ViT + ModifiedResNet), functional JAX.

Completes the OpenAI CLIP model zoo (reference model/openai_model.py:
21-273): the reference vendors the full zoo because its checkpoint loader
builds either tower from a raw OpenAI state dict (openai_model.py:444-485),
even though the LaviLa pipeline only ever consumes the ViT weights via
``remap_keys``. This module provides the same capability natively:

- ``VisionTransformer`` (openai_model.py:235-273): stride-P conv patchify
  (done as a reshape + one MXU matmul, channel-last), class embedding +
  positional embedding, ln_pre, pre-norm residual attention blocks with
  QuickGELU (shared with the text tower, openai_model.py:182-232), ln_post
  on CLS, optional output projection; ``cls_at_last=False`` returns the
  patch feature map like the reference.
- ``ModifiedResNet`` (openai_model.py:105-165): 3-conv stem + avgpool,
  anti-aliased strided bottlenecks (avgpool before the stride-1 conv3 and
  in the downsample path, openai_model.py:21-66), and ``AttentionPool2d``
  (openai_model.py:69-102) — a single-query MHA over [mean | tokens] with
  separate q/k/v projections.

BatchNorms run in inference mode (these towers are frozen weight sources);
running stats are part of the params tree. ``clip_image_tower_from_state_dict``
mirrors ``build_model``'s architecture sniffing (openai_model.py:444-464).

TPU-first notes: everything is channel-last (NHWC) so convs lower to
XLA:TPU's native layout; the ViT transformer scans over stacked block
params like the text tower; BN is folded to one scale/bias multiply-add at
forward time.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .clip_text import _block_forward, _init_block, TextConfig
from .layers import layer_norm, layer_norm_init, linear, linear_init

__all__ = [
    "ClipVitConfig",
    "ClipResNetConfig",
    "init_clip_vit_params",
    "init_clip_resnet_params",
    "clip_vit_encode",
    "clip_resnet_encode",
    "convert_openai_vit_tower",
    "convert_openai_resnet_tower",
    "clip_image_tower_from_state_dict",
]


# ---------------------------------------------------------------- ViT ----


@dataclass(frozen=True)
class ClipVitConfig:
    input_resolution: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    output_dim: int = 768
    ln_eps: float = 1e-5

    @property
    def grid(self) -> int:
        return self.input_resolution // self.patch_size


def init_clip_vit_params(key, cfg: ClipVitConfig):
    keys = jax.random.split(key, cfg.layers + 4)
    tcfg = TextConfig(width=cfg.width, heads=cfg.heads, layers=cfg.layers)
    blocks = [_init_block(keys[i], tcfg) for i in range(cfg.layers)]
    scale = cfg.width**-0.5
    pdim = cfg.patch_size * cfg.patch_size * 3
    return {
        "patch_embed": {"w": jax.random.normal(keys[-4], (pdim, cfg.width)) * scale},
        "class_embedding": jax.random.normal(keys[-3], (cfg.width,)) * scale,
        "positional_embedding": jax.random.normal(
            keys[-2], (cfg.grid**2 + 1, cfg.width)
        )
        * scale,
        "ln_pre": layer_norm_init(cfg.width),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_post": layer_norm_init(cfg.width),
        "proj": jax.random.normal(keys[-1], (cfg.width, cfg.output_dim)) * scale,
    }


def clip_vit_encode(
    params,
    cfg: ClipVitConfig,
    images,
    *,
    apply_project: bool = True,
    cls_at_last: bool = True,
    dtype=jnp.float32,
):
    """images (B, H, W, 3) -> CLS embedding (B, output_dim) or, with
    ``cls_at_last=False``, the patch feature map (B, grid^2, width)
    (openai_model.py:252-273)."""
    b, hh, ww, c = images.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    x = images.astype(dtype).reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
    x = x @ params["patch_embed"]["w"].astype(dtype)

    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype), (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(dtype)
    x = layer_norm(params["ln_pre"], x, cfg.ln_eps)

    def body(x, blk):
        return _block_forward(blk, x, None, cfg.heads, cfg.ln_eps), None

    blocks = jax.tree.map(lambda a: a.astype(dtype), params["blocks"])
    x, _ = jax.lax.scan(body, x, blocks)

    if not cls_at_last:
        return x[:, 1:, :]
    x = layer_norm(params["ln_post"], x[:, 0, :], cfg.ln_eps)
    if apply_project:
        x = x @ params["proj"].astype(dtype)
    return x


# ---------------------------------------------------------- ResNet ----


@dataclass(frozen=True)
class ClipResNetConfig:
    layers: tuple = (3, 4, 6, 3)  # RN50
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout)) * (2.0 / fan_in) ** 0.5
    return {"w": w}


def _bn_init(c):
    return {
        "g": jnp.ones((c,), jnp.float32),
        "b": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _conv(p, x, stride=1):
    # torch Conv2d(padding=k//2) geometry, EXPLICIT: XLA "SAME" centers
    # its windows differently for stride 2 (stem conv1 would sample rows
    # [2j, 2j+2] instead of torch's [2j-1, 2j+1]), silently breaking
    # parity with the reference ModifiedResNet (openai_model.py:108)
    kh, kw = p["w"].shape[:2]
    return jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        (stride, stride),
        ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, x, eps=1e-5):
    scale = p["g"] * jax.lax.rsqrt(p["var"] + eps)
    bias = p["b"] - p["mean"] * scale
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def _init_bottleneck(key, cin, planes, stride):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _conv_init(ks[0], 1, 1, cin, planes),
        "bn1": _bn_init(planes),
        "conv2": _conv_init(ks[1], 3, 3, planes, planes),
        "bn2": _bn_init(planes),
        "conv3": _conv_init(ks[2], 1, 1, planes, planes * 4),
        "bn3": _bn_init(planes * 4),
        "stride": stride,
    }
    if stride > 1 or cin != planes * 4:
        p["downsample"] = {
            "conv": _conv_init(ks[3], 1, 1, cin, planes * 4),
            "bn": _bn_init(planes * 4),
        }
    return p


def _bottleneck(p, x):
    """Anti-aliased bottleneck: avgpool *after* conv2 / *before* the
    downsample conv when stride > 1 (openai_model.py:24-66)."""
    out = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x)))
    out = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2"], out)))
    if p["stride"] > 1:
        out = _avgpool(out, p["stride"])
    out = _bn(p["bn3"], _conv(p["conv3"], out))
    identity = x
    if "downsample" in p:
        if p["stride"] > 1:
            identity = _avgpool(identity, p["stride"])
        identity = _bn(p["downsample"]["bn"], _conv(p["downsample"]["conv"], identity))
    return jax.nn.relu(out + identity)


def init_clip_resnet_params(key, cfg: ClipResNetConfig):
    w = cfg.width
    ks = jax.random.split(key, 8 + sum(cfg.layers))
    params = {
        "conv1": _conv_init(ks[0], 3, 3, 3, w // 2),
        "bn1": _bn_init(w // 2),
        "conv2": _conv_init(ks[1], 3, 3, w // 2, w // 2),
        "bn2": _bn_init(w // 2),
        "conv3": _conv_init(ks[2], 3, 3, w // 2, w),
        "bn3": _bn_init(w),
    }
    cin, ki = w, 3
    for li, (blocks, planes) in enumerate(
        zip(cfg.layers, (w, w * 2, w * 4, w * 8)), start=1
    ):
        layer = []
        for bi in range(blocks):
            stride = 2 if (bi == 0 and li > 1) else 1
            layer.append(_init_bottleneck(ks[ki], cin, planes, stride))
            cin = planes * 4
            ki += 1
        params[f"layer{li}"] = layer
    embed_dim = w * 32
    kq, kk, kv, kc, kp = jax.random.split(ks[ki], 5)
    params["attnpool"] = {
        "positional_embedding": jax.random.normal(
            kp, ((cfg.input_resolution // 32) ** 2 + 1, embed_dim)
        )
        * embed_dim**-0.5,
        "q": linear_init(kq, embed_dim, embed_dim),
        "k": linear_init(kk, embed_dim, embed_dim),
        "v": linear_init(kv, embed_dim, embed_dim),
        "c": linear_init(kc, embed_dim, cfg.output_dim),
    }
    return params


def _attention_pool(p, x, heads: int):
    """Single-query MHA over [mean | tokens] (openai_model.py:69-102).

    x: (B, HW, C) -> (B, output_dim)."""
    b, n, c = x.shape
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)  # (B, 1+HW, C)
    x = x + p["positional_embedding"].astype(x.dtype)
    q = linear(p["q"], x[:, :1])  # (B, 1, C)
    k = linear(p["k"], x)
    v = linear(p["v"], x)
    dh = c // heads
    q = q.reshape(b, 1, heads, dh).transpose(0, 2, 1, 3) * dh**-0.5
    k = k.reshape(b, n + 1, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, n + 1, heads, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)
    return linear(p["c"], out)[:, 0]


def clip_resnet_encode(params, cfg: ClipResNetConfig, images, *, dtype=jnp.float32):
    """images (B, H, W, 3) -> pooled embedding (B, output_dim)
    (openai_model.py:149-165)."""
    x = images.astype(dtype)
    x = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"], x, stride=2)))
    x = jax.nn.relu(_bn(params["bn2"], _conv(params["conv2"], x)))
    x = jax.nn.relu(_bn(params["bn3"], _conv(params["conv3"], x)))
    x = _avgpool(x, 2)
    for li in range(1, 5):
        for blk in params[f"layer{li}"]:
            x = _bottleneck(blk, x)
    b, h, w, c = x.shape
    return _attention_pool(params["attnpool"], x.reshape(b, h * w, c), cfg.heads)


# ------------------------------------------------- torch converters ----


def _t(a):
    return jnp.asarray(np.asarray(a, dtype=np.float32))


def count_resblocks(sd: dict, prefix: str = "transformer.resblocks") -> int:
    """Number of ResidualAttentionBlocks under ``prefix`` in a state dict
    (the build_model sniffing pattern, openai_model.py:449-471)."""
    depth = prefix.count(".") + 1
    return len({k.split(".")[depth] for k in sd if k.startswith(prefix + ".")})


def _conv_t(sd, name):
    # torch (out, in, kh, kw) -> HWIO
    return {"w": _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}


def _bn_t(sd, name):
    return {
        "g": _t(sd[f"{name}.weight"]),
        "b": _t(sd[f"{name}.bias"]),
        "mean": _t(sd[f"{name}.running_mean"]),
        "var": _t(sd[f"{name}.running_var"]),
    }


def _lin_t(sd, name):
    p = {"w": _t(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["b"] = _t(sd[f"{name}.bias"])
    return p


def _vit_block_t(sd, name):
    w = _t(sd[f"{name}.attn.in_proj_weight"])  # (3D, D)
    b = _t(sd[f"{name}.attn.in_proj_bias"])
    d = w.shape[1]
    wq, wk, wv = w[:d].T, w[d : 2 * d].T, w[2 * d :].T
    return {
        "ln_1": {"g": _t(sd[f"{name}.ln_1.weight"]), "b": _t(sd[f"{name}.ln_1.bias"])},
        "attn": {
            "wq": {"w": wq, "b": b[:d]},
            "wk": {"w": wk, "b": b[d : 2 * d]},
            "wv": {"w": wv, "b": b[2 * d :]},
            "wo": _lin_t(sd, f"{name}.attn.out_proj"),
        },
        "ln_2": {"g": _t(sd[f"{name}.ln_2.weight"]), "b": _t(sd[f"{name}.ln_2.bias"])},
        "mlp_fc": _lin_t(sd, f"{name}.mlp.c_fc"),
        "mlp_proj": _lin_t(sd, f"{name}.mlp.c_proj"),
    }


def convert_openai_vit_tower(sd: dict, prefix: str = "visual."):
    """OpenAI CLIP ViT visual state dict -> (ClipVitConfig, params)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)} if prefix else dict(sd)
    conv1 = _t(sd["conv1.weight"])  # (width, 3, P, P)
    width, _, p, _ = conv1.shape
    n_layers = count_resblocks(sd)
    grid = int(round((sd["positional_embedding"].shape[0] - 1) ** 0.5))
    cfg = ClipVitConfig(
        input_resolution=p * grid,
        patch_size=p,
        width=width,
        layers=n_layers,
        heads=width // 64,
        output_dim=int(sd["proj"].shape[1]),
    )
    blocks = [
        _vit_block_t(sd, f"transformer.resblocks.{i}") for i in range(n_layers)
    ]
    params = {
        # (width, 3, P, P) -> (P, P, 3, width) -> (P*P*3, width), matching
        # the (ph, pw, c) patch flattening order of clip_vit_encode
        "patch_embed": {"w": conv1.transpose(2, 3, 1, 0).reshape(p * p * 3, width)},
        "class_embedding": _t(sd["class_embedding"]),
        "positional_embedding": _t(sd["positional_embedding"]),
        "ln_pre": {"g": _t(sd["ln_pre.weight"]), "b": _t(sd["ln_pre.bias"])},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_post": {"g": _t(sd["ln_post.weight"]), "b": _t(sd["ln_post.bias"])},
        "proj": _t(sd["proj"]),
    }
    return cfg, params


def convert_openai_resnet_tower(sd: dict, prefix: str = "visual."):
    """OpenAI CLIP ModifiedResNet visual state dict -> (cfg, params)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)} if prefix else dict(sd)
    counts = tuple(
        len({k.split(".")[1] for k in sd if k.startswith(f"layer{b}.")})
        for b in (1, 2, 3, 4)
    )
    width = sd["layer1.0.conv1.weight"].shape[0]
    out_res = int(round((sd["attnpool.positional_embedding"].shape[0] - 1) ** 0.5))
    cfg = ClipResNetConfig(
        layers=counts,
        output_dim=int(sd["attnpool.c_proj.weight"].shape[0]),
        heads=width * 32 // 64,
        input_resolution=out_res * 32,
        width=width,
    )
    params = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv_t(sd, f"conv{i}")
        params[f"bn{i}"] = _bn_t(sd, f"bn{i}")
    for li in range(1, 5):
        layer = []
        for bi in range(counts[li - 1]):
            name = f"layer{li}.{bi}"
            blk = {
                "conv1": _conv_t(sd, f"{name}.conv1"),
                "bn1": _bn_t(sd, f"{name}.bn1"),
                "conv2": _conv_t(sd, f"{name}.conv2"),
                "bn2": _bn_t(sd, f"{name}.bn2"),
                "conv3": _conv_t(sd, f"{name}.conv3"),
                "bn3": _bn_t(sd, f"{name}.bn3"),
                "stride": 2 if (bi == 0 and li > 1) else 1,
            }
            if f"{name}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _conv_t(sd, f"{name}.downsample.0"),
                    "bn": _bn_t(sd, f"{name}.downsample.1"),
                }
            layer.append(blk)
        params[f"layer{li}"] = layer
    params["attnpool"] = {
        "positional_embedding": _t(sd["attnpool.positional_embedding"]),
        "q": _lin_t(sd, "attnpool.q_proj"),
        "k": _lin_t(sd, "attnpool.k_proj"),
        "v": _lin_t(sd, "attnpool.v_proj"),
        "c": _lin_t(sd, "attnpool.c_proj"),
    }
    return cfg, params


def clip_image_tower_from_state_dict(sd: dict):
    """build_model-style sniffing (openai_model.py:444-464): returns
    ('vit'|'resnet', cfg, params, encode_fn) for a full CLIP state dict."""
    if "visual.proj" in sd:
        cfg, params = convert_openai_vit_tower(sd)
        return "vit", cfg, params, clip_vit_encode
    cfg, params = convert_openai_resnet_tower(sd)
    return "resnet", cfg, params, clip_resnet_encode
