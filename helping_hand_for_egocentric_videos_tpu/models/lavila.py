"""LaviLa dual-encoder backbone: TimeSformer visual tower + CLIP text tower.

Functional equivalent of the reference's ``CLIP`` wrapper and its factory
functions (model/LaviLa.py:55-172,586-687): a frozen video-language model
whose ``forward`` returns normalised clip/text embeddings, the raw token
feature maps consumed by the object decoder, and the learned logit scale.

Factories:
- ``timesformer_large_config()``: ViT-L/14 inflation — width 1024 / depth
  24 / heads 16 visual, width 768 / 12-layer text (model/LaviLa.py:114-172).
- ``timesformer_base_config()``: ViT-B/16 — width 768 / depth 12 / heads 12
  visual, width 512 text (model/LaviLa.py:55-111).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .clip_text import TextConfig, encode_text, init_text_params
from .spacetime_vit import SpaceTimeConfig, init_spacetime_params, spacetime_forward

__all__ = [
    "LavilaConfig",
    "timesformer_large_config",
    "timesformer_base_config",
    "init_lavila_params",
    "lavila_forward",
    "encode_image",
]


@dataclass(frozen=True)
class LavilaConfig:
    visual: SpaceTimeConfig = field(default_factory=SpaceTimeConfig)
    text: TextConfig = field(default_factory=TextConfig)
    embed_dim: int = 256
    temperature_init: float = 0.07


def timesformer_large_config(num_frames: int = 4, project_embed_dim: int = 256) -> LavilaConfig:
    return LavilaConfig(
        visual=SpaceTimeConfig(
            img_size=224, patch_size=14, width=1024, depth=24, heads=16, num_frames=num_frames
        ),
        text=TextConfig(width=768, heads=12, layers=12, embed_dim=project_embed_dim),
        embed_dim=project_embed_dim,
    )


def timesformer_base_config(num_frames: int = 4, project_embed_dim: int = 256) -> LavilaConfig:
    return LavilaConfig(
        visual=SpaceTimeConfig(
            img_size=224, patch_size=16, width=768, depth=12, heads=12, num_frames=num_frames
        ),
        text=TextConfig(width=512, heads=8, layers=12, embed_dim=project_embed_dim),
        embed_dim=project_embed_dim,
    )


def timesformer_tiny_config(num_frames: int = 4, project_embed_dim: int = 64) -> LavilaConfig:
    """Miniature config for smoke tests / demos (no released weights)."""
    return LavilaConfig(
        visual=SpaceTimeConfig(
            img_size=224, patch_size=32, width=128, depth=2, heads=4, num_frames=num_frames
        ),
        text=TextConfig(width=64, heads=4, layers=2, embed_dim=project_embed_dim),
        embed_dim=project_embed_dim,
    )


def init_lavila_params(key, cfg: LavilaConfig):
    kv, kt, ki, kp = jax.random.split(key, 4)
    return {
        "visual": init_spacetime_params(kv, cfg.visual),
        "text": init_text_params(kt, cfg.text),
        "image_projection": jax.random.normal(ki, (cfg.visual.width, cfg.embed_dim))
        * cfg.visual.width**-0.5,
        "logit_scale": jnp.asarray(np.log(1.0 / cfg.temperature_init), jnp.float32),
    }


def encode_image(params, cfg: LavilaConfig, video, *, use_remat=True, dtype=jnp.bfloat16):
    """video (B, T, H, W, C) -> (projected CLS (B, E), token map (B, 1+T*N, D))."""
    x_cls, x = spacetime_forward(
        params["visual"], cfg.visual, video, use_remat=use_remat, dtype=dtype
    )
    return x_cls @ params["image_projection"], x


def lavila_forward(
    params,
    cfg: LavilaConfig,
    video,
    tokens,
    *,
    norm_embed: bool = True,
    use_remat: bool = True,
    dtype=jnp.bfloat16,
):
    """Dual-encoder forward, mirroring CLIP.forward(..., return_feature_map=True)
    (model/LaviLa.py:672-687). Returns a dict with image/text embeds (L2
    normalised if ``norm_embed``), both pre-projection feature maps, and
    exp(logit_scale)."""
    image_embed, image_fmap = encode_image(
        params, cfg, video, use_remat=use_remat, dtype=dtype
    )
    text_embed, text_fmap = encode_text(params["text"], cfg.text, tokens, dtype=jnp.float32)
    if norm_embed:
        image_embed = image_embed / jnp.linalg.norm(image_embed, axis=-1, keepdims=True)
        text_embed = text_embed / jnp.linalg.norm(text_embed, axis=-1, keepdims=True)
    return {
        "image_embed": image_embed,
        "text_embed": text_embed,
        "image_feature_map": image_fmap,
        "text_feature_map": text_fmap,
        "logit_scale": jnp.exp(params["logit_scale"]),
    }
