"""Fused device-side video preprocessing.

The reference preprocesses on the host CPU with torchvision (per-worker
Python, data_loader/transforms.py): uint8 decode -> float/255 -> Resize ->
(CenterCrop) -> per-channel Normalize. On TPU the decode stage ships raw
uint8 frames and everything after runs as one fused XLA op inside the
step, saving 4x host->device bandwidth (uint8 vs f32) and all host CPU.

Pipelines (matching data_loader/transforms.py:38-75):
- ``resize_normalize``: Resize((res, res)) + Normalize — the
  ``resize_wo_crop`` val pipeline, which is ALSO the training pipeline
  (force_centercrop=True swaps train->val, transforms.py:73-74,
  run/train.py:443).
- ``shortside_centercrop_normalize``: Resize(short) -> CenterCrop(short)
  -> Resize(res) -> Normalize — the resize_wo_crop=False variant and the
  EGTEA eval path.

Channel stats default to LaviLa's (run/train.py:444-445).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "LAVILA_MEAN",
    "LAVILA_STD",
    "resize_normalize",
    "shortside_centercrop_normalize",
    "shortside_dims",
    "spatial_crops",
    "center_plus_four_crops",
    "center_plus_twohori_crops",
]

LAVILA_MEAN = (108.3272985 / 255, 116.7460125 / 255, 104.09373615 / 255)
LAVILA_STD = (68.5005327 / 255, 66.6321579 / 255, 70.32316305 / 255)


def shortside_dims(h: int, w: int, short: int) -> tuple[int, int]:
    """Target (nh, nw) for a shorter-side resize to ``short`` (torchvision
    Resize(int) geometry: round the long side, floor at ``short``)."""
    if h <= w:
        return short, max(int(round(w * short / h)), short)
    return max(int(round(h * short / w)), short), short


def _norm(x, mean, std):
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def resize_normalize(
    video_u8,
    res: int = 224,
    mean=LAVILA_MEAN,
    std=LAVILA_STD,
    dtype=jnp.float32,
):
    """(..., H, W, C) uint8 -> (..., res, res, C) normalised float.

    Square (aspect-squashing) bilinear resize, then /255 and per-channel
    normalisation — torchvision Resize((res, res)) semantics. antialias
    MUST be off: the reference resizes video *tensors*, where torch
    interpolates without antialiasing — jax.image.resize's default
    antialiased downscale differs by up to 0.45 per value (torch-oracle
    test in tests/test_preprocess.py).
    """
    x = video_u8.astype(dtype) / 255.0
    shape = video_u8.shape[:-3] + (res, res, video_u8.shape[-1])
    if video_u8.shape[-3:-1] != (res, res):
        x = jax.image.resize(x, shape, method="bilinear", antialias=False)
    return _norm(x, mean, std)


def shortside_centercrop_normalize(
    video_u8,
    short: int = 256,
    res: int = 224,
    mean=LAVILA_MEAN,
    std=LAVILA_STD,
    dtype=jnp.float32,
):
    """Resize(shorter side=short) -> CenterCrop(short) -> Resize(res) ->
    Normalize (antialias off == torch tensor interpolation, see
    resize_normalize). Static shapes: the input H/W are compile-time
    constants."""
    *lead, h, w, c = video_u8.shape
    x = video_u8.astype(dtype) / 255.0
    nh, nw = shortside_dims(h, w, short)
    x = jax.image.resize(x, (*lead, nh, nw, c), method="bilinear", antialias=False)
    top, left = (nh - short) // 2, (nw - short) // 2
    x = x[..., top : top + short, left : left + short, :]
    if short != res:
        x = jax.image.resize(x, (*lead, res, res, c), method="bilinear", antialias=False)
    return _norm(x, mean, std)


def spatial_crops(
    video_u8,
    crop: int = 224,
    num_crops: int = 1,
    short: int = 224,
    mean=LAVILA_MEAN,
    std=LAVILA_STD,
    dtype=jnp.float32,
):
    """LaviLa-style SpatialCrop: shorter-side resize then 1 (center), 3
    (left/center/right along the longer axis), or 6 (the 3 crops plus the
    same 3 of the horizontally flipped clip) crops.

    Matches data_loader/lavila_transforms.py:121-186 (used by the EGTEA
    harness; the paper protocol uses num_crops=1). Returns
    (num_crops, ..., crop, crop, C) normalised float.
    """
    *lead, h, w, c = video_u8.shape
    x = video_u8.astype(dtype) / 255.0
    nh, nw = shortside_dims(h, w, short)
    x = jax.image.resize(x, (*lead, nh, nw, c), method="bilinear", antialias=False)

    def crop_at(src, top, left):
        return src[..., top : top + crop, left : left + crop, :]

    if num_crops == 1:
        offs = [((nh - crop) // 2, (nw - crop) // 2)]
    elif num_crops in (3, 6):
        if nw >= nh:  # wide: left / center / right
            offs = [((nh - crop) // 2, 0), ((nh - crop) // 2, (nw - crop) // 2), ((nh - crop) // 2, nw - crop)]
        else:  # tall: top / center / bottom
            offs = [(0, (nw - crop) // 2), ((nh - crop) // 2, (nw - crop) // 2), (nh - crop, (nw - crop) // 2)]
    else:
        raise ValueError("num_crops must be 1, 3 or 6")

    crops = [crop_at(x, t, l) for t, l in offs]
    if num_crops == 6:  # + the same crops of the h-flipped clip (LT:179-185)
        xf = jnp.flip(x, axis=-2)
        crops += [crop_at(xf, t, l) for t, l in offs]
    crops = jnp.stack(crops)
    return _norm(crops, mean, std)


def _center_crop(x, ch: int, cw: int):
    *_, h, w, _ = x.shape
    top, left = (h - ch) // 2, (w - cw) // 2
    return x[..., top : top + ch, left : left + cw, :]


def center_plus_four_crops(img, size, margin_h: int, margin_w: int):
    """Four tiled border crops + the center crop (utils/custom_transforms.py:
    18-83): (tl, tr, bl, br, center) of a channel-last (..., H, W, C) image.

    The borders tile the frame of ``margin`` thickness around the central
    (h, w) crop exactly as the reference lays them out (tl/br horizontal
    strips spanning margin+crop, tr/bl vertical strips)."""
    ch, cw = (size, size) if isinstance(size, int) else tuple(size)
    *_, h, w, _ = img.shape
    if cw > w or ch > h:
        raise ValueError(f"crop {size} larger than image {(h, w)}")
    if cw + margin_w > w or ch + margin_h > h:
        raise ValueError(f"margin {(margin_h, margin_w)} + crop {size} exceeds image {(h, w)}")
    x11 = (w - cw - 2 * margin_w) // 2
    x12 = x11 + margin_w
    x21 = x12 + cw
    y11 = (h - ch - 2 * margin_h) // 2
    y12 = y11 + margin_h
    y21 = y12 + ch

    def crop(top, left, hh, ww):
        return img[..., top : top + hh, left : left + ww, :]

    tl = crop(y11, x11, margin_h, margin_w + cw)
    tr = crop(y11, x21, margin_h + ch, margin_w)
    bl = crop(y12, x11, margin_h + ch, margin_w)
    br = crop(y21, x12, margin_h, margin_w + cw)
    return tl, tr, bl, br, _center_crop(img, ch, cw)


def center_plus_twohori_crops(img, size, margin_w: int):
    """Left/right border crops + center crop (utils/custom_transforms.py:
    68-106): (left, right, center) of a channel-last image."""
    ch, cw = (size, size) if isinstance(size, int) else tuple(size)
    *_, h, w, _ = img.shape
    if cw > w or ch > h:
        raise ValueError(f"crop {size} larger than image {(h, w)}")
    if cw + margin_w > w:
        raise ValueError(f"margin {margin_w} + crop {size} exceeds image width {w}")
    x11 = (w - cw - 2 * margin_w) // 2
    x21 = x11 + margin_w + cw
    y11 = (h - ch) // 2
    left = img[..., y11 : y11 + ch, x11 : x11 + margin_w, :]
    right = img[..., y11 : y11 + ch, x21 : x21 + margin_w, :]
    return left, right, _center_crop(img, ch, cw)
