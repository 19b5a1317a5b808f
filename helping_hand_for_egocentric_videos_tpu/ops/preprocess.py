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
    "random_resized_crop_flip_jitter",
    "transform_boxes",
]

LAVILA_MEAN = (108.3272985 / 255, 116.7460125 / 255, 104.09373615 / 255)
LAVILA_STD = (68.5005327 / 255, 66.6321579 / 255, 70.32316305 / 255)


def shortside_dims(h: int, w: int, short: int) -> tuple[int, int]:
    """Target (nh, nw) for a shorter-side resize to ``short`` (torchvision
    Resize(int) geometry: the long side TRUNCATES —
    ``int(size * long / short)`` in _compute_resized_output_size — so a
    fractional part >= 0.5 must not round up or the center-crop window
    shifts by a pixel vs the reference eval transforms)."""
    if h <= w:
        return short, max(int(w * short / h), short)
    return max(int(h * short / w), short), short


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


# --------------------------------------------------------------------------
# Train-time random augmentation (the reference's force_centercrop=False
# pipeline, data_loader/transforms.py:64-69: RandomResizedCropVideo(res,
# scale) -> RandomHorizontalFlipVideo() -> ColorJitter(brightness,
# saturation, hue) -> NormalizeVideo). The shipped pretraining command
# neutralises it (force_centercrop=True, run/train.py:443), so the main
# path stays resize_normalize; this provides the capability for
# from-scratch pretraining with augmentation on.
#
# TPU-first design: everything runs on-device inside the jitted train step,
# RNG-keyed (one jax.random key per step), with static output shapes — the
# dynamic crop rectangle becomes a per-clip gather-based bilinear resize,
# not a dynamic slice. One set of crop/flip/jitter parameters is drawn per
# CLIP and applied to all its frames (torchvision _transforms_video
# semantics).
#
# Two reference quirks, handled rather than replicated:
# - Upstream, ColorJitter runs on (T, C, H, W) video tensors whose dim -3
#   is TIME, so saturation/hue would crash for T != 3 frames (torchvision
#   functional ops assert 3 channels at dim -3); only the layout-agnostic
#   brightness multiply ever works, and the shipped config zeroes all
#   three (color_jitter=(0, 0, 0)). We implement the *intended* per-clip
#   channel-wise semantics.
# - Upstream, enabling the random crop silently breaks box supervision:
#   crop_boxes only undoes custom_img_crop (utils/box_ops.py:116-139) and
#   the torchvision crop happens after boxes are finalised. We return the
#   sampled crop/flip parameters so ``transform_boxes`` keeps the targets
#   aligned with the pixels.
# --------------------------------------------------------------------------


def _sample_resized_crop(key, h: int, w: int, scale, ratio):
    """torchvision RandomResizedCrop.get_params for one clip: 10 sampled
    candidates, first in-bounds one wins, else the aspect-clamped center
    crop. Returns (top, left, crop_h, crop_w) int32 scalars (traced)."""
    k_area, k_ratio, k_pos = jax.random.split(key, 3)
    area = float(h * w)
    ta = jax.random.uniform(k_area, (10,), minval=scale[0], maxval=scale[1]) * area
    log_r = jax.random.uniform(
        k_ratio, (10,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    ar = jnp.exp(log_r)
    cw = jnp.round(jnp.sqrt(ta * ar)).astype(jnp.int32)
    chh = jnp.round(jnp.sqrt(ta / ar)).astype(jnp.int32)
    valid = (cw > 0) & (cw <= w) & (chh > 0) & (chh <= h)
    idx = jnp.argmax(valid)  # first True
    # fallback: clamp the whole frame's aspect into [ratio0, ratio1]
    in_ratio = w / h
    if in_ratio < ratio[0]:
        fw, fh = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        fh, fw = h, int(round(h * ratio[1]))
    else:
        fw, fh = w, h
    any_valid = jnp.any(valid)
    cw = jnp.where(any_valid, cw[idx], fw)
    chh = jnp.where(any_valid, chh[idx], fh)
    k_i, k_j = jax.random.split(k_pos)
    # randint(0, H - ch + 1) with traced bounds, via uniform * range
    top = jnp.floor(jax.random.uniform(k_i, ()) * (h - chh + 1)).astype(jnp.int32)
    left = jnp.floor(jax.random.uniform(k_j, ()) * (w - cw + 1)).astype(jnp.int32)
    top = jnp.where(any_valid, top, (h - chh) // 2)
    left = jnp.where(any_valid, left, (w - cw) // 2)
    return top, left, chh, cw


def _crop_resize_clip(x, top, left, ch, cw, res: int):
    """Bilinear crop-then-resize of one clip (T, H, W, C) float to
    (T, res, res, C), with traced crop rectangle and a static output shape.

    Matches torch crop->interpolate(bilinear, align_corners=False, no
    antialias): source coords are clamped to the CROP edges (replicate),
    never sampling pixels outside the rectangle — a plain
    scale_and_translate over the full frame would bleed across the crop
    border."""
    h, w = x.shape[1], x.shape[2]

    def axis_coords(n_src, off, size):
        c = (jnp.arange(res, dtype=jnp.float32) + 0.5) * (size / res) - 0.5
        c = jnp.clip(c, 0.0, size.astype(jnp.float32) - 1.0) + off
        c0 = jnp.floor(c).astype(jnp.int32)
        f = c - c0
        c1 = jnp.minimum(c0 + 1, off + size - 1)
        c0 = jnp.clip(c0, 0, n_src - 1)
        c1 = jnp.clip(c1, 0, n_src - 1)
        return c0, c1, f

    y0, y1, fy = axis_coords(h, top, ch)
    rows = jnp.take(x, y0, axis=1) * (1.0 - fy)[:, None, None] + jnp.take(
        x, y1, axis=1
    ) * fy[:, None, None]
    x0, x1, fx = axis_coords(w, left, cw)
    out = jnp.take(rows, x0, axis=2) * (1.0 - fx)[:, None] + jnp.take(
        rows, x1, axis=2
    ) * fx[:, None]
    return out


def _adjust_brightness(x, f):
    return jnp.clip(x * f, 0.0, 1.0)


def _adjust_saturation(x, f):
    # torchvision _blend(img, grayscale(img), f), Rec.601 luma weights
    lum = jnp.asarray((0.2989, 0.587, 0.114), x.dtype)
    gray = jnp.sum(x * lum, axis=-1, keepdims=True)
    return jnp.clip(gray + f * (x - gray), 0.0, 1.0)


def _adjust_hue(x, f):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    hue = jnp.where(
        mx == r,
        jnp.mod((g - b) / safe, 6.0),
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    hue = jnp.where(d > 0, hue / 6.0, 0.0)
    hue = jnp.mod(hue + f, 1.0)
    sat = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    # hsv -> rgb
    k = hue * 6.0
    i = jnp.floor(k)
    frac = k - i
    p = mx * (1.0 - sat)
    q = mx * (1.0 - sat * frac)
    t = mx * (1.0 - sat * (1.0 - frac))
    i6 = i.astype(jnp.int32) % 6
    r_ = jnp.select([i6 == 0, i6 == 1, i6 == 2, i6 == 3, i6 == 4], [mx, q, p, p, t], mx)
    g_ = jnp.select([i6 == 0, i6 == 1, i6 == 2, i6 == 3, i6 == 4], [t, mx, mx, q, p], p)
    b_ = jnp.select([i6 == 0, i6 == 1, i6 == 2, i6 == 3, i6 == 4], [p, p, t, mx, mx], q)
    return jnp.clip(jnp.stack([r_, g_, b_], axis=-1), 0.0, 1.0)


def random_resized_crop_flip_jitter(
    key,
    video,
    res: int = 224,
    scale=(0.5, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
    flip_prob: float = 0.5,
    brightness: float = 0.0,
    saturation: float = 0.0,
    hue: float = 0.0,
    mean=LAVILA_MEAN,
    std=LAVILA_STD,
    dtype=jnp.float32,
):
    """On-device train augmentation: (B, T, H, W, C) uint8 (or [0,1]
    float) -> ((B, T, res, res, C) normalised float, params dict).

    One crop rectangle / flip decision / jitter factor-set per clip,
    shared by its frames. The params dict (top/left/crop_h/crop_w int32
    (B,), flip bool (B,)) feeds ``transform_boxes``. Deterministic per
    ``key``. Defaults mirror data_loader/transforms.py:40-41
    (randcrop_scale=(0.5, 1.0), color_jitter=(0, 0, 0) — jitter off).
    """
    if video.dtype == jnp.uint8:
        x = video.astype(dtype) / 255.0
    else:
        x = video.astype(dtype)
    b = x.shape[0]
    k_crop, k_flip, k_fac, k_ord = jax.random.split(key, 4)
    h, w = x.shape[2], x.shape[3]

    tops, lefts, chs, cws = jax.vmap(
        lambda k: _sample_resized_crop(k, h, w, scale, ratio)
    )(jax.random.split(k_crop, b))
    x = jax.vmap(lambda clip, t, l, ci, cj: _crop_resize_clip(clip, t, l, ci, cj, res))(
        x, tops, lefts, chs, cws
    )

    flips = jax.random.bernoulli(k_flip, flip_prob, (b,))
    x = jnp.where(flips[:, None, None, None, None], x[..., ::-1, :], x)

    # Only statically-enabled jitter ops are traced (a vmapped lax.switch
    # evaluates every branch, so tracing disabled ops would cost real VPU
    # passes). With one op enabled the permutation machinery drops out
    # entirely; with several, the random order is a permutation of the
    # ENABLED subset — torchvision's randperm-then-skip-disabled gives the
    # same distribution over enabled-op orders.
    kb, ks, kh = jax.random.split(k_fac, 3)  # per-op keys, independent of
    # which ops are enabled, so factor draws are stable across configs
    enabled = []
    if brightness > 0:
        bf = jax.random.uniform(
            kb, (b,), minval=max(0.0, 1.0 - brightness), maxval=1.0 + brightness
        )
        enabled.append((bf.astype(dtype), _adjust_brightness))
    if saturation > 0:
        sf = jax.random.uniform(
            ks, (b,), minval=max(0.0, 1.0 - saturation), maxval=1.0 + saturation
        )
        enabled.append((sf.astype(dtype), _adjust_saturation))
    if hue > 0:
        hf = jax.random.uniform(kh, (b,), minval=-hue, maxval=hue)
        enabled.append((hf.astype(dtype), _adjust_hue))

    if len(enabled) == 1:
        # same per-clip (scalar-factor) contract as the multi-op path:
        # channel-stripping ops like _adjust_hue break under a
        # (B,1,1,1,1) factor (extra batch axis via broadcast)
        fac, fn = enabled[0]
        x = jax.vmap(fn)(x, fac)
    elif enabled:
        n_ops = len(enabled)
        perms = jax.vmap(lambda k: jax.random.permutation(k, n_ops))(
            jax.random.split(k_ord, b)
        )

        def jitter_clip(clip, perm, *facs):
            def apply_op(c, op):
                branches = [
                    (lambda v, i=i: enabled[i][1](v, facs[i])) for i in range(n_ops)
                ]
                return jax.lax.switch(op, branches, c), None

            out, _ = jax.lax.scan(apply_op, clip, perm)
            return out

        x = jax.vmap(jitter_clip)(x, perms, *[f for f, _ in enabled])

    params = {
        "top": tops,
        "left": lefts,
        "crop_h": chs,
        "crop_w": cws,
        "flip": flips,
        "src_h": h,
        "src_w": w,
    }
    return _norm(x, mean, std), params


def transform_boxes(boxes, params, res: int = 224, coords_res: int = 224):
    """Map xyxy boxes given in the coords_res x coords_res squashed FULL
    frame (the dataset contract, data/egoclip.py::_scale_boxes) into the
    augmented frame produced by ``random_resized_crop_flip_jitter``.

    boxes: (B, ..., 4) pixel xyxy; zero rows = absent and stay zero.
    Boxes are clipped to the crop; ones that leave no area are zeroed
    (absent) — the reference has no equivalent because its random-crop
    path silently leaves boxes stale (see module comment).
    """
    b = boxes.shape[0]
    lead = (b,) + (1,) * (boxes.ndim - 2)
    fh = params["crop_h"].astype(boxes.dtype).reshape(lead)
    fw = params["crop_w"].astype(boxes.dtype).reshape(lead)
    top = params["top"].astype(boxes.dtype).reshape(lead)
    left = params["left"].astype(boxes.dtype).reshape(lead)
    flip = params["flip"].reshape(lead)
    sx = params["src_w"] / coords_res
    sy = params["src_h"] / coords_res

    x0, y0, x1, y1 = (boxes[..., i] for i in range(4))
    nx0 = (x0 * sx - left) * (res / fw)
    nx1 = (x1 * sx - left) * (res / fw)
    ny0 = (y0 * sy - top) * (res / fh)
    ny1 = (y1 * sy - top) * (res / fh)
    fx0 = jnp.where(flip, res - nx1, nx0)
    fx1 = jnp.where(flip, res - nx0, nx1)
    out = jnp.stack([fx0, ny0, fx1, ny1], axis=-1)
    out = jnp.clip(out, 0.0, float(res))
    present = jnp.any(boxes != 0, axis=-1, keepdims=True)
    has_area = (
        (out[..., 2:3] - out[..., 0:1] > 1e-3) & (out[..., 3:4] - out[..., 1:2] > 1e-3)
    )
    return jnp.where(present & has_area, out, 0.0)


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
