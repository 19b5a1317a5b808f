"""Train-time random-augmentation tests (VERDICT r3 item 3).

Pins ops/preprocess.random_resized_crop_flip_jitter to the semantics of
the reference train pipeline (data_loader/transforms.py:64-69:
RandomResizedCropVideo(res, scale=(0.5, 1.0)) + RandomHorizontalFlipVideo
+ ColorJitter(brightness, saturation, hue) + Normalize): distribution
properties of the sampled parameters, torchvision oracles for the
deterministic image ops, fixed-key determinism, box-target alignment, and
the train step running with augmentation on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helping_hand_for_egocentric_videos_tpu.ops.preprocess import (
    LAVILA_MEAN,
    LAVILA_STD,
    _adjust_brightness,
    _adjust_hue,
    _adjust_saturation,
    _crop_resize_clip,
    _sample_resized_crop,
    random_resized_crop_flip_jitter,
    transform_boxes,
)


def _sample_many(n, h, w, scale=(0.5, 1.0), ratio=(3 / 4, 4 / 3)):
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    f = jax.jit(
        jax.vmap(lambda k: _sample_resized_crop(k, h, w, scale, ratio))
    )
    return [np.asarray(v) for v in f(keys)]


def test_crop_params_scale_aspect_and_position_bounds():
    h, w = 100, 160
    tops, lefts, chs, cws = _sample_many(512, h, w)
    assert (chs >= 1).all() and (chs <= h).all()
    assert (cws >= 1).all() and (cws <= w).all()
    assert (tops >= 0).all() and (tops + chs <= h).all()
    assert (lefts >= 0).all() and (lefts + cws <= w).all()
    frac = chs.astype(np.float64) * cws / (h * w)
    # rounding of sqrt(area) perturbs the exact area by <~ (ch+cw)/area
    assert frac.min() > 0.5 - 0.03 and frac.max() < 1.0 + 0.03
    aspect = cws.astype(np.float64) / chs
    assert aspect.min() > 3 / 4 - 0.05 and aspect.max() < 4 / 3 + 0.05
    # positions actually vary (not stuck at a corner/center)
    assert len(np.unique(tops)) > 10 and len(np.unique(lefts)) > 10
    # area fractions cover the range, not a point mass
    assert frac.std() > 0.05


def test_crop_fallback_extreme_aspect_frame():
    # w/h = 8 >> 4/3: every sampled rectangle is invalid -> the clamped
    # center-crop fallback (w = h * 4/3)
    tops, lefts, chs, cws = _sample_many(16, 16, 128)
    assert (chs == 16).all()
    assert (cws == int(round(16 * 4 / 3))).all()
    assert (tops == 0).all()
    assert (lefts == (128 - int(round(16 * 4 / 3))) // 2).all()


def test_crop_resize_matches_torch_crop_then_interpolate(rng):
    """Oracle: the exact torchvision resized_crop pipeline — slice the
    rectangle, then bilinear-interpolate (align_corners=False, no
    antialias), as torchvision videos are processed (tensors, so torch
    interpolate IS the torchvision implementation)."""
    torch = pytest.importorskip("torch")

    img = rng.random((1, 37, 53, 3)).astype(np.float32)
    for top, left, ch, cw in [(3, 5, 20, 31), (0, 0, 37, 53), (10, 20, 8, 8)]:
        ours = np.asarray(
            _crop_resize_clip(
                jnp.asarray(img),
                jnp.int32(top),
                jnp.int32(left),
                jnp.int32(ch),
                jnp.int32(cw),
                24,
            )
        )
        t = torch.from_numpy(img[0]).permute(2, 0, 1)[None]
        cropped = t[..., top : top + ch, left : left + cw]
        want = torch.nn.functional.interpolate(
            cropped, size=(24, 24), mode="bilinear", align_corners=False
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours[0], want, atol=2e-5)


def test_flip_rate_and_whole_clip_flip(rng):
    v = (rng.random((64, 2, 16, 16, 3)) * 255).astype(np.uint8)
    out, params = random_resized_crop_flip_jitter(
        jax.random.PRNGKey(3), jnp.asarray(v), res=16
    )
    flips = np.asarray(params["flip"])
    assert 0.3 < flips.mean() < 0.7  # Bernoulli(0.5) over 64 clips
    assert np.asarray(out).shape == (64, 2, 16, 16, 3)


def test_jitter_oracles(rng):
    """Brightness/saturation against the torchvision formulas (clamped
    blend with zeros / Rec.601 grayscale); hue against stdlib colorsys
    (an independent HSV round-trip implementation)."""
    import colorsys

    img = rng.random((5, 7, 3)).astype(np.float32)
    for f in (0.6, 1.0, 1.4):
        np.testing.assert_allclose(
            np.asarray(_adjust_brightness(jnp.asarray(img), f)),
            np.clip(img * f, 0.0, 1.0),
            atol=1e-6,
        )
        gray = (img * np.array([0.2989, 0.587, 0.114], np.float32)).sum(
            -1, keepdims=True
        )
        np.testing.assert_allclose(
            np.asarray(_adjust_saturation(jnp.asarray(img), f)),
            np.clip(gray + f * (img - gray), 0.0, 1.0),
            atol=1e-5,
        )
    for f in (-0.4, -0.1, 0.0, 0.25, 0.5):
        want = np.empty_like(img)
        for i in range(img.shape[0]):
            for j in range(img.shape[1]):
                h, s, v = colorsys.rgb_to_hsv(*img[i, j])
                want[i, j] = colorsys.hsv_to_rgb((h + f) % 1.0, s, v)
        np.testing.assert_allclose(
            np.asarray(_adjust_hue(jnp.asarray(img), f)), want, atol=1e-4
        )


def test_jitter_factor_ranges_exercised(rng):
    v = (rng.random((32, 1, 12, 12, 3)) * 255).astype(np.uint8)
    out, _ = random_resized_crop_flip_jitter(
        jax.random.PRNGKey(5),
        jnp.asarray(v),
        res=12,
        brightness=0.4,
        saturation=0.4,
        hue=0.2,
    )
    base, _ = random_resized_crop_flip_jitter(
        jax.random.PRNGKey(5), jnp.asarray(v), res=12
    )
    # same key -> identical crops/flips, so any difference is the jitter
    d = np.abs(np.asarray(out) - np.asarray(base))
    per_clip = d.reshape(32, -1).max(axis=1)
    assert (per_clip > 1e-3).mean() > 0.9  # nearly every clip jittered
    assert np.isfinite(np.asarray(out)).all()


def test_fixed_key_determinism(rng):
    v = (rng.random((4, 2, 20, 28, 3)) * 255).astype(np.uint8)
    kwargs = dict(res=16, brightness=0.3, saturation=0.3, hue=0.1)
    a, pa = random_resized_crop_flip_jitter(jax.random.PRNGKey(7), jnp.asarray(v), **kwargs)
    b, pb = random_resized_crop_flip_jitter(jax.random.PRNGKey(7), jnp.asarray(v), **kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in ("top", "left", "crop_h", "crop_w", "flip"):
        np.testing.assert_array_equal(np.asarray(pa[k]), np.asarray(pb[k]))
    c, _ = random_resized_crop_flip_jitter(jax.random.PRNGKey(8), jnp.asarray(v), **kwargs)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3


def test_identity_crop_matches_resize_normalize(rng):
    """Full-frame crop + no flip must reduce to the plain squash-resize
    pipeline (ties the aug path to the oracle-tested resize)."""
    from helping_hand_for_egocentric_videos_tpu.ops.preprocess import resize_normalize

    v = (rng.random((1, 2, 20, 24, 3)) * 255).astype(np.uint8)
    x = jnp.asarray(v).astype(jnp.float32) / 255.0
    cropped = _crop_resize_clip(
        x[0], jnp.int32(0), jnp.int32(0), jnp.int32(20), jnp.int32(24), 16
    )
    normed = (cropped - jnp.asarray(LAVILA_MEAN)) / jnp.asarray(LAVILA_STD)
    want = np.asarray(resize_normalize(jnp.asarray(v), res=16))[0]
    np.testing.assert_allclose(np.asarray(normed), want, atol=1e-5)


def test_transform_boxes_geometry():
    params = {
        "top": jnp.asarray([10], jnp.int32),
        "left": jnp.asarray([20], jnp.int32),
        "crop_h": jnp.asarray([50], jnp.int32),
        "crop_w": jnp.asarray([100], jnp.int32),
        "flip": jnp.asarray([False]),
        "src_h": 100,
        "src_w": 200,
    }
    # coords_res=res=100: box (20, 20, 60, 40) in squash coords; x: raw
    # (40, 120) -> crop-local (20, 100) -> *res/crop_w=1 -> (20, 100);
    # y: raw (20, 40) -> local (10, 30) -> *res/crop_h=2 -> (20, 60)
    boxes = jnp.asarray([[[20.0, 20.0, 60.0, 40.0]]])
    out = np.asarray(transform_boxes(boxes, params, res=100, coords_res=100))
    np.testing.assert_allclose(out[0, 0], [20.0, 20.0, 100.0, 60.0], atol=1e-4)
    # flipped: x -> res - x, swapped
    params_f = dict(params, flip=jnp.asarray([True]))
    out_f = np.asarray(transform_boxes(boxes, params_f, res=100, coords_res=100))
    np.testing.assert_allclose(out_f[0, 0], [0.0, 20.0, 80.0, 60.0], atol=1e-4)
    # a box entirely outside the crop is zeroed (absent)
    outside = jnp.asarray([[[0.0, 0.0, 5.0, 5.0]]])
    out_o = np.asarray(transform_boxes(outside, params, res=100, coords_res=100))
    np.testing.assert_array_equal(out_o[0, 0], [0.0, 0.0, 0.0, 0.0])
    # zero (absent) boxes stay zero
    zeros = jnp.zeros((1, 1, 4))
    np.testing.assert_array_equal(
        np.asarray(transform_boxes(zeros, params, res=100, coords_res=100)),
        np.zeros((1, 1, 4)),
    )


def test_transform_boxes_identity_when_no_crop():
    params = {
        "top": jnp.asarray([0], jnp.int32),
        "left": jnp.asarray([0], jnp.int32),
        "crop_h": jnp.asarray([64], jnp.int32),
        "crop_w": jnp.asarray([64], jnp.int32),
        "flip": jnp.asarray([False]),
        "src_h": 64,
        "src_w": 64,
    }
    boxes = jnp.asarray([[[4.0, 8.0, 30.0, 60.0], [0.0, 0.0, 0.0, 0.0]]])
    out = np.asarray(transform_boxes(boxes, params, res=64, coords_res=64))
    np.testing.assert_allclose(out, np.asarray(boxes), atol=1e-5)


def test_train_step_runs_with_augment(rng):
    """The full jitted train step with augment=True: finite loss, and the
    RNG split changes nothing when augment is off (stream preserved)."""
    from helping_hand_for_egocentric_videos_tpu.models import (
        DecoderConfig,
        init_decoder_params,
        init_lavila_params,
    )
    from helping_hand_for_egocentric_videos_tpu.models.clip_text import TextConfig
    from helping_hand_for_egocentric_videos_tpu.models.lavila import LavilaConfig
    from helping_hand_for_egocentric_videos_tpu.models.spacetime_vit import (
        SpaceTimeConfig,
    )
    from helping_hand_for_egocentric_videos_tpu.train import (
        TrainConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    t, img, patch = 2, 28, 14
    lavila_cfg = LavilaConfig(
        visual=SpaceTimeConfig(
            img_size=img, patch_size=patch, width=32, depth=1, heads=4, num_frames=t
        ),
        text=TextConfig(
            vocab_size=64, context_length=12, width=32, heads=4, layers=1, embed_dim=16
        ),
        embed_dim=16,
    )
    dec_cfg = DecoderConfig(
        d_model=32,
        nhead=4,
        num_layers=1,
        dim_feedforward=64,
        num_queries=13,
        num_classes=8,
        feature_dim=32,
        text_width=32,
        embed_dim=16,
        num_frames=t,
        patches_per_frame=lavila_cfg.visual.patches_per_frame,
    )
    tcfg = TrainConfig(
        num_queries=12,
        backbone_dtype=jnp.float32,
        input_res=img,
        augment=True,
        color_jitter=(0.2, 0.2, 0.1),
    )
    key = jax.random.PRNGKey(0)
    backbone = init_lavila_params(key, lavila_cfg)
    decoder = init_decoder_params(key, dec_cfg)
    optimizer = make_optimizer(tcfg)
    state = TrainState(decoder, optimizer.init(decoder), jnp.zeros((), jnp.int32))

    n, r = 2, 5
    tokens = np.zeros((n * r, 12), np.int32)
    tokens[:, 0] = 62
    tokens[:, 1:3] = rng.integers(1, 60, size=(n * r, 2))
    tokens[:, 3] = 63
    batch = {
        # raw uint8 at a LARGER decode size than input_res — the aug path
        # crops from it on-device
        "video": jnp.asarray(
            (rng.random((n, t, 40, 56, 3)) * 255).astype(np.uint8)
        ),
        "tokens": jnp.asarray(tokens),
        "noun_vec": jnp.asarray((rng.random((n, 20)) < 0.2).astype(np.float32)),
        "verb_vec": jnp.asarray((rng.random((n, 10)) < 0.2).astype(np.float32)),
        "boxes": jnp.asarray(
            (rng.random((n, t, 4, 4)) * 10 + np.array([0, 0, 14, 14])).astype(
                np.float32
            )
        ),
        "nouns": jnp.asarray(rng.integers(0, 20, size=(n, 4)).astype(np.int32)),
    }
    noun_dict = jnp.asarray(rng.normal(size=(20, 32)).astype(np.float32))

    step = jax.jit(make_train_step(dec_cfg, lavila_cfg, tcfg, optimizer))
    state, metrics = step(state, backbone, batch, noun_dict, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # two different step keys -> different augmented views -> (almost
    # surely) different losses
    _, metrics2 = step(state, backbone, batch, noun_dict, jax.random.PRNGKey(2))
    assert float(metrics["total_loss"]) != float(metrics2["total_loss"])


def test_config_tuple_override_and_roundtrip(tmp_path):
    from helping_hand_for_egocentric_videos_tpu.core.config import (
        ExperimentConfig,
        apply_overrides,
    )

    cfg = ExperimentConfig()
    apply_overrides(
        cfg,
        ["data.augment=true", "data.randcrop_scale=0.4,0.9", "data.color_jitter=(0.2,0.1,0.05)"],
    )
    assert cfg.data.augment is True
    assert cfg.data.randcrop_scale == (0.4, 0.9)
    assert cfg.data.color_jitter == (0.2, 0.1, 0.05)
    p = tmp_path / "c.json"
    p.write_text(cfg.to_json())
    cfg2 = ExperimentConfig.from_json(str(p))
    assert tuple(cfg2.data.randcrop_scale) == (0.4, 0.9)
    assert cfg2.data.augment is True


def test_train_step_augment_rng_none(rng):
    """rng=None callers get a per-step derived key (fold_in on
    state.step): the augment path runs and stays deterministic."""
    import sys as _sys
    from dataclasses import replace
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parent))
    from test_train_step import tiny_setup

    from helping_hand_for_egocentric_videos_tpu.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    lavila_cfg, dec_cfg, tcfg, backbone, decoder, batch, noun_dict = tiny_setup()
    tcfg = replace(tcfg, augment=True, input_res=28)
    batch = dict(batch)
    batch["video"] = jnp.asarray(
        (rng.random((4, 2, 40, 56, 3)) * 255).astype(np.uint8)
    )
    opt = make_optimizer(tcfg)
    state0 = TrainState(decoder, opt.init(decoder), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(dec_cfg, lavila_cfg, tcfg, opt))
    _, m1 = step(state0, backbone, batch, noun_dict, None)
    _, m1b = step(state0, backbone, batch, noun_dict, None)
    assert np.isfinite(float(m1["total_loss"]))
    # same state.step -> same derived key -> identical loss
    assert float(m1["total_loss"]) == float(m1b["total_loss"])


def test_train_step_augment_rejects_float_video(rng):
    """augment=True with preprocessed float video is a config error, not
    a silent no-op."""
    import sys as _sys
    from dataclasses import replace
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parent))
    from test_train_step import tiny_setup

    from helping_hand_for_egocentric_videos_tpu.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    lavila_cfg, dec_cfg, tcfg, backbone, decoder, batch, noun_dict = tiny_setup()
    tcfg = replace(tcfg, augment=True, input_res=28)
    opt = make_optimizer(tcfg)
    state = TrainState(decoder, opt.init(decoder), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(dec_cfg, lavila_cfg, tcfg, opt))
    with pytest.raises(ValueError, match="uint8"):
        step(state, backbone, batch, noun_dict, jax.random.PRNGKey(0))


def test_crop_sampler_golden_values():
    """Golden pins for the crop sampler under PRNGKey(42) on a 256x256
    frame (JAX's threefry PRNG is stable across versions): catches any
    silent semantic drift in the sampling algorithm — candidate order,
    rounding, or position quantisation."""
    f = jax.jit(
        jax.vmap(
            lambda k: _sample_resized_crop(k, 256, 256, (0.5, 1.0), (3 / 4, 4 / 3))
        )
    )
    tops, lefts, chs, cws = f(jax.random.split(jax.random.PRNGKey(42), 4))
    np.testing.assert_array_equal(np.asarray(tops), [19, 24, 2, 7])
    np.testing.assert_array_equal(np.asarray(lefts), [18, 21, 64, 23])
    np.testing.assert_array_equal(np.asarray(chs), [206, 222, 224, 195])
    np.testing.assert_array_equal(np.asarray(cws), [196, 181, 192, 228])
    # goldens respect the sampler's own contract
    frac = np.asarray(chs, np.float64) * np.asarray(cws) / (256 * 256)
    assert (frac > 0.45).all() and (frac < 1.05).all()


def test_jitter_hue_only_shape_and_match(rng):
    """hue-only single-op fast path: regression for the broadcast bug
    where a (B,1,1,1,1) factor fed _adjust_hue's channel-stripped
    intermediates and produced a (B, B, T, H, W, C) output."""
    v = (rng.random((3, 2, 12, 12, 3)) * 255).astype(np.uint8)
    out, _ = random_resized_crop_flip_jitter(
        jax.random.PRNGKey(7), jnp.asarray(v), res=12, hue=0.1
    )
    assert out.shape == (3, 2, 12, 12, 3)
    # and it matches per-clip _adjust_hue with the same factor draws
    base, _ = random_resized_crop_flip_jitter(
        jax.random.PRNGKey(7), jnp.asarray(v), res=12
    )
    _, _, k_fac, _ = jax.random.split(jax.random.PRNGKey(7), 4)
    _, _, kh = jax.random.split(k_fac, 3)
    hf = jax.random.uniform(kh, (3,), minval=-0.1, maxval=0.1)
    mean, std = np.asarray(LAVILA_MEAN), np.asarray(LAVILA_STD)
    plain = jnp.asarray(np.asarray(base, np.float32) * std + mean)
    want = jax.vmap(_adjust_hue)(plain.astype(jnp.float32), hf.astype(jnp.float32))
    want = (np.asarray(want) - mean) / std
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_jitter_single_op_fast_path(rng):
    """brightness-only (the only jitter usable upstream, see module
    comment) takes the no-permutation fast path and matches the direct
    formula with the same per-clip factors."""
    v = (rng.random((6, 1, 12, 12, 3)) * 255).astype(np.uint8)
    out, _ = random_resized_crop_flip_jitter(
        jax.random.PRNGKey(11), jnp.asarray(v), res=12, brightness=0.4
    )
    base, params = random_resized_crop_flip_jitter(
        jax.random.PRNGKey(11), jnp.asarray(v), res=12
    )
    # reconstruct: un-normalise base, scale by the same factor draw, re-norm
    k_crop, k_flip, k_fac, k_ord = jax.random.split(jax.random.PRNGKey(11), 4)
    kb, _, _ = jax.random.split(k_fac, 3)
    bf = np.asarray(jax.random.uniform(kb, (6,), minval=0.6, maxval=1.4))
    mean, std = np.asarray(LAVILA_MEAN), np.asarray(LAVILA_STD)
    plain = np.asarray(base) * std + mean
    want = (np.clip(plain * bf[:, None, None, None, None], 0, 1) - mean) / std
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
