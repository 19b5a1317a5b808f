"""Device-preprocess + auxiliary-metric tests."""

import numpy as np
import jax.numpy as jnp

from helping_hand_for_egocentric_videos_tpu.ops.preprocess import (
    LAVILA_MEAN,
    LAVILA_STD,
    resize_normalize,
    shortside_centercrop_normalize,
    spatial_crops,
)
from helping_hand_for_egocentric_videos_tpu.metrics import (
    charades_map,
    multi_label_map,
    oscc_accuracy,
)
from helping_hand_for_egocentric_videos_tpu.core.config import ExperimentConfig


def test_resize_normalize_identity_res(rng):
    v = (rng.random((2, 3, 224, 224, 3)) * 255).astype(np.uint8)
    out = np.asarray(resize_normalize(jnp.asarray(v)))
    assert out.shape == v.shape
    want = (v.astype(np.float32) / 255 - np.array(LAVILA_MEAN)) / np.array(LAVILA_STD)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_resize_normalize_squash(rng):
    v = (rng.random((1, 2, 32, 48, 3)) * 255).astype(np.uint8)
    out = np.asarray(resize_normalize(jnp.asarray(v), res=16))
    assert out.shape == (1, 2, 16, 16, 3)
    assert np.isfinite(out).all()


def test_shortside_centercrop(rng):
    v = (rng.random((2, 100, 160, 3)) * 255).astype(np.uint8)
    out = np.asarray(shortside_centercrop_normalize(jnp.asarray(v), short=64, res=56))
    assert out.shape == (2, 56, 56, 3)


def test_spatial_crops(rng):
    v = (rng.random((2, 60, 100, 3)) * 255).astype(np.uint8)
    c1 = np.asarray(spatial_crops(jnp.asarray(v), crop=56, num_crops=1, short=56))
    assert c1.shape == (1, 2, 56, 56, 3)
    c3 = np.asarray(spatial_crops(jnp.asarray(v), crop=56, num_crops=3, short=56))
    assert c3.shape == (3, 2, 56, 56, 3)
    # center crop of the 3-crop equals the single crop
    np.testing.assert_allclose(c3[1], c1[0], atol=1e-6)


def test_charades_map():
    sub = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.3], [0.1, 0.2]])
    gt = np.array([[1, 0], [0, 1], [1, 0], [0, 0]])
    m = charades_map(sub, gt)
    assert 0 <= m <= 1
    # perfect ranking -> AP 1 per class
    perfect = gt.astype(float) + 1e-3
    assert abs(charades_map(perfect, gt) - 1.0) < 1e-6
    _, _, per_class = multi_label_map(perfect, gt)
    np.testing.assert_allclose(per_class, [1.0, 1.0])


def test_oscc_accuracy():
    preds = np.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3]])
    np.testing.assert_allclose(oscc_accuracy(preds, np.array([0, 1, 1])), 100 * 2 / 3)


def test_config_json_roundtrip(tmp_path):
    cfg = ExperimentConfig(name="abc")
    cfg.data.batch_size = 7
    p = tmp_path / "c.json"
    p.write_text(cfg.to_json())
    back = ExperimentConfig.from_json(str(p))
    assert back.name == "abc" and back.data.batch_size == 7


def test_spatial_crops_six_includes_flips(rng):
    """num_crops=6 = the 3 positional crops + the same 3 of the h-flipped
    clip (lavila_transforms.py:148-154,179-185)."""
    import jax.numpy as jnp

    from helping_hand_for_egocentric_videos_tpu.ops.preprocess import spatial_crops

    v = (rng.random((1, 2, 64, 96, 3)) * 255).astype("uint8")
    three = spatial_crops(jnp.asarray(v), crop=32, num_crops=3, short=32)
    six = spatial_crops(jnp.asarray(v), crop=32, num_crops=6, short=32)
    assert six.shape == (6, 1, 2, 32, 32, 3) and three.shape[0] == 3
    np.testing.assert_allclose(np.asarray(six[:3]), np.asarray(three), atol=1e-6)
    # crop 3 (flipped left crop) == mirror of the right crop of the
    # un-flipped clip
    np.testing.assert_allclose(
        np.asarray(six[3]), np.asarray(three[2][..., ::-1, :]), atol=1e-5
    )


def test_border_crops_match_reference_layout(rng):
    """center_plus_four_crops / center_plus_twohori_crops shapes + tiling
    (utils/custom_transforms.py:18-106): borders tile a margin frame
    around the central crop."""
    import jax.numpy as jnp

    from helping_hand_for_egocentric_videos_tpu.ops.preprocess import (
        center_plus_four_crops,
        center_plus_twohori_crops,
    )

    img = jnp.asarray((rng.random((64, 80, 3)) * 255).astype("uint8"))
    tl, tr, bl, br, center = center_plus_four_crops(img, (32, 40), 8, 12)
    assert tl.shape == (8, 52, 3)  # margin_h x (margin_w + crop_w)
    assert tr.shape == (40, 12, 3)  # (margin_h + crop_h) x margin_w
    assert bl.shape == (40, 12, 3)
    assert br.shape == (8, 52, 3)
    assert center.shape == (32, 40, 3)
    np.testing.assert_array_equal(np.asarray(center), np.asarray(img[16:48, 20:60]))

    left, right, c2 = center_plus_twohori_crops(img, (48, 40), 12)
    assert left.shape == (48, 12, 3) and right.shape == (48, 12, 3)
    assert c2.shape == (48, 40, 3)
    # left border abuts the central crop's left edge
    x11 = (80 - 40 - 24) // 2
    np.testing.assert_array_equal(np.asarray(left), np.asarray(img[8:56, x11 : x11 + 12]))


def test_resize_matches_torch_tensor_interpolation(rng):
    """The reference resizes video tensors with torch (no antialiasing);
    jax.image.resize's default antialiased downscale differs by up to
    0.45 per value — the preprocess pipeline must match torch bit-close."""
    import pytest

    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    import torch.nn.functional as F

    from helping_hand_for_egocentric_videos_tpu.ops.preprocess import (
        resize_normalize,
    )

    clip = (rng.random((2, 256, 456, 3)) * 255).astype(np.uint8)
    got = np.asarray(resize_normalize(jnp.asarray(clip), 224, mean=(0, 0, 0), std=(1, 1, 1)))
    want = (
        F.interpolate(
            torch.from_numpy(clip.transpose(0, 3, 1, 2)).float() / 255.0,
            size=(224, 224),
            mode="bilinear",
            align_corners=False,
            antialias=False,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_spatial_crops_tall_image_and_invalid_count(rng):
    """Tall inputs take the top/center/bottom branch of SpatialCrop
    (lavila_transforms.py:120-146); invalid crop counts raise."""
    import pytest
    v = (rng.random((2, 96, 48, 3)) * 255).astype(np.uint8)  # h > w
    c3 = np.asarray(spatial_crops(jnp.asarray(v), crop=40, num_crops=3, short=48))
    assert c3.shape == (3, 2, 40, 40, 3)
    # top / center / bottom crops genuinely differ on random content
    assert not np.array_equal(c3[0], c3[1]) and not np.array_equal(c3[1], c3[2])
    with pytest.raises(ValueError, match="num_crops"):
        spatial_crops(jnp.asarray(v), crop=40, num_crops=5, short=48)
