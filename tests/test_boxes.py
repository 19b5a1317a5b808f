"""Box-op golden tests: jax ops vs independent numpy/torch oracles."""

import numpy as np
import jax.numpy as jnp

from helping_hand_for_egocentric_videos_tpu.ops import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    box_iou,
    generalized_box_iou,
    generalized_box_iou_elementwise,
    l1_cost_matrix,
    masks_to_boxes,
)


def random_xyxy(rng, n):
    lt = rng.uniform(0, 0.6, size=(n, 2))
    wh = rng.uniform(0.05, 0.4, size=(n, 2))
    return np.concatenate([lt, lt + wh], axis=1).astype(np.float32)


def np_iou_union(b1, b2):
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    return inter / (union + 1e-4), union


def np_giou(b1, b2):
    iou, union = np_iou_union(b1, b2)
    lt = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rb = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def test_cxcywh_roundtrip(rng):
    boxes = random_xyxy(rng, 32)
    back = np.asarray(box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(jnp.asarray(boxes))))
    np.testing.assert_allclose(back, boxes, atol=1e-6)


def test_cxcywh_known_values():
    xyxy = np.asarray(box_cxcywh_to_xyxy(jnp.array([[0.5, 0.5, 0.2, 0.4]])))
    np.testing.assert_allclose(xyxy, [[0.4, 0.3, 0.6, 0.7]], atol=1e-7)
    cxcywh = np.asarray(box_xyxy_to_cxcywh(jnp.array([[0.0, 0.0, 1.0, 0.5]])))
    np.testing.assert_allclose(cxcywh, [[0.5, 0.25, 1.0, 0.5]], atol=1e-7)


def test_iou_matches_oracle(rng):
    b1, b2 = random_xyxy(rng, 13), random_xyxy(rng, 7)
    iou, union = box_iou(jnp.asarray(b1), jnp.asarray(b2))
    ref_iou, ref_union = np_iou_union(b1, b2)
    np.testing.assert_allclose(np.asarray(iou), ref_iou, atol=1e-5)
    np.testing.assert_allclose(np.asarray(union), ref_union, atol=1e-5)


def test_giou_matches_oracle(rng):
    b1, b2 = random_xyxy(rng, 10), random_xyxy(rng, 4)
    giou = np.asarray(generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(giou, np_giou(b1, b2), atol=1e-5)
    # identity: GIoU(b, b) ~ 1 (the reference's +1e-4 union regulariser
    # biases small boxes slightly below 1, see utils/box_ops.py:36)
    self_giou = np.asarray(generalized_box_iou(jnp.asarray(b1), jnp.asarray(b1)))
    np.testing.assert_allclose(np.diag(self_giou), 1.0, atol=5e-2)


def test_giou_disjoint_negative():
    a = jnp.array([[0.0, 0.0, 0.1, 0.1]])
    b = jnp.array([[0.9, 0.9, 1.0, 1.0]])
    g = float(generalized_box_iou(a, b)[0, 0])
    assert g < -0.9  # far apart -> approaches -1


def test_elementwise_matches_diag(rng):
    b1, b2 = random_xyxy(rng, 9), random_xyxy(rng, 9)
    full = np.asarray(generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    elem = np.asarray(generalized_box_iou_elementwise(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(elem, np.diag(full), atol=1e-5)


def test_l1_cost_matrix(rng):
    b1, b2 = random_xyxy(rng, 5), random_xyxy(rng, 8)
    got = np.asarray(l1_cost_matrix(jnp.asarray(b1), jnp.asarray(b2)))
    want = np.abs(b1[:, None, :] - b2[None, :, :]).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_degenerate_boxes_no_nan():
    z = jnp.zeros((3, 4))
    assert np.isfinite(np.asarray(generalized_box_iou(z, z))).all()


def test_masks_to_boxes():
    masks = np.zeros((2, 8, 8), dtype=np.float32)
    masks[0, 2:5, 1:7] = 1  # y 2..4, x 1..6
    boxes = np.asarray(masks_to_boxes(jnp.asarray(masks)))
    np.testing.assert_allclose(boxes[0], [1, 2, 6, 4])
    np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])
