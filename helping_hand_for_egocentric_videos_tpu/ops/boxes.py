"""Jittable bounding-box math.

Semantics match the reference box utilities (reference:
``utils/box_ops.py:9-61`` — cxcywh/xyxy conversion, pairwise IoU with the
``+1e-4`` union regulariser, generalized IoU) but are written for XLA:
no data-dependent asserts, fully batched, and usable under ``vmap``/``jit``.

Boxes are float arrays whose last dimension is 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "box_cxcywh_to_xyxy",
    "box_xyxy_to_cxcywh",
    "box_area",
    "box_iou",
    "generalized_box_iou",
    "generalized_box_iou_elementwise",
    "l1_cost_matrix",
    "masks_to_boxes",
]


def box_cxcywh_to_xyxy(x: jax.Array) -> jax.Array:
    """(cx, cy, w, h) -> (x0, y0, x1, y1). Reference: utils/box_ops.py:9-13."""
    xc, yc, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [xc - 0.5 * w, yc - 0.5 * h, xc + 0.5 * w, yc + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(x: jax.Array) -> jax.Array:
    """(x0, y0, x1, y1) -> (cx, cy, w, h). Reference: utils/box_ops.py:16-20."""
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: jax.Array) -> jax.Array:
    """Area of xyxy boxes, shape ``boxes.shape[:-1]``."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jax.Array, boxes2: jax.Array):
    """Pairwise IoU between two sets of xyxy boxes.

    Args:
        boxes1: (..., N, 4); boxes2: (..., M, 4) with matching batch dims.
    Returns:
        (iou, union), each (..., N, M). The union carries the reference's
        ``+1e-4`` stabiliser (utils/box_ops.py:36) so degenerate boxes do not
        produce NaNs.
    """
    area1 = box_area(boxes1)  # (..., N)
    area2 = box_area(boxes2)  # (..., M)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]  # (..., N, M)

    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / (union + 1e-4)
    return iou, union


def generalized_box_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise GIoU (https://giou.stanford.edu/) for xyxy boxes.

    Reference: utils/box_ops.py:40-61, without the host-side degeneracy
    asserts — callers mask invalid rows/columns instead (fixed-shape TPU
    style). Enclosing-area division is guarded against exact zero.
    """
    iou, union = box_iou(boxes1, boxes2)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    area = wh[..., 0] * wh[..., 1]

    return iou - (area - union) / jnp.where(area == 0, 1.0, area)


def generalized_box_iou_elementwise(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Elementwise GIoU between aligned boxes (..., 4) -> (...,).

    Equivalent to ``diag(generalized_box_iou(a, b))`` used by the box loss
    (reference: model/box_utils.py:169-171) but without materialising the
    N×N matrix.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / (union + 1e-4)

    lt_e = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_e = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, min=0)
    area = wh_e[..., 0] * wh_e[..., 1]
    return iou - (area - union) / jnp.where(area == 0, 1.0, area)


def l1_cost_matrix(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise L1 distance, the ``cdist(..., p=1)`` matching cost.

    Reference: model/box_utils.py:75. boxes1 (..., N, 4), boxes2 (..., M, 4)
    -> (..., N, M).
    """
    return jnp.sum(
        jnp.abs(boxes1[..., :, None, :] - boxes2[..., None, :, :]), axis=-1
    )


def masks_to_boxes(masks: jax.Array) -> jax.Array:
    """Bounding boxes (xyxy) around binary masks (N, H, W) -> (N, 4).

    Reference: utils/box_ops.py:64-88. Empty masks produce zero boxes.
    """
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(jnp.float32)
    big = jnp.float32(1e8)

    x_max = jnp.max(m * xs, axis=(1, 2))
    x_min = jnp.min(jnp.where(m > 0, xs * jnp.ones_like(m), big), axis=(1, 2))
    y_max = jnp.max(m * ys, axis=(1, 2))
    y_min = jnp.min(jnp.where(m > 0, ys * jnp.ones_like(m), big), axis=(1, 2))

    empty = jnp.sum(m, axis=(1, 2)) == 0
    box = jnp.stack([x_min, y_min, x_max, y_max], axis=1)
    return jnp.where(empty[:, None], 0.0, box)
