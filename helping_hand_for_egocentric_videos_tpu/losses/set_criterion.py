"""DETR set criterion: Hungarian-matched L1 + GIoU box losses.

Functional, fixed-shape equivalent of the reference matching/criterion
stack (model/box_utils.py:20-96 HungarianMatcher, 99-238 SetCriterion,
249-279 prepare_targets, 433-461 split/compute_box_loss), with the
matching solved on-device by the jittable LAP (ops/lap.py) instead of
per-sample scipy calls.

Semantics preserved exactly, including the reference's quirks:

- matching cost = 5 * L1(cxcywh) + 2 * (-GIoU), class cost excluded
  (build_matcher cost_class=1 is configured but the train loop always
  calls with exclude_class=True, run/train.py:166-181 ->
  box_utils.py:86-88).
- ``num_boxes`` = total valid target boxes summed over the *global* batch
  divided by world size, clamped to >= 1 (box_utils.py:218-222). Under
  jit-with-sharding the sum over the global batch is already the
  all-reduced value.
- ``compute_box_loss`` scales the summed weighted losses by
  3 / len(weight_dict) (= 3/4, box_utils.py:461); aux-layer losses in the
  reference are computed but never added to the total (their keys carry
  an ``_{i}`` suffix absent from weight_dict) — we therefore do not
  compute aux matchings at all, which is mathematically identical and
  saves 5/6 of the matching work.
- target preparation (prepare_targets, center_crop=False): clip to
  [0, resize] / resize, drop degenerate boxes (x2<=x1 or y2<=y1) via a
  validity mask (box_utils.py:269-278).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.boxes import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
    generalized_box_iou_elementwise,
    l1_cost_matrix,
)
from ..ops.lap import solve_lap_batch

__all__ = ["MatchCosts", "prepare_targets", "box_set_loss", "compute_box_loss"]


@dataclass(frozen=True)
class MatchCosts:
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    # loss weights (weight_dict values, run/train.py:460-463)
    weight_bbox: float = 5.0
    weight_giou: float = 2.0
    # 3 / len(weight_dict): the reference divides by (4 weight_dict
    # entries / 3) (box_utils.py:461)
    total_scale: float = 0.75


def prepare_targets(boxes_xyxy, resize: float = 224.0):
    """Normalise raw pixel xyxy boxes and compute validity.

    Args:
        boxes_xyxy: (B, M, 4) pixel boxes (0 rows = absent).
    Returns:
        (target_cxcywh (B, M, 4) in [0,1], valid (B, M) bool).
    Reference: prepare_targets with center_crop=False
    (box_utils.py:269-278; the train loop's call, box_utils.py:448).
    """
    b = jnp.clip(boxes_xyxy, 0.0, resize) / resize
    valid = (b[..., 2] > b[..., 0]) & (b[..., 3] > b[..., 1])
    return box_xyxy_to_cxcywh(b), valid


def _match(pred_boxes, target_boxes, target_valid, costs: MatchCosts):
    """Hungarian matching on-device.

    pred_boxes: (B, Q, 4) cxcywh; target_boxes: (B, M, 4) cxcywh;
    target_valid: (B, M). Returns target_to_pred (B, M) int32 (-1 invalid).
    """
    cost_l1 = l1_cost_matrix(pred_boxes, target_boxes)  # (B, Q, M)
    cost_giou = -generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(target_boxes)
    )
    cost = costs.cost_bbox * cost_l1 + costs.cost_giou * cost_giou
    cost = jax.lax.stop_gradient(cost)
    t2p, _ = solve_lap_batch(cost, target_valid)
    return t2p


def box_set_loss(
    pred_boxes,
    target_boxes,
    target_valid,
    costs: MatchCosts = MatchCosts(),
    num_boxes=None,
):
    """Matched L1 + GIoU losses.

    Args:
        pred_boxes: (B, Q, 4) sigmoid cxcywh predictions.
        target_boxes: (B, M, 4) cxcywh in [0,1].
        target_valid: (B, M) bool.
        num_boxes: normaliser override; default = clamp(sum(valid), 1).
    Returns:
        dict(loss_bbox, loss_giou, num_boxes, target_to_pred).
    """
    b, q, _ = pred_boxes.shape
    t2p = _match(pred_boxes, target_boxes, target_valid, costs)  # (B, M)

    gather_idx = jnp.clip(t2p, 0, q - 1)
    matched_pred = jnp.take_along_axis(
        pred_boxes, gather_idx[..., None], axis=1
    )  # (B, M, 4)
    vmask = target_valid & (t2p >= 0)
    w = vmask.astype(pred_boxes.dtype)[..., None]

    if num_boxes is None:
        num_boxes = jnp.maximum(jnp.sum(vmask.astype(jnp.float32)), 1.0)

    l1 = jnp.sum(jnp.abs(matched_pred - target_boxes) * w) / num_boxes
    giou = generalized_box_iou_elementwise(
        box_cxcywh_to_xyxy(matched_pred), box_cxcywh_to_xyxy(target_boxes)
    )
    giou_loss = jnp.sum((1.0 - giou) * w[..., 0]) / num_boxes
    return {
        "loss_bbox": l1,
        "loss_giou": giou_loss,
        "num_boxes": num_boxes,
        "target_to_pred": t2p,
    }


def compute_box_loss(
    box_type: str,
    pred_boxes,
    target_boxes_xyxy,
    costs: MatchCosts = MatchCosts(),
    num_queries: int = 12,
    resize: float = 224.0,
):
    """Reference-weighted box loss for one box family.

    Args:
        box_type: 'hand_boxes' (queries 0:2), 'obj_boxes' (queries
            2:num_queries) or 'all_boxes' (box_utils.py:445-456).
        pred_boxes: (B', Q, 4) decoder sigmoid boxes (B' = B*T in traj
            mode, matching the flattened targets, run/train.py:161-163).
        target_boxes_xyxy: (B', M, 4) raw pixel boxes.
    Returns:
        (scalar loss, aux dict).
    """
    if box_type == "hand_boxes":
        pred = pred_boxes[:, 0:2]
    elif box_type == "obj_boxes":
        pred = pred_boxes[:, 2:num_queries]
    elif box_type == "all_boxes":
        pred = pred_boxes
    else:
        raise ValueError(box_type)

    tgt, valid = prepare_targets(target_boxes_xyxy, resize=resize)
    out = box_set_loss(pred, tgt, valid, costs)
    total = (
        costs.weight_bbox * out["loss_bbox"] + costs.weight_giou * out["loss_giou"]
    ) * costs.total_scale
    return total, out
