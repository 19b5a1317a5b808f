from .boxes import (
    box_area,
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
    generalized_box_iou_elementwise,
    l1_cost_matrix,
    masks_to_boxes,
)

__all__ = [
    "box_area",
    "box_cxcywh_to_xyxy",
    "box_iou",
    "box_xyxy_to_cxcywh",
    "generalized_box_iou",
    "generalized_box_iou_elementwise",
    "l1_cost_matrix",
    "masks_to_boxes",
]
