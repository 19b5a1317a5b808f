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
from .lap import solve_lap, solve_lap_batch
from .preprocess import (
    LAVILA_MEAN,
    LAVILA_STD,
    resize_normalize,
    shortside_centercrop_normalize,
    spatial_crops,
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
    "solve_lap",
    "solve_lap_batch",
    "LAVILA_MEAN",
    "LAVILA_STD",
    "resize_normalize",
    "shortside_centercrop_normalize",
    "spatial_crops",
]
