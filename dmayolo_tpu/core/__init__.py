from .boxes import (
    xywh2xyxy,
    xyxy2xywh,
    xywhn2xyxy,
    xyxy2xywhn,
    xyn2xy,
    clip_boxes,
    scale_boxes,
    letterbox_params,
)
from .iou import bbox_iou, box_iou_matrix, wh_iou
from .nms import batched_nms, nms_single

__all__ = [
    "xywh2xyxy",
    "xyxy2xywh",
    "xywhn2xyxy",
    "xyxy2xywhn",
    "xyn2xy",
    "clip_boxes",
    "scale_boxes",
    "letterbox_params",
    "bbox_iou",
    "box_iou_matrix",
    "wh_iou",
    "batched_nms",
    "nms_single",
]
