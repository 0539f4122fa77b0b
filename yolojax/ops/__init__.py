from yolojax.ops.boxes import (  # noqa: F401
    decode_v2,
    split_v1_head,
    decode_v1,
    iou_pairwise,
    iou_matrix,
    xywh_to_corners,
    corners_to_xywh,
)
