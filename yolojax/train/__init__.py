from yolojax.train.losses import (  # noqa: F401
    YoloV2LossConfig,
    YoloV1LossConfig,
    yolo_v2_loss,
    yolo_v1_loss,
)
