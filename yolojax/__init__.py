"""yolojax — TPU-native YOLO v1/v2 detection framework (JAX/XLA/Pallas).

From-scratch rebuild of the capabilities of ``ruiminshen/yolo-tf`` (a
TensorFlow 1.x YOLO/YOLOv2 implementation; see SURVEY.md — the reference
mount was empty at survey time, so behavior is specified by the YOLO papers
arXiv:1506.02640 / arXiv:1612.08242 and the Darknet weight format).

Design (TPU-first, not a port):
  * NHWC conv + BN + leaky-ReLU pyramids compiled by XLA onto the MXU,
    bfloat16 compute / float32 params by default.
  * Single fused jitted objective (anchor decode + IoU matching, no Python
    control flow), differentiable end to end.
  * On-device augmentation (letterbox/flip/color-jitter) in pure JAX.
  * Batched NMS as a Pallas TPU kernel — detect output never leaves chip.
  * Data parallel via ``jax.sharding.Mesh`` + XLA collectives over ICI.
"""

__version__ = "0.1.0"
