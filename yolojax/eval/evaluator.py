"""Batched validation: device inference + on-device NMS -> host VOC mAP.

BASELINE config 2: YOLOv2 batched 416 inference + batched NMS over VOC val.
The device loop is one jitted fn (forward + decode + top-K + NMS); only the
kept detections cross back to the host, where boxes are un-letterboxed to
original image coordinates and fed to compute_map.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolojax.data.cache import DatasetCache
from yolojax.data.loader import Loader, LoaderConfig
from yolojax.eval.voc_map import compute_map
from yolojax.models import Model
from yolojax.postprocess.nms import postprocess_v1, postprocess_v2

log = logging.getLogger(__name__)


def make_infer_fn(model: Model, *, score_thresh: float, iou_thresh: float,
                  top_k: int, use_pallas: str = "auto",
                  candidates: str = "auto",
                  compute_dtype=jnp.bfloat16, qm=None):
    """jitted images -> {boxes, scores, classes, keep} (all fixed shape).

    ``qm``: optional QuantizedModel — runs the int8 conv trunk instead of
    the bf16 forward (params/bn_state args are then ignored).
    """

    @jax.jit
    def infer(params, bn_state, images):
        if qm is not None:
            from yolojax.quantize.ptq import apply_int8

            head = apply_int8(qm, images)
        else:
            head, _ = model.apply(params, bn_state, images,
                                  compute_dtype=compute_dtype)
        if model.kind == "v2":
            return postprocess_v2(
                head, model.anchors, score_thresh=score_thresh,
                iou_thresh=iou_thresh, top_k=top_k, use_pallas=use_pallas,
                candidates=candidates,
            )
        return postprocess_v1(
            head, model.grid, model.boxes_per_cell, model.num_classes,
            score_thresh=score_thresh, iou_thresh=iou_thresh, top_k=top_k,
            use_pallas=use_pallas, candidates=candidates,
        )

    return infer


def evaluate_model(
    model: Model,
    params,
    bn_state,
    cache: DatasetCache,
    *,
    input_dim: int,
    batch_size: int = 32,
    score_thresh: float = 0.005,  # low threshold for proper PR curves
    nms_iou: float = 0.45,
    top_k: int = 256,
    map_iou: float = 0.5,
    use_pallas: str = "auto",
    candidates: str = "auto",
    compute_dtype=jnp.bfloat16,
    max_batches: Optional[int] = None,
    stretch: bool = False,
    fold: bool = True,
    fuse_stem_impl: str = "off",
    int8: bool = False,  # post-training int8 conv trunk (implies fold)
    max_detections: int = 0,  # cap kept detections per image (0 = no cap)
    coco: bool = False,  # add COCO-style AP@[.50:.95] + size bins
    data_parallel: Optional[bool] = None,  # None = auto (all local devices)
) -> Dict[str, float]:
    """Run detection over a cached phase and return VOC AP metrics."""
    if fold or int8:
        from yolojax.convert.fold import fold_bn

        model, params, bn_state = fold_bn(model, params, bn_state)
        if not int8:  # int8 quantizes the trunk itself
            from yolojax.nn.stem import fuse_stem

            model, params, bn_state = fuse_stem(model, params, bn_state,
                                                impl=fuse_stem_impl)
    loader = Loader(
        cache,
        LoaderConfig(batch_size=batch_size, canvas_dim=input_dim,
                     max_boxes=64, stretch=stretch, drop_remainder=False,
                     num_threads=8),
    )
    # Data-parallel inference (BASELINE configs 2/5: batched eval on a
    # v5e-8): shard the batch axis over a 1-D mesh of the process-local
    # devices; params replicated; GSPMD runs each shard's forward+NMS on
    # its own chip with no collectives (embarrassingly parallel).
    # int8 stays single-device on auto (quantized serving is usually
    # latency-oriented), but an explicit data_parallel=True replicates the
    # quantized constants over the mesh and shards like the bf16 path.
    mesh = None
    n_local = len(jax.local_devices())
    if int8 and data_parallel is None:
        data_parallel = False
    if data_parallel or (data_parallel is None and n_local > 1):
        from yolojax.parallel.mesh import batch_sharding, make_mesh, replicated

        mesh = make_mesh(jax.local_devices(), data=n_local, model=1)
        params = jax.device_put(params, replicated(mesh))
        bn_state = jax.device_put(bn_state, replicated(mesh))
        log.info("eval: data-parallel over %d local devices", n_local)
    if int8:
        import dataclasses as _dc

        from yolojax.quantize.ptq import quantize_model

        calib_imgs, _, _, _ = next(loader.epoch(0, shuffle=False))
        qm = quantize_model(model, jax.device_get(params),
                            jnp.asarray(calib_imgs[:8]))
        if mesh is not None:
            qm = _dc.replace(
                qm, qparams=jax.device_put(qm.qparams, replicated(mesh)))
        infer = make_infer_fn(model, score_thresh=score_thresh,
                              iou_thresh=nms_iou, top_k=top_k,
                              use_pallas=use_pallas, candidates=candidates,
                              compute_dtype=compute_dtype, qm=qm)
    else:
        infer = make_infer_fn(model, score_thresh=score_thresh,
                              iou_thresh=nms_iou, top_k=top_k,
                              use_pallas=use_pallas, candidates=candidates,
                              compute_dtype=compute_dtype)

    def place(images_np):
        if mesh is None:
            return jnp.asarray(images_np), images_np.shape[0]
        n_actual = images_np.shape[0]
        pad = (-n_actual) % mesh.shape["data"]
        if pad:  # short last batch: pad to shardable, ignore the extras
            images_np = np.concatenate(
                [images_np, np.zeros((pad,) + images_np.shape[1:],
                                     images_np.dtype)])
        return jax.device_put(images_np, batch_sharding(mesh)), n_actual

    detections = []
    ground_truth = []
    img_id = 0
    for bi, (images, boxes, classes, valid) in enumerate(loader.epoch(0, shuffle=False)):
        if max_batches is not None and bi >= max_batches:
            break
        x, n_actual = place(np.asarray(images))
        out = jax.device_get(infer(params, bn_state, x))
        out = {k: v[:n_actual] for k, v in out.items()}
        for k in range(images.shape[0]):
            # GT (already in canvas coords; consistent with detections)
            for gi in range(boxes.shape[1]):
                if valid[k, gi]:
                    cx, cy, w, h = boxes[k, gi]
                    ground_truth.append(
                        (img_id, int(classes[k, gi]),
                         np.asarray([cy - h / 2, cx - w / 2,
                                     cy + h / 2, cx + w / 2])))
            keep = out["keep"][k]
            kept_idx = np.where(keep)[0]
            if max_detections:
                kept_idx = kept_idx[:max_detections]  # already score-sorted
            for d in kept_idx:
                detections.append(
                    (img_id, int(out["classes"][k, d]),
                     float(out["scores"][k, d]), out["boxes"][k, d]))
            img_id += 1
    log.info("eval: %d images, %d detections, %d gt boxes",
             img_id, len(detections), len(ground_truth))
    metrics = compute_map(detections, ground_truth, model.num_classes,
                          iou_thresh=map_iou)
    if coco:
        from yolojax.eval.voc_map import compute_coco_map

        # boxes are canvas-normalized; scale areas to canvas pixels so the
        # COCO small/medium/large bins mean what they do in COCO
        metrics.update(compute_coco_map(detections, ground_truth,
                                        model.num_classes,
                                        box_scale=float(input_dim)))
    metrics["num_images"] = img_id
    metrics["num_detections"] = len(detections)
    return metrics
