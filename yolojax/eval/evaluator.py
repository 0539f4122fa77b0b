"""Batched validation: device inference + on-device NMS -> host VOC mAP.

BASELINE config 2: YOLOv2 batched 416 inference + batched NMS over VOC val.
The device loop is one jitted fn (forward + decode + top-K + NMS); only the
kept detections cross back to the host, where boxes are un-letterboxed to
original image coordinates and fed to compute_map.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolojax.data.cache import DatasetCache
from yolojax.data.loader import Loader, LoaderConfig
from yolojax.eval.voc_map import compute_map
from yolojax.models import Model
from yolojax.postprocess.nms import postprocess_v1, postprocess_v2

log = logging.getLogger(__name__)

# The eval protocol's score floor: low enough to keep the PR tail mAP/AR
# integrate over. Artifacts exported for eval must bake this (cli/eval.py
# warns when a serving-grade threshold was baked instead).
EVAL_SCORE_THRESH = 0.005


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


def _dump_coco_json(path, detections, ground_truth, num_images,
                    num_classes, box_scale, class_names=None,
                    gt_difficult=None):
    """Write the eval set + detections as one COCO-format JSON for
    external cross-checking: ``gt`` loads into ``pycocotools.COCO()``,
    ``detections`` into ``COCO.loadRes()`` — so the reported metrics can
    be re-scored with the canonical scorer on any host that has it (this
    sandbox does not). Boxes are converted from canvas-normalized
    (ymin, xmin, ymax, xmax) to COCO's pixel [x, y, w, h]; category ids
    are 1-based per COCO convention."""
    import json as _json

    def xywh(box):
        y0, x0, y1, x1 = (float(v) * box_scale for v in box)
        return [x0, y0, max(x1 - x0, 0.0), max(y1 - y0, 0.0)]

    names = list(class_names or [])
    gt = {
        "images": [{"id": i, "width": int(box_scale),
                    "height": int(box_scale)} for i in range(num_images)],
        "categories": [
            {"id": c + 1,
             "name": names[c] if c < len(names) else f"class_{c}"}
            for c in range(num_classes)
        ],
        # VOC difficult GT rides iscrowd=1: pycocotools then ignores it
        # (no recall credit, no FP for detections on it) — the COCO-side
        # analogue of the devkit's difficult handling
        "annotations": [
            {"id": i + 1, "image_id": int(img), "category_id": int(cls) + 1,
             "bbox": (b := xywh(box)), "area": b[2] * b[3],
             "iscrowd": int(bool(gt_difficult[i])) if gt_difficult is not None
             else 0}
            for i, (img, cls, box) in enumerate(ground_truth)
        ],
    }
    results = [
        {"image_id": int(img), "category_id": int(cls) + 1,
         "bbox": xywh(box), "score": float(score)}
        for img, cls, score, box in detections
    ]
    with open(path, "w") as f:
        _json.dump({"gt": gt, "detections": results}, f)
    log.info("eval: dumped COCO-format GT + %d detections -> %s",
             len(results), path)


def _allgather_shards(detections, ground_truth, gt_difficult, num_images,
                      n_proc):
    """Gather per-process eval shards over DCN into global lists.

    Detections/GT are packed into fixed-width f32 rows (GT rows carry the
    difficult flag), zero-padded to the global max row count (shapes must
    match across processes), and allgathered via jax; local image ids are
    remapped to globally-unique ids (gid = local * n_proc + rank — the
    strided shard analogue)."""
    from jax.experimental import multihost_utils as mhu

    rank = jax.process_index()
    # ids ride in float32 rows: above 2^24 integers lose precision and
    # detection/GT grouping silently corrupts — fail loudly instead
    # (a real raise, not an assert: must survive python -O)
    if num_images * n_proc >= 2 ** 24:
        raise ValueError(
            f"distributed eval id space {num_images} x {n_proc} processes "
            f"exceeds float32 integer range (2^24); shard the eval set"
        )

    def pack(rows, width):
        if rows:
            arr = np.stack([np.concatenate([[float(r[0]) * n_proc + rank],
                                            np.asarray(r[1:-1], np.float32),
                                            np.asarray(r[-1], np.float32)])
                            for r in rows]).astype(np.float32)
        else:
            arr = np.zeros((0, width), np.float32)
        return arr

    det = pack(detections, 7)    # gid, cls, score, box[4]
    gt = pack([(img, cls, float(diff), box)
               for (img, cls, box), diff in zip(ground_truth, gt_difficult)],
              7)                 # gid, cls, difficult, box[4]
    counts = mhu.process_allgather(
        np.asarray([det.shape[0], gt.shape[0], num_images], np.int64))
    cap_d, cap_g = int(counts[:, 0].max()), int(counts[:, 1].max())

    def gather(arr, cap, width):
        # cap is a global max, so every process takes the same branch and
        # the collective call pattern stays consistent
        pad = np.zeros((cap - arr.shape[0], width), np.float32)
        return mhu.process_allgather(np.concatenate([arr, pad]))

    all_det = gather(det, cap_d, 7) if cap_d else None
    all_gt = gather(gt, cap_g, 7) if cap_g else None
    detections = [
        (int(r[0]), int(r[1]), float(r[2]), r[3:7])
        for p in range(n_proc) for r in all_det[p, : int(counts[p, 0])]
    ] if cap_d else []
    gt_rows = [
        r for p in range(n_proc) for r in all_gt[p, : int(counts[p, 1])]
    ] if cap_g else []
    ground_truth = [(int(r[0]), int(r[1]), r[3:7]) for r in gt_rows]
    gt_difficult = [bool(r[2]) for r in gt_rows]
    return detections, ground_truth, gt_difficult, int(counts[:, 2].sum())


def evaluate_model(
    model: Optional[Model],
    params,
    bn_state,
    cache: DatasetCache,
    *,
    input_dim: int,
    batch_size: int = 32,
    score_thresh: float = EVAL_SCORE_THRESH,  # low: keep the PR tail
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
    calib_images: int = 8,  # int8 activation-calibration image count
    calib_percentile: float = 100.0,  # int8 |act| percentile (100 = absmax)
    quant_bits: int = 8,  # int8 code width (detect.quant_bits; <8 coarsens)
    max_detections: int = 0,  # cap kept detections per image (0 = no cap)
    coco: bool = False,  # add COCO-style AP@[.50:.95] + size bins
    data_parallel: Optional[bool] = None,  # None = auto (all local devices)
    distributed: bool = False,  # multi-host: shard the cache per process
    dump_path: Optional[str] = None,  # write COCO-format GT+results JSON
    class_names: Optional[Sequence[str]] = None,  # labels for the dump
    infer_override=None,  # callable(images) -> serving dict (AOT artifact)
    fixed_batch: Optional[int] = None,  # artifact's baked batch (pad to it)
    num_classes: Optional[int] = None,  # required when model is None
) -> Dict[str, float]:
    """Run detection over a cached phase and return VOC AP metrics.

    ``distributed=True`` under an initialized multi-process runtime gives
    fully distributed eval (BASELINE config 5): every process runs its
    disjoint cache shard on its own local chips (strided split — every
    image is evaluated; shard sizes differ by at most one), the per-shard
    detections/ground truth are allgathered over DCN, and every process
    computes (identical) global metrics. ALL processes must enter this
    call together.
    """
    n_proc = jax.process_count()
    distributed = distributed and n_proc > 1
    n_cls = model.num_classes if model is not None else num_classes
    if n_cls is None:
        raise ValueError("num_classes is required when model is None")
    mesh = None
    if infer_override is not None:
        # AOT artifact path: the serving graph (thresholds, NMS, top-K,
        # precision, weights) is baked — fold/int8/mesh knobs don't apply.
        # Metric-level parity with the live path is the point: the same
        # protocol scores the artifact a deployment host would run.
        if distributed:
            raise ValueError("artifact eval is single-process (the baked "
                             "graph has no shard axis); unset "
                             "eval.distributed")
        if fixed_batch:
            batch_size = fixed_batch  # loader batches must match the graph

        def infer(p, b, x):
            return infer_override(x)
    elif fold or int8:
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
                     num_threads=8,
                     shard_index=jax.process_index() if distributed else 0,
                     shard_count=n_proc if distributed else 1),
    )
    # Data-parallel inference (BASELINE configs 2/5: batched eval on a
    # v5e-8): shard the batch axis over a 1-D mesh of the process-local
    # devices; params replicated; GSPMD runs each shard's forward+NMS on
    # its own chip with no collectives (embarrassingly parallel).
    # int8 stays single-device on auto (quantized serving is usually
    # latency-oriented), but an explicit data_parallel=True replicates the
    # quantized constants over the mesh and shards like the bf16 path.
    n_local = len(jax.local_devices())
    if infer_override is not None:
        data_parallel = False  # the artifact owns its device placement
    elif int8 and data_parallel is None:
        data_parallel = False
    if data_parallel or (data_parallel is None and n_local > 1):
        from yolojax.parallel.mesh import batch_sharding, make_mesh, replicated

        mesh = make_mesh(jax.local_devices(), data=n_local, model=1)
        params = jax.device_put(params, replicated(mesh))
        bn_state = jax.device_put(bn_state, replicated(mesh))
        log.info("eval: data-parallel over %d local devices", n_local)
    if infer_override is not None:
        pass  # infer already bound to the artifact graph above
    elif int8:
        import dataclasses as _dc

        from yolojax.quantize.ptq import quantize_model

        want = max(calib_images, 1)
        chunks = []
        for imgs, _, _, _ in loader.epoch(0, shuffle=False):
            chunks.append(np.asarray(imgs))
            if sum(c.shape[0] for c in chunks) >= want:
                break
        calib_imgs = np.concatenate(chunks)[:want]
        qm = quantize_model(model, jax.device_get(params),
                            jnp.asarray(calib_imgs),
                            percentile=calib_percentile, bits=quant_bits)
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
        n_actual = images_np.shape[0]
        if fixed_batch:  # artifact graphs take exactly (fixed_batch, ...)
            pad = fixed_batch - n_actual
        elif mesh is not None:
            pad = (-n_actual) % mesh.shape["data"]
        else:
            return jnp.asarray(images_np), n_actual
        if pad:  # short last batch: pad to shape, ignore the extras
            images_np = np.concatenate(
                [images_np, np.zeros((pad,) + images_np.shape[1:],
                                     images_np.dtype)])
        if mesh is None:
            return jnp.asarray(images_np), n_actual
        return jax.device_put(images_np, batch_sharding(mesh)), n_actual

    detections = []
    ground_truth = []
    gt_difficult = []  # aligned with ground_truth (VOC ignore semantics)
    # cache indices in loader order (epoch 0, no shuffle, strided shard) —
    # used to pull each image's *difficult* GT, which the training-view
    # loader batches exclude by design (DatasetCache.example)
    eval_order = np.arange(len(cache))
    if distributed:
        eval_order = eval_order[jax.process_index()::n_proc]
    from yolojax.data.augment import letterbox_transform

    img_id = 0
    for bi, (images, boxes, classes, valid) in enumerate(loader.epoch(0, shuffle=False)):
        if max_batches is not None and bi >= max_batches:
            break
        x, n_actual = place(np.asarray(images))
        out = jax.device_get(infer(params, bn_state, x))
        out = {k: v[:n_actual] for k, v in out.items()}
        # Vectorized row extraction (row-major nonzero keeps the exact
        # (image, slot) append order of the per-image loop it replaced).
        # GT is already in canvas coords, consistent with detections.
        boxes_np, classes_np = np.asarray(boxes), np.asarray(classes)
        for k, g in zip(*(a.tolist() for a in np.nonzero(np.asarray(valid)))):
            cx, cy, w, h = boxes_np[k, g]
            ground_truth.append(
                (img_id + k, int(classes_np[k, g]),
                 np.asarray([cy - h / 2, cx - w / 2,
                             cy + h / 2, cx + w / 2])))
        gt_difficult.extend([False] * (len(ground_truth) - len(gt_difficult)))
        for k in range(images.shape[0]):
            ci = int(eval_order[bi * batch_size + k])
            _, cb, cc, cd = cache.example_eval(ci)
            if not cd.any():
                continue
            iw, ih = (int(v) for v in cache.sizes[ci])
            sx, sy, px, py = letterbox_transform(iw, ih, input_dim,
                                                 stretch=stretch)
            for b, c_ in zip(cb[cd], cc[cd]):
                cx = b[0] * sx + px
                cy = b[1] * sy + py
                w, h = b[2] * sx, b[3] * sy
                ground_truth.append(
                    (img_id + k, int(c_),
                     np.asarray([cy - h / 2, cx - w / 2,
                                 cy + h / 2, cx + w / 2])))
                gt_difficult.append(True)
        keep = out["keep"]
        if max_detections:
            # NMS output is score-sorted along the box axis: keeping the
            # first max_detections kept entries per image == the old
            # per-image np.where(...)[:max_detections]
            keep = keep & (np.cumsum(keep, axis=1) <= max_detections)
        for k, d in zip(*(a.tolist() for a in np.nonzero(keep))):
            detections.append(
                (img_id + k, int(out["classes"][k, d]),
                 float(out["scores"][k, d]), out["boxes"][k, d]))
        img_id += images.shape[0]
    log.info("eval: %d images, %d detections, %d gt boxes%s",
             img_id, len(detections), len(ground_truth),
             f" (shard {jax.process_index()}/{n_proc})" if distributed else "")
    if distributed:
        detections, ground_truth, gt_difficult, img_id = _allgather_shards(
            detections, ground_truth, gt_difficult, img_id, n_proc)
    if dump_path and jax.process_index() == 0:
        _dump_coco_json(dump_path, detections, ground_truth, img_id,
                        n_cls, float(input_dim), class_names,
                        gt_difficult=gt_difficult)
    metrics = compute_map(detections, ground_truth, n_cls,
                          iou_thresh=map_iou, gt_difficult=gt_difficult)
    if coco:
        from yolojax.eval.voc_map import compute_coco_map

        # boxes are canvas-normalized; scale areas to canvas pixels so the
        # COCO small/medium/large bins mean what they do in COCO
        metrics.update(compute_coco_map(detections, ground_truth,
                                        n_cls,
                                        box_scale=float(input_dim),
                                        gt_ignore=gt_difficult))
    metrics["num_images"] = img_id
    metrics["num_detections"] = len(detections)
    return metrics
