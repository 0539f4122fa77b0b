"""Layered INI config system — the reference's public API surface.

The reference drove everything through ``configparser`` INI files: ``-c``
accepts multiple files, later files override earlier, CLI ``key=value``
overrides beat both (SURVEY.md §5 config system [M]). The north star pins
this as the compatibility contract ("train/detect CLIs match the original
config-file-driven API"), so the same dialect is kept: sections select the
model (``yolo``/``yolo2``), the backbone builder by name, anchors, loss
lambdas, optimizer + LR, queue threads, detect thresholds. Parsed into
typed dataclasses; unknown keys warn instead of crash (forward compat).

Sections: [model] [cache] [queue] [data_augmentation] [train] [detect]
          [summary] [eval]
"""

from __future__ import annotations

import configparser
import dataclasses
import logging
import os
from typing import Dict, List, Sequence, Tuple

from yolojax.data.augment import AugmentConfig
from yolojax.data.loader import LoaderConfig
from yolojax.train.losses import YoloV1LossConfig, YoloV2LossConfig
from yolojax.train.step import OptimizerConfig

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    model: str = "yolo2"           # yolo | yolo2
    inference: str = "darknet"     # builder name within the model package
    names_file: str = ""           # class-names list path
    num_classes: int = 20          # derived from names_file when present
    anchors: Tuple[Tuple[float, float], ...] = ()  # v2; () -> builder default
    boxes_per_cell: int = 2        # v1
    grid: int = 7                  # v1
    dim: int = 416                 # input dim (448 for v1)
    # loss lambdas (Darknet region/detection defaults)
    coord_scale: float = -1.0      # -1 -> per-kind default
    object_scale: float = -1.0
    noobject_scale: float = -1.0
    class_scale: float = -1.0
    iou_thresh: float = 0.6
    rescore: bool = True
    prior_scale: float = 0.0
    leaky_alpha: float = 0.1
    bn_eps: float = 1e-5
    compile_cache: str = ""        # dir for jax's persistent jit cache
                                   # ("" disables); shared by every CLI


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    basedir: str = "cache"
    # whitespace-separated entries "voc:<root>:<image_set>" or
    # "coco:<ann_json>:<image_dir>", per phase
    train: str = ""
    val: str = ""
    test: str = ""


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    logdir: str = "logdir"
    steps: int = 100_000
    save_steps: int = 1000
    keep_checkpoints: int = 5      # tf.train.Saver max_to_keep equivalent
    summary_steps: int = 20
    image_summary_steps: int = 0   # 0 disables box-drawn image dumps
    histogram_steps: int = 0       # 0 disables param histogram summaries
    eval_steps: int = 0            # run val-phase mAP every N steps (0 off)
    seed: int = 0
    multi_scale: bool = False
    multi_scale_min: int = 320
    multi_scale_max: int = 608
    multi_scale_every: int = 10
    compute_dtype: str = "bfloat16"
    remat: bool = False            # jax.checkpoint the forward (memory vs FLOPs)
    tensorboard: bool = False
    profile_steps: int = 0         # capture a jax.profiler trace at step N
    profile_port: int = 0          # serve live jax.profiler captures (0 off)
    debug_nans: bool = False
    halt_on_nonfinite: bool = True # stop + checkpoint when loss goes NaN/inf
                                   # (checked on summary steps)
    # mesh
    mesh_data: int = 0             # 0 -> all devices
    mesh_model: int = 1
    zero: bool = False             # ZeRO-1: shard optimizer state (momentum/
                                   # Adam moments/EMA) over the data axis
    # multi-host (DCN): set all three (or JAX_COORDINATOR/... env vars)
    coordinator: str = ""
    num_processes: int = 0
    process_id: int = -1


@dataclasses.dataclass(frozen=True)
class DetectConfig:
    threshold: float = 0.3
    nms_iou: float = 0.4
    top_k: int = 256
    use_pallas: str = "auto"
    candidates: str = "auto"       # top-k select: auto|exact|approx
    stretch: bool = False          # plain resize instead of letterbox
    use_int8: bool = False         # post-training int8 conv trunk (v2 only)
    use_ema: bool = False          # Orbax ckpt dirs: serve the Polyak-
                                   # averaged weights ([train] ema_decay)
    calib_images: int = 8          # int8: images used for activation calib
    calib_percentile: float = 100.0  # int8: |act| percentile for scales
                                   # (100 = abs-max; e.g. 99.9 clips outliers)
    quant_bits: int = 8            # int8 path code width: 8 = full int8;
                                   # <8 coarsens the grid to ±(2^(b-1)-1)
                                   # (pair with cli/qat.py --bits to repair)
    fuse_stem: str = "off"         # fused conv0+pool: off|auto|pallas|xla


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    batch_size: int = 32
    map_iou: float = 0.5
    max_detections: int = 100
    data_parallel: str = "auto"    # shard eval batches over local devices:
                                   # auto (all local chips) | on | off
    distributed: bool = False      # multi-host eval: shard the cache per
                                   # process, allgather detections over DCN

    def data_parallel_flag(self):
        """Map the INI string onto evaluate_model's tri-state arg."""
        v = self.data_parallel.strip().lower()
        if v in ("auto", ""):
            return None
        if v in ("1", "true", "yes", "on"):
            return True
        if v in ("0", "false", "no", "off"):
            return False
        raise ValueError(
            f"eval.data_parallel = {self.data_parallel!r}: expected "
            "auto, on, or off"
        )


@dataclasses.dataclass(frozen=True)
class YoloJaxConfig:
    model: ModelConfig = ModelConfig()
    cache: CacheConfig = CacheConfig()
    queue: LoaderConfig = LoaderConfig()
    augment: AugmentConfig = AugmentConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    train: TrainConfig = TrainConfig()
    detect: DetectConfig = DetectConfig()
    eval: EvalConfig = EvalConfig()

    # ---- derived helpers ---------------------------------------------------
    def names(self) -> Tuple[str, ...]:
        if self.model.names_file and os.path.exists(self.model.names_file):
            with open(self.model.names_file) as f:
                return tuple(l.strip() for l in f if l.strip())
        from yolojax.data.cache import VOC_NAMES

        return VOC_NAMES[: self.model.num_classes]

    def build_model(self):
        from yolojax.models import get_model

        names = self.names()
        return get_model(
            self.model.model,
            self.model.inference,
            num_classes=len(names),
            anchors=self.model.anchors or None,
            boxes_per_cell=self.model.boxes_per_cell,
            grid=self.model.grid,
        )

    def loss_config(self):
        m = self.model
        pick = lambda v, d: d if v < 0 else v
        if self.model.model == "yolo2":
            return YoloV2LossConfig(
                coord_scale=pick(m.coord_scale, 1.0),
                object_scale=pick(m.object_scale, 5.0),
                noobject_scale=pick(m.noobject_scale, 1.0),
                class_scale=pick(m.class_scale, 1.0),
                iou_thresh=m.iou_thresh,
                rescore=m.rescore,
                prior_scale=m.prior_scale,
            )
        return YoloV1LossConfig(
            coord_scale=pick(m.coord_scale, 5.0),
            object_scale=pick(m.object_scale, 1.0),
            noobject_scale=pick(m.noobject_scale, 0.5),
            class_scale=pick(m.class_scale, 1.0),
            rescore=m.rescore,
        )

    def cache_datasets(self, phase: str) -> List[dict]:
        spec = getattr(self.cache, phase, "")
        out = []
        for entry in spec.split():
            kind, rest = entry.split(":", 1)
            if kind == "voc":
                root, image_set = rest.rsplit(":", 1)
                out.append({"kind": "voc", "root": root, "image_set": image_set})
            elif kind == "coco":
                ann, img_dir = rest.rsplit(":", 1)
                out.append({"kind": "coco", "ann_json": ann, "image_dir": img_dir})
            else:
                raise ValueError(f"unknown dataset entry {entry!r}")
        return out


_SECTION_TYPES = {
    "model": ModelConfig,
    "cache": CacheConfig,
    "queue": LoaderConfig,
    "data_augmentation": AugmentConfig,
    "train": TrainConfig,
    "optimizer": OptimizerConfig,
    "detect": DetectConfig,
    "eval": EvalConfig,
}
_SECTION_FIELD = {
    "model": "model",
    "cache": "cache",
    "queue": "queue",
    "data_augmentation": "augment",
    "train": "train",
    "optimizer": "optimizer",
    "detect": "detect",
    "eval": "eval",
}
# reference put optimizer keys in [train]; accept them there too
_TRAIN_OPTIMIZER_KEYS = {f.name for f in dataclasses.fields(OptimizerConfig)}

# [summary] section (reference dialect: summary emission gated by config)
# aliases onto the train-section knobs; explicit [train] keys win
_SUMMARY_KEYS = {
    "scalar": "summary_steps",
    "scalar_steps": "summary_steps",
    "summary_steps": "summary_steps",
    "histogram": "histogram_steps",
    "histogram_steps": "histogram_steps",
    "image": "image_summary_steps",
    "image_steps": "image_summary_steps",
    "image_summary_steps": "image_summary_steps",
}


def _coerce(field: dataclasses.Field, raw: str):
    t = field.type
    if t in ("bool", bool):
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if t in ("int", int):
        return int(float(raw))
    if t in ("float", float):
        return float(raw)
    if "Tuple[Tuple[float, float], ...]" in str(t):
        vals = [float(v) for v in raw.replace(",", " ").split()]
        if len(vals) % 2:
            raise ValueError(f"anchors need pairs, got {raw!r}")
        return tuple((vals[i], vals[i + 1]) for i in range(0, len(vals), 2))
    if "Tuple[int, ...]" in str(t):
        return tuple(int(float(v)) for v in raw.replace(",", " ").split())
    return raw


def load_config(
    paths: Sequence[str],
    overrides: Sequence[str] = (),
) -> YoloJaxConfig:
    """Load layered INI files (later override earlier) + CLI overrides of the
    form ``section.key=value``."""
    parser = configparser.ConfigParser(inline_comment_prefixes=(";", "#"))
    for p in paths:
        if not os.path.exists(p):
            raise FileNotFoundError(p)
        parser.read(p)
    # apply overrides
    for ov in overrides:
        key, eq, value = ov.partition("=")
        section, dot, name = key.strip().partition(".")
        if not eq or not dot or not section or not name:
            raise ValueError(
                f"malformed override {ov!r}; expected section.key=value"
            )
        if section == "summary" and name in _SUMMARY_KEYS:
            section, name = "train", _SUMMARY_KEYS[name]
        if not parser.has_section(section):
            parser.add_section(section)
        parser.set(section, name, value.strip())

    # fold the [summary] alias section into [train] (see _SUMMARY_KEYS)
    if parser.has_section("summary"):
        for name, raw in parser.items("summary"):
            tgt = _SUMMARY_KEYS.get(name)
            if tgt is None:
                log.warning("unknown key summary.%s ignored", name)
                continue
            if not parser.has_section("train"):
                parser.add_section("train")
            if not parser.has_option("train", tgt):
                parser.set("train", tgt, raw)
        parser.remove_section("summary")

    kwargs: Dict[str, object] = {}
    opt_kwargs: Dict[str, object] = {}
    for section in parser.sections():
        if section not in _SECTION_TYPES:
            log.warning("unknown config section [%s] ignored", section)
            continue
        cls = _SECTION_TYPES[section]
        fields = {f.name: f for f in dataclasses.fields(cls)}
        sec_kwargs = {}
        for name, raw in parser.items(section):
            if section == "train" and name in _TRAIN_OPTIMIZER_KEYS:
                f = {f.name: f for f in dataclasses.fields(OptimizerConfig)}[name]
                opt_kwargs[name] = _coerce(f, raw)
                continue
            if name not in fields:
                log.warning("unknown key %s.%s ignored", section, name)
                continue
            sec_kwargs[name] = _coerce(fields[name], raw)
        if section == "optimizer":
            opt_kwargs.update(sec_kwargs)
        else:
            kwargs[_SECTION_FIELD[section]] = cls(**sec_kwargs)
    if opt_kwargs:
        kwargs["optimizer"] = dataclasses.replace(
            OptimizerConfig(), **opt_kwargs
        )
    return YoloJaxConfig(**kwargs)
