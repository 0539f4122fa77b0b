"""On-device data augmentation in pure JAX (vmapped, PRNG-key driven).

Replaces the reference's host-side TF queue augmentation subgraph
(SURVEY.md §2 data ops: random horizontal flip with mirrored boxes, random
crop/shift, color jitter in HSV, resize to input dim). Moving this on-device
is the TPU-native answer to the reference's C++ queue-runner threads: the
host only decodes JPEGs; everything else rides the accelerator and is
deterministic given the PRNG key (SURVEY.md §4.3 pipeline determinism).

Geometry convention: boxes are (cx, cy, w, h), normalized to the *canvas*.
The random crop/zoom is expressed as x' = x*z + o and implemented with
``jax.image.scale_and_translate`` (jit-friendly, static output shape).
Gray fill outside the source extent uses the (img - 0.5) trick: the resample
fills zeros, which map back to 0.5 gray.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Darknet-style jitter parameters (reference read these from the INI
    [data_augmentation]-style section; defaults match yolo-voc.cfg)."""

    flip: bool = True
    jitter: float = 0.2      # max relative crop/zoom perturbation
    hue: float = 0.1         # max absolute hue rotation (fraction of the wheel)
    saturation: float = 1.5  # max saturation scale (sampled in [1/s, s])
    exposure: float = 1.5    # max value/exposure scale (sampled in [1/s, s])
    min_box: float = 0.003   # boxes smaller than this after crop are dropped


# ---------------------------------------------------------------------------
# Color space
# ---------------------------------------------------------------------------


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """(..., 3) RGB in [0,1] -> HSV, h in [0,1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r,
        (g - b) / safe_d % 6.0,
        jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0),
    )
    h = jnp.where(d > 0, h / 6.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _color_jitter(key: jax.Array, img: jax.Array, cfg: AugmentConfig):
    kh, ks, kv = jax.random.split(key, 3)
    dh = jax.random.uniform(kh, (), minval=-cfg.hue, maxval=cfg.hue)
    # saturation/exposure are multiplicative ranges sampled in [1/s, s]:
    # 1 (or any value <= 0, a natural "off" typo in the INI) disables the
    # jitter — log(0) would otherwise poison training with NaNs
    sat = cfg.saturation if cfg.saturation > 0 else 1.0
    exp_ = cfg.exposure if cfg.exposure > 0 else 1.0
    log_s = jnp.log(jnp.asarray(sat))
    ds = jnp.exp(jax.random.uniform(ks, (), minval=-log_s, maxval=log_s))
    log_v = jnp.log(jnp.asarray(exp_))
    dv = jnp.exp(jax.random.uniform(kv, (), minval=-log_v, maxval=log_v))
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    hsv = jnp.stack(
        [
            (hsv[..., 0] + dh) % 1.0,
            jnp.clip(hsv[..., 1] * ds, 0.0, 1.0),
            jnp.clip(hsv[..., 2] * dv, 0.0, 1.0),
        ],
        axis=-1,
    )
    return hsv_to_rgb(hsv)


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------


def _geometry(key, img, boxes, valid, out_dim, cfg):
    """Random zoom/translate + optional horizontal flip."""
    kz, kt, kf = jax.random.split(key, 3)
    j = cfg.jitter
    # zoom per-axis in [1-j, 1+j]; offset keeps most of the frame visible
    z = jax.random.uniform(kz, (2,), minval=1.0 - j, maxval=1.0 + j)  # (zx, zy)
    o = jax.random.uniform(kt, (2,), minval=0.0, maxval=1.0) * jnp.abs(1.0 - z)
    o = jnp.where(z >= 1.0, -o, o)  # zoom-in: shift left/up; zoom-out: pad

    h_in, w_in = img.shape[0], img.shape[1]
    scale = jnp.asarray([z[1] * out_dim, z[0] * out_dim]) / jnp.asarray(
        [h_in, w_in], jnp.float32
    )
    trans = jnp.asarray([o[1], o[0]]) * out_dim
    img = jax.image.scale_and_translate(
        img - 0.5,
        shape=(out_dim, out_dim, 3),
        spatial_dims=(0, 1),
        scale=scale,
        translation=trans,
        method="linear",
    ) + 0.5

    xy = boxes[..., 0:2] * z + o
    wh = boxes[..., 2:4] * z

    flip = cfg.flip and True
    do_flip = jax.random.bernoulli(kf, 0.5) if flip else jnp.asarray(False)
    img = jnp.where(do_flip, img[:, ::-1, :], img)
    xy = jnp.where(do_flip, jnp.stack([1.0 - xy[..., 0], xy[..., 1]], -1), xy)

    # clip boxes to frame, drop degenerates
    lo = jnp.clip(xy - wh / 2, 0.0, 1.0)
    hi = jnp.clip(xy + wh / 2, 0.0, 1.0)
    xy = (lo + hi) / 2
    wh = hi - lo
    valid = valid & (wh[..., 0] > cfg.min_box) & (wh[..., 1] > cfg.min_box)
    return img, jnp.concatenate([xy, wh], -1), valid


def _augment_one(key, img, boxes, valid, out_dim, cfg):
    kg, kc = jax.random.split(key)
    img, boxes, valid = _geometry(kg, img, boxes, valid, out_dim, cfg)
    img = _color_jitter(kc, img, cfg)
    return img, boxes, valid


def augment_batch(
    key: jax.Array,
    images: jax.Array,  # (N, H, W, 3) f32 in [0,1] (canvas)
    boxes: jax.Array,  # (N, G, 4) normalized xywh
    valid: jax.Array,  # (N, G) bool
    out_dim: int,
    cfg: AugmentConfig = AugmentConfig(),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """vmapped per-image augmentation; deterministic given ``key``."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(
        lambda k, i, b, v: _augment_one(k, i, b, v, out_dim, cfg)
    )(keys, images, boxes, valid)


# ---------------------------------------------------------------------------
# Letterbox (host-side numpy for the loader; detect-time parity helper)
# ---------------------------------------------------------------------------


def letterbox_transform(
    w: int, h: int, dim: int, *, stretch: bool = False
) -> Tuple[float, float, float, float]:
    """The pure box transform of :func:`letterbox_host` for a (w, h) source:
    (scale_x, scale_y, pad_x, pad_y), normalized, with
    box_canvas = box_image * scale + pad. Lets callers that know only the
    original size (e.g. the evaluator mapping cached GT to canvas coords)
    reproduce the loader's geometry exactly without decoding the image.
    """
    if stretch:
        return (1.0, 1.0, 0.0, 0.0)
    r = min(dim / w, dim / h)
    nw, nh = int(round(w * r)), int(round(h * r))
    px, py = (dim - nw) // 2, (dim - nh) // 2
    return (nw / dim, nh / dim, px / dim, py / dim)


def letterbox_host(
    img: np.ndarray, dim: int, *, stretch: bool = False
) -> Tuple[np.ndarray, Tuple[float, float, float, float]]:
    """Resize an HWC uint8/float image to (dim, dim), aspect-preserving with
    0.5-gray padding (or plain stretch — the reference's resize semantics are
    unverifiable, SURVEY.md §3.3 [L], so both are exposed behind config).

    Returns (canvas float32 in [0,1], (scale_x, scale_y, pad_x, pad_y)) where
    box_canvas = box_image * scale + pad, all normalized.
    """
    import cv2

    h, w = img.shape[:2]
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    if stretch:
        out = cv2.resize(img, (dim, dim), interpolation=cv2.INTER_LINEAR)
        return out.astype(np.float32), letterbox_transform(w, h, dim,
                                                           stretch=True)
    sx, sy, pxn, pyn = letterbox_transform(w, h, dim)
    nw, nh = int(round(sx * dim)), int(round(sy * dim))
    px, py = int(round(pxn * dim)), int(round(pyn * dim))
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.full((dim, dim, 3), 0.5, np.float32)
    canvas[py : py + nh, px : px + nw] = resized
    return canvas, (sx, sy, pxn, pyn)
