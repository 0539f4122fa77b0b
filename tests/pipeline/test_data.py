"""Data pipeline tests: VOC cache build, loader batching, on-device
augmentation determinism + box/geometry consistency."""


import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolojax.data.augment import (
    AugmentConfig,
    augment_batch,
    hsv_to_rgb,
    letterbox_host,
    rgb_to_hsv,
)
from yolojax.data.cache import VOC_NAMES, build_cache, load_cache
from yolojax.data.loader import Loader, LoaderConfig


# ---------------------------------------------------------------------------
# Synthetic VOC fixture
# ---------------------------------------------------------------------------


from tests.util import write_synthetic_voc as _write_voc_impl


def _write_voc(root, n_images=6, size=(96, 64)):
    return _write_voc_impl(root, n_images=n_images, size=size)


@pytest.fixture(scope="module")
def voc_cache(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc"))
    _write_voc(root)
    out = str(tmp_path_factory.mktemp("cache"))
    build_cache(out, "trainval", [{"kind": "voc", "root": root,
                                   "image_set": "trainval"}])
    return out


def test_cache_roundtrip(voc_cache):
    cache = load_cache(voc_cache, "trainval")
    assert len(cache) == 6
    assert cache.names == VOC_NAMES
    path, boxes, classes = cache.example(0)
    assert boxes.shape[1] == 4
    assert (boxes >= 0).all() and (boxes <= 1).all()
    assert len(boxes) == len(classes)


def test_loader_batches_fixed_shape(voc_cache):
    cache = load_cache(voc_cache, "trainval")
    cfg = LoaderConfig(batch_size=2, canvas_dim=64, max_boxes=10,
                       num_threads=2, seed=3)
    loader = Loader(cache, cfg)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    imgs, boxes, cls, valid = batches[0]
    assert imgs.shape == (2, 64, 64, 3) and imgs.dtype == np.float32
    assert boxes.shape == (2, 10, 4)
    assert valid.any()
    # determinism: same (seed, epoch) -> identical batches
    again = list(loader.epoch(0))
    for a, b in zip(batches, again):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    # different epoch -> different order
    other = list(loader.epoch(1))
    assert not all(
        np.array_equal(a[0], b[0]) for a, b in zip(batches, other)
    )


def test_letterbox_box_mapping():
    img = np.zeros((50, 100, 3), np.uint8)  # wide image
    canvas, (sx, sy, px, py) = letterbox_host(img, 64)
    assert canvas.shape == (64, 64, 3)
    # aspect preserved: full width, half height centered
    assert abs(sx - 1.0) < 0.02 and abs(sy - 0.5) < 0.02
    # gray bars top/bottom
    assert abs(float(canvas[0, 0, 0]) - 0.5) < 1e-6


def test_hsv_roundtrip():
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_augment_deterministic_and_valid():
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.tile(np.asarray([[0.5, 0.5, 0.4, 0.3]], np.float32), (4, 5, 1))
    )
    valid = jnp.ones((4, 5), bool)
    key = jax.random.PRNGKey(42)
    f = jax.jit(lambda k, i, b, v: augment_batch(k, i, b, v, 32))
    i1, b1, v1 = f(key, images, boxes, valid)
    i2, b2, v2 = f(key, images, boxes, valid)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert i1.shape == (4, 32, 32, 3)
    b1 = np.asarray(b1)
    v1 = np.asarray(v1)
    # surviving boxes stay inside the unit frame
    corners_lo = b1[..., :2] - b1[..., 2:] / 2
    corners_hi = b1[..., :2] + b1[..., 2:] / 2
    assert (corners_lo[v1] > -1e-5).all()
    assert (corners_hi[v1] < 1 + 1e-5).all()
    # different key -> different images
    i3, _, _ = f(jax.random.PRNGKey(7), images, boxes, valid)
    assert not np.allclose(np.asarray(i1), np.asarray(i3))


def test_augment_no_jitter_identity_geometry():
    """With zero jitter/color and flip off, augmentation is just a resize."""
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.uniform(0.2, 0.8, (2, 32, 32, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.tile(np.asarray([[0.5, 0.5, 0.5, 0.5]], np.float32), (2, 3, 1))
    )
    valid = jnp.ones((2, 3), bool)
    cfg = AugmentConfig(flip=False, jitter=0.0, hue=0.0,
                        saturation=1.0, exposure=1.0)
    img, b, v = augment_batch(jax.random.PRNGKey(0), images, boxes, valid,
                              32, cfg)
    np.testing.assert_allclose(np.asarray(b), np.asarray(boxes), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(valid))
    np.testing.assert_allclose(np.asarray(img), np.asarray(images), atol=1e-3)


def test_flip_mirrors_boxes():
    """Force flip by scanning keys until one flips, then check the mirror."""
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    boxes = jnp.asarray(np.asarray([[[0.25, 0.5, 0.2, 0.2]]], np.float32))
    valid = jnp.ones((1, 1), bool)
    cfg = AugmentConfig(flip=True, jitter=0.0, hue=0.0,
                        saturation=1.0, exposure=1.0)
    seen_flip = seen_noflip = False
    for seed in range(20):
        img, b, v = augment_batch(jax.random.PRNGKey(seed), images, boxes,
                                  valid, 16, cfg)
        x = float(b[0, 0, 0])
        if abs(x - 0.75) < 1e-5:
            seen_flip = True
            np.testing.assert_allclose(
                np.asarray(img[0]), np.asarray(images[0, :, ::-1, :]), atol=1e-3
            )
        elif abs(x - 0.25) < 1e-5:
            seen_noflip = True
    assert seen_flip and seen_noflip


def test_grain_loader_matches_contract(tmp_path):
    """GrainLoader (SURVEY §2's named input-pipeline alternative) yields the
    same fixed-shape batch contract as the default loader, deterministically
    per (seed, epoch), and covers each example exactly once per epoch."""
    import numpy as np

    from tests.util import VOC_NAMES, write_synthetic_voc
    from yolojax.data.cache import build_cache
    from yolojax.data.grain_loader import GrainLoader, make_loader
    from yolojax.data.loader import LoaderConfig

    voc = tmp_path / "voc"
    write_synthetic_voc(str(voc), n_images=10, size=(96, 64))
    cache = build_cache(str(tmp_path / "cache"), "train",
                        [{"kind": "voc", "root": str(voc),
                          "image_set": "trainval"}], names=VOC_NAMES)
    cfg = LoaderConfig(batch_size=4, canvas_dim=64, max_boxes=8,
                       num_threads=2, seed=3)
    gl = GrainLoader(cache, cfg)
    epoch_a = list(gl.epoch(0))
    assert len(epoch_a) == 2  # 10 // 4 with drop_remainder
    imgs, boxes, cls, valid = epoch_a[0]
    assert imgs.shape == (4, 64, 64, 3) and imgs.dtype == np.float32
    assert boxes.shape == (4, 8, 4) and valid.dtype == bool

    # deterministic per (seed, epoch); different shuffle across epochs
    epoch_a2 = list(gl.epoch(0))
    np.testing.assert_array_equal(epoch_a[0][0], epoch_a2[0][0])
    epoch_b = list(gl.epoch(1))
    assert not np.array_equal(epoch_a[0][0], epoch_b[0][0])

    # per-example decode identical to the default loader
    nl = make_loader(cache, cfg, "native")
    a = nl._load_example(0)
    b = gl._decode.map(0)
    np.testing.assert_array_equal(a[0], b[0])

    import pytest

    with pytest.raises(ValueError):
        make_loader(cache, cfg, "bogus")


def test_grain_loader_multiprocess_workers(tmp_path):
    """grain_workers > 0 spawns real Grain worker processes: the transforms
    must pickle (module-level classes) and the batches must be identical to
    the in-process path for the same (seed, epoch)."""
    import numpy as np

    from tests.util import VOC_NAMES, write_synthetic_voc
    from yolojax.data.cache import build_cache
    from yolojax.data.grain_loader import GrainLoader
    from yolojax.data.loader import LoaderConfig

    voc = tmp_path / "voc"
    write_synthetic_voc(str(voc), n_images=8, size=(96, 64))
    cache = build_cache(str(tmp_path / "cache"), "train",
                        [{"kind": "voc", "root": str(voc),
                          "image_set": "trainval"}], names=VOC_NAMES)
    cfg = LoaderConfig(batch_size=4, canvas_dim=64, max_boxes=8, seed=3,
                       grain_workers=1)
    multi = list(GrainLoader(cache, cfg).epoch(0))
    inline = list(GrainLoader(cache, cfg, worker_count=0).epoch(0))
    assert len(multi) == len(inline) == 2
    for m, s in zip(multi, inline):
        for a, b in zip(m, s):
            np.testing.assert_array_equal(a, b)


def test_grain_stream_checkpointable_mid_epoch(tmp_path):
    """stream() exposes grain's iterator checkpointing: a fresh stream
    restored from get_state() must continue with EXACTLY the batches the
    original would have produced next — mid-epoch resume, the advertised
    reason the grain backend exists (VERDICT r2 weak #5)."""
    import numpy as np

    from tests.util import VOC_NAMES, write_synthetic_voc
    from yolojax.data.cache import build_cache
    from yolojax.data.grain_loader import GrainLoader
    from yolojax.data.loader import LoaderConfig

    voc = tmp_path / "voc"
    write_synthetic_voc(str(voc), n_images=10, size=(96, 64))
    cache = build_cache(str(tmp_path / "cache"), "train",
                        [{"kind": "voc", "root": str(voc),
                          "image_set": "trainval"}], names=VOC_NAMES)
    cfg = LoaderConfig(batch_size=4, canvas_dim=64, max_boxes=8,
                       num_threads=2, seed=7)
    s1 = GrainLoader(cache, cfg).stream()
    next(s1)  # consume one mid-epoch batch (epoch = 2 batches + remainder)
    state = s1.get_state()
    assert isinstance(state, bytes) and state
    want = [next(s1) for _ in range(4)]  # crosses an epoch boundary

    s2 = GrainLoader(cache, cfg).stream()
    s2.set_state(state)
    got = [next(s2) for _ in range(4)]
    for w, g in zip(want, got):
        for a, b in zip(w, g):
            np.testing.assert_array_equal(a, b)

    # without restore the fresh stream starts at the beginning instead
    s3 = GrainLoader(cache, cfg).stream()
    first = next(s3)
    assert not np.array_equal(first[0], want[0][0])


def test_augment_zero_saturation_exposure_is_identity_not_nan():
    """[data_augmentation] saturation = 0 / exposure = 0 (a natural way to
    write "off" in the INI) must disable the jitter, not poison training
    with log(0) NaNs."""
    import jax
    import jax.numpy as jnp

    from yolojax.data.augment import AugmentConfig, augment_batch

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    boxes = jnp.asarray(np.tile([[0.5, 0.5, 0.4, 0.4]], (2, 4, 1)).astype(np.float32))
    valid = jnp.zeros((2, 4), bool).at[:, 0].set(True)
    cfg = AugmentConfig(flip=False, jitter=0.0, hue=0.0,
                        saturation=0.0, exposure=0.0)
    out, ob, ov = augment_batch(jax.random.PRNGKey(0), imgs, boxes, valid,
                                32, cfg)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


# ---------------------------------------------------------------------------
# VOC difficult objects: kept in the cache with a flag, excluded from the
# training view, surfaced to the evaluator (VOC ignore protocol)
# ---------------------------------------------------------------------------


def test_difficult_flagged_not_dropped(tmp_path):
    root = str(tmp_path / "voc")
    _write_voc_impl(root, n_images=8, boxes_per_image=(2, 5),
                    difficult_frac=0.5)
    out = str(tmp_path / "cache")
    cache = build_cache(out, "trainval",
                        [{"kind": "voc", "root": root,
                          "image_set": "trainval"}])
    assert cache.difficult.any() and not cache.difficult.all()
    # training view excludes, eval view includes
    n_train = sum(len(cache.example(i)[1]) for i in range(len(cache)))
    n_all = sum(len(cache.example_eval(i)[1]) for i in range(len(cache)))
    assert n_train == int((~cache.difficult).sum())
    assert n_all == len(cache.difficult)
    # flags survive the npz roundtrip
    loaded = load_cache(out, "trainval")
    np.testing.assert_array_equal(loaded.difficult, cache.difficult)
    # and per-example flags align with boxes
    _, _, _, d0 = loaded.example_eval(0)
    lo, hi = loaded.offsets[0], loaded.offsets[1]
    np.testing.assert_array_equal(d0, loaded.difficult[lo:hi])


def test_legacy_cache_without_difficult_loads(tmp_path, voc_cache):
    """Caches written before the difficult flag existed load as all-easy."""
    import os
    import shutil

    legacy = str(tmp_path / "legacy")
    os.makedirs(legacy)
    shutil.copy(os.path.join(voc_cache, "names.txt"), legacy)
    z = dict(np.load(os.path.join(voc_cache, "trainval.npz"),
                     allow_pickle=False))
    z.pop("difficult", None)
    np.savez(os.path.join(legacy, "trainval.npz"), **z)
    cache = load_cache(legacy, "trainval")
    assert cache.difficult.shape == cache.classes.shape
    assert not cache.difficult.any()


def test_letterbox_transform_matches_host():
    """letterbox_transform(w, h, dim) must reproduce letterbox_host's
    geometry exactly (the evaluator maps difficult GT with it)."""
    from yolojax.data.augment import letterbox_transform

    rng = np.random.RandomState(3)
    for w, h, dim in [(96, 64, 64), (64, 96, 48), (100, 100, 32),
                      (37, 119, 96)]:
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        for stretch in (False, True):
            _, tf_host = letterbox_host(img, dim, stretch=stretch)
            tf_pure = letterbox_transform(w, h, dim, stretch=stretch)
            assert tf_host == tf_pure, (w, h, dim, stretch)
