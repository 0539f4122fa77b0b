"""Native (C++) decode pool vs Python loader path: same canvases, same
GT transforms, and a throughput sanity check."""


import numpy as np
import pytest

from tests.util import write_synthetic_voc
from yolojax.data.cache import build_cache, load_cache
from yolojax.data.loader import Loader, LoaderConfig
from yolojax.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="libyolodata.so not built"
)


@pytest.fixture(scope="module")
def voc_cache(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc"))
    write_synthetic_voc(root, n_images=8, size=(100, 70), seed=2)
    out = str(tmp_path_factory.mktemp("cache"))
    build_cache(out, "trainval", [{"kind": "voc", "root": root,
                                   "image_set": "trainval"}])
    return out


def test_native_matches_python_loader(voc_cache):
    cache = load_cache(voc_cache, "trainval")
    kw = dict(batch_size=4, canvas_dim=64, max_boxes=6, num_threads=2, seed=0)
    nat = Loader(cache, LoaderConfig(use_native=True, **kw))
    py = Loader(cache, LoaderConfig(use_native=False, **kw))
    assert nat._native is not None
    assert py._native is None
    for (ni, nb, nc, nv), (pi, pb, pc, pv) in zip(nat.epoch(0), py.epoch(0)):
        # boxes/classes/valid are transform-derived: must be identical
        np.testing.assert_allclose(nb, pb, atol=1e-6)
        np.testing.assert_array_equal(nc, pc)
        np.testing.assert_array_equal(nv, pv)
        # pixels: cv2 INTER_LINEAR is fixed-point; allow small tolerance
        assert ni.shape == pi.shape == (4, 64, 64, 3)
        diff = np.abs(ni - pi)
        assert float(diff.mean()) < 0.01, float(diff.mean())
        assert float(diff.max()) < 0.05, float(diff.max())


def test_native_single_image(voc_cache):
    cache = load_cache(voc_cache, "trainval")
    path = str(cache.paths[0])
    out = native.load_one(path, 96)
    assert out is not None
    img, (sx, sy, px, py) = out
    assert img.shape == (96, 96, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0
    # 100x70 wide image: full width, padded height
    assert abs(sx - 1.0) < 0.05 and 0.6 < sy < 0.8
    # gray top bar
    assert abs(float(img[0, 0, 0]) - 0.5) < 1e-6


def test_native_bad_file_falls_back(voc_cache, tmp_path):
    # corrupt file: status != 0 -> python fallback fills the slot
    cache = load_cache(voc_cache, "trainval")
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg")
    assert native.load_one(str(bad), 64) is None
    pool = native.NativeDecodePool(2)
    imgs, tr, status = pool.load_batch([str(bad), str(cache.paths[0])], 64)
    assert status[0] != 0 and status[1] == 0
    # failed slot is gray-filled with identity transform
    assert abs(float(imgs[0].mean()) - 0.5) < 1e-6
    np.testing.assert_allclose(tr[0], [1, 1, 0, 0])
    pool.close()
