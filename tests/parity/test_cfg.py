"""Darknet .cfg parser parity: official cfg files must parse to exactly the
spec lists our registry hardcodes (yolo-voc / tiny-yolo-voc), making the
upstream cfg the verified source of truth for the architectures."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolojax.convert.cfg import model_from_cfg, parse_cfg_sections
from yolojax.models import get_model
from yolojax.nn.layers import RouteSpec

# Official pjreddie/darknet cfg content (architecture constants, same
# category as the anchor tables).
YOLO_VOC_CFG = """
[net]
batch=64
subdivisions=8
height=416
width=416
channels=3

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=64
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=128
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=64
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=128
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=256
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=128
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=256
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=512
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=256
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=512
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=256
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=512
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=1024
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=512
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=1024
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=512
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=1024
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
size=3
stride=1
pad=1
filters=1024
activation=leaky

[convolutional]
batch_normalize=1
size=3
stride=1
pad=1
filters=1024
activation=leaky

[route]
layers=-9

[convolutional]
batch_normalize=1
size=1
stride=1
pad=1
filters=64
activation=leaky

[reorg]
stride=2

[route]
layers=-1,-4

[convolutional]
batch_normalize=1
size=3
stride=1
pad=1
filters=1024
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=125
activation=linear

[region]
anchors = 1.3221, 1.73145, 3.19275, 4.00944, 5.05587, 8.09892, 9.47112, 4.84053, 11.2364, 10.0071
bias_match=1
classes=20
coords=4
num=5
softmax=1
jitter=.3
rescore=1
"""

TINY_YOLO_VOC_CFG = """
[net]
batch=64
height=416
width=416
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=64
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=128
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=256
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=512
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=1

[convolutional]
batch_normalize=1
filters=1024
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=1024
size=3
stride=1
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=125
activation=linear

[region]
anchors = 1.08,1.19,  3.42,4.41,  6.63,11.38,  9.42,5.11,  16.62,10.52
bias_match=1
classes=20
coords=4
num=5
softmax=1
jitter=.2
rescore=1
"""


def _abs_routes(specs):
    """Normalize RouteSpec refs to absolute indices for comparison."""
    out = []
    for i, s in enumerate(specs):
        if isinstance(s, RouteSpec):
            out.append(RouteSpec(tuple(r if r >= 0 else i + r
                                       for r in s.layers)))
        else:
            out.append(s)
    return tuple(out)


def test_yolo_voc_cfg_matches_registry(tmp_path):
    p = tmp_path / "yolo-voc.cfg"
    p.write_text(YOLO_VOC_CFG)
    m = model_from_cfg(str(p))
    ref = get_model("yolo2", "darknet", num_classes=20)
    assert _abs_routes(m.specs) == _abs_routes(ref.specs)
    assert m.anchors == ref.anchors
    assert m.num_classes == 20 and m.kind == "v2" and m.downsample == 32


def test_tiny_yolo_voc_cfg_matches_registry(tmp_path):
    p = tmp_path / "tiny.cfg"
    p.write_text(TINY_YOLO_VOC_CFG)
    m = model_from_cfg(str(p))
    ref = get_model("yolo2", "tiny", num_classes=20)
    assert _abs_routes(m.specs) == _abs_routes(ref.specs)
    assert m.anchors == ref.anchors
    assert m.downsample == 32


def test_cfg_model_runs_and_roundtrips_weights(tmp_path):
    """A cfg-parsed model initializes, runs, and roundtrips Darknet weights
    (the converter walks specs in order — cfg-built specs must line up)."""
    from yolojax.convert.darknet import (
        load_darknet_weights,
        save_darknet_weights,
    )

    p = tmp_path / "tiny.cfg"
    p.write_text(TINY_YOLO_VOC_CFG)
    m = model_from_cfg(str(p))
    params, state = m.init(jax.random.PRNGKey(0), 64)
    out, _ = m.apply(params, state, jnp.zeros((1, 64, 64, 3)),
                     compute_dtype=jnp.float32)
    assert out.shape == (1, 2, 2, 5, 25)

    wpath = str(tmp_path / "w.weights")
    save_darknet_weights(m, params, state, wpath, seen=1)
    p2, s2 = load_darknet_weights(m, wpath, input_dim=64)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cfg_parser_sections_and_errors(tmp_path):
    p = tmp_path / "bad.cfg"
    p.write_text("[net]\nheight=64\nwidth=64\n[local]\nsize=3\n")
    with pytest.raises(ValueError, match="local"):
        model_from_cfg(str(p))

    p2 = tmp_path / "nohead.cfg"
    p2.write_text("[net]\nheight=64\n[convolutional]\nfilters=8\nsize=3\n"
                  "pad=1\nactivation=leaky\n")
    with pytest.raises(ValueError, match="region"):
        model_from_cfg(str(p2))

    secs = parse_cfg_sections(str(p))
    assert [s[0] for s in secs] == ["net", "local"]

    # [region] num exceeding the anchors list: descriptive error, not
    # IndexError
    p3 = tmp_path / "shortanchors.cfg"
    p3.write_text("[net]\nheight=64\nwidth=64\n[convolutional]\nfilters=8\n"
                  "size=3\npad=1\nactivation=leaky\n[region]\nnum=5\n"
                  "classes=20\nanchors=1.0,1.0 2.0,2.0\n")
    with pytest.raises(ValueError, match="anchor"):
        model_from_cfg(str(p3))
