"""Hardware-gated test tier (VERDICT r2 weak #3): interpret-mode Pallas
passes and CPU-mesh numerics do NOT prove Mosaic lowering or bf16 behavior
on the chip. This tier makes hardware correctness a *test* instead of a
bench side-effect (bench.py's embedded oracle remains as belt-and-braces).

Run:  YOLOJAX_TPU_TESTS=1 python -m pytest tests -m tpu
(first jit compile over the axon tunnel is minutes; see the verify skill).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip(f"needs a TPU backend, got {jax.default_backend()}")
    return jax


def test_pallas_nms_matches_lax_oracle_on_hardware(tpu_backend):
    """Mosaic-lowered NMS kernel == lax reference on random boxes (same
    check bench.py runs before every recorded number, bench.py:307)."""
    import jax.numpy as jnp

    from yolojax.postprocess.nms import batched_nms

    rng = np.random.RandomState(0)
    xy = rng.uniform(0, 1, (4, 256, 2))
    wh = rng.uniform(0.02, 0.4, (4, 256, 2))
    boxes = jnp.asarray(
        np.concatenate([xy - wh / 2, xy + wh / 2], -1).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(4, 256)) > 0.2)
    want = np.asarray(batched_nms(boxes, valid, 0.45, use_pallas="never"))
    got = np.asarray(batched_nms(boxes, valid, 0.45, use_pallas="always"))
    np.testing.assert_array_equal(got, want)


def test_bf16_full_model_sane_and_fold_parity(tpu_backend):
    """bf16 serving forward on the chip: finite head, and BN folding
    (the serving-path transform) stays within bf16 tolerance of the
    unfolded eval-mode forward."""
    jax = tpu_backend
    import jax.numpy as jnp

    from yolojax.convert.fold import fold_bn
    from yolojax.models import get_model

    model = get_model("yolo2", "tiny", num_classes=20)
    params, state = model.init(jax.random.PRNGKey(0), 416)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 416, 416, 3),
                           jnp.float32)
    head, _ = jax.jit(
        lambda p, s, v: model.apply(p, s, v, compute_dtype=jnp.bfloat16)
    )(params, state, x)
    head = np.asarray(head, np.float32)
    assert np.isfinite(head).all()
    assert head.std() > 0

    fmodel, fparams, fstate = fold_bn(model, params, state)
    fhead, _ = jax.jit(
        lambda p, s, v: fmodel.apply(p, s, v, compute_dtype=jnp.bfloat16)
    )(fparams, fstate, x)
    fhead = np.asarray(fhead, np.float32)
    # bf16 has ~3 decimal digits; folded conv reassociates the epilogue
    denom = np.abs(head).mean() + 1e-6
    rel = np.abs(fhead - head).mean() / denom
    assert rel < 0.1, rel


def test_dp_eval_equality_on_local_mesh(tpu_backend):
    """DP eval over the local chips == single-device eval. Skipped on a
    1-chip host (the axon sandbox) — runs for real on any multi-chip pod."""
    jax = tpu_backend
    if len(jax.local_devices()) < 2:
        pytest.skip("single local TPU chip: DP equality needs >= 2")
    import cv2
    import jax.numpy as jnp

    from yolojax.data.cache import DatasetCache
    from yolojax.eval.evaluator import evaluate_model
    from yolojax.models import get_model

    model = get_model("yolo2", "tiny", num_classes=20)
    params, state = model.init(jax.random.PRNGKey(0), 64)
    rng = np.random.RandomState(2)
    tmp = "/tmp/yolojax_tpu_dp_eval"
    os.makedirs(tmp, exist_ok=True)
    paths = []
    for i in range(8):
        p = os.path.join(tmp, f"{i:03d}.png")
        cv2.imwrite(p, rng.randint(0, 255, (64, 64, 3), np.uint8))
        paths.append(p)
    cache = DatasetCache(
        paths=np.asarray(paths),
        sizes=np.tile([[64, 64]], (8, 1)),
        offsets=np.arange(9, dtype=np.int64),
        boxes=np.tile([[0.5, 0.5, 0.4, 0.4]], (8, 1)).astype(np.float32),
        classes=np.zeros(8, np.int32),
        names=("aeroplane",),
    )
    kw = dict(input_dim=64, batch_size=3, nms_iou=0.45, top_k=64,
              compute_dtype=jnp.bfloat16)
    dp = evaluate_model(model, params, state, cache, data_parallel=True, **kw)
    single = evaluate_model(model, params, state, cache,
                            data_parallel=False, **kw)
    assert dp["num_detections"] == single["num_detections"]
    np.testing.assert_allclose(dp["map"], single["map"], atol=1e-6)


def test_detect_cli_on_chip(tpu_backend, tmp_path, monkeypatch):
    """One real detect CLI drive on the chip: weights -> fold -> bf16
    forward -> on-device Pallas NMS -> un-letterboxed boxes."""
    import cv2

    from tests.util import run_cli
    from yolojax.convert.store import save_params_npz
    from yolojax.models import get_model

    jax = tpu_backend
    # anchors must match the INI below: the head conv's channel count is
    # len(anchors) * (5 + classes)
    model = get_model("yolo2", "tiny", num_classes=20,
                      anchors=((1.08, 1.19), (3.42, 4.41)))
    params, state = model.init(jax.random.PRNGKey(0), 64)
    weights = str(tmp_path / "w.npz")
    save_params_npz(weights, params, state)
    img = str(tmp_path / "in.jpg")
    cv2.imwrite(img, np.random.RandomState(0).randint(
        0, 255, (90, 120, 3), np.uint8))
    ini = tmp_path / "t.ini"
    ini.write_text(f"""
[model]
model = yolo2
inference = tiny
dim = 64
names_file = {REPO}/config/names/voc.txt
anchors = 1.08,1.19 3.42,4.41
[detect]
threshold = 0.0001
top_k = 64
use_pallas = always
""")
    out = str(tmp_path / "out.png")
    run_cli("cli.detect", ["-c", str(ini), "--weights", weights,
                           "--image", img, "--out", out], monkeypatch)
    assert os.path.exists(out)


def test_artifact_roundtrip_on_chip(tpu_backend, tmp_path, monkeypatch,
                                    capsys):
    """AOT artifact on hardware: the baked StableHLO graph (incl. the
    Mosaic-lowered Pallas NMS) must deserialize, execute on the chip, and
    reproduce the live --weights detections exactly. Serialization
    surviving interpret mode does not prove Mosaic custom-calls do."""
    import cv2

    from tests.util import run_cli
    from yolojax.convert.store import save_params_npz
    from yolojax.models import get_model

    jax = tpu_backend
    model = get_model("yolo2", "tiny", num_classes=20,
                      anchors=((1.08, 1.19), (3.42, 4.41)))
    params, state = model.init(jax.random.PRNGKey(2), 64)
    weights = str(tmp_path / "w.npz")
    save_params_npz(weights, params, state)
    img = str(tmp_path / "in.jpg")
    cv2.imwrite(img, np.random.RandomState(3).randint(
        0, 255, (90, 120, 3), np.uint8))
    ini = tmp_path / "t.ini"
    ini.write_text(f"""
[model]
model = yolo2
inference = tiny
dim = 64
names_file = {REPO}/config/names/voc.txt
anchors = 1.08,1.19 3.42,4.41
[detect]
threshold = 0.0001
top_k = 64
use_pallas = always
""")
    art = str(tmp_path / "m.yjsa")
    run_cli("cli.export", ["-c", str(ini), "--weights", weights,
                           "--out", art, "--batch", "1"], monkeypatch)
    head = capsys.readouterr().out
    assert "platforms=tpu" in head, head

    import re

    def detect(extra):
        run_cli("cli.detect", ["-c", str(ini), *extra, "--image", img],
                monkeypatch)
        rows = []
        for line in capsys.readouterr().out.splitlines():
            m = re.match(r".*: (\w+) ([\d.]+) \[(-?\d+), (-?\d+), "
                         r"(-?\d+), (-?\d+)\]", line)
            if m:
                rows.append((m.group(1), float(m.group(2)),
                             *(int(g) for g in m.groups()[2:])))
        return sorted(rows)

    want = detect(["--weights", weights])
    got = detect(["--artifact", art])
    assert want and len(got) == len(want)
    # the deserialized program may recompile with different fusion
    # choices: same detections, but box rounding can move 1px at a
    # pixel boundary and scores an ULP at the printed 3rd decimal
    for w, g in zip(want, got):
        assert g[0] == w[0], (g, w)
        assert abs(g[1] - w[1]) <= 2e-3, (g, w)
        assert all(abs(a - b) <= 1 for a, b in zip(g[2:], w[2:])), (g, w)
