"""End-to-end CLI tests: cache -> train -> detect -> eval -> demo -> convert,
all through the real entry points (in-process, CPU backend, tiny dims)."""

import json
import os
import sys

import numpy as np
import pytest

from tests.util import run_cli, write_synthetic_voc

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("ws")
    voc = ws / "voc"
    write_synthetic_voc(str(voc), n_images=8, size=(96, 64))
    ini = ws / "test.ini"
    ini.write_text(f"""
[model]
model = yolo2
inference = tiny
dim = 64
names_file = {REPO}/config/names/voc.txt
anchors = 1.08,1.19 3.42,4.41

[cache]
basedir = {ws}/cache
train = voc:{voc}:trainval
test = voc:{voc}:test

[queue]
batch_size = 8
canvas_dim = 64
max_boxes = 8
num_threads = 2

[train]
logdir = {ws}/logdir
steps = 3
save_steps = 2
summary_steps = 1
compute_dtype = float32
optimizer = sgd
learning_rate = 1e-4
weight_decay = 0

[detect]
threshold = 0.05
top_k = 128
use_pallas = never

[eval]
batch_size = 4
""")
    return ws


_run = run_cli



def _ensure_prereqs(workspace, monkeypatch):
    """Build cache + checkpoint when running a subset via -k."""
    if not os.path.exists(workspace / "cache" / "train.npz"):
        _run("cli.cache", ["-c", str(workspace / "test.ini")], monkeypatch)
    if not (workspace / "logdir" / "yolo2_tiny" / "ckpt").is_dir():
        _run("cli.train", ["-c", str(workspace / "test.ini")], monkeypatch)


def test_01_cache(workspace, monkeypatch, capsys):
    _run("cli.cache", ["-c", str(workspace / "test.ini")], monkeypatch)
    out = capsys.readouterr().out
    assert "train: 8 images" in out
    assert os.path.exists(workspace / "cache" / "train.npz")
    assert os.path.exists(workspace / "cache" / "test.npz")


def test_02_train(workspace, monkeypatch):
    _run("cli.train", ["-c", str(workspace / "test.ini")], monkeypatch)
    logdir = workspace / "logdir" / "yolo2_tiny"
    assert (logdir / "ckpt").is_dir()
    metrics = [json.loads(l) for l in open(logdir / "metrics.jsonl")]
    assert len(metrics) >= 3
    assert np.isfinite(metrics[-1]["total"])


def test_03_train_resumes(workspace, monkeypatch):
    # bump steps to 5: must resume from step 3, not restart
    _run("cli.train", ["-c", str(workspace / "test.ini"), "train.steps=5"],
         monkeypatch)
    logdir = workspace / "logdir" / "yolo2_tiny"
    metrics = [json.loads(l) for l in open(logdir / "metrics.jsonl")]
    steps = [m["step"] for m in metrics]
    assert max(steps) == 5
    # resumed run logged steps 4,5 only (3 already done)
    assert steps.count(4) == 1


def test_04_detect(workspace, monkeypatch, capsys):
    _ensure_prereqs(workspace, monkeypatch)
    img = str(workspace / "voc" / "JPEGImages" / "000000.jpg")
    out_img = str(workspace / "det.png")
    _run("cli.detect", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--image", img, "--out", out_img,
        "detect.threshold=0.0001",
    ], monkeypatch)
    assert os.path.exists(out_img)


def test_05_eval(workspace, monkeypatch, capsys):
    _ensure_prereqs(workspace, monkeypatch)
    _run("cli.eval", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--phase", "test",
    ], monkeypatch)
    out = capsys.readouterr().out
    assert "mAP@0.5" in out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["num_images"] == 8
    assert 0.0 <= rec["map"] <= 1.0

    # the run above auto-data-parallels over the 8-device mesh; forcing it
    # off through the INI knob must reproduce the same metrics exactly
    _run("cli.eval", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--phase", "test", "eval.data_parallel=off",
    ], monkeypatch)
    rec_sd = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rec_sd) == set(rec)
    assert rec_sd["num_detections"] == rec["num_detections"]
    for k in rec:  # per-shard programs may differ at ULP level
        np.testing.assert_allclose(rec_sd[k], rec[k], atol=1e-6, err_msg=k)

    # --dump: COCO-format GT + results JSON for external pycocotools
    # re-scoring; counts and pixel coordinates must match the metrics
    dump = str(workspace / "eval_dump.json")
    _run("cli.eval", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--phase", "test", "--dump", dump,
    ], monkeypatch)
    capsys.readouterr()
    blob = json.load(open(dump))
    assert len(blob["gt"]["images"]) == rec["num_images"]
    assert len(blob["detections"]) == rec["num_detections"]
    assert blob["gt"]["categories"][0] == {"id": 1, "name": "aeroplane"}
    dim = 64  # canvas dim from the workspace INI
    for ann in blob["gt"]["annotations"]:
        x, y, w, h = ann["bbox"]
        assert 0 <= x <= dim and 0 <= y <= dim and w > 0 and h > 0
        assert ann["area"] == pytest.approx(w * h)
        assert ann["category_id"] >= 1
    for det in blob["detections"]:
        assert det["score"] > 0 and len(det["bbox"]) == 4


def test_06_demo_augmentation(workspace, monkeypatch, capsys):
    _ensure_prereqs(workspace, monkeypatch)
    out_png = str(workspace / "aug.png")
    _run("cli.demo_data_augmentation", [
        "-c", str(workspace / "test.ini"), "--out", out_png,
        "--rows", "2", "--cols", "2",
    ], monkeypatch)
    assert os.path.exists(out_png)


def test_07_convert_roundtrip_cli(workspace, monkeypatch, capsys):
    # export random-init weights to darknet format, convert back via CLI
    import jax

    from yolojax.config import load_config
    from yolojax.convert.darknet import save_darknet_weights
    from yolojax.convert.store import load_params_npz

    cfg = load_config([str(workspace / "test.ini")])
    model = cfg.build_model()
    params, state = model.init(jax.random.PRNGKey(0), 64)
    wpath = str(workspace / "model.weights")
    save_darknet_weights(model, params, state, wpath)

    npz = str(workspace / "model.npz")
    _run("cli.parse_darknet", [
        "-c", str(workspace / "test.ini"), wpath, "-o", npz,
    ], monkeypatch)
    out = capsys.readouterr().out
    assert "converted" in out
    p2, s2 = load_params_npz(npz)
    np.testing.assert_array_equal(
        np.asarray(params["conv_0"]["w"]), p2["conv_0"]["w"])

    # detect must accept raw .weights directly too
    img = str(workspace / "voc" / "JPEGImages" / "000001.jpg")
    _run("cli.detect", [
        "-c", str(workspace / "test.ini"), "--weights", wpath,
        "--image", img,
    ], monkeypatch)


def test_08_train_multiscale(workspace, monkeypatch, tmp_path):
    """Multi-scale schedule: bucketed jit variants compile and interleave."""
    _ensure_prereqs(workspace, monkeypatch)
    _run("cli.train", [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/mslog",
        "train.steps=4",
        "train.multi_scale=1",
        "train.multi_scale_min=32",
        "train.multi_scale_max=64",
        "train.multi_scale_every=1",
    ], monkeypatch)
    metrics = [json.loads(l)
               for l in open(tmp_path / "mslog" / "yolo2_tiny" / "metrics.jsonl")]
    dims = {m["dim"] for m in metrics}
    assert dims <= {32, 64} and len(dims) == 2, dims


def test_09_detect_camera_video_headless(workspace, monkeypatch, tmp_path):
    _ensure_prereqs(workspace, monkeypatch)
    """Camera CLI in headless mode over a synthetic video file."""
    import cv2

    video = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 5, (96, 64))
    rng = np.random.RandomState(0)
    for _ in range(4):
        w.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    w.release()

    out_dir = str(tmp_path / "frames")
    _run("cli.detect_camera", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--video", video, "--out-dir", out_dir, "--max-frames", "3",
    ], monkeypatch)
    frames = sorted(os.listdir(out_dir))
    assert len(frames) == 3 and frames[0] == "frame_000001.png"


def test_10_transfer_learning_init(workspace, monkeypatch, tmp_path):
    """--init-weights with --transfer re-inits the head for a new class count."""
    import jax

    from yolojax.config import load_config
    from yolojax.convert.store import save_params_npz

    cfg = load_config([str(workspace / "test.ini")])
    model = cfg.build_model()
    params, state = model.init(jax.random.PRNGKey(7), 64)
    npz = str(tmp_path / "pre.npz")
    save_params_npz(npz, params, state)

    head = f"conv_{len(model.specs) - 1}"
    _run("cli.train", [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/tl",
        "train.steps=2",
        "--init-weights", npz,
        "--transfer", head,
    ], monkeypatch)
    metrics = [json.loads(l)
               for l in open(tmp_path / "tl" / "yolo2_tiny" / "metrics.jsonl")]
    assert np.isfinite(metrics[-1]["total"])


def test_11_profile_trace(workspace, monkeypatch, tmp_path):
    """jax.profiler trace capture at a configured step."""
    _ensure_prereqs(workspace, monkeypatch)
    _run("cli.train", [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/prof",
        "train.steps=3",
        "train.profile_steps=1",
        "train.image_summary_steps=2",
    ], monkeypatch)
    logdir = tmp_path / "prof" / "yolo2_tiny"
    assert (logdir / "profile").is_dir()
    # image summary written
    assert any(f.startswith("sample_") for f in os.listdir(logdir))


def test_12_detect_batched_multi_image(workspace, monkeypatch, capsys):
    _ensure_prereqs(workspace, monkeypatch)
    imgs = []
    for i in range(3):
        imgs += ["--image",
                 str(workspace / "voc" / "JPEGImages" / f"{i:06d}.jpg")]
    out_dir = str(workspace / "multi_out")
    os.makedirs(out_dir, exist_ok=True)
    _run("cli.detect", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        *imgs, "--out", out_dir,
        "detect.threshold=0.0001",
    ], monkeypatch)
    outs = os.listdir(out_dir)
    assert len(outs) == 3, outs


def test_13_malformed_override_rejected(workspace, monkeypatch):
    with pytest.raises(ValueError, match="malformed override"):
        _run("cli.cache", ["-c", str(workspace / "test.ini"), "justgarbage=1"],
             monkeypatch)


def test_14_detect_and_eval_int8(workspace, monkeypatch, capsys):
    """int8 PTQ path through detect + eval CLIs."""
    _ensure_prereqs(workspace, monkeypatch)
    img = str(workspace / "voc" / "JPEGImages" / "000002.jpg")
    _run("cli.detect", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--image", img,
        "detect.use_int8=1", "detect.threshold=0.0001",
    ], monkeypatch)
    _run("cli.eval", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--phase", "test", "detect.use_int8=1",
    ], monkeypatch)
    out = capsys.readouterr().out
    assert "mAP@0.5" in out


def test_15_yolov1_tiny_train_detect(workspace, monkeypatch, tmp_path):
    """YOLOv1 family end-to-end: FC-head train step + v1 detect path."""
    ini = tmp_path / "v1.ini"
    base = (workspace / "test.ini").read_text()
    base = base.replace("model = yolo2", "model = yolo")
    base = base.replace("inference = tiny", "inference = tiny")
    base = base.replace("dim = 64", "dim = 448")
    base = base.replace("canvas_dim = 64", "canvas_dim = 448")
    base = base.replace("batch_size = 8", "batch_size = 2")
    base = base.replace("steps = 3", "steps = 2\nmesh_data = 1")
    base = base.replace(f"logdir = {workspace}/logdir",
                        f"logdir = {tmp_path}/v1log")
    ini.write_text(base)
    if not os.path.exists(workspace / "cache" / "train.npz"):
        _run("cli.cache", ["-c", str(ini)], monkeypatch)
    _run("cli.train", ["-c", str(ini)], monkeypatch)
    logdir = tmp_path / "v1log" / "yolo_tiny"
    metrics = [json.loads(l) for l in open(logdir / "metrics.jsonl")]
    assert np.isfinite(metrics[-1]["total"])
    img = str(workspace / "voc" / "JPEGImages" / "000003.jpg")
    _run("cli.detect", [
        "-c", str(ini), "--weights", str(logdir),
        "--image", img, "detect.threshold=0.000001", "detect.top_k=128",
    ], monkeypatch)


def test_16_in_training_eval(workspace, monkeypatch, tmp_path):
    """Periodic val-phase mAP during training (train.eval_steps)."""
    _run("cli.cache", [
        "-c", str(workspace / "test.ini"),
        f"cache.val=voc:{workspace / 'voc'}:test",
    ], monkeypatch)
    _run("cli.train", [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/evlog",
        "train.steps=2",
        "train.eval_steps=2",
    ], monkeypatch)
    metrics = [json.loads(l)
               for l in open(tmp_path / "evlog" / "yolo2_tiny" / "metrics.jsonl")]
    val_recs = [m for m in metrics if "val_map" in m]
    assert len(val_recs) == 1
    assert 0.0 <= val_recs[0]["val_map"] <= 1.0


def test_17_train_with_grain_loader(workspace, monkeypatch, tmp_path):
    """[queue] loader = grain drives the same training loop (SURVEY §2's
    named Grain input pipeline as a first-class alternative)."""
    _ensure_prereqs(workspace, monkeypatch)
    _run("cli.train", [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/grainlog",
        "train.steps=2",
        "queue.loader=grain",
    ], monkeypatch)
    metrics = [json.loads(l)
               for l in open(tmp_path / "grainlog" / "yolo2_tiny" / "metrics.jsonl")]
    assert len(metrics) == 2 and np.isfinite(metrics[-1]["total"])
    # grain iterator state saved next to the checkpoint (mid-epoch resume)
    state_dir = tmp_path / "grainlog" / "yolo2_tiny" / "loader_state"
    assert (state_dir / "2.p0.bin").exists()  # per-process state files
    # resume restores the stream state and continues (step 3 logged once)
    _run("cli.train", [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/grainlog",
        "train.steps=3",
        "queue.loader=grain",
    ], monkeypatch)
    metrics = [json.loads(l)
               for l in open(tmp_path / "grainlog" / "yolo2_tiny" / "metrics.jsonl")]
    steps = [m["step"] for m in metrics]
    assert steps.count(3) == 1 and steps.count(2) == 1
    # legacy pre-suffix layout (<step>.bin from older runs): the primary
    # must fall back to it on restore, and prune it after the next save
    (state_dir / "3.p0.bin").rename(state_dir / "3.bin")
    _run("cli.train", [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/grainlog",
        "train.steps=4",
        "queue.loader=grain",
    ], monkeypatch)
    metrics = [json.loads(l)
               for l in open(tmp_path / "grainlog" / "yolo2_tiny" / "metrics.jsonl")]
    steps = [m["step"] for m in metrics]
    assert steps.count(4) == 1 and steps.count(3) == 1
    assert (state_dir / "4.p0.bin").exists()
    assert not (state_dir / "3.bin").exists()  # legacy file pruned


def test_18_train_tensor_parallel_cli(workspace, monkeypatch, tmp_path):
    """train.mesh_model=2: the 1024-channel tiny-v2 convs are TP-sharded
    over the "model" axis at the CLI surface (4x2 mesh), the checkpoint
    round-trips through the replicated gather, and a resumed run picks up
    TP-sharded from the saved state."""
    _ensure_prereqs(workspace, monkeypatch)
    _run("cli.train", [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/tplog",
        "train.steps=2", "train.save_steps=2",
        "train.mesh_model=2", "train.histogram_steps=2",
    ], monkeypatch)
    logdir = tmp_path / "tplog" / "yolo2_tiny"
    metrics = [json.loads(l) for l in open(logdir / "metrics.jsonl")]
    scalar = [m for m in metrics if "total" in m]
    assert len(scalar) == 2 and np.isfinite(scalar[-1]["total"])
    # histograms of the TP-sharded params go through the replicated gather
    assert any(any(k.startswith("hist/") for k in m) for m in metrics)
    assert (logdir / "ckpt").is_dir()
    # resume with the same TP mesh
    _run("cli.train", [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/tplog",
        "train.steps=3", "train.save_steps=2",
        "train.mesh_model=2",
    ], monkeypatch)
    metrics = [json.loads(l) for l in open(logdir / "metrics.jsonl")]
    steps = [m["step"] for m in metrics]
    assert max(steps) == 3 and steps.count(3) == 1


def test_19_summary_section_dialect(tmp_path):
    """[summary] (reference dialect) aliases onto the train summary knobs;
    explicit [train] keys and CLI overrides win."""
    from yolojax.config import load_config

    ini = tmp_path / "s.ini"
    ini.write_text("""
[summary]
scalar = 7
histogram = 50
image = 25
""")
    cfg = load_config([str(ini)])
    assert cfg.train.summary_steps == 7
    assert cfg.train.histogram_steps == 50
    assert cfg.train.image_summary_steps == 25
    # CLI override through the alias beats the file section
    cfg = load_config([str(ini)], overrides=["summary.scalar=3"])
    assert cfg.train.summary_steps == 3
    # explicit [train] key beats [summary]
    ini2 = tmp_path / "s2.ini"
    ini2.write_text("[train]\nsummary_steps = 11\n[summary]\nscalar = 7\n")
    cfg = load_config([str(ini2)])
    assert cfg.train.summary_steps == 11


def test_20_profiler_server_flag(workspace, monkeypatch, tmp_path):
    """train.profile_port serves live jax.profiler captures for the run's
    duration and shuts down cleanly (no port/thread leak across runs)."""
    import socket

    _ensure_prereqs(workspace, monkeypatch)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    for _ in range(2):  # second run re-binds the same port: stop worked
        _run("cli.train", [
            "-c", str(workspace / "test.ini"),
            f"train.logdir={tmp_path}/proflog",
            "train.steps=2", f"train.profile_port={port}",
        ], monkeypatch)
    metrics = [json.loads(l)
               for l in open(tmp_path / "proflog" / "yolo2_tiny" / "metrics.jsonl")]
    assert np.isfinite(metrics[-1]["total"])


def test_21_detect_stdin_stream(workspace, monkeypatch, capsys, tmp_path):
    """Streaming serve mode: weights load + compile once, then one image
    per stdin line; blank-line-terminated blocks; annotated PNGs."""
    import io

    _ensure_prereqs(workspace, monkeypatch)
    imgs = [str(workspace / "voc" / "JPEGImages" / f"{i:06d}.jpg")
            for i in range(3)]
    monkeypatch.setattr(sys, "stdin",
                        io.StringIO("\n".join(imgs + ["/nope/missing.jpg"])))
    out_dir = str(tmp_path / "stream")
    _run("cli.detect", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--stdin", "--out", out_dir,
        "detect.threshold=0.0001",
    ], monkeypatch)
    out = capsys.readouterr().out
    blocks = [b for b in out.split("\n\n")]
    # one block per input line (3 images + 1 unreadable), possibly a tail
    assert out.count("\n\n") == 4, out[-500:]
    assert "missing.jpg: ERROR unreadable" in out
    assert "000000.jpg: " in out
    import os as _os
    assert len(_os.listdir(out_dir)) == 3  # annotated PNGs for real images


def test_30_stream_int8_response_order(workspace, monkeypatch, capsys):
    """While int8 calibration buffers the first calib_images readable
    frames, unreadable-path ERROR blocks must queue behind them so the
    Nth response block always answers the Nth request (the machine-
    parseable pairing run_stream documents)."""
    import io

    _ensure_prereqs(workspace, monkeypatch)
    good = [str(workspace / "voc" / "JPEGImages" / f"{i:06d}.jpg")
            for i in range(2)]
    # unreadable path arrives between the two calibration frames
    monkeypatch.setattr(sys, "stdin", io.StringIO(
        "\n".join([good[0], "/nope/missing.jpg", good[1]])))
    _run("cli.detect", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--stdin",
        "detect.threshold=0.0001", "detect.use_int8=1",
        "detect.calib_images=2",
    ], monkeypatch)
    out = capsys.readouterr().out
    assert out.count("\n\n") == 3, out[-500:]  # one block per input line
    i0 = out.index("000000.jpg: ")
    ierr = out.index("missing.jpg: ERROR unreadable")
    i1 = out.index("000001.jpg: ")
    assert i0 < ierr < i1, out[-500:]


def test_22_multiscale_with_tensor_parallel(workspace, monkeypatch, tmp_path):
    """Multi-scale bucketed jit variants must each re-propagate the TP
    shardings (4x2 mesh) — gates the bucket-cache x GSPMD interaction."""
    _ensure_prereqs(workspace, monkeypatch)
    _run("cli.train", [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/mstp",
        "train.steps=4",
        "train.mesh_model=2",
        "train.multi_scale=1",
        "train.multi_scale_min=32",
        "train.multi_scale_max=64",
        "train.multi_scale_every=1",
    ], monkeypatch)
    metrics = [json.loads(l)
               for l in open(tmp_path / "mstp" / "yolo2_tiny" / "metrics.jsonl")]
    dims = {m["dim"] for m in metrics}
    assert dims == {32, 64}, dims
    assert all(np.isfinite(m["total"]) for m in metrics)


def test_23_halt_on_nonfinite_loss(workspace, monkeypatch, tmp_path):
    """Divergence guard: an exploding LR must halt with exit code 3 and a
    forensic checkpoint instead of training on garbage."""
    _ensure_prereqs(workspace, monkeypatch)
    with pytest.raises(SystemExit) as e:
        _run("cli.train", [
            "-c", str(workspace / "test.ini"),
            f"train.logdir={tmp_path}/divlog",
            "train.steps=10", "train.learning_rate=1e12",
        ], monkeypatch)
    assert e.value.code == 3
    # forensic save goes to its own dir; the restart chain stays clean
    div = tmp_path / "divlog" / "yolo2_tiny" / "diverged"
    assert div.is_dir() and any(div.iterdir())


def test_24_detect_camera_int8(workspace, monkeypatch, tmp_path):
    """Camera path rides the same serving stack as detect: int8 trunk,
    calibrated on the first frame."""
    import cv2

    _ensure_prereqs(workspace, monkeypatch)
    video = str(tmp_path / "clip8.avi")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 5, (96, 64))
    rng = np.random.RandomState(1)
    for _ in range(3):
        w.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    w.release()
    out_dir = str(tmp_path / "frames8")
    _run("cli.detect_camera", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--video", video, "--out-dir", out_dir, "--max-frames", "2",
        "detect.use_int8=1",
    ], monkeypatch)
    assert len(os.listdir(out_dir)) == 2


def test_25_compile_cache_knob(workspace, monkeypatch, tmp_path, capsys):
    """model.compile_cache points jax's persistent jit cache at a dir; a
    CLI run populates it (CLI restarts then skip recompiles)."""
    import jax

    _ensure_prereqs(workspace, monkeypatch)
    cache_dir = str(tmp_path / "jitcache")
    img = str(workspace / "voc" / "JPEGImages" / "000002.jpg")
    try:
        # distinct dim/top_k -> a graph no earlier in-process test compiled,
        # so a fresh compilation (and a cache write) must happen even when
        # the suite already jitted the default detect graph (tiny-v2 is
        # fully convolutional: the dim-64 checkpoint loads at dim 96)
        _run("cli.detect", [
            "-c", str(workspace / "test.ini"),
            "--weights", str(workspace / "logdir" / "yolo2_tiny"),
            "--image", img, f"model.compile_cache={cache_dir}",
            "model.dim=96", "detect.top_k=32",
        ], monkeypatch)
        assert os.path.isdir(cache_dir) and os.listdir(cache_dir)
    finally:  # don't leak the cache config into other tests
        jax.config.update("jax_compilation_cache_dir", None)


def test_26_keep_checkpoints_knob(workspace, monkeypatch, tmp_path):
    """train.keep_checkpoints = tf.train.Saver max_to_keep equivalent."""
    _ensure_prereqs(workspace, monkeypatch)
    _run("cli.train", [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/keeplog",
        "train.steps=3", "train.save_steps=1",
        "train.keep_checkpoints=1",
    ], monkeypatch)
    ckpt_dir = tmp_path / "keeplog" / "yolo2_tiny" / "ckpt"
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert steps == ["3"], steps


def test_27_export_artifact_and_serve(workspace, monkeypatch, capsys,
                                      tmp_path):
    """AOT serving artifact (cli/export.py): detections served from the
    baked StableHLO graph must match the --weights path exactly, for both
    the batched detect and --stdin stream surfaces."""
    _ensure_prereqs(workspace, monkeypatch)
    imgs = [str(workspace / "voc" / "JPEGImages" / f"00000{i}.jpg")
            for i in range(2)]
    art = str(tmp_path / "model.yjsa")
    # thresholds are BAKED into the exported graph: pass the same override
    # the --weights comparison run uses
    _run("cli.export", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--out", art, "--batch", "1", "detect.threshold=0.0001",
    ], monkeypatch)
    head = capsys.readouterr().out.strip().splitlines()[-1]
    assert "platforms=cpu" in head and "batch=1" in head
    assert os.path.getsize(art) > 1e6  # weights are baked in

    def detect(extra):
        _run("cli.detect", [
            "-c", str(workspace / "test.ini"), *extra,
            "--image", imgs[0], "--image", imgs[1],
            "detect.threshold=0.0001", "eval.batch_size=1",
        ], monkeypatch)
        return sorted(l for l in capsys.readouterr().out.splitlines()
                      if ": " in l)

    want = detect(["--weights", str(workspace / "logdir" / "yolo2_tiny")])
    got = detect(["--artifact", art])
    assert want and got == want

    # stream surface from the artifact (no [model]/weights needed)
    import io

    from cli.detect import load_artifact_detector, run_stream
    from yolojax.config import YoloJaxConfig

    detector, meta = load_artifact_detector(art)
    assert meta["names"][0] == "aeroplane" and meta["batch"] == 1
    n = run_stream(YoloJaxConfig(), "", lines=io.StringIO(imgs[0] + "\n"),
                   detector=detector)
    assert n == 1
    stream_out = [l for l in capsys.readouterr().out.splitlines()
                  if ": " in l]
    assert stream_out  # same graph, same detections on image 0
    assert set(stream_out) <= set(want)

    # error path: bad magic (wrong --stdin batch is pinned by test_33,
    # which has a batch-4 artifact in hand)
    bad = tmp_path / "bad.yjsa"
    bad.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="bad magic"):
        load_artifact_detector(str(bad))


def test_29_export_int8_artifact(workspace, monkeypatch, capsys, tmp_path):
    """int8 AOT artifact: the quantized trunk (fold + PTQ scales) bakes
    into StableHLO and serves identically to the live int8 --weights path
    when calibrated on the same images; export refuses synthetic calib."""
    _ensure_prereqs(workspace, monkeypatch)
    imgs = [str(workspace / "voc" / "JPEGImages" / f"00000{i}.jpg")
            for i in range(2)]
    art = str(tmp_path / "int8.yjsa")

    # guard: int8 export without calibration data must refuse
    with pytest.raises(SystemExit):
        _run("cli.export", [
            "-c", str(workspace / "test.ini"),
            "--weights", str(workspace / "logdir" / "yolo2_tiny"),
            "--out", art, "detect.use_int8=1",
        ], monkeypatch)
    capsys.readouterr()

    _run("cli.export", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--out", art, "--batch", "1",
        "--calib-image", imgs[0], "--calib-image", imgs[1],
        # overrides must stay contiguous: argparse matches the nargs='*'
        # positional once, at its first occurrence
        "detect.use_int8=1", "detect.threshold=0.0001",
        "detect.calib_images=2",
    ], monkeypatch)
    capsys.readouterr()

    from cli.detect import load_artifact_detector

    _, meta = load_artifact_detector(art)
    assert meta["int8"] is True

    def detect(flags, overrides=()):
        _run("cli.detect", [
            "-c", str(workspace / "test.ini"), *flags,
            "--image", imgs[0], "--image", imgs[1],
            "detect.threshold=0.0001", "eval.batch_size=1", *overrides,
        ], monkeypatch)
        return sorted(l for l in capsys.readouterr().out.splitlines()
                      if ": " in l)

    # live int8 path calibrates on its first calib_images inputs — the
    # same two images the artifact was calibrated on, so scales match
    want = detect(["--weights", str(workspace / "logdir" / "yolo2_tiny")],
                  ["detect.use_int8=1", "detect.calib_images=2"])
    got = detect(["--artifact", art])
    assert want and got == want


def test_28_detect_camera_from_artifact(workspace, monkeypatch, tmp_path,
                                        capsys):
    """Camera CLI serving from an AOT artifact (no weights / [model])."""
    _ensure_prereqs(workspace, monkeypatch)
    import cv2

    art = str(tmp_path / "cam.yjsa")
    _run("cli.export", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--out", art, "--batch", "1", "detect.threshold=0.0001",
    ], monkeypatch)
    capsys.readouterr()

    video = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 5, (96, 64))
    rng = np.random.RandomState(0)
    for _ in range(3):
        w.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    w.release()

    out_dir = str(tmp_path / "frames")
    _run("cli.detect_camera", [
        "-c", str(workspace / "test.ini"), "--artifact", art,
        "--video", video, "--out-dir", out_dir, "--max-frames", "2",
    ], monkeypatch)
    assert len(os.listdir(out_dir)) == 2


def test_31_export_savedmodel(workspace, monkeypatch, capsys, tmp_path):
    """TF SavedModel export (cli/export.py --format savedmodel): the
    jax2tf bridge serves the same detections under plain TF that the live
    --weights path produces (the reference's own deployment runtime)."""
    _ensure_prereqs(workspace, monkeypatch)
    pytest.importorskip("tensorflow")

    sm_dir = str(tmp_path / "savedmodel")
    _run("cli.export", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--out", sm_dir, "--format", "savedmodel", "--batch", "1",
        "detect.threshold=0.0001",
    ], monkeypatch)
    head = capsys.readouterr().out.strip().splitlines()[-1]
    assert "format=savedmodel" in head and "platforms=cpu" in head
    assert os.path.exists(os.path.join(sm_dir, "saved_model.pb"))

    from yolojax.serve.savedmodel import load_savedmodel

    meta, serve_fn = load_savedmodel(sm_dir)
    assert meta["names"][0] == "aeroplane" and meta["batch"] == 1

    # serve a real letterboxed workspace image and compare keeps against
    # the live portable build (identical graph up to TF-XLA float noise)
    import jax

    from cli.detect import _read_rgb, build_serving
    from yolojax.config import load_config
    from yolojax.data.augment import letterbox_host

    cfg = load_config([str(workspace / "test.ini")],
                      ["detect.threshold=0.0001"])
    img = str(workspace / "voc" / "JPEGImages" / "000000.jpg")
    canvas, _ = letterbox_host(_read_rgb(img), cfg.model.dim,
                               stretch=cfg.detect.stretch)
    x = np.stack([canvas])
    got = serve_fn(x)
    _, _, infer_fn, params, bn_state = build_serving(
        cfg, str(workspace / "logdir" / "yolo2_tiny"), portable=True)
    want = jax.device_get(infer_fn(params, bn_state, x))
    np.testing.assert_array_equal(got["keep"], np.asarray(want["keep"]))
    np.testing.assert_array_equal(got["classes"],
                                  np.asarray(want["classes"]))
    np.testing.assert_allclose(got["boxes"], np.asarray(want["boxes"]),
                               atol=1e-5, rtol=1e-4)


def test_33_eval_artifact(workspace, monkeypatch, capsys, tmp_path):
    """cli/eval.py --artifact: mAP-score an AOT serving artifact. The
    baked graph must reproduce the live --weights eval metrics exactly
    (same fold + infer graph, thresholds matching eval's score_thresh)."""
    _ensure_prereqs(workspace, monkeypatch)
    art = str(tmp_path / "eval_model.yjsa")
    # eval scores at score_thresh=0.005; bake the same threshold so the
    # artifact's graph and the live eval graph are the identical program
    _run("cli.export", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--out", art, "--batch", "4", "detect.threshold=0.005",
    ], monkeypatch)
    capsys.readouterr()

    def eval_json(extra):
        _run("cli.eval", [
            "-c", str(workspace / "test.ini"), "--phase", "test", *extra,
        ], monkeypatch)
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    want = eval_json(["--weights", str(workspace / "logdir" / "yolo2_tiny")])
    got = eval_json(["--artifact", art])
    assert got["num_images"] == want["num_images"]
    assert got["num_detections"] == want["num_detections"]
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-6, err_msg=k)

    # exactly one of --weights/--artifact
    with pytest.raises(SystemExit):
        _run("cli.eval", ["-c", str(workspace / "test.ini"),
                          "--weights", "w", "--artifact", art], monkeypatch)
    capsys.readouterr()

    # --stdin serving demands a batch-1 artifact: this batch-4 export must
    # be rejected with the re-export hint, not crash inside the jit call
    import io

    from cli.detect import load_artifact_detector, run_stream
    from yolojax.config import YoloJaxConfig

    detector, _meta = load_artifact_detector(art)
    with pytest.raises(SystemExit, match="re-export"):
        run_stream(YoloJaxConfig(), "", lines=io.StringIO(""),
                   detector=detector)
    capsys.readouterr()


def test_34_export_artifact_v1_family(workspace, monkeypatch, capsys,
                                      tmp_path):
    """AOT artifact export covers the YOLOv1 family too (FC head +
    postprocess_v1 in the baked graph): artifact detections must equal
    the live --weights path exactly on CPU."""
    import jax

    from yolojax.convert.store import save_params_npz
    from yolojax.models import get_model

    _ensure_prereqs(workspace, monkeypatch)
    model = get_model("yolo", "tiny", num_classes=20, grid=1,
                      boxes_per_cell=2)
    params, state = model.init(jax.random.PRNGKey(5), 64)
    weights = str(tmp_path / "v1.npz")
    save_params_npz(weights, params, state)
    ini = tmp_path / "v1art.ini"
    ini.write_text((workspace / "test.ini").read_text().replace(
        "model = yolo2\ninference = tiny",
        "model = yolo\ninference = tiny\ngrid = 1\nboxes_per_cell = 2"))
    art = str(tmp_path / "v1.yjsa")
    _run("cli.export", ["-c", str(ini), "--weights", weights,
                        "--out", art, "--batch", "1",
                        "detect.threshold=0.0001"], monkeypatch)
    capsys.readouterr()
    img = str(workspace / "voc" / "JPEGImages" / "000002.jpg")

    def detect(extra):
        _run("cli.detect", ["-c", str(ini), *extra, "--image", img,
                            "detect.threshold=0.0001"], monkeypatch)
        return sorted(l for l in capsys.readouterr().out.splitlines()
                      if ": " in l)

    want = detect(["--weights", weights])
    got = detect(["--artifact", art])
    assert want and got == want


def test_32_kmeans_anchors_cli(workspace, monkeypatch, capsys):
    """Anchor estimation CLI: prints an INI-ready anchors line computed
    from the cached phase (Darknet calc_anchors analogue)."""
    _ensure_prereqs(workspace, monkeypatch)
    capsys.readouterr()
    _run("cli.kmeans_anchors", [
        "-c", str(workspace / "test.ini"), "--num", "2", "--seed", "3",
    ], monkeypatch)
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("#") and "mean best-IoU" in out[0]
    line = out[-1]
    assert line.startswith("anchors = ")
    pairs = [tuple(map(float, p.split(","))) for p in line[10:].split()]
    assert len(pairs) == 2
    areas = [w * h for w, h in pairs]
    assert areas == sorted(areas) and all(a > 0 for a in areas)
    # the printed line must parse back through the config system
    ini2 = workspace / "anch.ini"
    ini2.write_text((workspace / "test.ini").read_text()
                    .replace("anchors = 1.08,1.19 3.42,4.41",
                             line))
    from yolojax.config import load_config

    cfg = load_config([str(workspace / "test.ini"), str(ini2)])
    assert len(cfg.model.anchors) == 2


def test_35_train_zero1_ema_accum_cli(workspace, monkeypatch, tmp_path):
    """train.zero=1 + ema_decay + grad_accum at the CLI surface: the ZeRO-1
    sharded-optimizer layout trains, checkpoints (host gather of the
    data-sharded momentum/EMA buffers), resumes, and detect serves the
    EMA weights from the logdir via detect.use_ema=1."""
    _ensure_prereqs(workspace, monkeypatch)
    common = [
        "-c", str(workspace / "test.ini"),
        f"train.logdir={tmp_path}/zlog",
        "train.save_steps=2", "train.zero=1",
        "train.ema_decay=0.9", "train.grad_accum=2",
    ]
    _run("cli.train", common + ["train.steps=4"], monkeypatch)
    logdir = tmp_path / "zlog" / "yolo2_tiny"
    metrics = [json.loads(l) for l in open(logdir / "metrics.jsonl")]
    scalar = [m for m in metrics if "total" in m]
    assert len(scalar) == 4 and np.isfinite(scalar[-1]["total"])
    # resume: the sharded opt_state (incl. EMA + MultiSteps counters)
    # round-trips through the checkpoint
    _run("cli.train", common + ["train.steps=5"], monkeypatch)
    metrics = [json.loads(l) for l in open(logdir / "metrics.jsonl")]
    steps = [m["step"] for m in metrics]
    assert max(steps) == 5 and steps.count(5) == 1
    # EMA weights restore for inference and differ from the live params
    from yolojax.train.checkpoint import Checkpointer
    from yolojax.train.step import extract_ema
    from yolojax.utils.restore import load_weights

    ckpt = Checkpointer(str(logdir / "ckpt"))
    _, raw = ckpt.restore_latest_raw()
    ckpt.close()
    ema, _ = load_weights(str(logdir), None, 64, use_ema=True)
    import jax as _jax

    live = raw["params"]
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(_jax.tree_util.tree_leaves(ema),
                             _jax.tree_util.tree_leaves(live))]
    assert max(diffs) > 0
    # detect CLI serves the EMA weights
    out = tmp_path / "ema_det.png"
    _run("cli.detect", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(logdir),
        "--image", str(workspace / "voc" / "JPEGImages" / "000000.jpg"),
        "--out", str(out),
        "detect.threshold=0.0001", "detect.use_ema=1",
    ], monkeypatch)
    assert out.exists()


def test_36_export_tflite(workspace, monkeypatch, capsys, tmp_path):
    """TFLite export (cli/export.py --format tflite): the jax2tf graph
    bridge serves the same detections under the TFLite interpreter (Flex
    delegate) that the live --weights portable build produces — the
    edge-deployment surface the reference never had."""
    _ensure_prereqs(workspace, monkeypatch)
    pytest.importorskip("tensorflow")

    tfl = str(tmp_path / "model.tflite")
    _run("cli.export", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--out", tfl, "--format", "tflite", "--batch", "1",
        "detect.threshold=0.0001",
    ], monkeypatch)
    head = capsys.readouterr().out.strip().splitlines()[-1]
    assert "format=tflite" in head and "conversion=graph" in head
    assert os.path.exists(tfl) and os.path.exists(tfl + ".json")

    from yolojax.serve.tflite import load_tflite

    meta, serve_fn = load_tflite(tfl)
    assert meta["names"][0] == "aeroplane" and meta["batch"] == 1
    assert meta["format"] == "tflite"

    # serve a real letterboxed workspace image and compare the kept
    # detections against the live portable build. TFLite builtins are
    # different kernels than XLA's (not the same bits), so scores/boxes
    # get a small float tolerance; the kept set and classes must agree.
    import jax

    from cli.detect import _read_rgb, build_serving
    from yolojax.config import load_config
    from yolojax.data.augment import letterbox_host

    cfg = load_config([str(workspace / "test.ini")],
                      ["detect.threshold=0.0001"])
    img = str(workspace / "voc" / "JPEGImages" / "000000.jpg")
    canvas, _ = letterbox_host(_read_rgb(img), cfg.model.dim,
                               stretch=cfg.detect.stretch)
    x = np.stack([canvas])
    got = serve_fn(x)
    assert set(got) == {"boxes", "scores", "classes", "keep"}
    _, _, infer_fn, params, bn_state = build_serving(
        cfg, str(workspace / "logdir" / "yolo2_tiny"), portable=True)
    want = jax.device_get(infer_fn(params, bn_state, x))
    np.testing.assert_array_equal(got["keep"], np.asarray(want["keep"]))
    keep = np.asarray(want["keep"][0])
    np.testing.assert_array_equal(got["classes"][0][keep],
                                  np.asarray(want["classes"][0][keep]))
    np.testing.assert_allclose(got["boxes"][0][keep],
                               np.asarray(want["boxes"][0][keep]),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(got["scores"][0][keep],
                               np.asarray(want["scores"][0][keep]),
                               atol=1e-3, rtol=1e-3)


def test_37_qat_fine_tune_cli(workspace, monkeypatch, capsys, tmp_path):
    """QAT CLI (cli/qat.py): fold + calibrate + fake-quant fine-tune over
    real loader batches, then the identity-BN .npz it writes must ride the
    standard --weights path — int8 eval and detect both consume it with no
    new loading code (the whole point of reembed_folded)."""
    _ensure_prereqs(workspace, monkeypatch)
    out_npz = str(tmp_path / "qat.npz")
    _run("cli.qat", [
        "-c", str(workspace / "test.ini"),
        "--weights", str(workspace / "logdir" / "yolo2_tiny"),
        "--output", out_npz, "--steps", "4", "--lr", "1e-5",
    ], monkeypatch)
    assert os.path.exists(out_npz)

    # standard npz structure: loads like any converted checkpoint
    from yolojax.convert.store import load_params_npz

    params, state = load_params_npz(out_npz)
    assert any(k.startswith("conv_") for k in params)
    assert state  # identity-BN running stats present

    # int8 eval through the unchanged deploy machinery
    _run("cli.eval", [
        "-c", str(workspace / "test.ini"),
        "--weights", out_npz, "--phase", "test", "detect.use_int8=1",
    ], monkeypatch)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["num_images"] == 8
    assert 0.0 <= rec["map"] <= 1.0

    # int8 detect on an image
    img = str(workspace / "voc" / "JPEGImages" / "000000.jpg")
    out_img = str(tmp_path / "qat_det.png")
    _run("cli.detect", [
        "-c", str(workspace / "test.ini"),
        "--weights", out_npz, "--image", img, "--out", out_img,
        "detect.threshold=0.0001", "detect.use_int8=1",
    ], monkeypatch)
    assert os.path.exists(out_img)
