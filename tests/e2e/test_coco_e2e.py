"""COCO-source end-to-end: the reference cached COCO instance JSON the same
way it cached VOC XML (SURVEY.md §2 dataset cacher, §3.1). Drive the real
CLIs over a synthetic COCO layout: cache -> train -> eval, with a custom
class count (not 20) flowing from the names file through the model head."""

import json
import os

import numpy as np
import pytest

from tests.util import run_cli, write_synthetic_coco

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_run = run_cli


@pytest.fixture(scope="module")
def coco_ws(tmp_path_factory):
    ws = tmp_path_factory.mktemp("cocows")
    ann, img_dir = write_synthetic_coco(str(ws / "coco"), n_images=8)
    names = ws / "names.txt"
    names.write_text("red\ngreen\nblue\n")
    ini = ws / "coco.ini"
    ini.write_text(f"""
[model]
model = yolo2
inference = tiny
dim = 64
names_file = {names}
anchors = 1.08,1.19 3.42,4.41
[cache]
basedir = {ws}/cache
train = coco:{ann}:{img_dir}
test = coco:{ann}:{img_dir}
[queue]
batch_size = 8
canvas_dim = 64
max_boxes = 8
num_threads = 2
[train]
logdir = {ws}/logdir
steps = 2
save_steps = 2
summary_steps = 1
compute_dtype = float32
optimizer = sgd
learning_rate = 1e-4
weight_decay = 0
[detect]
threshold = 0.01
top_k = 128
use_pallas = never
[eval]
batch_size = 4
""")
    return ws


def test_coco_cache_train_eval(coco_ws, monkeypatch, capsys):
    _run("cli.cache", ["-c", str(coco_ws / "coco.ini")], monkeypatch)
    out = capsys.readouterr().out
    assert "train: 8 images" in out
    # names.txt written from the provided ordering, not category-id order
    cached_names = (coco_ws / "cache" / "names.txt").read_text().split()
    assert cached_names == ["red", "green", "blue"]

    _run("cli.train", ["-c", str(coco_ws / "coco.ini")], monkeypatch)
    logdir = coco_ws / "logdir" / "yolo2_tiny"
    metrics = [json.loads(l) for l in open(logdir / "metrics.jsonl")]
    assert np.isfinite(metrics[-1]["total"])

    _run("cli.eval", [
        "-c", str(coco_ws / "coco.ini"),
        "--weights", str(logdir), "--phase", "test",
    ], monkeypatch)
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["num_images"] == 8
    # 3-class model: per-class AP keys stop at ap_2
    assert "ap_2" in rec and "ap_3" not in rec
