"""Multi-host (DCN) smoke test: 2 coordinated CPU processes, 4 virtual
devices each -> one 8-device data-parallel mesh, 2 real train steps through
cli/train.py with jax.distributed + make_array_from_process_local_data."""

import json
import os
import socket
import subprocess
import sys


from tests.util import write_synthetic_voc

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train(tmp_path):
    voc = tmp_path / "voc"
    write_synthetic_voc(str(voc), n_images=8, size=(96, 64))
    ini = tmp_path / "mp.ini"
    port = _free_port()
    ini.write_text(f"""
[model]
model = yolo2
inference = tiny
dim = 64
names_file = {REPO}/config/names/voc.txt
anchors = 1.08,1.19 3.42,4.41
[cache]
basedir = {tmp_path}/cache
train = voc:{voc}:trainval
val = voc:{voc}:trainval
[queue]
batch_size = 8
canvas_dim = 64
max_boxes = 8
num_threads = 2
[eval]
batch_size = 4
distributed = 1
[train]
logdir = {tmp_path}/logdir
steps = 2
save_steps = 10
summary_steps = 1
eval_steps = 2
image_summary_steps = 2
compute_dtype = float32
optimizer = sgd
learning_rate = 1e-4
weight_decay = 0
coordinator = 127.0.0.1:{port}
num_processes = 2
""")
    # build the cache once (single process)
    driver = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; sys.path.insert(0, {repo!r}); "
        "sys.argv = ['x', '-c', {ini!r}{extra}]; "
        "from cli.{mod} import main; main()"
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    subprocess.run(
        [sys.executable, "-c",
         driver.format(repo=REPO, ini=str(ini), extra="", mod="cache")],
        check=True, env=env, cwd=REPO, timeout=120,
    )

    procs = []
    for pid in range(2):
        code = driver.format(
            repo=REPO, ini=str(ini),
            extra=f", 'train.process_id={pid}'", mod="train",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=360)
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i][-3000:]}"
    # primary wrote metrics over the 8-device global mesh
    metrics = [json.loads(l) for l in
               open(tmp_path / "logdir" / "yolo2_tiny" / "metrics.jsonl")]
    import numpy as np

    train_lines = [m for m in metrics if "total" in m]
    assert len(train_lines) == 2
    assert np.isfinite(train_lines[-1]["total"])
    assert "mesh: {'data': 8" in outs[0] or "'data': 8" in outs[0]
    # in-training eval must run under multi-process too (VERDICT r1 #7).
    # eval.distributed=1: every process evals its cache shard, detections
    # are allgathered over DCN, metrics are global
    eval_lines = [m for m in metrics if "val_map" in m]
    assert eval_lines and np.isfinite(eval_lines[-1]["val_map"]), metrics
    assert "(shard 0/2)" in outs[0], outs[0][-2000:]
    assert "(shard 1/2)" in outs[1], outs[1][-2000:]
    # the distributed global mAP must match a single-process eval of the
    # final checkpoint over the same (whole) val cache
    import jax
    import jax.numpy as jnp

    from yolojax.config import load_config
    from yolojax.data.cache import load_cache
    from yolojax.eval.evaluator import evaluate_model
    from yolojax.utils.restore import load_weights

    cfg = load_config([str(ini)])
    model = cfg.build_model()
    params, bn_state = load_weights(
        str(tmp_path / "logdir" / "yolo2_tiny"), model, 64)
    em = evaluate_model(
        model, jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, bn_state),
        load_cache(str(tmp_path / "cache"), "val"),
        input_dim=64, batch_size=4, compute_dtype=jnp.float32,
        nms_iou=cfg.detect.nms_iou, top_k=cfg.detect.top_k,
        map_iou=cfg.eval.map_iou, use_pallas=cfg.detect.use_pallas,
        candidates=cfg.detect.candidates,
        max_detections=cfg.eval.max_detections,
    )
    np.testing.assert_allclose(
        eval_lines[-1]["val_map"], em["map"], atol=1e-6)
    # image summary no longer skips under multi-process
    pngs = list((tmp_path / "logdir" / "yolo2_tiny").glob("sample_*.png"))
    assert pngs, "no image summary PNG written"


def test_two_process_zero1_host_gather(tmp_path):
    """2 processes x 4 devices, pure DP with train.zero=1: ZeRO-1 shards the
    optimizer state over the data axis, which spans BOTH processes — so every
    host pull of the train state (checkpoint saves, grad histograms, the eval
    branch) must go through the replicated-gather collective, entered by both
    processes. Plain jax.device_get on those non-addressable shards crashes;
    this drives the exact scenario (ADVICE r3 medium) end-to-end."""
    import json

    import numpy as np

    voc = tmp_path / "voc"
    write_synthetic_voc(str(voc), n_images=8, size=(96, 64))
    ini = tmp_path / "mpz.ini"
    port = _free_port()
    ini.write_text(f"""
[model]
model = yolo2
inference = tiny
dim = 64
names_file = {REPO}/config/names/voc.txt
anchors = 1.08,1.19 3.42,4.41
[cache]
basedir = {tmp_path}/cache
train = voc:{voc}:trainval
val = voc:{voc}:trainval
[queue]
batch_size = 8
canvas_dim = 64
max_boxes = 8
num_threads = 2
[eval]
batch_size = 4
distributed = 0
[train]
logdir = {tmp_path}/logdir
steps = 2
save_steps = 1
summary_steps = 1
eval_steps = 2
histogram_steps = 1
zero = 1
ema_decay = 0.9
compute_dtype = float32
optimizer = sgd
learning_rate = 1e-4
weight_decay = 0
coordinator = 127.0.0.1:{port}
num_processes = 2
""")
    driver = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; sys.path.insert(0, {repo!r}); "
        "sys.argv = ['x', '-c', {ini!r}{extra}]; "
        "from cli.{mod} import main; main()"
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    subprocess.run(
        [sys.executable, "-c",
         driver.format(repo=REPO, ini=str(ini), extra="", mod="cache")],
        check=True, env=env, cwd=REPO, timeout=120,
    )
    procs = []
    for pid in range(2):
        code = driver.format(
            repo=REPO, ini=str(ini),
            extra=f", 'train.process_id={pid}'", mod="train",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=360)  # a deadlock would time out here
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i][-3000:]}"
    assert "ZeRO-1: optimizer state sharded over data=8" in outs[0]
    metrics = [json.loads(l) for l in
               open(tmp_path / "logdir" / "yolo2_tiny" / "metrics.jsonl")]
    train_lines = [m for m in metrics if "total" in m]
    assert len(train_lines) == 2
    assert np.isfinite(train_lines[-1]["total"])
    assert any("val_map" in m for m in metrics), metrics
    assert any(any(k.startswith("hist/grad/") for k in m) for m in metrics)
    # both per-step saves + the final save landed (the crash site was here)
    ckpts = sorted((tmp_path / "logdir" / "yolo2_tiny" / "ckpt").glob("[0-9]*"))
    assert ckpts, "no checkpoints written"


def test_two_process_tensor_parallel_host_gather(tmp_path):
    """2 processes x 4 devices with mesh_model=2: TP-sharded leaves are not
    process-addressable, so the primary-only summary branches (histograms,
    non-distributed eval, checkpoint save) must all enter the replicated
    gather collective on BOTH processes — this is the deadlock scenario the
    gather_all gating exists for, driven end-to-end."""
    import json

    import numpy as np

    voc = tmp_path / "voc"
    write_synthetic_voc(str(voc), n_images=8, size=(96, 64))
    ini = tmp_path / "mptp.ini"
    port = _free_port()
    ini.write_text(f"""
[model]
model = yolo2
inference = tiny
dim = 64
names_file = {REPO}/config/names/voc.txt
anchors = 1.08,1.19 3.42,4.41
[cache]
basedir = {tmp_path}/cache
train = voc:{voc}:trainval
val = voc:{voc}:trainval
[queue]
batch_size = 8
canvas_dim = 64
max_boxes = 8
num_threads = 2
[eval]
batch_size = 4
distributed = 0
[train]
logdir = {tmp_path}/logdir
steps = 2
save_steps = 1
summary_steps = 1
eval_steps = 2
histogram_steps = 1
mesh_model = 2
compute_dtype = float32
optimizer = sgd
learning_rate = 1e-4
weight_decay = 0
coordinator = 127.0.0.1:{port}
num_processes = 2
""")
    driver = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; sys.path.insert(0, {repo!r}); "
        "sys.argv = ['x', '-c', {ini!r}{extra}]; "
        "from cli.{mod} import main; main()"
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    subprocess.run(
        [sys.executable, "-c",
         driver.format(repo=REPO, ini=str(ini), extra="", mod="cache")],
        check=True, env=env, cwd=REPO, timeout=120,
    )
    procs = []
    for pid in range(2):
        code = driver.format(
            repo=REPO, ini=str(ini),
            extra=f", 'train.process_id={pid}'", mod="train",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=360)  # a deadlock would time out here
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i][-3000:]}"
    assert "'model': 2" in outs[0], outs[0][-1500:]
    metrics = [json.loads(l) for l in
               open(tmp_path / "logdir" / "yolo2_tiny" / "metrics.jsonl")]
    assert any("val_map" in m for m in metrics), metrics
    assert any(any(k.startswith("hist/") for k in m) for m in metrics)


def test_two_process_sigkill_resume(tmp_path):
    """Multi-host failure recovery (SURVEY.md §5): SIGKILL BOTH coordinated
    processes mid-training — a hard job failure, no signal handlers, no
    orbax finalization, possibly mid-collective — then restart the job on a
    fresh coordinator port. The restart must resume from the latest durable
    checkpoint (tolerating a partially-written step dir from the kill
    moment), never begin again at step 1."""
    import signal
    import time

    voc = tmp_path / "voc"
    write_synthetic_voc(str(voc), n_images=8, size=(96, 64))
    ini = tmp_path / "mpc.ini"
    port = _free_port()
    ini.write_text(f"""
[model]
model = yolo2
inference = tiny
dim = 64
names_file = {REPO}/config/names/voc.txt
anchors = 1.08,1.19 3.42,4.41
[cache]
basedir = {tmp_path}/cache
train = voc:{voc}:trainval
[queue]
batch_size = 8
canvas_dim = 64
max_boxes = 8
num_threads = 2
[train]
logdir = {tmp_path}/logdir
steps = 40
save_steps = 1
summary_steps = 1
compute_dtype = float32
optimizer = sgd
learning_rate = 1e-4
weight_decay = 0
coordinator = 127.0.0.1:{port}
num_processes = 2
""")
    driver = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; sys.path.insert(0, {repo!r}); "
        "sys.argv = ['x', '-c', {ini!r}{extra}]; "
        "from cli.{mod} import main; main()"
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    subprocess.run(
        [sys.executable, "-c",
         driver.format(repo=REPO, ini=str(ini), extra="", mod="cache")],
        check=True, env=env, cwd=REPO, timeout=120,
    )

    def launch(extra_overrides, coord_port):
        procs = []
        for pid in range(2):
            extra = (f", 'train.process_id={pid}', "
                     f"'train.coordinator=127.0.0.1:{coord_port}'"
                     + extra_overrides)
            code = driver.format(repo=REPO, ini=str(ini), extra=extra,
                                 mod="train")
            procs.append(subprocess.Popen(
                [sys.executable, "-c", code], env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            ))
        return procs

    metrics = tmp_path / "logdir" / "yolo2_tiny" / "metrics.jsonl"
    procs = launch("", port)
    try:
        deadline = time.time() + 900
        killed_after = 0
        while time.time() < deadline:
            if any(p.poll() is not None for p in procs):
                outs = [p.communicate()[0].decode() for p in procs
                        if p.poll() is not None]
                raise AssertionError(
                    "train exited before it could be killed:\n"
                    + "\n".join(o[-2000:] for o in outs))
            if metrics.exists():
                lines = metrics.read_text().strip().splitlines()
                if len(lines) >= 3:
                    killed_after = max(json.loads(l)["step"] for l in lines)
                    for p in procs:  # both at once: a whole-job failure
                        os.kill(p.pid, signal.SIGKILL)
                    break
            time.sleep(0.5)
        else:
            raise AssertionError("train never reached step 3 in 900s")
        for p in procs:
            p.wait(timeout=60)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    # restart the whole job on a FRESH coordinator port (the old one died
    # with the killed coordinator process) and a shorter horizon
    port2 = _free_port()
    procs = launch(f", 'train.steps={killed_after + 2}'", port2)
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i][-3000:]}"
    assert "resumed from step" in outs[0], outs[0][-2000:]
    assert "resumed from step" in outs[1], outs[1][-2000:]

    lines = [json.loads(l) for l in metrics.read_text().strip().splitlines()]
    steps = [m["step"] for m in lines]
    assert max(steps) == killed_after + 2
    assert steps.count(1) == 1, "restart must not begin again at step 1"
