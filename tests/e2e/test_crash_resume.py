"""Failure-recovery e2e (SURVEY.md §5): a hard crash (SIGKILL, no signal
handler, no atexit) mid-training must lose at most the steps since the last
checkpoint; an identical restart resumes from the latest saved step instead
of step 0. This is the reference's recovery contract (crash -> restart ->
Saver restore-latest) driven through the real CLI."""

import json
import os
import signal
import subprocess
import sys
import time

from tests.util import write_synthetic_voc

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_ini(tmp_path, voc):
    ini = tmp_path / "crash.ini"
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
""")
    return ini


def _env():
    env = dict(os.environ)
    # single device: this test gates crash/resume, not sharding — 1 CPU
    # device compiles much faster and keeps the subprocess light enough to
    # stay within the deadline even when the suite has bloated the host
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    # JAX_PLATFORMS in the env is applied at import time and loses to a
    # site-hook that pins a remote-accelerator plugin; YOLOJAX_PLATFORM
    # makes the CLI pin the platform via jax.config BEFORE backend init,
    # so the subprocess can never block on an unreachable accelerator
    env["YOLOJAX_PLATFORM"] = "cpu"
    return env


def test_sigkill_then_restart_resumes(tmp_path):
    voc = tmp_path / "voc"
    write_synthetic_voc(str(voc), n_images=8, size=(96, 64))
    ini = _write_ini(tmp_path, voc)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "cache.py"), "-c", str(ini)],
        cwd=REPO, env=_env(), check=True, capture_output=True, timeout=120,
    )

    metrics = tmp_path / "logdir" / "yolo2_tiny" / "metrics.jsonl"
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "cli", "train.py"), "-c", str(ini)],
        cwd=REPO, env=_env(),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        # wait until a few steps have been taken (and checkpointed), then
        # SIGKILL: no SIGINT handler, no orbax finalization, a real crash
        deadline = time.time() + 900
        killed_after = 0
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError("train exited before it could be killed")
            if metrics.exists():
                lines = metrics.read_text().strip().splitlines()
                if len(lines) >= 3:
                    killed_after = max(json.loads(l)["step"] for l in lines)
                    os.kill(proc.pid, signal.SIGKILL)
                    break
            time.sleep(0.5)
        else:
            raise AssertionError("train never reached step 3 in 900s")
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    # restart with a shorter horizon; must RESUME, not restart from 0
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "train.py"), "-c", str(ini),
         f"train.steps={killed_after + 2}"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "resumed from step" in out.stderr

    lines = [json.loads(l) for l in metrics.read_text().strip().splitlines()]
    steps = [m["step"] for m in lines]
    # a save_steps=1 run can lose at most the in-flight step: the restart
    # continues from the latest durable checkpoint to the new horizon and
    # never begins again at step 1 (a partially-written step dir from the
    # SIGKILL moment must be ignored by the restore, not crash it)
    assert max(steps) == killed_after + 2
    assert steps.count(1) == 1, "restart must not begin again at step 1"
