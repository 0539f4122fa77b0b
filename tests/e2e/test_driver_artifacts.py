"""Driver-contract smoke tests: bench.py must print one valid JSON line
with the required keys, and __graft_entry__ must compile-check single-chip
and dry-run the multi-chip training step. These are the artifacts the
round driver consumes — breaking them silently voids the round's record."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _env(n_devices=8):
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_bench_json_contract():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--batch", "4", "--iters", "2", "--dim", "64", "--model", "tiny"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0 and rec["unit"] == "images/sec/chip"


def test_graft_entry_single_and_multichip():
    code = (
        "import jax, __graft_entry__ as g; "
        "fn, args = g.entry(); jax.jit(fn)(*args); "
        "g.dryrun_multichip(8); print('GRAFT_OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "GRAFT_OK" in out.stdout
    assert "dryrun_multichip(8)" in out.stdout  # mesh line printed
