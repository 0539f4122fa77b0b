"""`python -m yolojax <command>` dispatcher (packaging surface)."""

import subprocess
import sys

import pytest

from yolojax.__main__ import COMMANDS, main


def test_help_lists_commands(capsys):
    assert main(["--help"]) == 0
    out = capsys.readouterr().out
    for cmd in COMMANDS:
        assert cmd in out


def test_no_args_is_usage_error(capsys):
    assert main([]) == 2


def test_unknown_command(capsys):
    assert main(["frobnicate"]) == 2
    assert "unknown command" in capsys.readouterr().err


def test_dispatches_to_cli_module():
    # argparse --help exits 0 through the dispatched module's parser
    with pytest.raises(SystemExit) as e:
        main(["cache", "--help"])
    assert e.value.code == 0


def test_module_invocation_subprocess():
    out = subprocess.run(
        [sys.executable, "-m", "yolojax", "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0 and "train" in out.stdout
