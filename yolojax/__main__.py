"""``python -m yolojax <command> [args...]`` — one dispatcher over the CLI
entry points, so installed environments (where the ``cli/`` checkout scripts
aren't on the path) get every tool under a single module invocation.

Commands map 1:1 onto the reference's entry scripts (SURVEY.md §1 L6) plus
this rebuild's extras; ``yolojax-<command>`` console scripts (pyproject) are
the other spelling of the same table.
"""

from __future__ import annotations

import importlib
import sys

COMMANDS = {
    "cache": "cache",
    "train": "train",
    "detect": "detect",
    "detect-camera": "detect_camera",
    "eval": "eval",
    "export": "export",
    "parse-darknet": "parse_darknet",
    "qat": "qat",
    "serve": "serve",
    "kmeans-anchors": "kmeans_anchors",
    "demo-augmentation": "demo_data_augmentation",
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        names = " | ".join(sorted(COMMANDS))
        print(f"usage: python -m yolojax <command> [args...]\n"
              f"commands: {names}\n"
              f"each command takes the same flags as its cli/<command>.py "
              f"script (try: python -m yolojax train --help)")
        return 0 if argv else 2
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; run `python -m yolojax --help`",
              file=sys.stderr)
        return 2
    mod = None
    for pkg in ("yolojax.cli", "cli"):  # installed vs source checkout
        try:
            mod = importlib.import_module(f"{pkg}.{COMMANDS[cmd]}")
            break
        except ImportError:
            continue
    if mod is None:
        print("yolojax CLI modules not importable (install the package or "
              "run from a source checkout)", file=sys.stderr)
        return 1
    sys.argv = [f"yolojax-{cmd}"] + rest
    mod.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
