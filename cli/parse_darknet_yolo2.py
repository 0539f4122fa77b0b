#!/usr/bin/env python3
"""Name-compat alias for the reference's ``parse_darknet_yolo2.py``
(SURVEY.md §2 CLI inventory). Same converter as cli/parse_darknet.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli.parse_darknet import main  # noqa: E402,F401

if __name__ == "__main__":
    main()
