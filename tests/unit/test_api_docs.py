"""docs/API.md must not rot: every `from yolojax... import name` line in
its code blocks has to resolve against the real package."""

import importlib
import os
import re

DOC = os.path.join(os.path.dirname(__file__), "..", "..", "docs", "API.md")

IMPORT_RE = re.compile(
    r"^from (yolojax[\w.]*) import ([\w, ]+?)(?:\s*#.*)?$", re.M)


def test_every_documented_import_resolves():
    text = open(DOC).read()
    found = IMPORT_RE.findall(text)
    assert len(found) >= 10, "API.md import lines not being parsed"
    missing = []
    for module, names in found:
        mod = importlib.import_module(module)
        for name in (n.strip() for n in names.split(",")):
            name = name.split(" as ")[0].strip()  # `import mesh as pm`
            if not hasattr(mod, name):
                missing.append(f"{module}.{name}")
    assert not missing, f"API.md documents nonexistent names: {missing}"
