"""Shared CLI plumbing: the reference's ``utils.make_args`` equivalent
(SURVEY.md §2 config helpers): ``-c`` takes multiple layered INI files,
positional ``section.key=value`` overrides, logging setup."""

from __future__ import annotations

import argparse
import logging
import os
import sys


def make_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument(
        "-c", "--config", action="append", default=[],
        help="INI config file (repeatable; later files override earlier)",
    )
    p.add_argument(
        "overrides", nargs="*", default=[],
        help="section.key=value config overrides",
    )
    p.add_argument("--logging", default="info",
                   help="log level (debug/info/warning/error)")
    return p


def setup(args):
    logging.basicConfig(
        level=getattr(logging, args.logging.upper(), logging.INFO),
        format="%(asctime)s %(levelname).1s %(name)s] %(message)s",
        stream=sys.stderr,
    )
    # Deployment/e2e escape hatch: pin the jax platform BEFORE backend init.
    # Plugin discovery environments can force a remote accelerator via
    # site hooks (JAX_PLATFORMS in os.environ is applied at import, so a
    # subprocess can't override it with the env var alone); the config
    # update below wins as long as no backend has been initialized yet —
    # which holds here because setup() runs before any CLI touches jax.
    platform = os.environ.get("YOLOJAX_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
        logging.getLogger(__name__).info(
            "YOLOJAX_PLATFORM=%s: jax platform pinned", platform)
    from yolojax.config import load_config

    configs = args.config or (["config.ini"] if os.path.exists("config.ini")
                              else [])
    if not configs:
        raise SystemExit("no config file found; pass -c config.ini")
    cfg = load_config(configs, args.overrides)
    if cfg.model.compile_cache:
        # persistent jit cache: re-running any CLI with the same shapes
        # skips recompilation (the TF1 reference rebuilt+re-ran its graph
        # from scratch every invocation)
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(cfg.model.compile_cache))
        # the user opted in explicitly: cache every program, not just the
        # >1s ones (jax's default threshold skips small graphs, which makes
        # the cache look silently broken for fast-compiling configs)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        logging.getLogger(__name__).info(
            "persistent compilation cache: %s", cfg.model.compile_cache)
    return cfg
