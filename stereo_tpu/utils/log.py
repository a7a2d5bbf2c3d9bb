"""Structured logging (SURVEY.md §5 metrics/logging/observability).

Per-module loggers under the "stereo_tpu" root; ``setup()`` configures a
stderr handler once (the CLI calls it; library users keep control of their
own logging config). Structured per-run records are the JSONL files
written by bench.py / eval/harness.py — logging here is for human-readable
progress and diagnostics.
"""

from __future__ import annotations

import logging
import os

_CONFIGURED = False


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(f"stereo_tpu.{name}")


def setup(level: str | int | None = None) -> None:
    """Attach a stderr handler to the package root logger (idempotent)."""
    global _CONFIGURED
    root = logging.getLogger("stereo_tpu")
    if level is None:
        level = os.environ.get("STEREO_TPU_LOG", "INFO")
    root.setLevel(level)
    if _CONFIGURED:
        return
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s: %(message)s", "%H:%M:%S"
        )
    )
    root.addHandler(handler)
    _CONFIGURED = True
