"""Thin logging setup (SURVEY.md §2a E6).

The reference ships a 75-LoC rotating-file logger manager
(/root/reference/src/util/logger_manager.py:6-76). Driver-side Python
logging plus Spark's executor-side log4j already cover that surface; what
remains engine code is a consistent format and one knob for the level.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s %(levelname)s %(name)s: %(message)s"


def setup_logging(level: str = "INFO") -> None:
    # sys.__stderr__, not sys.stderr: under pytest the latter is a capture
    # buffer that closes before interpreter-exit log emits (py4j atexit).
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format=_FORMAT,
        stream=sys.__stderr__,
        force=True,
    )


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)
