"""Structured logging for the framework.

The reference uses bare ``print()`` throughout ``src/`` and the ``logging``
module only in its baselines (SURVEY.md §5.5). Here every module logs through
one configurable logger hierarchy.
"""

from __future__ import annotations

import logging
import os
import sys

_ROOT_NAME = "drs_tpu"
_configured = False


def _configure_root() -> None:
    global _configured
    if _configured:
        return
    root = logging.getLogger(_ROOT_NAME)
    level_name = os.environ.get("DRS_TPU_LOG_LEVEL", "INFO").upper()
    root.setLevel(getattr(logging, level_name, logging.INFO))
    if not root.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s %(levelname).1s %(name)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        root.addHandler(handler)
    root.propagate = False
    _configured = True


def get_logger(name: str) -> logging.Logger:
    """Return a child logger under the framework's root logger."""
    _configure_root()
    short = name.removeprefix("domain_rag_system_tpu.")
    return logging.getLogger(f"{_ROOT_NAME}.{short}")
