"""Stdlib logging setup (SURVEY.md §5: no external deps, per-phase counters).

The reference's only observability is its output spectrum; here every phase
(encode/transfer/kernel/merge) logs through a shared namespaced logger and
counters live in pipeline.StreamStats.
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def get_logger(name: str = "findkmer") -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        _CONFIGURED = True
        root = logging.getLogger("findkmer")
        if not root.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(
                logging.Formatter(
                    "%(asctime)s %(name)s %(levelname)s %(message)s"
                )
            )
            root.addHandler(h)
        root.setLevel(os.environ.get("FINDKMER_LOGLEVEL", "WARNING").upper())
    return logging.getLogger(name)
