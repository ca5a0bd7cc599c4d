"""Logging with the reference's env-var contract.

≙ the reference's C++ Logger singleton
(/root/reference/src/fastertransformer/utils/logger.{h,cc}): level from
``FT_LOG_LEVEL`` (TRACE/DEBUG/INFO/WARNING/ERROR), and ``FT_LOG_FIRST_RANK_ONLY``
silences non-zero processes (logger.cc:24-31). Process index comes from
jax.process_index() in multi-host runs.
"""
from __future__ import annotations

import logging
import os

_LEVELS = {
    "TRACE": logging.DEBUG,
    "DEBUG": logging.DEBUG,
    "INFO": logging.INFO,
    "WARNING": logging.WARNING,
    "ERROR": logging.ERROR,
}

_configured = False


def get_logger(name: str = "ftcf") -> logging.Logger:
    global _configured
    logger = logging.getLogger(name)
    if not _configured:
        level = _LEVELS.get(os.environ.get("FT_LOG_LEVEL", "INFO").upper(), logging.INFO)
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("[FTCF][%(levelname)s] %(asctime)s %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
        if os.environ.get("FT_LOG_FIRST_RANK_ONLY", "").upper() in ("1", "ON", "TRUE"):
            try:
                import jax

                if jax.process_index() != 0:
                    logger.setLevel(logging.ERROR)
            except Exception:
                pass
        _configured = True
    return logger
