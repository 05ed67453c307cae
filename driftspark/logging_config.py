"""Logging setup (reference utils/logging_config.py:8-74 scope)."""

from __future__ import annotations

import logging
import sys
from typing import Optional


def setup_logging(
    level: int = logging.INFO,
    fmt: str = "%(asctime)s %(name)s %(levelname)s %(message)s",
    stream=None,
    quiet_spark: bool = True,
) -> logging.Logger:
    """Configure the driftspark logger hierarchy; optionally quiet py4j."""
    logger = logging.getLogger("driftspark")
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler(stream or sys.stderr)
        handler.setFormatter(logging.Formatter(fmt))
        logger.addHandler(handler)
    if quiet_spark:
        logging.getLogger("py4j").setLevel(logging.WARNING)
        logging.getLogger("pyspark").setLevel(logging.WARNING)
    return logger


def get_logger(name: Optional[str] = None) -> logging.Logger:
    return logging.getLogger(f"driftspark.{name}" if name else "driftspark")
