"""Logging — thin sink-based wrapper over :mod:`logging` matching the
reference's ``Utils/Logger.h:15-60`` surface (LogLevel DEBUG/INFO/WARN/
ERR, pluggable Console/File/Buffer sinks, ``LOG_INFO`` streams).

Python's stdlib logger already is a sink-based multi-handler logger, so
this module only provides the reference-shaped convenience API on top of
it; everything interoperates with ordinary ``logging`` configuration.
"""
from __future__ import annotations

import logging
from typing import List

logger = logging.getLogger("positionbaseddynamics_tpu")

DEBUG, INFO, WARN, ERR = (logging.DEBUG, logging.INFO, logging.WARNING,
                          logging.ERROR)


def add_console_sink(level=INFO):
    """``ConsoleSink`` (``Logger.h``)."""
    h = logging.StreamHandler()
    h.setLevel(level)
    h.setFormatter(logging.Formatter("[%(levelname)s] %(message)s"))
    logger.addHandler(h)
    logger.setLevel(min(logger.level or level, level))
    return h


def add_file_sink(path: str, level=DEBUG):
    """``FileSink``."""
    h = logging.FileHandler(path)
    h.setLevel(level)
    h.setFormatter(logging.Formatter(
        "%(asctime)s [%(levelname)s] %(message)s"))
    logger.addHandler(h)
    logger.setLevel(min(logger.level or level, level))
    return h


class BufferSink(logging.Handler):
    """``BufferSink`` — records messages for programmatic inspection
    (used by the reference's GUI log panel)."""

    def __init__(self, level=DEBUG):
        super().__init__(level)
        self.messages: List[str] = []

    def emit(self, record):
        self.messages.append(self.format(record))


def add_buffer_sink(level=DEBUG) -> BufferSink:
    h = BufferSink(level)
    h.setFormatter(logging.Formatter("[%(levelname)s] %(message)s"))
    logger.addHandler(h)
    logger.setLevel(min(logger.level or level, level))
    return h


log_debug = logger.debug
log_info = logger.info
log_warn = logger.warning
log_err = logger.error
