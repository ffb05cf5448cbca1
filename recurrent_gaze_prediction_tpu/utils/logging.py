"""Console logger with a custom INFOV ("info, verbose/highlight") level.

TPU-native re-design of the reference logger (`/root/reference/util.py:10-40`),
which builds a colorlog logger with an extra INFOV level between INFO and
WARNING. We reproduce the same API (`log.debug/info/infov/warn/error`) on top
of stdlib logging with ANSI colors, no third-party dependency.
"""

from __future__ import annotations

import logging
import os
import sys

INFOV = logging.INFO + 1

_COLORS = {
    logging.DEBUG: "\033[36m",     # cyan
    logging.INFO: "\033[0m",       # default
    INFOV: "\033[32;1m",           # bold green
    logging.WARNING: "\033[33m",   # yellow
    logging.ERROR: "\033[31;1m",   # bold red
    logging.CRITICAL: "\033[41m",  # red background
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def __init__(self, use_color: bool):
        super().__init__(fmt="%(asctime)s %(levelname)-7s %(message)s",
                         datefmt="%H:%M:%S")
        self._use_color = use_color

    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        if self._use_color:
            color = _COLORS.get(record.levelno, "")
            return f"{color}{msg}{_RESET}"
        return msg


class _Log:
    """Tiny facade matching the reference's `log` object interface."""

    def __init__(self, name: str = "rgp"):
        logging.addLevelName(INFOV, "INFOV")
        self._logger = logging.getLogger(name)
        if not self._logger.handlers:
            handler = logging.StreamHandler(sys.stderr)
            use_color = sys.stderr.isatty() and os.environ.get("NO_COLOR") is None
            handler.setFormatter(_ColorFormatter(use_color))
            self._logger.addHandler(handler)
            self._logger.setLevel(logging.INFO)
            self._logger.propagate = False

    def setLevel(self, level) -> None:
        self._logger.setLevel(level)

    def debug(self, msg, *args) -> None:
        self._logger.debug(msg, *args)

    def info(self, msg, *args) -> None:
        self._logger.info(msg, *args)

    def infov(self, msg, *args) -> None:
        self._logger.log(INFOV, msg, *args)

    # Reference names it `warn`.
    def warn(self, msg, *args) -> None:
        self._logger.warning(msg, *args)

    def warning(self, msg, *args) -> None:
        self._logger.warning(msg, *args)

    def error(self, msg, *args) -> None:
        self._logger.error(msg, *args)

    def critical(self, msg, *args) -> None:
        self._logger.critical(msg, *args)


log = _Log()


def mkdir_p(path: str) -> None:
    """Recursive mkdir (reference: `/root/reference/util.py:44-49`)."""
    os.makedirs(path, exist_ok=True)


def override(fn):
    """No-op decorator documenting a method override (reference `util.py:51`)."""
    return fn
