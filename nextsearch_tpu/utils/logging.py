"""Structured [tag] logging (SURVEY.md §5: the reference logs unstructured
stderr lines with [tag] prefixes; we keep the format, add levels + a single
switchboard).

Env: NEXTSEARCH_LOG_LEVEL = debug|info|warn|error (default info),
NEXTSEARCH_LOG_JSON=1 emits one JSON object per line instead.
"""

from __future__ import annotations

import json
import os
import sys
import time

_LEVELS = {"debug": 10, "info": 20, "warn": 30, "error": 40}


def _threshold() -> int:
    return _LEVELS.get(os.environ.get("NEXTSEARCH_LOG_LEVEL", "info"), 20)


def log(tag: str, message: str, level: str = "info", **fields) -> None:
    if _LEVELS.get(level, 20) < _threshold():
        return
    if os.environ.get("NEXTSEARCH_LOG_JSON") == "1":
        rec = {"ts": round(time.time(), 3), "level": level, "tag": tag,
               "msg": message}
        rec.update(fields)
        print(json.dumps(rec), file=sys.stderr)
    else:
        extra = "".join(f" {k}={v}" for k, v in fields.items())
        print(f"[{tag}] {message}{extra}", file=sys.stderr)


def debug(tag: str, message: str, **fields) -> None:
    log(tag, message, "debug", **fields)


def warn(tag: str, message: str, **fields) -> None:
    log(tag, message, "warn", **fields)


def error(tag: str, message: str, **fields) -> None:
    log(tag, message, "error", **fields)
