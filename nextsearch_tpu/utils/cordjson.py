"""CORD-19 paper JSON text extraction.

Parity contract (reference: include/cordjson.hpp:21-49): concatenate the
"title" string plus every "text" field of the "abstract" and "body_text"
section arrays, each followed by a newline.
"""

from __future__ import annotations

import json
import os
from typing import Any


def read_file_all(path: str | os.PathLike) -> str:
    try:
        with open(path, "rb") as f:
            return f.read().decode("utf-8", errors="replace")
    except OSError:
        return ""


def extract_text_from_cord_json(j: Any) -> str:
    out: list[str] = []
    title = j.get("title") if isinstance(j, dict) else None
    if isinstance(title, str):
        out.append(title)
        out.append("\n")
    for key in ("abstract", "body_text"):
        secs = j.get(key) if isinstance(j, dict) else None
        if not isinstance(secs, list):
            continue
        for sec in secs:
            if isinstance(sec, dict):
                text = sec.get("text")
                if isinstance(text, str):
                    out.append(text)
                    out.append("\n")
    return "".join(out)


def extract_text_from_file(path: str | os.PathLike) -> str:
    raw = read_file_all(path)
    if not raw:
        return ""
    try:
        j = json.loads(raw)
    except (ValueError, RecursionError):
        return ""
    return extract_text_from_cord_json(j)
