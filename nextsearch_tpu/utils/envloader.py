"""Dotenv-style KEY=VALUE config loader.

Parity contract (reference: include/env_loader.hpp:12-49): skip blank lines and
lines starting with '#', split at the first '=', trim whitespace from key and
value, and strip one pair of matching single or double quotes from the value.
"""

from __future__ import annotations

import os
from typing import Dict


def load_env_file(filepath: str | os.PathLike) -> Dict[str, str]:
    env_vars: Dict[str, str] = {}
    try:
        with open(filepath, "r", encoding="utf-8", errors="replace") as f:
            lines = f.readlines()
    except OSError:
        return env_vars

    for line in lines:
        line = line.rstrip("\n")
        if not line or line[0] == "#":
            continue
        pos = line.find("=")
        if pos < 0:
            continue
        key = line[:pos].strip(" \t\r\n")
        value = line[pos + 1 :].strip(" \t\r\n")
        if len(value) >= 2 and (
            (value[0] == '"' and value[-1] == '"')
            or (value[0] == "'" and value[-1] == "'")
        ):
            value = value[1:-1]
        env_vars[key] = value
    return env_vars
