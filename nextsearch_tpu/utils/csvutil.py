"""CSV-row parsing and author formatting with parity to the reference.

The reference uses a hand-rolled quote-toggling CSV splitter (quotes are
consumed, commas inside quotes are literal) rather than RFC-4180 — see
src/api_metadata.cpp:13-42. We reproduce it exactly so metadata fields match.
"""

from __future__ import annotations

from typing import List


def csv_row(line: str) -> List[str]:
    """Split one CSV line exactly like the reference's csv_row."""
    out: List[str] = []
    cur: List[str] = []
    inq = False
    for c in line:
        if c == '"':
            inq = not inq
            continue
        if not inq and c == ",":
            out.append("".join(cur))
            cur.clear()
            continue
        cur.append(c)
    out.append("".join(cur))
    return out


def first_author_et_al(authors_raw: str) -> str:
    """First author surname + " et al." — src/api_metadata.cpp:60-106."""
    s = authors_raw.strip()
    if not s:
        return ""
    semi = s.find(";")
    first = s if semi < 0 else s[:semi]
    first = first.strip()
    while first and (first[-1] == "," or first[-1].isspace()):
        first = first[:-1]
    first = first.strip()
    if not first:
        return ""
    # Romanized name inside parentheses: "(Smith) ..." -> "Smith"
    if first[0] == "(":
        close = first.find(")")
        if close > 1:
            inside = first[1:close].strip()
            if inside:
                first = inside
    comma = first.find(",")
    if comma >= 0:
        surname = first[:comma].strip()
    else:
        tmp = first.strip()
        # Last whitespace-separated word is the surname.
        sp = max(tmp.rfind(" "), tmp.rfind("\t"))
        surname = tmp if sp < 0 else tmp[sp + 1 :].strip()
    surname = surname.strip()
    if not surname:
        return ""
    return surname + " et al."
