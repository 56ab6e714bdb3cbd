"""Lazy metadata store over metadata.csv byte offsets.

Parity contract (reference: src/api_metadata.cpp):
  - startup scans metadata.csv recording only {byte offset, row length} per
    cord_uid (~16 B/doc), first occurrence wins (:109-185)
  - fetch re-opens the file, seeks the row, parses it with the quote-toggling
    csv_row, extracts url / publish_time / authors -> "Surname et al." /
    title / abstract (:188-249). We cache the parsed header columns (the
    reference re-reads the header per fetch; same output, less IO).
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Optional, Tuple

from ..utils.csvutil import csv_row, first_author_et_al


@dataclass
class MetaInfo:
    file_offset: int
    row_length: int


@dataclass
class MetaData:
    url: str = ""
    publish_time: str = ""
    author: str = ""
    title: str = ""
    abstract: str = ""


def load_metadata_uid_meta(
    metadata_csv: str | os.PathLike,
) -> Dict[str, MetaInfo]:
    """Scan the CSV once, returning cord_uid -> byte position info."""
    uid_to_meta: Dict[str, MetaInfo] = {}
    try:
        data = Path(metadata_csv).read_bytes()
    except OSError:
        return uid_to_meta

    # Header line (getline semantics: split at '\n', keep '\r' in fields).
    nl = data.find(b"\n")
    if nl < 0:
        return uid_to_meta
    header = data[:nl].decode("utf-8", errors="replace")
    cols = csv_row(header)
    try:
        uid_i = cols.index("cord_uid")
    except ValueError:
        return uid_to_meta

    from .. import native

    if native.available():
        for uid, off, ln in native.scan_csv_offsets_native(data, uid_i):
            if uid not in uid_to_meta:
                uid_to_meta[uid] = MetaInfo(off, ln)
        return uid_to_meta

    pos = nl + 1
    end = len(data)
    while pos < end:
        nxt = data.find(b"\n", pos)
        if nxt < 0:
            line = data[pos:end]
            line_length = len(line) + 1
            nxt = end
        else:
            line = data[pos:nxt]
            line_length = len(line) + 1
        r = csv_row(line.decode("utf-8", errors="replace"))
        if len(r) > uid_i:
            uid = r[uid_i]
            if uid and uid not in uid_to_meta:
                uid_to_meta[uid] = MetaInfo(pos, line_length)
        pos = nxt + 1
    return uid_to_meta


class MetadataStore:
    """uid -> MetaInfo map + on-demand row fetch with cached header.

    A bounded row cache keeps hot results from re-reading the CSV (same
    values, fewer file opens); the reference re-reads every time
    (src/api_metadata.cpp:188-249) — behavior-identical, faster.
    """

    ROW_CACHE_SIZE = 16384

    def __init__(self, metadata_csv: str | os.PathLike):
        self.path = Path(metadata_csv)
        self.uid_to_meta = load_metadata_uid_meta(metadata_csv)
        self._header_cols: Optional[list] = None
        from collections import OrderedDict

        self._row_cache: "OrderedDict[int, MetaData]" = OrderedDict()
        # fetch() is called concurrently from the search batcher thread and
        # other HTTP handler threads (hybrid, ai_summary); the OrderedDict
        # mutations must be serialized or a popitem racing move_to_end
        # raises KeyError mid-request.
        self._cache_lock = threading.Lock()

    def __contains__(self, uid: str) -> bool:
        return uid in self.uid_to_meta

    def __len__(self) -> int:
        return len(self.uid_to_meta)

    def _columns(self) -> list:
        if self._header_cols is None:
            try:
                with open(self.path, "rb") as f:
                    header = f.readline().rstrip(b"\n").decode(
                        "utf-8", errors="replace"
                    )
                self._header_cols = csv_row(header)
            except OSError:
                self._header_cols = []
        return self._header_cols

    def fetch(self, uid: str) -> Optional[MetaData]:
        info = self.uid_to_meta.get(uid)
        if info is None:
            return None
        return self.fetch_info(info)

    def fetch_info(self, info: MetaInfo) -> MetaData:
        with self._cache_lock:
            cached = self._row_cache.get(info.file_offset)
            if cached is not None:
                self._row_cache.move_to_end(info.file_offset)
                return cached
        result = self._fetch_uncached(info)
        with self._cache_lock:
            self._row_cache[info.file_offset] = result
            if len(self._row_cache) > self.ROW_CACHE_SIZE:
                self._row_cache.popitem(last=False)
        return result

    def _fetch_uncached(self, info: MetaInfo) -> MetaData:
        result = MetaData()
        try:
            with open(self.path, "rb") as f:
                f.seek(info.file_offset)
                line = f.readline().rstrip(b"\n").decode("utf-8", errors="replace")
        except OSError:
            return result
        r = csv_row(line)
        cols = self._columns()

        def get(name: str) -> str:
            try:
                i = cols.index(name)
            except ValueError:
                return ""
            return r[i] if len(r) > i else ""

        result.url = get("url")
        result.publish_time = get("publish_time")
        result.author = first_author_et_al(get("authors"))
        result.title = get("title")
        result.abstract = get("abstract")
        return result
