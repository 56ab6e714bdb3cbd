"""POST /api/add_document: CORD-19 slice zip -> new segment -> reload.

The reference ships this endpoint hard-disabled (503,
src/api_add_document.cpp:536-541) with a full pipeline behind it: multipart
zip intake, extraction, slice-root discovery (dir containing metadata.csv),
CSV -> forward index -> barrels, manifest append, engine reload
(:79-526). Ours is enabled with NEXTSEARCH_ENABLE_ADD_DOCUMENT=1 and runs
the vectorized build pipeline (tools/forwardindex + segmentio) followed by
an atomic publish: the new segment directory is written completely, the
manifest is swapped, and only then does reload() load the new device arrays.

Accepted bodies: multipart/form-data with a file part, or a raw zip
(application/zip / application/octet-stream).
"""

from __future__ import annotations

import io
import re
import shutil
import sys
import tempfile
import zipfile
from pathlib import Path
from typing import Optional, Tuple

from ..utils.logging import log
from ..index.builder import build_segment_arrays
from ..index.segmentio import discover_segments, save_manifest, seg_name, write_segment
from ..tools.adddocument import next_seg_id
from ..tools.forwardindex import iter_cord_docs


def extract_upload(headers, body: bytes) -> Optional[bytes]:
    """Pull the zip payload out of the request body."""
    ctype = headers.get("Content-Type", "") if headers else ""
    if "multipart/form-data" in ctype:
        m = re.search(r'boundary="?([^";]+)"?', ctype)
        if not m:
            return None
        boundary = ("--" + m.group(1)).encode()
        for part in body.split(boundary):
            if b"\r\n\r\n" not in part:
                continue
            head, _, payload = part.partition(b"\r\n\r\n")
            if b"filename=" in head:
                return payload.rstrip(b"\r\n-")
        return None
    return body if body else None


def find_slice_root(root: Path) -> Optional[Path]:
    """Directory containing metadata.csv (top level or one level deep)."""
    if (root / "metadata.csv").exists():
        return root
    for child in sorted(root.iterdir()):
        if child.is_dir() and (child / "metadata.csv").exists():
            return child
    for meta in sorted(root.rglob("metadata.csv")):
        return meta.parent
    return None


def handle_add_document(ctx, headers, body: bytes) -> Tuple[int, dict]:
    engine = ctx.engine
    payload = extract_upload(headers, body)
    if not payload:
        return 400, {"error": "missing upload payload"}

    workdir = Path(tempfile.mkdtemp(prefix="nextsearch_upload_"))
    try:
        try:
            with zipfile.ZipFile(io.BytesIO(payload)) as z:
                names = z.namelist()
                for n in names:  # zip-slip guard
                    p = (workdir / n).resolve()
                    if not str(p).startswith(str(workdir.resolve())):
                        return 400, {"error": "invalid zip entry path"}
                z.extractall(workdir)
        except zipfile.BadZipFile:
            return 400, {"error": "upload is not a valid zip archive"}

        slice_root = find_slice_root(workdir)
        if slice_root is None:
            return 400, {"error": "zip does not contain metadata.csv"}

        try:
            seg = build_segment_arrays(
                iter_cord_docs(slice_root, log_every=0), with_scores=False
            )
        except (OSError, ValueError) as e:
            return 400, {"error": f"failed to build segment: {e}"}
        if seg.N == 0:
            return 400, {"error": "slice produced no indexable documents"}

        index_dir = Path(engine.index_dir)
        with engine.mtx:
            seg_names = discover_segments(index_dir)
            new_name = seg_name(next_seg_id(seg_names))
            segdir = index_dir / "segments" / new_name
            write_segment(seg, segdir, barrels=True)
            save_manifest(index_dir / "manifest.bin", list(seg_names) + [new_name])
            reloaded = engine.reload()
        log("add_document", f"published {new_name}: {seg.N} docs, "
            f"{seg.num_terms} terms")
        return 200, {
            "success": True,
            "segment": new_name,
            "docs": seg.N,
            "terms": seg.num_terms,
            "reloaded": reloaded,
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
