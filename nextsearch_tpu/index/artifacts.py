"""Device-artifact serialization: SegmentArrays <-> .npz checkpoints.

The reference-format binary segment (segmentio.py) is the interchange format;
this module adds the fast-reload path: one .npz per segment holding the
canonical arrays (including eager post_score), memory-mapped on load. For a
~1M-doc index this turns reload from a per-term Python parse into a handful
of bulk array reads — the framework's checkpoint/resume story (SURVEY.md §5:
restart = full resume from artifacts).

The artifact is a cache of the segment directory: engine.reload() uses it
when `device_arrays.npz` is newer than the segment's binary files and
rebuilds it otherwise.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional
from zipfile import BadZipFile as zipfile_error

import numpy as np

from .builder import SegmentArrays, eager_scores

ARTIFACT_NAME = "device_arrays.npz"
# v2: post_score idf uses the platform logf (utils/floatops.py) — v1
# artifacts carry np.log-rounded scores that differ by 1 ULP on ~20% of terms
FORMAT_VERSION = 2


def _encode_strs(strs) -> tuple[np.ndarray, np.ndarray]:
    blob = "\x00".join(strs).encode("utf-8", errors="surrogatepass")
    lens = np.fromiter(
        (len(s.encode("utf-8", errors="surrogatepass")) for s in strs),
        np.int64, count=len(strs),
    )
    return np.frombuffer(blob, np.uint8).copy(), lens


def _decode_strs(blob: np.ndarray, lens: np.ndarray) -> list:
    data = blob.tobytes()
    out = []
    pos = 0
    for ln in lens.tolist():
        out.append(data[pos : pos + ln].decode("utf-8", errors="surrogatepass"))
        pos += ln + 1  # skip the \x00 separator
    return out


def save_artifact(
    seg: SegmentArrays,
    segdir: str | os.PathLike,
    k1: float = 1.2,
    b: float = 0.75,
) -> Path:
    """Write the segment's canonical arrays as an .npz artifact.

    k1/b are recorded alongside the baked eager post_score so a later load
    with different BM25 params treats the artifact as stale instead of
    silently serving scores computed under the old ones.
    """
    segdir = Path(segdir)
    segdir.mkdir(parents=True, exist_ok=True)
    path = segdir / ARTIFACT_NAME
    post_score = seg.post_score
    if post_score is None:
        post_score = eager_scores(seg, k1=k1, b=b)
    terms_blob, terms_lens = _encode_strs(seg.terms)
    uids_blob, uids_lens = _encode_strs(seg.cord_uids)
    titles_blob, titles_lens = _encode_strs(seg.titles or [""] * seg.N)
    rel_blob, rel_lens = _encode_strs(seg.relpaths or [""] * seg.N)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(
        tmp,
        version=np.int64(FORMAT_VERSION),
        bm25_k1=np.float64(k1),
        bm25_b=np.float64(b),
        N=np.int64(seg.N),
        avgdl=np.float32(seg.avgdl),
        term_df=seg.term_df,
        term_offsets=seg.term_offsets,
        post_doc=seg.post_doc,
        post_tf=seg.post_tf,
        post_score=post_score,
        doc_len=seg.doc_len,
        legacy_ids=(
            seg.legacy_ids
            if seg.legacy_ids is not None
            else np.arange(seg.num_terms, dtype=np.int32)
        ),
        terms_blob=terms_blob,
        terms_lens=terms_lens,
        uids_blob=uids_blob,
        uids_lens=uids_lens,
        titles_blob=titles_blob,
        titles_lens=titles_lens,
        rel_blob=rel_blob,
        rel_lens=rel_lens,
    )
    tmp.replace(path)
    return path


def load_artifact(
    segdir: str | os.PathLike, k1: float = 1.2, b: float = 0.75
) -> Optional[SegmentArrays]:
    """Load an .npz artifact; None when absent, incompatible, or baked with
    different BM25 params than requested (post_score would be wrong)."""
    path = Path(segdir) / ARTIFACT_NAME
    if not path.exists():
        return None
    try:
        z = np.load(path)
        if int(z["version"]) != FORMAT_VERSION:
            return None
        if "bm25_k1" not in z or "bm25_b" not in z:
            return None  # pre-param artifact: treat as stale
        if float(z["bm25_k1"]) != float(k1) or float(z["bm25_b"]) != float(b):
            return None
        terms = _decode_strs(z["terms_blob"], z["terms_lens"])
        return SegmentArrays(
            terms=terms,
            term_df=z["term_df"],
            term_offsets=z["term_offsets"],
            post_doc=z["post_doc"],
            post_tf=z["post_tf"],
            doc_len=z["doc_len"],
            N=int(z["N"]),
            avgdl=float(z["avgdl"]),
            cord_uids=_decode_strs(z["uids_blob"], z["uids_lens"]),
            titles=_decode_strs(z["titles_blob"], z["titles_lens"]),
            relpaths=_decode_strs(z["rel_blob"], z["rel_lens"]),
            legacy_ids=z["legacy_ids"],
            post_score=z["post_score"],
        )
    except (OSError, ValueError, KeyError, zipfile_error):
        return None


def artifact_fresh(segdir: str | os.PathLike) -> bool:
    """True when the artifact is newer than every binary segment file."""
    segdir = Path(segdir)
    path = segdir / ARTIFACT_NAME
    if not path.exists():
        return False
    ts = path.stat().st_mtime
    for f in segdir.iterdir():
        if f.name == ARTIFACT_NAME or f.suffix == ".npz":
            continue
        if f.stat().st_mtime > ts:
            return False
    return True


def load_segment_cached(
    segdir: str | os.PathLike, k1: float = 1.2, b: float = 0.75
) -> SegmentArrays:
    """Artifact-first segment load, rebuilding the artifact when stale."""
    from .segmentio import load_segment

    if artifact_fresh(segdir):
        seg = load_artifact(segdir, k1=k1, b=b)
        if seg is not None:
            return seg
    seg = load_segment(segdir, with_scores=True, k1=k1, b=b)
    try:
        save_artifact(seg, segdir, k1=k1, b=b)
    except OSError:
        pass  # read-only index dirs still work, just without the cache
    return seg
