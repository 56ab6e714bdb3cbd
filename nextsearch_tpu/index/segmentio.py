"""Reference-compatible binary segment IO.

Reads and writes the exact on-disk formats of the C++ engine so indexes are
interchangeable in both directions:

  manifest.bin   u32 count + length-prefixed segment names
                 (src/api_segment.cpp:14-35)
  stats.bin      u32 N, f32 avgdl                  (src/ForwardIndex.cpp:201-206)
  docs.bin       u32 N + per doc: str cord_uid, str title, str relpath,
                 u32 doc_len                        (src/ForwardIndex.cpp:189-199)
  forward.bin    u32 N + per doc: u32 cnt + (u32 termId, u32 tf)*cnt,
                 termId ascending                   (src/ForwardIndex.cpp:209-218)
  terms.bin      u32 T + length-prefixed terms in first-encounter termId order
                 (src/ForwardIndex.cpp:221-227)
  barrels.bin    u32 barrel_count (64), u32 terms_per_barrel
                 (include/barrels.hpp:26-39)
  lexicon_bNNN   u32 tcount + per term: str term, u32 termId, u32 df,
                 u64 offset, u32 count (== df)      (src/lexicon.cpp:110-115)
  inverted_bNNN  (u32 docId, u32 tf)* per term at `offset`, docId ascending
  lexicon.bin /  legacy single-file variant          (src/api_segment.cpp:45-67)
  inverted.bin

All integers are little-endian (x86 struct layout of the reference).
"""

from __future__ import annotations

import os
import struct
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .builder import SegmentArrays, eager_scores

BARREL_COUNT = 64  # include/barrels.hpp:12

_u32 = struct.Struct("<I")
_u64 = struct.Struct("<Q")
_f32 = struct.Struct("<f")


def _w_u32(f, v: int) -> None:
    f.write(_u32.pack(v & 0xFFFFFFFF))


def _w_u64(f, v: int) -> None:
    f.write(_u64.pack(v))


def _w_f32(f, v: float) -> None:
    f.write(_f32.pack(v))


def _w_str(f, s: str) -> None:
    data = s.encode("utf-8", errors="surrogatepass")
    _w_u32(f, len(data))
    f.write(data)


class _Reader:
    def __init__(self, path: Path):
        self.data = Path(path).read_bytes()
        self.pos = 0

    def u32(self) -> int:
        v = _u32.unpack_from(self.data, self.pos)[0]
        self.pos += 4
        return v

    def u64(self) -> int:
        v = _u64.unpack_from(self.data, self.pos)[0]
        self.pos += 8
        return v

    def f32(self) -> float:
        v = _f32.unpack_from(self.data, self.pos)[0]
        self.pos += 4
        return v

    def str_(self) -> str:
        n = self.u32()
        s = self.data[self.pos : self.pos + n].decode("utf-8", errors="replace")
        self.pos += n
        return s


# ---------------- manifest ----------------

def seg_name(seg_id: int) -> str:
    """Zero-padded segment dir name (src/api_segment.cpp:38-42)."""
    return f"seg_{seg_id:06d}"


def load_manifest(manifest_path: str | os.PathLike) -> List[str]:
    p = Path(manifest_path)
    if not p.exists():
        return []
    r = _Reader(p)
    try:
        n = r.u32()
        return [r.str_() for _ in range(n)]
    except struct.error:
        return []


def save_manifest(manifest_path: str | os.PathLike, segs: Sequence[str]) -> None:
    with open(manifest_path, "wb") as f:
        _w_u32(f, len(segs))
        for s in segs:
            _w_str(f, s)


# ---------------- barrels ----------------

def barrel_suffix(barrel_id: int) -> str:
    return f"{barrel_id:03d}"


def inv_barrel_path(segdir: Path, barrel_id: int) -> Path:
    return segdir / f"inverted_b{barrel_suffix(barrel_id)}.bin"


def lex_barrel_path(segdir: Path, barrel_id: int) -> Path:
    return segdir / f"lexicon_b{barrel_suffix(barrel_id)}.bin"


def barrel_for_term(term_id: int, barrel_count: int, terms_per_barrel: int) -> int:
    if terms_per_barrel == 0:
        return 0
    return min(term_id // terms_per_barrel, barrel_count - 1)


def has_barrels(segdir: Path) -> bool:
    return (
        (segdir / "barrels.bin").exists()
        and inv_barrel_path(segdir, 0).exists()
        and lex_barrel_path(segdir, 0).exists()
    )


# ---------------- segment write ----------------

def write_segment(
    seg: SegmentArrays,
    segdir: str | os.PathLike,
    barrels: bool = True,
    write_forward: bool = True,
    stages: str = "all",
) -> None:
    """Write a SegmentArrays as a reference-format segment directory.

    stages: "all" (everything), "forward" (docs/stats/forward/terms only —
    the forwardindex CLI stage), or "inverted" (lexicon+postings only — the
    lexicon CLI stage).
    """
    segdir = Path(segdir)
    segdir.mkdir(parents=True, exist_ok=True)
    T = seg.num_terms
    do_fwd = stages in ("all", "forward")
    do_inv = stages in ("all", "inverted")

    # Legacy first-encounter termId order (terms.bin / barrel assignment).
    legacy_ids = seg.legacy_ids
    if legacy_ids is None:
        legacy_ids = np.arange(T, dtype=np.int32)
    legacy_terms: List[Optional[str]] = [None] * T
    sorted_idx_of_legacy = np.empty(T, np.int64)
    for si in range(T):
        lid = int(legacy_ids[si])
        legacy_terms[lid] = seg.terms[si]
        sorted_idx_of_legacy[lid] = si

    if do_fwd:
        _write_forward_stage(seg, segdir, legacy_ids, legacy_terms, write_forward)
    if not do_inv:
        return

    if barrels:
        _write_barrels_stage(seg, segdir, sorted_idx_of_legacy)
    else:
        _write_legacy_stage(seg, segdir, sorted_idx_of_legacy)


def _write_forward_stage(seg, segdir, legacy_ids, legacy_terms, write_forward):
    with open(segdir / "docs.bin", "wb") as f:
        _w_u32(f, seg.N)
        titles = seg.titles or [""] * seg.N
        relpaths = seg.relpaths or [""] * seg.N
        for i in range(seg.N):
            _w_str(f, seg.cord_uids[i])
            _w_str(f, titles[i] if i < len(titles) else "")
            _w_str(f, relpaths[i] if i < len(relpaths) else "")
            _w_u32(f, int(seg.doc_len[i]))

    with open(segdir / "stats.bin", "wb") as f:
        _w_u32(f, seg.N)
        _w_f32(f, seg.avgdl)

    with open(segdir / "terms.bin", "wb") as f:
        _w_u32(f, len(legacy_terms))
        for t in legacy_terms:
            _w_str(f, t or "")

    if write_forward:
        # Rebuild doc-major (termId asc) forward lists from the CSR arrays.
        legacy_per_post = np.repeat(
            legacy_ids.astype(np.int64), np.diff(seg.term_offsets)
        )
        order = np.lexsort((legacy_per_post, seg.post_doc))
        fdoc = seg.post_doc[order]
        ftid = legacy_per_post[order]
        ftf = seg.post_tf[order]
        counts = np.bincount(fdoc, minlength=seg.N)
        with open(segdir / "forward.bin", "wb") as f:
            _w_u32(f, seg.N)
            pos = 0
            for i in range(seg.N):
                c = int(counts[i])
                _w_u32(f, c)
                pairs = np.empty(2 * c, np.uint32)
                pairs[0::2] = ftid[pos : pos + c]
                pairs[1::2] = ftf[pos : pos + c]
                f.write(pairs.astype("<u4").tobytes())
                pos += c


def _write_barrels_stage(seg, segdir, sorted_idx_of_legacy):
    T = seg.num_terms
    terms_per_barrel = max(1, (T + BARREL_COUNT - 1) // BARREL_COUNT)
    with open(segdir / "barrels.bin", "wb") as f:
        _w_u32(f, BARREL_COUNT)
        _w_u32(f, terms_per_barrel)
    inv_files = [open(inv_barrel_path(segdir, b), "wb") for b in range(BARREL_COUNT)]
    lex_files = [open(lex_barrel_path(segdir, b), "wb") for b in range(BARREL_COUNT)]
    offsets = [0] * BARREL_COUNT
    counts_b = [0] * BARREL_COUNT
    try:
        for f in lex_files:
            _w_u32(f, 0)  # placeholder patched below
        for lid in range(T):
            si = int(sorted_idx_of_legacy[lid])
            lo, hi = int(seg.term_offsets[si]), int(seg.term_offsets[si + 1])
            df = hi - lo
            if df == 0:
                continue
            b = barrel_for_term(lid, BARREL_COUNT, terms_per_barrel)
            counts_b[b] += 1
            lf = lex_files[b]
            _w_str(lf, seg.terms[si])
            _w_u32(lf, lid)
            _w_u32(lf, df)
            _w_u64(lf, offsets[b])
            _w_u32(lf, df)
            pairs = np.empty(2 * df, np.uint32)
            pairs[0::2] = seg.post_doc[lo:hi]
            pairs[1::2] = seg.post_tf[lo:hi]
            inv_files[b].write(pairs.astype("<u4").tobytes())
            offsets[b] += df * 8
    finally:
        for f in inv_files + lex_files:
            f.close()
    for b in range(BARREL_COUNT):
        with open(lex_barrel_path(segdir, b), "r+b") as f:
            f.seek(0)
            _w_u32(f, counts_b[b])


def _write_legacy_stage(seg, segdir, sorted_idx_of_legacy):
    T = seg.num_terms
    # Legacy single lexicon.bin/inverted.bin.
    with open(segdir / "lexicon.bin", "wb") as lf, open(
        segdir / "inverted.bin", "wb"
    ) as invf:
        nonempty = [
            lid for lid in range(T)
            if seg.term_offsets[int(sorted_idx_of_legacy[lid]) + 1]
            > seg.term_offsets[int(sorted_idx_of_legacy[lid])]
        ]
        _w_u32(lf, len(nonempty))
        offset = 0
        for lid in nonempty:
            si = int(sorted_idx_of_legacy[lid])
            lo, hi = int(seg.term_offsets[si]), int(seg.term_offsets[si + 1])
            df = hi - lo
            _w_str(lf, seg.terms[si])
            _w_u32(lf, lid)
            _w_u32(lf, df)
            _w_u64(lf, offset)
            _w_u32(lf, df)
            pairs = np.empty(2 * df, np.uint32)
            pairs[0::2] = seg.post_doc[lo:hi]
            pairs[1::2] = seg.post_tf[lo:hi]
            invf.write(pairs.astype("<u4").tobytes())
            offset += df * 8


# ---------------- segment read ----------------

def _read_lex_entries(r: _Reader, barrel_id: int):
    tcount = r.u32()
    out = []
    for _ in range(tcount):
        term = r.str_()
        term_id = r.u32()
        df = r.u32()
        offset = r.u64()
        count = r.u32()
        out.append((term, term_id, df, offset, count, barrel_id))
    return out


def load_segment(
    segdir: str | os.PathLike,
    with_scores: bool = True,
    k1: float = 1.2,
    b: float = 0.75,
) -> SegmentArrays:
    """Load a reference-format segment directory into SegmentArrays."""
    segdir = Path(segdir)

    r = _Reader(segdir / "stats.bin")
    N = r.u32()
    avgdl = r.f32()

    r = _Reader(segdir / "docs.bin")
    n = r.u32()
    cord_uids: List[str] = []
    titles: List[str] = []
    relpaths: List[str] = []
    doc_len = np.zeros(n, np.int32)
    for i in range(n):
        cord_uids.append(r.str_())
        titles.append(r.str_())
        relpaths.append(r.str_())
        doc_len[i] = r.u32()

    entries = []  # (term, legacy_id, df, offset, count, barrel)
    inv_blobs: Dict[int, bytes] = {}
    if has_barrels(segdir):
        br = _Reader(segdir / "barrels.bin")
        barrel_count = br.u32()
        _terms_per_barrel = br.u32()
        for bid in range(barrel_count):
            lr = _Reader(lex_barrel_path(segdir, bid))
            entries.extend(_read_lex_entries(lr, bid))
            inv_blobs[bid] = Path(inv_barrel_path(segdir, bid)).read_bytes()
    else:
        lr = _Reader(segdir / "lexicon.bin")
        entries.extend(_read_lex_entries(lr, 0))
        inv_blobs[0] = Path(segdir / "inverted.bin").read_bytes()

    entries.sort(key=lambda e: e[0])  # lexicographic term order
    T = len(entries)
    terms = [e[0] for e in entries]
    legacy_ids = np.array([e[1] for e in entries], np.int32)
    term_df = np.array([e[2] for e in entries], np.int32)
    term_offsets = np.zeros(T + 1, np.int64)
    np.cumsum(term_df, out=term_offsets[1:])
    P = int(term_offsets[-1])
    post_doc = np.zeros(P, np.int32)
    post_tf = np.zeros(P, np.int32)
    for i, (_t, _lid, df, offset, count, bid) in enumerate(entries):
        lo = int(term_offsets[i])
        blob = inv_blobs[bid]
        pairs = np.frombuffer(blob, dtype="<u4", count=2 * count, offset=int(offset))
        post_doc[lo : lo + count] = pairs[0::2]
        post_tf[lo : lo + count] = pairs[1::2]

    seg = SegmentArrays(
        terms=terms,
        term_df=term_df,
        term_offsets=term_offsets,
        post_doc=post_doc,
        post_tf=post_tf,
        doc_len=doc_len,
        N=N,
        avgdl=avgdl,
        cord_uids=cord_uids,
        titles=titles,
        relpaths=relpaths,
        legacy_ids=legacy_ids,
    )
    if with_scores:
        seg.post_score = eager_scores(seg, k1=k1, b=b)
    return seg


class SegmentWriter:
    """Incremental in-memory segment builder (reference SegmentWriter,
    include/segment_writer.hpp — dead code there, canonical here).

    add_document() streams documents in; write() emits a complete
    reference-format segment directory (docs/stats/forward/terms + barrels).
    """

    def __init__(self):
        self._docs: List[dict] = []

    def add_document(
        self,
        cord_uid: str,
        text: str,
        title: str = "",
        relpath: str = "",
    ) -> None:
        self._docs.append(
            {"cord_uid": cord_uid, "text": text, "title": title, "relpath": relpath}
        )

    @property
    def num_documents(self) -> int:
        return len(self._docs)

    def build(self) -> SegmentArrays:
        from .builder import build_segment_arrays

        return build_segment_arrays(self._docs, with_scores=False)

    def write(self, segdir: str | os.PathLike, barrels: bool = True) -> SegmentArrays:
        seg = self.build()
        write_segment(seg, segdir, barrels=barrels)
        return seg


def load_forward_stage(segdir: str | os.PathLike) -> SegmentArrays:
    """Rebuild SegmentArrays by inverting forward.bin (the lexicon CLI stage).

    Mirrors src/lexicon.cpp:16-73: reads terms.bin + forward.bin (+ docs/stats
    for doc metadata) and produces term-major postings sorted by docId.
    """
    segdir = Path(segdir)

    r = _Reader(segdir / "stats.bin")
    N = r.u32()
    avgdl = r.f32()

    r = _Reader(segdir / "docs.bin")
    n = r.u32()
    cord_uids, titles, relpaths = [], [], []
    doc_len = np.zeros(n, np.int32)
    for i in range(n):
        cord_uids.append(r.str_())
        titles.append(r.str_())
        relpaths.append(r.str_())
        doc_len[i] = r.u32()

    r = _Reader(segdir / "terms.bin")
    T = r.u32()
    legacy_terms = [r.str_() for _ in range(T)]

    r = _Reader(segdir / "forward.bin")
    ndocs = r.u32()
    tid_parts, tf_parts, doc_parts = [], [], []
    for doc_id in range(ndocs):
        cnt = r.u32()
        pairs = np.frombuffer(r.data, dtype="<u4", count=2 * cnt, offset=r.pos)
        r.pos += 8 * cnt
        tid_parts.append(pairs[0::2].astype(np.int64))
        tf_parts.append(pairs[1::2].astype(np.int32))
        doc_parts.append(np.full(cnt, doc_id, np.int32))

    all_tids = np.concatenate(tid_parts) if tid_parts else np.empty(0, np.int64)
    all_tfs = np.concatenate(tf_parts) if tf_parts else np.empty(0, np.int32)
    all_docs = np.concatenate(doc_parts) if doc_parts else np.empty(0, np.int32)
    keep = all_tids < T  # lexicon.cpp:69 skips out-of-range termIds
    all_tids, all_tfs, all_docs = all_tids[keep], all_tfs[keep], all_docs[keep]

    sort_order = np.argsort(np.asarray(legacy_terms, dtype=object), kind="stable")
    terms = [legacy_terms[i] for i in sort_order]
    rank = np.empty(T, np.int64)
    rank[sort_order] = np.arange(T)

    post_rank = rank[all_tids]
    order = np.argsort(post_rank, kind="stable")
    term_df = np.bincount(post_rank, minlength=T).astype(np.int32)
    term_offsets = np.zeros(T + 1, np.int64)
    np.cumsum(term_df, out=term_offsets[1:])

    return SegmentArrays(
        terms=terms,
        term_df=term_df,
        term_offsets=term_offsets,
        post_doc=all_docs[order].astype(np.int32),
        post_tf=all_tfs[order].astype(np.int32),
        doc_len=doc_len,
        N=N,
        avgdl=avgdl,
        cord_uids=cord_uids,
        titles=titles,
        relpaths=relpaths,
        legacy_ids=np.asarray(sort_order, np.int32),
    )


def discover_segments(index_dir: str | os.PathLike) -> List[str]:
    """manifest.bin, falling back to a sorted scan of segments/seg_*

    (src/api_engine.cpp:57-70).
    """
    index_dir = Path(index_dir)
    names = load_manifest(index_dir / "manifest.bin")
    if names:
        return names
    segroot = index_dir / "segments"
    if segroot.is_dir():
        names = sorted(
            p.name for p in segroot.iterdir() if p.is_dir() and p.name.startswith("seg_")
        )
    return names
