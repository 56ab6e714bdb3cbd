"""Stats tracker with JSON persistence.

Parity contract (reference: include/api_stats.hpp):
  - counters: total_searches, search_cache_hits, ai_overview_calls,
    ai_overview_cache_hits, ai_summary_calls, ai_summary_cache_hits,
    ai_api_calls_remaining (default 10000), ai_api_calls_used
  - every increment persists stats.json with a last_updated UTC timestamp
  - decrement_ai_api_calls floors at 0 (CAS loop :71-84) and bumps used
  - get_stats_json re-reads stats.json from disk to honor manual edits
    (:102-113), computes the three cache hit rates, and embeds the last 10
    feedback entries + total feedback count
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path
from typing import Optional

from ..utils.logging import log

_FIELDS = (
    "total_searches",
    "search_cache_hits",
    "ai_overview_calls",
    "ai_overview_cache_hits",
    "ai_summary_calls",
    "ai_summary_cache_hits",
    "ai_api_calls_remaining",
    "ai_api_calls_used",
)


class StatsTracker:
    def __init__(
        self,
        storage_path: str | os.PathLike = "stats.json",
        flush_ms: float = 0.0,
    ):
        """flush_ms=0 (default): persist synchronously on every increment —
        the reference's semantics (include/api_stats.hpp:37-45). flush_ms>0:
        write-behind — increments mark dirty, a daemon thread persists at
        most once per flush_ms. A full-file write per counter bump caps a
        1-core host at ~10k increments/s, so the serving front enables the
        bounded-staleness mode (NEXTSEARCH_STATS_FLUSH_MS)."""
        self.stats_file = Path(storage_path)
        self._lock = threading.Lock()
        self.total_searches = 0
        self.search_cache_hits = 0
        self.ai_overview_calls = 0
        self.ai_overview_cache_hits = 0
        self.ai_summary_calls = 0
        self.ai_summary_cache_hits = 0
        self.ai_api_calls_remaining = 10000
        self.ai_api_calls_used = 0
        self._load()
        self._dirty = False
        self._flush_ms = float(flush_ms)
        if self._flush_ms > 0:
            self._flush_stop = threading.Event()
            t = threading.Thread(
                target=self._flush_loop, name="stats-flush", daemon=True
            )
            t.start()

    # ---------------- counters ----------------

    def _bump(self, field: str, delta: int = 1) -> None:
        with self._lock:
            setattr(self, field, getattr(self, field) + delta)
            if self._flush_ms > 0:
                self._dirty = True
            else:
                self._save_locked()

    def increment_searches(self, n: int = 1):
        self._bump("total_searches", n)

    def increment_search_cache_hits(self, n: int = 1):
        self._bump("search_cache_hits", n)

    def increment_ai_overview_calls(self):
        self._bump("ai_overview_calls")

    def increment_ai_overview_cache_hits(self):
        self._bump("ai_overview_cache_hits")

    def increment_ai_summary_calls(self):
        self._bump("ai_summary_calls")

    def increment_ai_summary_cache_hits(self):
        self._bump("ai_summary_cache_hits")

    def decrement_ai_api_calls(self):
        with self._lock:
            if self.ai_api_calls_remaining > 0:
                self.ai_api_calls_remaining -= 1
                self.ai_api_calls_used += 1
                self._save_locked()

    def get_ai_api_calls_remaining(self) -> int:
        with self._lock:
            return self.ai_api_calls_remaining

    def set_ai_api_calls_limit(self, limit: int) -> None:
        with self._lock:
            self.ai_api_calls_remaining = int(limit)
            self._save_locked()

    # ---------------- persistence ----------------

    def _flush_loop(self) -> None:
        while not self._flush_stop.wait(self._flush_ms / 1000.0):
            self.flush()

    def flush(self) -> None:
        """Persist now if dirty (write-behind mode; also call at shutdown)."""
        with self._lock:
            if self._dirty:
                self._dirty = False
                self._save_locked()

    def _load(self) -> None:
        if not self.stats_file.exists():
            log("stats", f"No existing stats file found at: {self.stats_file}")
            return
        try:
            j = json.loads(self.stats_file.read_text(encoding="utf-8"))
            for f in _FIELDS:
                if f in j:
                    setattr(self, f, int(j[f]))
        except (OSError, ValueError) as e:
            log("stats", f"Error loading from file: {e}")

    def _save_locked(self) -> None:
        try:
            j = {f: getattr(self, f) for f in _FIELDS}
            j["last_updated"] = time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            )
            self.stats_file.write_text(json.dumps(j, indent=2), encoding="utf-8")
        except OSError as e:
            log("stats", f"Error saving to file: {e}")

    # ---------------- reporting ----------------

    def get_stats_json(self, feedback_manager=None) -> dict:
        stats: dict = {}
        # Honor manual edits: read the file back when present.
        if self.stats_file.exists():
            try:
                stats = json.loads(self.stats_file.read_text(encoding="utf-8"))
                if not isinstance(stats, dict):
                    stats = {}
            except (OSError, ValueError) as e:
                log("stats", f"Error reading from file: {e}")
                stats = {}
        if not stats:
            with self._lock:
                stats = {f: getattr(self, f) for f in _FIELDS}

        total = stats.get("total_searches", 0) or 0
        hits = stats.get("search_cache_hits", 0) or 0
        stats["search_cache_hit_rate"] = (hits / total) if total > 0 else 0.0
        ov_total = stats.get("ai_overview_calls", 0) or 0
        ov_hits = stats.get("ai_overview_cache_hits", 0) or 0
        stats["ai_overview_cache_hit_rate"] = (
            (ov_hits / ov_total) if ov_total > 0 else 0.0
        )
        sm_total = stats.get("ai_summary_calls", 0) or 0
        sm_hits = stats.get("ai_summary_cache_hits", 0) or 0
        stats["ai_summary_cache_hit_rate"] = (
            (sm_hits / sm_total) if sm_total > 0 else 0.0
        )

        last10 = []
        total_fb = 0
        if feedback_manager is not None:
            all_fb = feedback_manager.get_all_feedback()
            entries = all_fb.get("entries", [])
            last10 = entries[-10:]
            total_fb = all_fb.get("count", 0)
        stats["last_10_feedback"] = last10
        stats["total_feedback_count"] = total_fb
        return stats
