"""Request-batching queue: coalesce concurrent searches into one launch.

The reference serializes every search behind an engine-wide mutex
(include/api_engine.hpp:62). Here concurrent HTTP threads submit into a
queue; a dispatcher thread drains up to `max_batch` requests within a
`window_ms` coalescing window and runs them as ONE batched device kernel
(Engine.search_batch), amortizing kernel launches across requests — the
BASELINE.json north-star serving pattern.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Tuple

from ..config import BatchingConfig


class MicroBatcher:
    """Generic coalescing dispatcher: many submit() -> one batch_fn call."""

    def __init__(self, batch_fn, config: BatchingConfig, name: str = "batcher"):
        self.batch_fn = batch_fn
        self.config = config
        self._q: "queue.Queue[Tuple[object, Future]]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, name=name, daemon=True)
        self._thread.start()

    def submit(self, request) -> Future:
        fut: Future = Future()
        self._q.put((request, fut))
        return fut

    def call(self, request):
        return self.submit(request).result()

    def shutdown(self) -> None:
        self._stop.set()
        self._q.put((None, None))  # wake the dispatcher
        self._thread.join(timeout=2)

    def _run(self) -> None:
        window_s = self.config.window_ms / 1000.0
        while not self._stop.is_set():
            try:
                item = self._q.get(timeout=0.2)
            except queue.Empty:
                continue
            if item[1] is None:
                continue
            batch: List[Tuple[object, Future]] = [item]
            # Coalesce whatever arrives within ONE window, up to max_batch.
            deadline = time.monotonic() + window_s
            while len(batch) < self.config.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt[1] is None:
                    continue
                batch.append(nxt)
            try:
                results = self.batch_fn([req for req, _ in batch])
                for (_req, fut), res in zip(batch, results):
                    fut.set_result(res)
            except Exception as e:  # propagate to all waiters
                for _req, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)


class SearchBatcher(MicroBatcher):
    def __init__(self, engine, config: BatchingConfig):
        super().__init__(engine.search_batch, config, name="search-batcher")
        self.engine = engine

    def search(self, query: str, k: int) -> dict:
        return self.call((query, k))


class SuggestBatcher(MicroBatcher):
    """Coalesce /api/suggest lookups into one prefix-range device launch."""

    def __init__(self, engine, config: BatchingConfig):
        def batch_fn(requests):
            # Snapshot the autocomplete table instead of holding engine.mtx
            # through the device launch: reload() swaps engine.ac atomically
            # (engine.reload builds new_ac then assigns), so suggests never
            # serialize behind a slow search/reload.
            ac = engine.ac
            if ac.empty():
                return [[] for _ in requests]
            # group by limit (kernel L is static); usually one group
            out = [None] * len(requests)
            by_limit = {}
            for i, (q, lim) in enumerate(requests):
                by_limit.setdefault(lim, []).append((i, q))
            for lim, items in by_limit.items():
                res = ac.suggest_batch([q for _, q in items], lim)
                for (i, _q), r in zip(items, res):
                    out[i] = r
            return out

        super().__init__(batch_fn, config, name="suggest-batcher")
        self.engine = engine

    def suggest(self, user_input: str, limit: int) -> list:
        return self.call((user_input, limit))
