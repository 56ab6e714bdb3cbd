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
from concurrent.futures import Future
from typing import List, Tuple

from ..config import BatchingConfig


class SearchBatcher:
    def __init__(self, engine, config: BatchingConfig):
        self.engine = engine
        self.config = config
        self._q: "queue.Queue[Tuple[Tuple[str, int], Future]]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name="search-batcher", daemon=True
        )
        self._thread.start()

    def submit(self, query: str, k: int) -> Future:
        fut: Future = Future()
        self._q.put(((query, k), fut))
        return fut

    def search(self, query: str, k: int) -> dict:
        return self.submit(query, k).result()

    def shutdown(self) -> None:
        self._stop.set()
        self._q.put((("", 0), None))  # wake the dispatcher
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
            batch: List[Tuple[Tuple[str, int], Future]] = [item]
            # Coalesce whatever arrives within the window, up to max_batch.
            deadline = window_s
            while len(batch) < self.config.max_batch:
                try:
                    nxt = self._q.get(timeout=deadline)
                except queue.Empty:
                    break
                if nxt[1] is None:
                    continue
                batch.append(nxt)
            try:
                results = self.engine.search_batch([req for req, _ in batch])
                for (_req, fut), res in zip(batch, results):
                    fut.set_result(res)
            except Exception as e:  # propagate to all waiters
                for _req, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
