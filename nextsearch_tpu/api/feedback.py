"""Feedback manager + request validation.

Parity contract (reference: src/api_feedback.cpp):
  - deque of JSON entries ring-capped at 500, persisted to feedback.json as
    {count, max_entries, entries} on every add
  - entries get an ISO local timestamp with milliseconds + "Z" if absent
  - POST validation: message (string) required; type in {anonymous,
    replyable}; replyable requires a non-empty email string; anonymous
    forces email to null when present (:155-238)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from collections import deque
from pathlib import Path
from typing import Optional, Tuple

from ..utils.logging import log

MAX_FEEDBACK_ENTRIES = 500


class FeedbackManager:
    def __init__(self, storage_path: str | os.PathLike = "feedback.json"):
        self.feedback_file = Path(storage_path)
        if self.feedback_file.parent != Path(""):
            self.feedback_file.parent.mkdir(parents=True, exist_ok=True)
        self._entries: deque = deque()
        self._lock = threading.Lock()
        self._load()
        log("feedback", f"Initialized with {len(self._entries)} existing "
            f"entries (max: {MAX_FEEDBACK_ENTRIES})")

    def add_feedback(self, feedback_data: dict) -> bool:
        with self._lock:
            try:
                entry = dict(feedback_data)
                if "timestamp" not in entry:
                    now = time.time()
                    ms = int((now % 1) * 1000)
                    entry["timestamp"] = (
                        time.strftime("%Y-%m-%dT%H:%M:%S", time.localtime(now))
                        + f".{ms:03d}Z"
                    )
                self._entries.append(entry)
                while len(self._entries) > MAX_FEEDBACK_ENTRIES:
                    self._entries.popleft()
                self._save_locked()
                return True
            except (OSError, ValueError) as e:
                log("feedback", f"Error adding entry: {e}")
                return False

    def get_all_feedback(self) -> dict:
        with self._lock:
            return {
                "count": len(self._entries),
                "max_entries": MAX_FEEDBACK_ENTRIES,
                "entries": list(self._entries),
            }

    def get_count(self) -> int:
        with self._lock:
            return len(self._entries)

    def _load(self) -> None:
        if not self.feedback_file.exists():
            return
        try:
            j = json.loads(self.feedback_file.read_text(encoding="utf-8"))
            entries = j.get("entries")
            if isinstance(entries, list):
                self._entries = deque(entries)
                while len(self._entries) > MAX_FEEDBACK_ENTRIES:
                    self._entries.popleft()
        except (OSError, ValueError) as e:
            log("feedback", f"Error loading from file: {e}")

    def _save_locked(self) -> None:
        try:
            j = {
                "count": len(self._entries),
                "max_entries": MAX_FEEDBACK_ENTRIES,
                "entries": list(self._entries),
            }
            self.feedback_file.write_text(json.dumps(j, indent=2), encoding="utf-8")
        except OSError as e:
            log("feedback", f"Error saving to file: {e}")


def validate_and_add(
    manager: FeedbackManager, body: bytes
) -> Tuple[int, dict]:
    """Validate a POST /api/feedback body; returns (status, response JSON)."""
    try:
        request_body = json.loads(body)
    except ValueError as e:
        return 400, {"error": "invalid JSON in request body", "details": str(e)}
    if not isinstance(request_body, dict):
        return 400, {"error": "invalid JSON in request body",
                     "details": "body must be an object"}

    msg = request_body.get("message")
    if not isinstance(msg, str):
        return 400, {"error": "missing or invalid 'message' field"}
    ftype = request_body.get("type")
    if not isinstance(ftype, str):
        return 400, {"error": "missing or invalid 'type' field"}
    if ftype not in ("anonymous", "replyable"):
        return 400, {"error": "type must be 'anonymous' or 'replyable'"}
    if ftype == "replyable":
        email = request_body.get("email")
        if not isinstance(email, str) or not email:
            return 400, {"error": "email is required for 'replyable' type feedback"}
    else:
        if "email" in request_body and request_body["email"] is not None:
            request_body["email"] = None

    if manager.add_feedback(request_body):
        return 200, {
            "success": True,
            "message": "Feedback received successfully",
            "total_count": manager.get_count(),
        }
    return 500, {"error": "Failed to save feedback"}
