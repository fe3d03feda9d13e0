"""Observability: append-only JSONL log stream with correlation ids,
sensitive-key redaction, and counter metrics (reference
polla_app/pipeline.py:228-254 `_JSONLogStream`, obs.py:23-107).

Driver-side by design: the log stream is observability, not data
(SURVEY.md §1.3) — executors never write logs through this; their
failures surface as data columns and arrive here via collected rows.
"""

from __future__ import annotations

import datetime as dt
import json
from pathlib import Path
from typing import Any

from .errors import redact_mapping


class JsonLogStream:
    """Append-only JSONL sink; stamps timestamp + correlation_id and
    redacts sensitive keys on every event."""

    def __init__(self, path: str | Path | None, correlation_id: str = "") -> None:
        self._path = Path(path) if path else None
        self.correlation_id = correlation_id
        if self._path:
            self._path.parent.mkdir(parents=True, exist_ok=True)

    def emit(self, event: str, **payload: Any) -> None:
        if self._path is None:
            return
        rec = {
            "timestamp": dt.datetime.now(dt.timezone.utc).isoformat(),
            "correlation_id": self.correlation_id,
            "event": event,
            **redact_mapping(payload),
        }
        with self._path.open("a", encoding="utf-8") as fh:
            fh.write(json.dumps(rec, ensure_ascii=False))
            fh.write("\n")

    def metric(self, name: str, *, kind: str = "counter", value: int = 1,
               tags: dict[str, Any] | None = None) -> None:
        """Counter metric as a structured event (reference
        obs.py:94-107 metric shape)."""
        self.emit("metric", metric=name, kind=kind, value=value, tags=tags or {})
