"""Watermark state for incremental batch processing.

Re-implements /root/reference/src/main/utility/watermark_manager.py
(semantics at :72-195): per-entity JSON documents holding
``last_processed_timestamp``, a read-fallback chain
(primary -> backup -> initial(now - lookback_days) -> default), a
late-data buffer subtracted when building the filter predicate, and
atomic write-temp-rename persistence (:237-281).

Engine differences:
 - the clock is injectable (``now_fn``) — the reference hardcodes
   ``datetime.now()``, making first-run watermarks untestable,
 - the filter is returned BOTH as a SQL string (reference behavior,
   applied post-read on CSV) and as a typed Column — on parquet the
   Column form push down to row-group pruning / partition pruning,
 - storage is a pluggable pair of (primary, backup) paths; on a
   cluster these are object-store URIs handled by the same code via
   fsspec-style open (plain ``open`` covers local + NFS here).

Structured Streaming's ``withWatermark(ts, "5 minutes")`` is the
streaming twin of the buffer (see streaming/ingest.py).
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable
from datetime import datetime, timedelta
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT = "%Y-%m-%d %H:%M:%S"


class WatermarkManager:
    def __init__(
        self,
        entity: str,
        primary_path: str,
        backup_path: str | None = None,
        timestamp_column: str = "created_date",
        default_watermark: str = "2020-01-01 00:00:00",
        buffer_minutes: int = 5,
        initial_lookback_days: int = 365,
        now_fn: Callable[[], datetime] = datetime.now,
    ) -> None:
        self.entity = entity
        self.primary_path = primary_path
        self.backup_path = backup_path
        self.timestamp_column = timestamp_column
        self.default_watermark = default_watermark
        self.buffer_minutes = buffer_minutes
        self.initial_lookback_days = initial_lookback_days
        self.now_fn = now_fn

    # -- read chain (reference :72-113) ---------------------------------

    def get_watermark(self) -> str:
        try:
            data = self._read_json(self.primary_path)
            if data is None and self.backup_path:
                data = self._read_json(self.backup_path)
            if data is not None:
                return data["last_processed_timestamp"]
            return self._initial_watermark()
        except Exception:
            return self.default_watermark

    def _initial_watermark(self) -> str:
        """First-run watermark: now - lookback days (reference :179-195)."""
        if self.initial_lookback_days > 0:
            lookback = self.now_fn() - timedelta(days=self.initial_lookback_days)
            return lookback.strftime("%Y-%m-%d 00:00:00")
        return self.default_watermark

    # -- filter generation (reference :159-177) -------------------------

    def buffered_watermark(self) -> str:
        wm = self.get_watermark()
        if self.buffer_minutes > 0:
            dt = datetime.strptime(wm, TS_FMT) - timedelta(
                minutes=self.buffer_minutes
            )
            wm = dt.strftime(TS_FMT)
        return wm

    def get_filter_condition(self) -> str:
        """SQL string predicate — reference-shaped output."""
        return f"{self.timestamp_column} > '{self.buffered_watermark()}'"

    def get_filter_column(self) -> Column:
        """Typed predicate; pushes down to parquet row-group pruning."""
        return F.col(self.timestamp_column) > F.lit(
            self.buffered_watermark()
        ).cast("timestamp")

    # -- update (reference :115-157; atomic write :237-281) --------------

    def update_watermark(
        self, new_timestamp: str, metadata: dict[str, Any] | None = None
    ) -> bool:
        data = {
            "entity": self.entity,
            "last_processed_timestamp": new_timestamp,
            "updated_at": self.now_fn().strftime(TS_FMT),
            "timestamp_column": self.timestamp_column,
            "metadata": metadata or {},
        }
        ok = self._write_json_atomic(self.primary_path, data)
        if self.backup_path:
            self._write_json_atomic(self.backup_path, data)
        return ok

    # -- storage ---------------------------------------------------------

    @staticmethod
    def _read_json(path: str | None) -> dict | None:
        if not path or not os.path.exists(path):
            return None
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    @staticmethod
    def _write_json_atomic(path: str, data: dict) -> bool:
        """Write-temp-rename: readers never observe a torn file (the
        reference does the same dance on S3, :252-266)."""
        d = os.path.dirname(os.path.abspath(path))
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(data, f, indent=2)
            os.replace(tmp, path)
            return True
        except OSError:
            if os.path.exists(tmp):
                os.unlink(tmp)
            return False
