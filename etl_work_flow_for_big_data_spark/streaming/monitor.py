"""Streaming-query progress monitoring → log packets (G4 × A7).

The reference's monitor thread logs pipeline liveness through
LoggerWriter every second (``/root/reference/MFramework.cpp:1931-1970``
logging via ``LoggerWriter.cpp:171-224``). The Spark analog is a
``StreamingQueryListener``: every progress/termination event becomes a
log packet with the exact LoggerWriter shape (s/c/l/m) appended to a
local buffer the caller drains into any sink (the parquet log table of
``logsink.py``, a kafka topic, ...).

Driver-side metadata only — event volume is O(micro-batches), never
data-scale."""

from __future__ import annotations

import threading
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

#: level ints matching functions.packets.LOG_LEVELS
_INFO, _ERROR = 1, 16


class ProgressLogger(StreamingQueryListener):
    """Collects progress/termination events as LoggerWriter-shaped
    packet dicts (s/c/l/m). Thread-safe; drain with :meth:`take`."""

    def __init__(self, component: str = "StreamMonitor") -> None:
        self.component = component
        self._lock = threading.Lock()
        self._events: list[dict] = []

    # -- listener callbacks (called from Spark's listener bus thread) --
    def onQueryStarted(self, event) -> None:
        self._log(_INFO, event.id, f"started name={event.name}")

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._log(
            _INFO,
            p.id,
            f"progress batch={p.batchId} rows={p.numInputRows}",
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        self._log(_INFO, event.id, "idle")

    def onQueryTerminated(self, event) -> None:
        if event.exception:
            self._log(_ERROR, event.id, f"terminated: {event.exception}")
        else:
            self._log(_INFO, event.id, "terminated cleanly")

    # -- packet shaping (LoggerWriter.cpp:207-213) ---------------------
    def _log(self, level: int, session, message: str) -> None:
        from etl_work_flow_for_big_data_spark.functions.packets import LOG_LEVELS

        ts = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        pkt = {
            "s": "1",
            "c": self.component,
            "l": LOG_LEVELS.get(level, "N"),
            "m": f"{ts}|{session}|{message}",
        }
        with self._lock:
            self._events.append(pkt)

    def take(self) -> list[dict]:
        """Drain collected packets (oldest first)."""
        with self._lock:
            out, self._events = self._events, []
        return out


def attach_progress_logger(
    spark: SparkSession, component: str = "StreamMonitor"
) -> ProgressLogger:
    """Register a :class:`ProgressLogger` on the session's listener bus
    and return it (caller keeps the handle to drain / detach via
    ``spark.streams.removeListener``)."""
    logger = ProgressLogger(component)
    spark.streams.addListener(logger)
    return logger
