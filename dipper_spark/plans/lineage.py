"""Lineage records + streaming metrics (SURVEY.md ops C13, C14).

One lineage row per applied micro-batch: source offset range, rows
in/deduped/applied, insert/update/delete/conflict counts, wall time —
"emitting per-partition lineage records (source offsets, rows applied,
conflict counts)" (BASELINE.json north_star).  The counters are
harvested from a single-pass `Observation` attached to the merge plan
(no second job over the data).

Rows are tiny (one per batch), so they are appended driver-side with
pyarrow rather than paying a Spark job per row; readers get them back
as a DataFrame via `read_lineage`.
"""

from __future__ import annotations

import os
import time
import uuid
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from .target import DEAD_LETTER_DIR, MergeStats

LINEAGE_DIR = "_lineage"


def emit_lineage(table_root: str, stats: MergeStats, source: str | None = None,
                 rows_bad: int = 0, late_events: int = 0) -> None:
    d = os.path.join(table_root, LINEAGE_DIR)
    os.makedirs(d, exist_ok=True)
    row = {
        "batch_id": [int(stats.batch_id)],
        "source": [source],
        "offset_min": [None if stats.offset_min is None else int(stats.offset_min)],
        "offset_max": [None if stats.offset_max is None else int(stats.offset_max)],
        "rows_in": [int(stats.rows_in)],
        "rows_bad": [int(rows_bad)],
        "rows_deduped": [int(stats.rows_in - stats.rows_unique)],
        "rows_applied": [int(stats.rows_applied)],
        "inserts": [int(stats.inserts)],
        "updates": [int(stats.updates)],
        "deletes": [int(stats.deletes)],
        "conflicts": [int(stats.conflicts)],
        "late_events": [int(late_events)],
        "wall_ms": [int(stats.wall_ms)],
        "committed_at": [datetime.now(timezone.utc).replace(tzinfo=None)],
    }
    schema = pa.schema(
        [
            ("batch_id", pa.int64()), ("source", pa.string()),
            ("offset_min", pa.int64()), ("offset_max", pa.int64()),
            ("rows_in", pa.int64()), ("rows_bad", pa.int64()),
            ("rows_deduped", pa.int64()), ("rows_applied", pa.int64()),
            ("inserts", pa.int64()), ("updates", pa.int64()),
            ("deletes", pa.int64()), ("conflicts", pa.int64()),
            ("late_events", pa.int64()), ("wall_ms", pa.int64()),
            ("committed_at", pa.timestamp("us")),
        ]
    )
    path = os.path.join(d, f"batch_{stats.batch_id:08d}_{uuid.uuid4().hex[:8]}.parquet")
    pq.write_table(pa.Table.from_pydict(row, schema=schema), path)


def read_lineage(spark: SparkSession, table_root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(table_root, LINEAGE_DIR))




def write_dead_letter(table_root: str, bad: DataFrame, batch_id: int) -> None:
    """Persist op-C4 rejected rows for offline triage (one dir per
    batch; overwrite makes retried batches idempotent)."""
    bad.write.mode("overwrite").parquet(
        os.path.join(table_root, DEAD_LETTER_DIR, f"batch_{batch_id:08d}")
    )


def read_dead_letter(spark: SparkSession, table_root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(table_root, DEAD_LETTER_DIR, "batch_*"))


class MetricsListener:
    """StreamingQueryListener capturing per-batch progress (op C14).

    Collects rows/sec, batch durations and observed metrics from
    QueryProgressEvent; `summary()` aggregates for reporting.
    Imported lazily so batch-only users never touch the listener API.
    """

    def __new__(cls):
        from pyspark.sql.streaming import StreamingQueryListener

        class _L(StreamingQueryListener):
            def __init__(self):
                self.progress: list[dict] = []
                self.started_at = time.monotonic()

            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                self.progress.append(
                    {
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "processed_rows_per_second": p.processedRowsPerSecond,
                        "duration_ms": dict(p.durationMs or {}),
                        "observed": {k: dict(v) for k, v in (p.observedMetrics or {}).items()},
                    }
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

            def summary(self):
                rows = sum(p["num_input_rows"] for p in self.progress)
                return {
                    "batches": len(self.progress),
                    "input_rows": rows,
                    "wall_s": time.monotonic() - self.started_at,
                }

        return _L()
