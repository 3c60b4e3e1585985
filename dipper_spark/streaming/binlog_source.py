"""Custom binlog-tail source via the Python DataSource API (op C2).

Models a *seekable* binlog/WAL server (the shape Kafka or a MySQL
binlog endpoint exposes): the client asks "what is the latest offset",
then reads [start, end) ranges and commits.  The broker here is a
directory of LSN-ordered chunk files, but the reader never relies on
Spark's file source — it tracks its own offsets {"chunk": i}, which is
exactly what a socket-backed implementation would persist.

Registration:
    spark.dataSource.register(BinlogDataSource)
    df = (spark.readStream.format("dipper_binlog")
          .option("path", log_dir).load())

Offsets live in the streaming checkpoint (initialOffset/latestOffset/
commit), so resume-mid-stream works identically to the file source;
the downstream ledger + (ts, lsn) merge guard provide exactly-once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ..schemas import CHANGELOG_SCHEMA


class _ChunkRange(InputPartition):
    def __init__(self, path: str):
        self.path = path


class BinlogStreamReader(DataSourceStreamReader):
    """Offset = {"chunk": <number of chunk files fully consumed>}.

    Option `maxChunksPerTrigger` bounds batch size (the Kafka
    `maxOffsetsPerTrigger` shape): each latestOffset() poll advances
    at most that many chunks past the offset it returned last, so a
    huge backlog replays as bounded micro-batches instead of one giant
    batch.  The pacing state lives ONLY in latestOffset's own counter
    — observed runner behavior: the offsets runner (initialOffset/
    latestOffset) is a separate long-lived process, while partitions()
    executes elsewhere and its mutations never reach this instance, so
    pacing must not depend on them.

    RESTART semantics (measured, round 4): after a restart the counter
    resets to 0 and the first paced latestOffset() sits BELOW the
    checkpointed start.  The runner does NOT discard such an offset —
    it records it as the batch end, and the NEXT batch starts from it:
    the stream position rewinds and already-committed chunks re-read
    (absorbed downstream by the ledger + (ts, lsn) merge guard, but
    O(committed prefix) wasted reads on a large backlog).  Option
    `pacingDir` fixes this: the counter is persisted there (tmp+rename;
    the offsets runner is a single long-lived process, so one writer)
    and a restarted reader resumes pacing from its last returned
    offset, which is >= every offset the checkpoint recorded — paced
    restarts then deliver each chunk exactly once.  ingest() callers
    point it inside the streaming checkpoint dir.  Without pacingDir,
    restart-with-pacing is at-least-once at the raw source level
    (pinned by tests/test_streaming_resume.py)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dipper_binlog requires option 'path'")
        # DSv2 options are case-insensitive (keys arrive lowercased)
        m = options.get("maxchunkspertrigger") or options.get("maxChunksPerTrigger")
        self.max_chunks = int(m) if m else None
        self.pacing_dir = options.get("pacingdir") or options.get("pacingDir")
        self._last: int = 0  # last offset latestOffset() returned
        if self.pacing_dir:
            try:
                with open(os.path.join(self.pacing_dir, "last_offset.json")) as f:
                    self._last = int(json.load(f)["chunk"])
            except (OSError, ValueError, KeyError):
                pass  # fresh start

    def _persist_last(self) -> None:
        if not self.pacing_dir:
            return
        os.makedirs(self.pacing_dir, exist_ok=True)
        tmp = os.path.join(self.pacing_dir, "last_offset.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"chunk": self._last}, f)
        os.replace(tmp, os.path.join(self.pacing_dir, "last_offset.json"))

    def _chunks(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.path)
            if f.endswith(".parquet") and not f.startswith("_")
        )

    def initialOffset(self) -> dict:
        return {"chunk": 0}

    def latestOffset(self) -> dict:
        n = len(self._chunks())
        if self.max_chunks is not None:
            n = min(n, self._last + self.max_chunks)
        if n > self._last:
            self._last = n
            self._persist_last()
        return {"chunk": self._last if self.max_chunks is not None else n}

    def partitions(self, start: dict, end: dict):
        files = self._chunks()
        return [
            _ChunkRange(os.path.join(self.path, files[i]))
            for i in range(start["chunk"], min(end["chunk"], len(files)))
        ] or [_ChunkRange("")]  # Spark requires >= 1 partition per batch

    def read(self, partition: _ChunkRange):
        if not partition.path:
            return iter(())
        import pyarrow.parquet as pq

        # Yield pyarrow RecordBatches directly (supported by the Python
        # DataSource API): the batch crosses the worker boundary as
        # Arrow, no per-row tuple materialization — this boundary sees
        # EVERY raw event, so it must stay vectorized end to end.
        tbl = pq.read_table(partition.path, columns=[f.name for f in CHANGELOG_SCHEMA.fields])
        return iter(tbl.to_batches())

    def commit(self, end: dict) -> None:
        # a socket-backed broker would ack offsets here.  Locally, seed
        # the pacing counter from the committed offset: after a RESTART
        # _last starts at 0, and without this clamp a paced
        # latestOffset() could sit below the checkpointed start for
        # several polls on a large backlog (relying on the runner
        # planning empty batches for end < start — version-dependent).
        # commit() runs in the same offsets-runner process as
        # latestOffset(), so the clamp is visible to it; the exposure
        # window shrinks to at most the first poll before any commit,
        # which partitions() already handles (empty range for
        # end < start).
        self._last = max(self._last, int(end["chunk"]))


class BinlogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dipper_binlog"

    def schema(self):
        return CHANGELOG_SCHEMA

    def streamReader(self, schema):
        return BinlogStreamReader(self.options)
