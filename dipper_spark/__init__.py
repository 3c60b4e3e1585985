"""dipper_spark — a PySpark-native CDC / incremental-ingest engine.

Built from scratch against the capability contract in
/root/repo/BASELINE.json (north_rule / north_star / input_hint);
the reference checkout at /root/reference is empty (SURVEY.md §0),
so BASELINE.json is the authoritative spec and no reference file
citations exist.

Capability in one line: tail a binlog/WAL-style change stream of
insert/update/delete events over multi-turn transcripts and apply
them to a lake table keyed on (conv_id, turn_idx), with salted-skew
LWW collapse, exactly-once idempotent merge, schema evolution,
lineage and metrics — all DataFrame-first, vectorized-UDF-only.

Layout (SURVEY.md §2.1 operator ids in parens):
  schemas.py              canonical schemas (transcript, changelog, lineage)
  session.py              tuned SparkSession builders
  testkit/gen.py          deterministic changelog generator (C18)
  testkit/oracle.py       single-threaded pandas reference replay (C19)
  functions/normalize.py  vectorized payload decode + text normalization (C3, C4)
  operators/cdc.py        watermark, dedup, salted LWW collapse (C5-C8, C12)
  plans/target.py         TargetTable: LocalCowTable / IcebergTable (C9-C11, C16, C17)
  plans/replay.py         batch backfill / full replay (C15)
  plans/lineage.py        lineage records + metrics listener (C13, C14)
  streaming/ingest.py     structured-streaming ingest, foreachBatch merge (C1)
  streaming/binlog_source.py  pure-Python DataSource stream reader (C2)
  operators/relational.py relational query surface (SURVEY.md §2.2)
"""

__version__ = "0.1.0"
