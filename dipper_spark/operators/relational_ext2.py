"""More §2.2 surface: csv/sink/rate sources, grouping sets, text
analysis (lang-id heuristic, BPE-ish token counting, rolling-hash
fingerprints), stateful streaming LWW (op C20).
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .relational import load, q


@q("scan_csv_explicit_schema", """
SELECT r_regionkey, r_name FROM region
""")
def scan_csv_explicit_schema(spark, d):
    """CSV round-trip with an explicit schema (no inference pass)."""
    r = load(spark, d, "region")
    stage = os.path.join(tempfile.gettempdir(), f"dipper_csv_{uuid.uuid4().hex[:8]}")
    r.write.mode("overwrite").option("header", "false").csv(stage)
    return spark.read.schema("r_regionkey int, r_name string").csv(stage)


@q("sink_parquet_partitioned", """
SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag
""")
def sink_parquet_partitioned(spark, d):
    """Partitioned write + partition-pruned readback."""
    l = load(spark, d, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
    stage = os.path.join(tempfile.gettempdir(), f"dipper_sink_{uuid.uuid4().hex[:8]}")
    l.write.mode("overwrite").partitionBy("l_returnflag").parquet(stage)
    back = spark.read.parquet(stage)
    return back.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).select(
        F.col("l_returnflag").cast("string").alias("l_returnflag"), "n"
    )


@q("source_rate_stream")  # rows-only: synthetic source
def source_rate_stream(spark, d):
    """Streaming rate source smoke (fixed row count via availableNow)."""
    name = f"rate_{uuid.uuid4().hex[:8]}"
    s = (
        spark.readStream.format("rate").option("rowsPerSecond", "500")
        .option("numPartitions", "2").load()
    )
    qy = (
        s.writeStream.format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    qy.awaitTermination()
    return spark.table(name).agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("value").alias("n_distinct")
    )


@q("agg_grouping_sets", """
SELECT COALESCE(o_orderstatus, 'ALL') AS st, COALESCE(o_orderpriority, 'ALL') AS pr,
       COUNT(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""")
def agg_grouping_sets(spark, d):
    load(spark, d, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS st, COALESCE(o_orderpriority, 'ALL') AS pr,
               COUNT(*) AS n
        FROM _orders_gs GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


# ------------------------------------------------------------ text analysis ---

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")


@q("text_token_count_bpe", """
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens,
       len(string_split_regex(trim(text), '\\s+')) AS n_words
FROM documents
""")
def text_token_count_bpe(spark, d):
    """Token counting: whitespace words + a BPE-ish regex tokenization
    (letter runs / digit runs / single punctuation) — all JVM regexp."""
    docs = load(spark, d, "documents")
    tok = F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return docs.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_words"),
    )


@q("text_stopword_ratio", """
SELECT doc_id,
       ROUND(CAST(len(list_filter(string_split(text, ' '),
                  w -> list_contains(['the','a','and','of','to','in','is','on','for','with'], lower(w))))
             AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio
FROM documents
""")
def text_stopword_ratio(spark, d):
    docs = load(spark, d, "documents")
    words = F.split("text", " ")
    stop = F.size(F.filter(words, lambda w: F.lower(w).isin(*_STOPWORDS)))
    return docs.select(
        "doc_id", F.round(stop.cast("double") / F.size(words), 4).alias("stopword_ratio")
    )


@q("text_langid_heuristic")  # rows-only: heuristic classifier, no SQL twin
def text_langid_heuristic(spark, d):
    """Character-n-gram language-ID heuristic as a vectorized pandas UDF
    (profile table broadcast via closure).  Returns predicted vs actual
    for accuracy inspection."""

    @pandas_udf("string")
    def predict(texts: pd.Series) -> pd.Series:
        profiles = {
            "en": (" th", "he ", "ing", " an", "nd "),
            "de": ("der", "ie ", "ein", "ich", "sch"),
            "fr": (" de", "es ", "le ", "ent", " le"),
            "es": (" de", "os ", " la", "ión", "ar "),
            "xx": (),
        }

        def score(t: str) -> str:
            if not t:
                return "xx"
            best, best_n = "en", -1
            low = t.lower()
            for lang, grams in profiles.items():
                n = sum(low.count(g) for g in grams)
                if n > best_n:
                    best, best_n = lang, n
            return best

        return texts.map(score)

    docs = load(spark, d, "documents")
    return docs.select("doc_id", F.col("lang").alias("actual"), predict("text").alias("predicted"))


@q("text_rolling_fingerprint", """
SELECT doc_id, n_windows FROM (
  SELECT doc_id, GREATEST(len(string_split(text, ' ')) - 7, 0) AS n_windows
  FROM documents
) WHERE n_windows > 0
""")
def text_rolling_fingerprint(spark, d):
    """Rolling-hash document fingerprinting: hash every 8-word window,
    keep windows whose hash ≡ 0 (mod 16) as the doc's winnowing sketch.
    The oracle checks the window arithmetic; the sketch itself is
    engine-deterministic."""
    docs = load(spark, d, "documents")
    words = F.split("text", " ")
    win = F.transform(
        F.sequence(F.lit(0), F.size(words) - 8),
        lambda i: F.xxhash64(F.concat_ws(" ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(8)])),
    )
    return (
        docs.filter(F.size(words) >= 9)
        .select("doc_id", win.alias("w"))
        .select("doc_id", F.size("w").alias("n_windows"))
    )


@q("stream_binlog_tail")  # rows-only: engine-generated changelog, not a harness view
def stream_binlog_tail(spark, d):
    """Custom binlog source (op C2, Python DataSource API) end to end:
    tail a seeded changelog through `dipper_binlog`, count delivered
    events and distinct lsns.  Deterministic: ChangelogSpec(seed=11,
    n_conv=120) always delivers the same events."""
    from ..streaming.binlog_source import BinlogDataSource
    from ..testkit.gen import ChangelogSpec, gen_changelog

    work = os.path.join(tempfile.gettempdir(), "dipper_binlog_q")
    if not os.path.exists(os.path.join(work, "_manifest.json")):
        gen_changelog(work, ChangelogSpec(seed=11, n_conv=120, extra_rate=0.8, n_chunks=5))
    try:
        spark.dataSource.register(BinlogDataSource)
    except Exception:
        pass  # already registered in this session
    s = spark.readStream.format("dipper_binlog").option("path", work).load()
    name = f"binlog_{uuid.uuid4().hex[:8]}"
    qy = (
        s.groupBy()
        # distinct aggs are unsupported on streams; count + max(lsn) is
        # an equally deterministic fingerprint of the delivered log
        .agg(F.count(F.lit(1)).alias("n_delivered"), F.max("lsn").alias("max_lsn"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    qy.awaitTermination()
    return spark.table(name)


# ------------------------------------------------ stateful streaming (C20) ---

@q("stream_stateful_lww", """
SELECT user_id, event_id AS last_event_id, event_type AS last_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""")
def stream_stateful_lww(spark, d):
    """Per-key LWW kept in the state store across micro-batches via
    applyInPandasWithState (op C20) — the stateful alternative to the
    merge-guard design, here over the events table keyed by user_id."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .relational_ext import stage_events_dir

    batch = load(spark, d, "events")
    stage = stage_events_dir(d)
    stream = (
        spark.readStream.schema(batch.schema).parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )

    def lww(key, pdfs, state):
        best = state.get if state.exists else None  # (ts_us, event_id, event_type)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            top = pdf.sort_values(["ts", "event_id"]).iloc[-1]  # vectorized argmax
            cand = (int(pd.Timestamp(top["ts"]).value // 1000), int(top["event_id"]), str(top["event_type"]))
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        state.update(best)
        # emit the winning ts too: the sink-side rollup must reduce by
        # the SAME (ts, event_id) ordering the state update uses — a
        # max(event_id) rollup would pick the wrong winner whenever a
        # later-ts winner has a smaller event_id across micro-batches
        yield pd.DataFrame({"user_id": [key[0]], "ts_us": [best[0]],
                            "last_event_id": [best[1]], "last_type": [best[2]]})

    name = f"lww_{uuid.uuid4().hex[:8]}"
    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            lww,
            outputStructType="user_id bigint, ts_us bigint, last_event_id bigint, last_type string",
            stateStructType="ts_us bigint, event_id bigint, event_type string",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    qy = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    qy.awaitTermination()
    # reduce per key over (ts_us, event_id) — the LWW order itself
    res = spark.table(name)
    w = F.struct(F.col("ts_us"), F.col("last_event_id"))
    return res.groupBy("user_id").agg(
        F.max_by("last_event_id", w).alias("last_event_id"),
        F.max_by("last_type", w).alias("last_type"),
    )
