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


@q("source_rate_stream", """
SELECT 500 AS n, CAST(1 AS BOOLEAN) AS values_gapless
""")
def source_rate_stream(spark, d):
    """Streaming rate source, promoted from rows-only to a hash-checked
    contract.  Uses `rate-micro-batch` (fixed rows per batch, epoch
    pinned) rather than `rate` (whose availableNow offset is
    wall-clock-based: 0 s elapsed -> 0 rows): one availableNow batch
    delivers exactly rowsPerBatch rows, and the `value`s must be the
    gapless sequence 0..n-1 — the source's documented semantics."""
    name = f"rate_{uuid.uuid4().hex[:8]}"
    s = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "500").option("numPartitions", "2")
        .option("startTimestamp", "0").load()
    )
    qy = (
        s.writeStream.format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    qy.awaitTermination()
    return spark.table(name).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("value").alias("nd"),
        F.max("value").alias("mx"),
    ).select(
        F.col("n").cast("int").alias("n"),
        ((F.col("nd") == F.col("n")) & (F.col("mx") == F.col("n") - 1)).alias("values_gapless"),
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


def _langid_predict():
    """Character-n-gram language-ID heuristic as a vectorized pandas UDF
    (profile table broadcast via closure)."""

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
            # CJK block dominance -> zh (the n-gram profiles are Latin-only)
            cjk = sum(1 for ch in t if "一" <= ch <= "鿿")
            if cjk > 0.2 * len(t):
                return "zh"
            best, best_n = "en", -1
            low = t.lower()
            for lang, grams in profiles.items():
                n = sum(low.count(g) for g in grams)
                if n > best_n:
                    best, best_n = lang, n
            return best

        return texts.map(score)

    return predict


# Deterministic planted texts with real per-language n-gram structure.
# The harness `documents.lang` column is a synthetic label UNcorrelated
# with the text content (all docs share one English-ish vocabulary), so
# classifier accuracy is measured on these instead — the same
# invariant->boolean contract pattern the ANN queries use.
_LANGID_PLANTED = [
    ("en", "the thing is that everything during the morning and the evening was standing there"),
    ("en", "another anthem rings in the hand and the band was singing along the landing"),
    ("de", "der richter sprach die einigung durch ein schnelles schreiben in dieser einrichtung"),
    ("de", "ich möchte einen schönen deutschen schäferhund der durch die schule schleicht"),
    ("fr", "le gouvernement de la république présente les documents pendant le moment de le dire"),
    ("fr", "les enfants de le quartier prennent le temps de chanter lentement les chansons"),
    ("es", "los hermanos de la familia cantar y bailar juntos varios días en la casa de los abuelos"),
    ("es", "la organización de los trabajadores presentó la información de la región a los vecinos"),
    ("zh", "这是一个用于测试语言识别的中文句子其中包含许多汉字字符以便分类器能够正确识别"),
    ("zh", "大规模数据处理引擎需要对文本进行语言识别和质量评估然后进行重复数据删除"),
]


@q("text_langid_heuristic", """
SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       CAST(1 AS BOOLEAN) AS planted_acc_ok,
       CAST(1 AS BOOLEAN) AS domain_ok
""")
def text_langid_heuristic(spark, d):
    """Language-ID heuristic promoted to a hash-checked contract:
    (a) every prediction over the real corpus lands in the closed label
    set, (b) accuracy on deterministic PLANTED texts (which, unlike the
    synthetic `lang` column, actually carry per-language n-gram
    structure) is 100%, (c) the corpus row count matches the table."""
    predict = _langid_predict()
    docs = load(spark, d, "documents")
    domain = F.array([F.lit(x) for x in ("en", "de", "fr", "es", "zh", "xx")])
    real = docs.select(predict("text").alias("p")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.array_contains(domain, F.col("p"))).alias("domain_ok"),
    )
    planted = spark.createDataFrame(_LANGID_PLANTED, "lang string, text string")
    acc = planted.select((predict("text") == F.col("lang")).cast("int").alias("hit")).agg(
        (F.sum("hit") == F.lit(len(_LANGID_PLANTED))).alias("planted_acc_ok")
    )
    return real.crossJoin(acc).select("n_docs", "planted_acc_ok", "domain_ok")


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


@q("stream_binlog_tail", """
SELECT CAST(1 AS BOOLEAN) AS count_match, CAST(1 AS BOOLEAN) AS lsn_match,
       CAST(1 AS BOOLEAN) AS fingerprint_match
""")
def stream_binlog_tail(spark, d):
    """Custom binlog source (op C2, Python DataSource API), promoted
    from rows-only to a checkable contract: the stream-delivered log
    must match a BATCH parquet read of the same chunk dir on (a) event
    count, (b) max lsn, (c) an order-insensitive xor fingerprint over
    (lsn, conv_id, turn_idx) — i.e. the custom source delivers exactly
    the log, no more, no less.  Deterministic: ChangelogSpec(seed=11)."""
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
    fingerprint = [
        F.count(F.lit(1)).alias("n"),
        F.max("lsn").alias("max_lsn"),
        F.expr("bit_xor(xxhash64(lsn, conv_id, turn_idx))").alias("fp"),
    ]
    qy = (
        s.groupBy().agg(*fingerprint)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    qy.awaitTermination()
    got = spark.table(name)
    want = spark.read.parquet(work).agg(*fingerprint)
    return got.crossJoin(
        want.withColumnsRenamed({"n": "bn", "max_lsn": "bmax", "fp": "bfp"})
    ).select(
        (F.col("n") == F.col("bn")).alias("count_match"),
        (F.col("max_lsn") == F.col("bmax")).alias("lsn_match"),
        (F.col("fp") == F.col("bfp")).alias("fingerprint_match"),
    )


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


@q("cdc_changefeed_roundtrip", """
SELECT CAST(1 AS BOOLEAN) AS multi_batch,
       CAST(1 AS BOOLEAN) AS counts_reconcile,
       CAST(1 AS BOOLEAN) AS feed_replay_equals_snapshot
""")
def cdc_changefeed_roundtrip(spark, d):
    """Changefeed OUT contract (round 4 — CDC both directions): a
    chunked replay on a changefeed-enabled table emits per-batch
    row-level changes under _changes/; the contract checks (a) the
    feed spans multiple batches, (b) feed op-counts reconcile with the
    per-merge stats, and (c) reducing the feed per key by max(batch,
    change_lsn) and dropping 'D' rows reproduces the table snapshot
    EXACTLY (xxhash64 bit_xor fingerprint over the spec columns, both
    sides computed by the same Spark expression).  Deterministic:
    ChangelogSpec(seed=41)."""
    from ..plans.replay import replay
    from ..testkit.gen import ChangelogSpec, gen_changelog

    work = os.path.join(tempfile.gettempdir(), f"dipper_cfq_{uuid.uuid4().hex[:8]}")
    gen_changelog(os.path.join(work, "log"),
                  ChangelogSpec(seed=41, n_conv=80, extra_rate=1.8, dup_rate=0.15, hot_frac=0.3))
    table, stats = replay(spark, os.path.join(work, "log"), os.path.join(work, "tbl"),
                          chunk_lsn=400, changefeed=True)
    feed = table.changefeed()
    snap = table.snapshot()

    def fp(df):
        cols = []
        for c in ("conv_id", "role", "text", "tool"):
            cols.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        if c in df.columns else F.lit("\x00"))
        cols.append(F.col("turn_idx").cast("long"))
        cols.append(F.coalesce(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"), F.lit("\x00")))
        return df.select(F.xxhash64(*cols).alias("_h")).agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(_h)"), F.lit(0)).alias("fp"))

    # reduce the feed: last change per key by (batch, change_lsn), keep non-deletes
    ordk = F.struct(F.col("batch"), F.col("change_lsn"))
    val = F.struct(*[F.col(c) for c in ["change_op", "role", "text", "tool", "ts"]])
    last = feed.groupBy("conv_id", "turn_idx").agg(F.max_by(val, ordk).alias("_w"))
    replayed = (last.filter(F.col("_w.change_op") != "D")
                .select("conv_id", "turn_idx",
                        F.col("_w.role").alias("role"), F.col("_w.text").alias("text"),
                        F.col("_w.tool").alias("tool"), F.col("_w.ts").alias("ts")))

    ops = feed.groupBy().pivot("change_op", ["I", "U", "D"]).count().na.fill(0)
    want = [(sum(s.inserts for s in stats), sum(s.updates for s in stats),
             sum(s.deletes for s in stats))]
    want_df = spark.createDataFrame(want, "wi long, wu long, wd long")
    n_batches = len([s for s in stats if not s.skipped])

    a, b = fp(replayed), fp(snap)
    return (
        a.crossJoin(b.withColumnsRenamed({"n": "sn", "fp": "sfp"}))
        .crossJoin(ops).crossJoin(want_df)
        .select(
            F.lit(n_batches >= 3).alias("multi_batch"),
            ((F.col("I") == F.col("wi")) & (F.col("U") == F.col("wu"))
             & (F.col("D") == F.col("wd"))).alias("counts_reconcile"),
            ((F.col("n") == F.col("sn")) & (F.col("fp") == F.col("sfp")))
            .alias("feed_replay_equals_snapshot"),
        )
    )


@q("cdc_time_travel_asof", """
SELECT CAST(4 AS BIGINT) AS n_versions,
       CAST(1 AS BOOLEAN) AS asof_equals_oracle,
       CAST(1 AS BOOLEAN) AS asof_survives_compact,
       CAST(1 AS BOOLEAN) AS expire_keeps_current
""")
def cdc_time_travel_asof(spark, d):
    """Time travel contract (round 4 — beyond-survey): a
    time_travel-enabled table retains every commit's manifest, so
    snapshot(as_of=v) reproduces the state after commit v exactly.
    Checked against an INDEPENDENT oracle: chunked replay commits at
    lsn boundaries (chunk_lsn=400, lsn 1..1053 for seed 48 => 3
    batches / versions 0..3), so version 2 must equal the
    single-threaded pandas LWW applier run over ONLY the events with
    lsn <= 800.  Further: the as-of fingerprint survives compact()
    (deferred GC keeps superseded files), and expire_snapshots(1)
    reclaims history without touching the current snapshot.
    Deterministic: ChangelogSpec(seed=48)."""
    from ..plans.replay import replay
    from ..testkit.gen import ChangelogSpec, gen_changelog
    from ..testkit.oracle import SPEC_COLUMNS, apply_log_pandas

    work = os.path.join(tempfile.gettempdir(), f"dipper_ttq_{uuid.uuid4().hex[:8]}")
    logical, _man = gen_changelog(
        os.path.join(work, "log"),
        ChangelogSpec(seed=48, n_conv=80, extra_rate=1.8, dup_rate=0.15, hot_frac=0.3))
    table, stats = replay(spark, os.path.join(work, "log"), os.path.join(work, "tbl"),
                          chunk_lsn=400, time_travel=True)
    n_versions = len(table.versions())

    def fp(df):
        cols = []
        for c in ("conv_id", "role", "text", "tool"):
            cols.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        if c in df.columns else F.lit("\x00"))
        cols.append(F.col("turn_idx").cast("long"))
        cols.append(F.coalesce(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"), F.lit("\x00")))
        return df.select(F.xxhash64(*cols).alias("_h")).agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(_h)"), F.lit(0)).alias("fp"))

    # independent truth for version 2: pandas LWW over lsn <= 800 only
    oracle_mid = spark.createDataFrame(
        apply_log_pandas(logical[logical.lsn <= 800])[SPEC_COLUMNS])
    asof2_before = fp(table.snapshot(as_of=2)).first()
    want_mid = fp(oracle_mid).first()
    cur_before = fp(table.snapshot()).first()

    table.compact()  # rewrites every bucket; as-of must still read
    asof2_after = fp(table.snapshot(as_of=2)).first()
    out = table.expire_snapshots(keep_last=1)
    cur_after = fp(table.snapshot()).first()
    expired_raises = False
    try:
        table.snapshot(as_of=2)
    except FileNotFoundError:
        expired_raises = True

    return spark.createDataFrame(
        [(n_versions,
          asof2_before == want_mid,
          asof2_after == asof2_before,
          cur_after == cur_before and out["dropped_files"] > 0
          and out["dropped_versions"] > 0 and expired_raises)],
        "n_versions long, asof_equals_oracle boolean, "
        "asof_survives_compact boolean, expire_keeps_current boolean")


@q("cdc_ivm_incremental", """
SELECT CAST(1 AS BOOLEAN) AS view_equals_recompute,
       CAST(1 AS BOOLEAN) AS second_refresh_incremental,
       CAST(1 AS BOOLEAN) AS idempotent_noop
""")
def cdc_ivm_incremental(spark, d):
    """Incremental view maintenance contract (round 4): a grouped
    SUM/COUNT view maintained purely from changefeed deltas (plus
    e(after) for I/U, minus e(before) for U/D — plans/ivm.py) must
    equal a full recompute from the base table, a second refresh after
    a new producer pass must consume ONLY the new (scope, batch)
    partitions, and a refresh with nothing pending must be a no-op.
    Deterministic: ChangelogSpec(seed=49)."""
    from ..plans.ivm import IncrementalView
    from ..plans.replay import replay
    from ..streaming.ingest import ingest
    from ..testkit.gen import ChangelogSpec, gen_changelog

    work = os.path.join(tempfile.gettempdir(), f"dipper_ivmq_{uuid.uuid4().hex[:8]}")
    gen_changelog(os.path.join(work, "log"),
                  ChangelogSpec(seed=49, n_conv=70, extra_rate=1.8, dup_rate=0.15))
    table, _ = replay(spark, os.path.join(work, "log"), os.path.join(work, "tbl"),
                      chunk_lsn=400, changefeed=True)
    view = IncrementalView(spark, table, os.path.join(work, "view"), ["conv_id"],
                           {"n_turns": "1", "chars": "length(coalesce(text, ''))"})
    first = view.refresh()

    def equals_recompute():
        got = view.read().toPandas().sort_values(["conv_id"]).reset_index(drop=True)
        want = view.full_recompute().toPandas().sort_values(["conv_id"]).reset_index(drop=True)
        return got.shape == want.shape and bool(
            (got.values == want.values).all())

    eq1 = equals_recompute()
    ingest(spark, os.path.join(work, "log"), os.path.join(work, "tbl"),
           os.path.join(work, "ckpt"), changefeed=True)
    second = view.refresh()
    incremental = bool(second["consumed"]) and all(
        tag not in first["consumed"] for tag in second["consumed"])
    eq2 = equals_recompute()
    noop = view.refresh()["noop"]
    return spark.createDataFrame(
        [(eq1 and eq2, incremental, bool(noop))],
        "view_equals_recompute boolean, second_refresh_incremental boolean, "
        "idempotent_noop boolean")


@q("cdc_upsert_api", """
SELECT CAST(1 AS BOOLEAN) AS upsert_applied,
       CAST(1 AS BOOLEAN) AS stale_rejected,
       CAST(1 AS BOOLEAN) AS delete_where_idempotent
""")
def cdc_upsert_api(spark, d):
    """Public MERGE surface contract (round 4): Delta-style upsert()
    and delete_where() on the CoW table, same LWW (ts, lsn) rule as
    the CDC path — an upsert with a newer ts applies (insert+update),
    a staler ts is rejected as a conflict, and a predicate delete
    tombstones exactly the matching live rows and is a no-op when
    re-run.  Deterministic: ChangelogSpec(seed=50)."""
    import datetime as _dt

    from ..plans.replay import replay
    from ..testkit.gen import ChangelogSpec, gen_changelog

    work = os.path.join(tempfile.gettempdir(), f"dipper_upq_{uuid.uuid4().hex[:8]}")
    gen_changelog(os.path.join(work, "log"),
                  ChangelogSpec(seed=50, n_conv=40, extra_rate=1.2, dup_rate=0.1))
    table, _ = replay(spark, os.path.join(work, "log"), os.path.join(work, "tbl"))
    first = table.snapshot().first()
    later, earlier = _dt.datetime(2027, 1, 1), _dt.datetime(2020, 1, 1)
    src = spark.createDataFrame(
        [(first["conv_id"], first["turn_idx"], "assistant", "api-updated", later),
         ("conv-api-new", 0, "user", "api-inserted", later)],
        "conv_id string, turn_idx long, role string, text string, ts timestamp")
    st1 = table.upsert(src)
    stale = spark.createDataFrame(
        [(first["conv_id"], first["turn_idx"], "assistant", "stale", earlier)],
        "conv_id string, turn_idx long, role string, text string, ts timestamp")
    st2 = table.upsert(stale)
    kept = table.snapshot().filter(
        (F.col("conv_id") == first["conv_id"])
        & (F.col("turn_idx") == first["turn_idx"])).first()["text"]
    n_match = table.snapshot().filter("turn_idx >= 5").count()
    st3 = table.delete_where("turn_idx >= 5")
    st4 = table.delete_where("turn_idx >= 5")
    return spark.createDataFrame(
        [(st1.inserts == 1 and st1.updates == 1,
          st2.rows_applied == 0 and st2.conflicts == 1 and kept == "api-updated",
          st3.deletes == n_match and n_match > 0 and st4.deletes == 0
          and table.snapshot().filter("turn_idx >= 5").count() == 0)],
        "upsert_applied boolean, stale_rejected boolean, "
        "delete_where_idempotent boolean")


@q("stream_changefeed_tail", """
SELECT CAST(1 AS BOOLEAN) AS drained_equals_feed,
       CAST(1 AS BOOLEAN) AS incremental_tail,
       CAST(1 AS BOOLEAN) AS state_equals_snapshot
""")
def stream_changefeed_tail(spark, d):
    """Streaming changefeed consumer contract (round 4): tailing the
    feed with changefeed_stream() + foreachBatch + checkpoint must
    (a) deliver exactly the feed's rows, (b) after a SECOND producer
    commit deliver ONLY the new batch dirs (the file-source offset log
    remembers consumed files), and (c) reducing the delivered changes
    per key by (batch, change_lsn) reproduces the live snapshot row
    count.  Deterministic: ChangelogSpec(seed=44)."""
    from ..plans.replay import replay
    from ..streaming.ingest import ingest
    from ..testkit.gen import ChangelogSpec, gen_changelog

    work = os.path.join(tempfile.gettempdir(), f"dipper_cfs_{uuid.uuid4().hex[:8]}")
    gen_changelog(os.path.join(work, "log"),
                  ChangelogSpec(seed=44, n_conv=50, extra_rate=1.5, dup_rate=0.1))
    table, _ = replay(spark, os.path.join(work, "log"), os.path.join(work, "tbl"),
                      changefeed=True)
    n_feed1 = table.changefeed().count()

    rows: list = []

    def drain():
        got: list = []
        qy = (table.changefeed_stream(max_files_per_trigger=8)
              .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
              .option("checkpointLocation", os.path.join(work, "consumer_ckpt"))
              .trigger(availableNow=True).start())
        qy.awaitTermination()
        rows.extend(got)
        return len(got)

    n1 = drain()
    ingest(spark, os.path.join(work, "log"), os.path.join(work, "tbl"),
           os.path.join(work, "ckpt2"), changefeed=True)
    n_new = table.changefeed().count() - n_feed1
    n2 = drain()
    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["batch"], r["change_lsn"])):
        k = (r["conv_id"], r["turn_idx"])
        if r["change_op"] == "D":
            state.pop(k, None)
        else:
            state[k] = r["text"]
    return spark.createDataFrame(
        [(n1 == n_feed1 and n_feed1 > 0,
          n2 == n_new,
          len(state) == table.snapshot().count())],
        "drained_equals_feed boolean, incremental_tail boolean, "
        "state_equals_snapshot boolean")
