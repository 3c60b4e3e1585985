"""CDC dataflow operators: watermark, dedup, salted LWW collapse
(SURVEY.md ops C5-C8, C12).

The collapse is the engine's hot kernel.  Semantics (BASELINE.json
north_star): per key (conv_id, turn_idx) the winner is the event with
the lexicographic max (ts, lsn) tuple — "last-writer-wins resolved per
key using event-time watermarks plus a (ts, log-sequence-number)
max-ordering window".  lsn is unique, so the winner is unique, so the
collapse is a pure function of the event SET — duplicates and
arbitrary batch splits cannot change it.  That property (plus the
(ts, lsn) guard in the merge, op C10) is what makes exact replay
equality achievable.

Scale design (10^10 events, SURVEY.md §4.2):
  - Redelivered duplicates share their lsn, hence the same key AND the
    same salt, so they land in the same phase-1 group and are absorbed
    by max_by for free — the batch path needs NO separate
    dropDuplicates shuffle.  Duplicate counts for lineage come from a
    group-local count_distinct(lsn), also free.
  - Hot-conversation skew: phase 1 groups by (key, salt) where
    salt = xxhash64(lsn) % n_salts, splitting a hot key across
    n_salts reducers; phase 2 re-aggregates the <= n_salts survivors
    per key.  AQE's skew handling covers joins, not hot groupBy keys
    feeding an ordered arg-max — hence explicit salting.
  - Both phases ride Spark's partial/final HashAggregate, so map-side
    combine already shrinks the shuffle before salt even matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import KEY_COLUMNS

# Columns carried through the collapse to the merge.
CARRY_COLUMNS = ["op", "ts", "lsn", "role", "text", "tool", "meta_tokens", "source", "source_offset"]


def with_watermark(df: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Event-time watermark (op C5).  Bounds streaming state; the merge
    guard keeps correctness watermark-independent (late events are
    still applied iff their (ts, lsn) wins)."""
    return df.withWatermark("ts", delay)


def dedup_lsn(df: DataFrame, streaming: bool = False) -> DataFrame:
    """Exact-duplicate dedup by lsn (op C6).

    Streaming: cross-micro-batch dedup within the watermark (state
    bounded by the watermark delay).  Batch: plain dropDuplicates.
    The batch replay path deliberately does NOT call this — see module
    docstring — it exists for the streaming stage and as a standalone
    checked operator.
    """
    if streaming:
        return df.dropDuplicatesWithinWatermark(["lsn"])
    return df.dropDuplicates(["lsn"])


def lww_collapse(df: DataFrame, n_salts: int = 8, carry: list[str] | None = None) -> DataFrame:
    """Two-stage salted LWW collapse (ops C7+C8).

    Input: decoded valid events.  Output: exactly one row per touched
    key with the winning event's columns plus per-key lineage counters:
      n_events  - delivered events for this key (incl. duplicates)
      n_unique  - distinct lsns for this key
      is_delete - winner op == 'D'

    Phase 1 groups by (key, salt(lsn)); phase 2 by key.  max_by
    ordering tuple is struct(ts, lsn) — unique because lsn is unique.
    """
    carry = carry or [c for c in CARRY_COLUMNS if c in df.columns]
    ordk = F.struct(F.col("ts"), F.col("lsn"))
    val = F.struct(*[F.col(c) for c in carry])

    phase1 = df.groupBy(
        *KEY_COLUMNS,
        F.pmod(F.xxhash64(F.col("lsn")), F.lit(n_salts)).alias("_salt"),
    ).agg(
        F.max_by(val, ordk).alias("_w"),
        F.count(F.lit(1)).alias("_cnt"),
        F.count_distinct(F.col("lsn")).alias("_uniq"),
    )

    phase2 = phase1.groupBy(*KEY_COLUMNS).agg(
        F.max_by(F.col("_w"), F.struct(F.col("_w.ts"), F.col("_w.lsn"))).alias("_w"),
        F.sum("_cnt").alias("n_events"),
        F.sum("_uniq").alias("n_unique"),
    )

    return phase2.select(
        *KEY_COLUMNS,
        *[F.col(f"_w.{c}").alias(c) for c in carry],
        "n_events",
        "n_unique",
        (F.col("_w.op") == F.lit("D")).alias("is_delete"),
    )


def lww_collapse_window(df: DataFrame, n_salts: int = 8, carry: list[str] | None = None,
                        counters: bool = True) -> DataFrame:
    """One-exchange LWW collapse (ops C7+C8, round-6 optimization).

    Output contract IDENTICAL to `lww_collapse` (same columns, same
    values, exact n_events/n_unique) via a different physical plan.

    Why: `max_by` over a struct value is not hash-aggregable (struct
    aggregation buffers are immutable), so the salted two-phase groupBy
    compiles to SIX SortAggregates behind THREE Exchanges — the
    count_distinct(lsn) rewrite adds a (key, salt, lsn)-keyed exchange
    level, and every exchange carries the full payload (see
    plans/r06/cdc_collapse_before.txt).  This variant plans as ONE
    Exchange(key) + ONE Sort + two linear window passes (guide §2.4:
    remove shuffles outright; operations keyed the same way share one
    exchange):

      Exchange hash(key) -> Sort(key, ts DESC, lsn DESC)
        -> Window[row_number, lag(lsn)]        (winner + new-lsn flag)
        -> Window[count(*), sum(flag)]         (n_events, exact n_unique
                                                — duplicates share (ts,
                                                lsn) so equal lsns are
                                                ADJACENT in sort order;
                                                counting lag-boundaries
                                                counts distinct lsns)
        -> Filter rn = 1

    The output stays hash-partitioned by key with the session's
    shuffle-partition count, so the downstream merge write needs no
    re-shuffle — the same alignment the two-phase version provided.

    Skew envelope, MEASURED on a degenerate log (472k events on one
    hot key, 32 cores): with counters=False Spark's map-side
    WindowGroupLimit keeps only the per-partition winner BEFORE the
    exchange, so the hot key ships ~one row per map task — this path
    is effectively SKEW-IMMUNE (0.79s vs salted carry 1.14s even on
    the degenerate log).  With counters=True the counting windows
    disable the group limit and all rows of one key land on one
    reducer (1.61s vs carry 1.14s there) — the one regime where the
    salted plan still wins: lineage-on replays of logs with a single
    degenerate key should pass collapse='carry'.  The knob
    `replay(collapse=)` keeps both paths live and
    tests/test_collapse_window.py pins them output-equal, including on
    a degenerate single-key log.  `n_salts` is accepted for signature
    compatibility and ignored.

    counters=False skips the lineage counters entirely (n_events /
    n_unique emitted as NULL): one window pass (row_number) instead of
    two.  Callers that do not consume lineage (replay(lineage=False),
    i.e. the benchmark path) should not pay for computing it — the
    merge's Observation then reports rows_in/rows_unique as 0, which
    is exactly what "lineage off" means.
    """
    carry = carry or [c for c in CARRY_COLUMNS if c in df.columns]
    w = Window.partitionBy(*KEY_COLUMNS).orderBy(F.desc("ts"), F.desc("lsn"))
    sel_tail = [(F.col("op") == F.lit("D")).alias("is_delete")]
    if not counters:
        flagged = df.select(
            *KEY_COLUMNS, *carry, F.row_number().over(w).alias("_rn"))
        return flagged.filter(F.col("_rn") == 1).select(
            *KEY_COLUMNS, *carry,
            F.lit(None).cast("long").alias("n_events"),
            F.lit(None).cast("long").alias("n_unique"),
            *sel_tail,
        )
    wp = Window.partitionBy(*KEY_COLUMNS)
    lagged = F.lag("lsn").over(w)
    flagged = df.select(
        *KEY_COLUMNS,
        *carry,
        F.row_number().over(w).alias("_rn"),
        (lagged.isNull() | (lagged != F.col("lsn"))).cast("long").alias("_new"),
    )
    counted = flagged.select(
        *KEY_COLUMNS,
        *carry,
        "_rn",
        F.count(F.lit(1)).over(wp).alias("n_events"),
        F.sum("_new").over(wp).alias("n_unique"),
    )
    return counted.filter(F.col("_rn") == 1).select(
        *KEY_COLUMNS,
        *carry,
        "n_events",
        "n_unique",
        *sel_tail,
    )


def lww_collapse_dictkey(df: DataFrame, n_salts: int = 8, carry: list[str] | None = None) -> DataFrame:
    """Salted LWW collapse with a dictionary-encoded phase-1 key
    (round-4 A/B for the 2->8 scaling pair, VERDICT r3 #3).

    Identical semantics to `lww_collapse`; different phase-1 shuffle
    key: (xxhash64(conv_id), xxhash64(conv_id, 1), turn_idx, salt) —
    a 128-bit fixed-width pair instead of the conv_id string — so the
    big shuffle (every decoded event flows through phase 1) hashes and
    compares two longs per group probe instead of variable-length
    strings.  conv_id rides once per group inside the winner struct
    (map-side combine collapses it before the wire, so shuffle BYTES
    are ~unchanged; the lever is hash/compare CPU).  Phase 2 re-groups
    the <= n_salts survivors per key BY THE STRING KEY, so the output
    keeps the (conv_id, turn_idx) hash-partitioning the downstream
    merge join reuses exchange-free — alignment identical to
    `lww_collapse`.

    Collision safety: a 128-bit key collision would merge two
    conversations' phase-1 groups and can drop a winner.  P(any
    collision) at 10^10 distinct keys is ~(10^10)^2 / 2^129 ~ 1.5e-19
    — beyond disk-corruption probability; a single 64-bit key would
    expect ~3 collisions at that scale, hence the pair.

    MEASURED NEGATIVE (round 4, canary-gated interleaved A/B, 5.19M
    events, best-of-2, final-state hash checked on every run): dictkey
    LOSES at both levels — local[2] 55.43s vs carry 51.76s, local[8]
    22.63s vs 18.21s; 2->8 efficiency 0.612 vs carry 0.711.  Spark's
    hash aggregate already hashes the string key once per row, so the
    two extra xxhash64 projections are pure added cost, and the
    conv_id string still crosses the wire inside the winner struct —
    bytes unchanged, CPU up.  Kept as a documented negative result
    (BENCH/BASELINE.md round-4 section); carry stays the default."""
    carry = carry or [c for c in CARRY_COLUMNS if c in df.columns]
    ordk = F.struct(F.col("ts"), F.col("lsn"))
    val = F.struct(F.col("conv_id"), *[F.col(c) for c in carry])

    phase1 = df.groupBy(
        F.xxhash64(F.col("conv_id")).alias("_k1"),
        F.xxhash64(F.col("conv_id"), F.lit(1)).alias("_k2"),
        F.col("turn_idx"),
        F.pmod(F.xxhash64(F.col("lsn")), F.lit(n_salts)).alias("_salt"),
    ).agg(
        F.max_by(val, ordk).alias("_w"),
        F.count(F.lit(1)).alias("_cnt"),
        F.count_distinct(F.col("lsn")).alias("_uniq"),
    )

    phase2 = phase1.select(
        F.col("_w.conv_id").alias("conv_id"), "turn_idx", "_w", "_cnt", "_uniq"
    ).groupBy(*KEY_COLUMNS).agg(
        F.max_by(F.col("_w"), F.struct(F.col("_w.ts"), F.col("_w.lsn"))).alias("_w"),
        F.sum("_cnt").alias("n_events"),
        F.sum("_uniq").alias("n_unique"),
    )

    return phase2.select(
        *KEY_COLUMNS,
        *[F.col(f"_w.{c}").alias(c) for c in carry],
        "n_events",
        "n_unique",
        (F.col("_w.op") == F.lit("D")).alias("is_delete"),
    )


def lww_collapse_slim(df: DataFrame, n_salts: int = 8, carry: list[str] | None = None) -> DataFrame:
    """Winner-lsn collapse (ops C7+C8, shuffle-lean variant).

    Same output as `lww_collapse`, different data movement: the salted
    two-stage argmax runs over (key, ts, lsn) ONLY — the shuffled rows
    are ~30 bytes regardless of payload width — and the winning
    payloads are then fetched with a semi-join of the source on the
    winner lsn set (lsn is globally unique).  The final per-key
    groupBy both absorbs redelivered copies of the winner AND leaves
    the output hash-partitioned by key, which the downstream merge
    join reuses (no re-shuffle).

    vs `lww_collapse` at 10^10 events: that variant pushes the full
    payload through both collapse shuffles; this one pushes (a) tiny
    tuples through the salted phases, (b) only winner payloads
    (<= one event per key, ~1/(1+extra_rate) of the log) through ONE
    shuffle.  Cost: the source is scanned twice, but the first scan is
    column-pruned to the key/ordering columns (Catalyst prunes the
    from_json to the fields the validity filter needs), so it is
    cheap relative to the shuffle bytes it saves.  The lsn semi-join
    is left unhinted: AQE broadcasts the winner-lsn side when it is
    small (sandbox scale) and falls back to a shuffle join when a
    batch has too many keys to broadcast (10^9-key backfills).

    WHEN TO USE (measured r3 backfills + r4 micro-batches): for this
    engine's transcript-width payloads (tens of bytes) `carry` wins in
    BOTH regimes.  Backfills (r3 A/B at 2.07M events: carry 24.3/13.1s
    at local[2]/local[8] vs slim 36.5/51.1 s): the winner-lsn set is
    about as large as the key set, too big to broadcast, so the
    semi-join SHUFFLES every decoded source row by lsn — slim moves
    MORE total bytes than carry, plus the second scan.  Incremental
    micro-batches — slim's hypothesized home regime (small
    broadcastable winner sets) — measured r4 over the 220-batch soak,
    arms interleaved per chunk: slim/carry median merge wall = 1.188
    (BENCH/SOAK.md); at ~10^2-event batches the fixed cost of the
    second scan + join outweighs payload bytes that barely exceed the
    key tuple.  slim remains justified only for genuinely wide
    payloads (KB-scale blobs/embeddings per event), where the saved
    bytes are real; for this engine's spec payloads the default is
    carry everywhere, now by measurement in both regimes.
    """
    carry = carry or [c for c in CARRY_COLUMNS if c in df.columns]
    ordk = F.struct(F.col("ts"), F.col("lsn"))

    # phase A: winner (ts, lsn) + lineage counters per key, tiny rows
    keys = df.select(*KEY_COLUMNS, "ts", "lsn")
    p1 = keys.groupBy(
        *KEY_COLUMNS,
        F.pmod(F.xxhash64(F.col("lsn")), F.lit(n_salts)).alias("_salt"),
    ).agg(
        F.max(ordk).alias("_w"),  # max of the struct IS the argmax here
        F.count(F.lit(1)).alias("_cnt"),
        F.count_distinct(F.col("lsn")).alias("_uniq"),
    )
    p2 = p1.groupBy(*KEY_COLUMNS).agg(
        F.max("_w").alias("_w"),
        F.sum("_cnt").alias("n_events"),
        F.sum("_uniq").alias("n_unique"),
    )
    counts = p2.select(*KEY_COLUMNS, "n_events", "n_unique")

    # phase B: fetch winner payloads; a winner's redelivered duplicates
    # share its lsn, so the semi-join returns copies — the groupBy
    # collapses them and hash-partitions the result by key
    win_ev = df.join(p2.select(F.col("_w.lsn").alias("lsn")), "lsn", "left_semi")
    val = F.struct(*[F.col(c) for c in carry])
    uniq = win_ev.groupBy(*KEY_COLUMNS).agg(F.max_by(val, ordk).alias("_w"))

    # counts side arrives hash-partitioned by key from its own groupBy;
    # this join needs no new exchange on either side
    return uniq.join(counts, KEY_COLUMNS).select(
        *KEY_COLUMNS,
        *[F.col(f"_w.{c}").alias(c) for c in carry],
        "n_events",
        "n_unique",
        (F.col("_w.op") == F.lit("D")).alias("is_delete"),
    )


def normalize_winner_text(df: DataFrame) -> DataFrame:
    """Apply the vectorized text normalization (op C3's UDF) to the
    collapsed winners.  Post-collapse placement: normalization cannot
    change which event wins — ordering is (ts, lsn) — so only the <=
    one-row-per-key output crosses the Python boundary.

    Round 6 (guide §4.1: control how many BYTES cross the boundary):
    a string whose every char is printable non-space ASCII [!-~] is a
    fixed point of NFC (ASCII is normalization-inert) AND of strip()
    (it contains no whitespace anywhere, and Python's strip only
    removes leading/trailing whitespace — note \\x1c-\\x1f also count
    as whitespace in Python, all below \\x21).  Those rows — the
    majority at transcript widths — are nulled BEFORE the UDF input
    expression, so they cross Arrow as validity bits instead of string
    bytes and skip the Python work entirely; coalesce restores the
    original afterwards.  Bit-exact by construction; replay-equality
    and the DuckDB gate pin it."""
    from ..functions.normalize import nfc_strip

    if "text" not in df.columns:
        return df
    needs_work = ~F.col("text").rlike(r"^[\x21-\x7e]+$")
    return df.withColumn(
        "text",
        F.coalesce(nfc_strip(F.when(needs_work, F.col("text"))), F.col("text")),
    )


# Key-position markers ("<key>":) — a bare '"tool"' would false-match
# the VALUE of role="tool".  Compact-JSON producers (ours) always emit
# the colon adjacent; for exotic producers the exact-count variant
# below remains available.
PAYLOAD_KEY_MARKERS = {"tool": '"tool":', "meta_tokens": '"meta":'}


def absent_payload_columns(raw: DataFrame, existing: set[str],
                           markers: dict[str, str] = PAYLOAD_KEY_MARKERS) -> list[str]:
    """Evolution probe (op C9 support): which candidate columns are
    certainly absent from this batch's payloads?

    A JSON key must appear as a quoted string in any formatting, so
    `payload NOT LIKE '%"tool"%'` across the batch proves the key is
    absent — one substring scan over the raw strings, no JSON parse,
    no Python.  (A text that merely *mentions* '"tool"' yields a false
    keep: the column is added all-null — harmless.)  Only runs for
    candidates not yet in the target schema, i.e. normally just the
    first batch of a fresh/v1-era table.
    """
    check = {c: m for c, m in markers.items() if c not in existing}
    if not check:
        return []
    # Short-circuit probe (round 6, guide §1.4/§5): the old single-agg
    # form (`max(contains(...))`) always scanned the ENTIRE batch even
    # when every marker appears in the first rows — one full extra pass
    # over the raw payload strings per fresh-table merge.  take(1) on a
    # filtered, column-pruned scan stops at the first hit (Spark runs
    # 1 partition, then 4x more, ... — a present key costs one small
    # task); an absent key still pays the full column-pruned scan, the
    # same worst case as before.  Semantics unchanged: a column is
    # absent iff NO payload contains its marker (null payloads fail
    # `contains` -> filtered, matching the old coalesce(False)).
    out = []
    for c, m in check.items():
        if not raw.filter(F.col("payload").contains(m)).select("payload").take(1):
            out.append(c)
    return out


def prune_absent_columns(df: DataFrame, existing: set[str], candidates: tuple[str, ...] = ("tool", "meta_tokens")) -> DataFrame:
    """Drop evolution-candidate columns that are entirely null in this
    batch AND not yet part of the target schema (op C9 support).

    Exact variant (full count over the decoded columns); pipelines
    prefer the cheap `absent_payload_columns` probe on the raw batch.
    """
    check = [c for c in candidates if c in df.columns and c not in existing]
    if not check:
        return df
    counts = df.agg(*[F.count(F.col(c)).alias(c) for c in check]).first()
    drop = [c for c in check if counts[c] == 0]
    return df.drop(*drop) if drop else df
