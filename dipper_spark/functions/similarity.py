"""Near-duplicate detection + similarity search for training-data
pipelines — all expressed as DataFrame plans that survive a 100 TB
corpus (hash-shuffle on digests/band keys, never on raw text;
JVM-side higher-order functions; no Python in the candidate path).

Operators:
  shingles(df)            word 3-gram shingle sets
  minhash_signatures(df)  k-permutation MinHash over shingles
  lsh_candidate_pairs(df) banded-LSH bucket join -> candidate pairs
  exact_jaccard_pairs(df) exact shingle-set Jaccard for pairs (verify)
  minhash_near_dups(...)  candidates -> exact verify >= threshold
  simhash64(df)           64-bit SimHash fingerprint per doc
  cosine_topk(...)        brute-force ANN baseline (see relational_ext)

Scale shape: shingle explode is the widest stage (|doc| rows per doc)
but reduces immediately into per-doc aggregates; LSH turns the O(n^2)
pair space into per-bucket joins whose sizes the band/row parameters
control; only candidate pairs (tiny) reach the exact-verify join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle_hash) — distinct word n-gram shingles per doc,
    pre-hashed to int64 so downstream shuffles move 8 bytes, not text."""
    words = F.split(F.col(text_col), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return (
        df.filter(F.size(words) >= n)
        .select(F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle"))
        .select("id", F.xxhash64("shingle").alias("sh"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame, k: int = 32) -> DataFrame:
    """(id, sig: array<bigint>[k]) — one aggregation, k mins at once.

    The k "permutations" are xxhash64(shingle_hash, i): independent,
    well-mixed, and stable across runs/engines."""
    mins = [F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}") for i in range(k)]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"h{i}" for i in range(k)]).alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 8, rows: int = 4) -> DataFrame:
    """Banded LSH: docs sharing any band land in the same bucket.
    Returns distinct (id_a, id_b) with id_a < id_b."""
    assert bands * rows <= 256
    banded = sigs.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.concat_ws("_", *[F.element_at("sig", b * rows + r + 1) for r in range(rows)])).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bh")
    a, b2 = banded.alias("a"), banded.alias("b")
    return (
        a.join(b2, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def exact_jaccard_pairs(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact |A∩B| / |A∪B| for the given candidate pairs only."""
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("sa")
    b = sh.alias("sb")
    inter = (
        pairs.join(a, F.col("id_a") == F.col("sa.id"))
        .join(b, (F.col("id_b") == F.col("sb.id")) & (F.col("sa.sh") == F.col("sb.sh")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.withColumnsRenamed({"id": "id_a", "n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0)))
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
    )
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def minhash_near_dups(df: DataFrame, threshold: float = 0.8, k: int = 32,
                      bands: int = 8, rows: int = 4) -> DataFrame:
    """LSH candidates -> exact verification >= threshold.

    Precision is exact (verified); recall is the LSH S-curve
    1-(1-s^rows)^bands (~0.9996 at s=0.8 with 8x4)."""
    sh = shingles(df)
    cands = lsh_candidate_pairs(minhash_signatures(sh, k=k), bands=bands, rows=rows)
    jac = exact_jaccard_pairs(sh, cands)
    return jac.filter(F.col("jaccard") >= threshold)


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(id, component) over an undirected edge list (id_a, id_b) —
    min-label propagation: every node's label converges to the
    smallest id reachable from it.  Rounds needed = O(graph diameter);
    near-dup graphs are unions of tiny cliques, so 2-4 rounds suffice.

    This is the clustering stage of dedup-at-scale: candidate pairs
    (from LSH) -> components -> one canonical doc per component.  Each
    round is two hash joins + a groupBy over the edge list — fully
    distributed; the driver only checks a converged flag per round.
    (At 10^9 edges use `connected_components_star` below — the
    alternating large-star/small-star iteration converges in
    O(log^2 n) rounds regardless of diameter.)

    Raises RuntimeError if the loop exhausts max_iter without
    converging — unconverged labels are silently-wrong components.
    The returned DataFrame is NOT cached; the loop's intermediates
    are unpersisted before returning.
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).unionAll(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        nbr = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), F.col("label")
        )
        # localCheckpoint, NOT persist: `labels` appears twice in this
        # round's plan, so without lineage truncation the logical plan
        # tree DOUBLES per round — Catalyst re-analysis and AQE's
        # explainString go exponential after ~10 rounds even though
        # the cached data is tiny.  Checkpoint-per-round is the
        # standard iterative-graph practice (GraphFrames does the
        # same); it also materializes eagerly.
        new_labels = (
            labels.select("id", "label").unionAll(nbr)
            .groupBy("id").agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(graph diameter > max_iter); raise max_iter or use "
            f"connected_components_star (O(log^2 n) rounds)"
        )
    return labels.select(F.col("id"), F.col("label").alias("component"))


def connected_components_star(pairs: DataFrame, max_iter: int = 50,
                              stats: dict | None = None) -> DataFrame:
    """(id, component) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the 10^9-edge kernel: converges in O(log^2 n) rounds
    independent of graph diameter, vs O(diameter) for label
    propagation, and each round is one groupBy over the edge list.

      large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
      small-star(u): over edges directed high->low (u > v), m = min(N⁻(u) ∪ {u});
                     emit (v, m) for v ∈ N⁻(u) ∪ {u}, v ≠ m

    Fixpoint: every edge points directly at its component's min id
    (a star).  Both steps are a single shuffle on the center node —
    no joins at all — so a round moves exactly |E| tuples of 16 bytes.
    Same contract as `connected_components`: returns an uncached
    (id, component) frame, raises on non-convergence.  Pass a dict as
    `stats` to receive {"rounds": n} (adversarial-scale tests assert
    the O(log^2 n) round bound with it).
    """
    # canonical undirected edge set, self-loops dropped.  Every round
    # below references its input edge set several times (union of both
    # directions + join back with the mins), so each round's frame is
    # localCheckpoint-ed: without lineage truncation the logical plan
    # tree grows ~10x per round and Catalyst analysis goes exponential
    # (measured: a 6-node chain hung for minutes in AQE explainString).
    e = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("id")).unionAll(e.select(F.col("v").alias("id")))
        .distinct().localCheckpoint(eager=True)
    )

    def _fingerprint(df: DataFrame) -> tuple[int, int]:
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-insensitive set fingerprint, no overflow
            # (ANSI sum on xxhash64 values overflows long)
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).first()
        return int(r["n"]), int(r["h"])

    converged = False
    fp = _fingerprint(e)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: m(u) = min(Γ(u) ∪ {u}); attach every strictly-larger
        # neighbor to m.  Implemented as groupBy-min + a co-partitioned
        # join back (NOT collect_set/window: a 10^8-member star would
        # otherwise materialize one giant neighbor array in a single
        # task — min's map-side partial aggregation absorbs the skew).
        both = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            both.groupBy("u").agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        ls = (
            both.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: ls edges point high->low (u > v, since m <= u < w);
        # connect all of u's smaller neighbors AND u itself to their min
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(mins2.select("u", F.col("m").alias("v")))  # center edge: u > m always
            .distinct()
            .localCheckpoint(eager=True)  # truncate lineage (see above)
        )
        new_fp = _fingerprint(ss)
        e = ss
        if new_fp == fp:
            converged = True
            break
        fp = new_fp
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(f"connected_components_star did not converge in {max_iter} rounds")
    # fixpoint edges are (member, root) stars; isolated roots map to themselves
    return (
        nodes.join(e.withColumnsRenamed({"u": "id", "v": "component"}), "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """63-bit SimHash per doc (bit 63 left clear so the fingerprint fits
    a signed int64): sign-sum of word-hash bits, JVM-side.

    For each bit position, count words whose hash has the bit set vs
    not; bit set in the fingerprint iff majority.  Expressed as one
    explode + one aggregation over 63 conditional counts."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("w"),
    ).select("id", F.xxhash64("w").alias("h"))
    bit_sums = [
        F.sum(F.when(F.col("h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(63)
    ]
    agg = words.groupBy("id").agg(*bit_sums)
    fp = None
    for i in range(63):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return agg.select("id", fp.alias("simhash"))
