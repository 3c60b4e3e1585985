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
    (At 10^9 edges the constant-factor upgrade is the alternating
    large-star/small-star iteration — same join shape.)"""
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).unionAll(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    for _ in range(max_iter):
        nbr = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), F.col("label")
        )
        new_labels = (
            labels.select("id", "label").unionAll(nbr)
            .groupBy("id").agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("id"), F.col("label").alias("component"))


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
