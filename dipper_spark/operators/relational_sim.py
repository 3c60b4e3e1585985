"""Query registrations for similarity / near-dup / multimodal operators
(training-data-pipeline surface).  Oracles where DuckDB can express the
same computation; rows-only otherwise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import ann
from ..functions import multimodal as mm
from ..functions import similarity as sim
from .relational import load, q


@q("dedup_ngram_jaccard_exact", """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 40
),
sh AS (
  SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) > 0.01
""")
def dedup_ngram_jaccard_exact(spark, d):
    """Exact 3-gram Jaccard for all pairs of a small doc slice — the
    ground-truth kernel the MinHash path approximates.  All-pairs is
    only sane on a slice; the full-corpus path is LSH (below)."""
    docs = load(spark, d, "documents").filter(F.col("doc_id") < 40)
    sh = sim.shingles(docs)
    pairs = (
        sh.select(F.col("id").alias("id_a")).distinct()
        .crossJoin(sh.select(F.col("id").alias("id_b")).distinct())
        .filter(F.col("id_a") < F.col("id_b"))
    )
    return sim.exact_jaccard_pairs(sh, pairs).filter(F.col("jaccard") > 0.01)


@q("dedup_cluster_canonical", """
WITH RECURSIVE
words AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] AS shingle
       FROM words, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
pairs AS (SELECT id_a, id_b FROM inter
          JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.1),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT src AS id, src AS label FROM edges
  UNION
  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.label < e.dst
)
SELECT id AS doc_id, MIN(label) AS canonical FROM reach GROUP BY id
""")
def dedup_cluster_canonical(spark, d):
    """Near-dup CLUSTERING — the stage after pair finding in dedup at
    scale: similar-pair graph -> connected components (min-label
    propagation, distributed joins) -> one canonical doc per cluster
    (the component's min doc_id; dedup keeps it, drops the rest).
    Candidates here are shingle-sharing pairs so DuckDB's recursive
    CTE can verify the full pipeline exactly; the 100 TB path feeds
    LSH candidates (dedup_minhash_lsh) into the same component step.

    Components via the large-star/small-star kernel (O(log^2 n)
    rounds, join-free rounds — the 10^9-edge path); property-tested
    equal to min-label propagation in tests/test_similarity_multimodal."""
    docs = load(spark, d, "documents")
    sh = sim.shingles(docs)
    pairs = _exact_pairs_via_shingles(sh, 0.1)
    comp = sim.connected_components_star(pairs.select("id_a", "id_b"))
    return comp.select(F.col("id").alias("doc_id"), F.col("component").alias("canonical"))


def _exact_pairs_via_shingles(sh, threshold: float):
    """Ground-truth near-dup pairs: shingle-sharing candidates -> exact
    Jaccard >= threshold.  Exhaustive for threshold > 0 (any pair with
    nonzero Jaccard shares >= 1 shingle), no all-pairs join."""
    a, b = sh.alias("a"), sh.alias("b")
    cand = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return sim.exact_jaccard_pairs(sh, cand).filter(F.col("jaccard") >= threshold)


@q("dedup_minhash_lsh", """
SELECT CAST(1 AS BOOLEAN) AS nonempty,
       CAST(1 AS BOOLEAN) AS recall_high_sim_ok,
       CAST(1 AS BOOLEAN) AS precision_ok
""")
def dedup_minhash_lsh(spark, d):
    """Full MinHash+LSH near-dup pipeline (shingle -> minhash -> band ->
    bucket-join -> exact verify), promoted from rows-only to a
    hash-checked contract (the ANN queries' invariant->boolean
    pattern): (a) output nonempty, (b) RECALL — every ground-truth
    pair with exact Jaccard >= 0.9 is found.  0.9, not 0.8: 8x4
    banding's S-curve miss probability is ~1.5e-2 at s=0.8 but ~1e-4
    at s=0.9, so a zero-miss assertion is only robust (to harness
    data / shingle changes) in the >= 0.9 regime; the planted dups
    sit there.  (c) PRECISION — every emitted pair really has exact
    Jaccard >= the 0.5 threshold (verifies the exact-verify stage
    against an independently computed pair set)."""
    docs = load(spark, d, "documents")
    lsh = sim.minhash_near_dups(docs, threshold=0.5).select("id_a", "id_b")

    sh = sim.shingles(docs)
    truth05 = _exact_pairs_via_shingles(sh, 0.5).select("id_a", "id_b")
    truth09 = _exact_pairs_via_shingles(sh, 0.9).select("id_a", "id_b")

    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    n_missed = truth09.join(lsh, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_missed")
    )
    n_false = lsh.join(truth05, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_false")
    )
    return (
        n_lsh.crossJoin(n_missed).crossJoin(n_false)
        .select(
            (F.col("n_lsh") > 0).alias("nonempty"),
            (F.col("n_missed") == 0).alias("recall_high_sim_ok"),
            (F.col("n_false") == 0).alias("precision_ok"),
        )
    )


@q("dedup_minhash_signatures", """
SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       CAST(1 AS BOOLEAN) AS k_ok,
       CAST(1 AS BOOLEAN) AS deterministic_ok,
       CAST(1 AS BOOLEAN) AS pairs_nonempty,
       CAST(1 AS BOOLEAN) AS agreement_separates
""")
def dedup_minhash_signatures(spark, d):
    """MinHash signatures promoted to a hash-checked contract:
    (a) one signature per document, (b) every signature has exactly k
    slots, (c) recomputing from scratch is bit-identical (the
    "permutations" are stateless xxhash64 mixes), (d) positional
    signature agreement separates planted near-dups (exact Jaccard
    >= 0.8 -> expected agreement ~= Jaccard >= ~0.8) from shifted
    far pairs (agreement ~= 0).  (d) is the estimator property that
    makes MinHash usable as a Jaccard sketch at all.

    `pairs_nonempty` guards (d)'s preconditions: the far-pair set is
    built as (id, id+101) and assumes a dense, >= 102-doc corpus — on
    a smaller or re-keyed corpus the near or far set goes empty, avg()
    goes NULL, and without the guard the contract column would turn
    NULL silently; this way an empty set fails loudly and explicably
    (pairs_nonempty=false) while the coalesced averages keep
    agreement_separates a real boolean."""
    k = 16
    docs = load(spark, d, "documents")
    sh = sim.shingles(docs)
    sigs = sim.minhash_signatures(sh, k=k)
    sigs2 = sim.minhash_signatures(sim.shingles(docs), k=k)

    base = sigs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.size("sig") == k).alias("k_ok"),
    )
    det = (
        sigs.join(sigs2.withColumnsRenamed({"sig": "sig2"}), "id")
        .agg(F.min(F.col("sig") == F.col("sig2")).alias("deterministic_ok"))
    )

    def agreement(pairs):
        sa = sigs.withColumnsRenamed({"id": "id_a", "sig": "sig_a"})
        sb = sigs.withColumnsRenamed({"id": "id_b", "sig": "sig_b"})
        eq = F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int"))
        return (
            pairs.join(sa, "id_a").join(sb, "id_b")
            .select((F.aggregate(eq, F.lit(0), lambda acc, x: acc + x) / k).alias("agree"))
        )

    near = _exact_pairs_via_shingles(sh, 0.8).select("id_a", "id_b")
    ids = sigs.select(F.col("id").alias("id_a"))
    far = (
        ids.join(sigs.select((F.col("id") - 101).alias("id_a"), F.col("id").alias("id_b")), "id_a")
        .join(near, ["id_a", "id_b"], "left_anti")
    )
    sep = (
        agreement(near).agg(F.avg("agree").alias("na"), F.count(F.lit(1)).alias("nn"))
        .crossJoin(agreement(far).agg(F.avg("agree").alias("fa"), F.count(F.lit(1)).alias("nf")))
        .select(
            ((F.col("nn") > 0) & (F.col("nf") > 0)).alias("pairs_nonempty"),
            ((F.coalesce(F.col("na"), F.lit(-1.0)) >= 0.6)
             & (F.coalesce(F.col("fa"), F.lit(1.0)) <= 0.2)).alias("agreement_separates"),
        )
    )
    return base.crossJoin(det).crossJoin(sep).select(
        "n_docs", "k_ok", "deterministic_ok", "pairs_nonempty", "agreement_separates"
    )


@q("dedup_simhash", """
SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       CAST(1 AS BOOLEAN) AS all_nonneg,
       CAST(1 AS BOOLEAN) AS pairs_nonempty,
       CAST(1 AS BOOLEAN) AS near_lt_far
""")
def dedup_simhash(spark, d):
    """SimHash promoted to a hash-checked contract: (a) one fingerprint
    per doc, (b) bit 63 clear (fits signed int64), (c) the Hamming
    metric SEPARATES: mean Hamming distance over planted near-dup
    pairs (exact Jaccard >= 0.8) is at least 8 bits below the mean
    over shifted far pairs — the property that makes SimHash a usable
    near-dup filter."""
    docs = load(spark, d, "documents")
    fp = sim.simhash64(docs)
    base = fp.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.col("simhash") >= 0).alias("all_nonneg"),
    )

    fa = fp.withColumnsRenamed({"id": "id_a", "simhash": "fp_a"})
    fb = fp.withColumnsRenamed({"id": "id_b", "simhash": "fp_b"})

    def avg_hamming(pairs):
        return (
            pairs.join(fa, "id_a").join(fb, "id_b")
            .select(F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("h"))
            .agg(F.avg("h").alias("avg_h"), F.count(F.lit(1)).alias("n_pairs"))
        )

    near = _exact_pairs_via_shingles(sim.shingles(docs), 0.8).select("id_a", "id_b")
    far = (
        fp.select(F.col("id").alias("id_a"))
        .join(fp.select((F.col("id") - 101).alias("id_a"), F.col("id").alias("id_b")), "id_a")
        .join(near, ["id_a", "id_b"], "left_anti")
    )
    # same empty-pair-set guard as dedup_minhash_signatures: the
    # (id, id+101) far pairs assume a dense >= 102-doc corpus; fail
    # loudly (pairs_nonempty=false), never via a silent NULL boolean
    sep = (
        avg_hamming(near).withColumnsRenamed({"avg_h": "nh", "n_pairs": "nn"})
        .crossJoin(avg_hamming(far).withColumnsRenamed({"avg_h": "fh", "n_pairs": "nf"}))
        .select(
            ((F.col("nn") > 0) & (F.col("nf") > 0)).alias("pairs_nonempty"),
            (F.coalesce(F.col("nh"), F.lit(64.0)) + 8
             <= F.coalesce(F.col("fh"), F.lit(0.0))).alias("near_lt_far"),
        )
    )
    return base.crossJoin(sep).select("n_docs", "all_nonneg", "pairs_nonempty", "near_lt_far")


@q("ann_cosine_lsh", """
SELECT 10 AS k, CAST(1 AS BOOLEAN) AS recall_ok, CAST(1 AS BOOLEAN) AS probed_lt_full
""")
def ann_cosine_lsh(spark, d):
    """Hyperplane-LSH ANN vs exact brute force, as a driver-checkable
    contract: recall@10 >= 0.8 AND candidates <= 90% of the corpus
    (proving the verify stage is not a full scan).  The exact top-k it
    is judged against is the same plan the oracle-verified
    embedding_cosine_topk query uses.  Tolerances are folded into
    booleans because a hash-compare can't express recall tolerance.

    NB the synthetic embeddings are near-uniform — ANN's worst case —
    so the probed fraction is high here by nature (~80%); the planted-
    neighbor pytest shows the same operator probing only a few percent
    when real neighbor structure exists."""
    e = load(spark, d, "embeddings")
    corpus = e.filter(F.col("vec_id") != 0)
    query = e.filter(F.col("vec_id") == 0)

    topk, cands = ann.ann_cosine_topk(corpus, query, k=10)

    qvec = query.select(F.col("embedding").alias("_q"))
    cos = ann.dot_product(F.col("embedding"), F.col("_q")) / (
        F.sqrt(ann.dot_product(F.col("embedding"), F.col("embedding")))
        * F.sqrt(ann.dot_product(F.col("_q"), F.col("_q")))
    )
    exact = (
        corpus.crossJoin(F.broadcast(qvec))
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col("vec_id"))
        .limit(10)
    )

    n_hit = (
        topk.select("vec_id").join(exact.select("vec_id"), "vec_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    n_cand = cands.agg(F.count(F.lit(1)).alias("n_cand"))
    n_corp = corpus.agg(F.count(F.lit(1)).alias("n_corp"))
    return (
        n_hit.crossJoin(n_cand).crossJoin(n_corp)
        .select(
            F.lit(10).alias("k"),
            (F.col("n_hit") >= 8).alias("recall_ok"),
            (F.col("n_cand") <= 0.9 * F.col("n_corp")).alias("probed_lt_full"),
        )
    )


@q("ann_cosine_ivf", """
SELECT 10 AS k, CAST(1 AS BOOLEAN) AS recall_ok, CAST(1 AS BOOLEAN) AS probed_lt_full
""")
def ann_cosine_ivf(spark, d):
    """IVF-flat ANN (the second scale path next to LSH): nearest-
    centroid cells, probe the query's closest cells only.  Contract
    thresholds are looser than LSH's (recall >= 0.5, probed <= 0.85)
    because cell partitioning of a NEAR-UNIFORM corpus spreads true
    neighbors across cells — on structured corpora the planted-
    neighbor pytest shows recall 1.0 probing ~2 cells of 16."""
    e = load(spark, d, "embeddings")
    corpus = e.filter(F.col("vec_id") != 0)
    query = e.filter(F.col("vec_id") == 0)

    topk, cands = ann.ivf_cosine_topk(corpus, query, k=10, n_cells=16, nprobe=12)

    qvec = query.select(F.col("embedding").alias("_q"))
    cos = ann.dot_product(F.col("embedding"), F.col("_q")) / (
        F.sqrt(ann.dot_product(F.col("embedding"), F.col("embedding")))
        * F.sqrt(ann.dot_product(F.col("_q"), F.col("_q")))
    )
    exact = (
        corpus.crossJoin(F.broadcast(qvec))
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col("vec_id"))
        .limit(10)
    )
    n_hit = (
        topk.select("vec_id").join(exact.select("vec_id"), "vec_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    n_cand = cands.agg(F.count(F.lit(1)).alias("n_cand"))
    n_corp = corpus.agg(F.count(F.lit(1)).alias("n_corp"))
    return (
        n_hit.crossJoin(n_cand).crossJoin(n_corp)
        .select(
            F.lit(10).alias("k"),
            (F.col("n_hit") >= 5).alias("recall_ok"),
            (F.col("n_cand") <= 0.85 * F.col("n_corp")).alias("probed_lt_full"),
        )
    )


@q("dedup_embedding_cosine", """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
""")
def dedup_embedding_cosine(spark, d):
    """Embedding-cosine near-dup: exact pair finding at a cosine
    threshold — the embedding-space counterpart of the MinHash/SimHash
    text paths, full-value-checked against DuckDB's
    list_cosine_similarity over the same table.

    This is the exact-verify KERNEL (all pairs, correct by
    construction); it is what runs on the candidate set at scale —
    candidates come from the LSH bucket join (ann_cosine_lsh) or the
    IVF cell layout (ann_cosine_ivf), the same machinery
    tools/ann_bench.py measures sublinear at 10^6 vectors.  All-pairs
    is only sane at oracle scale, exactly like
    dedup_ngram_jaccard_exact's 40-doc slice."""
    from ..functions.ann import dot_product

    e = load(spark, d, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    cos = dot_product(F.col("ea"), F.col("eb")) / (
        F.sqrt(dot_product(F.col("ea"), F.col("ea")))
        * F.sqrt(dot_product(F.col("eb"), F.col("eb")))
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("_c"))
        .filter(F.col("_c") >= 0.45)
        .select("id_a", "id_b", F.round("_c", 4).alias("cosine"))
    )


@q("multimodal_decode_meta", """
SELECT doc_id,
       CAST(strlen(text) * 7 % 640 + 1 AS INT) AS width,
       CAST(strlen(text) * 13 % 480 + 1 AS INT) AS height,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CASE WHEN doc_id % 3 = 0 THEN 'png'
            WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS format
FROM documents
""")
def multimodal_decode_meta(spark, d):
    """Binary-column decode plumbing: blob bytes -> typed metadata via
    Arrow-batched mapInPandas (codec stubbed with a deterministic pure
    function, so the oracle can verify the full data path)."""
    docs = load(spark, d, "documents")
    return mm.decode_image_meta(mm.attach_fake_blobs(docs))


@q("multimodal_frame_sample", """
SELECT doc_id, COUNT(*) AS n_frames_sampled
FROM (
  SELECT doc_id, UNNEST(range(0, strlen(text) % 300 + 1, 30)) AS frame_idx
  FROM documents WHERE doc_id % 3 = 2
) GROUP BY doc_id
""")
def multimodal_frame_sample(spark, d):
    docs = load(spark, d, "documents")
    frames = mm.frame_sample_plan(mm.attach_fake_blobs(docs), every_n=30)
    return frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames_sampled"))
