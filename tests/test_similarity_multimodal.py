"""Similarity / near-dup / multimodal operators (training-data surface)."""

import pandas as pd
from pyspark.sql import functions as F

from dipper_spark.functions import multimodal as mm
from dipper_spark.functions import similarity as sim


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("today", "tomorrow")),  # near dup of 0
        (3, "completely different words about spark shuffles and parquet files"),
        (4, "another unrelated document mentioning watermarks and merges only"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_jaccard_identity_and_neardup(spark):
    docs = _docs(spark)
    sh = sim.shingles(docs)
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "id_a bigint, id_b bigint")
    out = {(r.id_a, r.id_b): r.jaccard for r in sim.exact_jaccard_pairs(sh, pairs).collect()}
    assert out[(0, 1)] == 1.0
    assert 0.5 < out[(0, 2)] < 1.0
    assert out[(0, 3)] == 0.0


def test_minhash_lsh_finds_near_dups(spark):
    docs = _docs(spark)
    dups = sim.minhash_near_dups(docs, threshold=0.5).collect()
    found = {(r.id_a, r.id_b) for r in dups}
    assert (0, 1) in found and (0, 2) in found and (1, 2) in found
    assert all(a < b for a, b in found)
    assert not any(3 in p or 4 in p for p in found)


def test_minhash_deterministic(spark):
    docs = _docs(spark)
    s1 = sim.minhash_signatures(sim.shingles(docs), k=8).orderBy("id").collect()
    s2 = sim.minhash_signatures(sim.shingles(docs), k=8).orderBy("id").collect()
    assert [r.sig for r in s1] == [r.sig for r in s2]
    # identical docs -> identical signatures
    sigs = {r.id: r.sig for r in s1}
    assert sigs[0] == sigs[1]


def test_simhash_close_for_neardups(spark):
    docs = _docs(spark)
    fp = {r.id: r.simhash for r in sim.simhash64(docs).collect()}
    assert fp[0] == fp[1]

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 63) - 1)).count("1")

    assert hamming(fp[0], fp[2]) < hamming(fp[0], fp[3])


def test_multimodal_decode_roundtrip(spark):
    docs = _docs(spark)
    meta = mm.decode_image_meta(mm.attach_fake_blobs(docs)).orderBy("doc_id").toPandas()
    texts = docs.orderBy("doc_id").toPandas()["text"]
    assert (meta["n_bytes"] == texts.str.len()).all()
    assert (meta["width"] == (texts.str.len() * 7 % 640 + 1)).all()
    assert set(meta["format"]) <= {"png", "wav", "mp4"}
    assert str(meta["width"].dtype) == "int32"


def test_multimodal_stubs_raise_cleanly(spark):
    import pytest

    docs = _docs(spark)
    blobs = mm.attach_fake_blobs(docs)
    with pytest.raises(Exception, match="NotImplementedError|codec|ML runtime"):
        mm.resize_stub(blobs, 64, 64).collect()


def test_binlog_datasource_stream(spark, tmp_path):
    """Custom Python DataSource (op C2): same changelog, own offsets."""
    from dipper_spark.streaming.binlog_source import BinlogDataSource
    from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

    logical, man = gen_changelog(str(tmp_path / "log"), ChangelogSpec(seed=61, n_conv=20, extra_rate=0.5, n_chunks=3))
    spark.dataSource.register(BinlogDataSource)
    stream = (
        spark.readStream.format("dipper_binlog")
        .option("path", str(tmp_path / "log"))
        .load()
    )
    q = (
        stream.writeStream.format("memory").queryName("binlog_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("binlog_sink")
    assert got.count() == man["n_delivered"]
    assert got.select(F.count_distinct("lsn")).first()[0] == man["n_events"]


def test_ann_lsh_planted_neighbors_sublinear(spark):
    """On a corpus with REAL neighbor structure (planted near-dups at
    cosine >= ~0.99), hyperplane LSH finds all of them while probing
    only a small fraction of the corpus — the sublinear scale path the
    near-uniform sandbox embeddings can't show."""
    import numpy as np

    from dipper_spark.functions import ann

    rng = np.random.default_rng(3)
    dim, n = 64, 400
    corpus = rng.normal(size=(n, dim))
    q = rng.normal(size=dim)
    planted = [1, 2, 3, 4, 5]
    for i in planted:
        corpus[i] = q + rng.normal(scale=0.05, size=dim)  # cos ~ 0.995

    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in corpus[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    )
    qdf = spark.createDataFrame([([float(x) for x in q],)], "embedding array<float>")

    # long bands (rows=8) -> random collisions are rare, near-dups still hit
    topk, cands = ann.ann_cosine_topk(cdf, qdf, k=5, bands=2, rows=8, multiprobe=1, dim=dim)
    got = [r.vec_id for r in topk.collect()]
    assert sorted(got) == planted
    n_cand = cands.count()
    assert n_cand <= 0.25 * n, f"probed {n_cand}/{n} — not sublinear"


def test_ann_lsh_deterministic_signatures(spark):
    """Signatures are seed-stable across invocations (plane arrays are
    derived from a fixed seed, not process randomness)."""
    from dipper_spark.functions import ann

    df = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) - 6.0 for j in range(8)]) for i in range(20)],
        "vec_id bigint, embedding array<float>",
    )
    b1 = ann.signature_bits(df, "embedding", 16, 8).select("vec_id", "_bits").orderBy("vec_id").collect()
    b2 = ann.signature_bits(df, "embedding", 16, 8).select("vec_id", "_bits").orderBy("vec_id").collect()
    assert [r._bits for r in b1] == [r._bits for r in b2]


def test_binlog_max_chunks_per_trigger(spark, tmp_path):
    """maxChunksPerTrigger paces the backlog into bounded micro-batches
    (Kafka maxOffsetsPerTrigger shape) without losing any events."""
    from dipper_spark.streaming.binlog_source import BinlogDataSource
    from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

    logical, man = gen_changelog(str(tmp_path / "log"),
                                 ChangelogSpec(seed=62, n_conv=30, extra_rate=0.5, n_chunks=6))
    try:
        spark.dataSource.register(BinlogDataSource)
    except Exception:
        pass
    stream = (
        spark.readStream.format("dipper_binlog")
        .option("path", str(tmp_path / "log"))
        .option("maxChunksPerTrigger", "2")
        .load()
    )
    # availableNow snapshots latestOffset ONCE (the Python DataSource
    # API has no admission-control hook), so pacing is exercised under
    # a processing-time trigger, stopping once the backlog drains
    import time

    batches = []
    q = (
        stream.writeStream.foreachBatch(lambda df, bid: batches.append((bid, df.count())))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds").start()
    )
    deadline = time.time() + 90
    while sum(n for _, n in batches) < man["n_delivered"] and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert sum(n for _, n in batches) == man["n_delivered"]
    assert len([1 for _, n in batches if n > 0]) >= 3  # 6 chunks / 2 per trigger


def test_ivf_planted_neighbors_few_cells(spark):
    """IVF on a structured corpus: planted near-dups share the query's
    cell, so probing 2 of 12 cells finds them all."""
    import numpy as np

    from dipper_spark.functions import ann

    rng = np.random.default_rng(5)
    dim, n = 64, 360
    corpus = rng.normal(size=(n, dim))
    q = rng.normal(size=dim)
    planted = [2, 3, 4, 5, 6]
    for i in planted:
        corpus[i] = q + rng.normal(scale=0.05, size=dim)

    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in corpus[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    )
    qdf = spark.createDataFrame([([float(x) for x in q],)], "embedding array<float>")
    topk, cands = ann.ivf_cosine_topk(cdf, qdf, k=5, n_cells=12, nprobe=2)
    got = sorted(r.vec_id for r in topk.collect())
    assert got == planted
    assert cands.count() <= 0.4 * n  # probed ~2/12 of the corpus


def test_connected_components_clusters_neardups(spark):
    """Pair graph {0-1, 0-2, 1-2} + {3-4}: two components, canonical =
    min id of each; convergence in few label-propagation rounds."""
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 4)], "id_a bigint, id_b bigint"
    )
    comp = {r.id: r.component for r in sim.connected_components(pairs).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_connected_components_chain(spark):
    """A 6-node chain (worst-case diameter) still converges to one
    component."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a bigint, id_b bigint"
    )
    comp = {r.id: r.component for r in sim.connected_components(pairs).collect()}
    assert set(comp.values()) == {0} and len(comp) == 6


def test_connected_components_star_matches_label_prop(spark):
    """Property: the large-star/small-star kernel produces the same
    partition into components as min-label propagation on random
    graphs (the 10^9-edge upgrade must be a drop-in replacement)."""
    import random

    for seed in (7, 19, 23):
        rng = random.Random(seed)
        n = 60
        edges = {(min(a, b), max(a, b))
                 for a, b in (sorted(rng.sample(range(n), 2)) for _ in range(70))}
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges], "id_a bigint, id_b bigint"
        )
        lp = {r.id: r.component for r in sim.connected_components(pairs).collect()}
        st = {r.id: r.component for r in sim.connected_components_star(pairs).collect()}
        assert st == lp, f"seed {seed}: star != label-prop"


def test_connected_components_star_chain_and_cliques(spark):
    """Long chain (diameter stress — star converges in O(log^2 n)
    rounds) and disjoint cliques."""
    chain = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a bigint, id_b bigint")
    comp = {r.id: r.component for r in sim.connected_components_star(chain).collect()}
    assert set(comp.values()) == {0} and len(comp) == 41

    cliq = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (10, 11), (11, 12), (10, 12)], "id_a bigint, id_b bigint"
    )
    comp = {r.id: r.component for r in sim.connected_components_star(cliq).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


def test_connected_components_raises_on_nonconvergence(spark):
    """A diameter-5 chain cannot converge in 1 round — the guard must
    raise instead of returning silently-wrong split components."""
    import pytest as _pt

    pairs = spark.createDataFrame([(i, i + 1) for i in range(5)], "id_a bigint, id_b bigint")
    with _pt.raises(RuntimeError, match="did not converge"):
        sim.connected_components(pairs, max_iter=1)
