"""ANN-at-scale benchmark (VERDICT r2 "Next round" #6): prove the
sublinear index pays for itself beyond sf0.1's 1k vectors.

Corpus: N synthetic vectors (default 10^6, dim 64), deterministic and
JVM-generated (vector[j] = xxhash64(id, j) mapped to [-1, 1]) — no
driver-side materialization, fully parallel.  Ids 1..20 are planted
near-neighbors of the query vector (id 0): 0.95*q + 0.05*noise, the
structure a dedup/near-match corpus has at 100 TB.

Measured (each vs the brute-force scan the oracle-verified
embedding_cosine_topk query uses):
  * brute   — broadcast-query full scan + TakeOrderedAndProject(k)
  * lsh     — random-hyperplane signatures PREBUILT once (they are
              query-independent; at 100 TB they'd be a materialized
              column), per-query: broadcast probe-bucket join ->
              exact verify of candidates only
  * ivf     — corpus PREWRITTEN partitioned by nearest-centroid cell
              (partition column = cell, the real IVF layout); per
              query: read only nprobe cell partitions (partition
              pruning), exact verify inside them

Reported per method: wall (MIN of `reps` timed queries — the repo's
interference-hardened convention; a median of 3 inside one slow host
window misread LSH-at-1M by 3.5x in the first r4 sweep), recall@10
vs brute force, candidate/probed fraction.  Index build walls are
reported separately (amortized over every future query at deploy
time).

Usage: python tools/ann_bench.py [--n 1000000] [--dim 64] [--reps 3]
Also importable: run_ann_scale(spark, n, dim) -> dict (bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

BANDS, ROWS = 2, 8  # structured corpus: 16 planes, 8-bit bands
N_CELLS, NPROBE = 64, 4
K = 10
N_PLANTED = 20


def _gen_corpus(spark, n: int, dim: int, path: str) -> None:
    """Deterministic corpus parquet: hash-derived uniform vectors with
    planted near-neighbors of vector 0.  All JVM expressions."""
    base = F.array(*[
        ((F.xxhash64(F.col("id"), F.lit(j)) % 1_000_001) / 500_000.5).cast("double")
        for j in range(dim)
    ])
    df = spark.range(0, n, 1, 64).select(F.col("id").alias("vec_id"), base.alias("embedding"))
    q = df.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_q"))
    planted = F.zip_with(
        "embedding", "_q", lambda x, y: (F.lit(0.05) * x + F.lit(0.95) * y).cast("double")
    )
    out = df.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.when(F.col("vec_id").between(1, N_PLANTED), planted)
        .otherwise(F.col("embedding")).alias("embedding"),
    )
    out.write.mode("overwrite").parquet(path)


def _brute_topk(corpus, query, k=K):
    from dipper_spark.functions.ann import dot_product

    qvec = query.select(F.col("embedding").alias("_q"))
    cos = dot_product(F.col("embedding"), F.col("_q")) / (
        F.sqrt(dot_product(F.col("embedding"), F.col("embedding")))
        * F.sqrt(dot_product(F.col("_q"), F.col("_q")))
    )
    return (
        corpus.crossJoin(F.broadcast(qvec))
        .select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col("vec_id"))
        .limit(k)
    )


def run_ann_scale(spark, n: int = 1_000_000, dim: int = 64, reps: int = 3,
                  workdir: str | None = None) -> dict:
    from dipper_spark.functions import ann

    work = workdir or tempfile.mkdtemp(prefix="dipper_annbench_")
    corpus_path = os.path.join(work, "corpus")
    res: dict = {"n_vectors": n, "dim": dim, "k": K, "reps": reps}

    t0 = time.monotonic()
    _gen_corpus(spark, n, dim, corpus_path)
    res["gen_wall_s"] = round(time.monotonic() - t0, 2)

    corpus = spark.read.parquet(corpus_path).filter(F.col("vec_id") != 0)
    query = spark.read.parquet(corpus_path).filter(F.col("vec_id") == 0).select("embedding")

    # ---- brute force (the baseline every method is judged against) ----
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        exact_rows = _brute_topk(corpus, query).collect()
        walls.append(time.monotonic() - t0)
    exact_ids = {r.vec_id for r in exact_rows}
    res["brute"] = {"wall_s": round(min(walls), 3),
                    "probed_fraction": 1.0, "recall_at_10": 1.0}

    # ---- LSH: prebuild a BUCKET STORE — the index is the corpus laid
    # out by (band, key) partition, each row carrying its vector, so a
    # query reads ONLY the probed bucket directories (partition
    # pruning) and verifies in place.  A first cut that stored bare
    # (band, key, id) and joined back to the corpus for vectors
    # measured SLOWER than brute force at 10^6 (the verify join
    # re-shuffled the whole corpus); the bucket layout is what makes
    # LSH sublinear in I/O, exactly like IVF's cell partitioning. ----
    n_planes = BANDS * ROWS
    t0 = time.monotonic()
    sig_path = os.path.join(work, "lsh_index")
    # Round 6: signatures via the Arrow/numpy batch kernel (one matmul
    # per batch vs 16 interpreted HOF dots per row), and the vector is
    # carried THROUGH the band explode (keep=) so the bucket layout is
    # written without the old join-back-to-corpus shuffle.
    csig = ann.band_rows(
        ann.signature_bits_np(corpus, "embedding", n_planes, dim), "vec_id",
        BANDS, ROWS, keep=("embedding",),
    )
    (csig.repartition("band", "key")
     .write.mode("overwrite").partitionBy("band", "key").parquet(sig_path))
    res["lsh_build_wall_s"] = round(time.monotonic() - t0, 2)

    index = spark.read.parquet(sig_path)
    qsig = ann.signature_bits(query, "embedding", n_planes, dim)
    # O(bands * (1 + rows)) probe buckets — bounded, safe to collect
    probe_pairs = [(r.band, r.key) for r in
                   ann.probe_rows(qsig, BANDS, ROWS, multiprobe=1).collect()]
    from functools import reduce
    probe_pred = reduce(
        lambda a, b: a | b,
        [(F.col("band") == b) & (F.col("key") == k) for b, k in probe_pairs],
    )
    walls, lsh_ids = [], set()
    for _ in range(reps):
        t0 = time.monotonic()
        cand_vecs = (
            index.filter(probe_pred)  # partition pruning: probed dirs only
            .select(F.col("id").alias("vec_id"), "embedding")
            .dropDuplicates(["vec_id"])  # a candidate can sit in 2 bands
        )
        rows = _brute_topk(cand_vecs, query).collect()
        walls.append(time.monotonic() - t0)
        lsh_ids = {r.vec_id for r in rows}
    n_cand = index.filter(probe_pred).select("id").distinct().count()
    res["lsh"] = {
        "wall_s": round(min(walls), 3),
        "probed_fraction": round(n_cand / n, 4),
        "recall_at_10": round(len(lsh_ids & exact_ids) / K, 2),
        "bands": BANDS, "rows": ROWS, "multiprobe": 1,
    }

    # ---- IVF: prewrite the corpus partitioned by nearest-centroid cell ----
    t0 = time.monotonic()
    cents = ann.sample_centroids(corpus, N_CELLS)
    # Round 6: Arrow/numpy assignment (one matmul per batch vs 64
    # interpreted literal-array dots per row), carrying the vector so
    # the cell layout writes without the assignment join.
    assign = ann.ivf_assign_np(corpus, cents, keep_vec=True)
    ivf_path = os.path.join(work, "ivf_corpus")
    (assign.withColumnsRenamed({"id": "vec_id"})
     .repartition("cell")  # one file per cell dir, not one per task
     .write.mode("overwrite").partitionBy("cell").parquet(ivf_path))
    res["ivf_build_wall_s"] = round(time.monotonic() - t0, 2)

    ivf = spark.read.parquet(ivf_path)
    from dipper_spark.functions.ann import dot_product
    qd = dot_product(F.col("embedding"), F.col("_c")) / (
        F.sqrt(dot_product(F.col("embedding"), F.col("embedding")))
        * F.sqrt(dot_product(F.col("_c"), F.col("_c")))
    )
    probe_cells = [r.cell for r in (
        query.crossJoin(F.broadcast(cents.select("cell", F.col("embedding").alias("_c"))))
        .select("cell", qd.alias("_sim")).orderBy(F.desc("_sim")).limit(NPROBE)
    ).collect()]
    walls, ivf_ids = [], set()
    for _ in range(reps):
        t0 = time.monotonic()
        cand_vecs = ivf.filter(F.col("cell").isin(probe_cells))  # partition pruning
        rows = _brute_topk(cand_vecs, query).collect()
        walls.append(time.monotonic() - t0)
        ivf_ids = {r.vec_id for r in rows}
    n_probed = ivf.filter(F.col("cell").isin(probe_cells)).count()
    res["ivf"] = {
        "wall_s": round(min(walls), 3),
        "probed_fraction": round(n_probed / n, 4),
        "recall_at_10": round(len(ivf_ids & exact_ids) / K, 2),
        "n_cells": N_CELLS, "nprobe": NPROBE,
    }

    res["lsh_speedup_vs_brute"] = round(res["brute"]["wall_s"] / res["lsh"]["wall_s"], 2)
    res["ivf_speedup_vs_brute"] = round(res["brute"]["wall_s"] / res["ivf"]["wall_s"], 2)
    return res


AMORTIZE_Q = 1000  # queries the index build is amortized over (stated)


def run_sweep(spark, ns: list[int], dim: int = 64, reps: int = 3) -> dict:
    """Crossover sweep (VERDICT r3 #4): where does each index first
    beat brute force?  Two crossovers per method:
      * query-only  — per-query wall < brute wall (index prebuilt,
        the 100 TB deployment shape: signatures/cells are a
        materialized column of the corpus table);
      * build-amortized — (build + q*query) < q*brute for q=AMORTIZE_Q
        (an index you build for a single batch of q queries)."""
    points = []
    for n in ns:
        r = run_ann_scale(spark, n=n, dim=dim, reps=reps)
        for m in ("lsh", "ivf"):
            amort = (r[f"{m}_build_wall_s"] + AMORTIZE_Q * r[m]["wall_s"]) / (
                AMORTIZE_Q * r["brute"]["wall_s"])
            r[m]["amortized_cost_ratio"] = round(amort, 3)  # <1 = index wins
        points.append(r)

    def crossover(metric):
        for p in points:
            if metric(p):
                return p["n_vectors"]
        return None

    return {
        "ns": ns, "reps": reps, "amortize_q": AMORTIZE_Q,
        "points": points,
        "crossover_query_only": {
            m: crossover(lambda p, m=m: p[f"{m}_speedup_vs_brute"] > 1.0)
            for m in ("lsh", "ivf")},
        "crossover_build_amortized": {
            m: crossover(lambda p, m=m: p[m]["amortized_cost_ratio"] < 1.0)
            for m in ("lsh", "ivf")},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sweep", type=str, default=None,
                    help="comma-separated corpus sizes; runs the crossover sweep "
                         "and appends the table to BENCH/ANN.md")
    args = ap.parse_args()

    from dipper_spark.session import build_session

    spark = build_session("ann-bench")
    if args.sweep:
        ns = [int(x) for x in args.sweep.split(",")]
        sw = run_sweep(spark, ns, args.dim, args.reps)
        spark.stop()
        rows = "\n".join(
            f"| {p['n_vectors']:,} | {p['brute']['wall_s']} "
            f"| {p['lsh']['wall_s']} ({p['lsh_speedup_vs_brute']}x, amort {p['lsh']['amortized_cost_ratio']}) "
            f"| {p['ivf']['wall_s']} ({p['ivf_speedup_vs_brute']}x, amort {p['ivf']['amortized_cost_ratio']}) |"
            for p in sw["points"]
        )
        cq, cb = sw["crossover_query_only"], sw["crossover_build_amortized"]
        with open(os.path.join(REPO, "BENCH", "ANN.md"), "a") as f:
            f.write(f"""
## Crossover sweep (round 4) — where the index first beats brute force

Per corpus size: brute wall vs index query wall (min of {sw['reps']};
index prebuilt — the materialized-column deployment shape) and the
build-amortized cost ratio over q={AMORTIZE_Q} queries
((build + q*query) / (q*brute); < 1 = index wins including its build).

| n vectors | brute (s) | LSH query s (speedup, amortized ratio) | IVF query s (speedup, amortized ratio) |
|---|---|---|---|
{rows}

**Query-only crossover:** LSH at n >= {cq['lsh'] or '>' + format(max(ns), ',')}, IVF at n >= {cq['ivf'] or '>' + format(max(ns), ',')}.
**Build-amortized (q={AMORTIZE_Q}) crossover:** LSH at n >= {cb['lsh'] or '>' + format(max(ns), ',')}, IVF at n >= {cb['ivf'] or '>' + format(max(ns), ',')}.
Below the crossover a linear scan is simply the right plan (the corpus
fits a few tasks; index read overhead dominates) — bench.py's
`ann_scale` row therefore asserts speedup only above the measured
query-only crossover and labels sub-crossover corpora explicitly.
""")
        print(json.dumps(sw))
        return

    res = run_ann_scale(spark, args.n, args.dim, args.reps)
    spark.stop()

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ANN.md"), "w") as f:
        f.write(f"""# BENCH/ANN.md — ANN at scale ({res['n_vectors']:,} vectors, dim {res['dim']})

Corpus: deterministic hash-derived vectors, {N_PLANTED} planted
near-neighbors of the query (cosine ~0.95+) — the neighbor structure a
near-dup corpus has.  Index build is separated from query wall: the
LSH signature table and the IVF cell layout are query-independent and
built once per corpus (at 100 TB: a materialized column / the table's
partition scheme).

| method | query wall (s, min of {res['reps']}) | probed fraction | recall@10 | speedup vs brute |
|---|---|---|---|---|
| brute force | {res['brute']['wall_s']} | 1.0 | 1.0 | 1x |
| LSH ({BANDS}x{ROWS} bands, multiprobe 1) | {res['lsh']['wall_s']} | {res['lsh']['probed_fraction']} | {res['lsh']['recall_at_10']} | {res['lsh_speedup_vs_brute']}x |
| IVF ({N_CELLS} cells, nprobe {NPROBE}) | {res['ivf']['wall_s']} | {res['ivf']['probed_fraction']} | {res['ivf']['recall_at_10']} | {res['ivf_speedup_vs_brute']}x |

Build walls: corpus gen {res['gen_wall_s']}s, LSH index
{res['lsh_build_wall_s']}s, IVF partitioned rewrite
{res['ivf_build_wall_s']}s.
""")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
