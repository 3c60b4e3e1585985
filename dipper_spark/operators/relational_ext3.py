"""Remaining §2.2 surface: right outer join, ntile, Arrow-native scalar
UDF, Python UDTF.

NB: no `from __future__ import annotations` here — arrow_udf resolves
its eval type from REAL annotations; stringified ones are rejected.
"""

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from .relational import load, q


@q("join_outer_right", """
SELECT o.o_orderkey, c.c_name
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal < 0
""")
def join_outer_right(spark, d):
    o, c = load(spark, d, "orders"), load(spark, d, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .filter(F.col("c_acctbal") < 0)
        .select("o_orderkey", "c_name")
    )


@q("win_ntile_quartiles", """
SELECT c_custkey, c_mktsegment AS seg,
       NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile
FROM customer
""")
def win_ntile_quartiles(spark, d):
    # partitioned ntile: each segment's quartiles computed on its own
    # shuffle partition — a global (partition-less) ORDER BY window
    # would serialize the whole table onto one task at scale
    c = load(spark, d, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", F.col("c_mktsegment").alias("seg"), F.ntile(4).over(w).alias("quartile")
    )


@q("udf_arrow_scalar", """
SELECT doc_id, UPPER(SUBSTR(text, 1, 10)) AS head10 FROM documents
""")
def udf_arrow_scalar(spark, d):
    """Arrow-native scalar UDF (pyspark 4 @arrow_udf), zero pandas
    conversion — falls back to pandas_udf if the API is absent."""
    try:
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark.sql.functions import arrow_udf

        @arrow_udf("string")
        def head10(a: pa.Array) -> pa.Array:
            return pc.utf8_upper(pc.utf8_slice_codeunits(a, 0, 10))
    except ImportError:  # pragma: no cover
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def head10(s: pd.Series) -> pd.Series:
            return s.str.slice(0, 10).str.upper()

    return load(spark, d, "documents").select("doc_id", head10("text").alias("head10"))


@q("udf_apply_in_arrow", """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 3) AS total
FROM events GROUP BY event_type
""")
def udf_apply_in_arrow(spark, d):
    """Grouped-map via the Arrow-native applyInArrow (pyspark 4) — the
    pandas-free twin of udf_apply_in_pandas: whole group arrives as one
    pa.Table, zero pandas conversion."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_type(table: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n": [table.num_rows],
                "total": [round(pc.sum(table.column("value")).as_py(), 3)],
            }
        )

    return (
        load(spark, d, "events")
        .groupBy("event_type")
        .applyInArrow(per_type, "event_type string, n bigint, total double")
    )


@q("udtf_arrow", """
SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_words
FROM documents WHERE doc_id < 50
""")
def udtf_arrow(spark, d):
    """PyArrow-native UDTF (@arrow_udtf, pyspark 4.1): eval receives a
    whole RecordBatch, yields Tables — vectorized end to end, no
    per-row Python and no pandas."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udtf

    @arrow_udtf(returnType="doc_id bigint, n_words int")
    class WordCounts:
        def eval(self, batch: pa.RecordBatch):
            words = pc.split_pattern_regex(
                pc.utf8_trim_whitespace(batch.column("text")), r"\s+"
            )
            yield pa.table(
                {"doc_id": batch.column("doc_id"), "n_words": pc.list_value_length(words)}
            )

    docs = load(spark, d, "documents").filter(F.col("doc_id") < 50).select("doc_id", "text")
    return WordCounts(docs.asTable())


@q("udtf_split_turns", """
SELECT doc_id, seq, word FROM (
  SELECT doc_id, UNNEST(generate_series(1, least(len(string_split(text,' ')), 5))) AS seq,
         string_split(text,' ')[UNNEST(generate_series(1, least(len(string_split(text,' ')), 5)))] AS word
  FROM documents WHERE doc_id < 10
)
""")
def udtf_split_turns(spark, d):
    """Python UDTF: one input row -> N output rows (document -> first 5
    words), the transcript-explosion shape."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, seq int, word string")
    class SplitWords:
        def eval(self, doc_id: int, text: str):
            for i, w in enumerate(text.split(" ")[:5]):
                yield doc_id, i + 1, w

    docs = load(spark, d, "documents").filter(F.col("doc_id") < 10)
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("split_words", SplitWords)
    return spark.sql("SELECT s.* FROM _udtf_docs, LATERAL split_words(doc_id, text) s")
