"""Benchmark-contamination detection (n-gram overlap decontamination).

Before training, corpora are screened for documents that overlap an
evaluation benchmark (the GPT-3 / PaLM style 'n-gram collision' check):
a document sharing ≥ `min_shared` distinct word n-grams with any benchmark
document is flagged and dropped.

Scale shape: the benchmark side is tiny relative to the corpus (MMLU-sized,
not web-sized), so its distinct-gram index is **broadcast** — the corpus
side never shuffles: explode shingles (map), broadcast-hash semi-join
against the benchmark grams, then one groupBy(doc_id) fold. Plan-asserted
in tests/test_plan_contracts.py.

The synthetic benchmark is `doc_id % benchmark_every == 0` over the base
documents table; run against dedup.corpus_with_dups so the exact/near
clones of benchmark docs give true positives that are not the benchmark
rows themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiflow_spark.llm.dedup import CORPUS_SQL, _shingles_sql, word_shingles


def benchmark_grams(
    docs: DataFrame, n: int = 5, benchmark_every: int = 50
) -> DataFrame:
    """Distinct word n-grams of the synthetic benchmark subset."""
    return (
        docs.filter(F.col("doc_id") % benchmark_every == 0)
        .select(F.explode(word_shingles(F.col("text"), n)).alias("gram"))
        .distinct()
    )


def contamination(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 5,
    min_shared: int = 3,
    benchmark_every: int = 50,
) -> DataFrame:
    """Per-doc count of distinct n-grams shared with the benchmark.

    Returns only docs with ≥1 shared gram (the interesting rows), flagging
    `contaminated` (≥ min_shared) and `is_benchmark` (the benchmark row
    itself — trivially 100% overlap, excluded from dropping decisions).
    """
    sh = corpus.select(
        "doc_id", F.explode(word_shingles(F.col("text"), n)).alias("gram")
    )
    hits = (
        sh.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return hits.select(
        "doc_id",
        "n_shared",
        (F.col("n_shared") >= min_shared).alias("contaminated"),
        (
            (F.col("doc_id") < 10000)
            & (F.col("doc_id") % benchmark_every == 0)
        ).alias("is_benchmark"),
    )


def contamination_sql(
    n: int = 5, min_shared: int = 3, benchmark_every: int = 50
) -> str:
    return f"""WITH {CORPUS_SQL.strip()},
bench AS (
  SELECT DISTINCT unnest({_shingles_sql("text", n)}) AS gram
  FROM documents WHERE doc_id % {benchmark_every} = 0
),
sh AS (
  SELECT doc_id, unnest({_shingles_sql("text", n)}) AS gram FROM corpus
),
hits AS (
  SELECT doc_id, count(*) AS n_shared
  FROM sh JOIN bench USING (gram)
  GROUP BY 1
)
SELECT doc_id, n_shared,
  n_shared >= {min_shared} AS contaminated,
  (doc_id < 10000 AND doc_id % {benchmark_every} = 0) AS is_benchmark
FROM hits"""
