"""End-to-end training-corpus curation funnel.

Composes the LLM-pipeline operators into the standard pre-training data
flow — quality filter → exact dedup → benchmark decontamination — and
reports the funnel: docs/chars surviving each stage. This is the flagship
"would a data engineer actually use this" query: every stage is one of the
already-verified operators, chained on DataFrames, with a full SQL oracle.

Scale: quality is map-only; exact dedup is one hash shuffle on the digest;
decontamination is a broadcast semi-join (benchmark side is tiny). Nothing
here is new physical work beyond the component operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiflow_spark.llm.contamination import benchmark_grams, contamination
from tiflow_spark.llm.dedup import CORPUS_SQL, _shingles_sql, corpus_with_dups
from tiflow_spark.llm.textstats import quality_features


def corpus_funnel(
    docs: DataFrame,
    min_quality: float = 0.5,
    n: int = 5,
    min_shared: int = 3,
    benchmark_every: int = 50,
) -> DataFrame:
    """Stage-by-stage survivor stats for the curation pipeline.

    Stages: raw (corpus_with_dups) → quality (score ≥ min_quality) →
    dedup (min doc_id per exact-text md5) → clean (drop non-benchmark docs
    sharing ≥ min_shared 5-grams with the benchmark).
    Output: (stage_ord, stage, n_docs, n_chars) — 4 rows.
    """
    corpus = corpus_with_dups(docs)
    quality = quality_features(corpus).filter(
        F.col("quality_score") >= min_quality
    )
    q_docs = corpus.join(quality.select("doc_id"), "doc_id", "left_semi")
    # exact dedup: keep the smallest doc_id per content digest
    keep = (
        q_docs.groupBy(F.md5(F.col("text")).alias("digest"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d_docs = q_docs.join(keep, "doc_id", "left_semi")
    bench = benchmark_grams(docs, n=n, benchmark_every=benchmark_every)
    contam = contamination(
        d_docs, bench, n=n, min_shared=min_shared,
        benchmark_every=benchmark_every,
    ).filter(F.col("contaminated") & ~F.col("is_benchmark"))
    clean = d_docs.join(contam.select("doc_id"), "doc_id", "left_anti")

    def stage(df: DataFrame, ord_: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(ord_).alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )

    return (
        stage(corpus, 1, "raw")
        .unionByName(stage(q_docs, 2, "quality"))
        .unionByName(stage(d_docs, 3, "dedup"))
        .unionByName(stage(clean, 4, "clean"))
    )


def corpus_funnel_sql(
    min_quality: float = 0.5,
    n: int = 5,
    min_shared: int = 3,
    benchmark_every: int = 50,
) -> str:
    from tiflow_spark.llm.textstats import quality_features_sql

    quality = quality_features_sql("corpus").strip()
    return f"""WITH {CORPUS_SQL.strip()},
qf AS ({quality}),
q_docs AS (
  SELECT c.doc_id AS doc_id, c.text AS text FROM corpus c
  WHERE c.doc_id IN (SELECT doc_id FROM qf WHERE quality_score >= {min_quality})
),
keep AS (
  SELECT min(doc_id) AS doc_id FROM q_docs GROUP BY md5(text)
),
d_docs AS (
  SELECT * FROM q_docs WHERE doc_id IN (SELECT doc_id FROM keep)
),
bench AS (
  SELECT DISTINCT unnest({_shingles_sql("text", n)}) AS gram
  FROM documents WHERE doc_id % {benchmark_every} = 0
),
sh AS (
  SELECT doc_id, unnest({_shingles_sql("text", n)}) AS gram FROM d_docs
),
contam AS (
  SELECT doc_id FROM sh JOIN bench USING (gram)
  GROUP BY 1
  HAVING count(*) >= {min_shared}
),
clean AS (
  SELECT * FROM d_docs
  WHERE doc_id NOT IN (
    SELECT doc_id FROM contam
    WHERE NOT (doc_id < 10000 AND doc_id % {benchmark_every} = 0))
),
stages AS (
  SELECT 1 AS stage_ord, 'raw' AS stage, count(*) AS n_docs,
         CAST(sum(length(text)) AS BIGINT) AS n_chars FROM corpus
  UNION ALL
  SELECT 2, 'quality', count(*), CAST(sum(length(text)) AS BIGINT) FROM q_docs
  UNION ALL
  SELECT 3, 'dedup', count(*), CAST(sum(length(text)) AS BIGINT) FROM d_docs
  UNION ALL
  SELECT 4, 'clean', count(*), CAST(sum(length(text)) AS BIGINT) FROM clean
)
SELECT * FROM stages"""
