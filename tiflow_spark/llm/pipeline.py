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

from pyspark.sql import Window

from tiflow_spark.llm.contamination import benchmark_grams, contamination
from tiflow_spark.llm.dedup import CORPUS_SQL, _shingles_sql, corpus_with_dups
from tiflow_spark.llm.textstats import quality_score


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

    Single-pass shape: per-doc survival FLAGS (quality inline, dedup via a
    min-over-digest window, contamination via a broadcast-joined id set),
    then ONE conditional aggregation unpivoted to the 4 stage rows — not
    four union branches each recomputing the corpus lineage (measured 2×+
    slower at sf0.1, and 4× the scan at 100 TB).
    """
    corpus = corpus_with_dups(docs)
    flagged = corpus.withColumn(
        "q", quality_score(F.col("text")) >= min_quality
    ).withColumn(
        "keep_id",
        F.min(F.when(F.col("q"), F.col("doc_id"))).over(
            Window.partitionBy(F.md5(F.col("text")))
        ),
    ).withColumn("d", F.col("q") & (F.col("doc_id") == F.col("keep_id")))
    bench = benchmark_grams(docs, n=n, benchmark_every=benchmark_every)
    contam_ids = (
        contamination(
            flagged.filter(F.col("d")).select("doc_id", "text"),
            bench,
            n=n,
            min_shared=min_shared,
            benchmark_every=benchmark_every,
        )
        .filter(F.col("contaminated") & ~F.col("is_benchmark"))
        .select("doc_id", F.lit(True).alias("_contam"))
    )
    final = flagged.join(F.broadcast(contam_ids), "doc_id", "left").withColumn(
        "c", F.col("d") & F.col("_contam").isNull()
    )
    chars = F.length("text")
    agg = final.agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum(chars).alias("c1"),
        F.sum(F.when(F.col("q"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("q"), chars).otherwise(0)).alias("c2"),
        F.sum(F.when(F.col("d"), 1).otherwise(0)).alias("n3"),
        F.sum(F.when(F.col("d"), chars).otherwise(0)).alias("c3"),
        F.sum(F.when(F.col("c"), 1).otherwise(0)).alias("n4"),
        F.sum(F.when(F.col("c"), chars).otherwise(0)).alias("c4"),
    )
    stages = [(1, "raw"), (2, "quality"), (3, "dedup"), (4, "clean")]
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(o).alias("stage_ord"),
                        F.lit(s).alias("stage"),
                        F.col(f"n{o}").alias("n_docs"),
                        F.col(f"c{o}").alias("n_chars"),
                    )
                    for o, s in stages
                ]
            )
        ).alias("r")
    ).select("r.stage_ord", "r.stage", "r.n_docs", "r.n_chars")


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
