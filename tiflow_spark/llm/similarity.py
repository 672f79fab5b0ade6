"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: exact baseline. Query set broadcast against the
  corpus → one map stage + a per-query top-k (window). Cost O(Q·N·d); the
  right tool when Q is small.
- LSH (random-hyperplane sign buckets): the scale path. Planes are derived
  from the portable hash (deterministic, no stored model): plane p weight
  for dim i = ±1 by hash bit. Docs sharing a bucket are candidates; exact
  cosine re-ranks. At 100 TB this turns the N² into bucket-local joins.
- Embedding near-dup: cosine ≥ threshold over blocked candidates.

Dot products use F.zip_with + F.aggregate (JVM, no Python). The sum order is
left-to-right on both Spark and DuckDB, so cosine values match bitwise and
the oracle can compare rounded values safely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def topk_cosine(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbours for each query vector (excluding self).

    The query side is tiny → broadcast; corpus side streams. Ranking uses
    cosine rounded to 6dp with vec_id tiebreak for determinism.
    """
    from pyspark.sql import Window

    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def topk_cosine_sql(query_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id IN ({ids})
),
scored AS (
  SELECT q.query_id, e.vec_id,
    round(
      list_sum(list_transform(range(1, len(e.embedding) + 1),
        i -> q.q_emb[i]::DOUBLE * e.embedding[i]::DOUBLE))
      / sqrt(
        list_sum(list_transform(range(1, len(q.q_emb) + 1),
          i -> q.q_emb[i]::DOUBLE * q.q_emb[i]::DOUBLE))
        * list_sum(list_transform(range(1, len(e.embedding) + 1),
          i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))),
      6) AS cos
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
WHERE rank <= {k}"""


def topk_cosine_filtered(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    category_col: str = "label",
) -> DataFrame:
    """PRE-FILTER exact top-k: each query's neighbours are restricted to
    corpus vectors sharing its ``category_col`` value BEFORE ranking —
    the metadata-filtered retrieval pattern (search within a
    lang/source/label slice). Pre-filter is the exact-recall form;
    post-filtering a global top-k loses results whenever fewer than k
    of the global neighbours match the predicate.

    Scale shape: the candidate join is an EQUI-join on the category (no
    crossJoin — the filter becomes the join key, so each query only
    scores its own slice and Catalyst co-partitions by category at
    data scale); the query side stays broadcast-sized. Ranking uses
    cosine rounded to 6dp with vec_id tiebreak, same determinism
    contract as :func:`topk_cosine`."""
    from pyspark.sql import Window

    base = embeddings.select(
        "vec_id", "embedding", F.col(category_col).alias("cat")
    )
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "cat",
    )
    joined = base.join(F.broadcast(q), "cat").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "cat",
        "vec_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cat", "vec_id", "cos", "rank")
    )


def topk_cosine_filtered_sql(
    query_ids: list[int], k: int = 5, category_col: str = "label"
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, {category_col} AS cat
  FROM embeddings WHERE vec_id IN ({ids})
),
scored AS (
  SELECT q.query_id, q.cat, e.vec_id,
    round(
      list_sum(list_transform(range(1, len(e.embedding) + 1),
        i -> q.q_emb[i]::DOUBLE * e.embedding[i]::DOUBLE))
      / sqrt(
        list_sum(list_transform(range(1, len(q.q_emb) + 1),
          i -> q.q_emb[i]::DOUBLE * q.q_emb[i]::DOUBLE))
        * list_sum(list_transform(range(1, len(e.embedding) + 1),
          i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))),
      6) AS cos
  FROM embeddings e JOIN q ON e.{category_col} = q.cat
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, cat, vec_id, cos, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
WHERE rank <= {k}"""


def lsh_bucket(emb_sql: str, planes: int = 8, dims: int = 64) -> Column:
    """Deterministic random-hyperplane bucket id: bit p = sign(w_p · emb)
    where w_p[i] = ±1 derived from a fixed per-(p,i) coin. No stored model —
    every engine/restart derives identical planes.

    ``emb_sql`` is the embedding operand as SQL text: the whole
    planes×dims expression is generated as ONE SQL string and parsed
    JVM-side with a single F.expr — building the identical tree
    Column-by-Column (planes·dims F.lit + planes lambda folds) cost
    ~0.75 s of py4j round-trips PER INVOCATION (measured r14, same
    pathology as pq_ann_topk). ±1.0 double literals are exactly
    representable; the parsed tree (zip_with/aggregate left-folds,
    CASE WHEN per plane bit) is the same Catalyst plan as before —
    values bit-identical (sim_ann_lsh / sim_embedding_neardup /
    sim_ann_recall oracle rows re-proven at both scales)."""
    terms = ["0"]
    for p in range(planes):
        weights = ",".join(
            "1.0D" if _coin(p, i) else "-1.0D" for i in range(dims)
        )
        terms.append(
            f"(CASE WHEN aggregate(zip_with({emb_sql}, array({weights}), "
            "(x, w) -> CAST(x AS DOUBLE) * w), 0.0D, (acc, v) -> acc + v) "
            f"> 0 THEN {1 << p} ELSE 0 END)"
        )
    return F.expr(" + ".join(terms))


import hashlib


def _coin(p: int, i: int) -> bool:
    """Deterministic coin shared with the oracle: md5("p:i") low bit."""
    return int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[-1], 16) % 2 == 1


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    planes: int = 8,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's LSH
    bucket. Recall < 1 by design; the oracle checks the deterministic result,
    tests check recall against brute force."""
    from pyspark.sql import Window

    dims = 64
    with_bucket = embeddings.withColumn(
        "bucket", lsh_bucket("embedding", planes, dims)
    )
    q = with_bucket.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    joined = with_bucket.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def ann_lsh_topk_sql(query_ids: list[int], k: int = 5, planes: int = 8, dims: int = 64) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    plane_terms = []
    for p in range(planes):
        weights = ", ".join(
            "1.0" if _coin(p, i) else "-1.0" for i in range(dims)
        )
        plane_terms.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {dims} + 1), "
            f"i -> embedding[i]::DOUBLE * ([{weights}])[i])) > 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    bucket = " + ".join(plane_terms)
    cos = (
        "round(list_sum(list_transform(range(1, len(e.embedding) + 1), "
        "i -> q.q_emb[i]::DOUBLE * e.embedding[i]::DOUBLE)) / sqrt("
        "list_sum(list_transform(range(1, len(q.q_emb) + 1), "
        "i -> q.q_emb[i]::DOUBLE * q.q_emb[i]::DOUBLE)) * "
        "list_sum(list_transform(range(1, len(e.embedding) + 1), "
        "i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))), 6)"
    )
    return f"""WITH wb AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
  FROM wb WHERE vec_id IN ({ids})
),
scored AS (
  SELECT q.query_id, e.vec_id, {cos} AS cos
  FROM wb e JOIN q ON e.bucket = q.q_bucket AND e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
WHERE rank <= {k}"""


def embedding_neardup(
    embeddings: DataFrame, threshold: float = 0.95, planes: int = 8
) -> DataFrame:
    """Near-duplicate vector pairs: cosine ≥ threshold within LSH buckets
    (high-cosine pairs land in the same bucket with high probability)."""
    with_bucket = embeddings.withColumn(
        "bucket", lsh_bucket("embedding", planes, 64)
    )
    a = with_bucket.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        "bucket",
    )
    b = with_bucket.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        "bucket",
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cos"),
    )
    return scored.filter(F.col("cos") >= threshold)


def embedding_neardup_sql(threshold: float = 0.95, planes: int = 8, dims: int = 64) -> str:
    plane_terms = []
    for p in range(planes):
        weights = ", ".join("1.0" if _coin(p, i) else "-1.0" for i in range(dims))
        plane_terms.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {dims} + 1), "
            f"i -> embedding[i]::DOUBLE * ([{weights}])[i])) > 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    bucket = " + ".join(plane_terms)
    cos = (
        "round(list_sum(list_transform(range(1, len(a.embedding) + 1), "
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / sqrt("
        "list_sum(list_transform(range(1, len(a.embedding) + 1), "
        "i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)) * "
        "list_sum(list_transform(range(1, len(b.embedding) + 1), "
        "i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))), 6)"
    )
    return f"""WITH wb AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos
FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}"""


# ------------------------------------------------------------------ IVF ANN


def ivf_index(
    embeddings: DataFrame, n_clusters: int = 16, seed: int = 7
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: KMeans centroids + cluster-assigned corpus.

    Returns (centroids(cluster_id, centroid ARRAY<double>),
    assigned = corpus + cluster_id). Build is one MLlib fit over a sample
    + one assignment pass; at 100 TB the assignment is a broadcast-join
    map stage and the inverted lists land partitioned BY cluster_id, so a
    probe reads only its clusters' partitions (partition pruning).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    # NOT persisted (r15, examined-rejected): MLlib's fit caches its own
    # internal instances RDD, so iterations never re-scan parquet; an
    # isolated fit-only A/B showed persisting the assembled vectors saves
    # one scan+conversion (1.61 → 1.27 s at sf0.1), but the END-TO-END
    # query measured WORSE with the persist (2.43 → 2.73 s min): the
    # cached plan loses the parquet size statistics the probe/candidate
    # joins plan their broadcasts from. The fit is the floor here.
    vecs = embeddings.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=n_clusters, seed=seed, maxIter=20).fit(vecs)
    centroids = model.clusterCenters()
    cdf = embeddings.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster_id INT, centroid ARRAY<DOUBLE>",
    )
    # transform() preserves every input column, so the corpus columns ride
    # through the assignment projection — the old select+join back onto
    # `embeddings` re-scanned and re-shuffled the corpus by vec_id for
    # columns the transform already had (r15, guide §2.4).
    assigned = model.transform(vecs).select(
        "vec_id",
        F.col("prediction").alias("cluster_id"),
        *[c for c in embeddings.columns if c != "vec_id"],
    )
    _ = vector_to_array
    return cdf, assigned


def ivf_topk(
    centroids: DataFrame,
    assigned: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """ANN search: per query, rank centroids by cosine, search only the
    ``n_probe`` nearest inverted lists — the IVF scale path (brute force
    = topk_cosine is the recall-1.0 baseline).

    The candidate join is (query × probed clusters) ⋈ corpus ON
    cluster_id — an equi-join on the cluster key, never a full cartesian;
    scan cost drops by ~n_clusters/n_probe."""
    from pyspark.sql import Window

    q = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "q_emb",
        "cluster_id",
        cosine(
            F.col("q_emb"), F.col("centroid").cast("array<float>")
        ).alias("c_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("c_cos").desc(), F.col("cluster_id").asc()
    )
    probes = (
        qc.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "q_emb", "cluster_id")
    )
    cands = F.broadcast(probes).join(assigned, "cluster_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def ann_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    planes: int = 8,
) -> DataFrame:
    """Recall@k of the LSH ANN against the exact brute-force ranking —
    the quality gauge every approximate index needs before it replaces
    the exact scan in a pipeline. Per query: how many of the true top-k
    the bucketed search found.

    Both sides are deterministic (6dp-rounded cosine, id tiebreaks), so
    recall itself is engine-portable and oracle-checkable — unusual for
    ANN evaluation and exactly why the planes are hash-derived instead of
    trained. Cost = the two searches (broadcast-query joins) + one
    metadata-scale join on (query_id, vec_id)."""
    exact = topk_cosine(embeddings, query_ids, k).select(
        "query_id", "vec_id"
    )
    approx = ann_lsh_topk(embeddings, query_ids, k, planes).select(
        F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid")
    )
    joined = exact.join(
        approx,
        (F.col("query_id") == F.col("a_qid"))
        & (F.col("vec_id") == F.col("a_vid")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("a_vid").alias("n_hits"),
        F.round(F.count("a_vid") / F.count(F.lit(1)), 6).alias("recall"),
    )


def ann_recall_sql(
    query_ids: list[int], k: int = 5, planes: int = 8, dims: int = 64
) -> str:
    return f"""WITH exact AS (
  SELECT * FROM ({topk_cosine_sql(query_ids, k)})
), approx AS (
  SELECT * FROM ({ann_lsh_topk_sql(query_ids, k, planes, dims)})
)
SELECT e.query_id AS query_id,
  count(*) AS n_exact,
  count(a.vec_id) AS n_hits,
  round(count(a.vec_id) * 1.0 / count(*), 6) AS recall
FROM exact e LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY 1"""
