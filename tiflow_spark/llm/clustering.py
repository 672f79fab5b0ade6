"""Deterministic k-means clustering + semantic dedup (SemDeDup-style).

Beyond-parity training-data operators: cluster the embedding corpus with
one exact seeded assignment plus one Lloyd refinement step, and use the
cluster blocks to find semantic near-duplicates (cosine >= threshold
within a cluster) — the cluster-then-pair shape of SemDeDup (Abbas et
al. 2023, arXiv:2303.09540) re-expressed as DataFrame ops.

Scale shapes (the 100 TB story):
- assignment is MAP-ONLY: the k centroids are collected once
  (metadata-scale, exactly like the IVF codebook in similarity.py) and
  embedded as literal arrays, so scoring every corpus vector against all
  k centroids is a single codegen'd projection — no join, no shuffle.
- the Lloyd update is ONE shuffle: posexplode the quantized components
  and groupBy(cluster, component) with map-side combine — 64*n rows
  hashed into k*64 groups; the sums are BIGINT so they are exact under
  any partition order.
- semdedup is a self-join keyed by cluster id (the same plan as the LSH
  bucket join in dedup.py). A hot cluster would make candidate pairs
  quadratic in its size, so clusters over `max_cluster` are star-linked
  to their min-id representative (d^2 -> d), the identical guard the
  MinHash/LSH family carries (llm/dedup.py max_bucket).

Exactness contract with the DuckDB oracle:
- components quantize to integers (round(x * 10^6) as BIGINT); seed
  distances and Lloyd sums stay in exact integer space, so they are
  partition-order-free and engine-identical.
- cluster means take ONE double division (CAST(sum AS DOUBLE)/count —
  both engines divide the same exact integers), and refined distances
  are computed with identical element-order fold expressions on both
  sides (the established sim_*/cosine contract in similarity.py).
- argmin uses first-min tiebreak (lowest centroid id). On this corpus
  the min margin between best and second-best refined distance is ~10^7
  distance units vs ~10^4 worst-case accumulated double rounding, so a
  last-ulp divergence cannot flip an assignment (probed empirically at
  all three scales).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Column
from pyspark.sql import functions as F

from tiflow_spark.llm.similarity import cosine

QUANT = 1_000_000


def quantize_vec(emb: Column) -> Column:
    """Component-wise integer quantization: round(x * 10^6) as BIGINT."""
    return F.transform(
        emb, lambda x: F.round(x.cast("double") * QUANT).cast("long")
    )


def _int_l2(a: Column, b: Column) -> Column:
    """Exact integer squared L2 (max |q| ~ 10^6*range, 64 dims -> << 2^63)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _dbl_l2(a: Column, b: Column) -> Column:
    """Double squared L2, left-fold in element order (matches list_sum)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _centroid_lit_sql(c: list, int_space: bool) -> str:
    """One centroid as a SQL array literal. Int literals are exact by
    definition; doubles go through CAST('<repr>' AS DOUBLE) — repr() is
    the shortest round-trip decimal and string→double cast is correctly
    rounded, so the parsed literal is bit-identical to F.lit(float(v))."""
    if int_space:
        return "array(" + ",".join(str(int(v)) for v in c) + ")"
    return (
        "array("
        + ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in c)
        + ")"
    )


def _argmin_cluster(qv_sql: str, cents: list[list], int_space: bool) -> Column:
    """First-min argmin over centroid literals; returns the 0-based BIGINT
    cluster id (= seed vec_id, since seeds are vec_id 0..k-1 in order).

    ``qv_sql`` is the vector operand as SQL text: the whole k×dims argmin
    is generated as ONE SQL string and parsed JVM-side with a single
    F.expr. Building the identical tree Column-by-Column (k·dims F.lit +
    k zip_with/aggregate lambda folds) cost ~0.4 s of py4j round-trips
    PER INVOCATION (measured r14, same pathology as pq_ann_topk); the
    parsed Catalyst tree — zip_with/aggregate folds, first-min
    array_position — is the same plan, values bit-identical (oracle rows
    cluster_kmeans_lloyd / dedup_semdedup* re-proven at both scales)."""
    zero = "CAST(0 AS BIGINT)" if int_space else "0.0D"
    dists = ",".join(
        f"aggregate(zip_with({qv_sql}, {_centroid_lit_sql(c, int_space)}, "
        f"(x, y) -> (x - y) * (x - y)), {zero}, (acc, x) -> acc + x)"
        for c in cents
    )
    return F.expr(
        f"CAST(array_position(array({dists}), "
        f"array_min(array({dists}))) - 1 AS BIGINT)"
    )


def seed_centroids(q: DataFrame, k: int) -> list[list[int]]:
    """The k seed centroids = the quantized vectors with vec_id 0..k-1.
    Deterministic (no RNG) and replicable in plain SQL. Metadata-scale
    collect: k rows, like the IVF codebook."""
    rows = (
        q.filter(F.col("vec_id") < k)
        .select("vec_id", "qv")
        .collect()
    )
    by_id = {r["vec_id"]: list(r["qv"]) for r in rows}
    return [by_id[i] for i in range(k)]


def assign_seeded(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """vec_id, embedding, qv, cluster — exact-integer nearest-seed assign."""
    q = embeddings.select(
        "vec_id", "embedding", quantize_vec(F.col("embedding")).alias("qv")
    )
    cents = seed_centroids(q, k)
    return q.withColumn("cluster", _argmin_cluster("qv", cents, True))


def kmeans_lloyd(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """One seeded exact assignment + one Lloyd refinement step.

    Returns (vec_id, cluster_init, cluster_refined). The refinement
    recomputes centroids as per-cluster component means (exact BIGINT
    sums -> one double division) and reassigns; at scale each extra
    Lloyd round costs one more 64*n-row shuffle + metadata collect."""
    # the seeded assignment (k x dims integer-L2 argmin per row) feeds
    # both the centroid-sums collect and the final reassignment select —
    # persist it so the argmin projection runs once per invocation, not
    # once per consumer (same fix as semdedup_pairs, r14)
    a1 = (
        assign_seeded(embeddings, k)
        .withColumnRenamed("cluster", "cluster_init")
        .persist()
    )
    # No cluster is ever empty: seed i is distance-0 from centroid i, so
    # cluster i always holds at least its own seed — which is what lets
    # `cents` index by position == cluster id below (an empty cluster
    # would shift positions and desync from the oracle's cid keying).
    sums = (
        a1.select("cluster_init", F.posexplode("qv").alias("i", "qc"))
        .groupBy("cluster_init", "i")
        .agg(F.sum("qc").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    # Metadata-scale (k*dims rows). Python float division == engine
    # CAST(BIGINT AS DOUBLE)/BIGINT: same IEEE op on the same exact ints.
    means: dict[int, dict[int, float]] = {}
    for r in sums:
        means.setdefault(r["cluster_init"], {})[r["i"]] = (
            float(r["s"]) / r["cnt"]
        )
    # Fail loudly on duplicate-quantized seeds: if seeds i and j<i
    # quantize identically, first-min tiebreak sends seed i to cluster j,
    # cluster i is empty, and positional `cents` would silently desync
    # cluster_refined ids from the oracle's cid keying.
    if len(means) != k:
        missing = sorted(set(range(k)) - set(means))
        raise ValueError(
            f"kmeans_lloyd: clusters {missing} are empty — seeds quantized "
            f"identically to an earlier seed; pick distinct seed vectors "
            f"(got {len(means)} non-empty clusters, need k={k})"
        )
    dims = len(means[0])
    cents = [
        [means[c][i] for i in range(dims)] for c in sorted(means)
    ]
    return a1.select(
        "vec_id",
        "cluster_init",
        _argmin_cluster(
            "transform(qv, x -> CAST(x AS DOUBLE))",
            cents,
            False,
        ).alias("cluster_refined"),
    )


def kmeans_lloyd_sql(k: int = 8, dims: int = 64) -> str:
    """DuckDB oracle for kmeans_lloyd — same math, same tiebreaks."""
    return f"""WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(x::DOUBLE * {QUANT}) AS BIGINT)) AS qv
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, qv AS cvec FROM q WHERE vec_id < {k}),
d1 AS (
  SELECT q.vec_id, c0.cid,
         list_sum(list_transform(range(1, {dims + 1}),
           i -> (q.qv[i] - c0.cvec[i]) * (q.qv[i] - c0.cvec[i]))) AS dist
  FROM q CROSS JOIN c0
),
a1 AS (
  SELECT vec_id, cid AS cluster_init FROM (
    SELECT vec_id, cid, row_number() OVER (
      PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d1
  ) WHERE rn = 1
),
sums AS (
  SELECT a1.cluster_init AS cid, t.i, sum(q.qv[t.i]) AS s, count(*) AS cnt
  FROM q JOIN a1 USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, {dims + 1})) AS i) t
  GROUP BY 1, 2
),
means AS (
  SELECT cid, list(CAST(s AS DOUBLE) / cnt ORDER BY i) AS mvec
  FROM sums GROUP BY cid
),
d2 AS (
  SELECT q.vec_id, m.cid,
         list_sum(list_transform(range(1, {dims + 1}),
           i -> (CAST(q.qv[i] AS DOUBLE) - m.mvec[i])
              * (CAST(q.qv[i] AS DOUBLE) - m.mvec[i]))) AS dist
  FROM q CROSS JOIN means m
),
a2 AS (
  SELECT vec_id, cid AS cluster_refined FROM (
    SELECT vec_id, cid, row_number() OVER (
      PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d2
  ) WHERE rn = 1
)
SELECT a1.vec_id, a1.cluster_init, a2.cluster_refined
FROM a1 JOIN a2 USING (vec_id)"""


def semdedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    k: int = 8,
    max_cluster: int = 64,
) -> DataFrame:
    """Semantic near-dup pairs: cosine >= threshold within seeded-kmeans
    cluster blocks; clusters over max_cluster are star-linked to their
    min-id representative (candidates d^2 -> d, the LSH max_bucket
    guard). Returns (id_a, id_b, cluster, cos)."""
    # cluster size + representative via agg-then-broadcast-join, NOT a
    # partitionBy(cluster) window: a window would gather a mega-cluster
    # into one task, while the k-row aggregate broadcasts for free.
    # persist the assignment (r14): the k×dims integer-L2 argmin
    # projection feeds THREE consumers (both self-join sides + the
    # cluster-stats aggregate) and was re-evaluated per branch —
    # measured 4.2 -> 1.2 s at sf0.1 on dedup_semdedup
    assigned = assign_seeded(embeddings, k).drop("qv").persist()
    csizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("csz"), F.min("vec_id").alias("rep")
    )
    sized = assigned.join(F.broadcast(csizes), "cluster")
    a = sized.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        "cluster",
        "csz",
        "rep",
    )
    b = sized.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        "cluster",
    )
    pairs = a.join(b, "cluster").filter(
        (F.col("id_a") < F.col("id_b"))
        & ((F.col("csz") <= max_cluster) | (F.col("id_a") == F.col("rep")))
    )
    return pairs.select(
        "id_a",
        "id_b",
        "cluster",
        F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos"),
    ).filter(F.col("cos") >= threshold)


def semdedup_sql(
    threshold: float = 0.35,
    k: int = 8,
    max_cluster: int = 64,
    dims: int = 64,
) -> str:
    """DuckDB oracle for semdedup_pairs."""
    cos = (
        f"round(list_sum(list_transform(range(1, {dims + 1}), "
        "i -> ea[i]::DOUBLE * eb[i]::DOUBLE)) / sqrt("
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> ea[i]::DOUBLE * ea[i]::DOUBLE)) * "
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> eb[i]::DOUBLE * eb[i]::DOUBLE))), 6)"
    )
    return f"""WITH q AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
                        x -> CAST(round(x::DOUBLE * {QUANT}) AS BIGINT)) AS qv
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, qv AS cvec FROM q WHERE vec_id < {k}),
d1 AS (
  SELECT q.vec_id, q.embedding, c0.cid,
         list_sum(list_transform(range(1, {dims + 1}),
           i -> (q.qv[i] - c0.cvec[i]) * (q.qv[i] - c0.cvec[i]))) AS dist
  FROM q CROSS JOIN c0
),
a1 AS (
  SELECT vec_id, embedding, cid AS cluster FROM (
    SELECT vec_id, embedding, cid, row_number() OVER (
      PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d1
  ) WHERE rn = 1
),
sized AS (
  SELECT a1.*, count(*) OVER (PARTITION BY cluster) AS csz,
         min(vec_id) OVER (PARTITION BY cluster) AS rep
  FROM a1
),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
         a.embedding AS ea, b.embedding AS eb
  FROM sized a JOIN sized b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
   AND (a.csz <= {max_cluster} OR a.vec_id = a.rep)
)
SELECT id_a, id_b, cluster, {cos} AS cos
FROM cand
WHERE {cos} >= {threshold}"""


def semdedup_prune(
    embeddings: DataFrame,
    threshold: float = 0.35,
    k: int = 8,
    max_cluster: int = 64,
) -> DataFrame:
    """SemDeDup keep-list: a vector is PRUNED iff some lower-id vector in
    its cluster is a semantic near-dup of it (appears as id_b in a pair)
    — the paper's keep-one-representative rule with min-id preference.
    Returns (vec_id, cluster, kept). Left-anti-shaped: assignment frame
    LEFT JOIN the pair frame's id_b side, kept = no match."""
    pruned = (
        semdedup_pairs(embeddings, threshold, k, max_cluster)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        assign_seeded(embeddings, k)
        .select("vec_id", "cluster")
        .join(pruned.withColumn("hit", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id", "cluster", F.col("hit").isNull().alias("kept")
        )
    )


def semdedup_prune_sql(
    threshold: float = 0.35,
    k: int = 8,
    max_cluster: int = 64,
    dims: int = 64,
) -> str:
    """DuckDB oracle for semdedup_prune (pair SQL reused as a CTE)."""
    pairs = semdedup_sql(threshold, k, max_cluster, dims)
    return f"""WITH pairs AS ({pairs}),
q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(x::DOUBLE * {QUANT}) AS BIGINT)) AS qv
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, qv AS cvec FROM q WHERE vec_id < {k}),
d1 AS (
  SELECT q.vec_id, c0.cid,
         list_sum(list_transform(range(1, {dims + 1}),
           i -> (q.qv[i] - c0.cvec[i]) * (q.qv[i] - c0.cvec[i]))) AS dist
  FROM q CROSS JOIN c0
),
a1 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid, row_number() OVER (
      PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d1
  ) WHERE rn = 1
)
SELECT a1.vec_id, a1.cluster,
       a1.vec_id NOT IN (SELECT id_b FROM pairs) AS kept
FROM a1"""
