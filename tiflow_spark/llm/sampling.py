"""Deterministic sampling / dataset splitting for training-data pipelines.

A 100 TB corpus can't be split with `randomSplit` (non-reproducible across
runs/partitionings) or a driver-side shuffle. Both operators here key every
decision on a portable salted content hash of the document id:

- reproducible across runs, Spark versions, partition counts, engines
  (the DuckDB oracle computes the identical assignment);
- map-only — no shuffle, no state, no RNG; appending new documents never
  reassigns existing ones (the property that keeps train/test splits stable
  as a corpus grows — a re-randomized split silently leaks val docs into
  train between pipeline runs);
- stratification is just a different salt per stratum value.

Salting: hash(salt || ':' || doc_id) — changing the salt re-deals every
assignment, which is the knob for fresh folds (cross-validation = k salts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiflow_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql_duckdb,
)

_BUCKETS = 1_000_000  # split resolution: 1e-6 fraction granularity


def _bucket(id_col: Column, salt: str) -> Column:
    return F.pmod(
        portable_hash64(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))),
        F.lit(_BUCKETS),
    )


def dataset_split(
    docs: DataFrame,
    weights: dict[str, float],
    salt: str = "split",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every doc to exactly one named split by cumulative hash-bucket
    ranges (e.g. {"train": .9, "val": .05, "test": .05}). Deterministic,
    map-only, stable under corpus growth."""
    total = sum(weights.values())
    b = _bucket(F.col(id_col), salt)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cut = int(acc * _BUCKETS)
        hit = F.lit(name)
        expr = F.when(b < cut, hit) if expr is None else expr.when(b < cut, hit)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return docs.withColumn("split", expr)


def dataset_split_sql(
    weights: dict[str, float], salt: str = "split", id_col: str = "doc_id"
) -> str:
    """DuckDB CASE expression assigning the identical splits."""
    total = sum(weights.values())
    h = portable_hash64_sql_duckdb(
        f"'{salt}:' || CAST({id_col} AS VARCHAR)"
    )
    b = f"(({h}) % {_BUCKETS} + {_BUCKETS}) % {_BUCKETS}"
    names = list(weights)
    acc, arms = 0.0, []
    for name in names[:-1]:
        acc += weights[name] / total
        arms.append(f"WHEN {b} < {int(acc * _BUCKETS)} THEN '{name}'")
    return f"CASE {' '.join(arms)} ELSE '{names[-1]}' END"


def deterministic_sample(
    docs: DataFrame,
    fraction: float,
    salt: str = "sample",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a stable hash-selected ``fraction`` of docs. Unlike df.sample,
    re-running (or re-partitioning, or growing the corpus) never changes
    which surviving docs are kept."""
    return docs.filter(
        _bucket(F.col(id_col), salt) < int(fraction * _BUCKETS)
    )


def stratified_quota_sample(
    docs: DataFrame,
    stratum_col: str,
    quota: int,
    quotas: dict[str, int] | None = None,
    salt: str = "strat",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(quota, |stratum|) docs per stratum, hash-ordered.

    Balanced-mixture construction (e.g. "≤100k docs per language"): docs
    inside each stratum are ranked by their salted content hash — a
    deterministic shuffle — and the first ``quota`` win (``quotas``
    overrides per stratum value). Fraction-based sampleBy can't hit exact
    counts and re-deals on every run; this is reproducible across engines
    and stable under corpus growth UP TO the quota boundary (new docs can
    only displace the boundary ranks — hash order itself never changes).

    Scale shape: one shuffle on the stratum key; the per-stratum sort is
    spillable (sort-based window), and the shuffled projection is cut to
    (stratum, hash, id) before ranking so a hot stratum moves minimal
    bytes. Parallelism is bounded by the stratum count — for very few, very
    hot strata, pre-filter with :func:`deterministic_sample` at a fraction
    safely above quota/|stratum| to shrink the ranked set first.

    Output: id_col, stratum_col, pick_rank (1-based within stratum).
    """
    h = portable_hash64(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy("_h", id_col)
    ranked = (
        docs.select(id_col, stratum_col, h.alias("_h"))
        .withColumn("pick_rank", F.row_number().over(w))
        .drop("_h")
    )
    if quotas:
        cap: Column = F.lit(quota)
        for name, q in quotas.items():
            cap = F.when(F.col(stratum_col) == name, F.lit(q)).otherwise(cap)
        return ranked.filter(F.col("pick_rank") <= cap)
    return ranked.filter(F.col("pick_rank") <= quota)


def stratified_quota_sample_sql(
    stratum_col: str,
    quota: int,
    quotas: dict[str, int] | None = None,
    salt: str = "strat",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB SQL selecting the identical stratified sample."""
    h = portable_hash64_sql_duckdb(
        f"'{salt}:' || CAST({id_col} AS VARCHAR)"
    )
    if quotas:
        arms = " ".join(
            f"WHEN {stratum_col} = '{n}' THEN {q}" for n, q in quotas.items()
        )
        cap = f"CASE {arms} ELSE {quota} END"
    else:
        cap = str(quota)
    return f"""
    SELECT {id_col}, {stratum_col}, pick_rank FROM (
      SELECT {id_col}, {stratum_col},
             row_number() OVER (PARTITION BY {stratum_col}
               ORDER BY {h}, {id_col}) AS pick_rank
      FROM {table})
    WHERE pick_rank <= {cap}"""
