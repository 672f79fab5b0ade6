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
from pyspark.sql.types import LongType, StructField, StructType

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

    Scale shape: two-phase exact top-K (the domain_cap construction) —
    phase 1 pre-cuts each (stratum, salt-of-id) cell to the stratum's
    quota, so a hot stratum parallelizes across 16 tasks and the final
    per-stratum rank sorts at most quota·16 survivors; the shuffled
    projection is cut to (stratum, hash, id) before ranking. For quotas so
    large the survivor set is itself huge, pre-filter with
    :func:`deterministic_sample` first.

    Output: id_col, stratum_col, pick_rank (1-based within stratum).
    """
    h = portable_hash64(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    from pyspark.sql import Window

    if quotas:
        cap: Column = F.lit(quota)
        for name, q in quotas.items():
            cap = F.when(F.col(stratum_col) == name, F.lit(q)).otherwise(cap)
    else:
        cap = F.lit(quota)
    # two-phase exact top-K (the hot-stratum answer, same construction as
    # domain_cap): phase 1 pre-cuts to the stratum's own quota within
    # (stratum, salt-of-id) cells — a mega-stratum shards across 16 tasks;
    # phase 2 ranks the ≤ quota·16 survivors. Global top-q ⊆ union of
    # per-cell top-q, so the result is identical to the one-window form.
    base = docs.select(id_col, stratum_col, h.alias("_h")).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(16))
    )
    w1 = Window.partitionBy(stratum_col, "_salt").orderBy("_h", id_col)
    pre = (
        base.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= cap)
        .drop("_r1", "_salt")
    )
    w = Window.partitionBy(stratum_col).orderBy("_h", id_col)
    ranked = (
        pre.withColumn("pick_rank", F.row_number().over(w)).drop("_h")
    )
    return ranked.filter(F.col("pick_rank") <= cap)


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


def temperature_resample(
    docs: DataFrame,
    stratum_col: str,
    n_target: int,
    alpha: float = 0.5,
    salt: str = "temp",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based domain-mix rebalancing (the multilingual-sampling
    rule of mBERT/XLM-R: p_d ∝ c_d^α): compute per-stratum quotas from the
    observed counts, then keep the hash-first ``quota_d`` docs of each
    stratum. α=1 keeps natural proportions, α=0 is uniform-per-domain,
    α=0.5 (default) is the square-root mix that upsamples tail domains.

    α is restricted to {0, 0.5, 1} so every quota is computed with
    correctly-rounded IEEE ops only (sqrt is exact-rounded; pow is not) —
    the DuckDB twin reproduces quotas bit-exactly. Weights and totals stay
    in BIGINT; caller must keep n_target · max(w_d) < 2⁶³ (true for any
    corpus below ~10⁹ docs per stratum at α=0.5 — at larger scale, shrink
    the weight scale factor).

    Scale shape: the count agg is map-side combining on the stratum key;
    quotas are a stratum-count-sized table (broadcast); the ranking is the
    same two-phase salted top-K as :func:`stratified_quota_sample` — a hot
    stratum pre-cuts across 16 parallel cells before the final rank.

    Output: id_col, stratum_col, pick_rank, quota.
    """
    if alpha not in (0.0, 0.5, 1.0):
        raise ValueError("alpha must be 0, 0.5 or 1 (exact-arithmetic contract)")
    counts = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("c"))
    if alpha == 1.0:
        w = F.col("c")
    elif alpha == 0.0:
        w = F.lit(1000).cast("long")
    else:
        w = F.floor(F.sqrt(F.col("c")) * 1000).cast("long")
    weights = counts.select(stratum_col, w.alias("w"))
    total = weights.agg(F.sum("w").alias("tw"))
    quotas = weights.crossJoin(F.broadcast(total)).select(
        stratum_col,
        F.expr(f"CAST({n_target} AS BIGINT) * w div tw").alias("quota"),
    )
    h = portable_hash64(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    from pyspark.sql import Window

    # two-phase exact top-K per stratum (domain_cap construction): the
    # broadcast quota table joins BEFORE ranking so phase 1 can pre-cut
    # each (stratum, salt) cell to the stratum's own quota — a hot stratum
    # shards across 16 tasks instead of serializing one sort
    base = (
        docs.select(id_col, stratum_col, h.alias("_h"))
        .join(F.broadcast(quotas), stratum_col)
        .withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(16)))
    )
    w1 = Window.partitionBy(stratum_col, "_salt").orderBy("_h", id_col)
    pre = (
        base.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col("quota"))
        .drop("_r1", "_salt")
    )
    rank_w = Window.partitionBy(stratum_col).orderBy("_h", id_col)
    ranked = pre.withColumn("pick_rank", F.row_number().over(rank_w)).drop("_h")
    return (
        ranked.filter(F.col("pick_rank") <= F.col("quota"))
        # column order mirrors the SQL twin (the driver compare is
        # name-keyed, but keeping both sides identical costs nothing)
        .select(id_col, stratum_col, "pick_rank", "quota")
    )


def temperature_resample_sql(
    stratum_col: str,
    n_target: int,
    alpha: float = 0.5,
    salt: str = "temp",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB SQL computing the identical temperature-rebalanced sample."""
    if alpha == 1.0:
        w = "c"
    elif alpha == 0.0:
        w = "CAST(1000 AS BIGINT)"
    else:
        w = "CAST(floor(sqrt(c) * 1000) AS BIGINT)"
    h = portable_hash64_sql_duckdb(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    WITH counts AS (
      SELECT {stratum_col}, count(*) AS c FROM {table} GROUP BY 1
    ), weights AS (
      SELECT {stratum_col}, {w} AS w FROM counts
    ), quotas AS (
      SELECT {stratum_col},
        CAST((CAST({n_target} AS BIGINT) * w) // (SELECT sum(w) FROM weights)
          AS BIGINT) AS quota
      FROM weights
    ), ranked AS (
      SELECT {id_col}, {stratum_col},
        row_number() OVER (PARTITION BY {stratum_col}
          ORDER BY {h}, {id_col}) AS pick_rank
      FROM {table}
    )
    SELECT {id_col}, {stratum_col}, pick_rank, quota
    FROM ranked JOIN quotas USING ({stratum_col})
    WHERE pick_rank <= quota"""


def epoch_shuffle(
    docs: DataFrame,
    epoch: int,
    n_shards: int,
    salt: str = "epoch",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training order for one epoch: every doc gets a
    (shard, position) — the order a trainer streams shard files and rows
    within them. Keyed on hash(salt:epoch:doc_id), so:

    - a different epoch re-deals the whole order (fresh shuffle per epoch,
      the property RNG-based shuffles only give you by re-running);
    - the order is reproducible across runs, engines and partition counts
      (restart-safe mid-epoch training);
    - shards are hash-balanced (±√ deviation), so shard files are
      near-equal and trainer workers stay load-balanced.

    One shuffle (the per-shard rank window) over data keyed by shard —
    parallelism = n_shards, which at 100 TB is the number of output files
    and should be sized ≥ cluster cores. Output: id_col, shard, pos.
    """
    h = portable_hash64(
        F.concat(F.lit(f"{salt}:{epoch}:"), F.col(id_col).cast("string"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("_h", id_col)
    # keeps every input column (plus shard/pos) so writers need no
    # corpus-sized join to re-attach payloads after the shuffle
    return (
        docs.select(
            "*",
            h.alias("_h"),
            F.pmod(h, F.lit(n_shards)).alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w))
        .drop("_h")
    )


def epoch_shuffle_sql(
    epoch: int,
    n_shards: int,
    salt: str = "epoch",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    h = portable_hash64_sql_duckdb(
        f"'{salt}:{epoch}:' || CAST({id_col} AS VARCHAR)"
    )
    return f"""
    SELECT {id_col}, shard,
      row_number() OVER (PARTITION BY shard ORDER BY h, {id_col}) AS pos
    FROM (SELECT {id_col}, {h} AS h, ({h}) % {n_shards} AS shard
          FROM {table})"""


def select_within_budget(
    docs: DataFrame,
    token_budget: int,
    quality_col: str = "q",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    quality_decimals: int | None = None,
    max_bands: int = 100_000,
) -> DataFrame:
    """Budget-constrained corpus selection: greedily take the
    highest-quality documents until the total token budget is spent — the
    "best N tokens" cut every data-mixing recipe ends with.

    Order = (quality DESC, id ASC); a doc is selected when the cumulative
    tokens of everything ranked before it stay under the budget (the
    boundary doc that first crosses the budget is excluded — conservative
    cut, never overshoots).

    Scale shape — NO global ``ORDER BY``-the-world window, not even over
    the band-totals frame: quality scores are discrete (rounded), so the
    running total is a two-phase distributed prefix sum — a window
    PARTITIONED BY quality band (parallel across the cluster) plus a
    band-level offset table. The offsets come from the same bounded
    driver-prefix-sum idiom as :func:`perplexity_bucket_sample`'s exact
    cutoffs: the (band → token-total) AGGREGATE stays distributed (one
    groupBy shuffle), the driver pulls at most ``max_bands`` + 1 of its
    rows (fail-fast tripwire BEFORE anything corpus-sized moves), runs
    the metadata-scale cumulative sum locally, and ships the offsets back
    as a broadcast join. Zero single-task stages at any band count the
    guard admits.

    Output: id_col, quality_col, tokens_col, cum_before (tokens consumed
    by strictly-better-ranked docs).

    EAGER-SNAPSHOT SEMANTICS: calling this function runs ONE job now — a
    window-free ``groupBy(quality).sum(tokens)`` aggregate whose ≤
    ``max_bands`` rows are prefix-summed on the driver and frozen as the
    offsets table. If ``docs`` is non-deterministic (or its source
    changes) and a quality band appears at action time that was not in
    the snapshot, the returned plan RAISES at action time (live guard on
    the consumed cum_before value) instead of silently dropping the band.
    NULL quality has no defined rank in the greedy order; null-quality
    rows raise here — score or filter them first.

    PRECONDITION (enforced): the construction is metadata-scale only while
    quality is DISCRETE. Near-unique continuous scores degenerate every
    band to one row, making the offsets table corpus-sized. Pass
    ``quality_decimals`` to round continuous scores into bands here (the
    selection order then ties on id within a rounded band), and/or rely
    on ``max_bands``: the bounded collect raises instead of silently
    pulling a corpus-sized table to the driver.
    """
    if quality_decimals is not None:
        docs = docs.withColumn(
            quality_col, F.round(F.col(quality_col), quality_decimals)
        )
    base = docs.select(id_col, quality_col, tokens_col)
    # the eager snapshot job is window-free: a plain partial-aggregated
    # groupBy — the in-band cumulative window below runs only once, at
    # action time of the returned plan (ADVICE r9)
    band_totals = base.groupBy(quality_col).agg(
        F.sum(tokens_col).alias("_band_total")
    )
    # bounded collect: ≤ max_bands + 1 rows ever reach the driver; the
    # +1 row is the discreteness tripwire
    band_rows = band_totals.limit(max_bands + 1).collect()
    if len(band_rows) > max_bands:
        raise ValueError(
            f"select_within_budget: > {max_bands} distinct quality "
            "bands — quality looks continuous; pass quality_decimals "
            "to band it"
        )
    if any(r[quality_col] is None for r in band_rows):
        raise ValueError(
            "select_within_budget: NULL quality has no rank in the "
            "greedy order — filter or score null-quality rows first"
        )
    offset_rows = []
    cum = 0
    for r in sorted(band_rows, key=lambda r: r[quality_col], reverse=True):
        offset_rows.append((r[quality_col], cum))
        cum += r["_band_total"]
    spark = docs.sparkSession
    offsets = spark.createDataFrame(
        offset_rows,
        schema=StructType(
            [
                band_totals.schema[quality_col],
                StructField("_offset", LongType(), False),
            ]
        ),
    )
    return _apply_band_offsets(
        base, offsets, token_budget, quality_col, tokens_col, id_col
    )


def _apply_band_offsets(
    base: DataFrame,
    offsets: DataFrame,
    token_budget: int,
    quality_col: str,
    tokens_col: str,
    id_col: str,
) -> DataFrame:
    """Join the frozen band-offset snapshot back and apply the budget cut.

    The join is LEFT so a band that appears at action time but was absent
    from the snapshot surfaces as a NULL offset — and the NULL is
    converted into a RAISE by an assert that rides the consumed
    ``cum_before`` value itself (``coalesce(_offset, assert_true(false))``
    inside the selected/filtered column), so Catalyst cannot prune it
    (a free-standing asserted column would be dead code — see the r9
    canal-replay fix). Negative-tested in tests/test_round10.py."""
    from pyspark.sql import Window

    in_band = Window.partitionBy(quality_col).orderBy(id_col)
    banded = base.withColumn(
        "_in_band_cum",
        F.sum(tokens_col).over(
            in_band.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    checked_offset = F.coalesce(
        F.col("_offset"),
        F.assert_true(
            F.lit(False),
            F.concat(
                F.lit("select_within_budget: quality band "),
                F.col(quality_col).cast("string"),
                F.lit(" appeared after the offsets snapshot"),
            ),
        ).cast("long"),
    )
    out = banded.join(F.broadcast(offsets), quality_col, "left").withColumn(
        "cum_before",
        checked_offset + F.col("_in_band_cum") - F.col(tokens_col),
    )
    return (
        out.filter(F.col("cum_before") + F.col(tokens_col) <= token_budget)
        .select(id_col, quality_col, tokens_col, "cum_before")
    )


def select_within_budget_sql(
    token_budget: int,
    quality_expr: str,
    tokens_expr: str,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: the same cut expressed as one global window (the oracle
    can afford ORDER BY-the-world; the engine must not)."""
    return f"""
    WITH scored AS (
      SELECT {id_col}, {quality_expr} AS q, {tokens_expr} AS n_tokens
      FROM {table}
    ), ranked AS (
      SELECT *,
        CAST(coalesce(sum(n_tokens) OVER (
          ORDER BY q DESC, {id_col}
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS cum_before
      FROM scored
    )
    SELECT {id_col}, q, CAST(n_tokens AS BIGINT) AS n_tokens, cum_before
    FROM ranked WHERE cum_before + n_tokens <= {token_budget}"""


def domain_cap(
    docs: DataFrame,
    cap: int,
    domain_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    n_salts: int = 16,
) -> DataFrame:
    """Per-domain document caps — the domain-balancing cut every crawl
    curation applies (cap each source/domain at N docs, keeping the best).

    Keeps the top ``cap`` docs per domain by (order_col DESC, id ASC) —
    deterministic tie-break, exact.

    Scale shape: naive per-domain row_number is one shuffle whose biggest
    task is the biggest domain — a mega-domain (half the crawl from one
    host) serializes. This is the classic skewed top-K, solved two-phase:
    phase 1 ranks within (domain, salt-of-id) and pre-cuts to ``cap`` per
    salt cell (parallel across ``n_salts`` tasks per domain), phase 2
    ranks the ≤ cap·n_salts survivors per domain — the second shuffle's
    per-domain volume is bounded by cap·n_salts regardless of domain size.
    Two-phase top-K is exact: the global top-cap of a domain is contained
    in the union of its per-cell top-caps.
    """
    from pyspark.sql import Window

    order = [F.col(order_col).desc(), F.col(id_col).asc()]
    salted = docs.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    )
    w1 = Window.partitionBy(domain_col, "_salt").orderBy(*order)
    pre = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= cap)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(domain_col).orderBy(*order)
    return (
        pre.withColumn("domain_rank", F.row_number().over(w2))
        .filter(F.col("domain_rank") <= cap)
    )


def domain_cap_sql(
    cap: int,
    table: str = "documents",
    domain_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: the one-window form (the oracle can afford the skew)."""
    return f"""
    SELECT * FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {domain_col}
        ORDER BY {order_col} DESC, {id_col} ASC) AS domain_rank
      FROM {table}
    ) WHERE domain_rank <= {cap}"""


def perplexity_bucket_sample(
    lm_scores: DataFrame,
    rates: dict[int, float] | None = None,
    salt: str = "ppl",
    materialize_dir: str | None = None,
) -> DataFrame:
    """CCNet-style perplexity-bucketed sampling (Wenzek et al. 2020): cut
    the corpus into head/middle/tail terciles of LM fluency and keep each
    bucket at its own rate — the standard shape for trading data quality
    against volume with a KenLM-like filter.

    ``lm_scores``: (doc_id, lm_score) from textstats.trigram_lm_score
    (higher = more fluent here, so bucket 3 is CCNet's "head").
    ``rates``: keep-fraction per bucket {1: tail, 2: middle, 3: head}.

    Scale shape: the tercile CUTOFFS are EXACT true-rank boundaries of
    the full corpus, computed with zero global sorts and zero windows.
    lm_score is 6-decimal rounded (textstats.trigram_lm_score) but
    near-unique per doc, so the distinct-score histogram can approach
    corpus scale — it therefore stays DISTRIBUTED (one groupBy shuffle,
    cached for the two lookups); the driver sees only (a) the 2-decimal
    COARSE sub-histogram — one row per occupied 0.01-wide score band,
    bounded by 100×score-span rows whatever the corpus — to locate the
    two bands holding the tercile ranks, and (b) the ≤2×10,001 distinct
    fine scores inside those bands, off whose prefix sum the exact
    cutoffs are read. Bucketing + keep decisions stay MAP-ONLY over the
    full corpus (cutoff-literal comparison + salted hash). Cost of
    exactness: the cutoff aggregation needs the scored corpus BEFORE the
    output pass does, so the scored (doc_id, lm_score) frame — ~16
    bytes/doc — is materialized ONCE and both the histogram and the
    output read it: ``persist()`` by default (MEMORY_AND_DISK, spills
    rather than OOMs; r14 — saves the parquet write+read roundtrip the
    default double-scoring used to force), or a parquet checkpoint when
    ``materialize_dir`` is given (the cross-session production shape —
    cutoffs computed today, bucketed export running tomorrow). The keep
    decision is the engine-portable salted-hash idiom shared with
    dataset_split: append-stable, rerun-stable."""
    if rates is None:
        rates = {1: 0.1, 2: 0.5, 3: 1.0}
    if materialize_dir is not None:
        spark = lm_scores.sparkSession
        lm_scores.select("doc_id", "lm_score").write.mode(
            "overwrite"
        ).parquet(materialize_dir)
        lm_scores = spark.read.parquet(materialize_dir)
    else:
        lm_scores = lm_scores.select("doc_id", "lm_score").persist()
    hist = (
        lm_scores.groupBy("lm_score")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "coarse", F.floor(F.col("lm_score") * 100).cast("long")
        )
    )
    hist.persist()
    try:
        # x → x*100 → floor is monotone, so (coarse, lm_score) order is
        # global score order even under FP rounding of the multiply.
        coarse = sorted(
            (r["coarse"], r["n"])
            for r in hist.groupBy("coarse")
            .agg(F.sum("cnt").alias("n"))
            .collect()
        )
        n = sum(c for _, c in coarse)
        assert n >= 3, "need at least 3 scored docs for terciles"
        q, rem = divmod(n, 3)
        s1 = q + (1 if rem >= 1 else 0)
        s2 = q + (1 if rem >= 2 else 0)
        targets = {1: s1, 2: s1 + s2}  # true rank of each cutoff row
        holder: dict[int, int] = {}  # cutoff id -> coarse bucket
        base: dict[int, int] = {}  # coarse bucket -> cum count before it
        cum = 0
        for b, c in coarse:
            for t, rank in targets.items():
                if t not in holder and cum + c >= rank:
                    holder[t] = b
                    base[b] = cum
            cum += c
        fine = sorted(
            (r["coarse"], r["lm_score"], r["cnt"])
            for r in hist.filter(
                F.col("coarse").isin(list(set(holder.values())))
            ).collect()
        )
    finally:
        hist.unpersist()
    cuts: dict[int, float] = {}
    for t, rank in targets.items():
        cum = base[holder[t]]
        for b, score, c in fine:
            if b != holder[t]:
                continue
            cum += c
            if cum >= rank:
                cuts[t] = score
                break
    c1 = cuts[1]
    c2 = cuts[2]
    bucket = (
        F.when(F.col("lm_score") <= F.lit(c1), 1)
        .when(F.col("lm_score") <= F.lit(c2), 2)
        .otherwise(3)
    )
    keep_thresh = (
        F.when(bucket == 1, int(rates[1] * _BUCKETS))
        .when(bucket == 2, int(rates[2] * _BUCKETS))
        .otherwise(int(rates[3] * _BUCKETS))
    )
    return lm_scores.select(
        "doc_id",
        "lm_score",
        bucket.alias("bucket"),
        (_bucket(F.col("doc_id"), salt) < keep_thresh).alias("kept"),
    )


def perplexity_bucket_sample_sql(
    lm_cte: str,
    rates: dict[int, float] | None = None,
    salt: str = "ppl",
) -> str:
    """DuckDB mirror over a CTE named `lm` providing (doc_id, lm_score).

    The Spark side reads the cutoffs off a distinct-score histogram
    prefix sum; an exact full-corpus ntile yields the identical c1/c2
    (the max score inside tercile t IS the score at true rank s1 /
    s1+s2 — ties share a score, so doc_id tie order can't change it),
    so the oracle just states the spec directly."""
    if rates is None:
        rates = {1: 0.1, 2: 0.5, 3: 1.0}
    h = portable_hash64_sql_duckdb(
        f"'{salt}:' || CAST(doc_id AS VARCHAR)"
    )
    t1, t2, t3 = (int(rates[b] * _BUCKETS) for b in (1, 2, 3))
    return f"""WITH {lm_cte},
    tiles AS (
      SELECT lm_score,
             ntile(3) OVER (ORDER BY lm_score, doc_id) AS t
      FROM lm
    ),
    cuts AS (
      SELECT
        max(CASE WHEN t = 1 THEN lm_score END) AS c1,
        coalesce(max(CASE WHEN t = 2 THEN lm_score END),
                 max(CASE WHEN t = 1 THEN lm_score END)) AS c2
      FROM tiles
    )
    SELECT doc_id, lm_score,
      CASE WHEN lm_score <= c1 THEN 1
           WHEN lm_score <= c2 THEN 2 ELSE 3 END AS bucket,
      ((({h}) % {_BUCKETS} + {_BUCKETS}) % {_BUCKETS}) <
        (CASE WHEN lm_score <= c1 THEN {t1}
              WHEN lm_score <= c2 THEN {t2} ELSE {t3} END) AS kept
    FROM lm CROSS JOIN cuts"""


# ------------------------------------------------- UniMax language budget


def unimax_allocation(
    docs: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_chars",
    budget_num: int = 1,
    budget_den: int = 2,
    max_epochs: int = 2,
) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling"): spread a total training
    budget as uniformly as possible across languages, capping every
    language at ``max_epochs`` repeats of its corpus and redistributing
    the surplus to the rest — the sequential greedy of the paper
    (ascending corpus size; each language gets
    ``min(cap, remaining // languages_left)``).

    Here as a closed-form WINDOW plan (the scheduler-waterfill trick):
    sort ascending by cap, a language is "capped" while the cumulative
    test ``cap <= (B - prefix_cap_before) div left`` has never failed
    (integer div; the cumulative AND makes the boundary sticky), and the
    uncapped tail splits the residual R over m languages as
    ``R div m`` each with the ``R mod m`` remainder going to the LAST
    remainder-many in sort order — exactly the floor sequence the
    sequential loop produces (property-tested against a literal
    transcription of the loop in tests/test_round7.py).

    Budget = ``total_size * budget_num // budget_den`` — derived from the
    corpus itself so every engine computes the identical budget.

    Scale shape: ONE map-side-combined aggregate shuffles the corpus down
    to a languages-count frame; every window after that runs over that
    metadata-scale frame (thousands of rows at most — the single-partition
    WindowExec is deliberate and bounded, same class as the scheduler's
    move-planning windows).

    Returns (lang, chars, cap, alloc) — alloc in the same char units.
    """
    from pyspark.sql import Window

    sizes = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(F.col(size_col)).alias("chars")
    )
    sizes = sizes.withColumn("cap", F.col("chars") * max_epochs)
    w_ord = Window.orderBy("cap", "grp")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    stepped = (
        sizes.withColumn("_i", F.row_number().over(w_ord))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "_B",
            F.expr(
                f"(sum(chars) over () * {budget_num}) div {budget_den}"
            ),
        )
        .withColumn(
            "_prefix_before",
            F.coalesce(
                F.sum("cap").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("_left", F.col("_n") - F.col("_i") + 1)
        .withColumn(
            "_test",
            (
                F.col("cap")
                <= F.expr("(_B - _prefix_before) div _left")
            ).cast("int"),
        )
        .withColumn("_capped", F.min("_test").over(w_cum) == 1)
    )
    finals = (
        stepped.withColumn(
            "_capped_mass",
            F.sum(
                F.when(F.col("_capped"), F.col("cap")).otherwise(
                    F.lit(0).cast("long")
                )
            ).over(w_all),
        )
        .withColumn(
            "_m",
            F.sum(F.when(F.col("_capped"), 0).otherwise(1)).over(w_all),
        )
        .withColumn(
            "_j",
            F.sum(F.when(F.col("_capped"), 0).otherwise(1)).over(w_cum),
        )
        .withColumn("_R", F.col("_B") - F.col("_capped_mass"))
    )
    alloc = F.when(F.col("_capped"), F.col("cap")).otherwise(
        F.expr("_R div _m")
        + F.when(
            F.col("_j") > F.col("_m") - F.expr("_R % _m"), F.lit(1)
        ).otherwise(F.lit(0))
    )
    return finals.select(
        F.col("grp").alias("lang"),
        "chars",
        "cap",
        alloc.cast("long").alias("alloc"),
    )


def unimax_allocation_sql(
    table: str = "documents",
    group_col: str = "lang",
    size_col: str = "n_chars",
    budget_num: int = 1,
    budget_den: int = 2,
    max_epochs: int = 2,
) -> str:
    return f"""
    WITH sizes AS (
      SELECT {group_col} AS grp,
             CAST(sum({size_col}) AS BIGINT) AS chars,
             CAST(sum({size_col}) AS BIGINT) * {max_epochs} AS cap
      FROM {table} GROUP BY 1
    ),
    stepped AS (
      SELECT grp, chars, cap,
        row_number() OVER (ORDER BY cap, grp) AS i,
        count(*) OVER () AS n,
        CAST(sum(chars) OVER () AS BIGINT) * {budget_num}
          // {budget_den} AS B,
        CAST(coalesce(sum(cap) OVER (ORDER BY cap, grp
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS prefix_before
      FROM sizes
    ),
    tested AS (
      SELECT *, n - i + 1 AS lft,
        CASE WHEN cap <= (B - prefix_before) // (n - i + 1)
             THEN 1 ELSE 0 END AS test
      FROM stepped
    ),
    cum AS (
      SELECT *,
        min(test) OVER (ORDER BY cap, grp
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS capped
      FROM tested
    ),
    finals AS (
      SELECT *,
        CAST(sum(CASE WHEN capped THEN cap ELSE 0 END) OVER ()
             AS BIGINT) AS capped_mass,
        sum(CASE WHEN capped THEN 0 ELSE 1 END) OVER () AS m,
        sum(CASE WHEN capped THEN 0 ELSE 1 END) OVER (ORDER BY cap, grp
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS j
      FROM cum
    )
    SELECT grp AS lang, chars, cap,
      CAST(CASE WHEN capped THEN cap
           ELSE (B - capped_mass) // m
                + CASE WHEN j > m - ((B - capped_mass) % m)
                       THEN 1 ELSE 0 END
      END AS BIGINT) AS alloc
    FROM finals"""


# --------------------------------------------- DSIR importance resampling


def dsir_importance(
    docs: DataFrame,
    target_lang: str = "en",
    target_mod: int = 2,
    raw_mod: int = 3,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """DSIR-shaped importance resampling (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by how much more it looks like a TARGET domain sample than like the
    RAW corpus, using two bag-of-words models, and keep the docs whose
    importance ratio exceeds 1.

    The paper's weight is p_target(doc)/p_raw(doc) over hashed n-gram
    features. Here the two models are word-unigram hit-mass models (the
    trigram_lm_score shape): ``ht`` = sum of target-model counts over the
    doc's tokens, ``hr`` = the same under the raw model, and the
    importance decision is the EXACT cross-multiplied ratio test

        ht * TR  >  hr * TT      (TT/TR = total pruned model masses)

    i.e. normalized target affinity > normalized raw affinity — all
    BIGINT until the one reported ``round(ratio, 6)`` weight, so verdicts
    are bit-identical across engines.

    Target sample = docs of ``target_lang`` with doc_id % target_mod == 0;
    raw sample = all-language docs with doc_id % raw_mod == 0 (deterministic
    stand-ins for the paper's target/raw corpora).

    Scale shape: both pruned models are frequent-token tables — bounded,
    broadcast — so the corpus-scale token stream joins map-side twice and
    shuffles ONCE on doc_id for the per-doc reduction (map-side combined).
    The two model masses are 1-row aggregates cross-joined in (broadcast).
    """
    from tiflow_spark.llm.textstats import tokens

    toks = docs.select(
        "doc_id",
        F.col("lang"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    model_t = (
        toks.filter(
            (F.col("lang") == target_lang)
            & (F.col("doc_id") % target_mod == 0)
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt_t"))
        .filter(F.col("cnt_t") >= min_count)
    )
    model_r = (
        toks.filter(F.col("doc_id") % raw_mod == 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt_r"))
        .filter(F.col("cnt_r") >= min_count)
    )
    masses = model_t.agg(
        F.sum("cnt_t").cast("long").alias("TT")
    ).crossJoin(model_r.agg(F.sum("cnt_r").cast("long").alias("TR")))
    per_doc = (
        toks.join(F.broadcast(model_t), "tok", "left")
        .join(F.broadcast(model_r), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.coalesce(F.col("cnt_t"), F.lit(0)))
            .cast("long")
            .alias("ht"),
            F.sum(F.coalesce(F.col("cnt_r"), F.lit(0)))
            .cast("long")
            .alias("hr"),
        )
    )
    out = per_doc.crossJoin(F.broadcast(masses))
    return out.select(
        "doc_id",
        "n_tok",
        "ht",
        "hr",
        F.round(
            (F.col("ht") * F.col("TR"))
            / F.nullif(F.col("hr") * F.col("TT"), F.lit(0)),
            6,
        ).alias("weight"),
        (F.col("ht") * F.col("TR") > F.col("hr") * F.col("TT")).alias(
            "keep"
        ),
    )


def dsir_importance_sql(
    table: str = "documents",
    target_lang: str = "en",
    target_mod: int = 2,
    raw_mod: int = 3,
    min_count: int = 2,
) -> str:
    toks = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
    return f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({toks}) AS tok FROM {table}
    ),
    model_t AS (
      SELECT tok, count(*) AS cnt_t FROM tok
      WHERE lang = '{target_lang}' AND doc_id % {target_mod} = 0
      GROUP BY 1 HAVING count(*) >= {min_count}
    ),
    model_r AS (
      SELECT tok, count(*) AS cnt_r FROM tok
      WHERE doc_id % {raw_mod} = 0
      GROUP BY 1 HAVING count(*) >= {min_count}
    ),
    masses AS (
      SELECT (SELECT CAST(sum(cnt_t) AS BIGINT) FROM model_t) AS TT,
             (SELECT CAST(sum(cnt_r) AS BIGINT) FROM model_r) AS TR
    ),
    per_doc AS (
      SELECT t.doc_id,
        count(*) AS n_tok,
        CAST(sum(coalesce(mt.cnt_t, 0)) AS BIGINT) AS ht,
        CAST(sum(coalesce(mr.cnt_r, 0)) AS BIGINT) AS hr
      FROM tok t
      LEFT JOIN model_t mt USING (tok)
      LEFT JOIN model_r mr USING (tok)
      GROUP BY 1
    )
    SELECT doc_id, n_tok, ht, hr,
      round((ht * TR) * 1.0 / nullif(hr * TT, 0), 6) AS weight,
      (ht * TR > hr * TT) AS keep
    FROM per_doc CROSS JOIN masses"""
