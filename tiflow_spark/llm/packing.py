"""Sequence packing for training-data pipelines: concat-and-chunk binning.

Pretraining pipelines concatenate documents in a deterministic order and
chunk the token stream into fixed-budget sequences; each document is
assigned to the bin where its first token lands. The hard part at scale is
the GLOBAL prefix sum over a deterministic order — a single
`sum() OVER (ORDER BY ...)` window collapses onto one partition, which is
the classic 100 TB scale-killer.

Spark-first shape — the textbook two-phase distributed prefix sum:

1. order key = (group, doc_id) with group = doc_id % n_groups; within-group
   cumulative sums run as a window PARTITIONED BY group (parallel across
   all cores/executors),
2. per-group totals (n_groups rows — metadata scale) get their own
   cumulative offsets,
3. a broadcast join adds each group's offset back: global_start =
   group_offset + within_group_cum - n_tokens.

Wall-clock = one narrow window + one tiny agg + one broadcast join; no
single-partition stage anywhere. The same ordering is expressible as one
global window in DuckDB, which is the oracle.

Note: a document whose tokens straddle a bin boundary belongs to the bin
where it STARTS (downstream chunking splits it — standard concat-and-chunk
semantics); bins are therefore filled to >= budget, never under-filled
except the last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def pack_documents(
    docs: DataFrame,
    token_budget: int,
    n_groups: int = 1024,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign each document a packing ``bin_id`` under ``token_budget``.

    Input needs (id_col, tokens_col) — compose with textstats.token_counts.
    Output: id_col, tokens_col, start_offset (global token offset of the
    document's first token), bin_id.
    """
    grouped = docs.withColumn("_grp", (F.col(id_col) % F.lit(n_groups)))
    w = (
        Window.partitionBy("_grp")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = grouped.withColumn("_cum", F.sum(tokens_col).over(w))
    totals = within.groupBy("_grp").agg(F.max("_cum").alias("_grp_total"))
    w_off = (
        Window.orderBy("_grp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # n_groups rows — metadata scale; the only ordered-unpartitioned window
    # runs over this tiny frame, never over the data
    offsets = totals.withColumn(
        "_offset", F.sum("_grp_total").over(w_off) - F.col("_grp_total")
    ).select("_grp", "_offset")
    out = within.join(broadcast(offsets), "_grp")
    start = F.col("_offset") + F.col("_cum") - F.col(tokens_col)
    return out.select(
        id_col,
        tokens_col,
        start.alias("start_offset"),
        (start / F.lit(token_budget)).cast("long").alias("bin_id"),
    )


def packing_stats(packed: DataFrame, token_budget: int) -> DataFrame:
    """Per-bin packing telemetry: docs, tokens starting in the bin, and the
    fill ratio vs budget (>1 means the last doc straddles into the next
    bin — chunked downstream)."""
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens"),
        F.round(F.sum("n_tokens") / F.lit(token_budget), 4).alias(
            "fill_ratio"
        ),
    )


def pack_documents_sql_duckdb(
    token_budget: int, n_groups: int = 1024, table: str = "documents"
) -> str:
    """DuckDB oracle: the same order key as one global window."""
    return f"""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS n_tokens
      FROM {table}
    ),
    o AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (
               ORDER BY doc_id % {n_groups}, doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
               AS start_offset
      FROM t
    )
    SELECT doc_id, n_tokens, start_offset,
           CAST(start_offset // {token_budget} AS BIGINT) AS bin_id
    FROM o"""


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Split long documents into context-window-sized chunks with optional
    token overlap — the long-document companion to concat-and-chunk
    packing (a doc longer than the training context must be windowed
    before batching; overlap preserves cross-boundary continuity).

    Chunk k covers tokens [k·stride, k·stride + max_tokens) with
    stride = max_tokens − overlap. Pure array expressions (split → slice →
    rejoin) — map-only, explodes to one row per chunk; no shuffle. At
    100 TB the cost is the explode's row amplification (Σ ceil(len/stride)
    per doc), the same multiplier any chunker pays.

    Output: doc_id, chunk_id (0-based), n_chunks, chunk_tokens, chunk_text.
    """
    from tiflow_spark.llm.textstats import tokens as _tokens

    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(
        n > 0,
        F.greatest(
            F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)
        ),
    ).cast("int")  # empty/whitespace-only doc → NULL → explode emits no row
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.struct(
            k.cast("long").alias("chunk_id"),
            F.slice(toks, k * stride + 1, max_tokens).alias("ctoks"),
        ),
    )
    ex = docs.select(
        "doc_id", n_chunks.alias("n_chunks"), F.explode(chunks).alias("c")
    )
    return ex.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.size("c.ctoks").cast("long").alias("chunk_tokens"),
        F.array_join("c.ctoks", " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    max_tokens: int, overlap: int = 0, table: str = "documents"
) -> str:
    stride = max_tokens - overlap
    toks = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"
    return f"""
    WITH base AS (
      SELECT doc_id, {toks} AS toks,
        greatest(CAST(ceil((len({toks}) - {overlap}) * 1.0 / {stride}) AS BIGINT), 1)
          AS n_chunks
      FROM {table}
      WHERE len({toks}) > 0
    )
    SELECT doc_id,
      CAST(k AS BIGINT) AS chunk_id,
      n_chunks,
      CAST(len(list_slice(toks, k * {stride} + 1,
                          k * {stride} + {max_tokens})) AS BIGINT)
        AS chunk_tokens,
      array_to_string(list_slice(toks, k * {stride} + 1,
                                 k * {stride} + {max_tokens}), ' ')
        AS chunk_text
    FROM base, UNNEST(range(0, n_chunks)) AS u(k)"""
