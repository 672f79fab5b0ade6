"""Training-data export: hash-sharded corpus files + manifest.

The last stage of a curation pipeline materializes the corpus as N
near-equal shard files a trainer can stream, with a manifest recording
per-shard document/token counts (the trainer's progress/length source of
truth). Built on the same deterministic hash machinery as
llm/sampling.py: shard assignment and intra-shard order are pure
functions of (salt, epoch, doc_id) — reproducible across runs and
engines, restart-safe.

Scale shape: one repartition keyed by shard (the write's natural
partitioning — each output file is one partition, sorted in place), one
metadata-scale aggregate for the manifest. No driver-side data movement;
the only collect is the n_shards-row manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from tiflow_spark.functions.hashing import portable_hash64
from tiflow_spark.llm.sampling import epoch_shuffle
from tiflow_spark.llm.textstats import tokens


def _shard_of(
    n_shards: int, epoch: int, salt: str, id_col: str = "doc_id"
) -> Column:
    """Same shard assignment epoch_shuffle computes — exposed so stats can
    stay a pure map+agg without the intra-shard rank window."""
    return F.pmod(
        portable_hash64(
            F.concat(F.lit(f"{salt}:{epoch}:"), F.col(id_col).cast("string"))
        ),
        F.lit(n_shards),
    )


def shard_stats(
    docs: DataFrame,
    n_shards: int,
    epoch: int = 0,
    salt: str = "export",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest rows: document count, whitespace-token count,
    char count. The balance across shards is the load-balance guarantee a
    trainer relies on — hash sharding keeps deviation ~√(n/N)."""
    assigned = docs.withColumn("shard", _shard_of(n_shards, epoch, salt))
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col(text_col)))).alias("n_tokens"),
        F.sum(F.length(text_col)).alias("n_chars"),
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    epoch: int = 0,
    salt: str = "export",
    text_col: str = "text",
) -> dict:
    """Materialize the corpus as ``path/shard=K/`` parquet (one file per
    shard, rows in deterministic intra-shard order) plus
    ``path/_manifest.json``. Returns the manifest dict.

    The repartition uses the shard column itself, so the write is the ONE
    corpus-sized pass (epoch_shuffle keeps the payload columns — no
    re-attach join); ordering inside each file comes from
    sortWithinPartitions (spillable, no global sort). The manifest is
    aggregated from the written files with a column-pruned parquet read
    of (shard, n_tokens, n_chars) only — cheap, and it audits what was
    actually written rather than what was intended."""
    assigned = (
        epoch_shuffle(docs, epoch, n_shards, salt=salt)
        .withColumn("n_tokens", F.size(tokens(F.col(text_col))))
        .withColumn("n_chars", F.length(text_col))
    )
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = docs.sparkSession
    stats = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .collect()
    )
    manifest = {
        "epoch": epoch,
        "salt": salt,
        "n_shards": n_shards,
        "shards": {
            str(r["shard"]): {
                "n_docs": r["n_docs"],
                "n_tokens": r["n_tokens"],
                "n_chars": r["n_chars"],
            }
            for r in stats
        },
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def shard_stats_sql(
    n_shards: int,
    epoch: int = 0,
    salt: str = "export",
    table: str = "documents",
) -> str:
    from tiflow_spark.functions.hashing import portable_hash64_sql_duckdb

    h = portable_hash64_sql_duckdb(
        f"'{salt}:{epoch}:' || CAST(doc_id AS VARCHAR)"
    )
    return f"""
    SELECT ({h}) % {n_shards} AS shard,
      count(*) AS n_docs,
      CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
                               t -> t <> ''))) AS BIGINT) AS n_tokens,
      CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM {table} GROUP BY 1"""


def corpus_profile(docs: DataFrame) -> DataFrame:
    """Dataset-card profile: per (source, lang) document counts and length
    statistics — the at-a-glance table a corpus release ships with and the
    drift monitor a standing ingestion pipeline diffs between snapshots.

    mean stays exact (integer sum ÷ count, one correctly-rounded division);
    median of integer lengths interpolates to at worst .5 — both
    engine-portable, unlike general float quantiles. One map-side-combining
    aggregate on a (source, lang)-keyed shuffle; group count is
    metadata-scale."""
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.round(F.sum(F.length("text")) / F.count(F.lit(1)), 6).alias(
            "mean_chars"
        ),
        F.median(F.length("text")).alias("median_chars"),
        F.min(F.length("text")).alias("min_chars"),
        F.max(F.length("text")).alias("max_chars"),
    )


def corpus_profile_sql(table: str = "documents") -> str:
    return f"""
    SELECT source, lang,
      count(*) AS n_docs,
      CAST(sum(length(text)) AS BIGINT) AS total_chars,
      round(sum(length(text)) * 1.0 / count(*), 6) AS mean_chars,
      CAST(median(length(text)) AS DOUBLE) AS median_chars,
      min(length(text)) AS min_chars,
      max(length(text)) AS max_chars
    FROM {table} GROUP BY 1, 2"""
