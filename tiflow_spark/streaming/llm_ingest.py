"""Standing training-data ingest — the LLM-curation pipeline as a
Structured Streaming changefeed.

The batch operators (llm/textstats quality gates, llm/dedup incremental
LSH) curate a corpus one DataFrame at a time; a production corpus is not
built in one pass — documents ARRIVE. This module runs the curation funnel
as a standing stream: ``readStream`` over arriving document files →
quality gate → incremental near-dup dedup against the PERSISTED LSH index
→ append survivors to the curated corpus and the index, all inside
``foreachBatch`` (the same micro-batch idiom the CDC appliers use,
streaming/pipeline.py).

Exactly-once without a transactional lake format: every per-batch output
is written to a ``batch-<id>`` staging directory and ``os.rename``-d into
place (the loader/bucketed-sink atomic-commit idiom), so a crashed and
re-run micro-batch overwrites its own directory instead of double-
appending — replay-idempotent, which is all foreachBatch guarantees
demand. The Structured Streaming checkpoint (source offsets) makes a
restarted query resume with only unseen files.

Scale shape per batch: O(batch shingles) + a (band, sig)-keyed join that
touches the index only on the keys the batch hits (llm/dedup.
dedup_incremental's contract); the corpus itself is never re-read. The
index directories accumulate one subdir per batch — re-cap/fold them at
compaction cadence with compact_lsh_index, exactly like the bucketed
sink's delta compaction.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _atomic_write(df: DataFrame, final_dir: str) -> None:
    staging = final_dir + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    df.write.mode("overwrite").parquet(staging)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(staging, final_dir)


def _read_parts(
    spark: SparkSession, root: str, schema: str, exclude: str | None = None
) -> DataFrame:
    parts = (
        sorted(
            os.path.join(root, d)
            for d in os.listdir(root)
            if d.startswith("batch-")
            and not d.endswith(".staging")
            and d != exclude
        )
        if os.path.isdir(root)
        else []
    )
    if not parts:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*parts)


def init_ingest_state(
    spark: SparkSession,
    state_dir: str,
    seed: DataFrame | None = None,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> None:
    """Create the persisted ingest state (curated corpus + LSH index),
    optionally seeded with an existing corpus (the DM all-mode shape:
    snapshot first, then the standing incremental stream). The seed gets
    the FULL-corpus dedup pass first (min-id keeps, the duplicate_groups
    rep policy) — the incremental path's no-near-dup invariant holds only
    if the snapshot itself starts curated."""
    from tiflow_spark.llm.dedup import minhash_index, minhash_lsh_pairs

    os.makedirs(state_dir, exist_ok=True)
    for sub in ("corpus", "index_sh", "index_banded"):
        os.makedirs(os.path.join(state_dir, sub), exist_ok=True)
    if seed is not None:
        dup_b = (
            minhash_lsh_pairs(seed, num_hashes, bands, threshold, n)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        seed = seed.join(dup_b, "doc_id", "left_anti")
        sh, banded = minhash_index(seed, num_hashes, bands, n)
        _atomic_write(seed, os.path.join(state_dir, "corpus", "batch-seed"))
        _atomic_write(sh, os.path.join(state_dir, "index_sh", "batch-seed"))
        _atomic_write(
            banded, os.path.join(state_dir, "index_banded", "batch-seed")
        )


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    quality_gate: Callable[[DataFrame], DataFrame] | None = None,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
) -> None:
    """One micro-batch of the curation funnel (the foreachBatch body —
    callable directly for batch-driven backfills):

    1. quality gate (callable returning the surviving rows; None = all);
    2. incremental near-dup vs the persisted index + in-batch
       (llm/dedup.dedup_incremental) — a new doc is DROPPED when it
       near-dups any indexed doc or a smaller-id doc of its own batch
       (first-arrival-wins, the same canonical-keep rule as the batch
       dedup path);
    3. survivors append to corpus + index as an atomically-renamed
       ``batch-<id>`` directory — re-running the same batch id replaces,
       never duplicates.
    """
    from tiflow_spark.llm.dedup import dedup_incremental

    gated = quality_gate(batch) if quality_gate is not None else batch
    # exclude THIS batch id's own directories from the index read: a
    # crash-replayed micro-batch must dedup against the pre-batch index,
    # not against its own first attempt's output (else survivors would
    # "near-dup themselves" and the replay would drop extra docs)
    idx_sh = _read_parts(
        spark, os.path.join(state_dir, "index_sh"),
        "doc_id bigint, sh array<string>", exclude=f"batch-{batch_id}",
    )
    idx_banded = _read_parts(
        spark, os.path.join(state_dir, "index_banded"),
        "doc_id bigint, band int, sig string", exclude=f"batch-{batch_id}",
    )
    pairs, new_sh, new_banded = dedup_incremental(
        gated, idx_sh, idx_banded, num_hashes, bands, threshold, n,
        return_index=True,
    )
    # FIRST-ARRIVAL-WINS, independent of id ordering: an already-committed
    # (indexed) doc can never be retroactively dropped, so a batch doc
    # loses every pairing with an index doc regardless of which side the
    # canonical id_a < id_b ordering put it on; within the batch the
    # smaller id wins (the duplicate_groups min-id rep policy). The
    # membership probes are id-equi joins where the pairs side is
    # batch-scale — the index side is touched only on the paired ids.
    idx_ids = idx_sh.select("doc_id")
    lose_b = pairs.join(
        idx_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "semi"
    ).select(F.col("id_b").alias("doc_id"))
    lose_a = pairs.join(
        idx_ids.withColumnRenamed("doc_id", "id_b"), "id_b", "semi"
    ).select(F.col("id_a").alias("doc_id"))
    in_batch = pairs.join(
        idx_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_anti"
    ).join(
        idx_ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_anti"
    ).select(F.col("id_b").alias("doc_id"))
    dropped = lose_b.unionByName(lose_a).unionByName(in_batch).distinct()
    survivors = gated.join(dropped, "doc_id", "left_anti")
    surv_ids = survivors.select("doc_id")
    _atomic_write(
        survivors, os.path.join(state_dir, "corpus", f"batch-{batch_id}")
    )
    _atomic_write(
        new_sh.join(surv_ids, "doc_id", "semi"),
        os.path.join(state_dir, "index_sh", f"batch-{batch_id}"),
    )
    _atomic_write(
        new_banded.join(surv_ids, "doc_id", "semi"),
        os.path.join(state_dir, "index_banded", f"batch-{batch_id}"),
    )
    new_sh.unpersist()
    new_banded.unpersist()


def run_corpus_ingest(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    quality_gate: Callable[[DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int = 1,
    **dedup_params,
) -> None:
    """Run the standing ingest until all currently-arrived files are
    processed (availableNow trigger — the batch-draining mode; a
    production deployment would use a processingTime trigger, identical
    body). Restarting with the same checkpoint processes ONLY files that
    arrived since the last run."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: ingest_batch(
                spark, df, bid, state_dir, quality_gate, **dedup_params
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_corpus(spark: SparkSession, state_dir: str) -> DataFrame:
    """The curated corpus (all committed batches)."""
    return _read_parts(spark, os.path.join(state_dir, "corpus"), DOC_SCHEMA)
