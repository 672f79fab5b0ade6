"""DM load unit with checkpointed crash-resume — the batch-loader sibling
of the sync_diff resume path.

Reference behavior (dm/loader/checkpoint.go + lightning.go): the load unit
persists per-task/per-table progress (``lightningCheckpointList`` status
init → running → finished; the pre-lightning loader tracked per-dump-file
restore offsets in ``restoringFiles``), so a worker crash mid-import
resumes by skipping everything already restored instead of re-importing a
multi-TB dump from zero. ``query-status`` reads the same state to report
progress.

Spark-first re-expression: a dump is a directory of per-chunk parquet
"dump files" (the dumpling layout, chunked on the PK like
sources/jdbc_source.ChunkSpec); the load writes each chunk to the target
as an independent atomic unit (write to a temp dir, ``os.rename`` into
place — same-filesystem rename is the atomic commit, the staged-commit
idiom the streaming sink uses), then records the chunk done in a JSON
checkpoint replaced atomically (tmp + rename). A resumed run re-reads the
checkpoint and loads ONLY chunks not yet committed. Offsets-within-file
degrade to chunk granularity here: Spark's unit of parallel work is the
file/chunk, not a row offset into a stream — same recovery bound (at most
one chunk of repeated work per task slot), cluster-native unit.

At 100 TB: chunks load embarrassingly parallel (each is an independent
read→write), the checkpoint is O(chunks) metadata, and resume cost is
zero re-reads of completed chunks — the property the reference built
checkpoints for.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dump_snapshot_chunks(
    df: DataFrame,
    dump_dir: str,
    table: str,
    key_col: str,
    chunk_size: int,
) -> list[int]:
    """Dumpling-style export: write ``df`` as per-chunk parquet dump files
    under ``dump_dir/table/chunk_id=<id>/`` with chunk_id = key // chunk_size
    (the same pk-range chunking as sources/jdbc_source.chunk_predicates).
    Returns the chunk ids written."""
    chunked = df.withColumn(
        "chunk_id", F.expr(f"{key_col} div {chunk_size}")
    )
    chunked.write.mode("overwrite").partitionBy("chunk_id").parquet(
        os.path.join(dump_dir, table)
    )
    # the occupied chunk ids ARE the partition directories just written —
    # deriving them from the listing saves the former distinct+collect
    # pre-pass (one whole extra scan+shuffle of the table, guide §2.4)
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(os.path.join(dump_dir, table))
        if d.startswith("chunk_id=")
    )


def _ckpt_file(ckpt_dir: str, table: str) -> str:
    return os.path.join(ckpt_dir, f"{table}.load.json")


def _read_ckpt(ckpt_dir: str, table: str) -> dict:
    path = _ckpt_file(ckpt_dir, table)
    if not os.path.exists(path):
        return {"status": "init", "done_chunks": []}
    with open(path) as f:
        return json.load(f)


def _write_ckpt(ckpt_dir: str, table: str, state: dict) -> None:
    """Atomic replace — a crash mid-write can never leave a torn
    checkpoint (checkpoints are the one thing that must survive any
    crash point)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = _ckpt_file(ckpt_dir, table)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)


def resumable_snapshot_load(
    spark: SparkSession,
    dump_dir: str,
    target_dir: str,
    table: str,
    ckpt_dir: str,
    fail_after_chunks: int | None = None,
    loaded_chunks: list[int] | None = None,
    chunks_per_batch: int = 1,
) -> None:
    """Load a chunked dump into ``target_dir/table``, checkpointing each
    chunk batch; re-invocation after a crash loads only chunks not yet
    committed. ``fail_after_chunks`` injects a crash once N chunks have
    committed this run — it fires at the next batch boundary (the loader
    fault-injection hook, same idiom as
    syncdiff.resumable_chunk_compare); ``loaded_chunks`` (out-param)
    records which chunks THIS run actually loaded, so tests can assert
    the resume skipped completed work.

    ``chunks_per_batch`` is the parallelism/recovery trade-off: each
    batch of uncommitted chunks loads as ONE Spark job (the dump dirs
    read with ``basePath`` so the chunk_id partition column survives,
    written back ``partitionBy(chunk_id)``) — the chunks of a batch load
    cluster-parallel instead of one driver-looped job each, and a crash
    re-does at most one batch. 1 = per-chunk commits (finest recovery);
    a 1000-executor load wants hundreds per batch."""
    state = _read_ckpt(ckpt_dir, table)
    src_root = os.path.join(dump_dir, table)
    all_chunks = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(src_root)
        if d.startswith("chunk_id=")
    )
    done = set(state["done_chunks"])
    state["status"] = "running"
    _write_ckpt(ckpt_dir, table, state)
    todo = [cid for cid in all_chunks if cid not in done]
    n_this_run = 0
    for g in range(0, len(todo), max(chunks_per_batch, 1)):
        group = todo[g : g + max(chunks_per_batch, 1)]
        if fail_after_chunks is not None and n_this_run >= fail_after_chunks:
            raise RuntimeError("injected crash mid-load")
        # staging names must NOT match read_loaded_table's chunk-* glob:
        # a crash between a staged write and its rename would otherwise
        # leave a partial chunk that reads as committed data
        group_staging = os.path.join(target_dir, table, f"_staging-g{g}")
        shutil.rmtree(group_staging, ignore_errors=True)
        batch_df = spark.read.option("basePath", src_root).parquet(
            *[os.path.join(src_root, f"chunk_id={cid}") for cid in group]
        )
        batch_df.write.mode("overwrite").partitionBy("chunk_id").parquet(
            group_staging
        )
        for cid in group:
            final = os.path.join(target_dir, table, f"chunk-{cid}")
            shutil.rmtree(final, ignore_errors=True)
            # atomic per-chunk commit; a crash mid-group re-loads only
            # this group (renamed-but-uncheckpointed chunks overwrite
            # idempotently on the resume)
            os.rename(os.path.join(group_staging, f"chunk_id={cid}"), final)
        shutil.rmtree(group_staging, ignore_errors=True)
        state["done_chunks"] = sorted(set(state["done_chunks"]) | set(group))
        _write_ckpt(ckpt_dir, table, state)
        if loaded_chunks is not None:
            loaded_chunks.extend(group)
        n_this_run += len(group)
    state["status"] = "finished"
    _write_ckpt(ckpt_dir, table, state)


def load_status(
    spark: SparkSession, ckpt_dir: str, tables: Sequence[str]
) -> DataFrame:
    """query-status analog over the loader checkpoints: per-table unit
    status + chunks done (pb.ProcessResult / query-status progress view,
    read purely from persisted checkpoint state)."""
    rows = []
    for t in tables:
        st = _read_ckpt(ckpt_dir, t)
        rows.append((t, st["status"], len(st["done_chunks"])))
    return spark.createDataFrame(
        rows, "table string, status string, chunks_done bigint"
    )


def read_loaded_table(
    spark: SparkSession, target_dir: str, table: str
) -> DataFrame:
    """Read back a loaded target table (all committed chunks)."""
    return spark.read.parquet(os.path.join(target_dir, table, "chunk-*"))
