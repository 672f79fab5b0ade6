"""Bucketed MERGE target — the shuffle-free apply path at scale.

The reference co-locates work by key once (causality hash → worker queue)
and then applies against MySQL, which resolves rows by index. Spark's
analog for a *table* target: bucket the target by the merge key, so every
incremental MERGE joins the (small) change batch against the (huge)
snapshot WITHOUT shuffling the snapshot — the scan is already hash-
partitioned by bucket. At 100 TB the snapshot shuffle is the single
largest avoidable cost in a merge; bucketing removes it from every batch
forever at the price of one bucketed write.

Commit protocol (crash-atomic, replay-recoverable): each batch stages its
rewritten buckets under ``<path>/_staging/batch-<id>/`` (invisible to Spark
reads — underscore prefix), writes a manifest listing affected + staged
buckets, then an atomic ``_COMMIT`` marker, and only then swaps staged dirs
into place. A crash BEFORE the marker leaves the target untouched (the
foreachBatch replay redoes the batch); a crash AFTER the marker is completed
by :func:`recover` on the next merge/read — so the documented
replay-idempotent contract holds across every crash window. This is the
parquet-native miniature of a Delta/Iceberg transaction log, which remains
the production seam of foreachBatch.

`tests/test_plan_contracts.py::test_bucketed_merge_does_not_shuffle_target`
asserts the no-target-shuffle property on the physical plan.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "_target_meta.json"
_STAGING = "_staging"
_DELTA = "_delta"


def write_bucketed_target(
    snapshot: DataFrame,
    table_name: str,
    key_col: str = "id",
    n_buckets: int = 16,
) -> None:
    """One-time (re)materialization of the target, bucketed + sorted by the
    merge key (Delta/Iceberg deployments use their native clustering)."""
    (
        snapshot.write.mode("overwrite")
        .bucketBy(n_buckets, key_col)
        .sortBy(key_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def merge_against_bucketed(
    spark: SparkSession,
    table_name: str,
    changes: DataFrame,
    key_col: str = "id",
) -> DataFrame:
    """Incremental MERGE plan against the bucketed target: the change side
    shuffles into the target's bucket layout; the target side reads
    in-place. Net-delete keys drop, upserts win — same semantics as
    apply.merge_into_snapshot."""
    target = spark.table(table_name)
    chg = changes.select(
        F.col("op").alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in target.columns],
    )
    joined = target.join(
        chg, target[key_col] == chg[f"_c_{key_col}"], "full_outer"
    )
    is_change = F.col("_op").isNotNull()
    keep = ~is_change | (F.col("_op") != "D")
    return joined.filter(keep).select(
        *[
            F.when(is_change, F.col(f"_c_{c}")).otherwise(F.col(c)).alias(c)
            for c in target.columns
        ]
    )


# ------------------------------------------------ atomic-commit machinery


def _bucket_write_partitions(spark: SparkSession, n_candidates: int) -> int:
    """Shuffle-partition count for a bucket-partitioned write.

    A keyless-N ``repartition(col("bucket"))`` lets AQE coalesce the
    exchange by SIZE — a seed/merge whose winners are a few tens of MB
    collapses to ONE task that then writes every bucket directory
    sequentially (measured 10.4 s for a 1024-bucket seed vs 2.7 s with
    one task per core; the wall cost of this write is per-FILE creation,
    not bytes, so it scales with writer parallelism, not data size).
    Pin the count explicitly: one task per core of the cluster
    (``defaultParallelism`` — the scale-adaptive knob), never more tasks
    than buckets being written."""
    return max(1, min(n_candidates, spark.sparkContext.defaultParallelism))


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _read_json(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def read_target_meta(path: str) -> dict | None:
    """Target sizing metadata written at creation (n_buckets is a TARGET
    property, not a caller opinion — callers are validated against it)."""
    return _read_json(os.path.join(path, _META))


def _write_target_meta(
    path: str,
    n_buckets: int,
    key_cols,
    base: dict | None = None,
    schema_json: str | None = None,
) -> None:
    """Write sizing metadata, preserving any other keys already present (or
    passed via ``base`` when the caller captured them before a destructive
    write) — e.g. truncate watermarks recorded before first data.
    ``schema_json`` records the creation schema so a fully-GC'd (empty)
    target stays readable — parquet inference has no footers to work with
    when every row has been reclaimed."""
    meta = dict(base or read_target_meta(path) or {})
    meta.update({"n_buckets": n_buckets, "key_cols": list(key_cols)})
    if schema_json is not None:
        meta["schema"] = schema_json
    _atomic_write_json(os.path.join(path, _META), meta)


def _read_base(spark: SparkSession, path: str) -> DataFrame:
    """Schema-safe full read of a target's bucket data: a target whose
    every row was purged (all-deletes workload + GC safepoint past them)
    has no parquet files left, so schema inference fails — fall back to an
    empty frame with the creation schema recorded in the target metadata.
    Found by the snapshot-immutability property test (rewrite-delete then
    purge minimal counterexample)."""
    import pyspark.sql.types as T

    has_files = any(
        f.endswith(".parquet")
        for d in os.listdir(path)
        if d.startswith("bucket=")
        and os.path.isdir(os.path.join(path, d))
        for f in os.listdir(os.path.join(path, d))
    )
    if not has_files:
        sj = (read_target_meta(path) or {}).get("schema")
        if sj is not None:
            return spark.createDataFrame(
                [], T.StructType.fromJson(json.loads(sj))
            )
    return spark.read.option("mergeSchema", "true").parquet(path)


def truncate_table(path: str, table: str, truncate_ts: int) -> None:
    """Metadata-only TRUNCATE TABLE — the DDL sink applying a truncate at
    its barrier (the reference forwards TRUNCATE to the MySQL sink, which
    drops the rows; job_type taxonomy pkg/filter/filter.go).

    Records a per-table truncate watermark in the target metadata: rows of
    ``table`` with commit_ts < truncate_ts stop being visible to
    :func:`read_state` immediately and are physically reclaimed by the next
    :func:`purge_tombstones`/:func:`resize_buckets` rewrite. O(1) regardless
    of target size — the 100 TB property; a truncate never rewrites data
    inline. Monotone + idempotent: replays can only raise the watermark."""
    meta = read_target_meta(path) or {}
    tr = dict(meta.get("truncates") or {})
    if truncate_ts <= tr.get(table, -1):
        return
    tr[table] = truncate_ts
    meta["truncates"] = tr
    os.makedirs(path, exist_ok=True)
    _atomic_write_json(os.path.join(path, _META), meta)


def recover_table(path: str, table: str) -> None:
    """FLASHBACK TABLE analog ('recover table' job type): clears a truncate
    watermark, restoring visibility of rows the truncate hid — valid until
    a purge/resize rewrite physically reclaimed them (the GC-window
    semantics of the reference: recoverable while data survives GC).
    Metadata-only, O(1); a no-op if no watermark exists."""
    meta = read_target_meta(path) or {}
    tr = dict(meta.get("truncates") or {})
    if table not in tr:
        return
    del tr[table]
    meta["truncates"] = tr
    _atomic_write_json(os.path.join(path, _META), meta)


def _truncated_predicate(meta: dict | None, table_col: str = "target_table"):
    """Column predicate matching rows erased by a truncate watermark, or
    None when no truncate was ever applied."""
    cond = None
    for t, ts in ((meta or {}).get("truncates") or {}).items():
        c = (F.col(table_col) == t) & (F.col("commit_ts") < F.lit(ts))
        cond = c if cond is None else (cond | c)
    return cond


def _apply_commit(path: str, stage: str, manifest: dict) -> None:
    """Swap staged bucket dirs into the target. Idempotent: safe to re-run
    from any crash point after the _COMMIT marker exists."""
    staged = set(manifest["staged"])
    for b in manifest["affected"]:
        name = f"bucket={b}"
        dest = os.path.join(path, name)
        src = os.path.join(stage, name)
        if name in staged:
            if os.path.isdir(src):
                shutil.rmtree(dest, ignore_errors=True)
                os.rename(src, dest)
            # else: already swapped by a previous (crashed) attempt
        else:
            # every row of this bucket was deleted — bucket dir goes away
            shutil.rmtree(dest, ignore_errors=True)
    # delta files folded into buckets by this commit are consumed with it
    # (post-marker → re-runnable; a replayed removal is a no-op)
    for name in manifest.get("deltas", []):
        shutil.rmtree(os.path.join(path, _DELTA, name), ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)


def recover(path: str) -> None:
    """Complete half-committed batches; discard uncommitted staging.

    Called before every merge and state read: a batch whose _COMMIT marker
    exists is rolled FORWARD (its swap is finished); one without is rolled
    BACK by deletion (the streaming checkpoint replays it)."""
    root = os.path.join(path, _STAGING)
    if not os.path.isdir(root):
        return
    for entry in sorted(os.listdir(root)):
        stage = os.path.join(root, entry)
        manifest = _read_json(os.path.join(stage, "manifest.json"))
        if os.path.exists(os.path.join(stage, "_COMMIT")) and manifest:
            _apply_commit(path, stage, manifest)
        else:
            shutil.rmtree(stage, ignore_errors=True)


def _commit_staged(
    path: str, stage: str, affected: list[int], deltas: list[str] = ()
) -> None:
    """manifest → fsynced _COMMIT marker → swap. The marker is the commit
    point; everything after it is re-runnable."""
    staged = sorted(
        d for d in os.listdir(stage) if d.startswith("bucket=")
    )
    manifest = {"affected": affected, "staged": staged, "deltas": list(deltas)}
    _atomic_write_json(os.path.join(stage, "manifest.json"), manifest)
    _atomic_write_json(os.path.join(stage, "_COMMIT"), {"ok": True})
    _apply_commit(path, stage, manifest)


def merge_hash_bucketed(
    changes: DataFrame,
    path: str,
    n_buckets: int = 32,
    key_cols: tuple[str, ...] = ("target_table", "key"),
    table_col: str = "target_table",
    batch_id: int = 0,
    mode: str = "rewrite",
) -> None:
    """Streaming MERGE with per-batch cost O(batch + touched buckets), not
    O(target): the target is a parquet directory hash-partitioned on
    ``bucket = pmod(xxhash64(key), n_buckets)``. Each batch

    1. completes/rolls back any interrupted prior commit (recover),
    2. computes the buckets its keys touch (a tiny distinct on the batch),
    3. reads ONLY those partitions (partition-pruned, schema-merged scan),
    4. re-resolves max-(commit_ts, seq, op)-wins per key, and
    5. stages + atomically commits only the touched buckets.

    Untouched buckets are never read or written — the property that makes a
    standing changefeed viable when the target is 1000x the batch. The
    reference's MySQL sink gets the same effect from index lookups
    (cdc/sink/dmlsink/txn/mysql).

    ``mode="delta"`` is the merge-on-read fast path (the LSM shape of the
    reference's pebble db-sorter, docs/design/2022-03-16-ticdc-db-sorter.md):
    instead of rewriting every touched bucket, the batch's per-key winners
    are appended as ONE delta file under ``_delta/`` — per-batch write cost
    O(batch) with a single rename, zero bucket reads. Readers resolve
    winners across base ∪ deltas at scan time (max-order-key-wins is
    associative, so resolution order is immaterial); :func:`compact_deltas`
    folds accumulated deltas into the buckets at maintenance cadence,
    restoring resolve-free reads. Copy-on-write ("rewrite") keeps the
    cheapest reads; delta mode makes a high-frequency changefeed's steady
    state O(batch) on BOTH sides of the write-amplification trade.

    Sizing: n_buckets is fixed at target creation (persisted in
    _target_meta.json; callers are validated against it) and should scale
    with target size so one bucket ~ a few hundred MB (100 TB target /
    256 MB ≈ 400k buckets). Use :func:`resize_buckets` to re-home a target
    that outgrew its layout. Replaying a batch re-merges the same winners —
    idempotent, same contract as the reference's safe-mode REPLACE.
    """
    from tiflow_spark.operators.compactor import last_state_per_key

    spark = changes.sparkSession
    meta0 = read_target_meta(path) if os.path.isdir(path) else None
    # a dir holding only metadata (e.g. a truncate watermark recorded before
    # first data) is still "uncreated" — no bucket layout exists yet
    exists = os.path.isdir(path) and bool((meta0 or {}).get("n_buckets"))
    if exists:
        recover(path)
        meta = read_target_meta(path)
        if meta and meta["n_buckets"] != n_buckets:
            raise ValueError(
                f"target {path} was created with n_buckets="
                f"{meta['n_buckets']}, merge called with {n_buckets}; "
                "use resize_buckets() to change the layout"
            )
    chg = changes.withColumn(
        "bucket",
        F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast(
            "int"
        ),
    ).persist()
    try:
        if not exists:
            # D winners are RETAINED as tombstones: without them, a
            # late-arriving event OLDER than an applied delete would
            # resurrect the row (the reference never sees this — its sorter
            # + resolved-ts contract delivers per-key in order; a file
            # source across restarts does not). read_state() filters them;
            # purge_tombstones() reclaims them below the GC safepoint.
            result = last_state_per_key(chg, table_col)
            # one file per bucket dir: without this, every writer task sprays
            # a small file into every bucket it sees (32 tasks x 1024 dirs).
            # Explicit partition count — see _bucket_write_partitions.
            result.repartition(
                _bucket_write_partitions(spark, n_buckets), F.col("bucket")
            ).write.mode("overwrite").partitionBy("bucket").parquet(path)
            # base=meta0: Spark's overwrite wiped the dir — restore any
            # pre-creation metadata (truncate watermarks) alongside sizing;
            # record the creation schema for the empty-target read fallback
            _write_target_meta(
                path,
                n_buckets,
                key_cols,
                base=meta0,
                schema_json=result.schema.json(),
            )
            return
        if mode == "delta":
            _append_delta(chg, path, table_col, batch_id)
            return
        affected = sorted(
            r.bucket for r in chg.select("bucket").distinct().collect()
        )
        _merge_rewrite(spark, chg, path, affected, table_col, f"batch-{batch_id}")
    finally:
        chg.unpersist()


def _append_delta(
    chg: DataFrame, path: str, table_col: str, batch_id: int
) -> None:
    """Merge-on-read append: the batch's winners land as one delta file.

    Single coalesced write into staging, then a dir rename into
    ``_delta/batch-<id>`` — no bucket is read or rewritten. Replaying a
    batch id REPLACES its delta (idempotent); a crash between remove and
    rename loses only a delta the replayed batch re-creates (the
    foreachBatch replay contract, same as an uncommitted staged batch)."""
    from tiflow_spark.operators.compactor import last_state_per_key

    winner = last_state_per_key(
        chg.withColumn("seq", F.coalesce(F.col("seq"), F.lit(-1))).withColumn(
            "commit_ts", F.coalesce(F.col("commit_ts"), F.lit(-1))
        ),
        table_col,
    )
    name = f"batch-{batch_id}"
    stage = os.path.join(path, _STAGING, f"delta-{name}")
    shutil.rmtree(stage, ignore_errors=True)
    winner.coalesce(1).write.mode("overwrite").parquet(stage)
    dest_root = os.path.join(path, _DELTA)
    os.makedirs(dest_root, exist_ok=True)
    dest = os.path.join(dest_root, name)
    shutil.rmtree(dest, ignore_errors=True)
    os.rename(stage, dest)


def list_deltas(path: str) -> list[str]:
    """Names of unconsumed delta appends, oldest batch first."""
    root = os.path.join(path, _DELTA)
    if not os.path.isdir(root):
        return []
    return sorted(d for d in os.listdir(root) if not d.startswith("."))


def _read_deltas(spark: SparkSession, path: str, names: list[str]) -> DataFrame:
    return spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(path, _DELTA, n) for n in names]
    )


def _merge_rewrite(
    spark: SparkSession,
    chg: DataFrame,
    path: str,
    affected: list[int],
    table_col: str,
    commit_name: str,
    consume_deltas: list[str] = (),
) -> None:
    """Copy-on-write merge body: fold ``chg`` (already bucket-stamped) into
    its touched buckets through the staged-manifest commit. ``consume_deltas``
    lists delta dirs whose rows are included in ``chg`` — the commit removes
    them atomically with the bucket swap."""
    from tiflow_spark.operators.compactor import last_state_per_key

    # list ONLY the touched bucket dirs (basePath keeps the partition
    # column) — full-tree partition discovery is O(n_buckets) listing
    # per batch, the metadata analog of the full-table scan. (Delta/
    # Iceberg get this from the transaction log; plain parquet gets it
    # from the explicit dir list.)
    existing = [
        p
        for b in affected
        if os.path.isdir(p := os.path.join(path, f"bucket={b}"))
    ]
    if existing:
        # stored rows keep their op (D rows are tombstones and must keep
        # outranking older late arrivals). mergeSchema: a schema-evolved
        # target must never be narrowed by a replayed pre-DDL batch —
        # the union schema is the widest of stored ∪ batch.
        current = (
            spark.read.option("mergeSchema", "true")
            .option("basePath", path)
            .parquet(*existing)
        )
        src = current.unionByName(chg, allowMissingColumns=True)
    else:
        src = chg
    winner = last_state_per_key(
        src.withColumn("seq", F.coalesce(F.col("seq"), F.lit(-1)))
        .withColumn("commit_ts", F.coalesce(F.col("commit_ts"), F.lit(-1))),
        table_col,
    )
    # stage inside the target dir (same filesystem → rename is atomic;
    # underscore prefix → invisible to Spark scans), then manifest +
    # marker + swap. A bucket whose rows were ALL deleted has no staged
    # dir and is removed at swap time.
    stage = os.path.join(path, _STAGING, commit_name)
    shutil.rmtree(stage, ignore_errors=True)
    winner.repartition(
        _bucket_write_partitions(spark, len(affected)), F.col("bucket")
    ).write.mode("overwrite").partitionBy("bucket").parquet(stage)
    _commit_staged(path, stage, affected, deltas=consume_deltas)


def compact_deltas(spark: SparkSession, path: str, table_col: str | None = None) -> int:
    """Fold accumulated merge-on-read deltas into their buckets — the
    maintenance pass that restores resolve-free reads. Cost O(deltas +
    touched buckets); untouched buckets stay untouched. The staged commit
    consumes the folded delta files atomically with the bucket swap, so a
    crash at any point either keeps the deltas (pre-marker) or finishes
    consuming them (post-marker) — never double-applies (winner resolution
    is idempotent anyway). Returns the number of deltas folded."""
    recover(path)
    names = list_deltas(path)
    if not names:
        return 0
    meta = read_target_meta(path) or {}
    tcol = table_col or (meta.get("key_cols") or ["target_table"])[0]
    chg = _read_deltas(spark, path, names).persist()
    try:
        affected = sorted(
            r.bucket for r in chg.select("bucket").distinct().collect()
        )
        _merge_rewrite(
            spark, chg, path, affected, tcol, "compact", consume_deltas=names
        )
    finally:
        chg.unpersist()
    return len(names)


def read_state(spark: SparkSession, path: str) -> DataFrame:
    """Live rows of a hash-bucket target: tombstones filtered out. This is
    the downstream-visible table state. Completes any half-committed batch
    first so readers never observe a torn commit.

    Merge-on-read: when unconsumed ``_delta`` appends exist, base ∪ deltas
    is winner-resolved at scan time (one extra shuffle, proportional to the
    data read — not to the target, since base buckets are still pruned by
    any pushed key predicate). A compacted target skips the resolve
    entirely."""
    recover(path)
    df = _read_base(spark, path)
    meta = read_target_meta(path)
    deltas = list_deltas(path)
    if deltas:
        from tiflow_spark.operators.compactor import last_state_per_key

        tcol = ((meta or {}).get("key_cols") or ["target_table"])[0]
        df = df.withColumn("seq", F.coalesce(F.col("seq"), F.lit(-1))).withColumn(
            "commit_ts", F.coalesce(F.col("commit_ts"), F.lit(-1))
        )
        df = last_state_per_key(
            df.unionByName(
                _read_deltas(spark, path, deltas), allowMissingColumns=True
            ),
            tcol,
        )
    live = df.filter(F.col("op") != "D")
    trunc = _truncated_predicate(meta)
    return live.filter(~trunc) if trunc is not None else live


def purge_tombstones(
    spark: SparkSession, path: str, safepoint_ts: int
) -> None:
    """Reclaim tombstones with commit_ts <= safepoint_ts (the GC-safepoint
    analog, pkg/txnutil/gc): once the source guarantees no event at-or-below
    the safepoint will ever arrive (resolved-ts contract), deletes below it
    can never be outranked and are physically dropped. Full-target rewrite —
    run at maintenance cadence, not per batch. mergeSchema so a schema-
    evolved target keeps every column regardless of which file inference
    would have picked."""
    compact_deltas(spark, path)  # deltas must fold before a full rewrite
    recover(path)
    df = _read_base(spark, path)
    kept = df.filter(
        ~((F.col("op") == "D") & (F.col("commit_ts") <= F.lit(safepoint_ts)))
    )
    # physically reclaim truncated rows too (the watermark stays — a
    # replayed pre-truncate batch must keep merging into invisibility)
    trunc = _truncated_predicate(read_target_meta(path))
    if trunc is not None:
        kept = kept.filter(~trunc)
    _rewrite_all(path, kept, stage_name="purge")


def resize_buckets(
    spark: SparkSession,
    path: str,
    n_buckets_new: int,
    key_cols: tuple[str, ...] | None = None,
) -> None:
    """Re-home the target into a new bucket count — the maintenance op for a
    target that outgrew its layout (the 100 TB sizing math above). One full
    read + one full write, committed atomically through the same staged
    manifest; steady-state merges are untouched. key_cols defaults to the
    creation-time metadata."""
    compact_deltas(spark, path)  # deltas must fold before a full rewrite
    recover(path)
    meta = read_target_meta(path)
    cols = tuple(key_cols or (meta or {}).get("key_cols") or ())
    if not cols:
        raise ValueError(f"no key_cols given and no metadata at {path}")
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .drop("bucket")
        .withColumn(
            "bucket",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_buckets_new)
            ).cast("int"),
        )
    )
    _rewrite_all(path, df, stage_name="resize")
    _write_target_meta(path, n_buckets_new, cols)


def _rewrite_all(path: str, df: DataFrame, stage_name: str) -> None:
    """Full-target rewrite through the staged-manifest commit: affected =
    every current bucket ∪ every staged bucket, so stale dirs vanish and the
    swap is crash-recoverable like any batch commit."""
    stage = os.path.join(path, _STAGING, stage_name)
    shutil.rmtree(stage, ignore_errors=True)
    n_buckets = (read_target_meta(path) or {}).get("n_buckets") or 1_000_000
    df.repartition(
        _bucket_write_partitions(df.sparkSession, n_buckets), F.col("bucket")
    ).write.mode("overwrite").partitionBy("bucket").parquet(stage)
    old = {
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("bucket=")
    }
    new = {
        int(d.split("=", 1)[1])
        for d in os.listdir(stage)
        if d.startswith("bucket=")
    }
    _commit_staged(path, stage, sorted(old | new))


def snapshot_target(path: str, snap_path: str, info: dict | None = None) -> dict:
    """Consistent point-in-time snapshot of a bucketed target — the
    syncpoint consistent-read story (cdc/syncpointstore): the reference
    records (primary_ts, secondary_ts) so readers can query the downstream
    at a ts consistent with an upstream ts; here the downstream *is* a file
    target, so the snapshot is a hardlink clone of its current bucket/delta
    files plus the metadata. Zero data copy, O(#files) metadata work; the
    clone is immutable while the live target keeps merging (bucket swaps
    replace whole directories, never mutate linked files in place). On an
    object store the same operation is a manifest copy — this is the
    filesystem miniature.

    Any half-committed batch is rolled forward first, so the snapshot is a
    real commit boundary. The clone is a fully valid target:
    :func:`read_state` (and every maintenance op) works on it unchanged.
    Returns the snapshot metadata (written to ``<snap_path>/_snapshot.json``).
    """
    recover(path)
    if os.path.exists(snap_path):
        raise ValueError(f"snapshot path exists: {snap_path}")
    os.makedirs(snap_path)
    linked_files = 0
    for entry in sorted(os.listdir(path)):
        src = os.path.join(path, entry)
        if entry.startswith("bucket=") and os.path.isdir(src):
            dst = os.path.join(snap_path, entry)
            os.makedirs(dst)
            for f in os.listdir(src):
                if not f.startswith(("_", ".")):
                    os.link(os.path.join(src, f), os.path.join(dst, f))
                    linked_files += 1
        elif entry == _DELTA and os.path.isdir(src):
            for name in sorted(os.listdir(src)):
                ddir = os.path.join(src, name)
                if not os.path.isdir(ddir):
                    continue
                dd = os.path.join(snap_path, _DELTA, name)
                os.makedirs(dd)
                for f in os.listdir(ddir):
                    if not f.startswith(("_", ".")):
                        os.link(os.path.join(ddir, f), os.path.join(dd, f))
                        linked_files += 1
        elif entry == _META:
            shutil.copyfile(src, os.path.join(snap_path, _META))
    snap_meta = {
        "source": os.path.abspath(path),
        "linked_files": linked_files,
        **(info or {}),
    }
    _atomic_write_json(os.path.join(snap_path, "_snapshot.json"), snap_meta)
    return snap_meta


def syncpoint_snapshot(
    path: str,
    snapshots_root: str,
    primary_ts: int,
    info: dict | None = None,
    key: str | None = None,
) -> dict:
    """Record a syncpoint: snapshot the target under
    ``<snapshots_root>/sp-<key>`` and append the (key → snapshot) mapping
    to ``<snapshots_root>/_syncpoints.json`` — the
    mysql_syncpoint_store.go analog where the 'secondary ts' is the
    immutable snapshot itself. Idempotent per key (a replayed syncpoint
    returns the existing mapping). ``key`` defaults to the primary_ts;
    streaming ticks key by batch_id instead, because a frontier that did
    not advance (late out-of-order arrivals) still deserves its own
    snapshot of the newly applied rows."""
    os.makedirs(snapshots_root, exist_ok=True)
    index_path = os.path.join(snapshots_root, "_syncpoints.json")
    index = _read_json(index_path) or {"syncpoints": {}}
    key = key if key is not None else str(primary_ts)
    if key in index["syncpoints"]:
        return index["syncpoints"][key]
    snap_path = os.path.join(snapshots_root, f"sp-{key}")
    # crash window: the clone exists but the index write never happened —
    # the orphan was never referenced (only the index publishes a
    # snapshot), so discard and re-clone rather than failing every retry
    if os.path.exists(snap_path):
        shutil.rmtree(snap_path, ignore_errors=True)
    meta = snapshot_target(
        path, snap_path, info={"primary_ts": primary_ts, **(info or {})}
    )
    entry = {"primary_ts": primary_ts, "path": snap_path,
             "linked_files": meta["linked_files"], **(info or {})}
    index["syncpoints"][key] = entry
    _atomic_write_json(index_path, index)
    return entry
