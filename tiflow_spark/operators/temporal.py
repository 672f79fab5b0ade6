"""Generic temporal joins: as-of and range — operators Spark lacks natively.

The engine already uses a special-cased as-of lookup for schema versions
(sources/schema_registry.py); these are the *generic* forms a changefeed
consumer or feature pipeline needs (latest state at a timestamp; events
within a time window of each other).

Scale shapes (the whole point — neither is expressible as a naive join
without an O(n·m) range explosion):

- ``asof_join``: union-tag both sides, ONE hash shuffle on the key, sort
  within partitions by (ts, tag), then a running `last(..., ignorenulls)`
  window — each left row picks up the most recent right row's values.
  Cost: one exchange + one sort, identical to any keyed window; never a
  range join. (The reference's analog is the schema-snapshot binary
  search, cdc/entry/schema_storage.go:122-152, done here for arbitrary
  data.)
- ``range_join``: bucket timestamps by the window width W; a pair within
  W is at most one bucket apart, so exploding ONE side into its three
  adjacent buckets turns the range predicate into an equi-join on
  (key, bucket) + a cheap exact filter. Each qualifying pair meets
  exactly once (the exploded row whose bucket equals the other side's).
  Cost: 3× replication of the smaller side instead of a per-key
  cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, the latest right row with
    right_ts <= left_ts (or < when ``strict``) per `on` key.

    Right-side `value_cols` come back prefixed ``r_``; unmatched left rows
    keep them NULL (left-outer semantics). Right side should be unique per
    (key, ts) — ties there are nondeterministic, dedupe first (max_by).
    """
    # at equal ts the right row must sort before the left row to be visible
    # (inclusive), after it to be hidden (strict)
    l_tag, r_tag = (0, 1) if strict else (1, 0)
    lcols = left.columns
    l = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_tag", F.lit(l_tag)
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(r_tag).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        u = u.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    return u.filter(F.col("_tag") == F.lit(l_tag)).select(
        *lcols, *[F.col(f"_r_{c}").alias(f"r_{c}") for c in value_cols]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window: int,
) -> DataFrame:
    """All (left, right) pairs sharing the `on` key with
    |left_ts - right_ts| <= window (timestamps as integers, e.g. epoch µs).

    Output: every left column + right columns prefixed ``r_``.
    """
    bucket = (F.col(left_ts) / F.lit(window)).cast("long")
    l = left.withColumn(
        "_bucket", F.explode(F.array(bucket - 1, bucket, bucket + 1))
    )
    r = right.select(
        *[F.col(c).alias(f"_k_{c}") for c in on],
        (F.col(right_ts) / F.lit(window)).cast("long").alias("_rbucket"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in on],
    )
    cond = [F.col(c) == F.col(f"_k_{c}") for c in on] + [
        F.col("_bucket") == F.col("_rbucket"),
        F.abs(F.col(left_ts) - F.col(f"r_{right_ts}")) <= F.lit(window),
    ]
    joined = l.join(r, cond)
    return joined.drop("_bucket", "_rbucket", *[f"_k_{c}" for c in on])
