"""The ChangeEvent envelope — canonical IR of the engine.

Mirror of the reference's RowChangedEvent (cdc/model/sink.go:347-391): one row
per DML change with op I/U/D, MVCC timestamps (commit_ts/start_ts), source
(schema, table), a pre-image (`before`) and post-image (`after`) struct, and a
deterministic intra-txn sequence. DDL events travel on a side channel.

For tests/oracles we synthesize a deterministic change stream from the driver's
``events`` table (TESTDATA.md): every generated field is a pure SQL function of
the input row, so the identical stream is constructible in DuckDB — see
:data:`ENVELOPE_SQL_DUCKDB`. The mapping:

- op: signup → I, error → D, otherwise U   (event taxonomy like
  pkg/binlog-filter/filter.go:36-96's insert/update/delete classes)
- sharded source: schema = shard_{user_id % 2}, table = events_{user_id % 4}
  (models DM's N:1 shard-merge topology, FIXTURES.md F4)
- commit_ts = unix_micros(ts); start_ts = commit_ts - (event_id % 997)
- seq = event_id (deterministic intra-txn order, cdc/model/mounter.go:161-177)
- identity change: U events with event_id % 13 == 0 move the row to key
  user_id + 100 (exercises update-split, pkg/sqlmodel/reduce.go:79-97)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# testdata timestamps are parquet TIMESTAMP(NANOS) — Spark only reads those
# via nanosAsLong; we convert back to TimestampType (µs, truncating like
# DuckDB does) so query logic stays timestamp-native.
_NS_TS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def epoch_us(col) -> F.Column:
    """Micros-since-epoch from a TIMESTAMP *or* TIMESTAMP_NTZ column.

    The driver's parquet stores naive ``timestamp[us]`` values, which Spark 4
    reads as TIMESTAMP_NTZ — a type ``unix_micros`` rejects.  With the session
    time zone pinned to UTC the NTZ→LTZ cast is value-preserving, so this
    matches DuckDB's ``epoch_us(ts)`` on either type; on an already-LTZ
    column the cast is a no-op Catalyst removes.  Rather than trusting every
    entry point to have gone through load_table/get_spark first, we pin the
    active session's time zone here — the engine is UTC-everywhere by
    contract, so this is idempotent for engine callers and corrective for
    bare sessions.
    """
    spark = SparkSession.getActiveSession()
    if spark is not None:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # epoch/date math must be tz-stable regardless of the caller's session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Spark 4.1 reads parquet TIMESTAMP(NANOS) natively as timestamp_ntz;
    # the bigint branch below covers versions where nanosAsLong applies.
    # Predicates on these columns must use timestamp_ntz literals — an LTZ
    # literal wraps the column in a cast and kills parquet pushdown.
    for c in _NS_TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def events_to_changes(events: DataFrame) -> DataFrame:
    """events table → canonical ChangeEvent envelope DataFrame.

    Columns: op, schema, table, commit_ts, start_ts, seq, key,
    before STRUCT<id, balance, note>, after STRUCT<id, balance, note>.
    All expressions are built-ins → single projection, no shuffle, codegen'd.
    """
    e = events
    op = (
        F.when(e.event_type == "signup", "I")
        .when(e.event_type == "error", "D")
        .otherwise("U")
    )
    commit_ts = epoch_us(e.ts)
    new_id = F.when(
        (op == "U") & (e.event_id % 13 == 0), e.user_id + 100
    ).otherwise(e.user_id)
    before = F.struct(
        e.user_id.alias("id"),
        F.round(e.value - 1.0, 2).alias("balance"),
        e.props.alias("note"),
    )
    after = F.struct(
        new_id.alias("id"),
        e.value.alias("balance"),
        e.props.alias("note"),
    )
    return e.select(
        op.alias("op"),
        F.concat(F.lit("shard_"), (e.user_id % 2).cast("string")).alias("schema"),
        F.concat(F.lit("events_"), (e.user_id % 4).cast("string")).alias("table"),
        commit_ts.alias("commit_ts"),
        (commit_ts - e.event_id % 997).alias("start_ts"),
        e.event_id.alias("seq"),
        e.user_id.cast("string").alias("key"),
        F.when(op != "I", before).alias("before"),
        F.when(op != "D", after).alias("after"),
    )


# DuckDB CTE computing the SAME rows (flattened: before_/after_ prefixes since
# the oracle compare is column-name based). Keep in lockstep with
# events_to_changes(); tests assert equality via the correctness driver.
ENVELOPE_SQL_DUCKDB = """
SELECT
  CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op,
  'shard_' || CAST(user_id % 2 AS VARCHAR) AS "schema",
  'events_' || CAST(user_id % 4 AS VARCHAR) AS "table",
  epoch_us(ts) AS commit_ts,
  epoch_us(ts) - (event_id % 997) AS start_ts,
  event_id AS seq,
  CAST(user_id AS VARCHAR) AS key,
  CASE WHEN event_type <> 'signup' THEN user_id END AS before_id,
  CASE WHEN event_type <> 'signup' THEN round(value - 1.0, 2) END AS before_balance,
  CASE WHEN event_type <> 'signup' THEN props END AS before_note,
  CASE WHEN event_type <> 'error' THEN
    CASE WHEN event_type NOT IN ('signup','error') AND event_id % 13 = 0
         THEN user_id + 100 ELSE user_id END END AS after_id,
  CASE WHEN event_type <> 'error' THEN value END AS after_balance,
  CASE WHEN event_type <> 'error' THEN props END AS after_note
FROM events
"""


def flatten(env: DataFrame) -> DataFrame:
    """Envelope with before/after structs flattened to prefixed columns —
    the layout oracle comparisons use."""
    return env.select(
        "op",
        "schema",
        "table",
        "commit_ts",
        "start_ts",
        "seq",
        "key",
        F.col("before.id").alias("before_id"),
        F.col("before.balance").alias("before_balance"),
        F.col("before.note").alias("before_note"),
        F.col("after.id").alias("after_id"),
        F.col("after.balance").alias("after_balance"),
        F.col("after.note").alias("after_note"),
    )
