"""Custom stateful streaming operator: cross-batch per-key last-state.

The reference keeps per-key state across its pipeline in the pebble sorter +
compactor buffer (SURVEY.md §2.4/§2.5). Inside one micro-batch our compactor
window covers it; across micro-batches this operator holds the winning
(commit_ts, seq, image) per key in the state store via
applyInPandasWithState — the escape hatch for semantics Spark's built-in
operators can't express (brief: custom operators rule (b)).

Emits one row per key per batch in which that key changed (update-mode
changelog of the applied table).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "op string, commit_ts long, seq long, id long, balance double, note string"
)
OUTPUT_SCHEMA = (
    "target_table string, key string, op string, commit_ts long, seq long, "
    "id long, balance double, note string"
)

_OP_WEIGHT = {"D": 0, "U": 1, "I": 2}


def _last_state_fn(
    key: tuple[str, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold the batch's events for one (target_table, key) into stored state."""
    if state.exists:
        cur = dict(
            zip(
                ("op", "commit_ts", "seq", "id", "balance", "note"),
                state.get,
            )
        )
    else:
        cur = None
    changed = False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # vectorized winner: one lexicographic sort per Arrow batch instead
        # of a Python loop per row
        top = pdf.assign(_opw=pdf["op"].map(_OP_WEIGHT)).sort_values(
            ["commit_ts", "seq", "_opw"], kind="mergesort"
        ).iloc[-1]
        cand = {
            "op": top["op"],
            "commit_ts": int(top["commit_ts"]),
            "seq": int(top["seq"]),
            "id": None if pd.isna(top["id"]) else int(top["id"]),
            "balance": None if pd.isna(top["balance"]) else float(top["balance"]),
            "note": top["note"],
        }
        if cur is None or (
            (cand["commit_ts"], cand["seq"], _OP_WEIGHT[cand["op"]])
            > (cur["commit_ts"], cur["seq"], _OP_WEIGHT[cur["op"]])
        ):
            cur = cand
            changed = True
    if changed and cur is not None:
        state.update(
            (
                cur["op"],
                cur["commit_ts"],
                cur["seq"],
                cur["id"],
                cur["balance"],
                cur["note"],
            )
        )
        yield pd.DataFrame(
            [
                {
                    "target_table": key[0],
                    "key": key[1],
                    **cur,
                }
            ]
        )


def stateful_last_state(transformed: DataFrame) -> DataFrame:
    """Streaming changelog of net per-key state across ALL micro-batches.

    Input: the transformed envelope stream (needs target_table, key, op,
    commit_ts, seq, after.*). State store scales horizontally — state is
    partitioned by the group key, exactly like the reference shards its
    sorter by table-span."""
    import pyspark.sql.functions as F

    flat = transformed.select(
        "target_table",
        "key",
        "op",
        "commit_ts",
        "seq",
        F.col("after.id").alias("id"),
        F.col("after.balance").alias("balance"),
        F.col("after.note").alias("note"),
    )
    return flat.groupBy("target_table", "key").applyInPandasWithState(
        _last_state_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        # append mode: each emitted row is an immutable changelog record
        # (file sinks only accept append; semantics are identical for us
        # since we emit one delta row per key per batch)
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
