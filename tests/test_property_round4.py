"""Property-based tests for round-4 operators: for ANY input the
distributed implementation must agree with a direct Python fold.

- txn flush packing (operators/txn.py) vs a per-txn greedy packer
- sequence packing (llm/packing.py) vs a sequential prefix-sum walk
- merge-on-read interleavings (sinks/bucketed.py): any split of a change
  sequence into rewrite/delta batches with compactions sprinkled anywhere
  must converge to the same final state.

One hypothesis example = one whole batch (examples capped: Spark jobs are
the cost driver, not case count).
"""

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------------------- txn packing

txn_events = st.lists(
    st.tuples(
        st.integers(0, 3),  # txn group
        st.integers(0, 500),  # ts jitter
    ),
    min_size=1,
    max_size=60,
)


@given(events=txn_events, max_rows=st.integers(1, 7))
@SLOW
def test_flush_packing_matches_greedy_fold(spark, events, max_rows):
    from tiflow_spark.operators.txn import assign_flush_batches

    rows = [
        ("s", "t", "U", 1000 * g + j, 1000 * g + j - 5, i, str(i))
        for i, (g, j) in enumerate(events)
    ]
    env = spark.createDataFrame(
        rows,
        "schema string, table string, op string, commit_ts long, "
        "start_ts long, seq long, key string",
    ).withColumn("txn", (F.col("commit_ts") / 1000).cast("long"))
    out = assign_flush_batches(env, ("schema", "txn"), max_rows, "none")
    got = {
        r.seq: (r.txn_id, r.flush_seq, r.txn_rows) for r in out.collect()
    }
    # python fold: sort each txn by (commit_ts, seq), chunk by max_rows
    txns: dict[str, list] = {}
    for i, (g, j) in enumerate(events):
        txns.setdefault(f"s/{g}", []).append((1000 * g + j, i))
    for tid, evs in txns.items():
        evs.sort()
        for pos, (_ts, seq) in enumerate(evs):
            assert got[seq] == (tid, pos // max_rows, len(evs))
    # every flush obeys the cap
    sizes = out.groupBy("txn_id", "flush_seq").count().collect()
    assert all(r["count"] <= max_rows for r in sizes)


# ---------------------------------------------------------- sequence packing

doc_sizes = st.lists(st.integers(1, 300), min_size=1, max_size=80)


@given(sizes=doc_sizes, budget=st.integers(50, 1000))
@SLOW
def test_packing_matches_sequential_walk(spark, sizes, budget):
    from tiflow_spark.llm.packing import pack_documents

    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    packed = {
        r.doc_id: (r.start_offset, r.bin_id)
        for r in pack_documents(docs, budget, n_groups=8).collect()
    }
    order = sorted(range(len(sizes)), key=lambda i: (i % 8, i))
    pos = 0
    for i in order:
        assert packed[i] == (pos, pos // budget)
        pos += sizes[i]


# ------------------------------------------------- merge-on-read interleaving

mor_script = st.lists(
    st.tuples(
        st.sampled_from(["rewrite", "delta", "compact"]),
        st.lists(  # (key, op, ts) triples for a batch
            st.tuples(
                st.integers(0, 6),
                st.sampled_from(["I", "U", "D"]),
                st.integers(0, 50),
            ),
            min_size=1,
            max_size=8,
        ),
    ),
    min_size=1,
    max_size=5,
)


@given(script=mor_script)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_any_mor_interleaving_converges(spark, tmp_path_factory, script):
    from tiflow_spark.sinks.bucketed import (
        compact_deltas,
        merge_hash_bucketed,
        read_state,
    )

    tmp = tmp_path_factory.mktemp("mor")
    target = str(tmp / "t")
    schema = (
        "target_table string, key string, op string, commit_ts long, "
        "seq long, balance double"
    )
    all_events = []
    seq = 0
    for bid, (mode, batch) in enumerate(script):
        rows = []
        for k, op, ts in batch:
            rows.append(("t", str(k), op, ts, seq, float(seq)))
            all_events.append((str(k), op, ts, seq, float(seq)))
            seq += 1
        if mode == "compact":
            compact_deltas(spark, target)
        merge_hash_bucketed(
            spark.createDataFrame(rows, schema),
            target,
            n_buckets=4,
            batch_id=bid,
            mode="delta" if mode == "delta" else "rewrite",
        )
    compact_deltas(spark, target)
    got = {
        r.key: (r.op, r.commit_ts, r.seq)
        for r in read_state(spark, target).collect()
    }
    # python fold: winner per key by (commit_ts, seq, op-weight); D hidden
    w = {"D": 0, "U": 1, "I": 2}
    winners: dict[str, tuple] = {}
    for k, op, ts, s, _b in all_events:
        cand = (ts, s, w[op], op)
        if k not in winners or cand > winners[k]:
            winners[k] = cand
    expect = {
        k: (op, ts, s)
        for k, (ts, s, _w, op) in winners.items()
        if op != "D"
    }
    assert got == expect


# -------------------------------------------------------- temporal joins

temporal_rows = st.lists(
    st.tuples(
        st.integers(0, 2),     # key
        st.integers(0, 1000),  # ts
    ),
    min_size=1,
    max_size=50,
)


@given(lrows=temporal_rows, rrows=temporal_rows, strict=st.booleans())
@SLOW
def test_asof_join_matches_brute_force(spark, lrows, rrows, strict):
    from tiflow_spark.operators.temporal import asof_join

    # right side must be unique per (key, ts) — documented precondition
    rmap = {}
    for i, (k, ts) in enumerate(rrows):
        rmap[(k, ts)] = float(i)
    runique = [(k, ts, v) for (k, ts), v in rmap.items()]
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lrows)],
        "id LONG, k LONG, ts LONG",
    )
    right = spark.createDataFrame(runique, "k LONG, ts LONG, v DOUBLE")
    got = {
        r["id"]: (r["r_ts"], r["r_v"])
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["ts", "v"], strict=strict
        ).collect()
    }
    for i, (k, ts) in enumerate(lrows):
        cands = [
            (rts, v)
            for (rk, rts, v) in runique
            if rk == k and (rts < ts if strict else rts <= ts)
        ]
        want = max(cands, default=(None, None), key=lambda c: c[0] or 0) if cands else (None, None)
        assert got[i] == want, (i, k, ts, got[i], want)


@given(lrows=temporal_rows, rrows=temporal_rows, window=st.integers(1, 300))
@SLOW
def test_range_join_matches_brute_force(spark, lrows, rrows, window):
    from tiflow_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lrows)],
        "id LONG, k LONG, ts LONG",
    )
    right = spark.createDataFrame(
        [(j, k, ts) for j, (k, ts) in enumerate(rrows)],
        "rid LONG, k LONG, ts LONG",
    )
    got = sorted(
        (r["id"], r["r_rid"])
        for r in range_join(
            left, right.select("k", F.col("ts"), "rid"),
            ["k"], "ts", "ts", window,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (lk, lts) in enumerate(lrows)
        for j, (rk, rts) in enumerate(rrows)
        if lk == rk and abs(lts - rts) <= window
    )
    assert got == want
