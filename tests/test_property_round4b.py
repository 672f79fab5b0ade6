"""Property tests for the round-4 sampling/export/dedup additions: the
distributed operators must agree with a direct Python fold on ANY input.

- temperature_resample quotas vs an exact integer reference
- epoch_shuffle: partition-function invariants (total, contiguity,
  disjointness) for random corpus sizes / shard counts
- hot-bucket star-linking: pair graph connectivity equals the uncapped
  graph's connectivity on random duplicate-cluster corpora
"""

import math

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    sizes=st.lists(st.integers(1, 60), min_size=1, max_size=5),
    n_target=st.integers(1, 120),
)
def test_temperature_quota_matches_reference(spark, sizes, n_target):
    from tiflow_spark.llm.sampling import temperature_resample

    rows = [
        (d * 1000 + i, f"dom{d}")
        for d, n in enumerate(sizes)
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, stratum STRING")
    out = temperature_resample(docs, "stratum", n_target).collect()
    # exact reference: integer sqrt-weights, floor division
    w = {f"dom{d}": int(math.floor(math.sqrt(n) * 1000)) for d, n in enumerate(sizes)}
    tw = sum(w.values())
    expect_quota = {k: (n_target * v) // tw for k, v in w.items()}
    got_by_dom = {}
    for r in out:
        got_by_dom.setdefault(r["stratum"], []).append(r)
        assert r["quota"] == expect_quota[r["stratum"]]
    for d, n in enumerate(sizes):
        k = f"dom{d}"
        assert len(got_by_dom.get(k, [])) == min(expect_quota[k], n)


@SLOW
@given(
    n_docs=st.integers(1, 200),
    n_shards=st.integers(1, 16),
    epoch=st.integers(0, 5),
)
def test_epoch_shuffle_is_partition_function(spark, n_docs, n_shards, epoch):
    from tiflow_spark.llm.sampling import epoch_shuffle

    docs = spark.createDataFrame(
        [(i,) for i in range(n_docs)], "doc_id LONG"
    )
    out = epoch_shuffle(docs, epoch, n_shards).collect()
    assert len(out) == n_docs
    assert len({r["doc_id"] for r in out}) == n_docs
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < n_shards
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def _components(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return frozenset(
        frozenset(n for n in nodes if find(n) == r)
        for r in {find(n) for n in nodes}
    )


@SLOW
@given(
    clusters=st.lists(st.integers(1, 12), min_size=1, max_size=4),
    cap=st.integers(2, 6),
)
def test_star_linking_preserves_components(spark, clusters, cap):
    """For corpora made of identical-text clusters, the capped pair graph
    must produce EXACTLY the same connected components as the uncapped
    one (identical docs verify at jaccard 1.0, so star edges never fail
    verification)."""
    from tiflow_spark.llm.dedup import minhash_lsh_pairs

    rows = []
    for c, n in enumerate(clusters):
        text = f"cluster {c} text payload shared by all members verbatim"
        for i in range(n):
            rows.append((c * 100 + i, text))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    nodes = [r[0] for r in rows]

    full = [
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.9).collect()
    ]
    capped = [
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.9, max_bucket=cap).collect()
    ]
    assert _components(capped, nodes) == _components(full, nodes)
    # and the capped edge count is linear in over-cap cluster sizes
    for c, n in enumerate(clusters):
        members = [c * 100 + i for i in range(n)]
        edges_in = [p for p in capped if p[0] in members or p[1] in members]
        if n > cap:
            assert len(edges_in) == n - 1


# ---------------------------------------- snapshot immutability property

ops_strategy = st.lists(
    st.tuples(
        st.sampled_from(["rewrite", "delta", "compact", "purge"]),
        st.integers(0, 5),   # key
        st.integers(0, 1),   # op: 0=upsert, 1=delete
    ),
    min_size=1,
    max_size=8,
)


@SLOW
@given(ops=ops_strategy, snap_at=st.integers(0, 8))
def test_snapshot_immutable_under_random_interleavings(
    spark, tmp_path_factory, ops, snap_at
):
    """Take a snapshot after the i-th operation of a random
    merge/delta/compact/purge sequence: the snapshot must forever equal
    the state at that instant, no matter what runs afterwards."""
    from tiflow_spark.sinks.bucketed import (
        compact_deltas,
        merge_hash_bucketed,
        purge_tombstones,
        read_state,
        snapshot_target,
    )

    work = tmp_path_factory.mktemp("snapprop")
    target = str(work / "t")

    def state():
        return {
            (r["target_table"], r["key"]): r["balance"]
            for r in read_state(spark, target).collect()
        }

    merge_hash_bucketed(
        spark.createDataFrame(
            [("I", "a", "0", 0, 0, 0.0)],
            "op STRING, target_table STRING, key STRING, commit_ts LONG, "
            "seq LONG, balance DOUBLE",
        ),
        target, n_buckets=2, batch_id=0,
    )
    snap = None
    frozen = None
    snap_at = min(snap_at, len(ops))
    if snap_at == 0:
        snap = str(work / "snap")
        snapshot_target(target, snap)
        frozen = state()
    for i, (kind, key, is_del) in enumerate(ops, start=1):
        ts = 10 * i
        if kind in ("rewrite", "delta"):
            chg = spark.createDataFrame(
                [(
                    "D" if is_del else "U",
                    "a", str(key), ts, i, float(ts),
                )],
                "op STRING, target_table STRING, key STRING, commit_ts LONG, "
                "seq LONG, balance DOUBLE",
            )
            merge_hash_bucketed(
                chg, target, n_buckets=2, batch_id=i,
                mode="delta" if kind == "delta" else "rewrite",
            )
        elif kind == "compact":
            compact_deltas(spark, target)
        else:
            purge_tombstones(spark, target, safepoint_ts=10 * i)
        if i == snap_at:
            snap = str(work / "snap")
            snapshot_target(target, snap)
            frozen = state()
    if snap is not None:
        assert {
            (r["target_table"], r["key"]): r["balance"]
            for r in read_state(spark, snap).collect()
        } == frozen
