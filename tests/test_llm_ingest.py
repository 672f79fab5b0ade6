"""Standing LLM-corpus ingest e2e (streaming/llm_ingest.py): quality gate +
incremental LSH dedup as a Structured Streaming changefeed over arriving
document files, with replay-idempotent batch commits and checkpoint
resume."""

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from tiflow_spark.envelope import load_table
from tiflow_spark.streaming.llm_ingest import (
    ingest_batch,
    init_ingest_state,
    read_corpus,
    run_corpus_ingest,
)

COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture()
def work_dir():
    d = tempfile.mkdtemp(prefix="tiflow_llm_ingest_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _clones(docs, id_offset, mod):
    return docs.filter(F.col("doc_id") % mod == 0).withColumn(
        "doc_id", F.col("doc_id") + id_offset
    )


def _drop_file(df, source_dir, name):
    """Materialize df as ONE parquet file inside the stream source dir."""
    tmp = tempfile.mkdtemp(prefix="tiflow_ingest_file_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(source_dir, exist_ok=True)
    shutil.move(os.path.join(tmp, part), os.path.join(source_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _gate(df):
    return df.filter(F.col("n_chars") >= 150)


def test_streaming_ingest_dedups_and_resumes(spark, sf_dir, work_dir):
    docs = load_table(spark, sf_dir, "documents").select(COLS)
    seed = docs.filter(F.col("doc_id") < 50)
    batch1 = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
    b1 = batch1.unionByName(_clones(seed, 10000, 7))  # clones of SEED docs
    batch2 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150))
    b2 = batch2.unionByName(_clones(batch1, 20000, 5))  # clones of batch 1

    src = f"{work_dir}/arrivals"
    _drop_file(b1, src, "file1.parquet")
    _drop_file(b2, src, "file2.parquet")

    state = f"{work_dir}/state"
    init_ingest_state(spark, state, seed=_gate(seed))
    run_corpus_ingest(
        spark, src, state, f"{work_dir}/ckpt", quality_gate=_gate
    )

    corpus = read_corpus(spark, state)
    kept = {r["doc_id"] for r in corpus.select("doc_id").collect()}

    # every planted clone of a surviving original is gone (exact text dup)
    gated_seed_ids = {r["doc_id"] for r in _gate(seed).collect()}
    clone1 = {
        r["doc_id"] + 10000
        for r in seed.filter(F.col("doc_id") % 7 == 0).collect()
        if r["doc_id"] in gated_seed_ids and r["n_chars"] >= 150
    }
    assert clone1 and not (clone1 & kept)
    # quality gate enforced on every batch
    assert corpus.filter(F.col("n_chars") < 150).count() == 0

    # the STRONG invariant: the curated corpus contains no near-dup pair
    # at the ingest threshold at all (independent full-corpus probe)
    from tiflow_spark.llm.dedup import minhash_lsh_pairs

    assert minhash_lsh_pairs(corpus, 16, 4, 0.5).count() == 0

    # stream == batch determinism: driving ingest_batch directly with the
    # same file splits produces the identical corpus
    state2 = f"{work_dir}/state2"
    init_ingest_state(spark, state2, seed=_gate(seed))
    ingest_batch(spark, b1, 0, state2, quality_gate=_gate)
    ingest_batch(spark, b2, 1, state2, quality_gate=_gate)
    corpus2 = read_corpus(spark, state2)
    assert corpus.exceptAll(corpus2).count() == 0
    assert corpus2.exceptAll(corpus).count() == 0

    # checkpoint resume: a file arriving AFTER the first drain is the only
    # thing the restarted query processes; re-ingested clones stay dropped
    batch3 = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 160))
    b3 = batch3.unionByName(_clones(batch2, 30000, 5))
    _drop_file(b3, src, "file3.parquet")
    before_batches = set(os.listdir(f"{state}/corpus"))
    run_corpus_ingest(
        spark, src, state, f"{work_dir}/ckpt", quality_gate=_gate
    )
    after_batches = set(os.listdir(f"{state}/corpus"))
    assert len(after_batches - before_batches) == 1  # ONLY file3's batch
    corpus3 = read_corpus(spark, state)
    new_ids = {r["doc_id"] for r in corpus3.select("doc_id").collect()} - kept
    gated_b3 = {r["doc_id"] for r in _gate(b3).collect()}
    assert new_ids <= gated_b3
    assert not {i for i in new_ids if i >= 30000 and (i - 30000) in kept}
    assert minhash_lsh_pairs(corpus3, 16, 4, 0.5).count() == 0


def test_ingest_batch_rerun_is_idempotent(spark, sf_dir, work_dir):
    """foreachBatch replay semantics: re-running the SAME batch id must
    replace its outputs, not double-append."""
    docs = load_table(spark, sf_dir, "documents").select(COLS)
    state = f"{work_dir}/state"
    init_ingest_state(spark, state, seed=docs.filter(F.col("doc_id") < 20))
    b = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40))
    ingest_batch(spark, b, 0, state)
    once = sorted(tuple(r) for r in read_corpus(spark, state).collect())
    ingest_batch(spark, b, 0, state)  # crash-replay of the same micro-batch
    twice = sorted(tuple(r) for r in read_corpus(spark, state).collect())
    assert once == twice


def test_corpus_pair_free_under_any_batch_split(spark, sf_dir, work_dir):
    """The load-bearing invariant: however the SAME arrivals are split
    into micro-batches, the curated corpus never contains a near-dup pair
    (kept docs are always indexed before later arrivals are judged, and
    in-batch survivors are checked pairwise). The KEPT SET itself may
    legitimately differ between splits in dup-chain cases — pair-freedom
    is what the funnel guarantees."""
    import random

    from tiflow_spark.llm.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents").select(COLS)
    arrivals = (
        docs.filter(F.col("doc_id") < 40)
        .unionByName(_clones(docs.filter(F.col("doc_id") < 40), 10000, 3))
        .collect()
    )
    arrivals.sort(key=lambda r: r["doc_id"])
    all_df = spark.createDataFrame(arrivals, docs.schema)
    global_pairs = [
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(all_df, 16, 4, 0.5).collect()
    ]
    paired = {i for p in global_pairs for i in p}
    never_dup = {r["doc_id"] for r in arrivals} - paired

    def staged_keep(parts_rows):
        """The oracle construction of llm_ingest.ingest_funnel_sql as
        plain python: per batch, a doc loses every pairing with an
        already-kept (indexed) doc regardless of orientation, and
        in-batch pairs drop id_b — computed from the GLOBAL verified
        pair set, which is legal because banding is per-doc
        deterministic and dropped docs are never indexed."""
        kept: set = set()
        for rows in parts_rows:
            ids = {r["doc_id"] for r in rows}
            drop = set()
            for a, b in global_pairs:
                if a in kept and b in ids:
                    drop.add(b)
                elif b in kept and a in ids:
                    drop.add(a)
                elif a in ids and b in ids:
                    drop.add(b)
            kept |= ids - drop
        return kept
    rng = random.Random(11)
    for trial in range(4):
        n_cuts = rng.randint(0, 3)
        cuts = sorted(rng.sample(range(1, len(arrivals)), n_cuts))
        parts, prev = [], 0
        for c in cuts + [len(arrivals)]:
            parts.append(arrivals[prev:c])
            prev = c
        state = f"{work_dir}/split-{trial}"
        init_ingest_state(spark, state)
        for bid, rows in enumerate(p for p in parts if p):
            batch = spark.createDataFrame(rows, docs.schema)
            ingest_batch(spark, batch, bid, state)
        corpus = read_corpus(spark, state)
        assert minhash_lsh_pairs(corpus, 16, 4, 0.5).count() == 0, (
            f"trial {trial} cuts {cuts}"
        )
        # and every doc with NO near-dup at all is kept under every split
        kept = {r["doc_id"] for r in corpus.select("doc_id").collect()}
        assert never_dup <= kept, f"trial {trial} lost {never_dup - kept}"
        # the REAL ingest keep-set equals the staged-formula keep-set the
        # DuckDB oracle (ingest_funnel_sql) is built on — validates the
        # oracle derivation for arbitrary splits, not just doc_id%3
        want = staged_keep(p for p in parts if p)
        assert kept == want, f"trial {trial}: {kept ^ want}"


def test_first_arrival_wins_even_with_smaller_later_ids(spark, sf_dir, work_dir):
    """First-arrival-wins must not depend on id ordering: a LATER arrival
    whose doc_id is SMALLER than its indexed near-dup is still the one
    dropped (committed docs are never retroactively dropped)."""
    docs = load_table(spark, sf_dir, "documents").select(COLS)
    state = f"{work_dir}/state"
    # seed with the HIGH-id docs
    seed = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))
    init_ingest_state(spark, state, seed=seed)
    # later batch: clones of seed docs carrying SMALLER ids (negative offset)
    late_clones = seed.withColumn("doc_id", F.col("doc_id") - 100)
    fresh = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 205))
    ingest_batch(spark, late_clones.unionByName(fresh), 0, state)
    kept = {r["doc_id"] for r in read_corpus(spark, state).collect()}
    seed_ids = {r["doc_id"] for r in seed.collect()}
    assert seed_ids <= kept  # committed docs untouched
    assert not ({i - 100 for i in seed_ids} & kept)  # every late clone lost


def test_compact_ingest_state_preserves_corpus_and_decisions(
    spark, sf_dir, work_dir
):
    """Dir-folding compaction changes NOTHING visible: corpus identical,
    and a post-compaction ingest batch makes the same dedup decisions an
    uncompacted state would."""
    from tiflow_spark.streaming.llm_ingest import (
        compact_ingest_state,
        ingest_batch,
        init_ingest_state,
        read_corpus,
    )

    docs = load_table(spark, sf_dir, "documents").select(COLS)
    b = [
        docs.filter(
            (F.col("doc_id") >= k * 30) & (F.col("doc_id") < (k + 1) * 30)
        )
        for k in range(3)
    ]
    nxt = docs.filter((F.col("doc_id") >= 90) & (F.col("doc_id") < 110))
    nxt = nxt.unionByName(_clones(b[0], 40000, 4))  # dups vs folded batches

    state_a, state_b = f"{work_dir}/a", f"{work_dir}/b"
    for st in (state_a, state_b):
        init_ingest_state(spark, st)
        for k in range(3):
            ingest_batch(spark, b[k], k, st)
    before = sorted(tuple(r) for r in read_corpus(spark, state_a).collect())
    folded = compact_ingest_state(spark, state_a, keep_last=1)
    assert folded > 0
    after = sorted(tuple(r) for r in read_corpus(spark, state_a).collect())
    assert before == after
    # newest batch dir stays standalone (replay-exclusion contract)
    assert os.path.isdir(f"{state_a}/corpus/batch-2")
    assert not os.path.isdir(f"{state_a}/corpus/batch-0")

    ingest_batch(spark, nxt, 3, state_a)
    ingest_batch(spark, nxt, 3, state_b)
    got = sorted(tuple(r) for r in read_corpus(spark, state_a).collect())
    want = sorted(tuple(r) for r in read_corpus(spark, state_b).collect())
    assert got == want


def test_compact_ingest_state_crash_windows(spark, sf_dir, work_dir):
    """The two manifest-protocol crash states read correctly: a manifest
    whose target dir is missing is void (sources stay live); a committed
    target whose sources were not yet deleted excludes them (no
    double-count); re-running compaction finishes the cleanup."""
    import json

    from tiflow_spark.streaming.llm_ingest import (
        compact_ingest_state,
        ingest_batch,
        init_ingest_state,
        read_corpus,
    )

    docs = load_table(spark, sf_dir, "documents").select(COLS)
    state = f"{work_dir}/state"
    init_ingest_state(spark, state)
    for k in range(3):
        ingest_batch(
            spark,
            docs.filter(
                (F.col("doc_id") >= k * 30)
                & (F.col("doc_id") < (k + 1) * 30)
            ),
            k,
            state,
        )
    baseline = sorted(
        tuple(r) for r in read_corpus(spark, state).collect()
    )

    # crash between manifest write and rename: void manifest, sources live
    with open(f"{state}/corpus/_compacted-000099.json", "w") as f:
        json.dump(
            {"target": "batch-compacted-000099",
             "sources": ["batch-0", "batch-1"]}, f,
        )
    got = sorted(tuple(r) for r in read_corpus(spark, state).collect())
    assert got == baseline
    os.remove(f"{state}/corpus/_compacted-000099.json")

    # crash between rename and source deletion: snapshot sources, compact,
    # restore the (already-consumed) sources — manifest must exclude them
    pre = f"{work_dir}/pre"
    shutil.copytree(state, pre)
    compact_ingest_state(spark, state, keep_last=1)
    for sub in ("corpus", "index_sh", "index_banded"):
        for d in os.listdir(f"{pre}/{sub}"):
            if d.startswith("batch-") and not os.path.isdir(
                f"{state}/{sub}/{d}"
            ):
                shutil.copytree(f"{pre}/{sub}/{d}", f"{state}/{sub}/{d}")
    got = sorted(tuple(r) for r in read_corpus(spark, state).collect())
    assert got == baseline
    # a re-run finishes the cleanup without changing the corpus
    compact_ingest_state(spark, state, keep_last=1)
    got = sorted(tuple(r) for r in read_corpus(spark, state).collect())
    assert got == baseline


def test_streaming_ingest_with_in_stream_compaction(spark, sf_dir, work_dir):
    """compact_every folds state dirs inside the stream without changing
    the curated corpus, and the resumed stream keeps working against the
    compacted state."""
    from tiflow_spark.streaming.llm_ingest import run_corpus_ingest

    docs = load_table(spark, sf_dir, "documents").select(COLS)
    b1 = docs.filter(F.col("doc_id") < 40)
    b2 = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 80))
    b2 = b2.unionByName(_clones(b1, 10000, 3))

    plain, compacted = f"{work_dir}/plain", f"{work_dir}/compacted"
    for st, ck, kw in (
        (plain, f"{work_dir}/ck_p", {}),
        (compacted, f"{work_dir}/ck_c", {"compact_every": 1}),
    ):
        src = f"{work_dir}/src_{os.path.basename(st)}"
        _drop_file(b1, src, "f1.parquet")
        _drop_file(b2, src, "f2.parquet")
        init_ingest_state(spark, st)
        run_corpus_ingest(spark, src, st, ck, **kw)

    got = sorted(tuple(r) for r in read_corpus(spark, compacted).collect())
    want = sorted(tuple(r) for r in read_corpus(spark, plain).collect())
    assert got == want and got

    # resume against the compacted state: a third file still dedups
    # against everything already committed (and with three committed
    # batches the in-stream fold has >=2 sources, so it actually fires)
    b3 = docs.filter((F.col("doc_id") >= 80) & (F.col("doc_id") < 90))
    b3 = b3.unionByName(_clones(b2, 20000, 5))
    for st, ck in ((plain, f"{work_dir}/ck_p"), (compacted, f"{work_dir}/ck_c")):
        src = f"{work_dir}/src_{os.path.basename(st)}"
        _drop_file(b3, src, "f3.parquet")
        run_corpus_ingest(spark, src, st, ck,
                          **({"compact_every": 1} if st == compacted else {}))
    got = sorted(tuple(r) for r in read_corpus(spark, compacted).collect())
    want = sorted(tuple(r) for r in read_corpus(spark, plain).collect())
    assert got == want
    corp = [d for d in os.listdir(f"{compacted}/corpus")
            if d.startswith("batch-")]
    assert any(d.startswith("batch-compacted-") for d in corp)
