"""Sequence-packing correctness: the two-phase distributed prefix sum must
equal the single global window, and bins must chunk the concatenated
token stream exactly."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from tiflow_spark.llm.packing import pack_documents, packing_stats


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        # deterministic, skewed sizes: 1..400 tokens
        ((F.col("id") * 37 % 400) + 1).alias("n_tokens"),
    )


def test_two_phase_prefix_sum_equals_global_window(spark):
    docs = _docs(spark)
    packed = pack_documents(docs, token_budget=1000, n_groups=16)
    w = Window.orderBy((F.col("doc_id") % 16), F.col("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    expected = docs.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn(
        "bin_id", (F.col("start_offset") / 1000).cast("long")
    )
    got = {r.doc_id: (r.start_offset, r.bin_id) for r in packed.collect()}
    want = {r.doc_id: (r.start_offset, r.bin_id) for r in expected.collect()}
    assert got == want


def test_offsets_form_contiguous_token_stream(spark):
    packed = pack_documents(_docs(spark), token_budget=1000, n_groups=16)
    rows = sorted(packed.collect(), key=lambda r: r.start_offset)
    pos = 0
    for r in rows:
        assert r.start_offset == pos  # no gaps, no overlaps
        pos += r.n_tokens
    assert rows[-1].start_offset + rows[-1].n_tokens == pos


def test_bins_are_budget_sized(spark):
    budget = 1000
    packed = pack_documents(_docs(spark), token_budget=budget, n_groups=16)
    stats = packing_stats(packed, budget).collect()
    last_bin = max(r.bin_id for r in stats)
    for r in stats:
        # every doc starts inside its bin; tokens-starting-in-bin can
        # exceed budget only via the straddling last doc
        assert r.bin_id <= last_bin
        if r.bin_id < last_bin:
            assert r.tokens >= budget - 400  # 400 = max doc size
    total = sum(r.tokens for r in stats)
    assert total == packed.agg(F.sum("n_tokens")).first()[0]


def test_chunk_documents_reconstructs_and_overlaps(spark):
    from tiflow_spark.llm.packing import chunk_documents

    text = " ".join(f"w{i}" for i in range(25))
    docs = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id LONG, text STRING")
    out = chunk_documents(docs, max_tokens=10, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 25 tokens, stride 8 -> ceil(23/8)=3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert len(c1) == 3 and all(r["n_chunks"] == 3 for r in c1)
    assert c1[0]["chunk_text"].split()[:2] == ["w0", "w1"]
    # overlap: chunk k starts 8 tokens after chunk k-1
    assert c1[1]["chunk_text"].split()[0] == "w8"
    assert c1[2]["chunk_text"].split()[0] == "w16"
    # every chunk fits the window; union of chunks covers all tokens
    assert all(r["chunk_tokens"] <= 10 for r in c1)
    covered = set()
    for r in c1:
        covered.update(r["chunk_text"].split())
    assert covered == {f"w{i}" for i in range(25)}
    # short doc -> single chunk, intact
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "short doc"


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from tiflow_spark.llm.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)
