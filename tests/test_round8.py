"""Round-8 features: checkpointed row-diff outcomes (a fully
checkpointed sync_diff assembles its report with zero table scans) and
the consumer-replay protocol completions."""

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from tiflow_spark.envelope import load_table

CUST_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


@pytest.fixture()
def ckpt_dir():
    d = tempfile.mkdtemp(prefix="tiflow_syncdiff_ckpt8_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _corrupt(cust):
    drift = cust.filter(F.col("c_custkey") % 101 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 97 == 0, F.col("c_acctbal") + 1.0
        ).otherwise(F.col("c_acctbal")),
    )
    extra = cust.filter(F.col("c_custkey") % 103 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + 1000000
    )
    return drift.unionByName(extra)


def test_row_diff_outcomes_are_checkpointed(spark, sf_dir, ckpt_dir):
    """After the chunk phase completes, the first resume_row_diff call
    commits its rows to the checkpoint; later calls read ONLY the
    checkpoint — proven by passing empty (schema-only) table frames and
    still getting the full diff back."""
    from tiflow_spark.validation.syncdiff import (
        resumable_chunk_compare,
        resume_row_diff,
        targeted_row_diff,
    )

    src = load_table(spark, sf_dir, "customer")
    dst = _corrupt(src)
    resumable_chunk_compare(
        spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir
    )
    first = resume_row_diff(
        spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir
    )
    assert os.path.isdir(os.path.join(ckpt_dir, "rowdiff"))
    # zero-rescan: empty frames, full answer
    again = resume_row_diff(
        spark, src.limit(0), dst.limit(0), "c_custkey", CUST_COLS, 64,
        ckpt_dir,
    )
    want = targeted_row_diff(src, dst, "c_custkey", CUST_COLS, 64)
    for got in (first, again):
        assert got.count() == want.count() > 0
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
    # the cached diff is pinned to its geometry: asking with different
    # cols (or pk/width) must raise, never hand back the stale diff
    with pytest.raises(ValueError, match="geometry mismatch"):
        resume_row_diff(
            spark, src, dst, "c_custkey", CUST_COLS[:2], 64, ckpt_dir
        )
    with pytest.raises(ValueError, match="geometry mismatch"):
        resume_row_diff(
            spark, src, dst, "c_custkey", CUST_COLS, 128, ckpt_dir
        )


def test_report_from_full_checkpoint_touches_no_table_data(
    spark, sf_dir, ckpt_dir
):
    """VERDICT r7 #7's done-criterion: with all chunk batches AND the
    row-diff outcomes checkpointed, summary_report_from_checkpoint must
    be assembled from checkpoint state alone — asserted by handing it
    empty (schema-only) table frames and requiring the report to equal
    the never-interrupted direct one."""
    from tiflow_spark.validation.syncdiff import (
        resumable_chunk_compare,
        resume_row_diff,
        summary_report,
        summary_report_from_checkpoint,
    )

    src = load_table(spark, sf_dir, "customer")
    dst = _corrupt(src)
    resumable_chunk_compare(
        spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir
    )
    resume_row_diff(spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir)
    got = summary_report_from_checkpoint(
        spark, src.limit(0), dst.limit(0), "c_custkey", CUST_COLS, 64,
        ckpt_dir, schema="s", table="customer",
    ).collect()[0]
    want = summary_report(
        src, dst, "c_custkey", CUST_COLS, 64, schema="s", table="customer"
    ).collect()[0]
    assert got.asDict() == want.asDict()


def test_partial_checkpoint_does_not_freeze_row_diff(spark, sf_dir, ckpt_dir):
    """A row-diff call against a PARTIAL chunk checkpoint must not
    persist its (partial) mismatch set: the rowdiff dir appears only
    once the chunk phase is complete, and the final outcome equals the
    direct targeted diff."""
    from tiflow_spark.validation.syncdiff import (
        resumable_chunk_compare,
        resume_row_diff,
        targeted_row_diff,
    )

    src = load_table(spark, sf_dir, "customer")
    dst = _corrupt(src)
    with pytest.raises(RuntimeError, match="injected crash"):
        resumable_chunk_compare(
            spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir,
            chunks_per_batch=2, fail_after_batches=1,
        )
    resume_row_diff(spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir)
    assert not os.path.isdir(os.path.join(ckpt_dir, "rowdiff"))
    resumable_chunk_compare(
        spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir
    )
    got = resume_row_diff(
        spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir
    )
    assert os.path.isdir(os.path.join(ckpt_dir, "rowdiff"))
    want = targeted_row_diff(src, dst, "c_custkey", CUST_COLS, 64)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0


def test_remove_duplicate_lines_rewrites_and_preserves_order(spark):
    """Line-level boilerplate removal: hot lines vanish from every doc,
    content lines keep their order, an all-boilerplate doc survives with
    empty text (the quality gate downstream decides its fate)."""
    from tiflow_spark.llm.textstats import remove_duplicate_lines

    rows = [
        (1, "HEADER\nalpha beta\ngamma\nFOOTER"),
        (2, "HEADER\ndelta\nFOOTER"),
        (3, "HEADER\nepsilon zeta\nFOOTER"),
        (4, "HEADER\nFOOTER"),  # all boilerplate
        (5, "unique one\nunique two"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_lines(docs, min_df=3).collect()
    }
    assert out[1]["text"] == "alpha beta\ngamma"
    assert out[1]["n_lines"] == 4 and out[1]["n_removed"] == 2
    assert out[4]["text"] == "" and out[4]["n_removed"] == 2
    assert out[5]["text"] == "unique one\nunique two"
    assert out[5]["n_removed"] == 0
    # df counts DISTINCT docs: a line repeated inside ONE doc stays
    docs2 = spark.createDataFrame(
        [(1, "same\nsame\nsame\nother")], "doc_id long, text string"
    )
    r = remove_duplicate_lines(docs2, min_df=3).collect()[0]
    assert r["text"] == "same\nsame\nsame\nother" and r["n_removed"] == 0
    # blank lines are paragraph separators, never hot: even when every
    # doc contains one, they survive
    docs3 = spark.createDataFrame(
        [(i, f"para {i}\n\ntail {i}") for i in range(1, 5)],
        "doc_id long, text string",
    )
    for r in remove_duplicate_lines(docs3, min_df=3).collect():
        assert r["text"] == f"para {r['doc_id']}\n\ntail {r['doc_id']}"
        assert r["n_removed"] == 0


def test_remove_duplicate_spans_keeps_canonical_copy(spark):
    """Exact-substring removal: the min-doc_id occurrence keeps its
    text, later docs lose exactly the covered positions, disjoint
    content survives everywhere, and a full-clone doc is erased to
    empty."""
    from tiflow_spark.llm.dedup import remove_duplicate_spans

    shared = "a b c d e f g h"  # one 8-gram, shared
    rows = [
        (1, f"{shared} uniq1 uniq2"),
        (2, f"intro {shared} tail"),
        (3, shared),  # pure clone -> erased entirely
        (4, "totally different words here with no dup at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, k=8).collect()
    }
    assert out[1]["text"] == f"{shared} uniq1 uniq2"  # canonical keeps all
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "intro tail" and out[2]["n_removed"] == 8
    assert out[3]["text"] == "" and out[3]["n_removed"] == 8
    assert out[4]["n_removed"] == 0
