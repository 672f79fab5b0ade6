"""Round-7 features: sync_diff checkpoint/resume (checkpoints.go analog)
and the consolidated resume → row-diff flow."""

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from tiflow_spark.envelope import load_table

CUST_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


@pytest.fixture()
def ckpt_dir():
    d = tempfile.mkdtemp(prefix="tiflow_syncdiff_ckpt_")
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


def test_resume_skips_completed_batches(spark, sf_dir, ckpt_dir):
    """Kill the diff mid-run (fault injection after 1 batch); the resumed
    run must re-checksum ONLY unfinished batches and the final result must
    equal a never-interrupted compare."""
    from tiflow_spark.validation.syncdiff import (
        compare_checksums,
        resumable_chunk_compare,
    )

    src = load_table(spark, sf_dir, "customer")
    dst = _corrupt(src)

    first_run: list[int] = []
    with pytest.raises(RuntimeError, match="injected crash"):
        resumable_chunk_compare(
            spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir,
            chunks_per_batch=2, fail_after_batches=1,
            computed_batches=first_run,
        )
    assert first_run == [0]

    second_run: list[int] = []
    resumed = resumable_chunk_compare(
        spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir,
        computed_batches=second_run,
    )
    # batch 0 was checkpointed before the crash — never recomputed
    assert 0 not in second_run and len(second_run) >= 1

    direct = compare_checksums(src, dst, "c_custkey", CUST_COLS, 64)
    got = {tuple(r) for r in resumed.collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want

    # a third run with everything checkpointed computes NOTHING
    third_run: list[int] = []
    again = resumable_chunk_compare(
        spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir,
        computed_batches=third_run,
    )
    assert third_run == []
    assert {tuple(r) for r in again.collect()} == want


def test_resume_row_diff_reads_checkpoint_only(spark, sf_dir, ckpt_dir):
    """The row-diff phase resumes FROM the chunk checkpoint (no
    re-checksum pass) and equals the direct targeted diff."""
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
    got = resume_row_diff(
        spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir
    ).select("c_custkey", "kind")
    want = targeted_row_diff(
        src, dst, "c_custkey", CUST_COLS, 64
    ).select("c_custkey", "kind")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_resume_on_equal_tables_reports_clean(spark, sf_dir, ckpt_dir):
    from tiflow_spark.validation.syncdiff import (
        resumable_chunk_compare,
        resume_row_diff,
    )

    src = load_table(spark, sf_dir, "customer")
    out = resumable_chunk_compare(
        spark, src, src, "c_custkey", CUST_COLS, 64, ckpt_dir
    )
    assert out.filter(~F.col("match")).count() == 0
    assert (
        resume_row_diff(
            spark, src, src, "c_custkey", CUST_COLS, 64, ckpt_dir
        ).count()
        == 0
    )


def test_summary_report_from_checkpoint_equals_direct(spark, sf_dir, ckpt_dir):
    """Crash mid-diff, resume, assemble the report from checkpoint state —
    must equal the never-interrupted summary_report column-for-column."""
    from tiflow_spark.validation.syncdiff import (
        resumable_chunk_compare,
        summary_report,
        summary_report_from_checkpoint,
    )

    src = load_table(spark, sf_dir, "customer")
    dst = _corrupt(src)
    with pytest.raises(RuntimeError, match="injected crash"):
        resumable_chunk_compare(
            spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir,
            chunks_per_batch=2, fail_after_batches=1,
        )
    got = summary_report_from_checkpoint(
        spark, src, dst, "c_custkey", CUST_COLS, 64, ckpt_dir,
        schema="s", table="customer",
    ).collect()[0]
    want = summary_report(
        src, dst, "c_custkey", CUST_COLS, 64, schema="s", table="customer"
    ).collect()[0]
    assert got.asDict() == want.asDict()


def test_driver_contract_rotation_shape():
    """The driver snapshots the first 50 queries() in dict order: the
    rotation list must be exactly 50 valid, distinct registry names, and
    every registered query must carry a DuckDB oracle (zero rows-only
    checks — the repo's standing bar since round 5)."""
    import __spark_entry__ as entry
    from tiflow_spark.plans.parity import REGISTRY

    p = entry._PRIORITY
    assert len(p) == 50 and len(set(p)) == 50
    assert all(n in REGISTRY for n in p)
    assert list(entry.queries())[:50] == p
    assert set(entry.oracle_sql()) == set(REGISTRY)
