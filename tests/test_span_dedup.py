"""Span-level dup-coverage semantics (round 6 late).

Oracle equality is covered by the registry sweep; these pin the window
semantics (cross-doc only, overlap union, left-join completeness) on
hand-computed fixtures.
"""

from pyspark.sql import functions as F

from tiflow_spark.llm.dedup import span_coverage
from tiflow_spark.plans.parity import load_table


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_only_and_overlap_union(spark):
    rows = [
        # within-doc repeated 8-grams, but unique to this doc -> 0 coverage
        (1, "a b " * 12),
        # share the 8-gram s1..s8 (positions 4..11 of 12) -> 8/12
        (2, "p q r s1 s2 s3 s4 s5 s6 s7 s8 z"),
        (3, "s1 s2 s3 s4 s5 s6 s7 s8 w1 w2 w3 w4"),
        # share a 9-token run -> two overlapping dup 8-grams, union = 9
        (4, "c1 c2 c3 c4 c5 c6 c7 c8 c9 x1 x2 x3"),
        (5, "c1 c2 c3 c4 c5 c6 c7 c8 c9 y1 y2 y3"),
    ]
    out = {
        r["doc_id"]: r
        for r in span_coverage(_df(spark, rows), k=8).collect()
    }
    assert out[1]["covered_tokens"] == 0 and out[1]["dup_grams"] == 0
    assert out[2]["covered_tokens"] == 8
    assert out[2]["coverage"] == round(8 / 12, 6)
    assert out[3]["covered_tokens"] == 8
    # overlap union: 2 dup grams but only 9 covered positions
    assert out[4]["dup_grams"] == 2 and out[4]["covered_tokens"] == 9
    assert out[5]["covered_tokens"] == 9
    # left-join completeness: every doc appears exactly once
    assert len(out) == 5


def test_exact_clone_full_coverage(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(20))),
        (2, " ".join(f"w{i}" for i in range(20))),
        (3, " ".join(f"u{i}" for i in range(20))),
    ]
    out = {
        r["doc_id"]: r
        for r in span_coverage(_df(spark, rows), k=8).collect()
    }
    assert out[1]["coverage"] == 1.0 and out[2]["coverage"] == 1.0
    assert out[3]["coverage"] == 0.0


def test_short_doc_partial_gram(spark):
    """Docs shorter than k compare as one whole-doc gram."""
    rows = [(1, "tiny doc"), (2, "tiny doc"), (3, "other doc")]
    out = {
        r["doc_id"]: r
        for r in span_coverage(_df(spark, rows), k=8).collect()
    }
    assert out[1]["coverage"] == 1.0 and out[2]["coverage"] == 1.0
    assert out[3]["coverage"] == 0.0
    assert out[1]["n_tokens"] == 2


def test_linear_no_pair_blowup(spark, sf_dir):
    """The plan never materializes candidate PAIRS: no cartesian, and the
    dup-occurrence frame is bounded by the occurrence frame (each
    occurrence joins exactly one group row)."""
    import io
    from contextlib import redirect_stdout

    from tiflow_spark.llm.dedup import corpus_with_dups

    corpus = corpus_with_dups(load_table(spark, sf_dir, "documents"))
    df = span_coverage(corpus, k=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # dup_grams sums occurrences, so sum(dup_grams) <= total gram count
    tot = df.agg(F.sum("dup_grams").alias("s")).collect()[0]["s"]
    n_grams = corpus.select(
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).alias("n")
    ).agg(F.sum("n").alias("s")).collect()[0]["s"]
    assert tot <= n_grams


def test_semdedup_prune_consistency(spark, sf_dir):
    """kept == vec never appears as id_b in the pair frame; pruned count
    matches distinct id_b count."""
    from tiflow_spark.llm.clustering import semdedup_pairs, semdedup_prune

    emb = load_table(spark, sf_dir, "embeddings")
    pruned_ids = {
        r["id_b"]
        for r in semdedup_pairs(emb, 0.35, 8, 64).select("id_b").collect()
    }
    out = semdedup_prune(emb, 0.35, 8, 64).collect()
    assert {r["vec_id"] for r in out if not r["kept"]} == pruned_ids
    assert len(out) == emb.count()
