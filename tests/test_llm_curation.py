"""Behavior tests for the round-4 curation operators (repetition, PII,
contamination, funnel) — parity vs DuckDB is covered by test_parity.py;
these assert the *semantics* on the synthetic corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiflow_spark.envelope import load_table
from tiflow_spark.llm.contamination import benchmark_grams, contamination
from tiflow_spark.llm.dedup import corpus_with_dups
from tiflow_spark.llm.pii import pii_corpus, pii_scrub
from tiflow_spark.llm.pipeline import corpus_funnel
from tiflow_spark.llm.textstats import repetition_features, repetitive_corpus


def test_repetition_flags_injected_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    feats = repetition_features(repetitive_corpus(docs))
    rows = {r["doc_id"]: r for r in feats.collect()}
    injected = [d for d in rows if d % 9 == 0]
    normal = [d for d in rows if d % 9 != 0]
    assert injected and normal
    # every injected doc is flagged; its unique-word ratio collapses
    for d in injected:
        assert rows[d]["repetitive"], rows[d]
        assert rows[d]["uniq_word_ratio"] < 0.3
    # word-soup docs are overwhelmingly unflagged
    flagged_normal = sum(1 for d in normal if rows[d]["repetitive"])
    assert flagged_normal / len(normal) < 0.05


def test_pii_counts_by_injection_class(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = {r["doc_id"]: r for r in pii_scrub(pii_corpus(docs)).collect()}
    for d, r in out.items():
        want_email = (1 if d % 4 == 0 else 0) + (1 if d % 8 == 0 else 0)
        assert r["n_email"] == want_email, (d, r)
        assert r["n_phone"] == (1 if d % 4 == 1 else 0)
        assert r["n_ip"] == (1 if d % 4 == 2 else 0)
        assert r["has_pii"] == (d % 4 != 3 or d % 8 == 0)


def test_pii_scrub_removes_all_matches(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    corpus = pii_corpus(docs)
    from tiflow_spark.llm.pii import EMAIL_RE, IPV4_RE, PHONE_RE

    t = F.col("text")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    residue = corpus.select(
        (
            F.regexp_count(scrubbed, F.lit(EMAIL_RE))
            + F.regexp_count(scrubbed, F.lit(PHONE_RE))
            + F.regexp_count(scrubbed, F.lit(IPV4_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("total")).collect()[0]["total"]
    assert residue == 0


def test_contamination_finds_benchmark_clones(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = contamination(corpus_with_dups(docs), benchmark_grams(docs))
    rows = {r["doc_id"]: r for r in out.collect()}
    bench_ids = [
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 50 == 0).collect()
    ]
    assert bench_ids
    for b in bench_ids:
        # the benchmark doc itself: full overlap, flagged as benchmark
        assert rows[b]["contaminated"] and rows[b]["is_benchmark"]
        # its near-clone (+20000, every 5th ⊇ every 50th) is a true positive
        clone = b + 20000
        assert rows[clone]["contaminated"] and not rows[clone]["is_benchmark"]


def test_corpus_funnel_monotone_and_attrition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    stages = {
        r["stage"]: r for r in corpus_funnel(docs).orderBy("stage_ord").collect()
    }
    assert list(stages) == ["raw", "quality", "dedup", "clean"]
    n = [stages[s]["n_docs"] for s in ("raw", "quality", "dedup", "clean")]
    c = [stages[s]["n_chars"] for s in ("raw", "quality", "dedup", "clean")]
    assert n == sorted(n, reverse=True) and c == sorted(c, reverse=True)
    # dedup must remove the exact clones that survived quality; clean must
    # remove at least the near-clones of benchmark docs
    assert n[2] < n[1]
    assert n[3] < n[2]


def test_sq_ann_recall_vs_brute_force(spark, sf_dir):
    """SQ8 ADC candidate generation must carry ≥80% of the true top-5 into
    the re-rank pool at R=20 (on the synthetic embeddings it is exact, but
    the contract we pin is recall, not equality)."""
    from tiflow_spark.envelope import load_table
    from tiflow_spark.llm.quantized import sq_ann_topk
    from tiflow_spark.llm.similarity import topk_cosine

    emb = load_table(spark, sf_dir, "embeddings")
    qids = list(range(8))
    truth = {
        (r["query_id"], r["vec_id"])
        for r in topk_cosine(emb, qids, 5).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in sq_ann_topk(emb, qids, k=5, rerank=20).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, recall


def test_sq8_codes_bounded(spark, sf_dir):
    from tiflow_spark.envelope import load_table
    from tiflow_spark.llm.quantized import quantize_sq8

    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import functions as F

    mx = (
        emb.select(
            F.array_max(
                F.transform(quantize_sq8(F.col("embedding")), F.abs)
            ).alias("m")
        )
        .agg(F.max("m"))
        .collect()[0][0]
    )
    assert mx <= 127
