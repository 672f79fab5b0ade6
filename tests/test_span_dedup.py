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


# ------------------------------------------------- min_span_len (round 9)


def _brute_remove(rows, k, min_span_len):
    """Brute-force Python oracle for remove_duplicate_spans: exhaustive
    gram inventory, owner = min doc_id, covered positions merged into
    maximal runs, runs >= min_span_len erased."""
    from collections import defaultdict

    toks = {d: [t for t in text.split() if t] for d, text in rows}
    occs = defaultdict(list)  # gram -> [(doc, 1-based pos)]
    for d, ts in toks.items():
        n = len(ts)
        for i in range(1, max(n - k + 1, 1) + 1):
            g = " ".join(ts[i - 1 : i - 1 + k])
            if g:
                occs[g].append((d, i))
    covered = defaultdict(set)
    for lst in occs.values():
        docs_with = {d for d, _ in lst}
        if len(docs_with) < 2:
            continue
        owner = min(docs_with)
        for d, i in lst:
            if d == owner:
                continue
            n = len(toks[d])
            covered[d].update(range(i, min(i + k - 1, n) + 1))
    out = {}
    for d, ts in toks.items():
        erase = set()
        run = []
        for p in sorted(covered.get(d, ())) + [None]:
            if run and (p is None or p != run[-1] + 1):
                if len(run) >= min_span_len:
                    erase.update(run)
                run = []
            if p is not None:
                run.append(p)
        kept = [t for j, t in enumerate(ts, 1) if j not in erase]
        out[d] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


def test_min_span_len_keeps_short_collisions(spark):
    """A duplicated 8-gram shorter than min_span_len survives; a clone
    run longer than it is still erased."""
    from tiflow_spark.llm.dedup import remove_duplicate_spans

    shared8 = "s1 s2 s3 s4 s5 s6 s7 s8"
    long_run = " ".join(f"c{i}" for i in range(30))
    rows = [
        (1, f"{shared8} a1 a2 a3 a4"),
        (2, f"{shared8} b1 b2 b3 b4"),   # shares only an 8-run with doc 1
        (3, long_run + " x1 x2"),
        (4, long_run + " y1 y2"),        # shares a 30-run with doc 3
    ]
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            _df(spark, rows), k=8, min_span_len=10
        ).collect()
    }
    # 8-token shared run < 10: doc 2 keeps its text
    assert out[2]["n_removed"] == 0 and out[2]["text"] == rows[1][1]
    # 30-token shared run >= 10: doc 4 (non-owner) loses it
    assert out[4]["n_removed"] == 30
    assert out[4]["text"] == "y1 y2"
    # owner doc 3 untouched
    assert out[3]["n_removed"] == 0


def test_min_span_len_default_is_r8_semantics(spark):
    """min_span_len=1 must be plan-identical to the bare k-gram form."""
    from tiflow_spark.llm.dedup import remove_duplicate_spans

    rows = [
        (1, "s1 s2 s3 s4 s5 s6 s7 s8 a"),
        (2, "s1 s2 s3 s4 s5 s6 s7 s8 b"),
    ]
    df = _df(spark, rows)
    import re

    a = remove_duplicate_spans(df, k=8)
    b = remove_duplicate_spans(df, k=8, min_span_len=1)

    def norm(d):
        s = d._jdf.queryExecution().optimizedPlan().toString()
        s = re.sub(r"#\d+", "#x", s)
        return re.sub(r"lambda ([a-z]+)_\d+", r"lambda \1_n", s)

    assert norm(a) == norm(b)


def _tiny_docs():
    from hypothesis import strategies as st

    token = st.sampled_from(["a", "b", "c"])
    doc = st.lists(token, min_size=0, max_size=12).map(" ".join)
    return st.lists(doc, min_size=2, max_size=5).map(
        lambda ds: [(i + 1, d) for i, d in enumerate(ds)]
    )


def _property_spanlen(spark, rows, min_span_len):
    from tiflow_spark.llm.dedup import remove_duplicate_spans

    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(
            _df(spark, rows), k=3, min_span_len=min_span_len
        ).collect()
    }
    assert got == _brute_remove(rows, 3, min_span_len)


def test_min_span_len_matches_brute_force(spark):
    """Hypothesis property: Spark run-merge == exhaustive Python oracle
    over tiny 3-letter-alphabet corpora for several span thresholds."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rows=_tiny_docs(), min_span_len=st.integers(1, 7))
    def inner(rows, min_span_len):
        _property_spanlen(spark, rows, min_span_len)

    inner()


def test_min_span_len_plan_has_no_window(spark):
    """The run merge must stay window-free (linear per-doc array ops) —
    a Window node here would be the single-task global sort the operator
    exists to avoid."""
    from tiflow_spark.llm.dedup import remove_duplicate_spans

    df = _df(spark, [(1, "a b c d e f g h i"), (2, "a b c d e f g h j")])
    plan = (
        remove_duplicate_spans(df, k=8, min_span_len=3)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Window" not in plan
