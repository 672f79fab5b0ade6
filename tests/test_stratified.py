"""Exact-quota stratified sampling properties (llm/sampling.py)."""

import pyspark.sql.functions as F

from tiflow_spark.llm.sampling import stratified_quota_sample


def _docs(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("de"),
                    F.lit("fr")),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("lang"),
    )


def test_exact_quotas_and_small_stratum_cap(spark):
    docs = _docs(spark)  # en:180, de:60, fr:60
    out = stratified_quota_sample(docs, "lang", quota=100, quotas={"de": 10})
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 100, "de": 10, "fr": 60}  # fr capped by size
    # ranks are 1..k dense within each stratum
    ranks = [r.pick_rank for r in out.filter("lang = 'de'").collect()]
    assert sorted(ranks) == list(range(1, 11))


def test_selection_stable_under_corpus_growth(spark):
    docs = _docs(spark, 300)
    grown = _docs(spark, 400)
    pick_before = {
        r.doc_id
        for r in stratified_quota_sample(docs, "lang", 40).collect()
    }
    pick_after = {
        r.doc_id
        for r in stratified_quota_sample(grown, "lang", 40).collect()
    }
    # hash order never changes — new docs can only displace boundary ranks,
    # so the overlap stays large (here: identical strata proportions, so
    # most picks survive; a re-randomizing sampler would share ~13%)
    assert len(pick_before & pick_after) > len(pick_before) * 0.5


def test_salt_redeal(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in stratified_quota_sample(docs, "lang", 40, salt="a").collect()}
    b = {r.doc_id for r in stratified_quota_sample(docs, "lang", 40, salt="b").collect()}
    assert a != b  # a different salt deals a different (but stable) hand
