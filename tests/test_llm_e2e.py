"""End-to-end pretraining-data pipeline: normalize → quality-filter →
exact-dedup → decontaminate → temperature-rebalance → epoch-shuffle →
pack → export shards with manifest.

Chains the real operators over the sf0.001 documents corpus and asserts
the invariants a production pipeline relies on: survivors only shrink,
every exported doc traces back to a surviving doc, manifest totals match,
and the whole chain is bit-deterministic across partitionings.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from tiflow_spark.llm.contamination import benchmark_grams, contamination
from tiflow_spark.llm.dedup import corpus_with_dups
from tiflow_spark.llm.export import write_training_shards
from tiflow_spark.llm.packing import pack_documents
from tiflow_spark.llm.sampling import epoch_shuffle, temperature_resample
from tiflow_spark.llm.textstats import normalize_text, quality_score, tokens


def _curate(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = corpus_with_dups(docs)
    # normalize, re-attach lang (sharded ids keep original doc's lang)
    norm = normalize_text(raw).join(
        raw.select("doc_id", "text"), "doc_id"
    )
    lang = docs.select("doc_id", "lang")
    norm = norm.withColumn("base_id", F.col("doc_id") % 10000).join(
        F.broadcast(lang.withColumnRenamed("doc_id", "base_id")), "base_id"
    )
    # quality gate on the normalized text
    q = norm.filter(quality_score(F.col("norm_text")) >= 0.5)
    # exact dedup on normalized digest (min doc_id survives)
    w = Window.partitionBy("norm_md5")
    d = (
        q.withColumn("keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep"))
        .drop("keep")
    )
    # decontaminate vs the synthetic benchmark
    bench = benchmark_grams(docs, n=5, benchmark_every=50)
    flags = contamination(
        d.select("doc_id", F.col("norm_text").alias("text")),
        bench,
        n=5,
        min_shared=3,
        benchmark_every=50,
    )
    clean_ids = flags.filter(
        ~(F.col("contaminated") & ~F.col("is_benchmark"))
    ).select("doc_id")
    return d.join(clean_ids, "doc_id").select(
        "doc_id", "lang", F.col("norm_text").alias("text")
    )


def test_full_pipeline_chain(spark, sf_dir, tmp_path):
    curated = _curate(spark, sf_dir).persist()
    raw_n = corpus_with_dups(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).count()
    n_cur = curated.count()
    assert 0 < n_cur < raw_n  # every gate actually dropped something

    # temperature-rebalance the language mix, then order an epoch
    mix = temperature_resample(curated, "lang", n_target=n_cur // 2)
    picked = curated.join(mix.select("doc_id"), "doc_id")
    n_mix = picked.count()
    assert 0 < n_mix <= n_cur // 2

    ordered = epoch_shuffle(picked, epoch=0, n_shards=4)
    assert ordered.count() == n_mix

    # pack into 512-token bins: bins are filled, offsets consistent
    with_tok = picked.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    packed = pack_documents(with_tok, token_budget=512, n_groups=8)
    total_tokens = with_tok.agg(F.sum("n_tokens")).collect()[0][0]
    n_bins = packed.agg(F.countDistinct("bin_id")).collect()[0][0]
    assert n_bins >= total_tokens // 512  # no bin under-fills except last
    # global offsets are a permutation-free prefix sum
    assert (
        packed.agg(F.max(F.col("start_offset") + F.col("n_tokens"))).collect()[0][0]
        == total_tokens
    )

    # export: manifest totals match the mixed corpus
    manifest = write_training_shards(
        picked, str(tmp_path / "shards"), n_shards=4, epoch=0
    )
    assert sum(s["n_docs"] for s in manifest["shards"].values()) == n_mix
    back = spark.read.parquet(str(tmp_path / "shards"))
    assert back.count() == n_mix
    assert set(back.select("doc_id").toPandas()["doc_id"]) == set(
        picked.select("doc_id").toPandas()["doc_id"]
    )
    curated.unpersist()


def test_pipeline_deterministic_across_partitionings(spark, sf_dir):
    curated = _curate(spark, sf_dir)
    mix_a = {
        r["doc_id"]
        for r in temperature_resample(curated, "lang", 100).collect()
    }
    mix_b = {
        r["doc_id"]
        for r in temperature_resample(
            curated.repartition(13), "lang", 100
        ).collect()
    }
    assert mix_a == mix_b
