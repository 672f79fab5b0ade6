"""IVF ANN: probe search must approximate the brute-force baseline."""

import pyspark.sql.functions as F

from tiflow_spark.envelope import load_table
from tiflow_spark.llm.similarity import ivf_index, ivf_topk, topk_cosine

QUERIES = [1, 2, 3, 4, 5]


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["vec_id"])
        for r in topk_cosine(emb, QUERIES, k=5).collect()
    }
    centroids, assigned = ivf_index(emb, n_clusters=8, seed=7)
    approx = ivf_topk(centroids, assigned, QUERIES, k=5, n_probe=4)
    rows = approx.collect()
    got = {(r["query_id"], r["vec_id"]) for r in rows}
    # structural contracts
    assert len(rows) == len(QUERIES) * 5
    assert all(1 <= r["rank"] <= 5 for r in rows)
    # probing half the clusters must keep recall well above chance
    recall = len(exact & got) / len(exact)
    assert recall >= 0.5, recall


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """n_probe == n_clusters degenerates to exact search — same results."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assigned = ivf_index(emb, n_clusters=8, seed=7)
    exact = topk_cosine(emb, QUERIES, k=5)
    full = ivf_topk(centroids, assigned, QUERIES, k=5, n_probe=8)
    assert full.exceptAll(exact).count() == 0
    assert exact.exceptAll(full).count() == 0
