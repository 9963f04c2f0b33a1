"""LSH near-dup scale path: subset-of-exact + recall floor at sf0.001."""

from __future__ import annotations

from openplacereviews_db_spark.operators import similarity
from openplacereviews_db_spark.sources.testdata import load_table


def test_lsh_pairs_subset_and_recall(spark, sf_dir):
    embs = load_table(spark, "embeddings", sf_dir)
    exact = {(r["id_a"], r["id_b"]): r["sim"]
             for r in similarity.cosine_pairs_gemm(embs, 0.40).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["sim"]
           for r in similarity.cosine_pairs_lsh(embs, 0.40).collect()}
    # every LSH pair is a true pair with the identical similarity value
    for k, v in lsh.items():
        assert k in exact and exact[k] == v
    # and the bucketing keeps useful recall on this corpus
    assert len(lsh) >= 0.5 * len(exact), (len(lsh), len(exact))


def test_ivf_topk_recall(spark, sf_dir):
    embs = load_table(spark, "embeddings", sf_dir)
    queries = embs.limit(20)
    exact = {(r["q_id"], r["rank"]): r["c_id"]
             for r in similarity.cosine_topk(embs, queries, k=3).collect()}
    ivf = {(r["q_id"], r["rank"]): r["c_id"]
           for r in similarity.cosine_topk_ivf(
               embs, queries, k=3, n_cells=16, n_probe=6).collect()}
    hits = sum(1 for kk, v in exact.items() if ivf.get(kk) == v)
    assert hits >= 0.6 * len(exact), (hits, len(exact))
