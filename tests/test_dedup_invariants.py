"""Planted-duplicate recovery invariants for the near-dup operators.

augment_docs/augment_emb plant exact dups (+10^6, every 10th id) and near
dups (+2*10^6, every 7th); the candidate-generation strategies (prefix
filtering for n-gram Jaccard, hyperplane LSH for embeddings) must recover
them — a recall check the oracle-parity test alone cannot express.
"""

from pyspark.sql import functions as F

from .conftest import SF_DIR_SMALL


def test_ngram_jaccard_recovers_planted_pairs(spark):
    from wikipedia_wikidata_spark.operators.dedup import augment_docs, ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    pairs = ngram_jaccard_pairs(augment_docs(docs)).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard_e6 for r in pairs}
    n = docs.count()
    exact_expected = [(i, i + 1000000) for i in range(0, n, 10)]
    assert all(got.get(p) == 1000000 for p in exact_expected), "exact dups missed"
    near_found = sum((i, i + 2000000) in got for i in range(0, n, 7))
    # near dups drop one word; a few tiny docs can fall under the threshold
    assert near_found >= 0.8 * len(range(0, n, 7))
    # prefix filtering must not emit below-threshold pairs
    assert all(v >= 600000 for v in got.values())


def test_emb_near_dup_recovers_planted_pairs(spark):
    from wikipedia_wikidata_spark.operators.similarity import emb_near_dup

    emb = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")
    pairs = emb_near_dup(emb).collect()
    got = {(r.vec_a, r.vec_b): r.cosine_e6 for r in pairs}
    n = emb.count()
    exact_expected = [(i, i + 1000000) for i in range(0, n, 10)]
    assert all(got.get(p) == 1000000 for p in exact_expected), "exact dups missed"
    # perturbed vectors stay near-identical; LSH may lose a few at bucket edges
    near_found = sum((i, i + 2000000) in got for i in range(0, n, 7))
    assert near_found >= 0.7 * len(range(0, n, 7))
    assert all(v >= 900000 for v in got.values())
