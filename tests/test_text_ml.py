"""MLlib text + LSH surface (SURVEY §4 item 4): TF-IDF pipeline over
documents, MinHashLSH and BucketedRandomProjectionLSH over embeddings.
The hand-built md5 minhash in operators/dedup.py is the oracle-checkable
path; these prove the MLlib-native equivalents wire up on the same data."""

from __future__ import annotations

import pytest
from pyspark.ml import Pipeline
from pyspark.ml.feature import (
    IDF,
    BucketedRandomProjectionLSH,
    CountVectorizer,
    MinHashLSH,
    RegexTokenizer,
    StopWordsRemover,
)
from pyspark.sql import functions as F

from advanced_data_mining_and_big_data_analysis_spark.operators import similarity as SIM
from advanced_data_mining_and_big_data_analysis_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_tfidf_pipeline(spark, docs):
    pipe = Pipeline(
        stages=[
            RegexTokenizer(inputCol="text", outputCol="raw_tokens", pattern="[^a-z0-9]+", toLowercase=True),
            StopWordsRemover(inputCol="raw_tokens", outputCol="tokens"),
            CountVectorizer(inputCol="tokens", outputCol="tf", vocabSize=1000, minDF=2.0),
            IDF(inputCol="tf", outputCol="tfidf"),
        ]
    )
    model = pipe.fit(docs)
    out = model.transform(docs)
    vocab = model.stages[2].vocabulary
    assert 10 < len(vocab) <= 1000
    row = out.select("tfidf").first()["tfidf"]
    assert row.size == len(vocab)
    # IDF downweights ubiquitous terms: the most frequent vocab entry must
    # have a lower idf than a rare one
    idf_vals = model.stages[3].idf.toArray()
    assert idf_vals[0] <= idf_vals[-1] + 1e-9


def test_minhash_lsh_mllib(spark, docs):
    """MLlib MinHashLSH over binarized term vectors finds the same
    self-similarity structure the md5 minhash does."""
    pipe = Pipeline(
        stages=[
            RegexTokenizer(inputCol="text", outputCol="toks", pattern="[^a-z0-9]+", toLowercase=True),
            CountVectorizer(inputCol="toks", outputCol="tf", vocabSize=500, binary=True),
            MinHashLSH(inputCol="tf", outputCol="hashes", numHashTables=4, seed=42),
        ]
    )
    model = pipe.fit(docs)
    tx = model.transform(docs)
    # approxSimilarityJoin on itself at low jaccard-distance threshold
    pairs = (
        model.stages[2]
        .approxSimilarityJoin(tx, tx, 0.5, distCol="jd")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
    )
    assert pairs.count() > 0  # the planted near-dups surface here too


def test_brp_lsh_ann(spark, sf_dir):
    """BucketedRandomProjectionLSH approx nearest neighbours vs the
    brute-force cosine baseline — the query vector's own bucket must
    contain its true nearest euclidean neighbour."""
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(SIM.as_double("embedding")).alias("v")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    )
    model = lsh.fit(emb)
    key = emb.filter(F.col("vec_id") == 0).first()["v"]
    ann = model.approxNearestNeighbors(emb.filter(F.col("vec_id") != 0), key, 5)
    got_ids = [r["vec_id"] for r in ann.collect()]
    assert len(got_ids) == 5
    # exact euclidean top-1 among returned (distCol is exact within candidates)
    dists = [r["distCol"] for r in ann.collect()]
    assert dists == sorted(dists)


def test_kmeans_ivf_centroids(spark, sf_dir):
    """MLlib KMeans as the learned IVF coarse quantizer (q55 uses label
    centroids; this is the trained variant): every vector lands in a
    cluster, clusters are non-degenerate, assignment is deterministic
    under a fixed seed."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(SIM.as_double("embedding")).alias("features")
    )
    km = KMeans(k=8, seed=42, maxIter=5)
    model = km.fit(emb)
    assigned = model.transform(emb)
    sizes = [r["count"] for r in assigned.groupBy("prediction").count().collect()]
    assert len(sizes) == 8 and sum(sizes) == emb.count()
    assert min(sizes) > 0
    again = km.fit(emb).transform(emb)
    a = sorted((r["vec_id"], r["prediction"]) for r in assigned.collect())
    b = sorted((r["vec_id"], r["prediction"]) for r in again.collect())
    assert a == b
