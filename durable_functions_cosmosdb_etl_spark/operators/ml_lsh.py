"""pyspark.ml-backed LSH variants (the library path next to the
hand-rolled ones in operators/dedup.py and operators/similarity.py).

SURVEY.md §2.2/§4.1 name `pyspark.ml.feature.MinHashLSH` and
`BucketedRandomProjectionLSH` as Spark's built-in approximate-join
machinery; this module wires them so users can choose either surface:

- native (dedup.minhash_lsh_pairs): transparent banding, exact-Jaccard
  verification, portable integer hashing.
- ml (here): the battle-tested estimator/transformer pipeline;
  approxSimilarityJoin plans the same hash-bucket equi-join under the
  hood (linear shuffle), with distances (Jaccard / Euclidean) computed
  by the library.

Both are tested for agreement against the exact baselines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles_from_words, words


def _shingle_vectors(
    df: DataFrame, id_col: str, text_col: str, n: int, vocab_bits: int = 18
) -> DataFrame:
    """docs → sparse 2^vocab_bits-dim binary shingle vectors.

    MinHashLSH needs ml Vectors; shingles are hashed into a fixed
    feature space (collision rate ≈ |shingles| / 2^bits — negligible at
    2^18 for hundreds of shingles/doc). The hashing AND sparse-vector
    construction run entirely JVM-side via ``HashingTF(binary=True)`` —
    no Python touches the rows (replaces the former row-at-a-time
    ``F.udf`` SparseVector builder, the last per-row Python UDF in the
    package). Sparse representation: memory per doc is O(|shingles|).
    """
    from pyspark.ml.feature import HashingTF

    sh = (
        df.select(F.col(id_col).alias("doc"), words(F.col(text_col)).alias("w"))
        .select("doc", shingles_from_words(F.col("w"), n).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    tf = HashingTF(
        inputCol="sh",
        outputCol="features",
        numFeatures=1 << vocab_bits,
        binary=True,
    )
    return tf.transform(sh).select("doc", "features")


def ml_minhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hash_tables: int = 16,
) -> DataFrame:
    """Near-dup pairs via pyspark.ml MinHashLSH.approxSimilarityJoin.

    Distance column is Jaccard *distance* over the hashed shingle sets;
    pairs kept at distance ≤ 1−threshold. Output matches
    dedup.minhash_lsh_pairs' (doc_a, doc_b) shape (jaccard here is the
    library's estimate on hashed features, so tests compare pair SETS
    against the exact baseline rather than values).
    """
    from pyspark.ml.feature import MinHashLSH

    feats = _shingle_vectors(df, id_col, text_col, n).cache()
    model = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=42,
    ).fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="jd"
    )
    return (
        joined.filter(F.col("datasetA.doc") < F.col("datasetB.doc"))
        .select(
            F.col("datasetA.doc").alias("doc_a"),
            F.col("datasetB.doc").alias("doc_b"),
            (1.0 - F.col("jd")).alias("jaccard"),
        )
    )


def ml_brp_lsh_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 8,
) -> DataFrame:
    """Approximate nearest neighbors via BucketedRandomProjectionLSH.

    Euclidean-distance LSH over the embedding column (for L2-normalized
    vectors the Euclidean and cosine rankings agree:
    ‖a−b‖² = 2 − 2·cos). Returns (query_id, neighbor_id, dist, rank)
    per query via approxNearestNeighbors on each query vector — the
    bucketed pre-filter is what survives scale; tests gate recall@k
    against similarity.brute_force_topk.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    ).cache()
    q = queries.select(
        F.col(id_col).alias("query_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    ).fit(c)
    # approxSimilarityJoin keeps the whole flow distributed (vs
    # approxNearestNeighbors, which takes one driver-side key at a time).
    joined = model.approxSimilarityJoin(q, c, float("inf"), distCol="dist")
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        joined.select(
            F.col("datasetA.query_id").alias("query_id"),
            F.col("datasetB.neighbor_id").alias("neighbor_id"),
            F.col("dist").alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
