"""Similarity-search showcase: the three ANN tiers over the embeddings
fixture — exact brute force (baseline), hyperplane-LSH buckets, IVF with a
k-means coarse quantizer — with measured recall of each approximate tier
against the exact answer.

    python -m examples.similarity_search [sf_dir]
"""

import sys
import time

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark, load_table
from apache_flink_essentials_spark.operators import vector as V


def run(spark=None, sf_dir="/root/testdata/sf0.001", k=5):
    spark = spark or get_spark("example-similarity-search")
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)

    def pairs(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    t0 = time.perf_counter()
    exact = pairs(V.knn_cosine_bruteforce(emb, queries, k=k))
    t_exact = time.perf_counter() - t0

    # weakly-similar random vectors need wide nets: 4 planes × 8 tables
    t0 = time.perf_counter()
    lsh = pairs(V.ann_lsh_cosine(emb, queries, k=k, num_planes=4, num_tables=8))
    t_lsh = time.perf_counter() - t0

    t0 = time.perf_counter()
    centroids = V.kmeans_fit(emb, k=8, iters=2)
    ivf = pairs(V.ivf_search(emb, queries, centroids, k=k, nprobe=3))
    t_ivf = time.perf_counter() - t0

    print(f"exact brute force: {len(exact)} pairs in {t_exact:.2f}s (recall 1.000)")
    print(
        f"hyperplane LSH:    {len(lsh)} pairs in {t_lsh:.2f}s "
        f"(recall {len(exact & lsh) / len(exact):.3f})"
    )
    print(
        f"IVF nprobe=3/8:    {len(ivf)} pairs in {t_ivf:.2f}s "
        f"(recall {len(exact & ivf) / len(exact):.3f})"
    )
    return exact


if __name__ == "__main__":
    run(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
