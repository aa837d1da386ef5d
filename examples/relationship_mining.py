"""Relationship-mining workbench (north-star composition): the graph /
co-occurrence reads a commerce dataset supports end to end — co-purchase
item affinity (item-item collaborative filtering), supplier audience
overlap (bipartite Jaccard), the co-purchase graph's triangle census
(community density), and entity clustering over probabilistic record
linkage.

Every step is an oracle-backed operator; the quadratic pieces are bounded
by construction (pairs enumerated within baskets / per-neighbor adjacency
lists, wedge generation behind degree caps, linkage candidates behind a
blocking key), so the workbench's shape survives a 1000-executor scale-up.

    python -m examples.relationship_mining [sf_dir]
"""

import sys

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark, load_table
from apache_flink_essentials_spark.operators import dedup as D
from apache_flink_essentials_spark.operators import graph as G
from apache_flink_essentials_spark.operators import joins as J
from apache_flink_essentials_spark.operators import reco as R


def run(spark=None, sf_dir="/root/testdata/sf0.001"):
    spark = spark or get_spark("example-relationship-mining")
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    customer = load_table(spark, "customer", sf_dir)

    print("Item co-purchase affinity (top pairs by support, cosine, lift):")
    R.item_cooccurrence(
        lineitem, "l_orderkey", "l_partkey", max_basket_size=50
    ).orderBy(F.col("n_ab").desc(), "item_a", "item_b").show(10)

    print("Supplier audience overlap (customer-base Jaccard, top pairs):")
    bip = orders.join(
        lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    ).select(F.col("l_suppkey").alias("node"), F.col("o_custkey").alias("nb"))
    G.neighbor_overlap_pairs(bip, "node", "nb", max_wedge_degree=200) \
        .orderBy(F.col("n_common").desc(), "node_a", "node_b").show(10)

    print("Adamic-Adar weighting of the same wedges (rare shared "
          "customers dominate):")
    G.adamic_adar_pairs(bip, "node", "nb", max_wedge_degree=200) \
        .orderBy(F.col("aa_micro").desc(), "node_a", "node_b").show(10)

    print("Co-purchase graph triangle census (community density):")
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    pairs = (
        li.select("l_orderkey", F.col("l_partkey").alias("pa"))
        .join(li.select("l_orderkey", F.col("l_partkey").alias("pb")),
              "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
    )
    tri = G.triangle_stats(
        G.undirected_edges(pairs, "pa", "pb"), max_degree=500
    )
    tri.show()

    print("Entity clusters from probabilistic record linkage:")
    blk = F.lower(F.substring("c_name", 1, 16))
    cand = (
        customer.select(F.col("c_custkey").alias("id_a"), blk.alias("_blk"))
        .join(customer.select(F.col("c_custkey").alias("id_b"),
                              blk.alias("_blk")), "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    fields = {
        "name": (
            F.levenshtein(F.lower(F.col("_a_c_name")),
                          F.lower(F.col("_b_c_name"))) <= 1,
            0.9, 0.01,
        ),
        "nation": (
            F.col("_a_c_nationkey") == F.col("_b_c_nationkey"), 0.95, 0.04,
        ),
    }
    matches = J.fs_match_weights(
        customer, cand, "c_custkey", fields, 8_000_000, 0
    ).where(F.col("label") == "match").select("id_a", "id_b")
    cc = D.connected_components(matches, "id_a", "id_b")
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    out = (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )
    out.show()
    return out


if __name__ == "__main__":
    run(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
