"""Round-9 batch 8: HITS hubs/authorities fixed point, kNN label vote —
planted graphs and separable embeddings."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_hits_star_two_hubs_one_authority(spark):
    from apache_flink_essentials_spark.operators.graph import hits_fixedpoint

    # hubs 1,2 both point at x: x absorbs all authority (1e6), the hubs
    # split hub mass evenly; every step is exactly representable so the
    # fixed point is reached with zero truncation drift
    df = spark.createDataFrame(
        [("h1", "x"), ("h2", "x")], "src string, dst string"
    )
    out = {r.node: r for r in hits_fixedpoint(df, iterations=3).collect()}
    assert out["x"].auth_micro == 1_000_000 and out["x"].hub_micro == 0
    assert out["h1"].hub_micro == 500_000 == out["h2"].hub_micro
    assert out["h1"].auth_micro == 0


def test_hits_one_hub_two_authorities(spark):
    from apache_flink_essentials_spark.operators.graph import hits_fixedpoint

    df = spark.createDataFrame(
        [("h", "x"), ("h", "y")], "src string, dst string"
    )
    out = {r.node: r for r in hits_fixedpoint(df, iterations=3).collect()}
    assert out["h"].hub_micro == 1_000_000
    assert out["x"].auth_micro == 500_000 == out["y"].auth_micro


def test_hits_better_hub_boosts_its_authority(spark):
    from apache_flink_essentials_spark.operators.graph import hits_fixedpoint

    # hub A points at both authorities; hub B points only at y. y has
    # indegree 2 so it outranks x, and the authority gap feeds back
    # into A > B? no: A touches {x,y}, B touches {y} -> A's hub score
    # strictly exceeds B's
    df = spark.createDataFrame(
        [("A", "x"), ("A", "y"), ("B", "y")], "src string, dst string"
    )
    out = {r.node: r for r in hits_fixedpoint(df, iterations=6).collect()}
    assert out["y"].auth_micro > out["x"].auth_micro
    assert out["A"].hub_micro > out["B"].hub_micro
    # L1 invariants hold to truncation (sum <= 1e6, within n ulps)
    assert 999_990 <= out["x"].auth_micro + out["y"].auth_micro <= 1_000_000
    assert 999_990 <= out["A"].hub_micro + out["B"].hub_micro <= 1_000_000


def test_knn_label_vote_separable_clusters(spark):
    from apache_flink_essentials_spark.operators.vector import knn_label_vote

    # label 1 lives on the +x axis, label 2 on the +y axis; query 0 is
    # a label-1 vector -> its 3 nearest by cosine are the other
    # label-1 points -> unanimous correct vote
    rows = [
        (0, [1.0, 0.05], 1),
        (1, [1.0, 0.0], 1),
        (2, [0.9, 0.1], 1),
        (3, [1.0, 0.2], 1),
        (4, [0.0, 1.0], 2),
        (5, [0.1, 1.0], 2),
        (6, [0.05, 0.95], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from pyspark.sql import functions as F

    out = knn_label_vote(
        df, df.filter(F.col("vec_id") == 0), k=3
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.predicted_label == 1 and r.votes == 3 and r.correct


def test_knn_label_vote_tie_breaks_to_smaller_label(spark):
    from apache_flink_essentials_spark.operators.vector import knn_label_vote
    from pyspark.sql import functions as F

    # k=2 with one neighbor of each label equally close -> 1-1 tie ->
    # deterministic (votes DESC, label ASC) pick = smaller label
    rows = [
        (0, [1.0, 1.0], 9),
        (1, [1.0, 1.0], 2),
        (2, [1.0, 1.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = knn_label_vote(df, df.filter(F.col("vec_id") == 0), k=2).collect()[0]
    assert r.predicted_label == 1 and r.votes == 1 and not r.correct
