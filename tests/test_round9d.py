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


def test_kmv_exact_below_k(spark):
    from apache_flink_essentials_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame([(i % 40,) for i in range(500)], "v long")
    r = kmv_distinct(df, "v", k=64).collect()[0]
    # cardinality 40 < k: the estimator degenerates to the exact count
    assert r.n_exact == 40 and r.k_used == 40
    assert r.kmv_estimate == 40.0 and r.rel_error == 0.0


def test_kmv_estimate_matches_python_hash_replay(spark):
    import hashlib

    from apache_flink_essentials_spark.operators.sketches import kmv_distinct

    vals = list(range(1000))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = kmv_distinct(df, "v", k=64).collect()[0]
    hashes = sorted(
        int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16) for v in vals
    )
    kth = hashes[63]
    assert r.kth_hash == kth and r.n_exact == 1000
    assert r.kmv_estimate == (63 * 2**48) / kth
    # KMV with k=64 lands within ~3 std errors of the truth here
    assert abs(r.rel_error) < 0.5


def test_burstiness_metronome_is_minus_one(spark):
    import datetime

    from apache_flink_essentials_spark.operators.timeseries import (
        interarrival_burstiness,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base + datetime.timedelta(seconds=60 * i), "tick")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    r = interarrival_burstiness(df, "user_id", "ts", "event_type").collect()
    assert len(r) == 1
    # constant gaps: sigma = 0 -> B = -1 exactly; mean is the metronome
    assert r[0].burstiness == -1.0 and r[0].mean_gap_s == 60.0


def test_burstiness_bursty_series_positive(spark):
    import datetime
    import math

    from apache_flink_essentials_spark.operators.timeseries import (
        interarrival_burstiness,
    )

    base = datetime.datetime(2024, 1, 1)
    gaps = [1, 1, 1, 1000]
    offs = [0]
    for g in gaps:
        offs.append(offs[-1] + g)
    rows = [
        (1, base + datetime.timedelta(seconds=o), "burst") for o in offs
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    r = interarrival_burstiness(df, "user_id", "ts", "event_type").collect()[0]
    n, s1, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
    sigma = math.sqrt(float(n * s2 - s1 * s1)) / n
    mu = s1 / n
    assert r.burstiness == round((sigma - mu) / (sigma + mu), 6)
    # n=4 caps B at (sqrt(3)-1)/(sqrt(3)+1) ~ 0.268; the single-spike
    # series sits essentially at that ceiling
    assert r.burstiness > 0.25
