"""Association rules: planted-basket golden values for support /
confidence / lift (the oracle twin re-derives them on real data; this
pins the definitions)."""

from apache_flink_essentials_spark.operators.patterns import association_rules


def test_association_rules_planted(spark):
    # baskets: u1{a,b}, u2{a,b}, u3{a}, u4{b,c} → n_baskets=4
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(df, "user_id", "event_type", min_support=1).collect()
    }
    ab = out[("a", "b")]
    # support(a,b)=2, |a|=3, |b|=3 → conf=2/3, lift=(2/3)/(3/4)=8/9
    assert ab.support == 2
    assert ab.confidence == round(2 / 3, 6)
    assert ab.lift == round((2 / 3) / (3 / 4), 6)
    ba = out[("b", "a")]
    assert ba.support == 2 and ba.confidence == round(2 / 3, 6)
    # c→b: support 1, conf 1.0, lift 1/(3/4)=4/3
    cb = out[("c", "b")]
    assert cb.confidence == 1.0 and cb.lift == round(4 / 3, 6)
    # duplicate events must not inflate support (distinct item sets)
    df2 = df.union(df)
    out2 = {
        (r.antecedent, r.consequent): r.support
        for r in association_rules(df2, "user_id", "event_type", min_support=1).collect()
    }
    assert out2[("a", "b")] == 2


def test_association_rules_min_support_filters(spark):
    rows = [(1, "a"), (1, "b"), (2, "b"), (2, "c")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = association_rules(df, "user_id", "event_type", min_support=2).collect()
    assert out == []  # every pair occurs once
