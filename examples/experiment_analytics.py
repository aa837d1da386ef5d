"""Product-analytics pipeline over the round-3 operator tier: last-touch
attribution → per-type latency percentiles → A/B conversion z-test →
temperature-weighted source mix for the follow-up training set — the
stages between "raw event stream" and "an experiment decision plus the
data mix it feeds".

Composition notes: attribution turns a flat event log into credited
conversions (the marketing analog of Flink's keyed ProcessFunction,
expressed as one struct-max window pass); percentiles profile each event
type's value distribution exactly; the z-test reads significance off the
SAME per-unit conversion rollup an experimentation platform would store;
temperature weighting then allocates the next training batch across
sources so low-resource ones are up-sampled (α → 0) without abandoning
the natural mix (α = 1).

    python -m examples.experiment_analytics [sf_dir]
"""

import sys

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark, load_table
from apache_flink_essentials_spark.operators.curation import (
    temperature_weights,
)
from apache_flink_essentials_spark.operators.patterns import (
    last_touch_attribution,
)
from apache_flink_essentials_spark.operators.profiling import (
    ab_conversion_ztest,
    value_percentiles,
)


def run(spark=None, sf_dir="/root/testdata/sf0.001"):
    spark = spark or get_spark(app_name="experiment-analytics")
    events = load_table(spark, "events", sf_dir)
    docs = load_table(spark, "documents", sf_dir)

    # 1. credit each purchase to the latest preceding touchpoint (1 h)
    credited = last_touch_attribution(
        events, "user_id", "ts", "event_type", "event_id",
        target="purchase", within_seconds=3600,
    )
    attribution_report = credited.groupBy("attributed_type").agg(
        F.count(F.lit(1)).alias("n_purchases")
    )

    # 2. exact value percentiles per event type (p50/p95/p99)
    latency = value_percentiles(events, "event_type", "value")

    # 3. A/B readout: variant by unit parity, conversion = any purchase
    ab = ab_conversion_ztest(
        events.select(
            "user_id",
            F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias(
                "variant"
            ),
            (F.col("event_type") == "purchase").alias("converted"),
        ),
        "user_id", "variant", "converted",
    )

    # 4. allocate the follow-up training batch across document sources
    mix = temperature_weights(docs, alpha=0.3, budget_tokens=100_000)

    return attribution_report, latency, ab, mix


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    attribution_report, latency, ab, mix = run(sf_dir=sf)
    attribution_report.orderBy(F.desc("n_purchases")).show()
    latency.orderBy("event_type").show()
    ab.show()
    mix.orderBy(F.desc("alloc_tokens")).show()


if __name__ == "__main__":
    main()
