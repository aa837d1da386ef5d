"""Data-drift monitoring workbench (north-star composition): the four
screens a production pipeline runs against every incoming batch —
first-digit (Benford) profile, categorical chi-square independence cells,
distribution quantile bands, and CUSUM level-shift detection — plus the
lead/lag read between event streams.

Every screen is an oracle-backed operator emitting per-cell/per-bin rows
(no cross-engine float reductions) over aggregate-sized relations, so the
whole workbench costs one or two scans per screen regardless of input
size.

    python -m examples.drift_monitoring [sf_dir]
"""

import sys

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark, load_table
from apache_flink_essentials_spark.operators.profiling import (
    benford_digits,
    chi2_cells,
)
from apache_flink_essentials_spark.operators.sketches import (
    portable_quantile_bands,
)
from apache_flink_essentials_spark.operators.profiling import p_chart
from apache_flink_essentials_spark.operators.timeseries import (
    acf,
    binned_sums,
    bollinger_from_binned,
    cusum_changepoints,
    holt_winters_from_binned,
    kendall_from_binned,
    lag_correlation,
    mad_anomalies_from_binned,
    permutation_entropy_from_binned,
    seasonal_naive_eval,
    theilsen_from_binned,
)


def run(spark=None, sf_dir="/root/testdata/sf0.001"):
    spark = spark or get_spark("example-drift-monitoring")
    events = load_table(spark, "events", sf_dir)

    print("Benford first-digit profile (fabrication / unit-mix screen):")
    benford_digits(events, "value").show()

    print("event_type x value-band chi-square cells (independence screen):")
    chi2_cells(
        events.filter(F.col("value").isNotNull()),
        "event_type",
        F.floor(F.col("value") / 100).cast("bigint"),
        "band",
    ).show(10)

    print("value quantile bands (distribution drift baseline):")
    portable_quantile_bands(events, "value").show()

    print("CUSUM level-shift scan over hourly means:")
    cp = cusum_changepoints(events, "ts", "value")
    n_flagged = cp.filter("is_changepoint").count()
    cp.orderBy(F.desc(F.abs(F.col("cusum_micro")))).show(5)
    print(f"bins flagged as level shifts: {n_flagged}")

    print("autocorrelation of hourly means (seasonality screen):")
    acf(events, "ts", "value", lags=(1, 6, 12, 24)).show()

    print("seasonal-naive forecastability (MASE < 1 = daily cycle is real):")
    seasonal_naive_eval(events, "ts", "value").show()

    print("robust trend + Holt-Winters off the ONE shared binned relation:")
    bins = binned_sums(events, "ts", "value").localCheckpoint(eager=False)
    theilsen_from_binned(bins).show()
    holt_winters_from_binned(bins, period=24).orderBy(
        F.desc("bin")
    ).show(5)

    print("round-9 robust tails, SAME shared relation (no extra scans):")
    mad = mad_anomalies_from_binned(bins)
    print(f"MAD-flagged bins: {mad.filter('is_anomaly').count()}")
    kendall_from_binned(bins).show()
    bb = bollinger_from_binned(bins)
    print(
        "Bollinger breaks (up/down):",
        bb.filter("is_upper_break").count(),
        bb.filter("is_lower_break").count(),
    )
    permutation_entropy_from_binned(bins).show()

    print("daily error-share p-chart (SPC control limits):")
    p_chart(events, "ts", F.col("event_type") == "error").show()

    print("view->click lead/lag correlation:")
    lag = lag_correlation(events, "ts", "event_type", "view", "click")
    lag.show()
    return lag


if __name__ == "__main__":
    run(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
