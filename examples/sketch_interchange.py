"""Sketch-interchange rollup: per-day HLL partials at ingest, merged
range queries later — without rescanning the data.

The lakehouse cardinality pattern (Apache DataSketches' core argument):
pass 1 writes a tiny per-day sketch-partial table alongside the raw
events; pass 2 answers "distinct users over any date range" by merging
the stored partials for that range. Two sketch families side by side:

* Spark's native HLL++ (``hll_sketch_agg``/``hll_union_agg``, binary
  sketch column) — fastest, JVM-internal format;
* the portable integer-register sketch (``portable_hll_partials``/
  ``portable_hll_merge``) — bit-reproducible by ANY SQL engine, so the
  partial table is an interchange format, and ``merge(daily partials)``
  equals the one-shot estimate EXACTLY (integer maxima — asserted
  below, and pinned in tests/test_sketches_interchange.py).

    python -m examples.sketch_interchange [sf_dir]
"""

import sys
import tempfile

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark, load_table
from apache_flink_essentials_spark.operators.sketches import (
    hll_merge,
    hll_sketch_partials,
    portable_hll_distinct,
    portable_hll_merge,
    portable_hll_partials,
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="sketch-interchange")
    events = load_table(spark, "events", sf).withColumn(
        "day", F.to_date("ts")
    )

    # ---- pass 1: ingest-time rollup — write per-day sketch partials
    store = tempfile.mkdtemp(prefix="sketch_rollup_")
    portable_hll_partials(events, "user_id", keys=["day"]).write.mode(
        "overwrite"
    ).parquet(f"{store}/portable")
    hll_sketch_partials(events, "user_id", keys=["day"]).write.mode(
        "overwrite"
    ).parquet(f"{store}/native")
    print(f"partials written under {store}")

    # ---- pass 2: merged range query over the STORED partials only
    stored = spark.read.parquet(f"{store}/portable")
    merged = portable_hll_merge(stored)  # whole range, no day key
    one_shot = portable_hll_distinct(events, "user_id")
    m = merged.collect()[0]
    o = one_shot.collect()[0]
    print(f"portable merged estimate:  {m.hll_distinct:.1f}")
    print(f"portable one-shot:         {o.hll_distinct:.1f}")
    assert (m.register_sum, m.v_empty, m.hll_distinct) == (
        o.register_sum,
        o.v_empty,
        o.hll_distinct,
    ), "portable merge must equal one-shot EXACTLY"

    native = hll_merge(
        spark.read.parquet(f"{store}/native"), "hll_user_id"
    ).collect()[0]
    exact = events.select("user_id").distinct().count()
    print(f"native HLL++ merged:       {native.estimate}")
    print(f"exact distinct users:      {exact}")


if __name__ == "__main__":
    main()
