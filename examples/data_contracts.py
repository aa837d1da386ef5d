"""Data-contract audit suite — the screens a warehouse runs on every
ingest before downstream jobs trust the tables: referential integrity
(orphan foreign keys), primary-key uniqueness, functional dependencies
(hierarchy/surrogate-key sanity via the exact g3 repair size), schema
drift, and freshness. Extension tier (SURVEY §2.10) — the reference has
no audit surface; these are the batch contracts its streaming jobs
would assume.

Every audit is aggregate-sized output over map-side-combined hash aggs;
see each operator's docstring for the 100 TB shape.
"""

import os

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark
from apache_flink_essentials_spark.io import load_table
from apache_flink_essentials_spark.operators import profiling as P

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def run(spark=None):
    spark = spark or get_spark("example-data-contracts")
    li = load_table(spark, "lineitem", SF_DIR)
    o = load_table(spark, "orders", SF_DIR)
    c = load_table(spark, "customer", SF_DIR)
    n = load_table(spark, "nation", SF_DIR)
    p = load_table(spark, "part", SF_DIR)
    ev = load_table(spark, "events", SF_DIR)

    # 1. referential integrity: every FK edge of the schema in one audit
    ref = P.referential_audit(
        [
            ("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
            ("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
            ("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
        ],
        assume_unique_keys=True,
    )
    ref.show(truncate=False)

    # 2. functional dependencies: does the claimed hierarchy actually hold,
    # and if not, what is the MINIMUM repair (g3 = rows to delete)?
    fds = P.fd_violations(
        p,
        [
            ("part.p_partkey->p_brand", ["p_partkey"], "p_brand"),  # key FD
            ("part.p_brand->p_type", ["p_brand"], "p_type"),  # does NOT hold
        ],
    )
    fds.show(truncate=False)

    # 3. freshness: which sources stopped emitting, which are trickling
    fresh = P.freshness_audit(ev, "ts", "event_type")
    fresh.show(truncate=False)

    # 4. schema drift: null-rate / type-shape movement over ingest time
    drift = P.schema_drift(ev, "ts", ["event_type", "props", "user_id", "value"])
    drift.show(truncate=False)

    # 5. column profile: the null/cardinality read that gates decisions
    prof = P.profile_columns(ev, ["user_id", "event_type", "value"])
    prof.show(truncate=False)

    return ref


if __name__ == "__main__":
    run()
