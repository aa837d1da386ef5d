"""Option-plumbing tests for the external connector wrappers (Kafka/JDBC/
Cassandra). No broker/cluster exists in this environment, so these verify
the exact format + options each wrapper hands to Spark via recorder stubs —
the part of the wrapper we own; the data path belongs to the connector."""

from __future__ import annotations

from apache_flink_essentials_spark import io


class _Recorder:
    """Stands in for DataFrameReader/Writer, recording the builder chain."""

    def __init__(self):
        self.calls: dict = {"options": {}}

    def format(self, fmt):
        self.calls["format"] = fmt
        return self

    def option(self, k, v):
        self.calls["options"][k] = v
        return self

    def options(self, **kw):
        self.calls["options"].update(kw)
        return self

    def mode(self, m):
        self.calls["mode"] = m
        return self

    def load(self):
        self.calls["loaded"] = True
        return self

    def save(self):
        self.calls["saved"] = True


class _FakeSession:
    def __init__(self, reader):
        self.read = reader


class _FakeDF:
    def __init__(self, writer):
        self.write = writer


def test_read_cassandra_plumbing():
    rec = _Recorder()
    io.read_cassandra(
        _FakeSession(rec), "ks", "events", **{"spark.cassandra.connection.host": "h1"}
    )
    assert rec.calls["format"] == io.CASSANDRA_FORMAT
    assert rec.calls["options"]["keyspace"] == "ks"
    assert rec.calls["options"]["table"] == "events"
    assert rec.calls["options"]["spark.cassandra.connection.host"] == "h1"
    assert rec.calls["loaded"]


def test_write_cassandra_plumbing():
    rec = _Recorder()
    io.write_cassandra(_FakeDF(rec), "ks", "out_table", mode="overwrite")
    assert rec.calls["format"] == io.CASSANDRA_FORMAT
    assert rec.calls["options"] == {"keyspace": "ks", "table": "out_table"}
    assert rec.calls["mode"] == "overwrite"
    assert rec.calls["saved"]


def test_read_jdbc_partitioned_plumbing():
    rec = _Recorder()
    io.read_jdbc(
        _FakeSession(rec), "jdbc:postgresql://db/x", "orders",
        num_partitions=16, partition_column="o_orderkey",
        lower_bound=1, upper_bound=100000,
    )
    opts = rec.calls["options"]
    assert rec.calls["format"] == "jdbc"
    assert opts["dbtable"] == "orders"
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "16"
    assert rec.calls["loaded"]


def test_load_table_memoizes_per_session_and_path(spark):
    from apache_flink_essentials_spark.io import load_table

    a = load_table(spark, "region", "/root/testdata/sf0.001")
    b = load_table(spark, "region", "/root/testdata/sf0.001")
    c = load_table(spark, "region", "/root/testdata/sf0.01")
    assert a is b                    # same session+path -> same plan object
    assert a is not c                # different sf dir -> fresh plan
    assert a.count() > 0 and c.count() > 0


# ---- real end-to-end JDBC round-trip (embedded Derby — the one JDBC
# driver Spark itself ships, so this runs in any Spark install with no
# external server): proof-of-life for the full option plumbing through
# Spark's actual JDBC source/sink, not a recorder. Fails if our wrapper's
# option names (url/dbtable/driver/partitionColumn/bounds) rot.
_DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_roundtrip_embedded_derby(spark):
    url = "jdbc:derby:memory:cx_roundtrip;create=true"
    src = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(50)], "id bigint, name string"
    )
    io.write_jdbc(src, url, "t_roundtrip", mode="overwrite", driver=_DERBY)
    back = io.read_jdbc(spark, url, "t_roundtrip", driver=_DERBY)
    rows = sorted((r.id, r.name) for r in back.collect())
    assert rows == [(i, f"name_{i}") for i in range(50)]


def test_jdbc_partitioned_read_embedded_derby(spark):
    # the scale path: partitionColumn + bounds must produce a multi-split
    # scan that still returns every row exactly once
    url = "jdbc:derby:memory:cx_part;create=true"
    src = spark.createDataFrame([(i, i * 2) for i in range(100)], "id bigint, v bigint")
    io.write_jdbc(src, url, "t_part", mode="overwrite", driver=_DERBY)
    back = io.read_jdbc(
        spark, url, "t_part",
        num_partitions=4, partition_column="id",
        lower_bound=0, upper_bound=100, driver=_DERBY,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg({"v": "sum"}).collect()[0][0] == sum(i * 2 for i in range(100))


def test_kafka_wrapper_reaches_spark_source_lookup(spark):
    # no kafka connector jar in this environment BY DESIGN — assert the
    # wrapper hands the exact 'kafka' format to Spark's data-source
    # lookup (the error names it), which is the boundary we own; with the
    # jar on the classpath the same call would connect.
    import pytest

    with pytest.raises(Exception) as ei:
        io.read_kafka(spark, "host:9092", "topic", streaming=False)
    msg = str(ei.value)
    assert "kafka" in msg.lower()
    assert "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg


# ---- Kafka proof-of-life against Spark's REAL source resolution -------------
#
# No broker or spark-sql-kafka jar exists in this sandbox, so the data path
# cannot run. What CAN be proven without either: Spark's DataSource
# resolution special-cases the provider name "kafka" (it raises the
# dedicated "Structured Streaming + Kafka Integration Guide" AnalysisException
# instead of the generic [DATA_SOURCE_NOT_FOUND] SparkClassNotFoundException
# every other unknown format gets). Driving read_kafka/write_kafka into that
# branch proves the wrappers reach Spark's actual resolution path with the
# exact provider name the Kafka connector registers — a typo'd format string
# fails these tests with the generic error. Option-NAME validation lives in
# the connector jar itself and stays covered by the recorder tests above.

import pytest as _pytest

import re as _re

_KAFKA_GUIDE_MSG = "Structured Streaming + Kafka Integration Guide"
_KAFKA_GUIDE_RE = _re.escape(_KAFKA_GUIDE_MSG)


def test_read_kafka_streaming_hits_spark_kafka_resolution(spark):
    from pyspark.errors import AnalysisException

    with _pytest.raises(AnalysisException, match=_KAFKA_GUIDE_RE):
        io.read_kafka(spark, "localhost:9092", "events", streaming=True)


def test_read_kafka_batch_hits_spark_kafka_resolution(spark):
    from pyspark.errors import AnalysisException

    with _pytest.raises(AnalysisException, match=_KAFKA_GUIDE_RE):
        io.read_kafka(spark, "localhost:9092", "events", streaming=False)


def test_write_kafka_hits_spark_kafka_resolution(spark, tmp_path):
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    df = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(F.col("value").cast("string").alias("value"))
    )
    with _pytest.raises(AnalysisException, match=_KAFKA_GUIDE_RE):
        q = io.write_kafka(
            df, "localhost:9092", "events", str(tmp_path / "ckpt")
        )
        q.awaitTermination(30)


def test_bogus_format_gets_generic_error_not_kafka_branch(spark):
    """Control: a non-kafka unknown format raises the GENERIC missing-
    provider error — proving the kafka-specific message above is real
    resolution-branch signal, not a catch-all."""
    with _pytest.raises(Exception) as ei:
        spark.read.format("kafka-definitely-not").load()
    assert "DATA_SOURCE_NOT_FOUND" in str(ei.value)
    assert _KAFKA_GUIDE_MSG not in str(ei.value)


# ---------------------------------------------------------------------------
# Cassandra proof-of-life (r12, VERDICT item 5). No connector jar or cluster
# exists here, but Spark 4's PYTHON data source API lets us register a real
# DataSource under the EXACT provider name the wrappers use
# ("org.apache.spark.sql.cassandra"). The wrappers then drive Spark's actual
# DataSource resolution, schema plumbing, and executor-side read/write paths
# end-to-end: rows written by write_cassandra land in a keyspace/table-keyed
# store and come back byte-identical through read_cassandra. A typo'd format
# string fails resolution (control test below) — which is the CI property
# the recorder stubs could never give.
# ---------------------------------------------------------------------------

_CASSANDRA_SCHEMA = "k int, v string"


def _fake_cassandra_source():
    # everything defined in FUNCTION scope: cloudpickle then serializes the
    # classes BY VALUE, so executor-side Python workers never need to
    # import this test module
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )

    class FakeCassandraReader(DataSourceReader):
        def __init__(self, options):
            self.options = options

        def partitions(self):
            # two token ranges — proves multi-partition planning, not a
            # single-task escape hatch
            return [InputPartition(0), InputPartition(1)]

        def read(self, partition):
            import glob
            import json
            import os

            base = os.path.join(
                self.options["path"],
                self.options["keyspace"],
                self.options["table"],
            )
            for fp in sorted(glob.glob(os.path.join(base, "*.jsonl"))):
                for i, line in enumerate(open(fp)):
                    if i % 2 == partition.value:
                        row = json.loads(line)
                        yield (row["k"], row["v"])

    class FakeCassandraWriter(DataSourceWriter):
        def __init__(self, options):
            self.options = options

        def write(self, iterator):
            import json
            import os
            import uuid

            base = os.path.join(
                self.options["path"],
                self.options["keyspace"],
                self.options["table"],
            )
            os.makedirs(base, exist_ok=True)
            out = os.path.join(base, uuid.uuid4().hex + ".jsonl")
            with open(out, "w") as f:
                for row in iterator:
                    f.write(json.dumps({"k": row.k, "v": row.v}) + "\n")
            return WriterCommitMessage()

    class FakeCassandraSource(DataSource):
        @classmethod
        def name(cls):
            return io.CASSANDRA_FORMAT

        def schema(self):
            return _CASSANDRA_SCHEMA

        def reader(self, schema):
            return FakeCassandraReader(self.options)

        def writer(self, schema, overwrite):
            return FakeCassandraWriter(self.options)

    return FakeCassandraSource


def test_cassandra_wrappers_roundtrip_through_spark_resolution(
    spark, tmp_path
):
    spark.dataSource.register(_fake_cassandra_source())
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], _CASSANDRA_SCHEMA
    )
    io.write_cassandra(
        df, "ks1", "events", path=str(tmp_path)
    )
    back = io.read_cassandra(spark, "ks1", "events", path=str(tmp_path))
    assert sorted(map(tuple, back.collect())) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d")
    ]
    # keyspace/table really keyed the store (not ignored options)
    import os

    assert os.path.isdir(os.path.join(str(tmp_path), "ks1", "events"))
    # a second keyspace is isolated
    io.write_cassandra(df.limit(1), "ks2", "events", path=str(tmp_path))
    assert (
        io.read_cassandra(spark, "ks2", "events", path=str(tmp_path)).count()
        == 1
    )
    assert (
        io.read_cassandra(spark, "ks1", "events", path=str(tmp_path)).count()
        == 4
    )


def test_cassandra_streaming_sink_roundtrip(spark, tmp_path):
    spark.dataSource.register(_fake_cassandra_source())
    from apache_flink_essentials_spark.streaming.replay import (
        replay_as_stream,
    )

    df = spark.createDataFrame(
        [(i, chr(97 + i)) for i in range(6)], _CASSANDRA_SCHEMA
    )
    q = io.write_stream_cassandra(
        replay_as_stream(df, num_files=3),
        "ks_stream",
        "sink_table",
        str(tmp_path / "ckpt"),
        path=str(tmp_path / "store"),
    )
    q.processAllAvailable()
    q.stop()
    back = io.read_cassandra(
        spark, "ks_stream", "sink_table", path=str(tmp_path / "store")
    )
    assert back.count() == 6


def test_cassandra_typo_format_fails_resolution(spark):
    """Control: the round-trip above proves the REGISTERED name resolves;
    this proves an unregistered (typo'd) provider still fails — i.e. the
    wrapper's format string is load-bearing in CI."""
    import pytest as _p

    with _p.raises(Exception) as ei:
        spark.read.format(io.CASSANDRA_FORMAT + ".typo").options(
            keyspace="k", table="t"
        ).load()
    assert "DATA_SOURCE_NOT_FOUND" in str(ei.value) or "Failed to find" in str(
        ei.value
    )
