"""Z-order layout: the Morton index interleaves bit planes correctly, and a
Z-ordered rewrite tightens per-file min/max boxes on BOTH dimensions vs a
single-column sort — the property that buys multi-column row-group skipping."""

import glob

from pyspark.sql import functions as F

from apache_flink_essentials_spark import io as IO


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0b101, 0b011)], "x long, y long"
    ).select(IO.zorder_value_expr(["x", "y"], bits=3).alias("z"))
    # x owns even bits (1,0,1), y odd bits (0,1,1) → z bits 543210 = 011011
    # wait: bit b of x → position 2b; of y → 2b+1:
    # x=101: z bits 0,4 set; y=011: z bits 1,3 set → 0b011011 = 27
    assert df.collect()[0].z == 0b011011


def _file_boxes(spark, path):
    boxes = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        r = spark.read.parquet(f).agg(
            F.min("user_id"), F.max("user_id"),
            F.min("value"), F.max("value"),
        ).collect()[0]
        boxes.append((r[0], r[1], r[2], r[3]))
    return boxes


def test_zorder_write_tightens_boxes(spark, events, tmp_path):
    df = events.select("user_id", "value")
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "l")
    IO.zorder_write(df, zpath, ["user_id", "value"], num_files=8, bits=8)
    # baseline: same file count, sorted on user_id only
    (df.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
       .write.mode("overwrite").parquet(lpath))

    # lossless rewrite
    assert spark.read.parquet(zpath).count() == df.count()
    zb, lb = _file_boxes(spark, zpath), _file_boxes(spark, lpath)
    assert len(zb) == 8 and len(lb) == 8

    def touched(boxes, ulo, uhi, vlo, vhi):
        return sum(
            1 for (u0, u1, v0, v1) in boxes
            if u1 >= ulo and u0 <= uhi and v1 >= vlo and v0 <= vhi
        )

    # value-only range queries: a user_id sort constrains nothing — every
    # file's value range spans the query; the curve must actually skip
    v_queries = [(10, 20), (40, 60), (100, 150), (250, 300)]
    z_v = sum(touched(zb, -1, 1 << 60, lo, hi) for lo, hi in v_queries)
    l_v = sum(touched(lb, -1, 1 << 60, lo, hi) for lo, hi in v_queries)
    assert z_v < l_v, (z_v, l_v)

    # single-user queries: the curve gives up SOME user locality but must
    # stay bounded (≈ half the files), not degrade to scan-everything
    users = range(15)
    z_u = sum(touched(zb, u, u, -1e18, 1e18) for u in users) / len(users)
    assert z_u <= 5.5, z_u
