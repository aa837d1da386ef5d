"""Round-9 additions: the drift workbench's streaming twin — one
complete-mode binned-sums aggregate feeding derive-on-read CUSUM and ACF
tails, stream ≡ batch bit-for-bit."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_binned_sums_stream_cusum_equals_batch(spark):
    # the complete-mode bin aggregate holds exact associative sums, so
    # the drained state equals the batch binning in any arrival order,
    # and the cusum tail is shared code over that relation -> the
    # streamed scan reproduces the batch op EXACTLY (integer contract:
    # no floats anywhere to diverge)
    from apache_flink_essentials_spark import load_table
    from apache_flink_essentials_spark.operators.timeseries import (
        cusum_changepoints,
        cusum_from_binned,
    )
    from apache_flink_essentials_spark.streaming.replay import (
        replay_as_stream,
        run_stream_to_df,
    )
    from apache_flink_essentials_spark.streaming.rollup import (
        binned_sums_stream,
    )

    events = load_table(spark, "events", "/root/testdata/sf0.001")
    stream_in = replay_as_stream(events, num_files=3, order_by="ts")
    state = run_stream_to_df(
        binned_sums_stream(stream_in), output_mode="complete"
    )
    streamed = sorted(map(tuple, cusum_from_binned(state).collect()))
    batch = sorted(
        map(tuple, cusum_changepoints(events, "ts", "value").collect())
    )
    assert streamed == batch and len(batch) > 0
    assert any(r[3] is not None for r in batch)


def test_binned_sums_stream_acf_equals_batch(spark):
    # same state relation, second tail: the ACF screen off the drained
    # bin table matches the batch acf bit-for-bit (exact bin sums ->
    # identical doubles through the shared fixed-order tail)
    from apache_flink_essentials_spark import load_table
    from apache_flink_essentials_spark.operators.timeseries import (
        acf,
        acf_from_binned,
    )
    from apache_flink_essentials_spark.streaming.replay import (
        replay_as_stream,
        run_stream_to_df,
    )
    from apache_flink_essentials_spark.streaming.rollup import (
        binned_sums_stream,
    )

    events = load_table(spark, "events", "/root/testdata/sf0.001")
    stream_in = replay_as_stream(events, num_files=3, order_by="ts")
    state = run_stream_to_df(
        binned_sums_stream(stream_in), output_mode="complete"
    )
    lags = (1, 6, 12, 24)
    streamed = sorted(
        map(tuple, acf_from_binned(state, lags=lags).collect())
    )
    batch = sorted(
        map(tuple, acf(events, "ts", "value", lags=lags).collect())
    )
    assert streamed == batch and len(batch) > 0
