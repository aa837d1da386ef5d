"""Runnable jobs — one per reference entry point (SURVEY §2.7 X4):

  data_streams.py            ≙ DataStreams.scala (fizzbuzz ETL + file sink)
  transformations.py         ≙ Transformations.scala (map/flatMap/keyBy/reduce)
  window_functions_job.py    ≙ WindowFunctions.scala (all window styles)
  time_based.py              ≙ TimeBasedTransformations.scala (event vs processing time)
  multiple_streams.py        ≙ MultipleStreams.scala (union/joins/connect)
  triggers.py                ≙ Triggers.scala (count/purging triggers, streaming)

Run: ``python -m examples.data_streams`` etc. Batch jobs print results;
streaming jobs run a bounded replay (availableNow) so they terminate.
"""
