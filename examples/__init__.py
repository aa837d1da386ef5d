"""Runnable jobs — one per reference entry point (SURVEY §2.7 X4):

  data_streams.py            ≙ DataStreams.scala (fizzbuzz ETL + file sink)
  transformations.py         ≙ Transformations.scala (map/flatMap/keyBy/reduce)
  window_functions_job.py    ≙ WindowFunctions.scala (all window styles)
  time_based.py              ≙ TimeBasedTransformations.scala (event vs processing time)
  multiple_streams.py        ≙ MultipleStreams.scala (union/joins/connect)
  triggers.py                ≙ Triggers.scala (count/purging triggers, streaming)

North-star extensions (no reference counterpart — SURVEY §2.10):

  llm_pipeline.py            quality gate → dedup → near-dedup → token accounting
  similarity_search.py       KNN / LSH / IVF over the embeddings table
  curation_advanced.py       mixtures, packing, curriculum, contrastive pairs
  lakehouse_pipeline.py      CDC snapshot/SCD2/point-in-time
  experiment_analytics.py    attribution, A/B z-test, percentiles
  continuous_rollup_job.py   incremental OLAP rollup
  curation_rules_and_pq.py   Gopher rules → paragraph dedup → dataset card →
                             perplexity buckets; IVF-PQ index/search + recall
  tokenizer_design.py        vocab coverage sweep → OOV audit → BPE train →
                             segmentation compression
  drift_monitoring.py        Benford / chi-square / quantile-band / CUSUM /
                             lag-correlation drift screens

Run: ``python -m examples.data_streams`` etc. Batch jobs print results;
streaming jobs run a bounded replay (availableNow) so they terminate.
"""
