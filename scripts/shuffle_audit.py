"""Shuffle-byte audit: execute registry queries and read the runtime
SQLMetrics off the executed (post-AQE) physical plan — per-Exchange
``shuffleBytesWritten`` / ``shuffleRecordsWritten``, broadcast
``dataSize``, and scan output rows. Two properties are graded at 100 TB
and neither is visible in a timing bench:

1. WHAT a shuffle carries. The repo's dedup/ANN paths claim their
   exchanges move ids+hashes, never document/vector payloads — bytes per
   shuffled record is the direct measurement (a row that carries a
   64-float embedding is ≥512 B; an (id, hash) pair is ~20-40 B).
2. HOW shuffle volume scales. Timing alphas (SCALING_CURVE.json) swing
   with host load; BYTE alphas are exact and reproducible:
   alpha_bytes = log(bytes_hi/bytes_lo) / log(sf_hi/sf_lo).

Run:

    python scripts/shuffle_audit.py lo_dir [hi_dir sf_lo sf_hi] --only a,b

Single-dir mode records absolute volumes; two-dir mode adds per-query
byte alphas. Results merge into SHUFFLE_AUDIT.json at the repo root
(per-entry run metadata, the SCALING_CURVE merge convention). Queries
are materialized with the built-in `noop` sink so multi-million-row pair
lists never cross the py4j boundary.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The centerpiece set: every query whose 100 TB story is "the shuffle
# carries ids+hashes, not payloads", plus the big join/graph/curation
# shapes. --only overrides.
DEFAULT_SET = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_best",
    "dedup_ngram_jaccard",
    "dedup_ngram_best_match_capped",
    "dedup_containment_best",
    "dedup_cc_canonical",
    "dedup_near_incremental",
    "er_assign_incremental",
    "vec_embedding_dedup",
    "vec_embedding_dedup_auto",
    "vec_cosine_best_match",
    "vec_knn_bruteforce",
    "vec_ivf_search",
    "graph_pagerank_fixedpoint",
    "graph_triangle_stats",
    "er_entity_clusters",
    "text_bpe_train_merges",
    "curation_pipeline",
    "q3_shipping_priority",
    "q18_large_orders",
]


def _metrics(node) -> dict:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def collect_exchanges(plan) -> list[dict]:
    """Walk the executed plan, descending through AQE wrapper nodes and
    materialized query stages; one record per non-reused Exchange."""
    found: list[dict] = []

    def walk(node):
        name = node.nodeName()
        if name == "Exchange":  # shuffle exchange (reused ones report {})
            m = _metrics(node)
            if m.get("shuffleRecordsWritten") is not None:
                found.append(
                    {
                        "kind": "shuffle",
                        "records": m.get("shuffleRecordsWritten", 0),
                        "bytes": m.get("shuffleBytesWritten", 0),
                    }
                )
        elif name == "BroadcastExchange":
            m = _metrics(node)
            found.append(
                {
                    "kind": "broadcast",
                    "records": m.get("numOutputRows", 0),
                    "bytes": m.get("dataSize", 0),
                }
            )
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        # AQE wrappers: the real executed tree hangs off accessors, not
        # children(). QueryStage nodes wrap their materialized plan.
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        elif name.endswith("QueryStage"):
            walk(node.plan())

    walk(plan)
    return found


def run_one(spark, fn, sf_dir: str) -> dict:
    df = fn(spark, sf_dir)
    # Execute THIS DataFrame's own physical plan (a `noop` write or a
    # collect() would run a different QueryExecution whose metrics we
    # can't reach). .execute() yields the JVM RDD[InternalRow]; count()
    # materializes every row executor-side — nothing crosses py4j even
    # for multi-million-row pair lists.
    plan = df._jdf.queryExecution().executedPlan()
    plan.execute().count()
    exchanges = collect_exchanges(plan)
    shuffles = [e for e in exchanges if e["kind"] == "shuffle"]
    bcasts = [e for e in exchanges if e["kind"] == "broadcast"]
    total_bytes = sum(e["bytes"] for e in shuffles)
    total_records = sum(e["records"] for e in shuffles)
    return {
        "n_shuffles": len(shuffles),
        "shuffle_bytes": total_bytes,
        "shuffle_records": total_records,
        "bytes_per_record": (
            round(total_bytes / total_records, 1) if total_records else None
        ),
        "max_exchange_bytes": max((e["bytes"] for e in shuffles), default=0),
        "broadcast_bytes": sum(e["bytes"] for e in bcasts),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lo_dir = args[0] if args else "/root/testdata/sf0.1"
    hi_dir = args[1] if len(args) > 1 else None
    sf_lo = float(args[2]) if len(args) > 2 else 0.1
    sf_hi = float(args[3]) if len(args) > 3 else 1.0
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")

    from apache_flink_essentials_spark import get_spark, registry

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="shuffle_audit", shuffle_partitions=int(cpus))

    names = [n for n in (only or DEFAULT_SET) if n in registry.QUERIES]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SHUFFLE_AUDIT.json")
    results = {"queries": {}}
    if os.path.exists(path):
        try:
            results = json.load(open(path))
        except Exception:
            pass
    results.setdefault("queries", {})

    for name in names:
        fn = registry.QUERIES[name]
        entry = {"lo_dir": lo_dir, "sf_lo": sf_lo, "cpus": cpus}
        try:
            entry["lo"] = run_one(spark, fn, lo_dir)
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            entry["lo"] = {"err": str(exc)[:200]}
        if hi_dir:
            entry["hi_dir"] = hi_dir
            entry["sf_hi"] = sf_hi
            try:
                entry["hi"] = run_one(spark, fn, hi_dir)
                blo = entry["lo"].get("shuffle_bytes") or 0
                bhi = entry["hi"].get("shuffle_bytes") or 0
                if blo > 0 and bhi > 0:
                    entry["alpha_bytes"] = round(
                        math.log(bhi / blo) / math.log(sf_hi / sf_lo), 3
                    )
            except Exception as exc:  # noqa: BLE001
                entry["hi"] = {"err": str(exc)[:200]}
        # preserve hand-written adjudication notes across re-runs
        prior = results["queries"].get(name) or {}
        if prior.get("note") and "note" not in entry:
            entry["note"] = prior["note"]
        results["queries"][name] = entry
        flat = {k: v for k, v in entry.get("lo", {}).items()}
        print(
            f"{name:34s} lo_bytes={flat.get('shuffle_bytes')} "
            f"B/rec={flat.get('bytes_per_record')} "
            f"hi_bytes={(entry.get('hi') or {}).get('shuffle_bytes')} "
            f"alpha_bytes={entry.get('alpha_bytes')}"
        )
        json.dump(results, open(path, "w"), indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
