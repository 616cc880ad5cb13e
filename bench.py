"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ...}.

Timing = full query execution into a noop sink: every output column
is materialized (a bare count() would let the optimizer prune computed
columns and time little more than the scan), nothing is collected to
the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, heaviest-representative first.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    "join_flagship_revenue",
    "join_left_outer",
    "join_asof",
    "agg_rollup",
    "agg_distinct_multi",
    "window_topk_per_group",
    "window_running_sum",
    "sessionize",
    "dedup_exact_keep_first",
    "dedup_minhash_lsh",
    "dedup_cluster_canonical",
    "sim_topk_bruteforce",
    "sim_ann_lsh",
    "text_token_stats",
    "text_bigram_topk",
    "text_tfidf_topk",
    "text_segment_dedup",  # round-6: corpus-wide segment dedup + reassembly
    "decontaminate_bloom",  # round-6: zero-shuffle Bloom decontamination
    "corpus_clean_pipeline",
    "mm_feature_extract",
    # round-7: the heavy ML-shaped operators were invisible to the
    # bench (a regression in the k-means aggregate or the multi-probe
    # explode could slip through round-over-round) — headline them
    "embedding_kmeans",  # iterative Lloyd: per-iteration agg cost
    "dedup_semdedup",  # trained cells + multi-probe + exact verify + CC
    "quality_classifier_score",  # in-engine GD training + scoring pass
]


def _materialize(df) -> None:
    """Execute the query with all output columns materialized."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("bench")
    queries = registry.queries()
    # warm the session outside the timed region: JVM/codegen (q1) and
    # the Python/Arrow worker pool (any pandas-UDF query)
    _materialize(queries["q1_pricing_summary"](spark, SF_DIR))
    _materialize(queries["mm_feature_extract"](spark, SF_DIR))

    # best-of-3 per query: single-run numbers on a shared local JVM
    # carry GC/compilation noise of ±50% — round-4's best-of-2 still
    # overstated dedup_minhash_lsh by 2.2× when both runs landed slow;
    # the minimum of three runs tracks the query's actual cost
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            # time the CALLABLE too, not just the final materialize:
            # multi-consumer operators storage-checkpoint intermediate
            # stages eagerly inside the call (plans/stage.py), and that
            # work belongs in the query's reported cost
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            _materialize(df)
            best = min(best, time.perf_counter() - t0)
            # defensive: no operator persists anymore (stage checkpoints
            # replaced operator-scope caches), but keep later timings
            # isolated from anything a future query might cache
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    # best-effort: an env-overridden SF_DIR without an 'sf<num>'
    # suffix must not crash AFTER the whole benchmark ran — the one
    # JSON line below is the driver contract and must always print
    tail = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf: float | str = float(tail)
    except ValueError:
        sf = SF_DIR
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
