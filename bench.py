"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints TWO JSON lines — a verbose diagnostics line first, then the
compact canonical record LAST (the driver keeps only a bounded tail of
stdout, so the parseable record must be the final, small line):
  {"metric": "headline_queries_detail", "spread": {...},
   "cold_total": ..., "cold_queries": {...}, "sf": ...}
  {"metric": "headline_queries_total", "value": total_sec,
   "unit": "sec", "queries": {name: median_sec_of_STEADY_RUNS, ...},
   "sf": ..., "ingest_rps": ...,
   "vs_prev": {"baseline": file, "total_ratio": r,
               "regressions": {name: ratio > 1.3}}}

``vs_prev`` compares against the newest BENCH_r*.json in the repo
root over the queries both rounds ran, so round-over-round
regressions are visible without manual diffing.

Queries are materialized with a noop write (full computation, no
driver-side result transfer) after a session warm-up, so timings
reflect plan execution, not JVM startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from generic_data_ingestor_framework_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_left_agg",
    "agg_having_distinct",
    "window_rank",
    "top_k_per_group",
    "window_tumbling_hourly",
    "session_window_10m",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "token_stats",
    "json_funcs",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q18_large_volume_customers",
    "q21_suppliers_kept_waiting",
    "ann_ivf_topk",
    "tfidf_top_terms",
    "events_asof_join",
    "nb_lang_confusion",
    "nb_holdout_confusion",
    "cms_heavy_hitters",
    "decontaminate_against_benchmark",
    "pack_context_windows",
    "chunk_documents_overlap",
    "paragraph_dedup_corpus",
    "lm_unigram_score",
    "span_duplication_ratio",
    "bpe_vocab_topk",
    "source_reputation",
    "retrieval_rrf_fusion",
    "corpus_select_budget",
    "remove_duplicated_spans",
    "ann_quantized_rerank",
    "dedup_keep_best_quality",
    "shard_export_assignment",
    "user_activity_islands",
    "funnel_conversion",
    "cohort_retention",
    "ann_pq_topk",
    "lm_bigram_score",
    "events_rolling_zscore",
    "graph_triangle_count",
    "quality_weighted_sample",
    "doc_topgram_mass",
    "dedup_minhash_accuracy",
    "ann_ivf_pq_topk",
    "events_range_window_1h",
    "tfidf_cosine_pairs",
    "lsh_scurve_audit",
    "classifier_agreement_kappa",
]

REGRESSION_RATIO = 1.3
STEADY_RUNS = 5  # report per-query medians; 5 runs so one JIT/GC-warming
                 # run right after the cold pass cannot drag the median
                 # (run-to-run machine variance is large on sub-second
                 # queries — see COVERAGE.md Benchmarks)


def _vs_prev(times: dict[str, float], total: float) -> dict | None:
    """Diff against the most recent PARSEABLE recorded round (walking
    back past rounds whose record lost its medians, e.g. BENCH_r05.json
    where the driver's tail window truncated the line head)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    prior = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    for baseline_file in reversed(prior):
        result = _vs_one(times, baseline_file)
        if result is not None:
            return result
    return None


def _vs_one(times: dict[str, float], baseline_file: str) -> dict | None:
    try:
        with open(baseline_file) as fh:
            prev = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None
    # the driver wraps the bench line in {"parsed": {...}, ...}; when
    # console noise pushed the JSON line out of the driver's tail window
    # "parsed" is null — recover the line from the raw "tail" string
    parsed = prev.get("parsed", prev) or {}
    if "queries" not in parsed and isinstance(prev.get("tail"), str):
        tail = prev["tail"].strip()
        # prefer the LAST `{"metric": ...}` line (the canonical compact
        # record); fall back to any metric line, then to a head-truncated
        # line starting mid-object at "value"
        lines = [ln for ln in tail.splitlines() if '"metric"' in ln]
        candidate = None
        if lines:
            m2 = re.search(r'\{"metric":.*\}', lines[-1])
            candidate = m2.group(0) if m2 else None
        if candidate is None and tail.startswith('"value"'):
            candidate = '{"metric": null,' + tail  # head cut off mid-line
        if candidate:
            try:
                parsed = json.loads(candidate)
            except json.JSONDecodeError:
                parsed = {}
    prev_q = parsed.get("queries", {})
    common = [n for n in times if n in prev_q and prev_q[n] > 0]
    if not common:
        return None
    ratios = {n: round(times[n] / prev_q[n], 3) for n in common}
    prev_total = sum(prev_q[n] for n in common)
    cur_total = sum(times[n] for n in common)
    return {
        "baseline": os.path.basename(baseline_file),
        "total_ratio": round(cur_total / prev_total, 3) if prev_total else None,
        "regressions": {n: r for n, r in sorted(ratios.items()) if r > REGRESSION_RATIO},
        "common_queries": len(common),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark("bench")
    # bench per-member (composites would hide per-query timings)
    qs = entry_mod.member_queries()

    # warm up: JVM + parquet footer caches
    spark.range(1000).count()

    cold: dict[str, float] = {}
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        # steady-state: post-warmup runs exclude one-time codegen
        # compilation and parquet footer reads (what a resident cluster
        # sees). Machine noise is large on this box, so report the
        # MEDIAN of STEADY_RUNS runs plus the min/max spread.
        runs = []
        for _ in range(STEADY_RUNS):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        times[name] = sorted(runs)[len(runs) // 2]
        spread[name] = [min(runs), max(runs)]

    # release query-phase persisted intermediates so ingest throughput
    # is measured without sf0.1 relations occupying storage memory
    from generic_data_ingestor_framework_spark import clear_caches

    clear_caches()
    ingest_rps = _bench_ingest(spark)

    total = round(sum(times.values()), 3)
    # Two lines, verbose first, canonical LAST. The driver records only a
    # bounded TAIL of stdout; round 5's single ~4 KB line outgrew that
    # window and lost its head (including every median), leaving the
    # official record unparseable (BENCH_r05.json parsed: null). The
    # bulky diagnostics (per-query min/max spread, cold first-run times)
    # go on their own leading line; the final line is the compact
    # canonical record — metric/value/queries/vs_prev — small enough
    # (~1.5 KB at 30 queries) to always sit fully inside the tail window.
    print(
        json.dumps(
            {
                "metric": "headline_queries_detail",
                "spread": spread,
                "cold_total": round(sum(cold.values()), 3),
                # per-query first-run times: a regression visible in cold
                # but not in `queries` is plan-compilation cost, not
                # execution cost
                "cold_queries": cold,
                "sf": sf,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "ingest_rps": ingest_rps,
                "vs_prev": _vs_prev(times, total),
            }
        )
    )


def _bench_ingest(spark, n_files: int = 16, rows_per_file: int = 4000) -> float:
    """Directory-ingest throughput (records/sec), comparable to the
    reference's claimed 30,786 rec/s batch-insert rate
    (`sqlite_connector.py:173-175`) — ours measures the FULL pipeline:
    scan → distributed JSON parse → normalize → lineage → count."""
    import shutil
    import tempfile

    from generic_data_ingestor_framework_spark.ingest import ingest_directory

    d = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        for f in range(n_files):
            rows = [
                json.dumps(
                    {
                        "id": f * rows_per_file + i,
                        "name": f"user_{i}",
                        "attrs": {"grp": i % 7, "flag": i % 2 == 0},
                        "tags": ["a", "b"] if i % 3 else [],
                    }
                )
                for i in range(rows_per_file)
            ]
            with open(f"{d}/part_{f}.json", "w") as fh:
                fh.write("[" + ",".join(rows) + "]")
        t0 = time.time()
        df, report = ingest_directory(spark, d, mode="bulk")
        n = df.count()
        dt = time.time() - t0
        return round(n / dt, 1)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
