#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (the driver records only the last ~2000
chars of stdout — round 7's record was lost to an oversized line):
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
and writes the full record (3dp timings, per-run spreads, regression
table, full chaos artifacts) to BENCH_DETAIL_r{N}.json.

Methodology (round 9): each headline query runs MEDIAN-OF-3
($SPARK_GRAFT_BENCH_REPS to override) — three rounds running, the
single-run-per-query record produced 20-35% "regressions" that later
re-measured at their old medians (shared-host noise); the median kills
that false-alarm class at the cost of ~3× bench wall time. Min/max per
query go to the DETAIL record so genuine variance stays visible. The
stateful streaming queries run as a separate ``streaming_suite_seconds``
metric (single run — their cost is micro-batch startup machinery, flat
in SF) so regressions in the stateful path are visible round-over-round
without swamping the SF-comparable headline total.

Each query executes to completion (collect or count — full plan
execution, not lazy). The CDC apply throughput maps to the reference's
end-to-end rows/s envelope (BASELINE.md: ≥~1,333 rows/s sustained).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pg2any_spark.plans.queries import QUERIES  # noqa: E402
from pg2any_spark.session import get_spark  # noqa: E402

#: Headline set: CDC apply path, scan-agg, multi-way joins, window,
#: set op, events aggs, dedup family, similarity, text, multimodal.
HEADLINE = [
    "cdc_apply_customer",
    "cdc_apply_orders_full_identity",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "topk_customers_by_revenue",
    "window_top_orders_per_customer",
    "events_daily_by_type",
    "dedup_exact_recrawl",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk_bruteforce",
    "ann_ivf_topk",
    "text_stats_documents",
    "media_metadata",
    "cdc_debezium_envelope",
    "token_hist_by_lang",
    "ivf_kmeans_refined_centroids",
    # round 3: SCD2 history build; keyless binned range join
    "scd2_customer_history",
    "range_join_error_purchase_global",
    # round 4: single-shuffle funnel, dieted TF-IDF, dedup-stack QA
    "funnel_view_click_purchase",
    "tfidf_top_terms_per_doc",
    "dedup_lexical_semantic_agreement",
    # round 4b: incremental dedup probe, LM quality scoring, filter funnel
    "dedup_incremental_index",
    "lm_bigram_perplexity",
    "corpus_filter_funnel",
    # round 5: capped LSH (boilerplate defense), line-level dedup,
    # audio feature extraction
    "dedup_lsh_hot_cap",
    "line_dedup_c4",
    "media_audio_features",
    # round 5b: full wire path (pgoutput encode -> segment decode -> apply)
    "cdc_apply_pgoutput",
    # round 6: unchanged-TOAST merge apply (per-column latest-set
    # aggregate + stored-row fallback join through the wire); PQ ANN
    # (integer-exact asymmetric-distance scan over 8x subquantizers)
    "cdc_apply_toast",
    "pq_ann_topk",
    # round 6b: BM25 inverted-index retrieval; cluster-blocked
    # semantic dedup (SemDeDup)
    "retrieval_bm25_topk",
    "semdedup_cells",
    # round 6c: mid-stream schema evolution through the wire;
    # context-window chunking; count-min sketch frequencies;
    # embedding-space decontamination
    "cdc_apply_schema_evolution",
    "chunk_context_windows",
    "cms_token_frequency",
    "decontaminate_semantic",
    # round 6c cont.: histogram quantiles, KMV cardinality, unicode
    # hygiene, exact-quota sampling
    "hist_quantile_order_value",
    "kmv_distinct_ngrams",
    "clean_unicode_docs",
    "sample_fixed_n_per_lang",
    # round 8: scalable distribution functions (literal-boundary global
    # rank), exact heavy hitters (Misra-Gries + recount), hybrid
    # dense+sparse retrieval (RRF), token-budget selection (global
    # prefix sum), perceptual image dedup (dHash + blocked Hamming)
    "value_distribution_scalable",
    "heavy_hitters_tokens",
    "retrieval_hybrid_rrf",
    "token_budget_selection",
    "media_phash_near_dup",
    # late round 8: exact rank-sum AUC (score-histogram prefix sum),
    # integrity audit, striped shard balancing, embedding dim QA, PMI
    # collocations, bitext margin mining, blocked fuzzy ER, Z-order
    # skipping audit. (sessionize_events_stream stays out like the
    # other slow streaming queries — its ~8 s is micro-batch/state
    # machinery, flat in SF, and would swamp the comparable total.)
    "classifier_auc_exact",
    "integrity_audit_orders",
    "shard_striped_by_size",
    "embedding_dim_stats",
    "collocations_pmi_topk",
    "bitext_margin_mining",
    "er_blocked_fuzzy_parts",
    "zorder_skipping_audit",
    # wave 3: association rules + graph census (interval_join_stream
    # stays out with the other streaming-machinery-bound queries)
    "basket_frequent_pairs",
    "graph_triangle_census",
    # round 9: ExactSubstr dedup — true repeated-span detection
    # (diagonal seed-chaining) and span excision with digest check
    "dedup_exact_substring",
    "dedup_exact_substring_excise",
    # round 9b: asymmetric containment dedup (rare-shingle candidates)
    "dedup_containment",
    # round 10: df-cap report probe (no silent caps) and the 60-bit
    # SimHash scale path (block-key saturation fix)
    "containment_hot_shingles",
    "dedup_simhash_wide_near_pairs",
]

#: Stateful streaming queries, measured as their own suite: the
#: ~10-13 s each is micro-batch startup + state-store machinery (flat
#: in SF), which would swamp the SF-comparable headline total — but
#: hiding them entirely left the stateful path unmeasured (round-8
#: verdict item 6). Single run each; the driver-visible metric is
#: ``streaming_suite_seconds``.
STREAMING = [
    "sessionize_events_stream",
    "interval_join_stream",
]


def _quiet_host_gate() -> tuple[float | None, bool]:
    """Quiet-host gate (tightened round 11 — the round-10 driver record
    passed at loadavg 1.88 yet showed uniform 2-6x inflation vs the
    code-identical quiet run, so 2.0 was proven too lax): loadavg must
    be read BEFORE the suite, not only at exit. Waits up to
    $SPARK_GRAFT_QUIET_WAIT seconds (default 300, poll 10 s) for 1-min
    loadavg <= $SPARK_GRAFT_LOADAVG_MAX (default 0.5); if the host never
    quiets, proceeds but returns contaminated=True so the artifact is
    honestly stamped rather than silently noisy. The pre-gate is the
    first of two independent detectors — the per-query median
    cross-check against the last COMMITTED quiet detail (below) catches
    contention that starts after the gate passes.
    """
    try:
        load = os.getloadavg()[0]
    except OSError:
        return None, False
    limit = float(os.environ.get("SPARK_GRAFT_LOADAVG_MAX", "0.5"))
    budget = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "300"))
    waited = 0.0
    while load > limit and waited < budget:
        print(
            f"# quiet-host gate: loadavg {load:.1f} > {limit} — waiting "
            f"({waited:.0f}/{budget:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(10.0)
        waited += 10.0
        load = os.getloadavg()[0]
    contaminated = load > limit
    if contaminated:
        print(
            f"# quiet-host gate: host never quieted (loadavg {load:.1f}); "
            "artifact will be stamped contaminated=true",
            file=sys.stderr,
        )
    return round(load, 2), contaminated


def _committed_quiet_medians(
    here: str,
) -> tuple[dict[str, float], str | None, object]:
    """(medians, artifact_name, sf) of the newest BENCH_DETAIL committed
    at git HEAD whose own stamp is ``contaminated: false``. Read from
    git, not the working tree — working-tree bench/chaos artifacts are
    routinely rewritten by contended local runs (the exact failure mode
    this guards against). Returns ({}, None, None) outside a git
    checkout."""
    import re as _re
    import subprocess

    try:
        names = subprocess.run(
            ["git", "ls-tree", "--name-only", "HEAD"],
            capture_output=True, text=True, cwd=here, timeout=30,
        ).stdout.split()
    except (OSError, subprocess.SubprocessError):
        return {}, None
    details = sorted(
        (n for n in names if _re.fullmatch(r"BENCH_DETAIL_r\d+\.json", n)),
        key=lambda n: int(n[len("BENCH_DETAIL_r"):-len(".json")]),
    )
    for name in reversed(details):
        try:
            blob = subprocess.run(
                ["git", "show", f"HEAD:{name}"],
                capture_output=True, text=True, cwd=here, timeout=30,
            ).stdout
            rec = json.loads(blob)
        except (OSError, subprocess.SubprocessError, json.JSONDecodeError):
            continue
        if rec.get("contaminated") is False and rec.get("queries"):
            return rec["queries"], name, rec.get("sf")
    return {}, None, None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    detail_sf = float(sf) if sf.replace(".", "").isdigit() else sf
    loadavg_pre, contaminated = _quiet_host_gate()
    spark = get_spark(app_name="pg2any_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen + datasource warm-up so the first measured query
    # doesn't pay session initialization: a trivial codegen plan, plus
    # one read of the 5-row region table to load the Hadoop/parquet
    # reader classes (measured tables stay cold).
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    load_between: list[float] = []
    for name in HEADLINE:
        fn = QUERIES[name]
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)
        spreads[name] = [round(runs[0], 3), round(runs[-1], 3)]
        # loadavg sampled between queries goes to the DETAIL record for
        # forensics; it is NOT a gate by itself — bench's own executors
        # drive the 1-min average to ~10 on local[32], so only the
        # pre-gate and the committed-median drift check can decide
        # contamination.
        try:
            load_between.append(round(os.getloadavg()[0], 2))
        except OSError:
            pass
        print(
            f"# {name}: med={timings[name]:.3f}s "
            f"[{spreads[name][0]:.3f}, {spreads[name][1]:.3f}] rows={n}",
            file=sys.stderr,
        )

    stream_timings: dict[str, float] = {}
    for name in STREAMING:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        stream_timings[name] = round(time.perf_counter() - t0, 3)
        print(
            f"# {name}: {stream_timings[name]:.3f}s rows={n} (streaming)",
            file=sys.stderr,
        )
    streaming_total = round(sum(stream_timings.values()), 3)

    total = round(sum(timings.values()), 3)
    # Per-query delta vs the latest parseable prior round: a real
    # regression becomes visible THE ROUND IT HAPPENS instead of two
    # rounds later in a judge diff. Only queries drifting >=20% AND
    # >=0.2s are listed (below that is local[32] noise); advisory —
    # the headline metric is unchanged.
    import glob as _glob

    here = os.path.dirname(os.path.abspath(__file__))
    prior, prior_name = {}, None

    import re as _re

    def _round_of(path: str) -> tuple[int, int]:
        # order by round number, DETAIL preferred within a round (it
        # is complete; the driver record is a 2000-char stdout tail) —
        # a plain lexicographic sort would put every BENCH_r file
        # after every BENCH_DETAIL file regardless of round
        base = os.path.basename(path)
        m = _re.fullmatch(r"BENCH_(DETAIL_)?r(\d+)\.json", base)
        return (int(m.group(2)), m.group(1) is not None)

    # fullmatch-filter the glob hits: side artifacts like
    # BENCH_r11_c8.json (the 8-core scaling leg) match the glob but
    # carry a non-integer suffix — round 12's inherited crash.
    candidates = sorted(
        (
            p
            for p in _glob.glob(os.path.join(here, "BENCH_DETAIL_r[0-9]*.json"))
            + _glob.glob(os.path.join(here, "BENCH_r[0-9]*.json"))
            if _re.fullmatch(
                r"BENCH_(DETAIL_)?r(\d+)\.json", os.path.basename(p)
            )
        ),
        key=_round_of,
    )
    for path in reversed(candidates):
        # the driver's BENCH_r{N}.json wraps this script's JSON line
        # inside a "tail" string field — unwrap it when present
        try:
            with open(path) as f:
                rec = json.load(f)
            if rec is None:
                continue
            if "queries" not in rec and "tail" in rec:
                line = [
                    ln for ln in rec["tail"].splitlines()
                    if ln.startswith("{") and '"queries"' in ln
                ]
                rec = json.loads(line[-1]) if line else {}
            if rec.get("queries"):
                prior, prior_name = rec["queries"], os.path.basename(path)
                break
        except (OSError, json.JSONDecodeError, IndexError):
            continue
    deltas = {}
    for name, t in timings.items():
        p = prior.get(name)
        if p and t >= p * 1.2 and t - p >= 0.2:
            deltas[name] = {"prev": p, "now": t,
                            "pct": round((t - p) / p * 100, 1)}

    # Second contamination detector (round 11): cross-check this run's
    # medians against the last COMMITTED quiet-host detail. Host
    # contention inflates queries broadly and uniformly (round-10's
    # contaminated record: 17 of 64 queries >1.5x with zero code
    # change); real regressions are narrow. If more than 25% of the
    # comparable queries run >=1.5x their committed quiet median (and
    # >=0.3s absolute — below that is local[32] noise), the artifact is
    # stamped contaminated regardless of what the pre-gate saw.
    quiet_prior, quiet_name, quiet_sf = _committed_quiet_medians(here)
    if quiet_name and quiet_sf != detail_sf:
        # medians at a different SF are not comparable — skip the
        # check rather than false-alarm on a sub-SF smoke run
        quiet_prior, quiet_name = {}, f"{quiet_name} (sf mismatch, skipped)"
    drift = {}
    compared = 0
    for name, t in timings.items():
        p = quiet_prior.get(name)
        if p:
            compared += 1
            if t >= p * 1.5 and t - p >= 0.3:
                drift[name] = {"quiet": p, "now": t,
                               "x": round(t / p, 2)}
    contamination_reason = None
    if contaminated:
        contamination_reason = "pre-gate loadavg"
    if compared and len(drift) > 0.25 * compared:
        contaminated = True
        contamination_reason = (
            f"median-drift: {len(drift)}/{compared} queries >=1.5x "
            f"their committed quiet medians ({quiet_name})"
        )
        print(f"# contamination: {contamination_reason}", file=sys.stderr)

    # Chaos headline (reference scenario 5 analogue): measured by
    # tests/test_scenarios.py chaos scenarios (1M/3M-row feeds,
    # SIGKILL mid-stream, restart, exact-state verify). Carried from
    # their artifacts (each run takes minutes and two JVMs).
    chaos_full: dict[str, dict] = {}
    for chaos_path in sorted(_glob.glob(os.path.join(here, "CHAOS_*.json"))):
        key = os.path.basename(chaos_path)[6:-5].lower()
        with open(chaos_path) as f:
            chaos_full[key] = json.load(f)

    try:
        loadavg = list(os.getloadavg())
    except OSError:
        loadavg = None
    detail = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "reps": reps,
        "queries": timings,
        "query_min_max": spreads,
        "streaming_suite_seconds": streaming_total,
        "streaming_queries": stream_timings,
        "sf": detail_sf,
        "loadavg_pre": loadavg_pre,
        "contaminated": contaminated,
        "contamination_reason": contamination_reason,
        "loadavg_between": load_between,
        "loadavg_at_exit": loadavg,
        "drift_vs_committed_quiet": quiet_name,
        "drift_compared": compared,
        "drift": drift,
        "regressions_vs": prior_name,
        "regressions": deltas,
        "chaos": chaos_full,
    }
    # Full record goes to a file (round number inferred from the last
    # driver-recorded BENCH_r{N}); the driver captures only the last
    # ~2000 chars of stdout, so the final printed line must stay
    # compact — round 7's record was lost to an oversized line.
    rounds = [
        int(m.group(1))
        for p in _glob.glob(os.path.join(here, "BENCH_r[0-9]*.json"))
        for m in [_re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p))]
        if m
    ]
    detail_path = os.path.join(
        here, f"BENCH_DETAIL_r{(max(rounds) + 1 if rounds else 1):02d}.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(f"# full record: {detail_path}", file=sys.stderr)

    # The compact line must survive the driver's 2000-char stdout
    # tail (line + trailing newline <= 2000, else the line's HEAD is
    # truncated — the round-7 failure mode). Round 12: the line now
    # carries the FULL per-query median map at 2 dp (the round-11
    # driver could not compute a per-query geomean because the line
    # held only the 5 slowest — PERF_r11 per_query={}). To make the
    # 64-entry map fit, nice-to-have fields are emitted only when
    # they carry signal (contamination/drift/regression fields only
    # when non-clean) and a drop-ladder sheds optional fields if the
    # line still exceeds the budget. json.dumps uses compact
    # separators — the default ", " costs ~130 chars over 65 entries.
    record = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "reps": reps,
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "streaming_suite_seconds": streaming_total,
        "sf": detail["sf"],
        "detail": os.path.basename(detail_path),
    }
    if contaminated:
        record["contaminated"] = True
        record["contamination_reason"] = contamination_reason
    if drift:
        record["drift_count"] = len(drift)
    if deltas:
        record["regression_count"] = len(deltas)

    def _line() -> str:
        return json.dumps(record, separators=(",", ":"))

    # drop-ladder: everything here also lives in the DETAIL record
    for opt in ("regression_count", "drift_count", "detail", "reps"):
        if len(_line()) <= 1950:
            break
        record.pop(opt, None)
    if len(_line()) > 1950:
        # last resort — keep the driver-critical fields, coarsen the
        # map to 1 dp rather than dropping it (a coarse geomean beats
        # per_query={})
        record["queries"] = {k: round(v, 1) for k, v in timings.items()}
    print(_line())


if __name__ == "__main__":
    main()
