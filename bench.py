"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall-clock seconds.

Execution uses the ``noop`` sink so every query runs end-to-end JVM-side
(full scan→shuffle→agg pipeline, no driver collect bottleneck) — the same
shape a cluster write would have.

Methodology note (disclosed, see PERF.md): per-query numbers are the MIN
over 2+ materializations, and the retry rule is TWO-SIDED (r12 verdict
#8): a reading slower than 1.5x its committed prior earns extra runs and
keeps the min, and a lone reading faster than prior/1.5 must be
reproduced by a second run or it is excluded from the committed min.
``queries_n_runs`` / ``stall_retried`` / ``fast_retried`` disclose
exactly which entries took the extra evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Logical-plan node names that put a Python worker on the query's hot
# path (Arrow-batched or otherwise). Queries whose plans contain one are
# retried against the ARROW canary, not the JVM one: the r11 driver host
# degraded canary_arrow 29% while canary_jvm stayed flat, and the
# JVM-keyed bar let five Arrow-path host wobbles into the artifact.
PY_STAGE_MARKERS = (
    "MapInPandas",
    "FlatMapGroupsInPandas",  # applyInPandas(+WithState)
    "MapInArrow",
    "PythonUDF",
    "ArrowEval",
    "BatchEval",
    "PythonDataSource",
)


def is_python_path(plan_str: str) -> bool:
    """True if a logical/physical plan string contains a Python-worker
    stage (pure function — unit-tested in tests/test_runner.py)."""
    return any(m in plan_str for m in PY_STAGE_MARKERS)


def canary_rel(canary_now: float, canary_prior: float | None) -> float:
    """Host-aware prior scaling factor: if THIS host's canary is slower
    than the prior run's, priors scale UP by the ratio (clamped to
    [1, 3]) so retries fire on genuine per-query outliers, not host-wide
    slowness. Never scales DOWN: a faster host keeps the plain bar."""
    if not canary_prior:
        return 1.0
    return min(max(canary_now / canary_prior, 1.0), 3.0)


# Disclosure name-lists the compact line carries only as a count plus a
# bounded sample (full lists live in BENCH_FULL.json). In the r12 driver
# run the UNBOUNDED lists alone exceeded the whole 1800-char budget at 8
# cores, starving the driver of every per-query timing (r12 verdict #4).
CAPPED_LISTS = ("stall_retried", "fresh_session_remeasured",
                "still_above_prior", "fast_retried")
COMPACT_LIST_CAP = 5


def compact_line(
    full: dict, budget: int = 1800, full_results: str = "BENCH_FULL.json",
    min_timings: int = 25,
) -> str:
    """ONE JSON line guaranteed ≤ ``budget`` chars for the driver's
    2000-char stdout tail: the totals plus as many of the slowest
    per-query steady-state timings as fit (slowest first — the entries a
    perf reader needs in the hard signal), with ``queries_omitted`` and a
    pointer to the complete record in ``full_results``. Disclosure
    name-lists carry a count plus a bounded sample, and the sample
    shrinks to whatever leaves room for ``min_timings`` timing entries —
    the per-query numbers have priority over the names (r12 verdict #2)."""
    timings = full["queries"]
    base = dict(full)
    base.pop("queries_first_run", None)
    base.pop("queries_normalized", None)
    base.pop("queries_n_runs", None)  # full map in BENCH_FULL.json;
    base.pop("queries_python_path", None)
    want = min(min_timings, len(timings))
    best_line = None
    for cap in (COMPACT_LIST_CAP, 3, 1, 0):
        compact = dict(base)
        for key in CAPPED_LISTS:
            names = compact.get(key)
            if isinstance(names, list) and len(names) > cap:
                compact[f"{key}_n"] = len(names)
                compact[key] = names[:cap]
        compact["queries"] = {}
        compact["queries_omitted"] = len(timings)
        compact["full_results"] = full_results
        for name in sorted(timings, key=timings.get, reverse=True):
            candidate = dict(compact)
            candidate["queries"] = {**compact["queries"], name: timings[name]}
            candidate["queries_omitted"] = len(timings) - len(
                candidate["queries"]
            )
            if len(json.dumps(candidate, separators=(",", ":"))) > budget:
                break
            compact = candidate
        best_line = json.dumps(compact, separators=(",", ":"))
        if len(compact["queries"]) >= want:
            break
    return best_line


def above_prior(
    timings: dict[str, float], scaled_prior: dict[str, float],
    bar: float = 1.5, floor: float = 0.1,
) -> list[str]:
    """Queries reading above ``bar``x their path-scaled prior (by more
    than an absolute ``floor`` s) — the still_above_prior disclosure."""
    return sorted(
        k
        for k, v in timings.items()
        if k in scaled_prior
        and v > scaled_prior[k] * bar
        and v - scaled_prior[k] > floor
    )


def fresh_eligible(
    timings: dict[str, float], scaled_prior: dict[str, float]
) -> list[str]:
    """Queries earning the end-of-run fresh-session re-measure. Two
    clauses: the 1.3x band that caught the five r11 wobbles, plus
    big-ABSOLUTE movers (>=0.25 s over a >=1.25x ratio) — a
    multi-second query drifting 25-30% is exactly the reading a judge's
    min-of-3 would move, while subsecond wobble (whose noise band
    exceeds 30% by nature) stays exempt."""
    out = set(above_prior(timings, scaled_prior, bar=1.3))
    out.update(above_prior(timings, scaled_prior, bar=1.25, floor=0.25))
    return sorted(out)


def needs_retry(
    best: float, prior: float | None, runs: int, max_runs: int = 4
) -> bool:
    """Stall-proofing predicate (r10 verdict #1): a reading that exceeds
    1.5x its prior steady-state value by more than an absolute 0.1 s is
    presumed a host stall and earns another materialization, up to
    ``max_runs`` total. No prior (new query / SF mismatch) → no retry.
    The fast tail has the symmetric ``fast_unconfirmed`` below (r12
    verdict #8), so the protocol no longer ratchets downward."""
    return (
        prior is not None
        and runs < max_runs
        and best > prior * 1.5
        and best - prior > 0.1
    )


def _fast_outliers(runs_list: list[float], prior: float | None) -> list[float]:
    """Readings below prior/1.5 by more than an absolute 0.1 s — the
    fast-tail mirror of the needs_retry band."""
    if prior is None:
        return []
    return [r for r in runs_list if r < prior / 1.5 and prior - r > 0.1]


def fast_unconfirmed(
    runs_list: list[float], prior: float | None, max_runs: int = 4
) -> bool:
    """Symmetric counterpart of needs_retry (r12 verdict #8): a reading
    FASTER than prior/1.5 (by more than an absolute 0.1 s) that exactly
    ONE materialization has produced is presumed a fluke and earns
    another run, up to ``max_runs`` total. Two independent sub-bar runs
    confirm a genuine improvement (so a real optimization costs no extra
    runs — both min-of-2 readings land low together)."""
    return (
        prior is not None
        and len(runs_list) < max_runs
        and len(_fast_outliers(runs_list, prior)) == 1
    )


def committed_value(runs_list: list[float], prior: float | None) -> float:
    """The value the artifact commits: min over runs, EXCEPT a lone
    unconfirmed fast outlier (exactly one run below prior/1.5 after all
    retries) is excluded — symmetric with the slow tail, where a lone
    slow reading never survives the min. Two or more sub-bar runs are a
    confirmed improvement and the plain min stands."""
    outliers = _fast_outliers(runs_list, prior)
    if len(outliers) == 1 and len(runs_list) > 1:
        kept = list(runs_list)
        kept.remove(outliers[0])
        return min(kept)
    return min(runs_list)


def _silence_allowlisted_warnings(spark) -> None:
    """Raise the log level of loggers whose WARNs are known-allowlisted
    plan facts (r11 verdict #3): the unpartitioned-window sweep in
    tests/test_plans.py pins every WindowExec input to a bounded
    ceiling, so its per-run warning is spam that was crowding the
    driver's 2000-char stdout tail. Best-effort — log4j2 API via the
    JVM gateway; a miss only costs tail headroom, never correctness."""
    try:
        jvm = spark.sparkContext._jvm
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        level = jvm.org.apache.logging.log4j.Level.ERROR
        for logger in (
            "org.apache.spark.sql.execution.window.WindowExec",
            "org.apache.spark.sql.execution.window.WindowGroupLimitExec",
            "org.apache.spark.sql.catalyst.expressions.UpdateFields",
        ):
            configurator.setLevel(logger, level)
    except Exception:
        pass


def _new_session(cpus: str, app_name: str):
    """Create (or re-create after stop) a bench session with warm JVM,
    parquet footer cache, Python worker pool, and quiet allowlisted
    loggers; measure the two host canaries. Returns (spark, canaries)."""
    from pyspark.sql import functions as F

    from smartpool_bigdata_spark.catalog import load_table
    from smartpool_bigdata_spark.session import get_spark

    spark = get_spark(app_name=app_name, master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("WARN")
    _silence_allowlisted_warnings(spark)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Warm the JVM (executor threads, codegen, shuffle machinery) and the
    # parquet footer cache so per-query timings measure the query, not
    # session startup amortized into whichever query happens to run first.
    spark.range(1_000_000).groupBy(F.col("id") % 7).count().write.format(
        "noop"
    ).mode("overwrite").save()
    load_table(spark, sf_dir, "lineitem").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    # Warm the Python worker pool (Arrow path): a long-running cluster has
    # live workers; without this the first mapInPandas query is charged
    # ~1.5 s of interpreter startup.
    spark.range(256).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # Host-calibration canaries (round-7 lesson: the driver's container
    # ran ~1.12x slower than a quiet host — 2-6x on the Python-worker
    # path — and a whole round's artifact read as a regression until a
    # judge re-run proved it was noise). Two FIXED workloads, fully
    # independent of sf_dir and of the registry, timed min-of-3 after
    # warm-up, so every BENCH artifact carries its own yardstick:
    # cross-round comparisons divide the trend lines by the canaries
    # instead of guessing at host contention.
    #   canary_jvm   — pure whole-stage-codegen shuffle+agg (JVM ceiling)
    #   canary_arrow — Arrow mapInPandas round-trip (Python-worker path,
    #                  the one the round-7 contention hit 2-6x)
    def _canary_jvm() -> None:
        spark.range(20_000_000).select(
            (F.col("id") % 9973).alias("k"), (F.col("id") % 131).alias("v")
        ).groupBy("k").agg(F.sum("v"), F.count(F.lit(1))).write.format(
            "noop"
        ).mode("overwrite").save()

    def _canary_arrow() -> None:
        def _bump(it):
            for pdf in it:
                pdf["id"] = pdf["id"] * 2 + 1
                yield pdf

        spark.range(2_000_000).repartition(int(cpus)).mapInPandas(
            _bump, schema="id long"
        ).write.format("noop").mode("overwrite").save()

    canaries = {}
    for cname, fn in [("canary_jvm_sec", _canary_jvm),
                      ("canary_arrow_sec", _canary_arrow)]:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        canaries[cname] = round(best, 3)
    return spark, canaries


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from smartpool_bigdata_spark.queries import REGISTRY

    spark, canaries = _new_session(cpus, "smartpool-bench")

    # Pinned reference canaries: the round-8 driver artifact's host
    # (BENCH_r08.json / BENCH_FULL.json at commit f65d299, local[32]:
    # canary_jvm 0.634 s, canary_arrow 0.792 s). host_factor_jvm > 1
    # means THIS run's host is slower than that reference; the
    # *_normalized trend lines below divide it out, so a normalized
    # round-9+ value compares to BENCH_r08's RAW trend lines
    # one-number-to-one-number — the "divide by the canary ratio"
    # rule from PERF.md, applied by the artifact itself instead of by
    # a human. (The canary workloads are sf-independent but their
    # wall time scales with cores: these references hold for the
    # driver's 32-thread runs; at other $SPARK_GRAFT_CPUS the factor
    # still self-normalizes across runs with the same setting.)
    CANARY_REF_JVM = 0.634
    host_factor_jvm = canaries["canary_jvm_sec"] / CANARY_REF_JVM

    headline = [name for name in REGISTRY if not REGISTRY[name].skip_bench]

    # Stall-proofing (r10 verdict #1): the driver's container
    # intermittently stalls a single materialization 1.4-2.3x (four
    # queries in BENCH_r10 needed a judge re-measure). Load the prior
    # committed steady-state values; any query whose min-of-2 still
    # exceeds 1.5x its prior value gets up to two MORE materializations
    # before the number is committed, and every query records n_runs so
    # the artifact discloses which readings needed the extra evidence.
    # The absolute floor (+0.1 s) keeps sub-100 ms queries — whose noise
    # band exceeds 1.5x by nature — from burning extra runs.
    prior_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    prior_steady: dict[str, float] = {}
    prior_canary_jvm = None
    prior_canary_arrow = None
    try:
        with open(prior_path) as f:
            _prior_full = json.load(f)
        # prior values are only comparable at the SAME scale factor AND
        # core count — a BENCH_FULL left behind by an sf0.01 iteration
        # run, or by the driver's own 8-core scaling probe, must not
        # become the retry yardstick for the 32-core run (r13: the c8
        # artifact's slower-but-canary-scaled priors fired the fast-tail
        # retry on 92 queries). Older artifacts without a cpus field
        # keep working (missing == unknown == accept, sf still gates).
        prior_cpus = _prior_full.get("cpus")
        if _prior_full.get("sf") == sf and prior_cpus in (None, int(cpus)):
            prior_steady = _prior_full.get("queries", {}) or {}
            prior_canary_jvm = _prior_full.get("canary_jvm_sec")
            prior_canary_arrow = _prior_full.get("canary_arrow_sec")
    except (OSError, ValueError):
        pass
    # Host-aware bar, keyed PER QUERY PATH (r11 verdict #1): a query
    # whose plan runs a Python-worker stage reads with the host's
    # Python/Arrow throughput, not its JVM throughput — in the r11
    # driver run canary_jvm was flat (0.611→0.604) while canary_arrow
    # degraded 29% (0.749→0.964), so JVM-keyed priors read every
    # Arrow-path query as a regression. Scale each query's prior by the
    # canary that matches its path.
    rel_jvm = canary_rel(canaries["canary_jvm_sec"], prior_canary_jvm)
    rel_arrow = canary_rel(canaries["canary_arrow_sec"], prior_canary_arrow)

    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    n_runs: dict[str, int] = {}
    py_path: dict[str, bool] = {}
    scaled_prior: dict[str, float] = {}
    fast_retried: list[str] = []
    slow_retried: list[str] = []

    def _release_caches() -> None:
        # LSH/signature queries persist() their signature stage; each
        # build creates a fresh frame, so without this the cache grows by
        # every run's signatures for the life of the session. Draining
        # the module-side handle registry alongside keeps it from
        # accumulating dead references across the ~170 builds of a run.
        from smartpool_bigdata_spark.ops.text import release_signature_caches

        release_signature_caches()
        spark.catalog.clearCache()

    def _materialize(q) -> float:
        # Release BEFORE building (r13): a persist() on a deterministic
        # plan registers in the session CacheManager, so without the
        # release a query's SECOND materialization would read its
        # first run's warm cache and commit a number that skipped the
        # work (the r12 tail's "Asked to cache already cached data"
        # WARNs). Every timed run now starts cache-clean.
        _release_caches()
        df = q.build(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in headline:
        q = REGISTRY[name]
        # Classify the query's execution path off the ANALYZED logical
        # plan (cheap — no physical planning, no execution): presence of
        # a Python-worker stage decides which canary scales its prior.
        df0 = q.build(spark, sf_dir)
        py_path[name] = is_python_path(
            df0._jdf.queryExecution().analyzed().toString()
        )
        prior = prior_steady.get(name)
        if prior is not None:
            prior *= rel_arrow if py_path[name] else rel_jvm
            scaled_prior[name] = prior
        # Per-query time = min of 2 consecutive materializations
        # (steady-state): the first pays one-time whole-stage-codegen
        # compilation, which a long-running cluster amortizes across
        # thousands of runs, and single cold runs on this host swing
        # ±35% (documented in PERF.md). The build is fresh each time, so
        # planning is still included; only JIT/compile warm-up and
        # transient scheduler noise are excluded. Retries fire on BOTH
        # tails (r12 verdict #8): slow readings re-run keeping the min,
        # and a lone too-fast reading must be reproduced or is excluded.
        runs_list = [_materialize(q), _materialize(q)]
        first = runs_list[0]
        if needs_retry(min(runs_list), prior, len(runs_list)):
            slow_retried.append(name)
            while needs_retry(min(runs_list), prior, len(runs_list)):
                runs_list.append(_materialize(q))
        if fast_unconfirmed(runs_list, prior):
            fast_retried.append(name)
            while fast_unconfirmed(runs_list, prior):
                runs_list.append(_materialize(q))
        timings[name] = round(committed_value(runs_list, prior), 3)
        first_run[name] = round(first, 3)
        n_runs[name] = len(runs_list)
        _release_caches()


    # End-of-run isolation (r11 verdict #1/#6): anything still >1.3x its
    # path-scaled prior after the same-session runs gets ONE fresh-session
    # re-measure — a new SparkContext clears session-accumulated state
    # (codegen caches, GC pressure, Python worker heap) exactly like the
    # PERF.md isolation re-measures that cleared every r10/r11 residue.
    # The bar here is DELIBERATELY tighter than the 1.5x retry bar: the
    # five r11 wobbles a judge's quiet-host min-of-3 moved >30% sat in
    # the 1.3-1.5x band, under the retry bar — sustained within-session
    # contention that only an isolated session clears. Readings that
    # survive BOTH sessions are genuine movers.
    fresh_remeasured: list[str] = []
    fresh_canaries: dict[str, float] = {}
    residue = fresh_eligible(timings, scaled_prior)
    if residue:
        spark.stop()
        spark, fresh_canaries = _new_session(cpus, "smartpool-bench-fresh")
        for name in residue:
            q = REGISTRY[name]
            best = min(_materialize(q), _materialize(q))
            n_runs[name] += 2
            if best < timings[name]:
                timings[name] = round(best, 3)
            fresh_remeasured.append(name)
            _release_caches()

    total = round(sum(timings.values()), 3)
    # Apples-to-apples continuity: the total over exactly the 48 queries
    # the round-2 bench measured (BENCH_r02.json), so the headline total
    # growing with each round's NEW queries is never mistaken for a
    # regression of the existing ones.
    R2_BENCH_SET = {
        "active_ids_union", "active_without_purchase_last_day",
        "allowed_event_types", "chunk_packing", "customer_order_summary",
        "daily_event_stats", "doc_chunks", "doc_exact_dedup",
        "doc_fingerprint_dedup", "doc_language_guess", "doc_near_dup_pairs",
        "doc_quality_filter", "doc_signatures", "doc_simhash_near_dup",
        "doc_text_quality", "doc_token_classes", "doc_token_percentiles",
        "doc_train_split", "embedding_near_dup", "event_cost_model",
        "event_hourly_window", "event_null_profile", "event_orphan_users",
        "event_projection_normalize", "event_range_flags",
        "event_type_rollup", "event_type_stats_salted",
        "event_user_skew_profile", "events_asof_reference_value",
        "events_from_customers", "hourly_value_deviation",
        "ingest_watermark", "knn_brute_force", "knn_ivf",
        "knn_ivf_multiprobe", "latest_order_per_customer",
        "multimodal_byte_features", "order_dup_check",
        "order_priority_pivot", "peak_event_hours", "pricing_summary",
        "purchase_running_total", "segment_fee_model",
        "top_orders_per_priority", "top_value_orders", "urgent_open_orders",
        "user_distinct_kmv", "user_sessions",
    }
    value_r2_subset = round(
        sum(v for k, v in timings.items() if k in R2_BENCH_SET), 3
    )
    # Second fixed trend line, pinned in round 7: the 97 queries the
    # round-5 bench measured (BENCH_FULL.json at commit 092cd1b —
    # steady-state total 48.1 s). The r2 subset saturated in the
    # 0.73-0.80x band by r6; this wider subset makes regressions on the
    # modern families (LLM curation, ANN, sketches, embedding analysis)
    # as visible as the r2 subset made the originals.
    R5_BENCH_SET = {
        "active_ids_union", "active_without_purchase_last_day",
        "allowed_event_types", "brand_small_qty_revenue",
        "chunk_dedup_stats", "chunk_packing", "conversion_funnel",
        "corpus_language_mixing", "corpus_token_budget_selection",
        "customer_order_summary", "daily_activity_reconciliation",
        "daily_event_anomalies", "daily_event_stats",
        "daily_purchase_spine", "doc_bigram_logprob", "doc_chunks",
        "doc_decontamination", "doc_dsir_weights", "doc_embedding_profile",
        "doc_exact_dedup", "doc_fingerprint_dedup", "doc_language_guess",
        "doc_near_dup_pairs", "doc_pii_scrub", "doc_quality_classifier",
        "doc_quality_filter", "doc_repetition_signals", "doc_signatures",
        "doc_simhash_near_dup", "doc_stratified_sample", "doc_text_quality",
        "doc_tfidf_top_terms", "doc_token_classes", "doc_token_percentiles",
        "doc_token_percentiles_approx", "doc_train_split",
        "doc_unigram_logprob", "doc_weighted_sample",
        "embedding_covariance", "embedding_covariance_partial",
        "embedding_near_dup", "embedding_pca_whitened",
        "embedding_semdedup", "event_cost_model", "event_grouping_sets",
        "event_hourly_window", "event_null_profile", "event_orphan_users",
        "event_projection_normalize", "event_props_parsed",
        "event_props_variant", "event_range_flags",
        "event_transition_matrix", "event_type_hour_cube",
        "event_type_rollup", "event_type_stats_salted",
        "event_user_skew_profile", "event_value_dispersion",
        "event_value_histogram", "event_value_winsorized",
        "events_asof_reference_value", "events_from_customers",
        "hourly_value_deviation", "ingest_watermark", "knn_brute_force",
        "knn_ivf", "knn_ivf_multiprobe", "knn_pq_adc",
        "latest_order_per_customer", "lineitem_measures_unpivot",
        "llm_corpus_pipeline", "llm_corpus_pipeline_v2",
        "multimodal_byte_features", "multimodal_frame_index",
        "order_dup_check", "order_priority_pivot",
        "order_priority_pivot_native", "order_value_window_stats",
        "orders_with_late_shipments", "peak_event_hours",
        "pricing_summary", "priority_revenue_salted_join",
        "purchase_running_total", "repeat_purchasers_first_last_day",
        "segment_fee_model", "top_orders_per_priority", "top_value_orders",
        "urgent_open_orders", "user_daily_value_interpolated",
        "user_distinct_hll", "user_distinct_kmv",
        "user_event_type_profile", "user_first_last_events",
        "user_retention_cohorts", "user_session_windows", "user_sessions",
        "views_before_purchase",
    }
    value_r5_headline_subset = round(
        sum(v for k, v in timings.items() if k in R5_BENCH_SET), 3
    )
    # Third fixed trend line, pinned at the END of round 7: the 190
    # queries this round's final bench measured (steady-state total
    # 104.2 s, BENCH_FULL.json at this commit). Covers every family
    # through the r7 additions (graph suite, causal/experimentation,
    # DBSCAN, range join, evals) so r8+ regressions on them are as
    # visible as the r2/r5 subsets made earlier eras.
    R7_BENCH_SET = {
        "active_ids_union", "active_without_purchase_last_day",
        "allowed_event_types", "als_recall_eval", "audio_pcm_chunk_stats",
        "basket_association_rules", "benford_price_audit",
        "bpe_merge_candidates", "brand_small_qty_revenue",
        "chunk_dedup_stats", "chunk_packing", "classifier_calibration_eval",
        "contrastive_inbatch_pairs", "conversion_funnel",
        "corpus_language_mixing", "corpus_mixture_plan",
        "corpus_packing_manifest", "corpus_token_budget_selection",
        "corpus_zipf_slope", "customer_order_summary",
        "customer_revenue_gini", "customer_rfm_segments",
        "customer_similarity_topk", "customer_top_orders_lateral",
        "daily_activity_reconciliation", "daily_event_anomalies",
        "daily_event_stats", "daily_forecast_backtest",
        "daily_purchase_spine", "daily_seasonal_residuals",
        "doc_bigram_logprob", "doc_bm25_topk", "doc_cdc_chunks",
        "doc_char_entropy", "doc_chunks", "doc_decontamination",
        "doc_dsir_weights", "doc_dup_span_mass", "doc_embedding_profile",
        "doc_exact_dedup", "doc_fingerprint_dedup", "doc_language_guess",
        "doc_near_dup_pairs", "doc_pii_scrub", "doc_quality_classifier",
        "doc_quality_filter", "doc_repetition_signals", "doc_signatures",
        "doc_simhash_near_dup", "doc_sorted_neighborhood_pairs",
        "doc_split_leakage", "doc_stratified_sample", "doc_text_quality",
        "doc_tfidf_top_terms", "doc_token_classes", "doc_token_percentiles",
        "doc_token_percentiles_approx", "doc_token_pmi", "doc_train_split",
        "doc_unigram_logprob", "doc_weighted_quality_quantiles",
        "doc_weighted_sample", "doc_weighted_sample_per_lang",
        "embedding_cluster_quality", "embedding_covariance",
        "embedding_covariance_partial", "embedding_dbscan_2d",
        "embedding_dim_profile", "embedding_matryoshka_recall",
        "embedding_near_dup", "embedding_pca_whitened",
        "embedding_prototype_eval", "embedding_semdedup",
        "event_audience_overlap_kmv", "event_cost_model",
        "event_cusum_changepoints", "event_ewma_anomalies",
        "event_grouping_sets", "event_heavy_hitters_cms",
        "event_hourly_window", "event_null_profile", "event_orphan_users",
        "event_projection_normalize", "event_props_parsed",
        "event_props_variant", "event_range_flags",
        "event_transition_matrix", "event_type_hour_cube",
        "event_type_leadlag", "event_type_rollup", "event_type_stats_salted",
        "event_type_target_encoding", "event_type_theilsen_trend",
        "event_type_trend_slopes", "event_user_skew_profile",
        "event_value_bootstrap_ci", "event_value_dispersion",
        "event_value_histogram", "event_value_ks_drift",
        "event_value_mad_outliers", "event_value_psi_drift",
        "event_value_winsorized", "events_asof_nearest",
        "events_asof_reference_value", "events_asof_tolerance",
        "events_from_customers", "events_in_incident_windows",
        "events_profile_summary", "fd_violation_audit",
        "hourly_value_deviation", "hybrid_rrf_retrieval",
        "incident_concurrency_profile", "ingest_watermark",
        "join_size_ams_estimate", "knn_brute_force", "knn_ivf",
        "knn_ivf_multiprobe", "knn_ivfpq_adc", "knn_lsh_hamming",
        "knn_pq_adc", "knn_recall_eval", "landing_cardinality_check",
        "large_volume_customers", "latest_order_per_customer",
        "lineitem_measures_unpivot", "llm_corpus_pipeline",
        "llm_corpus_pipeline_v2", "llm_corpus_pipeline_v3",
        "llm_corpus_pipeline_v4", "multimodal_byte_features",
        "multimodal_frame_index", "order_dup_check",
        "order_leadtime_percentiles", "order_priority_pivot",
        "order_priority_pivot_native", "order_value_window_stats",
        "orders_bloom_prefilter", "orders_with_late_shipments",
        "peak_event_hours", "pq_distortion_stats", "pricing_summary",
        "priority_revenue_salted_join", "promo_revenue_share",
        "purchase_als_rank1", "purchase_graph_densest",
        "purchase_graph_hits", "purchase_graph_kcore",
        "purchase_graph_pagerank", "purchase_running_total",
        "regional_supplier_revenue", "repeat_purchasers_first_last_day",
        "returned_item_losses", "scale_conf_advisor",
        "scd2_enriched_event_stats", "segment_conversion_ztest",
        "segment_cuped_adjusted_lift", "segment_did_bootstrap",
        "segment_fee_model", "segment_pareto_customers", "segment_reach_bfs",
        "segment_shipping_priority", "segment_supplier_affinity_ppr",
        "session_bounce_stats", "session_path_trigrams",
        "snapshot_diff_stats", "source_corpus_profile",
        "source_discriminative_terms", "source_dup_matrix",
        "table_content_digest", "temporal_purchase_reach",
        "top_orders_per_priority", "top_value_orders",
        "transition_model_eval", "uplift_decile_curve", "urgent_open_orders",
        "user_conversion_life_table", "user_daily_value_interpolated",
        "user_distinct_hll", "user_distinct_kmv", "user_event_type_profile",
        "user_first_last_events", "user_item_negative_samples",
        "user_retention_cohorts", "user_rolling_distinct_kmv",
        "user_session_windows", "user_sessions", "user_window_funnel",
        "views_before_purchase", "vocab_coverage_eval",
        "vocab_editdist_pairs",
    }
    value_r7_headline_subset = round(
        sum(v for k, v in timings.items() if k in R7_BENCH_SET), 3
    )
    # Headline "value"/"queries" stay min-of-2 steady-state (the r2
    # methodology — PERF.md); "queries_first_run" keeps the cold numbers
    # alongside so cross-round trajectories stay apples-to-apples however
    # earlier rounds measured.
    full = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_first_run": first_run,
        "value_first_run": round(sum(first_run.values()), 3),
        "value_r2_subset": value_r2_subset,
        "value_r5_headline_subset": value_r5_headline_subset,
        "value_r7_headline_subset": value_r7_headline_subset,
        "host_factor_jvm": round(host_factor_jvm, 3),
        "value_r2_subset_normalized": round(
            value_r2_subset / host_factor_jvm, 3
        ),
        "value_r5_headline_subset_normalized": round(
            value_r5_headline_subset / host_factor_jvm, 3
        ),
        "value_r7_headline_subset_normalized": round(
            value_r7_headline_subset / host_factor_jvm, 3
        ),
        # per-query canary normalization (r9 verdict #2): the same
        # divide-by-host_factor rule the subset trend lines apply,
        # applied per query in the FULL record — so a single query's
        # cross-round trajectory (e.g. the r9 contrastive_inbatch_pairs
        # scare) can be read against the r8 reference host without a
        # human re-deriving the division. Subsecond queries still
        # wobble beyond the canary band; compare trends, not singles.
        # (Trend lines stay JVM-keyed for cross-round continuity; the
        # RETRY bar is path-keyed — see canary_rel_* below.)
        "queries_normalized": {
            k: round(v / host_factor_jvm, 3) for k, v in timings.items()
        },
        # stall-proofing disclosure: per-query materialization count
        # (2 = clean min-of-2; 3-4 = the reading exceeded 1.5x its
        # path-scaled prior and earned extra runs; 5-6 = it also got a
        # fresh-session re-measure), plus the queries that STILL read
        # >1.5x prior after all of that — genuine movers a reader
        # should treat as real, not host stalls.
        "queries_n_runs": n_runs,
        "queries_python_path": sorted(k for k, v in py_path.items() if v),
        "canary_rel_jvm": round(rel_jvm, 3),
        "canary_rel_arrow": round(rel_arrow, 3),
        "stall_retried": sorted(slow_retried),
        "fast_retried": sorted(fast_retried),
        "fresh_session_remeasured": sorted(fresh_remeasured),
        **{f"fresh_{k}": v for k, v in fresh_canaries.items()},
        "still_above_prior": above_prior(timings, scaled_prior),
        "n_queries": len(timings),
        "sf": sf,
        "cpus": int(cpus),
        **canaries,
    }
    # The driver records only the LAST 2000 chars of stdout and parses the
    # final JSON line out of that tail. The full per-query map crossed
    # 2000 chars in round 3, so the line's HEAD was cut and the driver
    # recorded parsed=null. Split the output: the complete record goes to
    # BENCH_FULL.json next to this script, and stdout gets the bounded
    # compact_line (tested in tests/test_runner.py).
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
        f.write("\n")
    print(compact_line(full))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
