#!/usr/bin/env python3
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "total_query_time", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect) after a warm-up run of the session.

Noise robustness (VERDICT r5 item 3): the same binary measured
18.84–28.2 s across clean runs in this sandbox — single-shot numbers
mix plan cost with sandbox weather. Each query therefore runs
``$SPARK_GRAFT_BENCH_RUNS`` times (default 3) interleaved round-robin
(run 1 of every query, then run 2, ...) so a transient slowdown hits
one ROUND, not one query's all three samples. ``value``/``queries``
report the per-query MIN across runs (the plan's cost); the first-run
single-shot numbers are printed on their OWN earlier stdout line
(``value_first`` / ``queries_first``) so the driver-parsed FINAL line
stays compact (BENCH_r06 was truncated to ``parsed: null`` when they
shared a line — VERDICT r6 item 1).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cassandra_analytics_spark.queries import REGISTRY, _ensure_loaded
from cassandra_analytics_spark.session import get_session
from cassandra_analytics_spark.stage_metrics import delta, stage_totals

HEADLINE = [
    # scan / filter / aggregate
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "agg_cube_status",
    "agg_distinct_suppliers",
    # joins + subqueries
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q9_product_type_profit",
    "q21_waiting_suppliers",
    "join_semi_open_orders",
    "setop_except_customers",
    # temporal joins
    "asof_purchase_click",
    "range_join_error_bursts",
    # (EXTENDED families — ANN index / PQ / n-gram dedup / streaming —
    # are measured separately below so the headline total stays
    # comparable with BASELINE.md and every prior BENCH_r*.json)
    # windows / top-k
    "window_topk_orders_per_customer",
    "window_running_revenue",
    "window_range_frame_revenue",
    "topk_global_orders",
    # events / sessionization
    "events_hourly_stats",
    "events_sessionize",
    # cassandra semantics
    "lww_latest_events",
    "partition_size_orders",
    # LLM-pipeline
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "cosine_topk_embeddings",
    "text_token_stats",
    "lang_id_heuristic",
    "text_pii_scrub",
    "text_tfidf_search",
]


# One query per so-far-unbenched operator family (VERDICT r13 item 5):
# measured ONCE with byte attribution and reported on their OWN stdout
# line ("extended_query_detail"), NOT in the headline min-of-n total —
# adding them to "value" would break comparability with BASELINE.md and
# the prior-round records the weather guard adjudicates against.
EXTENDED = [
    "ann_ivf_quantized_topk",      # IVF + SQ8 persisted-layout probe
    "ann_pq_topk",                 # product-quantization ADC top-k
    "dedup_ngram_jaccard",         # n-gram Jaccard near-dup join
    "streaming_semantic_dedup",    # foreachBatch incremental SemDeDup
]


def run_query(fn, spark, sf_dir: str) -> None:
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()


def measure_extended(spark, sf_dir: str) -> dict[str, dict]:
    """One instrumented pass over the EXTENDED families: per-query wall
    seconds + the REST byte fingerprint (scan records / shuffle bytes —
    deterministic per plan, the regression signal the headline set
    already carries). Families with a registered build/query split
    (``queries.llm.EXTENDED_SPLITS`` — the registered query runs
    through the SAME callables) additionally report ``build_sec`` /
    ``query_sec``: layout build and stream bootstrap are one-time costs
    that dominated the r14 wall numbers, while the PROBE is the latency
    the family exists to keep fast — conflating them made 30 s rows
    read as probe regressions (VERDICT r14). A query failure records an
    ``error`` row instead of killing the bench."""
    from cassandra_analytics_spark.queries.llm import EXTENDED_SPLITS

    out: dict[str, dict] = {}
    for name in EXTENDED:
        before = stage_totals(spark)
        split = EXTENDED_SPLITS.get(name)
        t0 = time.time()
        try:
            if split is not None:
                build, probe, cleanup = split(spark, sf_dir)
                try:
                    build()
                    t1 = time.time()
                    probe().write.mode("overwrite").format("noop").save()
                    t2 = time.time()
                finally:
                    cleanup()
                row: dict = {
                    "sec": round(t2 - t0, 3),
                    "build_sec": round(t1 - t0, 3),
                    "query_sec": round(t2 - t1, 3),
                }
            else:
                run_query(REGISTRY[name].fn, spark, sf_dir)
                row = {"sec": round(time.time() - t0, 3)}
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        d = delta(before, stage_totals(spark))
        if d is not None:
            row.update(d)
        out[name] = row
    return out


def _prior_extended(sf: float) -> dict | None:
    """The newest prior round's extended_query_detail AT THE SAME SF
    (parsed from the BENCH_r*.json stdout tail — the extended rows ride
    their own line, not the driver-parsed final line), or None. Feeds
    the extended plan-vs-weather adjudication (VERDICT r14 item 3)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    prior = None
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                data = json.load(f)
        except Exception:
            continue
        parsed = data.get("parsed")
        if not (isinstance(parsed, dict) and parsed.get("sf") == sf):
            continue
        tail = data.get("tail")
        if not isinstance(tail, str):
            continue
        for line in tail.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except Exception:
                continue
            if (
                obj.get("metric") == "extended_query_detail"
                and isinstance(obj.get("queries"), dict)
            ):
                prior = obj["queries"]  # keep the newest round's
    return prior


def _classify_extended(detail: dict | None,
                       prior: dict | None) -> dict[str, str | None] | None:
    """Per-extended-query plan-vs-weather verdicts against the newest
    prior record — the same >2% shuffle-write rule as the headline
    guard, applied per family (their byte profiles differ by orders of
    magnitude, so a pooled total would let one family's plan change
    hide inside another's noise floor)."""
    if not detail or not prior:
        return None
    out: dict[str, str | None] = {}
    for name, row in detail.items():
        prow = prior.get(name)
        out[name] = _classify_bytes(
            row if isinstance(row, dict) else None,
            prow if isinstance(prow, dict) else None,
        )
    return out


def _prior_recorded(sf: float) -> tuple[float | None, dict | None]:
    """The newest prior round's driver-recorded (total seconds, byte
    totals) (BENCH_r*.json ``parsed.value`` / ``parsed.bytes``) AT THE
    SAME SF, or Nones when no comparable record exists. Feeds the
    weather guard below — never correctness. The SF match matters: an
    ad-hoc 10x run (SPARK_GRAFT_SF_DIR=.scale10) is legitimately slower
    than the sf0.1 record and must not trip the guard into extra 50 s
    loops."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    prior, prior_bytes = None, None
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                parsed = json.load(f).get("parsed")
        except Exception:
            continue
        if (
            isinstance(parsed, dict)
            and isinstance(parsed.get("value"), (int, float))
            and parsed.get("sf") == sf
        ):
            prior = float(parsed["value"])  # keep the newest round's
            pb = parsed.get("bytes")
            prior_bytes = pb if isinstance(pb, dict) else None
    return prior, prior_bytes


def _classify_bytes(bytes_total: dict | None,
                    prior_bytes: dict | None) -> str | None:
    """Adjudicate a wall-clock move from the byte record: shuffle-write
    bytes are deterministic per plan (measured: <0.1% across same-binary
    runs), so a move >2% vs the newest prior recorded bench means the
    PLAN changed; within 2% means the plan did not — any wall delta is
    weather. None when either record is missing (never guessed)."""
    if not bytes_total or not prior_bytes:
        return None
    pb = prior_bytes.get("shuffle_write_bytes")
    nb = bytes_total.get("shuffle_write_bytes")
    if not isinstance(pb, (int, float)) or nb is None:
        return None
    if pb <= 0:
        # a zero prior is only adjudicable when the current run is
        # also zero (a shuffle-free plan staying shuffle-free —
        # ann_pq_topk's shape); anything else has no ratio to judge
        return "weather" if nb == 0 else None
    return "plan" if abs(nb - pb) / pb > 0.02 else "weather"


def _parse_sf(sf_dir: str) -> float:
    """Scale factor from the BASENAME only, and only when it is exactly
    sf<float> — a scaled-corpus dir whose name merely contains "sf0.1"
    (sf0.1_scale10) must NOT adopt sf=0.1 and trip the weather guard
    against the sf0.1 record, and a dotted name (sf0.1.scale10) must
    not crash float() (round-8 review). -1.0 = not a plain sf dir."""
    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.fullmatch(r"sf(\d+(?:\.\d+)?)", base)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = _parse_sf(sf_dir)

    # SPARK_GRAFT_SHUFFLE_PARTITIONS: smoke-test knob — forcing a high
    # partition count (e.g. 256) exposes plans that only look good
    # because few partitions hide an exchange (PERF.md high-partition run)
    sp = os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS",
        cpus if str(cpus).isdigit() else "32",
    )
    # UI on: the REST stage metrics feed the per-query BYTE record —
    # bytes are deterministic for a deterministic plan, so they separate
    # plan regressions from sandbox weather (r12 measured a 6% wall
    # delta on byte-identical code; wall alone cannot adjudicate)
    spark = get_session(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(sp),
        # retainedStages raised: the bench app runs >2k stages, and the
        # UI's default 1000-stage eviction made cumulative byte diffs go
        # NEGATIVE late in the app (BENCH_r14). The per-stage delta in
        # stage_metrics is the structural fix; this keeps the window
        # large enough that evictions stay rare anyway.
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_loaded()

    # warm up the JVM, file listings and parquet footers (not query results)
    for t in ("region", "lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    # Warm whole-stage-codegen: run every headline plan shape once at the
    # smallest SF. Generated-class compilation is one-time per plan shape
    # and amortizes completely on a long-lived cluster, so the measured
    # numbers below reflect steady-state throughput at sf_dir, not javac.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                run_query(REGISTRY[name].fn, spark, warm_dir)
            except Exception:
                pass

    from cassandra_analytics_spark.operators._cache import clear_operator_caches

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    query_bytes: dict[str, dict[str, int]] = {}
    for rnd in range(n_runs):
        # cold caches each round: operators that persist() an intermediate
        # (tfidf per-doc core, shingle index) would otherwise serve rounds
        # 2+ from the CacheManager and min() would report a cache-hit
        # time instead of the plan's cost
        clear_operator_caches()
        spark.catalog.clearCache()
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            # byte attribution on ROUND 1 ONLY: the REST snapshots
            # between queries cost ~ms each, and rounds 2+ feed the
            # min-of-n wall numbers uninstrumented
            before = stage_totals(spark) if rnd == 0 else None
            t0 = time.time()
            run_query(fn, spark, sf_dir)
            samples[name].append(round(time.time() - t0, 3))
            if rnd == 0:
                d = delta(before, stage_totals(spark))
                if d is not None:
                    query_bytes[name] = d

    # total bytes across headline queries (round-1 attribution)
    bytes_total = {
        k: sum(d.get(k, 0) for d in query_bytes.values())
        for k in ("input_bytes", "input_records", "shuffle_write_bytes",
                  "shuffle_read_bytes", "output_bytes")
    } if query_bytes else None

    # Weather guard (VERDICT r7 item 5): the sandbox swings ~20% between
    # rounds (r7 recorded 20.6 s on code measuring 16.9-18.2 s locally).
    # When the min-of-n total still exceeds the newest prior recorded
    # total by >15%, the slowdown is likelier load than plan cost — run
    # extra rounds (min-of-5) so the recorded gate ratio tracks the plan,
    # not the weather. Only on bad-weather runs; ~one extra 40 s loop.
    # The BYTE record adjudicates (VERDICT r12 item 5): scan/shuffle
    # bytes are deterministic per plan, so prior-vs-now byte deltas
    # within noise (<2%) classify a wall slowdown as WEATHER; bigger
    # moves mean the PLAN changed and extra wall rounds can't talk the
    # number back down.
    prior, prior_bytes = _prior_recorded(sf)
    classification = _classify_bytes(bytes_total, prior_bytes)
    if classification == "plan":
        # surface a plan-fingerprint move even when the wall guard never
        # trips — a byte shift with a FLAT wall is still a plan change
        # (possibly an improvement) the round record should name
        print(
            json.dumps(
                {
                    "metric": "plan_fingerprint",
                    "classification": classification,
                    "shuffle_write_bytes": (bytes_total or {}).get(
                        "shuffle_write_bytes"
                    ),
                    "prior_shuffle_write_bytes": (prior_bytes or {}).get(
                        "shuffle_write_bytes"
                    ),
                }
            )
        )
    extra_runs = 0
    if prior is not None and n_runs < 5:
        while (
            extra_runs + n_runs < 5
            and sum(min(s) for s in samples.values()) > 1.15 * prior
        ):
            clear_operator_caches()
            spark.catalog.clearCache()
            for name in HEADLINE:
                t0 = time.time()
                run_query(REGISTRY[name].fn, spark, sf_dir)
                samples[name].append(round(time.time() - t0, 3))
            extra_runs += 1
    if extra_runs:
        print(
            json.dumps(
                {
                    "metric": "weather_guard",
                    "extra_runs": extra_runs,
                    "prior_recorded_total": prior,
                    # bytes adjudicate what wall-clock cannot: "weather"
                    # = byte totals match the prior record (the plan did
                    # not change), "plan" = bytes moved >2%
                    "classification": classification,
                    "prior_bytes": prior_bytes,
                }
            )
        )

    times = {name: min(s) for name, s in samples.items()}
    first = {name: s[0] for name, s in samples.items()}
    # The driver tails stdout and parses the FINAL line only; BENCH_r06 was
    # recorded with "parsed": null because queries_first doubled the line and
    # the tail capture cut off the leading "value" field (VERDICT r6 item 1).
    # First-run detail therefore goes on its own EARLIER line, and the final
    # line stays the compact driver contract.
    print(
        json.dumps(
            {
                "metric": "total_query_time_first_run",
                "value_first": round(sum(first.values()), 3),
                "queries_first": first,
            }
        )
    )
    # per-query byte detail on its OWN line (the final line is the
    # driver contract and was once truncated when it grew — VERDICT r6)
    if query_bytes:
        print(
            json.dumps(
                {"metric": "query_bytes_detail", "queries": query_bytes}
            )
        )
    # extended families: measured AFTER the headline rounds (their
    # noise never touches the guarded numbers), on their own line
    ext_detail = measure_extended(spark, sf_dir)
    print(
        json.dumps(
            {"metric": "extended_query_detail", "queries": ext_detail}
        )
    )
    # extended plan-vs-weather verdicts vs the newest prior record at
    # this SF (VERDICT r14 item 3): per-family shuffle-write bytes are
    # deterministic per plan, so each family gets its own adjudication
    # line the round record can cite
    ext_prior = _prior_extended(sf)
    ext_class = _classify_extended(ext_detail, ext_prior)
    if ext_class is not None:
        print(
            json.dumps(
                {
                    "metric": "extended_fingerprint",
                    "classification": ext_class,
                    "prior_shuffle_write_bytes": {
                        name: (ext_prior.get(name) or {}).get(
                            "shuffle_write_bytes"
                        )
                        for name in ext_detail
                    },
                }
            )
        )
    final = {
        "metric": "total_query_time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "runs": n_runs + extra_runs,
        "sf": sf,
    }
    if bytes_total:
        final["bytes"] = bytes_total
    print(json.dumps(final))


if __name__ == "__main__":
    main()
