"""Headline benchmark: runs the flagship query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. The stdout line is kept under 1 KB
(driver tail captures clip longer lines); per-pass detail and floor
deltas are emitted as a second JSON line on stderr.

Each query is executed with a noop-sink write (full pipeline, no driver
collect of payload). Two warmup passes precede the timed pass:
sf0.001 (absorbs JVM/session startup + fault-isolates broken queries),
then one untimed pass at the target SF — AQE picks a different physical
plan at the larger SF, so its whole-stage-codegen classes only get
JIT-compiled on the first target-SF run (measured: 9.2 s first pass vs
1.5 s steady for the 64-slot minhash query — ~8 s of one-time compile,
not engine time). The timed pass therefore measures steady-state engine
throughput, which is what matters at 100 TB where per-query JIT is noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    # TPC-H-style core: scan-agg, filtered join chains, semi/anti, disjunctive
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q9_product_profit",
    # analytics beyond plain group-by
    "ops_asof_join",
    "ops_window_frames",
    # LLM-pipeline: dedup families, text scoring, ANN, end-to-end prep
    "dedup_exact_survivors",
    # dedup_minhash_realtext carries the full-weight natural-text
    # signature workload the pre-r9 dedup_minhash_pairs slot measured
    # (the gated slot now runs the lighter deterministic-corpus oracle);
    # both stay benched so the LSH cost trend remains comparable.
    "dedup_minhash_realtext",
    "dedup_minhash_pairs",
    "text_quality_metrics",
    "ann_brute_force_topk",
    "pipeline_prepare_corpus",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from eel_spark.queries import QUERIES, UNGATED_QUERIES
    from eel_spark.session import get_session

    spark = get_session("eel-spark-bench")

    # headline stability across registry rotations: a query rotated out
    # of the 50-slot driver gate (→ UNGATED_QUERIES) stays benched, so
    # the per-query series vs BENCH_FLOOR remains comparable
    resolved = {**UNGATED_QUERIES, **QUERIES}
    names = [n for n in HEADLINE if n in resolved] or sorted(QUERIES)
    # warmup at the smallest SF: absorbs JVM startup + whole-stage-codegen
    # compilation (the 64-slot minhash expression alone costs seconds to
    # compile) so the timed runs measure the engine, not the JIT.
    # Per-query fault isolation: one broken query must cost ITS slot, not
    # the whole bench artifact (round 3's bench was lost to a single
    # analysis error — the driver recorded rc=1 and no numbers at all).
    errors: dict[str, str] = {}
    for n in names:
        try:
            resolved[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 - record and continue
            errors[n] = str(e).split("\n", 1)[0][:200]

    # cold pass at the target SF: compiles the AQE-shaped codegen for the
    # actual plans so the timed pass below is steady-state. TIMED TOO
    # (cold_queries/cold_total in the output) so cross-round comparisons
    # can pick either basis — r1-r4 benches had no warm target-SF pass,
    # so their totals compare against cold_total; r5+ steady-state totals
    # compare against value.
    cold: dict[str, float] = {}
    for name in names:
        if name in errors:
            continue
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            resolved[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e).split("\n", 1)[0][:200]
            continue
        cold[name] = round(time.perf_counter() - t0, 3)

    # TWO steady passes, per-query MIN: a single host-noise window (cron,
    # page cache pressure, a neighbor pegging cores) inflates one pass
    # uniformly and would read as a phantom engine regression — the
    # round-6 driver artifact recorded exactly that (+40% across every
    # query, reproduced nowhere). The min of two independent passes is
    # the engine's demonstrated capability; both raw passes are emitted
    # for inspection.
    passes: list[dict[str, float]] = []
    for _ in range(2):
        pass_t: dict[str, float] = {}
        for name in names:
            if name in errors:
                continue
            # the warm passes registered cache entries (the LSH/ANN
            # queries persist intermediates) that plan-matching would
            # silently reuse, turning the timed run into a cache read —
            # clear so each timed query builds its own caches; JIT warmth
            # is JVM-wide and stays
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                df = resolved[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                errors[name] = str(e).split("\n", 1)[0][:200]
                continue
            pass_t[name] = round(time.perf_counter() - t0, 3)
        passes.append(pass_t)

    timings = {
        name: min(p[name] for p in passes if name in p)
        for name in names
        if any(name in p for p in passes)
    }
    total = round(sum(timings.values()), 3)
    # STDOUT carries ONLY the driver-contract line, kept well under 1 KB:
    # the r13 round-over-round comparison was voided because the growing
    # detail payload (steady passes, per-query floor deltas) pushed the
    # one-line JSON past the driver's tail capture and clipped it
    # unparseable. Detail now goes to stderr as a second JSON line.
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # value/queries measure STEADY-STATE (a timed cold target-SF pass
        # precedes them, absorbing ~8 s of one-time whole-stage-codegen
        # JIT); detail's cold_total/cold_queries are that first target-SF
        # pass — the basis comparable to the r1-r4 benches, which had no
        # warm target-SF pass. pipeline_prepare_corpus trains its unigram
        # LM once per process by operator contract ("train once per
        # corpus, score on every call") — the cold pass pays the
        # training; steady passes re-score against the staged vocab.
        "methodology": (
            "steady-state, per-query min of 2 passes "
            "(timed cold target-SF pass precedes; "
            "pipeline LM trains once per process, paid by the cold pass)"
        ),
        "cold_total": round(sum(cold.values()), 3),
    }
    if errors:
        out["errors"] = errors
    detail: dict[str, object] = {
        "metric": "headline_queries_detail",
        "cold_queries": cold,
        "steady_passes": passes,
    }
    # regression tracking: per-query delta vs the committed round floor
    # (BENCH_FLOOR.json, updated each round from the driver's BENCH_r{N})
    floor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FLOOR.json")
    if os.path.exists(floor_path) and sf == "0.1":
        with open(floor_path) as fh:
            floor = json.load(fh)
        prev = floor.get("queries", {})
        detail["vs_floor"] = {
            n: round(t - prev[n], 3) for n, t in timings.items() if n in prev
        }
        # total-vs-total is only meaningful over the SAME query set — an
        # errored (dropped) query would otherwise read as a huge speedup
        if floor.get("value") and not errors and set(timings) == set(prev):
            detail["vs_floor_total"] = round(total - floor["value"], 3)
    print(json.dumps(detail), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
