"""Per-query time attribution for the bench headline set (guide §1).

For each headline query (or the names passed as argv), measures:

* ``t_build``  — fn(spark, sf_dir): plan construction (py4j round-trips)
* ``t_exec``   — noop-sink write, min of N runs (the benched quantity)
* stage-byte deltas (input / shuffle) via the REST API on run 1

and writes ``explain("formatted")`` to plans/r16/<name>_<tag>.txt when
``--plans <tag>`` is given.

Usage: python scripts/profile_headline.py [--plans before] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_analytics_spark.queries import REGISTRY, _ensure_loaded
from cassandra_analytics_spark.session import get_session
from cassandra_analytics_spark.stage_metrics import delta, stage_totals


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        args = args[:i] + args[i + 2:]

    from bench import HEADLINE  # noqa: E402

    names = args or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    _ensure_loaded()
    spark = get_session(
        app_name="profile_headline",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for t in ("region", "lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in names:
            try:
                df = REGISTRY[name].fn(spark, warm_dir)
                df.write.mode("overwrite").format("noop").save()
            except Exception:
                pass

    from cassandra_analytics_spark.operators._cache import clear_operator_caches

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r17"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = REGISTRY[name].fn
        execs = []
        t_build = None
        for rnd in range(n_runs):
            clear_operator_caches()
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            if rnd == 0:
                t_build = round(t1 - t0, 3)
                if plans_tag:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                    with open(os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w") as f:
                        f.write(plan)
                before = stage_totals(spark)
            spark.sparkContext.setJobDescription(name)
            df.write.mode("overwrite").format("noop").save()
            spark.sparkContext.setJobDescription(None)
            execs.append(round(time.time() - t1, 3))
            if rnd == 0:
                d = delta(before, stage_totals(spark))
        row = {
            "t_build": t_build,
            "t_exec_min": min(execs),
            "t_exec_all": execs,
        }
        if d is not None:
            row.update({k: d[k] for k in ("input_records", "shuffle_write_bytes") if k in d})
        out[name] = row
        print(json.dumps({name: row}), flush=True)

    total_build = round(sum(r["t_build"] for r in out.values()), 3)
    total_exec = round(sum(r["t_exec_min"] for r in out.values()), 3)
    print(json.dumps({"total_build": total_build, "total_exec_min": total_exec}))


if __name__ == "__main__":
    main()
