"""Round-13 measurement harness (guide §1): per-query build/exec split,
Spark job count, and formatted plans.

For each declared query: time the Python-side DataFrame construction
(plan build, py4j traffic) separately from the noop-sink execution, count
the Spark jobs the execution schedules (multi-job queries pay scheduling
overhead per job), and dump .explain("formatted") to plans/r13/.

Usage: python profile_queries.py [out_suffix] [query ...]
Writes PROFILE_r13<out_suffix>.json and plans/r13/<query>_<out_suffix or
'before'>.txt. Not part of the bench contract — a diagnostic tool only.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from w_userflow_featurestore_spark import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="profile_r13")
    sc = spark.sparkContext
    qs = entrymod.queries()
    names = [n for n in qs if not only or n in only]
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    # session warm-up so the first measured query isn't paying JVM warmup
    for n in names[:3]:
        try:
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"warmup {n}: {exc}", file=sys.stderr)

    out: dict[str, dict] = {}
    for n in names:
        fn = qs[n]
        sc.setJobDescription(f"r13-profile:{n}")
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            jobs_before = len(sc.statusTracker().getJobIdsForGroup(None))
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs_after = len(sc.statusTracker().getJobIdsForGroup(None))
            # build again to capture a clean plan (build is cheap)
            plan = qs[n](spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                qs[n](spark, sf_dir)._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            out[n] = {"err": str(exc).splitlines()[0][:300]}
            print(f"FAIL {n}: {out[n]['err']}", file=sys.stderr)
            continue
        out[n] = {
            "build_sec": round(t1 - t0, 3),
            "exec_sec": round(t2 - t1, 3),
            "jobs": jobs_after - jobs_before,
            "exchanges": plan.count("Exchange"),
            "n_plan_lines": plan.count("\n"),
        }
        with open(os.path.join(plans_dir, f"{n}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{n}: build={out[n]['build_sec']} exec={out[n]['exec_sec']} "
              f"jobs={out[n]['jobs']} exch={out[n]['exchanges']}",
              file=sys.stderr)
    sc.setJobDescription(None)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"PROFILE_r13_{suffix}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    tot_b = sum(v.get("build_sec", 0) for v in out.values())
    tot_e = sum(v.get("exec_sec", 0) for v in out.values())
    print(json.dumps({"n": len(out), "build_total": round(tot_b, 1),
                      "exec_total": round(tot_e, 1)}))


if __name__ == "__main__":
    main()
