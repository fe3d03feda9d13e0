"""Per-query optimization profiler (r12).

For each named query: dump the FULL ``explain('formatted')`` to
plans/r12/<name>_<tag>.txt, then time it with the bench's exact
protocol (cache cleared between reps, construction + noop sink
timed together, median of reps) while counting the Spark JOBS and
STAGES the query schedules via a job group — at sf0.1 the corpus is
small, so job/stage COUNT (driver round-trips, actions hidden in
construction, exchange count) is the dominant cost and the first
thing to shrink (guide §1.2: fix the distributed algorithm first).

Usage: python scripts/profile_query.py [--tag before] q214 q215 ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from polla_spark.plans import registry  # noqa: E402
from polla_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = Path(__file__).resolve().parent.parent / "plans" / os.environ.get(
    "PROFILE_PLAN_ROUND", "r13"
)
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def full_explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    args = sys.argv[1:]
    tag = None
    if args and args[0] == "--tag":
        tag = args[1]
        args = args[2:]
    reg = registry()
    names = [n for n in reg if any(a in n for a in args)]
    spark = get_spark("profile_r12")
    sc = spark.sparkContext
    # warm: JVM, parquet footers, python workers (bench.py protocol)
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    def _ident(it):
        yield from it

    (spark.range(256).repartition(64)
     .mapInPandas(_ident, "id long").write.format("noop").mode("overwrite").save())

    PLAN_DIR.mkdir(parents=True, exist_ok=True)
    out = {}
    for name in names:
        q = reg[name]
        if tag:
            df = q.spark(spark, SF_DIR)
            (PLAN_DIR / f"{name}_{tag}.txt").write_text(full_explain(df))
        reps, con_times, jobs, stages = [], [], 0, 0
        for i in range(REPS):
            spark.catalog.clearCache()
            group = f"prof-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = q.spark(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobGroup(None, None)
            reps.append(t2 - t0)
            con_times.append(t1 - t0)
            if i == 0:
                tracker = sc.statusTracker()
                jids = tracker.getJobIdsForGroup(group)
                jobs = len(jids)
                for j in jids:
                    info = tracker.getJobInfo(j)
                    if info:
                        stages += len(info.stageIds)
        out[name] = {
            "median": round(statistics.median(reps), 3),
            "reps": [round(r, 3) for r in reps],
            "construct": round(statistics.median(con_times), 3),
            "jobs": jobs,
            "stages": stages,
        }
        print(f"# {name}: median {out[name]['median']}s "
              f"(construct {out[name]['construct']}s, "
              f"{jobs} jobs / {stages} stages) reps {out[name]['reps']}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
