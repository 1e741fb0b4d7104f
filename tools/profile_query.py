"""Per-job decomposition of one registry query's timed pass.

Runs ``name`` like bench.py does (warm + timed noop save) and prints
every Spark JOB the timed pass submitted — submission order, wall
seconds, stage count, and the job's first-stage name — so the wall
can be attributed to serialized job chains (persists, collects,
broadcast builds) rather than guessed from the physical plan alone.

Usage: python tools/profile_query.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    seq = store.jobsList(None)
    it = seq.iterator()
    out = []
    while it.hasNext():
        j = it.next()
        jid = j.jobId()
        sub = j.submissionTime()
        comp = j.completionTime()
        t0 = sub.get().getTime() if sub.isDefined() else None
        t1 = comp.get().getTime() if comp.isDefined() else None
        sit = j.stageIds().iterator()
        stages = []
        while sit.hasNext():
            stages.append(sit.next())
        out.append((jid, t0, t1, j.numTasks(), stages, j.name()))
    return sorted(out)


def main() -> None:
    from aws_dms_cdc_data_pipeline_spark.plans.queries import REGISTRY
    from aws_dms_cdc_data_pipeline_spark.session import get_spark

    spark = get_spark("profile")
    for name in sys.argv[1:]:
        qd = REGISTRY[name]
        spark.catalog.clearCache()

        def run():
            qd.fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()

        run()  # warm
        before = {j[0] for j in _jobs(spark)}
        t0 = time.time()
        run()
        wall = time.time() - t0
        print(f"\n=== {name}: timed pass {wall:.3f}s ===")
        prev_end = None
        for jid, s, e, ntasks, stages, jname in _jobs(spark):
            if jid in before or s is None:
                continue
            dur = (e - s) / 1000.0 if e else float("nan")
            gap = (s - prev_end) / 1000.0 if prev_end else 0.0
            prev_end = e or s
            print(
                f"  job {jid:>4}  {dur:7.3f}s  gap {gap:6.3f}s  "
                f"stages={len(stages)} tasks={ntasks}  {jname[:70]}"
            )


if __name__ == "__main__":
    main()
