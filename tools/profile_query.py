"""Profile one query: run it with the UI enabled and dump per-job wall
time + per-stage metrics (duration, shuffle bytes, task count) from the
status REST API, labeled by job description (guide §1.5/§7.1).

Usage: python tools/profile_query.py <query> [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

os.environ.setdefault("SPARK_GRAFT_UI", "true")

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from tsflex_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = get_spark("profile_query")
    fn = entry_mod.queries()[name]

    # warm run(s) then the measured run
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{name}#run{i}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        print(f"run {i}: {el:.3f}s", flush=True)
        spark.catalog.clearCache()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}",
                                    timeout=10) as r:
            return json.load(r)

    jobs = get("jobs?status=succeeded")
    last_tag = f"#run{runs - 1}"
    sel = [j for j in jobs if last_tag in (j.get("description") or "")]
    sel.sort(key=lambda j: j["submissionTime"])
    stages = {s["stageId"]: s for s in get("stages?status=COMPLETE")}
    total = 0.0
    for j in sel:
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        t0 = datetime.strptime(j["submissionTime"].replace("GMT", ""), fmt.replace("%Z", ""))
        t1 = datetime.strptime(j["completionTime"].replace("GMT", ""), fmt.replace("%Z", ""))
        dur = (t1 - t0).total_seconds()
        total += dur
        sids = j["stageIds"]
        sinfo = []
        for sid in sorted(sids):
            s = stages.get(sid)
            if not s:
                continue
            sinfo.append(
                f"s{sid}:{(s['executorRunTime']/1000):.1f}s/{s['numCompleteTasks']}t"
                f"/r{s.get('shuffleReadBytes',0)//1024}k/w{s.get('shuffleWriteBytes',0)//1024}k"
                f"[{(s.get('name') or '')[:40]}]"
            )
        print(f"job {j['jobId']:4d} {dur:6.2f}s  {' '.join(sinfo)}")
    print(f"sum of job wall times: {total:.2f}s (jobs={len(sel)})")
    spark.stop()


if __name__ == "__main__":
    main()
