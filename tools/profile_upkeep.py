"""Labeled job profile of the bench streaming-upkeep probe (r13 round
notes' /tmp method, committed in r14): run bench._streaming_upkeep_probe
inside a UI-enabled session with the sink apply and each index refresh
wrapped to stamp a phase label into the job description, then read the
completed jobs from the Spark REST status store and print, per phase,
the job count, summed run time and summed driver gap.

This is the measurement for the text-CDC job-floor work (r13 judge
'next' #2: "Done = labeled job profile shows per-refresh job count
roughly halved"). Phases overlap in wall time when the per-index
refreshes run in parallel threads — gaps are therefore reported
per-phase (time between THAT phase's consecutive jobs), which
over-counts overlap but compares like with like across runs.

Usage: python tools/profile_upkeep.py [--quick]
"""

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from apache_iceberg_lakehouse_workshop_spark.session import get_spark  # noqa: E402

UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4048"))


def _api(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def _ms(iso: str) -> float:
    from datetime import datetime, timezone

    s = iso.replace("GMT", "+0000")
    return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%z").replace(
        tzinfo=timezone.utc
    ).timestamp()


def main() -> None:
    spark = get_spark(
        "profile-upkeep", extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "5000",
        },
    )
    if "--quick" not in sys.argv:
        bench._steady_state_warmup(spark)
    calib = bench._calibration(spark)

    # stamp phase labels: sink apply / text refresh / ann refresh. Labels
    # are thread-local, so the parallel per-index refresh threads each
    # carry their own label (guide §1.5).
    from apache_iceberg_lakehouse_workshop_spark.operators import ann_index as AX
    from apache_iceberg_lakehouse_workshop_spark.operators import text_index as TX
    from apache_iceberg_lakehouse_workshop_spark.streaming import pipeline as P

    sc = spark.sparkContext

    def labeled(label, fn):
        def inner(*a, **kw):
            sc.setJobDescription(label)
            try:
                return fn(*a, **kw)
            finally:
                sc.setJobDescription(None)
        return inner

    real_apply = P.apply_changes_stream_batch
    P.apply_changes_stream_batch = labeled("phase:apply", real_apply)
    TX.refresh_text_index = labeled("phase:text_refresh", TX.refresh_text_index)
    AX.refresh_ann_index = labeled("phase:ann_refresh", AX.refresh_ann_index)
    # _cdc_upkeep_batch binds the refreshers via stream_cdc_maintain_indexes,
    # which imports them at call time — the module attributes above ARE what
    # it picks up.

    out = bench._streaming_upkeep_probe(spark)
    app_id = sc.applicationId
    jobs = [j for j in _api(f"applications/{app_id}/jobs") if j.get("submissionTime")]
    jobs.sort(key=lambda j: _ms(j["submissionTime"]))
    phases: dict[str, dict] = {}
    last_end: dict[str, float] = {}
    for j in jobs:
        desc = j.get("description") or ""
        if not desc.startswith("phase:"):
            continue
        ph = desc.split(":", 1)[1]
        js = _ms(j["submissionTime"])
        je = _ms(j.get("completionTime", j["submissionTime"]))
        p = phases.setdefault(ph, {"jobs": 0, "run_ms": 0.0, "gap_ms": 0.0})
        p["jobs"] += 1
        p["run_ms"] += (je - js) * 1000
        if ph in last_end:
            p["gap_ms"] += max(0.0, (js - last_end[ph]) * 1000)
        last_end[ph] = je
    n_triggers = max(out.get("triggers", 1), 1)
    for ph, p in phases.items():
        p["run_ms"] = round(p["run_ms"])
        p["gap_ms"] = round(p["gap_ms"])
        p["jobs_per_trigger"] = round(p["jobs"] / n_triggers, 1)
    print(json.dumps({
        "calibration": calib,
        "probe": out,
        "phases": phases,
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
