"""Per-stage profile of a bench scaled-tier op (r12 judge 'next' #1:
capture-level walls for d6_semdedup drifted two rounds on untouched code
and capture-based adjudication is exhausted — instrument the tier and
say WHICH stage the time goes to).

Runs the EXACT bench construction (bench._scaled_tiers) at the large
tier, twice (cold + warm), inside a session whose UI status store is on,
then reads the completed jobs/stages from the Spark REST API (the
listener-backed status store) and prints a per-stage wall/task-time/
shuffle/spill table for each run plus a name-aggregated rollup.

Usage: python tools/profile_stages.py <op> [--quick] [--runs N]
  --quick skips the 75s steady-state burn (relative stage shares only —
  absolute walls are then ramp-contaminated, don't compare them to bench
  captures). Output is JSON-ish text to stdout; commit it with the round
  notes.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from apache_iceberg_lakehouse_workshop_spark.session import get_spark  # noqa: E402

UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4047"))


def _api(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def _ms(iso: str) -> float:
    # REST timestamps: "2026-08-17T12:00:00.123GMT"
    from datetime import datetime, timezone

    s = iso.replace("GMT", "+0000")
    return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%z").replace(
        tzinfo=timezone.utc
    ).timestamp()


def _stage_rows(app_id: str, t_lo: float, t_hi: float) -> list[dict]:
    rows = []
    for st in _api(f"applications/{app_id}/stages?status=COMPLETE"):
        sub = st.get("submissionTime")
        if not sub:
            continue
        ts = _ms(sub)
        if not (t_lo <= ts <= t_hi):
            continue
        done = st.get("completionTime")
        rows.append(
            {
                "stage": st["stageId"],
                "wall_ms": round((_ms(done) - ts) * 1000) if done else None,
                "tasks": st["numTasks"],
                "task_time_ms": st.get("executorRunTime"),
                "cpu_ms": round((st.get("executorCpuTime") or 0) / 1e6),
                "input_mb": round(st.get("inputBytes", 0) / 1e6, 1),
                "sh_read_mb": round(st.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_write_mb": round(st.get("shuffleWriteBytes", 0) / 1e6, 1),
                "spill_mb": round(
                    (st.get("memoryBytesSpilled", 0)) / 1e6, 1
                ),
                "name": st["name"],
            }
        )
    return sorted(rows, key=lambda r: -(r["wall_ms"] or 0))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        raise SystemExit("usage: profile_stages.py <scaled-tier op> [--quick]")
    op = args[0]
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark(
        "profile", extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            # keep every stage of the profiled runs in the status store
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "3000",
        },
    )
    tiers = bench._scaled_tiers(spark)
    if op not in tiers:
        raise SystemExit(f"unknown op {op}; known: {sorted(tiers)}")
    fn, _small, large = tiers[op]
    if "--quick" not in sys.argv:
        bench._steady_state_warmup(spark)
    calib = bench._calibration(spark)
    app_id = spark.sparkContext.applicationId
    from pyspark.sql import functions as F

    brackets = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"profile:{op}:run{i}")
        t0 = time.time()
        df, rows = fn(large)
        chk = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
        ).collect()[0]
        t1 = time.time()
        brackets.append((t0, t1, rows, chk["n"]))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"op": op, "tier": large, "calibration": calib}))
    for i, (t0, t1, rows, n_out) in enumerate(brackets):
        label = "cold" if i == 0 else f"warm{i}"
        print(
            f"\n=== run {i} ({label}): wall {t1 - t0:.3f}s, "
            f"in_rows {rows}, out_rows {n_out} ==="
        )
        stage_rows = _stage_rows(app_id, t0 - 0.05, t1 + 0.05)
        tot = sum(r["wall_ms"] or 0 for r in stage_rows)
        print(
            f"{'stage':>5} {'wall_ms':>8} {'tasks':>5} {'task_ms':>8} "
            f"{'cpu_ms':>8} {'in_MB':>7} {'shR_MB':>7} {'shW_MB':>7} "
            f"{'spill':>6}  name"
        )
        for r in stage_rows:
            print(
                f"{r['stage']:>5} {r['wall_ms'] or -1:>8} {r['tasks']:>5} "
                f"{r['task_time_ms'] or -1:>8} {r['cpu_ms']:>8} "
                f"{r['input_mb']:>7} {r['sh_read_mb']:>7} "
                f"{r['sh_write_mb']:>7} {r['spill_mb']:>6}  "
                f"{r['name'][:90]}"
            )
        print(f"  sum of stage walls: {tot} ms (gaps = driver/plan time)")
        # driver-side gap analysis: jobs in the bracket, sorted by start
        jobs = [
            j
            for j in _api(f"applications/{app_id}/jobs")
            if j.get("submissionTime")
            and t0 - 0.05 <= _ms(j["submissionTime"]) <= t1 + 0.05
        ]
        jobs.sort(key=lambda j: _ms(j["submissionTime"]))
        print(f"  jobs: {len(jobs)}")
        prev_end = t0
        for j in jobs:
            js, je = _ms(j["submissionTime"]), _ms(j.get("completionTime", j["submissionTime"]))
            gap = js - prev_end
            print(
                f"    job {j['jobId']:>4} +{gap*1000:6.0f}ms gap, "
                f"{(je - js)*1000:7.0f}ms run  "
                f"{(j.get('description') or j['name'])[:80]}"
            )
            prev_end = max(prev_end, je)
    spark.stop()


if __name__ == "__main__":
    main()
