"""Per-refresh job-count profile of the text/ANN CDC refresh paths —
the r13 judge 'next' #2 measurement ("Done = labeled job profile shows
per-refresh job count roughly halved").

Builds the bench upkeep probe's exact shape (documents+embeddings joined,
a text and an ANN index), applies N mixed CDC batches (every 4th key a
delete, the rest upserts) to the source via apply_changes, and runs each
index's refresh SEQUENTIALLY inside a REST-bracketed window so every job
attributes cleanly (the streaming trigger runs them in parallel threads,
which scrambles description-based attribution).

Usage: python tools/profile_refresh.py [--quick] [--batches N]
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from apache_iceberg_lakehouse_workshop_spark.session import get_spark  # noqa: E402

UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4049"))


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


def _jobs_between(app_id: str, t0: float, t1: float) -> list[dict]:
    out = []
    for j in _api(f"applications/{app_id}/jobs"):
        sub = j.get("submissionTime")
        if sub and t0 - 0.02 <= _ms(sub) <= t1 + 0.02:
            out.append(j)
    return out


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from apache_iceberg_lakehouse_workshop_spark.operators import ann_index as AX
    from apache_iceberg_lakehouse_workshop_spark.operators import text_index as TX
    from apache_iceberg_lakehouse_workshop_spark.plans import Lakehouse
    from apache_iceberg_lakehouse_workshop_spark.tables import load_table

    spark = get_spark(
        "profile-refresh", extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "5000",
        },
    )
    if "--quick" not in sys.argv:
        bench._steady_state_warmup(spark)
    calib = bench._calibration(spark)
    n_batches = 3
    if "--batches" in sys.argv:
        n_batches = int(sys.argv[sys.argv.index("--batches") + 1])
    app_id = spark.sparkContext.applicationId

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    emb = load_table(spark, sf, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    src = docs.join(emb, "doc_id").localCheckpoint()
    pool = src.limit(n_batches * 400).collect()
    out: dict = {"calibration": calib, "refreshes": []}
    with tempfile.TemporaryDirectory() as wh:
        lake = Lakehouse(spark, wh)
        t = lake.create_table_as("pr.docs", src)
        t.set_properties({"changelog.key-columns": "doc_id"})
        TX.build_text_index(lake, "pr.docs", "pr.tidx",
                            text_col="text", id_col="doc_id")
        AX.build_ann_index(
            lake, "pr.docs", "pr.aidx", id_col="doc_id",
            vec_col="embedding", dim=64, m_sub=4, k_codes=16, n_cells=16,
        )
        for i in range(n_batches):
            rows = []
            for j, r in enumerate(pool[i * 400:(i + 1) * 400]):
                if j % 4 == 0:
                    rows.append((r["doc_id"], None, None, "delete"))
                else:
                    rows.append((
                        r["doc_id"], r["text"] + " refreshed spark stream",
                        list(r["embedding"]), "insert",
                    ))
            batch = spark.createDataFrame(
                rows,
                "doc_id LONG, text STRING, embedding ARRAY<DOUBLE>, "
                "_change_type STRING",
            )
            t.apply_changes(batch, ["doc_id"])
            entry = {"batch": i}
            for kind, fn, name in (
                ("text", TX.refresh_text_index, "pr.tidx"),
                ("ann", AX.refresh_ann_index, "pr.aidx"),
            ):
                t0 = time.time()
                res = fn(lake, name)
                t1 = time.time()
                time.sleep(0.3)  # let the status store settle
                jobs = _jobs_between(app_id, t0, t1)
                entry[kind] = {
                    "mode": res["mode"], "wall_s": round(t1 - t0, 3),
                    "jobs": len(jobs),
                }
            out["refreshes"].append(entry)
    import statistics

    for kind in ("text", "ann"):
        out[f"{kind}_jobs_median"] = statistics.median(
            e[kind]["jobs"] for e in out["refreshes"]
        )
        out[f"{kind}_wall_median_s"] = round(statistics.median(
            e[kind]["wall_s"] for e in out["refreshes"]
        ), 3)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
