"""Watch-list adjudication (r11 judge 'next' #5): s8/d6/j13-scaled/t14
moved +12-26% between the r10 and r11 clean captures with NO code touched
on those paths. This tool captures each of the four 3x in ONE idle
session — same CPU-ramp warm-up and calibration fingerprint as bench.py —
and prints the per-op range, so COVERAGE can pin "variance, range [a,b]"
with same-session numbers or flag a real floor rise.

Usage: python tools/watchlist_capture.py  (idle box; ~5-10 min)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from apache_iceberg_lakehouse_workshop_spark.session import get_spark  # noqa: E402
from apache_iceberg_lakehouse_workshop_spark.tables import load_table  # noqa: E402

WATCH = [
    "s8_knn_ivfpq_res",
    "d6_semdedup",
    "j13_asof_join",
    "t14_boilerplate_scrub",
]


def main() -> None:
    spark = get_spark("watchlist")
    # the same steady-state discipline as bench.main(): CPU-frequency
    # ramp burn + one untimed scan, then the contention fingerprint
    spark.range(8_000_000_000).selectExpr(
        "sum(cast(id as double) * cast(id as double))"
    ).collect()
    load_table(spark, bench.SF_DIR, "lineitem").selectExpr(
        "avg(l_extendedprice)"
    ).collect()
    out = {"calibration_start": bench._calibration(spark), "captures": []}
    for _ in range(3):
        out["captures"].append(
            {k: v["sec"] for k, v in bench._scaled_section(spark, only=WATCH).items()}
        )
    out["calibration_end"] = bench._calibration(spark)
    out["range"] = {
        k: [
            min(c[k] for c in out["captures"]),
            max(c[k] for c in out["captures"]),
        ]
        for k in WATCH
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
