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

WATCH = [
    "s8_knn_ivfpq_res",
    "d6_semdedup",
    "j13_asof_join",
    "t14_boilerplate_scrub",
]


def main() -> None:
    spark = get_spark("watchlist")
    # the SAME steady-state protocol as bench.main() — time-bounded burn
    # + probe JIT warm-up + untimed scan (r12 review: a row-bounded burn
    # and an unwarmed probe made this tool's fingerprint incomparable to
    # bench captures, defeating its adjudication purpose)
    bench._steady_state_warmup(spark)
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
