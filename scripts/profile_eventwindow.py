"""Stage-by-stage profile of the event_windows_spike bench query
(verdict r9 ask #4: kernel plan is clean but wall-clock is flat —
find the constant factor). Usage:

    python scripts/profile_eventwindow.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from tdengine_spark.operators.eventwindow import (  # noqa: E402
    assign_event_windows,
    window_agg,
)
from tdengine_spark.session import get_spark  # noqa: E402


def t(label, df, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:40s} {best:7.3f}s")
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile")
    from tdengine_spark.catalog import Database

    ev = Database(root=sf_dir).read(spark, "events")
    # warm up scan + codegen
    ev.write.format("noop").mode("overwrite").save()

    t("scan only", ev)

    assigned = assign_event_windows(
        ev, "ts", F.col("value") > 180, F.col("value") < 20, ["user_id"]
    )
    t("scan + assignment", assigned)

    filt = assigned.where(F.col("_wid").isNotNull())
    t("scan + assignment + filter", filt)

    agg = window_agg(
        assigned, "ts", [F.count(F.lit(1)).alias("n_rows2")], ["user_id"]
    )
    t("scan + assignment + window_agg", agg)

    out = agg.select(
        "user_id", "_wid", "_wstart", "_wend",
        F.col("_wrows").alias("n_rows"),
    )
    t("full query", out)

    print("\n== physical plan (full query) ==")
    out.explain("formatted")


if __name__ == "__main__":
    main()
