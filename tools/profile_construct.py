"""Split each bench query's wall into driver-side construction (Python +
py4j + per-DataFrame Catalyst analysis), optimization/physical planning,
and execution (noop sink). The bench's timed region includes all three, so
a query whose 8v32-core scaling ratio is ~1 is usually dominated by the
first two — this tool says which.

Usage: SPARK_GRAFT_SF_DIR=... python3 tools/profile_construct.py N query...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from mydumper_spark.session import get_session

    spark = get_session("profile-construct")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # warm codegen/JIT once
    qs["q6_revenue_delta"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        rows = []
        for _ in range(reps):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            spark.sparkContext.setJobDescription(name)
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            t3 = time.time()
            rows.append((t1 - t0, t2 - t1, t3 - t2, t3 - t0))
        best = min(rows, key=lambda r: r[3])
        print(
            f"{name}: build={best[0]:.3f} plan={best[1]:.3f} "
            f"exec={best[2]:.3f} total={best[3]:.3f}  "
            f"(all: {[tuple(round(x, 3) for x in r) for r in rows]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
