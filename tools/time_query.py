"""Time individual bench queries in isolation, N repetitions each, via the
noop sink (guide §1.4). Prints per-rep seconds and the minimum — on a host
with intermittent hypervisor stalls only the minimum is comparable.

Usage: SPARK_GRAFT_SF_DIR=... python3 tools/time_query.py N query [query ...]
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

    spark = get_session("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # warm codegen/JIT once with a trivial query
    qs["q6_revenue_delta"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        times = []
        for _ in range(reps):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(name)
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            times.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(times)} reps={times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
