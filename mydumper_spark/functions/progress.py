"""Progress / row counters (SURVEY §2.5 A6-A8).

The reference keeps atomic per-table row counters and batched thread-local
counters (/root/reference/src/mydumper/mydumper_write.c:783-820) plus a
global max-statement-size recorded into the metadata [config]
(:597-616). The Spark-native mechanism is ``df.observe`` with an
``Observation`` handle — named aggregates evaluated *during* the action
(accumulator-backed, zero extra passes over the data), which is exactly the
semantics of the reference's counters: free-riding on the write itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def observe_counters(df: DataFrame) -> tuple[DataFrame, Observation]:
    """A6/A7: attach row/byte counters to a plan. Returns (df, observation);
    read ``observation.get`` after any action on the returned df.

    - rows           ↔ per-table row counter (A6)
    - approx_bytes   ↔ bytes-written counter (A6)
    - max_row_bytes  ↔ max statement size tracking (A7)
    """
    obs = Observation()
    row_bytes = F.length(F.concat_ws(",", *[F.col(c).cast("string") for c in df.columns]))
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(row_bytes).alias("approx_bytes"),
        F.max(row_bytes).alias("max_row_bytes"),
    )
    return observed, obs
