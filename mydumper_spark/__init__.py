"""mydumper_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of mydumper/mydumper (reference: /root/reference).

The reference is a distributed ETL pipeline compiler: it turns a CLI/config
surface into thousands of chunked SELECTs, per-row transformation pipelines,
and formatted file sinks, plus a DAG-scheduled parallel loader. This package
re-expresses every one of those capabilities Spark-first:

- ``catalog``      — source/table discovery + filters (SURVEY §2.3 P6-P12, S10)
- ``planner``      — chunk/partition planning (SURVEY §2.1 S1-S9)
- ``operators``    — transform pipeline (P1-P5), dedup/similarity/text/multimodal
                     extension operators for training-data pipelines
- ``functions``    — masquerade scalar library (T1-T12), checksums (A1-A5)
- ``sinks``        — writers (K1-K8) + manifest
- ``plans``        — loader DAG (L1-L8)
- ``streaming``    — stream producer/consumer (ST1-ST6)

Everything is DataFrame-declarative so Catalyst handles pushdown, pruning and
join planning; Python UDFs appear only where semantics genuinely require them
(Arrow-batched pandas UDFs, never row-at-a-time).
"""

__version__ = "0.1.0"

from mydumper_spark.session import get_session  # noqa: F401
