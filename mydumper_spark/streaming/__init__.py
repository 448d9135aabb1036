from mydumper_spark.streaming.stream import (  # noqa: F401
    stream_dump,
    stream_restore,
    snapshot_dump,
    sessionize_stream,
)
