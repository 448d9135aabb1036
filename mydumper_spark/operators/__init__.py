from mydumper_spark.operators.transform import TableTransform, apply_transform  # noqa: F401
