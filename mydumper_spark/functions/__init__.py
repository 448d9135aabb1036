from mydumper_spark.functions.checksum import (  # noqa: F401
    canonical_row_string,
    portable_checksum,
    table_checksum,
)
from mydumper_spark.functions import masquerade  # noqa: F401
