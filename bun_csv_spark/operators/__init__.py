from bun_csv_spark.operators.frame import TurboFrame  # noqa: F401
from bun_csv_spark.operators.aggregates import agg_column, AGG_FNS  # noqa: F401
