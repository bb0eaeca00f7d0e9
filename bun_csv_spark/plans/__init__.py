from bun_csv_spark.plans.expr import compile_filter, ExprError  # noqa: F401
