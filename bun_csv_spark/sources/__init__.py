from bun_csv_spark.sources.events import read_events  # noqa: F401
