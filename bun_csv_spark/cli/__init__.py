from bun_csv_spark.cli.main import main  # noqa: F401
