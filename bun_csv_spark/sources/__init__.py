from bun_csv_spark.sources.events import read_events  # noqa: F401
from bun_csv_spark.sources.csv_reader import (  # noqa: F401
    CSVOptions,
    CSVReadError,
    detect_delimiter,
    dedupe_headers,
    read_csv,
    read_csv_with_errors,
)
from bun_csv_spark.sources.csv_writer import (  # noqa: F401
    convert,
    csv_line_expr,
    escape_formulae_expr,
    unparse,
    write_csv,
)
