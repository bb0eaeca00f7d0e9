from bun_csv_spark.functions.coercion import (  # noqa: F401
    parse_number,
    parse_integer,
    parse_boolean,
    parse_date,
    parse_currency,
    parse_percent,
    dynamic_type,
    infer_column_type,
    apply_dynamic_typing,
)
from bun_csv_spark.functions.text import (  # noqa: F401
    tokens,
    token_count,
    quality_features,
    fingerprint,
    char_shingles,
    word_ngrams,
)
from bun_csv_spark.functions.vectors import dot, l2_norm, cosine_similarity  # noqa: F401
