from bun_csv_spark.multimodal.binary import (  # noqa: F401
    attach_binary_payload,
    extract_binary_features,
    decode_image_stub,
)
