from bun_csv_spark.multimodal.binary import (  # noqa: F401
    attach_binary_payload,
    decode_audio,
    decode_bmp_pixels,
    decode_image,
    decode_wav_samples,
    extract_audio_stats,
    extract_binary_features,
    extract_pixel_stats,
)
