from interop_datalake_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    decode_audio_meta,
    decode_image_meta,
    extract_features,
    resize_images,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_audio_meta",
    "decode_image_meta",
    "extract_features",
    "resize_images",
    "sample_frames",
]
