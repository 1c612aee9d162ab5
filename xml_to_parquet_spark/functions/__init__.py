from xml_to_parquet_spark.functions import (
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)

__all__ = ["text", "dedup", "similarity", "multimodal", "sampling"]
