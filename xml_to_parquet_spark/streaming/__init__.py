from xml_to_parquet_spark.streaming.file_stream import (
    stream_events_windowed,
    stream_xml_dir,
    run_available_now,
)

__all__ = ["stream_events_windowed", "stream_xml_dir", "run_available_now"]
