from xml_to_parquet_spark.sources.xml_source import (
    read_xml_auto,
    flatten_records,
    add_lineage,
    read_xml_records,
    extract_business_keys,
    attach_business_keys,
    derive_document_order,
    invalidate_xml_probe_cache,
    probe_first_file,
    CANDIDATE_ROW_TAGS,
    COMMENT_PATTERNS,
)

__all__ = [
    "read_xml_auto",
    "flatten_records",
    "add_lineage",
    "read_xml_records",
    "extract_business_keys",
    "attach_business_keys",
    "derive_document_order",
    "invalidate_xml_probe_cache",
    "probe_first_file",
    "CANDIDATE_ROW_TAGS",
    "COMMENT_PATTERNS",
]
