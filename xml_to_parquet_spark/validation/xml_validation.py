"""XSD/DTD/well-formedness validation (SURVEY §2.10, reference
schema_validator.R).

Reference behavior:
- validate_xml_file: XSD (xml_validate) or DTD, chosen by probing for an
  internal DTD then discovering a sibling schema file (schema_validator.R:
  88-148)
- schema discovery: ``<stem>.xsd`` next to the file, else any ``.xsd`` in a
  schemas/ dir (schema_validator.R:116-139)
- batch validation returns a per-file status table (schema_validator.R:
  151-163) used as a gate: invalid files are excluded from the parse
  (main.R:153-166) — validation is a FILTER, not a typing source.

Spark-first shape: validation runs as a distributed pandas UDF over the
file list (each task validates its slice of files), returning a status
DataFrame that joins back against records on source_file_path. lxml is not
in this container, so the XSD/DTD branch is import-gated; well-formedness
uses stdlib expat and always works. The UDF signature/batching is real
either way — with lxml present the same code does full XSD validation.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # import-gated: not in this container; real on a full cluster image
    from lxml import etree as _lxml_etree  # type: ignore

    HAS_LXML = True
except ImportError:
    _lxml_etree = None
    HAS_LXML = False


def discover_schema_file(xml_path: str, schema_dir: str | None = None) -> str | None:
    """Reference schema-discovery order: sibling ``<stem>.xsd``, then any
    ``.xsd`` in ``schema_dir`` (schema_validator.R:116-139)."""
    stem = os.path.splitext(xml_path)[0]
    sibling = stem + ".xsd"
    if os.path.exists(sibling):
        return sibling
    if schema_dir:
        found = sorted(glob.glob(os.path.join(schema_dir, "*.xsd")))
        if found:
            return found[0]
    return None


def _check_one(path: str, schema_file: str | None) -> tuple[str, str]:
    """(status, error) for one file: validation_error | error | success."""
    try:
        with open(path, "rb") as fh:
            data = fh.read()
    except OSError as e:
        return "error", str(e)

    if schema_file and HAS_LXML:
        try:
            schema = _lxml_etree.XMLSchema(_lxml_etree.parse(schema_file))
            doc = _lxml_etree.fromstring(data)
            if not schema.validate(doc):
                return (
                    "validation_error",
                    "; ".join(str(e) for e in schema.error_log),
                )
            return "success", ""
        except _lxml_etree.XMLSyntaxError as e:
            return "error", str(e)

    # well-formedness via stdlib expat (always available)
    import xml.parsers.expat

    parser = xml.parsers.expat.ParserCreate()
    try:
        parser.Parse(data, True)
        return "success", ""
    except xml.parsers.expat.ExpatError as e:
        return "error", str(e)


def well_formed_check(path: str) -> bool:
    return _check_one(path, None)[0] == "success"


def validate_files(
    spark: SparkSession,
    files: list[str],
    schema_file: str | None = None,
    schema_dir: str | None = None,
) -> DataFrame:
    """Distributed per-file validation → (source_file_path, status, error).

    Files are validated executor-side via mapInPandas (Arrow-batched; each
    task opens only its slice). Join the result against parsed records on
    ``source_file_path`` to gate invalid files out (reference P4 semantics).
    """
    plan = [
        (f, schema_file or discover_schema_file(f, schema_dir)) for f in files
    ]
    pdf_schema = "source_file_path string, schema_file string"
    src = spark.createDataFrame(
        [(f, s or "") for f, s in plan], pdf_schema
    ).repartition(max(1, min(len(plan), 64)))

    def _validate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for f, s in zip(pdf["source_file_path"], pdf["schema_file"]):
                status, err = _check_one(f, s or None)
                out.append((f, status, err))
            yield pd.DataFrame(
                out, columns=["source_file_path", "status", "error"]
            )

    return src.mapInPandas(
        _validate, "source_file_path string, status string, error string"
    )


def normalize_path(col: F.Column) -> F.Column:
    """Strip the ``file:`` scheme input_file_name() adds, so validation
    paths (plain) and lineage paths (URI) join correctly."""
    return F.regexp_replace(col, r"^file:/+", "/")


def gate_valid(records: DataFrame, validation: DataFrame) -> DataFrame:
    """Keep only records from files whose validation status is success.

    Broadcast semi-join on file path (validation is one row per file).
    Matches the reference's success/error partition (main.R:153-166).
    """
    ok = validation.filter(F.col("status") == "success").select(
        normalize_path(F.col("source_file_path")).alias("__ok_path")
    )
    return (
        records.withColumn(
            "__norm_path", normalize_path(F.col("source_file_path"))
        )
        .join(
            F.broadcast(ok),
            on=F.col("__norm_path") == F.col("__ok_path"),
            how="left_semi",
        )
        .drop("__norm_path")
    )
