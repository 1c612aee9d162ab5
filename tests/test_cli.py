"""Module-CLI E2E tests (reference setup.R + test_conversion.R parity,
round-4 VERDICT next-round item #3): ``setup`` bootstraps a project,
``convert`` turns its examples into the star-schema output directory.

Invoked in-process through ``__main__.main`` — ``get_spark`` uses
``getOrCreate``, so the suite's session is reused instead of paying a
fresh JVM per test; the subprocess surface itself (argv parsing, exit
codes, bare two-arg form) is identical.
"""

from __future__ import annotations

import os

import pytest

from xml_to_parquet_spark.__main__ import SETUP_DIRS, main


def test_setup_bootstraps_project(tmp_path):
    proj = str(tmp_path / "proj")
    assert main(["setup", proj, "--skip-spark-check"]) == 0
    for d in SETUP_DIRS:
        assert os.path.isdir(os.path.join(proj, d)), d
    for rel in (
        "examples/products.xml",
        "examples/orders.xml",
        "schemas/products.xsd",
    ):
        assert os.path.exists(os.path.join(proj, rel)), rel
    # idempotent: re-run keeps existing fixtures
    marker = os.path.join(proj, "examples", "products.xml")
    before = open(marker).read()
    assert main(["setup", proj, "--skip-spark-check"]) == 0
    assert open(marker).read() == before


def test_cli_convert_produces_star_output(spark, tmp_path):
    """setup → copy examples to input → convert --validate: the
    reference's test_conversion.R flow, against the module CLI."""
    proj = str(tmp_path / "proj")
    assert main(["setup", proj, "--skip-spark-check"]) == 0
    import shutil

    for f in ("products.xml", "orders.xml"):
        shutil.copy(
            os.path.join(proj, "examples", f), os.path.join(proj, "input", f)
        )
    rc = main(
        [
            "convert",
            os.path.join(proj, "input"),
            os.path.join(proj, "output"),
            "--validate",
            "--schema-dir",
            os.path.join(proj, "schemas"),
            "--log-dir",
            os.path.join(proj, "logs"),
        ]
    )
    assert rc == 0
    fact_path = os.path.join(proj, "output", "fact_main.parquet")
    assert os.path.exists(fact_path)
    fact = spark.read.parquet(fact_path)
    assert fact.count() == 5  # 3 products + 2 orders
    assert "record_id" in fact.columns
    for report in (
        "processing_manifest.csv",
        "parquet_metadata.csv",
        "schema_documentation.csv",
    ):
        assert os.path.exists(os.path.join(proj, "output", report)), report
    # date-rotated run log written
    assert os.listdir(os.path.join(proj, "logs"))


def test_cli_bare_two_arg_form_is_convert(spark, tmp_path):
    proj = str(tmp_path / "p2")
    assert main(["setup", proj, "--skip-spark-check"]) == 0
    import shutil

    shutil.copy(
        os.path.join(proj, "examples", "products.xml"),
        os.path.join(proj, "input", "products.xml"),
    )
    rc = main(
        [
            os.path.join(proj, "input"),
            os.path.join(proj, "output"),
            "--no-reports",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(proj, "output", "fact_main.parquet"))


def test_cli_convert_missing_input_is_exit_2(tmp_path):
    rc = main(
        [
            "convert",
            str(tmp_path / "nope"),
            str(tmp_path / "out"),
            "--no-reports",
        ]
    )
    assert rc == 2


def test_cli_help_exits_zero():
    with pytest.raises(SystemExit) as ei:
        main(["--help"])
    assert ei.value.code == 0


def test_cli_table_management(spark, tmp_path, capsys):
    """history / rollback / vacuum subcommands over a published root
    (driver-side metadata ops — no new SparkSession needed)."""
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.__main__ import main
    from xml_to_parquet_spark.sinks.publish import (
        publish_parquet,
        read_published,
    )

    root = str(tmp_path / "t")
    df = spark.range(20).select("id", F.lit("a").alias("tag"))
    publish_parquet(df, root)
    publish_parquet(
        spark.range(5).select("id", F.lit("b").alias("tag")), root
    )

    assert main(["table", "history", root]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    import json

    assert json.loads(out[0])["version"] == 2

    assert main(["table", "rollback", root, "1"]) == 0
    capsys.readouterr()
    assert read_published(spark, root).count() == 20

    # diff BEFORE vacuum (retention must outlive the oldest consumer):
    # v1 -> v2 replaced 20 'a' rows with 5 'b' rows
    assert main(["table", "diff", root, "1", "2", "--limit", "3"]) == 0
    dout = capsys.readouterr().out.strip().splitlines()
    assert dout[0] == "inserts=5 deletes=20"
    assert all('"_change_type"' in ln for ln in dout[1:])
    assert len(dout) == 1 + 3  # limit honored

    assert main(["table", "vacuum", root, "--keep", "2"]) == 0
    vout = capsys.readouterr().out
    assert "removed" in vout
    assert read_published(spark, root).count() == 20

    # vacuumed-base diff raises the documented retention error
    import pytest

    with pytest.raises(FileNotFoundError, match="committed history"):
        main(["table", "diff", root, "1"])


def test_cli_corpus_monitors(spark, capsys):
    import json

    # reuses the live session via get_spark's getOrCreate
    sf = "/root/testdata/sf0.001"
    assert main([
        "corpus", "drift", f"{sf}/documents.parquet", "src0", "src1",
    ]) == 0
    lines = [
        json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
    ]
    assert len(lines) == 20 and {"key", "dppm"} <= set(lines[0])

    assert main(["corpus", "diversity", f"{sf}/documents.parquet"]) == 0
    lines = [
        json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
    ]
    assert all(0 < r["ttr_ppm"] <= 10**6 for r in lines) and lines

    assert main([
        "corpus", "anomalies", f"{sf}/events.parquet", "--top-k", "5",
    ]) == 0
    lines = [
        json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
    ]
    assert len(lines) == 5 and {"grp", "z2_ppm", "is_anomaly"} <= set(
        lines[0]
    )
