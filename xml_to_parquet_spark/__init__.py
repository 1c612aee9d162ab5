"""xml_to_parquet_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference repo
``timoruohomaki/xml-to-parquet`` (R batch ETL: XML → profiled schema →
star-schema Parquet), re-expressed Spark-first:

- declarative DataFrame plans (Catalyst handles pushdown/pruning/join planning)
- broadcast joins for capped-cardinality dimensions
- one-pass profiling aggregation for schema inference
- global (not per-batch) surrogate keys
- plus the large-scale training-data-pipeline extensions: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine), similarity
  search, text analysis, multimodal column plumbing, structured streaming.

Layout:
    session        SparkSession builder tuned for the workload
    operators/     relational core (project/filter/join/agg/window/setops)
    plans/         schema analyzer (profiling+classification), star transformer
    sources/       XML ingest (rowTag + flatten + comment business keys), parquet
    functions/     scalar fns, text analysis, dedup, similarity, multimodal
    sinks/         parquet/CSV sinks, manifest + report writers
    validation/    XSD/DTD validation (lxml-gated) + well-formedness
    streaming/     file-stream ingest (Trigger.AvailableNow), windowed aggs
"""

__version__ = "0.1.0"
