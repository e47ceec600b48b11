"""ifcb_data_pipeline_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of nodc-sweden/ifcb-data-pipeline.

Design notes
------------
The reference (an R/tidyverse batch ETL, see SURVEY.md) is re-expressed as
idiomatic Spark DataFrame/SQL dataflows:

* ``functions/``  — pure Catalyst column expressions (bin-id parsing, taxa
  cleaning, unit math, QC predicates).  No Python UDFs in the hot path.
* ``operators/``  — reusable DataFrame combinators (as-of join, interval
  join, coalescing fill-join, grouped top-k, adjacency filters, dedup,
  similarity search, text analysis).
* ``sources/``    — readers for the driver test tables plus the
  instrument-format scan surface (HDR key/value headers, feature CSVs).
* ``plans/``      — composed end-to-end pipelines (SHARK export, HAB alert)
  mirroring the reference's top-level entry points.
* ``streaming/``  — incremental / Structured Streaming semantics
  (anti-join work queues, file-arrival processing).
* ``queries/``    — the SURVEY §2 operator inventory expressed as paired
  (Spark callable, DuckDB oracle SQL) over the driver's synthetic tables;
  consumed by ``__spark_entry__.py``.

Everything is partition-wise: no driver-side collects except final small
aggregates, broadcast hints on dimension tables, and explicit orderings
wherever the reference depended on implicit row order.
"""

__version__ = "0.1.0"
