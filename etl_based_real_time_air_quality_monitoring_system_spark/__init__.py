"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL air-quality monitoring system
(``/root/reference``), re-architected Spark-first.

Layout
------
- ``session``    : SparkSession builder (AQE + Kryo + UTC, reference confs
                   per ``spark_processing/spark_processor.py:17-22``).
- ``schemas``    : explicit StructTypes (air-quality record per
                   ``spark_processing/spark_processor.py:32-52``; driver
                   testdata tables per ``FIXTURES.md``).
- ``sources``    : scans and sinks (SURVEY.md §2.1 S1-S12).
- ``functions``  : scalar column functions (SURVEY.md §2.8 F1-F13) —
                   pure ``Column -> Column`` builders, zero Python UDFs.
- ``operators``  : composable DataFrame operators — cleaning (P1-P9),
                   aggregation (A1-A11), sorts/top-k (O1-O5), plus the
                   scale-out extensions (dedup, similarity, text,
                   multimodal).
- ``plans``      : end-to-end query pipelines (the flagship ETL plan).
- ``streaming``  : Structured Streaming re-expression of the reference's
                   producer/consumer loops (SURVEY.md §2.9 T1-T10).

Everything is DataFrame/SQL-first so Catalyst owns the physical plan;
Python UDFs appear only in the extension operators where no built-in
exists, and then only as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
