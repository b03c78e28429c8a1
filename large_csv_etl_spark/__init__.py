"""large_csv_etl_spark — a PySpark-native analytics engine.

From-scratch, idiomatic-Spark re-expression of the capabilities of the
reference repo lavanya-naresh/large-csv-etl (a chunked pandas CSV->SQLite
ETL; see SURVEY.md), extended with the LLM-data-pipeline operator surface
(joins/windows/dedup/similarity/text/event analytics) over the driver's
TPC-H-ish test tables.

Design stance: thin, pure ``DataFrame -> DataFrame`` functions over stock
PySpark. No custom execution machinery; Catalyst + AQE do the optimizing.
"""

__version__ = "0.1.0"
