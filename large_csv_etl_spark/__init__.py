"""large_csv_etl_spark — a PySpark-native analytics engine.

From-scratch, idiomatic-Spark re-expression of the capabilities of the
reference repo lavanya-naresh/large-csv-etl (a chunked pandas CSV->SQLite
ETL; see SURVEY.md), extended with the LLM-data-pipeline operator surface
(joins/windows/dedup/similarity/text/event analytics) over the driver's
TPC-H-ish test tables.

Design stance: thin, pure ``DataFrame -> DataFrame`` functions over stock
PySpark. No custom execution machinery; Catalyst + AQE do the optimizing.
"""

__version__ = "0.2.0"

# Public surface (lazy submodules keep import light; these are the
# stable entry points a reference user migrates to):
#   session.get_spark            - tuned SparkSession builder
#   pipeline.run_pipeline / CLI  - the reference's flagship ETL path (E7)
#   transform.transform          - pure DF->DF reference-parity core
#   io.*                         - scans (csv/json/parquet), sinks, upsert,
#                                  profiler, bucketed write, stats
#   extensions.apply_chunk_transform - U1 pandas chunk plugin hook
#   queries.all_queries / all_oracles - the 75-entry named query registry
#   streaming.*                  - event-time operators + the ETL itself
#                                  over readStream
#   skew.*                       - salted aggregation / join rewrites
#   multimodal.*                 - binary payload + Arrow decode plumbing
