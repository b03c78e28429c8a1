"""Declared schemas.

The reference validates column *presence* only and coerces types afterwards
(/root/reference/src/data_processor.py:22-36,55,61,127-133); we declare the
schema up front so the CSV scan never pays inference and malformed values
become NULLs at read time (identical end semantics, one pass).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input schema of the reference's transactions CSV
# (/root/reference/src/data_processor.py:20, README.md:6). `amount` is read
# as string then cast so that malformed numerics null out exactly like
# pandas `to_numeric(errors='coerce')` (F2 in SURVEY.md §2a).
TRANSACTIONS_RAW = T.StructType(
    [
        T.StructField("transaction_id", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("amount", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)

# Output schema, fixed order (/root/reference/src/data_processor.py:136-137;
# storage types /root/reference/src/core/db_manager.py:31-38).
TRANSACTIONS_OUT = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("amount", T.DoubleType(), False),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("processed_at", T.StringType(), False),
    ]
)

REQUIRED_COLUMNS = [f.name for f in TRANSACTIONS_RAW.fields]
OUTPUT_COLUMNS = [f.name for f in TRANSACTIONS_OUT.fields]

# Driver test tables (FIXTURES.md §2) — names only; parquet carries its own
# schema, these document join keys and let tests assert read schemas.
TEST_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
