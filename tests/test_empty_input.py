"""Empty-input robustness: EVERY registry query must run (returning zero
or aggregate-identity rows, never raising) against schema-only tables —
the shape of an empty partition, a fresh ingest directory, or a filter
that matched nothing at 100 TB. (Found real bugs: IVF k-means crashed on
an empty training sample; PageRank divided by zero on an empty edge
set.)"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from large_csv_etl_spark.queries import all_queries

from .conftest import SF_DIR

TABLES = [
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
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Single-file parquet tables with the real schemas and zero rows
    (single-file to mirror the driver fixture layout exactly — the
    streaming readers' footer probe depends on it)."""
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        sch = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(
            pa.table(
                {f.name: pa.array([], type=f.type) for f in sch}, schema=sch
            ),
            os.path.join(str(d), f"{t}.parquet"),
        )
    return str(d)


@pytest.mark.parametrize("name", list(all_queries()))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    all_queries()[name](spark, empty_sf_dir).collect()
