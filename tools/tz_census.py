#!/usr/bin/env python
"""Census: for which registry entries is the tz-invariance wrapper
load-bearing?

`queries._tz_invariant` re-projects top-level instant TIMESTAMP outputs
to TIMESTAMP_NTZ at the registry boundary. The contract (VERDICT r9 /
ADVICE r9 #7-forward) is that NEW queries emit TIMESTAMP_NTZ at the
source so the wrapper stays a no-op safety net. This script builds every
entry's UNWRAPPED plan at sf0.001 and reports the entries whose source
schema still carries a top-level instant TIMESTAMP — the set the wrapper
actively rewrites. Schema analysis only (no job execution) for lazy
plans; entries that execute eagerly inside their builder (streaming
drains) do run, which is why the default SF is the tiny one.

Usage: python tools/tz_census.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import types as T  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from large_csv_etl_spark.queries import _MODULES
    from large_csv_etl_spark.session import get_spark

    spark = get_spark(app_name="tz_census")
    spark.sparkContext.setLogLevel("ERROR")
    # The wrapper normally pins this; the census inspects UNWRAPPED
    # builders, so pin it here the same way.
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    load_bearing: list[str] = []
    errors: list[str] = []
    n = 0
    for m in _MODULES:
        for name, fn in m.QUERIES.items():
            n += 1
            try:
                df = fn(spark, sf_dir)
                cols = [
                    f.name
                    for f in df.schema.fields
                    if type(f.dataType) is T.TimestampType
                ]
            except Exception as exc:  # census must see every entry
                errors.append(f"{name}: {type(exc).__name__}: {exc}")
                continue
            if cols:
                load_bearing.append(f"{name}: {', '.join(cols)}")
    print(f"# {n} entries inspected at {sf_dir}")
    print(f"# wrapper load-bearing (top-level instant TIMESTAMP at source): "
          f"{len(load_bearing)}")
    for line in sorted(load_bearing):
        print(f"  {line}")
    if errors:
        print(f"# errors: {len(errors)}")
        for line in errors:
            print(f"  {line}")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
