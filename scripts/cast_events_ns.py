#!/usr/bin/env python3
"""Driver-side post-step for graft.GenData output: rewrite events.parquet
with ts as INT64 TIMESTAMP(nanoseconds, isAdjustedToUTC=false) - the layout
the driver testdata uses (TESTDATA.md). Spark cannot emit nanosecond
timestamps itself (it writes INT96/micros), but the engine reads events.ts
as an epoch-nanos LONG via spark.sql.legacy.parquet.nanosAsLong=true, so a
generated dataset must match that physical layout for the events queries to
resolve. Driver-side tooling only (pyarrow is not available to the library).

Usage: cast_events_ns.py <dir>   # rewrites <dir>/events.parquet in place
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

d = sys.argv[1]
t = pq.read_table(f"{d}/events.parquet")
i = t.schema.get_field_index("ts")
t = t.set_column(i, "ts", t.column("ts").cast(pa.timestamp("ns")))
# Drop the Spark-written schema keys: Spark prefers the embedded
# row.metadata JSON (which still says TimestampType) over the parquet
# logical type, which would defeat the nanos cast on read-back.
t = t.replace_schema_metadata(
    {k: v for k, v in (t.schema.metadata or {}).items()
     if not k.startswith(b"org.apache.spark")})
pq.write_table(t, f"{d}/events.parquet", use_deprecated_int96_timestamps=False,
               coerce_timestamps=None, version="2.6")
print("rewrote", f"{d}/events.parquet", t.schema.field("ts").type)
