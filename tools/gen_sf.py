#!/usr/bin/env python3
"""Post-step for graft.tools.GenSf: rewrite events.ts from BIGINT nanos
to parquet TIMESTAMP(NANOS), matching the driver testdata's physical
type (Tables.load reads it via nanosAsLong; DuckDB sees TIMESTAMP_NS).

Usage: python3 tools/gen_sf.py <outDir>
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main():
    out = sys.argv[1]
    p = f"{out}/events.parquet"
    t = pq.read_table(p)
    i = t.schema.get_field_index("ts")
    ts = t.column(i).cast(pa.timestamp("ns"))
    t = t.set_column(i, pa.field("ts", pa.timestamp("ns")), ts)
    pq.write_table(t, p, row_group_size=1 << 20)
    print(f"rewrote {p}: ts -> timestamp[ns], {t.num_rows} rows")


if __name__ == "__main__":
    main()
