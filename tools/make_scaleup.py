#!/usr/bin/env python3
"""Build a 10x-replicated copy of the sf0.1 fixtures (~sf1-equivalent row
counts) for scale validation of the heavy kernels. Key spaces are offset
per replica so series/doc/vector identities stay distinct; text and
vector payloads are left identical, which makes every original near-dup
cluster 10x denser -- a deliberate stress of the bucket caps and the
cluster-assembly fixpoint, not an artifact to avoid. Timestamps keep the
int64-nanosecond physical type (pyarrow, not duckdb, so the engine's
nanosAsLong read path sees the same schema as the driver fixtures).

Usage: make_scaleup.py <src_sf_dir> <out_dir> [factor]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

src, out = sys.argv[1], sys.argv[2]
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

OFFSETS = {
    "documents": {"doc_id": 10_000_000},
    "events": {"event_id": 1_000_000_000_000, "user_id": 1_000_000},
    "embeddings": {"vec_id": 10_000_000},
}

import os
os.makedirs(out, exist_ok=True)
for table, offs in OFFSETS.items():
    t = pq.read_table(f"{src}/{table}.parquet")
    reps = []
    for i in range(factor):
        r = t
        for col, step in offs.items():
            idx = r.schema.get_field_index(col)
            shifted = pc.add(r.column(col), i * step)
            r = r.set_column(idx, r.schema.field(col), shifted.cast(r.schema.field(col).type))
        reps.append(r)
    big = pa.concat_tables(reps)
    pq.write_table(big, f"{out}/{table}.parquet")
    print(f"{table}: {t.num_rows} -> {big.num_rows}")
