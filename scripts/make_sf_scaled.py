"""Generate an R x scaled testdata dir from sf0.1 by FK-consistent
rekeyed replication (round-9 item 5: the one uniform sf1.0 bench).

Every key column k becomes k*R + rep, applied consistently on both
sides of each FK (customer<-orders<-lineitem->part/supplier; events per
user; documents; embeddings), so per-entity distributions — orders per
customer, items per order, events per user — are IDENTICAL to sf0.1
while every table grows exactly R-fold. nation/region stay fixed
(dimension constants, like TPC-H). The events timestamp column is
copied bit-for-bit, preserving whatever parquet flavor the driver
shipped.

Usage: python scripts/make_sf_scaled.py <out_dir> [R=10] [src=/root/testdata/sf0.1]
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["nation", "region"]


def main() -> None:
    out = sys.argv[1]
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    for t in FIXED:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied")
    for t, keys in KEYED.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        reps = []
        for k in range(r):
            cols = []
            for name in base.schema.names:
                col = base.column(name)
                if name in keys:
                    col = pc.add(
                        pc.multiply(
                            pc.cast(col, pa.int64()), pa.scalar(r, pa.int64())
                        ),
                        pa.scalar(k, pa.int64()),
                    )
                cols.append(col)
            reps.append(pa.table(cols, names=base.schema.names))
        big = pa.concat_tables(reps)
        pq.write_table(big, f"{out}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    main()
