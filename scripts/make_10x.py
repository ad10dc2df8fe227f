"""Build the synthetic 10x dataset used by SCALE.md: union of 10
key-shifted copies of sf0.1 written to /tmp/sf1x with the same file
names as the driver's testdata, so any queries() entry runs on it
unchanged. Facts (orders, lineitem, events) and supplier are scaled;
dimensions (nation, region, customer, part, documents, embeddings) are
copied once so selectivities and join fan-outs keep their shape.

Key shifts keep referential integrity within each copy: orderkeys and
suppkeys shift together across orders/lineitem/supplier.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x"
COPIES = 10


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    t0 = time.time()

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    ok_max = con.execute(f"SELECT MAX(o_orderkey) + 1 FROM {src('orders')}").fetchone()[0]
    sk_max = con.execute(f"SELECT MAX(s_suppkey) + 1 FROM {src('supplier')}").fetchone()[0]
    ev_max = con.execute(f"SELECT MAX(event_id) + 1 FROM {src('events')}").fetchone()[0]

    def shifted_union(table: str, shifts: dict[str, int]) -> str:
        parts = []
        for i in range(COPIES):
            cols = ", ".join(
                f"{c} + {i * base} AS {c}" if i else c for c, base in shifts.items()
            )
            others = f"* EXCLUDE ({', '.join(shifts)})"
            parts.append(f"SELECT {cols}, {others} FROM {src(table)}")
        return " UNION ALL ".join(parts)

    jobs = {
        "orders": shifted_union("orders", {"o_orderkey": ok_max}),
        "lineitem": shifted_union(
            "lineitem", {"l_orderkey": ok_max, "l_suppkey": sk_max}
        ),
        "supplier": shifted_union("supplier", {"s_suppkey": sk_max}),
        "events": shifted_union("events", {"event_id": ev_max}),
    }
    for t in ("nation", "region", "customer", "part", "documents", "embeddings"):
        jobs[t] = f"SELECT * FROM {src(t)}"

    for t, q in jobs.items():
        con.execute(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t:12s} {n:>9,} rows")
    print(f"built {DST} in {time.time() - t0:.1f} s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
