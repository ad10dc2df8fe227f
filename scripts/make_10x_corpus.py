"""Build a 10x fixture where the CORPUS tables actually grow — the
companion of make_10x.py, which copies documents/embeddings once
(dimension-sized) and therefore cannot exercise corpus-proportional
terms in the dedup/ANN operators (SCALE.md states this caveat; VERDICT
r07 relied on it to hide two O(corpus) defects).

documents: 10 key-shifted copies (doc_id shift; text unchanged, so the
copies ARE near-duplicates — the dedup output grows with true duplicate
mass, which is the work being measured).
embeddings: 10 key-shifted copies (vec_id shift, label/embedding
unchanged — exact duplicates in embedding space).
Every other table is copied once so any queries() entry still runs.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x_corpus"
COPIES = 10


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    t0 = time.time()

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    doc_max = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM {src('documents')}"
    ).fetchone()[0]
    vec_max = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM {src('embeddings')}"
    ).fetchone()[0]

    def shifted_union(table: str, key: str, base: int) -> str:
        parts = []
        for i in range(COPIES):
            kexpr = f"{key} + {i * base} AS {key}" if i else key
            parts.append(
                f"SELECT {kexpr}, * EXCLUDE ({key}) FROM {src(table)}"
            )
        return " UNION ALL ".join(parts)

    jobs = {
        "documents": shifted_union("documents", "doc_id", doc_max),
        "embeddings": shifted_union("embeddings", "vec_id", vec_max),
    }
    for t in (
        "nation", "region", "customer", "part", "orders", "lineitem",
        "supplier", "events",
    ):
        jobs[t] = f"SELECT * FROM {src(t)}"

    for t, q in jobs.items():
        con.execute(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"built in {time.time() - t0:.1f}s at {DST}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
