#!/usr/bin/env python3
"""Parallelism-invariance check: diff two graft.Verify output dirs
(produced at different SPARK_GRAFT_CPUS / shuffle widths) query by query.
Rows and columns are sorted before hashing, mirroring the driver's
compare, so any difference is a real value difference, not an ordering
artifact.

Usage: invariance.py <outDirA> <outDirB>
"""
import hashlib
import math
import os
import sys

import duckdb


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def digest(con, path):
    rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
    cols = sorted(rel.columns)
    rows = con.sql(
        f"SELECT {', '.join(cols)} FROM '{path}/*.parquet'").fetchall()
    rows.sort(key=lambda r: tuple(norm(v) for v in r))
    h = hashlib.sha256()
    for r in rows:
        h.update(("|".join(norm(v) for v in r) + "\n").encode())
    return len(rows), h.hexdigest()


def main(a, b):
    con = duckdb.connect()
    queries = sorted(d for d in os.listdir(a)
                     if os.path.isdir(os.path.join(a, d)))
    bad = 0
    for q in queries:
        if not os.path.isdir(os.path.join(b, q)):
            print(f"MISS {q}: absent from {b}")
            bad += 1
            continue
        (na, ha), (nb, hb) = digest(con, f"{a}/{q}"), digest(con, f"{b}/{q}")
        if (na, ha) != (nb, hb):
            print(f"DIFF {q}: {na} rows/{ha[:12]} vs {nb} rows/{hb[:12]}")
            bad += 1
        else:
            print(f"SAME {q} ({na} rows)")
    print(f"== {len(queries) - bad} same, {bad} differ ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
