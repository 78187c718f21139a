#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query result
dumped by graft.Verify, run the recorded oracle SQL in DuckDB over the same
parquet tables and compare row-by-row (columns sorted by name, exact values).

Usage: compare.py <sfDir> <verifyOutDir>
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return norm(v.item())
    except ImportError:
        pass
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    # heavy sf1 oracles (q193's shingle chain, q203's IVFADC chain) can
    # exceed RAM under DuckDB's default no-spill config — give the gate a
    # bounded budget and a spill directory so it degrades to disk instead
    # of dying with a bad-allocation error (observed on the r12 sf1 pass).
    # Derive the budget from physical memory: a hardcoded 96GB RAISES the
    # limit above DuckDB's default (80% of RAM) on smaller hosts, so the
    # spill path never triggers and the process gets OOM-killed instead
    # of degrading to disk (ADVICE r12).
    mem_gb = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")) // 2**30
    limit_gb = min(96, max(1, mem_gb * 8 // 10))
    con.execute(f"SET memory_limit='{limit_gb}GB'")
    spill = f"{out_dir}/_duckdb_spill"
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; graft.tools.DataGen output is a
        # Spark-written directory of part files — glob in that case
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got_rel.columns)
            got_types = dict(zip(got_cols, [str(t) for t in got_rel.types]))
            got = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            exp_types = dict(zip(exp_cols, [str(t) for t in exp_rel.types]))
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        # The driver's hash is representation-sensitive (e.g. DuckDB HUGEINT vs
        # Spark BIGINT hashed differently even when values match) — a type
        # divergence IS a gate failure, not a warning: q199 shipped red in
        # round 11 precisely because this printed WARN and counted green
        # (r11 verdict task 2). Local gate must be a superset of the driver's.
        tdiff = {c: (got_types[c], exp_types[c]) for c in got_cols
                 if got_types[c] != exp_types[c]}
        if tdiff:
            print(f"FAIL {name}: column type mismatch (driver hash risk): {tdiff}")
            n_fail += 1
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = [tuple(norm(r[i]) for i in gi) for r in got]
        e = [tuple(norm(r[i]) for i in ei) for r in exp]
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        bad = next((i for i, (a, b) in enumerate(zip(g, e)) if a != b), None)
        if bad is not None:
            print(f"FAIL {name}: first diff at row {bad}:\n  spark : {g[bad]}\n  oracle: {e[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
