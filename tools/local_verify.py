#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
(run AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`)

For each oracle_sql.json entry, runs the oracle SQL in DuckDB against
views over the same parquet tables and compares against the Spark
parquet under <outDir>/<name>:
  - column names (sorted)
  - column TYPES (exact DuckDB type string — BIGINT vs HUGEINT,
    DECIMAL(28,2) vs DECIMAL(38,2), TIMESTAMP vs TIMESTAMP_NS all
    count as mismatches; round 1 proved the driver's hash
    distinguishes these widened representations)
  - row count
  - cell values (exact, NaN-equal)

The expected query list is derived from oracle_sql.json keys plus any
extra output dirs (rows-only checks), so a query that threw inside
Verify and wrote no output counts as FAIL instead of vanishing.
"""
import json, math, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def col_types(con, sql):
    """sorted [(name, type)] for a query via DESCRIBE."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return sorted((r[0], r[1]) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    dirs = set(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
    names = sorted(set(oracles) | dirs)
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output (query threw in Verify?)")
            n_fail += 1
            continue
        got_sql = f"SELECT * FROM read_parquet({files!r})"
        got = con.execute(got_sql).fetchdf()
        if name not in oracles:
            print(f"ROWS-ONLY {name}: rows={len(got)} cols={sorted(got.columns)}"
                  + (" EMPTY!" if len(got) == 0 else ""))
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_fail += 1; continue
        gt, et = col_types(con, got_sql), col_types(con, f"({oracles[name]})")
        if gt != et:
            diff = [(a, b) for a, b in zip(gt, et) if a != b]
            print(f"FAIL {name}: column types differ (spark vs oracle): {diff}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        got, exp = got[gc], exp[gc]
        bad = 0
        for c in gc:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a is None and b is None: continue
                if isinstance(a, float) and isinstance(b, float):
                    if a == b or (math.isnan(a) and math.isnan(b)): continue
                elif a == b: continue
                if bad == 0:
                    print(f"  first diff {name}.{c}[{i}]: got={a!r} exp={b!r}")
                bad += 1
        if bad:
            print(f"FAIL {name}: {bad} cell diffs"); n_fail += 1
        else:
            print(f"PASS {name}: rows={len(got)}"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
