#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <outDir>
Reads each <outDir>/<name> result parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, registers the sf tables as DuckDB views, runs
each oracle SQL, and compares column-name-sorted values row by row.
Dev tool only — not part of the shipped library.
"""
import json, math, sys

import duckdb

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read result parquet: {e}")
            failures += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns differ spark={gcols} duck={ecols}")
            failures += 1
            continue
        got, exp = got[gcols], exp[ecols]
        # dtype-strict: the driver hashes typed values, so int64-vs-float64
        # (e.g. DuckDB HUGEINT surfacing as float) must fail here too.
        dtype_bad = []
        for c in gcols:
            ka, kb = got[c].dtype.kind, exp[c].dtype.kind
            ka = "i" if ka == "u" else ka
            kb = "i" if kb == "u" else kb
            if ka != kb:
                dtype_bad.append(f"{c}: spark={got[c].dtype} duck={exp[c].dtype}")
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch {'; '.join(dtype_bad)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            failures += 1
            continue
        bad = 0
        for i in range(len(got)):
            for c in gcols:
                a, b = norm(got[c].iloc[i]), norm(exp[c].iloc[i])
                an = a is None or (isinstance(a, float) and math.isnan(a))
                bn = b is None or (isinstance(b, float) and math.isnan(b))
                if an and bn:
                    continue
                if an != bn or a != b:
                    if bad == 0:
                        print(f"FAIL {name}: row {i} col {c}: spark={a!r} duck={b!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} cell mismatches over {len(got)} rows")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    # queries without oracle: rows-only note
    print(f"\n{failures} failures")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
