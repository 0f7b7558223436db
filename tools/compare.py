#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the same
testdata parquet tables, sorts columns by name + rows, and compares
cell-by-cell (exact; tiny float tolerance reported separately).

Dev-loop tool only — the real gate is driver-side.
"""
import sys, os, json, math
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows by stringified tuple
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: [repr(x) for x in t])

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            gcols, grows = got.columns, got.fetchall()
            exp = con.sql(oracle[name])
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: {ex}"); n_fail += 1; continue
        # dtype parity: the driver hashes typed (arrow) values, so a DuckDB
        # HUGEINT vs Spark BIGINT mismatches even when Python ints compare equal.
        gtypes = dict(zip(got.columns, [str(t) for t in got.types]))
        etypes = dict(zip(exp.columns, [str(t) for t in exp.types]))
        INTS = {"TINYINT","SMALLINT","INTEGER","BIGINT","HUGEINT",
                "UTINYINT","USMALLINT","UINTEGER","UBIGINT","UHUGEINT"}
        drift = [(c, gtypes[c], etypes[c]) for c in gtypes
                 if c in etypes and gtypes[c] != etypes[c]]
        int_drift = [d for d in drift if d[1] in INTS or d[2] in INTS]
        if int_drift:
            print(f"FAIL {name}: integer dtype drift {int_drift}"); n_fail += 1; continue
        for d in drift:
            print(f"  warn {name}: dtype {d[0]}: spark={d[1]} duck={d[2]}")
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs {ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount {len(gr)} vs {len(er)}"); n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if not all(cells_equal(x, y) for x, y in zip(a, b)):
                bad = (i, a, b); break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
