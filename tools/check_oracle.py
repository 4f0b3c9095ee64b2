#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's output
directory (per-query parquet + oracle_sql.json), run each oracle SQL in
DuckDB against the sf tables, and compare row sets (columns sorted by name,
rows sorted, values normalized).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return v
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(norm(r[i]) for i in order) for r in rows],
                  key=lambda t: tuple((x is None, str(x)) for x in t))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = got_rel.columns
            got = rowset(got_rel.fetchall(), got_cols)
        except Exception as e:
            results[name] = f"SPARK-OUTPUT-ERROR: {e}"
            continue
        try:
            exp_rel = con.sql(sql)
            exp_cols = exp_rel.columns
            exp = rowset(exp_rel.fetchall(), exp_cols)
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        if sorted(got_cols) != sorted(exp_cols):
            results[name] = f"SCHEMA-MISMATCH: spark={sorted(got_cols)} oracle={sorted(exp_cols)}"
        elif len(got) != len(exp):
            results[name] = f"ROWCOUNT-MISMATCH: spark={len(got)} oracle={len(exp)}"
        elif got != exp:
            diffs = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            results[name] = f"VALUE-MISMATCH: first diffs {diffs}"
        else:
            results[name] = "OK"
    # queries without oracle → rows-only check
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = d.split("/")[-1]
        if name not in oracle:
            try:
                n = con.sql(f"SELECT COUNT(*) FROM '{d}/*.parquet'").fetchone()[0]
                results[name] = f"ROWS-ONLY: {n} rows" + (" (EMPTY!)" if n == 0 else "")
            except Exception as e:
                results[name] = f"ROWS-ONLY-ERROR: {e}"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(("PASS " if v == "OK" else "---- ") + k + ": " + str(v)[:300])
    print(f"\n{ok}/{len([k for k in results if k in oracle])} oracle-checked queries pass")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
