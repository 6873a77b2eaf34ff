#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir: load the Spark parquet result, run the
oracle SQL (from oracle_sql.json) in DuckDB with the sfDir parquet tables
registered as views, sort columns by name + rows by all columns, and
compare. Mirrors the driver: column-name sets must match, row counts must
match, values hash-equal (floats compared to 1e-9 rel tolerance here so we
can distinguish real bugs from representation noise the driver may or may
not forgive).
"""
import json, math, os, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v

def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b

n_pass = n_fail = n_rows_only = 0
fails = []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetch_arrow_table()
    except Exception as e:
        fails.append((name, f"spark result unreadable: {e}"))
        n_fail += 1
        continue
    if name not in oracles:
        n_rows_only += 1
        print(f"ROWS-ONLY {name}: rows={spark_df.num_rows}")
        continue
    try:
        ora = con.execute(oracles[name]).fetch_arrow_table()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        n_fail += 1
        continue
    # Portability guard (round-11 post-mortem of txt_bpe_learn): DuckDB
    # HUGEINT (e.g. an uncast sum(BIGINT)) converts client-side in a
    # version-dependent way — pandas float64 on some stacks — so "4568.0"
    # vs the engine's "4568" fails the driver's value hash while the
    # builder's tolerant compare stays green. No hashed oracle may emit
    # one; CAST(... AS BIGINT) in the SQL.
    try:
        dtypes = con.execute(f"DESCRIBE ({oracles[name]})").fetchall() \
            if not oracles[name].lstrip().lower().startswith("with") \
            else con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        hug = [r[0] for r in dtypes if r[1] in ("HUGEINT", "UHUGEINT")]
    except Exception:
        # DESCRIBE quirks never fail the gate; fall back to the arrow
        # schema probe (HUGEINT surfaces as decimal128(38, 0))
        hug = [f.name for f in ora.schema
               if str(f.type).startswith("decimal128(38")]
    if hug:
        fails.append((name, f"PORTABILITY: oracle emits HUGEINT column(s) "
                            f"{hug} — cast to BIGINT in the SQL"))
        n_fail += 1
        continue
    scols, ocols = sorted(spark_df.column_names), sorted(ora.column_names)
    if scols != ocols:
        fails.append((name, f"schema mismatch: spark={scols} oracle={ocols}"))
        n_fail += 1
        continue
    srows = sorted([tuple(norm(v) for v in row)
                    for row in zip(*[spark_df.column(c).to_pylist() for c in scols])],
                   key=repr)
    orows = sorted([tuple(norm(v) for v in row)
                    for row in zip(*[ora.column(c).to_pylist() for c in ocols])],
                   key=repr)
    if len(srows) != len(orows):
        fails.append((name, f"row count: spark={len(srows)} oracle={len(orows)}"))
        n_fail += 1
        continue
    bad = None
    for sr, orr in zip(srows, orows):
        if not all(close(a, b) for a, b in zip(sr, orr)):
            bad = (sr, orr)
            break
    if bad:
        fails.append((name, f"value mismatch:\n  spark : {bad[0]}\n  oracle: {bad[1]}"))
        n_fail += 1
    else:
        n_pass += 1
        print(f"PASS {name}: rows={len(srows)}")

print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
sys.exit(1 if n_fail else 0)
