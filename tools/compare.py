#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every fixture table of
<sfDir> as a DuckDB view, runs each oracle SQL, and compares against the
Spark result parquet in <verifyOutDir>/<name>/ — columns sorted by name,
rows sorted by all columns, exact value equality (floats compared to 12
significant digits to surface real divergence while tolerating printing).
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

class ArrayCellError(Exception):
    """An array/list-typed output cell. The DRIVER's comparator lexsorts
    every column with pandas and crashes on these (r6: q_sim_quantize shipped
    red because this stand-in happily stringified them) — so reject exactly
    what the driver rejects: oracled queries must emit scalar columns only
    (project arrays through array_to_string/array_join first)."""

def norm_cell(v):
    if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
        raise ArrayCellError(f"array-typed cell {type(v).__name__}: {str(v)[:60]}")
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.12e}"
    return str(v)

def frame(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)
    return [cols[i] for i in idx], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_dir}/*.parquet"):
            print(f"MISSING-SPARK {name}")
            n_fail += 1
            continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR    {name}: {e}")
            n_fail += 1
            continue
        s = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        try:
            oc, orf = frame(orows, ocols)
            sc, srf = frame(srows, scols)
        except ArrayCellError as e:
            print(f"ARRAY-COL     {name}: {e} — the driver's lexsort crashes "
                  f"on this; emit scalars only")
            n_fail += 1
            continue
        if oc != sc:
            print(f"SCHEMA-DIFF   {name}: spark={sc} oracle={oc}")
            n_fail += 1
        elif len(orf) != len(srf):
            print(f"ROWS-DIFF     {name}: spark={len(srf)} oracle={len(orf)}")
            n_fail += 1
        elif orf != srf:
            bad = next(i for i, (a, b) in enumerate(zip(srf, orf)) if a != b)
            print(f"VALUE-DIFF    {name}: first diff row {bad}:")
            print(f"   spark : {srf[bad]}")
            print(f"   oracle: {orf[bad]}")
            n_fail += 1
        else:
            print(f"OK            {name} ({len(srf)} rows)")
            n_pass += 1
    # rows-only queries (no oracle): report row counts, but STILL reject
    # array-typed cells — the driver sorts rows-only output with the same
    # pandas lexsort, so an array column crashes its record too (r10:
    # q_text_bpe_ids / q_text_unigram_ids shipped as comparator errors
    # because this loop only counted rows).
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            # Detect array-typed columns from the parquet SCHEMA, not by
            # fetching every row into Python (ADVICE r11: a full per-doc
            # text rebuild was being pulled wholesale into memory per
            # query just to type-check its cells). DESCRIBE reads only
            # parquet footers; count(*) stays pushdown-cheap.
            types = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{d}/*.parquet')"
            ).fetchall()
            bad = [(c, t) for c, t, *_ in types
                   if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST"))]
            if bad:
                print(f"ARRAY-COL     {name}: non-scalar columns {bad} — "
                      f"rows-only output is still driver-sorted; emit "
                      f"scalars only")
                n_fail += 1
                continue
            n_rows = con.execute(
                f"SELECT count(*) FROM read_parquet('{d}/*.parquet')"
            ).fetchone()[0]
            print(f"ROWS-ONLY     {name} ({n_rows} rows)")
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracle)} oracle queries")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
