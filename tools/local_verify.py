#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: for each query dumped
by graft.Verify, run its oracle SQL in DuckDB over the same parquet tables,
sort columns by name, canonicalize values, and diff. Usage:

  python3 tools/local_verify.py <sf_dir> <verify_out_dir> [query ...]
"""
import duckdb, json, sys, glob, math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v

def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: None-safe and type-stable (canon already quantized)
    out = sorted((tuple(canon(r[i]) for i in order) for r in rows), key=repr)
    return [cols[i] for i in order], out

def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        for p in glob.glob(f"{sf}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"SKIP {name}: no spark dump")
            continue
        sp = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        sp_cols = [d[0] for d in con.description]
        try:
            ora = con.execute(sql).fetchall()
            ora_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        sc, srows = frame_key(sp_cols, sp)
        oc, orows = frame_key(ora_cols, ora)
        if sc != oc:
            print(f"FAIL {name}: schema {sc} vs {oc}")
            n_fail += 1
        elif srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: {len(srows)} vs {len(orows)} rows; first diffs {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
