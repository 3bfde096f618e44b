#!/usr/bin/env python3
"""Oracle type-hygiene lint.

DESCRIBEs every oracle SQL in <verify_out_dir>/oracle_sql.json against the
parquet tables in <sf_dir> and FAILS if any output column is HUGEINT or
UHUGEINT. DuckDB silently widens SUM(BIGINT) / BIGINT-difference expressions
to int128, which the driver's hasher canonicalizes differently from int64 —
the round-9 class of false hash mismatches (text_bm25, text_lm_score,
curation_dsir). Every oracle must cast such expressions to BIGINT.

Usage: python3 tools/oracle_lint.py <sf_dir> <verify_out_dir>
"""
import duckdb, json, sys, glob

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED = {"HUGEINT", "UHUGEINT"}


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        for p in glob.glob(f"{sf}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_bad = n_err = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"ERROR {name}: DESCRIBE failed: {e}")
            n_err += 1
            continue
        bad = [(c, ty) for c, ty, *_ in desc
               if any(b in ty.upper() for b in BANNED)]
        if bad:
            print(f"LINT {name}: banned output types {bad}")
            n_bad += 1
    print(f"== {len(oracle)} oracles described, {n_bad} with banned types, "
          f"{n_err} describe errors ==")
    sys.exit(1 if (n_bad or n_err) else 0)


if __name__ == "__main__":
    main()
