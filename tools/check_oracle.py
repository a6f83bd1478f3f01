#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then:

    python3 tools/check_oracle.py <sfDir> <outDir>

For each query parquet in <outDir>, runs the matching oracle SQL from
oracle_sql.json in DuckDB over views named for the testdata tables, then
compares schema (column names sorted), row count, and value hash.
Driver-side tooling only — not part of the library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame, strict: bool) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif strict:
            # mirror the driver's hash compare: values stringified as-is,
            # so an int64 vs DuckDB-HUGEINT/Decimal divergence FAILS here
            # instead of surfacing only in the driver's CORRECTNESS run
            df[c] = df[c].map(lambda v: "" if v is None else str(v))
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str, strict: bool = True) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output")
            failures += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]), strict)
        want = norm(con.sql(oracles[name]).df(), strict)
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"schema {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            status.append(f"rows {len(got)} != {len(want)}")
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                if str(a.dtype) == "float64" or str(b.dtype) == "float64":
                    import numpy as np
                    eq = np.allclose(a.astype(float), b.astype(float),
                                     rtol=0, atol=0, equal_nan=True)
                else:
                    eq = a.astype(str).equals(b.astype(str))
                if not eq:
                    bad = (a.astype(str) != b.astype(str))
                    idx = bad[bad].index[:3].tolist()
                    status.append(
                        f"col {c} differs at rows {idx}: "
                        f"got={a.iloc[idx[0]] if idx else '?'} "
                        f"want={b.iloc[idx[0]] if idx else '?'}")
        if status:
            print(f"[FAIL] {name}: " + "; ".join(status))
            failures += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
