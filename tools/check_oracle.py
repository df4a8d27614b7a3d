#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the declared oracle SQL in DuckDB
over the same fixture tables and compare (column-name-sorted, row-sorted)
values. Usage: check_oracle.py <sfDir> <verifyOutDir>.

Driver-side python (duckdb/pandas) is available in this container; this
script is a dev tool only — the Scala library has no python dependency.
"""
import sys, json, math
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types: ints/floats → float where possible, ts → str
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            col = col.astype("datetime64[us]").astype(str)
        out[c] = col
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def eq(a, b) -> bool:
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            x = pd.to_numeric(x, errors="coerce")
            y = pd.to_numeric(y, errors="coerce")
            if not ((x.isna() & y.isna()) | (x == y)).all():
                return False
        else:
            xs, ys = x.astype(str), y.astype(str)
            if not (xs == ys).all():
                return False
    return True


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        got = norm(pd.concat([pd.read_parquet(p)
                              for p in sorted(res_dir.glob("*.parquet"))]))
        want = norm(con.sql(sql).df())
        if eq(got, want):
            print(f"ok   {name}: {len(got)} rows")
        else:
            n_bad += 1
            print(f"FAIL {name}: spark {got.shape} vs duckdb {want.shape}")
            print("  spark cols:", list(got.columns))
            print("  duck  cols:", list(want.columns))
            if got.shape == want.shape:
                for c in got.columns:
                    if not (got[c].astype(str) == want[c].astype(str)).all():
                        d = (got[c].astype(str) != want[c].astype(str))
                        i = d.idxmax()
                        print(f"  first diff col={c} row={i}: "
                              f"spark={got[c][i]!r} duck={want[c][i]!r}")
    print(f"{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
