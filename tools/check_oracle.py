#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the declared oracle SQL in DuckDB
over the same fixture tables and compare (column-name-sorted, row-sorted)
values AND dtypes. Usage: check_oracle.py <sfDir> <verifyOutDir>.

Dtype-strict (round-2 hardening): round 1's value-only comparison was
blind to DuckDB integer sum() returning HUGEINT (decimal128) while Spark
returns BIGINT — the driver's typed hash gate failed 5 queries this
replica approved. Columns now must agree on a canonical type CLASS
(int / float / decimal / str / bool / timestamp / date / list) before
values are compared, so decimal128-vs-int64 FAILS locally.
Run `check_oracle.py --selftest` to verify that regression stays caught.

Driver-side python (duckdb/pandas/pyarrow) is available in this
container; this script is a dev tool only — the Scala library has no
python dependency.
"""
import sys, json
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def type_class(t: pa.DataType) -> str:
    """Canonical dtype class: strict enough to catch decimal-vs-int,
    loose enough to ignore representation noise (string vs large_string,
    timestamp tz/unit, int32 vs int64 — Spark and DuckDB legitimately
    differ on widths below 64-bit for literals, and the driver hashes
    values after casting within a class)."""
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)


def schema_classes(tbl: pa.Table) -> dict:
    return {f.name: type_class(f.type) for f in tbl.schema}


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
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


def compare(got_tbl: pa.Table, want_tbl: pa.Table, name: str) -> list:
    """Return list of failure strings (empty = pass)."""
    fails = []
    gc, wc = schema_classes(got_tbl), schema_classes(want_tbl)
    if sorted(gc) != sorted(wc):
        fails.append(f"columns differ: spark {sorted(gc)} duck {sorted(wc)}")
        return fails
    for col in sorted(gc):
        if gc[col] != wc[col]:
            fails.append(
                f"dtype class mismatch col={col}: "
                f"spark {gc[col]} ({got_tbl.schema.field(col).type}) vs "
                f"duck {wc[col]} ({want_tbl.schema.field(col).type})")
    if fails:
        return fails
    got, want = norm(got_tbl.to_pandas()), norm(want_tbl.to_pandas())
    if not eq(got, want):
        fails.append(f"values differ: spark {got.shape} duck {want.shape}")
        if got.shape == want.shape and list(got.columns) == list(want.columns):
            for c in got.columns:
                if not (got[c].astype(str) == want[c].astype(str)).all():
                    d = (got[c].astype(str) != want[c].astype(str))
                    i = d.idxmax()
                    fails.append(f"  first diff col={c} row={i}: "
                                 f"spark={got[c][i]!r} duck={want[c][i]!r}")
    return fails


def selftest() -> int:
    """Regression: HUGEINT-vs-BIGINT must FAIL even when values match."""
    con = duckdb.connect()
    hugeint = con.sql(
        "SELECT k, sum(v) AS s FROM (VALUES (1, 2), (1, 3), (2, 5)) "
        "t(k, v) GROUP BY k ORDER BY k").arrow()
    bigint = con.sql(
        "SELECT k, CAST(sum(v) AS BIGINT) AS s FROM (VALUES (1, 2), (1, 3), "
        "(2, 5)) t(k, v) GROUP BY k ORDER BY k").arrow()
    assert type_class(hugeint.schema.field("s").type) == "decimal", hugeint.schema
    assert type_class(bigint.schema.field("s").type) == "int", bigint.schema
    f1 = compare(bigint, hugeint, "selftest")
    assert f1 and "dtype class mismatch" in f1[0], f1
    f2 = compare(bigint, bigint, "selftest")
    assert not f2, f2
    # value mismatch inside same class still fails
    other = con.sql(
        "SELECT k, CAST(sum(v) AS BIGINT) AS s FROM (VALUES (1, 2), (1, 4), "
        "(2, 5)) t(k, v) GROUP BY k ORDER BY k").arrow()
    f3 = compare(bigint, other, "selftest")
    assert f3, "value diff not caught"
    print("selftest OK: decimal128-vs-int64 fails, identical passes")
    return 0


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
        parts = [pq.read_table(p) for p in sorted(res_dir.glob("*.parquet"))]
        got_tbl = pa.concat_tables(parts)
        want_tbl = con.sql(sql).arrow()
        fails = compare(got_tbl, want_tbl, name)
        if not fails:
            print(f"ok   {name}: {got_tbl.num_rows} rows")
        else:
            n_bad += 1
            print(f"FAIL {name}:")
            for f in fails:
                print(f"  {f}")
    print(f"{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
