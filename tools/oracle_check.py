#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB with
each <sfDir>/*.parquet registered as a view, load the Spark result parquet,
sort columns by name, and compare row counts, schemas, and RENDERED values.

The driver's hash check renders every cell to text before hashing, so an
int64 `5` vs float64 `5.0` IS a failure even though the values are equal.
This gate must predict that: no dtype coercion, compare the rendering.
"""
import json
import sys

import duckdb
import pandas as pd


TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def render_cell(v) -> str:
    """Text rendering of one cell, the way a hash-of-values sees it.

    Rendering rules (NORMALIZED so the same logical value renders one way
    regardless of which engine produced it — both result frames come to us
    through pandas, so the forms below are the only divergences we can see):
      - missing (None / NaN / NaT / pd.NA)  -> "NULL"
      - bool (incl. numpy.bool_)            -> "true" / "false"
      - float                               -> Python repr (shortest
        round-trip; '5.0' stays distinct from int '5' — dtype differences
        MUST fail, the driver's hash sees them)
      - list/array                          -> "[a,b,...]" recursively
      - everything else                     -> str(v)
    """
    if v is None or v is pd.NaT or v is pd.NA or (isinstance(v, float) and v != v):
        return "NULL"
    if isinstance(v, (bool,)) or type(v).__name__ == "bool_":
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(render_cell(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, sort ROWS by all columns on the RAW values
    (exactly what the driver's pandas harness does before hashing — this is
    where it crashes on ndarray cells, so we must crash there too), then
    render every cell to text. NO dtype coercion — the driver compares
    rendered values, so neither do we."""
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            # both engines print timestamps identically at whole-us precision
            col = pd.to_datetime(col).astype("datetime64[us]")
        out[c] = [render_cell(v) for v in col.tolist()]
    return out


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expect = canon(con.execute(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(expect.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expect.columns)}")
            n_fail += 1
            continue
        if len(expect) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, expect, check_exact=True)
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e).splitlines()[-1]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
