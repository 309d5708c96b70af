"""Driver-simulator: run every queries() entry on Spark and its oracle_sql()
on DuckDB at a given sf_dir; compare row count, column names, and
order-insensitive values. Usage: python tools/check_oracles.py [sf_dir] [name...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    df = pdf.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            # Decimal columns (Spark DecimalType) must sort numerically, not
            # lexicographically, or rows misalign vs the oracle's float sort
            # (ADVICE r1). Strings stay strings. No rounding: the driver
            # hashes exact values (VERDICT r2 #3) — queries must round
            # explicitly on both sides themselves.
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _kind(s: pd.Series) -> str:
    """Coarse dtype kind as the driver's value-hash sees it: 'i' integer,
    'f' float, 'd' datetime, 's' everything stringish."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "d"
    if pd.api.types.is_integer_dtype(s):
        return "i"
    if pd.api.types.is_float_dtype(s):
        return "f"
    if s.dtype == object and len(s):
        v = s.dropna()
        if len(v) and all(isinstance(x, (int, np.integer)) for x in v):
            return "i"
        try:
            pd.to_numeric(v)
            return "f"   # Decimal / mixed numerics hash as floats
        except (ValueError, TypeError):
            pass
    return "s"


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if sorted(a.columns) != sorted(b.columns):
        return f"schema: spark={sorted(a.columns)} duck={sorted(b.columns)}"
    if len(a) != len(b):
        return f"rows: spark={len(a)} duck={len(b)}"
    # dtype-strict: the driver hashes values *with their repr*, so int64 6 vs
    # float64 6.0 is a FAIL even when np.allclose passes (r1 root cause —
    # un-cast DuckDB sum() comes back HUGEINT->float64).
    for c in sorted(a.columns):
        ka, kb = _kind(a[c]), _kind(b[c])
        if ka != kb:
            return (f"dtype[{c}]: spark kind={ka}({a[c].dtype}) "
                    f"duck kind={kb}({b[c].dtype}) — driver hash would differ;"
                    " CAST the oracle (or the query) so dtypes agree")
    na, nb = normalize(a), normalize(b)
    for c in na.columns:
        ca, cb = na[c], nb[c]
        if pd.api.types.is_float_dtype(ca) or pd.api.types.is_float_dtype(cb):
            # EXACT repr compare (VERDICT r2 #3): allclose(rtol=1e-9) on
            # values like 137275.350747 tolerates ~1.4e-4 and printed `ok`
            # on queries the driver's value-hash failed. The contract is:
            # queries round explicitly on both sides, so post-normalize
            # floats must be bit-identical (NaN == NaN allowed).
            va, vb = ca.astype(float).to_numpy(), cb.astype(float).to_numpy()
            bad = ~((va == vb) | (np.isnan(va) & np.isnan(vb)))
            ok = not bad.any()
        else:
            bad = (ca.astype(str) != cb.astype(str)).to_numpy()
            ok = not bad.any()
        if not ok:
            i = int(np.argmax(bad))
            return (f"values[{c}] row{i}: spark={ca.iloc[i]!r} duck={cb.iloc[i]!r}")
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from data_cube_utilities_spark.session import get_spark

    extra = {}
    if os.environ.get("ORACLE_CHECK_ANSI") == "1":
        extra["spark.sql.ansi.enabled"] = "true"   # simulate driver defaults
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=16,
                      extra_conf=extra)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in sqls:
            print(f"ok(rows-only) {name}: {len(got)} rows {time.time()-t0:.1f}s")
            n_pass += 1
            continue
        try:
            exp = con.execute(sqls[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        err = compare(got, exp)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"ok {name}: {len(got)} rows {time.time()-t0:.1f}s")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
