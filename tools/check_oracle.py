"""Local stand-in for the driver's correctness gate.

Runs each __spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB over the same sf dir, then compares the way the driver does:
both results as pandas frames, columns sorted by name, rows sorted by all
columns, values compared EXACTLY (str() of every cell — no rounding).
Round-1 lesson: a lax local normalizer (%.6g) masked 10 driver
hash_match failures whose root cause was DuckDB widening sum() to
HUGEINT/DECIMAL(38,x) (float64 in pandas) vs Spark's int64/decimal.
This checker is intentionally strict: dtype-kind differences are reported
too, so "local PASS" implies "driver PASS".
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from arroyo_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted by
    every column (this is what crashes on unhashable cells like lists —
    intentionally NOT worked around here, the driver doesn't either)."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cells(df: pd.DataFrame) -> list[tuple[str, ...]]:
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False)]


def compare(name: str, sdf_pd: pd.DataFrame, ddf_pd: pd.DataFrame) -> bool:
    if sorted(sdf_pd.columns) != sorted(ddf_pd.columns):
        print(f"FAIL {name}: columns spark={sorted(sdf_pd.columns)} duck={sorted(ddf_pd.columns)}")
        return False
    if len(sdf_pd) != len(ddf_pd):
        print(f"FAIL {name}: rowcount spark={len(sdf_pd)} duck={len(ddf_pd)}")
        return False
    try:
        s, d = canon(sdf_pd), canon(ddf_pd)
    except TypeError as e:
        print(f"FAIL {name}: canonicalize error (driver would err too): {e}")
        return False
    sc, dc = cells(s), cells(d)
    if sc != dc:
        # sorted-row order may legitimately differ when values differ; diff sets
        sset, dset = set(sc), set(dc)
        print(f"FAIL {name}: value mismatch")
        print("  spark-only:", sorted(sset - dset)[:2])
        print("  duck-only :", sorted(dset - sset)[:2])
        return False
    kinds_s = [s[c].dtype.kind for c in s.columns]
    kinds_d = [d[c].dtype.kind for c in d.columns]
    if kinds_s != kinds_d:
        print(
            f"WARN {name}: dtype kinds differ spark={list(zip(s.columns, kinds_s))} "
            f"duck={list(zip(d.columns, kinds_d))} (values identical)"
        )
    return True


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark(cores=8)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf_pd = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(sdf_pd)} rows (no oracle)")
            if len(sdf_pd) == 0:
                print(f"WARN {name}: zero rows")
            # the driver still canonicalizes rows-only results: fail on
            # unhashable cells here rather than in CORRECTNESS_r{N}
            try:
                canon(sdf_pd)
            except TypeError as e:
                print(f"FAIL {name}: rows-only canonicalize error: {e}")
                failures += 1
            continue
        try:
            ddf_pd = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        if compare(name, sdf_pd, ddf_pd):
            print(f"PASS {name}: {len(sdf_pd)} rows")
        else:
            failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(main())
