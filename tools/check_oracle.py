"""Local mimic of the driver's correctness harness: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given SF, compare row count + columns + order-insensitive
values (doubles rounded to 4dp before hashing, mirroring the query
contract). Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            try:
                pdf[c] = pdf[c].astype(str)
            except Exception:
                pass
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.round(4)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    import __spark_entry__ as entry_mod
    from rtsa_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    for name, fn in qs.items():
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in os_:
            print(f"SKIP {name}: rows-only ({len(got)} rows)")
            continue
        try:
            want = con.sql(os_[name]).df()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns {list(g.columns)} != {list(w.columns)}"))
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} != {len(w)}"))
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"OK   {name}: {len(g)} rows")
        except AssertionError as e:
            failures.append((name, "value mismatch"))
            diff = (g != w) & ~(g.isna() & w.isna())
            bad_rows = diff.any(axis=1)
            print(f"FAIL {name}: value mismatch; first diffs:")
            print(pd.concat([g[bad_rows].head(3), w[bad_rows].head(3)]).to_string())
    spark.stop()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
