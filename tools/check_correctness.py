"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` counterpart at
sf0.01 (DuckDB on the same parquet), canonicalizes both results the way
the driver does (columns sorted by name, rows sorted by all columns), and
reports rows/schema/value matches. Use before committing any new oracle.

Usage: python tools/check_correctness.py [query ...]   (no args = all)
"""

from __future__ import annotations

import json
import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return pdf


def _values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape:
        return False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = av.astype("float64")
            bf = bv.astype("float64")
            both_nan = np.isnan(af) & np.isnan(bf)
            if not np.all(both_nan | (af == bf)):
                return False
        else:
            if not (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all():
                return False
    return True


def main() -> None:
    import __spark_entry__ as E
    from rtsa_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="check_correctness", cores=8, shuffle_partitions=16)
    # Mirror the grading harness: the driver runs with Arrow conversion
    # DISABLED, so createDataFrame/toPandas take the legacy row paths there.
    # Round 2 shipped an oracle that was green locally (Arrow fast path) and
    # red at the gate (legacy verifier rejected pandas nullable ints) —
    # default the checker to the driver's behavior; CC_ARROW=true restores
    # the fast path for quick iteration.
    spark.conf.set(
        "spark.sql.execution.arrow.pyspark.enabled",
        os.environ.get("CC_ARROW", "false"),
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row: dict = {}
        try:
            spdf = _canon(fn(spark, SF_DIR).toPandas())
            row["spark_rows"] = len(spdf)
            if name in oracles:
                odf = _canon(con.sql(oracles[name]).df())
                row["oracle_rows"] = len(odf)
                row["rows_match"] = len(spdf) == len(odf)
                row["schema_match"] = list(spdf.columns) == list(odf.columns)
                row["hash_match"] = row["schema_match"] and _values_match(spdf, odf)
                if not row["hash_match"] and row["rows_match"] and row["schema_match"]:
                    for c in spdf.columns:
                        sv, ov = spdf[c], odf[c]
                        try:
                            eq = (sv.astype("float64") == ov.astype("float64")) | (
                                sv.isna() & ov.isna()
                            )
                        except (ValueError, TypeError):
                            eq = sv.astype(str) == ov.astype(str)
                        if not eq.all():
                            i = int(np.argmin(eq.to_numpy()))
                            row[f"first_diff_{c}"] = [str(sv.iloc[i]), str(ov.iloc[i])]
            else:
                row["err"] = "no_oracle"
        except Exception:
            row["err"] = traceback.format_exc().splitlines()[-1]
        results[name] = row
        status = "OK " if row.get("hash_match") else (
            "ro " if row.get("err") == "no_oracle" else "FAIL"
        )
        print(f"{status} {name}: {json.dumps(row)[:300]}", flush=True)
    bad = [n for n, r in results.items()
           if r.get("err") not in (None, "no_oracle") or r.get("hash_match") is False]
    print(f"\n{len(results)} checked, {len(bad)} failing: {bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
