#!/usr/bin/env python
"""One-command replica of the driver's verification: entry() smoke at
sf0.001 plus EVERY queries() entry compared against its oracle_sql()
through DuckDB at sf0.01 (row count + column names + exact values).

Exit 0 = all green. Usage:
    python scripts/verify_contract.py [--sf-dir DIR] [--keys k1,k2,...]
                                      [--vanilla]

``--vanilla`` runs the contract under a bare
``SparkSession.builder.getOrCreate()`` — NO repo confs (Arrow coercion
off, default timezone, default shuffle partitions) — reproducing the
driver's environment instead of the repo's. The r4
``spatial_join_generic`` crash (numpy.float64 schema inference) only
existed under such a session; this flag makes that bug class
reproducible in-repo.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _col_equal(got, want) -> bool:
    """Driver-strict column comparison (VERDICT r5 item 2): dtypes must
    match, float columns compare BITWISE (so +0.0 vs -0.0 and any dtype
    drift from DuckDB HUGEINT promotion fail here before the driver sees
    them), integers and objects compare exactly (NaN==NaN allowed)."""
    import numpy as np
    import pandas as pd

    if got.dtype != want.dtype:
        print(f"    dtype mismatch: spark {got.dtype} vs oracle {want.dtype}")
        return False
    g, w = got.values, want.values
    if got.dtype.kind == "f":
        iv = f"int{g.dtype.itemsize * 8}"
        return bool((g.view(iv) == w.view(iv)).all())
    eq = (g == w) | (pd.isna(g) & pd.isna(w))
    return bool(np.asarray(eq).all())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--keys", default=None, help="comma-separated subset")
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="bare SparkSession, no repo confs (driver-environment replica)",
    )
    args = ap.parse_args()

    import duckdb
    import pandas as pd

    import __spark_entry__ as E

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("verify_contract_vanilla")
            .master("local[4]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from hand_index_spark.session import get_spark

        spark = get_spark("verify_contract", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    df = E.entry(spark)
    n = len(df.collect())
    print(f"entry: {n} rows, schema {df.schema.simpleString()[:120]}")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"create view {t} as select * from read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    keys = sorted(qs) if not args.keys else args.keys.split(",")
    bad = []
    for name in keys:
        t0 = time.time()
        try:
            got = qs[name](spark, args.sf_dir).toPandas()
            want = con.sql(osql[name]).df()
            got, want = (
                d[sorted(d.columns)].sort_values(sorted(d.columns)).reset_index(drop=True)
                for d in (got, want)
            )
            ok = (
                got.shape == want.shape
                and list(got.columns) == list(want.columns)
                and all(_col_equal(got[c], want[c]) for c in got.columns)
            )
        except Exception as ex:
            ok = False
            print(f"  {name}: EXCEPTION {str(ex)[:140]}")
        if not ok:
            bad.append(name)
        print(f"  {name}: {'ok' if ok else 'FAIL'} ({time.time() - t0:.1f}s)")
    print(f"{len(keys) - len(bad)}/{len(keys)} queries oracle-green")
    if bad:
        print("FAILED:", bad)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
