"""Local clone of the driver's correctness gate.

Runs every queries() entry on Spark at a scale factor AND its oracle_sql()
on DuckDB over the same parquet, then compares row count, schema (loose
type families), and an order-insensitive value hash. Exit nonzero on any
mismatch. Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# oracles that embed trained model literals (IVF centroids) must train on
# the SAME table the harness runs against, whatever sf this invocation uses
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)

from py3dtilers_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> tuple[str, str]:
    """(schema_sig, value_hash) — columns sorted by name, rows sorted, floats
    hashed by their float64 bits (exact), strings utf-8."""
    df = df[sorted(df.columns)].copy()
    parts = []
    fams = []
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            fams.append(f"{c}:f")
            parts.append(s.astype(np.float64))
        elif pd.api.types.is_integer_dtype(s):
            fams.append(f"{c}:i")
            parts.append(s.astype("Int64"))
        elif pd.api.types.is_bool_dtype(s):
            fams.append(f"{c}:b")
            parts.append(s.astype("Int64"))
        else:
            fams.append(f"{c}:s")
            parts.append(s.astype(str))
    out = pd.concat(parts, axis=1)
    out.columns = df.columns
    out = out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_float_dtype(s):
            h.update(s.to_numpy(dtype=np.float64).tobytes())
        elif s.dtype == "Int64":
            h.update(s.fillna(-(2**62)).to_numpy(dtype=np.int64).tobytes())
        else:
            h.update("\x1f".join(s.fillna("\x00NULL")).encode())
    return ",".join(fams), h.hexdigest()


def main() -> int:
    spark = get_spark("check_oracle", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        sdf = fn(spark, SF_DIR).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:22s} ROWS_ONLY rows={len(sdf)} spark={t_spark:.1f}s")
            if len(sdf) == 0:
                print(f"  !! {name}: zero rows")
                failures += 1
            continue
        t0 = time.time()
        ddf = con.sql(oracles[name]).fetchdf()
        t_duck = time.time() - t0
        s_schema, s_hash = canon(sdf)
        d_schema, d_hash = canon(ddf)
        ok_rows = len(sdf) == len(ddf)
        ok_schema = s_schema == d_schema
        ok_hash = s_hash == d_hash
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{name:22s} {status:4s} rows={len(sdf)}/{len(ddf)} "
            f"schema={'=' if ok_schema else 'DIFF'} hash={'=' if ok_hash else 'DIFF'} "
            f"spark={t_spark:.1f}s duck={t_duck:.2f}s"
        )
        if status == "FAIL":
            failures += 1
            if not ok_schema:
                print(f"  spark schema: {s_schema}\n  duck  schema: {d_schema}")
            if ok_schema and not ok_hash:
                merged = sdf[sorted(sdf.columns)].merge(
                    ddf[sorted(ddf.columns)], how="outer", indicator=True
                )
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
