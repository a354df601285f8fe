#!/usr/bin/env python
"""Driver-mimicking correctness harness: run every ``queries()`` entry via
Ray and its ``oracle_sql()`` twin via DuckDB on the same parquet tables,
then compare row count, column names, and (column-name-sorted,
row-sorted) values.  Exact equality for ints/strings; bitwise for floats
(the engine is written so float expressions match the SQL mirrors).

Usage: python scripts/compare.py [sf0.001|sf0.01|sf0.1] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if not len(df) and not len(df.columns):
            # Ray 2.49's to_pandas() drops the columns of a 0-row
            # dataset; restore them from the Dataset schema so a
            # legitimately-empty result still schema-compares
            df = pd.DataFrame(columns=res.schema().names)
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # normalize list columns to tuples for sortability
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(
                df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(tuple)
    return df.sort_values(list(df.columns), kind="stable") \
             .reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(ora_df.columns):
        return (f"SCHEMA MISMATCH ray={sorted(ray_df.columns)} "
                f"ora={sorted(ora_df.columns)}")
    if len(ray_df) != len(ora_df):
        return f"ROWCOUNT MISMATCH ray={len(ray_df)} ora={len(ora_df)}"
    if len(ray_df) == 0:
        # schema + rowcount agree on empty; dtypes of a columns-only
        # frame restored from a Ray schema are not meaningful
        return "OK"
    a, b = canon(ray_df), canon(ora_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # The driver hashes post-to-pandas values, so a dtype divergence
        # (e.g. DuckDB HUGEINT -> float64 vs engine int64) is a real fail
        # even when values compare equal numerically.
        if av.dtype != bv.dtype and not (av.dtype.kind == bv.dtype.kind
                                         and av.dtype.kind in "OUS"):
            return (f"DTYPE MISMATCH col={c} ray={av.dtype} ora={bv.dtype}")
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            eq = (av == bv.astype(av.dtype))
            eq |= pd.isna(av) & pd.isna(bv)
            if not eq.all():
                i = int(np.nonzero(~eq)[0][0])
                return (f"VALUE MISMATCH col={c} row={i} "
                        f"ray={av[i]!r} ora={bv[i]!r}")
        else:
            if not (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all():
                bad = (pd.Series(av).astype(str) != pd.Series(bv).astype(str))
                i = int(np.nonzero(bad.to_numpy())[0][0])
                return (f"VALUE MISMATCH col={c} row={i} "
                        f"ray={av[i]!r} ora={bv[i]!r}")
    return "OK"


def main():
    args = [a for a in sys.argv[1:]]
    sf = "sf0.001"
    if args and args[0].startswith("sf"):
        sf = args.pop(0)
    sf_dir = f"/root/testdata/{sf}"

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or list(qs)
    n_ok = n_bad = 0
    for name in names:
        t0 = time.time()
        try:
            ray_df = to_pandas(qs[name](sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} RAY ERROR: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        secs = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(ray_df)} rows   "
                  f"[{secs:5.1f}s] (no oracle)")
            n_ok += 1
            continue
        try:
            ora_df = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        verdict = compare(name, ray_df, ora_df)
        tag = "ok " if verdict == "OK" else "BAD"
        print(f"{name:24s} {tag} rows={len(ray_df):6d} [{secs:5.1f}s] "
              + ("" if verdict == "OK" else verdict))
        n_ok += verdict == "OK"
        n_bad += verdict != "OK"
    print(f"== {n_ok} ok, {n_bad} bad ==")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
