"""Local stand-in for the driver's correctness gate: run each queries()
entry and its oracle_sql() side-by-side at sf0.01 (or a given dir),
compare row-count + schema + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir]
"""

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) == 0 and len(want) == 0:
        return []
    if sorted(got.columns) != sorted(want.columns):
        return [f"columns differ: {sorted(got.columns)} vs {sorted(want.columns)}"]
    if len(got) != len(want):
        problems.append(f"row count {len(got)} vs {len(want)}")
        return problems
    g, w = canon(got), canon(want)
    for col in g.columns:
        a, b = g[col], w[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            av = a.astype(float).to_numpy()
            bv = b.astype(float).to_numpy()
            bad = ~np.isclose(av, bv, rtol=0, atol=1e-9, equal_nan=True)
        else:
            bad = np.asarray(a.astype(str).to_numpy() != b.astype(str).to_numpy())
        if bad.any():
            i = int(np.argmax(bad))
            problems.append(f"col {col}: first diff at row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: engine raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows, cols={sorted(got.columns)} ({dt:.1f}s) [rows-only]")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(got)} rows match oracle ({dt:.1f}s)")
    print("failures:", failures)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
