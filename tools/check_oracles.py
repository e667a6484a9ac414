"""Driver-simulating oracle check: run every ``queries()`` entry at a
given sf_dir, run its ``oracle_sql()`` in DuckDB over the same parquet
tables, sort columns by name and rows by all columns, and compare
row-count + schema + values exactly (the driver's hash compare, but with
a diff printout). Queries without an oracle get a rows-only check.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, log_to_driver=False)

    import __ray_entry__ as E

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    done = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # Recycle the Ray session every 80 queries: one long session
        # accumulates thousands of executed datasets and eventually
        # trips a Ray-core task-manager race (task_manager.cc:930
        # "Tried to complete task that was not pending" — observed at
        # ~2,250 dataset executions, aborting the process). Query
        # results are unaffected; a fresh session resets the counter.
        if done and done % 80 == 0:
            ray.shutdown()
            ray.init(address="local", num_cpus=8, include_dashboard=False,
                     ignore_reinit_error=True, log_to_driver=False)
        done += 1
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows-only, {len(got)} rows, {dt:.1f}s")
            continue
        want = canon(con.execute(oracles[name]).fetchdf())
        status = "ok"
        if list(got.columns) != list(want.columns):
            status = f"SCHEMA MISMATCH got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWCOUNT got={len(got)} want={len(want)}"
        elif got.dtypes.astype(str).tolist() != want.dtypes.astype(str).tolist():
            # dtype divergence (e.g. DuckDB HUGEINT -> decimal128 object)
            # breaks the driver's value hash even when values are equal
            diff = {
                c: (str(got[c].dtype), str(want[c].dtype))
                for c in got.columns
                if str(got[c].dtype) != str(want[c].dtype)
            }
            status = f"DTYPE MISMATCH (ray, oracle): {diff}"
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            except AssertionError as exc:
                status = f"VALUES: {str(exc)[:400]}"
        if status != "ok":
            failures.append(name)
            print(f"FAIL  {name}: {status}")
        else:
            print(f"ok    {name}: {len(got)} rows match oracle, {dt:.1f}s")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
