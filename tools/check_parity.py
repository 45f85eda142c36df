"""Driver-style parity check: run every queries() entry and compare with
oracle_sql() via DuckDB (row count, column names, order-insensitive values).

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            res = res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def run_parity(
    sf_dir: str, only=None, oracle_only: bool = False
) -> list[str]:
    """Run queries() vs oracle_sql() for ``only`` (or all) queries at
    ``sf_dir``; returns the failing query names.  Ray must already be
    initialized (the CLI main below owns a session; the pytest suite
    reuses its session fixture).  ``oracle_only`` skips queries with no
    SQL oracle (the all-64 CI gate)."""
    only = set(only) if only else set()

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if oracle_only and name not in oracles:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[ERR ] {name}: ray side raised: {exc!r}")
            continue
        if name not in oracles:
            print(f"[rows] {name}: {len(got)} rows (no SQL oracle)")
            continue
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[ERR ] {name}: oracle SQL raised: {exc!r}")
            continue
        ok_cols = list(got.columns) == list(exp.columns)
        ok_rows = len(got) == len(exp)
        ok_vals = ok_dtypes = False
        if ok_cols and ok_rows:
            try:
                g = got.reset_index(drop=True)
                e = exp.reset_index(drop=True)
                # strict: the driver hashes values bit-for-bit, so a dtype
                # mismatch (e.g. DuckDB HUGEINT -> float64 vs engine int64)
                # is a real failure even when values are equal.
                ok_dtypes = list(map(str, g.dtypes)) == list(map(str, e.dtypes))
                ok_vals = g.equals(e)
                if not ok_vals:
                    ok_vals = all(
                        (g[c].astype(str).values == e[c].astype(str).values).all()
                        for c in g.columns
                    )
            except Exception:
                ok_vals = False
        status = "OK  " if (ok_cols and ok_rows and ok_vals and ok_dtypes) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"[{status}] {name}: rows {len(got)}/{len(exp)} cols_ok={ok_cols}"
            f" vals_ok={ok_vals} dtypes_ok={ok_dtypes}"
        )
        if status == "FAIL" and ok_cols and ok_rows and not ok_dtypes:
            print("  got dtypes:", dict(got.dtypes.astype(str)))
            print("  exp dtypes:", dict(exp.dtypes.astype(str)))
        if status == "FAIL" and ok_cols and ok_rows and ok_dtypes:
            diff = (got != exp).any(axis=1)
            print("  first diffs:\n", got[diff].head(3), "\n  vs\n", exp[diff].head(3))
        elif status == "FAIL":
            print("  got cols:", list(got.columns), "exp cols:", list(exp.columns))
    print("FAILURES:", failures or "none")
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    return 1 if run_parity(sf_dir, only) else 0


if __name__ == "__main__":
    raise SystemExit(main())
