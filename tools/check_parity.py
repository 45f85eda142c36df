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
    sf_dir: str, only=None, oracle_only: bool = False, workers: int = 1
) -> list[str]:
    """Run queries() vs oracle_sql() for ``only`` (or all) queries at
    ``sf_dir``; returns the failing query names.  Ray must already be
    initialized (the CLI main below owns a session; the pytest suite
    reuses its session fixture).  ``oracle_only`` skips queries with no
    SQL oracle (the all-oracles CI gate).  ``workers`` > 1 checks that
    many queries concurrently from driver threads — each tiny query
    underutilizes the session, so overlapping them fills it (the CI
    gate's wall time is per-query fixed overhead, not compute); each
    worker task opens its own DuckDB connection."""
    only = set(only) if only else set()

    sys.path.insert(0, ".")
    # fsspec-http import-race stub must be in place before worker threads
    # build datasets concurrently (see layout_analysis_ray._stub_fsspec_http)
    import layout_analysis_ray  # noqa: F401
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [
        n
        for n in qs
        if (not only or n in only) and (not oracle_only or n in oracles)
    ]

    def check(name: str) -> tuple[str, bool, list[str]]:
        try:
            got = canon(to_pandas(qs[name](sf_dir)))
        except Exception as exc:  # noqa: BLE001
            return name, True, [f"[ERR ] {name}: ray side raised: {exc!r}"]
        if name not in oracles:
            return name, False, [f"[rows] {name}: {len(got)} rows (no SQL oracle)"]
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as exc:  # noqa: BLE001
            return name, True, [f"[ERR ] {name}: oracle SQL raised: {exc!r}"]
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
        fail = not (ok_cols and ok_rows and ok_vals and ok_dtypes)
        status = "FAIL" if fail else "OK  "
        lines = [
            f"[{status}] {name}: rows {len(got)}/{len(exp)} cols_ok={ok_cols}"
            f" vals_ok={ok_vals} dtypes_ok={ok_dtypes}"
        ]
        if fail and ok_cols and ok_rows and not ok_dtypes:
            lines.append(f"  got dtypes: {dict(got.dtypes.astype(str))}")
            lines.append(f"  exp dtypes: {dict(exp.dtypes.astype(str))}")
        if fail and ok_cols and ok_rows and ok_dtypes:
            diff = (got != exp).any(axis=1)
            lines.append(
                f"  first diffs:\n {got[diff].head(3)} \n  vs\n {exp[diff].head(3)}"
            )
        elif fail:
            lines.append(
                f"  got cols: {list(got.columns)} exp cols: {list(exp.columns)}"
            )
        return name, fail, lines

    if workers <= 1:
        results = [check(n) for n in names]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(workers) as ex:
            results = list(ex.map(check, names))

    failures = []
    for name, fail, lines in results:
        for line in lines:
            print(line)
        if fail:
            failures.append(name)
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
