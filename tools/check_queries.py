"""Local stand-in for the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side at a given sf, compare row count, column
names/types, and values (columns sorted by name, rows sorted by all columns).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if list(sorted(ours.columns)) != list(sorted(oracle.columns)):
        problems.append(f"columns {sorted(ours.columns)} != {sorted(oracle.columns)}")
        return problems
    if len(ours) != len(oracle):
        problems.append(f"rows {len(ours)} != {len(oracle)}")
        return problems
    a, b = normalize(ours), normalize(oracle)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            if not np.allclose(av, bv, rtol=0, atol=0, equal_nan=True):
                bad = np.where(av != bv)[0][:3]
                problems.append(f"col {c} float mismatch at rows {bad}: {av[bad]} vs {bv[bad]}")
        else:
            eq = av == bv
            if not np.all(eq):
                bad = np.where(~eq)[0][:3]
                problems.append(f"col {c} mismatch at rows {bad}: {av[bad]} vs {bv[bad]}")
    return problems


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    only = set(argv[1:])
    n_pass = n_fail = 0
    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            results[name] = {"status": "FAIL", "err": f"{type(e).__name__}: {e}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(ours)} rows)")
            results[name] = {"status": "rows_only", "rows": len(ours)}
            n_pass += 1
            continue
        try:
            oracle = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {e}")
            results[name] = {"status": "FAIL", "err": f"oracle SQL raised {e}"}
            n_fail += 1
            continue
        problems = compare(name, ours, oracle)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            results[name] = {"status": "FAIL", "err": "; ".join(problems)}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ours)} rows)")
            results[name] = {"status": "PASS", "rows": len(ours)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_oracled": sum(
                        1 for r in results.values() if r["status"] in ("PASS", "FAIL")
                    ),
                    "queries": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out}")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
