"""Golden-value gates for the driver queries that have NO DuckDB oracle
(custom hashes / heuristics / ANN — not SQL-expressible). Every kernel is
seeded and deterministic, so the full result set at sf0.001 is pinned by an
md5 over the canonicalized frame: 'rows-only' stops meaning 'row-count-only'.

If a kernel changes intentionally (seed, algorithm), re-pin with:
    python tests/test_golden_values.py --print
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

GOLDEN = {
    "simhash_docs": (500, "12093212de99c15ef5c6cbbf86905e6d"),
    "doc_fingerprints": (500, "470e41888c3e9ef69cd9d4326d009ff2"),
    "lang_id_docs": (4, "2a9b76c5350bbe019d324476bb4c07cc"),
    "doc_embed_knn": (10, "c4898554b014779e3f112d64ad477365"),
    "embedding_topk_ivf": (10, "191863771eb97850da3ba7dd297f8b84"),
    "media_features": (2, "378914ed9bcc052468c1e2053a70369b"),
}


def _canon(obj) -> pd.DataFrame:
    if isinstance(obj, pa.Table):
        df = obj.to_pandas()
    elif isinstance(obj, pd.DataFrame):
        df = obj
    else:
        df = obj.to_pandas()
    df = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    return df.round(8)


def _digest(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden(name, ray_session):
    import __ray_entry__ as entry

    df = _canon(entry.queries()[name](SF))
    n, want = GOLDEN[name]
    assert len(df) == n, f"{name}: {len(df)} rows != {n}"
    got = _digest(df)
    assert got == want, f"{name}: value hash {got} != pinned {want}"


if __name__ == "__main__":
    import sys

    sys.path.insert(0, "/root/repo")
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as entry

    for name in sorted(GOLDEN):
        df = _canon(entry.queries()[name](SF))
        print(f'    "{name}": ({len(df)}, "{_digest(df)}"),')
    ray.shutdown()
