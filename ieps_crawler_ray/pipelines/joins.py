"""Join strategies (SURVEY §2.4, J1–J6).

Two scale regimes, chosen explicitly per call site:

* **BroadcastLookup** — small dimension side (nation/customer dims, model
  vocab, seen-filters): `ray.put` the dimension ONCE on the driver, each actor
  `ray.get`s it in ``__init__`` (zero-copy shared memory on a node), lookups
  are vectorized ``np.searchsorted``. No shuffle; the small side is never
  re-shipped per batch.
* **Native hash join** — both sides large: `Dataset.join` (hash-partitioned
  exchange, Ray ≥ 2.46). Used for the lineitem⋈orders style equi-joins (J3).

Reference analogues: url→page_id lookup `database.py:316-342` (J2),
segment⋈page join `Vector_db_querier.py:73-77` (J3), site get-or-create
`database.py:107-149` (J5 — dictionary-encode, no join needed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class BroadcastLookup:
    """map_batches actor-pool stage: append dimension columns by sorted-key
    binary search against a broadcast (``ray.put``) pyarrow dimension table.

    Rows whose key is absent get null in the appended columns (left join).
    """

    def __init__(self, dim_ref, key_col: str, value_cols: list[str]):
        import ray

        dim: pa.Table = ray.get(dim_ref)
        order = pa.compute.sort_indices(dim[key_col])
        dim = dim.take(order)
        self.keys = dim[key_col].to_numpy()
        self.value_cols = value_cols
        self.values = {c: dim[c].combine_chunks() for c in value_cols}
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.keys) == 0:  # empty dimension → all-null columns (left join)
            null_idx = pa.nulls(batch.num_rows, pa.int64())
            for c in self.value_cols:
                batch = batch.append_column(c, self.values[c].take(null_idx))
            return batch
        probe = batch[self.key_col].to_numpy()
        pos = np.searchsorted(self.keys, probe)
        pos_c = np.clip(pos, 0, len(self.keys) - 1)
        hit = self.keys[pos_c] == probe
        idx = pa.array(np.where(hit, pos_c, -1), pa.int64())
        idx = pa.compute.if_else(pa.compute.equal(idx, -1), pa.scalar(None, pa.int64()), idx)
        for c in self.value_cols:
            batch = batch.append_column(c, self.values[c].take(idx))
        return batch


def broadcast_join(ds, dim_table: pa.Table, key_col: str, value_cols: list[str], **mb_kwargs):
    """ds.map_batches(BroadcastLookup) with the dimension shipped via ray.put once."""
    import ray

    ref = ray.put(dim_table)
    return ds.map_batches(
        BroadcastLookup,
        fn_constructor_kwargs={"dim_ref": ref, "key_col": key_col, "value_cols": value_cols},
        batch_format="pyarrow",
        concurrency=(1, 16),
        **mb_kwargs,
    )
