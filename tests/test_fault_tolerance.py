"""Fault-injection gates: a worker process crashing mid-stage must not
change results — Ray retries the lost task and the engine's stages are
pure/idempotent per batch, which is the per-task half of the resume story
(the checkpoint half is gated in test_crawl_parity's rollback/resume tests).

The crash is a hard os._exit (not an exception), exercising the
worker-failure retry path a 256-node cluster lives on."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def test_task_survives_worker_crash(ray_session, tmp_path):
    import ray.data as rd

    flag = str(tmp_path / "crashed_once")

    def f(b: pa.Table) -> pa.Table:
        if not os.path.exists(flag):
            with open(flag, "w") as fh:
                fh.write("x")
            os._exit(1)  # simulate a machine/process loss, not a user error
        return b

    ds = rd.range(10_000, override_num_blocks=8).map_batches(f, batch_format="pyarrow")
    assert ds.count() == 10_000


def test_aggregate_exact_after_worker_crash(ray_session, tmp_path):
    """The partial-aggregate shape used throughout analytics must stay EXACT
    under a mid-stage worker loss: a retried combiner re-emits its partial
    once (no double count)."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    flag = str(tmp_path / "crashed_once_agg")

    def partial(b: pa.Table) -> pa.Table:
        if not os.path.exists(flag):
            with open(flag, "w") as fh:
                fh.write("x")
            os._exit(1)
        ids = b["id"].to_numpy()
        t = pa.table({"k": pa.array(ids % 7), "v": pa.array(np.ones(len(ids), np.int64))})
        return t.group_by(["k"]).aggregate([("v", "sum")])

    out = (
        rd.range(70_000, override_num_blocks=16)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("v_sum", alias_name="n"))
        .to_pandas()
    )
    assert sorted(out["n"].tolist()) == [10_000] * 7
