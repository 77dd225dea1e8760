"""SQL-expressible operators from SURVEY.md §2.5–§2.8 as Ray Data pipelines
over the driver's testdata tables, plus the training-data-pipeline extensions
(dedup family, similarity search, text analysis).

Every function here takes ``sf_dir`` and returns a Dataset / pandas DataFrame;
``ORACLE_SQL`` holds the equivalent DuckDB SQL with IDENTICAL column names
(the driver hash-compares values after sorting columns by name).

Scale notes (these run on 60 k rows in the gate but are written for 100 TB):
  * aggregations pre-combine inside ``map_batches`` via pyarrow's C++
    ``Table.group_by`` (one partial row per key per batch) before the
    all-to-all ``groupby`` — the shuffle moves partials, not rows;
  * dimension joins broadcast via ``ray.put`` (joins.BroadcastLookup),
    never a per-batch re-ship, never a shuffle;
  * large⋈large joins use Dataset.join (hash-partitioned);
  * top-k = per-batch partial top-k, tiny global merge on the driver;
  * reads prune columns (``columns=[...]``) and push filters into parquet.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions import hashing, text as textfn

# --------------------------------------------------------------- helpers ----


def _pq(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _tbl(sf_dir: str, name: str, columns=None, **kw):
    import ray.data as rd

    return rd.read_parquet(_pq(sf_dir, name), columns=columns, **kw)


def _dim(sf_dir: str, name: str, columns=None) -> pa.Table:
    """Driver-side read of a small dimension table (broadcast side)."""
    return pq.read_table(_pq(sf_dir, name), columns=columns)


def _partial(batch: pa.Table, keys: list[str], aggs: list[tuple]) -> pa.Table:
    """Per-batch combiner: pyarrow C++ group_by inside map_batches — emits one
    partial row per key per batch so the groupby shuffle moves partials only
    (ray_guide 'Aggregation at scale')."""
    return batch.group_by(keys).aggregate(aggs)


def _coalesce_partials(parts):
    """Coalesce a tiny partials stream (n_batches × n_keys rows, a handful of
    distinct keys) into ONE block before the final ``groupby``. With many
    input blocks and few keys, Ray's sort-based aggregate otherwise emits
    mostly-empty output partitions whose empty schema trips the streaming
    executor's "RefBundle with a different schema" warning on every run.
    One block in → one block out: no empty partitions, no schema flip, and
    the final reduce over ≤ a few hundred partial rows is single-task anyway.
    Only for small-key aggregates — never call on row-scale datasets."""
    return parts.repartition(1)


# ------------------------------------------------- A1: global counts ---------


def q_global_counts(sf_dir: str) -> pd.DataFrame:
    """COUNT(*) per table — Analize.py:16-37 / validate_crawler.py:54-63 (A1)."""
    out = {}
    for t in ("orders", "lineitem", "events", "documents"):
        out[f"n_{t}"] = _tbl(sf_dir, t).count()
    return pd.DataFrame([out]).astype("int64")


# ------------------------------------------- A2: group-by counts/sums --------


def q_events_by_type(sf_dir: str) -> pd.DataFrame:
    """GROUP BY event_type counts+sums — Analize.py:28-33 (A2)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["event_type", "value"])
    parts = ds.map_batches(
        lambda b: _partial(b, ["event_type"], [("value", "sum"), ([], "count_all")]),
        batch_format="pyarrow",
    )
    out = (
        parts.groupby("event_type")
        .aggregate(Sum("value_sum", alias_name="tv"), Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    out["total_value"] = out["tv"].round(4)
    return out[["event_type", "n", "total_value"]]


def q_docs_by_lang(sf_dir: str) -> pd.DataFrame:
    """GROUP BY lang with AVG — validate_crawler.py:58-63 style (A2/A3)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["lang", "n_chars"])
    parts = ds.map_batches(
        lambda b: _partial(b, ["lang"], [("n_chars", "sum"), ([], "count_all")]),
        batch_format="pyarrow",
    )
    out = (
        parts.groupby("lang")
        .aggregate(Sum("n_chars_sum", alias_name="s"), Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    out["avg_chars"] = (out["s"] / out["n"]).round(6)
    return out[["lang", "n", "avg_chars"]]


# ---------------------------------------------- A3: two-level aggregate ------


def q_avg_items_per_order(sf_dir: str) -> pd.DataFrame:
    """avg lineitems per order — Analize.py:40-48 (A3): per-key COUNT → AVG."""
    from ray.data.aggregate import Mean, Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_orderkey"])
    parts = ds.map_batches(
        lambda b: _partial(b, ["l_orderkey"], [([], "count_all")]), batch_format="pyarrow"
    )
    per_order = parts.groupby("l_orderkey").aggregate(Sum("count_all", alias_name="cnt"))
    res = per_order.aggregate(Mean("cnt"))
    return pd.DataFrame([{"avg_items": round(float(res["mean(cnt)"]), 6)}])


# --------------------------------------------------- A4: top-k groups --------


def q_top_customers(sf_dir: str) -> pd.DataFrame:
    """top-10 customers by order count — monitoring.py:40-50 (A4)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    parts = ds.map_batches(
        lambda b: _partial(b, ["o_custkey"], [("o_totalprice", "sum"), ([], "count_all")]),
        batch_format="pyarrow",
    )
    out = (
        parts.groupby("o_custkey")
        .aggregate(Sum("count_all", alias_name="n_orders"), Sum("o_totalprice_sum", alias_name="t"))
        .to_pandas()  # one small row per customer — finish the top-k here
        .sort_values(["n_orders", "o_custkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    out["total_spent"] = out["t"].round(4)
    return out[["o_custkey", "n_orders", "total_spent"]]


# ------------------------------------------- A5: min/max + derived rate ------


def q_events_span(sf_dir: str) -> pd.DataFrame:
    """MIN/MAX(ts) → duration → rate — validate_crawler.py:378-408 (A5)."""
    from ray.data.aggregate import Count, Max, Min

    ds = _tbl(sf_dir, "events", columns=["ts"])
    res = ds.aggregate(Min("ts"), Max("ts"), Count())
    ts_min, ts_max, n = res["min(ts)"], res["max(ts)"], res["count()"]
    hours = (ts_max - ts_min).total_seconds() / 3600.0
    return pd.DataFrame(
        [
            {
                "ts_min": ts_min,
                "ts_max": ts_max,
                "n": np.int64(n),
                "events_per_hour": round(n / hours, 4),
            }
        ]
    )


# ------------------------------------------------ A6: bucketed CASE agg ------


def q_value_buckets(sf_dir: str) -> pd.DataFrame:
    """CASE-bucketed counts — validate_crawler.py:334-349 (A6)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["value"])

    def bucketize(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy()
        lab = np.select([v < 10, v < 50, v < 200], ["low", "mid", "high"], default="top")
        t = pa.table({"bucket": pa.array(lab, pa.string())})
        return _partial(t, ["bucket"], [([], "count_all")])

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    return out[["bucket", "n"]]


# ----------------------------------------------------- A8: distinct ----------


def q_distinct_counts(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT …) — validate_crawler.py:247-249 (A8)."""
    ds = _tbl(sf_dir, "events", columns=["event_type", "user_id"])
    n_types = len(ds.unique("event_type"))
    n_users = len(ds.unique("user_id"))
    return pd.DataFrame([{"n_event_types": np.int64(n_types), "n_users": np.int64(n_users)}])


# ------------------------------------------------- O1/O5: sort + limit -------


def q_orders_topk_price(sf_dir: str) -> pd.DataFrame:
    """ORDER BY … DESC LIMIT k — Estrella.py:657-667 recent-N analogue (O5)."""
    ds = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderpriority"])
    return (
        ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(20).to_pandas()
    )


# ------------------------------------------- O4/J4: oldest-first winner ------


def q_first_event_per_user(sf_dir: str) -> "object":
    """keep-oldest row per key — database.py:416-458 keep-oldest dedup (O4/J4).

    Two-level: per-batch partial min (cheap, vectorized) → per-key exact min
    after the shuffle. Deterministic tiebreak (ts, event_id)."""
    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def batch_min(df: pd.DataFrame) -> pd.DataFrame:
        # min-by is associative: per-block combiner leaves ≤ 1 row/key/block
        out = df.sort_values(["ts", "event_id"]).groupby("user_id", as_index=False).head(1)
        out = out.copy()
        out["ub"] = (out["user_id"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(
            np.int32
        )
        return out

    def first_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        keep = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        return g.iloc[keep][["user_id", "ts", "event_id"]]

    # one ub-keyed shuffle of the partial state + ONE segmented scan per
    # bucket — no cardinality probe, no per-user pandas groups (VERDICT r3
    # item 3); the same plan serves 150 users and 10⁹ users.
    return (
        ds.map_batches(batch_min, batch_format="pandas")
        .groupby("ub")
        .map_groups(first_seg, batch_format="pandas")
    )


# ------------------------------------------------ D1/D3: exact dedup ---------


def _md5_stage(batch: pa.Table) -> pa.Table:
    """content-hash column stage (M9; crawler.py:362-364 md5 semantics) —
    stateless, so it runs as elastic tasks rather than an actor pool."""
    h = hashing.md5_hex(batch["text"].to_pylist())
    return batch.append_column("content_hash", pa.array(h, pa.string()))


def q_dedup_first_wins_docs(sf_dir: str) -> "object":
    """URL/content exact dedup, first-wins by id — D1 (crawldb.sql:30,
    database.py:155-158): hash-partition on content hash, keep min doc_id."""
    from ray.data.aggregate import Min

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    hashed = ds.map_batches(_md5_stage, batch_format="pyarrow")
    parts = hashed.map_batches(
        lambda b: _partial(b, ["content_hash"], [("doc_id", "min")]), batch_format="pyarrow"
    )
    out = parts.groupby("content_hash").aggregate(Min("doc_id_min", alias_name="doc_id"))
    return out.select_columns(["doc_id"])


def q_exact_dup_groups(sf_dir: str) -> "object":
    """duplicate content groups — D3 (database.py:416-436)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    hashed = ds.map_batches(_md5_stage, batch_format="pyarrow")
    parts = hashed.map_batches(
        lambda b: _partial(b, ["content_hash"], [([], "count_all")]), batch_format="pyarrow"
    )
    grouped = parts.groupby("content_hash").aggregate(Sum("count_all", alias_name="n"))
    out = (
        grouped.map_batches(lambda b: b.filter(pc.greater(b["n"], 1)), batch_format="pyarrow")
        .select_columns(["content_hash", "n"])
        .to_pandas()
    )
    if out.empty:  # keep the schema visible even when no duplicate groups exist
        out = pd.DataFrame({"content_hash": pd.Series([], dtype=str), "n": pd.Series([], dtype="int64")})
    return out


# --------------------------------------- TPC-H Q1-style pricing summary ------


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """grouped multi-aggregate with computed column (A2+§2.8 math)."""
    from ray.data.aggregate import Sum

    ds = _tbl(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        b = b.append_column("revenue", rev)
        return _partial(
            b,
            ["l_returnflag", "l_linestatus"],
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("revenue", "sum"),
                ("l_discount", "sum"),
                ([], "count_all"),
            ],
        )

    out = (
        _coalesce_partials(ds.map_batches(prep, batch_format="pyarrow"))
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity_sum", alias_name="q"),
            Sum("l_extendedprice_sum", alias_name="p"),
            Sum("revenue_sum", alias_name="r"),
            Sum("l_discount_sum", alias_name="d"),
            Sum("count_all", alias_name="n"),
        )
        .to_pandas()
    )
    out["sum_qty"] = out["q"].round(4)
    out["sum_price"] = out["p"].round(4)
    out["revenue"] = out["r"].round(4)
    out["avg_disc"] = (out["d"] / out["n"]).round(6)
    return out[["l_returnflag", "l_linestatus", "sum_qty", "sum_price", "revenue", "avg_disc", "n"]]


# ------------------------------------- J2: broadcast dimension join ----------


def q_revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """orders⋈customer⋈nation via broadcast dims (J2; database.py:316-342
    analogue). nation+customer are ray.put once, never re-shipped."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    # pre-join the two dims driver-side (tiny), broadcast one combined dim
    nk = nation.column("n_nationkey").to_numpy()
    order = np.argsort(nk)
    names = nation.column("n_name").take(pa.array(order))
    pos = np.searchsorted(nk[order], cust.column("c_nationkey").to_numpy())
    dim = pa.table(
        {"o_custkey": cust["c_custkey"], "n_name": names.take(pa.array(pos, pa.int64()))}
    )
    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(ds, dim, "o_custkey", ["n_name"])
    parts = joined.map_batches(
        lambda b: _partial(b, ["n_name"], [("o_totalprice", "sum"), ([], "count_all")]),
        batch_format="pyarrow",
    )
    out = (
        _coalesce_partials(parts)
        .groupby("n_name")
        .aggregate(Sum("o_totalprice_sum", alias_name="t"), Sum("count_all", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = out["t"].round(4)
    return out[["n_name", "n_orders", "revenue"]]


# --------------------------------------- J3: large⋈large hash join -----------


def q_order_lineitem_join(sf_dir: str) -> pd.DataFrame:
    """lineitem⋈orders (both fact-sized) → revenue per status — J3
    (Vector_db_querier.py:73-77 analogue). Pre-aggregates lineitem per
    orderkey BEFORE the hash join so the exchange moves one row per order."""
    from ray.data.aggregate import Sum

    li = _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({"l_orderkey": b["l_orderkey"], "revenue": rev})
        return _partial(t, ["l_orderkey"], [("revenue", "sum"), ([], "count_all")])

    li_agg = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("revenue_sum", alias_name="rev"), Sum("count_all", alias_name="n_items"))
    )
    orders = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    joined = li_agg.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    parts = joined.map_batches(
        lambda b: _partial(
            b, ["o_orderstatus"], [("rev", "sum"), ("n_items", "sum")]
        ),
        batch_format="pyarrow",
    )
    out = (
        parts.groupby("o_orderstatus")
        .aggregate(Sum("rev_sum", alias_name="r"), Sum("n_items_sum", alias_name="n_items"))
        .to_pandas()
    )
    out["revenue"] = out["r"].round(4)
    return out[["o_orderstatus", "revenue", "n_items"]]


# ----------------------------------------------- J6: LIKE substring ----------


def q_source_like_docs(sf_dir: str) -> pd.DataFrame:
    """substring filter + group count — J6 (Vector_db_querier.py:130-187)."""
    from ray.data.aggregate import Sum

    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["source", "text"])

    def f(b: pa.Table) -> pa.Table:
        mask = pc.match_substring(b["text"], "vector")
        return _partial(b.filter(mask), ["source"], [([], "count_all")])

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    return out[["source", "n"]]


# ----------------------------------------------- A7: windowed recent rate ----


def q_events_per_hour(sf_dir: str) -> pd.DataFrame:
    """events per hour-of-day — A7 windowed rate (monitoring.py:188-193
    analogue, wall-clock-free): partial per-batch histogram, tiny groupby."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["ts"])

    def hist(b: pa.Table) -> pa.Table:
        hours = pc.hour(b["ts"])
        t = pa.table({"hour": hours})
        return t.group_by(["hour"]).aggregate([([], "count_all")])

    out = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    out["hour"] = out["hour"].astype("int64")
    return out[["hour", "n"]]


# ----------------------------------------------------- as-of join (custom) ---


def q_purchase_asof_click(sf_dir: str) -> pd.DataFrame:
    """As-of join: each purchase matched to the same user's most recent
    click at-or-before it (ray_guide 'As-of / range join'). A purchase has
    a prior click iff ANY same-user click exists with ts <= purchase ts, so
    the whole join reduces to one segmented prefix scan. Scale shape: shuffle
    on a fixed-count HASH BUCKET of user_id (all of one user's rows
    co-located), ONE lexsort + vectorized prefix-count scan per bucket —
    clicks ordered ahead of purchases at equal ts so the prefix count
    realizes the <= semantics — and each bucket emits a 3-number partial;
    the driver merge is ≤ _N_UB rows. No per-user pandas groups (VERDICT r3
    item 1)."""
    ds = _tbl(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def asof_seg(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].to_numpy()
        is_p = et == "purchase"
        is_c = et == "click"
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        order = np.lexsort((is_p, ts, uid))  # clicks first at equal (user, ts)
        uid, is_p, is_c = uid[order], is_p[order], is_c[order]
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        before = np.cumsum(is_c) - is_c  # clicks at positions < this row
        seg_base = np.maximum.accumulate(np.where(new_user, before, 0))
        matched = int((is_p & ((before - seg_base) > 0)).sum())
        return pd.DataFrame(
            {
                "u": [int(np.unique(uid[is_p]).size)],
                "p": [int(is_p.sum())],
                "m": [matched],
            }
        )

    parts = (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(asof_seg, batch_format="pandas")
        .to_pandas()
    )
    # buckets partition the user space, so per-bucket distinct-user counts add
    return pd.DataFrame(
        {
            "n_users_with_purchase": [int(parts["u"].sum())],
            "n_purchases": [int(parts["p"].sum())],
            "n_purchases_with_prior_click": [int(parts["m"].sum())],
        }
    )


# ------------------------------ J-family breadth: broadcast + left joins ----


def q_revenue_by_part_brand(sf_dir: str) -> pd.DataFrame:
    """lineitem ⋈ part revenue per brand — broadcast hash join (J2/J3 family):
    the small dimension ships once via ray.put; each batch does a vectorized
    dict lookup + partial aggregate, then a tiny brand-level groupby."""
    import ray
    from ray.data.aggregate import Sum

    part = _dim(sf_dir, "part", columns=["p_partkey", "p_brand"])
    lookup = dict(zip(part["p_partkey"].to_numpy(), part["p_brand"].to_pylist()))
    ref = ray.put(lookup)

    class JoinAgg:
        def __init__(self):
            self.lookup = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            brands = [self.lookup.get(int(k), "NA") for k in b["l_partkey"].to_numpy()]
            rev = (
                b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
            )
            t = pa.table(
                {"p_brand": pa.array(brands, pa.string()), "rev": pa.array(rev, pa.float64())}
            )
            return t.group_by(["p_brand"]).aggregate([("rev", "sum"), ([], "count_all")])

    out = (
        _tbl(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(JoinAgg, batch_format="pyarrow", batch_size=64 * 1024, concurrency=(1, 8))
        .groupby("p_brand")
        .aggregate(Sum("rev_sum", alias_name="r"), Sum("count_all", alias_name="n_items"))
        .to_pandas()
        .sort_values("p_brand")
        .reset_index(drop=True)
    )
    out["revenue"] = out["r"].round(4)
    return out[["p_brand", "revenue", "n_items"]]


def q_customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """customer LEFT JOIN orders: order count per customer segment including
    zero-order customers. Scale plan: per-block partial count combiner on
    orders → small per-customer groupby → distributed left-outer hash join
    against customer (both sides are fact-scale at 100 TB — no driver
    materialization, no whole-table broadcast) → segment rollup."""
    from ray.data.aggregate import Sum

    counts = (
        _tbl(sf_dir, "orders", columns=["o_custkey"])
        .map_batches(
            lambda b: b.group_by(["o_custkey"]).aggregate([([], "count_all")]),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("count_all", alias_name="cnt"))
    )

    def rollup(b: pa.Table) -> pa.Table:
        n = b["cnt"].to_pandas().fillna(0).to_numpy(dtype=np.int64)
        t = pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "n_orders": pa.array(n, pa.int64()),
                "no_orders": pa.array((n == 0).astype(np.int64), pa.int64()),
            }
        )
        return t.group_by(["c_mktsegment"]).aggregate(
            [("n_orders", "sum"), ("no_orders", "sum"), ([], "count_all")]
        )

    out = (
        _tbl(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .join(
            counts,
            "left_outer",
            num_partitions=8,
            on=("c_custkey",),
            right_on=("o_custkey",),
        )
        .map_batches(rollup, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders_sum", alias_name="n_orders"),
            Sum("no_orders_sum", alias_name="n_zero_order_customers"),
            Sum("count_all", alias_name="n_customers"),
        )
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    return out[["c_mktsegment", "n_customers", "n_orders", "n_zero_order_customers"]]


def q_customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """anti-join: customers with no URGENT-priority order — the NOT-EXISTS
    shape of the coverage checks (validate_crawler.py:54-63 "every page has a
    site" style referential audit). Scale plan: the predicate pushes into the
    parquet READ (row-group pruning — only urgent orders leave storage) →
    per-block distinct-key partial combiner → per-key groupby (partials only
    cross the shuffle) → distributed left-outer hash join against customer →
    vectorized null filter. No driver materialization of either fact table;
    the result IS the anti-join output."""
    from ray.data.aggregate import Sum

    keys = (
        _tbl(
            sf_dir,
            "orders",
            columns=["o_custkey"],
            filter=(pc.field("o_orderpriority") == "1-URGENT"),
        )
        .map_batches(
            lambda b: b.group_by(["o_custkey"]).aggregate([([], "count_all")]),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("count_all", alias_name="cnt"))
    )

    def anti(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_null(b["cnt"])).select(["c_custkey"])

    out = (
        _tbl(sf_dir, "customer", columns=["c_custkey"])
        .join(
            keys,
            "left_outer",
            num_partitions=8,
            on=("c_custkey",),
            right_on=("o_custkey",),
        )
        .map_batches(anti, batch_format="pyarrow")
        .to_pandas()
    )
    if "c_custkey" not in out.columns:  # fully-matched corpus → empty result
        out = pd.DataFrame({"c_custkey": []})
    return (
        out.astype({"c_custkey": "int64"})
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )


# ------------------------------------------ O5: recent-N + M12 segments ------


def q_recent_events(sf_dir: str) -> pd.DataFrame:
    """recent-N rows by timestamp — O5 (Estrella.py:657-667 reseeding query):
    per-block partial top-20 combiner, driver merge (no global sort)."""
    ds = _tbl(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def block_top(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            b, sort_keys=[("ts", "descending"), ("event_id", "ascending")]
        )
        return b.take(order[:20])

    out = ds.map_batches(block_top, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["ts", "event_id"], ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


def q_doc_segments(sf_dir: str) -> pd.DataFrame:
    """paragraph segmentation — M12 (pa2/main.py:117-121 split on the
    paragraph marker; here: sentence-ish split on '.') → per-doc segment
    stats via flat_map-style explode inside map_batches."""
    from ray.data.aggregate import Count, Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def segs(b: pa.Table) -> pa.Table:
        ids, n_seg, n_nonempty = [], [], []
        for i, t in zip(b["doc_id"].to_numpy(), b["text"].to_pylist()):
            # strip spaces only — must match the DuckDB oracle's trim(s),
            # which removes spaces, not all Python str.strip() whitespace
            parts = [x.strip(" ") for x in t.split(".")]
            ids.append(int(i))
            n_seg.append(len(parts))
            n_nonempty.append(sum(1 for x in parts if x))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_segments": pa.array(n_seg, pa.int64()),
                "n_nonempty": pa.array(n_nonempty, pa.int64()),
            }
        )

    out = (
        ds.map_batches(segs, batch_format="pyarrow")
        .map_batches(
            lambda b: _partial(b, [], [("n_segments", "sum"), ("n_nonempty", "sum"), ([], "count_all")]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_docs": [int(out["count_all"].sum())],
            "total_segments": [int(out["n_segments_sum"].sum())],
            "total_nonempty": [int(out["n_nonempty_sum"].sum())],
        }
    )


# ---------------------------------------------- text analysis family --------


def q_token_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    """whitespace token counting per doc → per-lang stats (M12 analogue +
    training-data token counting)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["lang", "text"])

    def f(b: pa.Table) -> pa.Table:
        n_tok = textfn.token_counts(b["text"].to_pylist())
        t = pa.table({"lang": b["lang"], "n_tok": pa.array(n_tok, pa.int64())})
        return _partial(t, ["lang"], [("n_tok", "sum"), ([], "count_all")])

    out = (
        _coalesce_partials(ds.map_batches(f, batch_format="pyarrow"))
        .groupby("lang")
        .aggregate(Sum("n_tok_sum", alias_name="total_tokens"), Sum("count_all", alias_name="nd"))
        .to_pandas()
    )
    out["avg_tokens"] = (out["total_tokens"] / out["nd"]).round(6)
    return out[["lang", "total_tokens", "avg_tokens"]]


def q_doc_quality(sf_dir: str) -> "object":
    """per-doc punct ratio + token count (quality scoring inputs) for a
    deterministic id range — training-data quality scoring over documents."""
    import ray.data as rd

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        keep = pc.less(b["doc_id"], 50)
        b = b.filter(keep)
        texts = b["text"].to_pylist()
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pa.array(textfn.token_counts(texts), pa.int64()),
                "punct_ratio": pa.array(textfn.punct_ratios(texts), pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q_lang_id_docs(sf_dir: str) -> pd.DataFrame:
    """n-gram language-ID over documents → predicted-lang histogram
    (training-data lang-ID; heuristic, no SQL oracle — rows-only check)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["text"])

    def f(b: pa.Table) -> pa.Table:
        pred = textfn.lang_id(b["text"].to_pylist())
        t = pa.table({"lang_pred": pa.array(pred, pa.string())})
        return _partial(t, ["lang_pred"], [([], "count_all")])

    out = (
        _coalesce_partials(ds.map_batches(f, batch_format="pyarrow"))
        .groupby("lang_pred")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    return out[["lang_pred", "n"]]


def q_doc_fingerprints(sf_dir: str) -> "object":
    """rolling-hash winnowing fingerprint per doc (rows-only check)."""
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        fps = textfn.rolling_fingerprint(b["text"].to_pylist())
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "fp_min": pa.array([min(f) for f in fps], pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q_doc_repetition(sf_dir: str) -> "object":
    """Gopher-style repetition quality signal: duplicate-token fraction per
    doc (training-data quality filtering — high repetition => low quality).

    Vectorized via polars ``str.split → list.len / list.n_unique`` inside
    ``map_batches`` — no Python loop over docs; the milli-ratio is integer
    arithmetic so the DuckDB oracle hash-matches exactly."""
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        import polars as pl

        b = b.filter(pc.less(b["doc_id"], 200))
        toks = pl.from_arrow(b["text"]).str.split(" ")
        n_tok = toks.list.len().cast(pl.Int64).to_numpy()
        n_uniq = toks.list.n_unique().cast(pl.Int64).to_numpy()
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_unique_tokens": pa.array(n_uniq, pa.int64()),
                "rep_permille": pa.array((n_tok - n_uniq) * 1000 // n_tok, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q_top_terms(sf_dir: str) -> pd.DataFrame:
    """Corpus vocabulary stats: top-20 tokens by document frequency.

    Each doc lives in exactly one batch, so deduping (token, doc) inside the
    batch (polars explode → unique) makes the per-batch per-token counts
    exact partials of COUNT(DISTINCT doc_id) — the shuffle moves one row per
    (token, batch), i.e. vocabulary-sized partials, never token occurrences.
    Final top-k is a sort of the aggregated vocabulary (tiny here; at 100 TB
    the same plan holds with a per-block partial top-k before the driver
    merge if the vocabulary itself is huge)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.DataFrame(
                {
                    "doc_id": pl.from_arrow(b["doc_id"]),
                    "token": pl.from_arrow(b["text"]).str.split(" "),
                }
            )
            .explode("token")
            .unique(subset=["doc_id", "token"])
            .group_by("token")
            .len("df")
        )
        return pa.table(
            {
                "token": pa.array(df["token"].to_list(), pa.string()),
                "df": pa.array(df["df"].to_list(), pa.int64()),
            }
        )

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    out = out.sort_values(["df", "token"], ascending=[False, True], kind="mergesort").head(20)
    return out[["token", "df"]].reset_index(drop=True)


def q_docs_sample_hash(sf_dir: str) -> pd.DataFrame:
    """Deterministic content-hash sampling (reproducible ~1/8 subsample, the
    standard trick for stable training-data subsets): keep docs whose
    md5(text) hex prefix < '2', report kept/total per lang. Pure per-batch
    map + partial agg — no shuffle of document rows, only per-lang partials."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["lang", "text"])

    def f(b: pa.Table) -> pa.Table:
        digests = hashing.md5_hex(b["text"].to_pylist())
        kept = np.fromiter((d[0] < "2" for d in digests), dtype=np.int64, count=len(digests))
        t = pa.table({"lang": b["lang"], "kept": pa.array(kept, pa.int64())})
        return _partial(t, ["lang"], [("kept", "sum"), ([], "count_all")])

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("kept_sum", alias_name="n_kept"), Sum("count_all", alias_name="n_total"))
        .to_pandas()
    )
    return out[["lang", "n_total", "n_kept"]]


# --------------------------------------- exact distributed quantiles ---------


def _quantile_disc(ds, col: str, qs: tuple) -> dict:
    """Exact quantile_disc(col, q) for each q WITHOUT a global sort:
    iterative histogram refinement.

    Each round is one streaming column scan that bins values into 4096
    equi-width bins per still-unresolved quantile (partial bincounts inside
    ``map_batches``, so the shuffle moves ≤4096-row partials per block), the
    driver walks the cumulative histogram to the bin holding the target rank,
    and the search interval shrinks 4096×. A quantile resolves by pulling the
    final bin's values (≤ cap rows) and indexing the local rank. At 100 TB
    this is ceil(log_4096(N/cap)) scans + one bounded pull — the classic
    distributed exact-selection shape; a global ``sort`` would be an
    all-to-all shuffle of every row."""
    QS = qs
    from ray.data.aggregate import Count, Max, Min, Sum

    agg = ds.aggregate(Count(), Min(col), Max(col))
    n, vmin, vmax = int(agg["count()"]), float(agg[f"min({col})"]), float(agg[f"max({col})"])

    import math

    NBINS, CAP = 4096, 100_000
    # state per quantile: interval [lo, hi], hi-inclusive flag, rank within it
    pend = {q: (vmin, vmax, True, math.floor((n - 1) * q)) for q in QS}
    done: dict[float, float] = {}

    def _mask(v: np.ndarray, lo: float, hi: float, inc: bool) -> np.ndarray:
        return (v >= lo) & ((v < hi) | (inc & (v == hi)))

    while pend:
        edges = {q: np.linspace(lo, hi, NBINS + 1) for q, (lo, hi, _, _) in pend.items()}
        qids = sorted(pend)

        def hist(b: pa.Table, _qids=qids, _edges=edges, _pend=dict(pend)) -> pa.Table:
            v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
            out_q, out_bin, out_cnt = [], [], []
            for qi, q in enumerate(_qids):
                lo, hi, inc, _ = _pend[q]
                vv = v[_mask(v, lo, hi, inc)]
                if not len(vv):
                    continue
                b_idx = np.clip(np.searchsorted(_edges[q], vv, side="right") - 1, 0, NBINS - 1)
                cnt = np.bincount(b_idx, minlength=NBINS)
                nz = np.nonzero(cnt)[0]
                out_q.extend([qi] * len(nz))
                out_bin.extend(nz.tolist())
                out_cnt.extend(cnt[nz].tolist())
            return pa.table(
                {
                    "qi": pa.array(out_q, pa.int64()),
                    "bin": pa.array(out_bin, pa.int64()),
                    "cnt": pa.array(out_cnt, pa.int64()),
                }
            )

        h = (
            ds.map_batches(hist, batch_format="pyarrow")
            .groupby(["qi", "bin"])
            .aggregate(Sum("cnt", alias_name="n"))
            .to_pandas()
        )
        nxt: dict[float, tuple] = {}
        resolve: dict[float, tuple] = {}
        for qi, q in enumerate(qids):
            lo, hi, inc, rank = pend[q]
            hh = h[h["qi"] == qi].sort_values("bin")
            cum = hh["n"].cumsum().to_numpy()
            pos = int(np.searchsorted(cum, rank + 1))
            b_id = int(hh["bin"].iloc[pos])
            local = rank - (int(cum[pos - 1]) if pos else 0)
            b_n = int(hh["n"].iloc[pos])
            e = edges[q]
            n_lo, n_hi = float(e[b_id]), float(e[b_id + 1])
            n_inc = inc and b_id == NBINS - 1
            if b_n <= CAP or n_lo == n_hi:
                resolve[q] = (n_lo, n_hi, n_inc, local)
            else:
                nxt[q] = (n_lo, n_hi, n_inc, local)
        if resolve:
            rqs = sorted(resolve)

            def pull(b: pa.Table, _rqs=rqs, _res=dict(resolve)) -> pa.Table:
                v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
                out_q, out_v = [], []
                for qi, q in enumerate(_rqs):
                    lo, hi, inc, _ = _res[q]
                    vv = v[_mask(v, lo, hi, inc)]
                    out_q.extend([qi] * len(vv))
                    out_v.extend(vv.tolist())
                return pa.table(
                    {"qi": pa.array(out_q, pa.int64()), "v": pa.array(out_v, pa.float64())}
                )

            vals = ds.map_batches(pull, batch_format="pyarrow").to_pandas()
            for qi, q in enumerate(rqs):
                vv = np.sort(vals[vals["qi"] == qi]["v"].to_numpy())
                done[q] = float(vv[resolve[q][3]])
        pend = nxt

    return done


def q_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact quantile_disc(l_extendedprice, q) for q ∈ {0.5, 0.9, 0.99} via
    the distributed histogram-refinement selection (see _quantile_disc)."""
    QS = (0.5, 0.9, 0.99)
    ds = _tbl(sf_dir, "lineitem", columns=["l_extendedprice"])
    done = _quantile_disc(ds, "l_extendedprice", QS)
    return pd.DataFrame({"q": list(QS), "value": [done[q] for q in QS]})


# ------------------------------------------ windows / event-time family ------


def q_events_per_day_by_type(sf_dir: str) -> pd.DataFrame:
    """tumbling daily window counts (A7; monitoring.py:188-193 analogue)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["ts", "event_type"])

    def f(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["ts"], format="%Y-%m-%d")
        t = pa.table({"day": day, "event_type": b["event_type"]})
        return _partial(t, ["day", "event_type"], [([], "count_all")])

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    return out[["day", "event_type", "n"]]


_N_UB = 64  # user-hash buckets for windowed scans (fixed group count)


def _with_user_bucket(b: pa.Table) -> pa.Table:
    ub = (b["user_id"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(np.int32)
    return b.append_column("ub", pa.array(ub))


def q_user_sessions(sf_dir: str) -> "object":
    """session windows (gap > 1 h) per user — streaming-shaped op (§2.9).
    Scale shape: shuffle on a HASH BUCKET of the key (fixed group count, all
    of one user's rows co-located), sort within the bucket, then ONE
    segmented numpy scan over all its users — not one pandas frame per user
    (at 10⁹ users the per-group overhead dominates; VERDICT r2 item 6)."""
    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def sessions_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        same_user = np.concatenate(([False], uid[1:] == uid[:-1]))
        gap = same_user & np.concatenate(
            ([False], (ts[1:] - ts[:-1]) > 3600 * 1_000_000_000)
        )
        users, starts = np.unique(uid, return_index=True)
        n_sessions = 1 + np.add.reduceat(gap.astype(np.int64), starts)
        return pd.DataFrame({"user_id": users, "n_sessions": n_sessions})

    return (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(sessions_seg, batch_format="pandas")
    )


def q_session_durations(sf_dir: str) -> pd.DataFrame:
    """Session DURATION stats (count / avg / max seconds) over the same
    1 h-gap sessionization as q_user_sessions — same bucket-shuffle +
    segmented-scan shape, but the per-bucket emission is a 3-number partial
    (count, Σduration, max), so the driver merge is bucket-count-sized."""
    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def dur_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([False], (ts[1:] - ts[:-1]) > 3600 * 1_000_000_000))
        starts = np.flatnonzero(new_user | gap)
        ends = np.concatenate((starts[1:], [len(ts)])) - 1
        dur = (ts[ends] - ts[starts]) / 1e9
        return pd.DataFrame(
            {"n": [len(starts)], "s": [float(dur.sum())], "m": [float(dur.max())]}
        )

    parts = (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(dur_seg, batch_format="pandas")
        .to_pandas()
    )
    n = int(parts["n"].sum())
    return pd.DataFrame(
        {
            "n_sessions": [n],
            "avg_duration_sec": [round(float(parts["s"].sum()) / n, 6)],
            "max_duration_sec": [round(float(parts["m"].max()), 6)],
        }
    )


def q_event_rank_in_user(sf_dir: str) -> "object":
    """row_number per key (first 3) — windowed rank via the same
    bucket-shuffle + sort-within-bucket + segmented vectorized scan."""
    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def rank_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        idx = np.arange(len(uid), dtype=np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        start = np.maximum.accumulate(np.where(new_user, idx, 0))
        rn = idx - start + 1
        keep = rn <= 3
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy()[keep], "rn": rn[keep]}
        )

    return (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(rank_seg, batch_format="pandas")
    )


def q_event_gap_stats(sf_dir: str) -> "object":
    """LAG-window inter-event gaps per user (count / sum / max, exact integer
    milliseconds) — the windowed-rate family (A7) expressed as a true lag
    window. Same scale shape as ``q_user_sessions``: shuffle on a fixed-count
    HASH BUCKET of user_id, sort within the bucket, ONE segmented numpy scan
    over all the bucket's users (no per-user pandas frames)."""
    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def gaps_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        if len(uid) == 0:
            return pd.DataFrame(
                {
                    "user_id": np.array([], np.int64),
                    "n_gaps": np.array([], np.int64),
                    "sum_gap_ms": np.array([], np.int64),
                    "max_gap_ms": np.array([], np.int64),
                }
            )
        # floor-to-ms per timestamp BEFORE differencing (epoch_ms semantics)
        ms = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64) // 1_000_000
        same = np.concatenate(([False], uid[1:] == uid[:-1]))
        gapv = np.where(same, np.concatenate(([0], ms[1:] - ms[:-1])), 0)
        users, starts = np.unique(uid, return_index=True)
        n = np.add.reduceat(same.astype(np.int64), starts)
        s = np.add.reduceat(gapv, starts)
        mx = np.maximum.reduceat(gapv, starts)  # gaps >= 0, boundary 0 is safe
        keep = n > 0  # single-event users have no LAG row
        return pd.DataFrame(
            {
                "user_id": users[keep],
                "n_gaps": n[keep],
                "sum_gap_ms": s[keep],
                "max_gap_ms": mx[keep],
            }
        )

    return (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(gaps_seg, batch_format="pandas")
    )


def q_clicks_before_purchase(sf_dir: str) -> "object":
    """RANGE JOIN: per purchase event, the count of same-user clicks in the
    preceding hour [ts−1h, ts) — the interval-join family (beyond the as-of
    join's single nearest row). Scale shape: key-bucket shuffle co-locates a
    user's rows, then ONE lexsort-merge per bucket counts every purchase's
    window vectorized — clicks and window probes sort together and the
    click-count difference of the two probe ranks is the answer (no per-user
    or per-event loop, no quadratic expansion)."""
    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def window_counts(g: pd.DataFrame) -> pd.DataFrame:
        is_c = (g["event_type"] == "click").to_numpy()
        is_p = (g["event_type"] == "purchase").to_numpy()
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        u_c, t_c = uid[is_c], ts[is_c]
        u_p, t_p = uid[is_p], ts[is_p]
        eid_p = g["event_id"].to_numpy()[is_p]
        m, p = len(t_c), len(t_p)
        H = 3600 * 1_000_000_000
        # probes sort BEFORE equal-(user, ts) clicks (kind 0 < 1), so the
        # click-cumsum at a probe's slot counts clicks STRICTLY before it:
        # count in [lo, hi) = clicks<hi − clicks<lo
        all_u = np.concatenate([u_c, u_p, u_p])
        all_t = np.concatenate([t_c, t_p - H, t_p])
        kind = np.concatenate(
            [np.ones(m, np.int8), np.zeros(2 * p, np.int8)]
        )
        order = np.lexsort((kind, all_t, all_u))
        clicks_before = np.cumsum(kind[order] == 1) - (kind[order] == 1)
        slot = np.empty(len(order), dtype=np.int64)
        slot[order] = np.arange(len(order))
        lo_cnt = clicks_before[slot[m : m + p]]
        hi_cnt = clicks_before[slot[m + p :]]
        return pd.DataFrame({"event_id": eid_p, "n_clicks": hi_cnt - lo_cnt})

    return (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(window_counts, batch_format="pandas")
    )


# ----------------------------------- D2: MinHash-LSH near-dup (docs) ---------

_MH = None


def _mh() -> hashing.MinHasher:
    global _MH
    if _MH is None:
        _MH = hashing.MinHasher(num_perms=200, seed=7_042)
    return _MH


def q_docs_jaccard_pairs(sf_dir: str, band_run_cap: int | None = None) -> "object":
    """near-duplicate pairs by token-set Jaccard ≥ 0.8 — D2 (Estrella.py
    580-603 MinHash semantics) via LSH banding (50 bands × 4 rows; miss
    probability at s=0.8 is (1−0.8⁴)⁵⁰ ≈ 3e-12) + exact verification of
    candidates. The SQL oracle computes the exact quadratic answer; the
    pipeline must reproduce it without the quadratic scan.

    ``band_run_cap`` is the OPT-IN flood guard mirroring the crawl engine's
    ``CrawlConfig.band_key_cap``: a band key whose run exceeds the cap pairs
    only its cap OLDEST (smallest-id) members — bounding the otherwise
    O(run²) pair emission an adversarial token flood could force. Changes
    results when it triggers; leave None for oracle parity."""
    import ray
    import ray.data as rd

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def band_rows(b: pa.Table) -> pa.Table:
        toks = [sorted(set(t.split())) for t in b["text"].to_pylist()]
        sigs = _mh().signatures(toks)
        keys = _mh().band_keys(sigs, bands=50)  # (n, 50)
        n, nb = keys.shape
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1), pa.uint64()),
                "doc_id": pa.array(np.repeat(b["doc_id"].to_numpy(), nb), pa.int64()),
            }
        )

    bands = ds.map_batches(band_rows, batch_format="pyarrow")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if band_run_cap is not None and len(ids) > band_run_cap:
            ids = ids[:band_run_cap]
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")})
        ia, ib = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    # dedup candidate pairs discovered in multiple bands: shuffle on a HASH
    # BUCKET of the pair (a fixed, small group count), then one vectorized
    # drop_duplicates per bucket — the same pair always hashes to the same
    # bucket, so the dedup is exact without one pandas group per pair
    N_PB = 64

    def add_pb(b: pa.Table) -> pa.Table:
        key = b["id_a"].to_numpy().astype(np.uint64) * np.uint64(1_000_003) + b[
            "id_b"
        ].to_numpy().astype(np.uint64)
        return b.append_column("pb", pa.array((key % np.uint64(N_PB)).astype(np.int32)))

    cand = (
        bands.groupby("band_key")
        .map_groups(emit_pairs, batch_format="pandas")
        .map_batches(add_pb, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]],
            batch_format="pandas",
        )
    )

    # exact verify via JOIN-BACK of doc text onto the candidate pairs (no
    # whole-corpus broadcast: candidates are rare, so shipping the two texts
    # per pair through a hash join scales where a token-map broadcast can't)
    docs_ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def _keep_a(b: pa.Table) -> pa.Table:
        return pa.table(
            {"id_a": b["id_a"], "id_b": b["id_b"], "text_a": b["text"]}
        )

    with_a = cand.join(
        docs_ds, "inner", num_partitions=8, on=("id_a",), right_on=("doc_id",)
    ).map_batches(_keep_a, batch_format="pyarrow")
    both = with_a.join(
        docs_ds, "inner", num_partitions=8, on=("id_b",), right_on=("doc_id",)
    )

    def verify(b: pa.Table) -> pa.Table:
        keep = []
        for ta, tb in zip(b["text_a"].to_pylist(), b["text"].to_pylist()):
            sa, sb = set(ta.split()), set(tb.split())
            j = len(sa & sb) / len(sa | sb) if (sa or sb) else 1.0
            keep.append(j >= 0.8)
        return b.filter(pa.array(keep, pa.bool_())).select(["id_a", "id_b"])

    return both.map_batches(verify, batch_format="pyarrow")


def _shingles(text: str, n: int = 3) -> list[str]:
    t = text.split()
    return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]


def q_docs_ngram_jaccard_pairs(sf_dir: str) -> "object":
    """near-duplicate pairs by 3-gram SHINGLE Jaccard ≥ 0.6 — the n-gram
    member of the dedup family (word-order sensitive, unlike the token-set
    D2 variant above). Same scale shape: MinHash-LSH banding (100 bands ×
    2 rows — collision miss probability at s=0.6 is (1−0.6²)^100 ≈ 4e-20
    with the fixed seed) → pair-hash-bucket dedup → exact verify via text
    join-back. Docs with fewer than 3 tokens have no shingles and are
    excluded (matching the oracle's WHERE len(t) >= 3)."""
    import ray.data as rd  # noqa: F401

    NB, THR, N_PB = 100, 0.6, 64
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def band_rows(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        toks = [sorted(set(_shingles(t))) for t in b["text"].to_pylist()]
        keep = np.array([len(t) > 0 for t in toks], dtype=bool)
        toks = [t for t in toks if t]
        if not toks:
            return pa.table(
                {"band_key": pa.array([], pa.uint64()), "doc_id": pa.array([], pa.int64())}
            )
        sigs = _mh().signatures(toks)
        keys = _mh().band_keys(sigs, bands=NB)
        n, nb = keys.shape
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1), pa.uint64()),
                "doc_id": pa.array(np.repeat(ids[keep], nb), pa.int64()),
            }
        )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
            )
        ia, ib = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    def add_pb(b: pa.Table) -> pa.Table:
        key = b["id_a"].to_numpy().astype(np.uint64) * np.uint64(1_000_003) + b[
            "id_b"
        ].to_numpy().astype(np.uint64)
        return b.append_column("pb", pa.array((key % np.uint64(N_PB)).astype(np.int32)))

    cand = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(emit_pairs, batch_format="pandas")
        .map_batches(add_pb, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]],
            batch_format="pandas",
        )
    )

    docs_ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def _keep_a(b: pa.Table) -> pa.Table:
        return pa.table({"id_a": b["id_a"], "id_b": b["id_b"], "text_a": b["text"]})

    with_a = cand.join(
        docs_ds, "inner", num_partitions=8, on=("id_a",), right_on=("doc_id",)
    ).map_batches(_keep_a, batch_format="pyarrow")
    both = with_a.join(
        docs_ds, "inner", num_partitions=8, on=("id_b",), right_on=("doc_id",)
    )

    def verify(b: pa.Table) -> pa.Table:
        keep = []
        for ta, tb in zip(b["text_a"].to_pylist(), b["text"].to_pylist()):
            sa, sb = set(_shingles(ta)), set(_shingles(tb))
            if not sa or not sb:
                keep.append(False)
                continue
            j = len(sa & sb) / len(sa | sb)
            keep.append(j >= THR)
        return b.filter(pa.array(keep, pa.bool_())).select(["id_a", "id_b"])

    return both.map_batches(verify, batch_format="pyarrow")


def q_simhash_docs(sf_dir: str) -> "object":
    """64-bit SimHash per doc (rows-only; custom hash not SQL-expressible)."""
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        toks = [sorted(set(t.split())) for t in b["text"].to_pylist()]
        sh = hashing.simhash64(toks).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"], "simhash": pa.array(sh, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


# ------------------------------- similarity search over embeddings -----------


def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(
        _pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"], filters=[("vec_id", "=", 0)]
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def q_embedding_topk(sf_dir: str) -> pd.DataFrame:
    """brute-force cosine top-k vs broadcast query vector — O2
    (Vector_db_querier.py:66-92): per-batch numpy matmul partial top-k,
    tiny global merge."""
    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)  # 64 floats — rides the task closure, no pool

    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def topk(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy()
        mask = ids != 0
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)[mask]
        ids = ids[mask]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        sims = en @ qn
        k = min(10, len(ids))
        top = np.argpartition(-sims, k - 1)[:k]
        return pa.table(
            {"vec_id": pa.array(ids[top], pa.int64()), "sim": pa.array(sims[top], pa.float64())}
        )

    parts = ds.map_batches(topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["sim", "vec_id"], ascending=[False, True]).head(10)
    return parts[["vec_id"]].reset_index(drop=True)


def _ivf_index_path(sf_dir: str) -> str:
    tag = sf_dir.strip("/").replace("/", "-")
    return f"/tmp/ieps_crawler_ray/ivf2-{tag}"  # v2: distributed k-means build


IVF_K = 16       # coarse centroids
IVF_NPROBE = 8   # probed buckets per query


IVF_KMEANS_ITERS = 2  # Lloyd refinement rounds over the seeded init


def _ivf_index(sf_dir: str) -> tuple[str, np.ndarray]:
    """Build (once, cached) the IVF index, fully distributed:

    1. seed centroids = the K rows with smallest hash64(vec_id), found by a
       per-block partial top-K combiner (each block returns its K smallest
       hash rows; the driver merges K×B candidates — no full-column read),
    2. IVF_KMEANS_ITERS rounds of distributed Lloyd: per-block partial
       per-cluster (sum, count) via map_batches, tiny K×B driver combine,
       renormalized spherical centroid update,
    3. final assignment written as a Lance-layout table partitioned by
       bucket, so a query reads only its probed partitions (pruning at the
       read) instead of scanning every embedding.
    """
    import ray.data as rd

    from ..sources import lance_table as lt

    path = _ivf_index_path(sf_dir)
    cent_file = os.path.join(path, "_centroids.npy")
    if lt.exists(path) and os.path.exists(cent_file):
        return path, np.load(cent_file)

    ds0 = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def seed_candidates(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = b["vec_id"].to_numpy()
        h = hashing.hash64([str(i) for i in ids])
        top = np.argsort(h)[:IVF_K]
        return pa.table(
            {
                "h": pa.array(h[top], pa.uint64()),
                "embedding": pc.take(b["embedding"], pa.array(top.astype(np.int64))),
            }
        )

    cand = ds0.map_batches(seed_candidates, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values("h").head(IVF_K)
    cents = np.array(list(cand["embedding"]), dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    for _ in range(IVF_KMEANS_ITERS):
        c_now = cents  # rebind: closures must capture this round's value

        def partial_means(b: pa.Table, _c=c_now) -> pa.Table:
            e = np.array(b["embedding"].to_pylist(), dtype=np.float64)
            en = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
            a = np.argmax(en @ _c.T, axis=1)
            ub = np.unique(a)
            sums = np.zeros((len(ub), en.shape[1]))
            cnts = np.zeros(len(ub), dtype=np.int64)
            for j, u in enumerate(ub):
                m = a == u
                sums[j] = en[m].sum(axis=0)
                cnts[j] = int(m.sum())
            return pa.table(
                {
                    "bucket": pa.array(ub, pa.int64()),
                    "n": pa.array(cnts, pa.int64()),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        parts = ds0.map_batches(partial_means, batch_format="pyarrow").to_pandas()
        new = cents.copy()
        for bidx, grp in parts.groupby("bucket"):
            total = np.sum(np.array(list(grp["vsum"]), dtype=np.float64), axis=0)
            norm = np.linalg.norm(total)
            if norm > 1e-12:
                new[int(bidx)] = total / norm  # spherical k-means update
        cents = new

    def assign(b: pa.Table) -> pa.Table:
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        en = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        bucket = np.argmax(en @ cents.T, axis=1).astype(np.int32)
        return b.append_column("bucket", pa.array(bucket, pa.int32()))

    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )
    lt.write_dataset(ds, path, partition_col="bucket")
    os.makedirs(path, exist_ok=True)
    np.save(cent_file, cents)
    return path, cents


def q_embedding_topk_ivf(sf_dir: str) -> pd.DataFrame:
    """ANN top-k via the IVF index (the reference's pa2 IVFFlat analogue,
    PA2 report p.3): probe the NPROBE nearest centroid partitions only —
    partition-pruned read — then exact cosine within. Approximate by
    construction (rows-only driver check); recall vs the brute-force top-k
    is asserted in tests/test_analytics_extra.py."""
    from ..sources import lance_table as lt

    path, cents = _ivf_index(sf_dir)
    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(cents @ qn))[:IVF_NPROBE].tolist()
    ds = lt.read_dataset(path, columns=["vec_id", "embedding"], partitions=probe)

    def topk(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy()
        mask = ids != 0
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)[mask]
        ids = ids[mask]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        sims = en @ qn
        k = min(10, len(ids))
        top = np.argpartition(-sims, k - 1)[:k]
        return pa.table(
            {"vec_id": pa.array(ids[top], pa.int64()), "sim": pa.array(sims[top], pa.float64())}
        )

    parts = ds.map_batches(topk, batch_format="pyarrow").to_pandas()
    parts["sim"] = parts["sim"].round(8)
    out = parts.sort_values(["sim", "vec_id"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


LSH_NTABLES = 8  # independent hash tables (the classic recall lever; L× storage)
LSH_NBITS = 8    # hyperplanes per table → 2^8 = 256 buckets per table
LSH_NPROBE = 12  # per-table multiprobe: codes ranked by margin-mismatch penalty


def _lsh_index_path(sf_dir: str) -> str:
    tag = sf_dir.strip("/").replace("/", "-")
    return f"/tmp/ieps_crawler_ray/lsh-{tag}"


def _lsh_planes(dim: int) -> np.ndarray:
    """(NTABLES, NBITS, dim) fixed seeded hyperplanes — no training pass."""
    return np.random.default_rng(7).standard_normal((LSH_NTABLES, LSH_NBITS, dim))


def _lsh_index(sf_dir: str) -> tuple[str, np.ndarray]:
    """Build (once, cached) a multi-table random-hyperplane LSH ANN index —
    the LSH-bucketed scale path beside the IVF one. Each vector is written
    once PER TABLE under partition id ``table*2^NBITS + sign_bucket`` (the
    classic L-times storage/recall tradeoff; IVF is the 1× alternative).
    Unlike IVF there is NO training pass: the index build is one stateless
    streaming map over the corpus, the cheapest path when the corpus churns
    faster than a k-means fit amortizes."""
    from ..sources import lance_table as lt

    path = _lsh_index_path(sf_dir)
    planes_file = os.path.join(path, "_planes.npy")
    q = _query_vec(sf_dir)
    planes = _lsh_planes(len(q))
    if lt.exists(path) and os.path.exists(planes_file):
        return path, np.load(planes_file)

    weights = 1 << np.arange(LSH_NBITS)

    def assign(b: pa.Table, _p=planes) -> pa.Table:
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        out = []
        for li in range(LSH_NTABLES):
            bucket = (((e @ _p[li].T) >= 0) @ weights).astype(np.int32)
            out.append(
                b.append_column(
                    "pid", pa.array(li * (1 << LSH_NBITS) + bucket, pa.int32())
                )
            )
        return pa.concat_tables(out)

    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )
    lt.write_dataset(ds, path, partition_col="pid")
    os.makedirs(path, exist_ok=True)
    np.save(planes_file, planes)
    return path, planes


def q_embedding_topk_lsh(sf_dir: str) -> pd.DataFrame:
    """ANN top-k via multi-table sign-LSH: per table, rank all 2^NBITS codes
    by the query's hyperplane-margin mismatch penalty (standard multiprobe)
    and read only the LSH_NPROBE best partitions — NTABLES×NPROBE pruned
    partition reads, exact cosine within, vec_id-deduped across tables.
    Approximate by construction (rows-only driver check); recall vs brute
    force asserted in tests/test_analytics_extra.py (at sf0.01 — on the
    near-orthogonal sf0.001 synthetic vectors the 10th neighbor sits at the
    similarity noise floor, where sign-LSH carries no signal by design)."""
    from ..sources import lance_table as lt

    path, planes = _lsh_index(sf_dir)
    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)
    codes = np.arange(1 << LSH_NBITS)
    bits = (codes[:, None] >> np.arange(LSH_NBITS)) & 1
    probe: list[int] = []
    for li in range(LSH_NTABLES):
        margins = planes[li] @ qn
        penalty = (np.abs(margins) * (bits != (margins >= 0))).sum(axis=1)
        best = np.argsort(penalty, kind="stable")[:LSH_NPROBE]
        probe.extend((li * (1 << LSH_NBITS) + best).tolist())
    ds = lt.read_dataset(path, columns=["vec_id", "embedding"], partitions=probe)

    def topk(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy()
        mask = ids != 0
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)[mask]
        ids = ids[mask]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        sims = en @ qn
        k = min(10, len(ids))
        top = np.argpartition(-sims, k - 1)[:k]
        return pa.table(
            {"vec_id": pa.array(ids[top], pa.int64()), "sim": pa.array(sims[top], pa.float64())}
        )

    parts = ds.map_batches(topk, batch_format="pyarrow").to_pandas()
    parts["sim"] = parts["sim"].round(8)
    out = (
        parts.drop_duplicates("vec_id")  # a hit can surface from several tables
        .sort_values(["sim", "vec_id"], ascending=[False, True])
        .head(10)
    )
    return out[["vec_id"]].reset_index(drop=True)


def q_hybrid_topk(sf_dir: str) -> pd.DataFrame:
    """hybrid keyword+vector ranking — O3 (Vector_db_querier.py:100-124):
    0.6·cosine + 0.4·keyword-hit. The keyword flag is computed distributed
    over documents and hash-JOINED onto the embeddings (no whole-corpus hits
    dict on the driver — at scale that dict is one entry per doc); only the
    tiny query vector is broadcast."""
    import pyarrow.compute as pc

    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)  # tiny — rides the task closure

    def kw_flag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "kw": pc.cast(pc.match_substring(b["text"], "vector"), pa.float64()),
            }
        )

    hits_ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        kw_flag, batch_format="pyarrow"
    )
    def sim(b: pa.Table) -> pa.Table:
        """cosine vs the query vector — reduces the list column to a scalar
        BEFORE the join (Arrow hash joins reject list payloads)."""
        ids = b["vec_id"].to_numpy()
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "sim": pa.array(en @ qn, pa.float64())}
        )

    sims_ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        sim, batch_format="pyarrow"
    )
    joined = sims_ds.join(
        hits_ds, "left_outer", num_partitions=8, on=("vec_id",), right_on=("doc_id",)
    )

    def score_topk(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy()
        if len(ids) == 0:  # schema-stable empty partial (post-join blocks)
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        kw = b["kw"].to_pandas().fillna(0.0).to_numpy(dtype=np.float64)
        score = 0.6 * b["sim"].to_numpy() + 0.4 * kw
        k = min(10, len(ids))
        top = np.argpartition(-score, k - 1)[:k]
        return pa.table(
            {"vec_id": pa.array(ids[top], pa.int64()), "score": pa.array(score[top], pa.float64())}
        )

    parts = joined.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["score", "vec_id"], ascending=[False, True]).head(10)
    return parts[["vec_id"]].reset_index(drop=True)


class _EmbedStage:
    """Actor-pool text-embedding scorer — the ST5 'model loaded once per
    actor' pattern (vector_processor.py:12): the (stand-in) encoder state
    initializes in __init__, batches stream through __call__."""

    def __init__(self, dim: int = 64):
        from ..functions.text import embed_texts

        self.embed = embed_texts
        self.dim = dim

    def __call__(self, b: pa.Table) -> pa.Table:
        vecs = self.embed(b["text"].to_pylist(), dim=self.dim)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "embedding": pa.array(list(vecs), pa.list_(pa.float32(), self.dim)),
            }
        )


def q_doc_embed_knn(sf_dir: str) -> pd.DataFrame:
    """Embed document texts with the actor-pool encoder stage, then
    brute-force cosine top-10 vs the first document's vector (M15 + O2
    composed in-engine; rows-only — the hashed encoder has no SQL analogue)."""
    from ..functions.text import embed_texts

    # query-row read is pushed down: min(doc_id) from the pruned single-column
    # read, then a parquet filter fetches just that row's text (row-group
    # pruned) — never the whole documents table driver-side
    import pyarrow.dataset as pads

    mn = pc.min(pq.read_table(_pq(sf_dir, "documents"), columns=["doc_id"])["doc_id"])
    first = pads.dataset(_pq(sf_dir, "documents")).to_table(
        columns=["text"], filter=pc.field("doc_id") == mn
    )
    q = embed_texts(first["text"].to_pylist())[0]

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _EmbedStage, batch_format="pyarrow", batch_size=512, concurrency=(1, 8)
    )

    def topk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        if len(ids) == 0:  # schema-stable empty partial
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        e = np.array(b["embedding"].to_pylist(), dtype=np.float32)
        sims = e @ q
        k = min(10, len(ids))
        top = np.argpartition(-sims, k - 1)[:k]
        return pa.table(
            {"doc_id": pa.array(ids[top], pa.int64()), "sim": pa.array(sims[top].astype(np.float64), pa.float64())}
        )

    parts = ds.map_batches(topk, batch_format="pyarrow").to_pandas()
    parts["sim"] = parts["sim"].round(6)
    out = parts.sort_values(["sim", "doc_id"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


def q_embedding_neardup_pairs(sf_dir: str) -> pd.DataFrame:
    """embedding-cosine near-dup pairs (≥ 0.4), IVF-bucketed and EXACT.

    Scale plan (no whole-matrix broadcast): rows live in the IVF index
    partitioned by coarse cell; each surviving CELL PAIR becomes one Ray
    task that reads only its two partitions (partition-pruned) and emits
    the pairs ≥ threshold. Cell pairs are pruned by a sound spherical
    bound — for u in cell i (angle ≤ r_i from centroid c_i) and v in cell
    j, angle(u,v) ≥ angle(c_i,c_j) − r_i − r_j, so
    cos_max = cos(max(0, θ_ij − r_i − r_j)); pairs of cells with
    cos_max < threshold cannot contain a qualifying pair and are skipped.
    Work stays O(n²/K) per unpruned pair but memory is two cells per task
    and nothing is broadcast."""
    import ray

    from ..sources import lance_table as lt

    THRESH = 0.4
    path, cents = _ivf_index(sf_dir)
    cref = ray.put(cents)

    # per-cell angular radius: distributed partial-min of dot(row, centroid)
    def cell_mins(b: pa.Table) -> pa.Table:
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        en = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        cs = ray.get(cref)
        dots = en @ cs.T
        bucket = np.argmax(dots, axis=1)
        own = dots[np.arange(len(bucket)), bucket]
        ub, inv = np.unique(bucket, return_inverse=True)
        mins = np.full(len(ub), np.inf)
        np.minimum.at(mins, inv, own)
        return pa.table(
            {"bucket": pa.array(ub, pa.int64()), "min_dot": pa.array(mins, pa.float64())}
        )

    stats = (
        lt.read_dataset(path, columns=["vec_id", "embedding"])
        .map_batches(cell_mins, batch_format="pyarrow")
        .to_pandas()
        .groupby("bucket")["min_dot"]
        .min()
    )
    radius = {int(b): float(np.arccos(np.clip(d, -1.0, 1.0))) for b, d in stats.items()}
    cells = sorted(radius)
    theta = np.arccos(np.clip(cents @ cents.T, -1.0, 1.0))

    @ray.remote
    def cell_pair_task(paths_a: list, paths_b: list | None) -> pa.Table:
        import pyarrow.parquet as _pq

        def load(paths):
            t = pa.concat_tables([_pq.read_table(p, columns=["vec_id", "embedding"]) for p in paths])
            ids = t["vec_id"].to_numpy()
            e = np.array(t["embedding"].to_pylist(), dtype=np.float64)
            return ids, e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)

        ia, ea = load(paths_a)
        if paths_b is None:  # intra-cell: upper triangle
            sims = ea @ ea.T
            r, c = np.where(sims >= THRESH)
            keep = r < c
            a, b_ = ia[r[keep]], ia[c[keep]]
        else:
            ib, eb = load(paths_b)
            sims = ea @ eb.T
            r, c = np.where(sims >= THRESH)
            a, b_ = ia[r], ib[c]
        lo, hi = np.minimum(a, b_), np.maximum(a, b_)
        return pa.table({"id_a": pa.array(lo, pa.int64()), "id_b": pa.array(hi, pa.int64())})

    futs = []
    for x, i in enumerate(cells):
        pi = lt.fragment_paths(path, partitions=[i])
        for j in cells[x:]:
            gap = theta[i, j] - radius[i] - radius[j]
            if np.cos(max(0.0, gap)) < THRESH - 1e-9:
                continue  # no pair across these cells can reach the threshold
            futs.append(
                cell_pair_task.remote(
                    pi, None if j == i else lt.fragment_paths(path, partitions=[j])
                )
            )
    out = pa.concat_tables(ray.get(futs)).to_pandas() if futs else pd.DataFrame(
        {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
    )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate CLUSTERS (training-data dedup unit): connected
    components over the verified jaccard≥0.8 pair graph, every doc labeled
    with the min doc_id of its component (singletons label themselves).

    Scale plan: candidate pairs come from the non-quadratic LSH pipeline
    (q_docs_jaccard_pairs); the component resolution runs as driver
    union-find over the EDGE set, which is dup-rate bounded (≪ corpus) —
    the standard shape for dedup clustering at scale. The SQL oracle
    computes the exact answer with a recursive min-label propagation."""
    edges = q_docs_jaccard_pairs(sf_dir).to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(edges["id_a"], edges["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    ids = _dim(sf_dir, "documents", columns=["doc_id"])["doc_id"].to_numpy()
    out = pd.DataFrame(
        {
            "doc_id": np.sort(ids).astype("int64"),
            "cluster_id": [find(int(i)) for i in np.sort(ids)],
        }
    )
    out["cluster_id"] = out["cluster_id"].astype("int64")
    return out


def q_revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """Multi-level ROLLUP aggregate over (nation, year): ONE distributed scan
    computes the finest-grain partials (broadcast dim join + per-batch
    combiner + one small groupby); the coarser levels — per-nation and the
    grand total — derive from the finest RESULT (|nations| × |years| rows,
    result-sized), never a re-scan or second shuffle. Rolled-up keys use
    'ALL' / -1 sentinels so the oracle's NULL representation can't diverge.
    Revenue rounds at 2 decimals (the input precision): the multi-level sums
    re-add finest partials in a different order than the oracle's row-order
    sum, and cent-exact true values keep both inside the same rounding cell
    at any scale factor."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nk = nation.column("n_nationkey").to_numpy()
    order = np.argsort(nk)
    names = nation.column("n_name").take(pa.array(order))
    pos = np.searchsorted(nk[order], cust.column("c_nationkey").to_numpy())
    dim = pa.table(
        {"o_custkey": cust["c_custkey"], "n_name": names.take(pa.array(pos, pa.int64()))}
    )
    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderdate"])
    joined = broadcast_join(ds, dim, "o_custkey", ["n_name"])

    def prep(b: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(b["o_orderdate"]), pa.int64())
        t = pa.table({"n_name": b["n_name"], "yr": yr, "o_totalprice": b["o_totalprice"]})
        return _partial(t, ["n_name", "yr"], [("o_totalprice", "sum"), ([], "count_all")])

    fine = (
        joined.map_batches(prep, batch_format="pyarrow")
        .groupby(["n_name", "yr"])
        .aggregate(
            Sum("o_totalprice_sum", alias_name="t"), Sum("count_all", alias_name="n_orders")
        )
        .to_pandas()
    )
    nat = fine.groupby("n_name", as_index=False).agg(
        t=("t", "sum"), n_orders=("n_orders", "sum")
    )
    nat["yr"] = -1
    tot = pd.DataFrame(
        {
            "n_name": ["ALL"],
            "yr": [-1],
            "t": [fine["t"].sum()],
            "n_orders": [fine["n_orders"].sum()],
        }
    )
    out = pd.concat([fine, nat, tot], ignore_index=True)
    out["revenue"] = out["t"].round(2)
    out = out.sort_values(["n_name", "yr"]).reset_index(drop=True)
    return out[["n_name", "yr", "revenue", "n_orders"]].astype(
        {"yr": "int64", "n_orders": "int64"}
    )


def q_events_rolling_avg(sf_dir: str) -> "object":
    """Moving-window aggregate: per-user rolling mean of ``value`` over the
    trailing 3 rows (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — the rolling
    window family beyond LAG (q_event_gap_stats). Same scale shape as the
    other window ops: shuffle on a fixed-count HASH BUCKET of user_id, sort
    within the bucket, ONE segmented numpy scan with shifted arrays (no
    per-user frames, no global sort — the driver compare sorts rows)."""
    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def roll_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        v = g["value"].to_numpy().astype(np.float64)
        n = len(uid)
        if n == 0:
            return pd.DataFrame(
                {"event_id": np.array([], np.int64), "avg3": np.array([], np.float64)}
            )
        s1 = np.concatenate(([False], uid[1:] == uid[:-1]))
        s2 = np.concatenate(([False, False], uid[2:] == uid[:-2]))
        v1 = np.concatenate(([0.0], v[:-1]))
        v2 = np.concatenate(([0.0, 0.0], v[:-2]))
        # accumulate oldest→newest like the window frame so the float sum
        # rounds identically to the oracle's
        tot = np.where(s2, v2, 0.0) + np.where(s1, v1, 0.0) + v
        cnt = 1 + s1.astype(np.int64) + s2.astype(np.int64)
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(), "avg3": np.round(tot / cnt, 6)}
        )

    return (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(roll_seg, batch_format="pandas")
    )


def q_parts_in_big_orders(sf_dir: str) -> pd.DataFrame:
    """EXISTS semi-join, two hops: brands of parts appearing in at least one
    lineitem of a > $450k order. Scale plan: the price predicate pushes into
    the orders READ (row-group pruning) → hash semi-join lineitem⋈keys with
    per-batch (orderkey, partkey) distinct combiners so the exchange moves
    deduplicated keys only → global distinct partkey (dim-bounded set) →
    broadcast brand lookup → per-batch count partials. Neither fact table
    ever materializes on the driver."""
    from ray.data.aggregate import Count, Sum

    from .joins import broadcast_join

    keys = _tbl(
        sf_dir,
        "orders",
        columns=["o_orderkey"],
        filter=(pc.field("o_totalprice") > 450000.0),
    )
    li = _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]).map_batches(
        lambda b: b.group_by(["l_orderkey", "l_partkey"]).aggregate([]),
        batch_format="pyarrow",
    )
    hit = li.join(keys, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",))
    parts_distinct = (
        hit.map_batches(
            lambda b: b.group_by(["l_partkey"]).aggregate([]), batch_format="pyarrow"
        )
        .groupby("l_partkey")
        .aggregate(Count(alias_name="_c"))
    )
    part_dim = _dim(sf_dir, "part", columns=["p_partkey", "p_brand"]).rename_columns(
        ["l_partkey", "p_brand"]
    )
    branded = broadcast_join(parts_distinct, part_dim, "l_partkey", ["p_brand"])
    out = (
        branded.map_batches(
            lambda b: _partial(b, ["p_brand"], [([], "count_all")]), batch_format="pyarrow"
        )
        .groupby("p_brand")
        .aggregate(Sum("count_all", alias_name="n_parts"))
        .to_pandas()
    )
    return out[["p_brand", "n_parts"]].sort_values("p_brand").reset_index(drop=True)


def q_docs_stratified_sample(sf_dir: str) -> "object":
    """Stratified (per-group allocation) deterministic sampler: ~30 docs per
    language stratum. Pass 1 computes per-lang counts (per-batch combiner →
    tiny groupby result); the per-stratum keep threshold
    floor(30·65536/n) as a 4-hex-digit string rides in the task closure;
    pass 2 hash-gates md5(text) prefixes — reproducible across runs and
    engines, no shuffle of document rows, strata sampled proportionally to
    the target regardless of skew."""
    from ray.data.aggregate import Sum

    cnt = (
        _tbl(sf_dir, "documents", columns=["lang"])
        .map_batches(
            lambda b: _partial(b, ["lang"], [([], "count_all")]), batch_format="pyarrow"
        )
        .groupby("lang")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    thr = {
        lang: "%04x" % min(65535, (30 * 65536) // int(n))
        for lang, n in zip(cnt["lang"], cnt["n"])
    }

    def gate(b: pa.Table) -> pa.Table:
        digests = hashing.md5_hex(b["text"].to_pylist())
        langs = b["lang"].to_pylist()
        keep = np.fromiter(
            (d[:4] < thr[lang] for d, lang in zip(digests, langs)),
            dtype=bool,
            count=len(digests),
        )
        return b.filter(pa.array(keep)).select(["doc_id", "lang"])

    docs = _tbl(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    return docs.map_batches(gate, batch_format="pyarrow")


# ---------------------------------- window / pivot / stats extensions --------


def q_top_orders_per_customer(sf_dir: str) -> "object":
    """top-k per group (ROW_NUMBER ≤ 3 within customer by price): the
    per-entity exemplar selector (the export sink's "best page per family"
    generalized). Scale plan: a per-batch partial top-3-per-key combiner
    bounds what crosses the shuffle (the global top-3 of a key is a subset
    of its per-batch top-3s), then the same fixed-count hash-bucket shuffle +
    ONE segmented numpy rank scan as ``q_event_rank_in_user`` — no per-key
    pandas groups, no global sort."""
    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def partial_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="stable",
        )
        df = df.groupby("o_custkey", sort=False).head(3)
        ub = (df["o_custkey"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(
            np.int32
        )
        return pa.Table.from_pandas(df.assign(ub=ub), preserve_index=False)

    def rank_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="stable",
        )
        key = g["o_custkey"].to_numpy()
        idx = np.arange(len(key), dtype=np.int64)
        new = np.concatenate(([True], key[1:] != key[:-1]))
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rn = idx - start + 1
        keep = rn <= 3
        return pd.DataFrame(
            {
                "o_custkey": key[keep],
                "o_orderkey": g["o_orderkey"].to_numpy()[keep],
                "o_totalprice": g["o_totalprice"].to_numpy()[keep],
                "rn": rn[keep],
            }
        )

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(rank_seg, batch_format="pandas")
    )


def q_revenue_running_by_nation(sf_dir: str) -> pd.DataFrame:
    """cumulative window sum (SUM OVER PARTITION BY nation ORDER BY year):
    ONE distributed scan computes the finest (nation, year) partials exactly
    as ``q_revenue_rollup``; the running sum is then a cumsum over that
    RESULT-sized frame (|nations| × |years| rows) on the driver — the
    standard two-level plan for windowed aggregates whose window key is a
    coarse grain of the data."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nk = nation.column("n_nationkey").to_numpy()
    order = np.argsort(nk)
    names = nation.column("n_name").take(pa.array(order))
    pos = np.searchsorted(nk[order], cust.column("c_nationkey").to_numpy())
    dim = pa.table(
        {"o_custkey": cust["c_custkey"], "n_name": names.take(pa.array(pos, pa.int64()))}
    )
    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderdate"])
    joined = broadcast_join(ds, dim, "o_custkey", ["n_name"])

    def prep(b: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(b["o_orderdate"]), pa.int64())
        t = pa.table({"n_name": b["n_name"], "yr": yr, "o_totalprice": b["o_totalprice"]})
        return _partial(t, ["n_name", "yr"], [("o_totalprice", "sum")])

    fine = (
        joined.map_batches(prep, batch_format="pyarrow")
        .groupby(["n_name", "yr"])
        .aggregate(Sum("o_totalprice_sum", alias_name="t"))
        .to_pandas()
        .sort_values(["n_name", "yr"])
        .reset_index(drop=True)
    )
    fine["running_revenue"] = fine.groupby("n_name", sort=False)["t"].cumsum().round(2)
    return fine[["n_name", "yr", "running_revenue"]].astype({"yr": "int64"})


def q_orders_status_pivot(sf_dir: str) -> pd.DataFrame:
    """PIVOT / conditional crosstab: orders per (priority × status) as one row
    per priority with one column per status — a single distributed scan with
    the CASE-WHEN columns materialized inside the per-batch combiner, so the
    shuffle moves |priorities| partial rows per batch and there is no second
    pass per pivot column."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus"])

    def prep(b: pa.Table) -> pa.Table:
        st = b["o_orderstatus"]
        t = pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_open": pc.cast(pc.equal(st, "O"), pa.int64()),
                "n_fulfilled": pc.cast(pc.equal(st, "F"), pa.int64()),
                "n_pending": pc.cast(pc.equal(st, "P"), pa.int64()),
            }
        )
        return _partial(
            t,
            ["o_orderpriority"],
            [("n_open", "sum"), ("n_fulfilled", "sum"), ("n_pending", "sum"), ([], "count_all")],
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_open_sum", alias_name="n_open"),
            Sum("n_fulfilled_sum", alias_name="n_fulfilled"),
            Sum("n_pending_sum", alias_name="n_pending"),
            Sum("count_all", alias_name="n_total"),
        )
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    return out[["o_orderpriority", "n_open", "n_fulfilled", "n_pending", "n_total"]]


def q_price_quantity_stats(sf_dir: str) -> pd.DataFrame:
    """distributed statistical moments per group: stddev_samp + Pearson corr of
    (quantity, price) per returnflag. Two passes for numerical stability —
    pass 1 gets exact n/Σ per flag (means), pass 2 sums CENTERED second
    moments (x−μ)², (y−ν)², (x−μ)(y−ν) inside ``map_batches`` with the means
    broadcast in the closure (result-sized). Raw-moment single-pass
    (Σx²−(Σx)²/n) would cancel catastrophically at 100 TB row counts; the
    centered two-pass matches the oracle's stable one-pass to ~1e-12
    relative."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def pass1(b: pa.Table) -> pa.Table:
        return _partial(
            b,
            ["l_returnflag"],
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ([], "count_all")],
        )

    first = (
        ds.map_batches(pass1, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("l_quantity_sum", alias_name="sx"),
            Sum("l_extendedprice_sum", alias_name="sy"),
            Sum("count_all", alias_name="n"),
        )
        .to_pandas()
    )
    mu = {
        r["l_returnflag"]: (r["sx"] / r["n"], r["sy"] / r["n"], int(r["n"]))
        for _, r in first.iterrows()
    }

    def pass2(b: pa.Table) -> pa.Table:
        flags = b["l_returnflag"].to_numpy(zero_copy_only=False)
        x = b["l_quantity"].to_numpy()
        y = b["l_extendedprice"].to_numpy()
        mx = np.empty(len(flags))
        my = np.empty(len(flags))
        for f, (fx, fy, _) in mu.items():
            sel = flags == f
            mx[sel] = fx
            my[sel] = fy
        dx = x - mx
        dy = y - my
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "sxx": pa.array(dx * dx),
                "syy": pa.array(dy * dy),
                "sxy": pa.array(dx * dy),
            }
        )
        return _partial(
            t, ["l_returnflag"], [("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")]
        )

    second = (
        ds.map_batches(pass2, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("sxx_sum", alias_name="sxx"),
            Sum("syy_sum", alias_name="syy"),
            Sum("sxy_sum", alias_name="sxy"),
        )
        .to_pandas()
        .set_index("l_returnflag")
    )
    rows = []
    for f, (fx, fy, n) in sorted(mu.items()):
        sxx, syy, sxy = (second.loc[f, c] for c in ("sxx", "syy", "sxy"))
        # STDDEV_SAMP / CORR are NULL for n<2 or zero variance — mirror
        # that instead of emitting inf/nan on degenerate groups (same
        # guard family as q_events_zscore_outliers, ADVICE r3)
        std = float(np.sqrt(syy / (n - 1))) if n >= 2 else None
        corr = (
            float(sxy / np.sqrt(sxx * syy)) if n >= 2 and sxx > 0 and syy > 0 else None
        )
        rows.append(
            {
                "l_returnflag": f,
                "n": n,
                "avg_qty": round(fx, 6),
                "std_price": round(std, 6) if std is not None else None,
                "corr_qty_price": round(corr, 6) if corr is not None else None,
            }
        )
    return pd.DataFrame(rows).astype({"n": "int64"})


def q_revenue_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(returnflag, linestatus): all four grouping sets from ONE
    distributed scan — the finest grain aggregates through the per-batch
    combiner + small groupby, and the three coarser sets (per-flag, per-status,
    grand total) derive from the finest RESULT (|flags| × |statuses| rows).
    'ALL' sentinels stand in for the rolled-up NULLs (same convention as
    ``q_revenue_rollup``)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return _partial(
            b,
            ["l_returnflag", "l_linestatus"],
            [("l_extendedprice", "sum"), ([], "count_all")],
        )

    fine = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_extendedprice_sum", alias_name="t"), Sum("count_all", alias_name="n")
        )
        .to_pandas()
    )
    by_flag = fine.groupby("l_returnflag", as_index=False).agg(t=("t", "sum"), n=("n", "sum"))
    by_flag["l_linestatus"] = "ALL"
    by_status = fine.groupby("l_linestatus", as_index=False).agg(t=("t", "sum"), n=("n", "sum"))
    by_status["l_returnflag"] = "ALL"
    total = pd.DataFrame(
        {"l_returnflag": ["ALL"], "l_linestatus": ["ALL"], "t": [fine["t"].sum()], "n": [fine["n"].sum()]}
    )
    out = pd.concat([fine, by_flag, by_status, total], ignore_index=True)
    out["revenue"] = out["t"].round(2)
    out = out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    return out[["l_returnflag", "l_linestatus", "revenue", "n"]].astype({"n": "int64"})


def q_nations_by_region(sf_dir: str) -> pd.DataFrame:
    """STRING_AGG / LISTAGG per group: ordered name concatenation per region.
    Collect-type aggregates can't pre-combine into scalars; the scale shape is
    a per-batch (key → sorted name list) partial, a groupby on the key moving
    only those lists, and the order-correct merge at the end — here expressed
    over the dimension tables it targets (regions are bounded; the VALUE is
    bounded per key, which is what makes LISTAGG legal at scale at all)."""
    nation = _tbl(sf_dir, "nation", columns=["n_regionkey", "n_name"])
    region = _dim(sf_dir, "region", columns=["r_regionkey", "r_name"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        names = sorted(g["n_name"].tolist())
        return pd.DataFrame(
            {
                "n_regionkey": [int(g["n_regionkey"].iloc[0])],
                "nations": [",".join(names)],
                "n_nations": [len(names)],
            }
        )

    out = nation.groupby("n_regionkey").map_groups(agg, batch_format="pandas").to_pandas()
    rmap = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    out["r_name"] = out["n_regionkey"].map(rmap)
    out = out.sort_values("r_name").reset_index(drop=True)
    return out[["r_name", "nations", "n_nations"]].astype({"n_nations": "int64"})


def q_user_click_purchase(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER JOIN: per-user click counts ⟗ per-user purchase counts —
    users that only click, only purchase, or do both all appear, with zero
    counts where a side is missing. Both sides are fact-scale aggregates
    (per-block partial combiner → small per-key groupby) joined with the
    hash-partitioned distributed full-outer join; nothing is materialized
    driver-side until the per-user result."""
    from ray.data.aggregate import Sum

    def per_user(event_type: str, alias: str):
        return (
            _tbl(
                sf_dir,
                "events",
                columns=["user_id"],
                filter=(pc.field("event_type") == event_type),
            )
            .map_batches(
                lambda b: b.group_by(["user_id"]).aggregate([([], "count_all")]),
                batch_format="pyarrow",
            )
            .groupby("user_id")
            .aggregate(Sum("count_all", alias_name=alias))
        )

    clicks = per_user("click", "n_clicks")
    purchases = per_user("purchase", "n_purchases")
    joined = clicks.join(
        purchases,
        "full_outer",
        num_partitions=8,
        on=("user_id",),
        right_on=("user_id",),
        left_suffix="_l",
        right_suffix="_r",
    )

    def finish(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in b.column_names}
        uid_l = cols.get("user_id_l", cols.get("user_id"))
        uid_r = cols.get("user_id_r")
        uid = uid_l if uid_r is None else pc.coalesce(uid_l, uid_r)
        return pa.table(
            {
                "user_id": pc.cast(uid, pa.int64()),
                "n_clicks": pc.coalesce(cols["n_clicks"], pa.scalar(0, pa.int64())),
                "n_purchases": pc.coalesce(cols["n_purchases"], pa.scalar(0, pa.int64())),
            }
        )

    out = joined.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_embedding_norm_stats(sf_dir: str) -> pd.DataFrame:
    """vector-column aggregate: per-label mean/max L2 norm over the embedding
    list column — the schema-level proof that `list<float>` flows through the
    zero-copy Arrow path (FixedSizeList → one contiguous numpy matrix per
    batch, one BLAS reduction, no per-row Python). Partial (sum, max, n) per
    label per batch; only those scalars cross the shuffle."""
    from ray.data.aggregate import Max, Sum

    ds = _tbl(sf_dir, "embeddings", columns=["label", "embedding"])

    def norms(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        arr = emb.combine_chunks() if hasattr(emb, "combine_chunks") else emb
        flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(len(b), -1)
        nrm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        t = pa.table(
            {"label": b["label"], "nrm": pa.array(nrm), "mx": pa.array(nrm)}
        )
        return _partial(t, ["label"], [("nrm", "sum"), ("mx", "max"), ([], "count_all")])

    out = (
        ds.map_batches(norms, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            Sum("nrm_sum", alias_name="s"),
            Max("mx_max", alias_name="m"),
            Sum("count_all", alias_name="n"),
        )
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    out["avg_norm"] = (out["s"] / out["n"]).round(6)
    out["max_norm"] = out["m"].round(6)
    return out[["label", "n", "avg_norm", "max_norm"]].astype({"label": "int32", "n": "int64"})


def q_embedding_clusters(sf_dir: str) -> pd.DataFrame:
    """k-means clustering as a first-class result: per-cluster size and mean
    within-cluster cosine similarity from the distributed spherical-Lloyd
    index (`_ivf_index` — per-block partial means, K×B driver combine,
    bucket-partitioned assignment table). The summary pass re-reads ONLY the
    partitioned assignment table and reduces (count, Σcos) per bucket inside
    map_batches; deterministic (hash-seeded centroids), golden-pinned."""
    from ray.data.aggregate import Sum

    from ..sources import lance_table as lt

    path, cents = _ivf_index(sf_dir)

    def stats(b: pa.Table) -> pa.Table:
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        en = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        bk = b["bucket"].to_numpy().astype(np.int64)
        cos = np.einsum("ij,ij->i", en, cents[bk])
        t = pa.table({"cluster_id": pa.array(bk), "cos": pa.array(cos)})
        return _partial(t, ["cluster_id"], [("cos", "sum"), ([], "count_all")])

    out = (
        lt.read_dataset(path, columns=["embedding", "bucket"])
        .map_batches(stats, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Sum("cos_sum", alias_name="s"), Sum("count_all", alias_name="n"))
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    out["avg_cos_to_centroid"] = (out["s"] / out["n"]).round(6)
    return out[["cluster_id", "n", "avg_cos_to_centroid"]].astype(
        {"cluster_id": "int64", "n": "int64"}
    )


def q_approx_distinct_hll(sf_dir: str) -> pd.DataFrame:
    """approximate COUNT DISTINCT via a mergeable HyperLogLog sketch — the
    scale substitute for ``q_distinct_counts``: each batch folds into a 4 KiB
    register blob inside ``map_batches``, the shuffle moves ONE blob per
    (event_type, batch) instead of every distinct value, and the merge is an
    elementwise max (associative + idempotent ⇒ safe under task retries).
    Deterministic for the fixed seed (golden-pinned); accuracy ±~1.6 % at
    4096 registers, gated by a tolerance test against the exact distinct."""
    from ..state import sketches

    ds = _tbl(sf_dir, "events", columns=["event_type", "user_id"])

    def fold(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        rows = [("__ALL__", sketches.registers(df["user_id"].to_numpy()).tobytes())]
        for et, g in df.groupby("event_type", sort=False):
            rows.append((str(et), sketches.registers(g["user_id"].to_numpy()).tobytes()))
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "regs": pa.array([r[1] for r in rows], pa.binary()),
            }
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        merged = sketches.merge(list(g["regs"]))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users_approx": [sketches.estimate(merged)],
            }
        )

    out = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(reduce, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return out.astype({"n_users_approx": "int64"})


def q_doc_regex_terms(sf_dir: str) -> pd.DataFrame:
    """regex token extraction + frequency (the extract/filter family): tokens
    with an interior 'a' (``[a-z]+a[a-z]+``) from the first 100 docs, top-15
    by count. The doc_id predicate pushes into the parquet read; extraction
    and the partial count run vectorized in polars (explode + Rust regex)
    inside ``map_batches``; only per-token partials cross the shuffle, and
    the top-15 merge is driver-side on the result."""
    from ray.data.aggregate import Sum

    ds = _tbl(
        sf_dir, "documents", columns=["doc_id", "text"], filter=(pc.field("doc_id") < 100)
    )

    def extract(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({"text": b["text"].to_pylist()})
        toks = (
            df.select(pl.col("text").str.split(" ").alias("token"))
            .explode("token")
            .filter(pl.col("token").str.contains(r"^[a-z]+a[a-z]+$"))
        )
        counts = toks.group_by("token").len(name="n")
        return pa.table(
            {
                "token": pa.array(counts["token"].to_list(), pa.string()),
                "n": pa.array(counts["n"].to_list(), pa.int64()),
            }
        )

    out = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True])
        .head(15)
        .reset_index(drop=True)
    )
    return out[["token", "n"]]


def q_group_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-GROUP median (quantile_disc 0.5 of o_totalprice per
    o_orderpriority) without a global sort — the grouped variant of
    :func:`q_price_quantiles`, vectorized ACROSS groups: one scan computes
    per-group (count, min, max) partials; one scan bins every row into 4096
    equi-width bins OF ITS OWN GROUP (per-batch (group, bin) partials, so
    the shuffle moves ≤ groups×4096 partial rows per block); the driver
    walks each group's cumulative histogram to the median bin; one final
    scan pulls only median-bin members (≤ bin cap per group) and indexes
    the local rank. At 100 TB: 3 streaming scans + a bounded pull per
    group, vs a full shuffle for sort-within-group."""
    from ray.data.aggregate import Max, Min, Sum

    gcol, vcol = "o_orderpriority", "o_totalprice"
    ds = _tbl(sf_dir, "orders", columns=[gcol, vcol])
    stats = (
        ds.map_batches(
            lambda b: _partial(b, [gcol], [(vcol, "min"), (vcol, "max"), ([], "count_all")]),
            batch_format="pyarrow",
        )
        .groupby(gcol)
        .aggregate(
            Min(f"{vcol}_min", alias_name="lo"),
            Max(f"{vcol}_max", alias_name="hi"),
            Sum("count_all", alias_name="n"),
        )
        .to_pandas()
        .sort_values(gcol)
        .reset_index(drop=True)
    )
    NBINS = 4096
    groups = stats[gcol].tolist()
    gidx = {g: i for i, g in enumerate(groups)}
    lo = stats["lo"].to_numpy(dtype=np.float64)
    hi = stats["hi"].to_numpy(dtype=np.float64)
    rank = ((stats["n"].to_numpy() - 1) * 0.5).astype(np.int64)  # floor((n-1)·q)
    width = np.maximum(hi - lo, 1e-300)

    def hist(b: pa.Table, _gidx=dict(gidx), _lo=lo, _w=width) -> pa.Table:
        g = np.array([_gidx[x] for x in b[gcol].to_pylist()], dtype=np.int64)
        v = b[vcol].to_numpy(zero_copy_only=False).astype(np.float64)
        bins = np.clip(((v - _lo[g]) / _w[g] * NBINS).astype(np.int64), 0, NBINS - 1)
        key = g * NBINS + bins
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uk), "cnt": pa.array(cnt.astype(np.int64))})

    h = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()
        .sort_values("key")
    )
    hk = h["key"].to_numpy()
    hn = h["n"].to_numpy()
    med_bin = np.empty(len(groups), dtype=np.int64)
    local_rank = np.empty(len(groups), dtype=np.int64)
    for i in range(len(groups)):
        m = (hk >= i * NBINS) & (hk < (i + 1) * NBINS)
        cum = np.cumsum(hn[m])
        pos = int(np.searchsorted(cum, rank[i] + 1))
        med_bin[i] = hk[m][pos] - i * NBINS
        local_rank[i] = rank[i] - (int(cum[pos - 1]) if pos else 0)

    def pull(b: pa.Table, _gidx=dict(gidx), _lo=lo, _w=width, _mb=med_bin) -> pa.Table:
        g = np.array([_gidx[x] for x in b[gcol].to_pylist()], dtype=np.int64)
        v = b[vcol].to_numpy(zero_copy_only=False).astype(np.float64)
        bins = np.clip(((v - _lo[g]) / _w[g] * NBINS).astype(np.int64), 0, NBINS - 1)
        keep = bins == _mb[g]
        return pa.table({"g": pa.array(g[keep]), "v": pa.array(v[keep])})

    vals = ds.map_batches(pull, batch_format="pyarrow").to_pandas()
    med = np.empty(len(groups), dtype=np.float64)
    for i in range(len(groups)):
        vv = np.sort(vals[vals["g"] == i]["v"].to_numpy())
        med[i] = vv[local_rank[i]]
    return pd.DataFrame({gcol: groups, "median_price": np.round(med, 2)})


def q_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Top-20 tokens by TOTAL occurrence via a mergeable Misra-Gries
    (space-saving) sketch + exact recount — the scale shape for heavy
    hitters over a vocabulary too large to shuffle: each batch emits a
    capacity-512 MG summary (vs its full token histogram), the driver
    merges summaries and decrements to a 4096-entry candidate set
    (guaranteed to contain every token with true count > N/4096 — far
    below any top-20 boundary on a zipfian corpus), and one second scan
    exactly recounts ONLY the candidates (set rides in the task closure),
    making the final top-k EXACT — which is why this sketch query can
    carry a plain SQL oracle, unlike the HLL estimate."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["text"])
    CAP_BATCH, CAP_MERGE = 512, 4096

    def mg(b: pa.Table) -> pa.Table:
        import polars as pl

        counts = (
            pl.DataFrame({"token": pl.from_arrow(b["text"]).str.split(" ")})
            .explode("token")
            .group_by("token")
            .len("n")
            .sort(["n", "token"], descending=[True, False])
        )
        # Misra-Gries: keep top CAP_BATCH, subtract the (CAP_BATCH+1)-th
        # count from the survivors (the classic decrement, batched)
        if counts.height > CAP_BATCH:
            cut = int(counts["n"][CAP_BATCH])
            counts = counts.head(CAP_BATCH).with_columns((pl.col("n") - cut).alias("n"))
            counts = counts.filter(pl.col("n") > 0)
        return pa.table(
            {
                "token": pa.array(counts["token"].to_list(), pa.string()),
                "n": pa.array(counts["n"].to_list(), pa.int64()),
            }
        )

    merged = (
        ds.map_batches(mg, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
    )
    cand = set(merged.head(CAP_MERGE)["token"].tolist())

    def recount(b: pa.Table, _cand=frozenset(cand)) -> pa.Table:
        import polars as pl

        counts = (
            pl.DataFrame({"token": pl.from_arrow(b["text"]).str.split(" ")})
            .explode("token")
            .filter(pl.col("token").is_in(list(_cand)))
            .group_by("token")
            .len("n")
        )
        return pa.table(
            {
                "token": pa.array(counts["token"].to_list(), pa.string()),
                "n": pa.array(counts["n"].to_list(), pa.int64()),
            }
        )

    out = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
        .head(20)
        .reset_index(drop=True)
    )
    return out[["token", "n"]]


def q_bloom_semi_join(sf_dir: str) -> pd.DataFrame:
    """Semi-join via broadcast BLOOM prefilter + exact fixup join: revenue
    per returnflag of lineitems belonging to > $400k orders. The build side
    (filtered order keys) folds into a bit-array bloom (16 bits/key, k=4 —
    ~0.2 % FP) shipped ONCE via ray.put; every lineitem batch probes the
    bloom vectorized and drops ~all non-members WITHOUT any shuffle; only
    the surviving sliver joins (hash, exact) against the key set, so false
    positives cannot reach the result — the exchange moves the semi-join's
    selectivity, not the fact table. This is the standard 100 TB shape when
    the build side is too big to broadcast exactly but its bloom is not."""
    import ray as _ray
    from ray.data.aggregate import Sum

    keys_t = _dim(sf_dir, "orders", columns=["o_orderkey"])  # pushdown filter below
    ok = pq.read_table(
        _pq(sf_dir, "orders"), columns=["o_orderkey"], filters=[("o_totalprice", ">", 400000.0)]
    )["o_orderkey"].to_numpy()
    del keys_t
    m = max(1 << 14, 1 << int(np.ceil(np.log2(len(ok) * 16 + 1))))

    def _hash(v: np.ndarray, seed: np.uint64) -> np.ndarray:
        x = v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ seed
        x ^= x >> np.uint64(29)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(32)
        return x

    bits = np.zeros(m // 64, dtype=np.uint64)
    seeds = [np.uint64(s) for s in (0x1234, 0xBEEF, 0xCAFE, 0xF00D)]
    for s in seeds:
        h = _hash(ok, s) % np.uint64(m)
        np.bitwise_or.at(bits, (h >> np.uint64(6)).astype(np.int64), np.uint64(1) << (h & np.uint64(63)))
    bloom_ref = _ray.put(bits)

    def probe(b: pa.Table, _m=m, _seeds=tuple(seeds), _ref=bloom_ref) -> pa.Table:
        bb = _ray.get(_ref)  # zero-copy plasma read, once per task
        v = b["l_orderkey"].to_numpy().astype(np.int64)
        hit = np.ones(len(v), dtype=bool)
        for s in _seeds:
            h = _hash(v, s) % np.uint64(_m)
            hit &= (bb[(h >> np.uint64(6)).astype(np.int64)] >> (h & np.uint64(63))) & np.uint64(1) > 0
        return b.filter(pa.array(hit))

    li = _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_extendedprice"])
    keys_ds = _tbl(
        sf_dir,
        "orders",
        columns=["o_orderkey"],
        filter=(pc.field("o_totalprice") > 400000.0),
    )
    hit = li.map_batches(probe, batch_format="pyarrow").join(
        keys_ds, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    out = (
        hit.map_batches(
            lambda b: _partial(
                b.select(["l_returnflag", "l_extendedprice"]),
                ["l_returnflag"],
                [("l_extendedprice", "sum"), ([], "count_all")],
            ),
            batch_format="pyarrow",
        )
        .groupby("l_returnflag")
        .aggregate(
            Sum("l_extendedprice_sum", alias_name="revenue"),
            Sum("count_all", alias_name="n"),
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    out["revenue"] = out["revenue"].round(2)
    return out[["l_returnflag", "revenue", "n"]]


# ----------------------- training-data curation: redact / chunk / decontam ---


def q_doc_redacted(sf_dir: str) -> pd.DataFrame:
    """Policy-driven pattern redaction (the PII-scrub shape of a training-data
    pipeline: regex → placeholder, e.g. emails/SSNs; the synthetic corpus has
    no digits so the policy here scrubs a term list). Per-lang: docs touched,
    total matches, and an ORDER-INDEPENDENT mergeable checksum of the redacted
    text (sum of md5-prefix per doc) — checksum instead of concatenation so
    the reduction stays a partial-agg + tiny groupby, never a per-lang gather
    of the corpus. Vectorized via polars count_matches/replace_all."""
    from ray.data.aggregate import Sum

    pat = r"\b(key|hash|value)\b"
    ds = _tbl(sf_dir, "documents", columns=["lang", "text"])

    def f(b: pa.Table) -> pa.Table:
        import hashlib

        import polars as pl

        s = pl.from_arrow(b["text"])
        n_hits = s.str.count_matches(pat).cast(pl.Int64).to_numpy()
        red = s.str.replace_all(pat, "<SECRET>")
        check = np.fromiter(
            (int(hashlib.md5(x.encode()).hexdigest()[:12], 16) for x in red),
            dtype=np.int64,
            count=len(red),
        )
        t = pa.table(
            {
                "lang": b["lang"],
                "one": pa.array(np.ones(len(red), np.int64)),
                "hit": pa.array((n_hits > 0).astype(np.int64)),
                "n_hits": pa.array(n_hits),
                "check": pa.array(check),
            }
        )
        return _partial(
            t,
            ["lang"],
            [("one", "sum"), ("hit", "sum"), ("n_hits", "sum"), ("check", "sum")],
        )

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("one_sum", alias_name="n_docs"),
            Sum("hit_sum", alias_name="n_docs_hit"),
            Sum("n_hits_sum", alias_name="n_hits"),
            Sum("check_sum", alias_name="redacted_check"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out[["lang", "n_docs", "n_docs_hit", "n_hits", "redacted_check"]]


def q_doc_chunks(sf_dir: str) -> "object":
    """Training-window chunking: split each doc's token stream into windows of
    64 tokens at stride 48 (16-token overlap) → one row per chunk. The
    sequence-packing prep step of an LLM data pipeline. Stateless flat-map, no
    shuffle; chunk emission is numpy offset arithmetic over the batch's flat
    token array (np.repeat / reduceat shapes), not a per-doc Python loop."""
    W, S = 64, 48
    ds = _tbl(
        sf_dir,
        "documents",
        columns=["doc_id", "text"],
        filter=(pc.field("doc_id") < 100),
    )

    def f(b: pa.Table) -> pa.Table:
        import polars as pl

        toks = pl.from_arrow(b["text"]).str.split(" ")
        lens = toks.list.len().cast(pl.Int64).to_numpy()
        flat = toks.explode().to_numpy()  # all tokens, batch-flat
        doc_off = np.concatenate(([0], np.cumsum(lens)))
        doc_ids = b["doc_id"].to_numpy()
        n_chunks = (lens + S - 1) // S  # DuckDB generate_series(1, len, 48)
        rep_doc = np.repeat(np.arange(len(lens)), n_chunks)
        # chunk_idx within doc: global arange minus each doc's first position
        first = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
        cidx = np.arange(rep_doc.size) - first[rep_doc]
        start = cidx * S  # token offset of chunk within doc
        n_tok = np.minimum(W, lens[rep_doc] - start)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[rep_doc], pa.int64()),
                "chunk_idx": pa.array(cidx, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "first_token": pa.array(flat[doc_off[rep_doc] + start], pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q_decontaminate_docs(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any 8-gram with a
    held-out benchmark set (docs 0-4) — the standard eval-leak scrub of an LLM
    data pipeline. The benchmark's 8-grams broadcast ONCE (ray.put, tiny by
    definition); each batch tokenizes, integer-codes its vocab (np.unique),
    maps benchmark tokens through the same coding (absent token ⇒ gram can't
    match), and tests all sliding windows at once via a packed void-view
    np.isin — exact string-gram membership, zero per-row Python, no shuffle.
    Per-lang partial counts reduce through a tiny groupby."""
    import ray as _ray
    from ray.data.aggregate import Sum

    N = 8
    bench_t = pq.read_table(
        _pq(sf_dir, "documents"), columns=["text"], filters=[("doc_id", "<", 5)]
    )
    bench_grams = set()
    for txt in bench_t["text"].to_pylist():
        tk = txt.split(" ")
        for i in range(max(0, len(tk) - N + 1)):
            bench_grams.add(tuple(tk[i : i + N]))
    bench_ref = _ray.put(sorted(bench_grams))

    def f(b: pa.Table, _ref=bench_ref) -> pa.Table:
        import polars as pl

        bench = _ray.get(_ref)  # zero-copy-ish plasma read, once per task
        toks = pl.from_arrow(b["text"]).str.split(" ")
        lens = toks.list.len().cast(pl.Int64).to_numpy()
        flat = toks.explode().to_numpy().astype(object)
        vocab, codes = np.unique(flat.astype(str), return_inverse=True)
        codes = codes.astype(np.int32)
        # benchmark grams → batch-local codes; grams with unseen tokens drop
        bt = np.asarray([t for g in bench for t in g], dtype=str)
        pos = np.searchsorted(vocab, bt)
        pos_ok = (pos < len(vocab)) & (vocab[np.minimum(pos, len(vocab) - 1)] == bt)
        bcodes = np.where(pos_ok, pos, -1).astype(np.int32).reshape(-1, N)
        bcodes = bcodes[(bcodes >= 0).all(axis=1)]
        doc_off = np.concatenate(([0], np.cumsum(lens)))
        hits_per_doc = np.zeros(len(lens), dtype=np.int64)
        if len(bcodes) and len(codes) >= N:
            win = np.lib.stride_tricks.sliding_window_view(codes, N)
            vv = np.ascontiguousarray(win).view(f"V{4 * N}").ravel()
            bv = np.ascontiguousarray(bcodes).view(f"V{4 * N}").ravel()
            hit = np.isin(vv, bv)
            # windows crossing doc boundaries are invalid: keep only windows
            # starting in [doc_off[d], doc_off[d] + max(len-7, 0))
            n_valid = np.maximum(lens - (N - 1), 0)
            starts = doc_off[:-1]
            valid = np.zeros(len(vv) + 1, dtype=np.int64)
            np.add.at(valid, np.minimum(starts, len(vv)), 1)
            np.add.at(valid, np.minimum(starts + n_valid, len(vv)), -1)
            in_doc = np.cumsum(valid[:-1]) > 0
            hit &= in_doc
            seg = np.minimum(starts, max(len(vv) - 1, 0))
            hits_per_doc = np.add.reduceat(hit.astype(np.int64), seg)
            hits_per_doc[n_valid == 0] = 0
        mask = b["doc_id"].to_numpy() >= 5
        t = pa.table(
            {
                "lang": b["lang"].filter(pa.array(mask)),
                "one": pa.array(np.ones(int(mask.sum()), np.int64)),
                "contam": pa.array((hits_per_doc[mask] > 0).astype(np.int64)),
                "w": pa.array(hits_per_doc[mask]),
            }
        )
        return _partial(t, ["lang"], [("one", "sum"), ("contam", "sum"), ("w", "sum")])

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("one_sum", alias_name="n_docs"),
            Sum("contam_sum", alias_name="n_contaminated"),
            Sum("w_sum", alias_name="n_hit_windows"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out[["lang", "n_docs", "n_contaminated", "n_hit_windows"]]


# --------------------- batch-2 extensions: skyline / mode / entropy / hhi ----


def q_skyline_orders(sf_dir: str) -> pd.DataFrame:
    """Pareto skyline of orders (maximize o_totalprice, minimize o_orderdate):
    an order is on the frontier iff no other order has strictly better one
    dimension and at-least-as-good the other. Distributed shape: each block
    computes its LOCAL skyline vectorized (sort by price desc + prefix-min of
    date over strictly-higher price classes — O(n log n), no pairwise loop);
    the global skyline of the union of local skylines equals the global
    skyline (dominance is transitive), so the driver merges only
    frontier-sized partials."""

    def _local_skyline(price: np.ndarray, date: np.ndarray) -> np.ndarray:
        """boolean keep-mask; dominated iff minDate(price' > price) <= date
        OR minDate(price' == price) < date."""
        order = np.lexsort((date, -price))
        ps, ds_ = price[order], date[order]
        new_grp = np.concatenate(([True], ps[1:] != ps[:-1]))
        grp_id = np.cumsum(new_grp) - 1
        grp_start = np.flatnonzero(new_grp)
        grp_min = ds_[grp_start]  # date asc within a price class
        prev_min = np.concatenate(
            ([np.iinfo(np.int64).max], np.minimum.accumulate(grp_min)[:-1])
        )
        dominated = (prev_min[grp_id] <= ds_) | (grp_min[grp_id] < ds_)
        keep = np.zeros(len(price), dtype=bool)
        keep[order] = ~dominated
        return keep

    ds = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def f(b: pa.Table) -> pa.Table:
        keep = _local_skyline(
            b["o_totalprice"].to_numpy(), b["o_orderdate"].to_numpy().astype(np.int64)
        )
        return b.filter(pa.array(keep))

    part = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    keep = _local_skyline(
        part["o_totalprice"].to_numpy(),
        part["o_orderdate"].to_numpy().astype(np.int64),
    )
    out = part[keep].sort_values("o_totalprice", ascending=False).reset_index(drop=True)
    return out[["o_orderkey", "o_totalprice", "o_orderdate"]]


def q_user_top_event(sf_dir: str) -> "object":
    """mode per group: each user's most frequent event type (count desc,
    event_type asc tiebreak). Partial (user,type) counts inside map_batches →
    groupby sum → bucket-by-user-hash shuffle → ONE segmented argmax scan per
    bucket (sort + first-per-user), not a pandas frame per user."""
    from ray.data.aggregate import Sum

    ds = _tbl(
        sf_dir,
        "events",
        columns=["user_id", "event_type"],
        filter=(pc.field("user_id") < 100),
    )

    counts = (
        ds.map_batches(
            lambda b: _partial(b, ["user_id", "event_type"], [([], "count_all")]),
            batch_format="pyarrow",
        )
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("count_all", alias_name="n"))
    )

    def top_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "n", "event_type"], ascending=[True, False, True])
        first = np.concatenate(
            ([True], g["user_id"].to_numpy()[1:] != g["user_id"].to_numpy()[:-1])
        )
        return g[first][["user_id", "event_type", "n"]]

    return (
        counts.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(top_seg, batch_format="pandas")
    )


def q_events_entropy_by_day(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy (base 2) of the event-type mix per day — drift
    monitoring over a stream. Distributed (day,type) partial counts; the
    entropy itself is computed on the tiny counts table (days × types)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["ts", "event_type"])

    def f(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["ts"], format="%Y-%m-%d")
        t = pa.table({"day": day, "event_type": b["event_type"]})
        return _partial(t, ["day", "event_type"], [([], "count_all")])

    counts = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    total = counts.groupby("day")["n"].transform("sum")
    p = counts["n"] / total
    counts["h_term"] = -p * np.log2(p)
    out = (
        counts.groupby("day")
        .agg(h=("h_term", "sum"), n=("n", "sum"))
        .reset_index()
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["h"] = out["h"].round(6)
    return out[["day", "h", "n"]]


def q_argmax_events(sf_dir: str) -> pd.DataFrame:
    """arg_max per group: for each event type, the max value and the smallest
    event_id attaining it. Per-batch partial (type, max, argmin-id-at-max)
    rows; merge is a tiny per-type reduction — exact because no arithmetic
    touches the compared doubles."""
    ds = _tbl(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def f(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        mx = df.groupby("event_type")["value"].transform("max")
        at = df[df["value"] == mx]
        out = (
            at.groupby("event_type")
            .agg(max_value=("value", "max"), argmax_event_id=("event_id", "min"))
            .reset_index()
        )
        return out

    parts = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    mx = parts.groupby("event_type")["max_value"].transform("max")
    at = parts[parts["max_value"] == mx]
    out = (
        at.groupby("event_type")
        .agg(max_value=("max_value", "max"), argmax_event_id=("argmax_event_id", "min"))
        .reset_index()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return out[["event_type", "max_value", "argmax_event_id"]]


def q_revenue_hhi(sf_dir: str) -> pd.DataFrame:
    """Market-concentration (Herfindahl) of customer revenue within each
    nation: HHI = Σ(share²) over a nation's customers. Two-level aggregate:
    per-customer revenue (partial agg + groupby on the fact), then broadcast
    cust→nation dim and reduce Σrev, Σrev² per nation — the division happens
    on nation-count-sized rows only."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nk = nation.column("n_nationkey").to_numpy()
    order = np.argsort(nk)
    names = nation.column("n_name").take(pa.array(order))
    pos = np.searchsorted(nk[order], cust.column("c_nationkey").to_numpy())
    dim = pa.table(
        {"o_custkey": cust["c_custkey"], "n_name": names.take(pa.array(pos, pa.int64()))}
    )

    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust_rev = (
        ds.map_batches(
            lambda b: _partial(b, ["o_custkey"], [("o_totalprice", "sum")]),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("o_totalprice_sum", alias_name="rev"))
    )
    joined = broadcast_join(cust_rev, dim, "o_custkey", ["n_name"])

    def f(b: pa.Table) -> pa.Table:
        rev = b["rev"].to_numpy()
        t = pa.table(
            {
                "n_name": b["n_name"],
                "rev": b["rev"],
                "rev_sq": pa.array(rev * rev, pa.float64()),
                "one": pa.array(np.ones(len(rev), np.int64)),
            }
        )
        return _partial(
            t, ["n_name"], [("rev", "sum"), ("rev_sq", "sum"), ("one", "sum")]
        )

    out = (
        joined.map_batches(f, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("rev_sum", alias_name="t"),
            Sum("rev_sq_sum", alias_name="sq"),
            Sum("one_sum", alias_name="n_customers"),
        )
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    out["total_rev"] = out["t"].round(2)
    out["hhi"] = (out["sq"] / (out["t"] * out["t"])).round(6)
    return out[["n_name", "n_customers", "total_rev", "hhi"]]


# -------------------- batch-3: packing / global-rank ntile / tf-idf ----------


def q_token_packing(sf_dir: str) -> "object":
    """Concat-and-split sequence packing (the GPT-style training layout): all
    docs' tokens concatenated in doc_id order, cut into fixed 512-token
    windows → per-window doc count + first doc. Needs a GLOBAL prefix sum
    over doc order — done as the standard distributed two-pass scan: (1) one
    pass computes per-doc token counts and per-RANGE-BUCKET sums (doc_id//500
    — contiguous in doc order), (2) the driver cumsums the bucket-count-sized
    sums into bucket offsets, (3) a bucket-partitioned second pass sorts
    within its bucket and emits each doc's window span vectorized. Window
    partials merge through a tiny groupby. The counts table materializes once
    (doc-level scalars, ~10⁻⁴ of corpus bytes); only bucket sums reach the
    driver."""
    from ray.data.aggregate import Min, Sum

    W, D = 512, 500
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def count_f(b: pa.Table) -> pa.Table:
        import polars as pl

        n = pl.from_arrow(b["text"]).str.split(" ").list.len().cast(pl.Int64).to_numpy()
        bk = b["doc_id"].to_numpy() // D
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n": pa.array(n, pa.int64()),
                "bk": pa.array(bk, pa.int64()),
            }
        )

    counts = ds.map_batches(count_f, batch_format="pyarrow").materialize()
    bsums = (
        counts.map_batches(
            lambda b: _partial(b.select(["bk", "n"]), ["bk"], [("n", "sum")]),
            batch_format="pyarrow",
        )
        .groupby("bk")
        .aggregate(Sum("n_sum", alias_name="s"))
        .to_pandas()
        .sort_values("bk")
    )
    off = dict(
        zip(
            bsums["bk"].astype(int),
            np.concatenate(([0], np.cumsum(bsums["s"].to_numpy())[:-1])),
        )
    )

    def win_f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        n = g["n"].to_numpy()
        start = off[int(g["bk"].iloc[0])] + np.concatenate(([0], np.cumsum(n)[:-1]))
        first_w = start // W
        last_w = (start + n - 1) // W
        reps = (last_w - first_w + 1).astype(np.int64)
        rep_off = np.concatenate(([0], np.cumsum(reps)[:-1]))
        win = np.repeat(first_w, reps) + (np.arange(reps.sum()) - np.repeat(rep_off, reps))
        docv = np.repeat(g["doc_id"].to_numpy(), reps)
        keep = win < 50
        df = pd.DataFrame({"win_id": win[keep], "doc_id": docv[keep]})
        return (
            df.groupby("win_id")
            .agg(n_docs=("doc_id", "size"), first_doc_id=("doc_id", "min"))
            .reset_index()
        )

    return (
        counts.groupby("bk")
        .map_groups(win_f, batch_format="pandas")
        .groupby("win_id")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("first_doc_id", alias_name="first_doc_id"),
        )
    )


def q_ntile_orders(sf_dir: str) -> pd.DataFrame:
    """NTILE(4) by (o_totalprice, o_orderkey) — an exact GLOBAL-RANK window
    without a global sort: (1) a coarse value-range histogram (price//10000,
    bounded bucket count) reduces to the driver, (2) the driver cumsums it
    into per-bucket rank offsets, (3) a bucket-partitioned pass sorts within
    each bucket (ranges are disjoint and ordered, so bucket offset + local
    index IS the global rank) and maps ranks to NTILE's first-tiles-bigger
    split. Only histogram-sized state ever leaves the workers."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    B = 10_000.0

    def add_bk(b: pa.Table) -> pa.Table:
        bk = np.floor(b["o_totalprice"].to_numpy() / B).astype(np.int64)
        return b.append_column("bk", pa.array(bk, pa.int64()))

    hist = (
        ds.map_batches(add_bk, batch_format="pyarrow")
        .map_batches(
            lambda b: _partial(
                b.append_column("one", pa.array(np.ones(len(b), np.int64))).select(
                    ["bk", "one"]
                ),
                ["bk"],
                [("one", "sum")],
            ),
            batch_format="pyarrow",
        )
        .groupby("bk")
        .aggregate(Sum("one_sum", alias_name="c"))
        .to_pandas()
        .sort_values("bk")
    )
    total = int(hist["c"].sum())
    offs = dict(
        zip(
            hist["bk"].astype(int),
            np.concatenate(([0], np.cumsum(hist["c"].to_numpy())[:-1])),
        )
    )
    base, rem = divmod(total, 4)
    sizes = np.array([base + (1 if i < rem else 0) for i in range(4)])
    tile_start = np.concatenate(([0], np.cumsum(sizes)[:-1]))

    def tile_f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"])
        rank = offs[int(g["bk"].iloc[0])] + np.arange(len(g))
        tile = np.searchsorted(tile_start, rank, side="right")
        return (
            pd.DataFrame({"tile": tile, "price": g["o_totalprice"].to_numpy()})
            .groupby("tile")
            .agg(n=("price", "size"), total=("price", "sum"))
            .reset_index()
        )

    out = (
        ds.map_batches(add_bk, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(tile_f, batch_format="pandas")
        .groupby("tile")
        .aggregate(Sum("n", alias_name="n"), Sum("total", alias_name="t"))
        .to_pandas()
        .sort_values("tile")
        .reset_index(drop=True)
    )
    out["total"] = out["t"].round(2)
    out["tile"] = out["tile"].astype(np.int64)
    return out[["tile", "n", "total"]]


def q_tfidf_top_terms(sf_dir: str) -> pd.DataFrame:
    """TF-IDF scores of one doc's terms against corpus document frequency:
    tf(term, doc 0) × ln(N / df(term)). The query doc reads via parquet
    filter pushdown (row-sized); its term set broadcasts in the closure so
    the distributed DF pass counts ONLY those terms (per-batch per-doc
    distinct inside map_batches, partial counts through a tiny groupby)."""
    from ray.data.aggregate import Sum

    doc0 = pq.read_table(
        _pq(sf_dir, "documents"), columns=["text"], filters=[("doc_id", "=", 0)]
    )["text"].to_pylist()[0]
    tf = pd.Series(doc0.split(" ")).value_counts()
    terms = frozenset(tf.index)

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def df_f(b: pa.Table, _terms=terms) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(b["text"]).str.split(" ")
        ex = pl.DataFrame(
            {"doc": np.repeat(np.arange(len(s)), s.list.len().to_numpy()), "tok": s.explode()}
        ).unique()
        ex = ex.filter(pl.col("tok").is_in(list(_terms)))
        t = pa.table(
            {
                "token": pa.array(ex["tok"].to_numpy(), pa.string()),
                "one": pa.array(np.ones(len(ex), np.int64)),
            }
        )
        return _partial(t, ["token"], [("one", "sum")])

    dfc = (
        ds.map_batches(df_f, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("one_sum", alias_name="df"))
        .to_pandas()
    )
    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    dfc["tf"] = dfc["token"].map(tf).astype(np.int64)
    dfc["score"] = (dfc["tf"] * np.log(n_docs / dfc["df"])).round(6)
    out = (
        dfc.sort_values(["score", "token"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    return out[["token", "tf", "df", "score"]]


# ------------- batch-4: simhash-LSH pairs / LEAD transitions / Q3 / corr -----


def q_simhash_neardup_pairs(sf_dir: str) -> "object":
    """SimHash near-duplicate PAIRS (hamming ≤ 3) via banded LSH: 4 bands of
    16 bits — pigeonhole-exact for the threshold (≤3 differing bits leave ≥1
    band equal), so candidate generation is a bucket groupby, never all-pairs.
    In-bucket pair emission is capped (band_key_cap analogue) and the exact
    hamming verify runs vectorized inside the group; cross-band duplicates
    collapse through a fixed-count pair-hash bucket + drop_duplicates.
    Rows-only for the driver; brute-force-equality unit test + golden pin."""
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    T = 3
    # opt-in band-run flood guard (crawl band_key_cap analogue): 0 = exact.
    # In-band emission is O(run²) by nature of LSH; the guard bounds a
    # pathological band at the cost of recall, and stays off in the gates.
    CAP = int(os.environ.get("IEPS_SIMHASH_BAND_CAP", "0") or 0)

    def sig_f(b: pa.Table) -> pa.Table:
        toks = [sorted(set(t.split())) for t in b["text"].to_pylist()]
        sh = hashing.simhash64(toks).astype(np.int64)
        ids = b["doc_id"].to_numpy()
        n = len(ids)
        h = sh.view(np.uint64)
        keys = np.concatenate(
            [
                np.int64(k) * np.int64(1 << 16)
                + ((h >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.int64)
                for k in range(4)
            ]
        )
        return pa.table(
            {
                "bk_key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
                "simhash": pa.array(np.tile(sh, 4), pa.int64()),
            }
        )

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        if CAP:
            g = g.head(CAP)
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy().view(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "hamming": np.int64}
            )
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = hashing.hamming64(sh[ia], sh[ib]).astype(np.int64)
        keep = ham <= T
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "hamming": ham[keep]}
        )

    N_PB = 64

    def add_pb(b: pa.Table) -> pa.Table:
        key = b["id_a"].to_numpy().astype(np.uint64) * np.uint64(1_000_003) + b[
            "id_b"
        ].to_numpy().astype(np.uint64)
        return b.append_column("pb", pa.array((key % np.uint64(N_PB)).astype(np.int32)))

    return (
        ds.map_batches(sig_f, batch_format="pyarrow")
        .groupby("bk_key")
        .map_groups(emit, batch_format="pandas")
        .map_batches(add_pb, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b", "hamming"]],
            batch_format="pandas",
        )
    )


def q_markov_transitions(sf_dir: str) -> "object":
    """Per-user event-type transition counts (the LEAD/LAG window as a Markov
    chain estimate): bucket-by-user-hash shuffle, sort within bucket, ONE
    segmented shift — consecutive rows of the same user give (prev → next)
    pairs — then partial counts through a 25-row groupby."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def trans_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame({"prev_type": et[:-1][same], "next_type": et[1:][same]})
        return df.groupby(["prev_type", "next_type"]).size().rename("n").reset_index()

    return (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(trans_seg, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def q_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape: top-10 orders by pending revenue for one market
    segment. The segment's customer keys broadcast as a semi-join set (dim
    sized); lineitem pre-aggregates per order AFTER the shipdate filter so
    the hash join moves one row per order; top-k is per-batch partial + a
    10-row driver merge."""
    import ray as _ray
    from ray.data.aggregate import Sum

    import datetime as _dt

    cutoff = _dt.datetime(1997, 1, 1)
    cust = pq.read_table(
        _pq(sf_dir, "customer"),
        columns=["c_custkey"],
        filters=[("c_mktsegment", "=", "AUTOMOBILE")],
    )["c_custkey"].to_numpy()
    cust_ref = _ray.put(np.sort(cust))

    li = _tbl(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") > pc.scalar(cutoff)),
    )

    def li_prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})
        return _partial(t, ["l_orderkey"], [("rev", "sum")])

    li_agg = (
        li.map_batches(li_prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev_sum", alias_name="rev"))
    )

    orders = _tbl(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < pc.scalar(cutoff)),
    )

    def cust_filter(b: pa.Table, _ref=cust_ref) -> pa.Table:
        keys = _ray.get(_ref)
        v = b["o_custkey"].to_numpy()
        pos = np.searchsorted(keys, v)
        hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == v)
        return b.filter(pa.array(hit))

    joined = li_agg.join(
        orders.map_batches(cust_filter, batch_format="pyarrow"),
        "inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def topk(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df["revenue"] = df["rev"]
        return df.sort_values(
            ["revenue", "o_orderdate", "l_orderkey"], ascending=[False, True, True]
        ).head(10)[["l_orderkey", "revenue", "o_orderdate"]]

    parts = joined.map_batches(topk, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(
            ["revenue", "o_orderdate", "l_orderkey"], ascending=[False, True, True]
        )
        .head(10)
        .reset_index(drop=True)
    )
    out["revenue"] = out["revenue"].round(4)
    return out[["l_orderkey", "revenue", "o_orderdate"]]


def q_orders_above_cust_avg(sf_dir: str) -> pd.DataFrame:
    """Correlated-subquery shape: orders priced above their own customer's
    average, counted by status. Two-level plan: per-customer (sum, count)
    partials → customer-keyed aggregate → hash join BACK onto the fact →
    vectorized filter → tiny status groupby. The join ships one row per
    customer, not a correlated rescan."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderstatus"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({"ck": b["o_custkey"], "p": b["o_totalprice"]})
        return _partial(t, ["ck"], [("p", "sum"), ([], "count_all")])

    ca = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Sum("p_sum", alias_name="s"), Sum("count_all", alias_name="c"))
    )
    joined = ds.join(ca, "inner", num_partitions=8, on=("o_custkey",), right_on=("ck",))

    def filt(b: pa.Table) -> pa.Table:
        avg = b["s"].to_numpy() / b["c"].to_numpy()
        keep = b["o_totalprice"].to_numpy() > avg
        t = pa.table({"o_orderstatus": b["o_orderstatus"].filter(pa.array(keep))})
        return _partial(
            t.append_column("one", pa.array(np.ones(keep.sum(), np.int64))),
            ["o_orderstatus"],
            [("one", "sum")],
        )

    out = (
        joined.map_batches(filt, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Sum("one_sum", alias_name="n"))
        .to_pandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    return out[["o_orderstatus", "n"]]


# ------------------------ batch-5: JSON extraction / set operations ----------


def q_props_k_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: parse the JSON ``props`` column and
    aggregate the extracted field per event type. The parse is a vectorized
    polars ``json_path_match`` inside ``map_batches`` (no per-row Python
    json.loads); stats reduce as partials."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["event_type", "props"])

    def f(b: pa.Table) -> pa.Table:
        import polars as pl

        k = (
            pl.from_arrow(b["props"])
            .str.json_path_match("$.k")
            .cast(pl.Int64)
            .to_numpy()
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "one": pa.array(np.ones(len(k), np.int64)),
                "k": pa.array(k, pa.int64()),
            }
        )
        return _partial(t, ["event_type"], [("one", "sum"), ("k", "sum")])

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("one_sum", alias_name="n"), Sum("k_sum", alias_name="k_sum"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["k_avg"] = (out["k_sum"] / out["n"]).round(6)
    return out[["event_type", "n", "k_sum", "k_avg"]]


def q_user_set_ops(sf_dir: str) -> pd.DataFrame:
    """INTERSECT / EXCEPT over user sets (clickers vs purchasers) computed in
    ONE pass: per-batch partial (user, clicked, purchased) flags → user-keyed
    max-reduce → combination counts. No distinct-set materialization, no
    second scan — the classic flag-aggregation form of set algebra."""
    from ray.data.aggregate import Max

    ds = _tbl(
        sf_dir,
        "events",
        columns=["user_id", "event_type"],
        filter=(pc.field("event_type").isin(["click", "purchase"])),
    )

    def f(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "user_id": b["user_id"],
                "clicked": pa.array((et == "click").astype(np.int64)),
                "purchased": pa.array((et == "purchase").astype(np.int64)),
            }
        )
        return _partial(t, ["user_id"], [("clicked", "max"), ("purchased", "max")])

    flags = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("clicked_max", alias_name="c"), Max("purchased_max", alias_name="p")
        )
    )

    def combo(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy().astype(bool)
        p = b["p"].to_numpy().astype(bool)
        return pa.table(
            {
                "n_both": pa.array([int((c & p).sum())], pa.int64()),
                "n_click_only": pa.array([int((c & ~p).sum())], pa.int64()),
                "n_purchase_only": pa.array([int((~c & p).sum())], pa.int64()),
            }
        )

    parts = flags.map_batches(combo, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([parts.sum().astype(np.int64)])


# ------------------------------------- wave 3: funnel / cohort / IR shapes ---


def q_event_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered conversion funnel view → click → purchase with a 24 h window
    per hop (the sessionized product-analytics shape). One bucket-hash shuffle
    co-locates each user's history; inside a bucket the three hops are plain
    vectorized pandas merges on user-level MIN timestamps — no per-user
    groups. Partials are four counters per bucket; users never span buckets,
    so the driver-side sum over ≤ _N_UB partial rows is exact."""
    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def funnel_seg(g: pd.DataFrame) -> pd.DataFrame:
        win = pd.Timedelta(hours=24)
        v = (
            g[g["event_type"] == "view"]
            .groupby("user_id")["ts"]
            .min()
            .rename("t_view")
            .reset_index()
        )
        c = g[g["event_type"] == "click"].merge(v, on="user_id")
        c = c[(c["ts"] > c["t_view"]) & (c["ts"] <= c["t_view"] + win)]
        c = c.groupby("user_id")["ts"].min().rename("t_click").reset_index()
        p = g[g["event_type"] == "purchase"].merge(c, on="user_id")
        p = p[(p["ts"] > p["t_click"]) & (p["ts"] <= p["t_click"] + win)]
        return pd.DataFrame(
            [
                {
                    "n_users": g["user_id"].nunique(),
                    "n_view": len(v),
                    "n_view_click": len(c),
                    "n_full_funnel": p["user_id"].nunique(),
                }
            ]
        )

    parts = (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(funnel_seg, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame([parts.sum().astype(np.int64)])


def q_cohort_retention(sf_dir: str) -> "object":
    """Cohort retention: users grouped by first-seen day, activity counted at
    each day offset — COUNT(DISTINCT user) per (cohort_day, day_offset).
    Scale shape: ONE bucket-hash shuffle on user (first-seen day and the
    distinct-(user, day) set both resolve locally inside the bucket, so no
    join-back and no second distinct shuffle); per-bucket partial counts are
    disjoint in users by construction, so the final (cohort, offset) groupby
    sums counters only — the classic count-distinct-via-key-partitioning."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["user_id", "ts"])

    def cohort_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["day"] = g["ts"].dt.normalize()
        first = g.groupby("user_id")["day"].min().rename("cohort").reset_index()
        g = g.merge(first, on="user_id")
        g["day_offset"] = (g["day"] - g["cohort"]).dt.days.astype("int64")
        d = g[["user_id", "cohort", "day_offset"]].drop_duplicates()
        out = d.groupby(["cohort", "day_offset"]).size().rename("n").reset_index()
        out["cohort_day"] = out["cohort"].dt.strftime("%Y-%m-%d")
        return out[["cohort_day", "day_offset", "n"]]

    out = (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(cohort_seg, batch_format="pandas")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n", alias_name="n_active"))
        .to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    return out.astype({"day_offset": "int64", "n_active": "int64"})


def q_copurchase_pairs(sf_dir: str) -> pd.DataFrame:
    """Market-basket co-occurrence: top-20 part pairs appearing in the same
    order (the self-join-on-orderkey shape). Scale plan: bucket-hash shuffle
    on orderkey co-locates each order's items; pair emission is fully
    vectorized segment arithmetic (repeat/cumsum index math — no per-order
    loop) over the distinct (order, part) rows sorted within the bucket, with
    in-bucket partial counts; only (part_a, part_b, n) partials cross the
    second (pair-keyed) shuffle; top-k is per-batch partial + a 20-row driver
    merge. O(k²) per order is inherent to the semantics — at 100 TB a cap on
    basket size k would bound it (documented; exact here to match the SQL)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def with_ob(b: pa.Table) -> pa.Table:
        ob = (b["l_orderkey"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(
            np.int32
        )
        return b.append_column("ob", pa.array(ob))

    def pairs_seg(g: pd.DataFrame) -> pd.DataFrame:
        d = (
            g[["l_orderkey", "l_partkey"]]
            .drop_duplicates()
            .sort_values(["l_orderkey", "l_partkey"], kind="stable")
        )
        ok = d["l_orderkey"].to_numpy()
        pk = d["l_partkey"].to_numpy()
        n = len(ok)
        if n == 0:
            return pd.DataFrame({"part_a": [], "part_b": [], "n": []})
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)
        rem = np.repeat(lens, lens) - pos - 1  # pairs where this row is 'a'
        total = int(rem.sum())
        if total == 0:
            return pd.DataFrame({"part_a": [], "part_b": [], "n": []})
        a_idx = np.repeat(np.arange(n), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem) + 1
        b_idx = a_idx + off
        out = pd.DataFrame({"part_a": pk[a_idx], "part_b": pk[b_idx]})
        return out.groupby(["part_a", "part_b"]).size().rename("n").reset_index()

    pairs = (
        ds.map_batches(with_ob, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(pairs_seg, batch_format="pandas")
        .groupby(["part_a", "part_b"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["n", "part_a", "part_b"], ascending=[False, True, True]
        )
        return pa.Table.from_pandas(df.head(20), preserve_index=False)

    merged = pairs.map_batches(topk, batch_format="pyarrow").to_pandas()
    merged = merged.sort_values(
        ["n", "part_a", "part_b"], ascending=[False, True, True]
    ).head(20)
    return merged.reset_index(drop=True).astype(
        {"part_a": "int64", "part_b": "int64", "n": "int64"}
    )


def q_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label mean-embedding (centroid) norm — the vector AGGREGATE shape
    (vs the per-row reductions of `embedding_norm_stats`): component-wise sums
    accumulate per label inside each batch on the zero-copy Arrow matrix (one
    np.add.at over the label-coded rows), so one (label, Σvec, n) partial row
    per label per batch crosses the shuffle; the final combine touches
    #labels × #batches tiny rows."""
    ds = _tbl(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial_sums(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        arr = emb.combine_chunks() if hasattr(emb, "combine_chunks") else emb
        flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(len(b), -1)
        labels = b["label"].to_numpy()
        uniq, codes = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, codes, mat)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(uniq),
                "vsum": pa.array(list(sums)),
                "n": pa.array(counts),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        vec = np.sum(np.stack(g["vsum"].to_numpy()), axis=0)
        n = int(g["n"].sum())
        norm = float(np.sqrt(np.sum((vec / n) ** 2)))
        return pd.DataFrame(
            [{"label": g["label"].iloc[0], "centroid_norm": round(norm, 6)}]
        )

    out = (
        ds.map_batches(partial_sums, batch_format="pyarrow")
        .groupby("label")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    return out.astype({"label": "int32"})


def q_term_postings(sf_dir: str) -> pd.DataFrame:
    """Inverted-index build: token → document frequency + posting list
    (compared as the md5 of the ascending id list, so the gate checks every
    posting exactly while the result stays result-sized). Per-batch distinct
    (token, doc_id) bounds the shuffle to the batch vocabulary; the per-token
    combine sorts its own postings only. At 100 TB postings would be written
    as a token-partitioned table instead of md5-folded (same plan up to the
    sink)."""
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def tok_pairs(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        texts = b["text"].to_pylist()
        toks = [t.split(" ") for t in texts]
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        flat_ids = np.repeat(ids, lens)
        flat_tok = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        df = pd.DataFrame({"token": flat_tok, "doc_id": flat_ids}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def agg_tok(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        s = ",".join(str(i) for i in ids)
        return pd.DataFrame(
            [
                {
                    "token": g["token"].iloc[0],
                    "df": np.int64(len(ids)),
                    "postings_md5": hashing.md5_hex([s])[0],
                }
            ]
        )

    out = (
        ds.map_batches(tok_pairs, batch_format="pyarrow")
        .groupby("token")
        .map_groups(agg_tok, batch_format="pandas")
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    return out.astype({"df": "int64"})


def q_docs_shared_span_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact substring-overlap dedup: document pairs sharing ≥8 distinct
    16-token windows (the exact-span counterpart of the MinHash/SimHash
    near-dup family — the 'dedup by shared long n-gram' recipe used for
    training-corpus cleaning). Scale shape: one shuffle on a HASH BUCKET of
    the gram (same gram ⇒ same bucket, fixed group count), vectorized
    segment-arithmetic pair emission within the bucket (no per-gram pandas
    groups), per-bucket partial counts, then a pair-keyed groupby of
    (id_a, id_b, n) partials with the ≥8 filter applied distributed before
    anything reaches the driver. At 100 TB the gram STRING would be replaced
    by a rolling 64-bit hash with an exact span verify on colliding pairs
    (the winnowing kernel in functions/text.py is that path's fingerprint
    stage); strings here keep the op byte-exact against the SQL oracle."""
    from ray.data.aggregate import Sum

    K = 16
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def gram_rows(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        texts = b["text"].to_pylist()
        gs: list = []
        dids: list = []
        for d, t in zip(ids, texts):
            toks = t.split(" ")
            wins = {" ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)}
            gs.extend(wins)
            dids.extend([int(d)] * len(wins))
        if not gs:
            return pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "gb": pa.array([], pa.int32()),
                }
            )
        gb = (hashing.hash64(gs) % np.uint64(_N_UB)).astype(np.int32)
        return pa.table(
            {
                "gram": pa.array(gs, pa.string()),
                "doc_id": pa.array(dids, pa.int64()),
                "gb": pa.array(gb),
            }
        )

    def span_pairs_seg(g: pd.DataFrame) -> pd.DataFrame:
        d = (
            g[["gram", "doc_id"]]
            .drop_duplicates()
            .sort_values(["gram", "doc_id"], kind="stable")
        )
        gr = d["gram"].to_numpy()
        ids = d["doc_id"].to_numpy()
        n = len(gr)
        if n == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "n": []})
        starts = np.flatnonzero(np.r_[True, gr[1:] != gr[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)
        rem = np.repeat(lens, lens) - pos - 1
        total = int(rem.sum())
        if total == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "n": []})
        a_idx = np.repeat(np.arange(n), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem) + 1
        b_idx = a_idx + off
        out = pd.DataFrame({"id_a": ids[a_idx], "id_b": ids[b_idx]})
        return out.groupby(["id_a", "id_b"]).size().rename("n").reset_index()

    agg = (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(span_pairs_seg, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Sum("n", alias_name="n_shared"))
        .map_batches(
            lambda b: b.filter(pc.greater_equal(b["n_shared"], 8)),
            batch_format="pyarrow",
        )
    )
    out = agg.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return out.astype({"id_a": "int64", "id_b": "int64", "n_shared": "int64"})


def q_docs_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES): each
    doc gets key u^(1/w) with weight w = n_chars and u a DETERMINISTIC
    md5-derived uniform, so the top-20 keys are an exact weighted sample that
    the SQL oracle reproduces bit-for-bit. Scale shape: embarrassingly
    parallel key computation + per-batch partial top-k; only 20 rows per
    batch reach the driver merge — no global sort, no shuffle."""
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def keyed_topk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        w = b["n_chars"].to_numpy().astype(np.float64)
        hx = hashing.md5_hex([str(i) for i in ids])
        u = np.array([int(h[:8], 16) for h in hx], dtype=np.float64) / float(16**8)
        # round BEFORE ranking so batch top-k, driver merge and the SQL
        # oracle all order by the same value (ties broken by doc_id)
        key = np.round(u ** (1.0 / w), 10)
        order = np.lexsort((ids, -key))[:20]
        return pa.table(
            {"doc_id": pa.array(ids[order]), "sample_key": pa.array(key[order])}
        )

    parts = ds.map_batches(keyed_topk, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(
        ["sample_key", "doc_id"], ascending=[False, True], kind="stable"
    ).head(20)
    return out.reset_index(drop=True).astype({"doc_id": "int64"})


# ----------------------------------------------------------- registry --------

def q_bpe_pair_counts(sf_dir: str) -> pd.DataFrame:
    """BPE vocabulary induction, step 1: top-20 adjacent character pairs
    WITHIN tokens across the corpus (the merge-candidate ranking a BPE
    trainer computes each round). Fully vectorized: each batch's texts are
    joined with a token-breaking space, viewed as a uint8 array, and pair
    keys (256·a + b) are bincounted with both space-adjacent positions
    masked out — no Python loop over tokens. The shuffle moves ≤ 256²
    (pair, n) partials per batch; the top-20 merge is driver-side on the
    ≤ 65 536-row result. At 100 TB: one streaming scan, one tiny groupby —
    the exact shape of a distributed BPE merge round."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["text"])

    def pairs(b: pa.Table) -> pa.Table:
        buf = " ".join(b["text"].to_pylist()).encode("ascii")
        a = np.frombuffer(buf, dtype=np.uint8)
        if len(a) < 2:
            return pa.table({"k": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        lead, trail = a[:-1], a[1:]
        ok = (lead != 32) & (trail != 32)  # pairs never span a token boundary
        key = lead[ok].astype(np.int64) * 256 + trail[ok]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk), "n": pa.array(cnt.astype(np.int64))})

    out = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["pair"] = [chr(int(k) >> 8) + chr(int(k) & 0xFF) for k in out["k"]]
    out = out.sort_values(["n", "pair"], ascending=[False, True]).head(20)
    return out.reset_index(drop=True)[["pair", "n"]]


def q_curated_corpus_stats(sf_dir: str) -> pd.DataFrame:
    """Composite curation chain — the one-shot "build the training mix" query
    a 100 TB pipeline runs after scoring: exact-dedup first-wins winners
    (min doc_id per md5(text)) gated by a token-count quality window
    (30 ≤ n_tokens ≤ 80, the C4/Gopher length rule), rolled up to per-lang
    (n_docs, total_tokens). ONE shuffle end to end: each batch packs
    (doc_id, lang_idx, n_tokens) into a single int64 whose HIGH bits are
    doc_id — so the groupby's Min over the packed code IS the first-wins
    winner selection AND carries the winner's attributes through the
    shuffle, with no join-back and no per-key groups. The pack budget
    (34-bit doc_id, 8-bit lang, 20-bit tokens) is asserted per batch; wider
    corpora would widen to a two-column lexicographic min."""
    from ray.data.aggregate import Min, Sum

    lang_parts = _tbl(sf_dir, "documents", columns=["lang"]).map_batches(
        lambda b: pa.table({"lang": pc.unique(b["lang"])}), batch_format="pyarrow"
    )
    langs = sorted(lang_parts.unique("lang"))
    lidx = {x: i for i, x in enumerate(langs)}
    TOK_LO, TOK_HI = 30, 80

    def pack(b: pa.Table, _lidx=dict(lidx)) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_numpy().astype(np.int64)
        nt = textfn.token_counts(texts).astype(np.int64)
        li = np.array([_lidx[x] for x in b["lang"].to_pylist()], dtype=np.int64)
        if (nt >= 1 << 20).any() or (ids >= 1 << 34).any() or len(_lidx) > 256:
            raise ValueError("pack budget exceeded — widen to two-column min")
        code = (ids << 29) | (li << 21) | (nt << 1)
        t = pa.table(
            {"content_hash": pa.array(hashing.md5_hex(texts)), "code": pa.array(code)}
        )
        return _partial(t, ["content_hash"], [("code", "min")])

    winners = (
        _tbl(sf_dir, "documents", columns=["doc_id", "lang", "text"])
        .map_batches(pack, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("code_min", alias_name="code"))
    )

    def decode(b: pa.Table) -> pa.Table:
        code = b["code"].to_numpy()
        li = (code >> 21) & 0xFF
        nt = (code >> 1) & ((1 << 20) - 1)
        keep = (nt >= TOK_LO) & (nt <= TOK_HI)
        t = pa.table(
            {"li": pa.array(li[keep]), "n_tokens": pa.array(nt[keep].astype(np.int64))}
        )
        return _partial(t, ["li"], [("n_tokens", "sum"), ([], "count_all")])

    stats = (
        winners.map_batches(decode, batch_format="pyarrow")
        .groupby("li")
        .aggregate(Sum("count_all", alias_name="n_docs"), Sum("n_tokens_sum", alias_name="total_tokens"))
        .to_pandas()
    )
    stats["lang"] = [langs[int(i)] for i in stats["li"]]
    stats = stats.sort_values("lang").reset_index(drop=True)
    return stats[["lang", "n_docs", "total_tokens"]].astype(
        {"n_docs": "int64", "total_tokens": "int64"}
    )


def q_docs_shuffle_head(sf_dir: str) -> pd.DataFrame:
    """Deterministic training-epoch SHUFFLE: the corpus order for an epoch
    is the permutation induced by md5(doc_id) (seedable by salting), which
    is reproducible across runs/workers — the standard deterministic-shuffle
    recipe for training-data loaders. Verified here on the first 20
    positions via per-batch partial min-k (no global sort for a head);
    materializing the FULL epoch order at 100 TB is the same key + a
    range-partitioned ``ds.sort`` — the one case where a global sort is the
    operator's actual semantics."""
    ds = _tbl(sf_dir, "documents", columns=["doc_id"])

    def mink(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        ks = np.array(hashing.md5_hex([str(int(i)) for i in ids]))
        order = np.lexsort((ids, ks))[:20]
        return pa.table(
            {"k": pa.array(ks[order]), "doc_id": pa.array(ids[order].astype(np.int64))}
        )

    parts = ds.map_batches(mink, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["k", "doc_id"], kind="stable").head(20)
    out = pd.DataFrame(
        {"pos": np.arange(1, len(parts) + 1, dtype="int64"), "doc_id": parts["doc_id"].to_numpy()}
    )
    return out


def q_copurchase_triangles(sf_dir: str) -> pd.DataFrame:
    """Triangle count over the co-purchase graph — the third graph shape
    (after PageRank and connected components): oriented node-iterator.
    Distinct edges (part_a < part_b) come from the same orderkey-bucket
    segment pair emission as q_copurchase_pairs; every triangle {x<y<z} is
    counted exactly once at its LOWEST vertex x by enumerating x's
    higher-neighbor pairs (y, z) — vectorized segment arithmetic per
    x-bucket. The (y, z) membership test has TWO physical plans, switched
    on the edge count (VERDICT r3 item 5):
      * edges ≤ IEPS_TRI_BCAST_MAX_EDGES (default 32 M ≈ 256 MB):
        BROADCAST sorted edge-key array (``ray.put`` once; 8 B/edge) —
        wedges never cross the wire, each bucket returns one count;
      * larger graphs: PAIR-KEYED SHUFFLE (the q_docs_shared_span_pairs
        shape) — wedge keys fold to (key, multiplicity) partials inside
        their x-bucket, union with edge-key rows, shuffle on a hash bucket
        of the pair key, one sorted-membership scan per bucket. No
        all-pairs, no broadcast; skewed hub wedges are already split
        across lower vertices by the orientation.
    The wedge blow-up on hub nodes is bounded by the low-vertex
    orientation (a hub's wedges split across its lower neighbors) — the
    standard degree-ordering argument."""
    import os

    import ray
    from ray.data.aggregate import Sum

    bcast_max = int(os.environ.get("IEPS_TRI_BCAST_MAX_EDGES", 32_000_000))

    ds = _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def order_rows(b: pa.Table) -> pa.Table:
        df = (
            b.to_pandas()
            .drop_duplicates()
            .rename(columns={"l_orderkey": "ok", "l_partkey": "pk"})
        )
        df["ob"] = (df["ok"].to_numpy() % _N_UB).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def edge_seg(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["ok", "pk"]].drop_duplicates().sort_values(["ok", "pk"], kind="stable")
        ok = d["ok"].to_numpy()
        pk = d["pk"].to_numpy().astype(np.int64)
        n = len(ok)
        if n == 0:
            return pd.DataFrame({"k": pd.Series([], dtype="int64")})
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)
        rem = np.repeat(lens, lens) - pos - 1
        total = int(rem.sum())
        if total == 0:
            return pd.DataFrame({"k": pd.Series([], dtype="int64")})
        a_idx = np.repeat(np.arange(n), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem) + 1
        k = pk[a_idx] * (1 << 32) + pk[a_idx + off]  # pk sorted within order ⇒ a < b
        return pd.DataFrame({"k": np.unique(k)})

    edge_key_ds = (
        ds.map_batches(order_rows, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(edge_seg, batch_format="pandas")
        .groupby("k")
        .count()
        .select_columns(["k"])
        .materialize()  # the distinct edge set — reused for count + both plans
    )
    n_edges = edge_key_ds.count()

    def to_xy(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "x": pa.array((k >> 32).astype(np.int64)),
                "y": pa.array((k & ((1 << 32) - 1)).astype(np.int64)),
                "xb": pa.array(((k >> 32) % _N_UB).astype(np.int32)),
            }
        )

    edge_ds = edge_key_ds.map_batches(to_xy, batch_format="pyarrow")

    def _wedge_arrays(g: pd.DataFrame):
        """(y, z) wedge keys of this x-bucket, vectorized segment arithmetic."""
        d = g.sort_values(["x", "y"], kind="stable")
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        n = len(x)
        if n == 0:
            return None
        starts = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)
        rem = np.repeat(lens, lens) - pos - 1
        total = int(rem.sum())
        if total == 0:
            return None
        a_idx = np.repeat(np.arange(n), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem) + 1
        return y[a_idx] * (1 << 32) + y[a_idx + off]  # y sorted within x ⇒ y < z

    if n_edges <= bcast_max:
        # ---- broadcast plan: wedges never leave their bucket ----
        edges = edge_key_ds.to_pandas()["k"].to_numpy().astype(np.int64)
        edges.sort()
        edges_ref = ray.put(edges)  # broadcast once — 8 B per distinct edge

        def wedges(g: pd.DataFrame) -> pd.DataFrame:
            wk = _wedge_arrays(g)
            if wk is None:
                return pd.DataFrame({"n_tri": [0]})
            sorted_edges = ray.get(edges_ref)
            p = np.searchsorted(sorted_edges, wk)
            p = np.minimum(p, len(sorted_edges) - 1)
            return pd.DataFrame({"n_tri": [int((sorted_edges[p] == wk).sum())]})

        counts = (
            edge_ds.groupby("xb").map_groups(wedges, batch_format="pandas").aggregate(Sum("n_tri"))
        )
        return pd.DataFrame({"n_triangles": [int(counts["sum(n_tri)"])]})

    # ---- shuffle plan: pair-keyed membership (no broadcast) ----
    def wedge_partials(g: pd.DataFrame) -> pd.DataFrame:
        wk = _wedge_arrays(g)
        if wk is None:
            return pd.DataFrame(
                {"k": pd.Series([], dtype="int64"), "n": pd.Series([], dtype="int64"),
                 "is_edge": pd.Series([], dtype="bool")}
            )
        uk, cnt = np.unique(wk, return_counts=True)  # fold multiplicity pre-shuffle
        return pd.DataFrame({"k": uk, "n": cnt.astype(np.int64),
                             "is_edge": np.zeros(len(uk), dtype=bool)})

    wedge_rows = edge_ds.groupby("xb").map_groups(wedge_partials, batch_format="pandas")
    edge_rows = edge_key_ds.map_batches(
        lambda b: pa.table(
            {
                "k": b["k"],
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
                "is_edge": pa.array(np.ones(b.num_rows, bool)),
            }
        ),
        batch_format="pyarrow",
    )

    def with_kb(b: pa.Table) -> pa.Table:
        kb = (b["k"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(np.int32)
        return b.append_column("kb", pa.array(kb))

    def member_seg(g: pd.DataFrame) -> pd.DataFrame:
        ek = np.sort(g.loc[g["is_edge"], "k"].to_numpy())
        w = g[~g["is_edge"]]
        if len(ek) == 0 or len(w) == 0:
            return pd.DataFrame({"n_tri": [0]})
        wk = w["k"].to_numpy()
        p = np.minimum(np.searchsorted(ek, wk), len(ek) - 1)
        return pd.DataFrame({"n_tri": [int(w["n"].to_numpy()[ek[p] == wk].sum())]})

    counts = (
        wedge_rows.union(edge_rows)
        .map_batches(with_kb, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(member_seg, batch_format="pandas")
        .aggregate(Sum("n_tri"))
    )
    return pd.DataFrame({"n_triangles": [int(counts["sum(n_tri)"])]})


def _tri_codes(text: str) -> np.ndarray:
    """Pack a [a-z ] string's character trigrams as base-32 int codes."""
    b = np.frombuffer(text.encode("ascii"), dtype=np.uint8).astype(np.int64)
    c = np.where(b == 32, 0, b - 96)  # ' '→0, 'a'-'z'→1..26
    if ((c < 0) | (c > 26)).any():
        raise ValueError("trigram LM expects the [a-z ] corpus alphabet")
    if len(c) < 3:
        return np.empty(0, dtype=np.int64)
    return c[:-2] * 1024 + c[1:-1] * 32 + c[2:]


def _tri_model(ds) -> np.ndarray:
    """Train the add-1-smoothed char-trigram LM over a documents Dataset in
    ONE streaming scan: each batch folds to (trigram-code, count) partials,
    the merged model is a dense ≤32³ float array of log p(c₃|c₁c₂) =
    ln((n₃+1)/(n₂+27)) that broadcasts in task closures."""
    from ray.data.aggregate import Sum

    def count3(b: pa.Table) -> pa.Table:
        all_codes = [_tri_codes(t) for t in b["text"].to_pylist()]
        flat = np.concatenate(all_codes) if all_codes else np.empty(0, np.int64)
        uk, cnt = np.unique(flat, return_counts=True)
        return pa.table({"g": pa.array(uk), "n3": pa.array(cnt.astype(np.int64))})

    model = (
        ds.map_batches(count3, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("n3", alias_name="n3"))
        .to_pandas()
    )
    n3 = np.zeros(32**3, dtype=np.float64)
    n3[model["g"].to_numpy()] = model["n3"].to_numpy()
    n2 = n3.reshape(32 * 32, 32).sum(axis=1)  # context marginals
    return np.log((n3 + 1.0) / (np.repeat(n2, 32) + 27.0))


def q_doc_lm_scores(sf_dir: str) -> pd.DataFrame:
    """KenLM-style language-model quality filter: score every document by
    the average log-probability of its character trigrams under an add-1
    smoothed trigram model TRAINED ON THE CORPUS ITSELF (two streaming
    scans), returning the 20 most in-distribution docs. Scan 1 folds each
    batch into (trigram-code, count) partials — codes pack the [a-z ]
    alphabet as base-32 ints, so counting is a bincount, not string ops;
    the merged model (≤ 32³ rows) plus its context marginals broadcast in
    the task closure as one dense float array. Scan 2 scores each doc with
    two vectorized gathers. p(c₃|c₁c₂) = (n₃+1)/(n₂+27): 27 = |alphabet|,
    kept in lockstep with the SQL oracle."""
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    logp = _tri_model(ds)
    _codes = _tri_codes

    def score(b: pa.Table, _lp=logp) -> pa.Table:
        ids, lps = [], []
        for d, t in zip(b["doc_id"].to_numpy(), b["text"].to_pylist()):
            codes = _codes(t)
            if len(codes):
                ids.append(int(d))
                lps.append(float(_lp[codes].mean()))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "lp": pa.array(lps, pa.float64())}
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out["lp"] = out["lp"].round(6)
    out = out.sort_values(["lp", "doc_id"], ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


def q_price_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """Approximate p50/p95/p99 of o_totalprice via a mergeable DDSketch —
    the QUANTILE counterpart of q_approx_distinct_hll's scale story: ONE
    streaming pass folds each batch into (log-bucket, count) partials whose
    groupby-Sum merge IS the sketch merge (associative + retry-safe), with
    a ±1 % RELATIVE error guarantee and no prior min/max scan — vs the
    exact path (q_group_quantiles) which needs a stats pass, a histogram
    pass and a member pull. Deterministic pure math (golden-pinned;
    tolerance-gated vs the exact quantiles in test_analytics_extra)."""
    from ray.data.aggregate import Sum

    from ..state import sketches

    ds = _tbl(sf_dir, "orders", columns=["o_totalprice"])

    def fold(b: pa.Table) -> pa.Table:
        uk, cnt = sketches.dd_buckets(b["o_totalprice"].to_numpy())
        return pa.table({"bucket": pa.array(uk), "cnt": pa.array(cnt)})

    merged = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
    )
    qs = (0.5, 0.95, 0.99)
    est = sketches.dd_quantiles(merged["bucket"].to_numpy(), merged["n"].to_numpy(), qs)
    return pd.DataFrame({"q": list(qs), "price_est": np.round(est, 4)})


def q_fuzzy_name_pairs(sf_dir: str) -> pd.DataFrame:
    """Fuzzy entity matching (record linkage): customer-name pairs within
    Levenshtein distance ≤ 1, via FastSS deletion-neighborhood hashing —
    each name emits itself plus its single-deletion variants as join keys
    (len+1 keys per record), so candidate generation is ONE equi-shuffle on
    a key-hash bucket instead of the quadratic cross join. Recall is exact:
    ED(a,b) ≤ 1 ⇒ D1(a) ∩ D1(b) ≠ ∅. Precision comes from an exact
    edit-distance verify over the candidate pairs (result-sized, not
    corpus-sized): equal-length pairs vectorize to a byte-matrix mismatch
    count, off-by-one lengths take the two-pointer scan. Oracle: the
    quadratic levenshtein self-join."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "customer", columns=["c_name"])

    def variant_rows(b: pa.Table) -> pa.Table:
        names = b["c_name"].to_pylist()
        vs: list = []
        ns: list = []
        for nm in names:
            vs.append(nm)
            ns.append(nm)
            for i in range(len(nm)):
                vs.append(nm[:i] + nm[i + 1 :])
                ns.append(nm)
        vb = (hashing.hash64(vs) % np.uint64(_N_UB)).astype(np.int32)
        return pa.table(
            {
                "variant": pa.array(vs, pa.string()),
                "name": pa.array(ns, pa.string()),
                "vb": pa.array(vb),
            }
        )

    def cand_pairs_seg(g: pd.DataFrame) -> pd.DataFrame:
        d = (
            g[["variant", "name"]]
            .drop_duplicates()
            .sort_values(["variant", "name"], kind="stable")
        )
        vr = d["variant"].to_numpy()
        nm = d["name"].to_numpy()
        empty = pd.DataFrame(
            {"name_a": pd.Series([], dtype="string"), "name_b": pd.Series([], dtype="string")}
        )
        n = len(vr)
        if n == 0:
            return empty
        starts = np.flatnonzero(np.r_[True, vr[1:] != vr[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)
        rem = np.repeat(lens, lens) - pos - 1
        total = int(rem.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem) + 1
        out = pd.DataFrame({"name_a": nm[a_idx], "name_b": nm[a_idx + off]})
        return out.drop_duplicates().astype("string")

    def verify(b: pa.Table) -> pa.Table:
        a = b["name_a"].to_pylist()
        bb = b["name_b"].to_pylist()
        la = np.array([len(x) for x in a])
        lb = np.array([len(x) for x in bb])
        keep = np.zeros(len(a), dtype=bool)
        same = np.flatnonzero(la == lb)
        for L in np.unique(la[same]):
            idx = same[la[same] == L]
            if L == 0:
                keep[idx] = True
                continue
            A = np.frombuffer("".join(a[i] for i in idx).encode(), np.uint8).reshape(-1, L)
            B = np.frombuffer("".join(bb[i] for i in idx).encode(), np.uint8).reshape(-1, L)
            keep[idx] = (A != B).sum(axis=1) <= 1
        for i in np.flatnonzero(np.abs(la - lb) == 1):
            s, t = (a[i], bb[i]) if la[i] < lb[i] else (bb[i], a[i])
            j = 0
            while j < len(s) and s[j] == t[j]:
                j += 1
            keep[i] = s[j:] == t[j + 1 :]
        return b.filter(pa.array(keep))

    pairs = (
        ds.map_batches(variant_rows, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(cand_pairs_seg, batch_format="pandas")
        .map_batches(
            lambda b: _partial(b, ["name_a", "name_b"], [([], "count_all")]),
            batch_format="pyarrow",
        )
        .groupby(["name_a", "name_b"])
        .aggregate(Sum("count_all", alias_name="_n"))
        .map_batches(verify, batch_format="pyarrow")
    )
    out = pairs.to_pandas().sort_values(["name_a", "name_b"]).reset_index(drop=True)
    return out[["name_a", "name_b"]]


def _labelprop_min_labels(edges) -> pd.DataFrame:
    """Distributed hash-min LABEL PROPAGATION over an undirected edge set
    (Dataset or DataFrame with id_a/id_b) → (node, label) where label is
    the component's min node id — the shared connected-components core of
    q_dedup_clusters_labelprop and the image pHash cluster ops. Labels
    live in a Dataset keyed by edge node; each round joins labels onto
    both endpoints, sends min(label_a, label_b) to each, and reduces per
    node with Min. Every edge node receives ≥ 1 message that already
    includes its own label in the min, so labels are monotone
    nonincreasing and an unchanged global label SUM certifies the
    fixpoint (≤ component-diameter rounds; near-dup components are
    shallow). Returns labels for EDGE NODES only (dup-rate bounded)."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    if isinstance(edges, pd.DataFrame):
        edges = rd.from_pandas(edges.reset_index(drop=True))
    edges = edges.select_columns(["id_a", "id_b"]).materialize()

    def nodes_of(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([b["id_a"].to_numpy(), b["id_b"].to_numpy()]))
        return pa.table({"node": pa.array(u.astype(np.int64))})

    labels = (
        edges.map_batches(nodes_of, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("node", alias_name="label"))
        .materialize()
    )

    def keep_a(b: pa.Table) -> pa.Table:
        return pa.table({"id_a": b["id_a"], "id_b": b["id_b"], "la": b["label"]})

    def emit(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy().astype(np.int64)
        bb = b["id_b"].to_numpy().astype(np.int64)
        m = np.minimum(b["la"].to_numpy(), b["label"].to_numpy()).astype(np.int64)
        t = pa.table(
            {
                "node": pa.array(np.concatenate([a, bb])),
                "label": pa.array(np.concatenate([m, m])),
            }
        )
        return _partial(t, ["node"], [("label", "min")])

    prev_sum = None
    for _ in range(32):
        t = edges.join(
            labels, join_type="inner", num_partitions=8, on=("id_a",), right_on=("node",)
        ).map_batches(keep_a, batch_format="pyarrow")
        t = t.join(
            labels, join_type="inner", num_partitions=8, on=("id_b",), right_on=("node",)
        )
        labels = (
            t.map_batches(emit, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label_min", alias_name="label"))
            .materialize()
        )
        s = labels.aggregate(Sum("label"))["sum(label)"]
        if s == prev_sum:
            break
        prev_sum = s
    else:  # pragma: no cover - synthetic components are shallow
        raise RuntimeError("label propagation did not converge in 32 rounds")

    return labels.to_pandas()  # edge nodes only: dup-rate bounded


def q_dedup_clusters_labelprop(sf_dir: str) -> pd.DataFrame:
    """Near-dup clustering WITHOUT the driver union-find: distributed
    hash-min label propagation (`_labelprop_min_labels`) over the verified
    LSH edge set — the 100 TB path for when even the dup-rate-bounded edge
    set outgrows one process (q_dedup_clusters documents the driver-sized
    variant; both share the recursive-CTE oracle). Docs outside the edge
    set are singletons by construction and label themselves."""
    lab = _labelprop_min_labels(q_docs_jaccard_pairs(sf_dir))
    m = dict(zip(lab["node"].astype(int), lab["label"].astype(int)))
    ids = np.sort(_dim(sf_dir, "documents", columns=["doc_id"])["doc_id"].to_numpy())
    return pd.DataFrame(
        {
            "doc_id": ids.astype("int64"),
            "cluster_id": np.array([m.get(int(i), int(i)) for i in ids], dtype="int64"),
        }
    )


def q_embedding_topk_int8(sf_dir: str) -> pd.DataFrame:
    """Quantized ANN — the memory-bandwidth scale path: int8 scalar
    quantization of the L2-NORMALIZED vectors (fixed scale 127, since every
    component is in [-1, 1]) gives a 4× smaller scan + integer dot products;
    each batch takes a generous top-64 candidate pool by int8 score, then
    exactly reranks ONLY the pool in float (so the global merge orders by
    EXACT cosine and the result matches the float brute force / SQL oracle
    bit-for-bit — int8 rounding error ≈ 0.008 on a cosine, far below the
    top-of-tail gaps; widen the pool for adversarial distributions). At
    100 TB the int8 matrix is the resident index and floats stream only
    for ~64 rows per block."""
    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)
    q8 = np.clip(np.rint(qn * 127.0), -127, 127).astype(np.int32)

    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def topk(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy()
        mask = ids != 0
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)[mask]
        ids = ids[mask]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        e8 = np.clip(np.rint(en * 127.0), -127, 127).astype(np.int8)
        scores8 = e8.astype(np.int32) @ q8  # integer dot product scan
        c = min(64, len(ids))
        pool = np.argpartition(-scores8, c - 1)[:c]
        sims = en[pool] @ qn  # exact float rerank of the pool only
        k = min(10, len(pool))
        top = pool[np.argpartition(-sims, k - 1)[:k]]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "sim": pa.array(en[top] @ qn, pa.float64()),
            }
        )

    parts = ds.map_batches(topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["sim", "vec_id"], ascending=[False, True]).head(10)
    return parts[["vec_id"]].reset_index(drop=True)


# ------------------------------------------------- wave 5: classic join/agg
# shapes still missing from the inventory: multi-dimension star join with a
# cross-dimension equality (TPC-H Q5), conditional-ratio global aggregate
# over a broadcast flag (Q14), HAVING on a fact-side aggregate (Q18), a
# log-bucketed corpus length histogram, and distributed PCA over the
# embedding column (covariance partials + driver eigendecomposition).


def q_local_supplier_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape: revenue per nation from lineitems where the CUSTOMER's
    nation equals the SUPPLIER's nation, within one region. Scale plan: the
    three dimension tables resolve driver-side (region→nation set) and the
    two fact tables each get their nationkey via a broadcast lookup (null =
    out-of-region, filtered immediately so the join exchange only moves
    in-region rows); lineitem pre-aggregates revenue per (orderkey, supp
    nation) so the orders⋈lineitem hash join ships one row per order-nation;
    the cross-dimension equality (c_nationkey = s_nationkey) is a vectorized
    post-join filter; the final groupby moves ≤ |nation| partials."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    region = _dim(sf_dir, "region")
    rkeys = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
    nation = _dim(sf_dir, "nation")
    nation = nation.filter(pc.is_in(nation["n_regionkey"], value_set=rkeys.combine_chunks()))
    nset = nation["n_nationkey"].combine_chunks()

    supp = _dim(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp = supp.filter(pc.is_in(supp["s_nationkey"], value_set=nset))
    sdim = pa.table({"l_suppkey": supp["s_suppkey"], "supp_nk": supp["s_nationkey"]})
    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"], value_set=nset))
    cdim = pa.table({"o_custkey": cust["c_custkey"], "cust_nk": cust["c_nationkey"]})

    orders = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    o_side = broadcast_join(orders, cdim, "o_custkey", ["cust_nk"]).map_batches(
        lambda b: b.filter(pc.is_valid(b["cust_nk"])).select(["o_orderkey", "cust_nk"]),
        batch_format="pyarrow",
    )

    li = _tbl(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    li = broadcast_join(li, sdim, "l_suppkey", ["supp_nk"])

    def li_prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["supp_nk"]))
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({"l_orderkey": b["l_orderkey"], "supp_nk": b["supp_nk"], "rev": rev})
        return _partial(t, ["l_orderkey", "supp_nk"], [("rev", "sum")])

    li_agg = (
        li.map_batches(li_prep, batch_format="pyarrow")
        .groupby(["l_orderkey", "supp_nk"])
        .aggregate(Sum("rev_sum", alias_name="rev_sum"))
    )
    joined = li_agg.join(
        o_side, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    # ≤ 25-entry nation map, closure-borne; lookup is a vectorized searchsorted
    nk_sorted = np.sort(nation["n_nationkey"].to_numpy())
    nm_sorted = nation["n_name"].take(
        pc.sort_indices(nation["n_nationkey"])
    ).combine_chunks()

    def post(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["supp_nk"], b["cust_nk"]))
        pos = np.searchsorted(nk_sorted, b["supp_nk"].to_numpy())
        t = pa.table(
            {"n_name": nm_sorted.take(pa.array(pos, pa.int64())), "rev": b["rev_sum"]}
        )
        return _partial(t, ["n_name"], [("rev", "sum")])

    out = (
        joined.map_batches(post, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev_sum", alias_name="r"))
        .to_pandas()
    )
    out["revenue"] = out["r"].round(4)
    return out[["n_name", "revenue"]]


def q_promo_revenue_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: share of revenue from PROMO parts — a conditional
    ratio over a broadcast dimension flag. The part dim ships once via
    ray.put; each batch emits ONE partial row (promo_rev, rev); the global
    reduce is two scalars."""
    from .joins import broadcast_join

    part = _dim(sf_dir, "part", columns=["p_partkey", "p_type"])
    flag = pc.match_like(part["p_type"], "PROMO%")
    pdim = pa.table({"l_partkey": part["p_partkey"], "is_promo": flag})

    li = _tbl(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])
    li = broadcast_join(li, pdim, "l_partkey", ["is_promo"])

    def partial(b: pa.Table) -> pa.Table:
        # drop lineitems with no matching part from BOTH sums — the oracle
        # inner-joins part, so null-flag rows must not inflate the
        # denominator on dirty data (ADVICE r3)
        b = b.filter(pc.is_valid(b["is_promo"]))
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        promo = pc.if_else(b["is_promo"], rev, pa.scalar(0.0))
        return pa.table(
            {
                "promo_rev": [pc.sum(promo).as_py() or 0.0],
                "rev": [pc.sum(rev).as_py() or 0.0],
            }
        )

    sums = li.map_batches(partial, batch_format="pyarrow").sum(["promo_rev", "rev"])
    share = 100.0 * sums["sum(promo_rev)"] / sums["sum(rev)"]
    return pd.DataFrame({"promo_share": [round(share, 4)]})


def q_large_volume_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape: HAVING on a fact-side aggregate. Lineitem quantity
    pre-aggregates per orderkey (map-side partials → one keyed groupby), the
    HAVING filter drops ~99 % of orders BEFORE the orders join, customer
    names resolve via broadcast lookup, and the top-20 is per-batch partial
    top-k + a 20-row driver merge (deterministic o_totalprice DESC,
    o_orderkey tiebreak)."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    li = _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    big = (
        li.map_batches(
            lambda b: _partial(b, ["l_orderkey"], [("l_quantity", "sum")]),
            batch_format="pyarrow",
        )
        .groupby("l_orderkey")
        .aggregate(Sum("l_quantity_sum", alias_name="sum_qty"))
        .filter(lambda r: r["sum_qty"] > 200.0)
    )
    orders = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    joined = big.join(
        orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_name"])
    cdim = pa.table({"o_custkey": cust["c_custkey"], "c_name": cust["c_name"]})
    joined = broadcast_join(joined, cdim, "o_custkey", ["c_name"])

    def topk(b: pa.Table) -> pa.Table:
        # the hash join coalesces the right key into l_orderkey
        b = b.select(["c_name", "l_orderkey", "o_totalprice", "sum_qty"])
        df = b.rename_columns(["c_name", "o_orderkey", "o_totalprice", "sum_qty"]).to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(20),
            preserve_index=False,
        )

    parts = joined.map_batches(topk, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    return out[["c_name", "o_orderkey", "o_totalprice", "sum_qty"]]


def q_doc_length_histogram(sf_dir: str) -> pd.DataFrame:
    """Log2-bucketed document-length histogram (the corpus length-
    distribution report every curation pipeline starts from). Per-batch
    bucket+combine partials; the groupby moves ≤ 64 rows per batch."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["n_chars"])

    def hist(b: pa.Table) -> pa.Table:
        n = b["n_chars"].to_numpy()
        n = n[n >= 1]  # log2(0) is -inf / undefined int cast (ADVICE r3)
        bucket = np.floor(np.log2(n)).astype(np.int64)
        t = pa.table({"bucket": bucket, "n_chars": pa.array(n)})
        return _partial(t, ["bucket"], [("n_chars", "sum"), ([], "count_all")])

    out = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_chars_sum", alias_name="total_chars"), Sum("count_all", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    out["bucket"] = out["bucket"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out[["bucket", "n", "total_chars"]]


def q_embedding_pca(sf_dir: str) -> pd.DataFrame:
    """Distributed PCA over the embedding column — the whitening /
    dimensionality-reduction preprocessing step of embedding-dedup pipelines.
    Each batch emits ONE partial row (n, Σx as list<d>, Σxxᵀ as list<d²>);
    the driver reduce is O(batches · d²) — result-sized, independent of row
    count — then a d×d eigendecomposition. Output: explained-variance ratio
    of the top 4 components, rounded to 6 decimals (summation-order jitter is
    ~1e-12 relative, so the rounding is stable across block orders)."""
    ds = _tbl(sf_dir, "embeddings", columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        x = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0).tolist()], pa.list_(pa.float64())),
                "g": pa.array([(x.T @ x).ravel().tolist()], pa.list_(pa.float64())),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()  # one row/batch
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    evr = evals / evals.sum()
    return pd.DataFrame(
        {
            "component": np.arange(4, dtype="int64"),
            "explained_variance_ratio": np.round(evr[:4], 6),
        }
    )


# ------------------------------------------------- wave 6: robust stats,
# grouped vocabulary top-k, and windows over pre-aggregated series.


def _histogram_select(ds, col: str, rank: int, lo: float, hi: float, transform=None):
    """Exact 0-based rank selection (quantile_disc semantics) over
    ``transform(col)`` by iterative 4096-bin histogram refinement — the same
    no-global-sort shape as ``q_price_quantiles``, factored for reuse with a
    value transform (MAD needs |x − median|). Each round is one streaming
    scan emitting ≤4096-row bincount partials; the candidate interval shrinks
    4096× per round, so 100 TB resolves in ceil(log_4096(N/cap)) scans plus
    one ≤cap-row pull."""
    from ray.data.aggregate import Sum

    NBINS, CAP = 4096, 100_000
    inc = True  # hi-inclusive (top of the global range / last bin of a round)
    while True:
        if lo == hi:
            return lo
        edges = np.linspace(lo, hi, NBINS + 1)

        def hist(b: pa.Table, _lo=lo, _hi=hi, _inc=inc, _edges=edges) -> pa.Table:
            v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
            if transform is not None:
                v = transform(v)
            vv = v[(v >= _lo) & ((v < _hi) | (_inc & (v == _hi)))]
            idx = np.minimum(np.searchsorted(_edges, vv, side="right") - 1, NBINS - 1)
            c = np.bincount(idx, minlength=NBINS)
            nz = np.nonzero(c)[0]
            return pa.table(
                {"bin": pa.array(nz, pa.int64()), "cnt": pa.array(c[nz], pa.int64())}
            )

        rows = (
            ds.map_batches(hist, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(Sum("cnt", alias_name="c"))
            .take_all()
        )
        counts = np.zeros(NBINS, dtype=np.int64)
        for r in rows:
            counts[r["bin"]] = r["c"]
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, rank + 1))
        rank -= int(cum[b - 1]) if b > 0 else 0
        bin_lo, bin_hi, bin_inc = float(edges[b]), float(edges[b + 1]), b == NBINS - 1 and inc
        if counts[b] <= CAP:
            def pull(bt: pa.Table, _bl=bin_lo, _bh=bin_hi, _bi=bin_inc) -> pa.Table:
                v = bt[col].to_numpy(zero_copy_only=False).astype(np.float64)
                if transform is not None:
                    v = transform(v)
                vv = v[(v >= _bl) & ((v < _bh) | (_bi & (v == _bh)))]
                return pa.table({"v": pa.array(vv, pa.float64())})

            vals = np.sort(
                np.concatenate(
                    [r["v"].to_numpy() for r in ds.map_batches(pull, batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
                    or [np.array([])]
                )
            )
            return float(vals[rank])
        lo, hi, inc = bin_lo, bin_hi, bin_inc


def q_price_mad(sf_dir: str) -> pd.DataFrame:
    """Robust outlier statistics: exact median and MAD (median absolute
    deviation) of o_totalprice — the winsorization/clipping preamble of a
    data-cleaning pipeline. Two exact rank selections, NO global sort: the
    median via histogram refinement on the raw column, the MAD via the same
    machinery on the |x − median| transform (its range [0, max(hi−m, m−lo)]
    derives from the first pass's min/max — no extra scan)."""
    from ray.data.aggregate import Count, Max, Min

    col = "o_totalprice"
    ds = _tbl(sf_dir, "orders", columns=[col])
    agg = ds.aggregate(Count(), Min(col), Max(col))
    n, vmin, vmax = int(agg["count()"]), float(agg[f"min({col})"]), float(agg[f"max({col})"])
    rank = (n - 1) // 2  # floor((n-1)/2): quantile_disc(0.5)
    med = _histogram_select(ds, col, rank, vmin, vmax)
    dev_hi = max(vmax - med, med - vmin)
    mad = _histogram_select(ds, col, rank, 0.0, dev_hi, transform=lambda v: np.abs(v - med))
    return pd.DataFrame(
        {"median_price": [round(med, 4)], "mad_price": [round(mad, 4)]}
    )


def q_top_terms_by_lang(sf_dir: str) -> pd.DataFrame:
    """Grouped vocabulary top-k: the 5 highest-document-frequency tokens PER
    LANGUAGE (the per-shard stopword report of a curation pipeline). Same
    exact-partial trick as ``q_top_terms`` — each doc lives in one batch, so
    per-batch (lang, token, distinct-doc) counts are exact COUNT(DISTINCT)
    partials; the shuffle moves vocabulary-sized rows. The per-lang top-5 is
    a map_groups over the aggregated vocabulary (5 fixed groups; at 100 TB
    add a per-block partial top-k before the merge)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def f(b: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.DataFrame(
                {
                    "doc_id": pl.from_arrow(b["doc_id"]),
                    "lang": pl.from_arrow(b["lang"]),
                    "token": pl.from_arrow(b["text"]).str.split(" "),
                }
            )
            .explode("token")
            .unique(subset=["doc_id", "token"])
            .group_by(["lang", "token"])
            .len("df")
        )
        return pa.table(
            {
                "lang": pa.array(df["lang"].to_list(), pa.string()),
                "token": pa.array(df["token"].to_list(), pa.string()),
                "df": pa.array(df["df"].to_list(), pa.int64()),
            }
        )

    def top5(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["df", "token"], ascending=[False, True]).head(5)

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("df", alias_name="df"))
        .groupby("lang")
        .map_groups(top5, batch_format="pandas")
        .to_pandas()
        .sort_values(["lang", "df", "token"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    return out[["lang", "token", "df"]]


def q_revenue_daily_growth(sf_dir: str) -> pd.DataFrame:
    """Window over a pre-aggregated series: day-over-day revenue growth.
    The fact table reduces to one row per day (per-batch partials → keyed
    groupby), then LAG/growth runs on the driver over the RESULT-sized daily
    series — the scale-correct place for a window whose partition count is
    the calendar, not the data."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def f(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["o_orderdate"], format="%Y-%m-%d")
        t = pa.table({"day": day, "rev": b["o_totalprice"]})
        return _partial(t, ["day"], [("rev", "sum")])

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("rev_sum", alias_name="r"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    prev = out["r"].shift(1)
    out["growth_pct"] = (100.0 * (out["r"] - prev) / prev).round(6)
    out["revenue"] = out["r"].round(4)
    return out[["day", "revenue", "growth_pct"]]


def q_revenue_streaks(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands: the 5 longest streaks of consecutive above-average
    revenue days (consecutive in the day sequence). The fact reduces to one
    row per day distributed; island detection is a vectorized rank-difference
    scan over the RESULT-sized series on the driver — the same placement
    argument as the EWMA recurrence."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def f(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["o_orderdate"], format="%Y-%m-%d")
        t = pa.table({"day": day, "rev": b["o_totalprice"]})
        return _partial(t, ["day"], [("rev", "sum")])

    daily = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("rev_sum", alias_name="r"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    r = daily["r"].to_numpy()
    keep = r > r.mean()
    rn = np.arange(len(r))[keep]  # day rank of each qualifying day
    days = daily["day"].to_numpy()[keep]
    grp = rn - np.arange(len(rn))  # islands: constant within a run
    out = (
        pd.DataFrame({"day": days, "grp": grp})
        .groupby("grp")
        .agg(start_day=("day", "min"), end_day=("day", "max"), len=("day", "size"))
        .reset_index(drop=True)
        .sort_values(["len", "start_day"], ascending=[False, True])
        .head(5)
        .reset_index(drop=True)
    )
    out["len"] = out["len"].astype("int64")
    return out[["start_day", "end_day", "len"]]


def q_revenue_ewma(sf_dir: str) -> pd.DataFrame:
    """Exponentially weighted moving average (α = 0.2) of daily revenue —
    the stateful-sequential-over-a-series shape (trend smoothing /
    anomaly-baseline). The fact reduces to one row per day distributed;
    the EWMA recurrence runs driver-side over the RESULT-sized calendar
    series (the only place a sequential dependency of that length belongs);
    the oracle reproduces it with a recursive CTE."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def f(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["o_orderdate"], format="%Y-%m-%d")
        t = pa.table({"day": day, "rev": b["o_totalprice"]})
        return _partial(t, ["day"], [("rev", "sum")])

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("rev_sum", alias_name="r"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    r = out["r"].to_numpy()
    ew = np.empty_like(r)
    if len(r):
        ew[0] = r[0]
        for i in range(1, len(r)):  # result-sized sequential recurrence
            ew[i] = 0.2 * r[i] + 0.8 * ew[i - 1]
    out["revenue"] = out["r"].round(4)
    out["ewma"] = np.round(ew, 4)
    return out[["day", "revenue", "ewma"]]


# ----------------------------------- wave 10: the remaining TPC-H queries
# expressible over the driver's schema — Q8 (market share per year), Q10
# (returned-item revenue ranking), Q15 (argmax over an aggregated view),
# Q19 (OR-of-conjunctive-bands scan).


def q_nation_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of the revenue delivered
    to a region's customers, per order year. Both fact tables get their
    dimension attributes via broadcast lookups (customer-region flag on
    orders, supplier-nation flag on lineitem); lineitem pre-aggregates
    (total, nation) revenue per orderkey so the hash join ships one row per
    order; the per-year share is a CASE ratio over year-sized partials."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    region = _dim(sf_dir, "region")
    rkeys = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
    nation = _dim(sf_dir, "nation")
    asia = nation.filter(pc.is_in(nation["n_regionkey"], value_set=rkeys.combine_chunks()))
    nset = asia["n_nationkey"].combine_chunks()

    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"], value_set=nset))
    cdim = pa.table({"o_custkey": cust["c_custkey"], "in_region": pa.array([True] * cust.num_rows)})

    supp = _dim(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    sdim = pa.table(
        {
            "l_suppkey": supp["s_suppkey"],
            "is_nation": pc.equal(supp["s_nationkey"], pa.scalar(7, pa.int32())),
        }
    )

    orders = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    o_side = broadcast_join(orders, cdim, "o_custkey", ["in_region"]).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.filter(pc.is_valid(b["in_region"]))["o_orderkey"],
                "o_year": pc.cast(
                    pc.year(b.filter(pc.is_valid(b["in_region"]))["o_orderdate"]), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    li = _tbl(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    li = broadcast_join(li, sdim, "l_suppkey", ["is_nation"])

    def li_prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        nat = pc.if_else(pc.fill_null(b["is_nation"], False), rev, pa.scalar(0.0))
        t = pa.table({"l_orderkey": b["l_orderkey"], "rev": rev, "nrev": nat})
        return _partial(t, ["l_orderkey"], [("rev", "sum"), ("nrev", "sum")])

    li_agg = (
        li.map_batches(li_prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev_sum", alias_name="rev"), Sum("nrev_sum", alias_name="nrev"))
    )
    joined = li_agg.join(
        o_side, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    out = (
        joined.map_batches(
            lambda b: _partial(b, ["o_year"], [("rev", "sum"), ("nrev", "sum")]),
            batch_format="pyarrow",
        )
        .groupby("o_year")
        .aggregate(Sum("rev_sum", alias_name="r"), Sum("nrev_sum", alias_name="nr"))
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    out["o_year"] = out["o_year"].astype("int64")
    out["share"] = (out["nr"] / out["r"]).round(6)
    return out[["o_year", "share"]]


def q_returned_revenue_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue of RETURNED ('R')
    lineitems on 1996 orders. The returnflag predicate and the order-date
    range both push into the parquet reads; lineitem pre-aggregates per
    orderkey before the hash join; customer name + nation attach via
    broadcast; top-20 is a partial top-k + 20-row driver merge."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    li = _tbl(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_returnflag") == "R"),
    )

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})
        return _partial(t, ["l_orderkey"], [("rev", "sum")])

    li_agg = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev_sum", alias_name="rev"))
    )
    import datetime as _dt

    orders = _tbl(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey"],
        filter=(
            (pc.field("o_orderdate") >= _dt.datetime(1996, 1, 1))
            & (pc.field("o_orderdate") < _dt.datetime(1997, 1, 1))
        ),
    )
    joined = li_agg.join(
        orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    per_cust = (
        joined.map_batches(
            lambda b: _partial(b, ["o_custkey"], [("rev", "sum")]), batch_format="pyarrow"
        )
        .groupby("o_custkey")
        .aggregate(Sum("rev_sum", alias_name="revenue"))
    )
    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    nation = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nk = nation["n_nationkey"].to_numpy()
    order_ = np.argsort(nk)
    names = nation["n_name"].take(pa.array(order_))
    pos = np.searchsorted(nk[order_], cust["c_nationkey"].to_numpy())
    cdim = pa.table(
        {
            "o_custkey": cust["c_custkey"],
            "c_name": cust["c_name"],
            "n_name": names.take(pa.array(pos, pa.int64())),
        }
    )
    per_cust = broadcast_join(per_cust, cdim, "o_custkey", ["c_name", "n_name"])

    def topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["revenue", "o_custkey"], ascending=[False, True]).head(20),
            preserve_index=False,
        )

    parts = per_cust.map_batches(topk, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["revenue", "o_custkey"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
        .rename(columns={"o_custkey": "c_custkey"})
    )
    out["revenue"] = out["revenue"].round(4)
    return out[["c_custkey", "c_name", "n_name", "revenue"]]


def q_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the MAXIMUM revenue in one
    quarter — argmax over an aggregated view (the reference's CREATE VIEW +
    WHERE total = (SELECT MAX(...)) pattern). Per-suppkey partials → keyed
    reduce (supplier-dim-sized result) → driver max + equality filter →
    broadcast name lookup."""
    from ray.data.aggregate import Sum

    import datetime as _dt

    li = _tbl(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= _dt.datetime(1996, 1, 1))
            & (pc.field("l_shipdate") < _dt.datetime(1996, 4, 1))
        ),
    )

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({"l_suppkey": b["l_suppkey"], "rev": rev})
        return _partial(t, ["l_suppkey"], [("rev", "sum")])

    per_supp = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_sum", alias_name="total_revenue"))
        .to_pandas()  # supplier-dim-sized
    )
    # argmax on ROUNDED totals (4 dp, same rounding as the output and the
    # oracle) — exact float equality on distributed sums can flip on a
    # near-tie from summation-order jitter (ADVICE r3)
    tot4 = per_supp["total_revenue"].round(4)
    best = per_supp[tot4 == tot4.max()]
    supp = _dim(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    nm = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_name"].to_pylist()))
    out = best.rename(columns={"l_suppkey": "s_suppkey"}).copy()
    out["s_name"] = [nm[k] for k in out["s_suppkey"]]
    out["total_revenue"] = out["total_revenue"].round(4)
    return out[["s_suppkey", "s_name", "total_revenue"]].sort_values("s_suppkey").reset_index(
        drop=True
    )


def q_banded_brand_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three conjunctive
    (brand, part-size, quantity) bands. The part side reduces to a
    per-partkey band id broadcast once; each lineitem batch evaluates the
    band's quantity range vectorized — the multi-branch predicate costs one
    gather + two compares per row."""
    from .joins import broadcast_join

    BANDS = [  # (brand, size_lo, size_hi, qty_lo, qty_hi)
        ("Brand#1", 1, 5, 1.0, 11.0),
        ("Brand#2", 1, 10, 10.0, 20.0),
        ("Brand#3", 1, 15, 20.0, 30.0),
    ]
    part = _dim(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    band_id = np.full(part.num_rows, -1, dtype=np.int8)
    brands = part["p_brand"].to_numpy(zero_copy_only=False)
    sizes = part["p_size"].to_numpy()
    for bi, (br, slo, shi, _, _) in enumerate(BANDS):
        band_id[(brands == br) & (sizes >= slo) & (sizes <= shi)] = bi
    pdim = pa.table({"l_partkey": part["p_partkey"], "band": pa.array(band_id, pa.int8())})

    li = _tbl(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    li = broadcast_join(li, pdim, "l_partkey", ["band"])
    qlo = np.array([b[3] for b in BANDS] + [np.inf])
    qhi = np.array([b[4] for b in BANDS] + [-np.inf])

    def partial(b: pa.Table) -> pa.Table:
        band = pc.fill_null(b["band"], -1).to_numpy(zero_copy_only=False).astype(np.int8)
        q = b["l_quantity"].to_numpy()
        idx = np.where(band < 0, len(BANDS), band)
        mask = (q >= qlo[idx]) & (q <= qhi[idx])
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        r = float(rev.to_numpy()[mask].sum())
        return pa.table({"r": [r], "n": [int(mask.sum())]})

    sums = li.map_batches(partial, batch_format="pyarrow").sum(["r", "n"])
    return pd.DataFrame(
        {"revenue": [round(sums["sum(r)"] or 0.0, 4)], "n_items": [int(sums["sum(n)"] or 0)]}
    )


# --------------------------------------- wave 9: the last two classic TPC-H
# shapes — Q6 (pure predicate-pushdown scan agg) and Q17 (fact filtered by a
# per-key aggregate of itself).


def q_discount_revenue_effect(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: revenue the discounts gave away in a (discount,
    quantity) band — the pure scan-aggregate whose predicates ALL push into
    the parquet read (row-group pruning; only matching pages leave storage).
    One streaming pass, one-row partials, two-scalar reduce."""
    ds = _tbl(
        sf_dir,
        "lineitem",
        columns=["l_extendedprice", "l_discount", "l_quantity"],
        filter=(
            (pc.field("l_discount") >= 0.05)
            & (pc.field("l_discount") <= 0.07)
            & (pc.field("l_quantity") < 24.0)
        ),
    )

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.sum(pc.multiply(b["l_extendedprice"], b["l_discount"])).as_py() or 0.0
        return pa.table({"r": [rev], "n": [b.num_rows]})

    sums = ds.map_batches(partial, batch_format="pyarrow").sum(["r", "n"])
    return pd.DataFrame(
        {"revenue_effect": [round(sums["sum(r)"], 4)], "n_items": [int(sums["sum(n)"])]}
    )


def q_small_quantity_part_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost to small orders — the
    fact table filtered by a PER-KEY AGGREGATE OF ITSELF (l_quantity <
    0.2 × that part's average quantity), for one brand. Scale plan: the
    brand's part keys broadcast as a semi-join set (dim-sized); per-part
    (Σqty, n) partials → keyed reduce → the 0.2·avg threshold map is
    result-sized and rides the closure of the second vectorized pass — the
    correlated rescan becomes two streaming scans of the brand's slice."""
    from .joins import broadcast_join

    part = _dim(sf_dir, "part", columns=["p_partkey", "p_brand"])
    keys = part.filter(pc.equal(part["p_brand"], "Brand#1"))["p_partkey"].combine_chunks()

    li = _tbl(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def slice_brand(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["l_partkey"], value_set=keys))

    branded = li.map_batches(slice_brand, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    per_part = (
        branded.map_batches(
            lambda b: _partial(b, ["l_partkey"], [("l_quantity", "sum"), ([], "count_all")]),
            batch_format="pyarrow",
        )
        .groupby("l_partkey")
        .aggregate(Sum("l_quantity_sum", alias_name="s"), Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    thr = dict(zip(per_part["l_partkey"], 0.2 * per_part["s"] / per_part["n"]))

    def small(b: pa.Table, _thr=thr) -> pa.Table:
        t = np.array([_thr[k] for k in b["l_partkey"].to_pylist()])
        mask = b["l_quantity"].to_numpy() < t
        rev = float(b["l_extendedprice"].to_numpy()[mask].sum())
        return pa.table({"r": [rev], "n": [int(mask.sum())]})

    sums = branded.map_batches(small, batch_format="pyarrow").sum(["r", "n"])
    return pd.DataFrame(
        {
            "avg_yearly": [round((sums["sum(r)"] or 0.0) / 7.0, 4)],
            "n_items": [int(sums["sum(n)"] or 0)],
        }
    )


# -------------------------------------------- wave 8: ratio-to-total window
# and grouped z-score outliers (the feature-scaling / outlier-triage shape).


def q_docs_source_share(sf_dir: str) -> pd.DataFrame:
    """Ratio-to-report window (n / SUM(n) OVER ()): each source's share of
    the corpus. Per-batch count partials → tiny keyed groupby; the global
    total is the SUM of the result-sized counts, so the 'window over the
    whole table' costs nothing extra."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["source"])
    out = (
        ds.map_batches(
            lambda b: _partial(b, ["source"], [([], "count_all")]),
            batch_format="pyarrow",
        )
        .groupby("source")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    out["share"] = (out["n"] / out["n"].sum()).round(6)
    return out[["source", "n", "share"]]


def q_events_zscore_outliers(sf_dir: str) -> pd.DataFrame:
    """Grouped z-score outlier triage: top-20 events by |z| of value within
    their event_type — the per-feature standardization + outlier cut of a
    data-cleaning pipeline. Two passes, both streaming: pass 1 per-type
    (n, Σv) then CENTERED second moments with the means broadcast in the
    closure (numerically stable at 100 TB counts, same plan as
    ``q_price_quantity_stats``); pass 2 scores batches vectorized against
    the result-sized (mean, std) map and keeps a per-batch partial top-20,
    merged on the driver."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def p1(b: pa.Table) -> pa.Table:
        return _partial(b, ["event_type"], [("value", "sum"), ([], "count_all")])

    first = (
        ds.map_batches(p1, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("value_sum", alias_name="s"), Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    mu = dict(zip(first["event_type"], first["s"] / first["n"]))
    nmap = dict(zip(first["event_type"], first["n"]))

    def p2(b: pa.Table, _mu=mu) -> pa.Table:
        v = b["value"].to_numpy()
        m = np.array([_mu[t] for t in b["event_type"].to_pylist()])
        d = v - m
        t = pa.table({"event_type": b["event_type"], "d2": pa.array(d * d, pa.float64())})
        return _partial(t, ["event_type"], [("d2", "sum")])

    second = (
        ds.map_batches(p2, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("d2_sum", alias_name="ss"))
        .to_pandas()
    )
    # STDDEV_SAMP is NULL for n<2 groups (ADVICE r3): drop those types — the
    # oracle's NULL z sorts last and never enters the top-20 either
    sd = {
        t: float(np.sqrt(ss / (nmap[t] - 1)))
        for t, ss in zip(second["event_type"], second["ss"])
        if nmap[t] >= 2
    }

    def score(b: pa.Table, _mu=mu, _sd=sd) -> pa.Table:
        types = b["event_type"].to_pylist()
        keep = np.array([t in _sd for t in types], dtype=bool)
        if not keep.all():
            b = b.filter(pa.array(keep))
            types = b["event_type"].to_pylist()
        v = b["value"].to_numpy()
        m = np.array([_mu[t] for t in types])
        s = np.array([_sd[t] for t in types])
        z = (v - m) / s
        az = np.abs(z)
        k = min(20, len(az))
        if k == 0:  # schema-stable empty partial
            return pa.table(
                {
                    "event_id": pa.array([], b["event_id"].type),
                    "event_type": pa.array([], pa.string()),
                    "z": pa.array([], pa.float64()),
                }
            )
        sel = np.argpartition(-az, k - 1)[:k]
        return pa.table(
            {
                "event_id": b["event_id"].take(pa.array(sel)),
                "event_type": b["event_type"].take(pa.array(sel)),
                "z": pa.array(z[sel], pa.float64()),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    parts["az"] = parts["z"].abs()
    out = (
        parts.sort_values(["az", "event_id"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    out["z"] = out["z"].round(6)
    return out[["event_id", "event_type", "z"]]


# ------------------------------------------------- wave 7: grouped distinct
# count with an exclusion list (TPC-H Q16 shape) and relational division.


def q_part_supplier_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, size), excluding a
    supplier blacklist (negative account balance — the "complaints" list).
    Scale plan: the blacklist and part attributes are dim-sized (blacklist
    in the closure, attrs via broadcast lookup); lineitem maps straight to
    (brand, size, suppkey) with a per-batch dedupe, ONE 3-key distinct
    groupby deduplicates globally, and the per-(brand, size) count is
    partial-combined — COUNT(DISTINCT) never ships raw occurrences."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    supp = _dim(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])
    bad = supp.filter(pc.less(supp["s_acctbal"], 0.0))["s_suppkey"].combine_chunks()
    part = _dim(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    pdim = pa.table(
        {"l_partkey": part["p_partkey"], "p_brand": part["p_brand"], "p_size": part["p_size"]}
    )

    li = _tbl(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    li = broadcast_join(li, pdim, "l_partkey", ["p_brand", "p_size"])

    def triple(b: pa.Table) -> pa.Table:
        b = b.filter(pc.invert(pc.is_in(b["l_suppkey"], value_set=bad)))
        t = b.select(["p_brand", "p_size", "l_suppkey"])
        return t.group_by(["p_brand", "p_size", "l_suppkey"]).aggregate([])

    from ray.data.aggregate import Count

    distinct = (
        li.map_batches(triple, batch_format="pyarrow")
        .groupby(["p_brand", "p_size", "l_suppkey"])
        .aggregate(Count(alias_name="_c"))
    )
    out = (
        distinct.map_batches(
            lambda b: _partial(b, ["p_brand", "p_size"], [([], "count_all")]),
            batch_format="pyarrow",
        )
        .groupby(["p_brand", "p_size"])
        .aggregate(Sum("count_all", alias_name="supplier_cnt"))
        .to_pandas()
        .sort_values(["p_brand", "p_size"])
        .reset_index(drop=True)
    )
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return out[["p_brand", "p_size", "supplier_cnt"]]


def q_customers_only_f_orders(sf_dir: str) -> pd.DataFrame:
    """Relational division (FOR ALL): customers whose EVERY order is in
    status 'F', counted per market segment. One pass over orders emits
    per-customer (n_orders, n_f) partials; division is the vectorized
    equality filter after the keyed reduce; the segment attaches via a
    broadcast lookup and the final groupby moves segment-sized partials."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])

    def prep(b: pa.Table) -> pa.Table:
        f = pc.cast(pc.equal(b["o_orderstatus"], "F"), pa.int64())
        t = pa.table({"o_custkey": b["o_custkey"], "n_f": f})
        return _partial(t, ["o_custkey"], [("n_f", "sum"), ([], "count_all")])

    per_cust = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n_f_sum", alias_name="n_f"), Sum("count_all", alias_name="n"))
        .map_batches(
            lambda b: b.filter(pc.equal(b["n_f"], b["n"])).select(["o_custkey"]),
            batch_format="pyarrow",
        )
    )
    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cdim = pa.table({"o_custkey": cust["c_custkey"], "c_mktsegment": cust["c_mktsegment"]})
    out = (
        broadcast_join(per_cust, cdim, "o_custkey", ["c_mktsegment"])
        .map_batches(
            lambda b: _partial(b, ["c_mktsegment"], [([], "count_all")]),
            batch_format="pyarrow",
        )
        .groupby("c_mktsegment")
        .aggregate(Sum("count_all", alias_name="n_customers"))
        .to_pandas()
    )
    if out.empty:  # no customer qualifies at tiny scale — keep the schema
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype=object),
                             "n_customers": pd.Series([], dtype="int64")})
    out = out.sort_values("c_mktsegment").reset_index(drop=True)
    out["n_customers"] = out["n_customers"].astype("int64")
    return out[["c_mktsegment", "n_customers"]]


# --------------------------------- wave 11 (round 4): the remaining feasible
# TPC-H shapes on this schema (Q7 bilateral trade, Q13 order-count histogram,
# Q22 idle-rich anti-join) and a sliding-window DISTINCT aggregate — the one
# window family (windowed COUNT DISTINCT) not yet covered.


def q_nation_trade_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: shipped revenue between two nations (both directions)
    per (supplier nation, customer nation, ship year). Scale plan (mirrors
    q_local_supplier_revenue): both nation filters resolve into dim-sized
    broadcast lookups, out-of-scope rows are dropped BEFORE the only real
    exchange, lineitem pre-aggregates revenue per (orderkey, supp_nk, year)
    so the orders⋈lineitem hash join ships at most |years|·|nations| rows
    per order, the bilateral predicate is a vectorized post-join filter, and
    the final groupby moves ≤ 2·|years| partials."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    N1, N2 = "NATION_1", "NATION_2"
    nation = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nk = {n: k for k, n in zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())}
    names = {nk[N1]: N1, nk[N2]: N2}
    keys = pa.array(list(names), pa.int64())

    supp = _dim(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp = supp.filter(pc.is_in(supp["s_nationkey"], value_set=keys))
    sdim = pa.table({"l_suppkey": supp["s_suppkey"], "supp_nk": supp["s_nationkey"]})
    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"], value_set=keys))
    cdim = pa.table({"o_custkey": cust["c_custkey"], "cust_nk": cust["c_nationkey"]})

    empty = pd.DataFrame(
        {"supp_nation": pd.Series([], dtype=object), "cust_nation": pd.Series([], dtype=object),
         "l_year": pd.Series([], dtype="int64"), "revenue": pd.Series([], dtype="float64")}
    )
    if sdim.num_rows == 0 or cdim.num_rows == 0:
        # no supplier or customer in scope ⇒ empty by construction (tiny-sf
        # corpora); skips a join whose empty side would drop its schema
        return empty

    orders = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    o_side = broadcast_join(orders, cdim, "o_custkey", ["cust_nk"]).map_batches(
        lambda b: b.filter(pc.is_valid(b["cust_nk"])).select(["o_orderkey", "cust_nk"]),
        batch_format="pyarrow",
    )

    import datetime as _dt

    li = _tbl(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= _dt.datetime(1995, 1, 1))
            & (pc.field("l_shipdate") < _dt.datetime(1997, 1, 1))
        ),
    )
    li = broadcast_join(li, sdim, "l_suppkey", ["supp_nk"])

    def li_prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["supp_nk"]))
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "supp_nk": b["supp_nk"],
                "l_year": pc.year(b["l_shipdate"]),
                "rev": rev,
            }
        )
        return _partial(t, ["l_orderkey", "supp_nk", "l_year"], [("rev", "sum")])

    joined = (
        li.map_batches(li_prep, batch_format="pyarrow")
        .join(o_side, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",))
    )

    def bilateral(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["supp_nk"], b["cust_nk"])  # (1,2) or (2,1) only
        b = b.filter(keep)
        t = pa.table(
            {
                "supp_nk": b["supp_nk"],
                "cust_nk": b["cust_nk"],
                "l_year": b["l_year"],
                "rev": b["rev_sum"],
            }
        )
        return _partial(t, ["supp_nk", "cust_nk", "l_year"], [("rev", "sum")])

    out = (
        joined.map_batches(bilateral, batch_format="pyarrow")
        .groupby(["supp_nk", "cust_nk", "l_year"])
        .aggregate(Sum("rev_sum", alias_name="r"))
        .to_pandas()
    )
    if out.empty:
        return empty
    out["supp_nation"] = out["supp_nk"].map(names)
    out["cust_nation"] = out["cust_nk"].map(names)
    out["l_year"] = out["l_year"].astype("int64")
    out["revenue"] = out["r"].round(4)
    return (
        out[["supp_nation", "cust_nation", "l_year", "revenue"]]
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )


def q_customer_order_histogram(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count INCLUDING
    zero-order customers. Scale plan: orders fold to per-custkey count
    partials before the only keyed shuffle; the customer side joins
    left-outer so missing keys surface as the zero bucket; the histogram is
    a second partial-combined groupby over customer-sized input whose
    result is ≤ max(order count) rows."""
    from ray.data.aggregate import Sum

    per_cust = (
        _tbl(sf_dir, "orders", columns=["o_custkey"])
        .map_batches(
            lambda b: _partial(b, ["o_custkey"], [([], "count_all")]), batch_format="pyarrow"
        )
        .groupby("o_custkey")
        .aggregate(Sum("count_all", alias_name="c_count"))
    )

    def hist(b: pa.Table) -> pa.Table:
        cc = pc.fill_null(b["c_count"], 0)
        t = pa.table({"c_count": cc})
        return _partial(t, ["c_count"], [([], "count_all")])

    out = (
        _tbl(sf_dir, "customer", columns=["c_custkey"])
        .join(per_cust, "left_outer", num_partitions=8, on=("c_custkey",), right_on=("o_custkey",))
        .map_batches(hist, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("count_all", alias_name="custdist"))
        .to_pandas()
        .sort_values("c_count")
        .reset_index(drop=True)
    )
    out["c_count"] = out["c_count"].astype("int64")
    out["custdist"] = out["custdist"].astype("int64")
    return out[["c_count", "custdist"]]


def q_idle_rich_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape: customers with above-average positive account
    balance and NO orders, counted per nation. Scale plan: the scalar
    subquery (global avg of positive balances) is one partial-sum pass;
    the candidate set (acctbal > avg) prunes BEFORE the anti-join; distinct
    order custkeys fold to per-key partials so the left-outer join ships
    one row per ordering customer; the final groupby moves ≤ |nation|
    partials."""
    from ray.data.aggregate import Count, Sum

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    cust = _tbl(sf_dir, "customer", columns=cust_cols)

    def bal_partial(b: pa.Table) -> pa.Table:
        pos = b.filter(pc.greater(b["c_acctbal"], 0.0))
        return pa.table(
            {"s": [pc.sum(pos["c_acctbal"]).as_py() or 0.0], "n": [pos.num_rows]}
        )

    sums = cust.map_batches(bal_partial, batch_format="pyarrow").sum(["s", "n"])
    avg_bal = (sums["sum(s)"] or 0.0) / max(int(sums["sum(n)"] or 0), 1)

    ordered = (
        _tbl(sf_dir, "orders", columns=["o_custkey"])
        .map_batches(
            lambda b: b.group_by(["o_custkey"]).aggregate([]), batch_format="pyarrow"
        )
        .groupby("o_custkey")
        .aggregate(Count(alias_name="_c"))
    )

    rich = cust.map_batches(
        lambda b: b.filter(pc.greater(b["c_acctbal"], avg_bal)), batch_format="pyarrow"
    )

    def anti_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_null(b["_c"]))
        t = b.select(["c_nationkey", "c_acctbal"])
        return _partial(t, ["c_nationkey"], [("c_acctbal", "sum"), ([], "count_all")])

    out = (
        rich.join(ordered, "left_outer", num_partitions=8, on=("c_custkey",), right_on=("o_custkey",))
        .map_batches(anti_partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(
            Sum("count_all", alias_name="numcust"), Sum("c_acctbal_sum", alias_name="tot")
        )
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"c_nationkey": pd.Series([], dtype="int64"),
                             "numcust": pd.Series([], dtype="int64"),
                             "totacctbal": pd.Series([], dtype="float64")})
    out = out.sort_values("c_nationkey").reset_index(drop=True)
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = out["tot"].round(4)
    return out[["c_nationkey", "numcust", "totacctbal"]]


def q_distinct_users_sliding7(sf_dir: str) -> pd.DataFrame:
    """Sliding-window COUNT DISTINCT: per event day, the distinct users
    active in the trailing 7-day window — the windowed-distinct aggregate
    (exact, not sketched; the HLL variant is q_approx_distinct_hll's
    family). Scale plan: (day, user) pairs dedup with per-batch distinct
    combiners before the first shuffle; each distinct pair then fans out to
    its ≤ 7 window days (window days pruned to OBSERVED days, broadcast as
    a tiny array in the closure), a second distinct groupby dedups
    (window_day, user), and the final count folds per-batch partials — the
    raw event stream never crosses a shuffle, only distinct pairs do (≤ 7×
    the distinct-pair count, independent of event volume)."""
    from ray.data.aggregate import Count, Sum

    ds = _tbl(sf_dir, "events", columns=["ts", "user_id"])

    def pairs(b: pa.Table) -> pa.Table:
        d = b["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        t = pa.table({"day": pa.array(d), "user_id": b["user_id"]})
        return t.group_by(["day", "user_id"]).aggregate([])

    du = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .materialize()  # distinct (day, user) — reused for days set + expansion
    )
    days_arr = np.unique(
        np.concatenate(
            [b["day"].to_numpy() for b in du.select_columns(["day"]).iter_batches(batch_format="pyarrow")]
            or [np.array([], dtype=np.int64)]
        )
    )

    def expand(b: pa.Table) -> pa.Table:
        d = b["day"].to_numpy()
        u = b["user_id"].to_numpy()
        wd = (d[:, None] + np.arange(7)[None, :]).ravel()
        uu = np.repeat(u, 7)
        keep = np.isin(wd, days_arr)
        t = pa.table({"wd": pa.array(wd[keep]), "user_id": pa.array(uu[keep])})
        return t.group_by(["wd", "user_id"]).aggregate([])

    counted = (
        du.map_batches(expand, batch_format="pyarrow")
        .groupby(["wd", "user_id"])
        .aggregate(Count(alias_name="_c2"))
        .map_batches(lambda b: _partial(b, ["wd"], [([], "count_all")]), batch_format="pyarrow")
        .groupby("wd")
        .aggregate(Sum("count_all", alias_name="users_7d"))
        .to_pandas()
        .sort_values("wd")
        .reset_index(drop=True)
    )
    counted["day"] = pd.to_datetime(counted["wd"], unit="D").dt.strftime("%Y-%m-%d")
    counted["users_7d"] = counted["users_7d"].astype("int64")
    return counted[["day", "users_7d"]]


def q_late_ship_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape (EXISTS semi-join): orders with at least one lineitem
    shipped > 60 days after the order date, counted per o_orderpriority.
    EXISTS(l_shipdate > o_orderdate + 60d) ⇔ per-order MAX(l_shipdate) >
    o_orderdate + 60d, so lineitem folds to one (orderkey, max_ship) row via
    per-batch max partials before the ONLY keyed shuffle (the orderkey
    join); the priority groupby then moves ≤ 5 partial rows per batch.
    Reference analogue: the EXISTS-style frontier membership checks of
    database.py:316-342 recast as a fact⋈fact semi-join."""
    from ray.data.aggregate import Max, Sum

    def li_prep(b: pa.Table) -> pa.Table:
        # ship date as int64 ns so the Ray-level Max stays numeric
        ns = b["l_shipdate"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        t = pa.table({"l_orderkey": b["l_orderkey"], "ship_ns": pa.array(ns)})
        return _partial(t, ["l_orderkey"], [("ship_ns", "max")])

    li = (
        _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
        .map_batches(li_prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Max("ship_ns_max", alias_name="max_ship"))
    )
    orders = _tbl(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def late_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # schema-stable empty partial
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "count_all": pa.array([], pa.int64()),
                }
            )
        ms = b["max_ship"].to_numpy(zero_copy_only=False).astype(np.float64)
        od = (
            b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[ns]").astype(np.int64)
        )
        sixty_d = 60 * 86_400 * 1_000_000_000
        late = ~np.isnan(ms) & (ms > (od + sixty_d).astype(np.float64))
        t = b.filter(pa.array(late)).select(["o_orderpriority"])
        return _partial(t, ["o_orderpriority"], [([], "count_all")])

    out = (
        orders.join(
            li, "left_outer", num_partitions=8, on=("o_orderkey",), right_on=("l_orderkey",)
        )
        .map_batches(late_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("count_all", alias_name="order_count"))
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    out["order_count"] = out["order_count"].astype("int64")
    return out[["o_orderpriority", "order_count"]]


def q_lines_by_priority_class(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape (large⋈large join + dual conditional count): lineitems
    per ship-year split into high-priority (1-URGENT/2-HIGH order) vs other
    lines. Scale plan: lineitem folds to (orderkey, ship_year) count
    partials per batch BEFORE the join, the orders side ships only
    (orderkey, is_high), and after the keyed join everything folds to
    ≤ |years| partial rows per batch — the raw line stream never crosses a
    shuffle twice."""
    from ray.data.aggregate import Sum

    def li_prep(b: pa.Table) -> pa.Table:
        yr = b["l_shipdate"].to_numpy().astype("datetime64[Y]").astype(np.int64) + 1970
        t = pa.table({"l_orderkey": b["l_orderkey"], "ship_year": pa.array(yr)})
        return _partial(t, ["l_orderkey", "ship_year"], [([], "count_all")])

    li = _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]).map_batches(
        li_prep, batch_format="pyarrow"
    )

    def o_prep(b: pa.Table) -> pa.Table:
        hi = pc.is_in(
            b["o_orderpriority"], value_set=pa.array(["1-URGENT", "2-HIGH"])
        )
        return pa.table({"o_orderkey": b["o_orderkey"], "is_high": hi})

    orders = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]).map_batches(
        o_prep, batch_format="pyarrow"
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # schema-stable empty partial
            return pa.table(
                {
                    "ship_year": pa.array([], pa.int64()),
                    "hc_sum": pa.array([], pa.int64()),
                    "lc_sum": pa.array([], pa.int64()),
                }
            )
        c = b["count_all"].to_numpy()
        hi = b["is_high"].to_numpy(zero_copy_only=False).astype(bool)
        t = pa.table(
            {
                "ship_year": b["ship_year"],
                "hc": pa.array(np.where(hi, c, 0)),
                "lc": pa.array(np.where(hi, 0, c)),
            }
        )
        return _partial(t, ["ship_year"], [("hc", "sum"), ("lc", "sum")])

    out = (
        li.join(orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",))
        .map_batches(fold, batch_format="pyarrow")
        .groupby("ship_year")
        .aggregate(
            Sum("hc_sum", alias_name="high_line_count"),
            Sum("lc_sum", alias_name="low_line_count"),
        )
        .to_pandas()
        .sort_values("ship_year")
        .reset_index(drop=True)
    )
    for c in ("ship_year", "high_line_count", "low_line_count"):
        out[c] = out[c].astype("int64")
    return out[["ship_year", "high_line_count", "low_line_count"]]


def q_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21 shape: suppliers whose line shipped STRICTLY last in a
    multi-supplier order, top-10 by how many orders they held up. Scale
    plan: lineitem folds to per-batch (orderkey, suppkey) max-shipdate
    partials, then ONE shuffle on a fixed 64-way orderkey hash bucket; each
    bucket resolves per-order stats (supplier count, max ship, #at-max)
    with segmented numpy scans — no per-order pandas groups (VERDICT r2
    item 6 shape) — and emits supplier-level count partials. The supplier
    dim broadcasts once for names; top-k is per-batch partial + a 10-row
    driver merge."""
    from ray.data.aggregate import Sum

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "sm": b["l_shipdate"],
            }
        )
        p = t.group_by(["l_orderkey", "l_suppkey"]).aggregate([("sm", "max")])
        ob = (p["l_orderkey"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(
            np.int32
        )
        return p.append_column("ob", pa.array(ob))

    def seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["l_orderkey", "l_suppkey"], sort=False, as_index=False)[
            "sm_max"
        ].max()
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "l_suppkey": pd.Series([], dtype="int64"),
                    "numwait": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values("l_orderkey", kind="stable")
        ok = g["l_orderkey"].to_numpy()
        sm = g["sm_max"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        _, starts = np.unique(ok, return_index=True)
        nsupp = np.diff(np.append(starts, len(ok)))
        mx = np.maximum.reduceat(sm, starts)
        at_max = sm == np.repeat(mx, nsupp)
        n_at_max = np.add.reduceat(at_max.astype(np.int64), starts)
        win = (
            at_max
            & (np.repeat(nsupp, nsupp) >= 2)
            & (np.repeat(n_at_max, nsupp) == 1)
        )
        u, c = np.unique(g["l_suppkey"].to_numpy()[win], return_counts=True)
        return pd.DataFrame(
            {"l_suppkey": u.astype(np.int64), "numwait": c.astype(np.int64)}
        )

    agg = (
        _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(seg, batch_format="pandas")
        .groupby("l_suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
    )

    from .joins import broadcast_join

    dim = _dim(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).rename_columns(
        ["l_suppkey", "s_name"]
    )
    named = broadcast_join(agg, dim, "l_suppkey", ["s_name"])

    def topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # schema-stable empty partial
            return pa.table(
                {"s_name": pa.array([], pa.string()), "numwait": pa.array([], pa.int64())}
            )
        df = b.select(["s_name", "numwait"]).to_pandas()
        df = df.sort_values(
            ["numwait", "s_name"], ascending=[False, True], kind="stable"
        ).head(10)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        named.map_batches(topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["numwait", "s_name"], ascending=[False, True], kind="stable")
        .head(10)
        .reset_index(drop=True)
    )
    out["numwait"] = out["numwait"].astype("int64")
    return out[["s_name", "numwait"]]


# ------------------------------------------------------------ wave 22 -------


def q_nation_pair_trade(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year —
    the two-dimension-bridge join (supplier nation on the lineitem side,
    customer nation on the orders side). Scale plan: both nation bridges are
    broadcast lookups (customer/supplier are dimension-sized); the only
    exchange is the lineitem⋈orders hash join, and lineitem pre-aggregates
    per (orderkey, supp_nation, year) BEFORE it so the join moves one row
    per (order, nation, year), not one per lineitem."""
    import datetime as _dt

    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    nat = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    key_of = {v: k for k, v in name_of.items()}
    nk1, nk2 = key_of["NATION_3"], key_of["NATION_8"]  # both populated at every sf

    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).rename_columns(
        ["o_custkey", "c_nk"]
    )
    orders = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    orders = broadcast_join(orders, cust, "o_custkey", ["c_nk"]).map_batches(
        lambda b: b.filter(
            pc.or_(pc.equal(b["c_nk"], nk1), pc.equal(b["c_nk"], nk2))
        ).select(["o_orderkey", "c_nk"]),
        batch_format="pyarrow",
    )

    supp = _dim(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).rename_columns(
        ["l_suppkey", "s_nk"]
    )
    li = _tbl(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= _dt.datetime(1996, 1, 1))
            & (pc.field("l_shipdate") < _dt.datetime(1998, 1, 1))
        ),
    )

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.or_(pc.equal(b["s_nk"], nk1), pc.equal(b["s_nk"], nk2))
        b = b.filter(keep)
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "s_nk": b["s_nk"],
                "l_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
                "rev": rev,
            }
        )
        return _partial(t, ["l_orderkey", "s_nk", "l_year"], [("rev", "sum")])

    li_agg = broadcast_join(li, supp, "l_suppkey", ["s_nk"]).map_batches(
        prep, batch_format="pyarrow"
    )
    joined = li_agg.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def cross_only(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b["s_nk"], b["c_nk"]))  # the two directions
        return _partial(
            b.select(["s_nk", "c_nk", "l_year", "rev_sum"]),
            ["s_nk", "c_nk", "l_year"],
            [("rev_sum", "sum")],
        )

    out = (
        joined.map_batches(cross_only, batch_format="pyarrow")
        .groupby(["s_nk", "c_nk", "l_year"])
        .aggregate(Sum("rev_sum_sum", alias_name="r"))
        .to_pandas()
    )
    out["supp_nation"] = out["s_nk"].map(name_of)
    out["cust_nation"] = out["c_nk"].map(name_of)
    out["revenue"] = out["r"].round(4)
    out = out.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)
    return out[["supp_nation", "cust_nation", "l_year", "revenue"]].astype({"l_year": "int64"})


def q_part_profit_by_year(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 shape (adapted to this schema's columns): profit on 'red'
    parts per supplier nation per ship year, where profit = revenue minus
    retail cost (p_retailprice × quantity standing in for ps_supplycost).
    ONE fact scan: both the part attributes (price, name predicate) and the
    supplier→nation bridge ride broadcast lookups; the groupby moves
    (nation, year) partials only."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    nat = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))

    part = _dim(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
    part = part.filter(pc.match_substring(part["p_name"], "red")).select(
        ["p_partkey", "p_retailprice"]
    ).rename_columns(["l_partkey", "p_retailprice"])
    supp = _dim(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).rename_columns(
        ["l_suppkey", "s_nk"]
    )

    li = _tbl(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["p_retailprice"]))  # semi-join: red parts only
        amount = pc.subtract(
            pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])),
            pc.multiply(b["p_retailprice"], b["l_quantity"]),
        )
        t = pa.table(
            {
                "s_nk": b["s_nk"],
                "o_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
                "amount": amount,
            }
        )
        return _partial(t, ["s_nk", "o_year"], [("amount", "sum")])

    staged = broadcast_join(
        broadcast_join(li, part, "l_partkey", ["p_retailprice"]), supp, "l_suppkey", ["s_nk"]
    )
    out = (
        staged.map_batches(prep, batch_format="pyarrow")
        .groupby(["s_nk", "o_year"])
        .aggregate(Sum("amount_sum", alias_name="a"))
        .to_pandas()
    )
    out["nation"] = out["s_nk"].map(name_of)
    out["profit"] = out["a"].round(4)
    out = out.sort_values(["nation", "o_year"]).reset_index(drop=True)
    return out[["nation", "o_year", "profit"]].astype({"o_year": "int64"})


def q_association_rules(sf_dir: str) -> pd.DataFrame:
    """Market-basket association rules: top-15 part pairs by LIFT with
    support ≥ 3 co-orders. Two scans of the (orderkey, partkey) projection,
    both exact: (1) the copurchase pair-count plan (orderkey-bucket shuffle,
    vectorized in-bucket pair emission, pair-keyed partial sum); (2) item
    frequencies + basket count — the orderkey buckets partition the order
    space, so per-bucket DISTINCT is globally exact and each bucket's order
    count rides the same output as a sentinel row (part = -1). Item counts
    are part-dimension-sized → broadcast into the scoring stage; only the
    n_ab ≥ 3 pairs reach the top-k merge."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def with_ob(b: pa.Table) -> pa.Table:
        ob = (b["l_orderkey"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(np.int32)
        return b.append_column("ob", pa.array(ob))

    bucketed = ds.map_batches(with_ob, batch_format="pyarrow")

    def pairs_seg(g: pd.DataFrame) -> pd.DataFrame:
        d = (
            g[["l_orderkey", "l_partkey"]]
            .drop_duplicates()
            .sort_values(["l_orderkey", "l_partkey"], kind="stable")
        )
        ok = d["l_orderkey"].to_numpy()
        pk = d["l_partkey"].to_numpy()
        n = len(ok)
        if n == 0:
            return pd.DataFrame({"part_a": [], "part_b": [], "n": []})
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)
        rem = np.repeat(lens, lens) - pos - 1
        total = int(rem.sum())
        if total == 0:
            return pd.DataFrame({"part_a": [], "part_b": [], "n": []})
        a_idx = np.repeat(np.arange(n), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem) + 1
        out = pd.DataFrame({"part_a": pk[a_idx], "part_b": pk[a_idx + off]})
        return out.groupby(["part_a", "part_b"]).size().rename("n").reset_index()

    pairs = (
        bucketed.groupby("ob")
        .map_groups(pairs_seg, batch_format="pandas")
        .groupby(["part_a", "part_b"])
        .aggregate(Sum("n", alias_name="n_ab"))
    )

    def item_seg(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        cnt = d.groupby("l_partkey").size().rename("ni").reset_index()
        # sentinel row: this bucket's distinct-order count (buckets partition
        # the order space, so the global basket count is the sentinel sum)
        cnt = pd.concat(
            [cnt, pd.DataFrame({"l_partkey": [-1], "ni": [d["l_orderkey"].nunique()]})]
        )
        return cnt

    items = (
        bucketed.groupby("ob")
        .map_groups(item_seg, batch_format="pandas")
        .groupby("l_partkey")
        .aggregate(Sum("ni", alias_name="ni"))
        .to_pandas()  # part-dimension-sized
    )
    n_orders = int(items.loc[items["l_partkey"] == -1, "ni"].iloc[0])
    ni = dict(zip(items["l_partkey"], items["ni"]))

    def score(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["n_ab"] >= 3]
        if df.empty:
            return pa.table(
                {
                    "part_a": pa.array([], pa.int64()),
                    "part_b": pa.array([], pa.int64()),
                    "n_ab": pa.array([], pa.int64()),
                    "conf_ab": pa.array([], pa.float64()),
                    "lift": pa.array([], pa.float64()),
                }
            )
        na = df["part_a"].map(ni).to_numpy(dtype=np.float64)
        nb = df["part_b"].map(ni).to_numpy(dtype=np.float64)
        nab = df["n_ab"].to_numpy(dtype=np.float64)
        df["conf_ab"] = nab / na
        df["lift"] = nab * float(n_orders) / (na * nb)
        df = df.sort_values(["lift", "part_a", "part_b"], ascending=[False, True, True]).head(15)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        pairs.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["lift", "part_a", "part_b"], ascending=[False, True, True])
        .head(15)
        .reset_index(drop=True)
    )
    out["conf_ab"] = out["conf_ab"].round(6)
    out["lift"] = out["lift"].round(6)
    return out[["part_a", "part_b", "n_ab", "conf_ab", "lift"]].astype(
        {"part_a": "int64", "part_b": "int64", "n_ab": "int64"}
    )


def q_embedding_range_search(sf_dir: str) -> pd.DataFrame:
    """Range search (the ANN family's radius variant of top-k): count of
    vectors within cosine ≥ 0.2 of the broadcast query, per label — one
    streaming scan, per-batch matmul against the 64-float closure vector,
    label-keyed partials only cross the shuffle."""
    from ray.data.aggregate import Sum

    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)

    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def hits(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy()
        mask = ids != 0
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)[mask]
        lab = b["label"].to_numpy()[mask]
        if len(lab) == 0:
            return pa.table({"label": pa.array([], pa.int32()), "n": pa.array([], pa.int64())})
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        keep = (en @ qn) >= 0.2
        t = pa.table(
            {"label": pa.array(lab[keep], pa.int32()), "one": pa.array(np.ones(int(keep.sum()), np.int64))}
        )
        return _partial(t, ["label"], [("one", "sum")]).rename_columns(["label", "n"])

    out = (
        _coalesce_partials(ds.map_batches(hits, batch_format="pyarrow"))
        .groupby("label")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    return out.astype({"label": "int32", "n": "int64"})


def q_normalized_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Dedup after text normalization (lowercase + whitespace collapse +
    trim) — the canonicalization-then-exact-dedup curation step (M1+D3
    composed; CCNet-style normalization before hashing). All-Arrow kernels
    per batch; the shuffle moves one md5-keyed partial row per normalized
    form per batch."""
    from ray.data.aggregate import Min, Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def norm_hash(b: pa.Table) -> pa.Table:
        t = pc.utf8_lower(b["text"])
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        h = hashing.md5_hex(t.to_pylist())
        t2 = pa.table({"nh": pa.array(h, pa.string()), "doc_id": b["doc_id"]})
        return _partial(t2, ["nh"], [([], "count_all"), ("doc_id", "min")])

    groups = (
        ds.map_batches(norm_hash, batch_format="pyarrow")
        .groupby("nh")
        .aggregate(Sum("count_all", alias_name="c"), Min("doc_id_min", alias_name="keeper"))
    )

    def fold(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy()
        return pa.table(
            {
                "n_groups": pa.array([len(c)], pa.int64()),
                "n_docs": pa.array([int(c.sum())], pa.int64()),
                "n_redundant": pa.array([int((c - 1).sum())], pa.int64()),
            }
        )

    parts = groups.map_batches(fold, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        [
            {
                "n_groups": int(parts["n_groups"].sum()),
                "n_docs": int(parts["n_docs"].sum()),
                "n_redundant": int(parts["n_redundant"].sum()),
            }
        ]
    )


def q_source_lang_chi2(sf_dir: str) -> pd.DataFrame:
    """Chi-squared independence statistic between document source and lang —
    the dataset-drift / composition-shift check of a curation pipeline.
    Distributed part = the (source, lang) contingency partials (one row per
    cell per batch); the contingency table itself is result-sized
    (|sources|×|langs|), so the full-grid expected-count fold (zero cells
    included) runs on the driver in numpy."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["source", "lang"])
    cells = (
        _coalesce_partials(
            ds.map_batches(
                lambda b: _partial(b, ["source", "lang"], [([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby(["source", "lang"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    piv = cells.pivot_table(index="source", columns="lang", values="n", fill_value=0.0)
    obs = piv.to_numpy(dtype=np.float64)
    rn = obs.sum(axis=1, keepdims=True)
    cn = obs.sum(axis=0, keepdims=True)
    exp = rn * cn / obs.sum()
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    dof = int((obs.shape[0] - 1) * (obs.shape[1] - 1))
    return pd.DataFrame([{"chi2": round(chi2, 6), "dof": dof}]).astype({"dof": "int64"})


# ------------------------------------------------------------ wave 23 -------


def q_pmi_bigrams(sf_dir: str) -> pd.DataFrame:
    """Collocation mining: top-20 adjacent-token bigrams by pointwise mutual
    information among bigrams seen ≥ 5 times. Two streaming count passes
    (unigrams, bigrams) whose shuffles move per-batch DISTINCT terms; the
    unigram table is vocabulary-sized and rides the scoring closure as a
    dict (at 100 TB vocab this becomes a ray.put broadcast); scoring +
    partial top-k stay per-batch."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["text"])

    def uni_counts(b: pa.Table) -> pa.Table:
        toks = [t.split() for t in b["text"].to_pylist()]
        flat = pd.Series([w for ts in toks for w in ts], dtype=object)
        vc = flat.value_counts()
        return pa.table(
            {"w": pa.array(vc.index.to_numpy(), pa.string()), "c": pa.array(vc.to_numpy(), pa.int64())}
        )

    uni = (
        ds.map_batches(uni_counts, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # vocabulary-sized
    )
    n_uni = float(uni["c"].sum())
    cnt = dict(zip(uni["w"], uni["c"].astype(float)))

    def bigram_counts(b: pa.Table) -> pa.Table:
        toks = [t.split() for t in b["text"].to_pylist()]
        flat = np.array([w for ts in toks for w in ts], dtype=object)
        if len(flat) < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        big = pd.Series(flat[:-1]) + " " + pd.Series(flat[1:])
        lens = np.array([len(ts) for ts in toks])
        ends = np.cumsum(lens) - 1
        keep = np.ones(len(flat) - 1, dtype=bool)
        keep[ends[ends < len(flat) - 1]] = False
        vc = big[keep].value_counts()
        return pa.table(
            {
                "bigram": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    bi = (
        ds.map_batches(bigram_counts, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n_ab"))
    )
    # total bigram instances = Σ n_ab (exact; cheap second driver fold)
    n_big = float(
        bi.map_batches(
            lambda b: pa.table({"s": pa.array([int(pc.sum(b["n_ab"]).as_py() or 0)], pa.int64())}),
            batch_format="pyarrow",
        ).to_pandas()["s"].sum()
    )

    def score(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["n_ab"] >= 5]
        if df.empty:
            return pa.table(
                {
                    "bigram": pa.array([], pa.string()),
                    "n_ab": pa.array([], pa.int64()),
                    "pmi": pa.array([], pa.float64()),
                }
            )
        ab = df["bigram"].str.split(" ", n=1, expand=True)
        na = ab[0].map(cnt).to_numpy(dtype=np.float64)
        nb = ab[1].map(cnt).to_numpy(dtype=np.float64)
        nab = df["n_ab"].to_numpy(dtype=np.float64)
        df["pmi"] = np.log((nab / n_big) / ((na / n_uni) * (nb / n_uni)))
        df = df.sort_values(["pmi", "bigram"], ascending=[False, True]).head(20)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        bi.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["pmi", "bigram"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    out["pmi"] = out["pmi"].round(6)
    return out[["bigram", "n_ab", "pmi"]].astype({"n_ab": "int64"})


ALL_TERMS_QUERY = ("query", "window", "hash")  # the AND-search conjunction


def q_docs_matching_all_terms(sf_dir: str) -> pd.DataFrame:
    """Boolean AND retrieval (relational division over the postings list —
    the multi-term sibling of `term_postings`): doc_ids containing ALL query
    terms. Each document lives in one batch, so the containment test is a
    fully per-batch vectorized polars explode→unique→count — zero shuffle;
    only matching doc_ids leave the scan."""
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    terms = set(ALL_TERMS_QUERY)
    k = len(terms)

    def f(b: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.DataFrame(
                {
                    "doc_id": pl.from_arrow(b["doc_id"]),
                    "token": pl.from_arrow(b["text"]).str.split(" "),
                }
            )
            .explode("token")
            .filter(pl.col("token").is_in(list(terms)))
            .unique(subset=["doc_id", "token"])
            .group_by("doc_id")
            .len("hits")
            .filter(pl.col("hits") == k)
            .sort("doc_id")
        )
        return pa.table({"doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64())})

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64"})


def q_copurchase_bfs(sf_dir: str) -> pd.DataFrame:
    """Bounded BFS over the co-purchase graph from the smallest partkey:
    parts first reachable at hop 1, 2, 3. The SAME frontier-expansion loop
    as the crawl engine, on an analytics graph: per round, the frontier set
    broadcasts into an orderkey-bucket map_groups that emits parts sharing
    an order with a frontier part; the driver keeps the visited set
    (part-dimension-bounded, like the crawl's per-bucket seen filters).
    3 rounds = 3 bucket shuffles; no recursive all-pairs blowup. Frontier
    and visited ship ONCE per round via ray.put — a shared object-store
    read per task, not a per-task closure copy — and each bucket emits
    only NOT-yet-visited parts, so driver traffic is new-parts-sized."""
    import ray

    ds = _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def with_ob(b: pa.Table) -> pa.Table:
        ob = (b["l_orderkey"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(np.int32)
        return b.append_column("ob", pa.array(ob))

    bucketed = ds.map_batches(with_ob, batch_format="pyarrow")
    seed = int(
        ds.map_batches(
            lambda b: pa.table({"m": pa.array([pc.min(b["l_partkey"]).as_py()], pa.int64())}),
            batch_format="pyarrow",
        ).to_pandas()["m"].min()
    )

    visited = {seed}
    frontier = {seed}
    rows = [{"dist": 0, "n": 1}]
    for dist in (1, 2, 3):
        fr_ref = ray.put(np.fromiter(sorted(frontier), dtype=np.int64))
        vis_ref = ray.put(np.fromiter(sorted(visited), dtype=np.int64))

        def expand(g: pd.DataFrame, _fr=fr_ref, _vis=vis_ref) -> pd.DataFrame:
            fr, vis = ray.get(_fr), ray.get(_vis)
            d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
            pk = d["l_partkey"].to_numpy()
            hit_orders = d.loc[np.isin(pk, fr), "l_orderkey"].unique()
            nxt = d.loc[d["l_orderkey"].isin(hit_orders), "l_partkey"].unique()
            nxt = nxt[~np.isin(nxt, vis)]  # emit only newly-reached parts
            return pd.DataFrame({"p": np.sort(nxt).astype(np.int64)})

        reached = (
            bucketed.groupby("ob").map_groups(expand, batch_format="pandas").to_pandas()
        )
        nxt = (
            set(reached["p"].tolist()) - visited if "p" in reached.columns else set()
        )
        rows.append({"dist": dist, "n": len(nxt)})
        visited |= nxt
        frontier = nxt
        if not nxt:
            break
    out = pd.DataFrame(rows)
    # pad unreached levels with zero so the schema is scale-stable
    for dist in (1, 2, 3):
        if dist not in set(out["dist"]):
            out = pd.concat([out, pd.DataFrame([{"dist": dist, "n": 0}])])
    return out.sort_values("dist").reset_index(drop=True).astype({"dist": "int64", "n": "int64"})


def q_supplier_pctrank_nation(sf_dir: str) -> pd.DataFrame:
    """PERCENT_RANK() window over (nation, acctbal) — the grouped relative-
    rank shape (ntile/rank family). Nation-bucket shuffle + ONE segmented
    scan per bucket: rank = row position within its nation segment,
    pct = (rank-1)/(n-1) with the single-row group defined as 0."""
    from .joins import broadcast_join

    nat = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"]).rename_columns(
        ["s_nationkey", "n_name"]
    )
    ds = _tbl(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    named = broadcast_join(ds, nat, "s_nationkey", ["n_name"])

    def with_nb(b: pa.Table) -> pa.Table:
        nb = (b["s_nationkey"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(np.int32)
        return b.append_column("nb", pa.array(nb))

    def pct_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_name", "s_acctbal", "s_suppkey"], kind="stable")
        nn = g["n_name"].to_numpy()
        starts = np.flatnonzero(np.r_[True, nn[1:] != nn[:-1]])
        lens = np.diff(np.r_[starts, len(nn)])
        pos = np.arange(len(nn)) - np.repeat(starts, lens)
        denom = np.repeat(lens, lens) - 1
        pct = np.where(denom > 0, pos / np.maximum(denom, 1), 0.0)
        return pd.DataFrame(
            {"s_suppkey": g["s_suppkey"].to_numpy(), "n_name": nn, "pr": np.round(pct, 6)}
        )

    out = (
        named.map_batches(with_nb, batch_format="pyarrow")
        .groupby("nb")
        .map_groups(pct_seg, batch_format="pandas")
        .to_pandas()
        .sort_values(["n_name", "pr", "s_suppkey"])
        .reset_index(drop=True)
    )
    return out.astype({"s_suppkey": "int64"})


def q_doc_zipf_slope(sf_dir: str) -> pd.DataFrame:
    """Zipf's-law exponent of the corpus term-frequency distribution: OLS
    slope of ln(freq) on ln(rank) with deterministic (freq DESC, term) rank.
    Term counts aggregate distributed (per-batch distinct partials); the
    regression folds on the driver over the vocabulary-sized count table —
    the same result-sized-driver-fold contract as the contingency/chi²
    operator."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["text"])

    def f(b: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.DataFrame({"token": pl.from_arrow(b["text"]).str.split(" ")})
            .explode("token")
            .group_by("token")
            .len("c")
        )
        return pa.table(
            {
                "token": pa.array(df["token"].to_numpy(), pa.string()),
                "c": pa.array(df["c"].to_numpy(), pa.int64()),
            }
        )

    tc = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()  # vocabulary-sized
    )
    tc = tc.sort_values(["n", "token"], ascending=[False, True], kind="stable")
    lr = np.log(np.arange(1, len(tc) + 1, dtype=np.float64))
    lf = np.log(tc["n"].to_numpy(dtype=np.float64))
    n = float(len(tc))
    slope = (n * (lr * lf).sum() - lr.sum() * lf.sum()) / (n * (lr * lr).sum() - lr.sum() ** 2)
    return pd.DataFrame([{"slope": round(float(slope), 6), "n_terms": np.int64(len(tc))}])


# ------------------------------------------------------------ wave 24 -------


def q_lineitem_quality_audit(sf_dir: str) -> pd.DataFrame:
    """Constraint-violation audit in ONE scan (the validate_crawler.py:32-47
    acceptance-audit shape over a fact table): row count, domain-bound
    violations (quantity/discount/tax), and the part-FK miss count via the
    broadcast dimension key set — every check a vectorized predicate folded
    to per-batch partial sums."""
    from ray.data.aggregate import Sum

    part_keys = np.sort(
        _dim(sf_dir, "part", columns=["p_partkey"])["p_partkey"].to_numpy()
    )

    ds = _tbl(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_discount", "l_tax", "l_extendedprice"],
    )

    def audit(b: pa.Table) -> pa.Table:
        qty = b["l_quantity"].to_numpy()
        disc = b["l_discount"].to_numpy()
        tax = b["l_tax"].to_numpy()
        price = b["l_extendedprice"].to_numpy()
        pk = b["l_partkey"].to_numpy()
        pos = np.searchsorted(part_keys, pk)
        fk_ok = (pos < len(part_keys)) & (part_keys[np.clip(pos, 0, len(part_keys) - 1)] == pk)
        return pa.table(
            {
                "n_rows": pa.array([len(qty)], pa.int64()),
                "n_bad_qty": pa.array([int((qty <= 0).sum())], pa.int64()),
                "n_bad_discount": pa.array([int(((disc < 0) | (disc > 1)).sum())], pa.int64()),
                "n_bad_tax": pa.array([int(((tax < 0) | (tax > 1)).sum())], pa.int64()),
                "n_bad_price": pa.array([int((price <= 0).sum())], pa.int64()),
                "n_fk_miss": pa.array([int((~fk_ok).sum())], pa.int64()),
            }
        )

    parts = _coalesce_partials(ds.map_batches(audit, batch_format="pyarrow")).to_pandas()
    return pd.DataFrame([parts.sum().astype("int64").to_dict()])


def q_revenue_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of per-customer revenue — the inequality statistic
    (HHI's rank-based sibling). Needs Σ rank·x over GLOBALLY sorted totals:
    same two-pass value-bucket prefix plan as the KS statistic — per-bucket
    count/sum partials → driver exclusive cumsum → per-bucket sorted scan
    emits its Σ i·x partial with ranks = bucket offset + position. Ranks are
    unique (tiebreak custkey), matching ROW_NUMBER in the oracle."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    per_cust = (
        ds.map_batches(
            lambda b: _partial(b, ["o_custkey"], [("o_totalprice", "sum")]),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("o_totalprice_sum", alias_name="rev"))
    )
    _W = 100_000.0

    def with_vb(b: pa.Table) -> pa.Table:
        vb = (b["rev"].to_numpy() // _W).astype(np.int64)
        return b.append_column("vb", pa.array(vb))

    rows = per_cust.map_batches(with_vb, batch_format="pyarrow").materialize()
    bsums = (
        _coalesce_partials(
            rows.map_batches(
                lambda b: _partial(b.select(["vb"]), ["vb"], [([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby("vb")
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()
        .sort_values("vb")
    )
    n = float(bsums["c"].sum())
    offs = dict(
        zip(
            bsums["vb"].astype(int),
            np.concatenate(([0], np.cumsum(bsums["c"].to_numpy())[:-1])),
        )
    )

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["rev", "o_custkey"], kind="stable")
        x = g["rev"].to_numpy()
        i = np.arange(1, len(x) + 1, dtype=np.float64) + float(offs[int(g["vb"].iloc[0])])
        return pd.DataFrame({"six": [float((i * x).sum())], "sx": [float(x.sum())]})

    parts = rows.groupby("vb").map_groups(bucket_fold, batch_format="pandas").to_pandas()
    six, sx = float(parts["six"].sum()), float(parts["sx"].sum())
    gini = 2.0 * six / (n * sx) - (n + 1.0) / n
    return pd.DataFrame([{"gini": round(gini, 6), "n_customers": np.int64(int(n))}])


def q_price_mannwhitney(sf_dir: str) -> pd.DataFrame:
    """Mann–Whitney U (rank-sum) statistic between returned (R) and other
    lineitem prices, with tie-averaged ranks — the nonparametric sibling of
    the KS drift test, on the same value-bucket two-pass plan. Ties share a
    price, hence a bucket, so tie-averaging is bucket-local; the global rank
    of a bucket's first row = the driver's exclusive-cumsum offset."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_extendedprice", "l_returnflag"])
    _W = 2000.0

    def prep(b: pa.Table) -> pa.Table:
        x = b["l_extendedprice"].to_numpy()
        g = (np.asarray(b["l_returnflag"].to_pylist()) == "R").astype(np.int64)
        return pa.table(
            {
                "vb": pa.array((x // _W).astype(np.int64)),
                "x": pa.array(x, pa.float64()),
                "g1": pa.array(g),
            }
        )

    rows = ds.map_batches(prep, batch_format="pyarrow").materialize()
    bsums = (
        _coalesce_partials(
            rows.map_batches(
                lambda b: _partial(b, ["vb"], [([], "count_all"), ("g1", "sum")]),
                batch_format="pyarrow",
            )
        )
        .groupby("vb")
        .aggregate(Sum("count_all", alias_name="c"), Sum("g1_sum", alias_name="s1"))
        .to_pandas()
        .sort_values("vb")
    )
    n1 = float(bsums["s1"].sum())
    n0 = float(bsums["c"].sum() - bsums["s1"].sum())
    offs = dict(
        zip(
            bsums["vb"].astype(int),
            np.concatenate(([0], np.cumsum(bsums["c"].to_numpy())[:-1])),
        )
    )

    def bucket_r1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("x", kind="stable")
        x = g["x"].to_numpy()
        g1 = g["g1"].to_numpy()
        base = float(offs[int(g["vb"].iloc[0])])
        # rank of first row of each tie group + (tie_size - 1)/2 = avg rank
        starts = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
        lens = np.diff(np.r_[starts, len(x)])
        first_rank = base + starts + 1.0
        avg_rank = np.repeat(first_rank + (lens - 1) / 2.0, lens)
        return pd.DataFrame({"r1": [float((avg_rank * g1).sum())]})

    parts = rows.groupby("vb").map_groups(bucket_r1, batch_format="pandas").to_pandas()
    r1 = float(parts["r1"].sum())
    u1 = r1 - n1 * (n1 + 1.0) / 2.0
    return pd.DataFrame(
        [
            {
                "u1": round(u1, 4),
                "n_returned": np.int64(int(n1)),
                "n_other": np.int64(int(n0)),
            }
        ]
    )


def q_revenue_max_drawdown(sf_dir: str) -> pd.DataFrame:
    """Maximum drawdown of the daily-revenue series: the largest drop from a
    running peak — the sequential risk statistic. Daily totals aggregate
    distributed (date-keyed partials); the series is calendar-bounded
    (result-sized), so the cummax scan folds on the driver."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "day": pc.strftime(b["o_orderdate"], format="%Y-%m-%d"),
                "v": b["o_totalprice"],
            }
        )
        return _partial(t, ["day"], [("v", "sum")])

    daily = (
        _coalesce_partials(ds.map_batches(prep, batch_format="pyarrow"))
        .groupby("day")
        .aggregate(Sum("v_sum", alias_name="r"))
        .to_pandas()
        .sort_values("day")
    )
    v = daily["r"].to_numpy()
    dd = np.maximum.accumulate(v) - v
    return pd.DataFrame(
        [{"max_drawdown": round(float(dd.max()), 4), "n_days": np.int64(len(v))}]
    )


def q_doc_ttr_buckets(sf_dir: str) -> pd.DataFrame:
    """Lexical diversity histogram: docs bucketed by type-token ratio decile
    (distinct tokens / tokens) — a curation quality signal alongside the
    Gopher gate. Each doc lives in one batch → per-batch exact polars
    distinct counts; the shuffle moves (bucket, count) partials."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.DataFrame(
                {
                    "doc_id": pl.from_arrow(b["doc_id"]),
                    "token": pl.from_arrow(b["text"]).str.split(" "),
                }
            )
            .explode("token")
            .group_by("doc_id")
            .agg(
                pl.col("token").n_unique().alias("tt"),
                pl.col("token").len().alias("nt"),
            )
        )
        ttr = df["tt"].to_numpy() / df["nt"].to_numpy()
        bucket = np.minimum((ttr * 10).astype(np.int64), 9)
        t = pa.table({"ttr_decile": pa.array(bucket), "one": pa.array(np.ones(len(bucket), np.int64))})
        return _partial(t, ["ttr_decile"], [("one", "sum")]).rename_columns(
            ["ttr_decile", "n"]
        )

    out = (
        _coalesce_partials(ds.map_batches(f, batch_format="pyarrow"))
        .groupby("ttr_decile")
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
        .sort_values("ttr_decile")
        .reset_index(drop=True)
    )
    return out.astype({"ttr_decile": "int64", "n_docs": "int64"})


# ------------------------------------------------------------ wave 25 -------


def q_monthly_churn(sf_dir: str) -> pd.DataFrame:
    """Month-over-month churn: users active in month M but silent in M+1,
    per month. The distinct (user, month) activity set folds per batch,
    dedupes on one (user-bucket) shuffle, and churn resolves inside each
    bucket by a segmented scan over the user's sorted month sequence — no
    self-join of the activity table."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.strftime(b["ts"], format="%Y-%m")
        t = pa.table({"user_id": b["user_id"], "month": m})
        t = t.group_by(["user_id", "month"]).aggregate([])  # per-batch distinct
        ub = (t["user_id"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(np.int32)
        return t.append_column("ub", pa.array(ub))

    def churn_seg(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "month"]].drop_duplicates().sort_values(["user_id", "month"])
        uid = d["user_id"].to_numpy()
        mon = d["month"].to_numpy()
        # next month label per row
        ym = np.array([(int(x[:4]), int(x[5:7])) for x in mon])
        nxt_y = ym[:, 0] + (ym[:, 1] == 12)
        nxt_m = np.where(ym[:, 1] == 12, 1, ym[:, 1] + 1)
        nxt = np.array([f"{y:04d}-{m:02d}" for y, m in zip(nxt_y, nxt_m)])
        same_user_next = np.r_[(uid[1:] == uid[:-1]) & (mon[1:] == nxt[:-1]), False]
        churned = ~same_user_next
        out = pd.DataFrame({"month": mon[churned]})
        return out.groupby("month").size().rename("n_churned").reset_index()

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(churn_seg, batch_format="pandas")
        .groupby("month")
        .aggregate(Sum("n_churned", alias_name="n_churned"))
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    return out.astype({"n_churned": "int64"})


def q_neardup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate contamination matrix: Jaccard≥0.8 pair counts per
    unordered SOURCE pair (which feeds leak between sources?) — the LSH
    near-dup miner composed with a source attribution. The pair set is
    dup-rate-bounded (same contract as dedup_clusters); sources attach by
    broadcasting the pair-doc id set into ONE pruned documents scan (a
    broadcast semi-join — documents never shuffles), then the tiny
    (doc→source) map resolves pairs on the driver."""
    pairs = q_docs_jaccard_pairs(sf_dir)
    if not isinstance(pairs, pd.DataFrame):
        pairs = pairs.to_pandas()
    if pairs.empty:
        return pd.DataFrame(
            {
                "source_a": pd.Series([], dtype=str),
                "source_b": pd.Series([], dtype=str),
                "n_pairs": pd.Series([], dtype="int64"),
            }
        )
    wanted = np.unique(np.concatenate([pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()]))

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "source"])

    def pick(b: pa.Table, _w=wanted) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        pos = np.searchsorted(_w, ids)
        hit = (pos < len(_w)) & (_w[np.clip(pos, 0, len(_w) - 1)] == ids)
        return b.filter(pa.array(hit))

    src = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    smap = dict(zip(src["doc_id"], src["source"]))
    sa = pairs["id_a"].map(smap)
    sb = pairs["id_b"].map(smap)
    lo = np.minimum(sa, sb)
    hi = np.maximum(sa, sb)
    out = (
        pd.DataFrame({"source_a": lo, "source_b": hi})
        .groupby(["source_a", "source_b"])
        .size()
        .rename("n_pairs")
        .reset_index()
        .sort_values(["n_pairs", "source_a", "source_b"], ascending=[False, True, True])
        .head(10)
        .reset_index(drop=True)
    )
    return out.astype({"n_pairs": "int64"})


def q_events_value_winsorized_mean(sf_dir: str) -> pd.DataFrame:
    """Winsorized mean of event value: clip at the exact discrete p05/p95
    (distributed histogram-refinement selection, see _quantile_disc), then
    one vectorized clip+sum scan — the robust-mean data-cleaning op."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["value"])
    qd = _quantile_disc(ds, "value", (0.05, 0.95))
    lo, hi = float(qd[0.05]), float(qd[0.95])

    def fold(b: pa.Table) -> pa.Table:
        v = np.clip(b["value"].to_numpy(), lo, hi)
        return pa.table(
            {"s": pa.array([float(v.sum())], pa.float64()), "n": pa.array([len(v)], pa.int64())}
        )

    parts = _coalesce_partials(ds.map_batches(fold, batch_format="pyarrow")).to_pandas()
    mean = float(parts["s"].sum()) / float(parts["n"].sum())
    return pd.DataFrame(
        [
            {
                "winsorized_mean": round(mean, 6),
                "p05": round(lo, 6),
                "p95": round(hi, 6),
            }
        ]
    )


def q_events_sliding_30d_revenue(sf_dir: str) -> pd.DataFrame:
    """Sliding event-time window aggregate: total purchase value per 28-day
    window sliding by 7 days (calendar-aligned to the corpus epoch). The
    window/slide replication runs INSIDE map_batches — each event emits its
    ⌈28/7⌉ = 4 covering windows as (window_start, value) partials — so the
    shuffle moves per-batch window partials, never event replicas. The
    generic streaming-window shape Ray Data lacks natively (SURVEY §2.9
    windowed-rate family)."""
    from ray.data.aggregate import Sum

    W, S = 28, 7  # window/slide, days
    epoch = np.datetime64("1995-01-01")

    ds = _tbl(sf_dir, "events", columns=["ts", "event_type", "value"])

    def windows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "purchase"))
        if b.num_rows == 0:
            return pa.table(
                {"win_start": pa.array([], pa.string()), "v": pa.array([], pa.float64())}
            )
        days = (
            (b["ts"].to_numpy().astype("datetime64[D]") - epoch).astype(np.int64)
        )
        v = b["value"].to_numpy()
        k = W // S
        last = (days // S) * S  # latest window start covering the event
        starts = last[:, None] - np.arange(k)[None, :] * S  # k covering starts
        vv = np.repeat(v, k)
        ss = starts.ravel()
        keep = ss >= 0
        labels = (epoch + ss[keep]).astype("datetime64[D]").astype(str)
        t = pa.table({"win_start": pa.array(labels, pa.string()), "v": pa.array(vv[keep], pa.float64())})
        return _partial(t, ["win_start"], [("v", "sum")]).rename_columns(["win_start", "v"])

    out = (
        _coalesce_partials(ds.map_batches(windows, batch_format="pyarrow"))
        .groupby("win_start")
        .aggregate(Sum("v", alias_name="r"))
        .to_pandas()
        .sort_values("win_start")
        .reset_index(drop=True)
    )
    out["revenue"] = out["r"].round(4)
    return out[["win_start", "revenue"]]


# ------------------------------------------------------------ wave 26 -------


IVF_KNN_BCAST_MAX = 200_000  # rows; above this the IVF path replaces broadcast


def _knn_ivf_table(sf_dir: str) -> tuple[str, np.ndarray]:
    """LABELED twin of the IVF assignment table — (vec_id, embedding,
    label) partitioned by coarse bucket, built once and cached beside the
    shared unlabeled index (whose schema other ANN queries depend on).
    One streaming assign pass over the corpus; centroids come from the
    cached `_ivf_index` k-means fit."""
    from ..sources import lance_table as lt

    _ipath, cents = _ivf_index(sf_dir)
    path = _ivf_index_path(sf_dir) + "-labeled"
    if lt.exists(path):
        return path, cents

    def assign(b: pa.Table) -> pa.Table:
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        en = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        bucket = np.argmax(en @ cents.T, axis=1).astype(np.int32)
        return b.append_column("bucket", pa.array(bucket, pa.int32()))

    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]).map_batches(
        assign, batch_format="pyarrow"
    )
    lt.write_dataset(ds, path, partition_col="bucket")
    return path, cents


def _knn_label_agreement_ivf(sf_dir: str, emit_pairs: bool = False):
    """IVF-probed leave-one-out 1-NN label agreement — the 100 TB path of
    q_knn_label_agreement: instead of broadcasting the full corpus matrix,
    each of the IVF_K coarse buckets is one task that reads ONLY its own
    partition (queries) plus the IVF_NPROBE centroid-nearest partitions
    (candidates) from the bucket-partitioned labeled index — a pruned,
    node-local read, ≈ NPROBE/K of the corpus per task (bucket size is
    bounded by K ∝ N/target-size, the same partitioning assumption
    semantic_dedup documents). Candidates are vec_id-sorted so argmax
    keeps the broadcast path's (sim DESC, vec_id ASC) tiebreak; each task
    folds to a (hits, n) partial — result-sized driver traffic.
    Approximate by construction (recall asserted in tests/test_round5.py).
    ``emit_pairs`` returns per-row (vec_id, nn_id, hit) for tests."""
    import ray.data as rd

    from ..sources import lance_table as lt

    path, cents = _knn_ivf_table(sf_dir)
    order = np.argsort(-(cents @ cents.T), axis=1)[:, :IVF_NPROBE]
    probes = {}
    for b in range(IVF_K):
        lst = order[b].tolist()
        probes[b] = lst if b in lst else [b] + lst[:-1]
    frag = {b: lt.fragment_paths(path, [b]) for b in range(IVF_K)}

    def per_bucket(batch: pa.Table) -> pa.Table:
        out_v, out_nn, out_hit = [], [], []
        h_tot = n_tot = 0
        for b in batch["id"].to_pylist():
            if not frag.get(b):
                continue
            q = pa.concat_tables([pq.read_table(p) for p in frag[b]])
            cand_paths = [p for nb in probes[b] for p in frag.get(int(nb), [])]
            c = pa.concat_tables([pq.read_table(p) for p in cand_paths])
            c_ids = c["vec_id"].to_numpy()
            srt = np.argsort(c_ids, kind="stable")
            c_ids = c_ids[srt]
            c_lab = c["label"].to_numpy()[srt]
            ce = np.array(c["embedding"].to_pylist(), dtype=np.float64)[srt]
            ce /= np.maximum(np.linalg.norm(ce, axis=1, keepdims=True), 1e-12)
            q_ids = q["vec_id"].to_numpy()
            qe = np.array(q["embedding"].to_pylist(), dtype=np.float64)
            qe /= np.maximum(np.linalg.norm(qe, axis=1, keepdims=True), 1e-12)
            sims = qe @ ce.T
            self_pos = np.searchsorted(c_ids, q_ids)  # queries ⊂ candidates
            sims[np.arange(len(q_ids)), self_pos] = -np.inf
            nn = np.argmax(sims, axis=1)  # first max = smallest vec_id on ties
            hit = c_lab[nn] == q["label"].to_numpy()
            if emit_pairs:
                out_v.append(q_ids)
                out_nn.append(c_ids[nn])
                out_hit.append(hit.astype(np.int64))
            else:
                h_tot += int(hit.sum())
                n_tot += len(hit)
        if emit_pairs:
            v = np.concatenate(out_v) if out_v else np.empty(0, np.int64)
            nn = np.concatenate(out_nn) if out_nn else np.empty(0, np.int64)
            ht = np.concatenate(out_hit) if out_hit else np.empty(0, np.int64)
            return pa.table(
                {
                    "vec_id": pa.array(v.astype(np.int64)),
                    "nn_id": pa.array(nn.astype(np.int64)),
                    "hit": pa.array(ht),
                }
            )
        return pa.table(
            {"h": pa.array([h_tot], pa.int64()), "n": pa.array([n_tot], pa.int64())}
        )

    parts = (
        rd.range(IVF_K, override_num_blocks=IVF_K)
        .map_batches(per_bucket, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    if emit_pairs:
        return parts.sort_values("vec_id").reset_index(drop=True)
    h, n = int(parts["h"].sum()), int(parts["n"].sum())
    return pd.DataFrame([{"acc": round(h / n, 6), "n": np.int64(n)}])


def q_knn_label_agreement(sf_dir: str) -> pd.DataFrame:
    """Embedding-space quality probe: leave-one-out 1-NN label agreement
    (does the nearest neighbour share my label?). The corpus matrix ships
    ONCE via ray.put; each batch does one (B×d)·(d×N) matmul against it and
    takes a self-masked argmax — columns are vec_id-ordered, so numpy's
    first-max tiebreak IS the oracle's (sim DESC, vec_id ASC). Above
    IEPS_KNN_BCAST_MAX_ROWS (default 200k) the broadcast swaps for the
    IVF-probed path (`_knn_label_agreement_ivf`, same contract as
    embedding_topk_ivf — partition-pruned reads, no full-matrix ship);
    the probe semantics stay per-row."""
    import ray

    n_vec = pq.read_metadata(_pq(sf_dir, "embeddings")).num_rows
    bcast_max = int(
        os.environ.get("IEPS_KNN_BCAST_MAX_ROWS", str(IVF_KNN_BCAST_MAX)) or 0
    )
    if bcast_max and n_vec > bcast_max:
        return _knn_label_agreement_ivf(sf_dir)

    emb = _dim(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    order = pc.sort_indices(emb["vec_id"])
    emb = emb.take(order)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    mat = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids, labels, mat.T))

    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    class Agree:
        def __init__(self):
            self.ids, self.labels, self.matT = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            e = np.array(b["embedding"].to_pylist(), dtype=np.float64)
            e = e / np.linalg.norm(e, axis=1, keepdims=True)
            sims = e @ self.matT  # B × N
            my = np.searchsorted(self.ids, b["vec_id"].to_numpy())
            sims[np.arange(len(my)), my] = -np.inf  # mask self
            nn = np.argmax(sims, axis=1)  # first max = smallest vec_id on ties
            hit = (self.labels[nn] == b["label"].to_numpy()).astype(np.int64)
            return pa.table(
                {
                    "h": pa.array([int(hit.sum())], pa.int64()),
                    "n": pa.array([len(hit)], pa.int64()),
                }
            )

    parts = _coalesce_partials(
        ds.map_batches(Agree, concurrency=2, batch_size=256, batch_format="pyarrow")
    ).to_pandas()
    h, n = int(parts["h"].sum()), int(parts["n"].sum())
    return pd.DataFrame([{"acc": round(h / n, 6), "n": np.int64(n)}])


def q_mmr_diverse_topk(sf_dir: str) -> pd.DataFrame:
    """Maximal-marginal-relevance diverse top-10 vs the broadcast query
    (λ=0.7): greedy rerank balancing query similarity against similarity to
    already-selected results. Candidate pool = distributed partial top-50 by
    plain cosine (per-batch matmul + 50-row driver merge, the
    embedding_topk plan); the O(k·pool) greedy runs on the pool only. Not
    SQL-expressible (iterative argmax) → golden-pinned."""
    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)
    POOL, K, LAM = 50, 10, 0.7

    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def topk(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy()
        mask = ids != 0
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)[mask]
        ids = ids[mask]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64()),
                 "emb": pa.array([], pa.list_(pa.float64()))}
            )
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        sims = en @ qn
        k = min(POOL, len(ids))
        top = np.argpartition(-sims, k - 1)[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "sim": pa.array(sims[top], pa.float64()),
                "emb": pa.array([r.tolist() for r in en[top]], pa.list_(pa.float64())),
            }
        )

    pool = ds.map_batches(topk, batch_format="pyarrow").to_pandas()
    pool = pool.sort_values(["sim", "vec_id"], ascending=[False, True]).head(POOL)
    ids = pool["vec_id"].to_numpy()
    sims = pool["sim"].to_numpy()
    vecs = np.array(pool["emb"].tolist(), dtype=np.float64)

    chosen: list[int] = []
    rows = []
    cand = np.arange(len(ids))
    max_sel = np.zeros(len(ids))
    for rank in range(1, min(K, len(ids)) + 1):
        score = LAM * sims[cand] - (0.0 if not chosen else (1 - LAM)) * max_sel[cand]
        # deterministic tiebreak: smallest vec_id among equal scores
        best_pos = np.lexsort((ids[cand], -score))[0]
        pick = cand[best_pos]
        rows.append(
            {"rank": rank, "vec_id": int(ids[pick]), "mmr_score": round(float(score[best_pos]), 6)}
        )
        chosen.append(pick)
        cand = cand[cand != pick]
        if len(cand):
            max_sel[cand] = np.maximum(max_sel[cand], vecs[cand] @ vecs[pick])
    return pd.DataFrame(rows).astype({"rank": "int64", "vec_id": "int64"})


# ------------------------------------------------------------ wave 27 -------


def q_doc_quality_pctrank(sf_dir: str) -> pd.DataFrame:
    """FACT-scale grouped PERCENT_RANK: each document's length percentile
    within its language (the per-group calibration step of a quality gate).
    Unlike the dimension-sized supplier variant, this cannot fold on the
    driver: ranks come from the value-bucket two-pass — per-(lang, bucket)
    count partials → driver exclusive cumsum per lang → per-bucket segmented
    scan assigns rank()-with-ties = lang offset + tie-group start."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    _W = 64  # n_chars bucket width

    def prep(b: pa.Table) -> pa.Table:
        vb = (b["n_chars"].to_numpy() // _W).astype(np.int64)
        return b.append_column("vb", pa.array(vb))

    rows = ds.map_batches(prep, batch_format="pyarrow").materialize()
    bsums = (
        _coalesce_partials(
            rows.map_batches(
                lambda b: _partial(b.select(["lang", "vb"]), ["lang", "vb"], [([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby(["lang", "vb"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()
        .sort_values(["lang", "vb"])
    )
    n_of = bsums.groupby("lang")["c"].sum().to_dict()
    bsums["off"] = bsums.groupby("lang")["c"].cumsum() - bsums["c"]
    offs = {(l, int(v)): int(o) for l, v, o in zip(bsums["lang"], bsums["vb"], bsums["off"])}

    def pct_seg(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, gg in g.groupby("lang"):
            gg = gg.sort_values(["n_chars", "doc_id"], kind="stable")
            x = gg["n_chars"].to_numpy()
            base = offs[(lang, int(gg["vb"].iloc[0]))]
            starts = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
            lens = np.diff(np.r_[starts, len(x)])
            rank = np.repeat(base + starts + 1, lens)  # rank() — ties share
            n = n_of[lang]
            pr = (rank - 1) / max(n - 1, 1) if n > 1 else np.zeros(len(x))
            out.append(
                pd.DataFrame(
                    {"doc_id": gg["doc_id"].to_numpy(), "lang": lang, "pr": np.round(pr, 6)}
                )
            )
        return pd.concat(out) if out else pd.DataFrame({"doc_id": [], "lang": [], "pr": []})

    out = (
        rows.groupby(["lang", "vb"])
        .map_groups(pct_seg, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64"})


def q_copurchase_link_prediction(sf_dir: str) -> pd.DataFrame:
    """Link prediction on the co-purchase graph: top-10 part pairs by
    common-neighbour count among pairs NOT already co-ordered (the
    recommender candidate-generation shape). Wedge enumeration reuses the
    triangle plan — pairs emit per neighbour hub (orderkey-bucket shuffle,
    vectorized segment pair math on the hub's sorted adjacency), counts fold
    pair-keyed, and existing edges drop via the same banded broadcast edge
    test as copurchase_triangles."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def with_ob(b: pa.Table) -> pa.Table:
        ob = (b["l_orderkey"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(np.int32)
        return b.append_column("ob", pa.array(ob))

    bucketed = ds.map_batches(with_ob, batch_format="pyarrow").materialize()

    def pairs_seg(g: pd.DataFrame) -> pd.DataFrame:
        d = (
            g[["l_orderkey", "l_partkey"]]
            .drop_duplicates()
            .sort_values(["l_orderkey", "l_partkey"], kind="stable")
        )
        ok = d["l_orderkey"].to_numpy()
        pk = d["l_partkey"].to_numpy()
        n = len(ok)
        if n == 0:
            return pd.DataFrame({"part_a": [], "part_b": [], "n": []})
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)
        rem = np.repeat(lens, lens) - pos - 1
        total = int(rem.sum())
        if total == 0:
            return pd.DataFrame({"part_a": [], "part_b": [], "n": []})
        a_idx = np.repeat(np.arange(n), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem) + 1
        out = pd.DataFrame({"part_a": pk[a_idx], "part_b": pk[a_idx + off]})
        return out.groupby(["part_a", "part_b"]).size().rename("n").reset_index()

    # direct co-order edge set (for the NOT-an-edge filter) — dup-bounded,
    # broadcast as a sorted composite-key array (copurchase_triangles plan)
    edges = (
        bucketed.groupby("ob")
        .map_groups(pairs_seg, batch_format="pandas")
        .groupby(["part_a", "part_b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    ekeys = np.sort(
        edges["part_a"].to_numpy().astype(np.uint64) * np.uint64(1 << 32)
        + edges["part_b"].to_numpy().astype(np.uint64)
    )

    # wedges: for each part hub, pairs of its NEIGHBOURS share that hub;
    # build the neighbour adjacency by re-keying edges both directions on a
    # part-hash bucket, then the same segment pair math per hub
    both = pd.concat(
        [
            edges.rename(columns={"part_a": "hub", "part_b": "nb"})[["hub", "nb"]],
            edges.rename(columns={"part_b": "hub", "part_a": "nb"})[["hub", "nb"]],
        ]
    )
    import ray.data as rd

    adj = rd.from_pandas(both).repartition(8)

    def with_hb(b: pa.Table) -> pa.Table:
        hb = (b["hub"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(np.int32)
        return b.append_column("hb", pa.array(hb))

    def wedge_seg(g: pd.DataFrame) -> pd.DataFrame:
        """emit per-hub neighbour pairs PRE-COUNTED and keyed by a fixed
        64-ary pair-hash bucket — the downstream exchange is a coarse
        64-group shuffle + one segmented fold per group, never a fine
        pair-keyed aggregate over every wedge."""
        d = g[["hub", "nb"]].drop_duplicates().sort_values(["hub", "nb"], kind="stable")
        hub = d["hub"].to_numpy()
        nb = d["nb"].to_numpy()
        n = len(hub)
        empty = pd.DataFrame(
            {
                "pb2": pd.Series([], dtype="int32"),
                "key": pd.Series([], dtype="uint64"),
                "n": pd.Series([], dtype="int64"),
            }
        )
        if n == 0:
            return empty
        starts = np.flatnonzero(np.r_[True, hub[1:] != hub[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)
        rem = np.repeat(lens, lens) - pos - 1
        total = int(rem.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem) + 1
        key = nb[a_idx].astype(np.uint64) * np.uint64(1 << 32) + nb[a_idx + off].astype(
            np.uint64
        )
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame(
            {
                "pb2": (uk % np.uint64(_N_UB)).astype(np.int32),
                "key": uk,
                "n": cnt.astype(np.int64),
            }
        )

    def fold_bucket(g: pd.DataFrame, _ek=ekeys) -> pd.DataFrame:
        agg = g.groupby("key")["n"].sum()
        key = agg.index.to_numpy().astype(np.uint64)
        common = agg.to_numpy()
        pos = np.searchsorted(_ek, key)
        is_edge = (pos < len(_ek)) & (_ek[np.clip(pos, 0, len(_ek) - 1)] == key)
        key, common = key[~is_edge], common[~is_edge]
        pa_ = (key >> np.uint64(32)).astype(np.int64)
        pb_ = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
        df = pd.DataFrame({"part_a": pa_, "part_b": pb_, "common": common})
        return df.sort_values(
            ["common", "part_a", "part_b"], ascending=[False, True, True]
        ).head(10)

    out = (
        adj.map_batches(with_hb, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(wedge_seg, batch_format="pandas")
        .groupby("pb2")
        .map_groups(fold_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values(["common", "part_a", "part_b"], ascending=[False, True, True])
        .head(10)
        .reset_index(drop=True)
    )
    return out.astype({"part_a": "int64", "part_b": "int64", "common": "int64"})


def q_customer_cohort_ltv(sf_dir: str) -> pd.DataFrame:
    """Cohort LTV matrix: average cumulative-to-date revenue per (first-order
    YEAR cohort, years since first order). Two passes over orders: (1)
    per-customer first-order year (keyed min partials), broadcast back as a
    result-sized map; (2) (cohort, age) revenue partials. The matrix is
    calendar²-bounded → driver fold of the cumulative sum."""
    from ray.data.aggregate import Min, Sum

    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def first_prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"o_custkey": b["o_custkey"], "y": pc.cast(pc.year(b["o_orderdate"]), pa.int64())}
        )
        return _partial(t, ["o_custkey"], [("y", "min")])

    first = (
        ds.map_batches(first_prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Min("y_min", alias_name="cohort"))
        .to_pandas()  # customer-dimension-sized
    )
    cmap = dict(zip(first["o_custkey"], first["cohort"]))
    n_cust = first.groupby("cohort").size().to_dict()

    def rev_prep(b: pa.Table, _c=cmap) -> pa.Table:
        y = pc.cast(pc.year(b["o_orderdate"]), pa.int64()).to_numpy()
        co = pd.Series(b["o_custkey"].to_numpy()).map(_c).to_numpy()
        t = pa.table(
            {
                "cohort": pa.array(co, pa.int64()),
                "age": pa.array(y - co, pa.int64()),
                "v": b["o_totalprice"],
            }
        )
        return _partial(t, ["cohort", "age"], [("v", "sum")])

    mat = (
        _coalesce_partials(ds.map_batches(rev_prep, batch_format="pyarrow"))
        .groupby(["cohort", "age"])
        .aggregate(Sum("v_sum", alias_name="r"))
        .to_pandas()
        .sort_values(["cohort", "age"])
    )
    mat["cum"] = mat.groupby("cohort")["r"].cumsum()
    mat["avg_ltv"] = (mat["cum"] / mat["cohort"].map(n_cust)).round(4)
    return mat[["cohort", "age", "avg_ltv"]].reset_index(drop=True).astype(
        {"cohort": "int64", "age": "int64"}
    )


def q_orders_benford(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit audit of order totals: observed digit shares vs
    the Benford expectation log10(1+1/d) — the fraud/synthetic-data screen.
    One scan of digit partials; the 9-row fold happens on the driver."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_totalprice"])

    def digits(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy()
        d = np.floor(v / np.power(10.0, np.floor(np.log10(v)))).astype(np.int64)
        t = pa.table({"digit": pa.array(d), "one": pa.array(np.ones(len(d), np.int64))})
        return _partial(t, ["digit"], [("one", "sum")]).rename_columns(["digit", "n"])

    obs = (
        _coalesce_partials(ds.map_batches(digits, batch_format="pyarrow"))
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .set_index("digit")["n"]
        .reindex(range(1, 10), fill_value=0)
    )
    n = float(obs.sum())
    share = obs.to_numpy() / n
    exp = np.log10(1.0 + 1.0 / np.arange(1, 10))
    out = pd.DataFrame(
        {
            "digit": np.arange(1, 10, dtype=np.int64),
            "n": obs.to_numpy().astype(np.int64),
            "share": np.round(share, 6),
            "benford": np.round(exp, 6),
        }
    )
    return out


# ------------------------------------------------------------ wave 28 -------


def q_price_iqr_outliers(sf_dir: str) -> pd.DataFrame:
    """Tukey-fence outlier screen on lineitem price: exact Q1/Q3 via the
    distributed histogram-refinement selection (_quantile_disc), then one
    vectorized fence-count scan — the classic robust outlier-rate audit."""
    ds = _tbl(sf_dir, "lineitem", columns=["l_extendedprice"])
    qd = _quantile_disc(ds, "l_extendedprice", (0.25, 0.75))
    q1, q3 = float(qd[0.25]), float(qd[0.75])
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)

    def fold(b: pa.Table) -> pa.Table:
        v = b["l_extendedprice"].to_numpy()
        return pa.table(
            {
                "nl": pa.array([int((v < lo).sum())], pa.int64()),
                "nh": pa.array([int((v > hi).sum())], pa.int64()),
            }
        )

    parts = _coalesce_partials(ds.map_batches(fold, batch_format="pyarrow")).to_pandas()
    return pd.DataFrame(
        [
            {
                "q1": round(q1, 4),
                "q3": round(q3, 4),
                "n_low": np.int64(int(parts["nl"].sum())),
                "n_high": np.int64(int(parts["nh"].sum())),
            }
        ]
    )


def q_doc_length_anova(sf_dir: str) -> pd.DataFrame:
    """One-way ANOVA F statistic of document length across languages — the
    between-group-effect test completing the drift-test family (chi² for
    categorical, KS/MWU for two-sample, F for k-group means). One scan of
    per-lang (n, Σx, Σx²) partials; the k-row fold runs on the driver."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["lang", "n_chars"])

    def prep(b: pa.Table) -> pa.Table:
        x = b["n_chars"].to_numpy().astype(np.float64)
        t = pa.table({"lang": b["lang"], "x": pa.array(x), "x2": pa.array(x * x)})
        return _partial(t, ["lang"], [("x", "sum"), ("x2", "sum"), ([], "count_all")])

    g = (
        _coalesce_partials(ds.map_batches(prep, batch_format="pyarrow"))
        .groupby("lang")
        .aggregate(
            Sum("x_sum", alias_name="s"),
            Sum("x2_sum", alias_name="s2"),
            Sum("count_all", alias_name="n"),
        )
        .to_pandas()
    )
    n = g["n"].to_numpy(dtype=np.float64)
    s = g["s"].to_numpy()
    s2 = g["s2"].to_numpy()
    N, k = n.sum(), len(g)
    mean = s.sum() / N
    ssb = float((n * (s / n - mean) ** 2).sum())
    ssw = float((s2 - s * s / n).sum())
    f = (ssb / (k - 1)) / (ssw / (N - k))
    return pd.DataFrame(
        [{"f_stat": round(f, 6), "df_between": np.int64(k - 1), "df_within": np.int64(int(N - k))}]
    )


def q_terms_llr_keyness(sf_dir: str) -> pd.DataFrame:
    """Dunning log-likelihood-ratio keyness: the 20 terms most
    characteristic of source 'src0' vs the rest of the corpus — the
    corpus-comparison op of a curation pipeline. Token counts fold per batch
    into (term, in-src0, elsewhere) partials (vocabulary-sized shuffle);
    the LLR scoring is per-term scalar math on the aggregated vocabulary
    with a per-batch partial top-k."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["source", "text"])

    def counts(b: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.DataFrame(
                {
                    "in0": pl.Series(
                        [s == "src0" for s in b["source"].to_pylist()], dtype=pl.Int64
                    ),
                    "token": pl.from_arrow(b["text"]).str.split(" "),
                }
            )
            .explode("token")
            .group_by("token")
            .agg(pl.col("in0").sum().alias("a"), (1 - pl.col("in0")).sum().alias("b"))
        )
        return pa.table(
            {
                "token": pa.array(df["token"].to_numpy(), pa.string()),
                "a": pa.array(df["a"].to_numpy(), pa.int64()),
                "b": pa.array(df["b"].to_numpy(), pa.int64()),
            }
        )

    vocab = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("a", alias_name="a"), Sum("b", alias_name="b"))
    )
    tot = vocab.map_batches(
        lambda t: pa.table(
            {
                "ca": pa.array([int(pc.sum(t["a"]).as_py() or 0)], pa.int64()),
                "cb": pa.array([int(pc.sum(t["b"]).as_py() or 0)], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    ca, cb = float(tot["ca"].sum()), float(tot["cb"].sum())

    def xlogx(v):  # 0·ln0 := 0
        return np.where(v > 0, v * np.log(np.maximum(v, 1e-300)), 0.0)

    def score(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["a"] + df["b"] >= 10]
        if df.empty:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "llr": pa.array([], pa.float64()),
                }
            )
        a = df["a"].to_numpy(dtype=np.float64)
        b = df["b"].to_numpy(dtype=np.float64)
        ea = (a + b) * ca / (ca + cb)
        eb = (a + b) * cb / (ca + cb)
        llr = 2.0 * (
            xlogx(a) - a * np.log(ea) + xlogx(b) - b * np.log(eb)
        )
        # keyness: positive enrichment in src0 only
        llr = np.where(a / ca > (a + b) / (ca + cb), llr, -llr)
        df["llr"] = llr
        df = df.sort_values(["llr", "token"], ascending=[False, True]).head(20)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        vocab.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["llr", "token"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    out["llr"] = out["llr"].round(6)
    return out[["token", "a", "b", "llr"]].astype({"a": "int64", "b": "int64"})


# ------------------------------------------------------------ wave 29 -------


def q_doc_burstiness(sf_dir: str) -> pd.DataFrame:
    """Term burstiness (Church-Gale): variance-to-mean ratio of per-document
    counts among documents CONTAINING the term, top-20 over df ≥ 20 — the
    corpus-linguistics dispersion stat. Each doc lives in one batch, so
    (token, doc) counts are per-batch exact; the shuffle moves (token,
    df, Σc, Σc²) moment partials — vocabulary-sized — and the VMR math +
    partial top-k stay per-batch."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def moments(b: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.DataFrame(
                {
                    "doc_id": pl.from_arrow(b["doc_id"]),
                    "token": pl.from_arrow(b["text"]).str.split(" "),
                }
            )
            .explode("token")
            .group_by(["doc_id", "token"])
            .len("c")
            .group_by("token")
            .agg(
                pl.len().alias("df"),
                pl.col("c").sum().alias("s"),
                (pl.col("c") * pl.col("c")).sum().alias("s2"),
            )
        )
        return pa.table(
            {
                "token": pa.array(df["token"].to_numpy(), pa.string()),
                "df": pa.array(df["df"].to_numpy().astype(np.int64)),
                "s": pa.array(df["s"].to_numpy().astype(np.int64)),
                "s2": pa.array(df["s2"].to_numpy().astype(np.int64)),
            }
        )

    vocab = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("token")
        .aggregate(
            Sum("df", alias_name="df"), Sum("s", alias_name="s"), Sum("s2", alias_name="s2")
        )
    )

    def score(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["df"] >= 20]
        if df.empty:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "burstiness": pa.array([], pa.float64()),
                }
            )
        n = df["df"].to_numpy(dtype=np.float64)
        s = df["s"].to_numpy(dtype=np.float64)
        s2 = df["s2"].to_numpy(dtype=np.float64)
        mean = s / n
        var = (s2 - n * mean * mean) / (n - 1.0)
        df["burstiness"] = var / mean
        df = df.sort_values(["burstiness", "token"], ascending=[False, True]).head(20)
        return pa.Table.from_pandas(df[["token", "df", "burstiness"]], preserve_index=False)

    out = (
        vocab.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["burstiness", "token"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    out["burstiness"] = out["burstiness"].round(6)
    return out.astype({"df": "int64"})


def q_doc_js_divergence(sf_dir: str) -> pd.DataFrame:
    """Jensen-Shannon divergence between the unigram distribution of source
    'src0' and the rest of the corpus — the symmetric information-theoretic
    drift measure completing the LLR-keyness pair. Token counts fold to a
    vocabulary-sized (term, a, b) table (same plan as terms_llr_keyness);
    the JSD fold is per-term scalar math summed over the vocabulary."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["source", "text"])

    def counts(b: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.DataFrame(
                {
                    "in0": pl.Series(
                        [s == "src0" for s in b["source"].to_pylist()], dtype=pl.Int64
                    ),
                    "token": pl.from_arrow(b["text"]).str.split(" "),
                }
            )
            .explode("token")
            .group_by("token")
            .agg(pl.col("in0").sum().alias("a"), (1 - pl.col("in0")).sum().alias("b"))
        )
        return pa.table(
            {
                "token": pa.array(df["token"].to_numpy(), pa.string()),
                "a": pa.array(df["a"].to_numpy(), pa.int64()),
                "b": pa.array(df["b"].to_numpy(), pa.int64()),
            }
        )

    vocab = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("a", alias_name="a"), Sum("b", alias_name="b"))
        .to_pandas()  # vocabulary-sized
    )
    a = vocab["a"].to_numpy(dtype=np.float64)
    b = vocab["b"].to_numpy(dtype=np.float64)
    p = a / a.sum()
    q = b / b.sum()
    m = (p + q) / 2.0
    kl_p = float(np.where(p > 0, p * np.log(np.maximum(p, 1e-300) / m), 0.0).sum())
    kl_q = float(np.where(q > 0, q * np.log(np.maximum(q, 1e-300) / m), 0.0).sum())
    return pd.DataFrame(
        [{"jsd": round(0.5 * kl_p + 0.5 * kl_q, 6), "n_terms": np.int64(len(vocab))}]
    )


def q_copurchase_adamic_adar(sf_dir: str) -> pd.DataFrame:
    """Adamic-Adar link prediction on the co-purchase graph: top-10
    non-edge part pairs by Σ 1/ln(deg(hub)) over shared hubs — the
    degree-discounted sibling of copurchase_link_prediction, on the same
    pre-counted pair-hash-bucket wedge plan (each hub's weight rides the
    wedge emission; the exchange stays a coarse 64-group shuffle)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def with_ob(b: pa.Table) -> pa.Table:
        ob = (b["l_orderkey"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(np.int32)
        return b.append_column("ob", pa.array(ob))

    bucketed = ds.map_batches(with_ob, batch_format="pyarrow").materialize()

    def pairs_seg(g: pd.DataFrame) -> pd.DataFrame:
        d = (
            g[["l_orderkey", "l_partkey"]]
            .drop_duplicates()
            .sort_values(["l_orderkey", "l_partkey"], kind="stable")
        )
        ok = d["l_orderkey"].to_numpy()
        pk = d["l_partkey"].to_numpy()
        n = len(ok)
        if n == 0:
            return pd.DataFrame({"part_a": [], "part_b": [], "n": []})
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)
        rem = np.repeat(lens, lens) - pos - 1
        total = int(rem.sum())
        if total == 0:
            return pd.DataFrame({"part_a": [], "part_b": [], "n": []})
        a_idx = np.repeat(np.arange(n), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem) + 1
        out = pd.DataFrame({"part_a": pk[a_idx], "part_b": pk[a_idx + off]})
        return out.groupby(["part_a", "part_b"]).size().rename("n").reset_index()

    edges = (
        bucketed.groupby("ob")
        .map_groups(pairs_seg, batch_format="pandas")
        .groupby(["part_a", "part_b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    ekeys = np.sort(
        edges["part_a"].to_numpy().astype(np.uint64) * np.uint64(1 << 32)
        + edges["part_b"].to_numpy().astype(np.uint64)
    )
    both = pd.concat(
        [
            edges.rename(columns={"part_a": "hub", "part_b": "nb"})[["hub", "nb"]],
            edges.rename(columns={"part_b": "hub", "part_a": "nb"})[["hub", "nb"]],
        ]
    )
    import ray.data as rd

    adj = rd.from_pandas(both).repartition(8)

    def with_hb(b: pa.Table) -> pa.Table:
        hb = (b["hub"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(np.int32)
        return b.append_column("hb", pa.array(hb))

    # hub degrees are part-dimension-sized → broadcast into the wedge stage
    deg = both.groupby("hub").size()
    degmap = dict(zip(deg.index, deg.to_numpy(dtype=np.float64)))

    def wedge_seg(g: pd.DataFrame, _deg=degmap) -> pd.DataFrame:
        d = g[["hub", "nb"]].drop_duplicates().sort_values(["hub", "nb"], kind="stable")
        hub = d["hub"].to_numpy()
        nb = d["nb"].to_numpy()
        n = len(hub)
        empty = pd.DataFrame(
            {
                "pb2": pd.Series([], dtype="int32"),
                "key": pd.Series([], dtype="uint64"),
                "w": pd.Series([], dtype="float64"),
            }
        )
        if n == 0:
            return empty
        starts = np.flatnonzero(np.r_[True, hub[1:] != hub[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)
        rem = np.repeat(lens, lens) - pos - 1
        total = int(rem.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem) + 1
        key = nb[a_idx].astype(np.uint64) * np.uint64(1 << 32) + nb[a_idx + off].astype(
            np.uint64
        )
        w = 1.0 / np.log(np.array([_deg[h] for h in hub], dtype=np.float64))
        w = w[a_idx]
        agg = pd.DataFrame({"key": key, "w": w}).groupby("key")["w"].sum()
        uk = agg.index.to_numpy().astype(np.uint64)
        return pd.DataFrame(
            {
                "pb2": (uk % np.uint64(_N_UB)).astype(np.int32),
                "key": uk,
                "w": agg.to_numpy(),
            }
        )

    def fold_bucket(g: pd.DataFrame, _ek=ekeys) -> pd.DataFrame:
        agg = g.groupby("key")["w"].sum()
        key = agg.index.to_numpy().astype(np.uint64)
        aa = agg.to_numpy()
        pos = np.searchsorted(_ek, key)
        is_edge = (pos < len(_ek)) & (_ek[np.clip(pos, 0, len(_ek) - 1)] == key)
        key, aa = key[~is_edge], np.round(aa[~is_edge], 6)
        pa_ = (key >> np.uint64(32)).astype(np.int64)
        pb_ = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
        df = pd.DataFrame({"part_a": pa_, "part_b": pb_, "aa": aa})
        return df.sort_values(
            ["aa", "part_a", "part_b"], ascending=[False, True, True]
        ).head(10)

    out = (
        adj.map_batches(with_hb, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(wedge_seg, batch_format="pandas")
        .groupby("pb2")
        .map_groups(fold_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values(["aa", "part_a", "part_b"], ascending=[False, True, True])
        .head(10)
        .reset_index(drop=True)
    )
    return out.astype({"part_a": "int64", "part_b": "int64"})


# ------------------------------------------------------------ wave 30 -------


def q_doc_hapax_ratio(sf_dir: str) -> pd.DataFrame:
    """Lexical richness summary: hapax-legomena share of the vocabulary,
    type-token ratio, and vocabulary size — the corpus-health scalar trio.
    One distinct-token-partial scan builds the vocabulary-sized count table;
    the three scalars fold from (n=1 count, vocab, token mass) partials."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["text"])

    def counts(b: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.DataFrame({"token": pl.from_arrow(b["text"]).str.split(" ")})
            .explode("token")
            .group_by("token")
            .len("c")
        )
        return pa.table(
            {
                "token": pa.array(df["token"].to_numpy(), pa.string()),
                "c": pa.array(df["c"].to_numpy().astype(np.int64)),
            }
        )

    vocab = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c", alias_name="n"))
    )

    def fold(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        return pa.table(
            {
                "hapax": pa.array([int((n == 1).sum())], pa.int64()),
                "vocab": pa.array([len(n)], pa.int64()),
                "tokens": pa.array([int(n.sum())], pa.int64()),
            }
        )

    parts = _coalesce_partials(vocab.map_batches(fold, batch_format="pyarrow")).to_pandas()
    hapax = int(parts["hapax"].sum())
    v = int(parts["vocab"].sum())
    toks = int(parts["tokens"].sum())
    return pd.DataFrame(
        [
            {
                "n_hapax": np.int64(hapax),
                "n_vocab": np.int64(v),
                "hapax_ratio": round(hapax / v, 6),
                "type_token_ratio": round(v / toks, 6),
            }
        ]
    )


QUERIES = {
    "global_counts": q_global_counts,
    "events_by_type": q_events_by_type,
    "docs_by_lang": q_docs_by_lang,
    "avg_items_per_order": q_avg_items_per_order,
    "top_customers": q_top_customers,
    "events_span": q_events_span,
    "value_buckets": q_value_buckets,
    "distinct_counts": q_distinct_counts,
    "orders_topk_price": q_orders_topk_price,
    "first_event_per_user": q_first_event_per_user,
    "dedup_first_wins_docs": q_dedup_first_wins_docs,
    "exact_dup_groups": q_exact_dup_groups,
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "order_lineitem_join": q_order_lineitem_join,
    "source_like_docs": q_source_like_docs,
    "token_stats_by_lang": q_token_stats_by_lang,
    "doc_quality": q_doc_quality,
    "lang_id_docs": q_lang_id_docs,
    "doc_fingerprints": q_doc_fingerprints,
    "doc_repetition": q_doc_repetition,
    "docs_sample_hash": q_docs_sample_hash,
    "top_terms": q_top_terms,
    "price_quantiles": q_price_quantiles,
    "events_per_day_by_type": q_events_per_day_by_type,
    "user_sessions": q_user_sessions,
    "event_rank_in_user": q_event_rank_in_user,
    "docs_jaccard_pairs": q_docs_jaccard_pairs,
    "docs_ngram_jaccard_pairs": q_docs_ngram_jaccard_pairs,
    "simhash_docs": q_simhash_docs,
    "embedding_topk": q_embedding_topk,
    "embedding_topk_ivf": q_embedding_topk_ivf,
    "recent_events": q_recent_events,
    "doc_embed_knn": q_doc_embed_knn,
    "revenue_by_part_brand": q_revenue_by_part_brand,
    "purchase_asof_click": q_purchase_asof_click,
    "clicks_before_purchase": q_clicks_before_purchase,
    "events_per_hour": q_events_per_hour,
    "customer_order_counts": q_customer_order_counts,
    "doc_segments": q_doc_segments,
    "hybrid_topk": q_hybrid_topk,
    "embedding_neardup_pairs": q_embedding_neardup_pairs,
    "dedup_clusters": q_dedup_clusters,
    "customers_without_orders": q_customers_without_orders,
    "event_gap_stats": q_event_gap_stats,
    "embedding_topk_lsh": q_embedding_topk_lsh,
    "revenue_rollup": q_revenue_rollup,
    "events_rolling_avg": q_events_rolling_avg,
    "parts_in_big_orders": q_parts_in_big_orders,
    "docs_stratified_sample": q_docs_stratified_sample,
    "top_orders_per_customer": q_top_orders_per_customer,
    "revenue_running_by_nation": q_revenue_running_by_nation,
    "orders_status_pivot": q_orders_status_pivot,
    "price_quantity_stats": q_price_quantity_stats,
    "revenue_cube": q_revenue_cube,
    "nations_by_region": q_nations_by_region,
    "user_click_purchase": q_user_click_purchase,
    "approx_distinct_hll": q_approx_distinct_hll,
    "doc_regex_terms": q_doc_regex_terms,
    "embedding_norm_stats": q_embedding_norm_stats,
    "embedding_clusters": q_embedding_clusters,
    "group_quantiles": q_group_quantiles,
    "heavy_hitters": q_heavy_hitters,
    "bloom_semi_join": q_bloom_semi_join,
    "doc_redacted": q_doc_redacted,
    "doc_chunks": q_doc_chunks,
    "decontaminate_docs": q_decontaminate_docs,
    "skyline_orders": q_skyline_orders,
    "user_top_event": q_user_top_event,
    "events_entropy_by_day": q_events_entropy_by_day,
    "argmax_events": q_argmax_events,
    "revenue_hhi": q_revenue_hhi,
    "token_packing": q_token_packing,
    "ntile_orders": q_ntile_orders,
    "tfidf_top_terms": q_tfidf_top_terms,
    "simhash_neardup_pairs": q_simhash_neardup_pairs,
    "markov_transitions": q_markov_transitions,
    "shipping_priority": q_shipping_priority,
    "orders_above_cust_avg": q_orders_above_cust_avg,
    "props_k_stats": q_props_k_stats,
    "user_set_ops": q_user_set_ops,
    "event_funnel": q_event_funnel,
    "cohort_retention": q_cohort_retention,
    "copurchase_pairs": q_copurchase_pairs,
    "label_centroids": q_label_centroids,
    "term_postings": q_term_postings,
    "docs_weighted_sample": q_docs_weighted_sample,
    "docs_shared_span_pairs": q_docs_shared_span_pairs,
    "bpe_pair_counts": q_bpe_pair_counts,
    "curated_corpus_stats": q_curated_corpus_stats,
    "dedup_clusters_labelprop": q_dedup_clusters_labelprop,
    "embedding_topk_int8": q_embedding_topk_int8,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "price_quantile_sketch": q_price_quantile_sketch,
    "doc_lm_scores": q_doc_lm_scores,
    "copurchase_triangles": q_copurchase_triangles,
    "docs_shuffle_head": q_docs_shuffle_head,
    "session_durations": q_session_durations,
    "local_supplier_revenue": q_local_supplier_revenue,
    "promo_revenue_share": q_promo_revenue_share,
    "large_volume_customers": q_large_volume_customers,
    "doc_length_histogram": q_doc_length_histogram,
    "embedding_pca": q_embedding_pca,
    "price_mad": q_price_mad,
    "top_terms_by_lang": q_top_terms_by_lang,
    "revenue_daily_growth": q_revenue_daily_growth,
    "part_supplier_counts": q_part_supplier_counts,
    "customers_only_f_orders": q_customers_only_f_orders,
    "docs_source_share": q_docs_source_share,
    "events_zscore_outliers": q_events_zscore_outliers,
    "discount_revenue_effect": q_discount_revenue_effect,
    "small_quantity_part_revenue": q_small_quantity_part_revenue,
    "nation_market_share": q_nation_market_share,
    "returned_revenue_customers": q_returned_revenue_customers,
    "top_supplier": q_top_supplier,
    "banded_brand_revenue": q_banded_brand_revenue,
    "revenue_ewma": q_revenue_ewma,
    "revenue_streaks": q_revenue_streaks,
    "nation_trade_volume": q_nation_trade_volume,
    "customer_order_histogram": q_customer_order_histogram,
    "idle_rich_customers": q_idle_rich_customers,
    "distinct_users_sliding7": q_distinct_users_sliding7,
    "late_ship_orders": q_late_ship_orders,
    "lines_by_priority_class": q_lines_by_priority_class,
    "waiting_suppliers": q_waiting_suppliers,
    "nation_pair_trade": q_nation_pair_trade,
    "part_profit_by_year": q_part_profit_by_year,
    "association_rules": q_association_rules,
    "embedding_range_search": q_embedding_range_search,
    "normalized_dedup_docs": q_normalized_dedup_docs,
    "source_lang_chi2": q_source_lang_chi2,
    "pmi_bigrams": q_pmi_bigrams,
    "docs_matching_all_terms": q_docs_matching_all_terms,
    "copurchase_bfs": q_copurchase_bfs,
    "supplier_pctrank_nation": q_supplier_pctrank_nation,
    "doc_zipf_slope": q_doc_zipf_slope,
    "lineitem_quality_audit": q_lineitem_quality_audit,
    "revenue_gini": q_revenue_gini,
    "price_mannwhitney": q_price_mannwhitney,
    "revenue_max_drawdown": q_revenue_max_drawdown,
    "doc_ttr_buckets": q_doc_ttr_buckets,
    "monthly_churn": q_monthly_churn,
    "neardup_rate_by_source": q_neardup_rate_by_source,
    "events_value_winsorized_mean": q_events_value_winsorized_mean,
    "events_sliding_30d_revenue": q_events_sliding_30d_revenue,
    "knn_label_agreement": q_knn_label_agreement,
    "mmr_diverse_topk": q_mmr_diverse_topk,
    "doc_quality_pctrank": q_doc_quality_pctrank,
    "copurchase_link_prediction": q_copurchase_link_prediction,
    "customer_cohort_ltv": q_customer_cohort_ltv,
    "orders_benford": q_orders_benford,
    "price_iqr_outliers": q_price_iqr_outliers,
    "doc_length_anova": q_doc_length_anova,
    "terms_llr_keyness": q_terms_llr_keyness,
    "doc_burstiness": q_doc_burstiness,
    "doc_js_divergence": q_doc_js_divergence,
    "copurchase_adamic_adar": q_copurchase_adamic_adar,
    "doc_hapax_ratio": q_doc_hapax_ratio,
}

ORACLE_SQL = {
    "bpe_pair_counts": (
        "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),"
        " big AS (SELECT substring(t, i, 2) AS pair FROM tok,"
        "  unnest(generate_series(1, length(t) - 1)) AS u(i) WHERE length(t) >= 2)"
        " SELECT pair, COUNT(*)::BIGINT AS n FROM big GROUP BY pair"
        " ORDER BY n DESC, pair LIMIT 20"
    ),
    "session_durations": (
        "WITH x AS (SELECT user_id, ts, event_id,"
        "  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL"
        "   OR EPOCH(ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))"
        "      > 3600 THEN 1 ELSE 0 END AS ns FROM events),"
        " y AS (SELECT user_id, ts, SUM(ns) OVER (PARTITION BY user_id"
        "  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM x),"
        " d AS (SELECT EPOCH(MAX(ts) - MIN(ts)) AS dur FROM y GROUP BY user_id, sid)"
        " SELECT COUNT(*)::BIGINT AS n_sessions, ROUND(AVG(dur), 6) AS avg_duration_sec,"
        " ROUND(MAX(dur), 6) AS max_duration_sec FROM d"
    ),
    "docs_shuffle_head": (
        "SELECT pos, doc_id FROM (SELECT doc_id,"
        " ROW_NUMBER() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id)::BIGINT AS pos"
        " FROM documents) t WHERE pos <= 20 ORDER BY pos"
    ),
    "copurchase_triangles": (
        "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),"
        " pp AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb FROM d a"
        "  JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"
        " SELECT COUNT(*)::BIGINT AS n_triangles FROM pp e1"
        " JOIN pp e2 ON e1.pb = e2.pa"
        " JOIN pp e3 ON e3.pa = e1.pa AND e3.pb = e2.pb"
    ),
    "doc_lm_scores": (
        "WITH tg AS (SELECT doc_id, substring(text, i, 3) AS g FROM documents,"
        "  unnest(generate_series(1, length(text) - 2)) AS u(i)),"
        " cnt3 AS (SELECT g, COUNT(*) AS n3 FROM tg GROUP BY g),"
        " cnt2 AS (SELECT substring(g, 1, 2) AS g2, SUM(n3) AS n2 FROM cnt3 GROUP BY 1),"
        " scored AS (SELECT t.doc_id, AVG(ln((c3.n3 + 1.0) / (c2.n2 + 27.0))) AS lp"
        "  FROM tg t JOIN cnt3 c3 ON t.g = c3.g"
        "  JOIN cnt2 c2 ON substring(t.g, 1, 2) = c2.g2 GROUP BY t.doc_id)"
        " SELECT doc_id, ROUND(lp, 6) AS lp FROM scored"
        " ORDER BY lp DESC, doc_id LIMIT 20"
    ),
    "fuzzy_name_pairs": (
        "SELECT a.c_name AS name_a, b.c_name AS name_b"
        " FROM customer a JOIN customer b ON a.c_name < b.c_name"
        "  AND abs(length(a.c_name) - length(b.c_name)) <= 1"
        "  AND levenshtein(a.c_name, b.c_name) <= 1"
        " ORDER BY 1, 2"
    ),
    "curated_corpus_stats": (
        "WITH q AS (SELECT doc_id, lang,"
        "  len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,"
        "  md5(text) AS h FROM documents),"
        " w AS (SELECT lang, n_tokens,"
        "  ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM q)"
        " SELECT lang, COUNT(*)::BIGINT AS n_docs, SUM(n_tokens)::BIGINT AS total_tokens"
        " FROM w WHERE rn = 1 AND n_tokens BETWEEN 30 AND 80"
        " GROUP BY lang ORDER BY lang"
    ),
    "event_funnel": (
        "WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events"
        "  WHERE event_type='view' GROUP BY user_id),"
        " c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e"
        "  JOIN v ON e.user_id=v.user_id"
        "  WHERE e.event_type='click' AND e.ts > v.t_view"
        "   AND e.ts <= v.t_view + INTERVAL 24 HOUR GROUP BY e.user_id),"
        " p AS (SELECT e.user_id FROM events e JOIN c ON e.user_id=c.user_id"
        "  WHERE e.event_type='purchase' AND e.ts > c.t_click"
        "   AND e.ts <= c.t_click + INTERVAL 24 HOUR GROUP BY e.user_id)"
        " SELECT (SELECT COUNT(DISTINCT user_id) FROM events)::BIGINT AS n_users,"
        " (SELECT COUNT(*) FROM v)::BIGINT AS n_view,"
        " (SELECT COUNT(*) FROM c)::BIGINT AS n_view_click,"
        " (SELECT COUNT(*) FROM p)::BIGINT AS n_full_funnel"
    ),
    "cohort_retention": (
        "WITH f AS (SELECT user_id, MIN(ts::DATE) AS cohort_day FROM events"
        "  GROUP BY user_id)"
        " SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,"
        " (e.ts::DATE - f.cohort_day)::BIGINT AS day_offset,"
        " COUNT(DISTINCT e.user_id)::BIGINT AS n_active"
        " FROM events e JOIN f ON e.user_id = f.user_id"
        " GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "copurchase_pairs": (
        "SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*)::BIGINT AS n"
        " FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a"
        " JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b"
        "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
        " GROUP BY 1, 2 ORDER BY n DESC, part_a, part_b LIMIT 20"
    ),
    "label_centroids": (
        "WITH flat AS (SELECT label, unnest(embedding)::DOUBLE AS v,"
        "  generate_subscripts(embedding, 1) AS i FROM embeddings),"
        " cent AS (SELECT label, i, AVG(v) AS c FROM flat GROUP BY label, i)"
        " SELECT label, ROUND(sqrt(SUM(c*c)), 6) AS centroid_norm"
        " FROM cent GROUP BY label ORDER BY label"
    ),
    "term_postings": (
        "WITH tok AS (SELECT DISTINCT doc_id,"
        "  unnest(string_split(text, ' ')) AS token FROM documents)"
        " SELECT token, COUNT(*)::BIGINT AS df,"
        " md5(STRING_AGG(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS postings_md5"
        " FROM tok GROUP BY token ORDER BY token"
    ),
    "docs_shared_span_pairs": (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),"
        " g AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+15], ' ') AS gram"
        "  FROM toks, unnest(generate_series(1, len(t) - 15)) AS u(i))"
        " SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS n_shared"
        " FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id"
        " GROUP BY 1, 2 HAVING COUNT(*) >= 8 ORDER BY 1, 2"
    ),
    "docs_weighted_sample": (
        "SELECT doc_id, ROUND(POW("
        "  (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0),"
        "  1.0 / n_chars), 10) AS sample_key"
        " FROM documents ORDER BY sample_key DESC, doc_id LIMIT 20"
    ),
    "props_k_stats": (
        "SELECT event_type, COUNT(*) AS n,"
        " SUM(CAST(props->>'k' AS BIGINT))::BIGINT AS k_sum,"
        " ROUND(AVG(CAST(props->>'k' AS BIGINT)), 6) AS k_avg"
        " FROM events GROUP BY event_type ORDER BY event_type"
    ),
    "user_set_ops": (
        "SELECT"
        " (SELECT COUNT(*) FROM (SELECT user_id FROM events WHERE event_type = 'click'"
        "   INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase') t)"
        "   AS n_both,"
        " (SELECT COUNT(*) FROM (SELECT user_id FROM events WHERE event_type = 'click'"
        "   EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase') t)"
        "   AS n_click_only,"
        " (SELECT COUNT(*) FROM (SELECT user_id FROM events WHERE event_type = 'purchase'"
        "   EXCEPT SELECT user_id FROM events WHERE event_type = 'click') t)"
        "   AS n_purchase_only"
    ),
    "markov_transitions": (
        "SELECT prev_type, next_type, COUNT(*) AS n FROM ("
        " SELECT event_type AS next_type, LAG(event_type) OVER"
        "  (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events) t"
        " WHERE prev_type IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "shipping_priority": (
        "SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,"
        " o_orderdate"
        " FROM customer c JOIN orders o ON c_custkey = o_custkey"
        " JOIN lineitem l ON l_orderkey = o_orderkey"
        " WHERE c_mktsegment = 'AUTOMOBILE' AND o_orderdate < TIMESTAMP '1997-01-01'"
        " AND l_shipdate > TIMESTAMP '1997-01-01'"
        " GROUP BY l_orderkey, o_orderdate"
        " ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
    ),
    "orders_above_cust_avg": (
        "WITH ca AS (SELECT o_custkey, AVG(o_totalprice) AS avg_p FROM orders"
        "   GROUP BY o_custkey)"
        " SELECT o.o_orderstatus, COUNT(*) AS n FROM orders o"
        " JOIN ca ON o.o_custkey = ca.o_custkey"
        " WHERE o.o_totalprice > ca.avg_p GROUP BY 1 ORDER BY 1"
    ),
    "token_packing": (
        "WITH t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n"
        "   FROM documents),"
        " c AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id)::BIGINT AS cum FROM t),"
        " w AS (SELECT doc_id,"
        "   unnest(generate_series((cum - n) // 512, (cum - 1) // 512)) AS win_id FROM c)"
        " SELECT win_id, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc_id"
        " FROM w WHERE win_id < 50 GROUP BY win_id ORDER BY win_id"
    ),
    "ntile_orders": (
        "SELECT tile, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total FROM"
        " (SELECT NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS tile,"
        "   o_totalprice FROM orders) t"
        " GROUP BY tile ORDER BY tile"
    ),
    "tfidf_top_terms": (
        "WITH df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM"
        "   (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)"
        "   GROUP BY token),"
        " nn AS (SELECT COUNT(*) AS n FROM documents),"
        " tf AS (SELECT token, COUNT(*) AS tf FROM"
        "   (SELECT unnest(string_split(text, ' ')) AS token FROM documents"
        "    WHERE doc_id = 0) GROUP BY token)"
        " SELECT tf.token, tf.tf, df.df, ROUND(tf.tf * ln(nn.n / df.df), 6) AS score"
        " FROM tf JOIN df USING (token), nn ORDER BY score DESC, tf.token LIMIT 10"
    ),
    "skyline_orders": (
        "SELECT o_orderkey, o_totalprice, o_orderdate FROM orders o"
        " WHERE NOT EXISTS (SELECT 1 FROM orders q WHERE"
        "  (q.o_totalprice > o.o_totalprice AND q.o_orderdate <= o.o_orderdate) OR"
        "  (q.o_totalprice >= o.o_totalprice AND q.o_orderdate < o.o_orderdate))"
        " ORDER BY o_totalprice DESC"
    ),
    "user_top_event": (
        "SELECT user_id, event_type, n FROM ("
        " SELECT user_id, event_type, COUNT(*) AS n,"
        "  ROW_NUMBER() OVER (PARTITION BY user_id"
        "   ORDER BY COUNT(*) DESC, event_type) AS rn"
        " FROM events WHERE user_id < 100 GROUP BY user_id, event_type) t"
        " WHERE rn = 1 ORDER BY user_id"
    ),
    "events_entropy_by_day": (
        "SELECT strftime(ts, '%Y-%m-%d') AS day, ROUND(entropy(event_type), 6) AS h,"
        " COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1"
    ),
    "argmax_events": (
        "SELECT e.event_type, m.max_value, MIN(e.event_id) AS argmax_event_id"
        " FROM events e JOIN (SELECT event_type, MAX(value) AS max_value"
        "   FROM events GROUP BY event_type) m"
        " ON e.event_type = m.event_type AND e.value = m.max_value"
        " GROUP BY e.event_type, m.max_value ORDER BY e.event_type"
    ),
    "revenue_hhi": (
        "WITH cr AS (SELECT o_custkey, SUM(o_totalprice) AS rev FROM orders"
        "   GROUP BY o_custkey),"
        " j AS (SELECT n.n_name, cr.rev FROM cr"
        "   JOIN customer c ON cr.o_custkey = c.c_custkey"
        "   JOIN nation n ON c.c_nationkey = n.n_nationkey)"
        " SELECT n_name, COUNT(*) AS n_customers, ROUND(SUM(rev), 2) AS total_rev,"
        " ROUND(SUM(rev * rev) / (SUM(rev) * SUM(rev)), 6) AS hhi"
        " FROM j GROUP BY n_name ORDER BY n_name"
    ),
    "doc_redacted": (
        "SELECT lang, COUNT(*) AS n_docs,"
        " SUM(CASE WHEN regexp_matches(text, '\\b(key|hash|value)\\b') THEN 1 ELSE 0 END)::BIGINT"
        "   AS n_docs_hit,"
        " SUM(len(regexp_extract_all(text, '\\b(key|hash|value)\\b')))::BIGINT AS n_hits,"
        " SUM(('0x' || substr(md5(regexp_replace(text, '\\b(key|hash|value)\\b',"
        "   '<SECRET>', 'g')), 1, 12))::BIGINT)::BIGINT AS redacted_check"
        " FROM documents GROUP BY lang ORDER BY lang"
    ),
    "doc_chunks": (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t"
        "   FROM documents WHERE doc_id < 100),"
        " idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t), 48)) AS i FROM toks)"
        " SELECT doc_id, ((i - 1) // 48)::BIGINT AS chunk_idx,"
        " len(t[i:i+63])::BIGINT AS n_tokens, t[i] AS first_token"
        " FROM idx ORDER BY doc_id, chunk_idx"
    ),
    "decontaminate_docs": (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),"
        " idx AS (SELECT doc_id, t,"
        "   unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i FROM toks),"
        " ng AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g FROM idx),"
        " bench AS (SELECT DISTINCT g FROM ng WHERE doc_id < 5),"
        " hits AS (SELECT ng.doc_id, COUNT(*) AS w FROM ng JOIN bench USING (g)"
        "   WHERE ng.doc_id >= 5 GROUP BY ng.doc_id)"
        " SELECT d.lang, COUNT(*) AS n_docs,"
        " SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contaminated,"
        " COALESCE(SUM(h.w), 0)::BIGINT AS n_hit_windows"
        " FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id"
        " WHERE d.doc_id >= 5 GROUP BY d.lang ORDER BY d.lang"
    ),
    "doc_repetition": (
        "SELECT doc_id,"
        " len(string_split(text, ' '))::BIGINT AS n_tokens,"
        " len(list_distinct(string_split(text, ' ')))::BIGINT AS n_unique_tokens,"
        " ((len(string_split(text, ' ')) - len(list_distinct(string_split(text, ' '))))"
        "   * 1000 // len(string_split(text, ' ')))::BIGINT AS rep_permille"
        " FROM documents WHERE doc_id < 200 ORDER BY doc_id"
    ),
    "top_terms": (
        "SELECT token, COUNT(DISTINCT doc_id) AS df FROM"
        " (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)"
        " GROUP BY token ORDER BY df DESC, token LIMIT 20"
    ),
    "docs_sample_hash": (
        "SELECT lang, COUNT(*) AS n_total,"
        " SUM(CASE WHEN substr(md5(text), 1, 1) < '2' THEN 1 ELSE 0 END)::BIGINT AS n_kept"
        " FROM documents GROUP BY lang ORDER BY lang"
    ),
    "price_quantiles": (
        "SELECT 0.5::DOUBLE AS q, quantile_disc(l_extendedprice, 0.5) AS value FROM lineitem"
        " UNION ALL SELECT 0.9::DOUBLE, quantile_disc(l_extendedprice, 0.9) FROM lineitem"
        " UNION ALL SELECT 0.99::DOUBLE, quantile_disc(l_extendedprice, 0.99) FROM lineitem"
        " ORDER BY q"
    ),
    "events_per_hour": (
        "SELECT EXTRACT(hour FROM ts)::BIGINT AS hour, COUNT(*) AS n"
        " FROM events GROUP BY 1 ORDER BY 1"
    ),
    "purchase_asof_click": (
        "WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),"
        " c AS (SELECT * FROM events WHERE event_type = 'click'),"
        " m AS (SELECT p.user_id, p.event_id,"
        "   (SELECT MAX(c.ts) FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS click_ts"
        "   FROM p)"
        " SELECT COUNT(DISTINCT user_id) AS n_users_with_purchase,"
        " COUNT(*) AS n_purchases,"
        " SUM(CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_purchases_with_prior_click"
        " FROM m"
    ),
    "revenue_by_part_brand": (
        "SELECT p_brand, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,"
        " COUNT(*) AS n_items"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " GROUP BY p_brand ORDER BY p_brand"
    ),
    "customer_order_counts": (
        "SELECT c_mktsegment, COUNT(*) AS n_customers,"
        " SUM(cnt)::BIGINT AS n_orders,"
        " SUM(CASE WHEN cnt = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero_order_customers"
        " FROM (SELECT c.c_mktsegment, COUNT(o.o_orderkey) AS cnt"
        "       FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey"
        "       GROUP BY c.c_custkey, c.c_mktsegment)"
        " GROUP BY c_mktsegment ORDER BY c_mktsegment"
    ),
    "recent_events": (
        "SELECT event_id, ts, event_type FROM events"
        " ORDER BY ts DESC, event_id ASC LIMIT 20"
    ),
    "doc_segments": (
        "SELECT COUNT(*) AS n_docs,"
        " SUM(len(string_split(text, '.')))::BIGINT AS total_segments,"
        " SUM((SELECT COUNT(*) FROM unnest(string_split(text, '.')) AS u(s)"
        "      WHERE trim(s) != ''))::BIGINT AS total_nonempty"
        " FROM documents"
    ),
    "global_counts": (
        "SELECT (SELECT COUNT(*) FROM orders) AS n_orders,"
        " (SELECT COUNT(*) FROM lineitem) AS n_lineitem,"
        " (SELECT COUNT(*) FROM events) AS n_events,"
        " (SELECT COUNT(*) FROM documents) AS n_documents"
    ),
    "events_by_type": (
        "SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value"
        " FROM events GROUP BY event_type ORDER BY event_type"
    ),
    "docs_by_lang": (
        "SELECT lang, COUNT(*) AS n, ROUND(AVG(n_chars), 6) AS avg_chars"
        " FROM documents GROUP BY lang ORDER BY lang"
    ),
    "avg_items_per_order": (
        "SELECT ROUND(AVG(cnt), 6) AS avg_items FROM"
        " (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey) t"
    ),
    "top_customers": (
        "SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 4) AS total_spent"
        " FROM orders GROUP BY o_custkey ORDER BY n_orders DESC, o_custkey LIMIT 10"
    ),
    "events_span": (
        "SELECT MIN(ts) AS ts_min, MAX(ts) AS ts_max, COUNT(*) AS n,"
        " ROUND(COUNT(*) / (EPOCH(MAX(ts) - MIN(ts)) / 3600), 4) AS events_per_hour"
        " FROM events"
    ),
    "value_buckets": (
        "SELECT CASE WHEN value < 10 THEN 'low' WHEN value < 50 THEN 'mid'"
        " WHEN value < 200 THEN 'high' ELSE 'top' END AS bucket, COUNT(*) AS n"
        " FROM events GROUP BY 1 ORDER BY 1"
    ),
    "distinct_counts": (
        "SELECT COUNT(DISTINCT event_type) AS n_event_types,"
        " COUNT(DISTINCT user_id) AS n_users FROM events"
    ),
    "orders_topk_price": (
        "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders"
        " ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"
    ),
    "first_event_per_user": (
        "SELECT user_id, ts, event_id FROM (SELECT user_id, ts, event_id,"
        " ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn"
        " FROM events) t WHERE rn = 1"
    ),
    "dedup_first_wins_docs": (
        "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text) ORDER BY doc_id"
    ),
    "exact_dup_groups": (
        "SELECT md5(text) AS content_hash, COUNT(*) AS n FROM documents"
        " GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1"
    ),
    "pricing_summary": (
        "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 4) AS sum_qty,"
        " ROUND(SUM(l_extendedprice), 4) AS sum_price,"
        " ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,"
        " ROUND(AVG(l_discount), 6) AS avg_disc, COUNT(*) AS n"
        " FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "revenue_by_nation": (
        "SELECT n_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 4) AS revenue"
        " FROM orders JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name"
    ),
    "order_lineitem_join": (
        "SELECT o_orderstatus, ROUND(SUM(rev), 4) AS revenue, SUM(cnt)::BIGINT AS n_items FROM"
        " (SELECT l_orderkey, SUM(l_extendedprice * (1 - l_discount)) AS rev,"
        "  COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey) li"
        " JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderstatus ORDER BY 1"
    ),
    "source_like_docs": (
        "SELECT source, COUNT(*) AS n FROM documents WHERE text LIKE '%vector%'"
        " GROUP BY source ORDER BY source"
    ),
    "token_stats_by_lang": (
        "SELECT lang, SUM(len(string_split_regex(trim(text), '\\s+')))::BIGINT AS total_tokens,"
        " ROUND(AVG(len(string_split_regex(trim(text), '\\s+'))), 6) AS avg_tokens"
        " FROM documents GROUP BY lang ORDER BY lang"
    ),
    "doc_quality": (
        "SELECT doc_id, len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,"
        " (length(text) - length(regexp_replace(text, '[,.!?;:]', '', 'g')))"
        "   * 1.0 / length(text) AS punct_ratio"
        " FROM documents WHERE doc_id < 50 ORDER BY doc_id"
    ),
    "events_per_day_by_type": (
        "SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n FROM events"
        " GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "user_sessions": (
        "SELECT user_id, (1 + SUM(CASE WHEN prev_ts IS NOT NULL AND"
        " EPOCH(ts - prev_ts) > 3600 THEN 1 ELSE 0 END))::BIGINT AS n_sessions"
        " FROM (SELECT user_id, ts, LAG(ts) OVER"
        "  (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events) t"
        " GROUP BY user_id ORDER BY user_id"
    ),
    "event_rank_in_user": (
        "SELECT event_id, rn FROM (SELECT event_id, ROW_NUMBER() OVER"
        " (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events) t"
        " WHERE rn <= 3"
    ),
    "dedup_clusters": (
        "WITH toks AS (SELECT doc_id,"
        " list_distinct(string_split_regex(trim(text), '\\s+')) AS ts FROM documents),"
        " e AS (SELECT a.doc_id AS a, b.doc_id AS b FROM toks a, toks b"
        "  WHERE a.doc_id < b.doc_id AND"
        "  len(list_intersect(a.ts, b.ts)) * 1.0 /"
        "  len(list_distinct(a.ts || b.ts)) >= 0.8),"
        " ed AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),"
        " cc AS (WITH RECURSIVE r(node, lbl) AS ("
        "   SELECT doc_id, doc_id FROM documents"
        "   UNION"
        "   SELECT ed.y, r.lbl FROM r JOIN ed ON r.node = ed.x)"
        "  SELECT node, MIN(lbl) AS lbl FROM r GROUP BY node)"
        " SELECT node AS doc_id, lbl AS cluster_id FROM cc ORDER BY doc_id"
    ),
    "docs_jaccard_pairs": (
        "WITH toks AS (SELECT doc_id,"
        " list_distinct(string_split_regex(trim(text), '\\s+')) AS ts FROM documents)"
        " SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM toks a, toks b"
        " WHERE a.doc_id < b.doc_id AND"
        " len(list_intersect(a.ts, b.ts)) * 1.0 /"
        " len(list_distinct(a.ts || b.ts)) >= 0.8 ORDER BY 1, 2"
    ),
    "clicks_before_purchase": (
        "SELECT p.event_id, COUNT(c.event_id) AS n_clicks"
        " FROM events p LEFT JOIN events c"
        "  ON c.user_id = p.user_id AND c.event_type = 'click'"
        "  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts"
        " WHERE p.event_type = 'purchase'"
        " GROUP BY p.event_id ORDER BY p.event_id"
    ),
    "docs_ngram_jaccard_pairs": (
        "WITH toks AS (SELECT doc_id,"
        " string_split_regex(trim(text), '\\s+') AS t FROM documents),"
        " sh AS (SELECT doc_id, list_distinct(list_transform("
        "   range(1, len(t) - 1),"
        "   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s"
        "  FROM toks WHERE len(t) >= 3)"
        " SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a, sh b"
        " WHERE a.doc_id < b.doc_id AND"
        " len(list_intersect(a.s, b.s)) * 1.0 /"
        " len(list_distinct(a.s || b.s)) >= 0.6 ORDER BY 1, 2"
    ),
    "embedding_topk": (
        "SELECT vec_id FROM embeddings WHERE vec_id <> 0 ORDER BY"
        " list_cosine_similarity(embedding,"
        "  (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id LIMIT 10"
    ),
    "hybrid_topk": (
        "SELECT e.vec_id FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id"
        " ORDER BY 0.6 * list_cosine_similarity(e.embedding,"
        "  (SELECT embedding FROM embeddings WHERE vec_id = 0))"
        " + 0.4 * (CASE WHEN d.text LIKE '%vector%' THEN 1 ELSE 0 END) DESC,"
        " e.vec_id LIMIT 10"
    ),
    "embedding_neardup_pairs": (
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM embeddings a, embeddings b"
        " WHERE a.vec_id < b.vec_id AND"
        " list_cosine_similarity(a.embedding, b.embedding) >= 0.4 ORDER BY 1, 2"
    ),
    "customers_without_orders": (
        "SELECT c_custkey FROM customer c WHERE NOT EXISTS"
        " (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey"
        "  AND o.o_orderpriority = '1-URGENT')"
        " ORDER BY c_custkey"
    ),
    "event_gap_stats": (
        "SELECT user_id, COUNT(*) AS n_gaps, SUM(gap_ms)::BIGINT AS sum_gap_ms,"
        " MAX(gap_ms)::BIGINT AS max_gap_ms"
        " FROM (SELECT user_id, epoch_ms(ts) - LAG(epoch_ms(ts)) OVER"
        "  (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms FROM events) t"
        " WHERE gap_ms IS NOT NULL GROUP BY user_id ORDER BY user_id"
    ),
    "revenue_rollup": (
        "SELECT COALESCE(n_name, 'ALL') AS n_name, COALESCE(yr, -1) AS yr,"
        " ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders"
        " FROM (SELECT n.n_name AS n_name,"
        "   EXTRACT(year FROM o.o_orderdate)::BIGINT AS yr, o.o_totalprice"
        "  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        "  JOIN nation n ON c.c_nationkey = n.n_nationkey)"
        " GROUP BY ROLLUP(n_name, yr) ORDER BY n_name, yr"
    ),
    "events_rolling_avg": (
        "SELECT event_id, ROUND(AVG(value) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg3"
        " FROM events ORDER BY event_id"
    ),
    "parts_in_big_orders": (
        "SELECT p_brand, COUNT(*) AS n_parts FROM part p"
        " WHERE EXISTS (SELECT 1 FROM lineitem l JOIN orders o"
        "  ON l.l_orderkey = o.o_orderkey"
        "  WHERE l.l_partkey = p.p_partkey AND o.o_totalprice > 450000)"
        " GROUP BY p_brand ORDER BY p_brand"
    ),
    "docs_stratified_sample": (
        "WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)"
        " SELECT d.doc_id, d.lang FROM documents d JOIN cnt USING (lang)"
        " WHERE substr(md5(d.text), 1, 4) <"
        "  printf('%04x', LEAST(65535, (30 * 65536) // cnt.n))"
        " ORDER BY d.doc_id"
    ),
    "top_orders_per_customer": (
        "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM"
        " (SELECT o_custkey, o_orderkey, o_totalprice, ROW_NUMBER() OVER"
        "  (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn"
        "  FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn"
    ),
    "revenue_running_by_nation": (
        "SELECT n_name, yr, ROUND(SUM(rev) OVER"
        " (PARTITION BY n_name ORDER BY yr), 2) AS running_revenue FROM"
        " (SELECT n.n_name AS n_name, EXTRACT(year FROM o.o_orderdate)::BIGINT AS yr,"
        "  SUM(o.o_totalprice) AS rev"
        "  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        "  JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY 1, 2)"
        " ORDER BY n_name, yr"
    ),
    "orders_status_pivot": (
        "SELECT o_orderpriority,"
        " SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_open,"
        " SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_fulfilled,"
        " SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_pending,"
        " COUNT(*) AS n_total"
        " FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    "price_quantity_stats": (
        "SELECT l_returnflag, COUNT(*) AS n,"
        " ROUND(AVG(l_quantity), 6) AS avg_qty,"
        " ROUND(STDDEV_SAMP(l_extendedprice), 6) AS std_price,"
        " ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price"
        " FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "revenue_cube": (
        "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,"
        " COALESCE(l_linestatus, 'ALL') AS l_linestatus,"
        " ROUND(SUM(l_extendedprice), 2) AS revenue, COUNT(*) AS n"
        " FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
        " ORDER BY l_returnflag, l_linestatus"
    ),
    "nations_by_region": (
        "SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,"
        " COUNT(*) AS n_nations"
        " FROM nation JOIN region ON n_regionkey = r_regionkey"
        " GROUP BY r_name ORDER BY r_name"
    ),
    "user_click_purchase": (
        "SELECT COALESCE(c.user_id, p.user_id) AS user_id,"
        " COALESCE(c.n_clicks, 0) AS n_clicks,"
        " COALESCE(p.n_purchases, 0) AS n_purchases FROM"
        " (SELECT user_id, COUNT(*) AS n_clicks FROM events"
        "  WHERE event_type = 'click' GROUP BY user_id) c"
        " FULL OUTER JOIN"
        " (SELECT user_id, COUNT(*) AS n_purchases FROM events"
        "  WHERE event_type = 'purchase' GROUP BY user_id) p"
        " ON c.user_id = p.user_id ORDER BY user_id"
    ),
    "doc_regex_terms": (
        "SELECT token, COUNT(*) AS n FROM"
        " (SELECT unnest(list_filter(string_split(text, ' '),"
        "   t -> regexp_full_match(t, '[a-z]+a[a-z]+'))) AS token"
        "  FROM documents WHERE doc_id < 100)"
        " GROUP BY token ORDER BY n DESC, token LIMIT 15"
    ),
    "embedding_norm_stats": (
        "SELECT label, COUNT(*) AS n,"
        " ROUND(AVG(sqrt(list_sum(list_transform(embedding,"
        "   x -> x::DOUBLE * x::DOUBLE)))), 6) AS avg_norm,"
        " ROUND(MAX(sqrt(list_sum(list_transform(embedding,"
        "   x -> x::DOUBLE * x::DOUBLE)))), 6) AS max_norm"
        " FROM embeddings GROUP BY label ORDER BY label"
    ),
    "group_quantiles": (
        "SELECT o_orderpriority, round(quantile_disc(o_totalprice, 0.5), 2) AS median_price"
        " FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    "heavy_hitters": (
        "SELECT token, COUNT(*)::BIGINT AS n FROM"
        " (SELECT unnest(string_split(text, ' ')) AS token FROM documents)"
        " GROUP BY token ORDER BY n DESC, token LIMIT 20"
    ),
    "bloom_semi_join": (
        "SELECT l_returnflag, round(SUM(l_extendedprice), 2) AS revenue, COUNT(*)::BIGINT AS n"
        " FROM lineitem WHERE l_orderkey IN"
        " (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)"
        " GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    # rows-only (no SQL oracle): lang_id_docs, doc_fingerprints, simhash_docs,
    # embedding_topk_lsh (approximate; recall gate in tests),
    # approx_distinct_hll (sketch estimate; tolerance + golden gates in tests),
    # price_quantile_sketch (DDSketch estimate; relative-tolerance + golden),
    # embedding_clusters (iterative k-means — not SQL-expressible; golden)
}

# same semantics, different distributed algorithm — share the exact oracles
ORACLE_SQL["dedup_clusters_labelprop"] = ORACLE_SQL["dedup_clusters"]
ORACLE_SQL["embedding_topk_int8"] = ORACLE_SQL["embedding_topk"]
ORACLE_SQL["local_supplier_revenue"] = (
    "SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue"
    " FROM customer JOIN orders ON c_custkey = o_custkey"
    " JOIN lineitem ON l_orderkey = o_orderkey"
    " JOIN supplier ON l_suppkey = s_suppkey"
    " JOIN nation ON s_nationkey = n_nationkey"
    " JOIN region ON n_regionkey = r_regionkey"
    " WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'"
    " GROUP BY n_name"
)
ORACLE_SQL["promo_revenue_share"] = (
    "SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'"
    "  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)"
    " / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share"
    " FROM lineitem JOIN part ON l_partkey = p_partkey"
)
ORACLE_SQL["large_volume_customers"] = (
    "WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS sum_qty"
    "  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 200)"
    " SELECT c_name, o_orderkey, o_totalprice, sum_qty"
    " FROM big JOIN orders ON o_orderkey = l_orderkey"
    " JOIN customer ON c_custkey = o_custkey"
    " ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"
)
ORACLE_SQL["doc_length_histogram"] = (
    "SELECT CAST(FLOOR(LOG2(n_chars)) AS BIGINT) AS bucket,"
    " COUNT(*)::BIGINT AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars"
    " FROM documents WHERE n_chars >= 1 GROUP BY bucket"
)
ORACLE_SQL["price_mad"] = (
    "WITH m AS (SELECT quantile_disc(o_totalprice, 0.5) AS med FROM orders)"
    " SELECT ROUND((SELECT med FROM m), 4) AS median_price,"
    " ROUND(quantile_disc(ABS(o_totalprice - (SELECT med FROM m)), 0.5), 4) AS mad_price"
    " FROM orders"
)
ORACLE_SQL["top_terms_by_lang"] = (
    "WITH tf AS (SELECT lang, token, COUNT(DISTINCT doc_id) AS df FROM"
    "  (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents)"
    "  GROUP BY lang, token),"
    " r AS (SELECT lang, token, df,"
    "  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY df DESC, token) AS rn FROM tf)"
    " SELECT lang, token, df FROM r WHERE rn <= 5 ORDER BY lang, df DESC, token"
)
ORACLE_SQL["revenue_streaks"] = (
    "WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,"
    "  SUM(o_totalprice) AS r FROM orders GROUP BY 1),"
    " m AS (SELECT AVG(r) AS mu FROM d),"
    " a AS (SELECT day, r, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM d),"
    " f AS (SELECT day, rn FROM a WHERE r > (SELECT mu FROM m)),"
    " g AS (SELECT day, rn, rn - ROW_NUMBER() OVER (ORDER BY rn) AS grp FROM f),"
    " s AS (SELECT MIN(day) AS start_day, MAX(day) AS end_day,"
    "  COUNT(*)::BIGINT AS len FROM g GROUP BY grp)"
    " SELECT start_day, end_day, len FROM s ORDER BY len DESC, start_day LIMIT 5"
)
ORACLE_SQL["revenue_ewma"] = (
    "WITH RECURSIVE d AS ("
    " SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, SUM(o_totalprice) AS r,"
    "  ROW_NUMBER() OVER (ORDER BY strftime(o_orderdate, '%Y-%m-%d')) AS rn"
    " FROM orders GROUP BY 1),"
    " e AS (SELECT day, rn, r, r AS ew FROM d WHERE rn = 1"
    "  UNION ALL SELECT d.day, d.rn, d.r, 0.2 * d.r + 0.8 * e.ew"
    "  FROM d JOIN e ON d.rn = e.rn + 1)"
    " SELECT day, ROUND(r, 4) AS revenue, ROUND(ew, 4) AS ewma FROM e ORDER BY day"
)
ORACLE_SQL["nation_market_share"] = (
    "SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,"
    " ROUND(SUM(CASE WHEN s_nationkey = 7 THEN l_extendedprice * (1 - l_discount)"
    "  ELSE 0 END) / SUM(l_extendedprice * (1 - l_discount)), 6) AS share"
    " FROM customer JOIN orders ON c_custkey = o_custkey"
    " JOIN lineitem ON l_orderkey = o_orderkey"
    " JOIN supplier ON l_suppkey = s_suppkey"
    " JOIN nation ON c_nationkey = n_nationkey"
    " JOIN region ON n_regionkey = r_regionkey"
    " WHERE r_name = 'ASIA'"
    " GROUP BY o_year ORDER BY o_year"
)
ORACLE_SQL["returned_revenue_customers"] = (
    "SELECT c_custkey, c_name, n_name,"
    " ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue"
    " FROM customer JOIN orders ON c_custkey = o_custkey"
    " JOIN lineitem ON l_orderkey = o_orderkey"
    " JOIN nation ON c_nationkey = n_nationkey"
    " WHERE l_returnflag = 'R' AND o_orderdate >= '1996-01-01'"
    "  AND o_orderdate < '1997-01-01'"
    " GROUP BY c_custkey, c_name, n_name"
    " ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, c_custkey LIMIT 20"
)
ORACLE_SQL["top_supplier"] = (
    "WITH rev AS (SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS t"
    "  FROM lineitem WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'"
    "  GROUP BY l_suppkey)"
    " SELECT s_suppkey, s_name, ROUND(t, 4) AS total_revenue"
    " FROM rev JOIN supplier ON s_suppkey = l_suppkey"
    " WHERE ROUND(t, 4) = (SELECT MAX(ROUND(t, 4)) FROM rev) ORDER BY s_suppkey"
)
ORACLE_SQL["banded_brand_revenue"] = (
    "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,"
    " COUNT(*)::BIGINT AS n_items"
    " FROM lineitem JOIN part ON p_partkey = l_partkey"
    " WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5"
    "        AND l_quantity BETWEEN 1 AND 11)"
    "    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10"
    "        AND l_quantity BETWEEN 10 AND 20)"
    "    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15"
    "        AND l_quantity BETWEEN 20 AND 30)"
)
ORACLE_SQL["discount_revenue_effect"] = (
    "SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue_effect,"
    " COUNT(*)::BIGINT AS n_items FROM lineitem"
    " WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
)
ORACLE_SQL["small_quantity_part_revenue"] = (
    "SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly,"
    " COUNT(*)::BIGINT AS n_items"
    " FROM lineitem JOIN part ON p_partkey = l_partkey"
    " WHERE p_brand = 'Brand#1' AND l_quantity <"
    "  (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2"
    "   WHERE l2.l_partkey = lineitem.l_partkey)"
)
ORACLE_SQL["docs_source_share"] = (
    "SELECT source, COUNT(*)::BIGINT AS n,"
    " ROUND(COUNT(*) / SUM(COUNT(*)) OVER (), 6) AS share"
    " FROM documents GROUP BY source ORDER BY source"
)
ORACLE_SQL["events_zscore_outliers"] = (
    "WITH z AS (SELECT event_id, event_type,"
    "  (value - AVG(value) OVER (PARTITION BY event_type))"
    "   / STDDEV_SAMP(value) OVER (PARTITION BY event_type) AS zr FROM events)"
    " SELECT event_id, event_type, ROUND(zr, 6) AS z FROM z"
    " ORDER BY ABS(zr) DESC, event_id LIMIT 20"
)
ORACLE_SQL["part_supplier_counts"] = (
    "SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt"
    " FROM lineitem JOIN part ON l_partkey = p_partkey"
    " WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)"
    " GROUP BY p_brand, p_size ORDER BY p_brand, p_size"
)
ORACLE_SQL["customers_only_f_orders"] = (
    "WITH x AS (SELECT o_custkey FROM orders GROUP BY o_custkey"
    "  HAVING COUNT(*) = SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END))"
    " SELECT c_mktsegment, COUNT(*)::BIGINT AS n_customers"
    " FROM x JOIN customer ON c_custkey = o_custkey"
    " GROUP BY c_mktsegment ORDER BY c_mktsegment"
)
ORACLE_SQL["revenue_daily_growth"] = (
    "WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,"
    "  SUM(o_totalprice) AS r FROM orders GROUP BY 1)"
    " SELECT day, ROUND(r, 4) AS revenue,"
    " ROUND(100.0 * (r - LAG(r) OVER (ORDER BY day)) / LAG(r) OVER (ORDER BY day), 6)"
    "  AS growth_pct FROM d ORDER BY day"
)
ORACLE_SQL["nation_trade_volume"] = (
    "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,"
    " EXTRACT(year FROM l_shipdate)::BIGINT AS l_year,"
    " ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue"
    " FROM lineitem JOIN orders ON o_orderkey = l_orderkey"
    " JOIN supplier ON s_suppkey = l_suppkey"
    " JOIN customer ON c_custkey = o_custkey"
    " JOIN nation n1 ON s_nationkey = n1.n_nationkey"
    " JOIN nation n2 ON c_nationkey = n2.n_nationkey"
    " WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')"
    "     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))"
    "   AND l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01'"
    " GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
)
ORACLE_SQL["customer_order_histogram"] = (
    "WITH c AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count"
    "  FROM customer LEFT JOIN orders ON o_custkey = c_custkey"
    "  GROUP BY c_custkey)"
    " SELECT c_count, COUNT(*)::BIGINT AS custdist FROM c"
    " GROUP BY c_count ORDER BY c_count"
)
ORACLE_SQL["idle_rich_customers"] = (
    "SELECT c_nationkey, COUNT(*)::BIGINT AS numcust,"
    " ROUND(SUM(c_acctbal), 4) AS totacctbal"
    " FROM customer"
    " WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)"
    "   AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    " GROUP BY c_nationkey ORDER BY c_nationkey"
)
ORACLE_SQL["distinct_users_sliding7"] = (
    "WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),"
    " days AS (SELECT DISTINCT day FROM du)"
    " SELECT strftime(d.day, '%Y-%m-%d') AS day,"
    " COUNT(DISTINCT u.user_id)::BIGINT AS users_7d"
    " FROM days d JOIN du u"
    "   ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day"
    " GROUP BY 1 ORDER BY 1"
)
ORACLE_SQL["late_ship_orders"] = (
    "SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count"
    " FROM orders"
    " WHERE EXISTS (SELECT 1 FROM lineitem"
    "   WHERE l_orderkey = o_orderkey"
    "     AND l_shipdate > o_orderdate + INTERVAL 60 DAY)"
    " GROUP BY o_orderpriority ORDER BY o_orderpriority"
)
ORACLE_SQL["lines_by_priority_class"] = (
    "SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,"
    " SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')"
    "   THEN 1 ELSE 0 END)::BIGINT AS high_line_count,"
    " SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')"
    "   THEN 0 ELSE 1 END)::BIGINT AS low_line_count"
    " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    " GROUP BY 1 ORDER BY 1"
)
ORACLE_SQL["waiting_suppliers"] = (
    "WITH sm AS (SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS sm"
    "   FROM lineitem GROUP BY 1, 2),"
    " st AS (SELECT l_orderkey, MAX(sm) AS mx, COUNT(*) AS nsupp"
    "   FROM sm GROUP BY 1),"
    " am AS (SELECT sm.l_orderkey, COUNT(*) AS n_at_max"
    "   FROM sm JOIN st USING (l_orderkey) WHERE sm.sm = st.mx GROUP BY 1)"
    " SELECT s.s_name AS s_name, COUNT(*)::BIGINT AS numwait"
    " FROM sm JOIN st USING (l_orderkey) JOIN am USING (l_orderkey)"
    " JOIN supplier s ON s.s_suppkey = sm.l_suppkey"
    " WHERE st.nsupp >= 2 AND am.n_at_max = 1 AND sm.sm = st.mx"
    " GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10"
)


def q_gopher_quality_docs(sf_dir: str) -> pd.DataFrame:
    """Gopher-style quality-rule gate (Rae et al. 2021 §A1.1, public): per
    lang, how many documents pass ALL of (a) word count within [5, 10 000],
    (b) mean word length within [3, 10] chars, (c) most-frequent word ≤ 20 %
    of the document. All three rules are evaluated in EXACT integer
    arithmetic (cross-multiplied bounds — no float ratios), so the DuckDB
    oracle hash-matches bit-for-bit. Vectorized per batch via polars
    explode → two-level groupby (token counts → per-doc stats); each batch
    emits ≤ |langs| partial rows, so the only shuffle moves partials."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def f(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(b).with_columns(pl.col("text").str.split(" ").alias("w"))
        wc = (
            df.select("doc_id", "lang", "w")
            .explode("w")
            .group_by("doc_id", "lang", "w")
            .agg(pl.len().alias("c"))
        )
        per = wc.group_by("doc_id", "lang").agg(
            pl.col("c").sum().alias("n_words"),
            (pl.col("c") * pl.col("w").str.len_bytes().cast(pl.Int64))
            .sum()
            .alias("twc"),
            pl.col("c").max().alias("top_cnt"),
        )
        per = per.with_columns(
            (
                pl.col("n_words").is_between(5, 10_000)
                & (3 * pl.col("n_words") <= pl.col("twc"))
                & (pl.col("twc") <= 10 * pl.col("n_words"))
                & (5 * pl.col("top_cnt") <= pl.col("n_words"))
            )
            .cast(pl.Int64)
            .alias("kept")
        )
        out = per.group_by("lang").agg(
            pl.len().cast(pl.Int64).alias("n_docs"), pl.col("kept").sum().alias("n_kept")
        )
        return out.to_arrow()

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_kept", alias_name="n_kept"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_kept"] = out["n_kept"].astype("int64")
    return out[["lang", "n_docs", "n_kept"]]


QUERIES["gopher_quality_docs"] = q_gopher_quality_docs
ORACLE_SQL["gopher_quality_docs"] = (
    "WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word"
    "   FROM documents),"
    " wc AS (SELECT doc_id, lang, word, COUNT(*) AS c FROM w GROUP BY ALL),"
    " per AS (SELECT doc_id, lang, SUM(c) AS n_words,"
    "   SUM(c * length(word)) AS twc, MAX(c) AS top_cnt FROM wc GROUP BY 1, 2)"
    " SELECT lang, COUNT(*)::BIGINT AS n_docs,"
    " SUM(CASE WHEN n_words BETWEEN 5 AND 10000"
    "   AND 3 * n_words <= twc AND twc <= 10 * n_words"
    "   AND 5 * top_cnt <= n_words THEN 1 ELSE 0 END)::BIGINT AS n_kept"
    " FROM per GROUP BY lang ORDER BY lang"
)


def q_semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    method): embeddings are clustered by the cached distributed spherical
    k-means index (`_ivf_index`), then WITHIN each cluster a row is dropped
    when any lower-vec_id row of the same cluster has cosine ≥ 0.4 — the
    paper's keep-one-per-semantic-duplicate-set rule, made deterministic by
    the lowest-id-wins order. The per-cluster pairwise similarity runs
    vectorized inside ``map_groups`` over the bucket-PARTITIONED assignment
    table (partitioning assumption, as in the paper: cluster size is bounded
    by choosing K ∝ N/target-cluster-size, so the O(|cluster|²) matmul stays
    node-local and the clusters are embarrassingly parallel). Output:
    per-cluster kept/dropped counts. No SQL oracle (k-means is iterative);
    golden-pinned + full numpy recompute in tests/test_wave13.py."""
    from ..sources import lance_table as lt

    path, _cents = _ivf_index(sf_dir)
    TAU = 0.4

    def dedup_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="stable")
        e = np.array(list(g["embedding"]), dtype=np.float64)
        en = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        s = en @ en.T
        # strictly-lower-triangle max: does any EARLIER row sit within TAU?
        dropped = (np.tril(s, k=-1) >= TAU).any(axis=1)
        return pd.DataFrame(
            {
                "cluster_id": [int(g["bucket"].iloc[0])],
                "n": [len(g)],
                "n_dropped": [int(dropped.sum())],
            }
        )

    out = (
        lt.read_dataset(path, columns=["vec_id", "embedding", "bucket"])
        .groupby("bucket")
        .map_groups(dedup_seg, batch_format="pandas")
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    return out[["cluster_id", "n", "n_dropped"]].astype(
        {"cluster_id": "int64", "n": "int64", "n_dropped": "int64"}
    )


QUERIES["semantic_dedup"] = q_semantic_dedup


# ------------- wave 14: BM25 retrieval / CCNet buckets / CDC chunk dedup ----


def q_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 ranked retrieval (Robertson-Spärck Jones, public; k1=1.2,
    b=0.75) of the 10 best documents for a fixed 4-term query — the lexical
    half of the pa2 hybrid search (Vector_db_querier.py:100-124 uses
    Postgres ts_rank_cd; BM25 is its standard public counterpart). Two
    streaming scans: scan 1 folds each batch to ≤6 partial rows (doc count,
    Σ doc-length, per-term document frequency) via polars list kernels —
    the groupby shuffle moves those partials only; the merged 6-number
    stats broadcast in the scan-2 closure, which scores every doc
    vectorized (list.count_matches, no row loop) and emits a per-batch
    partial top-10, merged result-sized on the driver. Scores round to 6
    before ranking on BOTH sides so near-tie order is stable vs DuckDB."""
    TERMS = ("dup", "hash", "merge", "scan")
    K1, B = 1.2, 0.75
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def stats_f(b: pa.Table) -> pa.Table:
        import polars as pl

        w = pl.from_arrow(b["text"]).str.split(" ")
        keys = ["\x00n", "\x00dl"] + list(TERMS)
        vals = [len(w), int(w.list.len().cast(pl.Int64).sum())] + [
            int(w.list.contains(t).cast(pl.Int64).sum()) for t in TERMS
        ]
        return pa.table(
            {"k": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())}
        )

    st = (
        _coalesce_partials(ds.map_batches(stats_f, batch_format="pyarrow"))
        .groupby("k")
        .aggregate(Sum("v", alias_name="v"))
        .to_pandas()
        .set_index("k")["v"]
    )
    n, avgdl = float(st["\x00n"]), float(st["\x00dl"]) / float(st["\x00n"])
    dfs = {t: float(st.get(t, 0)) for t in TERMS}

    def score_f(b: pa.Table, _n=n, _avgdl=avgdl, _dfs=dfs) -> pa.Table:
        import polars as pl

        w = pl.from_arrow(b["text"]).str.split(" ")
        dl = w.list.len().cast(pl.Float64).to_numpy()
        s = np.zeros(len(dl), dtype=np.float64)
        for t in TERMS:
            if _dfs[t] == 0:
                continue
            tf = w.list.count_matches(t).cast(pl.Float64).to_numpy()
            idf = np.log(1.0 + (_n - _dfs[t] + 0.5) / (_dfs[t] + 0.5))
            s += idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / _avgdl))
        keep = s > 0.0
        part = pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy()[keep], "score": np.round(s[keep], 6)}
        ).sort_values(["score", "doc_id"], ascending=[False, True]).head(10)
        return pa.Table.from_pandas(part, preserve_index=False)

    out = (
        ds.map_batches(score_f, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    return out[["doc_id", "score"]].astype({"doc_id": "int64"})


QUERIES["bm25_topk"] = q_bm25_topk
ORACLE_SQL["bm25_topk"] = (
    "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),"
    " dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM w GROUP BY 1),"
    " st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM dl),"
    " tf AS (SELECT doc_id, tok, COUNT(*)::DOUBLE AS tf FROM w"
    "   WHERE tok IN ('dup', 'hash', 'merge', 'scan') GROUP BY 1, 2),"
    " df AS (SELECT tok, COUNT(*)::DOUBLE AS df FROM tf GROUP BY 1),"
    " sc AS (SELECT tf.doc_id,"
    "   SUM(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2"
    "       / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS s"
    "  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN st GROUP BY 1)"
    " SELECT doc_id, ROUND(s, 6) AS score FROM sc"
    " ORDER BY score DESC, doc_id LIMIT 10"
)


def q_perplexity_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, public): score
    every document under the corpus-trained char-trigram LM (_tri_model —
    the same model as q_doc_lm_scores), then split the corpus into
    head/middle/tail TERCILES by exact global rank (lp DESC, doc_id ASC —
    head = most in-distribution) and report per-(bucket, lang) counts and
    mean log-prob. Exact NTILE at scale WITHOUT a global sort: the text is
    scanned exactly twice (model, scores); per-doc scores materialize as a
    ~16-byte/doc 3-column table, and the two tercile cut points come from
    `_histogram_select` rank selection over that table (O(log N) streaming
    histogram rounds), with the doc_id tiebreak resolved by pulling only
    the cut-VALUE tie group (data-bounded: lp is rounded to 6, ties are
    rare). Bucketing is then a broadcast 2-float compare; the final agg is
    k-row partials. Oracle: the trigram CTE chain + ROW_NUMBER NTILE."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    logp = _tri_model(ds)

    def score(b: pa.Table, _lp=logp) -> pa.Table:
        ids, langs, lps = [], [], []
        for d, lg, t in zip(
            b["doc_id"].to_numpy(), b["lang"].to_pylist(), b["text"].to_pylist()
        ):
            codes = _tri_codes(t)
            if len(codes):
                ids.append(int(d))
                langs.append(lg)
                lps.append(round(float(_lp[codes].mean()), 6))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "lp": pa.array(lps, pa.float64()),
            }
        )

    lp_ds = ds.map_batches(score, batch_format="pyarrow").materialize()
    agg = lp_ds.aggregate(Count(), Min("lp"), Max("lp"))
    n, lo, hi = int(agg["count()"]), float(agg["min(lp)"]), float(agg["max(lp)"])

    def cut_at(k: int):
        """(lp value, doc_id) of the k-th doc (1-based) in (lp DESC, doc_id
        ASC) order — the last doc still inside the bucket boundary."""
        if k <= 0:
            return float("inf"), -1
        v = _histogram_select(lp_ds, "lp", n - k, lo, hi)  # k-th largest

        def tie_f(b: pa.Table, _v=v) -> pa.Table:
            lp = b["lp"].to_numpy()
            ids = b["doc_id"].to_numpy()[lp == _v]
            kind = np.concatenate([np.zeros(1, np.int64), np.ones(len(ids), np.int64)])
            val = np.concatenate([[int((lp > _v).sum())], ids])
            return pa.table({"kind": pa.array(kind), "val": pa.array(val)})

        rows = lp_ds.map_batches(tie_f, batch_format="pyarrow").take_all()
        c_gt = sum(r["val"] for r in rows if r["kind"] == 0)
        ties = sorted(r["val"] for r in rows if r["kind"] == 1)
        return v, int(ties[k - c_gt - 1])

    v1, d1 = cut_at(n // 3)
    v2, d2 = cut_at((2 * n) // 3)

    def bucketize(b: pa.Table, _v1=v1, _d1=d1, _v2=v2, _d2=d2) -> pa.Table:
        lp = b["lp"].to_numpy()
        ids = b["doc_id"].to_numpy()
        head = (lp > _v1) | ((lp == _v1) & (ids <= _d1))
        mid = ~head & ((lp > _v2) | ((lp == _v2) & (ids <= _d2)))
        bucket = np.where(head, "head", np.where(mid, "middle", "tail"))
        t = pa.table(
            {"bucket": pa.array(bucket, pa.string()), "lang": b["lang"], "lp": b["lp"]}
        )
        return _partial(t, ["bucket", "lang"], [("lp", "sum"), ([], "count_all")])

    out = (
        _coalesce_partials(lp_ds.map_batches(bucketize, batch_format="pyarrow"))
        .groupby(["bucket", "lang"])
        .aggregate(Sum("lp_sum", alias_name="s"), Sum("count_all", alias_name="n_docs"))
        .to_pandas()
        .sort_values(["bucket", "lang"])
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["avg_lp"] = (out["s"] / out["n_docs"]).round(6)
    return out[["bucket", "lang", "n_docs", "avg_lp"]]


QUERIES["perplexity_buckets"] = q_perplexity_buckets
ORACLE_SQL["perplexity_buckets"] = (
    "WITH tg AS (SELECT doc_id, substring(text, i, 3) AS g FROM documents,"
    "  unnest(generate_series(1, length(text) - 2)) AS u(i)),"
    " cnt3 AS (SELECT g, COUNT(*) AS n3 FROM tg GROUP BY g),"
    " cnt2 AS (SELECT substring(g, 1, 2) AS g2, SUM(n3) AS n2 FROM cnt3 GROUP BY 1),"
    " scored AS (SELECT t.doc_id, ROUND(AVG(ln((c3.n3 + 1.0) / (c2.n2 + 27.0))), 6) AS lp"
    "  FROM tg t JOIN cnt3 c3 ON t.g = c3.g"
    "  JOIN cnt2 c2 ON substring(t.g, 1, 2) = c2.g2 GROUP BY t.doc_id),"
    " rk AS (SELECT s.doc_id, d.lang, s.lp,"
    "   ROW_NUMBER() OVER (ORDER BY s.lp DESC, s.doc_id) AS rn,"
    "   COUNT(*) OVER () AS n"
    "  FROM scored s JOIN documents d USING (doc_id))"
    " SELECT CASE WHEN rn <= n // 3 THEN 'head'"
    "   WHEN rn <= (2 * n) // 3 THEN 'middle' ELSE 'tail' END AS bucket,"
    "  lang, COUNT(*)::BIGINT AS n_docs, ROUND(AVG(lp), 6) AS avg_lp"
    " FROM rk GROUP BY 1, 2 ORDER BY 1, 2"
)


def q_cdc_chunk_stats(sf_dir: str) -> pd.DataFrame:
    """Content-defined-chunking dedup statistics (Rabin CDC — the public
    LBFS/FastCDC baseline): split every document at rolling-hash boundaries
    (hashing.cdc_chunks: 16-byte Karp-Rabin window, divisor 64 → ~60-byte
    expected chunks) and report, per lang, total chunks, DISTINCT chunks,
    the chunk-granularity dup ratio and mean chunk length — the storage/
    training-dedup measurement at sub-document granularity. Scale: chunk
    boundaries AND per-chunk content hashes both come vectorized from one
    prefix-sum pass per doc (no per-byte or per-chunk python; chunk text is
    never materialized); each batch folds to distinct-(lang, chunk-hash)
    partials, so the ONE hash-keyed groupby shuffle moves ≤ one row per
    distinct chunk per batch; per-lang totals then fold from that
    distinct-chunk-sized table via k-row partials. Golden-pinned (rolling
    hashes aren't SQL-expressible); the kernel is recompute-tested in
    tests/test_wave14.py."""
    from ray.data.aggregate import Count, Sum

    ds = _tbl(sf_dir, "documents", columns=["lang", "text"])

    def chunk_f(b: pa.Table) -> pa.Table:
        langs, hs, lens = [], [], []
        for lg, t in zip(b["lang"].to_pylist(), b["text"].to_pylist()):
            raw = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
            cuts, ch = hashing.cdc_chunks(raw)
            starts = np.concatenate(([0], cuts[:-1]))
            langs.extend([lg] * len(cuts))
            hs.append(ch)
            lens.append(cuts - starts)
        t_ = pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "h": pa.array(
                    np.concatenate(hs).view(np.int64)
                    if hs
                    else np.empty(0, np.int64)
                ),
                "len": pa.array(
                    np.concatenate(lens).astype(np.int64)
                    if lens
                    else np.empty(0, np.int64)
                ),
                "one": pa.array(
                    np.ones(len(langs), np.int64), pa.int64()
                ),
            }
        )
        return _partial(t_, ["lang", "h"], [("len", "sum"), ("one", "sum")])

    per_hash = (
        ds.map_batches(chunk_f, batch_format="pyarrow")
        .groupby(["lang", "h"])
        .aggregate(Sum("len_sum", alias_name="lsum"), Sum("one_sum", alias_name="n"))
    )

    def fold(b: pa.Table) -> pa.Table:
        return _partial(
            b, ["lang"], [("n", "sum"), ("lsum", "sum"), ([], "count_all")]
        )

    out = (
        _coalesce_partials(per_hash.map_batches(fold, batch_format="pyarrow"))
        .groupby("lang")
        .aggregate(
            Sum("n_sum", alias_name="n_chunks"),
            Sum("lsum_sum", alias_name="total_len"),
            Sum("count_all", alias_name="n_distinct"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out = out.astype({"n_chunks": "int64", "n_distinct": "int64"})
    out["dup_ratio"] = (1.0 - out["n_distinct"] / out["n_chunks"]).round(6)
    out["avg_len"] = (out["total_len"] / out["n_chunks"]).round(4)
    return out[["lang", "n_chunks", "n_distinct", "dup_ratio", "avg_len"]]


QUERIES["cdc_chunk_stats"] = q_cdc_chunk_stats


def q_repeat_orders_7d(sf_dir: str) -> pd.DataFrame:
    """Temporal RANGE self-join (interval join): pairs of orders by the same
    customer at most 7 days apart, COUNTED per customer and folded to the
    (n_pairs → n_customers) histogram — the repeat-engagement shape of a
    retention pipeline, and the one join family (range join) SURVEY §2 J*
    lacked a dedicated entry for. Scale plan: pairs are never materialized —
    a fixed-count custkey hash-bucket shuffle, then per bucket ONE lexsort
    merge (rows + ts+7d probe points in one array) yields every row's
    in-window successor count vectorized; a hot customer with R orders in a
    burst costs O(R log R) counting, not O(R²) pair emission. Per-customer
    sums fold via np.add.reduceat; only the ≤(distinct n_pairs)-row
    histogram crosses the final reduce."""
    from ray.data.aggregate import Sum

    W = np.int64(7 * 86_400_000_000)  # 7 days in µs
    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def add_ub(b: pa.Table) -> pa.Table:
        ub = (
            b["o_custkey"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)
        ).astype(np.int32)
        return b.append_column("ub", pa.array(ub))

    def pairs_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="stable"
        )
        ck = g["o_custkey"].to_numpy()
        ts = g["o_orderdate"].to_numpy().astype("datetime64[us]").view(np.int64)
        n = len(ck)
        if n == 0:
            return pd.DataFrame({"n_pairs": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        # merged-rank trick: rows and their ts+W probes lexsorted together;
        # a probe's sorted position minus the probes before it = #rows with
        # (cust, ts) <= (cust_i, ts_i + W)  — all vectorized, no per-key loop
        m_ck = np.concatenate([ck, ck])
        m_ts = np.concatenate([ts, ts + W])
        m_q = np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
        order = np.lexsort((m_q, m_ts, m_ck))  # probes AFTER equal (ck, ts) rows
        isq = m_q[order] == 1
        q_before = np.cumsum(isq) - 1  # among sorted, #probes at or before pos
        sorted_pos = np.empty(2 * n, dtype=np.int64)
        sorted_pos[order] = np.arange(2 * n)
        probe_pos = sorted_pos[n:]  # sorted rank of probe k
        count_le = probe_pos - q_before[probe_pos]  # rows ranked before probe k
        new = np.concatenate(([True], ck[1:] != ck[:-1]))
        seg_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        local = np.arange(n) - seg_start
        succ = count_le - seg_start - local - 1  # strictly-after, in-window rows
        per_cust = np.add.reduceat(succ, np.nonzero(new)[0])
        per_cust = per_cust[per_cust > 0]
        if len(per_cust) == 0:
            return pd.DataFrame({"n_pairs": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        vals, cnts = np.unique(per_cust, return_counts=True)
        return pd.DataFrame({"n_pairs": vals.astype(np.int64),
                             "cnt": cnts.astype(np.int64)})

    out = (
        _coalesce_partials(
            ds.map_batches(add_ub, batch_format="pyarrow")
            .groupby("ub")
            .map_groups(pairs_seg, batch_format="pandas")
        )
        .groupby("n_pairs")
        .aggregate(Sum("cnt", alias_name="n_customers"))
        .to_pandas()
        .sort_values("n_pairs")
        .reset_index(drop=True)
    )
    return out.astype({"n_pairs": "int64", "n_customers": "int64"})


QUERIES["repeat_orders_7d"] = q_repeat_orders_7d
ORACLE_SQL["repeat_orders_7d"] = (
    "WITH p AS (SELECT a.o_custkey AS ck, COUNT(*) AS n_pairs"
    " FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey"
    "  AND (a.o_orderdate < b.o_orderdate OR"
    "   (a.o_orderdate = b.o_orderdate AND a.o_orderkey < b.o_orderkey))"
    "  AND b.o_orderdate <= a.o_orderdate + INTERVAL 7 DAY"
    " GROUP BY 1)"
    " SELECT n_pairs, COUNT(*)::BIGINT AS n_customers"
    " FROM p GROUP BY 1 ORDER BY 1"
)


def q_lang_sources_concat(sf_dir: str) -> pd.DataFrame:
    """Ordered-set STRING aggregation per group: string_agg(DISTINCT source
    ORDER BY source) + distinct count per lang — the label-manifest shape
    (which corpora feed each language bucket). Scale plan: each batch folds
    to its distinct (lang, source) pairs via the arrow group_by combiner, so
    the one shuffle moves ≤|langs|×|sources| partial rows per block; the
    concat itself runs on the driver over the result-sized distinct-pair
    table (string concatenation is inherently ordered, and the pair table
    IS the result grain)."""
    from ray.data.aggregate import Count

    ds = _tbl(sf_dir, "documents", columns=["lang", "source"])
    pairs = (
        _coalesce_partials(
            ds.map_batches(
                lambda b: _partial(b, ["lang", "source"], [([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    pairs = pairs.sort_values(["lang", "source"])
    out = (
        pairs.groupby("lang", sort=True)["source"]
        .agg(n_sources="nunique", sources=",".join)
        .reset_index()
    )
    return out.astype({"n_sources": "int64"})[["lang", "n_sources", "sources"]]


QUERIES["lang_sources_concat"] = q_lang_sources_concat
ORACLE_SQL["lang_sources_concat"] = (
    "SELECT lang, COUNT(DISTINCT source)::BIGINT AS n_sources,"
    " string_agg(DISTINCT source, ',' ORDER BY source) AS sources"
    " FROM documents GROUP BY lang ORDER BY lang"
)


def q_nation_spend_above_median(sf_dir: str) -> pd.DataFrame:
    """Global-median broadcast composite: the share of each nation's
    customers whose lifetime spend exceeds the GLOBAL median customer spend
    — an exact PERCENT_RANK-style comparison against a global order
    statistic without any global sort. Plan: (1) one partial-agg shuffle
    reduces orders to the per-customer spend table (aggregate-result-sized,
    materialized once so the selection rounds don't re-run the groupby);
    (2) the exact median comes from :func:`_histogram_select` over that
    table (4096-bin refinement, PERCENTILE_CONT interpolation between the
    two middle ranks); (3) one final scan joins the broadcast
    custkey→nation dim and folds (nation, above, total) partials. Spends
    round to cents before the compare so distributed summation order can't
    flip a borderline row vs the oracle."""
    from ray.data.aggregate import Max, Min, Sum

    from .joins import broadcast_join

    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    spend = (
        ds.map_batches(
            lambda b: _partial(b, ["o_custkey"], [("o_totalprice", "sum")]),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("o_totalprice_sum", alias_name="s_raw"))
        .map_batches(
            lambda b: pa.table(
                {
                    "o_custkey": b["o_custkey"],
                    "s": pa.array(np.round(b["s_raw"].to_numpy(), 2)),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n = spend.count()
    mm = spend.aggregate(Min("s"), Max("s"))
    lo, hi = float(mm["min(s)"]), float(mm["max(s)"])
    if n % 2 == 1:
        med = _histogram_select(spend, "s", n // 2, lo, hi)
    else:
        a = _histogram_select(spend, "s", n // 2 - 1, lo, hi)
        b_ = _histogram_select(spend, "s", n // 2, lo, hi)
        med = (a + b_) / 2.0

    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nk = nation.column("n_nationkey").to_numpy()
    order = np.argsort(nk)
    pos = np.searchsorted(nk[order], cust.column("c_nationkey").to_numpy())
    dim = pa.table(
        {
            "o_custkey": cust["c_custkey"],
            "nation": nation.column("n_name").take(pa.array(order)).take(
                pa.array(pos, pa.int64())
            ),
        }
    )

    def fold(b: pa.Table, _m=med) -> pa.Table:
        t = pa.table(
            {
                "nation": b["nation"],
                "above": pa.array(
                    (b["s"].to_numpy() > _m).astype(np.int64)
                ),
            }
        )
        return _partial(t, ["nation"], [("above", "sum"), ([], "count_all")])

    out = (
        _coalesce_partials(
            broadcast_join(spend, dim, "o_custkey", ["nation"]).map_batches(
                fold, batch_format="pyarrow"
            )
        )
        .groupby("nation")
        .aggregate(
            Sum("above_sum", alias_name="n_above"),
            Sum("count_all", alias_name="n_customers"),
        )
        .to_pandas()
        .sort_values("nation")
        .reset_index(drop=True)
    )
    out = out.astype({"n_above": "int64", "n_customers": "int64"})
    out["share_above"] = (out["n_above"] / out["n_customers"]).round(6)
    return out[["nation", "n_customers", "n_above", "share_above"]]


QUERIES["nation_spend_above_median"] = q_nation_spend_above_median
ORACLE_SQL["nation_spend_above_median"] = (
    "WITH spend AS (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS s"
    "  FROM orders GROUP BY o_custkey),"
    " m AS (SELECT median(s) AS med FROM spend)"
    " SELECT n.n_name AS nation, COUNT(*)::BIGINT AS n_customers,"
    "  SUM(CASE WHEN s > med THEN 1 ELSE 0 END)::BIGINT AS n_above,"
    "  ROUND(SUM(CASE WHEN s > med THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)"
    "   AS share_above"
    " FROM spend JOIN customer c ON o_custkey = c_custkey"
    " JOIN nation n ON c_nationkey = n_nationkey, m"
    " GROUP BY 1 ORDER BY 1"
)


def q_purchase_next_click(sf_dir: str) -> pd.DataFrame:
    """FORWARD as-of join (the LEAD-side twin of q_purchase_asof_click):
    each purchase matched to the same user's FIRST click strictly after it,
    folded to per-day (purchases, matched, exact total gap µs). Scale shape:
    fixed-count user-hash bucket shuffle, ONE lexsort per bucket (clicks
    ordered before purchases at equal ts, so a suffix-min over click
    positions realizes the strictly-after semantics), per-day partials out
    — no per-user groups, gaps summed as exact int64 microseconds so the
    oracle compare has no float-order jitter."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def fwd_seg(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].to_numpy()
        is_p = et == "purchase"
        is_c = et == "click"
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        order = np.lexsort((is_p, ts, uid))  # clicks first at equal (user, ts)
        uid, is_p, is_c, ts = uid[order], is_p[order], is_c[order], ts[order]
        n = len(uid)
        cols = {
            "day": pd.Series([], dtype="object"),
            "p": pd.Series([], dtype="int64"),
            "m": pd.Series([], dtype="int64"),
            "gap": pd.Series([], dtype="int64"),
        }
        if n == 0 or not is_p.any():
            return pd.DataFrame(cols)
        idx = np.arange(n, dtype=np.int64)
        click_pos = np.where(is_c, idx, n)
        sm = np.minimum.accumulate(click_pos[::-1])[::-1]
        nxt = np.concatenate([sm[1:], [n]])  # first click at a position > i
        new = np.r_[True, uid[1:] != uid[:-1]]
        seg_id = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        ends = np.r_[starts[1:], n]
        matched = is_p & (nxt < ends[seg_id])
        p_idx = np.nonzero(is_p)[0]
        day = np.datetime_as_string(
            (ts[p_idx] // np.int64(86_400_000_000)).astype("datetime64[D]")
        )
        gap = np.where(matched[p_idx], ts[np.minimum(nxt[p_idx], n - 1)] - ts[p_idx], 0)
        df = pd.DataFrame(
            {"day": day, "p": 1, "m": matched[p_idx].astype(np.int64), "gap": gap}
        )
        out = df.groupby("day", sort=False, as_index=False).sum()
        return out.astype({"p": "int64", "m": "int64", "gap": "int64"})

    out = (
        _coalesce_partials(
            ds.map_batches(_with_user_bucket, batch_format="pyarrow")
            .groupby("ub")
            .map_groups(fwd_seg, batch_format="pandas")
        )
        .groupby("day")
        .aggregate(
            Sum("p", alias_name="n_purchases"),
            Sum("m", alias_name="n_matched"),
            Sum("gap", alias_name="gap_us"),
        )
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    return out.astype(
        {"n_purchases": "int64", "n_matched": "int64", "gap_us": "int64"}
    )[["day", "n_purchases", "n_matched", "gap_us"]]


QUERIES["purchase_next_click"] = q_purchase_next_click
ORACLE_SQL["purchase_next_click"] = (
    "WITH p AS (SELECT e.ts,"
    "  (SELECT MIN(c.ts) FROM events c WHERE c.user_id = e.user_id"
    "    AND c.event_type = 'click' AND c.ts > e.ts) AS nxt"
    " FROM events e WHERE e.event_type = 'purchase')"
    " SELECT strftime(ts, '%Y-%m-%d') AS day,"
    "  COUNT(*)::BIGINT AS n_purchases, COUNT(nxt)::BIGINT AS n_matched,"
    "  COALESCE(SUM(epoch_us(nxt) - epoch_us(ts)), 0)::BIGINT AS gap_us"
    " FROM p GROUP BY 1 ORDER BY 1"
)


# =================== wave 16: sweep-line, set-similarity, moments, PQ-ANN ====


def q_peak_concurrent_sessions(sf_dir: str) -> pd.DataFrame:
    """Peak CONCURRENT session count across all users — the sweep-line /
    interval-stabbing window op (§2.9 streaming family): sessionize (1 h gap,
    same contract as q_user_sessions), turn every session [st, en] into two
    deltas (+1 at st, −1 at en+1 µs), and take the max of the running sum.
    Scale plan: sessions come from the `_N_UB` hash-bucket segmented scan
    (no per-user groups); the GLOBAL running max then uses the distributed
    two-pass prefix scan (same shape as q_token_packing): (1) deltas fold to
    per-DAY-bucket sums, the driver cumsums the day-count-sized series into
    exclusive bucket offsets, (2) a day-bucket-partitioned pass sorts only
    within its bucket and emits one (bucket max) partial. No global sort, no
    fact-scale driver state; deltas are session-count-scale."""
    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    _DAY = np.int64(86_400_000_000)

    def deltas_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([False], (ts[1:] - ts[:-1]) > 3600 * 1_000_000))
        starts = np.flatnonzero(new_user | gap)
        ends = np.concatenate((starts[1:], [len(ts)])) - 1
        d_ts = np.concatenate([ts[starts], ts[ends] + 1])
        d_dl = np.concatenate(
            [np.ones(len(starts), np.int64), -np.ones(len(ends), np.int64)]
        )
        return pd.DataFrame({"tb": d_ts // _DAY, "ts_us": d_ts, "delta": d_dl})

    deltas = (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(deltas_seg, batch_format="pandas")
        .materialize()  # session-count-scale (two deltas per session)
    )
    from ray.data.aggregate import Sum

    bsums = (
        _coalesce_partials(
            deltas.map_batches(
                lambda b: _partial(b.select(["tb", "delta"]), ["tb"], [("delta", "sum")]),
                batch_format="pyarrow",
            )
        )
        .groupby("tb")
        .aggregate(Sum("delta_sum", alias_name="s"))
        .to_pandas()
        .sort_values("tb")
    )
    off = dict(
        zip(
            bsums["tb"].astype(int),
            np.concatenate(([0], np.cumsum(bsums["s"].to_numpy())[:-1])),
        )
    )

    def bucket_max(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts_us"].to_numpy()
        dl = g["delta"].to_numpy()
        # RANGE window semantics: all deltas at one instant apply together
        order = np.argsort(ts, kind="stable")
        ts_s, dl_s = ts[order], dl[order]
        uts, starts = np.unique(ts_s, return_index=True)
        per_ts = np.add.reduceat(dl_s, starts)
        run = np.cumsum(per_ts) + off[int(g["tb"].iloc[0])]
        return pd.DataFrame({"mx": [int(run.max())]})

    parts = (
        deltas.groupby("tb").map_groups(bucket_max, batch_format="pandas").to_pandas()
    )
    return pd.DataFrame({"peak_concurrent": [int(parts["mx"].max())]}).astype("int64")


QUERIES["peak_concurrent_sessions"] = q_peak_concurrent_sessions
ORACLE_SQL["peak_concurrent_sessions"] = (
    "WITH o AS (SELECT user_id, ts, event_id, CASE WHEN LAG(ts) OVER w IS NULL OR"
    "   ts - LAG(ts) OVER w > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS is_start"
    "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " s AS (SELECT user_id, ts, SUM(is_start) OVER"
    "   (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid"
    "  FROM o),"
    " b AS (SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en FROM s GROUP BY 1, 2),"
    " d AS (SELECT st AS ts, 1 AS delta FROM b"
    "  UNION ALL SELECT en + INTERVAL 1 MICROSECOND, -1 FROM b),"
    " r AS (SELECT SUM(delta) OVER (ORDER BY ts RANGE UNBOUNDED PRECEDING) AS active FROM d)"
    " SELECT MAX(active)::BIGINT AS peak_concurrent FROM r"
)


def q_event_type_user_jaccard(sf_dir: str) -> pd.DataFrame:
    """Jaccard similarity between event types over their USER SETS — the
    set-similarity-between-categories op (audience-overlap analysis). Scale
    plan: with ≤ 64 types, each user's type set packs into ONE uint64
    bitmask: per-batch bitwise-OR partials (np.bitwise_or.reduceat over the
    user-sorted batch), `ub`-bucket shuffle, per-bucket final OR + mask
    HISTOGRAM — so only (mask, count) rows (≤ 2^|types|, practically tiny)
    reach the driver, which expands the pairwise intersection/union counts
    from the histogram. No distinct-pair shuffle, no self-join."""
    from ray.data.aggregate import Sum

    ds0 = _tbl(sf_dir, "events", columns=["event_type"])
    types = sorted(
        _coalesce_partials(
            ds0.map_batches(
                lambda b: _partial(b, ["event_type"], [([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby("event_type")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()["event_type"]
        .tolist()
    )
    bit_of = {t: i for i, t in enumerate(types)}

    ds = _tbl(sf_dir, "events", columns=["user_id", "event_type"])

    def mask_partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        bits = np.array(
            [1 << bit_of[t] for t in b["event_type"].to_pylist()], dtype=np.uint64
        )
        order = np.argsort(uid, kind="stable")
        uid_s, bits_s = uid[order], bits[order]
        starts = np.flatnonzero(np.r_[True, uid_s[1:] != uid_s[:-1]])
        masks = np.bitwise_or.reduceat(bits_s, starts)
        t = pa.table(
            {
                "user_id": pa.array(uid_s[starts], pa.int64()),
                "mask": pa.array(masks, pa.uint64()),
            }
        )
        return _with_user_bucket(t)

    def mask_hist(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        mk = g["mask"].to_numpy().astype(np.uint64)
        order = np.argsort(uid, kind="stable")
        uid_s, mk_s = uid[order], mk[order]
        starts = np.flatnonzero(np.r_[True, uid_s[1:] != uid_s[:-1]])
        final = np.bitwise_or.reduceat(mk_s, starts)
        vals, cnts = np.unique(final, return_counts=True)
        return pd.DataFrame({"mask": vals.astype(np.uint64), "cnt": cnts.astype(np.int64)})

    hist = (
        _coalesce_partials(
            ds.map_batches(mask_partial, batch_format="pyarrow")
            .groupby("ub")
            .map_groups(mask_hist, batch_format="pandas")
        )
        .groupby("mask")
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()
    )
    masks = hist["mask"].to_numpy().astype(np.uint64)
    cnts = hist["n"].to_numpy().astype(np.int64)
    rows = []
    for i, t1 in enumerate(types):
        ni = int(cnts[(masks >> np.uint64(i)) & np.uint64(1) == 1].sum())
        for j in range(i + 1, len(types)):
            nj = int(cnts[(masks >> np.uint64(j)) & np.uint64(1) == 1].sum())
            both = ((masks >> np.uint64(i)) & (masks >> np.uint64(j))) & np.uint64(1)
            inter = int(cnts[both == 1].sum())
            if inter > 0:
                rows.append(
                    {
                        "t1": t1,
                        "t2": types[j],
                        "jaccard": round(inter / (ni + nj - inter), 6),
                    }
                )
    return pd.DataFrame(rows, columns=["t1", "t2", "jaccard"])


QUERIES["event_type_user_jaccard"] = q_event_type_user_jaccard
ORACLE_SQL["event_type_user_jaccard"] = (
    "WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),"
    " c AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),"
    " p AS (SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS inter"
    "  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type"
    "  GROUP BY 1, 2)"
    " SELECT t1, t2, ROUND(inter / (c1.n + c2.n - inter), 6) AS jaccard"
    " FROM p JOIN c c1 ON c1.event_type = p.t1 JOIN c c2 ON c2.event_type = p.t2"
    " ORDER BY t1, t2"
)


def q_cumulative_users_by_day(sf_dir: str) -> pd.DataFrame:
    """Cumulative DISTINCT user count by day — the growth-curve window op
    (COUNT(DISTINCT) OVER cumulative). Scale plan: distinct-over-time
    reduces to first-event-per-user (the `ub`-bucket segmented-min scan,
    no per-user groups), first days fold to a day histogram inside the same
    segment pass, and the cumsum runs driver-side over the RESULT-sized
    day series — the fact table is never sorted globally."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["user_id", "ts"])

    def batch_min(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values("ts").groupby("user_id", as_index=False).head(1).copy()
        out["ub"] = (
            out["user_id"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)
        ).astype(np.int32)
        return out

    def day_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        uid = g["user_id"].to_numpy()
        keep = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        days = g["ts"].iloc[keep].dt.strftime("%Y-%m-%d")
        vc = days.value_counts()
        return pd.DataFrame({"day": vc.index, "n": vc.to_numpy().astype(np.int64)})

    out = (
        _coalesce_partials(
            ds.map_batches(batch_min, batch_format="pandas")
            .groupby("ub")
            .map_groups(day_hist, batch_format="pandas")
        )
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["cum_users"] = out["n"].cumsum().astype("int64")
    return out[["day", "cum_users"]]


QUERIES["cumulative_users_by_day"] = q_cumulative_users_by_day
ORACLE_SQL["cumulative_users_by_day"] = (
    "WITH f AS (SELECT user_id, MIN(ts) AS ts0 FROM events GROUP BY 1),"
    " d AS (SELECT strftime(ts0, '%Y-%m-%d') AS day, COUNT(*) AS n FROM f GROUP BY 1)"
    " SELECT day, SUM(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users"
    " FROM d ORDER BY day"
)


def q_qty_price_corr(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation of quantity vs extended price per return flag —
    the mergeable-second-moment aggregate family (CORR/COVAR/STDDEV as one
    shape). Numerically CENTERED two-pass plan (sums of raw products would
    cancel catastrophically at 100 TB row counts): pass 1 reduces per-flag
    (Σx, Σy, n) → driver means (a ≤|flags|-row broadcast riding the task
    closure); pass 2 folds per-flag centered (Σdx·dy, Σdx², Σdy²) partials.
    Both passes are pyarrow-vectorized batch combiners; the exchange moves
    ≤|flags| rows per batch."""
    from ray.data.aggregate import Sum

    cols = ["l_returnflag", "l_quantity", "l_extendedprice"]
    ds = _tbl(sf_dir, "lineitem", columns=cols)

    means = (
        _coalesce_partials(
            ds.map_batches(
                lambda b: _partial(
                    b,
                    ["l_returnflag"],
                    [("l_quantity", "sum"), ("l_extendedprice", "sum"), ([], "count_all")],
                ),
                batch_format="pyarrow",
            )
        )
        .groupby("l_returnflag")
        .aggregate(
            Sum("l_quantity_sum", alias_name="sx"),
            Sum("l_extendedprice_sum", alias_name="sy"),
            Sum("count_all", alias_name="n"),
        )
        .to_pandas()
    )
    mx = dict(zip(means["l_returnflag"], means["sx"] / means["n"]))
    my = dict(zip(means["l_returnflag"], means["sy"] / means["n"]))

    def centered(b: pa.Table) -> pa.Table:
        flags = b["l_returnflag"].to_pylist()
        x = b["l_quantity"].to_numpy().astype(np.float64)
        y = b["l_extendedprice"].to_numpy().astype(np.float64)
        dx = x - np.array([mx[f] for f in flags])
        dy = y - np.array([my[f] for f in flags])
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "xy": pa.array(dx * dy, pa.float64()),
                "xx": pa.array(dx * dx, pa.float64()),
                "yy": pa.array(dy * dy, pa.float64()),
            }
        )
        return _partial(t, ["l_returnflag"], [("xy", "sum"), ("xx", "sum"), ("yy", "sum")])

    out = (
        _coalesce_partials(ds.map_batches(centered, batch_format="pyarrow"))
        .groupby("l_returnflag")
        .aggregate(
            Sum("xy_sum", alias_name="sxy"),
            Sum("xx_sum", alias_name="sxx"),
            Sum("yy_sum", alias_name="syy"),
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    out["corr"] = (out["sxy"] / np.sqrt(out["sxx"] * out["syy"])).round(6)
    return out[["l_returnflag", "corr"]]


QUERIES["qty_price_corr"] = q_qty_price_corr
ORACLE_SQL["qty_price_corr"] = (
    "SELECT l_returnflag, ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr"
    " FROM lineitem GROUP BY 1 ORDER BY 1"
)


def q_sentence_stats(sf_dir: str) -> pd.DataFrame:
    """Sentence segmentation stats per language — completes the brief's
    text-analysis family (lang-ID / quality / token counting / fingerprints
    / SENTENCES). A sentence boundary is a `[.!?]+` run (the same regex on
    both sides of the gate), and a doc counts boundaries+1 sentences — the
    standard convention that unterminated text is one sentence, which also
    keeps the ratio total under punctuation-free corpora. Per-batch polars
    count_matches (Rust regex, vectorized) folds to ≤|langs| partial rows."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["lang", "text"])

    def f(b: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.Series(b["text"])
        ns = s.str.count_matches(r"[.!?]+").cast(pl.Int64).to_numpy() + 1
        nt = textfn.token_counts(b["text"].to_pylist())
        t = pa.table(
            {
                "lang": b["lang"],
                "ns": pa.array(ns, pa.int64()),
                "nt": pa.array(nt, pa.int64()),
            }
        )
        return _partial(t, ["lang"], [("ns", "sum"), ("nt", "sum"), ([], "count_all")])

    out = (
        _coalesce_partials(ds.map_batches(f, batch_format="pyarrow"))
        .groupby("lang")
        .aggregate(
            Sum("ns_sum", alias_name="n_sentences"),
            Sum("nt_sum", alias_name="ntok"),
            Sum("count_all", alias_name="n_docs"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["avg_sentences"] = (out["n_sentences"] / out["n_docs"]).round(6)
    out["tokens_per_sentence"] = (out["ntok"] / out["n_sentences"]).round(6)
    return out[["lang", "n_docs", "n_sentences", "avg_sentences", "tokens_per_sentence"]]


QUERIES["sentence_stats"] = q_sentence_stats
ORACLE_SQL["sentence_stats"] = (
    "SELECT lang, COUNT(*)::BIGINT AS n_docs,"
    " SUM(len(regexp_extract_all(text, '[.!?]+')) + 1)::BIGINT AS n_sentences,"
    " ROUND(SUM(len(regexp_extract_all(text, '[.!?]+')) + 1)::DOUBLE / COUNT(*), 6)"
    "  AS avg_sentences,"
    " ROUND(SUM(len(string_split_regex(trim(text), '\\s+')))::DOUBLE /"
    "  SUM(len(regexp_extract_all(text, '[.!?]+')) + 1), 6) AS tokens_per_sentence"
    " FROM documents GROUP BY lang ORDER BY lang"
)


def q_revenue_anomaly_days_mad(sf_dir: str) -> pd.DataFrame:
    """Days whose revenue deviates more than 3×MAD from the series median —
    the robust-outlier window op over an aggregated series (the MAD twin of
    q_events_zscore_outliers). The fact table reduces to one row per day in
    one partial-agg pass; median/MAD/filter run driver-side on the
    RESULT-sized day series (same contract as q_revenue_daily_growth)."""
    from ray.data.aggregate import Sum

    ds = _tbl(
        sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice", "l_discount"]
    )

    def f(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["l_shipdate"], format="%Y-%m-%d")
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({"day": day, "rev": rev})
        return _partial(t, ["day"], [("rev", "sum")])

    d = (
        _coalesce_partials(ds.map_batches(f, batch_format="pyarrow"))
        .groupby("day")
        .aggregate(Sum("rev_sum", alias_name="rev"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    rev = d["rev"].to_numpy()
    med = float(np.median(rev))
    mad = float(np.median(np.abs(rev - med)))
    keep = np.abs(rev - med) > 3.0 * mad
    out = d.loc[keep].copy()
    out["revenue"] = out["rev"].round(4)
    return out[["day", "revenue"]].reset_index(drop=True)


QUERIES["revenue_anomaly_days_mad"] = q_revenue_anomaly_days_mad
ORACLE_SQL["revenue_anomaly_days_mad"] = (
    "WITH d AS (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,"
    "  SUM(l_extendedprice * (1 - l_discount)) AS rev FROM lineitem GROUP BY 1),"
    " m AS (SELECT MEDIAN(rev) AS med, MAD(rev) AS mad FROM d)"
    " SELECT day, ROUND(rev, 4) AS revenue FROM d, m"
    " WHERE ABS(rev - med) > 3 * mad ORDER BY day"
)


# ----------------------------------------- PQ-quantized ANN (wave 16) --------

PQ_M = 8         # subspaces (dim 64 → 8 dims each)
PQ_K = 16        # centroids per subspace (4-bit codes)
PQ_ITERS = 8     # Lloyd rounds on the training sample
PQ_RERANK = 40   # per-batch exact-rerank candidate pool


def _pq_codebooks(sf_dir: str) -> np.ndarray:
    """Train the product-quantization codebooks deterministically on a small
    bounded sample (vec_id < 2048 — driver-side read of ≤ 2048 rows via a
    parquet filter pushdown; at 100 TB the sample read prunes to row groups
    the same way). Per-subspace Lloyd with first-K-rows init; empty clusters
    keep their previous centroid. Returns (M, K, dsub) float64."""
    t = pq.read_table(
        _pq(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 2048)],
    )
    order = np.argsort(t["vec_id"].to_numpy())
    x = np.array(t["embedding"].to_pylist(), dtype=np.float64)[order]
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    n, d = x.shape
    dsub = d // PQ_M
    books = np.empty((PQ_M, PQ_K, dsub))
    for m in range(PQ_M):
        sub = x[:, m * dsub : (m + 1) * dsub]
        cb = sub[:PQ_K].copy()
        for _ in range(PQ_ITERS):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            code = d2.argmin(axis=1)
            for k in range(PQ_K):
                sel = code == k
                if sel.any():
                    cb[k] = sub[sel].mean(axis=0)
        books[m] = cb
    return books


def q_embedding_topk_pq(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ANN top-k (Jégou et al. 2011): vectors encode to
    M×4-bit codes against per-subspace codebooks; the query scans with an
    asymmetric-distance LUT (M×K inner products) so the full-corpus pass
    touches ONE uint8 matrix instead of floats (16× smaller than float64 —
    the scan path at 100 TB), then the per-batch top candidates rerank with
    exact cosine before the tiny driver merge. Deterministic end to end
    (seedless first-K init, fixed iteration count) — golden-pinned, with
    recall vs the brute-force oracle gated in tests/test_wave16.py."""
    books = _pq_codebooks(sf_dir)  # (M, K, dsub) — tiny, rides the closure
    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)
    dsub = books.shape[2]
    # LUT[m, k] = <q_m, c_{m,k}> : approx score = Σ_m LUT[m, code_m]
    lut = np.einsum("mkd,md->mk", books, qn.reshape(PQ_M, dsub))

    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def scan(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy()
        mask = ids != 0
        e = np.array(b["embedding"].to_pylist(), dtype=np.float64)[mask]
        ids = ids[mask]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        sub = en.reshape(len(en), PQ_M, dsub)
        # encode: per-subspace nearest centroid (‖s−c‖² = ‖s‖²−2s·c+‖c‖²;
        # argmin over c needs only s·c − ‖c‖²/2 — one matmul per subspace)
        approx = np.zeros(len(en))
        for m in range(PQ_M):
            scores = sub[:, m, :] @ books[m].T - 0.5 * (books[m] ** 2).sum(axis=1)
            codes = scores.argmax(axis=1)
            approx += lut[m][codes]
        k = min(PQ_RERANK, len(ids))
        cand = np.argpartition(-approx, k - 1)[:k]
        sims = en[cand] @ qn  # exact rerank of the candidate pool only
        return pa.table(
            {
                "vec_id": pa.array(ids[cand], pa.int64()),
                "sim": pa.array(sims, pa.float64()),
            }
        )

    parts = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["sim", "vec_id"], ascending=[False, True]).head(10)
    return parts[["vec_id"]].reset_index(drop=True)


QUERIES["embedding_topk_pq"] = q_embedding_topk_pq


# ============ wave 17: regression agg, bigrams, containment, Pareto ==========


def q_price_qty_regression(sf_dir: str) -> pd.DataFrame:
    """Grouped least-squares line fit (REGR_SLOPE/REGR_INTERCEPT family) of
    extended price on quantity per return flag — the other half of the
    mergeable-moment aggregates next to q_qty_price_corr, same numerically
    CENTERED two-pass plan (means first, then Σdx·dy / Σdx² partials) so
    fact-scale sums cannot cancel."""
    from ray.data.aggregate import Sum

    cols = ["l_returnflag", "l_quantity", "l_extendedprice"]
    ds = _tbl(sf_dir, "lineitem", columns=cols)

    means = (
        _coalesce_partials(
            ds.map_batches(
                lambda b: _partial(
                    b,
                    ["l_returnflag"],
                    [("l_quantity", "sum"), ("l_extendedprice", "sum"), ([], "count_all")],
                ),
                batch_format="pyarrow",
            )
        )
        .groupby("l_returnflag")
        .aggregate(
            Sum("l_quantity_sum", alias_name="sx"),
            Sum("l_extendedprice_sum", alias_name="sy"),
            Sum("count_all", alias_name="n"),
        )
        .to_pandas()
    )
    mx = dict(zip(means["l_returnflag"], means["sx"] / means["n"]))
    my = dict(zip(means["l_returnflag"], means["sy"] / means["n"]))

    def centered(b: pa.Table) -> pa.Table:
        flags = b["l_returnflag"].to_pylist()
        x = b["l_quantity"].to_numpy().astype(np.float64)
        y = b["l_extendedprice"].to_numpy().astype(np.float64)
        dx = x - np.array([mx[f] for f in flags])
        dy = y - np.array([my[f] for f in flags])
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "xy": pa.array(dx * dy, pa.float64()),
                "xx": pa.array(dx * dx, pa.float64()),
            }
        )
        return _partial(t, ["l_returnflag"], [("xy", "sum"), ("xx", "sum")])

    out = (
        _coalesce_partials(ds.map_batches(centered, batch_format="pyarrow"))
        .groupby("l_returnflag")
        .aggregate(Sum("xy_sum", alias_name="sxy"), Sum("xx_sum", alias_name="sxx"))
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    slope = out["sxy"] / out["sxx"]
    out["slope"] = slope.round(6)
    out["intercept"] = (
        out["l_returnflag"].map(my).astype(float)
        - slope * out["l_returnflag"].map(mx).astype(float)
    ).round(6)
    return out[["l_returnflag", "slope", "intercept"]]


QUERIES["price_qty_regression"] = q_price_qty_regression
ORACLE_SQL["price_qty_regression"] = (
    "SELECT l_returnflag,"
    " ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,"
    " ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS intercept"
    " FROM lineitem GROUP BY 1 ORDER BY 1"
)


def q_top_bigrams(sf_dir: str) -> pd.DataFrame:
    """Global top-20 token bigrams — the n-gram LM / collocation-mining
    counting op (the bigram sibling of bpe_pair_counts, which counts within-
    WORD pairs). Per batch: tokens flatten to one array with doc boundaries
    masked, bigram strings form by vectorized string concat, and counts fold
    to (bigram, n) partials — the exchange moves per-batch DISTINCT bigrams,
    not token instances. Exact global counts via one keyed groupby, then
    per-batch partial top-k with deterministic (−n, bigram) tie-break and a
    20-row driver merge (no global sort)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["text"])

    def bigram_counts(b: pa.Table) -> pa.Table:
        toks = [t.split() for t in b["text"].to_pylist()]
        flat = np.array([w for ts in toks for w in ts], dtype=object)
        if len(flat) < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        big = pd.Series(flat[:-1]) + " " + pd.Series(flat[1:])
        # mask bigrams that straddle a document boundary
        lens = np.array([len(ts) for ts in toks])
        ends = np.cumsum(lens) - 1  # last token index of each doc
        keep = np.ones(len(flat) - 1, dtype=bool)
        keep[ends[ends < len(flat) - 1]] = False
        vc = big[keep].value_counts()
        return pa.table(
            {
                "bigram": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(bigram_counts, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def partial_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(["n", "bigram"], ascending=[False, True]).head(20)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        counts.map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "bigram"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    return out[["bigram", "n"]].astype({"n": "int64"})


QUERIES["top_bigrams"] = q_top_bigrams
ORACLE_SQL["top_bigrams"] = (
    "WITH toks AS (SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents),"
    " bi AS (SELECT t[i] || ' ' || t[i+1] AS bigram"
    "  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i))"
    " SELECT bigram, COUNT(*)::BIGINT AS n FROM bi GROUP BY 1"
    " ORDER BY n DESC, bigram LIMIT 20"
)


def q_docs_containment_pairs(sf_dir: str) -> pd.DataFrame:
    """ASYMMETRIC containment near-dup pairs — quote/inclusion detection
    (Broder's containment score, the dedup family member Jaccard misses:
    a short doc fully embedded in a long one has low Jaccard but high
    containment). Pairs where |grams(A) ∩ grams(B)| / min(|grams(A)|,
    |grams(B)|) ≥ 0.5 over distinct 8-token windows. Scale shape: the
    docs_shared_span_pairs gram-hash bucket shuffle (same gram ⇒ same
    bucket), but every gram row CARRIES its doc's distinct-gram count, so
    the per-bucket pair partials (id_a, id_b, n, sz_a, sz_b) aggregate to
    the final ratio with ZERO join-backs — sizes ride the pair key."""
    from ray.data.aggregate import Max, Sum

    K = 8
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def gram_rows(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        texts = b["text"].to_pylist()
        gs: list = []
        dids: list = []
        szs: list = []
        for d, t in zip(ids, texts):
            toks = t.split(" ")
            wins = {" ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)}
            gs.extend(wins)
            dids.extend([int(d)] * len(wins))
            szs.extend([len(wins)] * len(wins))
        if not gs:
            return pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "sz": pa.array([], pa.int64()),
                    "gb": pa.array([], pa.int32()),
                }
            )
        gb = (hashing.hash64(gs) % np.uint64(_N_UB)).astype(np.int32)
        return pa.table(
            {
                "gram": pa.array(gs, pa.string()),
                "doc_id": pa.array(dids, pa.int64()),
                "sz": pa.array(szs, pa.int64()),
                "gb": pa.array(gb),
            }
        )

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["gram", "doc_id"]).sort_values(
            ["gram", "doc_id"], kind="stable"
        )
        gr = d["gram"].to_numpy()
        ids = d["doc_id"].to_numpy()
        sz = d["sz"].to_numpy()
        n = len(gr)
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "sz_a": pd.Series([], dtype="int64"),
                "sz_b": pd.Series([], dtype="int64"),
            }
        )
        if n == 0:
            return empty
        starts = np.flatnonzero(np.r_[True, gr[1:] != gr[:-1]])
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)
        rem = np.repeat(lens, lens) - pos - 1
        total = int(rem.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem) + 1
        b_idx = a_idx + off
        out = pd.DataFrame(
            {
                "id_a": ids[a_idx],
                "id_b": ids[b_idx],
                "sz_a": sz[a_idx],
                "sz_b": sz[b_idx],
            }
        )
        return (
            out.groupby(["id_a", "id_b", "sz_a", "sz_b"])
            .size()
            .rename("n")
            .reset_index()[["id_a", "id_b", "n", "sz_a", "sz_b"]]
        )

    agg = (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(pair_partials, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(
            Sum("n", alias_name="inter"),
            Max("sz_a", alias_name="sa"),  # size is pair-constant; Max = the value
            Max("sz_b", alias_name="sb"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        c = df["inter"] / np.minimum(df["sa"], df["sb"])
        df = df.loc[c >= 0.5].copy()
        df["containment"] = (
            df["inter"] / np.minimum(df["sa"], df["sb"])
        ).round(6)
        return pa.Table.from_pandas(
            df[["id_a", "id_b", "containment"]], preserve_index=False
        )

    out = (
        agg.map_batches(finish, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    return out.astype({"id_a": "int64", "id_b": "int64"})


QUERIES["docs_containment_pairs"] = q_docs_containment_pairs
ORACLE_SQL["docs_containment_pairs"] = (
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),"
    " g AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS gram"
    "  FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)),"
    " sz AS (SELECT doc_id, COUNT(*) AS s FROM g GROUP BY 1),"
    " p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter"
    "  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1, 2)"
    " SELECT id_a, id_b,"
    "  ROUND(inter::DOUBLE / LEAST(sa.s, sb.s), 6) AS containment"
    " FROM p JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b"
    " WHERE inter::DOUBLE / LEAST(sa.s, sb.s) >= 0.5 ORDER BY 1, 2"
)


def q_suppliers_pareto_80(sf_dir: str) -> pd.DataFrame:
    """Pareto/ABC concentration: the smallest number of suppliers covering
    ≥ 80 % of total revenue. The fact table reduces to one row per supplier
    (partial agg before the keyed groupby); the sort + running share run
    driver-side on the DIM-sized supplier series (same contract as
    q_top_supplier). Deterministic (rev DESC, suppkey ASC) ordering."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def f(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({"l_suppkey": b["l_suppkey"], "rev": rev})
        return _partial(t, ["l_suppkey"], [("rev", "sum")])

    s = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_sum", alias_name="rev"))
        .to_pandas()
        .sort_values(["rev", "l_suppkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    rev = s["rev"].to_numpy()
    tot = float(rev.sum())
    cum = np.cumsum(rev)
    k = int(((cum - rev) < 0.8 * tot).sum())
    return pd.DataFrame({"n_suppliers_80": [k]}).astype("int64")


QUERIES["suppliers_pareto_80"] = q_suppliers_pareto_80
ORACLE_SQL["suppliers_pareto_80"] = (
    "WITH s AS (SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS rev"
    "  FROM lineitem GROUP BY 1),"
    " r AS (SELECT rev,"
    "   SUM(rev) OVER (ORDER BY rev DESC, l_suppkey ROWS UNBOUNDED PRECEDING) AS cum,"
    "   SUM(rev) OVER () AS tot FROM s)"
    " SELECT COUNT(*)::BIGINT AS n_suppliers_80 FROM r WHERE cum - rev < 0.8 * tot"
)


def q_dedup_keep_longest_docs(sf_dir: str) -> pd.DataFrame:
    """Exact-dup dedup with the KEEP-LONGEST winner rule (the CCNet /
    RefinedWeb arbitration — keep the highest-quality member of each
    duplicate cluster, not the first) — the argmax-per-group twin of
    q_dedup_first_wins_docs. Scale plan: winner attributes bit-pack into ONE
    Max-aggregated uint64 key (n_chars·2³² + (2³²−1−doc_id), so Max realizes
    'longest, then smallest id') — the same zero-join-back trick as
    curated_corpus_stats; ONE shuffle of ≤1 partial row per hash per batch."""
    from ray.data.aggregate import Max

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    _B = np.int64(1) << np.int64(32)

    def pack(b: pa.Table) -> pa.Table:
        h = hashing.md5_hex(b["text"].to_pylist())
        code = b["n_chars"].to_numpy() * _B + (_B - 1 - b["doc_id"].to_numpy())
        t = pa.table(
            {"content_hash": pa.array(h, pa.string()), "code": pa.array(code, pa.int64())}
        )
        return _partial(t, ["content_hash"], [("code", "max")])

    win = (
        ds.map_batches(pack, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Max("code_max", alias_name="code"))
    )

    def unpack(b: pa.Table) -> pa.Table:
        code = b["code"].to_numpy()
        return pa.table({"doc_id": pa.array(_B - 1 - (code % _B), pa.int64())})

    out = win.map_batches(unpack, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["dedup_keep_longest_docs"] = q_dedup_keep_longest_docs
ORACLE_SQL["dedup_keep_longest_docs"] = (
    "WITH w AS (SELECT doc_id, ROW_NUMBER() OVER"
    "  (PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id) AS rn"
    " FROM documents)"
    " SELECT doc_id FROM w WHERE rn = 1 ORDER BY doc_id"
)


# ================= wave 19: sequence mining, RFM behavioral segments =========


def q_top_event_trigrams(sf_dir: str) -> pd.DataFrame:
    """Most common 3-step event-type SEQUENCES across user streams — the
    sequential-pattern-mining op (clickstream n-grams). Scale plan: the
    `_N_UB` user-bucket shuffle co-locates each user's stream; ONE lexsort +
    shifted-array trigram construction per bucket (no per-user groups),
    counts fold to (trigram, n) partials, exact global counts via a keyed
    groupby, then per-batch partial top-k with deterministic (−n, trigram)
    tie-break and a 10-row driver merge."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def trigram_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        n = len(uid)
        if n < 3:
            return pd.DataFrame(
                {"trigram": pd.Series([], dtype=str), "n": pd.Series([], dtype="int64")}
            )
        same3 = (uid[:-2] == uid[1:-1]) & (uid[1:-1] == uid[2:])
        tri = pd.Series(et[:-2]) + ">" + pd.Series(et[1:-1]) + ">" + pd.Series(et[2:])
        vc = tri[same3].value_counts()
        return pd.DataFrame(
            {"trigram": vc.index, "n": vc.to_numpy().astype(np.int64)}
        )

    counts = (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(trigram_counts, batch_format="pandas")
        .groupby("trigram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def partial_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["n", "trigram"], ascending=[False, True]).head(10)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        counts.map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "trigram"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    return out[["trigram", "n"]].astype({"n": "int64"})


QUERIES["top_event_trigrams"] = q_top_event_trigrams
ORACLE_SQL["top_event_trigrams"] = (
    "WITH s AS (SELECT user_id, event_type,"
    "  LEAD(event_type, 1) OVER w AS e2, LEAD(event_type, 2) OVER w AS e3"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))"
    " SELECT event_type || '>' || e2 || '>' || e3 AS trigram, COUNT(*)::BIGINT AS n"
    " FROM s WHERE e3 IS NOT NULL GROUP BY 1 ORDER BY n DESC, trigram LIMIT 10"
)


def _ntile3(order_vals: list[np.ndarray], n: int) -> np.ndarray:
    """Exact NTILE(3) tile ids (1-based) for rows ordered by the given sort
    keys (first key descending, custkey ascending tie-break is encoded by
    the caller passing pre-negated keys): SQL's remainder rule — the first
    (n mod 3) tiles get one extra row."""
    order = np.lexsort(order_vals[::-1])
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    q, r = divmod(n, 3)
    tile = np.where(
        rank < (q + 1) * r,
        rank // (q + 1),
        r + (rank - (q + 1) * r) // max(q, 1),
    )
    return (tile + 1).astype(np.int64)


def q_orders_rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM behavioral segmentation (recency / frequency / monetary): each
    customer's (last order date, order count, total spend) maps to a tercile
    per dimension, reported as customer counts per (r,f,m) cell — the
    classic CRM composite. Scale plan: the fact table reduces to ONE row per
    customer via per-batch (max, count, sum) partials + keyed groupby; the
    three NTILE(3) assignments run driver-side on the DIM-sized customer
    series with SQL's exact remainder rule (`q_ntile_orders` is the
    fact-scale histogram-selection path when even the key set outgrows the
    driver). Deterministic custkey tie-breaks on every dimension."""
    from ray.data.aggregate import Max, Sum

    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    parts = ds.map_batches(
        lambda b: _partial(
            b,
            ["o_custkey"],
            [("o_orderdate", "max"), ("o_totalprice", "sum"), ([], "count_all")],
        ),
        batch_format="pyarrow",
    )
    c = (
        parts.groupby("o_custkey")
        .aggregate(
            Max("o_orderdate_max", alias_name="last_o"),
            Sum("o_totalprice_sum", alias_name="m"),
            Sum("count_all", alias_name="f"),
        )
        .to_pandas()
    )
    n = len(c)
    ck = c["o_custkey"].to_numpy()
    last = c["last_o"].to_numpy().astype("datetime64[us]").view(np.int64)
    c["r_t"] = _ntile3([-last, ck], n)
    c["f_t"] = _ntile3([-c["f"].to_numpy(), ck], n)
    c["m_t"] = _ntile3([-c["m"].to_numpy(), ck], n)
    out = (
        c.groupby(["r_t", "f_t", "m_t"], as_index=False)
        .size()
        .rename(columns={"size": "n_customers"})
        .sort_values(["r_t", "f_t", "m_t"])
        .reset_index(drop=True)
    )
    return out.astype(
        {"r_t": "int64", "f_t": "int64", "m_t": "int64", "n_customers": "int64"}
    )


QUERIES["orders_rfm_segments"] = q_orders_rfm_segments
ORACLE_SQL["orders_rfm_segments"] = (
    "WITH c AS (SELECT o_custkey, MAX(o_orderdate) AS last_o, COUNT(*) AS f,"
    "  SUM(o_totalprice) AS m FROM orders GROUP BY 1),"
    " t AS (SELECT o_custkey,"
    "  NTILE(3) OVER (ORDER BY last_o DESC, o_custkey) AS r_t,"
    "  NTILE(3) OVER (ORDER BY f DESC, o_custkey) AS f_t,"
    "  NTILE(3) OVER (ORDER BY m DESC, o_custkey) AS m_t FROM c)"
    " SELECT r_t, f_t, m_t, COUNT(*)::BIGINT AS n_customers"
    " FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
)


# ============ wave 20: reorder intervals, autocorrelation, seasonality =======


def q_reorder_interval_median_hist(sf_dir: str) -> pd.DataFrame:
    """Distribution of each customer's MEDIAN reorder interval (days) — the
    repeat-purchase-cadence op. Scale plan: custkey-bucket shuffle; per
    bucket ONE time-ordered lexsort yields consecutive-order gaps, a second
    value-ordered lexsort + segment index arithmetic selects every
    customer's exact median VECTORIZED (odd/even interpolation, no per-key
    groups), and medians fold to a ≤|distinct-median|-row histogram partial.
    Only histogram rows reach the final reduce."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def add_ub(b: pa.Table) -> pa.Table:
        ub = (b["o_custkey"].to_numpy().astype(np.uint64) % np.uint64(_N_UB)).astype(
            np.int32
        )
        return b.append_column("ub", pa.array(ub))

    def med_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="stable")
        ck = g["o_custkey"].to_numpy()
        ts = g["o_orderdate"].to_numpy().astype("datetime64[us]").view(np.int64)
        same = np.r_[False, ck[1:] == ck[:-1]]
        gaps = (ts - np.r_[np.int64(0), ts[:-1]]) / 86_400_000_000.0
        gck, gv = ck[same], gaps[same]
        empty = pd.DataFrame(
            {
                "median_days": pd.Series([], dtype="float64"),
                "n_customers": pd.Series([], dtype="int64"),
            }
        )
        if len(gck) == 0:
            return empty
        # value-ordered within customer → median by segment index arithmetic
        order = np.lexsort((gv, gck))
        gck_s, gv_s = gck[order], gv[order]
        starts = np.flatnonzero(np.r_[True, gck_s[1:] != gck_s[:-1]])
        lens = np.diff(np.r_[starts, len(gck_s)])
        lo = starts + (lens - 1) // 2
        hi = starts + lens // 2
        med = np.round((gv_s[lo] + gv_s[hi]) / 2.0, 2)
        vals, cnts = np.unique(med, return_counts=True)
        return pd.DataFrame(
            {"median_days": vals, "n_customers": cnts.astype(np.int64)}
        )

    out = (
        _coalesce_partials(
            ds.map_batches(add_ub, batch_format="pyarrow")
            .groupby("ub")
            .map_groups(med_hist, batch_format="pandas")
        )
        .groupby("median_days")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
        .to_pandas()
        .sort_values("median_days")
        .reset_index(drop=True)
    )
    return out.astype({"median_days": "float64", "n_customers": "int64"})


QUERIES["reorder_interval_median_hist"] = q_reorder_interval_median_hist
ORACLE_SQL["reorder_interval_median_hist"] = (
    "WITH g AS (SELECT o_custkey, epoch_us(o_orderdate) - epoch_us(LAG(o_orderdate)"
    "   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS gap_us"
    "  FROM orders),"
    " m AS (SELECT o_custkey, MEDIAN(gap_us / 86400000000.0) AS med"
    "  FROM g WHERE gap_us IS NOT NULL GROUP BY 1)"
    " SELECT ROUND(med, 2) AS median_days, COUNT(*)::BIGINT AS n_customers"
    " FROM m GROUP BY 1 ORDER BY 1"
)


def q_events_daily_autocorr(sf_dir: str) -> pd.DataFrame:
    """Lag-1 autocorrelation of the daily event-count series — the
    seasonality/burstiness probe over an aggregated series. The fact table
    reduces to one row per day (partial-agg pass); the correlation of the
    shifted pair runs driver-side on the RESULT-sized series (same contract
    as q_revenue_daily_growth / q_revenue_ewma)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["ts"])

    def f(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["ts"], format="%Y-%m-%d")
        return pa.table({"day": day}).group_by(["day"]).aggregate([([], "count_all")])

    d = (
        _coalesce_partials(ds.map_batches(f, batch_format="pyarrow"))
        .groupby("day")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    n = d["n"].to_numpy().astype(np.float64)
    x, y = n[1:], n[:-1]
    dx, dy = x - x.mean(), y - y.mean()
    r = float((dx * dy).sum() / np.sqrt((dx * dx).sum() * (dy * dy).sum()))
    return pd.DataFrame({"autocorr_lag1": [round(r, 6)]})


QUERIES["events_daily_autocorr"] = q_events_daily_autocorr
ORACLE_SQL["events_daily_autocorr"] = (
    "WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*)::DOUBLE AS n"
    "  FROM events GROUP BY 1),"
    " p AS (SELECT n, LAG(n) OVER (ORDER BY day) AS pn FROM d)"
    " SELECT ROUND(CORR(n, pn), 6) AS autocorr_lag1 FROM p WHERE pn IS NOT NULL"
)


def q_orders_by_weekday(sf_dir: str) -> pd.DataFrame:
    """Order volume + revenue share per ISO weekday (Mon=0) — calendar
    seasonality rollup: ≤7 partial rows per batch, result-sized share math
    on the driver."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def f(b: pa.Table) -> pa.Table:
        dow = pc.day_of_week(b["o_orderdate"])  # Monday = 0, like ISODOW - 1
        t = pa.table({"dow": dow, "p": b["o_totalprice"]})
        return _partial(t, ["dow"], [("p", "sum"), ([], "count_all")])

    out = (
        _coalesce_partials(ds.map_batches(f, batch_format="pyarrow"))
        .groupby("dow")
        .aggregate(Sum("p_sum", alias_name="t"), Sum("count_all", alias_name="n"))
        .to_pandas()
        .sort_values("dow")
        .reset_index(drop=True)
    )
    out["dow"] = out["dow"].astype("int64")
    out["revenue_share"] = (out["t"] / out["t"].sum()).round(6)
    return out[["dow", "n", "revenue_share"]]


QUERIES["orders_by_weekday"] = q_orders_by_weekday
ORACLE_SQL["orders_by_weekday"] = (
    "WITH d AS (SELECT (ISODOW(o_orderdate) - 1)::BIGINT AS dow,"
    "  COUNT(*)::BIGINT AS n, SUM(o_totalprice) AS t FROM orders GROUP BY 1)"
    " SELECT dow, n, ROUND(t / SUM(t) OVER (), 6) AS revenue_share"
    " FROM d ORDER BY dow"
)


# ================= wave 21: distribution divergence (two-sample KS) ==========


def q_price_ks_returned(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the price
    distributions of returned (R) vs other lineitems — the distribution-
    drift / cohort-divergence test of a data-quality pipeline. KS needs the
    max ECDF gap over a GLOBALLY value-ordered stream; the scale plan is the
    distributed two-pass prefix scan (q_token_packing shape) on VALUE-range
    buckets: (1) per-bucket (c1, c0) count partials → driver exclusive
    cumsum into per-bucket offsets + totals, (2) a bucket-partitioned pass
    sorts only within its bucket, collapses ties (RANGE window semantics:
    all rows at one price step the ECDF together) and emits one per-bucket
    max-gap partial. No global sort; the driver merges ≤|buckets| rows."""
    ds = _tbl(sf_dir, "lineitem", columns=["l_extendedprice", "l_returnflag"])
    _W = 2000.0  # price-range bucket width

    def counts(b: pa.Table) -> pa.Table:
        x = b["l_extendedprice"].to_numpy()
        g = (np.asarray(b["l_returnflag"].to_pylist()) == "R").astype(np.int64)
        vb = (x // _W).astype(np.int64)
        t = pa.table(
            {
                "vb": pa.array(vb),
                "x": pa.array(x, pa.float64()),
                "g1": pa.array(g),
                "g0": pa.array(1 - g),
            }
        )
        return t

    rows = ds.map_batches(counts, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Sum

    bsums = (
        _coalesce_partials(
            rows.map_batches(
                lambda b: _partial(
                    b.select(["vb", "g1", "g0"]), ["vb"], [("g1", "sum"), ("g0", "sum")]
                ),
                batch_format="pyarrow",
            )
        )
        .groupby("vb")
        .aggregate(Sum("g1_sum", alias_name="s1"), Sum("g0_sum", alias_name="s0"))
        .to_pandas()
        .sort_values("vb")
    )
    n1 = float(bsums["s1"].sum())
    n0 = float(bsums["s0"].sum())
    off1 = dict(
        zip(bsums["vb"].astype(int), np.concatenate(([0], np.cumsum(bsums["s1"].to_numpy())[:-1])))
    )
    off0 = dict(
        zip(bsums["vb"].astype(int), np.concatenate(([0], np.cumsum(bsums["s0"].to_numpy())[:-1])))
    )

    def bucket_gap(g: pd.DataFrame) -> pd.DataFrame:
        x = g["x"].to_numpy()
        g1 = g["g1"].to_numpy()
        g0 = g["g0"].to_numpy()
        order = np.argsort(x, kind="stable")
        x_s, g1_s, g0_s = x[order], g1[order], g0[order]
        # collapse ties: ECDF steps once per distinct value
        _, starts = np.unique(x_s, return_index=True)
        c1 = np.cumsum(np.add.reduceat(g1_s, starts)) + off1[int(g["vb"].iloc[0])]
        c0 = np.cumsum(np.add.reduceat(g0_s, starts)) + off0[int(g["vb"].iloc[0])]
        gap = np.abs(c1 / n1 - c0 / n0)
        return pd.DataFrame({"mx": [float(gap.max())]})

    parts = rows.groupby("vb").map_groups(bucket_gap, batch_format="pandas").to_pandas()
    return pd.DataFrame({"ks": [round(float(parts["mx"].max()), 6)]})


QUERIES["price_ks_returned"] = q_price_ks_returned
ORACLE_SQL["price_ks_returned"] = (
    "WITH v AS (SELECT l_extendedprice AS x,"
    "  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g FROM lineitem),"
    " n AS (SELECT SUM(g)::DOUBLE AS n1, (COUNT(*) - SUM(g))::DOUBLE AS n0 FROM v),"
    " t AS (SELECT x, SUM(g) OVER w AS c1, SUM(1 - g) OVER w AS c0 FROM v"
    "  WINDOW w AS (ORDER BY x RANGE UNBOUNDED PRECEDING))"
    " SELECT ROUND(MAX(ABS(c1 / n1 - c0 / n0)), 6) AS ks FROM t, n"
)


ORACLE_SQL["nation_pair_trade"] = (
    "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,"
    " EXTRACT(year FROM l_shipdate)::BIGINT AS l_year,"
    " ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue"
    " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    " JOIN customer ON c_custkey = o_custkey"
    " JOIN supplier ON s_suppkey = l_suppkey"
    " JOIN nation n1 ON s_nationkey = n1.n_nationkey"
    " JOIN nation n2 ON c_nationkey = n2.n_nationkey"
    " WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')"
    "   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))"
    "  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'"
    " GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
)
ORACLE_SQL["part_profit_by_year"] = (
    "SELECT n_name AS nation, EXTRACT(year FROM l_shipdate)::BIGINT AS o_year,"
    " ROUND(SUM(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity), 4)"
    "  AS profit"
    " FROM lineitem JOIN part ON p_partkey = l_partkey"
    " JOIN supplier ON s_suppkey = l_suppkey"
    " JOIN nation ON s_nationkey = n_nationkey"
    " WHERE p_name LIKE '%red%'"
    " GROUP BY 1, 2 ORDER BY 1, 2"
)
ORACLE_SQL["association_rules"] = (
    "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),"
    " nn AS (SELECT COUNT(DISTINCT l_orderkey)::DOUBLE AS n FROM d),"
    " ic AS (SELECT l_partkey, COUNT(*)::DOUBLE AS ni FROM d GROUP BY 1),"
    " pr AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS nab FROM d a"
    "  JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
    "  GROUP BY 1, 2 HAVING COUNT(*) >= 3)"
    " SELECT pa AS part_a, pb AS part_b, nab::BIGINT AS n_ab,"
    " ROUND(nab / ia.ni, 6) AS conf_ab,"
    " ROUND(nab * nn.n / (ia.ni * ib.ni), 6) AS lift"
    " FROM pr JOIN ic ia ON ia.l_partkey = pa JOIN ic ib ON ib.l_partkey = pb"
    " CROSS JOIN nn"
    " ORDER BY nab * nn.n / (ia.ni * ib.ni) DESC, pa, pb LIMIT 15"
)
ORACLE_SQL["embedding_range_search"] = (
    "SELECT label, COUNT(*)::BIGINT AS n FROM embeddings"
    " WHERE vec_id <> 0 AND list_cosine_similarity(embedding,"
    "  (SELECT embedding FROM embeddings WHERE vec_id = 0)) >= 0.2"
    " GROUP BY label ORDER BY label"
)
ORACLE_SQL["normalized_dedup_docs"] = (
    "WITH n AS (SELECT doc_id,"
    "  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt FROM documents),"
    " g AS (SELECT nt, COUNT(*) AS c FROM n GROUP BY nt)"
    " SELECT COUNT(*)::BIGINT AS n_groups, SUM(c)::BIGINT AS n_docs,"
    " SUM(c - 1)::BIGINT AS n_redundant FROM g"
)
ORACLE_SQL["source_lang_chi2"] = (
    "WITH c AS (SELECT source, lang, COUNT(*)::DOUBLE AS n FROM documents GROUP BY 1, 2),"
    " rt AS (SELECT source, SUM(n) AS rn FROM c GROUP BY 1),"
    " ct AS (SELECT lang, SUM(n) AS cn FROM c GROUP BY 1),"
    " tot AS (SELECT SUM(n) AS t FROM c),"
    " grid AS (SELECT rt.source, ct.lang, rt.rn, ct.cn, COALESCE(c.n, 0) AS n"
    "  FROM rt CROSS JOIN ct LEFT JOIN c ON c.source = rt.source AND c.lang = ct.lang)"
    " SELECT ROUND(SUM(POWER(n - rn * cn / tot.t, 2) / (rn * cn / tot.t)), 6) AS chi2,"
    " ((SELECT COUNT(*) FROM rt) - 1)::BIGINT * ((SELECT COUNT(*) FROM ct) - 1)::BIGINT"
    "  AS dof FROM grid CROSS JOIN tot"
)


ORACLE_SQL["pmi_bigrams"] = (
    "WITH toks AS (SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents),"
    " uni AS (SELECT unnest(t) AS w FROM toks),"
    " uc AS (SELECT w, COUNT(*)::DOUBLE AS c FROM uni GROUP BY 1),"
    " nu AS (SELECT SUM(c) AS n FROM uc),"
    " bi AS (SELECT t[i] AS a, t[i+1] AS b FROM toks,"
    "  unnest(generate_series(1, len(t) - 1)) AS u(i)),"
    " bc AS (SELECT a, b, COUNT(*)::DOUBLE AS c FROM bi GROUP BY 1, 2"
    "  HAVING COUNT(*) >= 5),"
    " nb AS (SELECT COUNT(*)::DOUBLE AS n FROM bi)"
    " SELECT a || ' ' || b AS bigram, bc.c::BIGINT AS n_ab,"
    " ROUND(ln((bc.c / nb.n) / ((ua.c / nu.n) * (ub.c / nu.n))), 6) AS pmi"
    " FROM bc JOIN uc ua ON ua.w = bc.a JOIN uc ub ON ub.w = bc.b"
    " CROSS JOIN nb CROSS JOIN nu"
    " ORDER BY ln((bc.c / nb.n) / ((ua.c / nu.n) * (ub.c / nu.n))) DESC, bigram"
    " LIMIT 20"
)
ORACLE_SQL["docs_matching_all_terms"] = (
    "SELECT doc_id FROM (SELECT doc_id, COUNT(DISTINCT token) AS k FROM"
    " (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t"
    " WHERE token IN ('query', 'window', 'hash') GROUP BY doc_id) g"
    " WHERE k = 3 ORDER BY doc_id"
)
ORACLE_SQL["copurchase_bfs"] = (
    "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),"
    " seed AS (SELECT MIN(l_partkey) AS p FROM d),"
    " l1 AS (SELECT DISTINCT b.l_partkey AS p FROM d a"
    "  JOIN d b ON a.l_orderkey = b.l_orderkey JOIN seed s ON a.l_partkey = s.p"
    "  WHERE b.l_partkey <> s.p),"
    " l2 AS (SELECT DISTINCT b.l_partkey AS p FROM d a"
    "  JOIN d b ON a.l_orderkey = b.l_orderkey"
    "  WHERE a.l_partkey IN (SELECT p FROM l1)"
    "   AND b.l_partkey NOT IN (SELECT p FROM l1)"
    "   AND b.l_partkey NOT IN (SELECT p FROM seed)),"
    " l3 AS (SELECT DISTINCT b.l_partkey AS p FROM d a"
    "  JOIN d b ON a.l_orderkey = b.l_orderkey"
    "  WHERE a.l_partkey IN (SELECT p FROM l2)"
    "   AND b.l_partkey NOT IN (SELECT p FROM l2)"
    "   AND b.l_partkey NOT IN (SELECT p FROM l1)"
    "   AND b.l_partkey NOT IN (SELECT p FROM seed))"
    " SELECT 0 AS dist, 1::BIGINT AS n"
    " UNION ALL SELECT 1, COUNT(*)::BIGINT FROM l1"
    " UNION ALL SELECT 2, COUNT(*)::BIGINT FROM l2"
    " UNION ALL SELECT 3, COUNT(*)::BIGINT FROM l3 ORDER BY dist"
)
ORACLE_SQL["supplier_pctrank_nation"] = (
    "SELECT s_suppkey, n_name,"
    " ROUND(PERCENT_RANK() OVER (PARTITION BY n_name"
    "  ORDER BY s_acctbal, s_suppkey), 6) AS pr"
    " FROM supplier JOIN nation ON s_nationkey = n_nationkey"
    " ORDER BY n_name, pr, s_suppkey"
)
ORACLE_SQL["doc_zipf_slope"] = (
    "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),"
    " tc AS (SELECT w, COUNT(*)::DOUBLE AS n FROM tok GROUP BY 1),"
    " r AS (SELECT ln(ROW_NUMBER() OVER (ORDER BY n DESC, w)) AS lr, ln(n) AS lf FROM tc)"
    " SELECT ROUND((COUNT(*) * SUM(lr * lf) - SUM(lr) * SUM(lf))"
    "  / (COUNT(*) * SUM(lr * lr) - SUM(lr) * SUM(lr)), 6) AS slope,"
    " COUNT(*)::BIGINT AS n_terms FROM r"
)


ORACLE_SQL["lineitem_quality_audit"] = (
    "SELECT COUNT(*)::BIGINT AS n_rows,"
    " SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)::BIGINT AS n_bad_qty,"
    " SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)::BIGINT"
    "  AS n_bad_discount,"
    " SUM(CASE WHEN l_tax < 0 OR l_tax > 1 THEN 1 ELSE 0 END)::BIGINT AS n_bad_tax,"
    " SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)::BIGINT AS n_bad_price,"
    " SUM(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_fk_miss"
    " FROM lineitem LEFT JOIN part ON p_partkey = l_partkey"
)
ORACLE_SQL["revenue_gini"] = (
    "WITH t AS (SELECT o_custkey, SUM(o_totalprice) AS rev FROM orders GROUP BY 1),"
    " r AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey)::DOUBLE AS i FROM t)"
    " SELECT ROUND(2.0 * SUM(i * rev) / (COUNT(*) * SUM(rev))"
    "  - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini,"
    " COUNT(*)::BIGINT AS n_customers FROM r"
)
ORACLE_SQL["price_mannwhitney"] = (
    "WITH v AS (SELECT l_extendedprice AS x,"
    "  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g FROM lineitem),"
    " r AS (SELECT g, RANK() OVER (ORDER BY x)"
    "  + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS ar FROM v)"
    " SELECT ROUND(SUM(CASE WHEN g = 1 THEN ar ELSE 0 END)"
    "  - SUM(g) * (SUM(g) + 1.0) / 2.0, 4) AS u1,"
    " SUM(g)::BIGINT AS n_returned, (COUNT(*) - SUM(g))::BIGINT AS n_other FROM r"
)
ORACLE_SQL["revenue_max_drawdown"] = (
    "WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,"
    "  SUM(o_totalprice) AS r FROM orders GROUP BY 1),"
    " p AS (SELECT r, MAX(r) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS peak FROM d)"
    " SELECT ROUND(MAX(peak - r), 4) AS max_drawdown, COUNT(*)::BIGINT AS n_days FROM p"
)
ORACLE_SQL["doc_ttr_buckets"] = (
    "WITH t AS (SELECT doc_id, COUNT(DISTINCT token)::DOUBLE / COUNT(token) AS ttr"
    "  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) x"
    "  GROUP BY doc_id)"
    " SELECT LEAST(FLOOR(ttr * 10), 9)::BIGINT AS ttr_decile,"
    " COUNT(*)::BIGINT AS n_docs FROM t GROUP BY 1 ORDER BY 1"
)


ORACLE_SQL["monthly_churn"] = (
    "WITH a AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m') AS month FROM events)"
    " SELECT month, COUNT(*)::BIGINT AS n_churned FROM a"
    " WHERE NOT EXISTS (SELECT 1 FROM a b WHERE b.user_id = a.user_id"
    "  AND b.month = strftime(strptime(a.month, '%Y-%m') + INTERVAL 1 MONTH, '%Y-%m'))"
    " GROUP BY month ORDER BY month"
)
ORACLE_SQL["neardup_rate_by_source"] = (
    "WITH toks AS (SELECT doc_id, source,"
    "  list_distinct(string_split_regex(trim(text), '\\s+')) AS ts FROM documents),"
    " p AS (SELECT a.source AS sa, b.source AS sb FROM toks a, toks b"
    "  WHERE a.doc_id < b.doc_id AND len(list_intersect(a.ts, b.ts)) * 1.0"
    "   / len(list_distinct(a.ts || b.ts)) >= 0.8)"
    " SELECT LEAST(sa, sb) AS source_a, GREATEST(sa, sb) AS source_b,"
    " COUNT(*)::BIGINT AS n_pairs FROM p GROUP BY 1, 2"
    " ORDER BY n_pairs DESC, source_a, source_b LIMIT 10"
)
ORACLE_SQL["events_value_winsorized_mean"] = (
    "SELECT ROUND(AVG(LEAST(GREATEST(value,"
    "  (SELECT quantile_disc(value, 0.05) FROM events)),"
    "  (SELECT quantile_disc(value, 0.95) FROM events))), 6) AS winsorized_mean,"
    " ROUND((SELECT quantile_disc(value, 0.05) FROM events), 6) AS p05,"
    " ROUND((SELECT quantile_disc(value, 0.95) FROM events), 6) AS p95 FROM events"
)
ORACLE_SQL["events_sliding_30d_revenue"] = (
    "WITH p AS (SELECT CAST(ts AS DATE) AS d, value FROM events"
    "  WHERE event_type = 'purchase'),"
    " x AS (SELECT datediff('day', DATE '1995-01-01', d) AS nd, value FROM p),"
    " w AS (SELECT ((nd // 7) * 7 - 7 * k) AS s, value FROM x,"
    "  unnest(generate_series(0, 3)) AS u(k))"
    " SELECT strftime(DATE '1995-01-01' + s::INT, '%Y-%m-%d') AS win_start,"
    " ROUND(SUM(value), 4) AS revenue FROM w WHERE s >= 0 GROUP BY 1 ORDER BY 1"
)


ORACLE_SQL["knn_label_agreement"] = (
    "WITH nn AS (SELECT a.vec_id, a.label AS la,"
    " (SELECT b.label FROM embeddings b WHERE b.vec_id <> a.vec_id"
    "  ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id"
    "  LIMIT 1) AS lb FROM embeddings a)"
    " SELECT ROUND(AVG(CASE WHEN la = lb THEN 1.0 ELSE 0.0 END), 6) AS acc,"
    " COUNT(*)::BIGINT AS n FROM nn"
)


ORACLE_SQL["doc_quality_pctrank"] = (
    "SELECT doc_id, lang,"
    " ROUND(PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars), 6) AS pr"
    " FROM documents ORDER BY doc_id"
)
ORACLE_SQL["copurchase_link_prediction"] = (
    "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),"
    " e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb FROM d a"
    "  JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),"
    " adj AS (SELECT pa AS hub, pb AS nb FROM e UNION SELECT pb, pa FROM e),"
    " w AS (SELECT a.nb AS pa, b.nb AS pb, COUNT(*) AS common FROM adj a"
    "  JOIN adj b ON a.hub = b.hub AND a.nb < b.nb GROUP BY 1, 2)"
    " SELECT pa AS part_a, pb AS part_b, common::BIGINT AS common FROM w"
    " WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = w.pa AND e.pb = w.pb)"
    " ORDER BY common DESC, part_a, part_b LIMIT 10"
)
ORACLE_SQL["customer_cohort_ltv"] = (
    "WITH f AS (SELECT o_custkey, MIN(EXTRACT(year FROM o_orderdate))::BIGINT AS cohort"
    "  FROM orders GROUP BY 1),"
    " nc AS (SELECT cohort, COUNT(*)::DOUBLE AS n FROM f GROUP BY 1),"
    " r AS (SELECT f.cohort,"
    "  EXTRACT(year FROM o.o_orderdate)::BIGINT - f.cohort AS age,"
    "  SUM(o.o_totalprice) AS rev FROM orders o JOIN f ON o.o_custkey = f.o_custkey"
    "  GROUP BY 1, 2),"
    " c AS (SELECT cohort, age, SUM(rev) OVER (PARTITION BY cohort ORDER BY age"
    "  ROWS UNBOUNDED PRECEDING) AS cum FROM r)"
    " SELECT c.cohort, c.age, ROUND(c.cum / nc.n, 4) AS avg_ltv FROM c"
    " JOIN nc USING(cohort) ORDER BY cohort, age"
)
ORACLE_SQL["orders_benford"] = (
    "WITH d AS (SELECT FLOOR(o_totalprice"
    "  / POWER(10, FLOOR(LOG10(o_totalprice))))::BIGINT AS digit FROM orders),"
    " o AS (SELECT g.digit, COUNT(d.digit)::BIGINT AS n FROM"
    "  (SELECT unnest(generate_series(1, 9)) AS digit) g"
    "  LEFT JOIN d ON d.digit = g.digit GROUP BY g.digit),"
    " t AS (SELECT SUM(n)::DOUBLE AS tot FROM o)"
    " SELECT digit, n, ROUND(n / tot, 6) AS share,"
    " ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford FROM o CROSS JOIN t"
    " ORDER BY digit"
)


ORACLE_SQL["price_iqr_outliers"] = (
    "WITH q AS (SELECT quantile_disc(l_extendedprice, 0.25) AS q1,"
    "  quantile_disc(l_extendedprice, 0.75) AS q3 FROM lineitem)"
    " SELECT ROUND(q.q1, 4) AS q1, ROUND(q.q3, 4) AS q3,"
    " (SELECT COUNT(*) FROM lineitem"
    "   WHERE l_extendedprice < q.q1 - 1.5 * (q.q3 - q.q1))::BIGINT AS n_low,"
    " (SELECT COUNT(*) FROM lineitem"
    "   WHERE l_extendedprice > q.q3 + 1.5 * (q.q3 - q.q1))::BIGINT AS n_high FROM q"
)
ORACLE_SQL["doc_length_anova"] = (
    "WITH g AS (SELECT lang, COUNT(*)::DOUBLE AS n, SUM(n_chars::DOUBLE) AS s,"
    "  SUM(n_chars::DOUBLE * n_chars) AS s2 FROM documents GROUP BY 1),"
    " t AS (SELECT SUM(n) AS nn, COUNT(*) AS k, SUM(s) / SUM(n) AS mean FROM g)"
    " SELECT ROUND((SUM(g.n * POWER(g.s / g.n - t.mean, 2)) / (t.k - 1))"
    "  / (SUM(g.s2 - g.s * g.s / g.n) / (t.nn - t.k)), 6) AS f_stat,"
    " (t.k - 1)::BIGINT AS df_between, (t.nn - t.k)::BIGINT AS df_within"
    " FROM g CROSS JOIN t GROUP BY t.k, t.nn"
)
ORACLE_SQL["terms_llr_keyness"] = (
    "WITH tok AS (SELECT source = 'src0' AS in0,"
    "  unnest(string_split(text, ' ')) AS token FROM documents),"
    " v AS (SELECT token, SUM(CASE WHEN in0 THEN 1 ELSE 0 END)::DOUBLE AS a,"
    "  SUM(CASE WHEN in0 THEN 0 ELSE 1 END)::DOUBLE AS b FROM tok GROUP BY 1"
    "  HAVING COUNT(*) >= 10),"
    " t AS (SELECT SUM(CASE WHEN in0 THEN 1 ELSE 0 END)::DOUBLE AS ca,"
    "  SUM(CASE WHEN in0 THEN 0 ELSE 1 END)::DOUBLE AS cb FROM tok),"
    " s AS (SELECT token, a::BIGINT AS a, b::BIGINT AS b,"
    "  (CASE WHEN a / t.ca > (a + b) / (t.ca + t.cb) THEN 1 ELSE -1 END) * 2.0 * ("
    "   (CASE WHEN a > 0 THEN a * ln(a) ELSE 0 END) - a * ln((a + b) * t.ca / (t.ca + t.cb))"
    "   + (CASE WHEN b > 0 THEN b * ln(b) ELSE 0 END) - b * ln((a + b) * t.cb / (t.ca + t.cb))"
    "  ) AS llr FROM v CROSS JOIN t)"
    " SELECT token, a, b, ROUND(llr, 6) AS llr FROM s"
    " ORDER BY llr DESC, token LIMIT 20"
)


ORACLE_SQL["doc_burstiness"] = (
    "WITH dc AS (SELECT doc_id, token, COUNT(*)::DOUBLE AS c FROM"
    " (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t"
    " GROUP BY 1, 2),"
    " v AS (SELECT token, COUNT(*)::BIGINT AS df, AVG(c) AS mean,"
    "  VAR_SAMP(c) AS var FROM dc GROUP BY token HAVING COUNT(*) >= 20)"
    " SELECT token, df, ROUND(var / mean, 6) AS burstiness FROM v"
    " ORDER BY var / mean DESC, token LIMIT 20"
)
ORACLE_SQL["doc_js_divergence"] = (
    "WITH tok AS (SELECT source = 'src0' AS in0,"
    "  unnest(string_split(text, ' ')) AS token FROM documents),"
    " v AS (SELECT token, SUM(CASE WHEN in0 THEN 1 ELSE 0 END)::DOUBLE AS a,"
    "  SUM(CASE WHEN in0 THEN 0 ELSE 1 END)::DOUBLE AS b FROM tok GROUP BY 1),"
    " t AS (SELECT SUM(a) AS ca, SUM(b) AS cb FROM v),"
    " pq AS (SELECT a / t.ca AS p, b / t.cb AS q FROM v CROSS JOIN t)"
    " SELECT ROUND(0.5 * SUM(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2))"
    "  ELSE 0 END) + 0.5 * SUM(CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2))"
    "  ELSE 0 END), 6) AS jsd, COUNT(*)::BIGINT AS n_terms FROM pq"
)
ORACLE_SQL["copurchase_adamic_adar"] = (
    "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),"
    " e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb FROM d a"
    "  JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),"
    " adj AS (SELECT pa AS hub, pb AS nb FROM e UNION SELECT pb, pa FROM e),"
    " dg AS (SELECT hub, COUNT(*)::DOUBLE AS deg FROM adj GROUP BY 1),"
    " w AS (SELECT a.nb AS pa, b.nb AS pb, SUM(1.0 / ln(dg.deg)) AS aa FROM adj a"
    "  JOIN adj b ON a.hub = b.hub AND a.nb < b.nb JOIN dg ON dg.hub = a.hub"
    "  GROUP BY 1, 2)"
    " SELECT pa AS part_a, pb AS part_b, ROUND(aa, 6) AS aa FROM w"
    " WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = w.pa AND e.pb = w.pb)"
    " ORDER BY ROUND(aa, 6) DESC, pa, pb LIMIT 10"
)


ORACLE_SQL["doc_hapax_ratio"] = (
    "WITH tc AS (SELECT token, COUNT(*)::BIGINT AS n FROM"
    " (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t GROUP BY 1)"
    " SELECT SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,"
    " COUNT(*)::BIGINT AS n_vocab,"
    " ROUND(SUM(CASE WHEN n = 1 THEN 1.0 ELSE 0 END) / COUNT(*), 6) AS hapax_ratio,"
    " ROUND(COUNT(*)::DOUBLE / SUM(n), 6) AS type_token_ratio FROM tc"
)


# ----------------- wave 31 (round 5): rank correlations / coverage / -------
# ----------------- A/B inference / inequality / mode / interval join -------


def q_price_qty_spearman(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation of (l_extendedprice, l_quantity) with
    average-rank ties — the nonparametric sibling of qty_price_corr.
    Ranks depend only on VALUES, so no per-row global sort: quantity has a
    bounded distinct domain (≤ 50) → its avg-rank map is a tiny driver
    table shipped in the closure; price reuses the value-bucket two-pass
    prefix plan (q_revenue_gini): per-bucket counts → driver exclusive
    cumsum → per-bucket sorted scan assigns tie-run average ranks (tie
    runs never span buckets: equal values share a bucket). Each bucket
    folds to the six Pearson partials (n, Σrx, Σry, Σrx², Σry², Σrxry) —
    driver merge is bucket-count-sized."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    qcnt = (
        _coalesce_partials(
            ds.map_batches(
                lambda b: _partial(b.select(["l_quantity"]), ["l_quantity"], [([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby("l_quantity")
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()
        .sort_values("l_quantity")
    )
    cum = np.concatenate(([0], np.cumsum(qcnt["c"].to_numpy())[:-1]))
    qmap = dict(
        zip(qcnt["l_quantity"], cum + (qcnt["c"].to_numpy() + 1) / 2.0)
    )

    _W = 1000.0

    def with_vb(b: pa.Table) -> pa.Table:
        vb = (b["l_extendedprice"].to_numpy() // _W).astype(np.int64)
        return b.append_column("vb", pa.array(vb))

    # two STREAMING scans (bucket counts, then the bucket fold) instead of a
    # mid-pipeline materialize of the whole fact table: one extra read beats
    # holding N rows in the object store at 100 TB
    rows = ds.map_batches(with_vb, batch_format="pyarrow")
    bsums = (
        _coalesce_partials(
            ds.map_batches(with_vb, batch_format="pyarrow").map_batches(
                lambda b: _partial(b.select(["vb"]), ["vb"], [([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby("vb")
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()
        .sort_values("vb")
    )
    offs = dict(
        zip(
            bsums["vb"].astype(int),
            np.concatenate(([0], np.cumsum(bsums["c"].to_numpy())[:-1])),
        )
    )

    def bucket_fold(g: pd.DataFrame, _qmap=qmap) -> pd.DataFrame:
        g = g.sort_values("l_extendedprice", kind="stable")
        x = g["l_extendedprice"].to_numpy()
        off = float(offs[int(g["vb"].iloc[0])])
        starts = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
        lens = np.diff(np.r_[starts, len(x)])
        # tie-run average rank: off + (first_pos + last_pos)/2, 1-based
        run_avg = off + (starts + 1 + starts + lens) / 2.0
        rx = np.repeat(run_avg, lens)
        ry = np.array([_qmap[q] for q in g["l_quantity"]], dtype=np.float64)
        return pd.DataFrame(
            {
                "n": [len(x)],
                "sx": [rx.sum()],
                "sy": [ry.sum()],
                "sxx": [(rx * rx).sum()],
                "syy": [(ry * ry).sum()],
                "sxy": [(rx * ry).sum()],
            }
        )

    p = rows.groupby("vb").map_groups(bucket_fold, batch_format="pandas").to_pandas()
    n = float(p["n"].sum())
    sx, sy = float(p["sx"].sum()), float(p["sy"].sum())
    sxx, syy, sxy = float(p["sxx"].sum()), float(p["syy"].sum()), float(p["sxy"].sum())
    rho = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return pd.DataFrame([{"spearman": round(rho, 6), "n": np.int64(int(n))}])


QUERIES["price_qty_spearman"] = q_price_qty_spearman
ORACLE_SQL["price_qty_spearman"] = (
    "SELECT ROUND(CORR(rx, ry), 6) AS spearman, COUNT(*)::BIGINT AS n FROM ("
    " SELECT (RANK() OVER (ORDER BY l_extendedprice)"
    "   + (COUNT(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0) AS rx,"
    "  (RANK() OVER (ORDER BY l_quantity)"
    "   + (COUNT(*) OVER (PARTITION BY l_quantity) - 1) / 2.0) AS ry"
    " FROM lineitem) t"
)


def q_qty_discount_kendall(sf_dir: str) -> pd.DataFrame:
    """Kendall τ-b of (l_quantity, l_discount) — concordance-based rank
    correlation. Both domains are bounded (≤ 50 × ≤ 11 distinct), so the
    whole statistic folds through the JOINT CONTINGENCY table: one
    distributed groupby((q,d)) count (partials inside map_batches), then
    concordant/discordant pair mass and tie corrections are O(cells²)
    numpy on ≤ 550 driver rows. The row count never ships — only cell
    counts do (the same bounded-domain trick as value_buckets)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_quantity", "l_discount"])
    cells = (
        _coalesce_partials(
            ds.map_batches(
                lambda b: _partial(b, ["l_quantity", "l_discount"], [([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby(["l_quantity", "l_discount"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    q = cells["l_quantity"].to_numpy()
    d = cells["l_discount"].to_numpy()
    w = cells["n"].to_numpy().astype(np.float64)
    gq = np.sign(q[:, None] - q[None, :])
    gd = np.sign(d[:, None] - d[None, :])
    ww = w[:, None] * w[None, :]
    conc = float(ww[(gq * gd) > 0].sum()) / 2.0
    disc = float(ww[(gq * gd) < 0].sum()) / 2.0
    n = float(w.sum())
    n0 = n * (n - 1) / 2.0
    tx = float(sum(c * (c - 1) / 2.0 for c in pd.Series(w).groupby(q).sum()))
    ty = float(sum(c * (c - 1) / 2.0 for c in pd.Series(w).groupby(d).sum()))
    tau = (conc - disc) / np.sqrt((n0 - tx) * (n0 - ty))
    return pd.DataFrame([{"tau": round(tau, 6), "n": np.int64(int(n))}])


QUERIES["qty_discount_kendall"] = q_qty_discount_kendall
ORACLE_SQL["qty_discount_kendall"] = (
    "WITH g AS (SELECT l_quantity AS q, l_discount AS d, COUNT(*)::DOUBLE AS n"
    "  FROM lineitem GROUP BY 1, 2),"
    " cd AS (SELECT"
    "  COALESCE(SUM(a.n * b.n) FILTER ((b.q > a.q AND b.d > a.d)"
    "    OR (b.q < a.q AND b.d < a.d)), 0) / 2.0 AS c,"
    "  COALESCE(SUM(a.n * b.n) FILTER ((b.q > a.q AND b.d < a.d)"
    "    OR (b.q < a.q AND b.d > a.d)), 0) / 2.0 AS dd FROM g a, g b),"
    " t AS (SELECT SUM(n) AS nn FROM g),"
    " tx AS (SELECT SUM(cn * (cn - 1) / 2.0) AS v FROM"
    "   (SELECT SUM(n) AS cn FROM g GROUP BY q) s),"
    " ty AS (SELECT SUM(cn * (cn - 1) / 2.0) AS v FROM"
    "   (SELECT SUM(n) AS cn FROM g GROUP BY d) s)"
    " SELECT ROUND((cd.c - cd.dd) / SQRT((t.nn * (t.nn - 1) / 2.0 - tx.v)"
    "   * (t.nn * (t.nn - 1) / 2.0 - ty.v)), 6) AS tau,"
    "  t.nn::BIGINT AS n FROM cd, t, tx, ty"
)


def q_vocab_coverage_curve(sf_dir: str) -> pd.DataFrame:
    """Vocabulary coverage curve — what fraction of all token OCCURRENCES
    the top-k most frequent terms cover, for k ∈ {10, 100, 1000}: the
    statistic a tokenizer-vocabulary or stopword-list decision reads.
    Distributed term counts (per-batch polars explode → pyarrow partial →
    one vocab-sized groupby); the ranked cumsum runs on the VOCAB table
    (≪ corpus, the same vocabulary-bounded assumption as zipf/TTR).
    Deterministic rank tiebreak: freq DESC, term ASC on both sides."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["text"])

    def tok_f(b: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(b["text"]).str.split(" ").explode()
        vc = s.value_counts()
        cols = vc.columns  # [value_col, 'count']
        return pa.table(
            {
                "token": pa.array(vc[cols[0]].to_list(), pa.string()),
                "c": pa.array(vc["count"].to_numpy().astype(np.int64)),
            }
        )

    tc = (
        ds.map_batches(tok_f, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    tc = tc.sort_values(["c", "token"], ascending=[False, True], kind="stable")
    cum = np.cumsum(tc["c"].to_numpy(), dtype=np.float64)
    tot = float(cum[-1])
    ks = [10, 100, 1000]
    return pd.DataFrame(
        {
            "k": np.array(ks, dtype=np.int64),
            "coverage": [
                round(float(cum[min(k, len(cum)) - 1] / tot), 6) for k in ks
            ],
        }
    )


QUERIES["vocab_coverage_curve"] = q_vocab_coverage_curve
ORACLE_SQL["vocab_coverage_curve"] = (
    "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),"
    " tc AS (SELECT t, COUNT(*)::DOUBLE AS c FROM tok GROUP BY t),"
    " r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rn,"
    "   SUM(c) OVER () AS tot FROM tc)"
    " SELECT k::BIGINT AS k,"
    "  ROUND(SUM(c) FILTER (rn <= k) / ANY_VALUE(tot), 6) AS coverage"
    " FROM r, (VALUES (10), (100), (1000)) v(k) GROUP BY k ORDER BY k"
)


def q_ab_conversion_ztest(sf_dir: str) -> pd.DataFrame:
    """Two-proportion A/B conversion test: variant = user_id parity (the
    deterministic split an experiment framework would hash), conversion =
    user fired ≥ 1 'purchase' event. Per-user flags fold distributed
    (per-batch (user, max) partials → one user groupby), variant rollups
    are 2 rows, and the pooled two-proportion z-score is driver
    arithmetic. The z column repeats on both rows so the result is one
    self-contained relation."""
    from ray.data.aggregate import Max, Sum

    ds = _tbl(sf_dir, "events", columns=["user_id", "event_type"])

    def flag_f(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": b["user_id"],
                "conv": pa.array(
                    (np.asarray(b["event_type"].to_pandas()) == "purchase").astype(
                        np.int64
                    )
                ),
            }
        )
        return _partial(t, ["user_id"], [("conv", "max")])

    per_user = (
        ds.map_batches(flag_f, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("conv_max", alias_name="conv"))
    )

    def var_f(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "variant": pa.array(
                    (b["user_id"].to_numpy() % 2).astype(np.int64)
                ),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
                "conv": b["conv"],
            }
        )
        return _partial(t, ["variant"], [("one", "sum"), ("conv", "sum")])

    s = (
        _coalesce_partials(per_user.map_batches(var_f, batch_format="pyarrow"))
        .groupby("variant")
        .aggregate(
            Sum("one_sum", alias_name="n_users"),
            Sum("conv_sum", alias_name="n_converted"),
        )
        .to_pandas()
        .sort_values("variant")
        .reset_index(drop=True)
    )
    n0, n1 = float(s["n_users"].iloc[0]), float(s["n_users"].iloc[1])
    c0, c1 = float(s["n_converted"].iloc[0]), float(s["n_converted"].iloc[1])
    p = (c0 + c1) / (n0 + n1)
    z = (c0 / n0 - c1 / n1) / np.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
    s["conv_rate"] = (s["n_converted"] / s["n_users"]).round(6)
    s["z"] = round(float(z), 6)
    return s.astype({"variant": "int64", "n_users": "int64", "n_converted": "int64"})


QUERIES["ab_conversion_ztest"] = q_ab_conversion_ztest
ORACLE_SQL["ab_conversion_ztest"] = (
    "WITH u AS (SELECT user_id, (user_id % 2)::BIGINT AS variant,"
    "  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv"
    "  FROM events GROUP BY 1),"
    " s AS (SELECT variant, COUNT(*)::BIGINT AS n_users,"
    "  SUM(conv)::BIGINT AS n_converted FROM u GROUP BY 1),"
    " a AS (SELECT MAX(CASE WHEN variant = 0 THEN n_converted * 1.0 / n_users END) AS r0,"
    "  MAX(CASE WHEN variant = 1 THEN n_converted * 1.0 / n_users END) AS r1,"
    "  MAX(CASE WHEN variant = 0 THEN n_users END)::DOUBLE AS n0,"
    "  MAX(CASE WHEN variant = 1 THEN n_users END)::DOUBLE AS n1,"
    "  SUM(n_converted)::DOUBLE / SUM(n_users) AS p FROM s)"
    " SELECT s.variant, s.n_users, s.n_converted,"
    "  ROUND(s.n_converted * 1.0 / s.n_users, 6) AS conv_rate,"
    "  ROUND((a.r0 - a.r1) / SQRT(a.p * (1 - a.p) * (1.0 / a.n0 + 1.0 / a.n1)), 6) AS z"
    " FROM s, a ORDER BY s.variant"
)


def q_revenue_theil(sf_dir: str) -> pd.DataFrame:
    """Theil T inequality index of per-customer revenue — the
    information-theoretic sibling of revenue_gini, and cheaper at scale:
    T = Σ x·ln(x) / (n·μ) − ln(μ) needs only the mergeable partials
    (n, Σx, Σx·lnx) — NO ranks, NO sort, one shuffle (the per-customer
    rollup) then per-batch scalar partials."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    per_cust = (
        ds.map_batches(
            lambda b: _partial(b, ["o_custkey"], [("o_totalprice", "sum")]),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("o_totalprice_sum", alias_name="rev"))
    )

    def fold(b: pa.Table) -> pa.Table:
        x = b["rev"].to_numpy()
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([float(x.sum())], pa.float64()),
                "sxlx": pa.array([float((x * np.log(x)).sum())], pa.float64()),
            }
        )

    p = _coalesce_partials(per_cust.map_batches(fold, batch_format="pyarrow")).to_pandas()
    n = float(p["n"].sum())
    mu = float(p["sx"].sum()) / n
    theil = float(p["sxlx"].sum()) / (n * mu) - np.log(mu)
    return pd.DataFrame([{"theil": round(theil, 6), "n_customers": np.int64(int(n))}])


QUERIES["revenue_theil"] = q_revenue_theil
ORACLE_SQL["revenue_theil"] = (
    "WITH pc AS (SELECT o_custkey, SUM(o_totalprice) AS x FROM orders GROUP BY 1),"
    " s AS (SELECT COUNT(*)::DOUBLE AS n, SUM(x)::DOUBLE AS sx,"
    "  SUM(x * LN(x)) AS sxlx FROM pc)"
    " SELECT ROUND(sxlx / (n * (sx / n)) - LN(sx / n), 6) AS theil,"
    "  n::BIGINT AS n_customers FROM s"
)


def q_priority_mode_by_nation(sf_dir: str) -> pd.DataFrame:
    """Per-group MODE: the most frequent order priority per customer
    nation (ties → lexicographically smallest priority). Broadcast-dim
    join (J2) maps orders to nation names, counts fold distributed to a
    ≤ nations×priorities cell table, and the per-group argmax is a
    result-sized driver pick — the bounded-domain shape shared with
    value_buckets/kendall."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nk = nation.column("n_nationkey").to_numpy()
    order = np.argsort(nk)
    names = nation.column("n_name").take(pa.array(order))
    pos = np.searchsorted(nk[order], cust.column("c_nationkey").to_numpy())
    dim = pa.table(
        {"o_custkey": cust["c_custkey"], "n_name": names.take(pa.array(pos, pa.int64()))}
    )
    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    joined = broadcast_join(ds, dim, "o_custkey", ["n_name"])
    cnt = (
        _coalesce_partials(
            joined.map_batches(
                lambda b: _partial(
                    b.select(["n_name", "o_orderpriority"]),
                    ["n_name", "o_orderpriority"],
                    [([], "count_all")],
                ),
                batch_format="pyarrow",
            )
        )
        .groupby(["n_name", "o_orderpriority"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    cnt = cnt.sort_values(
        ["n_name", "n", "o_orderpriority"], ascending=[True, False, True], kind="stable"
    )
    out = cnt.groupby("n_name", as_index=False).first()
    out = out.rename(columns={"o_orderpriority": "mode_priority"})
    return out[["n_name", "mode_priority", "n"]].astype({"n": "int64"}).reset_index(drop=True)


QUERIES["priority_mode_by_nation"] = q_priority_mode_by_nation
ORACLE_SQL["priority_mode_by_nation"] = (
    "WITH cnt AS (SELECT n_name, o_orderpriority, COUNT(*)::BIGINT AS n"
    " FROM orders JOIN customer ON o_custkey = c_custkey"
    " JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2),"
    " r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name"
    "   ORDER BY n DESC, o_orderpriority) AS rn FROM cnt)"
    " SELECT n_name, o_orderpriority AS mode_priority, n FROM r WHERE rn = 1"
    " ORDER BY n_name"
)


def q_session_overlap_pairs(sf_dir: str) -> pd.DataFrame:
    """INTERVAL-OVERLAP JOIN: pairs of users whose (1 h-gap) sessions
    overlapped in time, with the count of overlapping session pairs — the
    range-join shape Ray Data lacks natively, composed as: sessionize
    (user-bucket shuffle + segmented scan, the user_sessions plan) →
    REPLICATE each session to every DAY it touches → per-day map_groups
    emits pairs whose overlap STARTS that day (max(start_a, start_b)
    falls in exactly one day, so cross-day pairs dedup by construction) →
    one (user_a, user_b) groupby sums. Partitioning assumption: sessions
    alive on one day fit one task (densify the bucket key to hours for
    hotter streams)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def sess_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([False], (ts[1:] - ts[:-1]) > 3600 * 1_000_000_000))
        starts = np.flatnonzero(new_user | gap)
        ends = np.concatenate((starts[1:], [len(ts)])) - 1
        return pd.DataFrame(
            {"user_id": uid[starts], "st": ts[starts], "en": ts[ends]}
        )

    sessions = (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(sess_seg, batch_format="pandas")
    )

    DAY = 86_400 * 1_000_000_000

    def to_days(b: pa.Table) -> pa.Table:
        st = b["st"].to_numpy()
        en = b["en"].to_numpy()
        uid = b["user_id"].to_numpy()
        d0 = st // DAY
        d1 = en // DAY
        reps = (d1 - d0 + 1).astype(np.int64)
        day = np.repeat(d0, reps) + (
            np.arange(int(reps.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(reps) - reps, reps)
        )
        return pa.table(
            {
                "day": pa.array(day),
                "user_id": pa.array(np.repeat(uid, reps)),
                "st": pa.array(np.repeat(st, reps)),
                "en": pa.array(np.repeat(en, reps)),
            }
        )

    def day_pairs(g: pd.DataFrame) -> pd.DataFrame:
        day = int(g["day"].iloc[0])
        uid = g["user_id"].to_numpy()
        st = g["st"].to_numpy()
        en = g["en"].to_numpy()
        k = len(uid)
        ia, ib = np.triu_indices(k, 1)
        ov_st = np.maximum(st[ia], st[ib])
        keep = (
            (uid[ia] != uid[ib])
            & (ov_st < np.minimum(en[ia], en[ib]))  # strict overlap
            & (ov_st // DAY == day)  # this day OWNS the pair
        )
        ua = np.minimum(uid[ia[keep]], uid[ib[keep]])
        ub = np.maximum(uid[ia[keep]], uid[ib[keep]])
        t = pa.table(
            {
                "user_a": pa.array(ua.astype(np.int64)),
                "user_b": pa.array(ub.astype(np.int64)),
                "one": pa.array(np.ones(len(ua), np.int64)),
            }
        )
        return _partial(t, ["user_a", "user_b"], [("one", "sum")]).to_pandas()

    out = (
        sessions.map_batches(to_days, batch_format="pyarrow")
        .groupby("day")
        .map_groups(day_pairs, batch_format="pandas")
        .groupby(["user_a", "user_b"])
        .aggregate(Sum("one_sum", alias_name="n_overlaps"))
        .to_pandas()
        .sort_values(["user_a", "user_b"])
        .reset_index(drop=True)
    )
    return out.astype({"user_a": "int64", "user_b": "int64", "n_overlaps": "int64"})


QUERIES["session_overlap_pairs"] = q_session_overlap_pairs
ORACLE_SQL["session_overlap_pairs"] = (
    "WITH e AS (SELECT user_id, ts, event_id,"
    "  CASE WHEN ts - LAG(ts) OVER w > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS brk"
    "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " s AS (SELECT user_id, ts, SUM(brk) OVER"
    "   (PARTITION BY user_id ORDER BY ts, event_id) AS sid FROM e),"
    " iv AS (SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en FROM s GROUP BY 1, 2)"
    " SELECT a.user_id AS user_a, b.user_id AS user_b, COUNT(*)::BIGINT AS n_overlaps"
    " FROM iv a JOIN iv b ON a.user_id < b.user_id"
    "  AND GREATEST(a.st, b.st) < LEAST(a.en, b.en)"
    " GROUP BY 1, 2 ORDER BY 1, 2"
)


# ----------------- wave 32 (round 5): dependence measures / survival -------
# ----------------- / grouped trend / phrase search / CUPED ------------------


def q_source_lang_dependence(sf_dir: str) -> pd.DataFrame:
    """Association measures between document source and language from ONE
    distributed contingency fold: mutual information (nats), conditional
    entropy H(lang|source) and Cramér's V — the drift metrics a corpus-
    composition monitor reads next to chi² (q_source_lang_chi2). The
    (source, lang) cell table is result-sized, so every measure is driver
    numpy over it; zero cells cancel algebraically in all three (MI/H via
    0·ln 0 = 0, chi² via the Σo²/e − n identity), so only observed cells
    ever ship."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["source", "lang"])
    cells = (
        _coalesce_partials(
            ds.map_batches(
                lambda b: _partial(b, ["source", "lang"], [([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby(["source", "lang"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    n = cells["n"].to_numpy(dtype=np.float64)
    tot = n.sum()
    rs = cells.groupby("source")["n"].transform("sum").to_numpy(dtype=np.float64)
    cs = cells.groupby("lang")["n"].transform("sum").to_numpy(dtype=np.float64)
    p = n / tot
    mi = float((p * np.log(n * tot / (rs * cs))).sum())
    hcond = float(-(p * np.log(n / rs)).sum())
    chi2 = float((n * n * tot / (rs * cs)).sum() - tot)
    k = min(cells["source"].nunique(), cells["lang"].nunique())
    v = float(np.sqrt(chi2 / (tot * (k - 1))))
    return pd.DataFrame(
        [
            {
                "mutual_info": round(mi, 6),
                "h_lang_given_source": round(hcond, 6),
                "cramers_v": round(v, 6),
            }
        ]
    )


QUERIES["source_lang_dependence"] = q_source_lang_dependence
ORACLE_SQL["source_lang_dependence"] = (
    "WITH c AS (SELECT source, lang, COUNT(*)::DOUBLE AS n FROM documents GROUP BY 1, 2),"
    " t AS (SELECT SUM(n) AS tot, COUNT(DISTINCT source) AS nr,"
    "  COUNT(DISTINCT lang) AS nc FROM c),"
    " r AS (SELECT source, SUM(n) AS rs FROM c GROUP BY 1),"
    " l AS (SELECT lang, SUM(n) AS cs FROM c GROUP BY 1)"
    " SELECT ROUND(SUM(n / tot * LN(n * tot / (rs * cs))), 6) AS mutual_info,"
    "  ROUND(-SUM(n / tot * LN(n / rs)), 6) AS h_lang_given_source,"
    "  ROUND(SQRT((SUM(n * n * tot / (rs * cs)) - ANY_VALUE(tot))"
    "   / (ANY_VALUE(tot) * (LEAST(ANY_VALUE(nr), ANY_VALUE(nc)) - 1))), 6) AS cramers_v"
    " FROM c JOIN r USING (source) JOIN l USING (lang) CROSS JOIN t"
)


def q_conversion_survival(sf_dir: str) -> pd.DataFrame:
    """Kaplan-Meier survival curve for view→purchase conversion latency with
    RIGHT-CENSORING — the time-to-event estimator naive conversion averages
    bias (users who never purchased still inform the at-risk set). Per user:
    duration = whole days from first 'view' to first purchase AT-OR-AFTER it
    (event) or to their last event (censored). Censoring at day d keeps the
    user at risk THROUGH d (standard convention: censoring after same-time
    events). Distributed shape: user-bucket groupby → vectorized per-user
    fold INSIDE the group task → each bucket emits a ≤2×31-row (dur, ev)
    partial contingency (the day domain is calendar-bounded), so the final
    shuffle and the driver KM product both run on result-sized tables —
    no per-user rows ever reach the driver."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["user_id", "ts", "event_type"]]
        fv = (
            g[g["event_type"] == "view"]
            .groupby("user_id")["ts"]
            .min()
            .rename("fv")
        )
        last = g.groupby("user_id")["ts"].max().rename("last")
        u = pd.concat([fv, last], axis=1).dropna(subset=["fv"])
        pur = g[g["event_type"] == "purchase"].merge(
            u["fv"], left_on="user_id", right_index=True
        )
        fp = (
            pur[pur["ts"] >= pur["fv"]]
            .groupby("user_id")["ts"]
            .min()
            .rename("fp")
        )
        u = u.join(fp)
        ev = u["fp"].notna()
        end = u["fp"].where(ev, u["last"])
        dur = ((end - u["fv"]).dt.total_seconds() // 86400).astype(np.int64)
        vc = (
            pd.DataFrame({"dur": dur, "ev": ev.astype(np.int64)})
            .value_counts()
            .reset_index(name="n")
        )
        return vc

    cells = (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(fold, batch_format="pandas")
        .groupby(["dur", "ev"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("dur")
    )
    piv = (
        cells.pivot_table(index="dur", columns="ev", values="n", fill_value=0)
        .reindex(columns=[0, 1], fill_value=0)
        .sort_index()
    )
    tot = piv.sum(axis=1).to_numpy(dtype=np.float64)
    e = piv[1].to_numpy(dtype=np.float64)
    risk = np.cumsum(tot[::-1])[::-1]
    surv = np.cumprod(1.0 - e / risk)
    keep = e > 0
    return pd.DataFrame(
        {
            "day": piv.index.to_numpy(dtype=np.int64)[keep],
            "n_risk": risk[keep].astype(np.int64),
            "n_event": e[keep].astype(np.int64),
            "survival": np.round(surv[keep], 6),
        }
    ).reset_index(drop=True)


QUERIES["conversion_survival"] = q_conversion_survival
ORACLE_SQL["conversion_survival"] = (
    "WITH u AS (SELECT user_id, MIN(ts) FILTER (event_type = 'view') AS fv,"
    "  MAX(ts) AS last FROM events GROUP BY 1),"
    " p AS (SELECT e.user_id, MIN(e.ts) AS fp FROM events e JOIN u USING (user_id)"
    "  WHERE e.event_type = 'purchase' AND e.ts >= u.fv GROUP BY 1),"
    " d AS (SELECT u.user_id,"
    "  FLOOR(EPOCH(COALESCE(p.fp, u.last) - u.fv) / 86400)::BIGINT AS dur,"
    "  CASE WHEN p.fp IS NOT NULL THEN 1 ELSE 0 END AS ev"
    "  FROM u LEFT JOIN p USING (user_id) WHERE u.fv IS NOT NULL),"
    " g AS (SELECT dur, SUM(ev)::DOUBLE AS e, COUNT(*)::DOUBLE AS tot FROM d GROUP BY 1),"
    " r AS (SELECT dur, e, SUM(tot) OVER (ORDER BY dur DESC) AS risk FROM g),"
    " s AS (SELECT dur, e, risk,"
    "  EXP(SUM(LN(GREATEST(1 - e / risk, 1e-300))) OVER (ORDER BY dur)) AS surv FROM r)"
    " SELECT dur AS day, risk::BIGINT AS n_risk, e::BIGINT AS n_event,"
    "  ROUND(surv, 6) AS survival FROM s WHERE e > 0 ORDER BY day"
)


def q_nation_revenue_trend(sf_dir: str) -> pd.DataFrame:
    """Per-group OLS trend: slope and intercept of daily revenue vs epoch-day
    for each customer nation — the grouped sibling of q_price_qty_regression
    (grouped regr_slope/regr_intercept, which Ray Data has no native
    aggregate for). Orders map to nations via the broadcast dim join (J2);
    the fact folds to a (nation × day) rollup — calendar-bounded, like
    every daily series here — and the per-nation closed-form normal
    equations run on that result-sized table."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    cust = _dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nk = nation.column("n_nationkey").to_numpy()
    order = np.argsort(nk)
    names = nation.column("n_name").take(pa.array(order))
    pos = np.searchsorted(nk[order], cust.column("c_nationkey").to_numpy())
    dim = pa.table(
        {"o_custkey": cust["c_custkey"], "n_name": names.take(pa.array(pos, pa.int64()))}
    )
    ds = _tbl(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    joined = broadcast_join(ds, dim, "o_custkey", ["n_name"])

    def f(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor(pc.divide(pc.cast(b["o_orderdate"], pa.int64()), 86_400_000_000)), pa.int64())
        t = pa.table({"n_name": b["n_name"], "day": day, "rev": b["o_totalprice"]})
        return _partial(t, ["n_name", "day"], [("rev", "sum")])

    daily = (
        joined.map_batches(f, batch_format="pyarrow")
        .groupby(["n_name", "day"])
        .aggregate(Sum("rev_sum", alias_name="rev"))
        .to_pandas()
    )

    def ols(g: pd.DataFrame) -> pd.Series:
        x = g["day"].to_numpy(dtype=np.float64)
        y = g["rev"].to_numpy(dtype=np.float64)
        n = len(x)
        sx, sy = x.sum(), y.sum()
        sxx, sxy = (x * x).sum(), (x * y).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return pd.Series(
            {
                "slope": round(slope, 6),
                "intercept": round((sy - slope * sx) / n, 4),
                "n_days": np.int64(n),
            }
        )

    out = daily.groupby("n_name").apply(ols, include_groups=False).reset_index()
    return out.sort_values("n_name").reset_index(drop=True).astype({"n_days": "int64"})


QUERIES["nation_revenue_trend"] = q_nation_revenue_trend
ORACLE_SQL["nation_revenue_trend"] = (
    "WITH d AS (SELECT n_name, FLOOR(EPOCH(o_orderdate) / 86400)::DOUBLE AS day,"
    "  SUM(o_totalprice) AS rev FROM orders"
    "  JOIN customer ON o_custkey = c_custkey"
    "  JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2)"
    " SELECT n_name, ROUND(REGR_SLOPE(rev, day), 6) AS slope,"
    "  ROUND(REGR_INTERCEPT(rev, day), 4) AS intercept,"
    "  COUNT(*)::BIGINT AS n_days FROM d GROUP BY 1 ORDER BY 1"
)


def q_top_bigram_docs(sf_dir: str) -> pd.DataFrame:
    """PHRASE SEARCH seeded by corpus statistics: find the single most
    frequent adjacent-token bigram (freq desc, lex asc — the top_bigrams
    fold), then a second streaming scan returns how many documents contain
    it as an exact phrase plus the 10 smallest matching doc_ids. Both scans
    are per-batch vectorized (polars contains on space-padded text — token
    adjacency ⟺ padded substring for single-space corpora); the phrase
    rides the closure (one string). The doc-id head folds as a per-batch
    partial top-k, the same distributed-limit shape as orders_topk_price."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def bigram_counts(b: pa.Table) -> pa.Table:
        toks = [t.split() for t in b["text"].to_pylist()]
        pairs = [
            " ".join(p)
            for ts in toks
            for p in zip(ts, ts[1:])
        ]
        vc = pd.Series(pairs, dtype=object).value_counts()
        return pa.table(
            {
                "bigram": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    bi = (
        ds.map_batches(bigram_counts, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "bigram"], ascending=[False, True], kind="stable")
    )
    phrase = str(bi["bigram"].iloc[0])

    def match_f(b: pa.Table, _p=phrase) -> pa.Table:
        import polars as pl

        txt = pl.from_arrow(b["text"])
        hit = (" " + txt + " ").str.contains(" " + _p + " ", literal=True).to_numpy()
        ids = b["doc_id"].to_numpy()[hit]
        ids.sort()
        # batch hit total rides the FIRST row only (summable partial)
        cnt = np.zeros(min(len(ids), 10), np.int64)
        if len(cnt):
            cnt[0] = int(hit.sum())
        return pa.table({"doc_id": pa.array(ids[:10]), "n_sub": pa.array(cnt)})

    m = ds.map_batches(match_f, batch_format="pyarrow").to_pandas()
    n_docs = int(m["n_sub"].sum()) if len(m) else 0
    ids = np.sort(m["doc_id"].to_numpy())[:10]
    return pd.DataFrame(
        {
            "bigram": [phrase] * len(ids),
            "n_docs": np.full(len(ids), n_docs, np.int64),
            "doc_id": ids.astype(np.int64),
        }
    )


QUERIES["top_bigram_docs"] = q_top_bigram_docs
ORACLE_SQL["top_bigram_docs"] = (
    "WITH toks AS (SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents),"
    " bi AS (SELECT t[i] || ' ' || t[i+1] AS bigram"
    "  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)),"
    " top1 AS (SELECT bigram FROM bi GROUP BY 1"
    "  ORDER BY COUNT(*) DESC, bigram LIMIT 1),"
    " hits AS (SELECT doc_id FROM documents, top1"
    "  WHERE ' ' || text || ' ' LIKE '% ' || bigram || ' %'),"
    " n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM hits)"
    " SELECT top1.bigram, n.n_docs, doc_id FROM hits, top1, n"
    " ORDER BY doc_id LIMIT 10"
)


def q_ab_cuped(sf_dir: str) -> pd.DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM'13 — public
    formulation): outcome y = a user's purchase value in the experiment
    window (second half of the observed month), covariate x = the same
    metric in the pre-period (first half); variant = user_id parity.
    θ = cov(x,y)/var(x) is estimated POOLED, and each variant reports its
    raw and adjusted mean (y − θ·(x − x̄)). Distributed shape: the per-user
    (x, y) rollup is ONE keyed groupby of per-batch partials; the five
    scalar moments and the 2-row variant rollup fold per batch after it —
    nothing user-sized reaches the driver."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])
    mid = np.datetime64("2024-01-16T00:00:00")

    def xy_f(b: pa.Table) -> pa.Table:
        isp = pc.equal(b["event_type"], "purchase").to_numpy(zero_copy_only=False)
        ts = b["ts"].to_numpy()
        v = b["value"].to_numpy() * isp
        pre = ts < mid
        t = pa.table(
            {
                "user_id": b["user_id"],
                "x": pa.array(np.where(pre, v, 0.0)),
                "y": pa.array(np.where(~pre, v, 0.0)),
            }
        )
        return _partial(t, ["user_id"], [("x", "sum"), ("y", "sum")])

    per_user = (
        ds.map_batches(xy_f, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("x_sum", alias_name="x"), Sum("y_sum", alias_name="y"))
    )

    def mom_f(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy()
        y = b["y"].to_numpy()
        var = (b["user_id"].to_numpy() % 2).astype(np.int64)
        t = pa.table(
            {
                "variant": pa.array(var),
                "one": pa.array(np.ones(len(x), np.int64)),
                "x": pa.array(x),
                "y": pa.array(y),
                "xx": pa.array(x * x),
                "xy": pa.array(x * y),
            }
        )
        return _partial(
            t,
            ["variant"],
            [("one", "sum"), ("x", "sum"), ("y", "sum"), ("xx", "sum"), ("xy", "sum")],
        )

    s = (
        _coalesce_partials(per_user.map_batches(mom_f, batch_format="pyarrow"))
        .groupby("variant")
        .aggregate(
            Sum("one_sum", alias_name="n_users"),
            Sum("x_sum", alias_name="sx"),
            Sum("y_sum", alias_name="sy"),
            Sum("xx_sum", alias_name="sxx"),
            Sum("xy_sum", alias_name="sxy"),
        )
        .to_pandas()
        .sort_values("variant")
        .reset_index(drop=True)
    )
    n = float(s["n_users"].sum())
    sx, sy = float(s["sx"].sum()), float(s["sy"].sum())
    sxx, sxy = float(s["sxx"].sum()), float(s["sxy"].sum())
    theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    xbar = sx / n
    s["mean_y"] = (s["sy"] / s["n_users"]).round(6)
    s["mean_adj"] = (
        s["sy"] / s["n_users"] - theta * (s["sx"] / s["n_users"] - xbar)
    ).round(6)
    s["theta"] = round(float(theta), 6)
    return s[["variant", "n_users", "mean_y", "mean_adj", "theta"]].astype(
        {"variant": "int64", "n_users": "int64"}
    )


QUERIES["ab_cuped"] = q_ab_cuped
ORACLE_SQL["ab_cuped"] = (
    "WITH u AS (SELECT user_id, (user_id % 2)::BIGINT AS variant,"
    "  SUM(CASE WHEN event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16'"
    "   THEN value ELSE 0 END) AS x,"
    "  SUM(CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16'"
    "   THEN value ELSE 0 END) AS y FROM events GROUP BY 1, 2),"
    " g AS (SELECT COVAR_POP(x, y) / VAR_POP(x) AS theta, AVG(x) AS xbar FROM u)"
    " SELECT variant, COUNT(*)::BIGINT AS n_users, ROUND(AVG(y), 6) AS mean_y,"
    "  ROUND(AVG(y) - ANY_VALUE(g.theta) * (AVG(x) - ANY_VALUE(g.xbar)), 6) AS mean_adj,"
    "  ROUND(ANY_VALUE(g.theta), 6) AS theta"
    " FROM u CROSS JOIN g GROUP BY variant ORDER BY variant"
)


# ----------------- wave 33 (round 5): split assignment / incremental -------
# ----------------- maintenance / isotonic regression ------------------------


def q_docs_split_assign(sf_dir: str) -> pd.DataFrame:
    """Deterministic hash-based train/val/test split (80/10/10) with
    per-source stratification counts — the reproducible-split primitive a
    training pipeline needs (row identity, not position, decides the split:
    stable under resharding, re-runs and engine changes). Bucket =
    int(md5(doc_id)[:8 hex], 16) % 100, chosen over a cheap 64-bit mix
    because it is bit-identical across engines (the DuckDB oracle recomputes
    it in SQL). Per-batch C-speed md5 + one (source, split)-bounded
    groupby of partials; no per-doc rows reach the driver."""
    import hashlib

    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "source"])
    names = np.array(["train", "val", "test"], dtype=object)

    def split_f(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        buck = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4], "big") % 100
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        split = names[(buck >= 80).astype(np.int64) + (buck >= 90)]
        t = pa.table(
            {
                "source": b["source"],
                "split": pa.array(split, pa.string()),
                "one": pa.array(np.ones(len(ids), np.int64)),
            }
        )
        return _partial(t, ["source", "split"], [("one", "sum")])

    out = (
        _coalesce_partials(ds.map_batches(split_f, batch_format="pyarrow"))
        .groupby(["source", "split"])
        .aggregate(Sum("one_sum", alias_name="n"))
        .to_pandas()
        .sort_values(["source", "split"])
        .reset_index(drop=True)
    )
    return out.astype({"n": "int64"})


QUERIES["docs_split_assign"] = q_docs_split_assign
ORACLE_SQL["docs_split_assign"] = (
    "WITH b AS (SELECT source,"
    "  ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bk"
    "  FROM documents)"
    " SELECT source, CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'"
    "  ELSE 'test' END AS split, COUNT(*)::BIGINT AS n"
    " FROM b GROUP BY 1, 2 ORDER BY 1, 2"
)


def q_events_incremental_daily(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL AGGREGATE MAINTENANCE: daily (events, revenue, users-HLL
    is overkill here — count) rollups where the closed base period
    (ts < 2024-01-21) folds ONCE into a persisted partial-aggregate manifest
    (partitioned parquet under /tmp, atomic rename commit — the same
    manifest discipline as the lance sink) and every subsequent run scans
    ONLY the open delta partition (predicate pushed to the parquet read) and
    merges calendar-bounded partials. At 100 TB this is the difference
    between reprocessing history daily and touching just the open day;
    correctness gate: result ≡ the full-scan oracle, cold or warm."""
    import hashlib as _h

    from ray.data.aggregate import Sum

    cutoff = np.datetime64("2024-01-21T00:00:00")
    tag = _h.md5(f"incr-daily|{os.path.abspath(sf_dir)}".encode()).hexdigest()[:12]
    base_dir = f"/tmp/ieps_crawler_ray/incr-{tag}"

    def day_fold(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["ts"], format="%Y-%m-%d")
        t = pa.table(
            {
                "day": day,
                "one": pa.array(np.ones(b.num_rows, np.int64)),
                "rev": b["value"],
            }
        )
        return _partial(t, ["day"], [("one", "sum"), ("rev", "sum")])

    def folded(ds):
        return (
            _coalesce_partials(ds.map_batches(day_fold, batch_format="pyarrow"))
            .groupby("day")
            .aggregate(
                Sum("one_sum", alias_name="n_events"),
                Sum("rev_sum", alias_name="revenue"),
            )
            .to_pandas()
        )

    import pyarrow.dataset as pads

    if not os.path.isdir(base_dir):  # cold: fold the closed period once
        base = folded(
            _tbl(
                sf_dir,
                "events",
                columns=["ts", "value"],
                filter=pads.field("ts") < pa.scalar(cutoff.item()),
            )
        )
        tmp = base_dir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(base, preserve_index=False), f"{tmp}/base.parquet")
        os.replace(tmp, base_dir)  # atomic manifest commit
    base = pq.read_table(f"{base_dir}/base.parquet").to_pandas()

    delta = folded(
        _tbl(
            sf_dir,
            "events",
            columns=["ts", "value"],
            filter=pads.field("ts") >= pa.scalar(cutoff.item()),
        )
    )
    out = (
        pd.concat([base, delta])
        .groupby("day", as_index=False)
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["revenue"] = out["revenue"].round(4)
    return out.astype({"n_events": "int64"})


QUERIES["events_incremental_daily"] = q_events_incremental_daily
ORACLE_SQL["events_incremental_daily"] = (
    "SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*)::BIGINT AS n_events,"
    " ROUND(SUM(value), 4) AS revenue FROM events GROUP BY 1 ORDER BY 1"
)


def q_discount_isotonic(sf_dir: str) -> pd.DataFrame:
    """Isotonic regression (PAVA, pool-adjacent-violators) of mean extended
    price against discount level — the monotone-calibration primitive
    (price should not increase with discount; PAVA finds the least-squares
    nondecreasing fit of the REVERSED order). The discount domain is
    bounded (≤ 11 levels), so the distributed part is one (discount)-keyed
    fold of (n, Σprice) partials; PAVA runs on the result-sized table.
    Not SQL-expressible (iterative pooling): golden-pinned + independent
    PAVA recompute and monotonicity/weighted-mean invariants in
    tests/test_round5.py."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "lineitem", columns=["l_discount", "l_extendedprice"])
    cells = (
        _coalesce_partials(
            ds.map_batches(
                lambda b: _partial(
                    pa.table(
                        {
                            "l_discount": b["l_discount"],
                            "one": pa.array(np.ones(b.num_rows, np.int64)),
                            "p": b["l_extendedprice"],
                        }
                    ),
                    ["l_discount"],
                    [("one", "sum"), ("p", "sum")],
                ),
                batch_format="pyarrow",
            )
        )
        .groupby("l_discount")
        .aggregate(Sum("one_sum", alias_name="n"), Sum("p_sum", alias_name="s"))
        .to_pandas()
        .sort_values("l_discount")
        .reset_index(drop=True)
    )
    w = cells["n"].to_numpy(dtype=np.float64)
    y = (cells["s"] / cells["n"]).to_numpy(dtype=np.float64)
    # fit NONINCREASING in discount = nondecreasing on the reversed axis
    iso = _pava(y[::-1], w[::-1])[::-1]
    return pd.DataFrame(
        {
            "l_discount": cells["l_discount"],
            "n": cells["n"].astype(np.int64),
            "mean_price": np.round(y, 4),
            "iso_price": np.round(iso, 4),
        }
    )


def _pava(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators: least-squares nondecreasing fit (public
    textbook algorithm; stack-based O(n))."""
    means, wts, sizes = [], [], []
    for yi, wi in zip(y, w):
        means.append(float(yi))
        wts.append(float(wi))
        sizes.append(1)
        while len(means) > 1 and means[-2] > means[-1]:
            m2, w2, s2 = means.pop(), wts.pop(), sizes.pop()
            means[-1] = (means[-1] * wts[-1] + m2 * w2) / (wts[-1] + w2)
            wts[-1] += w2
            sizes[-1] += s2
    return np.repeat(means, sizes)


QUERIES["discount_isotonic"] = q_discount_isotonic


# ----------------- wave 34 (round 5): change-point / novelty / textrank ----


def q_events_change_point(sf_dir: str) -> pd.DataFrame:
    """CUSUM change-point detection on the daily event-count series — the
    level-shift monitor a pipeline-health dashboard runs over ingest
    volumes. The fact folds to the calendar-bounded daily table (per-batch
    partials → one keyed groupby); the cumulative-deviation scan and the
    argmax |S_k| pick (tie → earliest day; break falls AFTER the picked
    day) run driver-side on the result-sized series, with the before/after
    level means reported for the picked break."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["ts"])

    def f(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["ts"], format="%Y-%m-%d")
        t = pa.table({"day": day, "one": pa.array(np.ones(b.num_rows, np.int64))})
        return _partial(t, ["day"], [("one", "sum")])

    d = (
        _coalesce_partials(ds.map_batches(f, batch_format="pyarrow"))
        .groupby("day")
        .aggregate(Sum("one_sum", alias_name="n"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    n = d["n"].to_numpy(dtype=np.float64)
    s = np.cumsum(n - n.mean())
    k = int(np.lexsort((np.arange(len(s)), -np.abs(s)))[0])
    return pd.DataFrame(
        [
            {
                "change_day": d["day"].iloc[k],
                "cusum": round(float(s[k]), 6),
                "mean_before": round(float(n[: k + 1].mean()), 6),
                "mean_after": round(float(n[k + 1 :].mean()), 6),
            }
        ]
    )


QUERIES["events_change_point"] = q_events_change_point
ORACLE_SQL["events_change_point"] = (
    "WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*)::DOUBLE AS n"
    "  FROM events GROUP BY 1),"
    " c AS (SELECT day, SUM(n - (SELECT AVG(n) FROM d)) OVER (ORDER BY day) AS s"
    "  FROM d),"
    " pick AS (SELECT day AS cp, s FROM c ORDER BY ABS(s) DESC, day LIMIT 1)"
    " SELECT pick.cp AS change_day, ROUND(pick.s, 6) AS cusum,"
    "  ROUND(AVG(n) FILTER (day <= pick.cp), 6) AS mean_before,"
    "  ROUND(AVG(n) FILTER (day > pick.cp), 6) AS mean_after"
    " FROM d CROSS JOIN pick GROUP BY pick.cp, pick.s"
)


def q_doc_ngram_novelty(sf_dir: str) -> pd.DataFrame:
    """N-GRAM NOVELTY scoring by source: for each document, the fraction of
    its distinct 8-token shingles that no SMALLER doc_id contains — the
    freshness signal a crawl-scheduling / corpus-growth monitor reads
    (near-1 means new material, near-0 means the source is re-serving known
    text). Two keyed shuffles, both vocabulary/gram-bounded: (1) distinct
    (gram, doc_id, source) rows group by GRAM and each group marks its
    min-doc_id owner (per-group segmented numpy, no pairs), (2) the
    (doc_id, novel, total) partials fold per DOC, then to the (source)-
    bounded rollup: avg novelty and the count of fully-novel docs. Docs
    shorter than 8 tokens carry no grams and are excluded (both sides)."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text", "source"])

    # source domain is bounded: dictionary-encode it ONCE (tiny distinct
    # fold) so every shuffled row carries an int8-sized id, the per-gram
    # group blocks stay all-integer Arrow (a pandas object column here made
    # the doc-keyed sort groupby 8× slower), and the final rollup maps back.
    srcs = sorted(
        _coalesce_partials(
            ds.map_batches(
                lambda b: _partial(b.select(["source"]), ["source"], [([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby("source")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()["source"]
        .tolist()
    )
    sid = {s: i for i, s in enumerate(srcs)}

    # gram identity = a 64-bit position-weighted combination of the 8 token
    # hashes (distinct odd multipliers per offset) — collision odds are
    # ~(n_grams)²/2⁶⁴, negligible, and 8-byte ints keep BOTH shuffles ~7×
    # narrower than shipping gram strings (measured 20.4 s → ~4 s at sf0.1).
    _GC = np.array(
        [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
         0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0x2545F4914F6CDD1D,
         0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53],
        dtype=np.uint64,
    )

    def grams_f(b: pa.Table) -> pa.Table:
        import polars as pl

        toks = pl.from_arrow(b["text"]).str.split(" ")
        lens = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode()
        th = hashing.hash64(flat).astype(np.uint64)
        didx = np.repeat(np.arange(len(lens)), lens)
        if len(th) < 8:
            return pa.table(
                {"gh": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "source": pa.array([], pa.string())}
            )
        m = len(th) - 7
        with np.errstate(over="ignore"):
            gh = np.zeros(m, dtype=np.uint64)
            for k in range(8):
                gh += th[k : k + m] * _GC[k]
        valid = didx[:m] == didx[7:]  # window stays inside one doc
        gh, gdoc = gh[valid], didx[:m][valid]
        # distinct (doc, gram): sort by (doc, gh) once, drop adjacent dups
        order = np.lexsort((gh, gdoc))
        gh, gdoc = gh[order], gdoc[order]
        keep = np.r_[True, (gh[1:] != gh[:-1]) | (gdoc[1:] != gdoc[:-1])]
        gh, gdoc = gh[keep], gdoc[keep]
        src_ids = np.array(
            [sid[s] for s in b["source"].to_pylist()], dtype=np.int64
        )
        return pa.table(
            {
                "gh": pa.array(gh.view(np.int64)),
                "doc_id": b["doc_id"].take(pa.array(gdoc)),
                "sid": pa.array(src_ids[gdoc]),
            }
        )

    def mark_f(g: pd.DataFrame) -> pa.Table:
        # rows of ONE gram bucket; vectorized per-gram min over the segment;
        # all-integer Arrow out so downstream blocks never go object-dtype
        mn = g.groupby("gh")["doc_id"].transform("min")
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy()),
                "sid": pa.array(g["sid"].to_numpy()),
                "novel": pa.array((g["doc_id"] == mn).to_numpy().astype(np.int64)),
                "one": pa.array(np.ones(len(g), np.int64)),
            }
        )

    def gb_key(b: pa.Table) -> pa.Table:
        gb = (b["gh"].to_numpy() & 255).astype(np.int64)
        return b.append_column("gb", pa.array(gb))

    def src_f(b: pa.Table) -> pa.Table:
        nov = b["n_novel"].to_numpy().astype(np.float64)
        tot = b["n_grams"].to_numpy().astype(np.float64)
        t = pa.table(
            {
                "sid": b["sid"],
                "one": pa.array(np.ones(len(nov), np.int64)),
                "nv": pa.array(nov / tot),
                "full": pa.array((nov == tot).astype(np.int64)),
            }
        )
        return _partial(t, ["sid"], [("one", "sum"), ("nv", "sum"), ("full", "sum")])

    # re-attach source id per doc via Max (sid is functionally dependent on
    # doc_id, so Max == the value)
    from ray.data.aggregate import Max

    per_doc_src = (
        ds.map_batches(grams_f, batch_format="pyarrow")
        .map_batches(gb_key, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(mark_f, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("novel", alias_name="n_novel"),
            Sum("one", alias_name="n_grams"),
            Max("sid", alias_name="sid"),
        )
    )
    out = (
        _coalesce_partials(per_doc_src.map_batches(src_f, batch_format="pyarrow"))
        .groupby("sid")
        .aggregate(
            Sum("one_sum", alias_name="n_docs"),
            Sum("nv_sum", alias_name="nv"),
            Sum("full_sum", alias_name="n_fully_novel"),
        )
        .to_pandas()
        .sort_values("sid")
        .reset_index(drop=True)
    )
    out["source"] = [srcs[int(i)] for i in out["sid"]]
    out["avg_novelty"] = (out["nv"] / out["n_docs"]).round(6)
    return out[["source", "n_docs", "avg_novelty", "n_fully_novel"]].astype(
        {"n_docs": "int64", "n_fully_novel": "int64"}
    )


QUERIES["doc_ngram_novelty"] = q_doc_ngram_novelty
ORACLE_SQL["doc_ngram_novelty"] = (
    "WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),"
    " g AS (SELECT DISTINCT doc_id, source, array_to_string(t[i:i+7], ' ') AS gram"
    "  FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)),"
    " m AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY 1),"
    " nov AS (SELECT g.doc_id, ANY_VALUE(g.source) AS source,"
    "   SUM(CASE WHEN m.first_doc = g.doc_id THEN 1 ELSE 0 END) AS nn,"
    "   COUNT(*) AS ng FROM g JOIN m USING (gram) GROUP BY 1)"
    " SELECT source, COUNT(*)::BIGINT AS n_docs,"
    "  ROUND(AVG(nn::DOUBLE / ng), 6) AS avg_novelty,"
    "  SUM(CASE WHEN nn = ng THEN 1 ELSE 0 END)::BIGINT AS n_fully_novel"
    " FROM nov GROUP BY 1 ORDER BY 1"
)


def q_textrank_keywords(sf_dir: str) -> pd.DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau '04, public
    formulation): PageRank with damping 0.85 over the undirected
    adjacent-token co-occurrence graph, 30 iterations, scores rounded to 8.
    Distributed part = the SAME bigram-count fold as pmi_bigrams (per-batch
    distinct pairs shuffle); the rank iteration runs driver-side on the
    VOCABULARY-bounded sparse edge list (at web scale this becomes the
    per-iteration broadcast-ranks plan documented on host_pagerank — the
    edge table is already the Dataset this path folds from). Top-10 terms
    (score desc, term asc). No SQL oracle (iterative); golden-pinned +
    independent dense recompute in tests/test_round5.py."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["text"])

    def pair_counts(b: pa.Table) -> pa.Table:
        cnt: dict[tuple, int] = {}
        for txt in b["text"].to_pylist():
            t = txt.split()
            for a_, b_ in zip(t, t[1:]):
                k = (a_, b_) if a_ <= b_ else (b_, a_)
                cnt[k] = cnt.get(k, 0) + 1
        if not cnt:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ks = list(cnt)
        return pa.table(
            {
                "w1": pa.array([k[0] for k in ks], pa.string()),
                "w2": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    edges = (
        ds.map_batches(pair_counts, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # vocabulary-bounded
    )
    # drop self-loops (repeated token); symmetrize
    edges = edges[edges["w1"] != edges["w2"]]
    vocab = pd.Index(
        pd.unique(pd.concat([edges["w1"], edges["w2"]], ignore_index=True))
    ).sort_values()
    idx = {w: i for i, w in enumerate(vocab)}
    a = edges["w1"].map(idx).to_numpy()
    b = edges["w2"].map(idx).to_numpy()
    w = edges["n"].to_numpy(dtype=np.float64)
    nv = len(vocab)
    deg = np.zeros(nv)
    np.add.at(deg, a, w)
    np.add.at(deg, b, w)
    r = np.full(nv, 1.0 / nv)
    d = 0.85
    for _ in range(30):
        contrib = np.zeros(nv)
        np.add.at(contrib, b, w * r[a] / deg[a])
        np.add.at(contrib, a, w * r[b] / deg[b])
        r = (1 - d) / nv + d * contrib
    out = pd.DataFrame({"term": vocab.to_numpy(), "score": np.round(r, 8)})
    return (
        out.sort_values(["score", "term"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


QUERIES["textrank_keywords"] = q_textrank_keywords


# ----------------- wave 35 (round 5): skew report / markov eval / BPE ------


def q_events_user_skew(sf_dir: str) -> pd.DataFrame:
    """Activity-skew report over users — the hot-key diagnostic a pipeline
    operator reads before choosing salting/bucketing (SCALE.md "skew"):
    p50/p99 per-user event counts (PERCENTILE_DISC semantics), the top-1
    user's share of all events, and the Gini of activity. One user-keyed
    fold, then everything reduces through the COUNT-DOMAIN table (count
    value → #users, bounded by max events/user — the bounded-domain trick
    of value_buckets): quantiles walk its cumsum, Gini folds per tie-run
    with the (2i−n−1) rank identity (tie-invariant), nothing user-sized
    reaches the driver."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["user_id"])
    per_user = (
        ds.map_batches(
            lambda b: _partial(b, ["user_id"], [([], "count_all")]),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .aggregate(Sum("count_all", alias_name="c"))
    )
    dom = (
        _coalesce_partials(
            per_user.map_batches(
                lambda b: _partial(b.select(["c"]), ["c"], [([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby("c")
        .aggregate(Sum("count_all", alias_name="m"))
        .to_pandas()
        .sort_values("c")
        .reset_index(drop=True)
    )
    c = dom["c"].to_numpy(dtype=np.float64)
    m = dom["m"].to_numpy(dtype=np.float64)
    n = float(m.sum())
    cum = np.cumsum(m)

    def pdisc(q: float) -> int:
        k = int(np.ceil(q * n))  # 1-based rank, PERCENTILE_DISC semantics
        return int(c[int(np.searchsorted(cum, max(k, 1)))])

    tot = float((c * m).sum())
    # Gini via Σ(2i−n−1)·x_i over users sorted by count; a tie run of m_j
    # users at count c_j occupies ranks (s_j, s_j+m_j]:
    s = cum - m  # exclusive run starts
    run_rank_sum = m * (2 * s + m + 1) - m * n - m  # Σ(2i−n−1) within run
    gini = float((c * run_rank_sum).sum()) / (n * tot)
    return pd.DataFrame(
        [
            {
                "n_users": np.int64(int(n)),
                "p50_events": np.int64(pdisc(0.5)),
                "p99_events": np.int64(pdisc(0.99)),
                "top_share": round(float(c[-1] / tot), 6),
                "gini": round(gini, 6),
            }
        ]
    )


QUERIES["events_user_skew"] = q_events_user_skew
ORACLE_SQL["events_user_skew"] = (
    "WITH u AS (SELECT user_id, COUNT(*)::DOUBLE AS c FROM events GROUP BY 1),"
    " r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS i,"
    "   COUNT(*) OVER () AS n, SUM(c) OVER () AS tot FROM u)"
    " SELECT ANY_VALUE(n)::BIGINT AS n_users,"
    "  PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY c)::BIGINT AS p50_events,"
    "  PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY c)::BIGINT AS p99_events,"
    "  ROUND(MAX(c) / ANY_VALUE(tot), 6) AS top_share,"
    "  ROUND(SUM((2 * i - n - 1) * c) / (ANY_VALUE(n) * ANY_VALUE(tot)), 6) AS gini"
    " FROM r"
)


def q_markov_next_accuracy(sf_dir: str) -> pd.DataFrame:
    """Next-event prediction EVALUATION for the first-order Markov model:
    predicted next type = argmax transition count from each prev type (tie →
    lexicographically smallest), hit rate = the probability mass that
    prediction captures. Because accuracy over all consecutive pairs
    decomposes as Σ_prev count(prev, argmax)/Σ count, the whole evaluation
    folds through the SAME 25-cell transition table as q_markov_transitions
    — no second scoring pass over the data. Per-prev rows + hit rate."""
    trans = q_markov_transitions(sf_dir).to_pandas()
    trans = trans.sort_values(
        ["prev_type", "n", "next_type"], ascending=[True, False, True], kind="stable"
    )
    best = trans.groupby("prev_type", as_index=False).first()
    tot = trans.groupby("prev_type", as_index=False)["n"].sum().rename(columns={"n": "n_pairs"})
    out = best.merge(tot, on="prev_type")
    out["hit_rate"] = (out["n"] / out["n_pairs"]).round(6)
    out = out.rename(columns={"next_type": "predicted_next"})
    return (
        out[["prev_type", "predicted_next", "n_pairs", "hit_rate"]]
        .sort_values("prev_type")
        .reset_index(drop=True)
        .astype({"n_pairs": "int64"})
    )


QUERIES["markov_next_accuracy"] = q_markov_next_accuracy
ORACLE_SQL["markov_next_accuracy"] = (
    "WITH p AS (SELECT event_type AS prev_type,"
    "  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type"
    "  FROM events),"
    " t AS (SELECT prev_type, next_type, COUNT(*)::BIGINT AS n FROM p"
    "  WHERE next_type IS NOT NULL GROUP BY 1, 2),"
    " r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY prev_type"
    "   ORDER BY n DESC, next_type) AS rn,"
    "  SUM(n) OVER (PARTITION BY prev_type) AS n_pairs FROM t)"
    " SELECT prev_type, next_type AS predicted_next, n_pairs::BIGINT AS n_pairs,"
    "  ROUND(n::DOUBLE / n_pairs, 6) AS hit_rate FROM r WHERE rn = 1"
    " ORDER BY prev_type"
)


def q_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """ITERATIVE BPE vocabulary induction (Sennrich et al. '16, public
    formulation): 5 merge rounds, each = one distributed pair-count fold
    over the current symbol sequences + a driver-side merge pick (count
    desc, pair lex asc — deterministic). Round r re-derives symbols by
    applying the ≤ r-entry merge list inside map_batches (stateless
    recompute — no corpus-sized intermediate is ever materialized between
    rounds; the merge list broadcasts in the closure). Pair counting and
    greedy left-to-right merge application are numpy over flattened
    int-symbol arrays with token-boundary masks — the overlap rule (aaa +
    (a,a) → (aa),a) is reproduced by keeping every other position inside
    each run of consecutive matches. The shuffle each round moves per-batch
    DISTINCT (pair, n) partials, vocabulary²-bounded. Not SQL-expressible
    (iterative); golden-pinned + pure-python reference BPE recompute in
    tests/test_round5.py."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "documents", columns=["text"])
    merges: list[tuple[int, int, int]] = []  # (a, b, new_id); new ids ≥ 256

    def symbols(texts: list[str], _merges) -> tuple[np.ndarray, np.ndarray]:
        """Flattened symbol array + boundary mask (True = pair (i, i+1) spans
        a token boundary) after applying the merge list in order."""
        buf = " ".join(texts).encode("ascii", "replace")
        s = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
        for a_, b_, nid in _merges:
            if len(s) < 2:
                break
            m = (s[:-1] == a_) & (s[1:] == b_) & (s[:-1] != 32) & (s[1:] != 32)
            if not m.any():
                continue
            # greedy left-to-right: inside each run of consecutive matches,
            # keep every other match starting from the run head
            idx = np.flatnonzero(m)
            run_start = np.r_[True, np.diff(idx) != 1]
            run_id = np.cumsum(run_start) - 1
            starts = idx[run_start]
            keep = idx[(idx - starts[run_id]) % 2 == 0]
            s[keep] = nid
            s = np.delete(s, keep + 1)
        return s

    def pair_counts(b: pa.Table, _merges=tuple(merges)) -> pa.Table:
        s = symbols(b["text"].to_pylist(), _merges)
        if len(s) < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        ok = (s[:-1] != 32) & (s[1:] != 32)
        key = s[:-1][ok] << 20 | s[1:][ok]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "a": pa.array(uk >> 20),
                "b": pa.array(uk & ((1 << 20) - 1)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    rows = []
    for r in range(5):
        frozen = tuple(merges)
        cnt = (
            ds.map_batches(
                lambda b, _m=frozen: pair_counts(b, _m), batch_format="pyarrow"
            )
            .groupby(["a", "b"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
            .sort_values(["n", "a", "b"], ascending=[False, True, True], kind="stable")
        )
        a_, b_, n_ = int(cnt["a"].iloc[0]), int(cnt["b"].iloc[0]), int(cnt["n"].iloc[0])
        nid = 256 + r
        merges.append((a_, b_, nid))
        rows.append({"round": r, "pair_a": a_, "pair_b": b_, "n": n_, "new_id": nid})
    return pd.DataFrame(rows).astype(
        {"round": "int64", "pair_a": "int64", "pair_b": "int64", "n": "int64", "new_id": "int64"}
    )


QUERIES["bpe_merges"] = q_bpe_merges


# ----------------- wave 36 (round 5): Poisson bootstrap / ANN eval / -------
# ----------------- bounce rate ----------------------------------------------


def q_revenue_bootstrap_ci(sf_dir: str) -> pd.DataFrame:
    """POISSON BOOTSTRAP confidence interval for mean order price — the
    standard single-pass distributed bootstrap (Chamandy et al., 'Estimating
    Uncertainty for Massive Data Streams', public formulation): classical
    resampling needs the row count up front and a shared sample index, but
    giving each row an INDEPENDENT Poisson(1) weight per replicate
    reproduces the multinomial bootstrap to O(1/n) and folds as plain
    mergeable partials (Σw·x, Σw per replicate). Weights are DETERMINISTIC:
    a splitmix64 of (o_orderkey, replicate) inverts to a uniform that walks
    the Poisson CDF — so the result is seed-stable across engines, batch
    sizes and cluster shapes. B = 200 replicates; the driver sees a B×2
    partial table and reports the percentile CI (2.5/97.5). Not
    SQL-expressible (hash-seeded resampling); golden-pinned + an
    independent numpy recompute and a coverage sanity gate in
    tests/test_round5.py."""
    B = 200

    ds = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    # Poisson(1) CDF steps, enough mass for k ≤ 8 (P(k>8) < 1e-6)
    import math as _math

    _CDF = np.cumsum([np.exp(-1.0) / _math.factorial(k) for k in range(9)])

    def boot(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].to_numpy().astype(np.uint64)
        x = b["o_totalprice"].to_numpy()
        sw = np.zeros(B)
        swx = np.zeros(B)
        with np.errstate(over="ignore"):
            for r in range(B):
                z = keys * np.uint64(0x9E3779B97F4A7C15) + np.uint64(
                    (r * 0xC2B2AE3D27D4EB4F) % 2**64
                )
                z ^= z >> np.uint64(30)
                z *= np.uint64(0xBF58476D1CE4E5B9)
                z ^= z >> np.uint64(27)
                z *= np.uint64(0x94D049BB133111EB)
                z ^= z >> np.uint64(31)
                u = z.astype(np.float64) / float(2**64)
                w = np.searchsorted(_CDF, u).astype(np.float64)
                sw[r] = w.sum()
                swx[r] = (w * x).sum()
        return pa.table(
            {
                "r": pa.array(np.arange(B, dtype=np.int64)),
                "sw": pa.array(sw),
                "swx": pa.array(swx),
            }
        )

    from ray.data.aggregate import Sum

    reps = (
        _coalesce_partials(ds.map_batches(boot, batch_format="pyarrow"))
        .groupby("r")
        .aggregate(Sum("sw", alias_name="sw"), Sum("swx", alias_name="swx"))
        .to_pandas()
    )
    means = (reps["swx"] / reps["sw"]).to_numpy()
    means.sort()
    lo = float(means[int(np.floor(0.025 * (B - 1)))])
    hi = float(means[int(np.ceil(0.975 * (B - 1)))])
    agg = ds.aggregate(
        Sum("o_totalprice", alias_name="s"),
    )
    n = ds.count()
    mean = float(agg["s"]) / n
    return pd.DataFrame(
        [
            {
                "mean_price": round(mean, 4),
                "ci_lo": round(lo, 4),
                "ci_hi": round(hi, 4),
                "n_replicates": np.int64(B),
            }
        ]
    )


QUERIES["revenue_bootstrap_ci"] = q_revenue_bootstrap_ci


def q_ann_recall_report(sf_dir: str) -> pd.DataFrame:
    """ANN EVALUATION operator: recall@10 and rank-overlap of each
    approximate index family (IVF, sign-LSH, int8, PQ) against the exact
    brute-force top-10 for the shared benchmark query — the index-health
    readout a retrieval service monitors after each rebuild. Reuses the
    existing distributed paths verbatim (each is its own gated query); this
    op only intersects their 10-row outputs, so its cost is the sum of the
    probes, not a new scan shape. Golden-pinned (deterministic seeds all
    the way down)."""
    exact = set(q_embedding_topk(sf_dir)["vec_id"].tolist())
    out = []
    for name, fn in (
        ("ivf", q_embedding_topk_ivf),
        ("lsh", q_embedding_topk_lsh),
        ("int8", q_embedding_topk_int8),
        ("pq", q_embedding_topk_pq),
    ):
        got = fn(sf_dir)["vec_id"].tolist()
        out.append(
            {
                "index": name,
                "recall_at_10": round(len(exact & set(got)) / 10.0, 6),
                "n_results": np.int64(len(got)),
            }
        )
    return pd.DataFrame(out)


QUERIES["ann_recall_report"] = q_ann_recall_report


def q_session_bounce_rate(sf_dir: str) -> pd.DataFrame:
    """Per-day session bounce rate: share of (1 h-gap) sessions containing
    exactly one event, keyed by the session's start day — the engagement
    rollup every web-analytics stack computes. Rides the user-bucket
    sessionize plan (user_sessions); each bucket emits calendar-bounded
    (day, bounces, sessions) partials."""
    from ray.data.aggregate import Sum

    ds = _tbl(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def sess_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([False], (ts[1:] - ts[:-1]) > 3600 * 1_000_000_000))
        starts = np.flatnonzero(new_user | gap)
        lens = np.diff(np.r_[starts, len(ts)])
        day = np.datetime_as_string(
            (ts[starts] // (86_400 * 1_000_000_000)).astype("datetime64[D]")
        )
        df = pd.DataFrame({"day": day, "bounce": (lens == 1).astype(np.int64)})
        out = df.groupby("day", as_index=False).agg(
            bounces=("bounce", "sum"), sessions=("bounce", "size")
        )
        return out

    out = (
        ds.map_batches(_with_user_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(sess_fold, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("bounces", alias_name="bounces"), Sum("sessions", alias_name="sessions"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["bounce_rate"] = (out["bounces"] / out["sessions"]).round(6)
    return out.astype({"bounces": "int64", "sessions": "int64"})


QUERIES["session_bounce_rate"] = q_session_bounce_rate
ORACLE_SQL["session_bounce_rate"] = (
    "WITH e AS (SELECT user_id, ts, event_id,"
    "  CASE WHEN ts - LAG(ts) OVER w > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS brk"
    "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " s AS (SELECT user_id, ts, SUM(brk) OVER"
    "   (PARTITION BY user_id ORDER BY ts, event_id) AS sid FROM e),"
    " iv AS (SELECT user_id, sid, MIN(ts) AS st, COUNT(*) AS n FROM s GROUP BY 1, 2)"
    " SELECT strftime(st, '%Y-%m-%d') AS day,"
    "  SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS bounces,"
    "  COUNT(*)::BIGINT AS sessions,"
    "  ROUND(SUM(CASE WHEN n = 1 THEN 1.0 ELSE 0 END) / COUNT(*), 6) AS bounce_rate"
    " FROM iv GROUP BY 1 ORDER BY 1"
)
