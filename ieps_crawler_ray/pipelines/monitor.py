"""Crawl-monitoring report — the analogue of the reference's
test/monitoring.py:25-211 (stats + live monitor + plot modes) over the
Lance-layout checkpoint instead of Postgres.

* ``crawl_stats(root)`` — page-type distribution, top hosts, link count,
  overall + per-generation crawl rates, aggregated per-stage seconds
  (monitoring.py:25-88 ``get_crawling_stats``).
* ``display_stats(root)`` — the one-shot report with text tables and a
  unicode sparkline of per-generation throughput (the in-terminal stand-in
  for monitoring.py:156-170 ``plot_page_types``).
* ``monitor(root, interval)`` — live loop re-reading the checkpoint between
  generations (readers only trust manifest-listed fragments, so a crawl in
  progress is always seen at a committed generation boundary) with an ETA
  (monitoring.py:172-227 ``monitor_crawl`` + ``estimate_completion``).

CLI::

    python -m ieps_crawler_ray.pipelines.monitor --root /tmp/ckpt [--watch N]
        [--target-pages 5000]
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd

from ..sources import lance_table as lt

_SPARK = "▁▂▃▄▅▆▇█"


def sparkline(values) -> str:
    vals = [float(v) for v in values]
    if not vals:
        return ""
    lo, hi = min(vals), max(vals)
    span = (hi - lo) or 1.0
    return "".join(_SPARK[int((v - lo) / span * (len(_SPARK) - 1))] for v in vals)


def crawl_stats(root: str) -> dict:
    from .crawl import _gd, _gens_of, _load_state

    st = _load_state(root)
    gens = _gens_of(root, "metrics")
    mrows = [
        lt.read_pyarrow(_gd(root, "metrics", g)).to_pandas() for g in gens
    ]
    metrics = (
        pd.concat(mrows, ignore_index=True).sort_values("gen")
        if mrows
        else pd.DataFrame()
    )
    page_types: dict[str, int] = {}
    top_hosts: list[tuple[int, int]] = []
    for g in _gens_of(root, "pages"):
        t = lt.read_pyarrow(_gd(root, "pages", g), columns=["status", "host_id"]).to_pandas()
        for k, v in t["status"].value_counts().items():
            page_types[k] = page_types.get(k, 0) + int(v)
        top_hosts.append(t.loc[t["status"] == "html", "host_id"].value_counts())
    hosts = (
        pd.concat(top_hosts).groupby(level=0).sum().sort_values(ascending=False).head(10)
        if top_hosts
        else pd.Series(dtype=int)
    )
    out = {
        "state": st,
        "page_types": page_types,
        "top_hosts": [(int(h), int(c)) for h, c in hosts.items()],
        "n_links": int(metrics["n_links"].sum()) if len(metrics) else 0,
        "n_pages": int(st["rank"]) if st else 0,
        "finished": bool(st and st.get("finished")),
        "gen_rates": [],
        "stage_secs": {},
        "total_secs": float(metrics["secs"].sum()) if len(metrics) else 0.0,
    }
    if len(metrics):
        out["gen_rates"] = [
            (int(g), float(a) / s if (s := float(sec)) > 0 else 0.0)
            for g, a, sec in zip(metrics["gen"], metrics["n_admitted"], metrics["secs"])
        ]
        agg: dict[str, float] = {}
        for js in metrics["stage_secs"]:
            for k, v in json.loads(js).items():
                agg[k] = agg.get(k, 0.0) + float(v)
        out["stage_secs"] = {k: round(v, 3) for k, v in sorted(agg.items(), key=lambda kv: -kv[1])}
    return out


def estimate_completion(current_pages: int, rate_per_sec: float, target_pages: int) -> str:
    """monitoring.py:213-227 semantics, at seconds granularity."""
    if current_pages >= target_pages:
        return "complete"
    if rate_per_sec <= 0:
        return "unknown (no recent activity)"
    secs = (target_pages - current_pages) / rate_per_sec
    if secs < 90:
        return f"~{int(secs)} s"
    if secs < 5400:
        return f"~{int(secs / 60)} min"
    return f"~{secs / 3600:.1f} h"


def display_stats(root: str, target_pages: int | None = None) -> str:
    s = crawl_stats(root)
    lines = [f"===== CRAWLER STATISTICS: {root} ====="]
    lines.append(f"pages: {s['n_pages']}  links: {s['n_links']}  finished: {s['finished']}")
    if s["page_types"]:
        width = max(len(k) for k in s["page_types"])
        lines.append("page types:")
        total = sum(s["page_types"].values())
        for k, v in sorted(s["page_types"].items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k:<{width}}  {v:>8}  {100.0 * v / total:5.1f}%")
    if s["top_hosts"]:
        lines.append("top hosts (html pages): " + ", ".join(f"host{h}={c}" for h, c in s["top_hosts"][:5]))
    if s["gen_rates"]:
        rates = [r for _, r in s["gen_rates"]]
        lines.append(
            f"throughput: overall {s['n_pages'] / s['total_secs']:.0f} pages/s over "
            f"{len(rates)} generations  per-gen {sparkline(rates)} "
            f"(last {rates[-1]:.0f}/s)"
        )
        if target_pages:
            lines.append(
                "estimated completion: "
                + estimate_completion(s["n_pages"], rates[-1], target_pages)
            )
    if s["stage_secs"]:
        lines.append("stage seconds (all generations): " + json.dumps(s["stage_secs"]))
    return "\n".join(lines)


def monitor(root: str, interval: float = 10.0, target_pages: int | None = None, max_ticks: int | None = None) -> None:
    """Live monitor loop (monitoring.py:172-211) — re-reads the checkpoint
    every ``interval`` seconds until the crawl finishes (or ``max_ticks``)."""
    ticks = 0
    while True:
        print(f"=== tick {ticks} @ {time.strftime('%H:%M:%S')} ===")
        print(display_stats(root, target_pages=target_pages))
        ticks += 1
        s = crawl_stats(root)
        if s["finished"] or (max_ticks is not None and ticks >= max_ticks):
            break
        time.sleep(interval)


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="monitor / report on a crawl checkpoint")
    ap.add_argument("--root", required=True)
    ap.add_argument("--watch", type=float, default=None, help="live mode: refresh every N seconds")
    ap.add_argument("--target-pages", type=int, default=None)
    ap.add_argument("--max-ticks", type=int, default=None)
    args = ap.parse_args(argv)
    if not os.path.exists(os.path.join(args.root, "state.json")):
        print(f"no checkpoint at {args.root}")
        return 1
    if args.watch:
        monitor(args.root, interval=args.watch, target_pages=args.target_pages, max_ticks=args.max_ticks)
    else:
        print(display_stats(args.root, target_pages=args.target_pages))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
