"""Crawler CLI — the reference's entry-point surface (`oldstufffrompa1/main.py`
argparse: --workers/--max-pages/seeds; Estrella ctor knobs, SURVEY §2.10)
re-expressed for the Ray engine::

    python -m ieps_crawler_ray.cli crawl --max-pages 500 --politeness-factor 3 \
        --ckpt /tmp/my-crawl [--resume] [--seeds URL ...]
    python -m ieps_crawler_ray.cli status --ckpt /tmp/my-crawl

The CLI owns its Ray session (library code never calls ray.init)."""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Ray-Data-native crawl engine")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run (or resume) a crawl")
    c.add_argument("--n-images", type=int, default=2_000, help="corpus size")
    c.add_argument("--n-hosts", type=int, default=16)
    c.add_argument("--max-pages", type=int, default=500)
    c.add_argument("--seeds", nargs="*", default=None, help="seed URLs (default: first hosts)")
    c.add_argument("--no-politeness", action="store_true")
    c.add_argument("--politeness-factor", type=int, default=3)
    c.add_argument("--sitemaps", action="store_true", help="S4 sitemap injection")
    c.add_argument(
        "--binary-permille", type=int, default=0,
        help="fraction of URLs serving binary content-types (M5)",
    )
    c.add_argument("--ckpt", default="/tmp/ieps_crawler_ray/cli-crawl")
    c.add_argument("--no-resume", action="store_true")
    c.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    c.add_argument(
        "--ray-address",
        default=os.environ.get("RAY_ADDRESS", "local"),
        help="Ray address: 'local' starts a single-node session capped at "
        "--num-cpus; 'auto' (the ray-job-submit default via RAY_ADDRESS) "
        "attaches to the hosting cluster and uses ALL its resources — the "
        "same entrypoint serves both `python -m ieps_crawler_ray.cli` and "
        "`ray job submit -- python -m ieps_crawler_ray.cli crawl ...`",
    )

    s = sub.add_parser("status", help="print checkpoint state + per-gen metrics")
    s.add_argument("--ckpt", default="/tmp/ieps_crawler_ray/cli-crawl")

    args = ap.parse_args(argv)

    if args.cmd == "status":
        from .pipelines.crawl import _gd, _gens_of, _load_state
        from .sources import lance_table as lt

        st = _load_state(args.ckpt)
        print(json.dumps(st or {"error": "no checkpoint"}, indent=1))
        for g in _gens_of(args.ckpt, "metrics"):
            m = lt.read_pyarrow(_gd(args.ckpt, "metrics", g)).to_pylist()[0]
            print(json.dumps(m))
        return

    import ray

    if not ray.is_initialized():
        kw = dict(include_dashboard=False, logging_level="ERROR")
        if args.ray_address == "local":
            kw["num_cpus"] = args.num_cpus  # cap only the local session;
            # on a cluster (address='auto' under ray job submit) the job
            # uses whatever the fixed-size cluster provides
        ray.init(address=args.ray_address, **kw)
    try:
        from .pipelines.crawl import CrawlConfig, run_crawl
        from .semantics import CrawlParams
        from .sources import corpus as C

        spec = C.CorpusSpec(
            n_images=args.n_images,
            n_hosts=args.n_hosts,
            binary_permille=args.binary_permille,
        )
        params = CrawlParams(
            spec=spec,
            seeds=tuple(args.seeds) if args.seeds else (),
            max_pages=args.max_pages,
            politeness=not args.no_politeness,
            politeness_factor=args.politeness_factor,
            sitemaps=args.sitemaps,
        )
        corpus = C.build_corpus(spec, C.corpus_path("/tmp/ieps_crawler_ray", spec))
        res = run_crawl(
            CrawlConfig(params=params, root=args.ckpt),
            corpus_path=corpus,
            resume=not args.no_resume,
        )
        print(
            json.dumps(
                {
                    "pages": res.n_pages,
                    "generations": res.n_generations,
                    "finished": res.finished,
                    "checkpoint": args.ckpt,
                }
            )
        )
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
