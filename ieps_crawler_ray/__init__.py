"""ieps_crawler_ray — a Ray-Data-native re-creation of lanbiteznik/ieps_crawler.

A brand-new engine (NOT a port): the reference's crawl loop (Postgres frontier +
threaded fetchers, `pa1/crawler/Estrella.py`, `oldstufffrompa1/crawler.py`) is
re-expressed as `ray.data.Dataset` pipelines — `map_batches` over zero-copy Arrow
batches, actor pools for stateful stages (URL-seen filters, robots caches,
politeness budgets), groupby/sort shuffles for the wide steps, and per-generation
Lance-layout Parquet checkpoints for resume.

Layout:
  functions/  pure, Ray-free vectorized kernels (hashing, urls, text, codecs)
  sources/    synthetic corpus generator + Lance-layout table adapter
  state/      bloom seen-filter, robots policy evaluation
  stages/     map_batches stages (fetch actors, dedup, priority, image)
  pipelines/  analytics + crawl pipelines bound to the driver contract
  crawl.py    the generation loop engine
  oracle.py   single-threaded reference-semantics crawler for parity tests
"""

__version__ = "0.1.0"
