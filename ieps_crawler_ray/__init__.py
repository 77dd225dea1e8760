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

import os as _os

# Arrow's default (jemalloc) returns large blob allocations to the kernel on
# free, so every concurrent parquet read re-pays mmap+page-fault setup; on
# this VM 16 concurrent readers of a binary-blob table collapse to ~180 MB/s
# aggregate (measured; 14 GB/s raw-file ceiling) — the reads serialize on the
# memory subsystem, not the disk. mimalloc retains freed pages per heap, so
# the steady state is fault-free: same probe sustains 2-3 GB/s at 16 readers.
# Both forms: the env var covers processes forked after this import (ray
# workers inherit the raylet's env when bench/tests own ray.init), and the
# programmatic call covers THIS process even when Ray was initialised before
# the library was imported (the driver contract) — every worker that executes
# one of our stages imports the library and flips its own pool.
_os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")
try:  # pragma: no cover - availability depends on the pyarrow build
    import pyarrow as _pa

    _pa.set_memory_pool(_pa.mimalloc_memory_pool())
except Exception:
    pass
