# state: per-partition crawl state (seen filters, checkpoints)
