"""Driver-facing pipelines: analytics over the testdata tables + crawl pipelines."""
