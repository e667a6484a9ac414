"""Container-format sources: ingest paths that turn raw crawl archives
into the engine's pages table without an intermediate parquet hop."""
