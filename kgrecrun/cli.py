"""`ray job submit`-style entry point (SURVEY.md §3.4): the batch
replacement for the reference's service-worker orchestration
(background.js:28-77) — config in, checkpointed streaming pipeline out.

    python -m kgrecrun.cli --pages '/data/pages/*.parquet' \
        --entities /data/entities.parquet --out /data/kg \
        [--files-per-partition 4] [--synthetic-docs N]

A crawl drop can be ingested directly — WARC.gz shards instead of
parquet (streaming parse, digest-verified), same file-granular
checkpoint partitions:

    python -m kgrecrun.cli --pages '/data/crawl/*.warc.gz' \
        --pages-format warc --entities /data/entities.parquet --out /data/kg

With ``--synthetic-docs N`` (no --pages), a deterministic CC-style
corpus is generated first — the hermetic equivalent of pointing at a
crawl dump. Owns its Ray session (guarded init; the library never
calls ray.init).

Any named pipeline from the driver contract can also be run standalone
and written as partitioned parquet:

    python -m kgrecrun.cli --query exact_dedup \
        --sf-dir /root/testdata/sf0.01 --out /tmp/dedup_out
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="kgrecrun")
    p.add_argument("--pages", help="glob of input page parquet files")
    p.add_argument("--pages-format", default="parquet",
                   choices=["parquet", "warc"],
                   help="--pages container: parquet page tables or "
                        "WARC.gz crawl shards (streaming ingest, "
                        "digest-verified)")
    p.add_argument("--entities", help="entity-catalog parquet (entity_id, etype, canonical, aliases)")
    p.add_argument("--out", required=True, help="output root (triples/, mentions/, _manifests/)")
    p.add_argument("--files-per-partition", type=int, default=4)
    p.add_argument("--synthetic-docs", type=int, default=0,
                   help="generate a deterministic synthetic corpus of N docs instead of --pages")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--query", help="run one named driver-contract pipeline instead of the KG flagship")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="input table directory for --query")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "json"],
                   help="--query output format (json = JSONL)")
    args = p.parse_args(argv)
    if not args.query and not args.synthetic_docs and not (args.pages and args.entities):
        p.error("provide --query, --pages + --entities, or --synthetic-docs")

    import ray

    # only shut down a session we started (in-process callers — tests —
    # own their session)
    args._own_ray = not ray.is_initialized()
    if args._own_ray:
        ray.init(address="local", include_dashboard=False,
                 **({"num_cpus": args.num_cpus} if args.num_cpus else {}))

    if args.query:
        return _run_query(args)

    import pyarrow.parquet as pq

    from kgrecrun.corpus.synthgen import get_world, write_corpus
    from kgrecrun.runtime.checkpoint import run_checkpointed

    if args.synthetic_docs:
        corpus_dir = f"{args.out}/_input"
        write_corpus(corpus_dir, args.synthetic_docs, seed=args.seed)
        files = sorted(glob.glob(f"{corpus_dir}/pages/*.parquet"))
        entities = get_world(args.seed).entity_table()
    elif args.pages and args.entities:
        files = sorted(glob.glob(args.pages))
        entities = pq.read_table(args.entities)
    else:
        p.error("provide --pages + --entities, or --synthetic-docs")
        return 2

    summary = run_checkpointed(
        files, entities, args.out,
        files_per_partition=args.files_per_partition,
        input_format=args.pages_format,
    )
    print(json.dumps(summary))
    if args._own_ray:
        ray.shutdown()
    return 0


def _run_query(args) -> int:
    """Run one `__ray_entry__.queries()` pipeline over --sf-dir and
    write the result as partitioned parquet under --out."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    qs = E.queries()
    if args.query not in qs:
        print(f"unknown query {args.query!r}; available: {sorted(qs)}", file=sys.stderr)
        return 2
    res = qs[args.query](args.sf_dir)
    os.makedirs(args.out, exist_ok=True)
    if not isinstance(res, ray.data.Dataset):
        tbl = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
        res = ray.data.from_arrow(tbl)
    writers = {"parquet": res.write_parquet, "csv": res.write_csv,
               "json": res.write_json}
    readers = {"parquet": ray.data.read_parquet, "csv": ray.data.read_csv,
               "json": ray.data.read_json}
    writers[args.format](args.out)
    n = readers[args.format](args.out).count()
    print(json.dumps({"query": args.query, "rows": n, "out": args.out}))
    if args._own_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
