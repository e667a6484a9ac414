"""Generator-truth golden for the WARC ingest query.

Computes (url, warc_ts_us, lang, n_bytes, html_md5) STRAIGHT from the
deterministic page generator — no WARC writer/parser anywhere in this
path — and writes tests/goldens/warc_pages_gold_sf001.parquet. The
engine's warc_ingest query reaches the same rows only by serializing
the pages to WARC.gz shards and parsing them back, so a hash match at
the driver certifies the full container round-trip (record framing,
per-member gzip, HTTP header embedding, microsecond WARC-Date
fidelity, payload byte identity via md5).

Usage: python tools/make_warc_gold.py   (regenerates the sf0.01 golden)
"""

from __future__ import annotations

import hashlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

N_DOCS_SF001 = 1500  # _n_docs('/root/testdata/sf0.01')
OUT = "/root/repo/tests/goldens/warc_pages_gold_sf001.parquet"


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    from kgrecrun.corpus.synthgen import pages_dataset

    rows = []
    for b in pages_dataset(N_DOCS_SF001, seed=42).iter_batches(
            batch_format="pyarrow"):
        for url, ts, html, lang in zip(
                b["url"].to_pylist(),
                b["warc_ts"].cast(pa.int64()).to_pylist(),
                b["html"].to_pylist(),
                b["lang"].to_pylist()):
            rows.append(dict(url=url, warc_ts_us=ts, lang=lang or "",
                             n_bytes=len(html),
                             html_md5=hashlib.md5(html).hexdigest()))
    tbl = pa.Table.from_pylist(rows, schema=pa.schema([
        ("url", pa.string()), ("warc_ts_us", pa.int64()),
        ("lang", pa.string()), ("n_bytes", pa.int64()),
        ("html_md5", pa.string())]))
    tbl = tbl.sort_by("url")
    pq.write_table(tbl, OUT)
    print(f"wrote {tbl.num_rows} rows -> {OUT}")
    ray.shutdown()


if __name__ == "__main__":
    main()
