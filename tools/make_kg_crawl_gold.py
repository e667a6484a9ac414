"""Generate the planted CRAWL-DEPTH golden for the kg_crawl_depths query.

Premise (measured this session, sf0.01 / 1500 docs): the iterated
pagination crawl (kg_crawl_rounds — extract next-page links, anti-join
consumed urls, fetch continuations, stitch per article, ≤ 4 rounds)
reproduces the generator's planted chain structure EXACTLY: for every
main-page url, stitched n_pages == chain_depth(doc_id, 3) when the
generator planted a pager on the main page, else 1 — 1500/1500 urls,
zero mismatches (per-doc distribution 1:1192, 2:92, 3:111, 4:105).
That upgrades the crawl family from rows-only to a hash-exact driver
signal on its fan-out/stitch structure. Golden written from the
GENERATOR's truth only (pager presence + chain_depth), never the
engine — same methodology as the other planted goldens.

Writes tests/goldens/kg_crawl_gold_sf001.parquet
  (url:string, n_pages:int64)

Valid at sf0.01 only. Usage: python tools/make_kg_crawl_gold.py [n_docs]
"""

from __future__ import annotations

import pathlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kgrecrun.corpus import synthgen  # noqa: E402

SEED = 42
MAX_EXTRA_PAGES = 3  # the kg_crawl_rounds corpus parameter


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    world = synthgen.get_world(SEED)
    urls, depths = [], []
    for i in range(n_docs):
        row, _ = synthgen.gen_page_row(SEED, i, world)
        has_pager = b'class="pager"' in row["html"]
        urls.append(row["url"])
        depths.append(synthgen.chain_depth(i, MAX_EXTRA_PAGES)
                      if has_pager else 1)
    out = pa.table({"url": pa.array(urls, pa.string()),
                    "n_pages": pa.array(depths, pa.int64())})
    dest = ROOT / "tests" / "goldens" / "kg_crawl_gold_sf001.parquet"
    pq.write_table(out, str(dest))
    print(f"wrote {dest}: {out.num_rows} url chain depths from {n_docs} docs")


if __name__ == "__main__":
    main()
