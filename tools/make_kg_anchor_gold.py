"""Independent golden for kg_anchor_texts (the web-graph link layer).

Methodology (the make_media_topk_gold.py contract): the golden is
computed WITHOUT the engine's extraction path — anchors are pulled from
the GENERATOR's html by a regex + ``html.unescape`` extractor (the
engine walks the serialized SAX event stream instead), relative hrefs
are resolved with the STDLIB ``urllib.parse.urljoin`` RFC-3986
implementation (the engine uses the iframe.js:153-178 resolution
rules), and the (target, anchor) rollup is a plain Counter. Two
independent extractor+resolver stacks agreeing row-exactly is the
premise; the tool MEASURES it and refuses to write a golden the engine
does not reproduce.

Valid at sf0.01 (n_docs=1500, seed=42 — the corpus every kg_* query
synthesizes). Writes tests/goldens/kg_anchor_gold_sf001.parquet.

Usage: python tools/make_kg_anchor_gold.py
"""

from __future__ import annotations

import html as html_mod
import pathlib
import re
import sys
from collections import Counter
from urllib.parse import urljoin

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kgrecrun.corpus.synthgen import gen_batch  # noqa: E402 — generator truth

N_DOCS = 1500
SEED = 42
SF_DIR = "/root/testdata/sf0.01"
OUT = ROOT / "tests" / "goldens" / "kg_anchor_gold_sf001.parquet"

ANCHOR_RE = re.compile(r'<a\s+href="([^"]*)"[^>]*>(.*?)</a>',
                       re.DOTALL | re.IGNORECASE)
TAG_RE = re.compile(r"<[^>]+>")


def golden_rows() -> pa.Table:
    n_links: Counter = Counter()
    pages_src: dict[tuple[str, str], set] = {}
    for lo in range(0, N_DOCS, 512):
        pages, _ = gen_batch(list(range(lo, min(lo + 512, N_DOCS))), SEED)
        for url, page_html in zip(pages["url"].to_pylist(),
                                  pages["html"].to_pylist()):
            if isinstance(page_html, (bytes, bytearray)):
                page_html = page_html.decode("utf-8")
            for href, inner in ANCHOR_RE.findall(page_html):
                anchor = " ".join(
                    html_mod.unescape(TAG_RE.sub(" ", inner)).split())
                key = (urljoin(url, href), anchor)
                n_links[key] += 1
                pages_src.setdefault(key, set()).add(url)
    keys = sorted(n_links)
    return pa.table({
        "target": pa.array([k[0] for k in keys], pa.string()),
        "anchor": pa.array([k[1] for k in keys], pa.string()),
        "n_links": pa.array([n_links[k] for k in keys], pa.int64()),
        "n_pages": pa.array([len(pages_src[k]) for k in keys], pa.int64()),
    })


def measure_premise(gold: pa.Table) -> None:
    import ray

    import __ray_entry__ as E

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    eng = E.queries()["kg_anchor_texts"](SF_DIR)
    eng_tbl = pa.concat_tables(
        [b for b in eng.iter_batches(batch_format="pyarrow")]
    ).select(["target", "anchor", "n_links", "n_pages"])
    keys = [("target", "ascending"), ("anchor", "ascending")]
    eng_tbl = eng_tbl.take(pc.sort_indices(eng_tbl, sort_keys=keys))
    eng_tbl = pa.table({c: eng_tbl[c].combine_chunks()
                        for c in eng_tbl.column_names})
    if not eng_tbl.equals(gold):
        import pandas as pd

        e, g = eng_tbl.to_pandas(), gold.to_pandas()
        merged = e.merge(g, how="outer", on=["target", "anchor"],
                         suffixes=("_eng", "_gold"), indicator=True)
        bad = merged[(merged["_merge"] != "both")
                     | (merged["n_links_eng"] != merged["n_links_gold"])
                     | (merged["n_pages_eng"] != merged["n_pages_gold"])]
        print(bad.head(30).to_string())
        raise SystemExit(f"PREMISE VIOLATED: {len(bad)} row diffs; "
                         "golden NOT written")
    print(f"premise measured: engine == golden, {gold.num_rows} rows exact")


def main() -> None:
    gold = golden_rows()
    measure_premise(gold)
    pq.write_table(gold, OUT)
    print(f"wrote {OUT} ({gold.num_rows} rows)")


if __name__ == "__main__":
    main()
