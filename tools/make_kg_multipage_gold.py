"""Reference-derived golden for kg_multipage (one crawl round: next-page
discovery → frontier anti-join → fetch → extract → stitch).

Methodology: the make_kg_oracle.py pattern — the UNMODIFIED reference
kernel (tools/golden_gen.mjs under Node) produces each page's extracted
text and nextPage pick for BOTH the base corpus and the continuation
pages; the tool then mirrors the crawl round's STRUCTURE with
independent primitives (stdlib ``urljoin`` for link resolution vs the
engine's iframe.js rules; a plain dict for the frontier fetch vs the
engine's bucketed anti-join/semi-join/cogroup chain):

    n_pages(url)           = 1 + [reference nextPage resolves to a
                                  generated continuation url]
    text_length_total(url) = len(ref text page 1) + len(ref text page 2)

The premise (engine == golden row-exact at sf0.01) is MEASURED before
the golden is written; a mismatch refuses the write. This upgrades
kg_multipage from rows-only to a hash-exact driver signal and pins the
whole chain: kernel parity (text/nextPage), URL resolution, frontier
anti-join, fetch semi-join, parent relabeling and stitch arithmetic.

Writes tests/goldens/kg_multipage_gold_sf001.parquet.

Usage: python tools/make_kg_multipage_gold.py
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
from urllib.parse import urljoin

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kgrecrun.corpus import synthgen, world  # noqa: E402 — generator truth
from kgrecrun.extract.events import html_to_events  # noqa: E402

N_DOCS = 1500
SEED = 42
CHUNK = 250
SF_DIR = "/root/testdata/sf0.01"
OUT = ROOT / "tests" / "goldens" / "kg_multipage_gold_sf001.parquet"


def run_reference(rows: list[dict]) -> list[dict]:
    lines = [json.dumps(r) for r in rows]
    p = subprocess.run(
        ["node", str(ROOT / "tools" / "golden_gen.mjs")],
        input="\n".join(lines), capture_output=True, text=True, check=True,
    )
    return [json.loads(line) for line in p.stdout.splitlines()]


def ref_over(pages: list[dict]) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for lo in range(0, len(pages), CHUNK):
        chunk = [{"url": r["url"], "events": html_to_events(r["html"])}
                 for r in pages[lo:lo + CHUNK]]
        for r in run_reference(chunk):
            out[r["url"]] = r
    return out


def golden_rows() -> pa.Table:
    w = world.build_world(SEED)
    base = [synthgen.gen_page_row(SEED, d, w)[0] for d in range(N_DOCS)]
    cont = [synthgen.gen_continuation_row(SEED, d, 2, last=True)
            for d in range(N_DOCS)]
    base_ref = ref_over(base)
    cont_ref = ref_over(cont)
    rows = []
    for r in base:
        url = r["url"]
        ref = base_ref[url]
        n_pages, total = 1, len(ref["text"])
        nxt = ref.get("nextPage")
        if nxt:
            next_url = urljoin(url, nxt)
            c = cont_ref.get(next_url)
            if c is not None:
                n_pages = 2
                total += len(c["text"])
        rows.append({"url": url, "n_pages": n_pages,
                     "text_length_total": total})
    tbl = pa.Table.from_pylist(rows, schema=pa.schema([
        ("url", pa.string()), ("n_pages", pa.int64()),
        ("text_length_total", pa.int64())]))
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("url", "ascending")]))


def measure_premise(gold: pa.Table) -> None:
    import ray

    import __ray_entry__ as E

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    eng = E.queries()["kg_multipage"](SF_DIR)
    eng_tbl = pa.concat_tables(
        [b for b in eng.iter_batches(batch_format="pyarrow")]
    ).select(["url", "n_pages", "text_length_total"])
    eng_tbl = eng_tbl.take(
        pc.sort_indices(eng_tbl, sort_keys=[("url", "ascending")]))
    eng_tbl = pa.table({
        "url": pc.cast(eng_tbl["url"], pa.string()).combine_chunks(),
        "n_pages": eng_tbl["n_pages"].combine_chunks(),
        "text_length_total": eng_tbl["text_length_total"].combine_chunks(),
    })
    if not eng_tbl.equals(gold):
        e, g = eng_tbl.to_pandas(), gold.to_pandas()
        m = e.merge(g, how="outer", on="url", suffixes=("_eng", "_gold"),
                    indicator=True)
        bad = m[(m["_merge"] != "both")
                | (m["n_pages_eng"] != m["n_pages_gold"])
                | (m["text_length_total_eng"] != m["text_length_total_gold"])]
        print(bad.head(30).to_string())
        raise SystemExit(f"PREMISE VIOLATED: {len(bad)} row diffs; "
                         "golden NOT written")
    print(f"premise measured: engine == golden, {gold.num_rows} rows exact; "
          f"{int(pc.sum(pc.equal(gold['n_pages'], 2)).as_py())} two-page chains")


def main() -> None:
    gold = golden_rows()
    measure_premise(gold)
    pq.write_table(gold, OUT)
    print(f"wrote {OUT} ({gold.num_rows} rows)")


if __name__ == "__main__":
    main()
