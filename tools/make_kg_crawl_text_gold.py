"""Reference-derived goldens for the two remaining rows-only crawl
queries: kg_crawl_frontier (the discovered-not-yet-fetched url set) and
kg_crawl_rounds (the 4-round iterated crawl's stitched (url, n_pages,
text_length_total) table).

Methodology (make_kg_multipage_gold.py): the UNMODIFIED reference
kernel under Node (tools/golden_gen.mjs) supplies every page's
extracted text and nextPage pick — base corpus AND the deep-chain
continuation pages (max_extra_pages=3 → planted chain depths 2/3/4,
exactly the corpus kg_crawl_rounds crawls); the tool walks each chain
with independent primitives (stdlib urljoin; a dict as the fetch):

    frontier(url)        = urljoin(url, ref nextPage of the BASE page),
                           minus urls already in the base corpus
    n_pages, text_total  = follow reference nextPage links through the
                           continuation dict for ≤ 4 fetch rounds,
                           summing reference text lengths

Premises are MEASURED (engine == golden row-exact at sf0.01) before
either golden is written. Note kg_crawl_depths' (url, n_pages) golden
is PLANTED generator structure (tools/make_kg_crawl_gold.py) — this
tool's rounds golden is the reference-derived superset (adds text
lengths), so the two independent derivations cross-check each other.

Writes tests/goldens/kg_crawl_frontier_gold_sf001.parquet and
tests/goldens/kg_crawl_rounds_gold_sf001.parquet.

Usage: python tools/make_kg_crawl_text_gold.py
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
MAX_EXTRA = 3   # the kg_crawl_rounds corpus: chain depths 2 + id%3
MAX_ROUNDS = 4
SF_DIR = "/root/testdata/sf0.01"
OUT_FRONTIER = ROOT / "tests" / "goldens" / "kg_crawl_frontier_gold_sf001.parquet"
OUT_ROUNDS = ROOT / "tests" / "goldens" / "kg_crawl_rounds_gold_sf001.parquet"


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


def build() -> tuple[pa.Table, pa.Table]:
    w = world.build_world(SEED)
    base = [synthgen.gen_page_row(SEED, d, w)[0] for d in range(N_DOCS)]
    cont = []
    for d in range(N_DOCS):
        depth = synthgen.chain_depth(d, MAX_EXTRA)
        for page_no in range(2, depth + 1):
            cont.append(synthgen.gen_continuation_row(
                SEED, d, page_no, last=page_no == depth))
    base_ref = ref_over(base)
    cont_ref = ref_over(cont)
    base_urls = set(base_ref)

    frontier = []
    rounds_rows = []
    for r in base:
        url = r["url"]
        cur, cur_url = base_ref[url], url
        n_pages, total = 1, len(cur["text"])
        if cur.get("nextPage"):
            nxt = urljoin(url, cur["nextPage"])
            if nxt not in base_urls:
                frontier.append(nxt)
        for _ in range(MAX_ROUNDS):
            nxt = cur.get("nextPage")
            if not nxt:
                break
            next_url = urljoin(cur_url, nxt)
            c = cont_ref.get(next_url)
            if c is None:
                break
            n_pages += 1
            total += len(c["text"])
            cur, cur_url = c, next_url
        rounds_rows.append({"url": url, "n_pages": n_pages,
                            "text_length_total": total})

    f_tbl = pa.table({"url": pa.array(sorted(set(frontier)), pa.string())})
    r_tbl = pa.Table.from_pylist(rounds_rows, schema=pa.schema([
        ("url", pa.string()), ("n_pages", pa.int64()),
        ("text_length_total", pa.int64())]))
    r_tbl = r_tbl.take(pc.sort_indices(r_tbl, sort_keys=[("url", "ascending")]))
    return f_tbl, r_tbl


def _engine_table(name: str, cols: list[str]) -> pa.Table:
    import __ray_entry__ as E

    eng = E.queries()[name](SF_DIR)
    t = pa.concat_tables(
        [b for b in eng.iter_batches(batch_format="pyarrow")]).select(cols)
    t = t.take(pc.sort_indices(t, sort_keys=[(c, "ascending") for c in cols]))
    return pa.table({c: pc.cast(t[c], t[c].type if t[c].type != pa.large_string()
                                else pa.string()).combine_chunks()
                     for c in t.column_names})


def measure(gold: pa.Table, name: str) -> None:
    eng = _engine_table(name, gold.column_names)
    if not eng.equals(gold):
        print(f"{name}: engine {eng.num_rows} rows vs golden {gold.num_rows}")
        raise SystemExit(f"PREMISE VIOLATED for {name}; goldens NOT written")
    print(f"premise measured: {name} engine == golden, "
          f"{gold.num_rows} rows exact")


def main() -> None:
    import ray

    f_tbl, r_tbl = build()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    # cross-check vs the PLANTED depth golden before touching the engine
    planted = pq.read_table(
        ROOT / "tests" / "goldens" / "kg_crawl_gold_sf001.parquet")
    planted = planted.take(
        pc.sort_indices(planted, sort_keys=[("url", "ascending")]))
    if not planted.select(["url", "n_pages"]).equals(
            r_tbl.select(["url", "n_pages"])):
        raise SystemExit("reference-derived n_pages != planted chain golden")
    print("cross-check: reference-derived n_pages == planted chain golden")
    measure(f_tbl, "kg_crawl_frontier")
    measure(r_tbl, "kg_crawl_rounds")
    pq.write_table(f_tbl, OUT_FRONTIER)
    pq.write_table(r_tbl, OUT_ROUNDS)
    print(f"wrote {OUT_FRONTIER} ({f_tbl.num_rows} rows) and "
          f"{OUT_ROUNDS} ({r_tbl.num_rows} rows)")


if __name__ == "__main__":
    main()
