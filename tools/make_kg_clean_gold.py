"""Generate the byte-parity golden for ``kg_clean_html`` by running the
UNMODIFIED reference sanitizer (iframe.js:91-254 + figure-wrap block,
via tools/sanitize_golden_gen.mjs under Node) over REFERENCE-produced
article HTML (tools/golden_gen.mjs over the sf0.01 synthetic corpus,
1500 docs, seed 42 — the driver's correctness scale).

The golden is therefore reference output end-to-end: page events →
unmodified readabilitySAX kernel → article html → unmodified iframe.js
sanitizer → serialized clean_html. The engine's parallel path
(extract_articles(emit_html=True) → sanitize_articles) must match it
byte-for-byte; this tool also diffs the two and refuses to write a
golden the engine does not reproduce EXACTLY, so a silent engine change
can never be laundered into a matching oracle (the golden bytes
themselves never come from the engine).

Writes tests/goldens/kg_clean_html_sf001.parquet (url, clean_html);
``oracle_sql()['kg_clean_html']`` serves it via read_parquet.

Usage: python tools/make_kg_clean_gold.py [n_docs]   (default 1500)
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kgrecrun.corpus import synthgen, world  # noqa: E402
from kgrecrun.extract.events import html_to_events  # noqa: E402
from kgrecrun.sanitize.stage import sanitize_html  # noqa: E402

SEED = 42
CHUNK = 250


def run_node(script: str, rows: list[dict]) -> list[dict]:
    p = subprocess.run(
        ["node", str(ROOT / "tools" / script)],
        input="\n".join(json.dumps(r) for r in rows),
        capture_output=True, text=True, check=True,
    )
    return [json.loads(line) for line in p.stdout.splitlines()]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    w = world.build_world(SEED)
    out_rows: list[dict] = []
    mismatches = 0
    for lo in range(0, n_docs, CHUNK):
        chunk = []
        for doc_id in range(lo, min(lo + CHUNK, n_docs)):
            row, _ = synthgen.gen_page_row(SEED, doc_id, w)
            chunk.append({"url": row["url"], "events": html_to_events(row["html"])})
        articles = run_node("golden_gen.mjs", chunk)
        san_in = [
            {"url": a["url"], "base_uri": a["url"],
             "events": html_to_events(a["html"])}
            for a in articles
        ]
        art_html = {a["url"]: a["html"] for a in articles}
        for r in run_node("sanitize_golden_gen.mjs", san_in):
            out_rows.append({"url": r["url"], "clean_html": r["clean_html"]})
            engine = sanitize_html(art_html[r["url"]], r["url"])
            if engine != r["clean_html"]:
                mismatches += 1
                if mismatches <= 3:
                    print(f"MISMATCH {r['url']}")
                    print(f"  ref:    {r['clean_html'][:300]!r}")
                    print(f"  engine: {engine[:300]!r}")
        print(f"  {min(lo + CHUNK, n_docs)}/{n_docs} docs, {mismatches} mismatches")

    if mismatches:
        print(f"REFUSING to write golden: {mismatches} engine mismatches")
        raise SystemExit(1)

    goldens = ROOT / "tests" / "goldens"
    pq.write_table(
        pa.Table.from_pylist(out_rows, schema=pa.schema([
            ("url", pa.string()), ("clean_html", pa.string()),
        ])),
        goldens / "kg_clean_html_sf001.parquet",
    )
    print(f"wrote {len(out_rows)} rows -> {goldens / 'kg_clean_html_sf001.parquet'}")


if __name__ == "__main__":
    main()
