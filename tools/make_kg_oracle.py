"""Generate DuckDB-checkable goldens for the KG extraction queries by
running the UNMODIFIED reference kernel (under Node, via
tools/golden_gen.mjs) over the full sf0.01 synthetic corpus (1500 docs,
seed 42 — exactly what ``queries()['kg_articles']`` extracts at the
driver's correctness scale).

Writes:
  tests/goldens/kg_articles_sf001.parquet   (url, title, text_length, score)
  tests/goldens/kg_text_nodes_sf001.parquet (url, node_idx, node_text)

``oracle_sql()`` serves these via ``read_parquet``, giving the flagship
extraction surface a hard rows+schema+hash driver signal instead of a
rows-only check. The goldens are REFERENCE output (independent oracle),
not engine output — tests/test_parity.py separately proves the engine
matches the reference byte-for-byte on the same generator.

Usage: python tools/make_kg_oracle.py [n_docs]   (default 1500)
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

SEED = 42
CHUNK = 250


def run_reference(rows: list[dict]) -> list[dict]:
    lines = [json.dumps(r) for r in rows]
    p = subprocess.run(
        ["node", str(ROOT / "tools" / "golden_gen.mjs")],
        input="\n".join(lines), capture_output=True, text=True, check=True,
    )
    return [json.loads(line) for line in p.stdout.splitlines()]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    w = world.build_world(SEED)
    out_articles: list[dict] = []
    out_nodes: list[dict] = []
    for lo in range(0, n_docs, CHUNK):
        chunk = []
        for doc_id in range(lo, min(lo + CHUNK, n_docs)):
            row, _ = synthgen.gen_page_row(SEED, doc_id, w)
            chunk.append({"url": row["url"], "events": html_to_events(row["html"])})
        for r in run_reference(chunk):
            out_articles.append({
                "url": r["url"],
                "title": r["title"],
                "text_length": int(r["textLength"]),
                # engine emits int(score) (extract/stage.py); mirror it
                "score": int(r["score"]),
            })
            for j, t in enumerate(r["nodes"]):
                out_nodes.append({"url": r["url"], "node_idx": j, "node_text": t})
        print(f"  {min(lo + CHUNK, n_docs)}/{n_docs} docs")

    goldens = ROOT / "tests" / "goldens"
    pq.write_table(
        pa.Table.from_pylist(out_articles, schema=pa.schema([
            ("url", pa.string()), ("title", pa.string()),
            ("text_length", pa.int64()), ("score", pa.int64()),
        ])),
        goldens / "kg_articles_sf001.parquet",
    )
    pq.write_table(
        pa.Table.from_pylist(out_nodes, schema=pa.schema([
            ("url", pa.string()), ("node_idx", pa.int64()),
            ("node_text", pa.string()),
        ])),
        goldens / "kg_text_nodes_sf001.parquet",
    )
    print(f"wrote {len(out_articles)} article rows, {len(out_nodes)} node rows")


if __name__ == "__main__":
    main()
