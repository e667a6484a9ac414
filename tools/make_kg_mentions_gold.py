"""Generate the planted MENTIONS golden for the kg_mention_counts query.

Premise (measured this session, sf0.01 / 1500 docs): the NER gazetteer
stage over the extracted English texts reproduces the generator's
planted per-(url, surface) mention counts EXACTLY — 15,320 pairs, zero
mismatches in either direction (every planted subject/object surface
is found exactly once per fact sentence; no spurious matches in noise,
titles, or boilerplate survive extraction). That makes the planted
surface counts an independent oracle for the mention-detection stage,
upgrading it from rows-only to a hash-exact driver signal — same
methodology as make_kg_triples_gold.py / make_kg_provenance_gold.py
(golden written from the GENERATOR's truth only, never the engine).

Writes tests/goldens/kg_mentions_gold_sf001.parquet
  (url:string, surface:string, n_mentions:int64)
and tests/goldens/kg_mentions_rows_gold_sf001.parquet — the
per-OCCURRENCE mention multiset (url, surface, norm, etype), one row
per planted subject/object occurrence (17,972 at sf0.01; the measured
premise above says the engine's mention multiset equals it exactly).
norm is the lowercased surface; etype comes from the world's alias
dictionary (single candidate type, else 'mixed' — the linking spec's
ambiguity rule). Character offsets (`begin`) are NOT generator-known
(they live in the post-extraction text layout), so the driver surface
for kg_mentions projects them away; offset correctness is covered
downstream by the hash-exact triple goldens, which consume offsets to
pair mentions.

Valid at sf0.01 only. Usage: python tools/make_kg_mentions_gold.py [n_docs]
"""

from __future__ import annotations

import pathlib
import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kgrecrun.corpus import synthgen  # noqa: E402

SEED = 42


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    world = synthgen.get_world(SEED)
    _, truth = synthgen.gen_batch(range(n_docs), SEED, world)
    counts: Counter = Counter()
    for r in truth.to_pylist():
        counts[(r["url"], r["subj_surface"])] += 1
        counts[(r["url"], r["obj_surface"])] += 1
    urls, surfaces, ns = zip(*((u, s, n) for (u, s), n in counts.items()))
    out = pa.table({
        "url": pa.array(urls, pa.string()),
        "surface": pa.array(surfaces, pa.string()),
        "n_mentions": pa.array(ns, pa.int64()),
    })
    dest = ROOT / "tests" / "goldens" / "kg_mentions_gold_sf001.parquet"
    pq.write_table(out, str(dest))
    print(f"wrote {dest}: {out.num_rows} (url, surface) mention rows "
          f"from {n_docs} docs")

    # per-occurrence multiset (url, surface, norm, etype)
    alias = world.alias_dictionary()
    etype = {e.entity_id: e.etype for e in world.entities}

    def _etype(surface: str) -> str:
        types = {etype[c] for c in alias[surface.lower()]}
        return types.pop() if len(types) == 1 else "mixed"

    occ_url, occ_surface = [], []
    for r in truth.to_pylist():
        occ_url += [r["url"], r["url"]]
        occ_surface += [r["subj_surface"], r["obj_surface"]]
    rows_out = pa.table({
        "url": pa.array(occ_url, pa.string()),
        "surface": pa.array(occ_surface, pa.string()),
        "norm": pa.array([s.lower() for s in occ_surface], pa.string()),
        "etype": pa.array([_etype(s) for s in occ_surface], pa.string()),
    })
    dest_rows = ROOT / "tests" / "goldens" / "kg_mentions_rows_gold_sf001.parquet"
    pq.write_table(rows_out, str(dest_rows))
    print(f"wrote {dest_rows}: {rows_out.num_rows} occurrence rows")


if __name__ == "__main__":
    main()
