"""Generate the planted PROVENANCE golden for the temporal-KG queries.

Same methodology as make_kg_triples_gold.py (whose premise — the full
pipeline reproduces the generator's planted triples EXACTLY at sf0.01,
P=R=1.0 including per-triple multiplicity — is measured and recorded):
this golden keeps the url dimension instead of aggregating it away, so
per-(triple, source-document) mention counts become checkable. The
golden is written from the GENERATOR's planted truth only (never from
the engine), so it is an independent oracle; validate_against_engine
(tools/check_oracles.py kg_fact_sources) proves the per-document
premise holds before trusting it.

Writes tests/goldens/kg_provenance_gold_sf001.parquet
  (subj:string, pred:string, obj:string, url:string, n_mentions:int64)

Valid at sf0.01 only. Usage: python tools/make_kg_provenance_gold.py [n_docs]
"""

from __future__ import annotations

import pathlib
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kgrecrun.corpus import synthgen  # noqa: E402

SEED = 42


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    world = synthgen.get_world(SEED)
    _, truth = synthgen.gen_batch(range(n_docs), SEED, world)
    agg = (
        truth.select(["subj_root", "pred", "obj_root", "url"])
        .group_by(["subj_root", "pred", "obj_root", "url"])
        .aggregate([([], "count_all")])
    )
    out = pa.table({
        "subj": agg["subj_root"],
        "pred": agg["pred"],
        "obj": agg["obj_root"],
        "url": agg["url"],
        "n_mentions": pc.cast(agg["count_all"], pa.int64()),
    })
    dest = ROOT / "tests" / "goldens" / "kg_provenance_gold_sf001.parquet"
    pq.write_table(out, str(dest))
    print(f"wrote {dest}: {out.num_rows} (triple, url) provenance rows "
          f"from {n_docs} docs")


if __name__ == "__main__":
    main()
