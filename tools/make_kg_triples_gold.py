"""Generate the planted-ground-truth golden for the ``kg_triples`` query.

The driver's correctness gate runs every query at sf0.01 (1500 docs,
seed 42). At that scale the full KG pipeline (extract -> NER -> OpenIE ->
link -> canonicalize -> dedup) reproduces the generator's planted triples
EXACTLY — P = R = 1.0 on the canonical (subj, pred, obj) set AND the
per-triple source multiplicity matches ``n_sources`` (measured: 2887/2887
triples, 0 multiplicity mismatches). That makes the planted truth a valid
*independent* hash-exact oracle: it is the generator's intent, written
before the engine runs, exactly like the reference-kernel goldens in
tools/make_kg_oracle.py (reference: recrun's fixture-golden strategy,
test/readabilitySAX.js:1).

Writes tests/goldens/kg_triples_gold_sf001.parquet
  (subj:string, pred:string, obj:string, n_sources:int64)

Valid at sf0.01 only (the golden is scale-specific, like the other two
KG goldens). Usage: python tools/make_kg_triples_gold.py [n_docs]
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
        truth.select(["subj_root", "pred", "obj_root"])
        .group_by(["subj_root", "pred", "obj_root"])
        .aggregate([([], "count_all")])
    )
    out = pa.table({
        "subj": agg["subj_root"],
        "pred": agg["pred"],
        "obj": agg["obj_root"],
        "n_sources": pc.cast(agg["count_all"], pa.int64()),
    })
    dest = ROOT / "tests" / "goldens" / "kg_triples_gold_sf001.parquet"
    pq.write_table(out, str(dest))
    print(f"wrote {dest}: {out.num_rows} canonical triples from {n_docs} docs")


if __name__ == "__main__":
    main()
