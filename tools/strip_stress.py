"""Scale + parallelism-invariance stress for the repeated-content
STRIP operators (round-4 session 3). Two independent planted corpora
(so the plants cannot contaminate each other's expectation):

* dup_span_strip — every 7th doc of an otherwise globally-unique
  corpus carries a shared 12-token boilerplate span at a VARYING token
  offset; exact expectation: exactly those docs lose exactly 12 tokens
  each (the five in-span 8-windows union to the span; boundary windows
  contain a unique token and stay unique), everything else unchanged.
* source_template_strip — half of each source's docs carry a
  per-source 10-token segment at the ALIGNED segment-2 slot; exact
  expectation: exactly those docs lose exactly that one segment.

Each cell runs in a fresh Ray session at each cpu count; planted
counts are asserted EXACTLY and an order-independent checksum over the
cleaned output must be bit-identical across parallelism.

Usage: python tools/strip_stress.py [n_docs] [cpus ...]
Defaults: 300,000 docs, cpus 8 32. Prints one JSON.
"""

from __future__ import annotations

import json
import sys
import time
import zlib

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

DOC_TOKENS = 40          # multiple of seg_words=10 → aligned segments
SPAN = 12                # planted duplicated span length (> k=8)
DUP_EVERY = 7            # every 7th doc carries the boilerplate span
N_SOURCES = 500
TMPL_EVERY = 2           # half of each source's docs carry the template


def _synth(n_docs: int, plant, num_blocks: int = 128):
    import ray.data

    per = max(1, n_docs // num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        tables = []
        for b in batch["id"].to_pylist():
            ids = np.arange(per, dtype=np.int64) + b * per
            texts, srcs = [], []
            for i in ids:
                # globally unique tokens -> no accidental duplicate
                # windows (i * DOC_TOKENS + j is injective)
                ws = [f"u{i * DOC_TOKENS + j}" for j in range(DOC_TOKENS)]
                plant(int(i), ws)
                texts.append(" ".join(ws))
                srcs.append(f"s{int(i) % N_SOURCES}")
            tables.append(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(srcs, pa.string()),
                "text": pa.array(texts, pa.string()),
            }))
        return pa.concat_tables(tables)

    return ray.data.range(num_blocks).map_batches(
        gen, batch_size=1, batch_format="pyarrow").materialize()


def _plant_span(i: int, ws: list) -> None:
    if i % DUP_EVERY == 0:
        off = 1 + (i // DUP_EVERY) % (DOC_TOKENS - SPAN - 1)
        ws[off:off + SPAN] = [f"boiler{j}" for j in range(SPAN)]


def _plant_tmpl(i: int, ws: list) -> None:
    if i % TMPL_EVERY == 0:
        src = i % N_SOURCES
        ws[10:20] = [f"tmpl{src}n{j}" for j in range(10)]


def checksum(ds, cols):
    """Order-independent crc-mix over doc_id + the named columns."""
    total = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        for did, parts in zip(b["doc_id"].to_pylist(),
                              zip(*(b[c].to_pylist() for c in cols))):
            total ^= zlib.crc32(
                (str(did) + "|" + "|".join(map(str, parts))).encode()
            ) * (did % 65521 + 1)
    return total & 0xFFFFFFFFFFFFFFFF


def run_cell(n_docs: int, cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    import pyarrow.compute as _pc

    from kgrecrun.ops.dedup import dup_span_strip, source_template_strip

    span_docs = _synth(n_docs, _plant_span)
    n = span_docs.count()
    planted_dup = len(range(0, n, DUP_EVERY))
    planted_tmpl = len(range(0, n, TMPL_EVERY))

    t0 = time.time()
    out = dup_span_strip(span_docs, k=8).materialize()
    span_sec = round(time.time() - t0, 3)
    agg = out.map_batches(
        lambda b: pa.table({
            "docs_with_dup": [int(_pc.sum(_pc.cast(
                _pc.greater(b["dup_tokens"], 0), pa.int64())).as_py() or 0)],
            "dup_tokens": [int(_pc.sum(b["dup_tokens"]).as_py() or 0)],
        }), batch_format="pyarrow").to_pandas().sum()
    span_ck = checksum(out, ["dup_tokens", "text_clean"])
    assert int(agg["docs_with_dup"]) == planted_dup, (agg, planted_dup)
    assert int(agg["dup_tokens"]) == planted_dup * SPAN, agg

    tmpl_docs = _synth(n_docs, _plant_tmpl)
    t1 = time.time()
    out2 = source_template_strip(tmpl_docs).materialize()
    tmpl_sec = round(time.time() - t1, 3)
    agg2 = out2.map_batches(
        lambda b: pa.table({
            "tmpl_segs": [int(_pc.sum(b["n_template_segs"]).as_py() or 0)],
            "docs_with_tmpl": [int(_pc.sum(_pc.cast(
                _pc.greater(b["n_template_segs"], 0),
                pa.int64())).as_py() or 0)],
        }), batch_format="pyarrow").to_pandas().sum()
    tmpl_ck = checksum(out2, ["n_template_segs", "text_clean"])
    assert int(agg2["tmpl_segs"]) == planted_tmpl, (agg2, planted_tmpl)
    assert int(agg2["docs_with_tmpl"]) == planted_tmpl, agg2

    ray.shutdown()
    return {
        "cpus": cpus, "n_docs": n,
        "span_sec": span_sec,
        "span_docs_per_sec": round(n / span_sec, 1),
        "span_docs_with_dup": int(agg["docs_with_dup"]),
        "span_dup_tokens": int(agg["dup_tokens"]),
        "span_checksum": span_ck,
        "tmpl_sec": tmpl_sec,
        "tmpl_docs_per_sec": round(n / tmpl_sec, 1),
        "tmpl_template_segs": int(agg2["tmpl_segs"]),
        "tmpl_checksum": tmpl_ck,
    }


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cpus = [int(c) for c in sys.argv[2:]] or [8, 32]
    cells = [run_cell(n_docs, c) for c in cpus]
    for a in cells[1:]:
        assert a["span_checksum"] == cells[0]["span_checksum"], cells
        assert a["tmpl_checksum"] == cells[0]["tmpl_checksum"], cells
    print(json.dumps({"cells": cells, "bit_identical": True}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
