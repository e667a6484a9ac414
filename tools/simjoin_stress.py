"""allpairs_jaccard_join at scale: synthetic corpus with planted
near-dup pairs, two parallelism levels, cross-parallelism checksum
identity + exact expected-pair accounting.

Corpus: n_docs docs × 30 tokens drawn per-doc from a deterministic
per-doc multiplicative-hash stream over a 50k-word vocabulary (so
random docs share almost no 3-shingles). Every doc whose id % 100 == 0
gets a planted near-dup at id+1: the same token stream with ONE token
edited — 3 of 28 shingles differ, jaccard = 25/31 ≈ 0.806, far above
the t = 1/2 threshold, while unplanted pairs sit at ~0. So the exact
answer is KNOWN: exactly n_docs/100 pairs, each with
(inter, uni) = (25, 31).

Validation: pair count == n_docs // 100, every (inter, uni) == (25,
31), and an order-free uint64 checksum over md5(a|b|inter|uni) that
must match across parallelism levels (same protocol as the other
stress tools — cross-parallelism bit-identity is the sandbox's stand-in
for the two-cluster-size run).

Usage: python tools/simjoin_stress.py [n_docs] [cpus]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

VOCAB = 50_000
DOC_TOKENS = 30


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.ops.simjoin import allpairs_jaccard_join

    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False)
        texts = []
        for d in ids:
            base = int(d) - 1 if int(d) % 100 == 1 else int(d)
            # per-position md5 tokens: any LINEAR stream (tried first)
            # lets whole token sequences collide at offsets Δ where
            # Δ·step ≡ 0 mod VOCAB — planting millions of genuinely
            # similar pairs the protocol did not intend; independent
            # per-(doc, position) hashing has no such structure
            toks = [
                "w%d" % (int.from_bytes(
                    hashlib.md5(f"{base}|{i}".encode()).digest()[:8],
                    "little") % VOCAB)
                for i in range(DOC_TOKENS)
            ]
            if int(d) % 100 == 1:  # planted near-dup of d-1: edit 1 token
                toks[14] = "edited"
            texts.append(" ".join(toks))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    ds = (ray.data.range(n, override_num_blocks=64)
          .map_batches(gen, batch_format="pyarrow")
          .materialize())

    t0 = time.time()
    out = allpairs_jaccard_join(ds).materialize()
    elapsed = time.time() - t0

    ck = np.uint64(0)
    pairs = ok = 0
    for batch in out.iter_batches(batch_format="pyarrow"):
        pairs += batch.num_rows
        for a, b, i, u in zip(batch["a"].to_pylist(),
                              batch["b"].to_pylist(),
                              batch["inter"].to_pylist(),
                              batch["uni"].to_pylist()):
            h = hashlib.md5(f"{a}|{b}|{i}|{u}".encode()).digest()
            ck = np.uint64(ck + np.uint64(int.from_bytes(h[:8], "big")))
            ok += int(i == 25 and u == 31 and b == a + 1 and a % 100 == 0)
    expected = n // 100
    rec = {
        "mode": "simjoin", "n_docs": n, "num_cpus": cpus,
        "wall_sec": round(elapsed, 2),
        "docs_per_sec": round(n / elapsed, 1),
        "pairs": pairs,
        "expected_pairs": expected,
        "all_pairs_exact": bool(ok == expected and pairs == expected),
        "checksum": int(ck),
    }
    print(json.dumps(rec))
    ray.shutdown()


def edit1_main() -> None:
    """--edit1 mode: n md5-hex strings (structureless — zero natural
    distance-1 pairs) + one single-char-substituted twin per 50 ids →
    the exact answer is n/50 pairs; order-free checksum certified
    across parallelism. Usage: ... --edit1 [n] [cpus]."""
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 200_000
    cpus = int(args[1]) if len(args) > 1 else 32

    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.ops.simjoin import edit1_join

    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False)
        rows = []
        for d in ids:
            s = hashlib.md5(f"s{int(d)}".encode()).hexdigest()
            rows.append(s)
            if int(d) % 50 == 0:
                rows.append(s[:7] + "z" + s[8:])  # hex has no 'z'
        return pa.table({"w": pa.array(rows, pa.string())})

    ds = (ray.data.range(n, override_num_blocks=64)
          .map_batches(gen, batch_format="pyarrow").materialize())
    t0 = time.time()
    out = edit1_join(ds, col="w").materialize()
    elapsed = time.time() - t0

    ck = np.uint64(0)
    pairs = 0
    for batch in out.iter_batches(batch_format="pyarrow"):
        pairs += batch.num_rows
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            h = hashlib.md5(f"{a}|{b}".encode()).digest()
            ck = np.uint64(ck + np.uint64(int.from_bytes(h[:8], "big")))
    expected = (n + 49) // 50
    print(json.dumps({
        "mode": "edit1", "n_strings": n + expected, "num_cpus": cpus,
        "wall_sec": round(elapsed, 2),
        "strings_per_sec": round((n + expected) / elapsed, 1),
        "pairs": pairs, "expected_pairs": expected,
        "exact": pairs == expected, "checksum": int(ck),
    }))
    ray.shutdown()


if __name__ == "__main__":
    if "--edit1" in sys.argv:
        edit1_main()
    else:
        main()
