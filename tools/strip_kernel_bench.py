"""Window-fingerprint KERNEL microbench (round-5): the per-batch map
cost of dup_span_strip's to_windows in both fingerprint modes, isolated
from the shuffle. This is the number that matters for the 100-TB CPU
bill — at 32 cpus the e2e wall time is exchange-dominated and hides the
map stage (tools/strip_stress.py measures that), but every fleet core
still pays the kernel cost per token.

Corpus: 20k docs x 40 tokens, 2/3 globally-unique tokens (worst case
for any vocabulary reuse). Usage: python tools/strip_kernel_bench.py
Prints one JSON: per-mode best-of-3 sec + windows/sec + speedup.
"""
import hashlib
import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from kgrecrun.ops import dedup                       # noqa: E402
from kgrecrun.textnorm import ascii_words            # noqa: E402

K = 8


def md5_kernel(batch: pa.Table) -> int:
    hs, dids, poss = [], [], []
    for did, t in zip(batch["doc_id"].to_pylist(),
                      batch["text"].to_pylist()):
        ws = ascii_words(t or "")
        for p in range(0, len(ws) - K + 1):
            hs.append(hashlib.md5(
                " ".join(ws[p:p + K]).encode("utf-8")).digest())
            dids.append(did)
            poss.append(p)
    return len(hs)


def xxh_kernel(batch: pa.Table) -> int:
    flat, lens = dedup._flat_tokens(batch["text"])
    nw = np.maximum(lens - K + 1, 0)
    total = int(nw.sum())
    win_doc = np.repeat(np.arange(lens.size), nw)
    pos = np.arange(total, dtype=np.int64) - (np.cumsum(nw) - nw)[win_doc]
    gstart = (np.cumsum(lens) - lens)[win_doc] + pos
    h1, h2 = dedup._xxh_pair(flat)
    b1, b2 = np.uint64(0x100000001B3), np.uint64(0xC6A4A7935BD1E995)
    w1, w2 = h1[gstart].copy(), h2[gstart].copy()
    for i in range(1, K):
        gi = gstart + i
        w1 = w1 * b1 + h1[gi]
        w2 = w2 * b2 + h2[gi]
    return len(dedup._pack_bin16(w1, w2))


def main() -> int:
    n_docs = 20000
    texts = []
    for i in range(n_docs):
        ws = [f"u{i * 40 + j}" if (i % 3) else f"v{j}" for j in range(40)]
        texts.append(" ".join(ws))
    batch = pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                      "text": pa.array(texts)})
    res = {}
    for name, fn in (("md5", md5_kernel), ("xxh128", xxh_kernel)):
        best, n = 1e9, 0
        for _ in range(3):
            t0 = time.time()
            n = fn(batch)
            best = min(best, time.time() - t0)
        res[name] = {"sec": round(best, 4), "windows": n,
                     "wins_per_sec": round(n / best)}
    res["speedup"] = round(res["md5"]["sec"] / res["xxh128"]["sec"], 2)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
