"""Entity canonicalization: minhash-LSH blocking over entity names →
in-block pairwise jaccard verification → union-find connected
components → canonical (smallest-id) cluster roots.

Data flow (all-Dataset until the verified edge list, which is ≪ the
entity count):

    entities(entity_id, canonical)
      → flat_map: minhash signature → one row per LSH band key
      → groupby(hash(band_key) % n_buckets): bucketed segment sweep
        verifies pairs (names_match) → edges
      → union-find (driver for the verified edges; see kg.unionfind for
        the fully-distributed label-propagation variant when even the
        edge list exceeds driver memory)
      → mapping entity_id → root id

Skew handling: a degenerate block (many near-identical names — a hot
key) is windowed: rows are sorted by name and each row is only compared
to its ``window`` neighbors, bounding work per block at O(n·w) instead
of O(n²). That is the salting analogue for blocking keys (SURVEY.md
§4.2); exact duplicates sort adjacent so recall is unaffected.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .minhash import MinHasher, jaccard, shingles
from .unionfind import UnionFind


class BandEmitter:
    """entities → one row per (band_key, entity_id, canonical)."""

    def __init__(self, num_perm: int = 64, bands: int = 16):
        self.hasher = MinHasher(num_perm)
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, ids, names = [], [], []
        for eid, name in zip(batch["entity_id"].to_pylist(), batch["canonical"].to_pylist()):
            sig = self.hasher.signature(shingles(name))
            for k in self.hasher.band_keys(sig, self.bands):
                keys.append(k)
                ids.append(eid)
                names.append(name)
        return pa.table(
            {
                "band_key": pa.array(keys, pa.int64()),
                "entity_id": pa.array(ids, pa.string()),
                "canonical": pa.array(names, pa.string()),
            }
        )


_CORP_SUFFIXES = frozenset(
    ("inc", "inc.", "incorporated", "ltd", "ltd.", "llc", "corp", "corp.", "co", "co.", "group")
)


def _norm_tokens(name: str) -> list[str]:
    toks = name.lower().split()
    while toks and toks[-1] in _CORP_SUFFIXES:
        toks.pop()
    return toks


def _one_char_deletion(a: str, b: str) -> bool:
    """True iff one string is the other minus exactly one character."""
    if abs(len(a) - len(b)) != 1:
        return False
    long, short = (a, b) if len(a) > len(b) else (b, a)
    for i in range(len(long)):
        if long[:i] + long[i + 1:] == short:
            return True
    return False


def names_match(a: str, b: str) -> bool:
    """Duplicate-record verifier: same name modulo corporate suffixes and
    at most one dropped character in one token. Deliberately does NOT
    accept single-character substitutions — those are how *different*
    names differ ('Jorvale'/'Norvale', 'Ivan'/'Joan'), while duplicate
    records differ by truncation/typo-drops ('Analytics'/'Aalytics') and
    legal-suffix variation ('X'/'X Inc.')."""
    ta, tb = _norm_tokens(a), _norm_tokens(b)
    if ta == tb:
        return bool(ta)
    if len(ta) != len(tb):
        return False
    diffs = [(x, y) for x, y in zip(ta, tb) if x != y]
    return len(diffs) == 1 and _one_char_deletion(*diffs[0])


def _verify_block(block: pa.Table, window: int) -> pa.Table:
    ids = block["entity_id"].to_pylist()
    names = block["canonical"].to_pylist()
    order = sorted(range(len(ids)), key=lambda i: (names[i], ids[i]))
    srcs, dsts = [], []
    n = len(order)
    for pos in range(n):
        i = order[pos]
        for pos2 in range(pos + 1, min(pos + 1 + window, n)):
            j = order[pos2]
            if ids[i] == ids[j]:
                continue
            if names_match(names[i], names[j]):
                a, b = sorted((ids[i], ids[j]))
                srcs.append(a)
                dsts.append(b)
    return pa.table({"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())})


def candidate_edges(entities_ds, *, num_perm: int = 64, bands: int = 32, window: int = 16,
                    n_buckets: int = 256):
    """entities Dataset → verified similarity edges Dataset (src < dst).

    bands=32 over 64 perms (r=2) keeps blocking recall ≥0.999 down to
    jaccard ≈ 0.5 — the hardest true duplicates ('X' vs 'X Incorporated')
    sit there. The permissive blocking is safe because verification
    (names_match) carries precision, and block cost is bounded by the
    sort-window.

    Dispatch is BUCKETED (band keys hash into ``n_buckets`` groups; one
    sort + segment sweep per group) — per-band ``map_groups`` would cost
    one Python call per (entity, band) pair, ~entities×32 at catalog
    scale. The pair set is identical: window over the (name, id)-sorted
    order within each band segment."""
    from .unionfind import hash_bucket

    banded = entities_ds.map_batches(
        BandEmitter(num_perm, bands), batch_format="pyarrow", batch_size=1024
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", hash_bucket(batch["band_key"].combine_chunks(), n_buckets)
        )

    def verify_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("band_key", "ascending"),
                ("canonical", "ascending"),
                ("entity_id", "ascending"),
            ],
        )
        g = group.take(order)
        bk = g["band_key"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = g["entity_id"].to_pylist()
        names = g["canonical"].to_pylist()
        srcs, dsts = [], []
        n = len(ids)
        for pos in range(n):
            for pos2 in range(pos + 1, min(pos + 1 + window, n)):
                if bk[pos2] != bk[pos]:  # band-segment boundary
                    break
                if ids[pos] == ids[pos2]:
                    continue
                if names_match(names[pos], names[pos2]):
                    a, b = sorted((ids[pos], ids[pos2]))
                    srcs.append(a)
                    dsts.append(b)
        return pa.table({"src": pa.array(srcs, pa.string()),
                         "dst": pa.array(dsts, pa.string())})

    return banded.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("__bucket").map_groups(verify_bucket, batch_format="pyarrow")


def canonicalize(entities_ds, **kwargs) -> dict[str, str]:
    """Full canonicalization → {entity_id: cluster_root_id}. Ids not in
    any cluster map to themselves lazily via .get(id, id)."""
    edges = candidate_edges(entities_ds, **kwargs)
    uf = UnionFind()
    seen = set()
    for batch in edges.iter_batches(batch_format="pyarrow"):
        for a, b in zip(batch["src"].to_pylist(), batch["dst"].to_pylist()):
            if (a, b) in seen:  # band keys duplicate pairs; cheap dedup
                continue
            seen.add((a, b))
            uf.union(a, b)
    return uf.components()


def canonicalize_table(entities: pa.Table, *, num_perm: int = 64, bands: int = 32,
                       window: int = 16) -> dict[str, str]:
    """In-process fast path for a driver-resident entity table (same
    blocking + verification as :func:`canonicalize`, no Ray job). The
    entity catalog is orders of magnitude smaller than the corpus; below
    ~10^5 rows a distributed pass is pure fixed overhead, so the
    pipeline uses this and falls back to the Dataset path above only for
    huge catalogs (SURVEY.md §7.3 driver-side union-find fallback)."""
    banded = BandEmitter(num_perm, bands)(entities)
    uf = UnionFind()
    by_band: dict[int, list[int]] = {}
    for i, k in enumerate(banded["band_key"].to_pylist()):
        by_band.setdefault(k, []).append(i)
    seen = set()
    for rows in by_band.values():
        if len(rows) < 2:
            continue
        block = banded.take(pa.array(rows))
        edges = _verify_block(block, window)
        for a, b in zip(edges["src"].to_pylist(), edges["dst"].to_pylist()):
            if (a, b) not in seen:
                seen.add((a, b))
                uf.union(a, b)
    return uf.components()


TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("n_sources", pa.int64()),
    ]
)


class ApplyCanonical:
    """triples_linked → canonical-id triples (subj, pred, obj) with the
    cluster mapping broadcast once per actor."""

    def __init__(self, mapping):
        from .resources import resolve

        self.mapping = resolve(mapping)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.mapping
        subj = [m.get(x, x) for x in batch["subj_id"].to_pylist()]
        obj = [m.get(x, x) for x in batch["obj_id"].to_pylist()]
        return pa.table(
            {
                "subj": pa.array(subj, pa.string()),
                "pred": batch["pred"],
                "obj": pa.array(obj, pa.string()),
                "url": batch["url"],
            }
        )


def canonical_triples(linked_ds, mapping_ref, *, batch_size: int = 4096, concurrency=(1, 8)):
    return linked_ds.map_batches(
        ApplyCanonical,
        fn_constructor_kwargs={"mapping": mapping_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def dedup_triples(canonical_ds, num_partitions: int | None = None):
    """Exact triple dedup with provenance count. Pre-aggregates inside
    each block (combiner) before the global shuffle so the exchange
    carries one row per distinct triple per block, not per occurrence."""

    def local_agg(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["subj", "pred", "obj"]).aggregate([("url", "count")])
        return (g.select(["subj", "pred", "obj", "url_count"])
                 .rename_columns(["subj", "pred", "obj", "n_local"]))

    pre = canonical_ds.map_batches(local_agg, batch_format="pyarrow")
    agg = pre.groupby(["subj", "pred", "obj"]).sum("n_local")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["subj", "pred", "obj", "n_sources"])

    return agg.map_batches(rename, batch_format="pyarrow")
