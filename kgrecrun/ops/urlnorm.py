"""URL canonicalization — the key function under crawl-level dedup:
two fetches of the "same" page differ by case, default ports,
fragments, tracking params and query order long before their bodies
differ. Canonicalize first and exact/near dedup collapses them.

Rules (applied in order; the driver oracle states the expected
canonical string per planted variant in closed form, so none of this
logic exists on the SQL side — the strongest independence the repo's
oracle styles offer):

1. scheme and host lowercase
2. default port stripped (``:80`` for http, ``:443`` for https)
3. fragment dropped
4. tracking params dropped (utm_*, gclid, fbclid, msclkid, mc_cid,
   mc_eid, igshid, ref — matched against the full ``k=v`` token)
5. surviving params sorted lexicographically by their ``k=v`` string
6. empty query / empty path normalized away (path falls back to ``/``)

Deliberately NOT done (documented scope): percent-encoding
normalization and dot-segment resolution — both are rare in crawl
frontiers that absolutized with a real resolver (sanitize/stage.py's
resolve_url already emits dot-free paths), and neither is cleanly
expressible in the SQL oracle. A url that doesn't parse is passed
through unchanged — canonicalization must never lose a frontier entry.

Scale shape: a stateless vectorized map stage (compiled regexes, no
state, no shuffle) — composes in front of any dedup / frontier
anti-join at zero exchange cost.
"""

from __future__ import annotations

import re

import pyarrow as pa

# matched against the full "k=v" token (RE2-compatible for SQL reuse)
TRACKING_PATTERN = (
    r"^(utm_[^=&]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid|ref)(=|$)")
_TRACKING_RE = re.compile(TRACKING_PATTERN)

_URL_RE = re.compile(
    r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$")


def canonicalize_url(url: str) -> str:
    m = _URL_RE.match(url or "")
    if m is None:
        return url  # pass through: never lose a frontier entry
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = m.group(3) or "/"
    out = f"{scheme}://{host}{path}"
    query = m.group(4)
    if query:
        kept = sorted(p for p in query.split("&")
                      if p and not _TRACKING_RE.match(p))
        if kept:
            out += "?" + "&".join(kept)
    return out


def canonical_urls(ds, col: str = "url", out_col: str = "canonical_url"):
    """Dataset stage: append the canonical form of ``col``."""

    def add(batch: pa.Table) -> pa.Table:
        vals = [canonicalize_url(u) for u in batch[col].to_pylist()]
        return batch.append_column(out_col, pa.array(vals, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")
