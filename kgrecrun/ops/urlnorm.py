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
4. percent-encoding normalized in path and query (RFC 3986 §6.2.2.2:
   escapes of UNRESERVED characters decode — ``%41``→``A``,
   ``%7E``→``~``, ``%2E``→``.`` — every other valid escape uppercases
   its hex; malformed escapes pass through). Decoding only unreserved
   characters can never produce a delimiter, so the url's structure is
   fixed before this rule runs and the rule is idempotent.
5. dot segments resolved in the path (RFC 3986 §5.2.4
   remove-dot-segments: ``/a/./b/../c`` → ``/a/c``, leading ``..``
   dropped, trailing ``.``/``..`` leaves a trailing slash) — the
   reference's nextPage resolver collapses ``..``/``.`` the same way
   (rsax.js:244-308); runs AFTER rule 4 so a decoded ``%2E`` segment
   collapses in the same pass (idempotence).
6. tracking params dropped (utm_*, gclid, fbclid, msclkid, mc_cid,
   mc_eid, igshid, ref — matched against the full ``k=v`` token)
7. surviving params sorted lexicographically by their ``k=v`` string
8. empty query / empty path normalized away (path falls back to ``/``)

A url that doesn't parse is passed through unchanged —
canonicalization must never lose a frontier entry.

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

_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")


def _norm_pct(s: str) -> str:
    """RFC 3986 §6.2.2.2: decode escapes of unreserved characters,
    uppercase the hex of every other valid escape; truly malformed
    escapes pass through. Unreserved output can never be a delimiter,
    so structure is preserved.

    Runs the substitution to a FIXPOINT: on malformed input a decode
    can synthesize a new valid escape out of an adjacent literal '%'
    (``%%341`` → ``%41`` → ``A``), so a single pass would break the
    canonicalizer's idempotence contract. Each iteration that changes
    anything removes at least one '%' (case-only rewrites are stable),
    so the loop terminates in ≤ count('%') rounds."""
    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    while True:
        out = _PCT_RE.sub(repl, s)
        if out == s:
            return out
        s = out


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 over an absolute path: ``.`` segments vanish,
    ``..`` pops (leading ``..`` drops), a trailing ``.``/``..`` leaves
    the directory's trailing slash. Relative paths (never produced
    after host extraction) pass through."""
    if not path.startswith("/") or "/." not in path:
        return path
    segs = path[1:].split("/")
    stack: list[str] = []
    for i, seg in enumerate(segs):
        if seg == ".":
            if i == len(segs) - 1:      # trailing "." keeps the slash
                stack.append("")
            continue
        if seg == "..":
            if stack:
                stack.pop()
            if i == len(segs) - 1:      # trailing ".." keeps the slash
                stack.append("")
            continue
        stack.append(seg)
    return "/" + "/".join(stack)


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
    path = _remove_dot_segments(_norm_pct(m.group(3) or "/"))
    out = f"{scheme}://{host}{path}"
    query = m.group(4)
    if query:
        kept = sorted(p for p in _norm_pct(query).split("&")
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
