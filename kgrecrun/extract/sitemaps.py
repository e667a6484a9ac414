"""Sitemap XML parsing — the crawl-discovery companion to the robots
gate: a host's sitemap seeds the frontier with known urls and their
last-modified times (recrawl scheduling reads lastmod; changefreq and
priority are carried as hints).

``parse_sitemap`` handles both document kinds of sitemaps.org protocol:
``<urlset>`` (url entries → kind="url") and ``<sitemapindex>`` (nested
sitemap references → kind="sitemap", which the caller resolves —
resolution is I/O, not parsing, so it stays out of this module).
Namespaced and namespace-free documents both parse; lastmod accepts
the W3C datetime forms (date-only through fractional-second UTC) and
is returned as exact epoch-µs. stdlib ElementTree does not resolve
external entities, so the parser is not an XXE vector.

``sitemap_frontier`` is the Ray stage: a Dataset of (host, xml) blobs
flat-maps into frontier rows — stateless, no shuffle; compose the
output straight into the robots gate then the crawl anti-join.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from datetime import datetime, timedelta, timezone

import pyarrow as pa

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)
_US = timedelta(microseconds=1)
_TAG_RE = re.compile(r"^(?:\{[^}]*\})?(.*)$")  # strip xmlns braces


def _local(tag: str) -> str:
    return _TAG_RE.match(tag).group(1)


def parse_lastmod(s: str | None) -> int | None:
    """W3C datetime → epoch-µs (integer arithmetic; None passes
    through). Accepts YYYY-MM-DD, full ISO with 'Z' or ±hh:mm offsets,
    with or without fractional seconds."""
    if not s:
        return None
    s = s.strip()
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}", s):
        dt = datetime.strptime(s, "%Y-%m-%d").replace(tzinfo=timezone.utc)
    else:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
    return (dt - _EPOCH) // _US


def parse_sitemap(xml_bytes: bytes) -> list[dict]:
    """sitemap/sitemapindex document → rows of
    (kind, loc, lastmod_us, changefreq, priority)."""
    root = ET.fromstring(xml_bytes)
    root_kind = _local(root.tag)
    if root_kind == "urlset":
        entry_tag, kind = "url", "url"
    elif root_kind == "sitemapindex":
        entry_tag, kind = "sitemap", "sitemap"
    else:
        raise ValueError(f"not a sitemap document: <{root_kind}>")
    rows = []
    for el in root:
        if _local(el.tag) != entry_tag:
            continue
        fields = {_local(c.tag): (c.text or "").strip() for c in el}
        loc = fields.get("loc", "")
        if not loc:
            continue
        rows.append({
            "kind": kind,
            "loc": loc,
            "lastmod_us": parse_lastmod(fields.get("lastmod")),
            "changefreq": fields.get("changefreq", "") or "",
            "priority": fields.get("priority", "") or "",
        })
    return rows


FRONTIER_SCHEMA = pa.schema([
    ("host", pa.string()),
    ("kind", pa.string()),
    ("loc", pa.string()),
    ("lastmod_us", pa.int64()),
    ("changefreq", pa.string()),
    ("priority", pa.string()),
])


def sitemap_frontier(sitemaps):
    """Dataset of (host, xml binary) → frontier rows (FRONTIER_SCHEMA).
    Stateless flat-map; malformed documents raise — a corrupt sitemap
    should fail loudly at ingest, like a torn WARC shard."""

    def explode(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in
               ("host", "kind", "loc", "lastmod_us", "changefreq",
                "priority")}
        for host, xml in zip(batch["host"].to_pylist(),
                             batch["xml"].to_pylist()):
            for row in parse_sitemap(xml):
                out["host"].append(host)
                out["kind"].append(row["kind"])
                out["loc"].append(row["loc"])
                out["lastmod_us"].append(row["lastmod_us"])
                out["changefreq"].append(row["changefreq"])
                out["priority"].append(row["priority"])
        return pa.table({
            "host": pa.array(out["host"], pa.string()),
            "kind": pa.array(out["kind"], pa.string()),
            "loc": pa.array(out["loc"], pa.string()),
            "lastmod_us": pa.array(out["lastmod_us"], pa.int64()),
            "changefreq": pa.array(out["changefreq"], pa.string()),
            "priority": pa.array(out["priority"], pa.string()),
        })

    return sitemaps.map_batches(explode, batch_format="pyarrow")


def render_sitemap(urls: list[str], lastmods_us: list[int | None],
                   changefreqs: list[str] | None = None) -> bytes:
    """urlset XML for tests/synthesis (namespaced, fractional-second
    UTC lastmod — round-trips epoch-µs exactly through parse_lastmod)."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for i, (u, ts) in enumerate(zip(urls, lastmods_us)):
        parts.append("<url>")
        parts.append(f"<loc>{u}</loc>")
        if ts is not None:
            stamp = (_EPOCH + int(ts) * _US).strftime(
                "%Y-%m-%dT%H:%M:%S.%fZ")
            parts.append(f"<lastmod>{stamp}</lastmod>")
        if changefreqs is not None:
            parts.append(f"<changefreq>{changefreqs[i]}</changefreq>")
        parts.append("</url>")
    parts.append("</urlset>")
    return "\n".join(parts).encode("utf-8")
