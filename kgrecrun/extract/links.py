"""Anchor/link extraction — the web-graph signal table.

Every large-scale web pipeline keeps, besides the extracted article
text, the LINK layer: for each page, the outgoing ``(target url,
anchor text)`` pairs, and per target the aggregated anchor-text counts
(the classic IR ranking signal: what the web calls a page). The
reference's kernel consumes the same ``<a>`` events for its pagination
scan (readabilitySAX.js:335-403 ancestor walk; kernel.py ``_scan_link``)
— this module walks the identical serialized SAX event stream
(extract/events.py) but keeps EVERY anchor, not just pagination
candidates, and resolves hrefs with the same iframe.js:153-178 rules
the sanitizer uses (sanitize/stage.py ``resolve_url``).

Scale shape: link extraction is a stateless per-page map (task pool,
Arrow in/out); the aggregate ships one combined ``(src, target,
anchor, cnt)`` row per page-target-anchor — page-order, never
anchor-occurrence-order — through ONE hash-bucketed exchange (256
int32 buckets, the repo's standard bucketed-groupby: dispatch is
capped at n_buckets regardless of how many distinct targets exist).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..kg.unionfind import hash_bucket
from ..sanitize.stage import resolve_url
from .events import html_to_events


def page_anchors(url: str, html: str) -> list[tuple[str, str]]:
    """(resolved target, whitespace-normalized anchor text) pairs for
    one page, in document order. Nested markup inside an anchor
    contributes its text; anchors without an ``href`` are skipped."""
    out: list[tuple[str, str]] = []
    in_a = False
    last_open = ""
    href: str | None = None
    texts: list[str] = []
    for ev in html_to_events(html):
        kind = ev[0]
        if kind == "open":
            last_open = ev[1]
            if ev[1] == "a":
                in_a, href, texts = True, None, []
        elif kind == "attr":
            if in_a and last_open == "a" and ev[1] == "href" and href is None:
                href = ev[2]
        elif kind == "text":
            if in_a:
                texts.append(ev[1])
        elif kind == "close" and ev[1] == "a" and in_a:
            if href is not None:
                anchor = " ".join("".join(texts).split())
                out.append((resolve_url(href, url), anchor))
            in_a = False
    return out


def extract_links(pages):
    """pages (url, html) → Dataset (src_url, target, anchor), one row
    per anchor occurrence in document order. Stateless task-pool map
    (trivial init — the elastic task pool beats actors here, see
    ops/media.py phash_dedup note)."""

    def batch_links(batch: pa.Table) -> pa.Table:
        src, tgt, anc = [], [], []
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        for u, h in zip(urls, htmls):
            for t, a in page_anchors(u, h):
                src.append(u)
                tgt.append(t)
                anc.append(a)
        return pa.table({
            "src_url": pa.array(src, pa.string()),
            "target": pa.array(tgt, pa.string()),
            "anchor": pa.array(anc, pa.string()),
        })

    return pages.map_batches(batch_links, batch_format="pyarrow",
                             batch_size=256)


def anchor_text_table(pages, *, n_buckets: int = 256):
    """Per-(target, anchor) link statistics over a page corpus →
    Dataset (target, anchor, n_links, n_pages).

    ``n_links`` counts anchor occurrences; ``n_pages`` counts distinct
    source pages. Map-side combiner: one (src, target, anchor, cnt)
    row per page-target-anchor per block; fold: per bucket, a local
    per-source merge (exact even if Ray splits a page's rows across
    blocks) then the (target, anchor) rollup — the only exchange is
    the bucketed combiner rows."""
    links = extract_links(pages)

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.group_by(["src_url", "target", "anchor"])
             .aggregate([([], "count_all")]))
        cnt = g["count_all"] if "count_all" in g.column_names else g.column(
            g.num_columns - 1)
        t = pa.table({
            "src_url": g["src_url"],
            "target": g["target"],
            "anchor": g["anchor"],
            "cnt": pc.cast(cnt, pa.int64()),
        })
        return t.append_column(
            "__bucket", hash_bucket(t["target"].combine_chunks(), n_buckets))

    def fold(group: pa.Table) -> pa.Table:
        merged = (group.select(["src_url", "target", "anchor", "cnt"])
                  .group_by(["src_url", "target", "anchor"])
                  .aggregate([("cnt", "sum")]))
        g = (merged.group_by(["target", "anchor"])
             .aggregate([("cnt_sum", "sum"), ([], "count_all")]))
        # name-based selection (ADVICE: positional rename_columns after
        # group_by is a pyarrow-version hazard)
        return pa.table({
            "target": g["target"],
            "anchor": g["anchor"],
            "n_links": pc.cast(g["cnt_sum_sum"], pa.int64()),
            "n_pages": pc.cast(g["count_all"], pa.int64()),
        })

    return (links.map_batches(partial, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(fold, batch_format="pyarrow"))
