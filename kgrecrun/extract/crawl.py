"""Multi-page crawl frontier: the reference's ``linksToSkip`` anti-join
(readabilitySAX.js:237, checked at 341: a discovered next-page href is
skipped if already parsed) lifted to corpus scale.

``frontier = next_page links ANTI JOIN seen urls`` — expressed as one
``groupby(url)`` over the union of (candidate, seen) streams rather
than a hash join: both sides are projected to (url, flag) first, so the
shuffle carries two narrow columns, and the groupby emits a url iff no
``seen`` row landed in its group. Holds at any scale; no driver-side
set, no broadcast of the (unbounded) seen-url list.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def next_page_candidates(articles_ds):
    """articles → distinct-per-block (url=next_page) candidates."""

    def f(batch: pa.Table) -> pa.Table:
        kept = batch.filter(
            pc.and_(
                pc.is_valid(batch["next_page"]),
                pc.greater(pc.utf8_length(batch["next_page"]), 0),
            )
        )
        t = pa.table({"url": kept["next_page"]})
        return t.group_by(["url"]).aggregate([]).select(["url"])

    return articles_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def crawl_frontier(articles_ds, seen_urls_ds):
    """→ Dataset(url) of next-page links not yet fetched.

    ``seen_urls_ds`` is any Dataset with a ``url`` column (typically the
    pages table already processed this round)."""

    def tag(flag: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "url": batch["url"],
                    "seen": pa.array([flag] * batch.num_rows, pa.int8()),
                }
            )

        return f

    candidates = next_page_candidates(articles_ds).map_batches(
        tag(0), batch_format="pyarrow"
    )
    seen = seen_urls_ds.map_batches(tag(1), batch_format="pyarrow")

    unioned = candidates.union(seen)
    agg = unioned.groupby("url").max("seen")

    def keep_unseen(batch: pa.Table) -> pa.Table:
        b = batch.rename_columns(["url", "seen"])
        return b.filter(pc.equal(b["seen"], 0)).select(["url"])

    return agg.map_batches(keep_unseen, batch_format="pyarrow")
