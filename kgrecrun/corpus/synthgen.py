"""Deterministic Common-Crawl-style page generator.

Produces the ``pages`` input table of BASELINE.json's input_hint —
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` — plus the planted ground-truth ``triples_expected``
table used for the KG P/R gate. Every row is a pure function of
``(seed, doc_id)``, so generation itself runs as a Ray Data pipeline
(``range(n) → map_batches``) and any shard can be regenerated
independently at any scale.

Generated HTML stays in the zone where HTML5 parsers agree (explicit
closes, no error recovery) per FIXTURES.md §3, and wraps the article in
site boilerplate (nav/aside/footer/links/images/pagination) that the
extraction kernel is expected to strip.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

import pyarrow as pa

from . import world as W

BASE_TS = int(datetime(2025, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)

_SECTIONS = ("politics", "world", "science", "sport", "culture", "business", "tech")

_HEADLINE_HEADS = (
    "Regional council approves the new river plan",
    "Survey shows steady gains across the northern districts",
    "Archive project enters its final cataloguing phase",
    "Transit upgrade wins broad support in public hearings",
    "Researchers publish long-awaited climate findings",
    "Festival returns with record attendance expected",
    "Port authority outlines a ten-year expansion",
    "Historic bridge reopens after three-year restoration",
)


def _headline(rng: random.Random, site: str) -> str:
    head = rng.choice(_HEADLINE_HEADS)
    style = rng.random()
    if style < 0.3:
        return f"{head} | {site}"
    if style < 0.5:
        return f"{head} - {site} News"
    if style < 0.6:
        return f"{site}: {head}"
    return head


def _fact_sentence(rng: random.Random, world: W.World):
    pred, template, st, ot = rng.choice(W.TRIPLE_TEMPLATES)
    subj = W.zipf_choice(rng, world.by_type[st])
    obj = W.zipf_choice(rng, world.by_type[ot])
    while obj.entity_id == subj.entity_id:
        obj = W.zipf_choice(rng, world.by_type[ot])
    s_surface = rng.choice(subj.surfaces)
    o_surface = rng.choice(obj.surfaces)
    sentence = template.format(subj=s_surface, obj=o_surface)
    gold = world.gold_clusters
    return sentence, {
        "subj_surface": s_surface,
        "pred": pred,
        "obj_surface": o_surface,
        "subj_id": subj.entity_id,
        "obj_id": obj.entity_id,
        "subj_root": gold[subj.entity_id],
        "obj_root": gold[obj.entity_id],
    }


def _boilerplate_nav(rng: random.Random) -> str:
    links = "".join(
        f'<li><a href="/section/{s}">{s.title()}</a></li>' for s in rng.sample(_SECTIONS, 4)
    )
    return f"<nav><ul>{links}</ul></nav>"


def _boilerplate_aside(rng: random.Random) -> str:
    items = "".join(
        f'<a href="/trending/{i}">Trending story number {i}</a> '
        for i in rng.sample(range(100), 3)
    )
    return f'<aside class="sidebar">{items}</aside>'


def gen_page_row(seed: int, doc_id: int, world: W.World) -> tuple[dict, list[dict]]:
    """One deterministic page + its planted triples."""
    rng = random.Random((seed << 32) ^ doc_id)
    site = f"site{doc_id % 97}.example"
    url = f"https://{site}/{rng.choice(_SECTIONS)}/art-{doc_id}"

    r = rng.random()
    lang = "en" if r < 0.88 else ("de" if r < 0.93 else ("fr" if r < 0.97 else "es"))

    title = _headline(rng, site.split(".")[0].title())
    triples: list[dict] = []
    paragraphs: list[str] = []
    n_paras = rng.randint(3, 8)
    for _ in range(n_paras):
        n_sent = rng.randint(2, 5)
        sents = []
        for _ in range(n_sent):
            if lang == "en" and rng.random() < 0.35:
                sentence, t = _fact_sentence(rng, world)
                t["url"] = url
                triples.append(t)
                sents.append(sentence)
            elif lang == "en":
                sents.append(rng.choice(W.NOISE_SENTENCES))
            else:
                sents.append(rng.choice(W.NON_EN_SENTENCES[lang]))
        paragraphs.append(" ".join(sents))

    body_parts = [_boilerplate_nav(rng)]
    if rng.random() < 0.6:
        body_parts.append(_boilerplate_aside(rng))
    article = "".join(f"<p>{p}</p>" for p in paragraphs)
    if rng.random() < 0.25:
        article += f'<p><img src="/img/{doc_id}.jpg" width="640" height="420"> Staff photograph.</p>'
    body_parts.append(f'<div id="article-{doc_id % 7}" class="story-body">{article}</div>')
    if rng.random() < 0.2:
        nxt = "".join(
            f'<a href="/{url.rsplit("/", 1)[1]}/page-{i}">{i}</a> ' for i in range(1, 4)
        )
        body_parts.append(f'<div class="pager">{nxt}<a href="/{url.rsplit("/", 1)[1]}/page-2">Next &gt;</a></div>')
    body_parts.append(f'<footer><a href="/about">About</a> <a href="/contact-us">Contact</a> Copyright {site}</footer>')

    html = (
        f"<html><head><title>{title}</title></head><body>"
        + "".join(body_parts)
        + "</body></html>"
    )
    raw_text = title + "\n" + "\n".join(paragraphs)
    row = {
        "url": url,
        "warc_ts": BASE_TS + doc_id * 1_000_000,
        "html": html.encode("utf-8"),
        "text": raw_text,
        "lang": lang,
    }
    return row, triples


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

TRIPLES_EXPECTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("subj_surface", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("subj_id", pa.string()),
        ("obj_id", pa.string()),
        ("subj_root", pa.string()),
        ("obj_root", pa.string()),
    ]
)


_WORLD_CACHE: dict[int, W.World] = {}


def get_world(seed: int = 42) -> W.World:
    if seed not in _WORLD_CACHE:
        _WORLD_CACHE[seed] = W.build_world(seed)
    return _WORLD_CACHE[seed]


def gen_batch(doc_ids, seed: int = 42, world: W.World | None = None):
    """Generate a batch of page rows (+expected triples) for the given ids.
    Returns (pages pa.Table, triples pa.Table)."""
    world = world or get_world(seed)
    rows, all_triples = [], []
    for doc_id in doc_ids:
        row, triples = gen_page_row(seed, int(doc_id), world)
        rows.append(row)
        all_triples.extend(triples)
    pages = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    triples_t = pa.Table.from_pylist(all_triples, schema=TRIPLES_EXPECTED_SCHEMA)
    return pages, triples_t


def write_corpus(out_dir: str, n_docs: int, seed: int = 42, shard_size: int = 2000) -> None:
    """Driver-side corpus writer for tests/bench input (small scale). At
    real scale generation runs distributed — see pages_dataset()."""
    import os

    import pyarrow.parquet as pq

    world = get_world(seed)
    os.makedirs(f"{out_dir}/pages", exist_ok=True)
    os.makedirs(f"{out_dir}/triples_expected", exist_ok=True)
    for shard_start in range(0, n_docs, shard_size):
        ids = range(shard_start, min(shard_start + shard_size, n_docs))
        pages, triples = gen_batch(ids, seed, world)
        pq.write_table(pages, f"{out_dir}/pages/part-{shard_start:08d}.parquet")
        pq.write_table(triples, f"{out_dir}/triples_expected/part-{shard_start:08d}.parquet")


def pages_dataset(n_docs: int, seed: int = 42, *, override_num_blocks: int | None = None):
    """The pages table as a lazily-generated Ray Dataset — generation is
    itself a distributed map_batches over a range, so corpus creation
    scales with the cluster instead of the driver."""
    import ray.data

    def _gen(batch):
        ids = batch["id"].to_pylist()
        pages, _ = gen_batch(ids, seed)
        return pages

    ds = ray.data.range(n_docs, override_num_blocks=override_num_blocks)
    return ds.map_batches(_gen, batch_format="pyarrow", batch_size=512)


# --- continuation pages (multi-page articles) -------------------------
# Generated in a SEPARATE deterministic stream so the base corpus (and
# every golden derived from it) is byte-unchanged. A page's pager links
# point at /art-<id>/page-2 (see gen_page_row); the continuation for
# doc_id d lives at exactly the url the kernel's pagination scanner
# discovers and resolve_url() absolutizes.


def chain_depth(doc_id: int, max_extra_pages: int = 1) -> int:
    """Last page number of doc_id's pagination chain: 2 for the default
    single-continuation corpus, up to 2+(max_extra_pages-1) when deeper
    chains are requested (deterministic per doc)."""
    return 2 + (doc_id % max_extra_pages if max_extra_pages > 1 else 0)


def gen_continuation_row(seed: int, doc_id: int, page_no: int = 2,
                         *, last: bool = True) -> dict:
    rng = random.Random((seed << 33) ^ (doc_id * 2 + 1) ^ ((page_no - 2) << 50))
    site = f"site{doc_id % 97}.example"
    url = f"https://{site}/art-{doc_id}/page-{page_no}"
    paragraphs = [
        " ".join(rng.choice(W.NOISE_SENTENCES) for _ in range(rng.randint(2, 4)))
        for _ in range(rng.randint(2, 4))
    ]
    article = "".join(f"<p>{p}</p>" for p in paragraphs)
    pager = (
        ""
        if last
        else f'<div class="pager"><a href="/art-{doc_id}/page-{page_no + 1}">'
             f"Next &gt;</a></div>"
    )
    html = (
        f"<html><head><title>Story {doc_id}, page {page_no}</title></head><body>"
        f'<nav><ul><li><a href="/home">Home</a></li></ul></nav>'
        f'<div class="story-body">{article}</div>{pager}'
        f"<footer><a href=\"/about\">About</a> Copyright {site}</footer>"
        f"</body></html>"
    )
    return {
        "url": url,
        "warc_ts": BASE_TS + doc_id * 1_000_000 + 500_000 + (page_no - 2) * 1000,
        "html": html.encode("utf-8"),
        "text": "\n".join(paragraphs),
        "lang": "en",
    }


def continuation_pages_dataset(n_docs: int, seed: int = 42,
                               override_num_blocks: int | None = None,
                               max_extra_pages: int = 1):
    """All continuation pages for doc ids [0, n_docs) as a lazy Dataset —
    the hermetic stand-in for fetching discovered next-page urls.
    ``max_extra_pages=1`` (default) reproduces the single page-2 corpus
    byte-for-byte; larger values grow per-doc chains (page 3, 4, …) with
    pager links on every non-final page."""
    import ray.data

    def _gen(batch):
        rows = []
        for i in batch["id"].to_pylist():
            depth = chain_depth(int(i), max_extra_pages)
            for page_no in range(2, depth + 1):
                rows.append(
                    gen_continuation_row(seed, int(i), page_no, last=page_no == depth)
                )
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    ds = ray.data.range(n_docs, override_num_blocks=override_num_blocks)
    return ds.map_batches(_gen, batch_format="pyarrow", batch_size=512)
