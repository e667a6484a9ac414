"""Allowlist HTML sanitizer stage: articles(html) → clean_html.

Re-expresses the reference extension's overlay sanitizer
(/root/reference/src/iframe.js:91-206 `sanitize`, allowlists
iframe.js:274-295, div added for the non-Diffbot path iframe.js:300,
img→figure wrapping iframe.js:303-315) as a stateless Ray Data
``map_batches`` stage:

* recursive copy keeping only allowed tags; disallowed *elements* are
  unwrapped — their children recurse into the current output parent,
  the node itself is dropped (iframe.js:199-204: ``nextRecrunNode``
  only advances for allowed tags)
* per-tag attribute allowlist (everything else dropped)
* relative ``href``/``src`` resolution against a base URI following the
  reference's rules (iframe.js:153-178): values containing ``://`` are
  kept; ``//x`` gets the base protocol; ``/x`` the origin; ``?x`` the
  origin+path; ``#x`` the origin+path+query; any other value containing
  ``:`` is kept verbatim; everything else joins the base directory
* ``<a>`` forced ``target="_blank"``; ``<video>``/``<audio>`` forced
  ``controls`` (iframe.js:184-191)
* bare ``<img>`` not inside ``<figure>``/``<a>`` within 10 ancestors is
  wrapped in ``<figure>`` (iframe.js:303-315, descendantOfTag depth=10)

Divergence (batch engine vs DOM overlay): the reference builds a live
DocumentFragment and never serializes; we emit an HTML string, escaping
``& < >`` in text and ``& < > "`` in attribute values.
"""

from __future__ import annotations

import pyarrow as pa

from ..extract.events import html_to_events

BLOCK_TAGS = (
    "p h1 h2 h3 h4 h5 blockquote code pre ul ol li table tbody tr td dl dt dd"
).split()
INLINE_TAGS = "br b strong i em u a".split()
MEDIA_TAGS = "figure img video audio source figcaption iframe embed object".split()

ALLOWED_ATTRS: dict[str, frozenset[str]] = {
    "td": frozenset(["valign", "colspan"]),
    "a": frozenset(["href"]),
    "img": frozenset(["src", "alt"]),
    "video": frozenset(["src"]),
    "audio": frozenset(["src"]),
    "source": frozenset(["src", "type"]),
    "iframe": frozenset(["src", "frameborder"]),
    "embed": frozenset(["src", "type"]),
    "object": frozenset(["src", "type"]),
}

VOID_TAGS = frozenset("br img source embed hr".split())


def allowed_tags(media: bool = True, include_div: bool = True) -> frozenset[str]:
    tags = list(BLOCK_TAGS) + list(INLINE_TAGS)
    if media:
        tags += MEDIA_TAGS
    if include_div:  # non-Diffbot path adds div (iframe.js:300)
        tags.append("div")
    return frozenset(tags)


def _split_base(base_uri: str):
    """→ (protocol, origin, path, query). Mirrors the pieces of the
    WHATWG URL object the reference reads (protocol/origin/pathname/
    search)."""
    scheme, sep, rest = base_uri.partition("://")
    if not sep:
        return "", "", "", ""
    host, slash, tail = rest.partition("/")
    origin = f"{scheme}://{host}"
    path_q = ("/" + tail) if slash else "/"
    path, qmark, query = path_q.partition("?")
    query = (qmark + query) if qmark else ""
    path = path.partition("#")[0]
    return scheme + ":", origin, path, query


def resolve_url(val: str, base_uri: str) -> str:
    """iframe.js:153-178 resolution rules, verbatim semantics."""
    if "://" in val or not base_uri:
        return val
    protocol, origin, path, query = _split_base(base_uri)
    if not origin:
        return val
    if val.startswith("//"):
        return protocol + val
    if val.startswith("/"):
        return origin + val
    if val.startswith("?"):
        return origin + path + val
    if val.startswith("#"):
        return origin + path + query + val
    if ":" in val:
        return val
    base_dir = path[: path.rfind("/") + 1]
    return origin + base_dir + val


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str | None, attrs=None, parent=None):
        self.tag = tag  # None → text node container root
        self.attrs = attrs or []
        self.children: list = []  # _Node or str
        self.parent = parent


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return _esc_text(s).replace('"', "&quot;")


def _serialize(node: _Node, out: list[str]) -> None:
    for child in node.children:
        if isinstance(child, str):
            out.append(_esc_text(child))
            continue
        attrs = "".join(f' {k}="{_esc_attr(v)}"' for k, v in child.attrs)
        if child.tag in VOID_TAGS and not child.children:
            out.append(f"<{child.tag}{attrs}/>")
        else:
            out.append(f"<{child.tag}{attrs}>")
            _serialize(child, out)
            out.append(f"</{child.tag}>")


def _within_ancestors(node: _Node, tags: frozenset[str], depth: int = 10) -> bool:
    cur, n = node, 0
    while cur is not None and n <= depth:
        if cur.tag in tags:
            return True
        cur = cur.parent
        n += 1
    return False


def sanitize_html(html: str, base_uri: str = "", *, media: bool = True,
                  include_div: bool = True) -> str:
    """One document: allowlist copy + URL resolution + figure wrapping."""
    tags = allowed_tags(media, include_div)
    root = _Node(None)
    cur = root
    stack = [root]
    imgs: list[_Node] = []

    # bundle ("open", t) + following ("attr", k, v)* into one record
    bundled: list[tuple] = []
    for ev in html_to_events(html):
        if ev[0] == "attr" and bundled and bundled[-1][0] == "open":
            bundled[-1][2].append((ev[1], ev[2]))
        elif ev[0] == "open":
            bundled.append(("open", ev[1], []))
        else:
            bundled.append(ev)

    for ev in bundled:
        kind = ev[0]
        if kind == "open":
            tag = ev[1]
            attrs_in = ev[2]
            if tag in tags:
                kept = []
                allowed = ALLOWED_ATTRS.get(tag)
                for name, value in attrs_in:
                    name = name.lower()
                    if allowed and name in allowed:
                        if name in ("src", "href"):
                            value = resolve_url(value, base_uri)
                        kept.append((name, value))
                if tag == "a":
                    kept.append(("target", "_blank"))
                if tag in ("video", "audio"):
                    kept.append(("controls", ""))
                node = _Node(tag, kept, cur)
                cur.children.append(node)
                if tag == "img":
                    imgs.append(node)
                cur = node
                stack.append(node)
            else:
                stack.append(cur)  # unwrap: children attach to current
        elif kind == "text":
            cur.children.append(ev[1])
        elif kind == "close":
            popped = stack.pop()
            cur = stack[-1] if stack else root

    for img in imgs:
        # reference walks the img itself plus 10 ancestors
        # (iframe.js:208-224 descendantOfTag(img, tag, 10)); the img can
        # never match figure/a, so starting at the node is equivalent
        # for the first probe and caps the walk at exactly 10 ancestors
        if not _within_ancestors(img, frozenset(["figure", "a"]), 10):
            parent = img.parent
            if parent is None or parent.tag is None:
                # reference quirk: wrapNode reads inner.parentElement,
                # which is null for direct children of the
                # DocumentFragment (a fragment is not an Element), so
                # fragment-level imgs are left unwrapped (iframe.js:231)
                continue
            fig = _Node("figure", [], parent)
            idx = parent.children.index(img)
            parent.children[idx] = fig
            fig.children.append(img)
            img.parent = fig

    out: list[str] = []
    _serialize(root, out)
    return "".join(out)


class SanitizeArticles:
    """articles(url, html) → + clean_html column. Stateless task stage."""

    def __init__(self, media: bool = True):
        self.media = media

    def __call__(self, batch: pa.Table) -> pa.Table:
        cleaned = [
            sanitize_html(h or "", u or "", media=self.media)
            for h, u in zip(batch["html"].to_pylist(), batch["url"].to_pylist())
        ]
        return batch.append_column("clean_html", pa.array(cleaned, pa.large_string()))


def sanitize_articles(articles_ds, *, media: bool = True, batch_size: int = 256):
    return articles_ds.map_batches(
        SanitizeArticles(media),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
