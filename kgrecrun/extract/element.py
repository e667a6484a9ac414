"""The light-weight shadow-tree Element used by the extraction kernel.

Re-expresses the reference's Element class (readabilitySAX.js:14-161):
per-node scoring state, the ``info`` rollup (text/link lengths, comma
count, descendant tag histogram, link density), and the four renderers
(outer/inner HTML, formatted text, flat text-node list). Serialization
is deliberately escape-free (quirk Q5) and childless ``br``/``hr``
render as ``<tag/>`` (readabilitySAX.js:70-92).
"""

from __future__ import annotations

import re

from . import jsre

# tag tables (readabilitySAX.js:163-177). All are plain name sets here;
# the noContent prototype accident (quirk Q1) is handled in the kernel.
TAGS_TO_SKIP = frozenset(
    "aside footer head label nav noscript script select style textarea".split()
)
TAG_COUNTS = {
    "address": -3, "article": 30, "blockquote": 3, "body": -5, "dd": -3,
    "div": 5, "dl": -3, "dt": -3, "form": -3, "h2": -5, "h3": -5, "h4": -5,
    "h5": -5, "h6": -5, "li": -3, "ol": -3, "pre": 3, "section": 15,
    "td": 3, "th": -5, "ul": -3,
}
REMOVE_IF_EMPTY = frozenset("blockquote li p pre tbody td th thead tr".split())
EMBEDS = frozenset("embed object iframe".split())
GOOD_ATTRIBUTES = frozenset("alt href src title".split())
CLEAN_CONDITIONALLY = frozenset("div form ol table ul".split())
# unpackDivs = {__proto__: embeds, div, img} — proto chain IS live here
# (embeds was initialized before use), so membership includes embeds.
UNPACK_DIVS = frozenset("div img".split()) | EMBEDS
FORMAT_TAGS = frozenset(("br", "hr"))
HEADER_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))
# newLinesAfter = {__proto__: headerTags, br, li, p} — proto live.
NEWLINES_AFTER = frozenset(("br", "li", "p")) | HEADER_TAGS
DIV_TO_P_ELEMENTS = ("a", "blockquote", "dl", "img", "ol", "p", "pre", "table", "ul")
OKAY_IF_EMPTY = ("audio", "embed", "iframe", "img", "object", "video")

# noContent = {font:false, input:false, link:false, meta:false, span:false}
# with __proto__: formatTags evaluated while formatTags was still undefined
# (readabilitySAX.js:171-172) → proto silently fell back to Object.prototype
# (quirk Q1). Consequences replicated: (a) br/hr are NOT members, so they
# build ordinary Elements; (b) tag names that collide with Object.prototype
# members are treated as members → dropped-and-unwrapped.
_NO_CONTENT_OWN = frozenset("font input link meta span".split())
_OBJECT_PROTOTYPE_MEMBERS = frozenset(
    (
        "constructor", "hasOwnProperty", "isPrototypeOf", "propertyIsEnumerable",
        "toLocaleString", "toString", "valueOf", "__defineGetter__",
        "__defineSetter__", "__lookupGetter__", "__lookupSetter__", "__proto__",
    )
)


def in_no_content(name: str) -> bool:
    return name in _NO_CONTENT_OWN or name in _OBJECT_PROTOTYPE_MEMBERS


_RE_UINT_KEY = re.compile(r"^(?:0|[1-9][0-9]*)$")


def _for_in_order(keys) -> list[str]:
    """JS for-in enumeration order: integer-like keys ascending first,
    then string keys in insertion order (affects attribute serialization,
    readabilitySAX.js:73)."""
    ints = [k for k in keys if _RE_UINT_KEY.match(k) and int(k) < 2**32 - 1]
    if not ints:
        return list(keys)
    rest = [k for k in keys if not (_RE_UINT_KEY.match(k) and int(k) < 2**32 - 1)]
    return sorted(ints, key=int) + rest


class TextNode:
    """Stands in for a DOM Text node (nodeType 3, textContent)."""

    __slots__ = ("text",)
    is_text = True

    def __init__(self, text: str):
        self.text = text


class Element:
    __slots__ = (
        "name", "parent", "attributes", "children", "tag_score",
        "attribute_score", "total_score", "element_data",
        "text_length", "link_length", "commas", "density", "tag_count",
        "is_candidate",
    )
    is_text = False

    def __init__(self, name: str, parent: "Element | None" = None):
        self.name = name
        self.parent = parent
        self.attributes: dict[str, str] = {}
        self.children: list[Element | TextNode] = []
        self.tag_score = 0.0
        self.attribute_score = 0
        self.total_score = 0
        self.element_data = ""
        self.text_length = 0
        self.link_length = 0
        self.commas = 0
        self.density = 0.0
        self.tag_count: dict[str, int] = {}
        self.is_candidate = False

    # -- info rollup (readabilitySAX.js:34-69) --
    def add_info(self, commas_re: jsre.StatefulRegex) -> None:
        text_length = self.text_length
        link_length = self.link_length
        commas = self.commas
        tag_count = self.tag_count
        for child in self.children:
            if child.is_text:
                txt = child.text
                text_length += jsre.js_len(jsre.js_trim(txt))
                if commas_re.test(txt):
                    commas += jsre.count_commas(txt)
            else:
                if child.name == "a":
                    link_length += child.text_length + child.link_length
                else:
                    text_length += child.text_length
                    link_length += child.link_length
                commas += child.commas
                for tag, n in child.tag_count.items():
                    tag_count[tag] = tag_count.get(tag, 0) + n
                tag_count[child.name] = tag_count.get(child.name, 0) + 1
        self.text_length = text_length
        self.link_length = link_length
        self.commas = commas
        if link_length != 0:
            self.density = link_length / (text_length + link_length)

    # -- serialization (readabilitySAX.js:70-105; escape-free, quirk Q5) --
    def get_outer_html(self) -> str:
        parts = ["<", self.name]
        for key in _for_in_order(self.attributes):
            parts.append(f' {key}="{self.attributes[key]}"')
        if not self.children:
            if self.name in FORMAT_TAGS:
                parts.append("/>")
            else:
                parts.append(f"></{self.name}>")
            return "".join(parts)
        parts.append(">")
        parts.append(self.get_inner_html())
        parts.append(f"</{self.name}>")
        return "".join(parts)

    def get_inner_html(self) -> str:
        out = []
        for child in self.children:
            if child.is_text:
                out.append(child.text)
            else:
                out.append(child.get_outer_html())
        return "".join(out)

    def get_formatted_text(self) -> str:
        out = []
        for child in self.children:
            if child.is_text:
                out.append(jsre.collapse_ws(child.text))
            else:
                if child.name == "p" or child.name in HEADER_TAGS:
                    out.append("\n")
                out.append(child.get_formatted_text())
                if child.name in NEWLINES_AFTER:
                    out.append("\n")
        return "".join(out)

    def get_text_nodes(self) -> list[TextNode]:
        out: list[TextNode] = []
        for child in self.children:
            if child.is_text:
                if len(child.text) > 0:
                    out.append(child)
            else:
                out.extend(child.get_text_nodes())
        return out

    def get_events(self) -> list:
        """Replay this subtree as a SAX event stream — the reference's
        getEvents export (readabilitySAX.js:712-723): open (with the
        attribute map), text nodes, close, in document order, INCLUDING
        this element itself as the stream root."""
        events: list = [("open", self.name, dict(self.attributes))]
        for child in self.children:
            if child.is_text:
                events.append(("text", child.text))
            else:
                events.extend(child.get_events())
        events.append(("close", self.name))
        return events

    def to_string(self) -> str:
        out = []
        for child in self.children:
            out.append(child.text if child.is_text else child.to_string())
        return "".join(out)

    # -- candidate scan (readabilitySAX.js:133-160) --
    def get_top_candidate(self) -> "Element | None":
        import math

        top_score = float("-inf")
        top_candidate = None
        for child in self.children:
            if child.is_text:
                continue
            if child.is_candidate:
                # tag-name bonus is added IN PLACE during the scan (quirk Q6)
                if child.name in TAG_COUNTS:
                    child.tag_score += TAG_COUNTS[child.name]
                score = math.floor(
                    (child.tag_score + child.attribute_score) * (1 - child.density)
                )
                if top_score < score:
                    child.total_score = top_score = score
                    top_candidate = child
            sub = child.get_top_candidate()
            if sub is not None and top_score < sub.total_score:
                top_score = sub.total_score
                top_candidate = sub
        return top_candidate
