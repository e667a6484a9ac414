"""Extraction kernel: a faithful re-expression of the reference's
readability algorithm (readabilitySAX.js:216-808) over a serialized SAX
event stream.

The kernel consumes events ``("open", name) / ("attr", name, value) /
("text", text) / ("close", name)`` in document order (the same stream the
golden generator feeds to the *unmodified* reference under Node, so the
HTML parser is outside the parity surface) and produces the article
record ``{title, next_page, text_length, score, text, html}``.

Production configuration (SURVEY.md §2.1, content.js:151-154):
``Settings(clean_attributes=False)`` + ``skip_level=3``.

Replicated quirks (SURVEY.md §2.5): Q1 noContent prototype accident,
Q2 stateful comma regex (fresh per document), Q3 replaceImgs orphaning,
Q4 JS truncating split, Q5 escape-free serialization, Q6 in-place
tag-name bonus, Q7 mid-element img rename, Q8 density default 0,
Q9 title/header removal from the tree.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import jsre
from .element import (
    CLEAN_CONDITIONALLY,
    DIV_TO_P_ELEMENTS,
    EMBEDS,
    GOOD_ATTRIBUTES,
    HEADER_TAGS,
    OKAY_IF_EMPTY,
    REMOVE_IF_EMPTY,
    TAGS_TO_SKIP,
    UNPACK_DIVS,
    Element,
    TextNode,
    _for_in_order,
    in_no_content,
)


@dataclass
class Settings:
    """Mirror of the reference settings object (readabilitySAX.js:230-242)
    plus the skipLevel shortcut (readabilitySAX.js:638-649)."""

    strip_unlikely_candidates: bool = True
    weight_classes: bool = True
    clean_conditionally: bool = True
    clean_attributes: bool = True
    replace_imgs: bool = True
    search_further_pages: bool = True
    links_to_skip: dict = field(default_factory=dict)
    resolve_paths: bool = False
    page_url: str | None = None
    skip_level: int = 3

    def apply_skip_level(self) -> "Settings":
        if self.skip_level > 0:
            self.strip_unlikely_candidates = False
        if self.skip_level > 1:
            self.weight_classes = False
        if self.skip_level > 2:
            self.clean_conditionally = False
        return self


def production_settings() -> Settings:
    """The extension's invocation: {cleanAttributes:false}, skipLevel 3
    (content.js:151-154)."""
    return Settings(clean_attributes=False).apply_skip_level()


class Kernel:
    """One instance is reusable across documents; all per-document state
    is reset in :meth:`get_article` (readabilitySAX.js:767-775)."""

    def __init__(self, settings: Settings | None = None):
        self.settings = settings or production_settings()
        self._url = None
        self._base_url = None
        if self.settings.page_url:
            parts = jsre.RE_SLASHES.split(self.settings.page_url)
            self._url = {
                "protocol": parts[0],
                "domain": parts[1] if len(parts) > 1 else "",
                "path": parts[2:-1],
                "full": jsre.RE_CLOSING.sub("", self.settings.page_url, count=1),
            }
            self._base_url = self._get_base_url()
        # per-document state
        self._current: Element | None = None
        self._top_candidate: Element | None = None
        self._orig_title = ""
        self._header_title = ""
        self._scanned_links: dict[str, dict] = {}
        self._commas_re: jsre.StatefulRegex | None = None

    # -- URL algebra (readabilitySAX.js:244-308) --
    def _convert_links(self, path: str) -> str:
        if not self._url:
            return path
        if not path:
            return self._url["full"]
        parts = path.split("/")
        if len(parts) > 1 and parts[1] == "":
            if parts[0] == "":
                return self._url["protocol"] + path
            if parts[0].endswith(":"):
                return path
        if parts[0] == "":
            parts = parts[1:]
        else:
            parts = list(self._url["path"]) + parts
        path = "/".join(parts)
        if self.settings.resolve_paths:
            while True:
                new = jsre.RE_CLEAN_PATHS.sub("", path, count=1)
                if new == path:
                    break
                path = new
        return self._url["protocol"] + "//" + self._url["domain"] + "/" + path

    def _get_base_url(self) -> str:
        url = self._url
        if len(url["path"]) == 0:
            return jsre.RE_PARAMS.sub("", url["full"], count=1)
        cleaned = ""
        last = len(url["path"]) - 1
        for seg in url["path"][:last]:
            cleaned += "/" + jsre.RE_EXTENSION.sub("", seg)
        first = jsre.RE_PARAMS.sub("", url["full"], count=1)
        slash = first.rfind("/")
        first = first[slash + 1:] if slash != -1 else first
        second = url["path"][last]
        if not (len(second) < 3 and jsre.RE_NO_LETTERS.search(first)) and not jsre.RE_JUST_DIGITS.search(second):
            if jsre.RE_PAGE_IN_URL.search(second):
                second = jsre.RE_PAGE_IN_URL.sub("", second, count=1)
            cleaned += "/" + second
        if not jsre.RE_BAD_FIRST.search(first):
            if jsre.RE_PAGE_IN_URL.search(first):
                first = jsre.RE_PAGE_IN_URL.sub("", first, count=1)
            cleaned += "/" + first
        return url["protocol"] + "//" + url["domain"] + cleaned

    # -- pagination link scoring (readabilitySAX.js:335-403) --
    def _scan_link(self, elem: Element) -> None:
        href = elem.attributes.get("href")
        if not href:
            return
        href = jsre.RE_CLOSING.sub("", href, count=1)
        if href in self.settings.links_to_skip:
            return
        if href == self._base_url or (self._url and href == self._url["full"]):
            return
        m = jsre.RE_DOMAIN.search(href)
        if not m:
            return
        if self._url and m.group(1) != self._url["domain"]:
            return
        text = elem.to_string()
        if jsre.js_len(text) > 25 or jsre.RE_EXTRANEOUS.search(text):
            return
        # href.replace(this._baseURL, "") with an undefined baseURL removes
        # the literal substring "undefined" (readabilitySAX.js:351)
        needle = self._base_url if self._base_url is not None else "undefined"
        if not jsre.RE_DIGITS.search(href.replace(needle, "", 1)):
            return
        score = 0
        link_data = text + elem.element_data
        if jsre.RE_NEXT_LINK.search(link_data):
            score += 50
        if jsre.RE_PAGES.search(link_data):
            score += 25
        if jsre.RE_FINAL.search(link_data):
            if not jsre.RE_NEXT_LINK.search(text):
                prev = self._scanned_links.get(href)
                if not (prev and jsre.RE_NEXT_LINK.search(prev["text"])):
                    score -= 65
        if jsre.RE_NEGATIVE.search(link_data) or jsre.RE_EXTRANEOUS.search(link_data):
            score -= 50
        if jsre.RE_PREV_LINK.search(link_data):
            score -= 200
        if jsre.RE_PAGENUM.search(href) or jsre.RE_PAGES.search(href):
            score += 25
        if jsre.RE_EXTRANEOUS.search(href):
            score -= 15
        current = elem
        pos_match = True
        neg_match = True
        while True:
            current = current.parent
            if current is None:
                break
            ed = current.element_data
            if ed == "":
                continue
            if pos_match and jsre.RE_PAGES.search(ed):
                score += 25
                if not neg_match:
                    break
                pos_match = False
            if neg_match and jsre.RE_NEGATIVE.search(ed) and not jsre.RE_POSITIVE.search(ed):
                score -= 25
                if not pos_match:
                    break
                neg_match = False
        n = jsre.js_parse_int(text)
        if n is not None and n < 10:
            if n == 1:
                score -= 10
            else:
                score += 10 - n
        entry = self._scanned_links.get(href)
        if entry is not None:
            entry["score"] += score
            entry["text"] += " " + text
        else:
            self._scanned_links[href] = {"score": score, "text": text}

    # -- SAX handlers (readabilitySAX.js:406-578) --
    def onopentagname(self, name: str) -> None:
        if in_no_content(name):
            # quirk Q1: br/hr are NOT members (dead formatTags path); the
            # members are dropped-and-unwrapped — no element pushed, so
            # children/attributes leak onto the current parent.
            return
        self._current = Element(name, self._current)

    def onattribute(self, name: str, value: str) -> None:
        if not value:
            return
        name = name.lower()
        elem = self._current
        settings = self.settings
        if name == "href" or name == "src":
            if jsre.RE_PROTOCOL.search(value):
                elem.attributes[name] = value
            else:
                elem.attributes[name] = self._convert_links(value)
        elif name == "id" or name == "class":
            value = value.lower()
            if not settings.weight_classes:
                pass
            elif jsre.RE_SAFE.search(value):
                elem.attribute_score += 300
                elem.is_candidate = True
            elif jsre.RE_NEGATIVE.search(value):
                elem.attribute_score -= 25
            elif jsre.RE_POSITIVE.search(value):
                elem.attribute_score += 25
            elem.element_data += " " + value
        elif elem.name == "img" and (name == "width" or name == "height"):
            v = jsre.js_parse_int(value)
            if v is None:
                pass
            elif v <= 32:
                # drop the image via a tagsToSkip-style rename (quirk Q7:
                # later width/height attrs miss this branch)
                elem.name = "script"
            elif (v >= 390) if name == "width" else (v >= 290):
                elem.parent.attribute_score += 20
            elif (v >= 200) if name == "width" else (v >= 150):
                elem.parent.attribute_score += 5
        elif settings.clean_attributes:
            if name in GOOD_ATTRIBUTES:
                elem.attributes[name] = value
        else:
            elem.attributes[name] = value

    def ontext(self, text: str) -> None:
        self._current.children.append(TextNode(text))

    def onclosetag(self, tag_name: str) -> None:
        if in_no_content(tag_name):
            return
        settings = self.settings
        elem = self._current
        self._current = elem.parent

        if settings.search_further_pages and tag_name == "a":
            self._scan_link(elem)
        elif tag_name == "title":
            self._orig_title = jsre.RE_WHITESPACE.sub(" ", jsre.js_trim(elem.to_string()))
            return
        elif tag_name in HEADER_TAGS:
            title = jsre.RE_WHITESPACE.sub(" ", jsre.js_trim(elem.to_string()))
            if self._orig_title:
                if title in self._orig_title:
                    if len(jsre.js_split_limited(title, " ", 4)) == 4:
                        self._header_title = title
                    return
                if tag_name == "h1":
                    return
            elif tag_name == "h1":
                self._header_title = title
                return

        if tag_name in TAGS_TO_SKIP:
            return
        if (
            settings.strip_unlikely_candidates
            and jsre.RE_UNLIKELY_CANDIDATES.search(elem.element_data)
            and not jsre.RE_OK_MAYBE_CANDIDATE.search(elem.element_data)
        ):
            return
        if (
            tag_name == "div"
            and len(elem.children) == 1
            and not elem.children[0].is_text
            and elem.children[0].name in UNPACK_DIVS
        ):
            elem.parent.children.append(elem.children[0])
            return

        elem.add_info(self._commas_re)

        if tag_name in EMBEDS:
            src = elem.attributes.get("src")
            if not (src is not None and jsre.RE_VIDEOS.search(src)):
                return
        elif tag_name == "h2" or tag_name == "h3":
            if elem.attribute_score < 0 or elem.density > 0.33:
                return
        elif settings.clean_conditionally and tag_name in CLEAN_CONDITIONALLY:
            p = elem.tag_count.get("p", 0)
            content_length = elem.text_length + elem.link_length
            if content_length == 0:
                if len(elem.children) == 0:
                    return
                if len(elem.children) == 1 and elem.children[0].is_text:
                    return
            # undefined li count → NaN comparison → false in JS
            li = elem.tag_count.get("li")
            if li is not None and (li - 100) > p and tag_name != "ul" and tag_name != "ol":
                return
            if content_length < 25 and ("img" not in elem.tag_count or elem.tag_count["img"] > 2):
                return
            if elem.density > 0.5:
                return
            if elem.attribute_score < 25 and elem.density > 0.2:
                return
            embed_n = elem.tag_count.get("embed", 0)
            if (embed_n == 1 and content_length < 75) or embed_n > 1:
                return

        if (
            (
                tag_name in REMOVE_IF_EMPTY
                or (not settings.clean_conditionally and tag_name in CLEAN_CONDITIONALLY)
            )
            and (elem.link_length + elem.text_length == 0)
            and len(elem.children) != 0
        ):
            if not any(t in elem.tag_count for t in OKAY_IF_EMPTY):
                return

        if (
            settings.replace_imgs
            and tag_name == "a"
            and len(elem.children) == 1
            and not elem.children[0].is_text
            and elem.children[0].name == "img"
            and jsre.RE_IMG_URL.search(elem.attributes.get("href") or "")
        ):
            # quirk Q3: elem becomes the img; the push below attaches the
            # img to the <a>'s own children, and the <a> (with its subtree)
            # is never attached to the document — it vanishes from output.
            child = elem.children[0]
            child.attributes["src"] = elem.attributes["href"]
            elem = child

        elem.parent.children.append(elem)

        # scoring eligibility (readabilitySAX.js:562-570)
        if tag_name == "p" or tag_name == "pre" or tag_name == "td":
            pass
        elif tag_name == "div":
            for t in DIV_TO_P_ELEMENTS:
                if t in elem.tag_count:
                    return
            elem.name = "p"
        else:
            return

        content_length = elem.text_length + elem.link_length
        if content_length > 24 and elem.parent is not None and elem.parent.parent is not None:
            elem.parent.is_candidate = elem.parent.parent.is_candidate = True
            add = 1 + elem.commas + min(content_length // 100, 3)
            elem.parent.tag_score += add
            elem.parent.parent.tag_score += add / 2

    # -- candidate selection (readabilitySAX.js:582-635) --
    def _get_candidate_siblings(self, candidate: Element) -> list:
        ret = []
        threshold = max(10, candidate.total_score * 0.2)
        for child in candidate.parent.children:
            if child.is_text:
                continue
            if child is candidate:
                pass
            elif candidate.element_data == child.element_data:
                if (child.total_score + candidate.total_score * 0.2) >= threshold:
                    if child.name != "p":
                        child.name = "div"
                else:
                    continue
            elif child.name == "p":
                if child.text_length >= 80 and child.density < 0.25:
                    pass
                elif (
                    child.text_length < 80
                    and child.density == 0
                    and jsre.RE_SENTENCE.search(child.to_string())
                ):
                    pass
                else:
                    continue
            else:
                continue
            ret.append(child)
        return ret

    def _get_candidate_node(self) -> Element:
        elem = self._top_candidate
        if elem is None:
            elem = self._top_candidate = self._current.get_top_candidate()
        if elem is None:
            elem = self._current
        elif len(elem.parent.children) > 1:
            merged = Element("div")
            merged.children = self._get_candidate_siblings(elem)
            merged.add_info(self._commas_re)
            elem = merged
        while len(elem.children) == 1:
            child = elem.children[0]
            if child.is_text:
                break
            elem = child
        return elem

    # -- outputs (readabilitySAX.js:651-705) --
    def get_title(self) -> str:
        if self._header_title:
            return self._header_title
        if not self._orig_title:
            return ""
        cur = self._orig_title
        if jsre.RE_TITLE_SEP.search(cur):
            cur = jsre.RE_TITLE_KEEP_FIRST.sub(r"\1", cur)
            if len(jsre.js_split_limited(cur, " ", 3)) != 3:
                cur = jsre.RE_TITLE_DROP_FIRST.sub("", self._orig_title, count=1)
        elif ": " in cur:
            cur = cur[cur.rfind(": ") + 2:]
            if len(jsre.js_split_limited(cur, " ", 3)) != 3:
                cur = self._orig_title[self._orig_title.find(": "):]
        cur = jsre.js_trim(cur)
        if len(jsre.js_split_limited(cur, " ", 5)) != 5:
            return self._orig_title
        return cur

    def get_next_page(self) -> str:
        top_score = 49
        top_link = ""
        for link in _for_in_order(self._scanned_links):
            if self._scanned_links[link]["score"] > top_score:
                top_link = link
                top_score = self._scanned_links[link]["score"]
        return top_link

    def get_html(self, node: Element) -> str:
        html = node.get_inner_html()
        html = jsre.RE_HTML_BR_BEFORE_P.sub("", html)
        html = jsre.RE_HTML_WS_BEFORE_BR.sub("", html)
        html = jsre.RE_HTML_DOUBLE_BR.sub("</p><p>", html)
        return jsre.js_trim(html)

    def get_text(self, node: Element) -> str:
        return jsre.RE_TEXT_NEWLINES.sub("", jsre.js_trim(node.get_formatted_text()))

    # -- orchestrator (readabilitySAX.js:767-808) --
    def get_article(self, events, include_nodes: bool = False,
                    include_events: bool = False) -> dict:
        """Run the kernel over one document's event stream; returns the
        fully-materialized article record (no lazy memoization — batch
        mode always needs text+html). ``include_nodes`` adds the flat
        nonempty text-node list (reference getNodes,
        readabilitySAX.js:106-117)."""
        self._current = Element("document")
        self._top_candidate = None
        self._orig_title = ""
        self._header_title = ""
        self._scanned_links = {}
        self._commas_re = jsre.new_commas_regex()

        onopen = self.onopentagname
        onattr = self.onattribute
        ontext = self.ontext
        onclose = self.onclosetag
        for ev in events:
            kind = ev[0]
            if kind == "text":
                ontext(ev[1])
            elif kind == "open":
                onopen(ev[1])
            elif kind == "attr":
                onattr(ev[1], ev[2])
            elif kind == "close":
                onclose(ev[1])

        elem = self._get_candidate_node()
        article = {
            "title": self._header_title or self.get_title(),
            "next_page": self.get_next_page(),
            "text_length": elem.text_length,
            "score": self._top_candidate.total_score if self._top_candidate else 0,
            "text": self.get_text(elem),
            "html": self.get_html(elem),
        }
        if include_nodes:
            article["nodes"] = [n.text for n in elem.get_text_nodes()]
        if include_events:
            article["events"] = elem.get_events()
        return article
