// Sanitizer golden generator: runs the UNMODIFIED reference overlay
// sanitizer (/root/reference/src/iframe.js:91-254 — `sanitize`,
// `descendantOfTag`, `wrapNode`, `getElements` — plus the non-Diffbot
// img→figure wrapping block iframe.js:304-314) over article HTML, and
// emits the sanitized fragment serialized with the engine's documented
// encoding (kgrecrun/sanitize/stage.py header: text escapes `& < >`,
// attributes also `"`; void tags `<x .../>`). The reference functions
// are READ AT RUNTIME from /root/reference and evaluated in a vm
// context — no reference code is copied into this repo.
//
// Parse layer: exactly like tools/golden_gen.mjs, the HTML→DOM parse is
// shared infrastructure outside the parity surface — stdin carries the
// event stream produced by kgrecrun.extract.events.html_to_events over
// the SAME article html the engine's sanitize_html consumes, and a
// DOMParser shim rebuilds browser-shaped DOM nodes (uppercase tagName,
// ordered attributes, parentElement semantics incl. the
// fragment-level-img wrapNode quirk) from it.
//
// stdin:  JSONL {"url": str, "base_uri": str, "events": [...] }
// stdout: JSONL {"url": str, "clean_html": str}

import * as fs from "fs";
import * as vm from "vm";
import * as readline from "readline";

const SRC = fs.readFileSync("/root/reference/src/iframe.js", "utf8");

// ---- slice the four top-level function declarations (iframe.js:91-254)
const fnStart = SRC.indexOf("const sanitize = function");
const fnEnd = SRC.indexOf("// an aricle object");
if (fnStart < 0 || fnEnd < 0) throw new Error("reference markers not found");
const fnCode = SRC.slice(fnStart, fnEnd);

// ---- slice the img→figure wrapping block (iframe.js:304-314)
const figStart = SRC.indexOf("const isImg = function");
const figEnd = SRC.indexOf("\n    } else {", figStart);
if (figStart < 0 || figEnd < 0) throw new Error("figure-block markers not found");
const figCode = SRC.slice(figStart, figEnd);

// ---- minimal browser DOM shim ------------------------------------------
let CURRENT_EVENTS = [];

function makeDoc() {
  const doc = {};
  doc.createElement = (tag) => makeElement(tag, doc);
  doc.createTextNode = (text) => ({
    nodeType: 3,
    textContent: String(text),
    parentNode: null,
    parentElement: null,
    ownerDocument: doc,
  });
  return doc;
}

function makeElement(tag, doc) {
  return {
    nodeType: 1,
    tagName: String(tag).toUpperCase(),
    ownerDocument: doc,
    parentNode: null,
    childNodes: [],
    _attrs: [],
    get attributes() {
      return this._attrs;
    },
    get children() {
      return this.childNodes.filter((n) => n.nodeType === 1);
    },
    get parentElement() {
      // Element or null — a DocumentFragment parent yields null, which
      // is what makes the reference's wrapNode skip fragment-level imgs
      return this.parentNode && this.parentNode.nodeType === 1
        ? this.parentNode
        : null;
    },
    setAttribute(name, value) {
      name = String(name).toLowerCase();
      const hit = this._attrs.find((a) => a.name === name);
      if (hit) hit.value = String(value);
      else this._attrs.push({ name, value: String(value) });
    },
    appendChild(child) {
      if (child.parentNode) {
        const i = child.parentNode.childNodes.indexOf(child);
        if (i >= 0) child.parentNode.childNodes.splice(i, 1);
      }
      child.parentNode = this;
      this.childNodes.push(child);
      return child;
    },
    replaceChild(newChild, oldChild) {
      const i = this.childNodes.indexOf(oldChild);
      if (i < 0) throw new Error("replaceChild: not a child");
      if (newChild.parentNode) {
        const j = newChild.parentNode.childNodes.indexOf(newChild);
        if (j >= 0) newChild.parentNode.childNodes.splice(j, 1);
      }
      this.childNodes[i] = newChild;
      newChild.parentNode = this;
      oldChild.parentNode = null;
      return oldChild;
    },
  };
}

function makeFragment(doc) {
  const frag = makeElement("#document-fragment", doc);
  frag.nodeType = 11; // DocumentFragment: parentElement of its children is null
  return frag;
}

function buildFromEvents(events, doc) {
  const root = makeElement("#root", doc);
  const stack = [root];
  for (const ev of events) {
    const top = stack[stack.length - 1];
    if (ev[0] === "open") {
      const el = makeElement(ev[1], doc);
      top.appendChild(el);
      stack.push(el);
    } else if (ev[0] === "attr") {
      if (!top._attrs.find((a) => a.name === ev[1]))
        top._attrs.push({ name: ev[1], value: ev[2] === undefined ? "" : String(ev[2]) });
    } else if (ev[0] === "text") {
      top.appendChild(doc.createTextNode(ev[1]));
    } else if (ev[0] === "close") {
      if (stack.length > 1) stack.pop();
    }
  }
  // html_to_events wraps every document in a single "html" root; a real
  // DOMParser would likewise hang fragment content off html>body
  const htmlEl = root.childNodes.find((n) => n.nodeType === 1);
  return htmlEl || root;
}

class DOMParser {
  parseFromString(_htmlString, _type) {
    const doc = makeDoc();
    return { body: buildFromEvents(CURRENT_EVENTS, doc) };
  }
}

// ---- evaluate the unmodified reference functions ------------------------
const NodeConsts = { ELEMENT_NODE: 1, TEXT_NODE: 3, COMMENT_NODE: 8 };
const ctx = vm.createContext({ DOMParser, URL, Node: NodeConsts, console });
const ref = vm.runInContext(
  fnCode + "\n;({sanitize, descendantOfTag, wrapNode, getElements})",
  ctx,
  { filename: "iframe.js(sliced)" }
);
const figWrap = vm.runInContext(
  "(function(contentFrag, getElements, descendantOfTag, wrapNode, Node){" +
    figCode +
    "\n})",
  ctx,
  { filename: "iframe.js(figure-block)" }
);

// ---- allowlists (iframe.js:274-295, non-Diffbot path adds div :300) -----
const allowedTagsL = [
  "p", "h1", "h2", "h3", "h4", "h5", "blockquote", "code",
  "pre", "ul", "ol", "li", "table", "tbody", "tr", "td",
  "dl", "dt", "dd",
  "br", "b", "strong", "i", "em", "u", "a",
  "figure", "img", "video", "audio", "source", "figcaption",
  "iframe", "embed", "object",
  "div",
];
const allowedTags = new Set(allowedTagsL);
const allowedAttrs = new Map([
  ["td", new Set(["valign", "colspan"])],
  ["a", new Set(["href"])],
  ["img", new Set(["src", "alt"])],
  ["video", new Set(["src"])],
  ["audio", new Set(["src"])],
  ["source", new Set(["src", "type"])],
  ["iframe", new Set(["src", "frameborder"])],
  ["embed", new Set(["src", "type"])],
  ["object", new Set(["src", "type"])],
]);

// ---- serializer: the engine's documented encoding ------------------------
const VOID = new Set(["br", "img", "source", "embed", "hr"]);
const escText = (s) =>
  s.replace(/&/g, "&amp;").replace(/</g, "&lt;").replace(/>/g, "&gt;");
const escAttr = (s) => escText(s).replace(/"/g, "&quot;");

function serialize(node, out) {
  for (const child of node.childNodes) {
    if (child.nodeType === 3) {
      out.push(escText(child.textContent));
      continue;
    }
    const tag = child.tagName.toLowerCase();
    const attrs = child._attrs.map((a) => ` ${a.name}="${escAttr(a.value)}"`).join("");
    if (VOID.has(tag) && child.childNodes.length === 0) {
      out.push(`<${tag}${attrs}/>`);
    } else {
      out.push(`<${tag}${attrs}>`);
      serialize(child, out);
      out.push(`</${tag}>`);
    }
  }
}

// ---- main ----------------------------------------------------------------
const rl = readline.createInterface({ input: process.stdin, terminal: false });
const out = [];
rl.on("line", (line) => {
  if (!line.trim()) return;
  const doc = JSON.parse(line);
  CURRENT_EVENTS = doc.events;
  const d = makeDoc();
  const frag = makeFragment(d);
  ref.sanitize("", frag, allowedTags, allowedAttrs, doc.base_uri);
  figWrap(frag, ref.getElements, ref.descendantOfTag, ref.wrapNode, NodeConsts);
  const pieces = [];
  serialize(frag, pieces);
  out.push(JSON.stringify({ url: doc.url, clean_html: pieces.join("") }));
});
rl.on("close", () => {
  process.stdout.write(out.join("\n") + (out.length ? "\n" : ""));
});
