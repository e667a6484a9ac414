// Golden generator: runs the UNMODIFIED reference extraction kernel
// (/root/reference/src/lib/readabilitySAX/readabilitySAX.js, loaded
// read-only via require) over serialized SAX event streams produced by
// kgrecrun.extract.events, and emits the reference's article record per
// document. Used ONLY to generate test goldens — no reference code is
// copied into this repo.
//
// stdin:  JSONL {"url": str, "events": [["open",name]|["attr",n,v]|["text",t]|["close",name], ...],
//                "skipLevel": int (optional, default 3 = production)}
// stdout: JSONL {"url", "title", "nextPage", "textLength", "score", "text", "html"}
//
// The module-level re_commas regex in the reference carries lastIndex
// state across documents (quirk Q2, readabilitySAX.js:44,213); the
// require cache is busted per document so each row sees fresh state,
// matching the per-row semantics of the batch engine.

import { createRequire } from "module";
import * as readline from "readline";

const require = createRequire(import.meta.url);
const REF = "/root/reference/src/lib/readabilitySAX/readabilitySAX.js";

global.Node = { ELEMENT_NODE: 1, TEXT_NODE: 3, COMMENT_NODE: 8 };

function buildDom(events) {
  // Rebuild the minimal DOM surface saxParser touches
  // (readabilitySAX.js:738-755): tagName, attributes[{name,value}],
  // childNodes, nodeType, textContent.
  const root = { nodeType: 1, tagName: "#root", attributes: [], childNodes: [] };
  const stack = [root];
  for (const ev of events) {
    const top = stack[stack.length - 1];
    if (ev[0] === "open") {
      const node = { nodeType: 1, tagName: ev[1], attributes: [], childNodes: [] };
      top.childNodes.push(node);
      stack.push(node);
    } else if (ev[0] === "attr") {
      top.attributes.push({ name: ev[1], value: ev[2] });
    } else if (ev[0] === "text") {
      top.childNodes.push({ nodeType: 3, textContent: ev[2] !== undefined ? ev[2] : ev[1] });
    } else if (ev[0] === "close") {
      stack.pop();
    }
  }
  return root.childNodes.find((n) => n.nodeType === 1);
}

const rl = readline.createInterface({ input: process.stdin, terminal: false });
const out = [];
rl.on("line", (line) => {
  if (!line.trim()) return;
  const doc = JSON.parse(line);
  delete require.cache[require.resolve(REF)]; // fresh regex state per doc
  const Readability = require(REF);
  const documentElement = buildDom(doc.events);
  const skipLevel = doc.skipLevel === undefined ? 3 : doc.skipLevel;
  const r = new Readability({ documentElement }, { cleanAttributes: false }, skipLevel);
  const article = r.getArticle(false);
  out.push(
    JSON.stringify({
      url: doc.url,
      title: article.title,
      nextPage: article.nextPage,
      textLength: article.textLength,
      score: article.score,
      text: article.getText(),
      html: article.getHTML(),
      nodes: article.getNodes().map((n) => n.textContent),
      events: (() => {
        const evs = [];
        r.getEvents({
          onopentag: (name, attrs) => evs.push(["open", name, attrs]),
          ontext: (node) => evs.push(["text", node.textContent]),
          onclosetag: (name) => evs.push(["close", name]),
        });
        return evs;
      })(),
    })
  );
});
rl.on("close", () => {
  process.stdout.write(out.join("\n") + (out.length ? "\n" : ""));
});
