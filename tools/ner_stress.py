"""Gazetteer-scale stress for the NER matcher paths (VERDICT r3 item 5):
regex alternation vs Aho-Corasick automaton at 10^3..10^5+ surfaces.

Synthesizes a deterministic multi-word gazetteer (md5-derived tokens —
no RNG stream collisions) and a doc set with planted surface
occurrences amid noise, then measures per path: build seconds, scan
chars/sec, and (where both run) asserts span-identical output. The
regex path is skipped above --regex-cap surfaces (sre alternations
degrade linearly in the alternative count; that is the point of the
automaton).

Usage: python tools/ner_stress.py [n_surfaces] [n_docs] [--regex-cap N]
Prints one JSON line per measured cell.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from kgrecrun.kg.ner import ACMatcher, build_matcher  # noqa: E402


def _tok(i: int, j: int) -> str:
    h = hashlib.md5(f"s{i}-{j}".encode()).hexdigest()
    return "".join(c for c in h[:8] if c.isalpha()) or "zz"


def synth_gazetteer(n: int) -> list[str]:
    return [
        " ".join(_tok(i, j) for j in range(1 + i % 3)).title()
        for i in range(n)
    ]


def synth_docs(n_docs: int, surfaces: list[str], words_per_doc: int = 400):
    docs = []
    for d in range(n_docs):
        words = []
        for k in range(words_per_doc):
            h = int(hashlib.md5(f"d{d}-{k}".encode()).hexdigest()[:8], 16)
            if h % 7 == 0:  # plant a surface occurrence
                words.append(surfaces[h % len(surfaces)])
            else:
                words.append(_tok(-d, k))
        docs.append(" ".join(words) + ".")
    return docs


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_surf = int(args[0]) if args else 100_000
    n_docs = int(args[1]) if len(args) > 1 else 200
    regex_cap = 20_000
    if "--regex-cap" in sys.argv:
        regex_cap = int(sys.argv[sys.argv.index("--regex-cap") + 1])

    surfaces = synth_gazetteer(n_surf)
    docs = synth_docs(n_docs, surfaces)
    total_chars = sum(len(d) for d in docs)

    t0 = time.time()
    ac = ACMatcher(surfaces)
    ac_build = time.time() - t0
    t0 = time.time()
    ac_spans = [ac.finditer(d) for d in docs]
    ac_scan = time.time() - t0
    n_matches = sum(len(s) for s in ac_spans)
    print(json.dumps({
        "path": "aho_corasick", "n_surfaces": n_surf, "n_docs": n_docs,
        "total_chars": total_chars, "build_sec": round(ac_build, 3),
        "scan_sec": round(ac_scan, 3),
        "chars_per_sec": round(total_chars / max(ac_scan, 1e-9), 0),
        "n_matches": n_matches,
    }), flush=True)

    if n_surf <= regex_cap:
        t0 = time.time()
        rx = build_matcher(surfaces)
        rx_build = time.time() - t0
        t0 = time.time()
        rx_spans = [[m.span() for m in rx.finditer(d)] for d in docs]
        rx_scan = time.time() - t0
        identical = rx_spans == ac_spans
        print(json.dumps({
            "path": "regex", "n_surfaces": n_surf, "n_docs": n_docs,
            "total_chars": total_chars, "build_sec": round(rx_build, 3),
            "scan_sec": round(rx_scan, 3),
            "chars_per_sec": round(total_chars / max(rx_scan, 1e-9), 0),
            "n_matches": sum(len(s) for s in rx_spans),
            "identical_to_ac": identical,
        }), flush=True)
        assert identical, "regex and AC spans diverged"
    else:
        print(json.dumps({
            "path": "regex", "n_surfaces": n_surf,
            "skipped": f"above --regex-cap {regex_cap}",
        }), flush=True)


if __name__ == "__main__":
    main()
