"""Generate parity goldens by running the unmodified reference kernel
(under Node, via tools/golden_gen.mjs) over (a) the hand-written fixture
documents and (b) a deterministic sample of the synthetic corpus.

Usage: python tools/make_goldens.py   (writes tests/goldens/*.jsonl)
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kgrecrun.corpus import synthgen, world  # noqa: E402
from kgrecrun.corpus.fixtures import FIXTURES  # noqa: E402
from kgrecrun.extract.events import html_to_events  # noqa: E402

CORPUS_SAMPLE_SEED = 42
CORPUS_SAMPLE_N = 500


def run_reference(docs: dict[str, list], skip_level: int | None = None) -> list[dict]:
    rows = []
    for u, e in docs.items():
        row: dict = {"url": u, "events": e}
        if skip_level is not None:
            row["skipLevel"] = skip_level
        rows.append(json.dumps(row))
    p = subprocess.run(
        ["node", str(ROOT / "tools" / "golden_gen.mjs")],
        input="\n".join(rows), capture_output=True, text=True, check=True,
    )
    return [json.loads(l) for l in p.stdout.splitlines()]


def main() -> None:
    out_dir = ROOT / "tests" / "goldens"
    out_dir.mkdir(parents=True, exist_ok=True)

    fixture_docs = {name: html_to_events(html) for name, html in FIXTURES.items()}
    (out_dir / "fixtures.jsonl").write_text(
        "\n".join(json.dumps(r) for r in run_reference(fixture_docs)) + "\n"
    )
    # non-production configs: skipLevel 0/1/2 progressively re-enable
    # cleanConditionally, weightClasses, stripUnlikelyCandidates
    # (readabilitySAX.js:638-649) — branches dead at prod skipLevel 3
    for lvl in (0, 1, 2):
        (out_dir / f"fixtures_skip{lvl}.jsonl").write_text(
            "\n".join(json.dumps(r) for r in run_reference(fixture_docs, skip_level=lvl))
            + "\n"
        )

    w = world.build_world(CORPUS_SAMPLE_SEED)
    corpus_docs = {}
    for doc_id in range(CORPUS_SAMPLE_N):
        row, _ = synthgen.gen_page_row(CORPUS_SAMPLE_SEED, doc_id, w)
        corpus_docs[row["url"]] = html_to_events(row["html"])
    (out_dir / "corpus_sample.jsonl").write_text(
        "\n".join(json.dumps(r) for r in run_reference(corpus_docs)) + "\n"
    )
    print(f"wrote {len(fixture_docs)} fixture + {len(corpus_docs)} corpus goldens")


if __name__ == "__main__":
    main()
