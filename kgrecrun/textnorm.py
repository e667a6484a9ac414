"""ASCII-whitespace tokenization shared by every oracle-facing text op.

Python's ``str.split()`` splits on ALL Unicode whitespace (NBSP, U+0085,
U+2028, ...) while the DuckDB/RE2 ``'\\s+'`` used by the oracle SQL is
ASCII-only (``[ \\t\\n\\r\\f]`` — RE2's ``\\s`` excludes ``\\v``). Both
sides of the driver's value-hash compare must tokenize identically, so
fingerprints / dedup keys / language-ID / stopword ratios all route
through these helpers instead of ``str.split()``.
"""

from __future__ import annotations

import re

# RE2 \s character class (DuckDB regexp_* and pyarrow.compute use RE2).
# WS_PATTERN is the single source of truth — the vectorized tokenizer
# (ops/dedup._flat_tokens, via pc.split_pattern_regex) imports it so the
# per-doc and per-column paths can never desynchronize.
WS_PATTERN = r"[ \t\n\r\f]+"
_RE2_WS = re.compile(WS_PATTERN)


def ascii_words(text: str | None) -> list[str]:
    """Tokens split on the RE2 ``\\s`` class, empties dropped."""
    return [w for w in _RE2_WS.split(text or "") if w]


def normalize_ws(text: str | None) -> str:
    """Lowercase + collapse RE2 whitespace runs to single spaces + trim —
    equals DuckDB ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``."""
    return " ".join(w for w in _RE2_WS.split((text or "").lower()) if w)
