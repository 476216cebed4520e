"""HTML → text extraction (SURVEY.md §2.5 N1).

The engine pins ONE deterministic, pure extraction function used identically
by the pipeline and every test oracle, satisfying the per-row invariant
"byte-identical extracted text per url" (BASELINE.json input_hint).  Policy:

1. Scope to the first ``<main>...</main>`` element when present (the
   content region), else ``<body>``, else the whole document — boilerplate
   nav/header/footer outside the content scope is dropped.
2. Remove ``<script>``/``<style>`` blocks and HTML comments.
3. Replace remaining tags with a single space.
4. Unescape HTML entities (stdlib ``html.unescape``).
5. Collapse whitespace runs to a single space and strip.

Stateless and regex-based: compiled patterns live at module scope, imported
once per worker process (equivalent to actor-``__init__`` amortization for a
task-based stage).

The per-row Python cost here is INHERENT to the byte-identity contract, not
an oversight: step 4 is stdlib ``html.unescape`` (the full HTML5 named +
numeric entity table — no Arrow kernel computes code points from ``&#x..;``)
and step 5 uses Python ``re``'s Unicode ``\\s`` (collapses U+00A0/U+2028 etc.,
which re2-based ``pyarrow.compute.replace_substring_regex`` treats as
non-whitespace), so a vectorized re2 rewrite would silently break byte
identity on entity-bearing pages.  At 100 TB this stage is embarrassingly
parallel row-wise and runs exactly once per document (the flagship carries
``text`` through every later stage); tasks scale it out linearly.
"""

from __future__ import annotations

import html as _html
import re

_MAIN_RE = re.compile(rb"<main(?:\s[^>]*)?>(.*?)</main>", re.IGNORECASE | re.DOTALL)
_BODY_RE = re.compile(rb"<body(?:\s[^>]*)?>(.*?)</body>", re.IGNORECASE | re.DOTALL)
_DROP_RE = re.compile(
    rb"<script(?:\s[^>]*)?>.*?</script>|<style(?:\s[^>]*)?>.*?</style>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """Pure deterministic extraction; see module docstring for the policy."""
    if not html_bytes:
        return ""
    m = _MAIN_RE.search(html_bytes)
    if m is None:
        m = _BODY_RE.search(html_bytes)
    scope = m.group(1) if m is not None else html_bytes
    scope = _DROP_RE.sub(b" ", scope)
    scope = _TAG_RE.sub(b" ", scope)
    text = _html.unescape(scope.decode("utf-8", errors="replace"))
    return _WS_RE.sub(" ", text).strip()


def extract_batch(html_col: list[bytes]) -> list[str]:
    return [extract_text(h) for h in html_col]
