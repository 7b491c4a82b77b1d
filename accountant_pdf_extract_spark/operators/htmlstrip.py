"""From-scratch HTML boilerplate strip (U7, SURVEY.md §2.9).

Regex tag lexer, no external parser: drop script/style/nav/header/
footer/aside subtrees, split on block-level tags, keep blocks passing
the boilerpipe-style text-length + link-density test, decode the common
entities.  Called per HTML payload from inside the batch kernels
(pandas-vectorizable at batch level via ``pd.Series.map``).

Spec: ``BASELINE.json:14`` ("HTML boilerplate strip ... DOM
heuristics"); thresholds in ``spec.py`` (shared with the oracle).
"""

from __future__ import annotations

import re

from accountant_pdf_extract_spark import spec

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
# Innermost-first: the matched region may not contain another opening
# of the SAME tag, so nested same-name pairs (<nav><nav>..</nav>..</nav>)
# are peeled inside-out by the fixed-point loop instead of mis-pairing
# the outer open with the inner close (which leaked trailing boilerplate).
_DROP_RE = re.compile(
    r"<(" + "|".join(spec.HTML_DROP_TAGS) + r")\b[^>]*>(?:(?!<\1\b).)*?</\1\s*>",
    re.S | re.I,
)
_BLOCK_SPLIT_RE = re.compile(
    r"</?(?:" + "|".join(spec.HTML_BLOCK_TAGS) + r")\b[^>]*/?>",
    re.I,
)
_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&apos;": "'",
    "&nbsp;": " ",
}
_ENTITY_RE = re.compile(
    "|".join(re.escape(k) for k in _ENTITIES) + r"|&#x([0-9A-Fa-f]{1,6});|&#(\d{1,7});"
)


def _entity(m: re.Match) -> str:
    if m.group(1) is not None:  # &#xHH;
        cp = int(m.group(1), 16)
    elif m.group(2) is not None:  # &#NNN;
        cp = int(m.group(2))
    else:
        return _ENTITIES[m.group(0)]
    if 0xD800 <= cp <= 0xDFFF:
        # surrogate refs are invalid Unicode (HTML5 maps them to
        # U+FFFD); a lone surrogate string would crash every UTF-8
        # encode downstream (Arrow build, parquet write)
        return "�"
    return chr(cp) if 0 < cp <= 0x10FFFF else ""


def _clean(fragment: str) -> str:
    txt = _TAG_RE.sub(" ", fragment)
    txt = _ENTITY_RE.sub(_entity, txt)
    return _WS_RE.sub(" ", txt).strip()


def strip_html(html: str) -> list[str]:
    """HTML → list of main-content text blocks, document order."""
    if not html:
        return []
    # Hostile/not-HTML bail (spec.HTML_HOSTILE_*): unclosed-'<' dense
    # payloads make every [^>]* scan run toward end-of-string —
    # measured quadratic (0.45s at 64KB, hours at 10MB), wedging the
    # whole Arrow batch task on ONE bad doc.  Such payloads are not
    # parseable HTML; treat as plain text (entities decoded, no tag
    # stripping).  The oracle mirrors this exactly.
    n_lt, n_gt = html.count("<"), html.count(">")
    if n_lt > spec.HTML_HOSTILE_MIN_LT and n_lt > spec.HTML_HOSTILE_LT_PER_GT * n_gt:
        text = _WS_RE.sub(" ", _ENTITY_RE.sub(_entity, html)).strip()
        return [text] if len(text) >= spec.HTML_MIN_CHARS else []
    body = _COMMENT_RE.sub(" ", html)
    # Iterate: nested drop-tags (nav inside header, ...) need repeats.
    prev = None
    while prev != body:
        prev = body
        body = _DROP_RE.sub(" ", body)

    blocks: list[str] = []
    for raw in _BLOCK_SPLIT_RE.split(body):
        text = _clean(raw)
        if len(text) < spec.HTML_MIN_CHARS:
            continue
        link_chars = sum(len(_clean(m.group(1))) for m in _ANCHOR_RE.finditer(raw))
        if link_chars and link_chars / len(text) > spec.HTML_MAX_LINK_DENSITY:
            continue
        blocks.append(text)
    return blocks
