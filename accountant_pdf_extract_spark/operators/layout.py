"""Layout analysis over tokenized PDF pages (U3–U6, SURVEY.md §2.9):
x/y line clustering, table/cell detection (ruling-line + whitespace-gap),
reading-order sort with two-column detection, and repeated-line
header/footer boilerplate stripping.

Pure per-document functions invoked from the Arrow batch kernel
(plain sorted()/dict passes — per-page token counts are small enough
that numpy marshalling costs more than it saves; see cluster_lines).
Spec: ``BASELINE.json:6``; constants in ``spec.py`` shared with the
code-disjoint oracle.
"""

from __future__ import annotations

import math
import functools
import re
from dataclasses import dataclass

from operator import attrgetter

from accountant_pdf_extract_spark import spec
from accountant_pdf_extract_spark.operators.pdfparse import Page

# C-level sort key (stable sort keeps the same tie order as the lambda)
_GET_X = attrgetter("x")


@dataclass(slots=True)
class Line:
    page: int
    y: float
    x: float
    end_x: float
    text: str


@dataclass(slots=True)
class Placed:
    """A positioned output item: a text line or a media placement."""

    page: int
    y: float
    x: float
    end_x: float
    is_media: bool
    text: str
    media_ref: str
    # computed against the OWNING page's /MediaBox-derived zone cuts
    # at reading_order time (pages differ in size, so boilerplate
    # stripping cannot re-derive this from y alone)
    in_zone: bool = False


def cluster_lines(page_idx: int, page: Page) -> list[Line]:
    """Group UPRIGHT glyph runs into lines by baseline-y proximity;
    join runs left-to-right with ''/' '/tab per the gap + ruling
    heuristics.  Rotated runs (rot != 0) cluster separately in their
    own reading frame — see rotated_lines()."""
    runs = [r for r in page.runs if r.rot == 0]
    if not runs:
        return []
    # top-to-bottom, then left-to-right; pages carry ~10 runs (median),
    # so a plain sort beats building numpy arrays + lexsort.  Bare
    # tuple sort (with the index as the explicit tiebreak the stable
    # key-sort gave implicitly) skips the per-element key lambda.
    order = [
        i for _, _, i in sorted((-r.y, r.x, i) for i, r in enumerate(runs))
    ]

    vrules = [r for r in page.rules if not r.horiz]

    lines: list[Line] = []
    group: list[int] = []
    group_y = None

    def flush() -> None:
        if not group:
            return
        # single-run lines are the common case — skip the sort
        if len(group) == 1:
            members = [runs[group[0]]]
        else:
            members = sorted((runs[i] for i in group), key=_GET_X)
        y = max(r.y for r in members)
        parts = [members[0].text]
        exs = [r.end_x for r in members]  # end_x is computed; cache it
        for j, (prev, cur) in enumerate(zip(members, members[1:])):
            pex = exs[j]
            gap = cur.x - pex
            # cheap gap test first; the vrule scan only runs for
            # sub-tab gaps on pages that HAVE vertical rulings
            # (identical truth table, measured ~6% of kernel layout)
            if gap > spec.TAB_GAP_PTS or (vrules and any(
                pex <= v.x <= cur.x
                # LINE_Y_TOL slack at BOTH rule ends — a cell ruling
                # starting fractionally above the baseline must still
                # split the cells (bare v.y <= y was asymmetric:
                # slack at the top end only)
                and v.y - spec.LINE_Y_TOL <= y <= v.y + v.length + spec.LINE_Y_TOL
                for v in vrules
            )):
                parts.append("\t")
            elif gap > spec.SPACE_GAP_FACTOR * cur.size:
                parts.append(" ")
            parts.append(cur.text)
        text = "".join(parts)
        if text.strip():
            lines.append(
                Line(
                    page=page_idx,
                    y=y,
                    x=members[0].x,
                    end_x=exs[-1],
                    text=text,
                )
            )
        group.clear()

    for i in order:
        ry = runs[i].y
        if group_y is None or abs(group_y - ry) <= spec.LINE_Y_TOL:
            group.append(int(i))
            group_y = ry if group_y is None else group_y
        else:
            flush()
            group.append(int(i))
            group_y = ry
    flush()
    return lines


def rotated_lines(page_idx: int, page: Page, quad: int) -> list[Line]:
    """Cluster one rotation quadrant's runs in its READING FRAME — the
    rigid transform that maps the rotated page onto an upright one, so
    the y-proximity/gap/tab heuristics apply unchanged:

        q=1 (90° CCW): (rx, ry) = (y,          page_w - x)
        q=2 (180°):    (rx, ry) = (page_w - x, page_h - y)
        q=3 (270°):    (rx, ry) = (page_h - y, x)

    Device rulings are NOT transformed (rotated stamps/banners don't
    carry cell rulings); effective size is rotation-invariant (the
    tokenizer uses the basis-vector magnitude)."""
    sel = [r for r in page.runs if r.rot == quad]
    if not sel:
        return []
    if quad == 1:
        tr = [(r.y, page.w - r.x) for r in sel]
    elif quad == 2:
        tr = [(page.w - r.x, page.h - r.y) for r in sel]
    else:
        tr = [(page.h - r.y, r.x) for r in sel]
    sub = Page(
        runs=[
            type(r)(x=rx, y=ry, size=r.size, text=r.text, rot=0,
                    adv=r.adv)
            for r, (rx, ry) in zip(sel, tr)
        ],
        rules=[],
        images=[],
    )
    return cluster_lines(page_idx, sub)


def reading_order(page_idx: int, page: Page) -> list[Placed]:
    """Order one page's lines + media placements: header zone first,
    then body (column-major if a clean two-column split exists), then
    footer zone; each zone top-to-bottom, left-to-right.  Rotated text
    (rot quadrants 1-3) follows the upright flow, quadrant-ascending,
    each quadrant top-down in its own reading frame — a 90° 'PAID'
    stamp or vertical margin banner lands after the page's upright
    content instead of interleaving at a meaningless device-y."""
    top_y = spec.TOP_ZONE_FRAC * page.h
    bot_y = spec.BOT_ZONE_FRAC * page.h
    items: list[Placed] = [
        Placed(page_idx, ln.y, ln.x, ln.end_x, False, ln.text, "",
               in_zone=ln.y >= top_y or ln.y <= bot_y)
        for ln in cluster_lines(page_idx, page)
    ] + [
        Placed(page_idx, im.y, im.x, im.x + im.w, True, "", im.media_ref,
               in_zone=im.y >= top_y or im.y <= bot_y)
        for im in page.images
    ]
    header = [it for it in items if it.y >= top_y]
    footer = [it for it in items if it.y <= bot_y]
    body = [it for it in items if bot_y < it.y < top_y]

    def topdown(seq: list[Placed]) -> list[Placed]:
        return sorted(seq, key=lambda it: (-it.y, it.x))

    split_x = page.w / 2.0
    left = [it for it in body if it.end_x < split_x]
    right = [it for it in body if it.x >= split_x]
    two_col = (
        len(body) >= spec.COL_MIN_TOTAL
        and len(left) >= spec.COL_MIN_SIDE
        and len(right) >= spec.COL_MIN_SIDE
        and len(left) + len(right) == len(body)
    )
    ordered_body = topdown(left) + topdown(right) if two_col else topdown(body)
    rotated: list[Placed] = []
    if any(r.rot for r in page.runs):
        for quad in (1, 2, 3):
            # zone membership against the rotated FRAME's height (the
            # frame swaps dims for odd quadrants) — a repeated margin
            # banner near the frame edge is boilerplate like any other
            fh = page.w if quad % 2 else page.h
            ftop, fbot = spec.TOP_ZONE_FRAC * fh, spec.BOT_ZONE_FRAC * fh
            rotated.extend(
                Placed(page_idx, ln.y, ln.x, ln.end_x, False, ln.text, "",
                       in_zone=ln.y >= ftop or ln.y <= fbot)
                for ln in rotated_lines(page_idx, page, quad)
            )
    return topdown(header) + ordered_body + topdown(footer) + rotated


_NORM_WS = re.compile(r"\s+")
# digit RUNS collapse to one '#': per-digit mapping made "Page 9 of
# 36" and "Page 10 of 36" normalize differently, so the repeated-line
# strip leaked single-digit footers on every document of >= 10 pages
_NORM_DIGIT = re.compile(r"\d+")


@functools.lru_cache(maxsize=8192)
def normalize_line(text: str) -> str:
    """Boilerplate-frequency normalization: lowercase, digits → '#',
    collapse whitespace.  Memoized — repeated headers/footers make
    most calls cache hits (pure function of the text)."""
    return _NORM_WS.sub(" ", _NORM_DIGIT.sub("#", text.lower())).strip()


def strip_boilerplate(
    placed: list[Placed], n_pages: int
) -> list[Placed]:
    """Drop header/footer-zone lines whose normalized text repeats on
    >= 2 distinct pages and >= BOILER_FRAC of all pages, every
    occurrence in-zone (``BASELINE.json:6``)."""
    if n_pages < spec.BOILER_MIN_PAGES:
        return placed
    pages_of: dict[str, set[int]] = {}
    always_zoned: dict[str, bool] = {}
    norms: list[str | None] = []
    for it in placed:
        if it.is_media:
            norms.append(None)
            continue
        key = normalize_line(it.text)
        norms.append(key)
        pages_of.setdefault(key, set()).add(it.page)
        always_zoned[key] = always_zoned.get(key, True) and it.in_zone
    min_pages = max(2, math.ceil(spec.BOILER_FRAC * n_pages))
    boiler = {
        k
        for k, pgs in pages_of.items()
        if len(pgs) >= min_pages and always_zoned[k]
    }
    return [
        it
        for it, key in zip(placed, norms)
        if it.is_media or key not in boiler
    ]


def pdf_to_items(pages: list[Page]) -> list[Placed]:
    """Full per-PDF layout pass: cluster → order → boilerplate strip,
    concatenated across pages in page order."""
    placed: list[Placed] = []
    for idx, page in enumerate(pages):
        placed.extend(reading_order(idx, page))
    return strip_boilerplate(placed, n_pages=len(pages))
