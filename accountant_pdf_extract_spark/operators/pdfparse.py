"""From-scratch PDF-subset tokenizer (U2 in SURVEY.md §2.9).

Parses the closed subset of ``FIXTURES.md §1.1`` (plain or
FlateDecode-compressed content streams; text ops BT/ET Tf Td TD Tm T*
Tj TJ '; ``re`` + S/f rulings;
``cm /ImN Do`` image placements) into per-page glyph runs, ruling
segments, and image placements.  Runs inside the Arrow batch kernel —
one call per PDF byte stream, regex lexing per content stream (no
per-row Python at the Spark API level, per ``BASELINE.json:15``).

Spec source: ``BASELINE.json:6`` ("text-object tokenization").  The
reference repo has no parser to cite (``/root/reference/README.md:1``).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

from accountant_pdf_extract_spark import spec

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[([^\]]*)\]")
_XOBJ_RE = re.compile(rb"/XObject\s*<<(.*?)>>", re.S)
_XOBJ_ENTRY_RE = re.compile(rb"/(Im\d+)\s+(\d+)\s+0\s+R")
_NAME_RE = re.compile(rb"/Name\s*\(((?:[^()\\]|\\.)*)\)")

# Content-stream token: a (string), a [TJ array], a number, or an op.
_TOK_RE = re.compile(
    r"""\(((?:[^()\\]|\\.)*)\)      # 1: literal string
      | (\[)                        # 2: TJ array opens
      | (\])                        # 3: TJ array closes
      | (/[A-Za-z0-9]+)             # 4: name
      | ([-+]?\d*\.?\d+)            # 5: number
      | ([A-Za-z'"*]+)              # 6: operator
      | <([0-9A-Fa-f\s]*)>          # 7: hex string
    """,
    re.X,
)

_ESC_RE = re.compile(r"\\([0-7]{1,3}|[()\\n])")


def _unescape(s: str) -> str:
    def repl(m: re.Match) -> str:
        g = m.group(1)
        if g == "n":
            return "\n"
        if g[0] in "01234567":
            return chr(int(g, 8) & 0xFF)
        return g

    return _ESC_RE.sub(repl, s)


def _hex_to_str(h: str) -> str:
    h = re.sub(r"\s", "", h)
    if len(h) % 2:
        h += "0"
    return bytes.fromhex(h).decode("latin-1")


@dataclass
class Run:
    x: float
    y: float
    size: float
    text: str

    @property
    def end_x(self) -> float:
        return self.x + spec.CHAR_W_FACTOR * self.size * len(self.text)


@dataclass
class Rule:
    horiz: bool
    x: float
    y: float
    length: float


@dataclass
class Image:
    x: float
    y: float
    w: float
    h: float
    media_ref: str


@dataclass
class Page:
    runs: list[Run]
    rules: list[Rule]
    images: list[Image]


def parse_pdf(data: bytes) -> list[Page]:
    """Tokenize a PDF-subset byte stream into per-page primitives."""
    objs: dict[int, bytes] = {}
    streams: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        body = m.group(2)
        objs[num] = body
        sm = _STREAM_RE.search(body)
        if sm:
            raw = sm.group(1)
            # Filter declared in the stream dict (before the 'stream'
            # keyword — never match inside stream data itself).
            if b"/FlateDecode" in body[: sm.start()]:
                try:
                    raw = zlib.decompress(raw)
                except zlib.error:
                    # corrupt compressed stream: degrade to an empty
                    # content stream (page yields nothing) instead of
                    # raising and losing the whole document; oracle
                    # mirrors this.
                    raw = b""
            streams[num] = raw

    # Page order: the /Pages /Kids list if present, else object order.
    page_nums: list[int] = []
    for num, body in objs.items():
        if b"/Type /Pages" in body:
            km = _KIDS_RE.search(body)
            if km:
                page_nums = [int(r.group(1)) for r in _REF_RE.finditer(km.group(1))]
            break
    if not page_nums:
        page_nums = [
            n for n, b in sorted(objs.items())
            if b"/Type /Page" in b and b"/Type /Pages" not in b
        ]

    pages: list[Page] = []
    for pn in page_nums:
        body = objs.get(pn, b"")
        am = _CONTENTS_ARR_RE.search(body)
        if am:
            refs = [int(r.group(1)) for r in _REF_RE.finditer(am.group(1))]
            content = b"\n".join(streams.get(r, b"") for r in refs)
        else:
            cm = _CONTENTS_RE.search(body)
            content = streams.get(int(cm.group(1)), b"") if cm else b""
        xobj_refs: dict[str, str] = {}
        xm = _XOBJ_RE.search(body)
        if xm:
            for em in _XOBJ_ENTRY_RE.finditer(xm.group(1)):
                target = objs.get(int(em.group(2)), b"")
                nm = _NAME_RE.search(target)
                if nm:
                    xobj_refs[em.group(1).decode("latin-1")] = _unescape(
                        nm.group(1).decode("latin-1")
                    )
        pages.append(_parse_content(content.decode("latin-1"), xobj_refs))
    return pages


def _parse_content(content: str, xobj_refs: dict[str, str]) -> Page:
    runs: list[Run] = []
    rules: list[Rule] = []
    images: list[Image] = []

    size = 10.0
    leading = 12.0
    line_x = 0.0  # text line origin
    x = 0.0
    y = 0.0
    ctm = (1.0, 1.0, 0.0, 0.0)  # (a, d, e, f) — only scale+translate used
    stack: list[tuple[float, float, float, float]] = []
    nums: list[float] = []
    names: list[str] = []
    strings: list[str] = []
    tj_parts: list[tuple[bool, object]] = []  # (is_string, val) inside [...]
    in_array = False

    def emit(txt: str) -> None:
        nonlocal x
        if txt:
            runs.append(Run(x=x, y=y, size=size, text=txt))
            x += spec.CHAR_W_FACTOR * size * len(txt)

    # Dispatch on m.lastindex (the single alternation group that
    # matched) instead of unpacking all 7 groups per token; branch
    # order = measured token frequency (ops ≈ 45%, numbers ≈ 36%).
    for m in _TOK_RE.finditer(content):
        gi = m.lastindex
        if gi == 6:  # operator
            op = m.group(6)
            if op == "Td":
                if len(nums) >= 2:
                    line_x += nums[-2]
                    y += nums[-1]
                    x = line_x
            elif op == "Tj":
                if strings:
                    emit(strings[-1])
            elif op == "Tf":
                if nums:
                    size = nums[-1]
            elif op == "BT":
                line_x = x = y = 0.0
            elif op == "ET":
                pass
            elif op == "'":
                y -= leading
                x = line_x
                if strings:
                    emit(strings[-1])
            elif op == "TD":
                if len(nums) >= 2:
                    leading = -nums[-1]
                    line_x += nums[-2]
                    y += nums[-1]
                    x = line_x
            elif op == "TL":
                if nums:
                    leading = nums[-1]
            elif op == "Tm":
                if len(nums) >= 6:
                    line_x = nums[-2]
                    y = nums[-1]
                    x = line_x
            elif op == "T*":
                y -= leading
                x = line_x
            elif op == "TJ":
                buf: list[str] = []
                for is_str, val in tj_parts:
                    if is_str:
                        buf.append(str(val))
                    elif float(val) <= spec.TJ_SPACE_THRESH:  # type: ignore[arg-type]
                        buf.append(" ")
                emit("".join(buf))
                tj_parts = []
            elif op == "re":
                if len(nums) >= 4:
                    rx, ry, rw, rh = nums[-4:]
                    if abs(rh) <= spec.RULE_EPS and rw > spec.RULE_EPS:
                        rules.append(Rule(horiz=True, x=rx, y=ry, length=rw))
                    elif abs(rw) <= spec.RULE_EPS and rh > spec.RULE_EPS:
                        rules.append(Rule(horiz=False, x=rx, y=ry, length=rh))
            elif op == "cm":
                if len(nums) >= 6:
                    a, b_, c_, d, e, f = nums[-6:]
                    ctm = (a, d, e, f)
            elif op == "q":
                stack.append(ctm)
            elif op == "Q":
                ctm = stack.pop() if stack else (1.0, 1.0, 0.0, 0.0)
            elif op == "Do":
                if names:
                    ref = xobj_refs.get(names[-1])
                    if ref:
                        images.append(
                            Image(
                                x=ctm[2], y=ctm[3], w=ctm[0], h=ctm[1],
                                media_ref=ref,
                            )
                        )
            # S, f, W, n etc. need no action beyond operand reset.
            # Operand stacks reset after every operator (q/Q preserve
            # the pending numbers; Do consumes its name).
            if op not in ("q", "Q"):
                nums = []
            strings = []
            if op == "Do":
                names = []
        elif gi == 5:  # number
            v = float(m.group(5))
            if in_array:
                tj_parts.append((False, v))
            else:
                nums.append(v)
        elif gi == 1:  # literal string
            s = _unescape(m.group(1))
            if in_array:
                tj_parts.append((True, s))
            else:
                strings.append(s)
        elif gi == 4:  # /Name
            names.append(m.group(4)[1:])
        elif gi == 2:  # TJ array opens
            in_array = True
            tj_parts = []
        elif gi == 3:  # TJ array closes
            in_array = False
        else:  # gi == 7: hex string
            s = _hex_to_str(m.group(7))
            if in_array:
                tj_parts.append((True, s))
            else:
                strings.append(s)

    return Page(runs=runs, rules=rules, images=images)
