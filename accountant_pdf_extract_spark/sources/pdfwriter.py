"""Deterministic PDF-subset writer used by the synthetic corpus.

Emits exactly the closed, latin-1-safe PDF subset pinned in
``FIXTURES.md §1.1`` — the same subset ``operators/pdfparse.py``
reads.  Content streams are plain by default; ``compress=True`` emits
FlateDecode (zlib) streams.  Text ops BT/ET Tf Td TD Tm T* Tj TJ ', rect rulings ``re S/f``,
image XObjects via ``q ... cm /ImN Do Q`` whose dict carries the
``media_ref`` in ``/Name``.

This module builds *bytes-as-latin-1 strings* (the span column is
string-typed per ``BASELINE.json:15``); everything stays in the
latin-1 plane.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _n(v: float) -> str:
    """Exponent-free number formatting for content streams: the
    parser's token grammar (and its oracle mirror) has no exponent
    form, while '%g' silently switches to '1e-05'/'1.2e+06' outside
    [1e-4, 1e6) — geometry would corrupt with no error (the lexer
    reads '1e-05' as 1, unknown op 'e', -05).  Fixed-point, 4
    decimals, trailing zeros stripped — identical output to %g for
    every coordinate the synth corpus emits."""
    s = f"{v:.4f}".rstrip("0").rstrip(".")
    return s if s not in ("", "-", "-0") else "0"


@dataclass
class PageBuilder:
    """Accumulates content-stream ops + image XObjects for one page."""

    ops: list[str] = field(default_factory=list)
    images: list[str] = field(default_factory=list)  # media_refs, -> /Im{i+1}

    def text(self, x: float, y: float, s: str, size: float = 10.0) -> None:
        self.ops.append(
            f"BT /F1 {_n(size)} Tf {_n(x)} {_n(y)} Td ({_esc(s)}) Tj ET"
        )

    def text_tj(
        self, x: float, y: float, parts: list[str | float], size: float = 10.0
    ) -> None:
        """[(s1) -250 (s2)] TJ — numbers are kerning (1/1000 em)."""
        body = " ".join(
            f"({_esc(p)})" if isinstance(p, str) else _n(p) for p in parts
        )
        self.ops.append(f"BT /F1 {_n(size)} Tf {_n(x)} {_n(y)} Td [{body}] TJ ET")

    def text_block(
        self, x: float, y: float, lines: list[str], size: float = 10.0,
        leading: float = 14.0,
    ) -> None:
        """One BT block using TD (sets leading) + ' (next-line-show)."""
        if not lines:
            return
        ops = [f"BT /F1 {_n(size)} Tf {_n(leading)} TL {_n(x)} {_n(y)} Td"]
        ops.append(f"({_esc(lines[0])}) Tj")
        for ln in lines[1:]:
            ops.append(f"({_esc(ln)}) '")
        ops.append("ET")
        self.ops.append(" ".join(ops))

    def hrule(self, x: float, y: float, w: float) -> None:
        self.ops.append(f"{_n(x)} {_n(y)} {_n(w)} 0.5 re S")

    def vrule(self, x: float, y: float, h: float) -> None:
        self.ops.append(f"{_n(x)} {_n(y)} 0.5 {_n(h)} re S")

    def image(self, x: float, y: float, w: float, h: float, media_ref: str) -> None:
        idx = len(self.images) + 1
        self.images.append(media_ref)
        self.ops.append(f"q {_n(w)} 0 0 {_n(h)} {_n(x)} {_n(y)} cm /Im{idx} Do Q")

    def content(self) -> str:
        return "\n".join(self.ops) + "\n"


def build_pdf(pages: list[PageBuilder], compress: bool = False) -> str:
    """Assemble pages into a PDF-subset document (latin-1 string).

    ``compress=True`` emits FlateDecode content streams (zlib level 6,
    deterministic).  Compressed bytes ride losslessly in the latin-1
    string plane (all 256 byte values map 1:1).  If the compressed
    bytes happen to contain a structural marker (``endstream`` /
    ``endobj`` — would confuse the regex-based subset parsers), that
    page falls back to an uncompressed stream; the closed world keeps
    both forms parseable."""
    import zlib

    objs: list[str] = []  # objs[i] = body of object i+1

    def add(body: str) -> int:
        objs.append(body)
        return len(objs)

    catalog_num = add("<< /Type /Catalog /Pages 2 0 R >>")
    pages_num = add("PLACEHOLDER")  # patched below
    page_nums: list[int] = []
    for pg in pages:
        content = pg.content()
        raw = content.encode("latin-1")
        stream_body = None
        # A plain stream whose CONTENT embeds a structural marker
        # (caller text containing "endstream"/"endobj") would make the
        # parser's lazy stream regex terminate early and silently drop
        # the rest of the page — force Flate for such pages even when
        # compress=False, trying several levels for marker-free bytes.
        plain_ok = b"endstream" not in raw and b"endobj" not in raw
        if compress or not plain_ok:
            for lvl in (6, 9, 1):
                comp = zlib.compress(raw, lvl)
                if b"endstream" not in comp and b"endobj" not in comp:
                    stream_body = (
                        f"<< /Length {len(comp)} /Filter /FlateDecode >>\n"
                        f"stream\n{comp.decode('latin-1')}endstream"
                    )
                    break
        if stream_body is None:
            if not plain_ok:
                raise ValueError(
                    "page content embeds PDF structural markers in both "
                    "plain and compressed form"
                )
            stream_body = (
                f"<< /Length {len(raw)} >>\nstream\n{content}endstream"
            )
        stream_num = add(stream_body)
        xobj_entries = []
        for i, ref in enumerate(pg.images, start=1):
            im_num = add(
                f"<< /Type /XObject /Subtype /Image /Name ({_esc(ref)}) "
                f"/Width 100 /Height 100 >>"
            )
            xobj_entries.append(f"/Im{i} {im_num} 0 R")
        res = ""
        if xobj_entries:
            res = f" /Resources << /XObject << {' '.join(xobj_entries)} >> >>"
        page_num = add(
            "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {stream_num} 0 R{res} >>"
        )
        page_nums.append(page_num)

    kids = " ".join(f"{n} 0 R" for n in page_nums)
    objs[pages_num - 1] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_nums)} >>"
    )
    assert catalog_num == 1

    out = ["%PDF-1.4"]
    for i, body in enumerate(objs, start=1):
        out.append(f"{i} 0 obj\n{body}\nendobj")
    out.append("%%EOF")
    return "\n".join(out) + "\n"
