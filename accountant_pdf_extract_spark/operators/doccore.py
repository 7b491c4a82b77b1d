"""Per-document extraction core (U1+U2–U9 fused): interleaved input
spans → ordered output spans + accounting fields.

Pure Python/numpy — no Spark imports — so the same function serves the
``mapInArrow`` kernel (``operators/kernel.py``), unit tests, and the
synth round-trip property tests.  The semantics it implements are the
north-rule invariant (``BASELINE.json:15``): output spans are
``(kind, text, media_ref, order)`` with ``order`` the dense 0-based
reading-order rank; kinds ``text``/``media`` survive, plus ``annot``,
``form``
spans (value, field name) for AcroForm field values,
``attachment`` spans (content, filename) for PDF embedded files —
the ZUGFeRD/Factur-X hybrid-invoice shape — and ``meta`` spans
(value, /Info key) for document-information metadata
(Title/Author/CreationDate, §14.3.3).
"""

from __future__ import annotations

from accountant_pdf_extract_spark.operators.fields import extract_fields
from accountant_pdf_extract_spark.operators.htmlstrip import strip_html
from accountant_pdf_extract_spark.operators.layout import pdf_to_items
from accountant_pdf_extract_spark.operators.pdfparse import parse_pdf_full

OutSpan = tuple[str, str, str, int]  # (kind, text, media_ref, order)


def extract_doc(
    spans: list[tuple[str, str | None, str | None, int | None]],
) -> tuple[list[OutSpan], dict]:
    """spans: (kind, text, media_ref, offset) in any order.

    Processing order is input ``offset`` (ties: original position);
    pdf/html payloads expand in reading order in place.
    """
    out: list[tuple[str, str, str]] = []
    for kind, text, media_ref, _off in sorted(
        ((k, t, m, o if o is not None else i) for i, (k, t, m, o) in enumerate(spans)),
        key=lambda s: s[3],
    ):
        text = text or ""
        media_ref = media_ref or ""
        if kind == "text":
            if text.strip():
                out.append(("text", text, ""))
        elif kind == "media":
            if media_ref:
                out.append(("media", "", media_ref))
        elif kind == "pdf":
            if text:
                # PDF payloads travel as latin-1 strings (FIXTURES.md
                # §1.1); a stray non-latin-1 char must degrade to '?'
                # for that char only — never drop the whole document
                # (the oracle applies the same replacement).
                pages, forms, attachments, annots, info = parse_pdf_full(
                    text.encode("latin-1", errors="replace")
                )
                for it in pdf_to_items(pages):
                    if it.is_media:
                        out.append(("media", "", it.media_ref))
                    else:
                        out.append(("text", it.text, ""))
                # markup-annotation notes trail the page items
                # (contents in text, subtype in media_ref), then
                # AcroForm field values (value in text, field name in
                # media_ref), then embedded files (ZUGFeRD-style;
                # content in text, filename in media_ref); none feed
                # field extraction — the document text rules stay
                # payload-only
                for subtype, contents in annots:
                    out.append(("annot", contents, subtype))
                for name, value in forms:
                    out.append(("form", value, name))
                for name, content in attachments:
                    out.append(("attachment", content, name))
                # document-information metadata trails everything
                # (value in text, /Info key in media_ref); like the
                # other non-page kinds it never feeds field extraction
                for key, value in info:
                    out.append(("meta", value, key))
        elif kind == "html":
            for block in strip_html(text):
                out.append(("text", block, ""))
        # unknown kinds dropped (validity guard P4, SURVEY.md §2.2)

    ordered: list[OutSpan] = [
        (k, t, m, i) for i, (k, t, m) in enumerate(out)
    ]
    fields = extract_fields([t for k, t, _, _ in ordered if k == "text"])
    return ordered, fields
