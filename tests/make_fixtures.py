"""Generate the committed golden fixtures (run manually; outputs are
committed so CI never depends on regeneration):

    python tests/make_fixtures.py

Writes tests/fixtures/{fixture_docs,golden_spans,golden_fields}.parquet.
Inputs: 40 seeded synth docs (seed=7) + handcrafted edge documents
covering every heuristic (FIXTURES.md §1.2).  Golden outputs come from
the code-disjoint oracle (tests/oracle.py), NOT the engine.
"""

from __future__ import annotations

import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

from accountant_pdf_extract_spark.sources.pdfwriter import PageBuilder, build_pdf
from accountant_pdf_extract_spark.sources.synth import DEFAULT_WORDS, build_doc
from tests.oracle import oracle_extract

FIXDIR = pathlib.Path(__file__).parent / "fixtures"

SPAN_T = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)


def handcrafted() -> list[tuple[str, list[tuple[str, str, str, int]]]]:
    docs: list[tuple[str, list[tuple[str, str, str, int]]]] = []

    docs.append(("edge-empty", []))
    docs.append(("edge-ws-text", [("text", "   \t  ", "", 0)]))
    docs.append(("edge-media-only", [("media", "", "media://sha/00deadbeef00cafe", 0)]))
    docs.append(("edge-unknown-kind", [("zzz", "ignore me", "", 0), ("text", "kept", "", 1)]))

    # empty pdf: one page, no text ops
    pg = PageBuilder()
    docs.append(("edge-pdf-notext", [("pdf", build_pdf([pg]), "", 0)]))

    # locale amounts + dates + account codes, one per line
    docs.append(
        (
            "edge-locales",
            [
                (
                    "text",
                    "Factura Num: FC-2025-777",
                    "",
                    0,
                ),
                ("text", "Fecha: 07/03/2025 vencimiento: 15/04/2025", "", 1),
                ("text", "Summe: 1.234,56 €", "", 2),
                ("text", "Balance: £12 345.00", "", 3),
                ("text", "adjustment ($987.65) noted", "", 4),
                ("text", "Konto: 4000.12 and 1200-4711", "", 5),
                ("text", "Dated March 7, 2025 and 07.03.2025", "", 6),
            ],
        )
    )

    # handcrafted pdf exercising Tm / T* / TD / TJ and ruled grid
    pg = PageBuilder()
    pg.ops.append("BT /F1 10 Tf 1 0 0 1 72 700 Tm (From Tm op) Tj ET")
    pg.ops.append(
        "BT /F1 10 Tf 16 TL 72 660 Td (line one) Tj T* (line two) Tj ET"
    )
    pg.ops.append("BT /F1 10 Tf 72 600 TD (td line a) Tj ET")
    pg.text_tj(72, 560, ["part", -250.0, "gap", -50.0, "close"], size=10)
    pg.hrule(72, 540, 300)
    pg.text(72, 520, "cellA")
    pg.text(200, 520, "cellB")
    pg.vrule(180, 500, 60)
    docs.append(("edge-ops", [("pdf", build_pdf([pg]), "", 0)]))

    # html with entities, links, nested drop tags
    html = (
        "<html><body><header><nav><a href='/'>Home</a></nav>deco</header>"
        "<p>Tom &amp; Jerry&#39;s ledger entry is long enough.</p>"
        "<div><a href='/x'>tiny</a></div>"
        "<div>Mostly <a href='/y'>link text that dominates this here block</a> x</div>"
        "<ul><li>first bullet item line</li><li>second bullet item line</li></ul>"
        "</body></html>"
    )
    docs.append(("edge-html", [("html", html, "", 0)]))

    # giant multi-page PDF (the skew tail): 25 pages, repeated
    # header/footer boilerplate, body paragraphs — pins the giant path
    giant_pages = []
    for p in range(25):
        pg = PageBuilder()
        pg.text(72, 760, "MegaCorp Ltd - Annual Statement")
        pg.text(72, 30, f"Page {p + 1} of 25")
        pg.text_block(
            72, 700,
            [f"page {p} line {i} of the giant body" for i in range(12)],
            leading=18,
        )
        giant_pages.append(pg)
    docs.append(("edge-giant-pdf", [("pdf", build_pdf(giant_pages), "", 0)]))

    # rotated text: a 90° 'PAID' stamp + an upside-down watermark on a
    # portrait page, and a LANDSCAPE page (every run 90° CCW) whose
    # table header must come out in reading order — full-Tm semantics
    pg = PageBuilder()
    pg.text(72, 760, "Rotated Stamp Co Invoice INV-2025-0077")
    pg.text(72, 700, "Total: $842.10 due 06/15/2025")
    pg.text_block(72, 660, ["first body line", "second body line"], leading=14)
    pg.text_rot(540, 300, "PAID", quad=1, size=24)
    pg.text_rot(306, 400, "VOID IF ALTERED", quad=2)
    pg.text_rot_block(30, 700, ["ORIGINAL", "COPY 1"], quad=3, size=8)
    land = PageBuilder()
    # 90°-CCW text reads with the page rotated CW, so the landscape
    # page's TOP edge is small device x; successive lines grow x
    land.text_rot(60, 60, "Landscape Ledger Statement", quad=1, size=14)
    # landscape table: per-cell rotated runs — the reading-frame gap
    # heuristic must join them into tab-separated header/body lines
    for row_x, cells in (
        (100, ["Account", "Debit", "Credit"]),       # header row
        (120, ["4000.12", "$10.00", "$0.00"]),
        (140, ["1200-4711", "$0.00", "$10.00"]),
    ):
        for col_i, cell in enumerate(cells):
            land.text_rot(row_x, 60 + 140 * col_i, cell, quad=1)
    docs.append(
        ("edge-rotated-text", [("pdf", build_pdf([pg, land]), "", 0)])
    )

    # PDF-1.5 with predictor-12 (PNG Up) encoded ObjStm + xref stream
    # — the Acrobat layout; guarantees golden coverage regardless of
    # which synth docs the seed produces
    pred_pages = []
    for p in range(2):
        pg = PageBuilder()
        pg.text(72, 760, "Predictor Corp Invoice INV-2025-0042")
        pg.text(72, 700, f"Date: 05/0{p + 1}/2025 Total: $1,250.7{p}")
        pg.text_block(72, 660, ["alpha beta gamma", "delta epsilon"], leading=14)
        pg.hrule(72, 600, 250)
        pred_pages.append(pg)
    pred_pdf = build_pdf(pred_pages, objstm=True, predictor=True)
    assert "/DecodeParms << /Predictor 12" in pred_pdf
    docs.append(("edge-predictor-xref", [("pdf", pred_pdf, "", 0)]))

    # Acrobat hybrid layout: classic xref table (packed objects free)
    # + trailer /XRefStm pointer + predictor-12 streams
    hyb_pdf = build_pdf(pred_pages, hybrid=True, predictor=True)
    assert "/XRefStm" in hyb_pdf and "trailer" in hyb_pdf
    docs.append(("edge-hybrid-xref", [("pdf", hyb_pdf, "", 0)]))

    # standard-security encrypted (empty user password): RC4-40 plain
    # and RC4-128 + FlateDecode — the common e-mailed-invoice shapes
    enc40 = build_pdf(pred_pages, encrypt="rc4-40")
    enc128 = build_pdf(pred_pages, compress=True, encrypt="rc4-128")
    for e in (enc40, enc128):
        assert "/Filter /Standard" in e and "Predictor Corp" not in e
    docs.append(("edge-encrypted-rc4-40", [("pdf", enc40, "", 0)]))
    docs.append(("edge-encrypted-rc4-128", [("pdf", enc128, "", 0)]))

    # interleaving: text, media, pdf, text with explicit offsets reversed
    pg = PageBuilder()
    pg.text(72, 700, "pdf body line")
    docs.append(
        (
            "edge-interleave",
            [
                ("text", "tail text", "", 3),
                ("pdf", build_pdf([pg]), "", 2),
                ("media", "", "media://sha/0123456789abcdef", 1),
                ("text", "head text", "", 0),
            ],
        )
    )
    return docs


def main() -> None:
    FIXDIR.mkdir(exist_ok=True)
    docs = handcrafted()
    for k in range(40):
        docs.append((f"fix-{k:04d}", build_doc(k, 7, DEFAULT_WORDS)))

    in_ids, in_spans = [], []
    g_doc, g_kind, g_text, g_ref, g_ord = [], [], [], [], []
    f_rows: dict[str, list] = {
        "doc_id": [], "invoice_id": [], "invoice_date": [], "due_date": [],
        "currency": [], "total": [], "amounts": [], "account_codes": [],
    }

    for doc_id, spans in docs:
        in_ids.append(doc_id)
        in_spans.append(
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for k, t, m, o in spans
            ]
        )
        out, fields = oracle_extract(spans)
        for kind, text, ref, order in out:
            g_doc.append(doc_id)
            g_kind.append(kind)
            g_text.append(text)
            g_ref.append(ref)
            g_ord.append(order)
        f_rows["doc_id"].append(doc_id)
        for key in (
            "invoice_id", "invoice_date", "due_date", "currency", "total",
            "amounts", "account_codes",
        ):
            f_rows[key].append(fields[key])

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(in_ids, pa.string()),
                "spans": pa.array(in_spans, pa.list_(SPAN_T)),
            }
        ),
        FIXDIR / "fixture_docs.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(g_doc, pa.string()),
                "kind": pa.array(g_kind, pa.string()),
                "text": pa.array(g_text, pa.string()),
                "media_ref": pa.array(g_ref, pa.string()),
                "order": pa.array(g_ord, pa.int32()),
            }
        ),
        FIXDIR / "golden_spans.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(f_rows["doc_id"], pa.string()),
                "invoice_id": pa.array(f_rows["invoice_id"], pa.string()),
                "invoice_date": pa.array(f_rows["invoice_date"], pa.date32()),
                "due_date": pa.array(f_rows["due_date"], pa.date32()),
                "currency": pa.array(f_rows["currency"], pa.string()),
                "total": pa.array(f_rows["total"], pa.decimal128(18, 2)),
                "amounts": pa.array(
                    f_rows["amounts"], pa.list_(pa.decimal128(18, 2))
                ),
                "account_codes": pa.array(
                    f_rows["account_codes"], pa.list_(pa.string())
                ),
            }
        ),
        FIXDIR / "golden_fields.parquet",
    )
    print(f"wrote {len(docs)} fixture docs, {len(g_doc)} golden spans")


if __name__ == "__main__":
    main()
