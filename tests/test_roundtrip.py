"""True round-trip property (SURVEY.md §5.3): lines written into the
PDF subset at known positions must be recovered exactly, in reading
order — correctness against the *generator's intent*, independent of
both the engine and the oracle implementations."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from accountant_pdf_extract_spark.operators.doccore import extract_doc
from accountant_pdf_extract_spark.sources.pdfwriter import PageBuilder, build_pdf

# latin-1-safe visible chars incl. regex/PDF specials worth stressing
_CHARS = st.sampled_from(
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
    + list(" ()\\.,:;$£#-_/")
)

_line = (
    st.text(alphabet=_CHARS, min_size=1, max_size=60)
    .map(lambda s: " ".join(s.split()))  # collapse doubles: writer emits
    .filter(lambda s: s.strip())         # one run; clustering keeps 1 space
)


@settings(max_examples=80, deadline=None)
@given(
    pages=st.lists(
        st.lists(_line, min_size=1, max_size=30, unique=True),
        min_size=1,
        max_size=3,
    )
)
def test_pdf_line_roundtrip(pages: list[list[str]]) -> None:
    builders = []
    for lines in pages:
        pg = PageBuilder()
        for i, line in enumerate(lines):
            pg.text(72, 700 - 16 * i, line)
        builders.append(pg)
    pdf = build_pdf(builders)

    out, _ = extract_doc([("pdf", pdf, "", 0)])
    got = [t for kind, t, _, _ in out if kind == "text"]
    expect = [ln for lines in pages for ln in lines]
    assert got == expect


@settings(max_examples=30, deadline=None)
@given(
    body=st.lists(_line, min_size=1, max_size=10, unique=True),
    header=_line,
    n_pages=st.integers(min_value=2, max_value=4),
)
def test_header_footer_roundtrip(body, header, n_pages) -> None:
    """Repeated in-zone header/footer vanish; body lines survive."""
    builders = []
    for p in range(n_pages):
        pg = PageBuilder()
        pg.text(72, 760, header)
        pg.text(72, 30, f"Page {p + 1} of {n_pages}")
        for i, line in enumerate(body):
            pg.text(72, 700 - 16 * i, f"p{p} {line}")
        builders.append(pg)
    out, _ = extract_doc([("pdf", build_pdf(builders), "", 0)])
    got = [t for kind, t, _, _ in out if kind == "text"]
    expect = [f"p{p} {line}" for p in range(n_pages) for line in body]
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(
    cells=st.lists(
        st.lists(
            st.text(
                alphabet=st.sampled_from(list("abcdefghij0123456789")),
                min_size=1,
                max_size=8,
            ),
            min_size=2,
            max_size=3,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_table_cells_roundtrip(cells: list[list[str]]) -> None:
    """Whitespace-gap columns at fixed x positions come back tab-joined
    row-major."""
    pg = PageBuilder()
    xs = [72, 250, 430]
    for r, row in enumerate(cells):
        y = 600 - 18 * r
        for c, cell in enumerate(row):
            pg.text(xs[c], y, cell)
    out, _ = extract_doc([("pdf", build_pdf([pg]), "", 0)])
    got = [t for kind, t, _, _ in out if kind == "text"]
    assert got == ["\t".join(row) for row in cells]


@settings(max_examples=120, deadline=None)
@given(
    junk=st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=255),
        max_size=400,
    ),
    wrap=st.booleans(),
)
def test_parser_never_crashes_on_garbage(junk: str, wrap: bool) -> None:
    """Crash-safety fuzz: arbitrary latin-1 payloads — including ones
    dressed up with pdf markers — must parse to something (possibly
    empty), never raise."""
    payload = (
        f"%PDF-1.4\n1 0 obj << /Type /Page /Contents 2 0 R >> endobj\n"
        f"2 0 obj << /Length {len(junk)} >>\nstream\n{junk}\nendstream endobj\n"
        if wrap
        else junk
    )
    out, fields = extract_doc([("pdf", payload, "", 0)])
    assert isinstance(out, list)
    assert isinstance(fields, dict)


_para = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789,.")
    ),
    min_size=12,
    max_size=120,
).map(lambda s: " ".join(s.split())).filter(lambda s: len(s) >= 10)


@settings(max_examples=60, deadline=None)
@given(paras=st.lists(_para, min_size=1, max_size=6))
def test_html_paragraph_roundtrip(paras: list[str]) -> None:
    """Paragraph text survives the boilerplate strip exactly; nav/
    header/footer/script vanish regardless of the paragraphs."""
    body = "".join(f"<p>{p}</p>" for p in paras)
    html = (
        "<html><head><style>a{x:1}</style><script>junk()</script></head>"
        "<body><nav><a href='/'>L1</a> <a href='/'>L2</a></nav>"
        f"<header><h1>Site Title Here</h1></header>{body}"
        "<footer>contact legal imprint</footer></body></html>"
    )
    out, _ = extract_doc([("html", html, "", 0)])
    assert [t for _k, t, _r, _o in out] == paras
