"""Shared layout/heuristic constants — the single source of truth for
both the engine kernels and the code-disjoint test oracle
(``tests/oracle.py``).

These pin the PDF-subset geometry heuristics (line clustering,
whitespace-gap columns, boilerplate zones) so golden fixtures are a
spec, not an accident.  Spec source: ``/root/repo/BASELINE.json:6``
(north_star: "x/y line clustering, reading-order sort, table/cell
detection via ruling-line and whitespace-gap heuristics ...
boilerplate headers/footers stripped via repeated-line frequency
heuristics across pages").  The reference repo contains no code to
cite (``/root/reference/README.md:1``).
"""

# Page geometry: the DEFAULT /MediaBox (US Letter) when a page
# declares none; pages carry their own (w, h) from /MediaBox since
# r5 (EUR invoices are A4), and every geometric cut below derives
# from the page dims via the FRAC constants.
PAGE_W = 612.0
PAGE_H = 792.0

# Header/footer zones: top/bottom 8% of PAGE height (y >= 728.64 /
# y <= 63.36 on US Letter, 774.5 / 67.4 on A4).  Body copy
# conventionally starts around y=700–720 on Letter, so a 15% zone
# would swallow real content.
TOP_ZONE_FRAC = 0.92  # y >= this * page_h → header zone
BOT_ZONE_FRAC = 0.08  # y <= this * page_h → footer zone

# Line clustering: two glyph runs belong to the same line iff their
# baseline y differs by no more than this (points).
LINE_Y_TOL = 2.0

# Run joining within a line (gap measured from estimated end-x of the
# previous run to start-x of the next):
#   gap >  TAB_GAP_PTS                → tab (whitespace-gap column)
#   gap >  SPACE_GAP_FACTOR * size    → single space
#   else                              → direct concatenation
TAB_GAP_PTS = 18.0
SPACE_GAP_FACTOR = 0.25

# Nominal glyph advance: width of one character = CHAR_W_FACTOR * font size.
# (The synth writer and the parser share this monospace-ish estimate.)
# Used when a font declares NO metrics; fonts carrying /Widths (simple)
# or /W + /DW (CID) advance per SOURCE GLYPH CODE instead (ISO 32000-1
# §9.7.4.3 / §9.2.4) — a ToUnicode ligature code then advances one
# glyph, not len(decoded) chars.
CHAR_W_FACTOR = 0.5

# Per-glyph width-model defaults (thousandths of an em, §9.7.4.3):
# simple-font codes outside [FirstChar, LastChar] use the descriptor's
# /MissingWidth (default 0); CID codes absent from /W use /DW
# (default 1000).
MISSING_W_MILLI = 0
CID_DW_MILLI = 1000

# TJ array kerning: a numeric adjustment <= this (thousandths of an em)
# renders as a single space.
TJ_SPACE_THRESH = -180.0

# Ruling lines: a stroked/filled `re` rect with height <= RULE_EPS is a
# horizontal rule; width <= RULE_EPS is a vertical rule.
RULE_EPS = 2.0

# Boilerplate (repeated header/footer) strip: only for docs with >= 2
# pages; a normalized line is boilerplate iff it occurs on >= 2 distinct
# pages AND on >= BOILER_FRAC of all pages AND every occurrence lies in
# the header or footer zone.
BOILER_MIN_PAGES = 2
BOILER_FRAC = 0.6

# Two-column detection: body items must all lie strictly left
# (end_x < page_w/2) or start right (x >= page_w/2), with at least
# COL_MIN_SIDE items per side and COL_MIN_TOTAL body items.
COL_MIN_SIDE = 2
COL_MIN_TOTAL = 6

# HTML main-content heuristics (boilerpipe-style, from-scratch):
HTML_MIN_CHARS = 10          # keep a block iff its text length >= this
HTML_MAX_LINK_DENSITY = 0.5  # ... and anchor-text chars / total chars <= this
# hostile/not-HTML bail: payloads whose '<' openers vastly outnumber
# '>' closers make every [^>]* tag scan run to (nearly) end-of-string
# — quadratic on one bad doc.  When '<' count exceeds BOTH thresholds
# the payload is treated as plain text (entities decoded, no tag
# stripping) by engine AND oracle.
HTML_HOSTILE_MIN_LT = 64     # density test applies above this many '<'
HTML_HOSTILE_LT_PER_GT = 4   # ... when '<' > this x '>' count
HTML_DROP_TAGS = ("script", "style", "nav", "header", "footer", "aside")
HTML_BLOCK_TAGS = (
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "tr", "table", "ul", "ol", "br", "section", "article",
)

# --- Simple-font decoding (PDF 1.5 features, round 4) ----------------
# Glyph-name → Unicode subset (Adobe Glyph List entries the synth
# writer / real accountant PDFs actually use in /Differences arrays).
# Codes without a mapping decode as identity latin-1; unknown glyph
# names keep the identity char (never drop text).
GLYPH_UNICODE = {
    "Euro": "€",
    "endash": "–",
    "emdash": "—",
    "bullet": "•",
    "dagger": "†",
    "daggerdbl": "‡",
    "ellipsis": "…",
    "quotedblleft": "“",
    "quotedblright": "”",
    "quoteleft": "‘",
    "quoteright": "’",
    "quotesinglbase": "‚",
    "quotedblbase": "„",
    "guilsinglleft": "‹",
    "guilsinglright": "›",
    "perthousand": "‰",
    "trademark": "™",
    "florin": "ƒ",
    "fi": "ﬁ",
    "fl": "ﬂ",
    "OE": "Œ",
    "oe": "œ",
    "Scaron": "Š",
    "scaron": "š",
    "Ydieresis": "Ÿ",
    "Zcaron": "Ž",
    "zcaron": "ž",
    "circumflex": "ˆ",
    "tilde": "˜",
    "sterling": "£",
    "currency": "¤",
    "yen": "¥",
    "cent": "¢",
    "space": " ",
    "hyphen": "-",
}

# bfrange expansion cap: a hostile <00> <FFFF> range would allocate
# 64k map entries per font; codes are single-byte in this subset so
# anything beyond 256 consecutive codes is clamped (engine + oracle).
BFRANGE_MAX_SPAN = 256

# WinAnsiEncoding (cp1252) high block: the 27 codes in 0x80-0x9F that
# differ from latin-1 (the rest of WinAnsi IS latin-1).  Applied as
# the base table when a font names /WinAnsiEncoding (directly or via
# /BaseEncoding); /Differences then /ToUnicode override per code.
WINANSI_HIGH = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…",
    0x86: "†", 0x87: "‡", 0x88: "ˆ", 0x89: "‰", 0x8A: "Š",
    0x8B: "‹", 0x8C: "Œ", 0x8E: "Ž", 0x91: "‘", 0x92: "’",
    0x93: "“", 0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›", 0x9C: "œ",
    0x9E: "ž", 0x9F: "Ÿ",
}

# Standard security handler padding string (ISO 32000-1 §7.6.3.3,
# Algorithm 2) — the 32 bytes appended/truncated onto passwords; an
# EMPTY user password is exactly this pad.  Shared engine/oracle/writer
# constant (the algorithms themselves are implemented independently).
PDF_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])

# /AESV2 per-object key salt (ISO 32000-1 §7.6.2 Algorithm 1 step a):
# the 4 bytes 0x73 0x41 0x6C 0x54 ("sAlT") appended after the object
# number/generation bytes before the MD5.  Shared engine/oracle/writer
# constant like PDF_PAD.
PDF_AES_SALT = b"sAlT"
