"""The accounting-field regex/anchor rules — pattern strings ARE the
spec (``BASELINE.json:6``: "invoice IDs, dates, currency amounts,
account codes ... regex/anchor rules"), shared verbatim by the engine
kernels and the code-disjoint oracle so golden fixtures pin semantics,
not implementation.
"""

# Invoice id: anchor word, optional marker word, then an ID token
# like INV-2025-0042 / RE-88123 / FA-771.  Result is uppercased.
# Marker alternation is LONGEST-FIRST and includes the full words:
# with only (?:no|nr|num), "Invoice Number:" had 'num' eat 'Num' and
# the leftover 'ber' blocked the ID token — the most common English
# label extracted NOTHING.  'rechnungsnummer' is one German word, so
# the anchor's \b never fires after 'rechnung' — listed explicitly.
INVOICE_ID = (
    r"(?i)\b(?:invoice|inv|rechnungsnummer|rechnung|factura)\b\.?\s*"
    r"(?:number|nummer|num|no|nr)?\.?\s*[:#]?\s*"
    r"([A-Za-z]{2,6}-[0-9][0-9A-Za-z-]*)"
)

# Date formats (ISO / dd.mm.yyyy / dd/mm/yyyy / "March 7, 2025").
MONTHS = (
    "january february march april may june july august september "
    "october november december"
).split()
# full names, then "Sept" (the standard 4-letter abbreviation — the
# bare 3-letter list left 'Sept. 3, 2024' unmatched because 'Sep'
# matched but the following 't' broke the separator), then 3-letter
# prefixes; longest-first so alternation never stops short
_MONTH_ALT = "|".join(
    [m.capitalize() for m in MONTHS]
    + ["Sept"]
    + [m[:3].capitalize() for m in MONTHS]
)
DATE_ISO = r"\b(\d{4})-(\d{2})-(\d{2})\b"
DATE_DOTTED = r"\b(\d{2})\.(\d{2})\.(\d{4})\b"   # dd.mm.yyyy
DATE_SLASH = r"\b(\d{2})/(\d{2})/(\d{4})\b"      # dd/mm/yyyy
DATE_MONTHNAME = r"\b(" + _MONTH_ALT + r")\.?\s+(\d{1,2}),\s*(\d{4})\b"

# Anchor for the due date line.
DUE_ANCHOR = r"(?i)\b(?:due|f[äa]llig|vencimiento|[ée]ch[ée]ance)\b"

# Currency amounts.  Symbol-leading ($1,234.56 / £12 345.00 / € 1.234,56)
# and symbol-trailing European (1.234,56 €); parentheses => negative.
# Separator-less runs are a single \d+ alternative; trailing guards:
# (?!\d) — the old \d{1,3} head silently TRUNCATED "$1234.56" to 123 —
# and (?![.,]\d) — malformed grouping like "$12,34,567.00" (lakh
# style) or "$1,2345" backtracked to a PARTIAL match (12.34 / 1.00,
# wrong financial values); with the guard such shapes skip entirely.
# Space/NBSP are NOT in the trailing guard: "$100 2024-01-01" must
# still extract 100.  Symbol-digit gap is \s{0,3} (column-aligned
# invoices pad more than one space; \s? missed them entirely).
AMOUNT_LEAD = (
    r"(\()?\s*([$\u20ac\u00a3])\s{0,3}"
    r"((?:\d{1,3}(?:[.,\u00a0 ]\d{3})+|\d+)(?:[.,]\d{2})?)(?!\d)(?![.,]\d)(\s*\))?"
)
# \s* inside the paren groups: "( 1.234,56 €)" lost its sign (one
# paren group failed to match while the amount still did)
AMOUNT_TRAIL_EUR = (
    r"(\()?\s*(?<![\d.,])((?:\d{1,3}(?:[.\u00a0 ]\d{3})+|\d+),\d{2})\s?(\u20ac)\s*(\))?"
)
CURRENCY = {"$": "USD", "€": "EUR", "£": "GBP"}

# Total: the LAST line matching this anchor that carries an amount.
TOTAL_ANCHOR = r"(?i)\b(?:total|amount due|balance due|balance|summe|gesamt)\b"

# Account codes: 1200-4711 / 4000.12, only on account-anchored lines,
# guarded against eating date fragments.  The trailing guard rejects
# only digit CONTINUATIONS ((?!\d) and (?![.-]\d)) — a sentence-ending
# period/hyphen after the code ("Account 4000.12.") must not drop it.
ACCOUNT_ANCHOR = r"(?i)\b(?:account|acct|konto|kto|cuenta)\b"
ACCOUNT_CODE = r"(?<![\d.-])(\d{3,4}[-.]\d{2,4})(?!\d)(?![.-]\d)"
