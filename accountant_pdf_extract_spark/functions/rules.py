"""The accounting-field regex/anchor rules — pattern strings ARE the
spec (``BASELINE.json:6``: "invoice IDs, dates, currency amounts,
account codes ... regex/anchor rules"), shared verbatim by the engine
kernels and the code-disjoint oracle so golden fixtures pin semantics,
not implementation.
"""

# Invoice id: anchor word, optional no/nr/num marker, then an ID token
# like INV-2025-0042 / RE-88123 / FA-771.  Result is uppercased.
INVOICE_ID = (
    r"(?i)\b(?:invoice|inv|rechnung|factura)\b\.?\s*"
    r"(?:no|nr|num)?\.?\s*[:#]?\s*"
    r"([A-Za-z]{2,6}-[0-9][0-9A-Za-z-]*)"
)

# Date formats (ISO / dd.mm.yyyy / dd/mm/yyyy / "March 7, 2025").
MONTHS = (
    "january february march april may june july august september "
    "october november december"
).split()
_MONTH_ALT = "|".join(
    [m.capitalize() for m in MONTHS] + [m[:3].capitalize() for m in MONTHS]
)
DATE_ISO = r"\b(\d{4})-(\d{2})-(\d{2})\b"
DATE_DOTTED = r"\b(\d{2})\.(\d{2})\.(\d{4})\b"   # dd.mm.yyyy
DATE_SLASH = r"\b(\d{2})/(\d{2})/(\d{4})\b"      # dd/mm/yyyy
DATE_MONTHNAME = r"\b(" + _MONTH_ALT + r")\.?\s+(\d{1,2}),\s*(\d{4})\b"

# Anchor for the due date line.
DUE_ANCHOR = r"(?i)\b(?:due|f[äa]llig|vencimiento|[ée]ch[ée]ance)\b"

# Currency amounts.  Symbol-leading ($1,234.56 / £12 345.00 / € 1.234,56)
# and symbol-trailing European (1.234,56 €); parentheses => negative.
# Separator-less runs are a single \d+ alternative with a trailing
# (?!\d) guard: the old \d{1,3} head silently TRUNCATED "$1234.56"
# to 123 (a wrong financial value, not a skip).
AMOUNT_LEAD = (
    r"(\()?\s*([$\u20ac\u00a3])\s?"
    r"((?:\d{1,3}(?:[.,\u00a0 ]\d{3})+|\d+)(?:[.,]\d{2})?)(?!\d)(\s*\))?"
)
AMOUNT_TRAIL_EUR = (
    r"(\()?(?<![\d.,])((?:\d{1,3}(?:[.\u00a0 ]\d{3})+|\d+),\d{2})\s?(\u20ac)(\))?"
)
CURRENCY = {"$": "USD", "€": "EUR", "£": "GBP"}

# Total: the LAST line matching this anchor that carries an amount.
TOTAL_ANCHOR = r"(?i)\b(?:total|amount due|balance due|balance|summe|gesamt)\b"

# Account codes: 1200-4711 / 4000.12, only on account-anchored lines,
# guarded against eating date fragments.
ACCOUNT_ANCHOR = r"(?i)\b(?:account|acct|konto|kto|cuenta)\b"
ACCOUNT_CODE = r"(?<![\d.-])(\d{3,4}[-.]\d{2,4})(?![\d.-])"
