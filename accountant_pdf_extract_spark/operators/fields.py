"""Accounting-field extraction (U8, SURVEY.md §2.9): invoice IDs,
dates, currency amounts, account codes via the regex/anchor rules in
``functions/rules.py`` (``BASELINE.json:6``).

Per-document pure function over the doc's ordered text lines, invoked
from the Arrow batch kernel.  The DataFrame-native variant (for the
driver-checkable queries) lives in ``__spark_entry__.py`` via
``regexp_extract`` — this module is the kernel path.
"""

from __future__ import annotations

import datetime as dt
import re
from decimal import Decimal

from accountant_pdf_extract_spark.functions import rules

_INVOICE_ID = re.compile(rules.INVOICE_ID)
_DUE = re.compile(rules.DUE_ANCHOR)
_TOTAL = re.compile(rules.TOTAL_ANCHOR)
_ACCOUNT = re.compile(rules.ACCOUNT_ANCHOR)
_ACCOUNT_CODE = re.compile(rules.ACCOUNT_CODE)
_AMOUNT_LEAD = re.compile(rules.AMOUNT_LEAD)
_AMOUNT_TRAIL = re.compile(rules.AMOUNT_TRAIL_EUR)
_DATE_ISO = re.compile(rules.DATE_ISO)
_DATE_DOTTED = re.compile(rules.DATE_DOTTED)
_DATE_SLASH = re.compile(rules.DATE_SLASH)
_DATE_MONTH = re.compile(rules.DATE_MONTHNAME)
# lookups truncate to 3 chars, so 3-letter prefixes are the only
# operative keys (full-name entries were dead weight)
_MONTH_NUM = {m[:3]: i + 1 for i, m in enumerate(rules.MONTHS)}

_CENT = Decimal("0.01")
_HAS_DIGIT = re.compile(r"\d")


def parse_amount(num: str) -> Decimal:
    """Locale-disambiguated numeric parse: the last separator is the
    decimal point iff exactly two digits follow it."""
    s = num.replace("\u00a0", "").replace(" ", "")
    last = max(s.rfind(","), s.rfind("."))
    if last >= 0 and len(s) - last - 1 == 2:
        s = s[:last].replace(",", "").replace(".", "") + "." + s[last + 1 :]
    else:
        s = s.replace(",", "").replace(".", "")
    return Decimal(s).quantize(_CENT)


def _safe_date(y: int, m: int, d: int) -> dt.date | None:
    try:
        return dt.date(y, m, d)
    except ValueError:
        return None


def dates_in(line: str) -> list[tuple[int, dt.date]]:
    """All dates in a line as (char_pos, date), position order."""
    found: list[tuple[int, dt.date | None]] = []
    for m in _DATE_ISO.finditer(line):
        found.append((m.start(), _safe_date(int(m[1]), int(m[2]), int(m[3]))))
    for m in _DATE_DOTTED.finditer(line):
        found.append((m.start(), _safe_date(int(m[3]), int(m[2]), int(m[1]))))
    for m in _DATE_SLASH.finditer(line):
        found.append((m.start(), _safe_date(int(m[3]), int(m[2]), int(m[1]))))
    for m in _DATE_MONTH.finditer(line):
        # 3-letter prefixes of rules.MONTHS are unique, so one lookup
        # suffices; a miss (only possible under regex/MONTHS drift)
        # SKIPS the date like the oracle's KeyError path — it must
        # never fabricate a January date
        mon = _MONTH_NUM.get(m[1].lower()[:3])
        if mon is None:
            continue
        found.append((m.start(), _safe_date(int(m[3]), mon, int(m[2]))))
    out = [(p, d) for p, d in found if d is not None]
    # single-hit lines dominate; skip the sort machinery for them
    return out if len(out) < 2 else sorted(out, key=lambda t: t[0])


# Output rides in DecimalType(18,2) (schema.FIELDS_STRUCT): values with
# more than 16 integer digits would overflow the Arrow decimal128 build
# and kill the batch — treat them as non-amounts (garbage in real docs).
_AMOUNT_MAX = Decimal(10) ** 16


def amounts_in(line: str) -> list[tuple[int, str, Decimal]]:
    """All currency amounts in a line as (pos, iso_currency, value)."""
    out: list[tuple[int, str, Decimal]] = []
    for m in _AMOUNT_LEAD.finditer(line):
        neg = bool(m.group(1)) and bool(m.group(4))
        val = parse_amount(m.group(3))
        if val >= _AMOUNT_MAX:
            continue
        out.append(
            (m.start(), rules.CURRENCY[m.group(2)], -val if neg else val)
        )
    for m in _AMOUNT_TRAIL.finditer(line):
        neg = bool(m.group(1)) and bool(m.group(4))
        val = parse_amount(m.group(2))
        if val >= _AMOUNT_MAX:
            continue
        out.append((m.start(), "EUR", -val if neg else val))
    # single-hit lines dominate; skip the sort machinery for them
    return out if len(out) < 2 else sorted(out, key=lambda t: t[0])


def extract_fields(lines: list[str]) -> dict:
    """Ordered doc text lines → accounting fields dict (nullable)."""
    full = "\n".join(lines)
    m = _INVOICE_ID.search(full)
    invoice_id = m.group(1).upper() if m else None

    invoice_date = None
    due_date = None
    all_amounts: list[tuple[str, Decimal]] = []
    total: Decimal | None = None
    total_ccy: str | None = None
    codes: list[str] = []
    seen_codes: set[str] = set()

    for line in lines:
        # dates/amounts/codes all require digits — cheap gate skips the
        # six regex passes on prose-only lines (the common case)
        if not _HAS_DIGIT.search(line):
            continue
        # dates are only CONSUMED while one of the two date fields is
        # unresolved — skipping the 4 date-regex passes afterwards is
        # semantics-identical and saves them on every remaining
        # digit line (amount tables run to hundreds of lines)
        line_dates = (
            dates_in(line)
            if invoice_date is None or due_date is None
            else []
        )
        if line_dates and invoice_date is None:
            invoice_date = line_dates[0][1]
        if line_dates and due_date is None:
            dm = _DUE.search(line)
            if dm:
                # first date after the anchor, else first on the line
                after = [d for p, d in line_dates if p > dm.start()]
                due_date = after[0] if after else line_dates[0][1]
        line_amounts = amounts_in(line)
        all_amounts.extend((c, v) for _, c, v in line_amounts)
        tm_ = _TOTAL.search(line)
        if line_amounts and tm_:
            # last anchored LINE wins; within the line, the first
            # amount AFTER the anchor (a side-by-side totals box
            # tab-joined as 'Subtotal: $90\tTotal: $100' must yield
            # 100, not the positionally-first 90), falling back to
            # the line's first amount when none follows the anchor
            after = [(c, v) for p_, c, v in line_amounts
                     if p_ > tm_.start()]
            _ccy, _val = after[0] if after else (
                line_amounts[0][1], line_amounts[0][2])
            total, total_ccy = _val, _ccy
        if _ACCOUNT.search(line):
            for cm in _ACCOUNT_CODE.finditer(line):
                if cm.group(1) not in seen_codes:
                    seen_codes.add(cm.group(1))
                    codes.append(cm.group(1))

    currency = total_ccy or (all_amounts[0][0] if all_amounts else None)
    return {
        "invoice_id": invoice_id,
        "invoice_date": invoice_date,
        "due_date": due_date,
        "currency": currency,
        "total": total,
        "amounts": [v for _, v in all_amounts],
        "account_codes": codes,
    }
