"""Scalar pandas UDFs (Arrow-vectorized Series→Series — the §2.11
``pandas_udf`` surface) for accounting-amount normalization, usable
directly inside DataFrame expressions.

The hot extraction path parses amounts inside the fused kernel
(``operators/fields.py``); these UDFs serve ad-hoc queries over
already-extracted string columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf

from accountant_pdf_extract_spark.operators.fields import parse_amount


@pandas_udf("long")
def amount_to_cents(s: pd.Series) -> pd.Series:
    """'$1,234.56' / '1.234,56 €' / '(£12 345.00)' → signed cents.
    Vectorized pre-clean via Series.str; locale disambiguation via the
    shared parse (last separator + 2 digits = decimal point)."""
    neg = s.str.contains(r"\(", regex=True, na=False)
    cleaned = s.str.replace(r"[()$€£ ]", "", regex=True).str.strip()

    def to_cents(v: str) -> int | None:
        if not v:
            return None
        try:
            return int(parse_amount(v) * 100)
        except Exception:  # noqa: BLE001 — unparseable → null
            return None

    cents = cleaned.map(to_cents, na_action="ignore")
    return cents.where(~neg, -cents).astype("Int64")

