"""Property-based tests (SURVEY.md §5.3): amount round-trips and
engine↔oracle parity on randomized synthetic documents — the two
implementations share only spec constants and regex strings, so
agreement on arbitrary seeds pins the semantics."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from accountant_pdf_extract_spark.operators.doccore import extract_doc
from accountant_pdf_extract_spark.operators.fields import amounts_in, parse_amount
from accountant_pdf_extract_spark.sources.synth import DEFAULT_WORDS, build_doc
from tests.oracle import oracle_extract


@given(st.decimals(min_value=0, max_value=10**9, places=2))
def test_amount_usd_roundtrip(x: Decimal) -> None:
    s = f"${x:,.2f}"
    got = amounts_in(s)
    assert len(got) == 1
    assert got[0][1] == "USD" and got[0][2] == x


@given(st.decimals(min_value=0, max_value=10**9, places=2))
def test_amount_eur_roundtrip(x: Decimal) -> None:
    s = f"{x:,.2f}".replace(",", "_").replace(".", ",").replace("_", ".") + " €"
    got = amounts_in(s)
    assert got and got[0][1] == "EUR" and got[0][2] == x


@given(st.decimals(min_value=Decimal("0.01"), max_value=10**6, places=2))
def test_amount_negative_parens(x: Decimal) -> None:
    got = amounts_in(f"(${x:,.2f})")
    assert got and got[0][2] == -x


@given(st.integers(min_value=0, max_value=100_000))
def test_parse_amount_plain_int(n: int) -> None:
    assert parse_amount(str(n)) == Decimal(n).quantize(Decimal("0.01"))


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1), st.integers(0, 999))
def test_engine_oracle_parity(doc_key: int, seed: int) -> None:
    spans = build_doc(doc_key, seed, DEFAULT_WORDS)
    assert extract_doc(spans) == oracle_extract(spans)
