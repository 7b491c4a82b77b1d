"""The fused Arrow extraction kernel (SURVEY.md §2.9 U1–U9 as one
``mapInArrow`` pass).

Input batches: (doc_id: string, spans: list<struct<kind,text,media_ref,
offset>>).  Output batches: one row per output span, flattened; the doc's
extracted fields ride on its order==0 row (``schema.ARROW_FLAT_FIELDS``).  Arrow in, Arrow out — the only Python
boundary in the hot path; no per-row Python at the Spark API level
(``BASELINE.json:15``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from accountant_pdf_extract_spark.operators.doccore import extract_doc
from accountant_pdf_extract_spark.schema import ARROW_FLAT_FIELDS


def _decode_spans_batch(batch: pa.RecordBatch):
    """Shared Arrow decode for both kernels: the list<struct> column
    via flat child arrays + offsets instead of to_pylist() (which
    builds a dict per span — ~2x slower on string-heavy batches).
    .offsets index absolutely into .values (even for sliced arrays and
    null slots, which repeat the offset) — never use .flatten() here,
    it re-bases and breaks on slices."""
    doc_ids = batch.column("doc_id").to_pylist()
    # RecordBatch.column is always a contiguous pa.Array (ChunkedArray
    # exists only on Table) — no combine_chunks case here
    spans_col = batch.column("spans")
    list_offsets = spans_col.offsets.to_pylist()
    flat = spans_col.values
    return (
        doc_ids,
        list_offsets,
        flat.field("kind").to_pylist(),
        flat.field("text").to_pylist(),
        flat.field("media_ref").to_pylist(),
        flat.field("offset").to_pylist(),
    )


# DERIVED from the pinned schema — a hand-maintained copy could drift
# after a schema edit, and (because of the per-doc isolation fallback)
# the drift would surface as every doc silently dropped, not an error
_FLAT_TYPES = [f.type for f in ARROW_FLAT_FIELDS]


def _yield_with_doc_isolation(cols, types, schema, bounds, on_drop):
    """Build the output RecordBatch; if ONE doc's values break Arrow
    conversion (the build runs after all per-doc trys), retry doc by
    doc so only the offender is dropped — per-doc fault isolation must
    hold through the column build too, or one bad value kills the
    whole task.

    Fail-fast guard: if EVERY doc in the batch fails the per-doc
    retry, the failure is systemic (schema drift, a pyarrow behavior
    change, a kernel bug making column lengths unequal), not one bad
    payload — re-raise instead of silently dropping the whole batch
    (a job that 'succeeds' with zero output is the worst failure
    mode at 10^12 docs)."""

    def build(segments):
        return pa.RecordBatch.from_arrays(
            [pa.array(c, t) for c, t in zip(segments, types)], schema=schema
        )

    try:
        yield build(cols)
        return
    except Exception:  # noqa: BLE001 — isolate the offending doc(s)
        pass
    survived, last_exc = 0, None
    for doc_id, lo, hi in bounds:
        seg = [c[lo:hi] for c in cols]
        try:
            batch = build(seg)
        except Exception as exc:  # noqa: BLE001
            last_exc = exc
            _report_drop(on_drop, doc_id, exc)
            continue
        if hi > lo:
            # zero-span docs must not count as survivors: an EMPTY
            # segment always builds regardless of value-level drift,
            # so it carries no evidence against a systemic failure
            survived += 1
        yield batch
    # threshold 8: an all-fail across >=8 independent docs is
    # vanishingly unlikely to be coincident bad payloads; below it a
    # tail batch of genuinely-bad docs keeps plain per-doc drop
    # semantics (other, larger batches would still raise)
    nonempty = sum(1 for _d, lo, hi in bounds if hi > lo)
    if nonempty >= 8 and survived == 0:
        raise RuntimeError(
            f"Arrow build failed for ALL {nonempty} non-empty docs in "
            "the batch — systemic failure (schema/pyarrow drift?), not "
            "a bad document; refusing to silently drop the batch"
        ) from last_exc


def _refuse_all_fail_batch(failures: list[Exception], n_docs: int) -> None:
    """Same systemic fail-fast as the Arrow-build guard, one stage
    earlier: if extract_doc itself raised for EVERY doc of a >=8-doc
    batch, that is a deploy-level regression (doccore/fields drift),
    not coincident bad payloads — a 10^12-doc job must not complete
    green with zero output on the strength of per-doc isolation."""
    if n_docs >= 8 and len(failures) == n_docs:
        raise RuntimeError(
            f"extract_doc raised for ALL {n_docs} docs in the batch — "
            "systemic failure, refusing to silently drop the batch"
        ) from failures[-1]


def _report_drop(on_drop, doc_id, exc) -> None:
    """Per-doc fault isolation sink: callback when wired (the pipeline
    wires an accumulator through it), executor-stdout line otherwise."""
    if on_drop is not None:
        on_drop(doc_id, exc)
    else:
        print(f"extract_doc failed for {doc_id!r}: {exc!r}", flush=True)


def extract_batches(
    batches: Iterator[pa.RecordBatch],
    on_drop=None,
) -> Iterator[pa.RecordBatch]:
    """``on_drop(doc_id, exc)`` is invoked for each document whose
    extraction raised (per-doc fault isolation); the default logs to
    executor stdout.  ``plans.pipeline.extract`` wires an accumulator
    through it so dropped-doc counts surface as a driver-readable
    metric, not just a buried print."""
    for batch in batches:
        doc_ids, list_offsets, f_kind, f_text, f_ref, f_off = (
            _decode_spans_batch(batch)
        )

        col_doc, col_kind, col_text, col_ref, col_order = [], [], [], [], []
        col_inv, col_idate, col_ddate, col_ccy = [], [], [], []
        col_total, col_amounts, col_codes = [], [], []
        bounds: list[tuple[str, int, int]] = []  # per-doc row spans
        doc_failures: list[Exception] = []

        for i, doc_id in enumerate(doc_ids):
            lo, hi = list_offsets[i], list_offsets[i + 1]
            try:
                out, fields = extract_doc(
                    list(
                        zip(f_kind[lo:hi], f_text[lo:hi], f_ref[lo:hi], f_off[lo:hi])
                    )
                )
            except Exception as exc:  # noqa: BLE001 — per-doc fault isolation:
                # one malformed payload must not kill a 100-TB job; the
                # doc yields zero spans and the skew shows up in the
                # commit-log n_docs-vs-output delta.
                _report_drop(on_drop, doc_id, exc)
                doc_failures.append(exc)
                continue
            bounds.append((doc_id, len(col_doc), len(col_doc) + len(out)))
            for kind, text, ref, order in out:
                col_doc.append(doc_id)
                col_kind.append(kind)
                col_text.append(text)
                col_ref.append(ref)
                col_order.append(order)
                if order == 0:
                    # fields ride on the doc's first span row only —
                    # duplicating Decimal/list cells per span row costs
                    # 20-50x more Arrow build time for zero information
                    col_inv.append(fields["invoice_id"])
                    col_idate.append(fields["invoice_date"])
                    col_ddate.append(fields["due_date"])
                    col_ccy.append(fields["currency"])
                    col_total.append(fields["total"])
                    col_amounts.append(fields["amounts"])
                    col_codes.append(fields["account_codes"])
                else:
                    col_inv.append(None)
                    col_idate.append(None)
                    col_ddate.append(None)
                    col_ccy.append(None)
                    col_total.append(None)
                    col_amounts.append(None)
                    col_codes.append(None)

        _refuse_all_fail_batch(doc_failures, len(doc_ids))
        yield from _yield_with_doc_isolation(
            [
                col_doc, col_kind, col_text, col_ref, col_order,
                col_inv, col_idate, col_ddate, col_ccy,
                col_total, col_amounts, col_codes,
            ],
            _FLAT_TYPES,
            ARROW_FLAT_FIELDS,
            bounds,
            on_drop,
        )


def extract_fields_batches(
    batches: Iterator[pa.RecordBatch],
    on_drop=None,
) -> Iterator[pa.RecordBatch]:
    """Fields-only variant of ``extract_batches``: same decode and
    per-doc extraction, but emits ONE row per document (doc_id +
    accounting fields) and never materializes the span-text Arrow
    columns — the cheap path when only the structured fields are
    wanted (parse cost is identical; Arrow build drops ~20x)."""
    from accountant_pdf_extract_spark.schema import ARROW_DOC_FIELDS

    for batch in batches:
        doc_ids, list_offsets, f_kind, f_text, f_ref, f_off = (
            _decode_spans_batch(batch)
        )

        col_doc = []
        col_inv, col_idate, col_ddate, col_ccy = [], [], [], []
        col_total, col_amounts, col_codes = [], [], []
        bounds: list[tuple[str, int, int]] = []
        doc_failures: list[Exception] = []
        for i, doc_id in enumerate(doc_ids):
            lo, hi = list_offsets[i], list_offsets[i + 1]
            try:
                _out, fields = extract_doc(
                    list(
                        zip(f_kind[lo:hi], f_text[lo:hi], f_ref[lo:hi], f_off[lo:hi])
                    )
                )
            except Exception as exc:  # noqa: BLE001 — per-doc fault isolation
                _report_drop(on_drop, doc_id, exc)
                doc_failures.append(exc)
                continue
            bounds.append((doc_id, len(col_doc), len(col_doc) + 1))
            col_doc.append(doc_id)
            col_inv.append(fields["invoice_id"])
            col_idate.append(fields["invoice_date"])
            col_ddate.append(fields["due_date"])
            col_ccy.append(fields["currency"])
            col_total.append(fields["total"])
            col_amounts.append(fields["amounts"])
            col_codes.append(fields["account_codes"])

        _refuse_all_fail_batch(doc_failures, len(doc_ids))
        yield from _yield_with_doc_isolation(
            [
                col_doc, col_inv, col_idate, col_ddate, col_ccy,
                col_total, col_amounts, col_codes,
            ],
            [f.type for f in ARROW_DOC_FIELDS],
            ARROW_DOC_FIELDS,
            bounds,
            on_drop,
        )
