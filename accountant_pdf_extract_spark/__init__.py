"""accountant_pdf_extract_spark — a from-scratch PySpark-native
main-content extraction engine for interleaved text + media documents.

Capability surface derived from the reference
``weversonbarbieri/accountant_pdf_extract`` (which ships no code —
``/root/reference/README.md:1`` is its entire content) as distilled by
the driver spec (``/root/repo/BASELINE.json``): decode interleaved
spans in vectorized Arrow batches, layout-parse PDF byte streams,
strip HTML boilerplate, strip repeated headers/footers, extract
accounting fields with regex/anchor rules, carry media spans through,
emit per-document ordered spans — all with the PySpark DataFrame API
plus pandas/Arrow UDFs (never per-row Python UDFs).
"""

__version__ = "0.1.0"
