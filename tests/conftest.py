from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

FIXDIR = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def spark():
    from accountant_pdf_extract_spark.session import get_spark

    s = get_spark(app="pytest", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
