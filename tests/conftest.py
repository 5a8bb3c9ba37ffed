import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    yield build_session(cpus=4, app_name="delta_spark_tests", driver_mem="8g")


def assert_pdf_equal(actual, expected, sort_cols):
    """Order-insensitive frame compare with dtype normalization."""
    import pandas as pd

    a = actual.sort_values(sort_cols).reset_index(drop=True)
    e = expected.sort_values(sort_cols).reset_index(drop=True)
    assert list(a.columns) == list(e.columns), (list(a.columns), list(e.columns))
    assert len(a) == len(e), (len(a), len(e))
    for c in a.columns:
        av, ev = a[c], e[c]
        if str(av.dtype).startswith(("int", "Int")) or str(ev.dtype).startswith(("int", "Int")):
            av, ev = av.astype("Int64"), ev.astype("Int64")
        pd.testing.assert_series_equal(
            av, ev, check_dtype=False, check_names=False, obj=f"column {c}"
        )
