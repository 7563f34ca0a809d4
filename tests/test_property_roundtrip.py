"""Property-based round-trip: random typed, null-bearing frames survive
the stream() operator bit-for-bit — the generalization of the
reference's fixed round-trip matrix (reference tests/test_low.py) to
arbitrary contents."""

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from streaming_spark.operators.stream import stream

cell_int = st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1))
cell_double = st.one_of(
    st.none(),
    st.floats(allow_nan=False, allow_infinity=True, width=64),
)
cell_str = st.one_of(st.none(), st.text(max_size=20))
cell_bin = st.one_of(st.none(), st.binary(max_size=16))

row = st.tuples(cell_int, cell_double, cell_str, cell_bin)
frames = st.lists(row, min_size=0, max_size=25)


@given(frames)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_stream_roundtrip_random_frames(spark, rows):
    rows = [(i, *r) for i, r in enumerate(rows)]
    df = spark.createDataFrame(
        rows, "id BIGINT, c_int INT, c_double DOUBLE, c_str STRING, c_bin BINARY"
    ).repartition(2)
    out = stream(df, lambda pdf: pdf, df.schema)
    got = {tuple(_norm(v) for v in r) for r in out.collect()}
    want = {tuple(_norm(v) for v in r) for r in rows}
    assert got == want


def _norm(v):
    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v
