r"""TSV pipe protocol conformance — escaping rules byte-for-byte per
reference TSVInterface.cpp:200-222 and framing per README.md:37-56."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from streaming_spark.operators.pipe import (
    escape_field,
    parse_tsv_response,
    pipe_tsv,
    unescape_field,
)


def test_escape_rules():
    assert escape_field("a\tb") == "a\\tb"
    assert escape_field("a\nb") == "a\\nb"
    assert escape_field("a\rb") == "a\\rb"
    assert escape_field("a\\b") == "a\\\\b"
    assert escape_field(None) == "\\N"
    assert escape_field(float("nan")) == "nan"
    assert escape_field("") == ""
    # literal backslash-N data is distinguishable from NULL
    assert escape_field("\\N") == "\\\\N"
    assert unescape_field("\\\\N") == "\\N"
    assert unescape_field("\\N") is None


@given(st.text(max_size=50))
@settings(max_examples=200, deadline=None)
def test_escape_unescape_roundtrip(s):
    assert unescape_field(escape_field(s)) == s


def test_pipe_cat_echo(spark):
    df = spark.range(1000).select(
        F.col("id"), F.concat(F.lit("row"), F.col("id").cast("string")).alias("s")
    ).repartition(2)
    responses = pipe_tsv(df, "cat", chunk_rows=100)
    parsed = parse_tsv_response(responses, 2, ["id", "s"])
    rows = parsed.filter(F.col("id").isNotNull())
    assert rows.count() == 1000
    got = sorted(int(r.id) for r in rows.collect())
    assert got == list(range(1000))


def test_pipe_awk_client(spark):
    """Non-echo external client: per-chunk sum via awk, protocol-aware."""
    script = (
        "awk 'BEGIN{n=0} { if (n==0) { n=$1; if (n==0) { print 0; exit } "
        'total=0; cnt=0 } else { total+=$1; cnt+=1; n-=1; '
        "if (n==0) { print 1; print total; } } }'"
    )
    # one chunk per partition: the awk client answers one sum per chunk
    df = spark.range(1, 101).coalesce(1)
    responses = pipe_tsv(df, script, chunk_rows=1000)
    vals = [r.response for r in responses.collect() if r.response]
    assert [int(v) for v in vals] == [5050]


def test_pipe_child_failure_raises(spark):
    df = spark.range(10).coalesce(1)
    with pytest.raises(Exception):
        pipe_tsv(df, "exit 3").collect()


def test_tricky_strings_roundtrip(spark):
    cases = ["a\nb", "a\tb", "a\rb", "back\\slash", "\\N", "", None, "plain"]
    pdf_rows = [(i, c) for i, c in enumerate(cases)]
    df = spark.createDataFrame(pdf_rows, "id INT, s STRING").coalesce(1)
    responses = pipe_tsv(df, "cat", chunk_rows=100)
    parsed = parse_tsv_response(responses, 2, ["id", "s"]).filter(
        F.col("id").isNotNull()
    )
    got = {
        int(r.id): (None if r.s is None else unescape_field(r.s))
        for r in parsed.collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == c, f"case {i}: {c!r} -> {got[i]!r}"


def test_pipe_allowlist(spark):
    df = spark.range(10).coalesce(1)
    with pytest.raises(PermissionError, match="allowlist"):
        pipe_tsv(df, "cat", allowed_commands=["wc -l"])
    # allowlisted command still runs
    out = pipe_tsv(df, "cat", chunk_rows=100, allowed_commands=["cat"])
    assert out.count() >= 1


ARROW_CLIENT_COUNT = (
    "import streaming_spark.client as scidbstrm\n"
    "import pandas as pd\n"
    "scidbstrm.map(lambda df: pd.DataFrame({'count': [len(df)]}))\n"
)

ARROW_CLIENT_SUM_FINALIZE = (
    "import streaming_spark.client as scidbstrm\n"
    "import pandas as pd\n"
    "state = {'total': 0.0}\n"
    "def on_chunk(df):\n"
    "    state['total'] += float(df['v'].sum())\n"
    "    return None\n"
    "def finalize():\n"
    "    return pd.DataFrame({'total': [state['total']]})\n"
    "scidbstrm.map(on_chunk, finalize)\n"
)


def _py_cmd(code: str) -> str:
    import base64
    import sys

    b64 = base64.b64encode(code.encode()).decode()
    return (
        f"PYTHONPATH=/root/repo {sys.executable} -uc "
        f"\"import base64; exec(base64.b64decode('{b64}'))\""
    )


def test_pipe_arrow_chunk_count(spark):
    """A child written against the reference's client API (map over
    chunks) runs against pipe_arrow — per-chunk counts sum to the row
    count (reference py_pkg/examples/0-iquery.txt pattern)."""
    from streaming_spark.operators.pipe import pipe_arrow

    df = spark.range(5000).repartition(2)
    out = pipe_arrow(df, _py_cmd(ARROW_CLIENT_COUNT), "count BIGINT", chunk_rows=500)
    got = out.toPandas()
    assert got["count"].sum() == 5000
    assert got["count"].max() <= 500


def test_pipe_arrow_map_finalize(spark):
    """map(None-returning chunk fn) + finalize through the wire — the
    reference's 1-map-finalize example shape."""
    from pyspark.sql import functions as F2

    from streaming_spark.operators.pipe import pipe_arrow

    df = spark.range(1, 101).select(F2.col("id").cast("double").alias("v")).repartition(2)
    out = pipe_arrow(df, _py_cmd(ARROW_CLIENT_SUM_FINALIZE), "total DOUBLE")
    totals = [r.total for r in out.collect()]
    assert len(totals) == 2  # one finalize message per partition/child
    assert sum(totals) == 5050.0


def test_pipe_arrow_side_input_read_func(spark):
    """Function shipping over the wire: pack_func → side input → child
    read_func pops and applies it (reference 2-pack-func.py flow)."""
    import pandas as pd2

    from streaming_spark.client import pack_func
    from streaming_spark.operators.pipe import pipe_arrow

    def triple(df):
        return pd2.DataFrame({"v3": df["v"] * 3})

    packed = pack_func(triple)
    child = (
        "import streaming_spark.client as scidbstrm\n"
        "scidbstrm.map(scidbstrm.read_func())\n"
    )
    from pyspark.sql import functions as F2

    df = spark.range(1, 11).select(F2.col("id").cast("double").alias("v")).coalesce(1)
    out = pipe_arrow(df, _py_cmd(child), "v3 DOUBLE", side_input=packed)
    assert sorted(r.v3 for r in out.collect()) == [float(i * 3) for i in range(1, 11)]
