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


# keys may contain INTERIOR dots (webdataset keys like "000.a.b" —
# member name parsing must split on the LAST dot only); leading-dot-only
# keys are out of convention and excluded
tar_key = st.builds(
    lambda head, tail: head + tail,
    st.text(alphabet="abcdefghij0123456789_-", min_size=1, max_size=3),
    st.text(alphabet="abcdefghij0123456789_-.", max_size=9),
)
tar_samples = st.lists(
    st.tuples(
        tar_key,
        st.sampled_from(["txt", "json", "bin", "jpg"]),
        st.binary(min_size=0, max_size=300),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda s: (s[0], s[1]),
)


@given(tar_samples, st.integers(min_value=1, max_value=3))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_tar_container_roundtrip_random(spark, tmp_path_factory, samples, n_shards):
    """For ANY sample set (including empty payloads and multi-extension
    keys) and any shard count: write_tar_shards → read_tar_members is a
    byte-exact bijection, and n_bytes matches every payload."""
    from streaming_spark.operators.multimodal import (
        read_tar_members,
        write_tar_shards,
    )

    d = tmp_path_factory.mktemp("tars")
    write_tar_shards(samples, str(d), n_shards=n_shards)
    got = read_tar_members(spark, str(d), batch_bytes=128).collect()
    back = {(r.sample_key, r.ext): bytes(r.blob) for r in got}
    assert back == {(k, e): p for k, e, p in samples}
    assert all(r.n_bytes == len(bytes(r.blob)) for r in got)


def _norm(v):
    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


# ----------------------------------------------------- df wire (rserial)

df_int = st.one_of(
    st.none(),
    st.integers(min_value=-(2**31) + 1, max_value=2**31 - 1),  # NA_INT reserved
)
df_double = st.one_of(
    st.none(), st.floats(allow_nan=False, allow_infinity=True, width=64)
)
df_str = st.one_of(st.none(), st.text(max_size=30))
df_row = st.tuples(df_int, df_double, df_str)
df_frames = st.lists(df_row, min_size=0, max_size=30)


@given(df_frames)
@settings(max_examples=200, deadline=None)
def test_rserial_property_roundtrip(rows):
    """Arbitrary null-bearing int32/double/string frames survive the R
    df wire byte format exactly (reference DFInterface.cpp layout):
    write → read → identical values, nulls, and column names."""
    import io

    from streaming_spark.operators import rserial

    pdf = pd.DataFrame(
        {
            "i": pd.array([r[0] for r in rows], dtype="Int32"),
            "d": pd.array([r[1] for r in rows], dtype="Float64"),
            "s": pd.array([r[2] for r in rows], dtype="string"),
        }
    )
    buf = io.BytesIO()
    rserial.write_df_message(
        buf, rserial.pandas_to_columns(pdf, ["int32", "double", "string"])
    )
    buf.seek(0)
    back = rserial.columns_to_pandas(rserial.read_df_message(buf))
    assert buf.read() == b""  # fully consumed, no trailing bytes
    assert list(back.columns) == ["i", "d", "s"]
    assert back["i"].isna().tolist() == pdf["i"].isna().tolist()
    assert back["d"].isna().tolist() == pdf["d"].isna().tolist()
    assert back["s"].isna().tolist() == pdf["s"].isna().tolist()
    for col in ("i", "d", "s"):
        a, b = back[col].dropna().tolist(), pdf[col].dropna().tolist()
        assert a == b


# --- BPE invariants over arbitrary corpora (driver-side, no Spark) ---

words_strategy = st.lists(
    st.tuples(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters=" \t\n\r"
            ),
            min_size=1,
            max_size=8,
        ),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=20,
)


@given(words_strategy, st.integers(min_value=0, max_value=15))
@settings(max_examples=50, deadline=None)
def test_bpe_learn_encode_invariants(word_freqs, n_merges):
    """For ANY corpus and merge budget: training is deterministic,
    every merge pair consists of symbols constructible from the
    alphabet, and encoding ANY word (seen or unseen) with the learned
    ranks concatenates back losslessly — in both char- and byte-level
    modes."""
    from streaming_spark.operators.bpe import (
        _encode_word,
        _to_bytes_repr,
        learn_bpe_merges,
    )

    for byte_level in (False, True):
        m1 = learn_bpe_merges(word_freqs, n_merges, byte_level=byte_level)
        m2 = learn_bpe_merges(word_freqs, n_merges, byte_level=byte_level)
        assert m1 == m2
        assert len(m1) <= n_merges
        ranks = {p: i for i, p in enumerate(m1)}
        probe_words = [w for w, _ in word_freqs[:5]] + ["unseen", "héllo"]
        for w in probe_words:
            rep = _to_bytes_repr(w) if byte_level else w
            pieces = _encode_word(rep, ranks)
            assert "".join(pieces) == rep + "</w>", (w, pieces)
            if byte_level:
                # byte repr stays invertible through encoding
                joined = "".join(pieces)[: -len("</w>")]
                assert joined.encode("latin-1").decode("utf-8") == w


# -- pure-math properties of the new text/tokenizer kernels (no Spark) --

_hash_text = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x10FFFF,
                           blacklist_categories=("Cs",)),
    min_size=0,
    max_size=120,
)


@given(_hash_text, st.integers(min_value=2, max_value=12))
@settings(max_examples=200, deadline=None)
def test_window_hash_closed_form_matches_recurrence(s, width):
    """The vectorized closed form (prefix sums × inverse powers mod
    2^64) must equal the plain polynomial recurrence for EVERY window
    of arbitrary unicode text — including astral-plane code points
    (the utf-32 decode path) and texts shorter than the window."""
    import numpy as np

    base, mask = 1000003, (1 << 64) - 1
    ibase = pow(base, -1, 1 << 64)
    n = len(s)
    # reference: direct per-window polynomial, arbitrary-precision ints
    want = []
    for i in range(max(0, n - width + 1)):
        acc = 0
        for ch in s[i : i + width]:
            acc = (acc * base + ord(ch)) & mask
        want.append(acc)
    # closed form, numpy uint64 wraparound
    got = []
    if n >= width:
        pows_l, ipows_l = [1], [1]
        for _ in range(n):
            pows_l.append((pows_l[-1] * base) & mask)
            ipows_l.append((ipows_l[-1] * ibase) & mask)
        pows = np.array(pows_l, dtype=np.uint64)
        ipows = np.array(ipows_l, dtype=np.uint64)
        ords = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
            np.uint64
        )
        terms = ords * pows[n - 1 :: -1][:n]
        prefix = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(terms, out=prefix[1:])
        diffs = prefix[width:] - prefix[: n - width + 1]
        got = list(diffs * ipows[n - width :: -1][: n - width + 1])
    assert [int(h) for h in got] == want


_word = st.text(
    alphabet=st.sampled_from("abcdefg"), min_size=1, max_size=12
)


@given(st.lists(st.tuples(_word, st.integers(1, 50)), min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_unigram_segmentation_properties(word_freqs):
    """For ANY word-frequency table: training normalizes to a proper
    distribution, and for any trained table Viterbi and the lattice
    sampler both emit VALID segmentations (concatenate back to the
    word) whose pieces all belong to the vocabulary."""
    from streaming_spark.operators.unigram import (
        _sample_segmentation,
        _viterbi,
        learn_unigram,
    )

    pieces = learn_unigram(
        word_freqs, vocab_size=16, seed_size=40, max_piece_len=4
    )
    total = math.fsum(math.exp(lp) for lp in pieces.values())
    assert abs(total - 1.0) < 1e-9
    ml = max(len(p) for p in pieces)
    for word, _ in word_freqs:
        v = _viterbi(word, pieces, ml)
        assert "".join(v) == word
        assert all(p in pieces for p in v)
        s = _sample_segmentation(word, pieces, ml, alpha=0.3, seed=11)
        assert "".join(s) == word
        assert all(p in pieces for p in s)


@given(
    st.text(alphabet=st.sampled_from("abc"), min_size=1, max_size=7),
    st.integers(1, 4),
)
@settings(max_examples=60, deadline=None)
def test_unigram_expected_counts_match_enumeration(word, max_len):
    """The forward-backward E-step (_expected_counts) equals brute-force
    enumeration over ALL segmentations of the word — each piece's
    expected count is Σ_seg P(seg)·count(piece, seg) / Σ_seg P(seg).
    Pins the lattice recursion's math, not just its non-crashing."""
    from collections import Counter

    from streaming_spark.operators.unigram import (
        _expected_counts,
        unigram_seed_vocab,
    )

    logp = unigram_seed_vocab([(word, 1)], max_piece_len=max_len, seed_size=30)

    def enumerate_segs(w):
        if not w:
            return [[]]
        out = []
        for ln in range(1, min(max_len, len(w)) + 1):
            piece = w[:ln]
            if piece in logp:
                out.extend([piece] + rest for rest in enumerate_segs(w[ln:]))
        return out

    segs = enumerate_segs(word)
    assert segs  # single chars are always in the seed vocab
    weights = [math.exp(math.fsum(logp[p] for p in seg)) for seg in segs]
    z = math.fsum(weights)
    want: Counter = Counter()
    for seg, wgt in zip(segs, weights):
        for p in seg:
            want[p] += wgt / z
    got: Counter = Counter()
    _expected_counts(word, 1, logp, max_len, got)
    assert set(got) == set(want)
    for p in want:
        assert math.isclose(got[p], want[p], rel_tol=1e-9, abs_tol=1e-12), (
            p, got[p], want[p],
        )


# -- line-derivation property: Spark expression vs a pure-Python model --

_line_words = st.lists(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs", "Zs", "Zl", "Zp", "Cc"),
            blacklist_characters=" \t\n\r",
        ),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=35,
)
_seps = st.lists(st.sampled_from([" ", "  ", " \t ", "   "]), min_size=34, max_size=34)


@given(_line_words, _seps, st.integers(min_value=2, max_value=12))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_break_into_lines_matches_python_model(spark, words, seps, wpl):
    """For ANY word sequence, ANY inter-word whitespace runs, and ANY
    words_per_line: the derived lines (1) rejoin to the normalized
    text, (2) all carry exactly words_per_line words except a shorter
    final line, and (3) line numbering is contiguous from 1 — checked
    against a pure-Python grouping model."""
    from streaming_spark.operators.text import derive_lines

    text = "".join(
        w + (seps[i] if i < len(seps) else " ")
        for i, w in enumerate(words)
    ).rstrip()
    df = spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING")
    got = sorted(
        ((r.line_no, r.line) for r in
         derive_lines(df, "text", words_per_line=wpl).collect())
    )
    # python model: normalize whitespace, group into wpl-word lines
    want = [
        " ".join(words[i : i + wpl]) for i in range(0, len(words), wpl)
    ]
    assert [ln for _, ln in got] == want
    assert [n for n, _ in got] == list(range(1, len(want) + 1))
    assert " ".join(ln for _, ln in got) == " ".join(words)
    for _, ln in got[:-1]:
        assert len(ln.split(" ")) == wpl
    assert len(got[-1][1].split(" ")) <= wpl
