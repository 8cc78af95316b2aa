import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from opensearch_spark.index import codec
from opensearch_spark.analysis import smallfloat


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    buf = codec.varint_encode(vals)
    out = codec.varint_decode(buf, len(vals))
    assert (out == vals).all()


def test_varint_empty():
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_prop(xs):
    vals = np.array(xs, dtype=np.uint64)
    out = codec.varint_decode(codec.varint_encode(vals), len(vals))
    assert (out == vals).all()


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_prop(xs):
    ids = np.array(sorted(xs), dtype=np.int64)
    out = codec.delta_decode_sorted(codec.delta_encode_sorted(ids), len(ids))
    assert (out == ids).all()


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        codec.delta_encode_sorted(np.array([5, 3], dtype=np.int64))


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=20),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip_prop(poslists):
    poslists = [sorted(p) for p in poslists]
    tfs = np.array([len(p) for p in poslists], dtype=np.int64)
    concat = np.array([x for p in poslists for x in p], dtype=np.int64)
    buf = codec.encode_positions(concat, tfs)
    out = codec.decode_positions(buf, tfs)
    assert (out == concat).all()


def test_zigzag():
    v = np.array([0, -1, 1, -2, 2, -(2**62), 2**62], dtype=np.int64)
    assert (codec.zigzag_decode(codec.zigzag_encode(v)) == v).all()


# ---- SmallFloat ------------------------------------------------------------

def test_smallfloat_free_values_exact():
    for i in range(smallfloat.NUM_FREE_VALUES + 16):
        q = smallfloat.quantize_length(i)
        if i < 40:
            assert q == i, i


def test_smallfloat_monotonic_rounddown_idempotent():
    prev = -1
    for i in list(range(0, 5000)) + [10**4, 10**6, 2**31 - 1]:
        q = smallfloat.quantize_length(i)
        assert q <= i
        assert q >= prev
        prev_q = q
        assert smallfloat.quantize_length(q) == q  # representables are fixed points
        prev = q


def test_smallfloat_byte_range():
    assert smallfloat.int_to_byte4(2**31 - 1) == 255
    assert smallfloat.int_to_byte4(0) == 0
    table = smallfloat.length_table()
    assert len(table) == 256
    assert (np.diff(table) > 0).all()  # strictly increasing decode table


def test_smallfloat_vectorized_matches_scalar():
    xs = np.array(list(range(0, 3000)) + [2**20, 2**31 - 1], dtype=np.int64)
    enc = smallfloat.int_to_byte4_np(xs)
    for x, e in zip(xs.tolist(), enc.tolist()):
        assert e == smallfloat.int_to_byte4(x), x
    dec = smallfloat.decode_norms_np(enc)
    for x, d in zip(xs.tolist(), dec.tolist()):
        assert d == smallfloat.quantize_length(x), x
