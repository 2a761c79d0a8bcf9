"""Round-trip + property tests for the delta+varint posting codec."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from quickwit_spark.functions.codec import (
    decode_positions,
    decode_varint,
    delta_decode,
    delta_encode,
    encode_positions,
    encode_varint,
)


def test_varint_simple():
    vals = np.array([0, 1, 127, 128, 300, 2**21, 2**63], dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(vals)), vals)


def test_varint_empty():
    assert encode_varint(np.array([], dtype=np.uint64)) == b""
    assert decode_varint(b"").size == 0


def test_varint_known_bytes():
    # LEB128: 300 = 0b10101100 0b00000010
    assert encode_varint(np.array([300], dtype=np.uint64)) == bytes([0xAC, 0x02])
    assert encode_varint(np.array([1], dtype=np.uint64)) == bytes([0x01])


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500)
)
@settings(max_examples=100, deadline=None)
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(vals)), vals)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300)
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip_property(xs):
    vals = np.array(sorted(xs), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(vals)), vals)


def test_positions_roundtrip():
    # three docs with per-doc increasing positions
    pos = np.array([3, 9, 14, 0, 2, 7], dtype=np.uint64)
    counts = np.array([3, 1, 2])
    buf = encode_positions(pos, counts)
    assert np.array_equal(decode_positions(buf, counts), pos)


@given(
    st.lists(
        st.lists(st.integers(0, 10_000), min_size=1, max_size=20).map(
            lambda l: sorted(set(l))
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip_property(doclists):
    pos = np.array([p for dl in doclists for p in dl], dtype=np.uint64)
    counts = np.array([len(dl) for dl in doclists])
    assert np.array_equal(decode_positions(encode_positions(pos, counts), counts), pos)
