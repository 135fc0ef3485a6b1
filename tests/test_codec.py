from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_ray.functions.codec import varbyte_decode, varbyte_encode, varbyte_sizes


def test_roundtrip_basic():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**63, 2**64 - 1], np.uint64)
    buf, sizes = varbyte_encode(v)
    assert sizes.tolist() == [1, 1, 1, 2, 2, 3, 5, 10, 10]
    assert varbyte_decode(buf).tolist() == v.tolist()


def test_empty():
    buf, sizes = varbyte_encode(np.zeros(0, np.uint64))
    assert buf == b"" and len(sizes) == 0
    assert len(varbyte_decode(b"")) == 0


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_roundtrip_property(vals):
    v = np.array(vals, dtype=np.uint64)
    buf, sizes = varbyte_encode(v)
    assert sizes.sum() == len(buf)
    np.testing.assert_array_equal(varbyte_decode(buf), v)
    np.testing.assert_array_equal(sizes, varbyte_sizes(v))
