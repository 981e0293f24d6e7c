"""Varbyte/delta round-trips (SURVEY.md §5.2, FIXTURES.md §5;
BASELINE.json: "compressed posting-list decode round-trips")."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nyu_search_engine_spark.functions.varbyte import (
    delta_decode,
    delta_encode,
    vb_decode,
    vb_decode_docids,
    vb_encode,
    vb_encode_docids,
)

EDGE_LISTS = [
    [],
    [0],
    [127],
    [128],
    [16383],
    [16384],
    [2**31 - 1],
    [2**40],
    [0, 127, 128, 16383, 16384, 2**31 - 1, 2**40],
]


@pytest.mark.parametrize("vals", EDGE_LISTS)
def test_roundtrip_edges(vals):
    out = vb_decode(vb_encode(np.array(vals, dtype=np.uint64)))
    assert out.tolist() == vals


@pytest.mark.parametrize("n", [1, 127, 128, 129, 10_000])
def test_roundtrip_random_lengths(n):
    rng = np.random.default_rng(7 + n)
    vals = rng.integers(0, 2**40, size=n, dtype=np.uint64)
    assert vb_decode(vb_encode(vals)).tolist() == vals.tolist()


@pytest.mark.parametrize("start", [0, 1, 1000])
def test_docid_gap_roundtrip(start):
    rng = np.random.default_rng(start)
    gaps = rng.integers(1, 1000, size=500, dtype=np.uint64)
    ids = start + np.cumsum(gaps)
    ids[0] = start  # first value absolute, may be 0
    ids = np.unique(ids)
    assert vb_decode_docids(vb_encode_docids(ids)).tolist() == ids.tolist()


def test_delta_inverse():
    ids = np.array([0, 1, 5, 6, 1000, 2**33], dtype=np.uint64)
    assert delta_decode(delta_encode(ids)).tolist() == ids.tolist()


def test_single_byte_values_compress_to_one_byte():
    assert len(vb_encode(np.arange(128, dtype=np.uint64))) == 128
    assert len(vb_encode(np.array([128], dtype=np.uint64))) == 2


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert vb_decode(vb_encode(arr)).tolist() == vals
