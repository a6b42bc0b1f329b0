import numpy as np
import pytest

from nimrud_tpu.utils.generic import batcher, pad_rows, round_up


def test_batcher_array():
    data = np.arange(25).reshape(-1, 1)
    chunks = list(batcher(data, 10))
    assert [len(c) for c in chunks] == [10, 10, 5]
    assert np.array_equal(np.concatenate(chunks), data)


def test_batcher_list():
    data = list(range(7))
    chunks = list(batcher(data, 3))
    assert chunks == [[0, 1, 2], [3, 4, 5], [6]]


def test_batcher_iterator():
    chunks = list(batcher(iter(range(7)), 3))
    assert chunks == [[0, 1, 2], [3, 4, 5], [6]]


def test_batcher_exact_multiple():
    chunks = list(batcher(iter(range(6)), 3))
    assert chunks == [[0, 1, 2], [3, 4, 5]]


def test_batcher_rejects_bad_chunk():
    with pytest.raises(ValueError):
        list(batcher([1, 2, 3], 0))


def test_round_up():
    assert round_up(0, 8) == 0
    assert round_up(1, 8) == 8
    assert round_up(8, 8) == 8
    assert round_up(9, 8) == 16


def test_pad_rows():
    arr = np.ones((3, 2))
    padded, mask = pad_rows(arr, 5)
    assert padded.shape == (5, 2)
    assert mask.tolist() == [True] * 3 + [False] * 2
    assert np.array_equal(padded[:3], arr)
    assert np.all(padded[3:] == 0)
    with pytest.raises(ValueError):
        pad_rows(arr, 2)
