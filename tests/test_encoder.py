"""Encoder semantics vs the reference's math (query-index.py:13-17,107-108)."""

import numpy as np
import pytest

from cli_p_spark.functions.encoder import (
    encode_batch,
    encode_string,
    l2_normalize,
    token_vec,
)


def test_unit_norm():
    v = encode_string("baba ceca dida")
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6


def test_deterministic():
    assert np.array_equal(encode_string("foo bar"), encode_string("foo bar"))
    assert np.array_equal(token_vec("foo"), token_vec("foo"))


def test_zero_norm_passthrough():
    # reference guard: norm < 1e-9 -> return unchanged (query-index.py:14-16)
    z = np.zeros(8, dtype=np.float32)
    assert np.array_equal(l2_normalize(z), z)
    v = encode_string("!!! ???")  # token-less -> zero vector
    assert np.linalg.norm(v) == 0.0


def test_corrupt_raises_and_batch_masks():
    with pytest.raises(ValueError):
        encode_string("img://CORRUPT/x")
    mat, ok = encode_batch(["img://CORRUPT/x", "baba", ""])
    assert ok.tolist() == [False, True, True]
    assert np.linalg.norm(mat[2]) == 0.0  # empty -> zero vec, ok


def test_batch_matches_single():
    contents = ["baba ceca", "img://dida/feba/0a0a0a", "", "zzz 123"]
    mat, ok = encode_batch(contents)
    for i, c in enumerate(contents):
        assert np.allclose(mat[i], encode_string(c), atol=1e-6)


def test_order_insensitive_bag_model():
    # bag-of-tokens: same multiset => same vector (like CLIP it is NOT
    # exactly this, but our pseudo-space must at least be well-defined)
    assert np.allclose(encode_string("a b"), encode_string("b a"))
