"""Property-based tests (hypothesis) for the pure-math layer — no Spark."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cli_p_spark.functions.encoder import (
    NORM_EPS,
    encode_batch,
    encode_string,
    l2_normalize,
)
from cli_p_spark.operators.ann import train_centroids

words = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1,
            max_size=8),
    min_size=0, max_size=20,
)


@settings(max_examples=50, deadline=None)
@given(words)
def test_encode_unit_norm_or_zero(ws):
    v = encode_string(" ".join(ws))
    n = float(np.linalg.norm(v))
    assert abs(n - 1.0) < 1e-5 or n < NORM_EPS


@settings(max_examples=50, deadline=None)
@given(words)
def test_encode_bag_of_tokens_order_invariant(ws):
    a = encode_string(" ".join(ws))
    b = encode_string(" ".join(reversed(ws)))
    assert np.allclose(a, b, atol=1e-6)


@settings(max_examples=30, deadline=None)
@given(st.lists(words, min_size=1, max_size=10))
def test_batch_equals_rowwise(texts):
    contents = [" ".join(ws) for ws in texts]
    mat, ok = encode_batch(contents)
    assert ok.all()
    for i, c in enumerate(contents):
        assert np.allclose(mat[i], encode_string(c), atol=1e-6), c


@settings(max_examples=20, deadline=None)
@given(st.integers(2, 40), st.integers(2, 10), st.integers(0, 2**31 - 1))
def test_centroids_unit_norm_and_deterministic(n, k, seed):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 8))
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C1 = train_centroids(X, nlist=k, seed=seed)
    C2 = train_centroids(X, nlist=k, seed=seed)
    assert np.array_equal(C1, C2)
    norms = np.linalg.norm(C1, axis=1)
    assert np.all(np.abs(norms - 1.0) < 1e-9)


def test_normalize_idempotent():
    rng = np.random.default_rng(3)
    for _ in range(20):
        v = rng.standard_normal(16).astype(np.float32) * rng.uniform(0, 100)
        u = l2_normalize(v)
        assert np.allclose(l2_normalize(u), u, atol=1e-6)
