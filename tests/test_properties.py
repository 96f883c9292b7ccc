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


@given(
    st.floats(min_value=0.75, max_value=0.999),
    st.floats(min_value=0.9, max_value=0.999),
)
@settings(max_examples=50, deadline=None)
def test_lsh_params_hit_recall_target(tau, target):
    """lsh_params_for_tau: returned (bits, bands) always achieves the
    requested recall at tau, and wider bands are never returned than the
    cap allows."""
    import math

    from cli_p_spark.operators.lsh import lsh_params_for_tau

    bits, bands = lsh_params_for_tau(tau, target_recall=target)
    assert 4 <= bits <= 16 and 1 <= bands <= 64
    p1 = 1.0 - math.acos(tau) / math.pi
    recall = 1.0 - (1.0 - p1 ** bits) ** bands
    # the cap can force a shortfall only at the widest-feasible fallback
    if bands < 64:
        assert recall >= target - 1e-9, (tau, target, bits, bands, recall)


def _py_contamination(doc_rows, probe_rows, n, min_overlap):
    """Pure-Python oracle for ngram_contamination."""
    def grams(text):
        toks = text.lower().split(" ")
        hi = max(len(toks) - n, 0)
        return {" ".join(toks[i: i + n]) for i in range(hi + 1)}

    out = {}
    pg = {pid: grams(t) for pid, t in probe_rows}
    for did, t in doc_rows:
        dgr = grams(t)
        for pid, pgr in pg.items():
            inter = len(dgr & pgr)
            if inter >= min_overlap:
                out[(did, pid)] = (inter, inter / len(pgr))
    return out


@given(st.data())
@settings(max_examples=8, deadline=None)
def test_contamination_matches_python_oracle(spark, data):
    """ngram_contamination vs an independent pure-Python set oracle on
    random corpora with planted probe substrings."""
    from cli_p_spark.operators.dedup import ngram_contamination

    rnd = data.draw(st.randoms(use_true_random=False))
    vocab = [f"w{i}" for i in range(30)]
    probes = [
        (f"p{j}", " ".join(rnd.choices(vocab, k=rnd.randint(4, 10))))
        for j in range(3)
    ]
    docs = []
    for i in range(12):
        words = rnd.choices(vocab, k=rnd.randint(3, 15))
        if rnd.random() < 0.5:  # plant a probe fragment
            frag = probes[rnd.randrange(3)][1].split()
            pos = rnd.randint(0, len(words))
            words = words[:pos] + frag + words[pos:]
        docs.append((f"d{i}", " ".join(words)))
    n, mo = rnd.choice([2, 3]), rnd.choice([1, 2])
    got = {
        (r["doc_id"], r["probe_id"]): (r["n_overlap"], r["overlap_frac"])
        for r in ngram_contamination(
            spark.createDataFrame(docs, "doc_id string, text string"),
            spark.createDataFrame(probes, "probe_id string, text string"),
            n=n, min_overlap=mo,
        ).collect()
    }
    want = _py_contamination(docs, probes, n, mo)
    assert got.keys() == want.keys()
    for k_ in want:
        assert got[k_][0] == want[k_][0], k_
        assert abs(got[k_][1] - want[k_][1]) < 1e-12, k_


# --- properties backing the round-4 operator families ----------------
# (pure-Python replications of the math the operators rely on; the
# Spark-vs-exact equality gates live in test_fuzzy/test_layout)

def _deletes(s: str, d: int) -> set:
    out = {s}
    frontier = {s}
    for _ in range(d):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1:])
        out |= nxt
        frontier = nxt
    return out


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abcde", min_size=0, max_size=10),
    st.text(alphabet="abcde", min_size=0, max_size=10),
)
def test_symmetric_delete_blocking_complete(a, b):
    """The theorem fuzzy_name_pairs' completeness rests on: any two
    strings within Levenshtein 2 share a <=2-deletion variant (small
    alphabet maximizes collision/edit density)."""
    if _lev(a, b) <= 2:
        assert _deletes(a, 2) & _deletes(b, 2)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255),
)
def test_morton_key_per_dim_monotone(x1, x2, y):
    """Bit interleaving is order-preserving per dimension (the property
    that makes a z-sort cluster EVERY dim): with y fixed,
    z(x1, y) < z(x2, y) iff x1 < x2."""
    def spread(v, off):
        return sum(((v >> i) & 1) << (i * 2 + off) for i in range(8))

    z1 = spread(x1, 0) + spread(y, 1)
    z2 = spread(x2, 0) + spread(y, 1)
    assert (z1 < z2) == (x1 < x2)
