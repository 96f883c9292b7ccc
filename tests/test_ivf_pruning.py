"""Scale gate for the cell-pruned IVF search: nprobe must prune COMPUTE,
not just mask results — peak GEMM width bounded by the largest probed
cell, never by E (the round-1 [batch x E] dense-GEMM cliff: 40 GB per
task at E=10^7).  Pure-NumPy tests: _IvfIndex is executor-side state, so
no Spark session is needed to gate its memory shape."""

import numpy as np
import pytest

from cli_p_spark.operators.ann import _IvfIndex, build_ivf_broadcast_value


def _make_index(E, dim, nlist, seed=7):
    import pandas as pd

    rng = np.random.default_rng(seed)
    emat = rng.standard_normal((E, dim)).astype(np.float32)
    emat /= np.linalg.norm(emat, axis=1, keepdims=True)
    # untrained random unit centroids: assignment structure is all the
    # search path needs; training quality is gated elsewhere
    C = rng.standard_normal((nlist, dim))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {"entity_id": [f"e{i:08d}" for i in range(E)],
         "embedding": list(emat)}
    )
    return pdf, C


def _exact_masked_topk(Q, emat64, C, k, nprobe):
    """Oracle: f64 scores, top-nprobe cells by f64 centroid score, top-k
    within probed cells by (-score, entity idx asc)."""
    cs = Q @ C.T
    pp = min(nprobe, len(C))
    probe = np.argpartition(-cs, pp - 1, axis=1)[:, :pp]
    assign = np.argmax(emat64 @ C.T, axis=1)
    out = []
    for i in range(len(Q)):
        allowed = np.isin(assign, probe[i])
        sc = Q[i] @ emat64.T
        sc[~allowed] = -np.inf
        order = np.lexsort((np.arange(len(sc)), -sc))[:k]
        out.append([(int(j), float(sc[j])) for j in order
                    if np.isfinite(sc[j])])
    return out


@pytest.mark.parametrize("E,nlist,nprobe", [(20_000, 64, 8), (5_000, 32, 4)])
def test_pruned_search_matches_masked_oracle(E, nlist, nprobe):
    dim, k = 32, 5
    pdf, C = _make_index(E, dim, nlist)
    idx = _IvfIndex.from_broadcast(build_ivf_broadcast_value(pdf, C))
    rng = np.random.default_rng(11)
    Q = rng.standard_normal((40, dim))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    emat64 = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)

    cand, sc64 = idx.search(Q, k, nprobe)
    golden = _exact_masked_topk(Q, emat64, C, k, nprobe)
    for i in range(len(Q)):
        order = np.lexsort((cand[i], -sc64[i]))[:k]
        got = [(int(cand[i][j]), float(sc64[i][j])) for j in order
               if np.isfinite(sc64[i][j])]
        assert [g[0] for g in got] == [g[0] for g in golden[i]], i
        assert np.allclose([g[1] for g in got], [g[1] for g in golden[i]],
                           atol=1e-12)


def test_gemm_width_bounded_by_max_cell_not_E():
    """The 100 TB memory gate: at E=10^6 the peak per-block GEMM width
    must be max probed-cell size + k+margin, NOT E."""
    E, dim, nlist, nprobe, k = 1_000_000, 16, 256, 16, 10
    pdf, C = _make_index(E, dim, nlist)
    payload = build_ivf_broadcast_value(pdf, C)
    idx = _IvfIndex.from_broadcast(payload)
    cell_ptr = payload[4]
    max_cell = int(np.diff(cell_ptr).max())
    rng = np.random.default_rng(3)
    Q = rng.standard_normal((64, dim))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)

    cand, sc64 = idx.search(Q, k, nprobe)
    assert cand.shape == (64, k + idx.MARGIN)
    assert np.isfinite(sc64).all()  # every probe found >= kc candidates
    kc = k + idx.MARGIN
    assert idx.stats["max_gemm_cols"] <= max_cell + kc, (
        idx.stats, max_cell)
    assert idx.stats["max_gemm_cols"] < E // 10


def test_exhaustive_probe_uses_dense_path_and_is_exact():
    E, dim, nlist, k = 3_000, 16, 16, 3
    pdf, C = _make_index(E, dim, nlist)
    idx = _IvfIndex.from_broadcast(build_ivf_broadcast_value(pdf, C))
    rng = np.random.default_rng(5)
    Q = rng.standard_normal((10, dim))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    emat64 = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    cand, sc64 = idx.search(Q, k, nlist)  # nprobe = nlist
    golden = _exact_masked_topk(Q, emat64, C, k, nlist)
    for i in range(len(Q)):
        order = np.lexsort((cand[i], -sc64[i]))[:k]
        assert [int(cand[i][j]) for j in order] == [g[0] for g in golden[i]]
