"""Banded sign-LSH pair generation vs the exact all-pairs oracle."""

import numpy as np

from cli_p_spark.operators.lsh import hyperplane_lsh_pairs


def _mk_vectors(n_base=120, dim=64, seed=9):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(n_base):
        rows.append((f"v{i:04d}a", base[i].astype(np.float32).tolist()))
        jit = base[i] + rng.standard_normal(dim) * 0.03  # cos ~0.97
        jit /= np.linalg.norm(jit)
        rows.append((f"v{i:04d}b", jit.astype(np.float32).tolist()))
    return rows


def test_lsh_pairs_match_exact_oracle(spark):
    rows = _mk_vectors()
    df = spark.createDataFrame(rows, "id string, embedding array<float>")
    tau = 0.9
    got = {
        (r["src"], r["dst"]): r["cosine"]
        for r in hyperplane_lsh_pairs(
            df, "embedding", "id", tau=tau, dim=64
        ).collect()
    }
    emb = {k: np.array(v, dtype=np.float64) for k, v in rows}
    ids = sorted(emb)
    oracle = {
        (a, b): float(emb[a] @ emb[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if emb[a] @ emb[b] >= tau
    }
    # precision is exact (every candidate is cosine-verified)
    assert set(got) <= set(oracle)
    # recall: jittered twins sit at cos~0.96-0.98 where banded LSH recall
    # is near-1; demand >= 0.95 overall
    recall = len(got) / len(oracle)
    assert recall >= 0.95, (recall, len(got), len(oracle))
    for k, v in got.items():
        assert abs(v - oracle[k]) < 1e-6


def test_lsh_grouped_restricts_pairs(spark):
    """group_col shards pairing: cross-group near-dups are not paired
    (the per-neighborhood canonicalization mode for 10^12 mentions)."""
    rows = _mk_vectors(n_base=40)
    grouped = [
        (rid, emb, "g1" if i < 40 else "g2")
        for i, (rid, emb) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        grouped, "id string, embedding array<float>, grp string"
    )
    global_pairs = {
        (r["src"], r["dst"])
        for r in hyperplane_lsh_pairs(
            df, "embedding", "id", tau=0.9, dim=64
        ).collect()
    }
    grouped_pairs = {
        (r["src"], r["dst"])
        for r in hyperplane_lsh_pairs(
            df, "embedding", "id", tau=0.9, dim=64, group_col="grp"
        ).collect()
    }
    grp = {rid: g for rid, _, g in grouped}
    assert grouped_pairs == {
        (a, b) for a, b in global_pairs if grp[a] == grp[b]
    }
    assert grouped_pairs  # some intra-group twins exist


def test_lsh_exact_duplicates_always_found(spark):
    rng = np.random.default_rng(2)
    v = rng.standard_normal(64)
    v /= np.linalg.norm(v)
    rows = [(f"d{i}", v.astype(np.float32).tolist()) for i in range(5)]
    w = rng.standard_normal(64)
    w /= np.linalg.norm(w)
    rows.append(("other", w.astype(np.float32).tolist()))
    df = spark.createDataFrame(rows, "id string, embedding array<float>")
    got = {
        (r["src"], r["dst"])
        for r in hyperplane_lsh_pairs(
            df, "embedding", "id", tau=0.99, dim=64
        ).collect()
    }
    expect = {
        (f"d{i}", f"d{j}") for i in range(5) for j in range(5) if i < j
    }
    assert got == expect  # identical sigs collide in every band


def test_oversized_bucket_star_keeps_connectivity(spark):
    """Degenerate-bucket cap: a mass-duplicate group larger than
    max_bucket emits LINEAR bucket-min star candidates (not |B|^2, not
    nothing) — downstream CC still collapses it to one cluster."""
    import numpy as np

    from cli_p_spark.operators.ccomp import connected_components
    from cli_p_spark.operators.lsh import hyperplane_lsh_pairs

    rng = np.random.default_rng(31)
    v = rng.standard_normal(16)
    v /= np.linalg.norm(v)
    w = rng.standard_normal(16)
    w /= np.linalg.norm(w)
    rows = [(f"dup{i:03d}", v.astype(np.float32).tolist()) for i in range(40)]
    rows += [(f"solo{i:03d}", w.astype(np.float32).tolist()) for i in range(3)]
    df = spark.createDataFrame(rows, "id string, embedding array<float>")

    pairs = hyperplane_lsh_pairs(
        df, "embedding", "id", tau=0.99, dim=16,
        max_bucket=10, oversize="star",
    )
    got = [(r["src"], r["dst"]) for r in pairs.collect()]
    # linear, not quadratic: the 40-dup group contributes 39 star pairs,
    # the 3-solo group (under the cap) pairs quadratically (3)
    assert len(got) == 39 + 3, len(got)
    comps = connected_components(pairs.select("src", "dst"))
    comp_of = {r["node"]: r["component"] for r in comps.collect()}
    assert len({comp_of[f"dup{i:03d}"] for i in range(40)}) == 1
    assert len({comp_of[f"solo{i:03d}"] for i in range(3)}) == 1

    dropped = hyperplane_lsh_pairs(
        df, "embedding", "id", tau=0.99, dim=16,
        max_bucket=10, oversize="drop",
    )
    assert dropped.filter("src LIKE 'dup%'").count() == 0


def test_sharded_canonicalization_end_to_end(spark):
    """Bench-shape gate at test scale: distributed mention corpus
    (planted 4-cliques + an exact-copy hub) -> per-shard banded LSH ->
    salted CC.  The hub must collapse to ONE component via star edges
    (linear, not quadratic), planted cliques must canonicalize, and CC
    must converge in the expected few rounds."""
    from cli_p_spark.fixtures.distributed import distributed_mentions
    from cli_p_spark.operators.ccomp import connected_components
    from cli_p_spark.operators.lsh import (
        hyperplane_lsh_pairs,
        lsh_params_for_tau,
    )

    n, hub = 4000, 600
    m = distributed_mentions(spark, n, hub_copies=hub).persist()
    bits, bands = lsh_params_for_tau(0.95)
    pairs = hyperplane_lsh_pairs(
        m, "embedding", "mention_id", tau=0.95, dim=64,
        bits_per_band=bits, bands=bands, group_col="grp",
        max_bucket=200,
    ).persist()
    n_edges = pairs.count()
    # the 600-copy hub exceeds max_bucket in every band -> star edges,
    # LINEAR in hub size (quadratic would be ~180k for the hub alone)
    assert n_edges < hub * 3 + n * 2, n_edges
    stats = {}
    comps = connected_components(pairs.select("src", "dst"), stats=stats)
    sizes = {
        r["component"]: r["count"]
        for r in comps.groupBy("component").count().collect()
    }
    assert sizes.get("m000000000") == hub  # hub: one component, all copies
    assert stats["rounds"] <= 6
    # planted cliques: cluster of ids [c*4, c*4+4) is a component iff its
    # seeded coin said dup; spot-check determinism of a few clusters
    import numpy as np
    from cli_p_spark.config import SEED

    comp_of = {
        r["node"]: r["component"] for r in comps.collect()
    }
    for c in range(hub // 4 + 1, hub // 4 + 40):
        is_dup = np.random.default_rng(
            (SEED << 32) ^ (c * 2654435761)
        ).random() < 0.3
        members = [f"m{c * 4 + i:09d}" for i in range(4)]
        if is_dup:
            roots = {comp_of[x] for x in members}
            assert roots == {members[0]}, (c, roots)
        else:
            assert all(x not in comp_of or comp_of[x] == x
                       for x in members), c
    m.unpersist(); pairs.unpersist()
    pairs.signature_cache.unpersist()
