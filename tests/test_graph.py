"""Graph analytics (operators/graph.py): fixed-point PageRank vs a
pure-Python replication, and vs float PageRank for ranking agreement."""

from __future__ import annotations

import random
from collections import defaultdict

from cli_p_spark.operators.graph import (
    DAMPING_PPM,
    UNIT,
    degree_stats,
    pagerank_fixed_point,
)


def _py_pagerank_fp(edges, iterations=5, unit=UNIT, damping_ppm=DAMPING_PPM):
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    outdeg = defaultdict(int)
    for u, _ in edges:
        outdeg[u] += 1
    base = ((1_000_000 - damping_ppm) * unit) // 1_000_000
    r = {n: unit for n in nodes}
    for _ in range(iterations):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {n: base + (damping_ppm * s[n]) // 1_000_000 for n in nodes}
    return r


def test_pagerank_matches_python_exactly(spark):
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(60)]
    edges = sorted(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(400)
        }
    )
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(df).collect()
    }
    assert got == _py_pagerank_fp(edges)


def test_pagerank_ranks_hub_highest(spark):
    # star: everyone links to 'hub'; hub links to one spoke
    edges = [(f"s{i}", "hub") for i in range(20)] + [("hub", "s0")]
    df = spark.createDataFrame(edges, "src string, dst string")
    ranks = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(df).collect()
    }
    assert ranks["hub"] == max(ranks.values())
    assert ranks["s0"] > ranks["s1"]  # s0 receives the hub's mass
    # all spokes but s0 are structurally identical -> identical ranks
    assert len({ranks[f"s{i}"] for i in range(1, 20)}) == 1


def test_pagerank_deep_iterations_bounded_plan(spark):
    """30 iterations (real PageRank depth): the checkpointer must cut
    lineage so the final plan holds at most `checkpoint_every`
    iterations of joins — not the full 2*30-join DAG — while ranks stay
    bit-identical to the pure-Python fold AND to the uncheckpointed
    plan (checkpointing is a plan concern, never a value concern)."""
    import time

    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(40)]
    edges = sorted(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(250)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src string, dst string")

    t0 = time.monotonic()
    deep = pagerank_fixed_point(df, iterations=30, checkpoint_every=5)
    got = {r["node"]: r["rank_fp"] for r in deep.collect()}
    elapsed = time.monotonic() - t0
    assert got == _py_pagerank_fp(edges, iterations=30)
    # bounded plan: the analyzed plan must be a short tail over a
    # checkpoint scan, far smaller than the unbroken 30-iteration DAG
    deep_plan = deep._jdf.queryExecution().analyzed().toString()
    flat_plan = (
        pagerank_fixed_point(df, iterations=30, checkpoint_every=0)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert len(deep_plan) < len(flat_plan) / 3
    # lineage blowup shows up as 10x-plus wall, not seconds; 300 (not
    # 120) because a contended-VM day stretches healthy runs past 2 min
    # (round-6 session-5: 138 s with values AND plan-size green)
    assert elapsed < 300
    deep.pagerank_cache.unpersist()


def test_degree_stats(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["degree"]: r["n_nodes"] for r in degree_stats(df).collect()}
    # degrees: a=2 (out), b=2 (1 in + 1 out), c=2 (in) -> all degree 2
    assert got == {2: 3}


def test_khop_matches_python_bfs(spark):
    from cli_p_spark.operators.graph import khop_reachability

    rng = random.Random(23)
    nodes = [f"n{i}" for i in range(80)]
    edges = sorted(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(200)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    seeds = ["n0", "n1"]

    # pure-Python level-synchronous BFS
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    want = {s: 0 for s in seeds}
    frontier = set(seeds)
    for depth in range(1, 5):
        nxt = {
            v for u in frontier for v in adj[u] if v not in want
        }
        for v in nxt:
            want[v] = depth
        frontier = nxt

    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    out = khop_reachability(e, s, k=4)
    got = {r["node"]: r["hops"] for r in out.collect()}
    assert got == want
    out.khop_cache.unpersist()


def test_khop_early_exit_and_hub(spark):
    from cli_p_spark.operators.graph import khop_reachability

    # hub: seed -> hub -> 30 spokes; everything reached by hop 2, and
    # k=10 must terminate early (empty frontier) without error
    edges = [("s", "hub")] + [("hub", f"x{i}") for i in range(30)]
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([("s",)], "node string")
    out = khop_reachability(e, s, k=10)
    got = {r["node"]: r["hops"] for r in out.collect()}
    assert got["s"] == 0 and got["hub"] == 1
    assert all(got[f"x{i}"] == 2 for i in range(30))
    assert len(got) == 32
    out.khop_cache.unpersist()


def test_triangle_count_matches_python(spark):
    from itertools import combinations

    from cli_p_spark.operators.graph import triangle_count

    rng = random.Random(31)
    nodes = [f"n{i}" for i in range(30)]
    edges = sorted(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    und = {frozenset((a, b)) for a, b in edges}
    want = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if {frozenset((a, b)), frozenset((a, c)), frozenset((b, c))} <= und
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    out = triangle_count(df)
    row = out.collect()[0]
    assert row["n_triangles"] == want
    assert row["n_edges"] == len(und)
    out.triangle_cache.unpersist()


def test_triangle_count_known_graphs(spark):
    from cli_p_spark.operators.graph import triangle_count

    # K4 has 4 triangles; duplicate/reversed edges must not inflate
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
          ("b", "d"), ("c", "d"), ("b", "a"), ("c", "a")]
    df = spark.createDataFrame(k4, "src string, dst string")
    out = triangle_count(df)
    row = out.collect()[0]
    assert (row["n_edges"], row["n_triangles"]) == (6, 4)
    out.triangle_cache.unpersist()
    # star graph: zero triangles
    star = [("h", f"s{i}") for i in range(10)]
    df2 = spark.createDataFrame(star, "src string, dst string")
    out2 = triangle_count(df2)
    assert out2.collect()[0]["n_triangles"] == 0
    out2.triangle_cache.unpersist()


def _py_ppr_fp(edges, seeds, iterations=5, unit=UNIT,
               damping_ppm=DAMPING_PPM):
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    outdeg = defaultdict(int)
    for u, _ in edges:
        outdeg[u] += 1
    base = ((1_000_000 - damping_ppm) * unit) // 1_000_000
    t = {n: (1 if n in seeds else 0) for n in nodes}
    r = {n: unit * t[n] for n in nodes}
    for _ in range(iterations):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {
            n: base * t[n] + (damping_ppm * s[n]) // 1_000_000
            for n in nodes
        }
    return r


def test_personalized_pagerank_matches_python(spark):
    rng = random.Random(13)
    nodes = [f"n{i}" for i in range(50)]
    edges = sorted(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(300)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    seeds = {"n0", "n1", "n2"}
    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in sorted(seeds)], "node string")
    out = pagerank_fixed_point(df, seeds=sdf)
    got = {r["node"]: r["rank_fp"] for r in out.collect()}
    assert got == _py_ppr_fp(edges, seeds)
    out.pagerank_cache.unpersist()


def test_personalized_pagerank_localizes(spark):
    # two disjoint star communities; seeding in A must rank A's hub
    # above everything in B (which gets exactly zero mass)
    edges = (
        [(f"a{i}", "hubA") for i in range(10)]
        + [("hubA", "a0")]
        + [(f"b{i}", "hubB") for i in range(10)]
        + [("hubB", "b0")]
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([("a0",)], "node string")
    out = pagerank_fixed_point(df, seeds=sdf)
    ranks = {r["node"]: r["rank_fp"] for r in out.collect()}
    assert ranks["hubA"] > 0 and ranks["a0"] > 0
    assert ranks["hubB"] == 0 and all(
        ranks[f"b{i}"] == 0 for i in range(10)
    )
    out.pagerank_cache.unpersist()


def test_pagerank_tol_early_exit_on_converged_graph(spark):
    # directed ring: every node has outdeg 1 and indeg 1, so the very
    # first update maps unit -> base + 0.85*unit = unit exactly (integer
    # arithmetic) -- delta is 0 after iteration 1 and the tol path must
    # exit immediately, bit-identical to the full fixed-iteration run
    n = 12
    edges = [(f"r{i:02d}", f"r{(i + 1) % n:02d}") for i in range(n)]
    df = spark.createDataFrame(edges, "src string, dst string")
    stats: dict = {}
    out = pagerank_fixed_point(df, iterations=30, tol_fp=0, stats=stats)
    got = {r["node"]: r["rank_fp"] for r in out.collect()}
    out.pagerank_cache.unpersist()
    assert stats["iterations"] == 1 and stats["final_delta_fp"] == 0
    fixed = pagerank_fixed_point(df, iterations=30)
    want = {r["node"]: r["rank_fp"] for r in fixed.collect()}
    fixed.pagerank_cache.unpersist()
    assert got == want  # early exit changed nothing


def test_pagerank_tol_matches_fixed_iteration_count(spark):
    # general graph: exiting at iteration m under tol must equal running
    # exactly m fixed iterations (the early exit is a stopping rule, not
    # a different algorithm), and m must be < the 30-iteration budget
    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(40)]
    edges = sorted(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(200)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src string, dst string")
    stats: dict = {}
    out = pagerank_fixed_point(df, iterations=30, tol_fp=50, stats=stats)
    got = {r["node"]: r["rank_fp"] for r in out.collect()}
    out.pagerank_cache.unpersist()
    m = stats["iterations"]
    assert 1 <= m < 30 and stats["final_delta_fp"] <= 50
    assert got == _py_pagerank_fp(edges, iterations=m)


def _py_lpa(edges, iterations=4):
    sym = set()
    for u, v in edges:
        if u != v:
            sym.add((u, v)); sym.add((v, u))
    nodes = {a for a, _ in sym}
    labels = {n: n for n in nodes}
    for _ in range(iterations):
        from collections import Counter, defaultdict
        neigh = defaultdict(Counter)
        for a, b in sym:
            neigh[a][labels[b]] += 1
        labels = {
            n: min(l for l, c in cnt.items() if c == max(cnt.values()))
            for n, cnt in neigh.items()
        }
    return labels


def test_label_propagation_matches_python(spark):
    from cli_p_spark.operators.graph import label_propagation

    rng = random.Random(23)
    nodes = [f"n{i}" for i in range(50)]
    edges = sorted(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(250)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = label_propagation(df, iterations=4)
    got = {r["node"]: r["label"] for r in out.collect()}
    out.lpa_cache.unpersist()
    assert got == _py_lpa(edges, 4)


def test_label_propagation_two_cliques(spark):
    """Two 6-cliques bridged by one edge: LPA must keep them as two
    communities, each labeled by its min member."""
    from itertools import combinations

    from cli_p_spark.operators.graph import label_propagation

    a = [f"a{i}" for i in range(6)]
    b = [f"b{i}" for i in range(6)]
    edges = (
        list(combinations(a, 2)) + list(combinations(b, 2))
        + [("a0", "b0")]
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    out = label_propagation(df, iterations=4)
    got = {r["node"]: r["label"] for r in out.collect()}
    out.lpa_cache.unpersist()
    assert all(got[n] == "a0" for n in a)
    assert all(got[n] == "b0" for n in b)


# --- closeness centrality ---------------------------------------------


def test_closeness_path_graph(spark):
    # directed path 0 -> 1 -> 2 -> 3: from root 0, dists 1,2,3
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(0,), (3,)], "node bigint")
    from cli_p_spark.operators.graph import closeness_centrality

    out = closeness_centrality(edges, seeds, max_hops=5)
    rows = {r["root"]: r for r in out.collect()}
    out.closeness_cache.unpersist()
    assert rows[0]["n_reached"] == 3
    assert rows[0]["total_dist"] == 6  # 1 + 2 + 3
    assert rows[0]["closeness"] == 3 / 6
    # node 3 is a sink: reaches nothing
    assert rows[3]["n_reached"] == 0
    assert rows[3]["total_dist"] == 0
    assert rows[3]["closeness"] == 0.0


def test_closeness_star_and_hop_cap(spark):
    # star: center 0 -> leaves 1..5; plus a long tail 5 -> 6 -> 7
    e = [(0, i) for i in range(1, 6)] + [(5, 6), (6, 7)]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    seeds = spark.createDataFrame([(0,)], "node bigint")
    from cli_p_spark.operators.graph import closeness_centrality

    full = closeness_centrality(edges, seeds, max_hops=6)
    r = full.collect()[0]
    full.closeness_cache.unpersist()
    assert r["n_reached"] == 7 and r["total_dist"] == 5 * 1 + 2 + 3
    capped = closeness_centrality(edges, seeds, max_hops=1)
    rc = capped.collect()[0]
    capped.closeness_cache.unpersist()
    assert rc["n_reached"] == 5 and rc["total_dist"] == 5


def test_closeness_matches_duckdb_twin(spark, tmp_path):
    import random

    import duckdb

    from cli_p_spark.operators.graph import (
        closeness_centrality,
        closeness_sql,
    )

    rng = random.Random(11)
    e = list({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    e = [(a, b) for a, b in e if a != b]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    p = str(tmp_path / "edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "node bigint")
    out = closeness_centrality(edges, seeds, max_hops=6)
    got = sorted(
        (r["root"], r["n_reached"], r["total_dist"], r["closeness"])
        for r in out.collect()
    )
    out.closeness_cache.unpersist()
    sql = closeness_sql(
        f"read_parquet('{p}/*.parquet')",
        "SELECT 0 AS node UNION ALL SELECT 1 UNION ALL SELECT 2",
        max_hops=6,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


# --- Jaccard link prediction ------------------------------------------


def test_jaccard_linkpred_square(spark):
    # 4-cycle 0-1-2-3-0: the two diagonals are perfect predictions
    # (N(0) == N(2) = {1,3}; N(1) == N(3) = {0,2}) => jaccard 1.0
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src bigint, dst bigint"
    )
    from cli_p_spark.operators.graph import jaccard_link_prediction

    out = jaccard_link_prediction(edges, min_common=2)
    rows = sorted(
        (r["node_a"], r["node_b"], r["n_common"], r["jaccard"])
        for r in out.collect()
    )
    out.linkpred_cache.unpersist()
    assert rows == [(0, 2, 2, 1.0), (1, 3, 2, 1.0)]


def test_jaccard_linkpred_excludes_edges_and_matches_duckdb(spark, tmp_path):
    import random

    import duckdb

    from cli_p_spark.operators.graph import (
        jaccard_link_prediction,
        jaccard_link_sql,
    )

    rng = random.Random(7)
    e = list({(rng.randrange(40), rng.randrange(40)) for _ in range(150)})
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    p = str(tmp_path / "lp_edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    out = jaccard_link_prediction(edges, min_common=2)
    got = sorted(
        (r["node_a"], r["node_b"], r["n_common"], r["jaccard"])
        for r in out.collect()
    )
    # no predicted pair may already be an undirected edge
    und = {(a, b) for a, b in e} | {(b, a) for a, b in e}
    for a, b, _, j in got:
        assert (a, b) not in und and 0.0 < j <= 1.0
    out.linkpred_cache.unpersist()
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            jaccard_link_sql(f"read_parquet('{p}/*.parquet')", 2)
        ).fetchall()
    )
    assert got == want


# --- sampled betweenness ----------------------------------------------


def _py_brandes(edges, sources, max_hops=8):
    """Pure-Python Brandes restricted to `sources`, replicating the
    operator's DETERMINISTIC accumulation orders: successor sums fold
    in ascending successor-node order; the cross-source sum folds in
    ascending root order.  With identical fold orders the IEEE double
    results are bit-identical to Spark's."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for u, v in edges:
        if u != v:
            adj[u].append(v)
    # every reached node at level >= 1 gets a delta row (nodes on no
    # shortest path, including each deepest level, carry 0.0)
    per_source = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        frontier = [s]
        levels = [[s]]
        d = 0
        while frontier and d < max_hops:
            nxt = defaultdict(int)
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        nxt[v] += sigma[u]
            if not nxt:
                break
            d += 1
            for v, sg in nxt.items():
                dist[v] = d
                sigma[v] = sg
            frontier = sorted(nxt)
            levels.append(frontier)
        per_source[s] = (sigma, levels)
    bc_terms = defaultdict(list)  # node -> [(root, delta)]
    for s in sources:
        sigma, levels = per_source[s]
        delta = {}
        for li in range(len(levels) - 2, 0, -1):
            nxt_set = set(levels[li + 1])
            for v in levels[li]:
                acc = 0.0
                succs = sorted(
                    w for w in adj[v] if w in nxt_set
                )
                for w in succs:
                    acc = acc + (sigma[v] / sigma[w]) * (
                        1.0 + delta.get(w, 0.0)
                    )
                delta[v] = acc
        for lv in levels[1:]:
            for v in lv:
                delta.setdefault(v, 0.0)
        for v, dl in delta.items():
            bc_terms[v].append((s, dl))
    out = {}
    for v, terms in bc_terms.items():
        acc = 0.0
        for _r, dl in sorted(terms):
            acc = acc + dl
        out[v] = acc
    return out


def test_betweenness_path_graph(spark):
    # path 0->1->2->3 from source 0: delta(2)=1 (pred of 3),
    # delta(1)=1*(1+1)=2; bc: {1: 2.0, 2: 1.0} (3 is deepest, excluded)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(0,)], "node bigint")
    from cli_p_spark.operators.graph import betweenness_sampled

    out = betweenness_sampled(edges, seeds, max_hops=6)
    got = {r["node"]: r["betweenness"] for r in out.collect()}
    out.betweenness_cache.unpersist()
    # levels [0],[1],[2],[3]: every reached node at level >= 1 appears;
    # the deepest node 3 lies on no shortest path as an interior node
    assert got == {1: 2.0, 2: 1.0, 3: 0.0}


def test_betweenness_diamond_split_paths(spark):
    # diamond 0->{1,2}->3->4: sigma(3)=2; delta(1)=delta(2)=
    # (1/2)*(1+delta(3)); delta(3)=1*(1+delta(4))=1, delta(4)=0...
    # levels: [0],[1,2],[3],[4]; delta(3)=(1/1)*(1+0)=1 wait sigma(4)=2
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
        "src bigint, dst bigint",
    )
    seeds = spark.createDataFrame([(0,)], "node bigint")
    from cli_p_spark.operators.graph import betweenness_sampled

    out = betweenness_sampled(edges, seeds, max_hops=6)
    got = {r["node"]: r["betweenness"] for r in out.collect()}
    out.betweenness_cache.unpersist()
    # delta(3) = (2/2)*(1+0) = 1 (4 is deepest, delta 0)
    # delta(1) = (1/2)*(1+1) = 1.0 ; delta(2) = 1.0 ; delta(0) not counted
    assert got[3] == 1.0 and got[1] == 1.0 and got[2] == 1.0
    assert got[4] == 0.0  # deepest level: explicit 0.0 row


def test_betweenness_matches_python_replication(spark):
    import random

    rng = random.Random(23)
    e = list({(rng.randrange(40), rng.randrange(40)) for _ in range(160)})
    e = [(a, b) for a, b in e if a != b]
    sources = [0, 1, 2, 3, 4]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    seeds = spark.createDataFrame([(s,) for s in sources], "node bigint")
    from cli_p_spark.operators.graph import betweenness_sampled

    out = betweenness_sampled(edges, seeds, max_hops=8)
    got = {r["node"]: r["betweenness"] for r in out.collect()}
    out.betweenness_cache.unpersist()
    want = _py_brandes(e, sources, max_hops=8)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == want[n], (n, got[n], want[n])

def test_betweenness_sql_twin_bitexact(spark, tmp_path):
    """The DuckDB twin replays the deterministic folds: doubles must be
    BIT-identical, not approximately equal."""
    import random

    import duckdb

    from cli_p_spark.operators.graph import (
        betweenness_sampled,
        betweenness_sql,
    )

    rng = random.Random(41)
    e = list({(rng.randrange(30), rng.randrange(30)) for _ in range(110)})
    e = [(a, b) for a, b in e if a != b]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    p = str(tmp_path / "bw_edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "node bigint")
    out = betweenness_sampled(edges, seeds, max_hops=6)
    got = sorted((r["node"], r["betweenness"]) for r in out.collect())
    out.betweenness_cache.unpersist()
    sql = betweenness_sql(
        f"read_parquet('{p}/*.parquet')",
        "SELECT 0 AS node UNION ALL SELECT 1 UNION ALL SELECT 2",
        max_hops=6,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert len(got) == len(want)
    for (gn, gv), (wn, wv) in zip(got, want):
        assert gn == wn
        assert gv == wv and repr(gv) == repr(wv), (gn, gv, wv)


# --- harmonic centrality ----------------------------------------------


def test_harmonic_path_graph(spark):
    # 0->1->2->3: harmonic(0) = 1/1 + 1/2 + 1/3 = 11/6
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(0,), (3,)], "node bigint")
    from cli_p_spark.operators.graph import harmonic_centrality

    out = harmonic_centrality(edges, seeds, max_hops=6)
    rows = {r["root"]: r for r in out.collect()}
    out.harmonic_cache.unpersist()
    lcm = 60  # lcm(1..6)
    assert rows[0]["n_reached"] == 3
    assert rows[0]["harmonic_fp"] == 60 + 30 + 20
    assert rows[0]["harmonic"] == 110 / 60
    # node 3 has no out-edges: harmonic 0
    assert rows[3]["n_reached"] == 0 and rows[3]["harmonic"] == 0.0
    assert lcm == 60


def test_harmonic_matches_duckdb_twin(spark, tmp_path):
    import random

    import duckdb

    from cli_p_spark.operators.graph import (
        harmonic_centrality,
        harmonic_sql,
    )

    rng = random.Random(13)
    e = list({(rng.randrange(35), rng.randrange(35)) for _ in range(120)})
    e = [(a, b) for a, b in e if a != b]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    p = str(tmp_path / "hc_edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "node bigint")
    out = harmonic_centrality(edges, seeds, max_hops=6)
    got = sorted(
        (r["root"], r["n_reached"], r["harmonic_fp"], r["harmonic"])
        for r in out.collect()
    )
    out.harmonic_cache.unpersist()
    sql = harmonic_sql(
        f"read_parquet('{p}/*.parquet')",
        "SELECT 0 AS node UNION ALL SELECT 1 UNION ALL SELECT 2",
        max_hops=6,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


# --- strongly connected components ------------------------------------


def _py_scc(edges, nodes):
    """Brute-force SCC labels: scc(v) = min of v's mutual-reach set."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)

    def reach(s):
        seen, stack = {s}, [s]
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        return seen

    fwd = {n: reach(n) for n in nodes}
    out = {}
    for v in nodes:
        mutual = {u for u in fwd[v] if v in fwd[u]}
        out[v] = min(mutual | {v})
    return out


def test_scc_two_cycles_and_dag(spark):
    # cycle {0,1,2}, cycle {5,6}, DAG tail 2->3->4, bridge 2->5,
    # self-loop 7->7, plus isolated-via-edge 8->9
    e = [
        (0, 1), (1, 2), (2, 0),
        (5, 6), (6, 5),
        (2, 3), (3, 4), (2, 5),
        (7, 7), (8, 9),
    ]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    from cli_p_spark.operators.graph import scc_labels

    out = scc_labels(edges)
    got = {r["node"]: r["scc"] for r in out.collect()}
    out.scc_cache.unpersist()
    assert got == {
        0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9
    }


def test_scc_matches_bruteforce_and_duckdb(spark, tmp_path):
    import random

    import duckdb

    from cli_p_spark.operators.graph import scc_labels, scc_sql

    rng = random.Random(97)
    # dense-ish on 25 nodes => real multi-node SCCs appear
    e = list({(rng.randrange(25), rng.randrange(25)) for _ in range(70)})
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    p = str(tmp_path / "scc_edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    nodes = {a for a, _ in e} | {b for _, b in e}
    out = scc_labels(edges)
    got = {r["node"]: r["scc"] for r in out.collect()}
    out.scc_cache.unpersist()
    want = _py_scc(e, nodes)
    assert got == want
    # at least one non-trivial SCC in this fixture, else the test is vacuous
    assert any(v != k for k, v in want.items())
    sql = scc_sql(f"read_parquet('{p}/*.parquet')")
    duck = dict(duckdb.sql(sql).fetchall())
    assert duck == want


def _py_condensation_layers(e, nodes):
    """longest-path layering of the condensation of edge list e."""
    scc = _py_scc(e, nodes)
    ce = {(scc[a], scc[b]) for a, b in e if scc[a] != scc[b]}
    sccs = set(scc.values())
    layer = {c: 0 for c in sccs}
    for _ in range(len(sccs) + 1):
        changed = False
        for a, b in ce:
            if layer[a] + 1 > layer[b]:
                layer[b] = layer[a] + 1
                changed = True
        if not changed:
            break
    members = defaultdict(int)
    for _, c in scc.items():
        members[c] += 1
    return {c: (layer[c], members[c]) for c in sccs}


def test_condensation_layers_chain_of_cycles(spark):
    from cli_p_spark.operators.graph import condensation_layers

    # 0<->1 -> 2 -> 3<->4 -> 5   : three SCC layers {0,1}=0, {2}=1, {3,4}=2, {5}=3
    e = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 4), (4, 3), (4, 5)]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    out = condensation_layers(edges)
    got = {r["scc"]: (r["layer"], r["n_members"]) for r in out.collect()}
    out.condensation_cache.unpersist()
    assert got == {0: (0, 2), 2: (1, 1), 3: (2, 2), 5: (3, 1)}


def test_condensation_layers_matches_python_and_duckdb(spark, tmp_path):
    import random

    import duckdb

    from cli_p_spark.operators.graph import (
        condensation_layers,
        condensation_sql,
    )

    rng = random.Random(181)
    e = list({(rng.randrange(22), rng.randrange(22)) for _ in range(55)})
    nodes = {a for a, _ in e} | {b for _, b in e}
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    p = str(tmp_path / "cond_edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    out = condensation_layers(edges)
    got = {r["scc"]: (r["layer"], r["n_members"]) for r in out.collect()}
    out.condensation_cache.unpersist()
    want = _py_condensation_layers(e, nodes)
    assert got == want
    duck = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(
            condensation_sql(f"read_parquet('{p}/*.parquet')")
        ).fetchall()
    }
    assert duck == want


def _py_bounded_sp(e_w, seeds, max_hops):
    """hop-bounded Bellman-Ford over weighted edge list [(u, v, w)]."""
    dist = {(r, r): 0 for r in seeds}
    for _ in range(max_hops):
        new = dict(dist)
        for u, v, w in e_w:
            for r in seeds:
                if (r, u) in dist:
                    c = dist[(r, u)] + w
                    if c < new.get((r, v), float("inf")):
                        new[(r, v)] = c
        if new == dist:
            break
        dist = new
    return dist


def test_bounded_sp_path_vs_direct_edge(spark):
    from pyspark.sql import functions as F

    from cli_p_spark.operators.graph import bounded_shortest_paths

    # direct edge weight 10 vs two-hop route weight 2+3: min wins
    e = [("a", "b", 10), ("a", "m", 2), ("m", "b", 3), ("b", "c", 1)]
    edges = spark.createDataFrame(e, "src string, dst string, w int")
    seeds = spark.createDataFrame([("a",)], "node string")
    out = bounded_shortest_paths(edges, seeds, "w", max_hops=4)
    got = {(r["root"], r["node"]): r["dist"] for r in out.collect()}
    out.sp_cache.unpersist()
    assert got == {
        ("a", "a"): 0, ("a", "m"): 2, ("a", "b"): 5, ("a", "c"): 6,
    }


def test_bounded_sp_hop_cap_binds(spark):
    from cli_p_spark.operators.graph import bounded_shortest_paths

    # cheap long route needs 3 hops; expensive direct needs 1
    e = [("a", "b", 100), ("a", "x", 1), ("x", "y", 1), ("y", "b", 1)]
    edges = spark.createDataFrame(e, "src string, dst string, w int")
    seeds = spark.createDataFrame([("a",)], "node string")
    out2 = bounded_shortest_paths(edges, seeds, "w", max_hops=2)
    got2 = {(r["root"], r["node"]): r["dist"] for r in out2.collect()}
    out2.sp_cache.unpersist()
    assert got2[("a", "b")] == 100  # long route out of reach at H=2
    out3 = bounded_shortest_paths(edges, seeds, "w", max_hops=3)
    got3 = {(r["root"], r["node"]): r["dist"] for r in out3.collect()}
    out3.sp_cache.unpersist()
    assert got3[("a", "b")] == 3


def test_bounded_sp_matches_python_and_duckdb(spark, tmp_path):
    import random

    import duckdb

    from cli_p_spark.operators.graph import (
        bounded_shortest_paths,
        bounded_sp_sql,
    )

    rng = random.Random(211)
    e = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    e_w = [(u, v, 1 + (u + 2 * v) % 7) for u, v in e if u != v]
    edges = spark.createDataFrame(e_w, "src bigint, dst bigint, w int")
    p = str(tmp_path / "sp_edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    seeds_l = sorted({u for u, _, _ in e_w})[:3]
    seeds = spark.createDataFrame([(s,) for s in seeds_l], "node bigint")
    out = bounded_shortest_paths(edges, seeds, "w", max_hops=5)
    got = {(r["root"], r["node"]): r["dist"] for r in out.collect()}
    out.sp_cache.unpersist()
    want = _py_bounded_sp(e_w, seeds_l, 5)
    assert got == want
    seeds_sql = (
        "SELECT * FROM (VALUES "
        + ",".join(f"({s})" for s in seeds_l)
        + ") t(node)"
    )
    duck = {
        (r[0], r[1]): r[2]
        for r in duckdb.sql(
            bounded_sp_sql(
                f"read_parquet('{p}/*.parquet')", seeds_sql, "w", 5
            )
        ).fetchall()
    }
    assert duck == want


def _py_hyperball(e, hashes, t_max, log2m):
    """brute-force: exact BFS balls per node, then HLL register math."""
    from cli_p_spark.operators.sketch import RANK_CAP, _alpha

    m = 1 << log2m
    est_num = repr(_alpha(m) * m * m * float(1 << RANK_CAP))
    adj = defaultdict(set)
    for u, v in e:
        adj[u].add(v)

    def reg(h):
        b = h % m  # Python % is non-negative == pmod
        rest = (h % (1 << 64)) >> log2m  # unsigned shift
        if rest == 0:
            r = RANK_CAP
        else:
            r = min((rest & -rest).bit_length(), RANK_CAP)
        return b, r

    out = {}
    for v in hashes:
        ball = {v}
        for t in range(t_max + 1):
            regs = {}
            for w in ball:
                b, r = reg(hashes[w])
                regs[b] = max(regs.get(b, 0), r)
            sm = sum(1 << (RANK_CAP - r) for r in regs.values())
            total = sm + (m - len(regs)) * (1 << RANK_CAP)
            out[(v, t)] = (total, float(est_num) / total)
            ball = ball | {w for u in ball for w in adj[u]}
    return out


def test_hyperball_matches_python_and_duckdb(spark, tmp_path):
    import duckdb
    from pyspark.sql import functions as F

    from cli_p_spark.operators.graph import (
        hyperball_from_hashes,
        hyperball_sql,
    )

    rng = random.Random(317)
    e = list({(rng.randrange(25), rng.randrange(25)) for _ in range(50)})
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    hdf = nodes.select("node", F.xxhash64("node").alias("h"))
    hashes = {r["node"]: r["h"] for r in hdf.collect()}
    ep = str(tmp_path / "hb_edges.parquet")
    hp = str(tmp_path / "hb_hashes.parquet")
    edges.write.mode("overwrite").parquet(ep)
    hdf.write.mode("overwrite").parquet(hp)

    out = hyperball_from_hashes(edges, hdf, t_max=3, log2m=4)
    got = {
        (r["node"], r["t"]): (r["reg_sum"], r["n_ball_est"])
        for r in out.collect()
    }
    out.hyperball_cache.unpersist()
    want = _py_hyperball(e, hashes, 3, 4)
    assert len(got) == len(hashes) * 4
    assert got == want  # ints exact; floats one identical IEEE division

    sql = hyperball_sql(
        f"read_parquet('{ep}/*.parquet')",
        f"read_parquet('{hp}/*.parquet')",
        t_max=3,
        log2m=4,
    )
    duck = {(r[0], r[1]): (r[2], r[3]) for r in duckdb.sql(sql).fetchall()}
    assert duck == want


def test_hyperball_monotone_and_convergence(spark):
    from pyspark.sql import functions as F

    from cli_p_spark.operators.graph import hyperball_from_hashes

    # path a->b->c: ball sizes 1,2,3 for a; converges at t=2 but t_max=5
    # still emits saturated rows for t=3..5 (fixed-point fill path)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    hdf = nodes.select("node", F.xxhash64("node").alias("h"))
    out = hyperball_from_hashes(edges, hdf, t_max=5, log2m=4)
    rows = out.collect()
    out.hyperball_cache.unpersist()
    got = {(r["node"], r["t"]): r["reg_sum"] for r in rows}
    assert len(got) == 3 * 6
    # reg_sum is non-increasing in t (registers only grow)
    for n in ("a", "b", "c"):
        for t in range(1, 6):
            assert got[(n, t)] <= got[(n, t - 1)]
    # saturation: everything frozen from t=2 on
    for n in ("a", "b", "c"):
        for t in range(3, 6):
            assert got[(n, t)] == got[(n, 2)]
    # c has no out-edges: its ball never grows
    assert got[("c", 5)] == got[("c", 0)]


def _py_kcore(e, k):
    """peel to fixpoint; return {node: degree_in_core}."""
    adj = defaultdict(set)
    for u, v in e:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    nodes = set(adj)
    while True:
        drop = {n for n in nodes if len(adj[n] & nodes) < k}
        if not drop:
            break
        nodes -= drop
    return {n: len(adj[n] & nodes) for n in nodes}


def test_kcore_triangle_with_tendril(spark):
    from cli_p_spark.operators.graph import k_core

    # triangle a-b-c plus a path c-d-e: 2-core = the triangle
    e = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(e, "src string, dst string")
    out = k_core(edges, k=2)
    got = {r["node"]: r["core_degree"] for r in out.collect()}
    out.kcore_cache.unpersist()
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_matches_python_and_duckdb(spark, tmp_path):
    import random

    import duckdb

    from cli_p_spark.operators.graph import k_core, k_core_sql

    rng = random.Random(229)
    e = list({(rng.randrange(30), rng.randrange(30)) for _ in range(70)})
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    p = str(tmp_path / "kcore_edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    for k in (2, 3, 4):
        out = k_core(edges, k=k)
        got = {r["node"]: r["core_degree"] for r in out.collect()}
        out.kcore_cache.unpersist()
        want = _py_kcore(e, k)
        assert got == want, k
        duck = dict(
            duckdb.sql(
                k_core_sql(f"read_parquet('{p}/*.parquet')", k=k, rounds=16)
            ).fetchall()
        )
        assert duck == want, k


def test_kcore_empty_core(spark):
    from cli_p_spark.operators.graph import k_core

    # a path has an empty 2-core
    e = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = spark.createDataFrame(e, "src string, dst string")
    out = k_core(edges, k=2)
    assert out.count() == 0
    out.kcore_cache.unpersist()


def test_comention_matches_python_and_duckdb(spark, tmp_path):
    import random

    import duckdb

    from cli_p_spark.operators.graph import comention_edges, comention_sql

    rng = random.Random(401)
    e = list(
        {(f"d{rng.randrange(40):02d}", f"e{rng.randrange(25):02d}")
         for _ in range(160)}
    )
    edges = spark.createDataFrame(e, "src string, dst string")
    p = str(tmp_path / "bip.parquet")
    edges.write.mode("overwrite").parquet(p)
    out = comention_edges(edges)
    got = sorted(
        (r["e1"], r["e2"], r["n_docs"]) for r in out.collect()
    )
    by_doc = defaultdict(set)
    for d, ent in e:
        by_doc[d].add(ent)
    cnt = defaultdict(int)
    for ents in by_doc.values():
        s = sorted(ents)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                cnt[(s[i], s[j])] += 1
    want = sorted((a, b, n) for (a, b), n in cnt.items())
    assert got == want
    duck = sorted(
        duckdb.sql(
            comention_sql(f"read_parquet('{p}/*.parquet')")
        ).fetchall()
    )
    assert duck == want


def test_comention_fanout_cap(spark):
    from cli_p_spark.operators.graph import comention_edges

    # hub doc with 5 entities is dropped at max_fanout=4
    e = [("hub", f"e{i}") for i in range(5)] + [("d1", "e0"), ("d1", "e1")]
    edges = spark.createDataFrame(e, "src string, dst string")
    out = comention_edges(edges, max_fanout=4)
    got = sorted((r["e1"], r["e2"], r["n_docs"]) for r in out.collect())
    assert got == [("e0", "e1", 1)]


def test_negative_tails_deterministic_and_never_true_tail(spark, tmp_path):
    import duckdb
    from pyspark.sql import functions as F

    from cli_p_spark.operators.graph import (
        negative_tails_from_hashes,
        negative_tails_sql,
    )

    edges = spark.createDataFrame(
        [(f"s{i}", f"t{i % 4}") for i in range(12)], "src string, dst string"
    )
    hashed = edges.select(
        "src", "dst", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("i")
    ).select("src", "dst", "i", F.xxhash64("src", "dst", "i").alias("h"))
    tails = edges.select(F.col("dst").alias("tail")).distinct()
    out = negative_tails_from_hashes(hashed, tails)
    rows = out.collect()
    assert len(rows) == 12 * 3
    tset = {r["tail"] for r in tails.collect()}
    for r in rows:
        assert r["neg_dst"] in tset and r["neg_dst"] != r["dst"]
    # deterministic: a second run is identical
    again = sorted(map(tuple, negative_tails_from_hashes(hashed, tails).collect()))
    assert again == sorted(map(tuple, rows))

    # python replication from the same hashes
    hs = hashed.collect()
    order = sorted(tset)
    n = len(order)
    want = sorted(
        (
            r["src"], r["dst"], r["i"],
            order[r["h"] % n]
            if order[r["h"] % n] != r["dst"]
            else order[(r["h"] % n + 1) % n],
        )
        for r in hs
    )
    assert sorted(map(tuple, rows)) == want

    hp = str(tmp_path / "negh.parquet")
    hashed.write.mode("overwrite").parquet(hp)
    duck = sorted(
        duckdb.sql(
            negative_tails_sql(
                f"read_parquet('{hp}/*.parquet')",
                f"SELECT DISTINCT dst AS tail FROM read_parquet('{hp}/*.parquet')",
            )
        ).fetchall()
    )
    assert duck == want


def test_negative_tails_rejects_single_candidate(spark):
    import pytest
    from pyspark.sql import functions as F

    from cli_p_spark.operators.graph import negative_tails_from_hashes

    edges = spark.createDataFrame([("a", "t0")], "src string, dst string")
    hashed = edges.select(
        "src", "dst", F.lit(1).alias("i"), F.xxhash64("src").alias("h")
    )
    tails = spark.createDataFrame([("t0",)], "tail string")
    with pytest.raises(ValueError):
        negative_tails_from_hashes(hashed, tails)


# --- local clustering coefficients ------------------------------------


def test_clustering_known_graphs(spark):
    from cli_p_spark.operators.graph import clustering_coefficients

    # triangle + pendant: 0-1, 1-2, 0-2, 2-3
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "src bigint, dst bigint"
    )
    out = clustering_coefficients(edges)
    got = {r["node"]: (r["degree"], r["n_tri"], r["lcc_micro"])
           for r in out.collect()}
    out.clustering_cache.unpersist()
    assert got[0] == (2, 1, 1_000_000)
    assert got[1] == (2, 1, 1_000_000)
    # node 2: degree 3, 1 triangle of 3 possible wedge closures
    assert got[2] == (3, 1, (2_000_000 * 1) // (3 * 2))
    assert got[3] == (1, 0, 0)


def test_clustering_matches_duckdb_twin(spark, tmp_path):
    import random

    import duckdb

    from cli_p_spark.operators.graph import (
        clustering_coefficients,
        clustering_sql,
    )

    rng = random.Random(23)
    e = list({(rng.randrange(25), rng.randrange(25)) for _ in range(90)})
    e = [(a, b) for a, b in e if a != b]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    p = str(tmp_path / "edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    out = clustering_coefficients(edges)
    got = sorted(tuple(r) for r in out.collect())
    out.clustering_cache.unpersist()
    sql = clustering_sql(f"read_parquet('{p}/*.parquet')")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


# --- bounded transitive closure ---------------------------------------


def test_closure_dag_chain(spark):
    from cli_p_spark.operators.graph import transitive_closure

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint"
    )
    out = transitive_closure(edges, max_depth=8)
    got = sorted(tuple(r) for r in out.collect())
    out.closure_cache.unpersist()
    assert got == [
        (0, 1, 1), (0, 2, 2), (0, 3, 3),
        (1, 2, 1), (1, 3, 2),
        (2, 3, 1),
    ]


def test_closure_cycle_self_pairs_and_depth_cap(spark):
    from cli_p_spark.operators.graph import transitive_closure

    # directed 3-cycle: every node reaches itself at dist 3
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src bigint, dst bigint"
    )
    out = transitive_closure(edges, max_depth=8)
    got = sorted(tuple(r) for r in out.collect())
    out.closure_cache.unpersist()
    assert (0, 0, 3) in got and (1, 1, 3) in got and (2, 2, 3) in got
    assert len(got) == 9  # full reachability on a cycle

    # depth cap binds: chain of 5 edges, cap 2 -> no dist-3+ facts
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src bigint, dst bigint"
    )
    out2 = transitive_closure(chain, max_depth=2)
    got2 = sorted(tuple(r) for r in out2.collect())
    out2.closure_cache.unpersist()
    assert max(d for _, _, d in got2) == 2
    assert (0, 3, 3) not in [tuple(r) for r in got2]


def test_closure_matches_duckdb_twin(spark, tmp_path):
    import random

    import duckdb

    from cli_p_spark.operators.graph import closure_sql, transitive_closure

    rng = random.Random(29)
    e = list({(rng.randrange(30), rng.randrange(30)) for _ in range(100)})
    e = [(a, b) for a, b in e if a != b]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    p = str(tmp_path / "edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    out = transitive_closure(edges, max_depth=5)
    got = sorted(tuple(r) for r in out.collect())
    out.closure_cache.unpersist()
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            closure_sql(f"read_parquet('{p}/*.parquet')", max_depth=5)
        ).fetchall()
    )
    assert got == want


# --- deterministic random walks ---------------------------------------


def test_walks_follow_edges_and_match_duckdb(spark, tmp_path):
    import collections
    import random

    import duckdb

    from cli_p_spark.operators.graph import (
        random_walks,
        walk_edge_keys,
        walks_sql,
    )

    rng = random.Random(31)
    e = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    e = [(a, b) for a, b in e if a != b]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    keyed = walk_edge_keys(edges, length=4)
    p = str(tmp_path / "keys.parquet")
    keyed.write.mode("overwrite").parquet(p)
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "node bigint")
    out = random_walks(spark.read.parquet(p), seeds, length=4)
    got = sorted(tuple(r) for r in out.collect())
    out.walks_cache.unpersist()
    sql = walks_sql(
        f"read_parquet('{p}/*.parquet')",
        "SELECT 0 AS node UNION ALL SELECT 1 UNION ALL SELECT 2",
        length=4,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
    # every consecutive step is a real edge; step 0 is the seed
    es = set(e)
    byw = collections.defaultdict(dict)
    for w, s, n in got:
        byw[w][s] = n
    for w, steps in byw.items():
        assert steps[0] == w
        for s in range(1, max(steps) + 1):
            assert (steps[s - 1], steps[s]) in es


def test_walks_dead_end_stops(spark, tmp_path):
    from cli_p_spark.operators.graph import random_walks, walk_edge_keys

    # 0 -> 1 -> 2, and 2 is a sink: the walk from 0 ends at step 2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2)], "src bigint, dst bigint"
    )
    keyed = walk_edge_keys(edges, length=6)
    p = str(tmp_path / "keys.parquet")
    keyed.write.mode("overwrite").parquet(p)
    seeds = spark.createDataFrame([(0,)], "node bigint")
    out = random_walks(spark.read.parquet(p), seeds, length=6)
    got = sorted(tuple(r) for r in out.collect())
    out.walks_cache.unpersist()
    assert got == [(0, 0, 0), (0, 1, 1), (0, 2, 2)]


# --- resource-allocation link prediction ------------------------------


def test_resource_allocation_square(spark):
    from cli_p_spark.operators.graph import (
        resource_allocation_link_prediction,
    )

    # 4-cycle 0-1-2-3: each diagonal pair shares two degree-2 neighbors
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src bigint, dst bigint"
    )
    out = resource_allocation_link_prediction(edges, min_common=2)
    got = sorted(tuple(r) for r in out.collect())
    out.ra_cache.unpersist()
    assert got == [
        (0, 2, 2, 2 * (10**9 // 2)),
        (1, 3, 2, 2 * (10**9 // 2)),
    ]


def test_resource_allocation_matches_duckdb_and_python(spark, tmp_path):
    import collections
    import itertools
    import random

    import duckdb

    from cli_p_spark.operators.graph import (
        resource_allocation_link_prediction,
        resource_allocation_sql,
    )

    rng = random.Random(43)
    e = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    e = [(a, b) for a, b in e if a != b]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    p = str(tmp_path / "edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    out = resource_allocation_link_prediction(edges, min_common=1)
    got = sorted(tuple(r) for r in out.collect())
    out.ra_cache.unpersist()
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            resource_allocation_sql(
                f"read_parquet('{p}/*.parquet')", min_common=1
            )
        ).fetchall()
    )
    assert got == want
    und = {(min(a, b), max(a, b)) for a, b in e}
    adj = collections.defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    brute = []
    for x, y in itertools.combinations(sorted(adj), 2):
        if (x, y) in und:
            continue
        common = adj[x] & adj[y]
        if common:
            brute.append(
                (x, y, len(common),
                 sum(10**9 // len(adj[z]) for z in common))
            )
    assert got == sorted(brute)


# --- rectangle (4-cycle) census ---------------------------------------


def test_rectangle_known_graphs(spark):
    from cli_p_spark.operators.graph import rectangle_count

    # one square -> 1; K4 -> 3; path of 4 -> 0
    square = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src bigint, dst bigint"
    )
    out = rectangle_count(square)
    assert out.collect()[0]["n_rectangles"] == 1
    out.rectangle_cache.unpersist()

    import itertools

    k4 = spark.createDataFrame(
        list(itertools.combinations(range(4), 2)), "src bigint, dst bigint"
    )
    out = rectangle_count(k4)
    assert out.collect()[0]["n_rectangles"] == 3
    out.rectangle_cache.unpersist()

    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint"
    )
    out = rectangle_count(path)
    assert out.collect()[0]["n_rectangles"] == 0
    out.rectangle_cache.unpersist()


def test_rectangle_matches_duckdb_and_enumeration(spark, tmp_path):
    import collections
    import random

    import duckdb

    from cli_p_spark.operators.graph import rectangle_count, rectangle_sql

    rng = random.Random(47)
    e = list({(rng.randrange(18), rng.randrange(18)) for _ in range(55)})
    e = [(a, b) for a, b in e if a != b]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    p = str(tmp_path / "edges.parquet")
    edges.write.mode("overwrite").parquet(p)
    out = rectangle_count(edges)
    row = tuple(out.collect()[0])
    out.rectangle_cache.unpersist()
    wrow = duckdb.sql(
        rectangle_sql(f"read_parquet('{p}/*.parquet')")
    ).fetchall()[0]
    assert row == tuple(wrow)
    # independent enumeration: each 4-cycle appears 8x as a closed walk
    und = {(min(a, b), max(a, b)) for a, b in e}
    adj = collections.defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    cnt = 0
    for a in adj:
        for b in adj[a]:
            for c in adj[b]:
                if c == a:
                    continue
                for d in adj[c]:
                    if d in (a, b):
                        continue
                    if a in adj[d]:
                        cnt += 1
    assert cnt % 8 == 0 and row[2] == cnt // 8
