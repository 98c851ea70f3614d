"""Integer-lattice PageRank: agreement with an independent driver-side
replication on a known graph, dangling-mass handling, determinism."""

from __future__ import annotations

from nyc_taxi_data_warehouse_spark.operators import graph


def _pagerank_ref(edges, n_iter=3, scale=10**9):
    """Pure-Python replication of the lattice algorithm."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    r = {v: int(scale // n) for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for s, d, w in edges:
            contrib[d] += int(r[s] * w // outw[s])
        dang = sum(r[v] for v in nodes if v not in outw)
        tele = 15 * scale // (100 * n)
        r = {
            v: tele + (85 * (contrib[v] + dang // n)) // 100
            for v in nodes
        }
    return r


EDGES = [
    (1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 5),
    (2, 4, 1), (4, 5, 2),  # 5 is dangling
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst", "w"])
    got = {r["node"]: r["rank"] for r in graph.pagerank_int(df, n_iter=3).collect()}
    assert got == _pagerank_ref(EDGES, n_iter=3)


def test_deterministic_across_runs(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst", "w"]).repartition(7)
    a = sorted(map(tuple, graph.pagerank_int(df, n_iter=2).collect()))
    b = sorted(map(tuple, graph.pagerank_int(df, n_iter=2).collect()))
    assert a == b


def test_popular_node_ranks_highest(spark):
    # everything points at node 9
    edges = [(i, 9, 1) for i in range(1, 9)] + [(9, 1, 1)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r["node"]: r["rank"] for r in graph.pagerank_int(df, n_iter=3).collect()}
    assert max(got, key=got.get) == 9


def test_triangle_counts_known_graph(spark):
    """K4 minus one edge: triangles {1,2,3} and {1,2,4} — nodes 1,2 in
    two triangles, 3,4 in one. Directed dups/loops collapse first."""
    edges = [(1, 2, 1), (2, 1, 1), (2, 3, 1), (3, 1, 1), (1, 4, 1),
             (4, 2, 1), (3, 3, 1)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r["node"]: r["n_triangles"]
           for r in graph.triangle_counts(df).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_free_graph_empty(spark):
    df = spark.createDataFrame([(1, 2, 1), (2, 3, 1), (3, 4, 1)],
                               ["src", "dst", "w"])
    assert graph.triangle_counts(df).count() == 0


def test_bfs_hops_matches_networkx_free_reference(spark):
    """Hand-built graph with a 2-component topology: hop counts must
    match the textbook BFS, and the second component stays unreached."""
    from nyc_taxi_data_warehouse_spark.operators import graph
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4), (4, 1), (8, 9)],
        ["src", "dst"],
    )
    src = spark.createDataFrame([(1,)], ["node"])
    got = {r.node: r.hops for r in graph.bfs_hops(edges, src).collect()}
    assert got == {1: 0, 2: 1, 5: 1, 3: 2, 4: 2}


def test_bfs_hops_multi_source_takes_nearest(spark):
    from nyc_taxi_data_warehouse_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 3)], ["src", "dst"]
    )
    src = spark.createDataFrame([(1,), (10,)], ["node"])
    got = {r.node: r.hops for r in graph.bfs_hops(edges, src).collect()}
    assert got == {1: 0, 10: 0, 2: 1, 3: 1}  # 3 via 10, not via 1->2->3
