"""GraphFrame drop-in adapter: the reference notebook's graphframes code
(GraphFrames_prueba/Explorativa3.ipynb cells 2-17) must port verbatim --
same construction, same surface, same column names -- with results agreeing
with the package's oracle-verified algorithms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modelorecomendacion_analisisspark_streaming_mas_spark.graph.graphframe import (
    GraphFrame,
)


def _bipartite(spark):
    """The notebook's user/movie bipartite shape (cells 3+12): vertices
    carry a 'tipo' attribute; edges carry a rating weight. Users are
    u1..u4, movies m1..m3."""
    users = [("u1",), ("u2",), ("u3",), ("u4",)]
    movies = [("m1",), ("m2",), ("m3",)]
    v = spark.createDataFrame(
        [(u, "user") for (u,) in users] + [(m, "movie") for (m,) in movies],
        "id string, tipo string",
    )
    ratings = [
        ("u1", "m1", 5.0),
        ("u1", "m2", 3.0),
        ("u2", "m1", 4.0),
        ("u3", "m2", 2.0),
        ("u3", "m3", 4.0),
        ("u4", "m3", 1.0),
    ]
    e = spark.createDataFrame(ratings, "src string, dst string, weight double")
    return GraphFrame(v, e)


def test_notebook_cell2_construction_and_accessors(spark):
    # cell 2 verbatim: v/e frames in, .vertices/.edges back out
    v = spark.createDataFrame([(1,), (2,)], ["id"])
    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    g = GraphFrame(v, e)
    assert g.vertices.collect() == v.collect()
    assert g.edges.collect() == e.collect()
    # contract violations fail loudly at construction
    with pytest.raises(ValueError, match="id"):
        GraphFrame(v.withColumnRenamed("id", "vid"), e)
    with pytest.raises(ValueError, match="dst"):
        GraphFrame(v, e.withColumnRenamed("dst", "to"))


def test_notebook_cells7_11_degrees(spark):
    g = _bipartite(spark)
    # cells 7-11: inDegrees/outDegrees filtered to one id
    in_m1 = g.inDegrees.filter(F.col("id") == "m1").collect()
    assert in_m1 == [("m1", 2)] or (in_m1[0]["id"], in_m1[0]["inDegree"]) == ("m1", 2)
    out_u1 = g.outDegrees.filter(F.col("id") == "u1").collect()
    assert (out_u1[0]["id"], out_u1[0]["outDegree"]) == ("u1", 2)
    # zero-degree vertices are omitted, matching the library
    iso = spark.createDataFrame([("z", "user")], "id string, tipo string")
    g2 = GraphFrame(g.vertices.unionByName(iso), g.edges)
    assert g2.inDegrees.filter(F.col("id") == "z").count() == 0
    assert g2.degrees.filter(F.col("id") == "z").count() == 0
    # degrees = in + out
    deg = {r["id"]: r["degree"] for r in g.degrees.collect()}
    assert deg["u1"] == 2 and deg["m1"] == 2 and deg["m3"] == 2


def test_notebook_cell12_pagerank_pipeline(spark):
    """Cell 12 verbatim: pageRank(resetProbability=0.15, maxIter=10),
    then filter vertices by tipo and order by pagerank -- the result
    GraphFrame must carry every vertex attribute plus `pagerank`, and
    agree with algorithms.pagerank."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.graph.algorithms import (
        pagerank,
    )

    g = _bipartite(spark)
    pr = g.pageRank(resetProbability=0.15, maxIter=10)
    top_movies = (
        pr.vertices.filter("tipo='movie'")
        .select("id", "pagerank")
        .orderBy(F.desc("pagerank"))
    )
    rows = top_movies.collect()
    assert [r["id"] for r in rows[:1]] and len(rows) == 3
    want = {
        r["id"]: r["pagerank"]
        for r in pagerank(
            g.vertices.select("id"), g.edges, reset_prob=0.15, max_iter=10
        ).collect()
    }
    for r in pr.vertices.collect():
        assert abs(r["pagerank"] - want[r["id"]]) < 1e-12
    # result edges carry the src-normalized weight, library-style
    w = {(r["src"], r["dst"]): r["weight"] for r in pr.edges.collect()}
    assert abs(w[("u1", "m1")] - 0.5) < 1e-12  # u1 has outDegree 2


def test_pagerank_weight_col_extension(spark):
    g = _bipartite(spark)
    pr = g.pageRank(resetProbability=0.15, maxIter=10, weightCol="weight")
    # u1's mass splits 5:3 between m1 and m2 instead of evenly
    w = {(r["src"], r["dst"]): r["weight"] for r in pr.edges.collect()}
    assert abs(w[("u1", "m1")] - 5.0 / 8.0) < 1e-12
    assert abs(w[("u1", "m2")] - 3.0 / 8.0) < 1e-12
    # weightCol is this adapter's extension: it does not compose with the
    # library's sourceId/tol modes and must say so loudly
    with pytest.raises(ValueError):
        g.pageRank(maxIter=5, weightCol="weight", sourceId="u1")
    with pytest.raises(ValueError):
        g.pageRank(tol=0.01, weightCol="weight")


def test_notebook_cells15_17_connected_components(spark):
    """Cells 15-17: connectedComponents() -> per-component sizes and a
    (component, tipo) breakdown. The bipartite graph is one big component
    plus an isolated vertex that must be its own component."""
    g = _bipartite(spark)
    iso = spark.createDataFrame([("z9", "user")], "id string, tipo string")
    g2 = GraphFrame(g.vertices.unionByName(iso), g.edges)
    cc = g2.connectedComponents()
    assert set(cc.columns) == {"id", "tipo", "component"}
    sizes = cc.groupBy("component").count().orderBy(F.desc("count"))
    top = sizes.first()
    assert top["count"] == 7 and top["component"] == "m1"  # smallest member id
    assert cc.filter(F.col("id") == "z9").first()["component"] == "z9"
    by_tipo = {
        (r["component"], r["tipo"]): r["count"]
        for r in cc.groupBy("component", "tipo").count().collect()
    }
    assert by_tipo[("m1", "user")] == 4 and by_tipo[("m1", "movie")] == 3


def test_label_propagation_deterministic_communities(spark):
    """Two planted cliques joined by one bridge edge: LPA must separate
    them, keep isolated vertices as their own label, and be deterministic
    across runs (the pinned tie-break)."""
    ids = ["a1", "a2", "a3", "b1", "b2", "b3", "lone"]
    v = spark.createDataFrame([(i,) for i in ids], "id string")
    pairs = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a3", "b1"),
    ]
    e = spark.createDataFrame(pairs, "src string, dst string")
    g = GraphFrame(v, e)
    r1 = {r["id"]: r["label"] for r in g.labelPropagation(maxIter=5).collect()}
    r2 = {r["id"]: r["label"] for r in g.labelPropagation(maxIter=5).collect()}
    assert r1 == r2, "pinned tie-break must make LPA deterministic"
    assert r1["a1"] == r1["a2"] == r1["a3"]
    assert r1["b1"] == r1["b2"] == r1["b3"]
    assert r1["lone"] == "lone"


def test_triangle_count_includes_zero_vertices(spark):
    v = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "id string")
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], "src string, dst string"
    )
    got = {r["id"]: r["count"] for r in GraphFrame(v, e).triangleCount().collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "d": 0}


def test_shortest_paths_map_semantics(spark):
    # path a-b-c-d plus island e: unreachable landmarks are omitted from
    # the map (library semantics), reachable ones carry hop counts
    v = spark.createDataFrame([(x,) for x in "abcde"], "id string")
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    sp = GraphFrame(v, e).shortestPaths(landmarks=["a", "e"])
    got = {r["id"]: dict(r["distances"]) for r in sp.collect()}
    assert got["d"] == {"a": 3}
    assert got["a"] == {"a": 0}
    assert got["e"] == {"e": 0}


def test_subgraph_helpers(spark):
    g = _bipartite(spark)
    sub = g.filterEdges(F.col("weight") >= 4.0).dropIsolatedVertices()
    assert set(r["id"] for r in sub.vertices.collect()) == {"u1", "u2", "u3", "m1", "m3"}
    only_users = g.filterVertices("tipo = 'user'")
    assert only_users.edges.count() == 0  # all edges cross the partition


def _triangle_graph(spark):
    """a->b->c->a cycle plus pendant c->d: every motif class exercised."""
    v = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", "z"), ("d", "w")], "id string, attr string"
    )
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 3.0), ("c", "d", 4.0)],
        "src string, dst string, w double",
    )
    return GraphFrame(v, e)


def test_find_single_edge_structs(spark):
    g = _triangle_graph(spark)
    res = g.find("(a)-[e]->(b)")
    assert res.columns == ["a", "e", "b"]  # first-appearance order
    rows = {(r["a"]["id"], r["e"]["w"], r["b"]["id"]) for r in res.collect()}
    assert rows == {("a", 1.0, "b"), ("b", 2.0, "c"), ("c", 3.0, "a"), ("c", 4.0, "d")}
    # vertex structs carry ALL vertex columns, edge structs all edge columns
    first = res.first()
    assert set(first["a"].asDict()) == {"id", "attr"}
    assert set(first["e"].asDict()) == {"src", "dst", "w"}


def test_find_two_edge_chain_unifies_shared_vertex(spark):
    g = _triangle_graph(spark)
    res = g.find("(a)-[e1]->(b); (b)-[e2]->(c)")
    got = sorted((r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in res.collect())
    assert got == [("a", "b", "c"), ("b", "c", "a"), ("b", "c", "d"), ("c", "a", "b")]


def test_find_triangle_motif_returns_all_rotations(spark):
    g = _triangle_graph(spark)
    res = g.find("(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)")
    got = sorted((r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in res.collect())
    assert got == [("a", "b", "c"), ("b", "c", "a"), ("c", "a", "b")]


def test_find_negated_edge(spark):
    g = _triangle_graph(spark)
    res = g.find("(a)-[]->(b); (b)-[]->(c); !(c)-[]->(a)")
    got = [(r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in res.collect()]
    assert got == [("b", "c", "d")]  # only the open wedge survives


def test_find_anonymous_and_vertex_only_terms(spark):
    g = _triangle_graph(spark)
    assert g.find("(a)-[]->()").columns == ["a"]
    assert g.find("(a)-[]->()").count() == 4  # one row per out-edge
    assert sorted(r["s"]["id"] for r in g.find("(s)").collect()) == list("abcd")


def test_find_struct_field_filters_compose(spark):
    g = _triangle_graph(spark)
    res = g.find("(a)-[e1]->(b); (b)-[e2]->(c)").filter(
        F.col("a.id") != F.col("c.id")
    )
    got = sorted((r["a"]["id"], r["c"]["id"]) for r in res.collect())
    assert got == [("a", "c"), ("b", "a"), ("b", "d"), ("c", "b")]


def test_find_repeated_edge_name_unifies(spark):
    """A reused edge name is an equality constraint on (src, dst): the
    two occurrences must be the same edge (library semantics)."""
    g = _triangle_graph(spark)
    res = g.find("(a)-[e]->(b); (c)-[e]->(d)")
    assert res.columns == ["a", "e", "b", "c", "d"]
    rows = {
        (r["a"]["id"], r["b"]["id"], r["c"]["id"], r["d"]["id"])
        for r in res.collect()
    }
    # c/d are forced equal to a/b through the shared edge
    assert rows == {("a", "b", "a", "b"), ("b", "c", "b", "c"),
                    ("c", "a", "c", "a"), ("c", "d", "c", "d")}
    # chained reuse demands a self-loop; the triangle graph has none
    assert g.find("(a)-[e]->(b); (b)-[e]->(c)").count() == 0


def test_find_loud_errors(spark):
    g = _triangle_graph(spark)
    with pytest.raises(ValueError, match="binds no elements"):
        g.find("()")  # anonymous-only pattern binds nothing
    with pytest.raises(ValueError):
        g.find("!(a)-[e]->(b)")  # negated term with a named edge
    with pytest.raises(ValueError):
        g.find("(a)-[]->(b); !(a)-[]->(x)")  # negated endpoint never bound
    with pytest.raises(ValueError):
        g.find("(a)-[e]=>(b)")  # unparseable term
    with pytest.raises(ValueError):
        g.find("  ")  # empty pattern


def test_shortest_paths_dotted_and_duplicate_landmarks(spark):
    # landmark values containing dots must not break column resolution,
    # and duplicate landmarks must not create ambiguous columns
    v = spark.createDataFrame([("a.1",), ("b.2",), ("c.3",)], "id string")
    e = spark.createDataFrame([("a.1", "b.2"), ("b.2", "c.3")], "src string, dst string")
    sp = GraphFrame(v, e).shortestPaths(landmarks=["a.1", "a.1", "c.3"])
    got = {r["id"]: dict(r["distances"]) for r in sp.collect()}
    assert got["b.2"] == {"a.1": 1, "c.3": 1}
    assert got["c.3"] == {"a.1": 2, "c.3": 0}


def test_personalized_pagerank_source_dominates(spark):
    g = _triangle_graph(spark)
    pr = g.pageRank(resetProbability=0.15, maxIter=10, sourceId="a")
    ranks = {r["id"]: r["pagerank"] for r in pr.vertices.collect()}
    # reset mass teleports only to the source: the source outranks every
    # non-source, and mass decays with distance from it
    assert ranks["a"] == max(ranks.values())
    assert ranks["b"] > ranks["d"]  # b is 1 hop from a, d is 2+
    # vertices the walk never reaches have rank exactly 0 (no static floor)
    v2 = spark.createDataFrame([("a",), ("b",), ("x",)], "id string")
    e2 = spark.createDataFrame([("a", "b")], "src string, dst string")
    pr2 = GraphFrame(v2, e2).pageRank(resetProbability=0.15, maxIter=5, sourceId="a")
    assert {r["id"]: r["pagerank"] for r in pr2.vertices.collect()}["x"] == 0.0


def test_tol_mode_pagerank_matches_long_fixed_run(spark):
    g = _triangle_graph(spark)
    tol_v = {
        r["id"]: r["pagerank"]
        for r in g.pageRank(resetProbability=0.15, tol=1e-9).vertices.collect()
    }
    fixed_v = {
        r["id"]: r["pagerank"]
        for r in g.pageRank(resetProbability=0.15, maxIter=80).vertices.collect()
    }
    for k in fixed_v:
        assert abs(tol_v[k] - fixed_v[k]) < 1e-7


def test_pagerank_mode_errors(spark):
    g = _triangle_graph(spark)
    with pytest.raises(ValueError):
        g.pageRank(resetProbability=0.15)  # neither maxIter nor tol
    with pytest.raises(ValueError):
        g.pageRank(resetProbability=0.15, maxIter=5, weightCol="w", sourceId="a")


def _bfs_graph(spark):
    v = spark.createDataFrame([(x, "n" + x) for x in "abcdef"], "id string, name string")
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"), ("b", "e")],
        "src string, dst string",
    )
    return GraphFrame(v, e)


def test_bfs_returns_only_shortest_paths(spark):
    g = _bfs_graph(spark)
    r = g.bfs("id = 'a'", "id = 'e'")
    assert r.columns == ["from", "e0", "v1", "e1", "to"]
    paths = [(row["from"]["id"], row["v1"]["id"], row["to"]["id"]) for row in r.collect()]
    assert paths == [("a", "b", "e")]  # the length-3 a-c-d-e path is excluded


def test_bfs_level_zero_and_unreachable(spark):
    g = _bfs_graph(spark)
    self_hit = g.bfs("id = 'a'", "id = 'a'")
    assert self_hit.columns == ["from", "to"]
    row = self_hit.first()
    assert row["from"]["id"] == row["to"]["id"] == "a"
    none = g.bfs("id = 'e'", "id = 'a'")  # e has no out-edges
    assert none.columns == ["from", "to"] and none.count() == 0


def test_bfs_edge_filter_reroutes(spark):
    g = _bfs_graph(spark)
    r = g.bfs("id = 'a'", "id = 'e'", edgeFilter="dst != 'b'")
    rows = r.collect()
    assert len(rows) == 1 and len(r.columns) == 7  # a-c-d-e, length 3
    assert [rows[0][c]["id"] for c in ("from", "v1", "v2", "to")] == list("acde")


def test_bfs_multiple_shortest_paths_counted(spark):
    # diamond: two equal-length paths a->b->d / a->c->d
    v = spark.createDataFrame([(x,) for x in "abcd"], "id string")
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")], "src string, dst string"
    )
    r = GraphFrame(v, e).bfs("id = 'a'", "id = 'd'")
    mids = sorted(row["v1"]["id"] for row in r.collect())
    assert mids == ["b", "c"]


# -- r9 surface completion: triplets / aggregateMessages / SCC / cache ----


def test_triplets_shape_and_content(spark):
    g = _triangle_graph(spark)
    trip = g.triplets
    assert trip.columns == ["src", "edge", "dst"]
    rows = {
        (r["src"]["id"], r["edge"]["w"], r["dst"]["id"], r["dst"]["attr"])
        for r in trip.collect()
    }
    assert rows == {
        ("a", 1.0, "b", "y"),
        ("b", 2.0, "c", "z"),
        ("c", 3.0, "a", "x"),
        ("c", 4.0, "d", "w"),
    }
    # endpoint absent from the vertex frame -> edge dropped (library)
    g2 = GraphFrame(
        g.vertices.filter("id != 'd'"),
        g.edges,
    )
    assert g2.triplets.count() == 3


def test_aggregate_messages_matches_direct_computation(spark):
    from modelorecomendacion_analisisspark_streaming_mas_spark.graph.graphframe import (
        AggregateMessages as AM,
    )

    g = _triangle_graph(spark)
    # sum of incoming edge weights per vertex == a direct groupBy
    got = {
        r["id"]: r["in_w"]
        for r in g.aggregateMessages(
            F.sum(AM.msg).alias("in_w"), sendToDst=AM.edge["w"]
        ).collect()
    }
    want = {
        r["dst"]: r["w"]
        for r in g.edges.groupBy("dst").agg(F.sum("w").alias("w")).collect()
    }
    assert got == want
    # bidirectional: count of messages == degree
    deg = {
        r["id"]: r["n"]
        for r in g.aggregateMessages(
            F.count(AM.msg).alias("n"), sendToSrc=F.lit(1), sendToDst=F.lit(1)
        ).collect()
    }
    assert deg == {r["id"]: r["degree"] for r in g.degrees.collect()}
    # neighbor-attr access through the struct handles
    mx = {
        r["id"]: r["m"]
        for r in g.aggregateMessages(
            F.max(AM.msg).alias("m"), sendToSrc=AM.dst["attr"]
        ).collect()
    }
    assert mx == {"a": "y", "b": "z", "c": "x"}  # d sends nothing
    with pytest.raises(ValueError):
        g.aggregateMessages(F.count(AM.msg).alias("n"))


def _tarjan_scc(vertices, edges):
    """Iterative Tarjan: vertex -> smallest id of its SCC."""
    adj = {v: [] for v in vertices}
    for s, d in edges:
        adj[s].append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]
    for root in vertices:
        if root in index:
            continue
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                label = min(members)
                for m in members:
                    comp[m] = label
    return comp


@pytest.mark.parametrize("seed", [3, 14, 27])
def test_scc_matches_tarjan_on_random_digraphs(spark, seed):
    import random

    rng = random.Random(seed)
    n = rng.randint(6, 10)
    ids = [f"v{i}" for i in range(n)]
    pool = [(a, b) for a in ids for b in ids if a != b]
    edges = rng.sample(pool, rng.randint(n, 2 * n))
    want = _tarjan_scc(ids, edges)
    v = spark.createDataFrame([(i,) for i in ids], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["id"]: r["component"]
        for r in GraphFrame(v, e).stronglyConnectedComponents(maxIter=10).collect()
    }
    assert got == want, (edges, got, want)


def test_scc_planted_structures(spark):
    # two 2-cycles bridged by a one-way edge + an isolated vertex + chain
    v = spark.createDataFrame([(c,) for c in "abcdefg"], "id string")
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("b", "c"),
         ("e", "f")],
        "src string, dst string",
    )
    got = {
        r["id"]: r["component"]
        for r in GraphFrame(v, e).stronglyConnectedComponents(maxIter=8).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c",
                   "e": "e", "f": "f", "g": "g"}
    # non-convergence is loud, not silent: a long chain with maxIter=1
    # still converges via trimming, so force the coloring path with a
    # nested cycle structure and maxIter=0
    with pytest.raises(ValueError):
        GraphFrame(v, e).stronglyConnectedComponents(maxIter=0)


def test_cache_persist_chain(spark):
    g = _triangle_graph(spark).cache()
    assert g.vertices.is_cached and g.edges.is_cached
    assert g.triangleCount().count() == 4
    g.unpersist()
    assert not g.vertices.is_cached and not g.edges.is_cached


def test_parallel_personalized_pagerank_matches_single_source_runs(spark):
    """parallelPersonalizedPageRank must equal k independent
    pageRank(sourceId=...) runs entry-by-entry (same recurrence, jointly
    iterated), return an ml DenseVector in sourceIds order, and give
    exactly 0 mass to vertices the walks never reach."""
    v2 = spark.createDataFrame([(x,) for x in "abcdx"], "id string")
    e2 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], "src string, dst string"
    )
    g = GraphFrame(v2, e2)
    sources = ["a", "c"]
    ppr = g.parallelPersonalizedPageRank(
        resetProbability=0.15, sourceIds=sources, maxIter=8
    )
    got = {r["id"]: r["pageranks"] for r in ppr.vertices.collect()}
    for j, s in enumerate(sources):
        single = {
            r["id"]: r["pagerank"]
            for r in g.pageRank(
                resetProbability=0.15, maxIter=8, sourceId=s
            ).vertices.collect()
        }
        for vid, vec in got.items():
            assert abs(vec[j] - single[vid]) < 1e-12, (s, vid)
    # isolated vertex x: zero mass from every source
    assert list(got["x"]) == [0.0, 0.0]
    # edges carry the src-normalized weight like the other modes
    w = {(r["src"], r["dst"]): r["weight"] for r in ppr.edges.collect()}
    assert abs(w[("c", "a")] - 0.5) < 1e-12
    with pytest.raises(ValueError):
        g.parallelPersonalizedPageRank(sourceIds=[], maxIter=5)
    with pytest.raises(ValueError):
        g.parallelPersonalizedPageRank(sourceIds=["a"])


def test_scc_self_loops_and_denser_graph(spark):
    # self-loops must not merge anything (a self-loop vertex is its own
    # SCC unless a real cycle includes it), and a denser random graph
    # exercises multi-round peeling
    import random

    rng = random.Random(99)
    n = 12
    ids = [f"v{i}" for i in range(n)]
    pool = [(a, b) for a in ids for b in ids]  # self-loops included
    edges = rng.sample(pool, 30)
    want = _tarjan_scc(ids, [(a, b) for a, b in edges if a != b])
    v = spark.createDataFrame([(i,) for i in ids], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["id"]: r["component"]
        for r in GraphFrame(v, e).stronglyConnectedComponents(maxIter=12).collect()
    }
    assert got == want


def test_parallel_personalized_pagerank_absent_source(spark):
    # a sourceId absent from the graph contributes a column of zeros
    # (no indicator ever matches), mirroring single-source semantics
    v = spark.createDataFrame([("a",), ("b",)], "id string")
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    ppr = GraphFrame(v, e).parallelPersonalizedPageRank(
        sourceIds=["a", "zz"], maxIter=4
    )
    got = {r["id"]: list(r["pageranks"]) for r in ppr.vertices.collect()}
    assert all(vec[1] == 0.0 for vec in got.values())
    assert got["a"][0] > 0.0 and got["b"][0] > 0.0
