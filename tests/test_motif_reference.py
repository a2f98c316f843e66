"""Differential tests for the GraphFrame adapter's motif find() and
bfs(): seeded random digraphs, results compared against brute-force
Python reference enumerations (multiset equality), so the join-compiled
implementations are pinned to the DSL semantics rather than to
hand-picked examples. Random but SEEDED -- failures reproduce exactly.
"""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest

from modelorecomendacion_analisisspark_streaming_mas_spark.graph.graphframe import (
    GraphFrame,
)

_EDGE_RE = re.compile(r"^(!?)\((\w*)\)-\[(\w*)\]->\((\w*)\)$")
_VERT_RE = re.compile(r"^\((\w*)\)$")


def _ref_find(vertex_ids, edges, pattern):
    """Brute-force motif matcher: returns a Counter of tuples, one entry
    per named element in first-appearance order (vertex -> id, edge ->
    (src, dst, idx) so parallel anonymous expansions keep multiplicity)."""
    terms = []
    for t in (x.strip() for x in pattern.split(";") if x.strip()):
        m = _EDGE_RE.match(t)
        if m:
            neg, a, e, b = m.groups()
            terms.append(("edge", bool(neg), a or None, e or None, b or None))
        else:
            terms.append(("vertex", _VERT_RE.match(t).group(1) or None))
    order = []
    for term in terms:
        if term[0] == "edge":
            _, _, a, e, b = term
            for kind, name in (("v", a), ("e", e), ("v", b)):
                if name and (kind, name) not in order:
                    order.append((kind, name))
        elif term[1] and ("v", term[1]) not in order:
            order.append(("v", term[1]))
    rows = [{}]
    for term in terms:
        if term[0] != "edge" or term[1]:
            continue
        _, _, a, e, b = term
        new = []
        for asg in rows:
            for idx, (s, d) in enumerate(edges):
                if a is not None and a in asg and asg[a] != s:
                    continue
                if b is not None and b in asg and asg[b] != d:
                    continue
                if a is not None and a == b and s != d:
                    continue
                if e is not None and ("e", e) in asg and asg[("e", e)] != (s, d, idx):
                    continue  # repeated edge name: must be the SAME element
                    # (idx included: a parallel same-endpoint edge is a
                    # different element on multigraphs)
                na = dict(asg)
                if a is not None:
                    na[a] = s
                if b is not None:
                    na[b] = d
                if e is not None:
                    na[("e", e)] = (s, d, idx)
                else:
                    na[("anon", len(na), idx)] = idx  # keep multiplicity
                new.append(na)
        rows = new
    for term in terms:
        if term[0] != "vertex" or term[1] is None:
            continue
        name = term[1]
        new = []
        for asg in rows:
            if name in asg:
                new.append(asg)
            else:
                for vid in vertex_ids:
                    na = dict(asg)
                    na[name] = vid
                    new.append(na)
        rows = new
    edge_set = set(edges)
    for term in terms:
        if term[0] == "edge" and term[1]:
            _, _, a, _e, b = term
            rows = [asg for asg in rows if (asg[a], asg[b]) not in edge_set]
    out = Counter()
    for asg in rows:
        key = tuple(
            asg[name] if kind == "v" else asg[("e", name)][:2]
            for kind, name in order
        )
        out[key] += 1
    return order, out


def _spark_find_counter(res, order):
    out = Counter()
    for row in res.collect():
        key = []
        for kind, name in order:
            cell = row[name]
            key.append(cell["id"] if kind == "v" else (cell["src"], cell["dst"]))
        out[tuple(key)] += 1
    return out


def _random_graph(seed, n=8, m=14, self_loops=False):
    rng = random.Random(seed)
    ids = [f"v{i}" for i in range(n)]
    pool = [(a, b) for a in ids for b in ids if self_loops or a != b]
    edges = rng.sample(pool, min(m, len(pool)))
    return ids, edges


_PATTERNS = [
    "(a)-[e]->(b)",
    "(a)-[e1]->(b); (b)-[e2]->(c)",
    "(a)-[e1]->(b); (a)-[e2]->(c)",
    "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)",
    "(a)-[e1]->(b); (b)-[e2]->(c); !(c)-[]->(a)",
    "(a)-[]->(b); (a)-[]->(c); (b)-[]->(d); (c)-[]->(d)",
    "(a)-[]->()",
    "(a)-[e]->(a)",
    "(s); (a)-[]->(b); !(s)-[]->(b)",
    "(a)-[e]->(b); (c)-[e]->(d)",
    "(a)-[e]->(b); (a)-[e]->(c)",
    "(a)-[e]->(b); (b)-[e]->(c)",
]


@pytest.mark.parametrize("seed", [11, 22])
def test_find_matches_bruteforce_reference(spark, seed):
    ids, edges = _random_graph(seed, self_loops=(seed % 2 == 0))
    v = spark.createDataFrame([(i,) for i in ids], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    g = GraphFrame(v, e)
    for pattern in _PATTERNS:
        order, want = _ref_find(ids, edges, pattern)
        got = _spark_find_counter(g.find(pattern), order)
        assert got == want, f"pattern {pattern!r} seed {seed}"


@pytest.mark.parametrize("seed", [7, 13])
def test_find_matches_bruteforce_on_multigraphs(spark, seed):
    """Parallel same-endpoint edges are DISTINCT elements: a repeated
    edge name must match only the element itself, never a parallel twin
    ((src, dst)-only unification would square the multiplicity). Edges
    are sampled WITH replacement so parallels occur, and the repeated-
    name patterns assert a count >= 2 somewhere so the multigraph case
    is actually exercised, not vacuously green."""
    rng = random.Random(seed)
    ids = [f"v{i}" for i in range(5)]
    edges = [
        (rng.choice(ids), rng.choice(ids)) for _ in range(12)
    ]  # with replacement: parallel edges likely...
    # ...but plant guaranteed multiplicity anyway: a parallel copy of an
    # existing edge, and TWO parallel self-loops (the (b)-[e]->(c) chain
    # pattern forces a self-loop element, so only a duplicated self-loop
    # can multiply its counts)
    edges += [edges[0], (ids[0], ids[0]), (ids[0], ids[0])]
    assert len(set(edges)) < len(edges), "no parallel edge present"
    v = spark.createDataFrame([(i,) for i in ids], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    g = GraphFrame(v, e)
    repeated = {
        "(a)-[e]->(b); (c)-[e]->(d)",
        "(a)-[e]->(b); (a)-[e]->(c)",
        "(a)-[e]->(b); (b)-[e]->(c)",
    }
    for pattern in _PATTERNS:
        order, want = _ref_find(ids, edges, pattern)
        if pattern in repeated:
            # non-vacuous: some parallel pair actually multiplies counts
            assert any(c >= 2 for c in want.values()), (pattern, seed)
        got = _spark_find_counter(g.find(pattern), order)
        assert got == want, f"pattern {pattern!r} seed {seed}"


def _ref_bfs(edges, srcs, tgts, maxlen=10):
    both = sorted(srcs & tgts)
    if both:
        return Counter((s, s) for s in both)
    paths = [[s] for s in sorted(srcs)]
    for _ in range(maxlen):
        paths = [p + [d] for p in paths for (s, d) in edges if s == p[-1]]
        hits = [tuple(p) for p in paths if p[-1] in tgts]
        if hits:
            return Counter(hits)
        if not paths:
            break
    return Counter()


@pytest.mark.parametrize("seed", [5, 17, 31])
def test_bfs_matches_bruteforce_reference(spark, seed):
    ids, edges = _random_graph(seed, n=9, m=16)
    v = spark.createDataFrame([(i,) for i in ids], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    g = GraphFrame(v, e)
    rng = random.Random(seed * 7)
    srcs = set(rng.sample(ids, 2))
    tgts = set(rng.sample(ids, 2))
    src_expr = "id in ({})".format(",".join(f"'{s}'" for s in sorted(srcs)))
    tgt_expr = "id in ({})".format(",".join(f"'{t}'" for t in sorted(tgts)))
    want = _ref_bfs(edges, srcs, tgts)
    res = g.bfs(src_expr, tgt_expr)
    got = Counter()
    for row in res.collect():
        vs = [row["from"]["id"]]
        i = 1
        while f"v{i}" in res.columns:
            vs.append(row[f"v{i}"]["id"])
            i += 1
        if "to" in res.columns and row["from"]["id"] != row["to"]["id"] or len(res.columns) > 2:
            vs.append(row["to"]["id"])
        elif row["from"]["id"] == row["to"]["id"] and len(res.columns) == 2:
            vs = [row["from"]["id"], row["to"]["id"]]
        got[tuple(vs)] += 1
    assert got == want, f"seed {seed}: {got} != {want}"
