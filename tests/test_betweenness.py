"""G2 edge betweenness: distributed multi-source Brandes vs an exact
pure-Python oracle, plus the reference's remove-top-k clustering."""

import math
from collections import defaultdict, deque

from citykg.ops.graph import edge_betweenness, edge_betweenness_clusters

# two triangles joined by one bridge (the classic betweenness shape)
EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d")]


def brandes_oracle(edge_list):
    adj = defaultdict(set)
    for u, v in edge_list:
        adj[u].add(v)
        adj[v].add(u)
    eb = defaultdict(float)
    for s in adj:
        dist = {s: 0}
        sigma = {s: 1.0}
        preds = defaultdict(list)
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                c = sigma[v] / sigma[w] * (1.0 + delta[w])
                eb[tuple(sorted((v, w)))] += c
                delta[v] += c
    return {k: v / 2.0 for k, v in eb.items()}


def test_edge_betweenness_exact(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {(r.src, r.dst): r.betweenness for r in edge_betweenness(df).collect()}
    want = brandes_oracle(EDGES)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), (k, got[k], want[k])
    # the bridge carries every cross-triangle pair
    assert max(got, key=got.get) == ("c", "d")


def test_edge_betweenness_sampled_sources(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        (r.src, r.dst): r.betweenness
        for r in edge_betweenness(df, sources=["a", "e"]).collect()
    }
    # bridge still dominates under a source sample
    assert max(got, key=got.get) == ("c", "d")


def test_edge_betweenness_clusters(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    out = edge_betweenness_clusters(df, n_remove=1).collect()
    clusters = defaultdict(set)
    for r in out:
        clusters[r.cluster].add(r.id)
    assert sorted(map(sorted, clusters.values())) == [["a", "b", "c"], ["d", "e", "f"]]


def test_triangles_exact_and_oriented(spark):
    """K4 has exactly 4 triangles; a star hub has none until a closing
    edge arrives; duplicate/reversed input edges don't double-count; the
    plan has no cartesian product."""
    from citykg.ops.graph import triangles

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    star = [("hub", f"s{i}") for i in range(6)]
    edges = spark.createDataFrame(
        k4 + [(b, a) for a, b in k4] + star, "src string, dst string"
    )
    got = {(r.x, r.y, r.z) for r in triangles(edges).collect()}
    assert got == {("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"), ("b", "c", "d")}

    closed = edges.union(spark.createDataFrame([("s0", "s1")], "src string, dst string"))
    got2 = {(r.x, r.y, r.z) for r in triangles(closed).collect()}
    assert got2 == got | {("hub", "s0", "s1")}

    plan = triangles(edges)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
