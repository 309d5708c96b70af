"""pagerank_fixed: integer fixed-point PageRank over edge lists."""


def _pr_ref(edges, iters, scale=2**30, dn=85, dd=100):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    n = len(nodes)
    base = ((dd - dn) * scale // dd) // n
    pr = {v: scale // n for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += pr[u] // out[u]
        pr = {v: base + (dn * s[v]) // dd for v in nodes}
    return pr


def test_pagerank_fixed_matches_reference_and_ranks_hub(spark):
    from data_cube_utilities_spark.operators import graph

    # a hub (0) cited by everyone, a chain, parallel edges, a dangler
    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (1, 2), (2, 3),
             (5, 1), (5, 1), (0, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r for r in graph.pagerank_fixed(df, iters=5).collect()}
    ref = _pr_ref(edges, 5)
    assert {k: v.pr for k, v in out.items()} == ref
    # the hub outranks all its contributors (6, fed the hub's whole
    # mass, legitimately ranks even higher)
    assert all(out[0].pr >= out[k].pr for k in (1, 2, 3, 4, 5))
    # degrees faithful, incl. parallel-edge multiplicity and the sink
    assert out[1].in_deg == 2 and out[1].out_deg == 2
    assert out[6].out_deg == 0 and out[6].in_deg == 1

    # determinism across parallelism: same ranks from a 1-partition run
    one = {r.node: r.pr for r in graph.pagerank_fixed(
        df.coalesce(1), iters=5).collect()}
    assert one == {k: v.pr for k, v in out.items()}
