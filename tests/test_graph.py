"""Behavioral invariants for the iterative graph operators (queries/graph.py).

The DuckDB oracle (tests/test_queries_oracle.py) pins cross-engine value
equality; these tests pin the SEMANTICS — properties that would survive a
consistently-wrong implementation of both sides.
"""

from __future__ import annotations

from flink_net_spark.queries import QUERIES
from flink_net_spark.queries.graph import (
    PAGERANK_TELEPORT_E6,
    PAGERANK_TOPK,
)
from tests.conftest import SF_DIR


def test_pagerank_invariants(spark):
    rows = QUERIES["graph_pagerank"](spark, SF_DIR).collect()
    assert len(rows) == PAGERANK_TOPK
    # Every rank carries at least the teleport mass, and the fixed-point
    # iteration must produce a discriminating ordering (not a constant).
    ranks = [r["rank_e6"] for r in rows]
    assert all(v >= PAGERANK_TELEPORT_E6 for v in ranks)
    assert len(set(ranks)) > 1
    assert ranks == sorted(ranks, reverse=True)
    # Bipartite sanity: both node kinds exist in the graph output and keys
    # decode back to plausible TPC-H key ranges (suppliers are the dense
    # side at every SF, so the top of the ranking is supplier-heavy).
    kinds = {r["kind"] for r in rows}
    assert "supplier" in kinds
    assert all(r["deg"] >= 1 and r["key"] >= 0 for r in rows)


def test_pagerank_rank_tracks_degree(spark):
    """Power iteration on an undirected graph converges toward ranks
    proportional to degree — the #1-ranked node must sit in the top decile
    of the degree distribution (a catch-all against e.g. swapped join keys
    sending rank mass to the wrong side)."""
    rows = QUERIES["graph_pagerank"](spark, SF_DIR).collect()
    top = rows[0]
    degs = sorted(r["deg"] for r in rows)
    assert top["deg"] >= degs[len(degs) // 2]


def test_triangle_count_matches_handbuilt_graph(spark):
    """Triangle totals across buckets must equal the exact triangle count
    of the co-order graph computed independently in Python (networkx-free
    adjacency-set intersection) at sf0.001."""
    from flink_net_spark.tables import load_table, release_persisted

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order: dict = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], set()).add(int(r["l_partkey"]))
    adj: dict = {}
    for ps in by_order.values():
        ps = sorted(ps)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    expected = sum(
        len(adj[u] & adj[v])
        for u in adj
        for v in adj[u]
        if u < v
    ) // 3  # each triangle counted once per edge (3x)
    df = QUERIES["graph_triangle_count"](spark, sf)
    rows = df.collect()
    release_persisted(df)
    assert sum(r["n_tri"] for r in rows) == expected


def test_bfs_levels_match_handbuilt_bfs(spark):
    """Per-level node sets must equal an independent Python BFS over the
    same bipartite adjacency at sf0.001 — catches off-by-one-hop and
    visited-set bugs that a consistently-wrong oracle pair would share."""
    from flink_net_spark.queries.graph import BFS_HOPS, BFS_SEED_MOD
    from flink_net_spark.tables import load_table, release_persisted

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey").collect()
    adj: dict = {}
    for r in li:
        p, s = int(r["l_partkey"]) * 2, int(r["l_suppkey"]) * 2 + 1
        adj.setdefault(p, set()).add(s)
        adj.setdefault(s, set()).add(p)
    frontier = {n for n in adj if n % 2 == 0 and (n // 2) % BFS_SEED_MOD == 1}
    assert frontier, "fixture must produce at least one seed"
    visited = dict.fromkeys(frontier, 0)
    for lvl in range(1, BFS_HOPS + 1):
        frontier = {
            m for n in frontier for m in adj[n] if m not in visited
        }
        for m in frontier:
            visited[m] = lvl
    expected = {}
    for n, lvl in visited.items():
        kind = "part" if n % 2 == 0 else "supplier"
        st = expected.setdefault((lvl, kind), [0, 0])
        st[0] += 1
        st[1] += n // 2
    df = QUERIES["graph_bfs_levels"](spark, sf)
    rows = df.collect()
    release_persisted(df)
    got = {(r["lvl"], r["kind"]): [r["n_nodes"], r["sum_key"]] for r in rows}
    assert got == expected
    # bipartite parity: even levels are parts, odd levels suppliers
    for (lvl, kind) in got:
        assert kind == ("part" if lvl % 2 == 0 else "supplier")


def test_connected_components_match_union_find(spark):
    """The component-size histogram must equal an independent union-find
    over the same filtered bipartite edge set at sf0.001, and the final
    round must report ZERO label movement (the convergence audit column)."""
    from collections import Counter

    from flink_net_spark.queries.graph import CC_EDGE_FILTER
    from flink_net_spark.tables import load_table, release_persisted

    sf = "/root/testdata/sf0.001"
    li = (
        load_table(spark, sf, "lineitem")
        .filter(CC_EDGE_FILTER)
        .select("l_partkey", "l_suppkey")
        .collect()
    )
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in li:
        p, s = int(r["l_partkey"]) * 2, int(r["l_suppkey"]) * 2 + 1
        parent[find(p)] = find(s)
    comps = Counter(find(x) for x in parent)
    expected_hist = Counter(comps.values())  # size -> n_components
    assert len(comps) > 1, "fixture must produce a multi-component forest"

    df = QUERIES["graph_connected_components"](spark, sf)
    rows = df.collect()
    release_persisted(df)
    got_hist = {r["size"]: r["n_components"] for r in rows}
    assert got_hist == dict(expected_hist)
    assert all(r["n_unconverged"] == 0 for r in rows), "label prop not converged"
    # every component's label is its min node id, so per-size label sums
    # must match the union-find's min-id sums
    min_ids: dict = {}
    for x in parent:
        root = find(x)
        min_ids[root] = min(min_ids.get(root, x), x)
    exp_sums: dict = {}
    for root, size in comps.items():
        exp_sums[size] = exp_sums.get(size, 0) + min_ids[root]
    got_sums = {r["size"]: r["sum_label"] for r in rows}
    assert got_sums == exp_sums


def test_personalized_pagerank_support_is_bfs_ball(spark):
    """PPR mass after K iterations must live exactly on the ≤K-hop ball of
    the seed set (integer arithmetic: unreached rank is exactly 0), seeds
    must carry teleport mass, and non-seed mass must be strictly below the
    seeds' floor at hop-adjacent degree scales."""
    from flink_net_spark.queries.graph import (
        PPR_ITERS,
        PPR_SEED_MOD,
    )
    from flink_net_spark.tables import load_table, release_persisted

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey").collect()
    adj: dict = {}
    for r in li:
        p, s = int(r["l_partkey"]) * 2, int(r["l_suppkey"]) * 2 + 1
        adj.setdefault(p, set()).add(s)
        adj.setdefault(s, set()).add(p)
    frontier = {n for n in adj if n % 2 == 0 and (n // 2) % PPR_SEED_MOD == 1}
    ball = set(frontier)
    for _ in range(PPR_ITERS):
        frontier = {m for n in frontier for m in adj[n]}
        ball |= frontier
    df = QUERIES["graph_personalized_pagerank"](spark, sf)
    rows = df.collect()
    release_persisted(df)
    assert rows, "seeded mass must reach at least the seeds"
    got_nodes = {
        r["key"] * 2 + (0 if r["kind"] == "part" else 1) for r in rows
    }
    assert got_nodes <= ball, "rank mass escaped the K-hop ball"
    seeds = [r for r in rows if r["is_seed"]]
    assert seeds and all(r["rank_e6"] >= 150_000 for r in seeds)
    ranks = [r["rank_e6"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_sssp_weighted_matches_dijkstra(spark):
    """graph_sssp_weighted's per-(kind, decile) histogram must equal an
    independent Dijkstra over the same weighted edge set at sf0.001 —
    Bellman-Ford at SSSP_HOPS rounds can only UNDER-relax (report a longer
    distance or miss a node), so agreement with full Dijkstra RESTRICTED
    to the <=SSSP_HOPS-hop ball plus a zero n_improved_last audit proves
    both the relaxation and the hop bound."""
    import heapq
    from collections import defaultdict

    from flink_net_spark.queries.graph import SSSP_HOPS, SSSP_SEED_MOD
    from flink_net_spark.tables import load_table, release_persisted

    sf = "/root/testdata/sf0.001"
    li = (
        load_table(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
        .collect()
    )
    w: dict = {}
    for r in li:
        a, b = int(r["l_partkey"]) * 2, int(r["l_suppkey"]) * 2 + 1
        q = int(r["l_quantity"])
        if (a, b) not in w or q < w[(a, b)]:
            w[(a, b)] = q
    adj = defaultdict(list)
    for (a, b), q in w.items():
        adj[a].append((b, q))
        adj[b].append((a, q))
    seeds = [n for n in adj if n % 2 == 0 and (n // 2) % SSSP_SEED_MOD == 1]
    assert seeds, "fixture must contain seed nodes"
    # Dijkstra with hop tracking: keep the best (dist, hops<=H) label per
    # node — a node can be reachable at hops<=H only via a longer path, so
    # track the min dist among paths of <= SSSP_HOPS edges (exactly what
    # H rounds of Bellman-Ford compute).
    best = {n: {} for n in adj}  # node -> {hops: dist}
    pq = [(0, 0, s) for s in seeds]
    dist_h: dict = {}
    for s in seeds:
        dist_h[(s, 0)] = 0
    while pq:
        d, h, n = heapq.heappop(pq)
        if dist_h.get((n, h), 1 << 60) < d or h >= SSSP_HOPS:
            continue
        for m, q in adj[n]:
            nd, nh = d + q, h + 1
            if nd < dist_h.get((m, nh), 1 << 60):
                dist_h[(m, nh)] = nd
                heapq.heappush(pq, (nd, nh, m))
    final: dict = {}
    for (n, h), d in dist_h.items():
        if d < final.get(n, 1 << 60):
            final[n] = d
    exp: dict = {}
    for n, d in final.items():
        k = ("part" if n % 2 == 0 else "supplier", d // 10)
        c, sd, sk = exp.get(k, (0, 0, 0))
        exp[k] = (c + 1, sd + d, sk + n // 2)

    df = QUERIES["graph_sssp_weighted"](spark, sf)
    rows = df.collect()
    release_persisted(df)
    got = {
        (r["kind"], r["dist_bucket"]): (r["n_nodes"], r["sum_dist"], r["sum_key"])
        for r in rows
    }
    assert got == exp
    assert all(r["n_improved_last"] == 0 for r in rows), "not converged"


def test_kcore_matches_independent_peeling(spark):
    """graph_kcore must equal an independent Python peel to fixpoint at
    sf0.001 (full fixpoint, no round bound — so agreement plus a zero
    n_removed_last audit proves KCORE_ROUNDS suffices), including the
    in-core degree sums."""
    from collections import defaultdict

    from flink_net_spark.queries.graph import KCORE_EDGE_FILTER, KCORE_K
    from flink_net_spark.tables import load_table, release_persisted

    sf = "/root/testdata/sf0.001"
    li = (
        load_table(spark, sf, "lineitem")
        .filter(KCORE_EDGE_FILTER)
        .select("l_partkey", "l_suppkey")
        .collect()
    )
    adj = defaultdict(set)
    for r in li:
        a, b = int(r["l_partkey"]) * 2, int(r["l_suppkey"]) * 2 + 1
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    while True:
        dead = {
            n for n in alive if sum(1 for m in adj[n] if m in alive) < KCORE_K
        }
        if not dead:
            break
        alive -= dead
    assert alive, "fixture must leave a non-trivial core"
    exp: dict = {}
    for n in alive:
        k = "part" if n % 2 == 0 else "supplier"
        deg = sum(1 for m in adj[n] if m in alive)
        c, sk, sd, mx = exp.get(k, (0, 0, 0, 0))
        exp[k] = (c + 1, sk + n // 2, sd + deg, max(mx, deg))

    df = QUERIES["graph_kcore"](spark, sf)
    rows = df.collect()
    release_persisted(df)
    got = {
        r["kind"]: (r["n_nodes"], r["sum_key"], r["sum_core_deg"], r["max_core_deg"])
        for r in rows
    }
    assert got == exp
    assert all(r["n_removed_last"] == 0 for r in rows), "peeling not converged"


def test_lpa_matches_independent_propagation(spark):
    """graph_lpa_communities must equal an independent Python
    color-alternating LPA run to FULL fixpoint at sf0.001 (no round bound
    — so agreement plus a zero n_changed_last audit proves LPA_ROUNDS
    suffices), including the label-sum checksum and community sizes."""
    from collections import Counter, defaultdict

    from flink_net_spark.queries.graph import LPA_EDGE_FILTER
    from flink_net_spark.tables import load_table, release_persisted

    sf = "/root/testdata/sf0.001"
    li = (
        load_table(spark, sf, "lineitem")
        .filter(LPA_EDGE_FILTER)
        .select("l_partkey", "l_suppkey")
        .collect()
    )
    adj = defaultdict(set)
    for r in li:
        a, b = int(r["l_partkey"]) * 2, int(r["l_suppkey"]) * 2 + 1
        adj[a].add(b)
        adj[b].add(a)
    lbl = {n: n for n in adj}
    while True:
        changed = False
        for color in (0, 1):
            votes = {
                v: Counter(lbl[m] for m in adj[v])
                for v in adj
                if v % 2 == color
            }
            for v, c in votes.items():
                mx = max(c.values())
                new = min(l for l, n in c.items() if n == mx)
                if new != lbl[v]:
                    lbl[v] = new
                    changed = True
        if not changed:
            break
    sizes = Counter(lbl.values())
    exp: dict = {}
    for n, l in lbl.items():
        k = "part" if n % 2 == 0 else "supplier"
        c, labs, sk, mx = exp.get(k, (0, set(), 0, 0))
        exp[k] = (c + 1, labs | {l}, sk + l // 2, max(mx, sizes[l]))
    exp = {k: (c, len(labs), sk, mx) for k, (c, labs, sk, mx) in exp.items()}

    df = QUERIES["graph_lpa_communities"](spark, sf)
    rows = df.collect()
    release_persisted(df)
    got = {
        r["kind"]: (
            r["n_nodes"], r["n_communities"], r["sum_label_key"],
            r["max_comm_size"],
        )
        for r in rows
    }
    assert got == exp
    assert all(r["n_changed_last"] == 0 for r in rows), "LPA not converged"


def test_msf_boruvka_matches_kruskal(spark):
    """graph_msf_boruvka must equal an independent Kruskal union-find run
    under the SAME total edge order (w, lo, hi) at sf0.001 — with a total
    order the MSF is unique, so the whole forest (edge count, weight, and
    both endpoint checksums per weight bucket) must match, and the
    n_cross_last audit must read 0 (fully contracted)."""
    from flink_net_spark.queries.graph import MSF_EDGE_FILTER
    from flink_net_spark.tables import load_table, release_persisted

    sf = "/root/testdata/sf0.001"
    li = (
        load_table(spark, sf, "lineitem")
        .filter(MSF_EDGE_FILTER)
        .select("l_partkey", "l_suppkey", "l_quantity")
        .collect()
    )
    wmap: dict = {}
    for r in li:
        a, b = int(r["l_partkey"]) * 2, int(r["l_suppkey"]) * 2 + 1
        mu, mx = min(a, b), max(a, b)
        w = int(r["l_quantity"])
        if (mu, mx) not in wmap or w < wmap[(mu, mx)]:
            wmap[(mu, mx)] = w
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    exp: dict = {}
    for w, mu, mx in sorted((w, mu, mx) for (mu, mx), w in wmap.items()):
        ra, rb = find(mu), find(mx)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            k = w // 5
            n, sw, lo, hi = exp.get(k, (0, 0, 0, 0))
            exp[k] = (n + 1, sw + w, lo + mu // 2, hi + mx // 2)
    n_comp = len({find(x) for x in {n for e in wmap for n in e}})

    df = QUERIES["graph_msf_boruvka"](spark, sf)
    rows = df.collect()
    release_persisted(df)
    got = {
        r["w_bucket"]: (r["n_edges"], r["sum_w"], r["sum_lo_key"], r["sum_hi_key"])
        for r in rows
    }
    assert got == exp
    assert all(r["n_cross_last"] == 0 for r in rows), "Boruvka not contracted"
    assert all(r["n_components"] == n_comp for r in rows)
