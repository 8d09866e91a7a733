"""HyperBall / ANF tests: ball estimates vs an exact local replay
(BFS balls + md5 register replication + the estimator formula, float
identity), convergence replication, undirected symmetrization, harmonic
centrality and effective diameter closed forms."""

import hashlib
import math

import pytest


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _register(s: str, p: int = 8):
    h = _h60(s)
    w = (h >> p) & ((1 << 20) - 1)
    rho = 21 if w == 0 else 21 - w.bit_length()
    return h & ((1 << p) - 1), rho


def _estimate(members, p: int = 8) -> float:
    m = 1 << p
    regs: dict[int, int] = {}
    for node in members:
        r, rho = _register(node, p)
        regs[r] = max(regs.get(r, 0), rho)
    s = sum(2.0 ** -rho for rho in regs.values())
    zeros = m - len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / (s + float(zeros))
    if raw <= 2.5 * m and zeros > 0:
        return float(m) * math.log(float(m) / zeros)
    return raw


def _balls(edges, nodes, t):
    """Exact out-balls by t rounds of the union decomposition."""
    ball = {v: {v} for v in nodes}
    for _ in range(t):
        ball = {
            v: ball[v].union(*[ball[w] for (u, w) in edges if u == v])
            for v in nodes
        }
    return ball


def test_hyperball_matches_exact_replay(spark):
    """On a 12-node directed graph the per-(node, t) estimates equal the
    formula applied to the EXACT ball membership — float identity, since
    both sides use the same md5 hash and dyadic register sum."""
    from crawl4ai_custom_spark.operators.anf import hyperball

    nodes = [f"h{i}" for i in range(12)]
    edges = [(f"h{i}", f"h{(i * 5 + 1) % 12}") for i in range(12)] + \
            [(f"h{i}", f"h{(i + 3) % 12}") for i in range(0, 12, 2)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")

    out = hyperball(df, p=8, max_t=3)
    got = {(r["node"], r["t"]): r["ball_est"] for r in out.collect()}
    assert len(got) == 12 * 4
    for t in range(4):
        exact = _balls(edges, nodes, t)
        for v in nodes:
            assert got[(v, t)] == pytest.approx(
                _estimate(exact[v]), abs=0.0), (v, t)


def test_hyperball_convergence_replicates_tail_rounds(spark):
    """A 4-node cycle closes its transitive closure at t=3; with
    max_t=8 the t=4..8 rows exist and equal the t=3 estimates."""
    from crawl4ai_custom_spark.operators.anf import hyperball

    cyc = [(f"c{i}", f"c{(i + 1) % 4}") for i in range(4)]
    out = hyperball(spark.createDataFrame(cyc, "src string, dst string"),
                    p=8, max_t=8)
    got = {(r["node"], r["t"]): r["ball_est"] for r in out.collect()}
    assert len(got) == 4 * 9
    for i in range(4):
        v = f"c{i}"
        final = got[(v, 3)]
        for t in range(4, 9):
            assert got[(v, t)] == final


def test_hyperball_undirected_symmetrizes(spark):
    """Directed chain a->b->c: a's out-ball reaches c but c's reaches
    nothing; undirected=True gives every node the full 3-node ball by
    t=2."""
    from crawl4ai_custom_spark.operators.anf import hyperball

    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string")
    d = {(r["node"], r["t"]): r["ball_est"]
         for r in hyperball(chain, p=8, max_t=2).collect()}
    assert d[("c", 2)] == pytest.approx(_estimate({"c"}), abs=0.0)
    assert d[("a", 2)] == pytest.approx(_estimate({"a", "b", "c"}), abs=0.0)
    u = {(r["node"], r["t"]): r["ball_est"]
         for r in hyperball(chain, p=8, max_t=2,
                            undirected=True).collect()}
    full = _estimate({"a", "b", "c"})
    for v in "abc":
        assert u[(v, 2)] == pytest.approx(full, abs=0.0)


def test_harmonic_centrality_and_diameter_closed_form(spark):
    """Undirected 5-path: the center has the highest harmonic centrality
    (all nodes within 2 hops), the endpoints the lowest; the neighborhood
    function is monotone and the interpolated effective diameter lands
    inside (0, max_t]."""
    from crawl4ai_custom_spark.operators.anf import (
        effective_diameter,
        harmonic_centrality,
        hyperball,
        neighborhood_function,
    )

    path = spark.createDataFrame(
        [(f"p{i}", f"p{i+1}") for i in range(4)], "src string, dst string")
    balls = hyperball(path, p=8, max_t=4, undirected=True)
    h = {r["node"]: r["harmonic"]
         for r in harmonic_centrality(balls).collect()}
    assert len(h) == 5
    # closed form from the exact ball estimates (deltas / t)
    adj = [(f"p{i}", f"p{i+1}") for i in range(4)]
    und = adj + [(b, a) for a, b in adj]
    for v in [f"p{i}" for i in range(5)]:
        exact_prev = _estimate({v})
        want = 0.0
        for t in range(1, 5):
            ball = _balls(und, [f"p{i}" for i in range(5)], t)[v]
            est = _estimate(ball)
            want += max(0.0, est - exact_prev) / t
            exact_prev = est
        assert h[v] == pytest.approx(want, rel=1e-12), v
    assert h["p2"] == max(h.values())
    assert min(h) in ("p0", "p4")

    nf = neighborhood_function(balls).collect()
    vals = [r["n_pairs_est"] for r in sorted(nf, key=lambda r: r["t"])]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    ed = effective_diameter(neighborhood_function(balls), q=0.9).collect()[0]
    assert 0.0 < ed["effective_diameter"] <= 4.0
    assert ed["n_pairs_final"] == pytest.approx(vals[-1])


def test_hyperball_checkpoint_dir_equals_in_memory(spark, tmp_path):
    """Parquet-materialized rounds (cluster path: state alternates two
    files, per-round estimates append to a balls table) return exactly
    the in-memory localCheckpoint result — including replicated
    post-convergence rounds."""
    from crawl4ai_custom_spark.operators.anf import hyperball

    edges = [(f"h{i}", f"h{(i * 5 + 1) % 12}") for i in range(12)]
    df = spark.createDataFrame(edges, "src string, dst string")
    mem = {(r["node"], r["t"]): r["ball_est"]
           for r in hyperball(df, p=8, max_t=6).collect()}
    ck = {(r["node"], r["t"]): r["ball_est"]
          for r in hyperball(df, p=8, max_t=6,
                             checkpoint_dir=str(tmp_path / "hb")).collect()}
    assert mem == ck


def test_hyperball_input_validation(spark):
    from crawl4ai_custom_spark.operators.anf import (
        effective_diameter,
        hyperball,
    )

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        hyperball(df, p=3)
    with pytest.raises(ValueError):
        hyperball(df, max_t=-1)
    with pytest.raises(ValueError):
        effective_diameter(df, q=0.0)
