"""Approximate neighborhood functions over the host graph: HyperBall.

"How many hosts are within t clicks of this host", for every host at
once, is the web-graph question behind harmonic centrality, effective
diameter and spid — the statistics Boldi & Vigna computed on
ClueWeb/Common Crawl-scale graphs with **HyperBall** ("HyperBall:
Counting the number of reachable nodes in huge graphs", 2013; building on
Palmer, Gibbons & Faloutsos's ANF, KDD 2002). Exact per-node ball sizes
need all-pairs reachability — quadratic state, hopeless at 10^9 hosts.
HyperBall keeps ONE HyperLogLog counter per node and uses the union
decomposition of balls,

    B(v, t) = {v}  ∪  ⋃_{(v,w) ∈ E} B(w, t-1)

which in register space is a max-merge: the round-t counter of v is the
register-wise max of its own round-(t-1) counter and its out-neighbors'.
Each round is therefore ONE equi-join of the register table with the edge
list plus ONE groupBy(node, register) max — linear dataflow, mergeable
state, the same materialized-rounds shape as pagerank/k_core. State is
O(nodes * 2^p) rows and registers only grow, so a one-row (count, sum)
scalar detects the fixpoint exactly.

Registers reuse the engine's oracle-reproducible HLL convention
(sketches.py: ``stable_hash60``, low p bits pick the register, 20-bit rho
window) so DuckDB reproduces every ball estimate bit-for-bit from an
unrolled reachability join.

Reference parity: the reference has no graph analytics at all (its
deep-crawl strategies score links per page, e.g.
deep_crawling/scorers.py); this module is part of the engine's
corpus-scale link-graph family (linkgraph.py) — centralities feed crawl
prioritization and spam demotion exactly like pagerank/trustrank.

Scale shape per round: the register table shuffles once on (node,
register) after a map-side max; the edge join is a plain equi-join that
AQE can skew-split; rounds are truncated via parquet (cluster-safe) or
eager localCheckpoint, never left as an unmaterialized 3x-fan-out plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import _W_BITS, hll_estimate_cols
from .urlops import stable_hash60

__all__ = [
    "hyperball",
    "harmonic_centrality",
    "neighborhood_function",
    "effective_diameter",
]


def _prep_edges(edges: DataFrame, src_col: str, dst_col: str,
                undirected: bool) -> DataFrame:
    e = (
        edges.select(F.col(src_col).cast("string").alias("src"),
                     F.col(dst_col).cast("string").alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
               & (F.col("src") != F.col("dst")))
    )
    if undirected:
        e = e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    return e.distinct()


def _init_registers(nodes: DataFrame, p: int) -> DataFrame:
    """Round-0 state: each node's ball is {itself} — exactly one
    (register, rho) row per node, from the shared 60-bit hash."""
    m = 1 << p
    h = stable_hash60(F.col("node"))
    w = F.shiftright(h, p).bitwiseAND(F.lit((1 << _W_BITS) - 1))
    rho = F.when(w == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS + 1) - F.length(F.conv(w, 10, 2)))
    return nodes.select(
        "node",
        h.bitwiseAND(F.lit(m - 1)).alias("register"),
        rho.alias("max_rho"),
    )


def _ball_estimates(state: DataFrame, p: int, t: int) -> DataFrame:
    agg = state.groupBy("node").agg(
        F.count(F.lit(1)).alias("_n_hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_s"),
    )
    return agg.select(
        "node", F.lit(t).alias("t"),
        hll_estimate_cols(F.col("_n_hit"), F.col("_s"), p)
        .alias("ball_est"),
    )


def hyperball(edges: DataFrame, src_col: str = "src", dst_col: str = "dst",
              p: int = 8, max_t: int = 10, undirected: bool = False,
              checkpoint_dir: str | None = None) -> DataFrame:
    """Per-node ball-size estimates |B(v, t)| for every t in 0..max_t.

    Returns (node string, t int, ball_est double) — max_t+1 rows per
    node. Balls follow OUT-edges (``undirected=True`` symmetrizes first,
    giving distance balls). When the graph's transitive closure is
    reached before max_t (registers stop changing — detected exactly by a
    one-row (count, sum) scalar since registers are monotone), iteration
    stops and the converged estimates are replicated for the remaining t:
    mathematically B(v, t) = B(v, c) for all t >= c, so callers (and the
    SQL oracle, which unrolls a fixed number of rounds) always see the
    full 0..max_t range.

    Rounds are materialized (parquet under ``checkpoint_dir`` —
    cluster-safe, survives executor loss — or eager localCheckpoint
    otherwise): round t's state references round t-1 three times (itself
    plus the join and the merge), so an open plan would fan out 3^t."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    if max_t < 0:
        raise ValueError(f"max_t must be >= 0, got {max_t}")
    spark = edges.sparkSession
    e = _prep_edges(edges, src_col, dst_col, undirected)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = _init_registers(nodes, p)
    # per-round ball estimates are RETAINED (the output is all rounds);
    # with parquet rounds the state files alternate hb_0/hb_1 and get
    # overwritten, so a lazily-kept estimate plan over an old state path
    # would read round t+2's bytes — append each round's O(nodes)-row
    # estimates to a balls table as they are produced instead
    balls_dir = (os.path.join(checkpoint_dir, "balls")
                 if checkpoint_dir is not None else None)

    def _emit(est: DataFrame) -> DataFrame:
        if balls_dir is not None:
            est.write.mode("append").parquet(balls_dir)
            return None  # re-read once at the end
        return est

    rounds = [_emit(_ball_estimates(state, p, 0))]
    prev_sig = None
    converged_at = None
    for t in range(1, max_t + 1):
        contrib = (
            e.join(state, e["dst"] == state["node"])
            .select(F.col("src").alias("node"), "register", "max_rho")
        )
        state = (
            state.unionByName(contrib)
            .groupBy("node", "register")
            .agg(F.max("max_rho").alias("max_rho"))
        )
        if checkpoint_dir is not None:
            out = os.path.join(checkpoint_dir, f"hb_{t % 2}")
            state.write.mode("overwrite").parquet(out)
            state = spark.read.parquet(out)
        else:
            state = state.localCheckpoint(eager=True)
        # registers are monotone (rows only appear, max_rho only grows),
        # so an unchanged (row count, rho sum) pair IS the fixpoint —
        # one driver scalar per round, same budget as pagerank's rounds
        sig_row = state.agg(
            F.count(F.lit(1)).alias("c"), F.sum("max_rho").alias("s")
        ).collect()[0]
        sig = (sig_row["c"], sig_row["s"])
        rounds.append(_emit(_ball_estimates(state, p, t)))
        if sig == prev_sig:
            converged_at = t
            break
        prev_sig = sig
    if converged_at is not None and converged_at < max_t:
        final = _ball_estimates(state, p, converged_at)
        for t in range(converged_at + 1, max_t + 1):
            rounds.append(_emit(final.withColumn("t", F.lit(t))))
    if balls_dir is not None:
        return spark.read.parquet(balls_dir)
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out


def harmonic_centrality(balls: DataFrame) -> DataFrame:
    """Harmonic centrality from hyperball output: h(v) = sum over t >= 1
    of (|B(v,t)| - |B(v,t-1)|) / t — each node at distance t contributes
    1/t, approximated through the ball-size deltas (Boldi & Vigna's
    centrality loop). Deltas are floored at 0: register state is
    monotone, but the estimator's raw/linear-counting branch switch can
    dip a hair between rounds.

    One window lag per node over max_t+1 rows — the shuffle is by node,
    the partition is the (tiny) round axis. Returns (node, harmonic,
    ball_final)."""
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy("t")
    d = balls.withColumn("_prev", F.lag("ball_est").over(w))
    terms = d.select(
        "node", "t", "ball_est",
        F.when(
            F.col("_prev").isNotNull(),
            F.greatest(F.lit(0.0), F.col("ball_est") - F.col("_prev"))
            / F.col("t").cast("double"),
        ).otherwise(F.lit(0.0)).alias("_term"),
    )
    return terms.groupBy("node").agg(
        F.sum("_term").alias("harmonic"),
        F.max_by("ball_est", "t").alias("ball_final"),
    )


def neighborhood_function(balls: DataFrame) -> DataFrame:
    """ANF's N(t): estimated number of reachable (source, target) pairs
    within distance t — the sum of ball sizes per round. Returns
    (t, n_pairs_est), max_t+1 rows."""
    return (
        balls.groupBy("t").agg(F.sum("ball_est").alias("n_pairs_est"))
        .orderBy("t")
    )


def effective_diameter(nf: DataFrame, q: float = 0.9) -> DataFrame:
    """Effective diameter at quantile q from a neighborhood function:
    the (interpolated) smallest t such that N(t) >= q * N(max_t) — the
    standard ANF/HyperBall statistic ("90% of connected pairs are within
    D_eff hops"). Linear interpolation between the bracketing rounds,
    per the ANF paper. One row (effective_diameter, q, n_pairs_final);
    the input is max_t+1 rows, so every step here is driver-trivial."""
    if not 0 < q <= 1:
        raise ValueError(f"q must be in (0, 1], got {q}")
    from pyspark.sql import Window

    w = Window.orderBy("t")
    total = nf.agg(F.max_by("n_pairs_est", "t").alias("_total"))
    marked = (
        nf.crossJoin(F.broadcast(total))
        .withColumn("_target", F.lit(float(q)) * F.col("_total"))
        .withColumn("_prev", F.lag("n_pairs_est").over(w))
        .withColumn("_prev_t", F.lag("t").over(w))
        .where(F.col("n_pairs_est") >= F.col("_target"))
        .orderBy("t")
        .limit(1)
    )
    interp = F.when(
        F.col("_prev").isNotNull() & (F.col("n_pairs_est") > F.col("_prev")),
        F.col("_prev_t").cast("double")
        + (F.col("_target") - F.col("_prev"))
        / (F.col("n_pairs_est") - F.col("_prev")),
    ).otherwise(F.col("t").cast("double"))
    return marked.select(
        F.greatest(F.lit(0.0), interp).alias("effective_diameter"),
        F.lit(float(q)).alias("q"),
        F.col("_total").alias("n_pairs_final"),
    )
