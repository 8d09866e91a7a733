"""Mergeable cardinality sketches: HyperLogLog over URL-scale keys.

At a 10^10-URL frontier, "how many distinct URLs / hosts / fingerprints"
is itself a scale problem: exact countDistinct is a full shuffle of every
key, and the engine needs the number per wave, per host and per epoch
(reference parity: the reference keeps exact Python sets for its seen/
stats counts, e.g. deep_crawling/bff_strategy.py visited sets — viable in
one process, not at corpus scale; the engine's parquet-footer counts in
operators/frontier.py:82 cover the SEEN table but not ad-hoc "distinct of
this derived column" questions).

HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007) answers all of them
with m = 2^p bytes of state that MERGE by register-max — across
partitions, across epochs, across stores — so per-wave sketches append
like the seen deltas and never rescan history. Spark ships HLL++ as
``approx_count_distinct``, but its registers are opaque JVM state: they
cannot be stored as a table, merged incrementally across epoch boundaries,
or verified against an external oracle. This implementation keeps the
registers as PLAIN ROWS (register, max_rho) built from the engine's
oracle-reproducible ``stable_hash60`` with pure bitwise arithmetic, so
DuckDB reproduces every register (and the estimate) bit-for-bit — the
same portability contract as the minhash/simhash family in dedup.py.

Layout of the 60-bit hash: low ``p`` bits pick the register, the next 20
bits are the rho-window (rho = 21 - bit_length(w), 21 when w == 0 — a
20-bit window bounds rho safely above log2 of any real corpus bucket
count while keeping bit_length exact in both engines via binary-string
length, immune to float log2 edge cases).

Scale shape: one partial-agg groupBy(register) over a scan projection —
map-side max reduces every partition to <= m rows before the shuffle, so
the exchange moves O(m * partitions) bytes regardless of corpus size; the
estimate is a one-row fold over <= m rows; merge is the same groupBy-max
over the union of register tables.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urlops import stable_hash60

_W_BITS = 20  # rho window width; rho in 1..21


def hll_registers(df: DataFrame, col: str = "url", p: int = 8) -> DataFrame:
    """(register, max_rho) rows — the dense-in-spirit HLL register table
    (registers never hit by any key are simply absent; the estimator
    counts them as zeros from m - rows). p in [4, 16]; m = 2^p registers.

    DuckDB twin of the row math (shared with the q_hll_distinct oracle):

        h      = ('0x' || substr(md5(x), 1, 15))::BIGINT
        reg    = h & (m - 1)
        w      = (h >> p) & 1048575
        rho    = case when w = 0 then 21 else 21 - length(bin(w)) end
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    # NULL keys are excluded like every SQL aggregate — a NULL key would
    # otherwise survive as a (register=NULL, max_rho=NULL) group that
    # hll_estimate counts as a hit register while its 2^-rho term drops
    # out of the harmonic sum, biasing the estimate
    df = df.where(F.col(col).isNotNull())
    h = stable_hash60(F.col(col))
    reg = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftright(h, p).bitwiseAND(F.lit((1 << _W_BITS) - 1))
    # bit_length via base-2 string length: exact integer arithmetic in
    # both engines (Spark conv / DuckDB bin), no float log2 boundary risk
    rho = F.when(w == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS + 1) - F.length(F.conv(w, 10, 2))
    )
    return (
        df.select(reg.alias("register"), rho.alias("rho"))
        .groupBy("register").agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union register tables (same p!) into one — register-wise max.
    This is the whole point of keeping registers as rows: per-wave /
    per-epoch sketches stored next to the seen deltas combine in one
    tiny groupBy, never rescanning the keys that produced them."""
    it = iter(register_tables)
    merged = next(it)
    for t in it:
        merged = merged.unionByName(t)
    return merged.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One row (n_registers_hit, estimate) from a register table.

    Standard HLL estimator: raw = alpha_m * m^2 / sum_j 2^(-M_j) with
    absent registers contributing 2^0 = 1, plus the small-range linear-
    counting correction (est = m * ln(m / zeros) when raw <= 2.5m and
    zeros > 0). The 2^(-M_j) terms are dyadic rationals on a 2^21 grid,
    so the sum is EXACT in binary regardless of aggregation order — the
    oracle reproduces the estimate to float identity."""
    agg = registers.agg(
        F.count(F.lit(1)).alias("n_registers_hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_s"),
    )
    est = hll_estimate_cols(F.col("n_registers_hit"), F.col("_s"), p)
    return agg.select("n_registers_hit", est.alias("estimate"))


def hll_estimate_cols(n_hit: Column, s: Column, p: int) -> Column:
    """The HLL estimator as a Column over already-aggregated register
    stats: ``n_hit`` = count of hit registers, ``s`` = sum of 2^(-rho).
    Factored out so PER-GROUP estimates (one sketch per node/host/epoch —
    e.g. the HyperBall balls in operators/anf.py) reuse the exact same
    raw-vs-linear-counting arithmetic as the one-row ``hll_estimate``."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    zeros = F.lit(m) - n_hit
    raw = F.lit(alpha * m * m) / (s + zeros.cast("double"))
    return F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)


def hll_error_bound(p: int) -> float:
    """The published relative standard error 1.04 / sqrt(2^p)."""
    return 1.04 / math.sqrt(1 << p)


def cms_table(df: DataFrame, col: str = "url", depth: int = 4,
              width: int = 1024,
              weight_col: str | None = None) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as plain rows
    (row_idx, col_idx, cnt) — d*w counters answering "how often did key
    X occur" over a 10^10-key stream with FIXED memory and a one-sided
    error guarantee (never undercounts; overshoot <= e*N/w with prob
    1 - e^-d). The frequency twin of :func:`hll_registers`: same
    portable ``stable_hash60`` rows (row j hashes ``j:key``), same
    merge-by-rows story — per-wave/per-epoch sketches ADD cell-wise
    (sum, vs HLL's max), so host-frequency monitoring appends like the
    seen deltas.

    Scale shape: depth is a tiny array-explode on the scan (d rows per
    key occurrence, d <= 8), then ONE partial-agg groupBy over at most
    d*w distinct cells — the exchange carries O(d*w*partitions) rows
    regardless of stream length. ``weight_col`` lets a pre-aggregated
    (key, count) table feed the sketch without re-expanding."""
    w8 = (F.col(weight_col).cast("long") if weight_col
          else F.lit(1).cast("long"))
    # NULL keys are excluded like every SQL aggregate (they would hash to
    # a NULL cell and pollute the counter table otherwise)
    df = df.where(F.col(col).isNotNull())
    rows = df.select(
        F.col(col).alias("_k"), w8.alias("_w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_idx"),
    )
    cell = F.pmod(
        stable_hash60(F.concat(F.col("row_idx").cast("string"), F.lit(":"),
                               F.col("_k"))),
        F.lit(width),
    )
    return (
        rows.select("row_idx", cell.alias("col_idx"), F.col("_w"))
        .groupBy("row_idx", "col_idx").agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*tables: DataFrame) -> DataFrame:
    """Cell-wise ADD of same-shape sketches (same depth/width!) — the
    epoch/partition merge."""
    it = iter(tables)
    merged = next(it)
    for t in it:
        merged = merged.unionByName(t)
    return merged.groupBy("row_idx", "col_idx").agg(F.sum("cnt").alias("cnt"))


def cms_query(cms: DataFrame, keys: DataFrame, col: str = "url",
              depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-estimate every key in ``keys``: min over the d cells the key
    hashes to. Keys the sketch never saw can still collide into nonzero
    cells — the estimate is an UPPER bound, exact for keys whose d cells
    are collision-free (heavy keys in a skewed stream almost always
    are). Returns (key, est).

    Shape: keys expand d-fold, equi-join the d*w cell table (broadcast —
    the sketch is bounded, never the stream), one groupBy(key) min."""
    probes = keys.select(
        F.col(col).alias("key"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_idx"),
    )
    cell = F.pmod(
        stable_hash60(F.concat(F.col("row_idx").cast("string"), F.lit(":"),
                               F.col("key"))),
        F.lit(width),
    )
    return (
        probes.withColumn("col_idx", cell)
        .join(F.broadcast(cms), ["row_idx", "col_idx"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Moments sketch: mergeable distribution summaries (Gan et al., VLDB 2018)
# ---------------------------------------------------------------------------

def moment_sums(df: DataFrame, value_col: str,
                group_cols: tuple[str, ...] | list[str] = ()) -> DataFrame:
    """Power-sum distribution sketch: per group, (n, s1..s4, mn, mx) where
    s_k = sum(x^k) in double. The moments-sketch idea (Gan, Ding, Tai,
    Sharan & Bailis, "Moment-Based Quantile Sketches", VLDB 2018): power
    sums are the CELL-WISE MERGEABLE summary of a distribution — merge =
    plain addition (min/max for the range) — so per-wave fetch-latency or
    doc-length summaries append like the HLL register deltas and fold
    across waves/epochs/stores without rescanning history, in O(1) state
    per group.

    Shape: one partial-agg groupBy — map-side combine reduces every
    partition to one row per group before the exchange.

    Numerical caveat (documented, not hidden): raw power sums of
    large-magnitude values lose double precision (x^4 at x ~ 1e5 with
    1e10 rows approaches 2^53 in the SUM). For such columns, pre-scale to
    a sane unit (ms -> s, bytes -> KB) at the call site; the estimator is
    scale-equivariant."""
    v = F.col(value_col).cast("double")
    return df.groupBy(*list(group_cols)).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )


def moment_merge(*tables: DataFrame,
                 group_cols: tuple[str, ...] | list[str] = ()) -> DataFrame:
    """Fold any number of moment_sums tables into one: sums add, range
    folds by min/max — associative and commutative, so epoch deltas merge
    in any order (the same contract as hll_merge / cms_merge)."""
    it = iter(tables)
    merged = next(it)
    for t in it:
        merged = merged.unionByName(t)
    return merged.groupBy(*list(group_cols)).agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.sum("s3").alias("s3"),
        F.sum("s4").alias("s4"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def moment_stats(sums: DataFrame) -> DataFrame:
    """Central-moment statistics from the power sums: population mean,
    std, skewness g1 = m3/std^3 and excess kurtosis g2 = m4/var^2 - 3
    (null when degenerate). Pure column algebra over the tiny sketch
    table — never touches the data again."""
    n = F.col("n").cast("double")
    mean = F.col("s1") / n
    m2 = F.col("s2") / n - mean * mean
    var = F.greatest(m2, F.lit(0.0))
    std = F.sqrt(var)
    m3 = (F.col("s3") / n - 3 * mean * F.col("s2") / n
          + 2 * mean * mean * mean)
    m4 = (F.col("s4") / n - 4 * mean * F.col("s3") / n
          + 6 * mean * mean * F.col("s2") / n
          - 3 * mean * mean * mean * mean)
    return sums.withColumns({
        "mean": mean,
        "std": std,
        "skewness": F.when(std > 0, m3 / (std * std * std)),
        "kurtosis": F.when(var > 0, m4 / (var * var) - 3),
    })


def cf_quantile(stats: DataFrame, p: float, z: float,
                out_col: str = "q_est") -> DataFrame:
    """Cornish-Fisher quantile estimate from moment_stats output: adjust
    the normal quantile ``z`` (= Phi^-1(p), computed caller-side — e.g.
    ``statistics.NormalDist().inv_cdf(p)``; passed in so the constant is
    shared verbatim with SQL oracles) by the sketch's skewness/kurtosis,
    then clamp into the observed [mn, mx]. Approximate BY DESIGN — the
    honest trade for O(1) mergeable state; exact quantiles at 100 TB need
    a full sort or a KLL-class sketch, neither of which merges as plain
    column sums. Accuracy degrades for strongly non-Gaussian shapes; the
    clamp keeps estimates sane even then."""
    g1 = F.coalesce(F.col("skewness"), F.lit(0.0))
    g2 = F.coalesce(F.col("kurtosis"), F.lit(0.0))
    zl = F.lit(float(z))
    w = (
        zl
        + (zl * zl - 1) * g1 / 6
        + (zl * zl * zl - 3 * zl) * g2 / 24
        - (2 * zl * zl * zl - 5 * zl) * g1 * g1 / 36
    )
    est = F.col("mean") + F.col("std") * w
    return stats.withColumn(
        out_col, F.least(F.greatest(est, F.col("mn")), F.col("mx")))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) sketch: SET OPERATIONS on cardinality
# ---------------------------------------------------------------------------
#
# HLL answers "how many distinct" and merges by UNION only. The crawl
# questions it cannot answer are intersective: how many URLs did wave 17
# and wave 18 both touch? what fraction of host A's fingerprints also
# appear on host B? how much of this epoch's discovery is genuinely new
# vs the whole store? KMV (Bar-Yossef et al. 2002 "Counting distinct
# elements in a data stream"; Beyer et al. SIGMOD 2007 unbiased
# estimator; the theta-sketch family in the DataSketches literature)
# keeps the k SMALLEST hash values of the distinct keys — a uniform
# sample of the key space that supports union (min-k of the union of two
# sketches), intersection and Jaccard (membership of the union sample in
# both sides), all in O(k) state, mergeable like every other sketch in
# this module and exactly reproducible in the DuckDB oracle because rows
# are plain (group, h) pairs under ``stable_hash60``.

_H60_SPAN = float(1 << 60)  # hashes are uniform on [0, 2^60)


def kmv_sketch(df: DataFrame, col: str = "url", k: int = 256,
               group_cols: tuple[str, ...] | list[str] = (),
               prefilter_frac: float | None = None) -> DataFrame:
    """Bottom-k sketch: per group, the k smallest distinct
    ``stable_hash60`` values of ``col`` as plain (group..., h) rows.

    Shape: distinct on (group, h) — one exchange with map-side combine —
    then a row_number window per group over the already-distinct hashes.
    For steady-state use the window never sees the corpus: sketches are
    built per wave/epoch DELTA and folded with :func:`kmv_merge`, so the
    window input is the delta's distinct set. For a one-shot sketch of a
    10^10-key table, pass ``prefilter_frac`` (e.g. ``8 * k / est_n`` from
    a prior HLL estimate or last epoch's k-th hash): hashes above
    ``frac * 2^60`` are dropped AT THE SCAN, the distinct+window run over
    the ~8k survivors per group, and the result is IDENTICAL as long as
    >= k survivors remain (the k smallest are unaffected by dropping
    large values) — determinism the oracle relies on."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    gcols = list(group_cols)
    h = stable_hash60(F.col(col))
    # NULL keys are excluded like every SQL aggregate (a NULL hash would
    # sort first under asc ordering and steal a bottom-k slot)
    rows = df.where(F.col(col).isNotNull()).select(*gcols, h.alias("h"))
    if prefilter_frac is not None:
        rows = rows.where(F.col("h") <= int(prefilter_frac * _H60_SPAN))
    from pyspark.sql import Window
    w = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy("h")
    return (
        rows.distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(*sketches: DataFrame, k: int = 256,
              group_cols: tuple[str, ...] | list[str] = ()) -> DataFrame:
    """Fold sketches (same k!) into the sketch of the UNION of their key
    sets: distinct-union the rows, keep the k smallest per group. Exact —
    the k smallest of A ∪ B are a subset of (k smallest of A) ∪ (k
    smallest of B) — and associative/commutative like hll/cms/moment
    merges, so per-epoch deltas fold in any order over O(epochs * k)
    rows."""
    gcols = list(group_cols)
    it = iter(sketches)
    merged = next(it)
    for t in it:
        merged = merged.unionByName(t)
    from pyspark.sql import Window
    w = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy("h")
    return (
        merged.distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(sketch: DataFrame, k: int = 256,
                 group_cols: tuple[str, ...] | list[str] = ()) -> DataFrame:
    """Distinct-count estimate per group from a bottom-k sketch: when the
    sketch holds fewer than k rows the count is EXACT (the sketch is the
    whole distinct set); otherwise the Beyer et al. unbiased estimator
    (k - 1) / U_(k) with U_(k) = kth_smallest_hash / 2^60."""
    gcols = list(group_cols)
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.max("h").alias("_hk"),   # rows are the k smallest -> max = h_(k)
    )
    est = F.when(
        F.col("n_sample") < k, F.col("n_sample").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("_hk").cast("double") / F.lit(_H60_SPAN))
    )
    return agg.select(*gcols, "n_sample", est.alias("estimate"))


def kmv_setops(sketch_a: DataFrame, sketch_b: DataFrame,
               k: int = 256) -> DataFrame:
    """One row of set-operation estimates between two ungrouped sketches:
    union / intersection / a-only / b-only distinct counts plus Jaccard.

    Method (Beyer et al. 2007; the theta-sketch intersection): form the
    union sketch K = min-k(A ∪ B); every h in K is a uniform sample of
    A ∪ B, so jaccard ≈ |{h in K: h in A and h in B}| / |K| and
    intersection ≈ jaccard * union_estimate. Everything is plain joins
    over O(k) rows; exact whenever |A ∪ B| <= k (the sketches ARE the
    sets)."""
    union_sk = kmv_merge(sketch_a, sketch_b, k=k)
    u_est = kmv_estimate(union_sk, k=k)
    in_a = sketch_a.select(F.col("h"), F.lit(1).alias("_a"))
    in_b = sketch_b.select(F.col("h"), F.lit(1).alias("_b"))
    marked = (
        union_sk.join(in_a, "h", "left").join(in_b, "h", "left")
        .agg(
            F.count(F.lit(1)).alias("n_union_sample"),
            F.sum(F.when(F.col("_a").isNotNull()
                         & F.col("_b").isNotNull(), 1).otherwise(0))
            .alias("n_both"),
        )
    )
    j = F.col("n_both").cast("double") / F.col("n_union_sample")
    return (
        marked.crossJoin(u_est)   # two one-row frames
        .select(
            F.col("estimate").alias("union_est"),
            j.alias("jaccard"),
            (j * F.col("estimate")).alias("intersection_est"),
        )
    )


# ---------------------------------------------------------------------------
# DDSketch: fully-mergeable relative-error quantile sketch
# (Masson, Lee & Rim, "DDSketch: A Fast and Fully-Mergeable Quantile
#  Sketch with Relative-Error Guarantees", VLDB 2019)
# ---------------------------------------------------------------------------
#
# The quantile gap in the sketch family: the moments sketch above gives
# mergeable MOMENTS (mean/variance/Cornish-Fisher quantile ESTIMATES with
# no per-quantile guarantee), and exact percentile_approx is opaque JVM
# state that can't be stored, merged across epochs, or oracle-verified.
# DDSketch buckets values on a log-gamma grid — bucket i covers
# (gamma^(i-1), gamma^i] with gamma = (1+alpha)/(1-alpha) — so ANY value
# reconstructed from its bucket midpoint 2*gamma^i/(gamma+1) is within
# relative error alpha, and the sketch is literally a (bucket, cnt)
# table: merge = groupBy-sum (cell-wise, associative, epoch-appendable —
# the same contract as the HLL/CMS/KMV rows above). Reference parity:
# the reference keeps no latency/size distributions at all (single
# process); at 10^10 urls "p99 page bytes per host" needs a mergeable
# sketch, not a sort.
#
# Scale shape: ONE partial-agg groupBy over <= B distinct buckets per
# group (B ~ ln(max/min)/ln(gamma): ~1.2k buckets across 12 orders of
# magnitude at alpha=0.01) — the exchange carries O(B * partitions)
# rows regardless of row count; the quantile walk is a window over the
# bounded bucket table, never the data.
#
# Oracle portability: bucket = ceil(ln(x)/ln(gamma) - 1e-11) with
# ln(gamma) inlined as the SAME Python double in both engines. Both ln()
# calls are correctly-rounded to <= 1 ulp, so the engines can only
# disagree when ln(x)/ln(gamma) sits within ~1e-15 of the 1e-11-shifted
# boundary — and the shift moves the boundary OFF the exact-integer
# points (x = gamma^k, x = 1) where real data actually lands.

_DD_NEG_BUCKET = -(1 << 31)       # all negative values (documented: use a
                                  # second sketch on -x for signed data)
_DD_ZERO_BUCKET = -(1 << 31) + 1  # exact zeros (paper's separate zero count)
_DD_EPS = 1e-11


def dd_gamma(alpha: float) -> float:
    """gamma = (1+alpha)/(1-alpha); alpha is the relative-error bound."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket(value, alpha: float):
    """Log-gamma bucket index as a Column. Sentinel buckets for zero and
    negative inputs sort BELOW every real bucket, so the quantile walk
    orders (negatives, zeros, positives) correctly by plain bucket order."""
    lg = math.log(dd_gamma(alpha))
    x = value.cast("double")
    return (
        F.when(x < 0, F.lit(_DD_NEG_BUCKET))
        .when(x == 0, F.lit(_DD_ZERO_BUCKET))
        .otherwise(F.ceil(F.log(x) / F.lit(lg) - F.lit(_DD_EPS)).cast("int"))
    )


def ddsketch(df: DataFrame, value_col: str, alpha: float = 0.02,
             group_cols: tuple[str, ...] | list[str] = ()) -> DataFrame:
    """(group_cols..., bucket, cnt) — the sketch AS ROWS. Nothing is
    silently dropped: zeros and negatives land in sentinel buckets (a
    negative-heavy input shows up as mass in _DD_NEG_BUCKET, whose
    reconstruction is NULL, not a wrong number). NULL values are
    excluded like every SQL aggregate excludes them."""
    gcols = list(group_cols)
    b = dd_bucket(F.col(value_col), alpha)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*gcols, b.alias("bucket"))
        .groupBy(*gcols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ddsketch_merge(*sketches: DataFrame,
                   group_cols: tuple[str, ...] | list[str] = ()) -> DataFrame:
    """Cell-wise ADD of same-alpha sketches — the epoch/partition merge.
    sketch(A ++ B) == merge(sketch(A), sketch(B)) EXACTLY (bucket counts
    are integers; sum is associative), which the tests assert row-for-row."""
    gcols = list(group_cols)
    it = iter(sketches)
    merged = next(it)
    for t in it:
        merged = merged.unionByName(t)
    return merged.groupBy(*gcols, "bucket").agg(F.sum("cnt").alias("cnt"))


def ddsketch_collapse(sketch: DataFrame, max_buckets: int,
                      group_cols: tuple[str, ...] | list[str] = ()) -> DataFrame:
    """The paper's bounded-memory collapse: keep each group's highest
    ``max_buckets`` buckets and fold everything below into the lowest
    kept bucket. Quantiles above the collapsed mass keep the full alpha
    guarantee; the collapsed tail degrades gracefully (the paper's
    trade). Sentinel buckets participate like any low bucket.

    Shape: one row_number window over the BUCKET table (<= B rows per
    group, never the data) + one re-aggregate."""
    from pyspark.sql import Window

    gcols = list(group_cols)
    w = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy(
        F.col("bucket").desc())
    ranked = sketch.withColumn("_rn", F.row_number().over(w))
    floor_per_group = (
        ranked.where(F.col("_rn") <= max_buckets)
        .groupBy(*gcols).agg(F.min("bucket").alias("_floor"))
    )
    joined = (ranked.join(F.broadcast(floor_per_group), gcols)
              if gcols else ranked.crossJoin(F.broadcast(floor_per_group)))
    return (
        joined.select(
            *gcols,
            F.greatest(F.col("bucket"), F.col("_floor")).alias("bucket"),
            "cnt",
        )
        .groupBy(*gcols, "bucket").agg(F.sum("cnt").alias("cnt"))
    )


def ddsketch_quantiles(sketch: DataFrame, qs: list[float], alpha: float = 0.02,
                       group_cols: tuple[str, ...] | list[str] = ()) -> DataFrame:
    """(group_cols..., q, n_total, bucket, est) per requested quantile.

    Paper rank convention: the q-quantile is the item of rank
    floor(1 + q*(n-1)) in sorted order; the answer is the first bucket
    whose cumulative count reaches that rank, reconstructed at the
    gamma-midpoint 2*gamma^i/(gamma+1) (relative error <= alpha).
    Zero-bucket answers reconstruct as exactly 0.0; negative-bucket
    answers are NULL (sketch the negated column for signed data).

    Shape: cumulative-sum window over the bounded bucket table, a
    broadcast explode of the quantile list, one groupBy(q) min — the
    data itself is never re-scanned."""
    from pyspark.sql import Window

    gcols = list(group_cols)
    part = Window.partitionBy(*[F.col(c) for c in gcols])
    cum_w = part.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        sketch
        .withColumn("cum", F.sum("cnt").over(cum_w))
        .withColumn("n_total", F.sum("cnt").over(part))
    )
    qdf = cum.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    )
    rank = F.floor(F.lit(1.0) + F.col("q") * (F.col("n_total") - 1))
    g = dd_gamma(alpha)
    hit = (
        qdf.where(F.col("cum") >= rank)
        .groupBy(*gcols, "q")
        .agg(F.min("bucket").alias("bucket"),
             F.first("n_total").alias("n_total"))
    )
    est = (
        F.when(F.col("bucket") == _DD_ZERO_BUCKET, F.lit(0.0))
        .when(F.col("bucket") == _DD_NEG_BUCKET, F.lit(None).cast("double"))
        .otherwise(F.lit(2.0 / (g + 1.0)) * F.pow(F.lit(g), F.col("bucket")))
    )
    return hit.select(*gcols, "q", "n_total", "bucket", est.alias("est"))


# --- Poisson bootstrap (one-pass resampling for corpus metrics) -------------
#
# Classic bootstrap resampling is impossible over 10^10 rows (you cannot
# draw n-out-of-n samples repeatedly); the Poisson bootstrap (each row
# enters replicate j with weight ~ Poisson(1), independent per (row, j))
# approximates it in ONE pass: the whole resample reduces to r weighted
# sums computed side by side in a single partial aggregation. Weights are
# deterministic — the shared 60-bit md5 hash inverted through the fixed
# Poisson(1) CDF thresholds below — so every engine (Spark, DuckDB, a
# re-run) draws the identical resample. All sums stay INTEGER when the
# metric column is integer: replicate totals are exact, order-independent
# and hash-comparable across engines.

# floor(CDF_Poisson(1)(k) * 2^60) for k = 0..7; weight = #thresholds <= u,
# capping at 8 (tail mass ~1e-5). Shared constants — the oracle embeds
# the same integers.
POISSON1_CUM_T60 = [
    424136118829305344, 848272237658610688, 1060340297073263360,
    1131029650211480960, 1148701988496035328, 1152236456152946176,
    1152825534095764608, 1152909688087595776,
]


def _poisson1_weight(u: Column) -> Column:
    w = None
    for t in POISSON1_CUM_T60:
        term = (u >= F.lit(t)).cast("long")
        w = term if w is None else w + term
    return w


def bootstrap_replicate_stats(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_reps: int = 16,
    salt: str = "boot",
) -> DataFrame:
    """Per-replicate Poisson-bootstrap sums of ``value_col``: rows
    (rep, n_eff, total, mean). One aggregation pass computes every
    replicate (r weighted sums as sibling partial aggs — no explode, no
    r× data); weights are Poisson(1) draws keyed by md5(id:rep:salt), so
    the resample is reproducible bit-for-bit. With an integer value
    column, n_eff/total are exact integers and mean is one IEEE division
    — engine-independent."""
    if not 1 <= n_reps <= 64:
        raise ValueError("n_reps must be in [1, 64]")
    ws = []
    for j in range(n_reps):
        u = stable_hash60(F.concat(
            F.col(id_col).cast("string"), F.lit(f":{j}:{salt}")))
        ws.append(_poisson1_weight(u).alias(f"w{j}"))
    wide = df.select(F.col(value_col).alias("x"), *ws)
    aggs = []
    for j in range(n_reps):
        aggs.append(F.sum(f"w{j}").alias(f"n{j}"))
        aggs.append(F.sum(F.col(f"w{j}") * F.col("x")).alias(f"t{j}"))
    one = wide.agg(*aggs)
    # totals stay exact longs ONLY for integral value columns; a double
    # metric (e.g. payload KB) must keep its fractional part — casting it
    # to long would truncate every replicate sum toward zero and bias the
    # mean/CI silently
    from pyspark.sql.types import IntegralType

    int_total = isinstance(df.schema[value_col].dataType, IntegralType)
    total_type = "long" if int_total else "double"
    reps = F.array(*[
        F.struct(
            F.lit(j).alias("rep"),
            F.col(f"n{j}").cast("long").alias("n_eff"),
            F.col(f"t{j}").cast(total_type).alias("total"),
        )
        for j in range(n_reps)
    ])
    return (
        one.select(F.explode(reps).alias("r"))
        .select(
            "r.rep", "r.n_eff", "r.total",
            F.when(F.col("r.n_eff") > 0,
                   F.col("r.total").cast("double") / F.col("r.n_eff"))
            .alias("mean"),
        )
    )


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_reps: int = 16,
    lo: float = 0.025,
    hi: float = 0.975,
    salt: str = "boot",
) -> DataFrame:
    """Percentile-bootstrap CI for the mean of ``value_col``: one row
    (n, mean, ci_lo, ci_hi, n_reps). Quantile = exact selection from the
    sorted replicate means at rank floor(q·(r-1)) (the DDSketch/KMV rank
    convention — no interpolation, engine-exact). The replicate table is
    r rows, so the sort is an array_sort on one collected array, never a
    data shuffle."""
    reps = bootstrap_replicate_stats(df, value_col, id_col,
                                     n_reps=n_reps, salt=salt)
    r_lo = int(lo * (n_reps - 1))
    r_hi = int(hi * (n_reps - 1))
    base = df.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(value_col).cast("double")
         / F.count(F.lit(1))).alias("mean"),
    )
    ci = reps.agg(
        F.array_sort(F.collect_list("mean")).alias("ms")
    ).select(
        F.element_at("ms", r_lo + 1).alias("ci_lo"),
        F.element_at("ms", r_hi + 1).alias("ci_hi"),
    )
    return base.crossJoin(ci).select(
        "n", "mean", "ci_lo", "ci_hi", F.lit(n_reps).alias("n_reps"))
