"""DUST rule mining — Different URLs with Similar Text (Bar-Yossef,
Keidar & Schonfeld, "Do Not Crawl in the DUST", WWW 2007).

The reference strips a FIXED list of tracking parameters during
canonicalization (``crawl4ai/utils.py`` tracking-param strip, mirrored in
``kernel/urlnorm.py``). DUST closes the loop the reference leaves open: it
LEARNS, from crawl evidence, which query parameters are content-irrelevant
*per host* — session ids, cache busters, site-specific tracking noise a
static list can never enumerate — so the learned rules feed back into
canonicalization and the frontier stops re-crawling aliases.

Evidence model (the paper's parameter-rule subset, exact not heuristic):
for every crawled url and every query parameter ``p`` it carries, the
*residual* is the url with that one ``k=v`` pair removed. Urls sharing
(host, p, residual) form an evidence group; a group with >= 2 distinct
values of ``p`` shows the parameter varying with everything else fixed.
``p`` is judged irrelevant on a host when there are >= ``min_support``
such groups and in NONE of them does the content fingerprint vary. One
counterexample group kills the rule — conservative by construction,
exactly like the paper's "refuted by one instance" rule filtering.

Scale shape: one projection + one explode (bounded by total query params,
~ a few per url) + one groupBy(host, param, residual) + one tiny
groupBy(host, param). No joins, no windows; partial aggregation applies
throughout. Rules are O(hosts × param-vocabulary) — broadcastable — so
``apply_dust_rules`` is a broadcast join + array filter, never a shuffle
of the url corpus.

Assumes canonicalized urls (no fragment); duplicate identical ``k=v``
pairs in one query string are removed together (both sides of the oracle
agree on this degenerate case).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text
from .urlops import stable_hash60, url_host


def url_query_params(url: Column) -> Column:
    """array<string> of raw ``k=v`` pairs, original order, empties dropped."""
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    return F.filter(F.split(q, "&"), lambda kv: kv != F.lit(""))


def _param_name(kv: Column) -> Column:
    return F.split_part(kv, F.lit("="), F.lit(1))


def dust_param_rules(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_support: int = 2,
) -> DataFrame:
    """Mine per-host content-irrelevant query parameters.

    Returns (host, param, n_groups, violations, irrelevant): ``n_groups``
    = evidence groups where the param varied with residual fixed,
    ``violations`` = those whose content fingerprint ALSO varied,
    ``irrelevant`` = n_groups >= min_support and violations == 0."""
    u = F.col(url_col)
    base = F.regexp_extract(u, r"^([^?#]*)", 1)
    t = pages.select(
        url_host(u).alias("host"),
        base.alias("base"),
        url_query_params(u).alias("params"),
        stable_hash60(normalized_text(F.col(text_col))).alias("fp"),
    )
    ex = t.select(
        "host", "base", "fp",
        F.explode("params").alias("kv"),
        F.col("params").alias("params"),
    )
    others = F.array_remove(F.col("params"), F.col("kv"))
    residual = F.concat(
        F.col("base"),
        F.when(F.size(others) > 0,
               F.concat(F.lit("?"), F.concat_ws("&", others)))
        .otherwise(F.lit("")),
    )
    groups = (
        ex.select(
            "host",
            _param_name(F.col("kv")).alias("param"),
            residual.alias("residual"),
            "kv", "fp",
        )
        .groupBy("host", "param", "residual")
        .agg(
            F.countDistinct("kv").alias("nv"),
            F.countDistinct("fp").alias("nf"),
        )
    )
    return (
        groups.where(F.col("nv") >= 2)
        .groupBy("host", "param")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("nf") > 1).cast("int")).alias("violations"),
        )
        .withColumn(
            "irrelevant",
            (F.col("n_groups") >= min_support) & (F.col("violations") == 0),
        )
    )


def apply_dust_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "dust_url",
) -> DataFrame:
    """Rewrite urls by stripping each host's learned-irrelevant params.

    ``rules`` is :func:`dust_param_rules` output (only ``irrelevant`` rows
    are used). Broadcast join on host + native array filter — the url
    corpus never shuffles. Non-matching hosts and param-free urls pass
    through unchanged."""
    bad = (
        rules.where(F.col("irrelevant"))
        .groupBy("host")
        .agg(F.collect_set("param").alias("_bad_params"))
    )
    u = F.col(url_col)
    base = F.regexp_extract(u, r"^([^?#]*)", 1)
    joined = urls.withColumn("_host", url_host(u)).join(
        F.broadcast(bad.withColumnRenamed("host", "_host")), "_host", "left"
    )
    no_bad = F.coalesce(
        F.col("_bad_params"), F.array().cast("array<string>"))
    kept = F.filter(
        url_query_params(u),
        lambda kv: ~F.array_contains(no_bad, _param_name(kv)),
    )
    rewritten = F.concat(
        base,
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.concat_ws("&", kept)))
        .otherwise(F.lit("")),
    )
    return joined.withColumn(out_col, rewritten).drop("_host", "_bad_params")
