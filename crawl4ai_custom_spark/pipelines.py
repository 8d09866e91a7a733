"""End-to-end training-data pipeline: compose the engine's operators into
the standard crawl -> corpus flow, one DataFrame in, one sharded corpus out.

    WARC blobs (or a pages table)
      -> extract (html -> text/markdown)            operators/extraction.py
      -> language / quality / repetition filters    operators/textstats.py
      -> DSIR target-domain resampling (optional)   operators/corpusmix.py
      -> PII redaction                              operators/pii.py
      -> exact + near dedup -> keepers              operators/dedup.py
      -> SemDeDup semantic dedup (optional)         operators/dedup.py
      -> benchmark decontamination                  operators/decontam.py
      -> stratified mixture sampling                operators/textstats.py
      -> chunking to a token budget                 operators/chunking.py
      -> deterministic shard assignment

Every stage is the already-gated operator — this module only wires them, so
the pipeline's correctness is the conjunction of the per-operator oracles;
`tests/test_pipeline.py` asserts the end-to-end invariants (none of the
documented PII families — email/card/ssn/phone/IPv4 shapes, see
operators/pii.py — survives,
no duplicate fingerprints, no contaminated docs, shards balanced and
deterministic).

Scale notes: stage order minimizes bytes in flight — cheap scan-level
filters (lang/quality, codegen) run BEFORE the shuffling stages (dedup)
and the Python stage (extraction) output is immediately column-pruned.
Shard assignment is a pure projection (hash mod n), so the final write is
one `partitionBy("shard")` parquet job with no extra shuffle beyond the
write's own partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class CorpusConfig:
    min_quality: float = 0.35
    allowed_langs: tuple[str, ...] = ("en", "de", "fr", "es")
    gopher_rules: bool = False     # full Gopher rule pack (gopher_keep gate)
    c4_rules: bool = False         # C4 line filters + page flags (rebuilds text)
    span_dedup_sentences: int | None = None  # C4 global span dedup when set
    exact_substring_tokens: int | None = None  # Lee-et-al span REMOVAL when set
    max_dup_line_frac: float = 0.5
    lm_max_nll: float | None = None  # set with lm_ref to gate on LM score
    ccnet_keep: tuple[str, ...] = ()  # with lm_ref: keep these NLL buckets
    budget_tokens: int | None = None  # cap corpus size, best quality first
    line_dedup_max_docs: int | None = None  # C4 global line dedup when set
    max_dup_window_frac: float | None = None  # Lee-et-al token-window gate
    dup_window_tokens: int = 10
    fix_mojibake: bool = False    # cp1252 mojibake repair before anything
    host_boilerplate_min_share: float | None = None  # per-host line strip
    host_boilerplate_min_pages: int = 3              # (needs url_col)
    domain_cap: int | None = None  # max docs per host, best quality first
    redact_pii: bool = True
    near_dedup: bool = True
    jaccard_threshold: float = 0.6
    keep_best_quality: bool = False  # near-dup keeper = max quality, not min id
    cc_algorithm: str = "propagation"  # or "star" (skew-proof large/small-star)
    decontam_ngram: int = 13
    mixture: dict[str, float] = field(default_factory=dict)  # lang -> rate
    default_rate: float = 1.0
    dsir_n_docs: int | None = None    # with dsir_target: importance resample
    dsir_num_buckets: int = 1 << 16
    semdedup_eps: float | None = None  # with embeddings: semantic dedup
    semdedup_k: int = 8
    embedding_projection_dims: int | None = None  # count-sketch shrink of
    # the embedding column before the semantic pass (model-free sparse
    # JL; cuts every downstream cosine/shuffle byte ~d_in/d_out-fold at
    # 10^10 rows). Cosines are preserved in expectation with variance
    # ~1/d_out — widen semdedup_eps accordingly when projecting hard.
    chunk_tokens: int = 0       # 0 = no chunking, keep whole docs
    n_shards: int = 16
    shard_salt: str = "shards-v1"


def build_training_set(docs: DataFrame, cfg: CorpusConfig | None = None,
                       bench: DataFrame | None = None,
                       lm_ref: DataFrame | None = None,
                       dsir_target: DataFrame | None = None,
                       embeddings: DataFrame | None = None,
                       id_col: str = "doc_id", text_col: str = "text",
                       url_col: str | None = None,
                       checkpoint_dir: str | None = None) -> DataFrame:
    """documents(doc_id, text[, lang, ...]) -> training corpus with
    (doc_id, text, lang_pred, quality, shard [, chunk_index]).

    Pass `bench` to decontaminate against a benchmark table of the same
    shape; `dsir_target` (same shape, + cfg.dsir_n_docs) to importance-
    resample the pool toward a target domain; `embeddings`
    (vec_id, embedding) + cfg.semdedup_eps for a SemDeDup semantic pass
    after lexical near-dedup. All filters are explicit columns first, then
    one `.where`, so the pipeline is auditable stage by stage.
    """
    from .operators.decontam import decontaminate
    from .operators.dedup import (
        dedup_keepers,
        exact_dedup,
        minhash_lsh_dedup,
        normalized_text,
    )
    from .operators.pii import redact_pii
    from .operators.textstats import (
        profile_documents,
        repetition_stats,
        stratified_sample,
    )
    from .operators.urlops import stable_hash60

    cfg = cfg or CorpusConfig()
    if (cfg.host_boilerplate_min_share is not None or
            cfg.domain_cap is not None) and url_col is None:
        raise ValueError(
            "host_boilerplate_min_share / domain_cap need url_col")

    # -1. optional encoding repair FIRST: mojibake inflates non-alpha
    # ratios, poisons shingles and splits otherwise-identical duplicates,
    # so every downstream measurement must see repaired text
    if cfg.fix_mojibake:
        from .operators.textstats import fix_mojibake

        docs = fix_mojibake(docs, text_col=text_col).drop(
            "n_mojibake", "is_mojibake")

    # -1b. optional per-host boilerplate strip (CCNet/WET): host-scoped
    # nav/footer removal BEFORE the corpus-global line pass — host lines
    # that never cross the global threshold still vanish where they are
    # actually boilerplate
    if cfg.host_boilerplate_min_share is not None:
        from .operators.dedup import host_boilerplate_strip

        # keep a caller-provided `host` column intact (the op adds its own)
        had_host = "host" in docs.columns
        if had_host:
            docs = docs.withColumnRenamed("host", "_caller_host")
        docs = host_boilerplate_strip(
            docs, url_col=url_col, text_col=text_col,
            min_pages=cfg.host_boilerplate_min_pages,
            min_share=cfg.host_boilerplate_min_share,
            id_col=id_col,  # rebuild per ROW: refetched urls must not merge
        ).drop("host", "n_lines_removed")
        if had_host:
            docs = docs.withColumnRenamed("_caller_host", "host")

    # 0. optional C4 global line dedup FIRST: boilerplate must vanish before
    # quality/repetition are measured, or nav/footer noise skews both
    if cfg.line_dedup_max_docs is not None:
        from .operators.dedup import line_dedup

        docs = line_dedup(docs, id_col=id_col, text_col=text_col,
                          max_docs=cfg.line_dedup_max_docs).drop(
            "n_lines_removed")

    # 0b. optional C4 line filters (terminal punctuation / min words /
    # javascript): the REBUILT text feeds everything downstream, and pages
    # flagged lorem-ipsum / curly-brace / <5-sentences drop here
    if cfg.c4_rules:
        from .operators.textstats import c4_quality_filter

        c4 = c4_quality_filter(docs, text_col=text_col)
        docs = (
            c4.where(F.col("c4_keep"))
            .withColumn(text_col, F.col("c4_text"))
            .drop("c4_text", "n_lines_total", "n_lines_kept", "n_sentences",
                  "has_lorem_ipsum", "has_curly_brace", "c4_keep")
        )

    # 0c. optional C4 global duplicated-span removal (corpus-wide exact
    # runs of N consecutive sentences keep only their first occurrence)
    if cfg.span_dedup_sentences is not None:
        from .operators.dedup import span_dedup

        docs = span_dedup(docs, id_col=id_col, text_col=text_col,
                          span=cfg.span_dedup_sentences).drop(
            "n_sentences", "n_sentences_removed")

    # 0d. optional Lee-et-al exact-substring removal (duplicated k-token
    # runs keep only their first occurrence, token granularity) — the
    # removal companion of the max_dup_window_frac detection gate below
    if cfg.exact_substring_tokens is not None:
        from .operators.dedup import exact_substring_dedup

        docs = exact_substring_dedup(
            docs, id_col=id_col, text_col=text_col,
            k=cfg.exact_substring_tokens,
        ).drop("n_tokens", "n_tokens_removed")

    # 0d. optional Gopher document-rule pack (shuffle-free projection)
    if cfg.gopher_rules:
        from .operators.textstats import gopher_quality_filter

        docs = gopher_quality_filter(docs, text_col=text_col).where(
            F.col("gopher_keep")
        ).drop(
            "n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
            "ellipsis_frac", "alpha_frac", "stop_hits", "rule_word_count",
            "rule_mean_word_len", "rule_symbol_ratio", "rule_bullet_lines",
            "rule_ellipsis_lines", "rule_alpha_words", "rule_stopwords",
            "gopher_keep",
        )

    # 1. profile + quality/language gates (pure codegen — runs in the scan)
    prof = profile_documents(docs, text_col=text_col)
    prof = prof.where(
        (F.col("quality") >= cfg.min_quality)
        & F.col("lang_pred").isin(*cfg.allowed_langs)
    )

    # 2. repetition gate (two keyed groupBys)
    rep = repetition_stats(prof, id_col=id_col, text_col=text_col).select(
        F.col(id_col), "dup_line_frac"
    )
    prof = prof.join(rep, id_col, "left").where(
        F.coalesce("dup_line_frac", F.lit(0.0)) <= cfg.max_dup_line_frac
    ).drop("dup_line_frac")

    # 2a. optional token-window duplicate-fraction gate (Lee et al. 2021
    # exact-substring signal): drops boilerplate-heavy docs whose k-token
    # windows mostly recur across the corpus — one explode + one global
    # groupBy, linear
    if cfg.max_dup_window_frac is not None:
        from .operators.dedup import window_dup_stats

        wds = window_dup_stats(prof, id_col=id_col, text_col=text_col,
                               k=cfg.dup_window_tokens).select(
            F.col("id").alias(id_col), "dup_fraction"
        )
        prof = prof.join(wds, id_col, "left").where(
            F.coalesce("dup_fraction", F.lit(0.0)) <= cfg.max_dup_window_frac
        ).drop("dup_fraction")

    # 2b/2c. optional LM-based gates — the per-doc NLL pass (token explode
    # + broadcast model join + corpus groupBy, the dominant cost of both
    # gates) is computed ONCE and shared
    if lm_ref is not None and (cfg.lm_max_nll is not None or cfg.ccnet_keep):
        from .operators.textstats import lm_quality_score, unigram_lm

        nll = lm_quality_score(prof, unigram_lm(lm_ref, text_col=text_col),
                               id_col=id_col, text_col=text_col)
        prof = prof.join(nll.select(id_col, "avg_nll"), id_col, "left")
        prof = prof.withColumn("avg_nll", F.coalesce("avg_nll", F.lit(0.0)))

        # 2b. hard NLL ceiling
        if cfg.lm_max_nll is not None:
            prof = prof.where(F.col("avg_nll") <= cfg.lm_max_nll)

        # 2c. CCNet bucket gate: per-language NLL terciles, keep only the
        # configured buckets (head/middle in the CCNet recipe) — tiny
        # percentile agg + broadcast threshold join
        if cfg.ccnet_keep:
            from .operators.textstats import ccnet_buckets, nll_thresholds

            th = nll_thresholds(prof, lang_col="lang_pred")
            prof = (
                ccnet_buckets(prof, th, lang_col="lang_pred")
                .where(F.col("bucket").isin(*cfg.ccnet_keep))
                .drop("bucket")
            )
        prof = prof.drop("avg_nll")

    # 2d. optional DSIR importance resampling toward a target domain
    # (Xie et al. 2023): select the cfg.dsir_n_docs pool docs whose hashed-
    # ngram features look most target-like, via deterministic Gumbel-top-k.
    # Runs AFTER the cheap gates (so weights are estimated on the cleaned
    # pool) and BEFORE the expensive stages (PII / dedup / decontam see
    # only the selected subset). Weight estimation is two bucket-count
    # aggs (<= num_buckets rows each, broadcast back) + one
    # TakeOrderedAndProject — no global sort.
    if dsir_target is not None and cfg.dsir_n_docs is not None:
        from .operators.corpusmix import dsir_resample

        picked = dsir_resample(
            prof, dsir_target, cfg.dsir_n_docs, id_col=id_col,
            text_col=text_col, num_buckets=cfg.dsir_num_buckets,
        ).select(id_col)
        # no forced broadcast: n_docs is caller-sized (could be 10^8 ids at
        # 100 TB); AQE broadcasts the semi side when it fits
        prof = prof.join(picked, id_col, "semi")

    # 3. PII redaction (codegen projection) — the redacted text REPLACES the
    # original so nothing downstream ever sees raw PII
    if cfg.redact_pii:
        prof = (
            redact_pii(prof, text_col=text_col)
            .drop(text_col)
            .withColumnRenamed(f"{text_col}_redacted", text_col)
        )

    # 4. exact dedup: drop every row after the first of each fingerprint
    fp = F.md5(normalized_text(F.col(text_col)))
    w_first = F.row_number().over(
        Window.partitionBy(fp).orderBy(F.col(id_col))
    )
    prof = prof.withColumn("_rn", w_first).where(F.col("_rn") == 1).drop("_rn")

    # Materialize the profiled/redacted/exact-deduped table ONCE before the
    # stages that run their own internal actions (LSH pair join, connected-
    # components rounds, decontam): without this the whole codegen-heavy
    # upstream would recompute 3-4x (measured 167s -> ~60s at sf0.1).
    if cfg.near_dedup or bench is not None:
        if checkpoint_dir is not None:
            import os

            p = os.path.join(checkpoint_dir, "profiled")
            prof.write.mode("overwrite").parquet(p)
            prof = docs.sparkSession.read.parquet(p)
        else:
            prof = prof.persist()

    # 5. near dedup -> keepers only
    if cfg.near_dedup:
        pairs = minhash_lsh_dedup(
            prof, id_col=id_col, text_col=text_col,
            jaccard_threshold=cfg.jaccard_threshold,
        ).select("id_a", "id_b")
        prof = dedup_keepers(
            prof, pairs, id_col=id_col, checkpoint_dir=checkpoint_dir,
            quality_col="quality" if cfg.keep_best_quality else None,
            cc=cfg.cc_algorithm,
        ).where(F.col("is_keeper")).drop("cluster_id", "is_keeper")

    # 5b. optional SemDeDup semantic pass (Abbas et al. 2023) over an
    # embeddings table: k-means clusters, within-cluster cosine >= eps
    # pairs, keep the cluster-edge member of each duplicate group. Runs
    # AFTER lexical near-dedup (cheaper shuffles first; semantic dup sets
    # shrink once lexical dups are gone). Docs without an embedding row
    # pass through untouched (left anti on the DROPPED set, not semi on
    # the kept set).
    if embeddings is not None and cfg.semdedup_eps is not None:
        from .operators.dedup import semdedup

        survivors_emb = embeddings.join(
            prof.select(F.col(id_col).alias("vec_id")), "vec_id", "semi"
        )
        if cfg.embedding_projection_dims is not None:
            from .operators.similarity import feature_hash_projection

            survivors_emb = feature_hash_projection(
                survivors_emb, d_out=cfg.embedding_projection_dims
            ).select("vec_id", F.col("proj").alias("embedding"))
        dropped = semdedup(
            survivors_emb, k=cfg.semdedup_k, eps=cfg.semdedup_eps,
            checkpoint_dir=checkpoint_dir,
        ).where(~F.col("keep")).select(F.col("vec_id").alias(id_col))
        prof = prof.join(dropped, id_col, "anti")

    # 6. decontamination (broadcast benchmark grams)
    if bench is not None:
        prof = decontaminate(
            prof, bench, id_col=id_col, text_col=text_col,
            n=cfg.decontam_ngram,
        ).where(~F.col("contaminated")).drop(
            "contaminated", "n_contaminated_grams"
        )

    # 7. mixture sampling (scan-level hash filter)
    if cfg.mixture:
        prof = stratified_sample(
            prof, cfg.mixture, stratum_col="lang_pred", id_col=id_col,
            default_rate=cfg.default_rate,
        )

    # 7a. optional per-domain doc cap (FineWeb rule): no host dominates
    # the corpus — keep each host's best `domain_cap` docs by quality.
    # One keyed window over the host; runs after mixture so caps apply to
    # what actually ships
    if cfg.domain_cap is not None:
        from .operators.corpusmix import domain_doc_cap
        from .operators.urlops import url_host

        prof = domain_doc_cap(
            prof.withColumn("_dom", url_host(F.col(url_col))),
            cap=cfg.domain_cap, domain_col="_dom", id_col=id_col,
            score_col="quality",
        ).drop("_dom")

    # 7b. optional token-budget selection: keep the highest-quality docs
    # until the budget fills (bucket-quantized — no global sort; the
    # profile's quality and token_count columns feed it directly)
    if cfg.budget_tokens is not None:
        from .operators.corpusmix import token_budget_select

        prof = token_budget_select(
            prof, cfg.budget_tokens, quality_col="quality",
            id_col=id_col, token_col="token_count",
        ).drop("qbucket")

    # 8. optional chunking to a token budget
    if cfg.chunk_tokens > 0:
        from .operators.chunking import token_budget_chunks

        chunks = token_budget_chunks(
            prof, id_col=id_col, text_col=text_col,
            token_threshold=cfg.chunk_tokens,
        )
        prof = (
            chunks.withColumnRenamed("chunk", text_col)
            .withColumnRenamed("id", id_col)
        )

    # 9. deterministic shard assignment (pure projection)
    shard = F.pmod(
        stable_hash60(
            F.concat(F.lit(cfg.shard_salt), F.col(id_col).cast("string"))
        ),
        F.lit(cfg.n_shards),
    ).cast("int")
    return prof.withColumn("shard", shard)


def write_training_shards(corpus: DataFrame, out_dir: str) -> None:
    """One parquet job partitioned by shard — the write's own partitioning
    is the only movement; downstream trainers read shard=K dirs."""
    corpus.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
