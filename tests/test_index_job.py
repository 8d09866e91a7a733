"""End-to-end tests for jobs/index_job.py: full build, at-rest layout,
query-over-written-index equivalence, and the incremental update epoch
matching a from-scratch rebuild."""

import json
import os
import sys

import pyspark.sql.functions as F

JOBS = os.path.join(os.path.dirname(__file__), "..", "jobs")


def _run(capsys, argv):
    sys.path.insert(0, JOBS)
    try:
        import index_job
    finally:
        sys.path.remove(JOBS)
    rc = index_job.main(argv)
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_index_job_build_and_query(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(i, f"alpha beta common{i % 3} gamma alpha") for i in range(30)],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "index")
    stats = _run(capsys, ["--docs", src, "--out", out, "--term-buckets", "4"])
    assert stats["docs"] == 30 and stats["terms"] == 6
    assert not stats["incremental"]

    # the written index answers queries identically to a fresh one
    from crawl4ai_custom_spark.operators.textstats import (
        bm25_from_index,
        doc_lengths,
        inverted_postings,
        term_dictionary,
    )

    wp = spark.read.parquet(f"{out}/postings.parquet")
    wd = spark.read.parquet(f"{out}/dictionary.parquet")
    wl = spark.read.parquet(f"{out}/doclens.parquet")
    got = {r["id"]: round(r["bm25"], 9) for r in bm25_from_index(
        wp, wd, ["alpha", "common1"], doclens=wl).collect()}
    fp = inverted_postings(docs.withColumnRenamed("doc_id", "id"),
                           "id", "text")
    exp = {r["id"]: round(r["bm25"], 9) for r in bm25_from_index(
        fp, term_dictionary(fp), ["alpha", "common1"],
        doclens=doc_lengths(fp)).collect()}
    assert got == exp

    # at-rest layout: range clustering -> each parquet file covers a
    # DISJOINT term range, so a single-term lookup prunes to one file on
    # min/max stats alone
    import pyarrow.parquet as pq

    pdir = f"{out}/postings.parquet"
    files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
    assert 1 < len(files) <= 4
    spans = []
    for f in files:
        md = pq.ParquetFile(os.path.join(pdir, f)).metadata
        tcol = next(i for i in range(len(md.schema))
                    if md.schema.column(i).name == "term")
        mins = [md.row_group(g).column(tcol).statistics.min
                for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(tcol).statistics.max
                for g in range(md.num_row_groups)]
        spans.append((min(mins), max(maxs)))
    spans.sort()
    assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))


def test_index_job_incremental_epoch_equals_rebuild(spark, tmp_path, capsys):
    base = spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(20)], ["doc_id", "text"])
    src = str(tmp_path / "base.parquet")
    base.write.parquet(src)
    out0 = str(tmp_path / "idx0")
    _run(capsys, ["--docs", src, "--out", out0])

    changed = spark.createDataFrame(
        [(3, "alpha changed epsilon"), (99, "zeta new")],
        ["doc_id", "text"])
    chp = str(tmp_path / "changed.parquet")
    changed.write.parquet(chp)
    retired = spark.createDataFrame([(7,), (8,)], ["doc_id"])
    rep = str(tmp_path / "retired.parquet")
    retired.write.parquet(rep)

    out1 = str(tmp_path / "idx1")
    stats = _run(capsys, ["--base-index", out0, "--update-docs", chp,
                          "--retire-ids", rep, "--out", out1])
    # 20 base - 2 retired + 1 brand-new (doc 3 replaced in place)
    assert stats["incremental"] and stats["docs"] == 19

    from crawl4ai_custom_spark.operators.textstats import (
        inverted_postings,
        term_dictionary,
    )

    updated_corpus = (
        base.where(~F.col("doc_id").isin(3, 7, 8))
        .unionByName(changed)
    )
    pr = inverted_postings(updated_corpus)
    dr = term_dictionary(pr)

    wp = spark.read.parquet(f"{out1}/postings.parquet")
    wd = spark.read.parquet(f"{out1}/dictionary.parquet")
    pset = lambda df: {(r["term"], r["id"], r["tf"], tuple(r["positions"]))
                       for r in df.collect()}
    assert pset(wp) == pset(pr)
    assert ({tuple(r) for r in wd.collect()}
            == {tuple(r) for r in dr.collect()})
