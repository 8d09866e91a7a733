"""End-to-end test for jobs/corpus_job.py: documents parquet -> CLI arg
parsing -> build_training_set with the round-5 stages on -> sharded
output + one JSON status line."""

import json
import os
import sys

JOBS = os.path.join(os.path.dirname(__file__), "..", "jobs")

_TOPICS = ("storage engines", "query planners", "vector indexes",
           "crawl frontiers", "shard rebalancing")


def _doc(i: int) -> str:
    t = _TOPICS[i % len(_TOPICS)]
    return (
        f"The chapter number {i} of the handbook describes {t} in detail. "
        f"A worked example number {i * 7} walks the reader through the "
        f"failure mode number {i * 13} and the recovery steps that the "
        f"operators of deployment {i} should rehearse regularly."
    )


def _run(capsys, argv):
    sys.path.insert(0, JOBS)
    try:
        import corpus_job
    finally:
        sys.path.remove(JOBS)
    rc = corpus_job.main(argv)
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_corpus_job_end_to_end(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(i,
          f"https://h{i % 2}.example.com/p/{i}",
          "SHARED NAV LINE\n" + _doc(i)
          + (" cafÃ© â€” fixed" if i % 3 == 0 else ""))
         for i in range(12)],
        ["doc_id", "url", "text"],
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "corpus")

    res = _run(capsys, [
        "--docs", src, "--out", out,
        "--url-col", "url",
        "--fix-mojibake", "--host-boilerplate", "0.8",
        "--domain-cap", "4",
        "--no-near-dedup", "--no-pii",
        "--mixture", "en=1.0", "--n-shards", "4",
    ])
    assert res["docs_in"] == 12
    # 6 docs per host, domain cap 4 -> 8 out
    assert res["docs_out"] == 8
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 8
    assert {r["shard"] for r in rows} <= set(range(4))
    for r in rows:
        assert "SHARED NAV LINE" not in r["text"]
        assert "Ã" not in r["text"]
    fixed = [r for r in rows if r["doc_id"] % 3 == 0]
    assert fixed and all("café — fixed" in r["text"] for r in fixed)
