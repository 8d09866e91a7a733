"""End-to-end test for jobs/cc_ingest_job.py: synthetic CC segments +
CDXJ indexes (WARC responses and a WET conversion shard indexed
separately, as in real CC) -> byte-range fetch -> pages AND documents
outputs, with the pages output accepted by the crawl engine's
latest-capture view."""

import gzip
import json
import os
import sys

JOBS = os.path.join(os.path.dirname(__file__), "..", "jobs")


def _member(warc_type, url, body, date="2024-01-01T00:00:00Z"):
    rec = (f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: {date}\r\n"
           f"Content-Length: {len(body.encode())}\r\n\r\n").encode() \
        + body.encode()
    return gzip.compress(rec, mtime=0)


def _line(url, ts, o, ln, fname, mime="text/html", status="200"):
    key = url.replace("https://", "com,ex)/")
    return (f'{key} {ts} {{"url": "{url}", "status": "{status}", '
            f'"mime": "{mime}", "length": "{ln}", "offset": "{o}", '
            f'"filename": "{fname}"}}')


def _run(capsys, argv):
    sys.path.insert(0, JOBS)
    try:
        import cc_ingest_job
    finally:
        sys.path.remove(JOBS)
    rc = cc_ingest_job.main(argv)
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cc_ingest_job_end_to_end(spark, tmp_path, capsys):
    # WARC segment: 4 indexed responses + one never-indexed url
    entries = [("response", f"https://ex.com/p{i}",
                f"<html><body>page {i}</body></html>") for i in range(4)]
    entries.append(("response", "https://ex.com/hidden", "<html>no</html>"))
    members = [_member(t, u, b) for t, u, b in entries]
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    (seg_dir / "seg-0.warc.gz").write_bytes(b"".join(members))
    offs, off = [], 0
    for m in members:
        offs.append((off, len(m)))
        off += len(m)
    lines = [_line(f"https://ex.com/p{i}", "20240102000000", *offs[i],
                   "seg-0.warc.gz") for i in range(4)]
    # an OLDER p1 capture pointing at p3's bytes — latest-capture must
    # pick the newer entry (p1's own bytes)
    lines.append(_line("https://ex.com/p1", "20230101000000", *offs[3],
                       "seg-0.warc.gz"))
    idx = tmp_path / "cdx-00000.gz"
    idx.write_bytes(gzip.compress(("\n".join(lines) + "\n").encode()))

    # WET shard with its own index, as in real CC
    wet = _member("conversion", "https://ex.com/p0", "page zero text")
    (seg_dir / "seg-0.warc.wet.gz").write_bytes(wet)
    wet_idx = tmp_path / "cdx-wet.gz"
    wet_idx.write_bytes(gzip.compress((_line(
        "https://ex.com/p0", "20240102000001", 0, len(wet),
        "seg-0.warc.wet.gz", mime="text/plain") + "\n").encode()))

    pages_out = str(tmp_path / "pages.parquet")
    stats = _run(capsys, ["--index", str(idx),
                          "--segments-root", str(seg_dir),
                          "--pages-out", pages_out])
    assert stats["planned"] == 4 and stats["pages"] == 4

    docs_out = str(tmp_path / "docs.parquet")
    wstats = _run(capsys, ["--index", str(wet_idx),
                           "--segments-root", str(seg_dir),
                           "--docs-out", docs_out])
    assert wstats["planned"] == 1 and wstats["documents"] == 1

    pages = spark.read.parquet(pages_out)
    got = {r["url"]: bytes(r["html"]).decode() for r in pages.collect()}
    assert set(got) == {f"https://ex.com/p{i}" for i in range(4)}
    assert got["https://ex.com/p1"] == "<html><body>page 1</body></html>"
    assert "hidden" not in " ".join(got)

    docs = spark.read.parquet(docs_out).collect()
    assert docs[0]["url"] == "https://ex.com/p0"
    assert docs[0]["text"] == "page zero text"

    # the pages output is a valid engine input table
    from crawl4ai_custom_spark.sources.pages import latest_pages

    assert latest_pages(pages).count() == 4
