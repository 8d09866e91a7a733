"""Unit tests: textproc (BM25/tokenize), bloom filter, robots.txt matcher."""

import numpy as np
import pytest

from crawl4ai_custom_spark.kernel.bloom import BloomFilter, optimal_params
from crawl4ai_custom_spark.kernel.robotstxt import can_fetch, parse_robots
from crawl4ai_custom_spark.kernel.textproc import (
    BM25,
    char_ngrams,
    clean_tokens,
    stable_hash64,
    tokenize,
    word_shingles,
)


def test_tokenize_and_clean():
    assert tokenize("Hello, World! 42x") == ["hello", "world", "42x"]
    toks = clean_tokens("The running dogs are jumping", do_stem=True)
    assert "the" not in toks and "are" not in toks
    assert "runn" in toks or "running" in toks or "run" in toks


def test_bm25_ranks_relevant_doc_higher():
    corpus = [
        ["spark", "query", "engine"],
        ["cooking", "pasta", "recipe"],
        ["spark", "spark", "shuffle", "join"],
    ]
    bm = BM25(corpus)
    s = bm.scores(["spark"])
    assert s[0] > s[1] and s[2] > s[1]


def test_stable_hash64_is_60bit_positive_and_stable():
    h = stable_hash64("https://example.com/")
    assert 0 <= h < (1 << 60)
    assert h == stable_hash64("https://example.com/")


def test_ngrams_and_shingles():
    assert char_ngrams("ab cd", 3) == ["ab ", "b c", " cd"]
    assert word_shingles("a b c d", 3) == ["a b c", "b c d"]


def test_bloom_basic_membership():
    bf = BloomFilter(capacity=10_000, fp_rate=0.01)
    keys = np.arange(1, 5001, dtype=np.uint64) * np.uint64(2654435761)
    bf.add_many(keys)
    assert bf.contains_many(keys).all()
    other = np.arange(10_001, 12_001, dtype=np.uint64) * np.uint64(1099511628211)
    fp = bf.contains_many(other).mean()
    assert fp < 0.05  # ~1% design FP with slack
    est = bf.cardinality_estimate()
    assert 4000 < est < 6200


def test_bloom_roundtrip_bytes():
    bf = BloomFilter(capacity=1000, fp_rate=0.01)
    keys = np.array([123456789, 987654321], dtype=np.uint64)
    bf.add_many(keys)
    bf2 = BloomFilter(capacity=1000, fp_rate=0.01, bits=np.frombuffer(bf.to_bytes(), dtype=np.uint8))
    assert bf2.contains_many(keys).all()


def test_optimal_params_monotone():
    m1, _ = optimal_params(1000, 0.01)
    m2, _ = optimal_params(1000, 0.001)
    assert m2 > m1


ROBOTS = """
User-agent: *
Disallow: /private/
Allow: /private/ok.html
Disallow: /*.pdf$
Crawl-delay: 2

User-agent: special-bot
Disallow: /
"""


def test_robots_longest_match_and_allow_wins():
    assert can_fetch(ROBOTS, "/public/a.html")
    assert not can_fetch(ROBOTS, "/private/secret.html")
    assert can_fetch(ROBOTS, "/private/ok.html")
    assert not can_fetch(ROBOTS, "/files/doc.pdf")
    assert can_fetch(ROBOTS, "/files/doc.pdfx")  # $ anchor


def test_robots_agent_groups():
    assert not can_fetch(ROBOTS, "/anything", agent="special-bot/1.0")
    rs = parse_robots(ROBOTS, "*")
    assert rs.crawl_delay == 2.0


def test_robots_empty_allows_everything():
    assert can_fetch("", "/x")
    assert can_fetch("User-agent: *\nDisallow:", "/x")


def test_pdf_kernel_roundtrip():
    from crawl4ai_custom_spark.kernel.pdfmini import (
        build_simple_pdf,
        pdf_page_count,
        pdf_text,
    )

    pdf = build_simple_pdf(["Hello (world)", "Back\\slash page"])
    assert pdf_page_count(pdf) == 2
    assert pdf_text(pdf) == "Hello (world) Back\\slash page"
    plain = build_simple_pdf(["uncompressed"], compress=False)
    assert pdf_text(plain) == "uncompressed"
    assert pdf_text(b"not a pdf") == "" and pdf_page_count(b"") == 0


def test_pdf_operator(spark):
    from crawl4ai_custom_spark.kernel.pdfmini import build_simple_pdf
    from crawl4ai_custom_spark.operators.pdf import extract_pdf_text

    rows = [(i, bytearray(build_simple_pdf([f"page one {i}", f"two {i}"])))
            for i in range(5)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    out = {r["media_id"]: r for r in extract_pdf_text(df).collect()}
    assert out[3]["n_pages"] == 2 and out[3]["text"] == "page one 3 two 3"


def test_imagecodec_png_roundtrip_all_filters():
    import numpy as np

    from crawl4ai_custom_spark.kernel.imagecodec import decode_png, encode_png

    rng = np.random.default_rng(11)
    for shape in [(1, 1), (6, 1), (1, 9), (16, 16), (7, 13)]:
        gray = rng.integers(0, 256, shape, dtype=np.uint8)
        rgb = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
        for mode in ("none", "cycle"):  # 'cycle' hits Sub/Up/Average/Paeth
            assert np.array_equal(decode_png(encode_png(gray, mode)), gray)
            assert np.array_equal(decode_png(encode_png(rgb, mode)), rgb)
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_imagecodec_wav_roundtrip():
    import numpy as np

    from crawl4ai_custom_spark.kernel.imagecodec import decode_wav, encode_wav

    rng = np.random.default_rng(5)
    s = (rng.integers(0, 65536, 777) - 32768).astype(np.int16)
    dec, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and np.array_equal(dec, s)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_decode_media_stats_real_and_unsupported(spark):
    import numpy as np

    from crawl4ai_custom_spark.kernel.imagecodec import encode_png, encode_wav
    from crawl4ai_custom_spark.operators.multimodal import decode_media_stats

    px = np.arange(48, dtype=np.uint8).reshape(6, 8)
    rows = [
        (1, bytearray(encode_png(px, "cycle"))),
        (2, bytearray(encode_wav(np.array([-3, 0, 7], dtype=np.int16), 16000))),
        (3, bytearray(b"\xff\xd8\xffJPEGDATA")),  # jpeg: honest 'unsupported'
        (4, bytearray(b"\x89PNG but truncated")),  # bad png: 'error'
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    out = {r["media_id"]: r for r in decode_media_stats(df).collect()}
    assert out[1]["decoder"] == "png-stdlib"
    assert (out[1]["width"], out[1]["height"]) == (8, 6)
    assert out[1]["val_sum"] == int(px.sum()) and out[1]["val_max"] == 47
    assert out[2]["decoder"] == "wav-stdlib"
    assert out[2]["n_values"] == 3 and out[2]["val_sum"] == 4
    assert out[2]["val_min"] == -3 and out[2]["width"] == 16000
    assert out[3]["decoder"] == "unsupported" and out[3]["format"] == "jpeg"
    assert out[4]["decoder"] == "error" and out[4]["val_sum"] is None
