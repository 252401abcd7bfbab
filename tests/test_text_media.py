"""TF-IDF keyword extraction and aHash media fingerprint: hand-computed
goldens plus plan-shape checks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from radohydro_spark.functions.text import tfidf_top_terms
from radohydro_spark.operators.multimodal import average_hash


def test_tfidf_golden(spark):
    # 3 docs; "rare" appears only in doc 1 (twice), "common" in all docs
    df = spark.createDataFrame(
        [
            (1, "rare rare common x"),
            (2, "common y z"),
            (3, "common z z"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["term"]): r
        for r in tfidf_top_terms(df, "text", "doc_id", top_k=10).collect()
    }
    r = out[(1, "rare")]
    assert r["tf"] == 2 and r["df"] == 1
    assert r["tfidf"] == round(2 * math.log(4.0 / 2.0), 6)
    assert r["rank"] == 1  # highest score in doc 1
    # common is in every doc: idf = ln(4/4) = 0
    assert out[(2, "common")]["tfidf"] == 0.0
    # z: doc 3 has tf=2, df=2 -> 2*ln(4/3)
    assert out[(3, "z")]["tfidf"] == round(2 * math.log(4.0 / 3.0), 6)


def test_tfidf_ranks_are_dense_per_doc(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} w{i} shared") for i in range(6)], "doc_id long, text string"
    )
    out = tfidf_top_terms(df, "text", "doc_id", top_k=2)
    per_doc = (
        out.groupBy("doc_id").agg(F.collect_set("rank").alias("ranks")).collect()
    )
    for row in per_doc:
        assert sorted(row["ranks"]) == [1, 2]


def test_ahash_golden(spark):
    # 8 bytes, grid=4 -> chunks of 2: means (0.5, 2.5, 4.5, 200.5),
    # overall mean 52.0 -> bits 0001
    payload = bytes([0, 1, 2, 3, 4, 5, 200, 201])
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = average_hash(df, grid=4).collect()
    assert rows[0]["ahash"] == "0001"


def test_ahash_empty_and_short(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"")), (2, bytearray(b"\xff"))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r["ahash"] for r in average_hash(df, grid=4).collect()}
    assert out[1] == "0000"  # empty payload -> all zero
    # single byte lands in chunk 0; mean == overall mean -> strict > is False
    assert out[2] == "0000"


def test_ahash_deterministic_across_partitions(spark):
    data = [(i, bytearray(bytes([(i * 7 + j) % 256 for j in range(100)]))) for i in range(20)]
    df1 = spark.createDataFrame(data, "media_id long, payload binary").repartition(1)
    df8 = spark.createDataFrame(data, "media_id long, payload binary").repartition(8)
    h1 = {r["media_id"]: r["ahash"] for r in average_hash(df1).collect()}
    h8 = {r["media_id"]: r["ahash"] for r in average_hash(df8).collect()}
    assert h1 == h8


def test_resize_media_fake(spark):
    from radohydro_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(100)))), (2, bytearray(b"")), (3, bytearray(b"\x07"))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in resize_media(df, 4, 4, fake=True).collect()}
    assert all(len(r["payload"]) == 16 for r in out.values())
    # nearest-neighbor sampling: index i -> byte floor(i*100/16)
    assert list(out[1]["payload"]) == [(i * 100) // 16 for i in range(16)]
    assert list(out[2]["payload"]) == [0] * 16          # empty -> zero pad
    assert list(out[3]["payload"]) == [7] * 16          # single byte repeats


def test_resize_media_raises_without_fake(spark):
    import pytest
    from radohydro_spark.operators.multimodal import resize_media

    df = spark.createDataFrame([(1, bytearray(b"abc"))], "media_id long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        resize_media(df, 2, 2, fake=False).collect()


def test_repetition_stats_hand_computed(spark):
    from radohydro_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z w")], "doc_id int, text string"
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    # doc1 bigrams: "a b","b a","a b","b a" -> 4 total, top appears 2x
    assert got[1].n_ngrams == 4
    assert got[1].top_ngram_share == 0.5
    assert got[1].dup_ngram_frac == 0.5
    # doc2 bigrams all distinct
    assert got[2].n_ngrams == 3
    assert got[2].top_ngram_share == round(1 / 3, 6)
    assert got[2].dup_ngram_frac == 0.0


def test_html_to_text_golden(spark):
    from pyspark.sql import functions as F

    from radohydro_spark.functions.text import html_to_text

    html = (
        "<html><head><style>p{}</style><script>var a='<b>x</b>';</script></head>"
        "<body><h1>Title</h1><p>Hello &amp; &lt;world&gt;</p>"
        "<p>&amp;amp; stays encoded once</p></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "id int, h string")
    out = df.select(html_to_text("h").alias("t")).collect()[0]["t"]
    # script/style content dropped, tags stripped, single-decode entities
    assert out == "Title Hello & <world> &amp; stays encoded once"


def test_unigram_logprob_orders_quality(spark):
    from pyspark.sql import functions as F

    from radohydro_spark.functions.text import unigram_logprob

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows.append((100, "zxqj vvkw qqqpp zzyyx wwoo"))  # gibberish: all OOV-ish
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_logprob(df, min_count=2).collect()}
    # fluent docs share every token -> much higher avg logprob than gibberish
    assert out[0].avg_logprob > out[100].avg_logprob + 1.0
    assert out[0].n_tokens == 9
    # all fluent copies score identically
    assert out[0].avg_logprob == out[7].avg_logprob


def test_inverted_index_caps_postings(spark):
    from radohydro_spark.functions.text import inverted_index

    rows = [(i, "common unique%d" % i) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["term"]: r for r in inverted_index(df, max_postings=5).collect()}
    # 'common' appears in all 20 docs: df exact, postings capped at 5
    assert got["common"]["df"] == 20
    assert got["common"]["postings"] == [0, 1, 2, 3, 4]
    assert got["unique7"]["df"] == 1 and got["unique7"]["postings"] == [7]
    # duplicate occurrences within one doc count once
    df2 = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    got2 = {r["term"]: r["df"] for r in inverted_index(df2).collect()}
    assert got2 == {"a": 1, "b": 1}


def test_resize_media_real_roundtrip(spark):
    import numpy as np

    from radohydro_spark.operators.multimodal import decode_media, resize_media
    from radohydro_spark.sources.bmp import encode_bmp
    from radohydro_spark.sources.png import decode_png

    px = np.arange(120, dtype=np.uint8).reshape(10, 12)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px)))], "media_id long, payload binary"
    )
    row = resize_media(df, 4, 5, fake=False).collect()[0]
    img, ch = decode_png(bytes(row["payload"]))
    assert ch == 1 and img.shape == (5, 4)
    ys = (np.arange(5) * 10) // 5
    xs = (np.arange(4) * 12) // 4
    np.testing.assert_array_equal(img, px[np.ix_(ys, xs)])
    # resized payload chains back through decode_media
    out = decode_media(
        spark.createDataFrame(
            [(1, bytearray(row["payload"]))], "media_id long, payload binary"
        )
    ).collect()[0]
    assert (out.width, out.height, out.channels) == (4, 5, 1)
