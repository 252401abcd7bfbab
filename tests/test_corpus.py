"""Corpus source round-trips: JSONL / CSV / raw text onto DOCUMENTS shape."""

from __future__ import annotations

import gzip
import json
import os

from radohydro_spark.sources.corpus import (
    read_csv_corpus,
    read_jsonl_corpus,
    read_text_corpus,
    write_jsonl_corpus,
)


def test_jsonl_roundtrip(spark, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    docs = [
        {"doc_id": 1, "text": "hello world", "lang": "en"},
        {"doc_id": 2, "text": "hallo welt", "lang": "de"},
    ]
    (p / "part0.jsonl").write_text("\n".join(json.dumps(d) for d in docs))
    df = read_jsonl_corpus(spark, str(p))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["text"] == "hello world" and rows[1]["lang"] == "en"
    assert rows[2]["n_chars"] == 10 and rows[2]["source"] == "jsonl"

    out = tmp_path / "out"
    write_jsonl_corpus(df, str(out), compression=None)
    back = read_jsonl_corpus(spark, str(out))
    assert {r["text"] for r in back.collect()} == {"hello world", "hallo welt"}


def test_jsonl_gz_and_missing_ids(spark, tmp_path):
    p = tmp_path / "gz"
    p.mkdir()
    with gzip.open(p / "a.jsonl.gz", "wt") as f:
        f.write(json.dumps({"text": "no id here"}) + "\n")
        f.write(json.dumps({"text": "another"}) + "\n")
    df = read_jsonl_corpus(spark, str(p))
    rows = df.collect()
    assert len(rows) == 2
    ids = {r["doc_id"] for r in rows}
    assert len(ids) == 2 and all(i is not None and i >= 0 for i in ids)
    # content-addressed: same text -> same id on re-read
    again = {r["text"]: r["doc_id"] for r in read_jsonl_corpus(spark, str(p)).collect()}
    assert again["no id here"] in ids


def test_csv_corpus_quoted_newlines(spark, tmp_path):
    p = tmp_path / "csv"
    p.mkdir()
    (p / "d.csv").write_text('doc_id,text\n1,"line one\nline two"\n2,plain\n')
    df = read_csv_corpus(spark, str(p))
    rows = {r["doc_id"]: r["text"] for r in df.collect()}
    assert rows[1] == "line one\nline two"
    assert rows[2] == "plain"


def test_text_corpus_file_per_doc(spark, tmp_path):
    p = tmp_path / "txt"
    p.mkdir()
    (p / "a.txt").write_text("doc A contents")
    (p / "b.txt").write_text("doc B")
    df = read_text_corpus(spark, str(p))
    rows = df.collect()
    assert len(rows) == 2
    by_text = {r["text"]: r for r in rows}
    assert by_text["doc A contents"]["source"].endswith("a.txt")
    assert by_text["doc B"]["n_chars"] == 5


def test_jsonl_no_inference_pass(spark, tmp_path):
    """The reader must carry an explicit schema — json() with schema does
    not trigger an inference job (checked via the analyzed schema, which
    would otherwise include corrupt-record handling of sampled rows)."""
    p = tmp_path / "s"
    p.mkdir()
    (p / "x.jsonl").write_text(json.dumps({"text": "t", "doc_id": 5}))
    df = read_jsonl_corpus(spark, str(p))
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
