"""Real BPE tokenizer tests (`operators/bpe.py`): merge learning pinned
on crafted corpora, lossless round trip on arbitrary unicode, and the
distributed broadcast-encode path over the documents table."""

from __future__ import annotations

import pytest

from pm25ml_spark.operators.bpe import (
    BpeTokenizer,
    bpe_token_counts,
    train_bpe,
    train_bpe_from_corpus,
    word_frequencies,
)


class TestTraining:
    def test_learns_the_dominant_pair_first(self):
        # 'ab' appears 2x per "abab" word x 50 = the clear winner
        merges = train_bpe([("abab", 50), ("cd", 3)], n_merges=1)
        assert merges == [(ord("a"), ord("b"))]

    def test_merges_compose_into_whole_words(self):
        merges = train_bpe([("aaaa", 100)], n_merges=3)
        tok = BpeTokenizer(merges)
        # after (a,a)->257, (257,257)->258, the word is 2 symbols:
        # the merged block + its end-of-word form
        assert len(tok.encode_word("aaaa")) <= 2

    def test_deterministic_tie_break(self):
        m1 = train_bpe([("ab", 5), ("cd", 5)], n_merges=1)
        m2 = train_bpe([("cd", 5), ("ab", 5)], n_merges=1)
        assert m1 == m2 == [(ord("a"), ord("b"))]

    def test_stops_when_nothing_repeats(self):
        merges = train_bpe([("xy", 1)], n_merges=50)
        assert len(merges) < 50


class TestRoundTrip:
    @pytest.mark.parametrize(
        "text",
        [
            "the quick brown fox jumps over the lazy dog",
            "ünïcödé wörds ünïcödé wörds",
            "a",
            "repeated repeated repeated tokens tokens",
        ],
    )
    def test_decode_inverts_encode(self, text):
        freqs = [(w, 1) for w in set(text.split())]
        tok = BpeTokenizer(train_bpe(freqs, n_merges=30))
        assert tok.decode(tok.encode(text)) == text

    def test_unseen_words_still_encode_losslessly(self):
        tok = BpeTokenizer(train_bpe([("hello", 10)], n_merges=10))
        # byte-level alphabet: no unknown-token case, ever
        assert tok.decode(tok.encode("совершенно new words")) == (
            "совершенно new words"
        )

    def test_compression_on_repetitive_corpus(self):
        words = [("tokenization", 500), ("tokens", 300), ("token", 200)]
        tok = BpeTokenizer(train_bpe(words, n_merges=60))
        n = len(tok.encode_word("tokenization"))
        assert n < len("tokenization".encode())  # genuinely merged


class TestDistributed:
    def test_corpus_train_and_broadcast_count(self, spark, sf_dir):
        from pm25ml_spark.catalog import load_table

        docs = load_table(spark, sf_dir, "documents").limit(200)
        tok = train_bpe_from_corpus(docs, n_merges=80)
        assert len(tok.merges) > 0
        counts = bpe_token_counts(docs, tok).toPandas()
        assert len(counts) == docs.count()
        assert (counts["n_tokens"] > 0).all()
        # subword tokenization compresses: tokens < bytes on real text
        assert counts["n_tokens"].sum() < counts["n_bytes"].sum()
        # spot-check one doc against the driver-side encoder
        row = docs.select("doc_id", "text").first()
        got = counts.set_index("doc_id").loc[row.doc_id, "n_tokens"]
        assert got == len(tok.encode(row.text))

    def test_word_frequencies_distributed(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b a"), (2, "b  c")], "doc_id long, text string"
        )
        wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
        assert wf == {"a": 2, "b": 2, "c": 1}
