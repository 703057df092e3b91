"""Identity pins for the round-14 codegen gram rewrites: the streaming
Generate forms must stay row-for-row equal to the gram-ARRAY reference
forms they replaced, on exactly the degenerate inputs where the two
constructions could drift (NULL text, empty text, whitespace-only,
single-token docs, docs shorter than n, within-doc duplicate grams,
multi-space token gaps).

- :func:`dedup.ngram_positions` ≡ ``[pos]explode(ngram_list_from_
  tokens(tokens(text), n))`` — multiplicity AND position.
- :func:`dedup.minhash_signatures` (streaming, no distinct) ≡ the
  k-way MIN aggregate over the distinct gram arrays
  (:func:`dedup.shingles` / :func:`dedup.char_shingles`) — MIN over
  duplicates equals MIN over the distinct set, word and char grain.
"""

from pyspark.sql import functions as F

from spear_spark.operators.dedup import (
    MERSENNE31,
    _minhash_sig_from_arrays,
    char_shingles,
    minhash_signatures,
    ngram_list_from_tokens,
    ngram_positions,
    shingles,
)
from spear_spark.operators.text import tokens

ROWS = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "alpha beta alpha beta alpha beta alpha beta"),  # dup grams
    (3, None),
    (4, ""),
    (5, "   "),
    (6, "single"),
    (7, "two tokens"),
    (8, "exactly three tokens"),
    (9, "multi   space\tgap tokens here"),
    (10, "ALPHA Beta GAMMA delta"),  # case-normalization path
]


def _docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() == b.count()


def test_ngram_positions_matches_array_explode(spark):
    docs = _docs(spark)
    for n in (1, 2, 3, 8):
        ref = docs.select(
            "doc_id", tokens("text").alias("_t")
        ).select(
            "doc_id",
            F.explode(ngram_list_from_tokens(F.col("_t"), n)).alias("gram"),
        )
        new = ngram_positions(docs, [F.col("doc_id")], tokens("text"), n)
        _assert_same(ref, new.select("doc_id", "gram"))


def test_ngram_positions_positional_parity(spark):
    docs = _docs(spark)
    for n in (2, 3):
        ref = docs.select(
            "doc_id", tokens("text").alias("_t")
        ).select(
            "doc_id",
            F.posexplode(ngram_list_from_tokens(F.col("_t"), n)).alias(
                "pos0", "gram"
            ),
        )
        new = ngram_positions(
            docs, [F.col("doc_id")], tokens("text"), n, pos_alias="pos0"
        ).select("doc_id", "pos0", "gram")
        _assert_same(ref, new)


def test_minhash_signatures_match_array_reference(spark):
    docs = _docs(spark)
    for kw, grams in (
        ({}, shingles("text", 3)),
        ({"char_n": 7}, char_shingles("text", 7)),
        ({"char_n": 2}, char_shingles("text", 2)),
    ):
        ref = _minhash_sig_from_arrays(
            docs.select(F.col("doc_id"), grams.alias("_shs")), "doc_id", 12
        )
        new = minhash_signatures(docs, "text", "doc_id", k=12, **kw)
        _assert_same(ref, new)


def test_minhash_signatures_drop_gramless_docs(spark):
    # NULL / empty / whitespace-only / shorter-than-n docs emit NO
    # signature row — the gram-array convention the streaming form
    # must preserve (they cannot near-dup match; the oracle GROUP BY
    # drops them identically).
    docs = _docs(spark)
    word_ids = {
        r.doc_id
        for r in minhash_signatures(docs, "text", "doc_id", k=4).collect()
    }
    assert word_ids == {1, 2, 8, 9, 10}  # >= 3 tokens only
    char_ids = {
        r.doc_id
        for r in minhash_signatures(
            docs, "text", "doc_id", k=4, char_n=7
        ).collect()
    }
    # >= 7 normalized chars: doc 6 "single" has 6, doc 5 trims to ""
    assert 3 not in char_ids and 4 not in char_ids and 5 not in char_ids
    assert {1, 2, 7, 8, 9, 10} <= char_ids
