"""Identity pin for the round-15 codegen CDC-chunk rewrite: the
streaming Generate form of :func:`text.cdc_chunks` (fused hash+filter
boundary pass, ``posexplode(ends)`` + per-chunk codegen
``concat_ws(slice(...))``) must stay row-for-row equal to the
pre-r15 array reference form (``transform`` hash array + ``filter``
+ interpreted ``zip_with`` chunk builder + ``posexplode(chunks)``)
on exactly the inputs where the two constructions could drift:
NULL / empty / whitespace-only text, single-token docs, boundary on
the last token, every-token boundaries (modulus=1), no interior
boundary, multi-space token gaps, and n_tokens derived from the
slice length instead of re-splitting the chunk text.
"""

from pyspark.sql import Column, functions as F

from spear_spark.functions import let_
from spear_spark.operators.dedup import h32
from spear_spark.operators.text import cdc_chunks, tokens

ROWS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta alpha beta alpha beta alpha beta alpha beta"),
    (3, None),
    (4, ""),
    (5, "   "),
    (6, "single"),
    (7, "two tokens"),
    (8, "multi   space\tgap tokens here and more words beyond that"),
    (9, "ALPHA Beta GAMMA delta EPSILON zeta ETA theta"),
    (10, "the quick brown fox jumps over the lazy dog again and again"),
]


def _cdc_chunks_array_form(df, text_col, id_col, modulus):
    """The pre-r15 implementation, verbatim: the array reference."""

    def body(toks: Column) -> Column:
        n = F.size(toks)
        hs = F.transform(toks, h32)

        def chunks_of(hs_b: Column) -> Column:
            cut = F.filter(
                F.sequence(F.lit(1), n),
                lambda i: F.element_at(hs_b, i) % modulus == 0,
            )
            ends = F.when(
                (F.size(cut) > 0) & (F.element_at(cut, -1) == n), cut
            ).otherwise(F.concat(cut, F.array(n)))
            starts = F.concat(
                F.array(F.lit(0)), F.slice(ends, 1, F.size(ends) - 1)
            )
            return F.zip_with(
                starts,
                ends,
                lambda s, e: F.concat_ws(" ", F.slice(toks, s + 1, e - s)),
            )

        return F.when(n > 0, let_(hs, chunks_of)).otherwise(
            F.array().cast("array<string>")
        )

    chunked = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), let_(tokens(F.col(text_col)), body).alias("_chunks")
    )
    return chunked.select(
        id_col,
        F.posexplode("_chunks").alias("chunk_idx", "chunk_text"),
    ).select(
        id_col,
        "chunk_idx",
        F.size(F.split("chunk_text", " ")).alias("n_tokens"),
        F.md5("chunk_text").alias("chunk_hash"),
        "chunk_text",
    )


def _docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() == b.count()


def test_cdc_chunks_matches_array_form(spark):
    docs = _docs(spark)
    for modulus in (1, 2, 4, 16):
        ref = _cdc_chunks_array_form(docs, "text", "doc_id", modulus)
        new = cdc_chunks(docs, "text", "doc_id", modulus=modulus)
        assert [f.dataType for f in new.schema.fields] == [
            f.dataType for f in ref.schema.fields
        ]
        assert new.columns == ref.columns
        _assert_same(ref, new)


def test_cdc_chunks_blank_docs_emit_nothing(spark):
    docs = _docs(spark)
    ids = {
        r.doc_id for r in cdc_chunks(docs, "text", "doc_id", modulus=4).collect()
    }
    assert ids == {1, 2, 6, 7, 8, 9, 10}  # NULL/empty/whitespace drop


def test_cdc_chunks_reassembles_document(spark):
    # concatenating a doc's chunks in chunk_idx order restores its
    # normalized token stream, and n_tokens sums to the token count —
    # the invariant that pins both the slice boundaries and the
    # derived n_tokens column
    docs = _docs(spark).filter(F.col("doc_id") == 10)
    out = (
        cdc_chunks(docs, "text", "doc_id", modulus=2)
        .orderBy("chunk_idx")
        .collect()
    )
    joined = " ".join(r.chunk_text for r in out)
    assert joined == "the quick brown fox jumps over the lazy dog again and again"
    assert sum(r.n_tokens for r in out) == 12
    assert all(
        r.n_tokens == len(r.chunk_text.split(" ")) for r in out
    )
