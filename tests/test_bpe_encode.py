"""BPE encoding (tokenizer inference) — token-level equality against
a pure-Python reference encoder, plus order/coverage properties."""

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


def _ref_encode_word(word: str, merges: list[tuple[str, str]]) -> list:
    """Reference BPE application: merges in rank order, each applied
    left-to-right greedily (the _apply_merge contract)."""
    syms = list(word)
    for left, right in merges:
        out = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "low lower lowest"),
        (2, "low low newer newest"),
        (3, "wider new low a"),
        (4, "the newest lowest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_encode_matches_python_reference(corpus):
    from aws_dms_cdc_data_pipeline_spark.operators.bpe import (
        encode_documents,
        learn_bpe_merges,
    )

    merges_df = learn_bpe_merges(corpus, 6)
    merges = [
        (r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()
    ]
    assert merges  # corpus is mergeable
    got = {
        r.doc_id: list(r.tokens)
        for r in encode_documents(corpus, merges).collect()
    }
    for doc_id, text in corpus.collect():
        want = []
        for w in text.split():
            want.extend(_ref_encode_word(w, merges))
        assert got[doc_id] == want, doc_id


def test_encode_covers_single_char_words(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.bpe import (
        encode_documents,
    )

    df = spark.createDataFrame([(1, "a bb a")], "doc_id long, text string")
    out = encode_documents(df, [("b", "b")]).collect()[0]
    # short words pass through; merge applies to bb
    assert list(out.tokens) == ["a", "bb", "a"]
    assert out.n_tokens == 3


def test_encode_requires_merges(corpus):
    from aws_dms_cdc_data_pipeline_spark.operators.bpe import (
        encode_documents,
    )

    with pytest.raises(ValueError, match="non-empty"):
        encode_documents(corpus, [])


def test_fertility_stats_hand_computed(spark):
    """E250: grouped fertility sums and single-division ratios match
    a hand computation; zero-word docs are excluded from every sum."""
    from aws_dms_cdc_data_pipeline_spark.operators.bpe import (
        fertility_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "abab ab", "en", "web"),
            (2, "ab cd", "en", "web"),
            (3, "abab abab", "de", "web"),
            (4, "   ", "en", "web"),  # zero words -> excluded
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = fertility_stats(df, [("a", "b")]).collect()
    rows = {(r.lang, r.source): r for r in out}
    assert set(rows) == {("en", "web"), ("de", "web")}
    en = rows[("en", "web")]
    # doc1: abab->ab+ab (2 toks), ab->ab (1); doc2: ab(1) + c,d(2)
    # words: 2+2=4; chars: 6+4=10; tokens: 3+3=6
    assert (en.n_docs, en.n_words, en.n_chars, en.n_tokens) == \
        (2, 4, 10, 6)
    assert en.tokens_per_word == 6.0 / 4.0
    assert en.chars_per_token == 10.0 / 6.0
    de = rows[("de", "web")]
    assert (de.n_docs, de.n_words, de.n_chars, de.n_tokens) == \
        (1, 2, 8, 4)
