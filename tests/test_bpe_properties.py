"""Property-based BPE checks: random corpora must match the reference
implementation exactly (hypothesis drives corpus shapes unit tests
wouldn't think of: repeated chars, single-word lines, overlap-heavy
vocabularies)."""

from hypothesis import given, settings, strategies as st

from aws_dms_cdc_data_pipeline_spark.operators.bpe import (
    learn_bpe_merges,
    segment_words,
    word_symbol_table,
)
from tests.test_bpe import ref_bpe

_word = st.text(alphabet="abcd", min_size=2, max_size=6)
_line = st.lists(_word, min_size=1, max_size=8).map(" ".join)
_corpus = st.lists(_line, min_size=1, max_size=4)


def _counts(lines):
    out = {}
    for line in lines:
        for w in line.split():
            if len(w) >= 2:
                out[w] = out.get(w, 0) + 1
    return out


@settings(max_examples=8, deadline=None)
@given(corpus=_corpus, n=st.integers(min_value=1, max_value=5))
def test_learned_merges_always_match_reference(spark, corpus, n):
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["weight"])
        for r in learn_bpe_merges(df, n).orderBy("rank").collect()
    ]
    want, _ = ref_bpe(_counts(corpus), n)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(corpus=_corpus)
def test_segmentation_reconstructs_words(spark, corpus):
    """Whatever the merges, concatenating a word's segments must
    reproduce the word (segmentation is a partition of the chars)."""
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    merges, _ = ref_bpe(_counts(corpus), 4)
    seg = segment_words(word_symbol_table(df), [(m[1], m[2]) for m in merges])
    for r in seg.collect():
        assert "".join(r["symbols"]) == r["word"]


# --- span excision property (same harness, shares the spark fixture) ---



@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_excise_matches_python_slice_removal(spark, data):
    from aws_dms_cdc_data_pipeline_spark.operators.dedup import excise_spans

    text = data.draw(st.text(alphabet="abcxyz ", min_size=0, max_size=60))
    # random disjoint sorted 1-based half-open spans inside the text
    # (each span needs two unique bounds from [1, len+1])
    max_spans = min(3, (len(text) + 1) // 2)
    n_spans = data.draw(st.integers(min_value=0, max_value=max_spans))
    bounds = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=max(len(text), 1) + 1),
                min_size=2 * n_spans,
                max_size=2 * n_spans,
                unique=True,
            )
        )
    )
    spans = [(bounds[2 * i], bounds[2 * i + 1]) for i in range(n_spans)]

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sp = spark.createDataFrame(
        [(1, s, e) for s, e in spans],
        "doc_id long, span_start long, span_end long",
    )
    [row] = excise_spans(docs, sp).collect()

    want = ""
    pos = 1
    for s, e in spans:
        want += text[pos - 1 : s - 1]
        pos = e
    want += text[pos - 1 :]
    assert row["text"] == want
