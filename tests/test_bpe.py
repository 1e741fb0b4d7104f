"""BPE merge learning vs a pure-Python reference implementation."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.bpe import (
    learn_bpe_merges,
    pair_counts,
    segment_words,
    word_symbol_table,
)


def ref_bpe(words: dict[str, int], n: int):
    """Reference greedy BPE (Sennrich et al. 2016 formulation over the
    word-frequency table; ties break on (left, right) lexicographic)."""
    vocab = {w: list(w) for w in words}
    merges = []
    for rank in range(n):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + words[w]
        if not counts:
            break
        (a, b), wt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, wt))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest",
]


def _word_counts(lines):
    out: dict[str, int] = {}
    for line in lines:
        for w in line.split():
            if len(w) >= 2:
                out[w] = out.get(w, 0) + 1
    return out


def test_word_symbol_table(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = {
        r["word"]: (r["weight"], r["symbols"])
        for r in word_symbol_table(df).collect()
    }
    want = _word_counts(CORPUS)
    assert {w: c for w, (c, _) in got.items()} == want
    for w, (_, syms) in got.items():
        assert syms == list(w)


def test_pair_counts_match_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = {
        (r["left"], r["right"]): r["pair_weight"]
        for r in pair_counts(word_symbol_table(df)).collect()
    }
    words = _word_counts(CORPUS)
    want: dict[tuple[str, str], int] = {}
    for w, c in words.items():
        for a, b in zip(w, w[1:]):
            want[(a, b)] = want.get((a, b), 0) + c
    assert got == want


def test_learned_merges_match_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["weight"])
        for r in learn_bpe_merges(df, 8).orderBy("rank").collect()
    ]
    want, _ = ref_bpe(_word_counts(CORPUS), 8)
    assert got == want


def test_segmentation_matches_reference_vocab(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, ref_vocab = ref_bpe(_word_counts(CORPUS), 6)
    seg = segment_words(
        word_symbol_table(df), [(m[1], m[2]) for m in merges]
    )
    got = {r["word"]: r["symbols"] for r in seg.collect()}
    assert got == ref_vocab


def test_greedy_left_to_right_overlap(spark):
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    vocab = segment_words(word_symbol_table(df), [("a", "a")])
    [row] = vocab.collect()
    assert row["symbols"] == ["aa", "aa"]


def test_early_stop_when_no_pairs_left(spark):
    df = spark.createDataFrame([("ab ab ab",)], "text string")
    merges = learn_bpe_merges(df, 10).collect()
    assert len(merges) == 1  # after merging (a,b) no pair remains
    assert merges[0]["merged"] == "ab"
