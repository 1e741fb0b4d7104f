"""Multinomial Naive-Bayes train+classify (operators/classify.py)."""

import math

import pytest

from aws_dms_cdc_data_pipeline_spark.operators.classify import (
    nb_classify,
    nb_confusion,
)


def _py_nb(rows, alpha=1.0):
    """Independent fixed-point reference implementation."""
    import re
    toks = {
        i: [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        for i, (text, _) in rows.items()
    }
    labeled = {i for i, (_, l) in rows.items() if l is not None}
    classes = sorted({rows[i][1] for i in labeled})
    n_docs = len(labeled)
    vocab = sorted({t for i in labeled for t in toks[i]})
    v = len(vocab)
    q = lambda x: round(x * 1e6)
    out = {}
    for c in classes:
        docs_c = [i for i in labeled if rows[i][1] == c]
        tot_c = sum(len(toks[i]) for i in docs_c)
        prior_q = q(math.log(len(docs_c) / n_docs))
        floor_q = q(math.log(alpha / (tot_c + alpha * v)))
        counts = {}
        for i in docs_c:
            for t in toks[i]:
                counts[t] = counts.get(t, 0) + 1
        for i in rows:
            sc = prior_q + len(toks[i]) * floor_q
            for t in set(toks[i]):
                tf = toks[i].count(t)
                if t in counts:
                    lq = q(math.log((counts[t] + alpha) / (tot_c + alpha * v)))
                    sc += tf * (lq - floor_q)
            out.setdefault(i, []).append((sc, c))
    return {
        i: max(scs, key=lambda x: (x[0], [-ord(ch) for ch in x[1]]))[1]
        if False else sorted(scs, key=lambda x: (-x[0], x[1]))[0]
        for i, scs in out.items()
    }


def test_nb_classify_vs_reference(spark):
    """Predictions and quantized scores match an independent Python
    reference; unlabeled docs classify; ties break by class ASC."""
    rows = {
        1: ("spark shuffle spark join", "eng"),
        2: ("spark broadcast join", "eng"),
        3: ("der die das und", "ger"),
        4: ("und der spark", "ger"),
        5: ("spark spark shuffle", None),     # unlabeled: still scored
        6: ("der und das", None),
    }
    df = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in rows.items()],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: (r["predicted"], r["score"])
        for r in nb_classify(df, label_col="lang", text_col="text").collect()
    }
    ref = _py_nb(rows)
    for i in rows:
        sc_q, cls = ref[i]
        assert got[i][0] == cls, (i, got[i], ref[i])
        assert got[i][1] == pytest.approx(sc_q / 1e6, abs=1e-9)
    # sanity: the spark-ish unlabeled doc routes to eng, the german to ger
    assert got[5][0] == "eng" and got[6][0] == "ger"


def test_nb_confusion_shape_and_diagonal(spark):
    """Separable classes resubstitute perfectly; matrix ordered."""
    rows = [
        (1, "alpha beta alpha", "a"), (2, "alpha beta beta", "a"),
        (3, "gamma delta gamma", "b"), (4, "delta delta gamma", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = [tuple(r) for r in nb_confusion(df, label_col="lang").collect()]
    assert got == [("a", "a", 2), ("b", "b", 2)]
    with pytest.raises(ValueError, match="alpha"):
        nb_classify(df, label_col="lang", alpha=0.0)
    empty = df.withColumn("lang", df.lang.cast("string")).filter("1=0")
    with pytest.raises(ValueError, match="labeled"):
        nb_classify(empty, label_col="lang")


def test_stats_memo_refreshes_after_in_place_overwrite(spark, tmp_path):
    """The r17 verdict's stale-stats hole (ask #5): the BM25/NB/DSIR
    stats memos keyed only on the plan's semanticHash served STALE
    model statistics after an in-place overwrite of the source table
    at the same path within one session. The r18 key adds the input
    file set (the _ARTIFACT_MEMO shape): an overwrite writes new part
    files, so the memo re-collects. Exercised end-to-end through
    nb_classify — training stats must reflect the rewritten corpus."""
    p = str(tmp_path / "corpus")
    rows_v1 = [
        (1, "alpha alpha beta", "a"), (2, "alpha beta beta", "a"),
        (3, "gamma delta gamma", "b"), (4, "delta delta gamma", "b"),
        (5, "alpha beta gamma", None),
    ]
    schema = "doc_id long, text string, lang string"
    spark.createDataFrame(rows_v1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    first = {
        r["doc_id"]: (r["predicted"], r["score"])
        for r in nb_classify(
            spark.read.parquet(p), label_col="lang"
        ).collect()
    }
    assert first[5][0] == "a"
    # overwrite IN PLACE: same path, flipped vocabulary — the
    # unlabeled doc now matches class b's training text
    rows_v2 = [
        (1, "gamma delta gamma", "a"), (2, "delta delta gamma", "a"),
        (3, "alpha alpha beta", "b"), (4, "alpha beta beta", "b"),
        (5, "alpha beta gamma", None),
    ]
    spark.createDataFrame(rows_v2, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    second = {
        r["doc_id"]: (r["predicted"], r["score"])
        for r in nb_classify(
            spark.read.parquet(p), label_col="lang"
        ).collect()
    }
    # fresh stats: the unlabeled doc flips to class b; a stale memo
    # would have reproduced the v1 prediction
    assert second[5][0] == "b", (
        "stale training stats served after in-place overwrite"
    )
