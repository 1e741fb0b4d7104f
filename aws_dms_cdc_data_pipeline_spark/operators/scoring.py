"""Relevance-scoring queries beyond ``function_score``: the
OpenSearch ``rank_feature``, ``distance_feature``, ``pinned``, and
decay-``function_score`` shapes.

Reference parity: these are the remaining score-shaping queries the
reference's OpenSearch Discover surface exposes (README.md:388-441
exercises the query DSL against the indexed CDC documents); each maps
to one pure-DataFrame pipeline here, with the BM25 legs shared with
:mod:`aws_dms_cdc_data_pipeline_spark.operators.search`.

Determinism stance (the repo-wide oracle contract): every scoring
formula below is a composition of single correctly-rounded IEEE-754
ops (one division, one multiply, max/min) on top of the
quantized-exact BM25 doubles — bit-identical between the JVM and an
independent engine. The log/exp-based variants (ES ``log`` rank
function, ``gauss``/``exp`` decay) are either excluded with a
documented reason or offered as extra modes gated behind rows-only
verification, because libm transcendentals are NOT guaranteed
bit-identical across engines.

Scale shape: all pipelines are (narrow projection → 1-row collected
stats → row-wise scoring expression → TakeOrderedAndProject). No
corpus text is ever shuffled; feature columns attach by id-keyed
joins moving (id, value) pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
    local_relation as _local_relation,
)

from aws_dms_cdc_data_pipeline_spark.operators.search import (
    _bm25_adhoc_proj,
    _bm25_adhoc_scores,
)

_RANK_FUNCS = ("saturation", "linear")
_DECAY_KINDS = ("linear", "exp", "gauss")


def rank_feature_search(
    docs: DataFrame,
    query_terms: list[str],
    *,
    feature_col: str,
    pivot: float,
    boost: float = 1.0,
    function: str = "saturation",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """``rank_feature`` query — boost text relevance by a numeric
    document feature (pagerank/popularity/length), the OpenSearch
    bool-should shape::

        bool: { must: match(text), should: rank_feature(field) }

    Score = BM25(match) + boost · S(feature) where S is

    - ``saturation``: fv / (fv + pivot)  (ES default; bounded [0,1))
    - ``linear``:     fv                  (raw positive signal)

    ES's ``log`` function is excluded: libm log is not bit-identical
    across engines (same stance as ``textbook=False`` idf); ES's
    ``sigmoid`` is excluded because non-integer ``pow`` is likewise
    not portable. ``saturation`` is one add + one divide — exact.

    Docs with a NULL/negative feature contribute 0 from the feature
    leg (ES skips the should-clause for docs missing the feature).
    Matching set = the BM25 match set (the must leg); the feature
    never creates matches on its own.

    Returns (id, base_score, n_terms_hit, feature_score, score)
    ordered (score DESC, id ASC), top_k.

    Scale: BM25 legs identical to :func:`...search.bm25_search`'s
    ad-hoc path (narrow tf projection, 1-row stats); the feature
    attaches via ONE id-keyed join of (id, fv) pairs; final cut is
    TakeOrderedAndProject.
    """
    if not query_terms:
        raise ValueError("rank_feature_search needs at least one query term")
    if function not in _RANK_FUNCS:
        raise ValueError(
            f"function must be one of {_RANK_FUNCS} (log/sigmoid are "
            "excluded: libm log and non-integer pow are not "
            "bit-identical across engines)"
        )
    if pivot <= 0:
        raise ValueError("pivot must be positive")
    terms = sorted({t.lower() for t in query_terms})
    proj = _bm25_adhoc_proj(docs, terms, text_col=text_col, id_col=id_col)
    scores = _bm25_adhoc_scores(proj, terms, id_col=id_col, k1=k1, b=b)
    fields = docs.select(
        F.col(id_col), F.col(feature_col).cast("double").alias("_fv")
    )
    fv = F.col("_fv")
    sat = {
        "saturation": fv / (fv + F.lit(float(pivot))),
        "linear": fv,
    }[function]
    feature_score = F.when(
        fv.isNotNull() & (fv > 0), F.lit(float(boost)) * sat
    ).otherwise(F.lit(0.0))
    return (
        scores.join(fields, id_col, "left")
        .select(
            F.col(id_col),
            F.col("score").alias("base_score"),
            F.col("n_terms_hit"),
            feature_score.alias("feature_score"),
            (F.col("score") + feature_score).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def rank_feature_oracle_sql(
    query_terms: list[str],
    *,
    feature_col: str,
    pivot: float,
    boost: float = 1.0,
    function: str = "saturation",
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """DuckDB SQL for the identical rank_feature ranking (same
    quantized-exact BM25, same single-division saturation)."""
    terms = sorted({t.lower() for t in query_terms})
    in_list = ", ".join(f"'{t}'" for t in terms)
    fv = "CAST(fv._fv AS DOUBLE)"
    sat = {
        "saturation": f"{fv} / ({fv} + CAST({float(pivot)!r} AS DOUBLE))",
        "linear": fv,
    }[function]
    fscore = (
        f"CASE WHEN fv._fv IS NOT NULL AND fv._fv > 0 "
        f"THEN CAST({float(boost)!r} AS DOUBLE) * ({sat}) "
        f"ELSE CAST(0.0 AS DOUBLE) END"
    )
    return f"""
    WITH tok AS (
        SELECT {id_col}, t.term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM {table},
             LATERAL (SELECT unnest(string_split_regex(lower({text_col}),
                                    '[^a-z0-9]+')) AS term) t
        WHERE t.term <> ''
        GROUP BY {id_col}, t.term
    ),
    dl AS (SELECT {id_col}, CAST(SUM(tf) AS BIGINT) AS dl
           FROM tok GROUP BY {id_col}),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS total_dl FROM dl),
    hits AS (SELECT * FROM tok WHERE term IN ({in_list})),
    dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM hits GROUP BY term),
    contrib AS (
        SELECT h.{id_col},
               CAST(round(
                   ((s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * ((h.tf * ({k1} + 1)) /
                      (h.tf + {k1} * ((1 - {b}) + {b} * l.dl
                                      / (CAST(s.total_dl AS DOUBLE) / s.n_docs))))
                   * 1000000, 0) AS BIGINT) AS cq
        FROM hits h JOIN dfs d USING (term)
                    JOIN dl l USING ({id_col})
                    CROSS JOIN stats s
    ),
    bm25 AS (
        SELECT {id_col},
               CAST(CAST(SUM(cq) AS DECIMAL(38,0)) / 1000000 AS DOUBLE)
                   AS base_score,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM contrib
        GROUP BY {id_col}
    ),
    fv AS (SELECT {id_col}, CAST({feature_col} AS DOUBLE) AS _fv
           FROM {table})
    SELECT b2.{id_col}, b2.base_score, b2.n_terms_hit,
           {fscore} AS feature_score,
           b2.base_score + ({fscore}) AS score
    FROM bm25 b2 LEFT JOIN fv ON b2.{id_col} = fv.{id_col}
    ORDER BY score DESC, b2.{id_col} ASC
    LIMIT {top_k}
    """


def distance_feature_events(
    events: DataFrame,
    *,
    event_type: str,
    origin: str,
    pivot_seconds: int,
    boost: float = 1.0,
    top_k: int = 25,
) -> DataFrame:
    """``distance_feature`` query on a date field — the OpenSearch
    recency-ranking shape: filter to one event type, score each hit
    by proximity of its timestamp to ``origin``::

        score = boost · pivot / (pivot + |ts − origin|)

    with the distance in WHOLE SECONDS (both engines store timestamps
    at microsecond integer precision; epoch-second distance is exact
    integer arithmetic, and the score is then one add + one divide —
    bit-identical cross-engine).

    Returns (event_id, user_id, distance_s, score) ordered
    (score DESC, event_id ASC), top_k.

    Scale: one filtered scan (the event_type predicate pushes to
    parquet), a row-wise scoring expression in the same codegen
    stage, TakeOrderedAndProject for the cut. Zero shuffles beyond
    the top-k reduction.
    """
    if pivot_seconds <= 0:
        raise ValueError("pivot_seconds must be positive")
    dist = F.abs(
        F.unix_timestamp(F.col("ts"))
        - F.unix_timestamp(F.lit(origin).cast("timestamp"))
    ).cast("long")
    pivot = F.lit(float(pivot_seconds))
    score = F.lit(float(boost)) * pivot / (pivot + dist.cast("double"))
    return (
        events.filter(F.col("event_type") == event_type)
        .select(
            "event_id",
            "user_id",
            dist.alias("distance_s"),
            score.alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("event_id").asc())
        .limit(top_k)
    )


def distance_feature_oracle_sql(
    *,
    event_type: str,
    origin: str,
    pivot_seconds: int,
    boost: float = 1.0,
    top_k: int = 25,
    table: str = "events",
) -> str:
    """DuckDB SQL for the identical distance_feature ranking (exact
    integer epoch-second distance, one divide)."""
    # floor(), not CAST: DuckDB epoch() is a DOUBLE carrying the
    # microsecond fraction and CAST rounds half-even, while Spark's
    # unix_timestamp() truncates to whole seconds.
    dist = (
        f"abs(CAST(floor(epoch(ts)) AS BIGINT) "
        f"- CAST(floor(epoch(TIMESTAMP '{origin}')) AS BIGINT))"
    )
    pivot = f"CAST({float(pivot_seconds)!r} AS DOUBLE)"
    return f"""
    SELECT event_id, user_id,
           CAST({dist} AS BIGINT) AS distance_s,
           CAST({float(boost)!r} AS DOUBLE) * {pivot}
               / ({pivot} + CAST({dist} AS DOUBLE)) AS score
    FROM {table}
    WHERE event_type = '{event_type}'
    ORDER BY score DESC, event_id ASC
    LIMIT {top_k}
    """


def pinned_search(
    docs: DataFrame,
    query_terms: list[str],
    *,
    pinned_ids: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """``pinned`` query — promote specific documents to the top of
    the result set, in the exact order given, ahead of the organic
    ranking (the OpenSearch merchandising shape: ids + organic
    query). Pinned docs are returned EVEN IF they do not match the
    organic query (ES semantics); organic docs that are pinned are
    not repeated in the organic tail.

    Returns (id, pinned, pin_pos, base_score, rank): pinned docs
    first at rank 1..P in list order (pin_pos = their index,
    base_score = their organic BM25 score or NULL if they don't
    match), then organic hits by (score DESC, id ASC). top_k applies
    to the combined list.

    Scale: the organic leg is the shared ad-hoc BM25 pipeline; the
    pinned leg is a P-row literal relation joined broadcast-style;
    the final order key (pinned DESC, pin_pos ASC, score DESC) cuts
    via TakeOrderedAndProject.
    """
    if not query_terms:
        raise ValueError("pinned_search needs at least one query term")
    if not pinned_ids:
        raise ValueError("pinned_search needs at least one pinned id")
    if len(set(pinned_ids)) != len(pinned_ids):
        raise ValueError("pinned ids must be unique")
    terms = sorted({t.lower() for t in query_terms})
    proj = _bm25_adhoc_proj(docs, terms, text_col=text_col, id_col=id_col)
    organic = _bm25_adhoc_scores(proj, terms, id_col=id_col, k1=k1, b=b)
    spark = docs.sparkSession
    pins = _local_relation(
        spark,
        [(int(i), p) for p, i in enumerate(pinned_ids)],
        f"{id_col} long, pin_pos int",
    )
    # Pinned docs must exist in the corpus even when they miss the
    # query: anchor on the corpus ids, not the organic hits.
    corpus_ids = docs.select(id_col)
    pinned_leg = (
        corpus_ids.join(F.broadcast(pins), id_col, "inner")
        .join(organic.select(id_col, "score"), id_col, "left")
        .select(
            F.col(id_col),
            F.lit(True).alias("pinned"),
            F.col("pin_pos").cast("int").alias("pin_pos"),
            F.col("score").alias("base_score"),
        )
    )
    organic_leg = (
        organic.join(F.broadcast(pins), id_col, "left_anti")
        .select(
            F.col(id_col),
            F.lit(False).alias("pinned"),
            F.lit(None).cast("int").alias("pin_pos"),
            F.col("score").alias("base_score"),
        )
    )
    combined = pinned_leg.unionByName(organic_leg)
    cut = combined.orderBy(
        F.col("pinned").desc(),
        F.col("pin_pos").asc_nulls_last(),
        F.col("base_score").desc_nulls_last(),
        F.col(id_col).asc(),
    ).limit(top_k)
    # The rank window runs over the ALREADY-CUT ≤top_k rows (ES
    # numbers hits within the returned page), so the
    # single-partition WindowExec is bounded by top_k, not the corpus.
    w_rank = F.row_number().over(
        Window.orderBy(
            F.col("pinned").desc(),
            F.col("pin_pos").asc_nulls_last(),
            F.col("base_score").desc_nulls_last(),
            F.col(id_col).asc(),
        )
    )
    return cut.select(
        F.col(id_col),
        "pinned",
        "pin_pos",
        "base_score",
        w_rank.alias("rank"),
    )


def pinned_oracle_sql(
    query_terms: list[str],
    *,
    pinned_ids: list[int],
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """DuckDB SQL for the identical pinned ranking."""
    terms = sorted({t.lower() for t in query_terms})
    in_list = ", ".join(f"'{t}'" for t in terms)
    pins = ", ".join(
        f"({int(i)}, {p})" for p, i in enumerate(pinned_ids)
    )
    return f"""
    WITH tok AS (
        SELECT {id_col}, t.term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM {table},
             LATERAL (SELECT unnest(string_split_regex(lower({text_col}),
                                    '[^a-z0-9]+')) AS term) t
        WHERE t.term <> ''
        GROUP BY {id_col}, t.term
    ),
    dl AS (SELECT {id_col}, CAST(SUM(tf) AS BIGINT) AS dl
           FROM tok GROUP BY {id_col}),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS total_dl FROM dl),
    hits AS (SELECT * FROM tok WHERE term IN ({in_list})),
    dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM hits GROUP BY term),
    contrib AS (
        SELECT h.{id_col},
               CAST(round(
                   ((s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * ((h.tf * ({k1} + 1)) /
                      (h.tf + {k1} * ((1 - {b}) + {b} * l.dl
                                      / (CAST(s.total_dl AS DOUBLE) / s.n_docs))))
                   * 1000000, 0) AS BIGINT) AS cq
        FROM hits h JOIN dfs d USING (term)
                    JOIN dl l USING ({id_col})
                    CROSS JOIN stats s
    ),
    organic AS (
        SELECT {id_col},
               CAST(CAST(SUM(cq) AS DECIMAL(38,0)) / 1000000 AS DOUBLE)
                   AS score
        FROM contrib GROUP BY {id_col}
    ),
    pins(pid, pin_pos) AS (VALUES {pins}),
    pinned_leg AS (
        SELECT d.{id_col}, TRUE AS pinned,
               CAST(p.pin_pos AS INT) AS pin_pos,
               o.score AS base_score
        FROM {table} d
        JOIN pins p ON d.{id_col} = p.pid
        LEFT JOIN organic o ON d.{id_col} = o.{id_col}
    ),
    organic_leg AS (
        SELECT o.{id_col}, FALSE AS pinned,
               CAST(NULL AS INT) AS pin_pos,
               o.score AS base_score
        FROM organic o
        WHERE o.{id_col} NOT IN (SELECT pid FROM pins)
    ),
    combined AS (
        SELECT * FROM pinned_leg UNION ALL SELECT * FROM organic_leg
    ),
    cut AS (
        SELECT *
        FROM combined
        ORDER BY pinned DESC, pin_pos ASC NULLS LAST,
                 base_score DESC NULLS LAST, {id_col} ASC
        LIMIT {top_k}
    )
    SELECT {id_col}, pinned, pin_pos, base_score,
           CAST(row_number() OVER (
               ORDER BY pinned DESC, pin_pos ASC NULLS LAST,
                        base_score DESC NULLS LAST, {id_col} ASC
           ) AS BIGINT) AS rank
    FROM cut
    """


def decay_function_score(
    df: DataFrame,
    *,
    date_col: str,
    origin: str,
    scale_seconds: int,
    offset_seconds: int = 0,
    decay: float = 0.5,
    kind: str = "linear",
    id_col: str,
    keep_cols: list[str] | None = None,
    top_k: int = 25,
) -> DataFrame:
    """Decay ``function_score`` on a date field — the OpenSearch
    recency-decay shape (gauss|exp|linear over |date − origin|): the
    canonical "rank the listing by freshness" query. Distance is
    exact integer epoch seconds; with ``d = max(0, |v−origin| −
    offset)``:

    - ``linear``: s = max(0, (S − d) / S) with S = scale/(1−decay) —
      one subtract + one divide + one max: bit-identical
      cross-engine, so the registry query uses this kind with a full
      DuckDB oracle.
    - ``exp``: s = exp(d · ln(decay)/scale)
    - ``gauss``: s = exp(d² · ln(decay)/scale²)

    The exp/gauss kinds use libm exp/log, which is NOT guaranteed
    bit-identical across engines — callers get them for real use,
    but cross-engine verification for them is rows-only (the repo's
    standard stance on transcendentals; property tests pin the
    Python-reference values instead).

    Returns (id, *keep_cols, distance_s, score) ordered
    (score DESC, id ASC), top_k.

    Scale: row-wise expression in the scan's codegen stage +
    TakeOrderedAndProject; no shuffle, no join.
    """
    if kind not in _DECAY_KINDS:
        raise ValueError(f"kind must be one of {_DECAY_KINDS}")
    if not (0.0 < decay < 1.0):
        raise ValueError("decay must be in (0, 1)")
    if scale_seconds <= 0:
        raise ValueError("scale_seconds must be positive")
    import math

    keep = keep_cols or []
    raw_dist = F.abs(
        F.unix_timestamp(F.col(date_col))
        - F.unix_timestamp(F.lit(origin).cast("timestamp"))
    ).cast("long")
    d = F.greatest(
        F.lit(0.0), raw_dist.cast("double") - F.lit(float(offset_seconds))
    )
    if kind == "linear":
        big_s = scale_seconds / (1.0 - decay)
        score = F.greatest(
            F.lit(0.0), (F.lit(big_s) - d) / F.lit(big_s)
        )
    elif kind == "exp":
        lam = math.log(decay) / scale_seconds
        score = F.exp(d * F.lit(lam))
    else:  # gauss
        lam = math.log(decay) / (float(scale_seconds) ** 2)
        score = F.exp(d * d * F.lit(lam))
    return (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in keep],
            raw_dist.alias("distance_s"),
            score.alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def decay_linear_oracle_sql(
    *,
    date_col: str,
    origin: str,
    scale_seconds: int,
    offset_seconds: int = 0,
    decay: float = 0.5,
    id_col: str,
    keep_cols: list[str] | None = None,
    top_k: int = 25,
    table: str = "orders",
) -> str:
    """DuckDB SQL for the linear decay kind (the oracle-exact one)."""
    keep = ", ".join(keep_cols or [])
    keep = f"{keep}, " if keep else ""
    raw = (
        f"abs(CAST(floor(epoch({date_col})) AS BIGINT) "
        f"- CAST(floor(epoch(TIMESTAMP '{origin}')) AS BIGINT))"
    )
    big_s = scale_seconds / (1.0 - decay)
    d = (
        f"greatest(CAST(0.0 AS DOUBLE), CAST({raw} AS DOUBLE) "
        f"- CAST({float(offset_seconds)!r} AS DOUBLE))"
    )
    return f"""
    SELECT {id_col}, {keep}
           CAST({raw} AS BIGINT) AS distance_s,
           greatest(CAST(0.0 AS DOUBLE),
                    (CAST({big_s!r} AS DOUBLE) - {d})
                    / CAST({big_s!r} AS DOUBLE)) AS score
    FROM {table}
    ORDER BY score DESC, {id_col} ASC
    LIMIT {top_k}
    """


__all__ = [
    "decay_function_score",
    "decay_linear_oracle_sql",
    "distance_feature_events",
    "distance_feature_oracle_sql",
    "pinned_oracle_sql",
    "pinned_search",
    "rank_feature_oracle_sql",
    "rank_feature_search",
]
