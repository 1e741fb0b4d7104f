"""``simple_query_string`` — the OpenSearch end-user query syntax.

Reference parity: the reference's Discover search box submits
``simple_query_string`` queries against the indexed CDC documents
(README.md:388-441); this module parses the same syntax subset and
executes it as one DataFrame pass.

Supported syntax (the PHRASE | NOT | WHITESPACE flag set, which is a
standard ES ``flags`` configuration):

- bare terms — combined with ``default_operator`` (``or`` | ``and``)
- ``"quoted phrases"`` — exact consecutive-token match, scored by
  phrase frequency
- ``-term`` / ``-"quoted phrase"`` — negation (docs matching any
  negated clause are excluded)

The ``+``/``|``/``(`` precedence operators and ``*`` prefix are NOT
parsed (ES disables them the same way via ``flags``); unsupported
operator characters simply tokenize away, matching ES's lenient
"degrade to terms" behavior.

Scoring follows Lucene: each positive clause contributes a BM25 term
where a bare term uses (tf_t, idf_t) and a phrase uses
(tf = exact phrase frequency, idf = Σ constituent-term idfs) — the
Lucene PhraseQuery weight. idf stays the raw ``(N−df+0.5)/(df+0.5)``
ratio (the repo-wide ``textbook=False`` determinism stance: no libm
log), each clause contribution is quantized to a long at 1e-6 and
long-summed, so the final double is bit-identical cross-engine.

Scale shape: ONE tokenize pass reduced in-row to a narrow
(id, dl, tf per term, phrase-count per phrase) projection — phrase
frequencies come from an in-row positional window over the token
array (O(dl·|phrase|) inside the same codegen stage, no positional
explode, no self-join); a 1-row collected stats aggregate supplies
df/N; scoring is a row-wise expression cut by TakeOrderedAndProject.
The corpus text is never shuffled.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
    stats_memo_key,
)
from aws_dms_cdc_data_pipeline_spark.operators.search import (
    _ADHOC_STATS_MEMO,
    _FP,
    _sql_str,
    _term_eq,
)

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_CLAUSE_RE = re.compile(r'(-?)"([^"]*)"|(-?)(\S+)')


def parse_simple_query_string(query: str) -> list[tuple[bool, list[str]]]:
    """Parse the query into clauses: (negated, terms). One term →
    bare-term clause; several → phrase clause (only quotes produce
    multi-term clauses; a bare token with embedded punctuation, e.g.
    ``foo.bar``, degrades to its constituent terms as separate bare
    clauses — the ES lenient analyzer behavior)."""
    clauses: list[tuple[bool, list[str]]] = []
    for m in _CLAUSE_RE.finditer(query.lower()):
        if m.group(2) is not None:
            neg, text = m.group(1) == "-", m.group(2)
            terms = _TOKEN_RE.findall(text)
            if terms:
                clauses.append((neg, terms))
        else:
            neg, text = m.group(3) == "-", m.group(4)
            for t in _TOKEN_RE.findall(text):
                clauses.append((neg, [t]))
    return clauses


def _phrase_count_sql(toks: str, terms: list[str]) -> str:
    """SQL-string twin of :func:`_phrase_count_expr` — same guarded
    anchor-filter expression, built with zero py4j traffic (the
    Column DSL costs ~1 ms per expression node; profiled r17)."""
    L = len(terms)
    conds = " AND ".join(
        (
            f"element_at({toks}, i + {j}) = '{_sql_str(t)}'"
            if j
            else f"element_at({toks}, i) = '{_sql_str(t)}'"
        )
        for j, t in enumerate(terms)
    )
    return (
        f"(CASE WHEN size({toks}) >= {L} THEN "
        f"cast(size(filter(sequence(1, size({toks}) - {L - 1}), "
        f"i -> {conds})) as long) ELSE 0L END)"
    )


def _phrase_count_expr(toks, terms: list[str]):
    """Exact in-row phrase frequency: the number of anchor positions
    i where toks[i+j] == terms[j] for all j. One array-filter over
    the anchor range — no explode, no join. Guarded for dl < |phrase|
    (Spark's sequence(1, 0) would DESCEND, not return empty)."""
    L = len(terms)

    def at(i, j):
        return F.element_at(toks, i + F.lit(j)) == F.lit(terms[j])

    def pred(i):
        c = at(i, 0)
        for j in range(1, L):
            c = c & at(i, j)
        return c

    anchors = F.sequence(F.lit(1), F.size(toks) - F.lit(L - 1))
    return F.when(
        F.size(toks) >= F.lit(L),
        F.size(F.filter(anchors, pred)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))


def simple_query_string(
    docs: DataFrame,
    query: str,
    *,
    default_operator: str = "or",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Execute a ``simple_query_string`` query (see module docstring
    for syntax, scoring, and the single-pass plan shape).

    Returns (id, score, n_clauses_hit) — positive-clause membership
    per ``default_operator``, negated clauses excluded — ordered
    (score DESC, id ASC), top_k.
    """
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    clauses = parse_simple_query_string(query)
    pos = [c for c in clauses if not c[0]]
    neg = [c for c in clauses if c[0]]
    if not pos:
        raise ValueError(
            "simple_query_string needs at least one positive clause"
        )
    # every distinct term needing a df (all positive constituents)
    score_terms = sorted({t for _, ts in pos for t in ts})
    # negative-only single terms need a tf column IN THE PROJECTION:
    # referencing _toks after the select would analysis-resolve
    # through the projection and push the exclusion filter BELOW it,
    # re-tokenizing the corpus outside the persisted relation
    # (measured: 4.3 s warm vs 0.5 s for the equivalent dis_max)
    neg_only_terms = sorted(
        {ts[0] for n, ts in neg if len(ts) == 1} - set(score_terms)
    )

    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    toks = fan_out_scan(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    )
    cols = [F.size("_toks").cast("long").alias("dl")]
    for i, t in enumerate(score_terms):
        cols.append(
            F.size(F.filter("_toks", _term_eq(t))).cast("long")
            .alias(f"_tf{i}")
        )
    for j, t in enumerate(neg_only_terms):
        cols.append(
            F.size(F.filter("_toks", _term_eq(t))).cast("long")
            .alias(f"_ntf{j}")
        )
    # clause hit/score inputs: bare clauses read their term's tf;
    # phrase clauses get an exact in-row phrase count
    for ci, (_, terms) in enumerate(pos + neg):
        if len(terms) > 1:
            cols.append(
                _phrase_count_expr(F.col("_toks"), terms).alias(f"_pc{ci}")
            )
    proj = toks.select(F.col(id_col), *cols).persist()

    aggs = [
        F.sum((F.col("dl") > 0).cast("long")).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    ]
    for i in range(len(score_terms)):
        aggs.append(
            F.sum((F.col(f"_tf{i}") > 0).cast("long"))
            .cast("long").alias(f"_df{i}")
        )
    memo_key = stats_memo_key(
        proj,
        ("sqs",) + tuple(score_terms),
    )
    row = _ADHOC_STATS_MEMO.get(memo_key)
    if row is None:
        row = proj.agg(*aggs).collect()[0]
        if len(_ADHOC_STATS_MEMO) >= 256:
            _ADHOC_STATS_MEMO.pop(next(iter(_ADHOC_STATS_MEMO)))
        _ADHOC_STATS_MEMO[memo_key] = row
    n_docs = int(row["n_docs"] or 0)
    total_dl = int(row["total_dl"] or 0)
    if n_docs == 0:
        return proj.select(
            F.col(id_col),
            F.lit(None).cast("double").alias("score"),
            F.lit(0).cast("long").alias("n_clauses_hit"),
        ).filter(F.lit(False))
    avgdl = total_dl / n_docs
    tidx = {t: i for i, t in enumerate(score_terms)}

    def idf_of(t: str) -> float:
        df_ = int(row[f"_df{tidx[t]}"] or 0)
        return (float(n_docs - df_) + 0.5) / (float(df_) + 0.5)

    zero = F.lit(0).cast("long")
    total = zero
    hit_flags = []
    for ci, (_, terms) in enumerate(pos):
        if len(terms) == 1:
            tf = F.col(f"_tf{tidx[terms[0]]}")
            idf = idf_of(terms[0])
        else:
            tf = F.col(f"_pc{ci}")
            idf = sum(idf_of(t) for t in terms)  # Lucene phrase idf
        tf_part = (tf * (k1 + 1)) / (
            tf
            + F.lit(k1)
            * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
        cq = F.round(F.lit(idf) * tf_part * F.lit(float(_FP)), 0).cast(
            "long"
        )
        total = total + F.when(tf > 0, cq).otherwise(zero)
        hit_flags.append(tf > 0)

    n_hit = hit_flags[0].cast("long")
    member = hit_flags[0]
    for hflag in hit_flags[1:]:
        n_hit = n_hit + hflag.cast("long")
        member = (member | hflag) if default_operator == "or" else (
            member & hflag
        )

    nidx = {t: j for j, t in enumerate(neg_only_terms)}
    excl = F.lit(False)
    for ci, (_, terms) in enumerate(neg, start=len(pos)):
        if len(terms) == 1:
            t = terms[0]
            col = (
                F.col(f"_tf{tidx[t]}")
                if t in tidx
                else F.col(f"_ntf{nidx[t]}")
            )
            excl = excl | (col > 0)
        else:
            excl = excl | (F.col(f"_pc{ci}") > 0)

    return (
        proj.filter(member & ~excl)
        .select(
            F.col(id_col),
            (total.cast("decimal(38,0)") / F.lit(_FP))
            .cast("double")
            .alias("score"),
            n_hit.alias("n_clauses_hit"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def simple_query_string_oracle_sql(
    query: str,
    *,
    default_operator: str = "or",
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """DuckDB SQL computing the identical simple_query_string result
    (same parse, same quantized clause BM25 with Lucene phrase idf,
    same in-row phrase counting over the token list)."""
    clauses = parse_simple_query_string(query)
    pos = [c for c in clauses if not c[0]]
    neg = [c for c in clauses if c[0]]
    if not pos:
        raise ValueError("needs at least one positive clause")
    score_terms = sorted({t for _, ts in pos for t in ts})
    neg_only_terms = sorted(
        {t for n, ts in neg for t in ts if len(ts) == 1}
        - set(score_terms)
    )

    def tf_sql(t: str) -> str:
        return (
            f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT)"
        )

    def pc_sql(terms: list[str]) -> str:
        L = len(terms)
        conds = " AND ".join(
            f"toks[i + {j}] = '{terms[j]}'" for j in range(L)
        )
        return (
            f"CASE WHEN len(toks) >= {L} THEN "
            f"CAST(len(list_filter(range(1, len(toks) - {L - 2}), "
            f"i -> {conds})) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )

    proj_cols = [f"CAST(len(toks) AS BIGINT) AS dl"]
    for i, t in enumerate(score_terms):
        proj_cols.append(f"{tf_sql(t)} AS _tf{i}")
    for t in neg_only_terms:
        proj_cols.append(f"{tf_sql(t)} AS _ntf_{t}")
    for ci, (_, terms) in enumerate(pos + neg):
        if len(terms) > 1:
            proj_cols.append(f"{pc_sql(terms)} AS _pc{ci}")

    stats_cols = [
        "CAST(SUM(CASE WHEN dl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs",
        "CAST(SUM(dl) AS BIGINT) AS total_dl",
    ]
    for i in range(len(score_terms)):
        stats_cols.append(
            f"CAST(SUM(CASE WHEN _tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS _df{i}"
        )
    tidx = {t: i for i, t in enumerate(score_terms)}

    def idf_expr(t: str) -> str:
        i = tidx[t]
        return (
            f"((s.n_docs - s._df{i} + 0.5) / (s._df{i} + 0.5))"
        )

    contribs = []
    hits = []
    for ci, (_, terms) in enumerate(pos):
        if len(terms) == 1:
            tf = f"p._tf{tidx[terms[0]]}"
            idf = idf_expr(terms[0])
        else:
            tf = f"p._pc{ci}"
            idf = " + ".join(idf_expr(t) for t in terms)
        tf_part = (
            f"(({tf}) * ({k1} + 1)) / (({tf}) + {k1} * ((1 - {b}) "
            f"+ {b} * p.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))"
        )
        cq = (
            f"CAST(round(({idf}) * ({tf_part}) * 1000000, 0) AS BIGINT)"
        )
        contribs.append(
            f"CASE WHEN ({tf}) > 0 THEN {cq} ELSE CAST(0 AS BIGINT) END"
        )
        hits.append(f"(({tf}) > 0)")
    total = " + ".join(f"({c})" for c in contribs)
    n_hit = " + ".join(
        f"CAST({h} AS BIGINT)" for h in hits
    )
    op = " OR " if default_operator == "or" else " AND "
    member = op.join(hits)
    excls = []
    for ci, (_, terms) in enumerate(neg, start=len(pos)):
        if len(terms) == 1:
            t = terms[0]
            col = (
                f"p._tf{tidx[t]}" if t in tidx else f'p."_ntf_{t}"'
            )
            excls.append(f"({col} > 0)")
        else:
            excls.append(f"(p._pc{ci} > 0)")
    not_excl = (
        f"NOT ({' OR '.join(excls)})" if excls else "TRUE"
    )
    return f"""
    WITH tokarr AS (
        SELECT {id_col},
               list_filter(string_split_regex(lower({text_col}),
                           '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM {table}
    ),
    p AS (SELECT {id_col}, {', '.join(proj_cols)} FROM tokarr),
    s AS (SELECT {', '.join(stats_cols)} FROM p)
    SELECT p.{id_col},
           CAST(CAST({total} AS DECIMAL(38,0)) / 1000000 AS DOUBLE)
               AS score,
           CAST({n_hit} AS BIGINT) AS n_clauses_hit
    FROM p CROSS JOIN s
    WHERE ({member}) AND {not_excl}
    ORDER BY score DESC, p.{id_col} ASC
    LIMIT {top_k}
    """


__all__ = [
    "parse_simple_query_string",
    "simple_query_string",
    "simple_query_string_oracle_sql",
]


def dis_max_search(
    docs: DataFrame,
    clauses: list[str],
    *,
    groups: list[list[str]] | None = None,
    tie_breaker: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """``dis_max`` query over HETEROGENEOUS clauses — the OpenSearch
    disjunction-max: each clause scores independently and a doc's
    score is ``max(clause scores) + tie_breaker · Σ(other clause
    scores)``, membership = any clause matches. Where
    ``multi_match best_fields`` dis-maxes the SAME query across
    fields, this dis-maxes DIFFERENT sub-queries on one field — the
    "match the phrase OR either term, don't double-count overlap"
    shape.

    Each clause is a string: single-token → term clause (BM25),
    multi-token or quoted → phrase clause (exact phrase-frequency
    BM25 with Lucene's summed constituent idf — the
    :func:`simple_query_string` clause semantics and arithmetic,
    quantized-exact longs throughout; the max/sum combine happens on
    the longs, one final decimal division).

    When ``groups`` is given it replaces ``clauses``: each group is
    one dis_max SUB-QUERY whose score is the SUM of its member
    clauses' contributions (an ES ``match`` with N terms is one
    sub-query summing N term scores), and the disjunction-max runs
    over GROUP scores — ``max(group) + tie_breaker · Σ(other
    groups)``. A flat ``clauses`` list is exactly singleton groups.

    Same single-pass shape as simple_query_string: one tokenize
    reduced in-row, 1-row stats collect, row-wise scoring,
    TakeOrderedAndProject. Returns (id, score, n_clauses_hit) with
    n_clauses_hit counting hit GROUPS (= clauses in the flat form).
    """
    if groups is None:
        groups = [[c] for c in (clauses or [])]
    if not groups:
        raise ValueError("dis_max_search needs at least one clause")
    if not (0.0 <= tie_breaker <= 1.0):
        raise ValueError("tie_breaker must be in [0, 1]")
    parsed: list[list[str]] = []
    group_of: list[int] = []
    for gi, grp in enumerate(groups):
        if not grp:
            raise ValueError("dis_max group must have >= 1 clause")
        for c in grp:
            terms = _TOKEN_RE.findall(c.lower())
            if not terms:
                raise ValueError(f"clause {c!r} has no tokens")
            parsed.append(terms)
            group_of.append(gi)
    n_groups = len(groups)
    score_terms = sorted({t for ts in parsed for t in ts})

    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    toks = fan_out_scan(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    )
    cols = [F.size("_toks").cast("long").alias("dl")]
    for i, t in enumerate(score_terms):
        cols.append(
            F.size(F.filter("_toks", _term_eq(t))).cast("long")
            .alias(f"_tf{i}")
        )
    for ci, terms in enumerate(parsed):
        if len(terms) > 1:
            cols.append(
                _phrase_count_expr(F.col("_toks"), terms).alias(f"_pc{ci}")
            )
    proj = toks.select(F.col(id_col), *cols).persist()

    aggs = [
        F.sum((F.col("dl") > 0).cast("long")).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    ]
    for i in range(len(score_terms)):
        aggs.append(
            F.sum((F.col(f"_tf{i}") > 0).cast("long"))
            .cast("long").alias(f"_df{i}")
        )
    memo_key = stats_memo_key(
        proj,
        ("dis_max",) + tuple(score_terms),
    )
    row = _ADHOC_STATS_MEMO.get(memo_key)
    if row is None:
        row = proj.agg(*aggs).collect()[0]
        if len(_ADHOC_STATS_MEMO) >= 256:
            _ADHOC_STATS_MEMO.pop(next(iter(_ADHOC_STATS_MEMO)))
        _ADHOC_STATS_MEMO[memo_key] = row
    n_docs = int(row["n_docs"] or 0)
    total_dl = int(row["total_dl"] or 0)
    if n_docs == 0:
        return proj.select(
            F.col(id_col),
            F.lit(None).cast("double").alias("score"),
            F.lit(0).cast("long").alias("n_clauses_hit"),
        ).filter(F.lit(False))
    avgdl = total_dl / n_docs
    tidx = {t: i for i, t in enumerate(score_terms)}

    def idf_of(t: str) -> float:
        df_ = int(row[f"_df{tidx[t]}"] or 0)
        return (float(n_docs - df_) + 0.5) / (float(df_) + 0.5)

    zero = F.lit(0).cast("long")
    clause_scores = []
    hit_flags = []
    for ci, terms in enumerate(parsed):
        if len(terms) == 1:
            tf = F.col(f"_tf{tidx[terms[0]]}")
            idf = idf_of(terms[0])
        else:
            tf = F.col(f"_pc{ci}")
            idf = sum(idf_of(t) for t in terms)
        tf_part = (tf * (k1 + 1)) / (
            tf
            + F.lit(k1)
            * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
        cq = F.round(F.lit(idf) * tf_part * F.lit(float(_FP)), 0).cast(
            "long"
        )
        clause_scores.append(F.when(tf > 0, cq).otherwise(zero))
        hit_flags.append(tf > 0)

    # fold clause contributions into their sub-query (group) score:
    # group score = Σ member clause longs, group hit = any member hit
    group_scores = []
    group_hits = []
    for gi in range(n_groups):
        members = [ci for ci, g in enumerate(group_of) if g == gi]
        gs = clause_scores[members[0]]
        gh = hit_flags[members[0]]
        for ci in members[1:]:
            gs = gs + clause_scores[ci]
            gh = gh | hit_flags[ci]
        group_scores.append(gs)
        group_hits.append(gh)

    maxq = (
        group_scores[0]
        if len(group_scores) == 1
        else F.greatest(*group_scores)
    )
    sumq = group_scores[0]
    for c in group_scores[1:]:
        sumq = sumq + c
    # combine on the exact longs; tie_breaker is ONE double multiply
    score = (
        maxq.cast("double")
        + F.lit(float(tie_breaker)) * (sumq - maxq).cast("double")
    ) / F.lit(float(_FP))
    n_hit = group_hits[0].cast("long")
    member = group_hits[0]
    for hflag in group_hits[1:]:
        n_hit = n_hit + hflag.cast("long")
        member = member | hflag
    return (
        proj.filter(member)
        .select(
            F.col(id_col),
            score.alias("score"),
            n_hit.alias("n_clauses_hit"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def dis_max_oracle_sql(
    clauses: list[str],
    *,
    groups: list[list[str]] | None = None,
    tie_breaker: float = 0.0,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """DuckDB SQL computing the identical dis_max ranking (grouped
    sub-query semantics when ``groups`` is given, mirroring
    :func:`dis_max_search`)."""
    if groups is None:
        groups = [[c] for c in (clauses or [])]
    parsed = []
    group_of = []
    for gi, grp in enumerate(groups):
        for c in grp:
            parsed.append(_TOKEN_RE.findall(c.lower()))
            group_of.append(gi)
    if any(not ts for ts in parsed):
        raise ValueError("every clause needs at least one token")
    n_groups = len(groups)
    score_terms = sorted({t for ts in parsed for t in ts})
    tidx = {t: i for i, t in enumerate(score_terms)}

    def tf_sql(t: str) -> str:
        return f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT)"

    def pc_sql(terms: list[str]) -> str:
        L = len(terms)
        conds = " AND ".join(
            f"toks[i + {j}] = '{terms[j]}'" for j in range(L)
        )
        return (
            f"CASE WHEN len(toks) >= {L} THEN "
            f"CAST(len(list_filter(range(1, len(toks) - {L - 2}), "
            f"i -> {conds})) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )

    proj_cols = ["CAST(len(toks) AS BIGINT) AS dl"]
    for i, t in enumerate(score_terms):
        proj_cols.append(f"{tf_sql(t)} AS _tf{i}")
    for ci, terms in enumerate(parsed):
        if len(terms) > 1:
            proj_cols.append(f"{pc_sql(terms)} AS _pc{ci}")
    stats_cols = [
        "CAST(SUM(CASE WHEN dl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs",
        "CAST(SUM(dl) AS BIGINT) AS total_dl",
    ]
    for i in range(len(score_terms)):
        stats_cols.append(
            f"CAST(SUM(CASE WHEN _tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS _df{i}"
        )

    def idf_expr(t: str) -> str:
        i = tidx[t]
        return f"((s.n_docs - s._df{i} + 0.5) / (s._df{i} + 0.5))"

    cqs, hits = [], []
    for ci, terms in enumerate(parsed):
        if len(terms) == 1:
            tf = f"p._tf{tidx[terms[0]]}"
            idf = idf_expr(terms[0])
        else:
            tf = f"p._pc{ci}"
            idf = " + ".join(idf_expr(t) for t in terms)
        tf_part = (
            f"(({tf}) * ({k1} + 1)) / (({tf}) + {k1} * ((1 - {b}) "
            f"+ {b} * p.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))"
        )
        cqs.append(
            f"CASE WHEN ({tf}) > 0 THEN CAST(round(({idf}) * ({tf_part}) "
            f"* 1000000, 0) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
        hits.append(f"(({tf}) > 0)")
    gqs, ghits = [], []
    for gi in range(n_groups):
        members = [ci for ci, g in enumerate(group_of) if g == gi]
        gqs.append(" + ".join(f"({cqs[ci]})" for ci in members))
        ghits.append("(" + " OR ".join(hits[ci] for ci in members) + ")")
    maxq = (
        gqs[0] if len(gqs) == 1
        else "greatest(" + ", ".join(f"({g})" for g in gqs) + ")"
    )
    sumq = " + ".join(f"({g})" for g in gqs)
    n_hit = " + ".join(f"CAST({h} AS BIGINT)" for h in ghits)
    member = " OR ".join(ghits)
    return f"""
    WITH tokarr AS (
        SELECT {id_col},
               list_filter(string_split_regex(lower({text_col}),
                           '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM {table}
    ),
    p AS (SELECT {id_col}, {', '.join(proj_cols)} FROM tokarr),
    s AS (SELECT {', '.join(stats_cols)} FROM p)
    SELECT p.{id_col},
           (CAST({maxq} AS DOUBLE)
            + CAST({float(tie_breaker)!r} AS DOUBLE)
              * CAST(({sumq}) - ({maxq}) AS DOUBLE)) / 1000000.0
               AS score,
           CAST({n_hit} AS BIGINT) AS n_clauses_hit
    FROM p CROSS JOIN s
    WHERE {member}
    ORDER BY score DESC, p.{id_col} ASC
    LIMIT {top_k}
    """


def span_not_search(
    docs: DataFrame,
    include_term: str,
    exclude_term: str,
    *,
    pre: int = 0,
    post: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 25,
) -> DataFrame:
    """``span_not`` query — occurrences of ``include_term`` that are
    NOT within ``pre`` positions before / ``post`` positions after
    any occurrence of ``exclude_term`` (the OpenSearch span_not with
    term spans: "match 'apple' but not near 'pie'").

    In-row positional algebra — the simple_query_string machinery:
    both terms' position lists extract from the token array with one
    filter each, and the surviving-occurrence count is a filter over
    the include positions with an EXISTS over the (short) exclude
    list. No positional explode, no self-join; the corpus text is
    never shuffled.

    Returns (id, n_matches, n_excluded) for docs with n_matches > 0,
    ordered (n_matches DESC, id ASC), top_k.
    """
    inc = include_term.lower()
    exc = exclude_term.lower()
    if not inc or not exc:
        raise ValueError("span_not_search needs both terms")
    if pre < 0 or post < 0:
        raise ValueError("pre/post must be >= 0")

    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    toks = fan_out_scan(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    )

    def positions(term):
        return F.filter(
            F.sequence(F.lit(1), F.size("_toks")),
            lambda i: F.element_at("_toks", i) == F.lit(term),
        )

    pos_rel = toks.filter(F.size("_toks") > 0).select(
        F.col(id_col),
        positions(inc).alias("_pi"),
        positions(exc).alias("_pe"),
    )
    survive = F.filter(
        F.col("_pi"),
        lambda p: ~F.exists(
            F.col("_pe"),
            lambda q: (q >= p - F.lit(pre)) & (q <= p + F.lit(post)),
        ),
    )
    return (
        pos_rel.select(
            F.col(id_col),
            F.size(survive).cast("long").alias("n_matches"),
            (F.size("_pi") - F.size(survive)).cast("long").alias(
                "n_excluded"
            ),
        )
        .filter(F.col("n_matches") > 0)
        .orderBy(F.col("n_matches").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def span_not_oracle_sql(
    include_term: str,
    exclude_term: str,
    *,
    pre: int = 0,
    post: int = 0,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 25,
) -> str:
    """DuckDB SQL computing the identical span_not result (same
    in-row position algebra over the token list)."""
    inc, exc = include_term.lower(), exclude_term.lower()
    return f"""
    WITH tokarr AS (
        SELECT {id_col},
               list_filter(string_split_regex(lower({text_col}),
                           '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM {table}
    ),
    pos AS (
        SELECT {id_col},
               list_filter(range(1, len(toks) + 1),
                           i -> toks[i] = '{inc}') AS pi,
               list_filter(range(1, len(toks) + 1),
                           i -> toks[i] = '{exc}') AS pe
        FROM tokarr WHERE len(toks) > 0
    ),
    counted AS (
        SELECT {id_col},
               CAST(len(list_filter(pi, p ->
                   len(list_filter(pe, q ->
                       q >= p - {pre} AND q <= p + {post})) = 0
               )) AS BIGINT) AS n_matches,
               CAST(len(pi) AS BIGINT) AS n_inc
        FROM pos
    )
    SELECT {id_col}, n_matches,
           n_inc - n_matches AS n_excluded
    FROM counted
    WHERE n_matches > 0
    ORDER BY n_matches DESC, {id_col} ASC
    LIMIT {top_k}
    """


def rescore_search(
    docs: DataFrame,
    query_terms: list[str],
    rescore_phrase: str,
    *,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 2.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """``rescore`` API — the OpenSearch two-phase ranking: a cheap
    BM25 term query ranks everything, then only the top
    ``window_size`` hits re-rank by ``query_weight · base +
    rescore_weight · phrase_score`` where the rescore query is an
    exact phrase match (the canonical "retrieve loose, re-rank
    precise" serving shape; ``top_k`` must be ≤ ``window_size`` so
    the returned page is entirely rescored, as ES requires).

    One pass: the same narrow projection carries the term tfs AND the
    phrase count in-row, so the rescore phase adds zero extra corpus
    work — the window cut (TakeOrderedAndProject on base score) and
    the final cut (on combined score) both act on (id, longs) rows.
    Phrase scoring uses the Lucene phrase weight (tf = phrase
    frequency, idf = Σ constituent idfs) in quantized-exact longs;
    docs in the window with no phrase match keep phrase_score 0 and
    re-rank by weighted base alone.

    Returns (id, base_score, phrase_freq, score) ordered
    (score DESC, id ASC), top_k.
    """
    if top_k > window_size:
        raise ValueError("top_k must be <= window_size (ES contract)")
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("rescore_search needs query terms")
    phrase_terms = _TOKEN_RE.findall(rescore_phrase.lower())
    if len(phrase_terms) < 2:
        raise ValueError("rescore phrase needs >= 2 tokens")
    all_terms = sorted(set(terms) | set(phrase_terms))

    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    toks = fan_out_scan(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    )
    cols = [F.size("_toks").cast("long").alias("dl")]
    for i, t in enumerate(all_terms):
        cols.append(
            F.size(F.filter("_toks", _term_eq(t))).cast("long")
            .alias(f"_tf{i}")
        )
    cols.append(
        _phrase_count_expr(F.col("_toks"), phrase_terms).alias("_pc")
    )
    proj = toks.select(F.col(id_col), *cols).persist()

    aggs = [
        F.sum((F.col("dl") > 0).cast("long")).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    ]
    for i in range(len(all_terms)):
        aggs.append(
            F.sum((F.col(f"_tf{i}") > 0).cast("long"))
            .cast("long").alias(f"_df{i}")
        )
    memo_key = stats_memo_key(
        proj,
        ("rescore",) + tuple(all_terms),
    )
    row = _ADHOC_STATS_MEMO.get(memo_key)
    if row is None:
        row = proj.agg(*aggs).collect()[0]
        if len(_ADHOC_STATS_MEMO) >= 256:
            _ADHOC_STATS_MEMO.pop(next(iter(_ADHOC_STATS_MEMO)))
        _ADHOC_STATS_MEMO[memo_key] = row
    n_docs = int(row["n_docs"] or 0)
    total_dl = int(row["total_dl"] or 0)
    if n_docs == 0:
        return proj.select(
            F.col(id_col),
            F.lit(None).cast("double").alias("base_score"),
            F.lit(0).cast("long").alias("phrase_freq"),
            F.lit(None).cast("double").alias("score"),
        ).filter(F.lit(False))
    avgdl = total_dl / n_docs
    tidx = {t: i for i, t in enumerate(all_terms)}

    def idf_of(t: str) -> float:
        df_ = int(row[f"_df{tidx[t]}"] or 0)
        return (float(n_docs - df_) + 0.5) / (float(df_) + 0.5)

    def bm25_cq(tf, idf: float):
        tf_part = (tf * (k1 + 1)) / (
            tf
            + F.lit(k1)
            * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
        return F.round(F.lit(idf) * tf_part * F.lit(float(_FP)), 0).cast(
            "long"
        )

    zero = F.lit(0).cast("long")
    base_q = zero
    member = F.lit(False)
    for t in terms:
        tf = F.col(f"_tf{tidx[t]}")
        base_q = base_q + F.when(tf > 0, bm25_cq(tf, idf_of(t))).otherwise(
            zero
        )
        member = member | (tf > 0)
    phrase_idf = sum(idf_of(t) for t in phrase_terms)
    phrase_q = F.when(
        F.col("_pc") > 0, bm25_cq(F.col("_pc"), phrase_idf)
    ).otherwise(zero)

    window = (
        proj.filter(member)
        .select(
            F.col(id_col),
            base_q.alias("_bq"),
            phrase_q.alias("_pq"),
            F.col("_pc"),
        )
        .orderBy(F.col("_bq").desc(), F.col(id_col).asc())
        .limit(window_size)
    )
    combined = (
        F.lit(float(query_weight)) * F.col("_bq").cast("double")
        + F.lit(float(rescore_weight)) * F.col("_pq").cast("double")
    ) / F.lit(float(_FP))
    return (
        window.select(
            F.col(id_col),
            (F.col("_bq").cast("decimal(38,0)") / F.lit(_FP))
            .cast("double")
            .alias("base_score"),
            F.col("_pc").alias("phrase_freq"),
            combined.alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def rescore_oracle_sql(
    query_terms: list[str],
    rescore_phrase: str,
    *,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 2.0,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """DuckDB SQL computing the identical two-phase rescored ranking."""
    terms = sorted({t.lower() for t in query_terms})
    phrase_terms = _TOKEN_RE.findall(rescore_phrase.lower())
    all_terms = sorted(set(terms) | set(phrase_terms))
    tidx = {t: i for i, t in enumerate(all_terms)}

    def tf_sql(t: str) -> str:
        return f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT)"

    L = len(phrase_terms)
    conds = " AND ".join(
        f"toks[i + {j}] = '{phrase_terms[j]}'" for j in range(L)
    )
    pc = (
        f"CASE WHEN len(toks) >= {L} THEN "
        f"CAST(len(list_filter(range(1, len(toks) - {L - 2}), "
        f"i -> {conds})) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    )
    proj_cols = ["CAST(len(toks) AS BIGINT) AS dl", f"{pc} AS _pc"]
    for i, t in enumerate(all_terms):
        proj_cols.append(f"{tf_sql(t)} AS _tf{i}")
    stats_cols = [
        "CAST(SUM(CASE WHEN dl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs",
        "CAST(SUM(dl) AS BIGINT) AS total_dl",
    ]
    for i in range(len(all_terms)):
        stats_cols.append(
            f"CAST(SUM(CASE WHEN _tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS _df{i}"
        )

    def idf_expr(t: str) -> str:
        i = tidx[t]
        return f"((s.n_docs - s._df{i} + 0.5) / (s._df{i} + 0.5))"

    def cq(tf: str, idf: str) -> str:
        tf_part = (
            f"(({tf}) * ({k1} + 1)) / (({tf}) + {k1} * ((1 - {b}) "
            f"+ {b} * p.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))"
        )
        return (
            f"CASE WHEN ({tf}) > 0 THEN CAST(round(({idf}) * ({tf_part}) "
            f"* 1000000, 0) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )

    base_q = " + ".join(
        f"({cq(f'p._tf{tidx[t]}', idf_expr(t))})" for t in terms
    )
    member = " OR ".join(f"(p._tf{tidx[t]} > 0)" for t in terms)
    phrase_idf = " + ".join(idf_expr(t) for t in phrase_terms)
    phrase_q = cq("p._pc", f"({phrase_idf})")
    return f"""
    WITH tokarr AS (
        SELECT {id_col},
               list_filter(string_split_regex(lower({text_col}),
                           '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM {table}
    ),
    p AS (SELECT {id_col}, {', '.join(proj_cols)} FROM tokarr),
    s AS (SELECT {', '.join(stats_cols)} FROM p),
    scored AS (
        SELECT p.{id_col},
               CAST({base_q} AS BIGINT) AS _bq,
               CAST({phrase_q} AS BIGINT) AS _pq,
               p._pc
        FROM p CROSS JOIN s
        WHERE {member}
    ),
    win AS (
        SELECT * FROM scored
        ORDER BY _bq DESC, {id_col} ASC
        LIMIT {window_size}
    )
    SELECT {id_col},
           CAST(CAST(_bq AS DECIMAL(38,0)) / 1000000 AS DOUBLE)
               AS base_score,
           _pc AS phrase_freq,
           (CAST({float(query_weight)!r} AS DOUBLE) * CAST(_bq AS DOUBLE)
            + CAST({float(rescore_weight)!r} AS DOUBLE)
              * CAST(_pq AS DOUBLE)) / 1000000.0 AS score
    FROM win
    ORDER BY score DESC, {id_col} ASC
    LIMIT {top_k}
    """


def bm25_explain(
    docs: DataFrame,
    query_terms: list[str],
    explain_id: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``_explain`` API — the per-term scoring breakdown OpenSearch
    returns for one (query, document) pair: for each query term, its
    tf in the document, corpus df, idf, the saturated tf component,
    and the quantized contribution that entered the document's BM25
    score. The ``score`` column repeats the document's total on every
    row (the explain envelope).

    Same single-pass stats as the ad-hoc BM25 path; the per-doc
    projection prunes to the explained id BEFORE anything else (one
    pushed filter — this is a point lookup, not a ranking).

    Returns one row per query term: (term, tf, df, idf, tf_part,
    contribution, score), ordered by term.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("bm25_explain needs query terms")

    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    toks = fan_out_scan(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    )
    cols = [F.size("_toks").cast("long").alias("dl")]
    for i, t in enumerate(terms):
        cols.append(
            F.size(F.filter("_toks", _term_eq(t))).cast("long")
            .alias(f"_tf{i}")
        )
    proj = toks.select(F.col(id_col), *cols).persist()
    aggs = [
        F.sum((F.col("dl") > 0).cast("long")).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    ]
    for i in range(len(terms)):
        aggs.append(
            F.sum((F.col(f"_tf{i}") > 0).cast("long"))
            .cast("long").alias(f"_df{i}")
        )
    memo_key = stats_memo_key(
        proj,
        ("explain",) + tuple(terms),
    )
    row = _ADHOC_STATS_MEMO.get(memo_key)
    if row is None:
        row = proj.agg(*aggs).collect()[0]
        if len(_ADHOC_STATS_MEMO) >= 256:
            _ADHOC_STATS_MEMO.pop(next(iter(_ADHOC_STATS_MEMO)))
        _ADHOC_STATS_MEMO[memo_key] = row
    n_docs = int(row["n_docs"] or 0)
    total_dl = int(row["total_dl"] or 0)
    spark = docs.sparkSession
    if n_docs == 0:
        return spark.createDataFrame(
            [], "term string, tf bigint, df bigint, idf double, "
                "tf_part double, contribution double, score double"
        )
    avgdl = total_dl / n_docs
    target = proj.filter(F.col(id_col) == explain_id)
    legs = []
    contribs = []
    for i, t in enumerate(terms):
        df_ = int(row[f"_df{i}"] or 0)
        idf = (float(n_docs - df_) + 0.5) / (float(df_) + 0.5)
        tf = F.col(f"_tf{i}")
        tf_part = (tf * (k1 + 1)) / (
            tf
            + F.lit(k1)
            * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
        cq = F.round(F.lit(idf) * tf_part * F.lit(float(_FP)), 0).cast(
            "long"
        )
        contrib = F.when(tf > 0, cq).otherwise(F.lit(0).cast("long"))
        contribs.append(contrib)
        legs.append(
            F.struct(
                F.lit(t).alias("term"),
                tf.alias("tf"),
                F.lit(df_).cast("long").alias("df"),
                F.lit(idf).alias("idf"),
                F.when(tf > 0, tf_part).otherwise(F.lit(0.0)).alias(
                    "tf_part"
                ),
                (contrib.cast("decimal(38,0)") / F.lit(_FP))
                .cast("double")
                .alias("contribution"),
            )
        )
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return (
        target.select(
            F.explode(F.array(*legs)).alias("_e"),
            (total.cast("decimal(38,0)") / F.lit(_FP))
            .cast("double")
            .alias("score"),
        )
        .select("_e.*", "score")
        .orderBy("term")
    )


def bm25_explain_oracle_sql(
    query_terms: list[str],
    explain_id: int,
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB SQL for the identical per-term explain breakdown."""
    terms = sorted({t.lower() for t in query_terms})

    def tf_sql(t: str) -> str:
        return f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT)"

    proj_cols = ["CAST(len(toks) AS BIGINT) AS dl"] + [
        f"{tf_sql(t)} AS _tf{i}" for i, t in enumerate(terms)
    ]
    stats_cols = [
        "CAST(SUM(CASE WHEN dl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs",
        "CAST(SUM(dl) AS BIGINT) AS total_dl",
    ] + [
        f"CAST(SUM(CASE WHEN _tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS _df{i}"
        for i in range(len(terms))
    ]

    def idf_sql(i: int) -> str:
        return f"((s.n_docs - s._df{i} + 0.5) / (s._df{i} + 0.5))"

    def tf_part_sql(i: int) -> str:
        tf = f"t._tf{i}"
        return (
            f"(({tf}) * ({k1} + 1)) / (({tf}) + {k1} * ((1 - {b}) "
            f"+ {b} * t.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))"
        )

    def cq_sql(i: int) -> str:
        return (
            f"CASE WHEN (t._tf{i}) > 0 THEN CAST(round(({idf_sql(i)}) "
            f"* ({tf_part_sql(i)}) * 1000000, 0) AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END"
        )

    total = " + ".join(f"({cq_sql(i)})" for i in range(len(terms)))
    legs = []
    for i, t in enumerate(terms):
        legs.append(
            f"SELECT '{t}' AS term, t._tf{i} AS tf, "
            f"CAST(s._df{i} AS BIGINT) AS df, {idf_sql(i)} AS idf, "
            f"CASE WHEN (t._tf{i}) > 0 THEN {tf_part_sql(i)} "
            f"ELSE 0.0 END AS tf_part, "
            f"CAST(CAST({cq_sql(i)} AS DECIMAL(38,0)) / 1000000 "
            f"AS DOUBLE) AS contribution, "
            f"CAST(CAST({total} AS DECIMAL(38,0)) / 1000000 AS DOUBLE) "
            f"AS score "
            f"FROM t CROSS JOIN s"
        )
    union = "\n    UNION ALL\n    ".join(legs)
    return f"""
    WITH tokarr AS (
        SELECT {id_col},
               list_filter(string_split_regex(lower({text_col}),
                           '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM {table}
    ),
    p AS (SELECT {id_col}, {', '.join(proj_cols)} FROM tokarr),
    s AS (SELECT {', '.join(stats_cols)} FROM p),
    t AS (SELECT * FROM p WHERE {id_col} = {explain_id})
    {union}
    ORDER BY term
    """
