"""Keyword search with BM25-family ranking — the OpenSearch parity op.

The reference pipeline's terminal store is an OpenSearch index whose
headline capability is ranked free-text search over the replicated
documents (reference README.md:451-492 exercises the Discover query
surface). This is that capability as a Spark query: score every
document against a bag of query terms and return the top-k.

Scoring is BM25 with one deliberate change for cross-engine
determinism: the idf factor drops the logarithm —
``idf' = (N − df + 0.5)/(df + 0.5)`` instead of ``ln(1 + …)``. The
log is strictly monotone, so per-term idf ORDER is identical; we
document (rather than hide) that multi-term totals can deviate from
textbook BM25 ranking since log-compression damps high-idf terms.
What the change buys: every arithmetic step is rational (+, −, ×, ÷
on exact integer inputs), so Spark and any oracle engine produce
bit-identical doubles — no libm ``ln`` variance — and each term's
contribution quantizes exactly (the ``_q6`` fixed-point pattern)
into an order-independent integer sum. Ranking is fully
deterministic including ties (score DESC, doc_id ASC).

Execution shape at 100 TB:

- Tokenize + count per (doc, term) in one map-side pass; the
  inverted-index rows for NON-query terms never leave the scan — the
  broadcast literal term list prunes before the first shuffle.
- Ad-hoc use tokenizes twice (once for the pruned hits, once for the
  document-length branch). A production corpus materializes
  ``tokenize()`` ONCE as a bucketed table (sinks/bucketed.py, bucket
  on the id): every subsequent search prunes that index and the
  dl/stats branch reads pre-aggregated lengths — per-query work
  collapses to the hit rows.
- Document lengths aggregate map-side; ``avgdl``/``N`` ride a 1-row
  broadcast (no driver collect).
- df per query term = tiny aggregate over the pruned index.
- Final score: one hash aggregate on doc_id over ≤ |terms| rows per
  doc; top-k compiles to TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FP = 1_000_000  # 6-decimal fixed point, matches plans/queries._q6


def tokenize(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf): lowercase alnum tokens with per-doc counts."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    textbook: bool = False,
) -> DataFrame:
    """Top-k documents for a bag of query terms.

    Returns (id, score, n_terms_hit) ordered by (score DESC, id ASC).
    ``score`` is the quantized-exact sum of per-term BM25
    contributions. ``textbook=True`` uses the standard Lucene idf
    ``ln(1 + (N − df + 0.5)/(df + 0.5))`` — textbook multi-term
    ranking at the cost of libm ``ln`` in the score (still
    deterministic within Spark; just not guaranteed bit-identical to
    an independent engine's ``ln``). The default keeps the log-free
    rational idf whose cross-engine determinism the DuckDB oracle
    check depends on (see module docstring; measured agreement
    between the two orderings on the documents fixture:
    tests/test_search.py::test_textbook_vs_rational_idf_deviation).
    """
    if not query_terms:
        raise ValueError("bm25_search needs at least one query term")
    terms = sorted({t.lower() for t in query_terms})

    # One tokenization, two cheap consumers. Document length is the
    # SIZE of the token array — no explode and no (doc, term) shuffle
    # for the length branch (the full-vocabulary aggregate was the
    # query's dominant cost: only query-term rows need to shuffle at
    # all). dl > 0 keeps the stats contract of the inverted-index
    # formulation: token-less docs are not corpus members.
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    )
    dl = (
        toks.select(F.col(id_col), F.size("_toks").cast("long").alias("dl"))
        .filter(F.col("dl") > 0)
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    hits = (
        toks.select(F.col(id_col), F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_per_term = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    scored = (
        hits.join(df_per_term, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    if textbook:
        idf = F.log(F.lit(1.0) + idf)
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    contrib_q = F.round(idf * tf_part * F.lit(float(_FP)), 0).cast("long")
    return (
        scored.groupBy(id_col)
        .agg(
            (F.sum(contrib_q).cast("decimal(38,0)") / F.lit(_FP))
            .cast("double")
            .alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def bm25_oracle_sql(
    query_terms: list[str],
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """DuckDB SQL computing the identical ranking (same rational
    arithmetic, same quantization)."""
    terms = sorted({t.lower() for t in query_terms})
    in_list = ", ".join(f"'{t}'" for t in terms)
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
    )
    SELECT {id_col},
           CAST(CAST(SUM(cq) AS DECIMAL(38,0)) / 1000000 AS DOUBLE) AS score,
           CAST(COUNT(*) AS BIGINT) AS n_terms_hit
    FROM contrib
    GROUP BY {id_col}
    ORDER BY score DESC, {id_col} ASC
    LIMIT {top_k}
    """


__all__ = ["bm25_search", "bm25_oracle_sql", "tokenize"]
