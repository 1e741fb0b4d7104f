"""Lucene ``query_string`` / Kibana-DQL grammar for the Discover bar.

The reference pipeline is browsed through OpenSearch Dashboards
Discover (reference README.md:451-492), whose search bar speaks this
grammar by default — it is the single most-typed query surface of the
reference's terminal store. This module parses the grammar and
compiles it onto the engine's existing executors: the boolean
skeleton runs through :func:`operators.dsl.bool_tree_search`, ranges /
``_exists_`` / metadata equality become metadata leaves (membership
only — the Kibana filter semantic: metadata never changes BM25 stats
or scores), and multi-term shapes (wildcards, fuzzy) rewrite to a
should-group of vocabulary expansions (Lucene's scoring-boolean
rewrite, bounded by ``max_expansions`` — the ``too_many_clauses``
guard).

Supported surface
-----------------
- bare terms on the default text field: ``merge window``
- quoted phrases: ``"stream table"`` (exact positional phrase)
- fielded terms: ``text:merge`` (scoring), ``lang:en`` /
  ``source:"src0"`` (metadata equality, membership only)
- booleans: ``AND`` / ``OR`` / ``NOT`` (case-insensitive, so the
  Kibana-DQL lowercase spellings work) and ``&&`` / ``||`` / ``!``;
  ``+required`` / ``-prohibited`` clause prefixes; parentheses;
  field groups ``text:(a OR b)``
- ranges: ``n_chars:[300 TO 5000]`` (inclusive), ``{..}`` exclusive,
  mixed ``[a TO b}``, open ends with ``*``, and the comparison
  shorthand ``n_chars:>=300`` — metadata fields only
- ``_exists_:field``
- wildcards ``wind*`` / ``s?an`` and fuzzy ``batc~1`` / ``batc~``
  (edit distance, default 2) on the text field

Explicit ``AND``/``OR`` follow the classic Lucene QueryParser
conjunction rule: the connective sets the occur of BOTH neighbours
(unless a neighbour carries an explicit ``+``/``-``/``NOT``), and the
implicit connective between adjacent clauses is ``default_operator``
(``or``, the Lucene default). A clause group with only prohibited
members matches every OTHER document with score 0.

Reasoned rejections (ValueError, each naming the alternative):
boost syntax ``term^2``; regex fields ``name:/re/``; phrase slop
``"a b"~2`` (the engine's phrase executor is exact-positional);
wildcard / fuzzy / range on NON-text metadata fields beyond equality
(the indexed ``wildcard_search`` / ``fuzzy_search`` operators serve
those shapes); fields that are not columns of the document relation.

Scoring: text terms and phrases score BM25 exactly like
``bool_tree_search`` (sum of hitting clauses, corpus-wide stats);
wildcard / fuzzy score as the sum of their HITTING expanded terms;
metadata leaves contribute 0. Parity with ``simple_query_string`` on
the shared dialect (quoted phrases, ``-`` negation, or/and default
operator) is asserted in tests/test_lucene.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ANALYZE_RE = re.compile(r"[a-z0-9]+")
_FUZZY_RE = re.compile(r"^(.+?)~(\d*)$")
_CMP_RE = re.compile(r"^(>=|<=|>|<)(.+)$")
_TO_RE = re.compile(r"\s+TO\s+", re.IGNORECASE)
_WORD_BREAK = set(' \t\r\n()"[]{}:')

_MAX_CLAUSE_COUNT = 1024  # Lucene's BooleanQuery.maxClauseCount default


def _analyze(text: str) -> list[str]:
    """The engine's analyzer: lowercase, [a-z0-9]+ tokens — identical
    to the tokenization inside bool_tree_search and the token index."""
    return _ANALYZE_RE.findall(text.lower())


def _typed(raw: str):
    """Type a metadata literal: int, then float, else string (kept
    case-sensitive — metadata fields are not analyzed)."""
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def tokenize_query_string(query: str) -> list[tuple[str, object]]:
    """Lex the grammar into (kind, value) tokens. Kinds: ``(`` ``)``
    AND OR NOT PLUS MINUS PHRASE RANGE FIELD WORD."""
    toks: list[tuple[str, object]] = []
    i, n = 0, len(query)
    while i < n:
        c = query[i]
        if c.isspace():
            i += 1
            continue
        if c in "()":
            toks.append((c, c))
            i += 1
            continue
        if query.startswith("&&", i):
            toks.append(("AND", "&&"))
            i += 2
            continue
        if query.startswith("||", i):
            toks.append(("OR", "||"))
            i += 2
            continue
        if c == "!":
            toks.append(("NOT", "!"))
            i += 1
            continue
        if c == "+":
            toks.append(("PLUS", "+"))
            i += 1
            continue
        if c == "-":
            toks.append(("MINUS", "-"))
            i += 1
            continue
        if c == '"':
            j = query.find('"', i + 1)
            if j < 0:
                raise ValueError(f"unterminated phrase quote at {i}: {query!r}")
            toks.append(("PHRASE", query[i + 1 : j]))
            i = j + 1
            if i < n and query[i] == "~":
                raise ValueError(
                    "phrase slop (\"...\"~N) is not supported — the "
                    "engine's phrase executor is exact-positional; use "
                    "proximity_search (operators/search.py) for sloppy "
                    "two-term proximity"
                )
            continue
        if c in "[{":
            j = i + 1
            while j < n and query[j] not in "]}":
                j += 1
            if j >= n:
                raise ValueError(f"unterminated range at {i}: {query!r}")
            toks.append(("RANGE", (c, query[i + 1 : j].strip(), query[j])))
            i = j + 1
            continue
        j = i
        while j < n and query[j] not in _WORD_BREAK:
            j += 1
        w = query[i:j]
        if j < n and query[j] == ":":
            toks.append(("FIELD", w))
            i = j + 1
            continue
        up = w.upper()
        if up == "AND":
            toks.append(("AND", w))
        elif up == "OR":
            toks.append(("OR", w))
        elif up == "NOT":
            toks.append(("NOT", w))
        else:
            toks.append(("WORD", w))
        i = j
    return toks


def _range_spec(tok_val: tuple[str, str, str], field: str) -> dict:
    """``[a TO b]`` token → ES range spec (mixed inclusivity allowed,
    ``*`` = open end)."""
    open_c, body, close_c = tok_val
    parts = _TO_RE.split(body)
    if len(parts) != 2:
        raise ValueError(
            f"range on {field!r} must be '[lo TO hi]': {body!r}"
        )
    lo, hi = parts[0].strip(), parts[1].strip()
    spec: dict = {}
    if lo != "*":
        spec["gte" if open_c == "[" else "gt"] = _typed(lo)
    if hi != "*":
        spec["lte" if close_c == "]" else "lt"] = _typed(hi)
    if not spec:
        raise ValueError(f"range on {field!r} has two open ends")
    return spec


def _word_leaves(field: str, raw: str, text_col: str) -> list[dict]:
    """One unquoted word → leaf DSL node(s). A text-field word with
    punctuation degrades to its constituent tokens as SEPARATE
    clauses (the simple_query_string lenient-analyzer behavior, kept
    for dialect parity)."""
    if raw.startswith("/") and raw.endswith("/") and len(raw) > 2:
        raise ValueError(
            f"regex field syntax {raw!r} is not supported in "
            "query_string — use regexp_search (operators/search.py) "
            "or the DSL regexp query"
        )
    if "^" in raw:
        raise ValueError(
            f"boost syntax {raw!r} is not supported in query_string — "
            "per-leg weighting is served by the DSL boosting / "
            "function_score queries (operators/search.py)"
        )
    is_text = field == text_col
    m = _FUZZY_RE.match(raw)
    if m and not any(ch in m.group(1) for ch in "*?"):
        if not is_text:
            raise ValueError(
                f"fuzzy on metadata field {field!r} is not supported "
                "— fuzzy expansion runs on the analyzed text "
                "vocabulary (fuzzy_search serves indexed fuzzy)"
            )
        base = m.group(1).lower()
        toks = _analyze(base)
        if len(toks) != 1:
            raise ValueError(f"fuzzy probe must be one token: {raw!r}")
        edits = int(m.group(2)) if m.group(2) else 2
        if edits < 0 or edits > 2:
            raise ValueError("fuzziness must be 0..2 (Lucene contract)")
        return [{"fuzzy": {field: {"value": toks[0], "fuzziness": edits}}}]
    if "*" in raw or "?" in raw:
        if not is_text:
            raise ValueError(
                f"wildcard on metadata field {field!r} is not "
                "supported — wildcard expansion runs on the analyzed "
                "text vocabulary (wildcard_search serves indexed "
                "wildcards)"
            )
        if not raw.strip("*?"):
            raise ValueError(
                f"wildcard {raw!r} needs at least one literal "
                "character (a bare wildcard would match the whole "
                "index)"
            )
        return [{"wildcard": {field: {"value": raw.lower()}}}]
    if is_text:
        toks = _analyze(raw)
        if not toks:
            raise ValueError(f"text term {raw!r} analyzes to no tokens")
        return [{"term": {field: t}} for t in toks]
    return [{"terms": {field: [_typed(raw)]}}]


def _phrase_leaf(field: str, text: str, text_col: str) -> dict:
    if field != text_col:
        # quoted metadata value = exact (case-sensitive) equality
        return {"terms": {field: [text]}}
    toks = _analyze(text)
    if not toks:
        raise ValueError(f"phrase {text!r} analyzes to no tokens")
    if len(toks) == 1:
        return {"term": {field: toks[0]}}
    return {"match_phrase": {field: " ".join(toks)}}


class _Parser:
    def __init__(self, toks, *, default_operator: str, text_col: str):
        if default_operator not in ("or", "and"):
            raise ValueError("default_operator must be 'or' or 'and'")
        self.toks = toks
        self.i = 0
        self.default_occur = (
            "must" if default_operator == "and" else "should"
        )
        self.text_col = text_col

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def parse_seq(self, field: str) -> dict:
        """One clause sequence (top level or one paren group) → one
        ES bool node. Entries carry (occur, node, explicit): the
        classic QueryParser conjunction rule promotes/demotes the
        non-explicit neighbours of AND/OR."""
        entries: list[list] = []  # [occur, node, explicit]
        next_occur: str | None = None
        while True:
            k, v = self._peek()
            if k is None or k == ")":
                break
            if k in ("AND", "OR"):
                if not entries:
                    raise ValueError(f"dangling operator {v!r}")
                conj = "must" if k == "AND" else "should"
                prev = entries[-1]
                if not prev[2] and prev[0] in ("must", "should"):
                    prev[0] = conj
                next_occur = conj
                self.i += 1
                continue
            occur, explicit = None, False
            while self._peek()[0] in ("NOT", "MINUS", "PLUS"):
                mk = self._peek()[0]
                if mk in ("NOT", "MINUS"):
                    # double negation cancels (Lucene parses it away)
                    occur = None if occur == "must_not" else "must_not"
                else:
                    occur = occur or "must"
                explicit = True
                self.i += 1
            nodes = self.parse_primary(field)
            base = (
                occur
                if occur is not None
                else (next_occur if next_occur else self.default_occur)
            )
            next_occur = None
            for nd in nodes:
                entries.append([base, nd, explicit])
        if not entries:
            raise ValueError("empty clause group")
        out: dict = {}
        for occ, node, _exp in entries:
            out.setdefault(occ, []).append(node)
        if "must_not" in out and "must" not in out and "should" not in out:
            # pure-negative group: matches every OTHER doc, score 0
            out["minimum_should_match"] = 0
        return {"bool": out}

    def parse_primary(self, field: str) -> list[dict]:
        k, v = self._peek()
        if k == "(":
            self.i += 1
            node = self.parse_seq(field)
            if self._peek()[0] != ")":
                raise ValueError("unbalanced parentheses")
            self.i += 1
            return [node]
        if k == "FIELD":
            self.i += 1
            if v == "_exists_":
                nk, nv = self._peek()
                if nk != "WORD":
                    raise ValueError("_exists_: needs a field name")
                self.i += 1
                return [{"exists": {"field": nv}}]
            nk, nv = self._peek()
            if nk == "(":
                self.i += 1
                node = self.parse_seq(v)
                if self._peek()[0] != ")":
                    raise ValueError("unbalanced parentheses")
                self.i += 1
                return [node]
            if nk == "RANGE":
                if v == self.text_col:
                    raise ValueError(
                        f"range on the analyzed text field {v!r} is "
                        "not supported — ranges serve metadata fields"
                    )
                self.i += 1
                return [{"range": {v: _range_spec(nv, v)}}]
            if nk == "PHRASE":
                self.i += 1
                return [_phrase_leaf(v, nv, self.text_col)]
            if nk == "WORD":
                cm = _CMP_RE.match(nv)
                if cm:
                    if v == self.text_col:
                        raise ValueError(
                            f"comparison on the analyzed text field "
                            f"{v!r} is not supported"
                        )
                    op = {">=": "gte", ">": "gt",
                          "<=": "lte", "<": "lt"}[cm.group(1)]
                    self.i += 1
                    return [{"range": {v: {op: _typed(cm.group(2))}}}]
                self.i += 1
                return _word_leaves(v, nv, self.text_col)
            raise ValueError(f"field {v!r}: expected a value, got {nk}")
        if k == "PHRASE":
            self.i += 1
            return [_phrase_leaf(field, v, self.text_col)]
        if k == "WORD":
            self.i += 1
            return _word_leaves(field, v, self.text_col)
        if k == "RANGE":
            raise ValueError("a range needs a field: field:[lo TO hi]")
        raise ValueError(f"unexpected token {v!r}")


def compile_query_string(
    query: str,
    *,
    default_operator: str = "or",
    text_col: str = "text",
) -> dict:
    """Parse a query_string and compile it to the engine's ES-DSL
    bool tree. Wildcard / fuzzy leaves stay symbolic
    (``{"wildcard": ...}`` / ``{"fuzzy": ...}``) — run the result
    through :func:`expand_multiterm` before handing it to
    ``bool_tree_search``. Pure function of the string (no corpus
    access)."""
    toks = tokenize_query_string(query)
    if not toks:
        raise ValueError("empty query string")
    p = _Parser(toks, default_operator=default_operator, text_col=text_col)
    tree = p.parse_seq(text_col)
    if p.i != len(toks):
        raise ValueError(f"unbalanced parentheses in {query!r}")
    return tree


def _meta_fields(dsl: dict) -> set[str]:
    """All metadata field names referenced by a compiled tree."""
    out: set[str] = set()
    kind, body = next(iter(dsl.items()))
    if kind == "bool":
        for role in ("must", "should", "must_not", "filter"):
            for ch in body.get(role, []):
                out |= _meta_fields(ch)
    elif kind in ("range", "terms"):
        out |= set(body.keys())
    elif kind == "exists":
        out.add(body["field"])
    return out


def expand_multiterm(dsl: dict, expand) -> dict:
    """Rewrite symbolic wildcard / fuzzy leaves into scoring
    should-groups of expanded vocabulary terms (Lucene's
    scoring-boolean multi-term rewrite). ``expand(kind, field,
    value, fuzziness)`` returns the SORTED matching vocabulary terms;
    an empty expansion becomes a match-nothing group."""
    kind, body = next(iter(dsl.items()))
    if kind == "bool":
        out = {}
        for role in ("must", "should", "must_not", "filter"):
            if role in body:
                out[role] = [expand_multiterm(n, expand) for n in body[role]]
        if "minimum_should_match" in body:
            out["minimum_should_match"] = body["minimum_should_match"]
        return {"bool": out}
    if kind in ("wildcard", "fuzzy"):
        ((field, spec),) = body.items()
        terms = expand(
            kind, field, spec["value"], spec.get("fuzziness")
        )
        return {
            "bool": {
                "should": [{"term": {field: t}} for t in terms],
                "minimum_should_match": 1,
            }
        }
    return dsl


def _has_multiterm(dsl: dict) -> bool:
    kind, body = next(iter(dsl.items()))
    if kind == "bool":
        return any(
            _has_multiterm(n)
            for role in ("must", "should", "must_not", "filter")
            for n in body.get(role, [])
        )
    return kind in ("wildcard", "fuzzy")


def _has_scoring_leaf(dsl: dict) -> bool:
    """True when the tree has at least one clause or metadata leaf
    (bool_tree_search rejects fully-empty trees — a wildcard that
    expanded to nothing can empty the whole query)."""
    kind, body = next(iter(dsl.items()))
    if kind == "bool":
        return any(
            _has_scoring_leaf(n)
            for role in ("must", "should", "must_not", "filter")
            for n in body.get(role, [])
        )
    return True


def inline_query_strings(dsl: dict, *, text_col: str = "text") -> dict:
    """Rewrite ``query_string`` leaves ANYWHERE inside a bool body
    into their compiled trees — the Kibana Discover request shape
    (DQL query bar + filter pills + time range arrive as one bool:
    ``{"bool": {"must": [{"query_string": ...}], "filter":
    [{"range": ...}]}}``). Pure compile: multi-term shapes (wildcard
    / fuzzy) are reasoned-rejected here because vocabulary expansion
    needs the corpus — use query_string as the TOP-LEVEL query for
    those (execute_search_dsl routes it through the expanding
    executor)."""
    kind, body = next(iter(dsl.items()))
    if kind == "query_string":
        qs = body["query"] if isinstance(body, dict) else body
        op = (
            body.get("default_operator", "or")
            if isinstance(body, dict) else "or"
        ).lower()
        tree = compile_query_string(
            qs, default_operator=op, text_col=text_col
        )
        if _has_multiterm(tree):
            raise ValueError(
                "wildcard/fuzzy inside an embedded query_string leaf "
                "need vocabulary expansion — put the query_string at "
                "the TOP LEVEL of the query body (that route expands "
                "against the corpus vocabulary)"
            )
        return tree
    if kind == "bool":
        out: dict = {}
        for role in ("must", "should", "must_not", "filter"):
            if role in body:
                items = body[role]
                items = items if isinstance(items, list) else [items]
                out[role] = [
                    inline_query_strings(n, text_col=text_col)
                    for n in items
                ]
        if "minimum_should_match" in body:
            out["minimum_should_match"] = body["minimum_should_match"]
        return {"bool": out}
    return dsl


def _wildcard_regex(pattern: str) -> str:
    return "".join(
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
        for ch in pattern.lower()
    )


def query_string_search(
    docs: DataFrame,
    query: str,
    *,
    default_operator: str = "or",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    max_expansions: int = _MAX_CLAUSE_COUNT,
) -> DataFrame:
    """Execute a Lucene query_string / Kibana-DQL query against the
    document corpus (module docstring: grammar, scoring, rejections).
    Returns (id, score, n_clauses_hit) ordered (score DESC, id ASC),
    top_k (None = uncut).

    Scale shape: the compiled tree runs through ``bool_tree_search``
    — ONE tokenize pass, corpus-wide stats in one aggregate, scoring
    in whole-stage codegen. Wildcard / fuzzy expansion evaluates on
    the DISTINCT VOCABULARY (never the corpus): one distinct-token
    relation serves every pattern in the query, matches collect to
    the driver (bounded by ``max_expansions`` — exceeding it raises
    the Lucene ``too_many_clauses`` error rather than silently
    truncating) and re-enter as literal term clauses.
    """
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        bool_tree_search,
    )

    dsl = compile_query_string(
        query, default_operator=default_operator, text_col=text_col
    )
    unknown = sorted(_meta_fields(dsl) - set(docs.columns))
    if unknown:
        raise ValueError(
            f"query_string references non-existent fields {unknown}; "
            f"document columns: {sorted(docs.columns)}"
        )

    if _has_multiterm(dsl):
        # Every pattern in the query evaluates against the distinct
        # vocabulary in ONE job (r17): the per-clause formulation ran
        # one serialized collect per wildcard/fuzzy leaf over a
        # persisted vocab (build job + N collect jobs + cache churn);
        # batching the conditions into one projection keeps the exact
        # per-clause match sets — each term reports which specs it
        # satisfies — while scanning the vocabulary once (guide §5.3
        # driver actions / §2.1 recompute-vs-reuse).
        gathered: list[tuple] = []

        def _gather(kind, _field, value, fuzziness):
            gathered.append((kind, value, fuzziness))
            return []

        expand_multiterm(dsl, _gather)  # traversal-ordered spec list
        specs = list(dict.fromkeys(gathered))
        conds = []
        for idx, (kind, value, fuzziness) in enumerate(specs):
            if kind == "wildcard":
                c = F.col("term").rlike(f"^{_wildcard_regex(value)}$")
            else:
                probe = F.lit(value)
                c = (
                    (F.length("term")
                     >= F.length(probe) - F.lit(fuzziness))
                    & (F.length("term")
                       <= F.length(probe) + F.lit(fuzziness))
                    & (F.levenshtein(F.col("term"), probe)
                       <= F.lit(fuzziness))
                )
            conds.append(F.when(c, F.lit(idx)))
        vocab = docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda x: x != F.lit(""),
                )
            ).alias("term")
        ).distinct()
        matched = (
            vocab.select(
                "term", F.array(*conds).alias("_m")
            )
            .select(
                "term",
                F.explode(
                    F.filter(F.col("_m"), lambda x: x.isNotNull())
                ).alias("_i"),
            )
            .collect()
        )
        by_spec: dict[int, list] = {}
        for r in matched:
            by_spec.setdefault(r["_i"], []).append(r["term"])
        spec_idx = {s: i for i, s in enumerate(specs)}

        def expand(kind, _field, value, fuzziness):
            terms = sorted(
                by_spec.get(spec_idx[(kind, value, fuzziness)], [])
            )
            if len(terms) > max_expansions:
                raise ValueError(
                    f"too_many_clauses: {kind} {value!r} expands to "
                    f"{len(terms)} terms (> {max_expansions}) — "
                    "narrow the pattern or raise max_expansions"
                )
            return terms

        dsl = expand_multiterm(dsl, expand)

    if not _has_scoring_leaf(dsl):
        # every leaf expanded away: deterministic empty result
        return docs.select(
            F.col(id_col),
            F.lit(None).cast("double").alias("score"),
            F.lit(0).cast("long").alias("n_clauses_hit"),
        ).filter(F.lit(False))
    return bool_tree_search(
        docs, dsl, text_col=text_col, id_col=id_col, k1=k1, b=b,
        top_k=top_k,
    )


def _levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance — the ORACLE-side expansion kernel
    (independent of Spark's levenshtein)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def query_string_oracle_sql(
    query: str,
    *,
    default_operator: str = "or",
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    parquet_path: str | None = None,
) -> "str | None":
    """DuckDB SQL computing the identical query_string search. The
    boolean skeleton mirrors through ``bool_tree_oracle_sql``;
    wildcard / fuzzy expansion runs on an INDEPENDENT path — the
    vocabulary comes from a duckdb scan of ``parquet_path`` and the
    pattern/edit-distance kernels are pure Python (regex fullmatch /
    DP Levenshtein), so the expansion never echoes the engine.
    Returns None when expansion is needed but the fixture is absent
    (registry gate degrades to rows-only)."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        bool_tree_oracle_sql,
    )

    dsl = compile_query_string(
        query, default_operator=default_operator, text_col=text_col
    )
    if _has_multiterm(dsl):
        import os

        if parquet_path is None or not os.path.exists(parquet_path):
            return None
        import duckdb

        rows = duckdb.sql(
            f"""
            SELECT DISTINCT u.t FROM (
                SELECT list_filter(
                    string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                    x -> x <> '') AS toks
                FROM read_parquet('{parquet_path}')) d,
                UNNEST(d.toks) AS u(t)
            """
        ).fetchall()
        vocab = sorted(r[0] for r in rows)

        def expand(kind, _field, value, fuzziness):
            if kind == "wildcard":
                rx = re.compile(_wildcard_regex(value))
                return [t for t in vocab if rx.fullmatch(t)]
            return [
                t for t in vocab
                if abs(len(t) - len(value)) <= fuzziness
                and _levenshtein(t, value) <= fuzziness
            ]

        dsl = expand_multiterm(dsl, expand)
    if not _has_scoring_leaf(dsl):
        return (
            f"SELECT {id_col}, CAST(NULL AS DOUBLE) AS score, "
            f"CAST(0 AS BIGINT) AS n_clauses_hit FROM {table} WHERE FALSE"
        )
    return bool_tree_oracle_sql(
        dsl, table=table, text_col=text_col, id_col=id_col, k1=k1, b=b,
        top_k=top_k,
    )


__all__ = [
    "compile_query_string",
    "expand_multiterm",
    "query_string_oracle_sql",
    "query_string_search",
    "tokenize_query_string",
]
