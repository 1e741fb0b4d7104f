"""Restricted Painless arithmetic for the ES ``script_score`` query.

Reference parity: the reference's OpenSearch Discover surface exposes
the full query DSL against the indexed CDC documents (reference
README.md:388-441); ``script_score`` is the DSL's custom-ranking
escape hatch — "compute the score from a script over ``_score`` and
document fields". This module implements the arithmetic subset of
Painless that covers the documented script_score idioms (weighted
sums of saturations/field values, the shapes the ES docs themselves
use as examples), as ONE grammar with TWO backends: the parsed AST
compiles to a PySpark ``Column`` (the engine) and to a DuckDB SQL
expression (the oracle), so the gate verifies the exact arithmetic
the engine runs.

Supported grammar
-----------------
- ``_score`` — the inner query's BM25 score
- ``doc['field'].value`` (or ``doc.field.value``) — a numeric
  document field, evaluated as DOUBLE
- ``params.name`` — a numeric parameter, substituted at parse time
  from the request's ``params`` object (the ES best practice for
  reusable compiled scripts)
- numeric literals; ``+ - * /`` with standard precedence; unary
  minus; parentheses
- calls: ``Math.abs/max/min/pow/log/sqrt/exp``, and the script_score
  helper ``saturation(v, pivot)`` = ``v / (v + pivot)``

Determinism stance (the repo-wide oracle contract, see
operators/scoring.py): ``+ - * /``, ``abs``, ``max``/``min`` and
``saturation`` are single correctly-rounded IEEE-754 ops —
bit-identical cross-engine. ``Math.pow`` is restricted to literal
integer exponents in [-8, 8] and expands to an explicit multiply
chain IN BOTH BACKENDS (non-integer pow is libm, not portable).
``Math.log``/``sqrt``/``exp`` parse and execute, but
:func:`has_transcendental` flags them so callers keep
transcendental scripts out of bit-exact oracle gates (sqrt is IEEE
correctly-rounded, log/exp are not guaranteed across libms — the
flag covers all three for one conservative rule).

Deliberate simplifications, each documented as the contract:
- every literal is a DOUBLE: Painless's int/int truncating division
  is NOT modeled (``3 / 2`` is 1.5 here) — scoring scripts are
  double-typed in practice and double semantics are what the two
  backends share exactly;
- rows where the expression evaluates NULL (a referenced field is
  NULL) are dropped from the result — Painless throws on missing
  values, a distributed engine can't, and dropping is deterministic
  and identical in both backends;
- ES rejects negative script scores at runtime; the engine keeps
  them (the ranking stays total and deterministic) — enforcing
  non-negativity is the script author's contract.

Everything else (variables, conditionals, strings, loops, method
calls beyond the list above) is a reasoned ``ValueError`` naming the
nearest supported alternative.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUM_RE = re.compile(r"\d+(?:\.\d+)?(?:[eE][+-]?\d+)?")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

_TRANSCENDENTAL = ("log", "sqrt", "exp")
_CALLS_1 = ("abs", "log", "sqrt", "exp")
_MAX_POW = 8


def _tokenize(source: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    i, n = 0, len(source)
    while i < n:
        c = source[i]
        if c.isspace():
            i += 1
            continue
        if c in "+-*/(),[]":
            toks.append(("op", c))
            i += 1
            continue
        if c in "'\"":
            j = source.find(c, i + 1)
            if j < 0:
                raise ValueError(f"unterminated string at {i}: {source!r}")
            toks.append(("str", source[i + 1:j]))
            i = j + 1
            continue
        m = _NUM_RE.match(source, i)
        if m:
            toks.append(("num", float(m.group())))
            i = m.end()
            continue
        if c == "." and _IDENT_RE.match(source, i + 1):
            # accessor after a bracket: doc['field'].value — the dot
            # starts a fresh ident token the parser eats as ["value"]
            i += 1
            c = source[i]
        m = _IDENT_RE.match(source, i)
        if m:
            # dotted paths lex as one token: Math.log, params.x,
            # doc.field.value
            parts = [m.group()]
            i = m.end()
            while i < n and source[i] == ".":
                m2 = _IDENT_RE.match(source, i + 1)
                if not m2:
                    raise ValueError(
                        f"dangling '.' at {i} in {source!r}"
                    )
                parts.append(m2.group())
                i = m2.end()
            toks.append(("ident", parts))
            continue
        raise ValueError(
            f"unsupported character {c!r} at {i} in script {source!r} "
            "(the supported grammar is arithmetic over _score / "
            "doc['field'].value / params.*)"
        )
    return toks


class _Parser:
    def __init__(self, toks, params):
        self.toks = toks
        self.i = 0
        self.params = params or {}

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _eat(self, kind=None, val=None):
        k, v = self._peek()
        if k is None or (kind and k != kind) or (val and v != val):
            raise ValueError(
                f"expected {val or kind} at token {self.i} "
                f"(got {v!r})"
            )
        self.i += 1
        return v

    def expr(self):
        node = self.term()
        while self._peek() == ("op", "+") or self._peek() == ("op", "-"):
            op = self._eat("op")
            node = ("bin", op, node, self.term())
        return node

    def term(self):
        node = self.unary()
        while self._peek() == ("op", "*") or self._peek() == ("op", "/"):
            op = self._eat("op")
            node = ("bin", op, node, self.unary())
        return node

    def unary(self):
        if self._peek() == ("op", "-"):
            self._eat("op", "-")
            node = self.unary()
            if node[0] == "num":  # fold: Math.pow(x, -2) sees a num
                return ("num", -node[1])
            return ("neg", node)
        return self.primary()

    def _args(self, fn, want):
        self._eat("op", "(")
        args = [self.expr()]
        while self._peek() == ("op", ","):
            self._eat("op", ",")
            args.append(self.expr())
        self._eat("op", ")")
        if len(args) != want:
            raise ValueError(f"{fn} takes {want} argument(s), got {len(args)}")
        return args

    def primary(self):
        k, v = self._peek()
        if k == "num":
            self._eat("num")
            return ("num", v)
        if k == "op" and v == "(":
            self._eat("op", "(")
            node = self.expr()
            self._eat("op", ")")
            return node
        if k != "ident":
            raise ValueError(f"expected a value, got {v!r}")
        parts = self._eat("ident")
        head = parts[0]
        if parts == ["_score"]:
            return ("score",)
        if head == "doc":
            if len(parts) == 1:
                # doc['field'].value
                self._eat("op", "[")
                field = self._eat("str")
                self._eat("op", "]")
                tail = self._eat("ident")
                if tail != ["value"]:
                    raise ValueError(
                        "doc['field'] must be read as .value "
                        "(other accessors are not supported)"
                    )
                return ("field", field)
            if len(parts) == 3 and parts[2] == "value":
                return ("field", parts[1])
            raise ValueError(
                f"unsupported doc accessor {'.'.join(parts)!r} "
                "(use doc['field'].value)"
            )
        if head == "params":
            if len(parts) != 2:
                raise ValueError("params access is params.<name>")
            name = parts[1]
            if name not in self.params:
                raise ValueError(
                    f"script references params.{name} but the request "
                    f"params object has {sorted(self.params)}"
                )
            return ("num", float(self.params[name]))
        if head == "Math":
            if len(parts) != 2:
                raise ValueError(f"unsupported path {'.'.join(parts)!r}")
            fn = parts[1]
            if fn == "pow":
                base, exp = self._args("Math.pow", 2)
                if exp[0] != "num" or float(exp[1]) != int(exp[1]) or \
                        abs(int(exp[1])) > _MAX_POW:
                    raise ValueError(
                        "Math.pow needs a literal integer exponent in "
                        f"[-{_MAX_POW}, {_MAX_POW}] (non-integer pow "
                        "is libm, not bit-portable; it expands to an "
                        "explicit multiply chain in both backends)"
                    )
                return ("pow", base, int(exp[1]))
            if fn in _CALLS_1:
                return ("call", fn, self._args(f"Math.{fn}", 1))
            if fn in ("max", "min"):
                return ("call", fn, self._args(f"Math.{fn}", 2))
            raise ValueError(
                f"unsupported function Math.{fn} (supported: abs, "
                "max, min, pow, log, sqrt, exp)"
            )
        if head == "saturation":
            if len(parts) != 1:
                raise ValueError(f"unsupported path {'.'.join(parts)!r}")
            return ("call", "saturation", self._args("saturation", 2))
        if head == "sigmoid":
            raise ValueError(
                "sigmoid(v, k, a) needs non-integer pow — not "
                "bit-portable; use saturation(v, pivot)"
            )
        raise ValueError(
            f"unsupported identifier {'.'.join(parts)!r} (supported: "
            "_score, doc['field'].value, params.*, Math.*, saturation)"
        )


def parse_script(source: str, params: dict | None = None):
    """Parse a script_score ``source`` string to the internal AST,
    substituting ``params`` values as literals."""
    if not source or not source.strip():
        raise ValueError("empty script source")
    p = _Parser(_tokenize(source), params)
    node = p.expr()
    if p.i != len(p.toks):
        raise ValueError(
            f"trailing tokens after expression at {p.i} in {source!r}"
        )
    return node


def script_fields(ast) -> set[str]:
    """Document fields the script reads."""
    kind = ast[0]
    if kind == "field":
        return {ast[1]}
    if kind == "bin":
        return script_fields(ast[2]) | script_fields(ast[3])
    if kind in ("neg", "pow"):
        return script_fields(ast[1])
    if kind == "call":
        out: set[str] = set()
        for a in ast[2]:
            out |= script_fields(a)
        return out
    return set()


def uses_score(ast) -> bool:
    kind = ast[0]
    if kind == "score":
        return True
    if kind == "bin":
        return uses_score(ast[2]) or uses_score(ast[3])
    if kind in ("neg", "pow"):
        return uses_score(ast[1])
    if kind == "call":
        return any(uses_score(a) for a in ast[2])
    return False


def has_transcendental(ast) -> bool:
    """True when the script calls log/sqrt/exp — keep such scripts
    out of bit-exact cross-engine oracle gates."""
    kind = ast[0]
    if kind == "call" and ast[1] in _TRANSCENDENTAL:
        return True
    if kind == "bin":
        return has_transcendental(ast[2]) or has_transcendental(ast[3])
    if kind in ("neg", "pow"):
        return has_transcendental(ast[1])
    if kind == "call":
        return any(has_transcendental(a) for a in ast[2])
    return False


def _pow_chain(x, n: int, one, mul, div):
    if n == 0:
        return one
    out = x
    for _ in range(abs(n) - 1):
        out = mul(out, x)
    return out if n > 0 else div(one, out)


def to_column(ast, *, score: Column | None = None) -> Column:
    """Compile the AST to a PySpark Column. ``score`` binds
    ``_score``; field reads become ``F.col(name).cast("double")``."""
    kind = ast[0]
    if kind == "num":
        return F.lit(float(ast[1]))
    if kind == "score":
        if score is None:
            raise ValueError("_score is not available in this context")
        return score
    if kind == "field":
        return F.col(ast[1]).cast("double")
    if kind == "neg":
        return -to_column(ast[1], score=score)
    if kind == "bin":
        a = to_column(ast[2], score=score)
        b = to_column(ast[3], score=score)
        return {"+": a + b, "-": a - b, "*": a * b, "/": a / b}[ast[1]]
    if kind == "pow":
        return _pow_chain(
            to_column(ast[1], score=score), ast[2], F.lit(1.0),
            lambda a, b: a * b, lambda a, b: a / b,
        )
    fn, args = ast[1], [to_column(a, score=score) for a in ast[2]]
    if fn == "abs":
        return F.abs(args[0])
    if fn == "max":
        return F.greatest(*args)
    if fn == "min":
        return F.least(*args)
    if fn == "saturation":
        return args[0] / (args[0] + args[1])
    if fn == "log":
        return F.log(args[0])
    if fn == "sqrt":
        return F.sqrt(args[0])
    if fn == "exp":
        return F.exp(args[0])
    raise AssertionError(fn)


def to_sql(ast, *, score_expr: str = "_score",
           field=lambda name: f"CAST({name} AS DOUBLE)") -> str:
    """Compile the same AST to a DuckDB SQL expression (the oracle
    backend). ``score_expr`` substitutes ``_score``; ``field`` maps a
    field name to its SQL reference."""
    kind = ast[0]
    if kind == "num":
        return f"CAST({float(ast[1])!r} AS DOUBLE)"
    if kind == "score":
        return f"({score_expr})"
    if kind == "field":
        return field(ast[1])
    if kind == "neg":
        return f"(- {to_sql(ast[1], score_expr=score_expr, field=field)})"
    if kind == "bin":
        a = to_sql(ast[2], score_expr=score_expr, field=field)
        b = to_sql(ast[3], score_expr=score_expr, field=field)
        return f"({a} {ast[1]} {b})"
    if kind == "pow":
        return _pow_chain(
            to_sql(ast[1], score_expr=score_expr, field=field),
            ast[2], "CAST(1.0 AS DOUBLE)",
            lambda a, b: f"({a} * {b})", lambda a, b: f"({a} / {b})",
        )
    fn = ast[1]
    args = [to_sql(a, score_expr=score_expr, field=field) for a in ast[2]]
    if fn == "abs":
        return f"abs({args[0]})"
    if fn == "max":
        return f"greatest({args[0]}, {args[1]})"
    if fn == "min":
        return f"least({args[0]}, {args[1]})"
    if fn == "saturation":
        return f"({args[0]} / ({args[0]} + {args[1]}))"
    if fn == "log":
        return f"ln({args[0]})"
    if fn == "sqrt":
        return f"sqrt({args[0]})"
    if fn == "exp":
        return f"exp({args[0]})"
    raise AssertionError(fn)


def script_score_search(
    docs: DataFrame,
    hits: DataFrame,
    source: str,
    *,
    params: dict | None = None,
    min_score: float | None = None,
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """``script_score`` query — rescore an inner query's hit relation
    with a Painless arithmetic script (module docstring for the
    grammar and the determinism stance).

    ``hits`` is the UNCUT inner hit relation carrying
    ``(id_col, score)`` (the aggs-scope contract —
    :func:`operators.dsl.execute_search_dsl` with ``top_k=None``).
    Fields the script reads attach via ONE id-keyed join moving only
    ``(id, field…)`` pairs; the script evaluates as a single
    whole-stage-codegen projection; ``min_score`` cuts AFTER
    rescoring (the ES contract); the final cut is
    TakeOrderedAndProject. Rows whose script value is NULL are
    dropped (documented contract).

    Returns (id, base_score, score) ordered (score DESC, id ASC).
    """
    ast = parse_script(source, params)
    needed = sorted(script_fields(ast))
    inner = hits.select(
        F.col(id_col), F.col("score").alias("base_score")
    )
    if needed:
        fields_df = docs.select(F.col(id_col), *[F.col(c) for c in needed])
        inner = inner.join(fields_df, id_col, "inner")
    new_score = to_column(ast, score=F.col("base_score"))
    out = inner.select(
        F.col(id_col), F.col("base_score"), new_score.alias("score")
    ).filter(F.col("score").isNotNull())
    if min_score is not None:
        out = out.filter(F.col("score") >= F.lit(float(min_score)))
    out = out.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return out if top_k is None else out.limit(top_k)


def script_score_oracle_sql(
    query_terms: list[str],
    source: str,
    *,
    params: dict | None = None,
    min_score: float | None = None,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """DuckDB SQL for a script_score over an OR-match inner query:
    the same quantized-exact BM25 CTE the scoring family pins
    (operators/scoring.py:rank_feature_oracle_sql) with the script
    compiled by :func:`to_sql` on top. Rejects transcendental
    scripts — those verify against a Python reference in tests, not
    a bit-exact cross-engine gate."""
    ast = parse_script(source, params)
    if has_transcendental(ast):
        raise ValueError(
            "transcendental scripts (log/sqrt/exp) are not bit-exact "
            "cross-engine; gate them rows-only or test against a "
            "Python reference"
        )
    terms = sorted({t.lower() for t in query_terms})
    in_list = ", ".join(f"'{t}'" for t in terms)
    expr = to_sql(
        ast, score_expr="b2.base_score",
        field=lambda name: f"CAST(d.{name} AS DOUBLE)",
    )
    guard = f"AND ({expr}) >= CAST({float(min_score)!r} AS DOUBLE)" \
        if min_score is not None else ""
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
                   AS base_score
        FROM contrib
        GROUP BY {id_col}
    )
    SELECT b2.{id_col}, b2.base_score, ({expr}) AS score
    FROM bm25 b2 JOIN {table} d ON b2.{id_col} = d.{id_col}
    WHERE ({expr}) IS NOT NULL {guard}
    ORDER BY score DESC, b2.{id_col} ASC
    LIMIT {top_k}
    """


__all__ = [
    "parse_script",
    "script_fields",
    "uses_score",
    "has_transcendental",
    "to_column",
    "to_sql",
    "script_score_search",
    "script_score_oracle_sql",
]
