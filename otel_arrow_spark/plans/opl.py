"""OPL front-end: a pipe-delimited query language compiled to DataFrame ops.

Reference: the transform processor's query path — pest-parsed OPL/KQL into
a language-neutral PipelineExpression IR, planned into pipeline stages
(query-engine-languages/src/opl/parser.rs:78; pipeline/planner.rs:81-93;
stages filter.rs/assign.rs/routing.rs; flow_control.md; functions.md).

This is a from-scratch Python implementation of the *language surface*,
not a port: a hand-written tokenizer + recursive-descent parser producing
small AST dataclasses, compiled directly to pyspark Column expressions —
Catalyst plays the role of both the IR optimizer (constant folding,
set-coalescing → CollapseProject) and the physical planner.

Supported subset (the operators the reference ships today):

    source
    | where <predicate>
    | set <field> = <expr> [, <field> = <expr> ...]
    | drop                       -- discard all rows reaching this stage
    | route_to "port"            -- divert stream to a named output port
    | summarize a = count(), b = sum(x) by k1, k2

Expressions: literals ('s', "s", 1, 1.5, true, false, null), columns,
``attributes['key']`` map access, arithmetic + - * / %, comparisons
== != > >= < <= =~ (case-insensitive eq), and/or/not, parentheses, and the
OPL function library (functions.md) bound to otel_arrow_spark.functions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from otel_arrow_spark.functions import scalar as fns

# ---------------------------------------------------------------------------
# tokenizer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*)
  | (?P<timespan>(?:\d+\.\d+|\d+)(?:ms|d|h|m|s)(?![A-Za-z0-9_]))
  | (?P<num>\d+\.\d+|\d+)
  | (?P<str>[rR]?'(?:[^'\\]|\\.)*'|[rR]?"(?:[^"\\]|\\.)*")
  | (?P<op>=~|==|!=|>=|<=|[><+\-*/%(),\[\]={}|;:])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
""",
    re.VERBOSE,
)

KEYWORDS = {"and", "or", "not", "true", "false", "null", "where", "set", "drop",
            "route_to", "summarize", "by"}


@dataclass
class Tok:
    kind: str  # num | str | op | ident
    text: str


def tokenize(src: str) -> list[Tok]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise OplSyntaxError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):  # // line comments (opl.pest COMMENT)
            continue
        out.append(Tok(kind, m.group()))
    return out


class OplSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST

@dataclass
class Lit:
    value: object


@dataclass
class Col:
    name: str


@dataclass
class AttrAccess:
    map_col: str
    key: str


@dataclass
class ListLit:
    items: list


@dataclass
class Bin:
    op: str
    left: object
    right: object


@dataclass
class Not:
    expr: object


@dataclass
class Call:
    name: str
    args: list


@dataclass
class TypeCheck:
    expr: object
    type_name: str  # String | Int | Long | Double | Bool | Timestamp | Array | Map


@dataclass
class SignalIs:
    """Bare ``is Log`` / ``is Metric`` / ``is Span`` signal-type check
    (flow_control.md:116-157): in the denormalized layout the signal type
    is a column — ``signal_type`` ∈ {log, metric, span} by convention."""

    signal: str


@dataclass
class WhereStage:
    predicate: object


@dataclass
class SetStage:
    assignments: list  # [(target, expr)] — target is Col or AttrAccess


@dataclass
class DropStage:
    pass


@dataclass
class RouteToStage:
    port: str


@dataclass
class SummarizeStage:
    aggs: list  # [(alias, fn_name, [arg_exprs])]
    keys: list[str]


@dataclass
class IfStage:
    branches: list  # [(predicate_ast, [stages])]
    otherwise: list | None  # [stages] | None


@dataclass
class ForkStage:
    branches: list  # [[stages]] — each branch processes a copy of the input


@dataclass
class RenameStage:
    map_col: str
    pairs: list  # [(old_key, new_key)] — applied in order


@dataclass
class RemoveKeysStage:
    targets: list  # [("mapkey", map_col, key)] or [("col", name)]


@dataclass
class ColRenameStage:
    pairs: list  # [(old_col, new_col)] — KQL project-rename


@dataclass
class ApplyAttrsStage:
    map_col: str
    stages: list  # WhereStage / SetStage over the key/value stream


@dataclass
class ProjectStage:
    columns: list[str]


@dataclass
class TakeStage:
    n: int


@dataclass
class SortStage:
    keys: list  # [(ast, descending: bool)]


@dataclass
class TopStage:
    n: int
    key: object  # ast
    descending: bool


@dataclass
class TopNestedStage:
    """KQL ``top-nested N of Col by agg(...), top-nested ...`` —
    hierarchical top-k: level k keeps the top-Nk values of its column
    WITHIN each surviving combination of the outer levels' values, each
    level ranked by its own aggregate over the raw rows (public KQL
    semantics; ADX docs). levels = [(n, column, agg_name, agg_args)]."""

    levels: list


@dataclass
class TopHittersStage:
    """KQL ``top-hitters N of Col [by NumCol]`` — most frequent values of
    Col (or highest sum of NumCol per value). ADX computes this
    approximately; here the aggregate is exact (groupBy + TakeOrdered),
    with the output names keeping ADX's ``approximate_count_Col`` /
    ``approximate_sum_NumCol`` convention so queries port verbatim."""

    n: int
    column: str
    by: str | None  # None == rank by row count


@dataclass
class DistinctStage:
    columns: list | None  # None == distinct *


@dataclass
class JoinStage:
    kind: str          # inner/leftouter/rightouter/fullouter/leftsemi/leftanti
    source: str        # named source DataFrame
    on: list[str]      # equi-join columns


@dataclass
class UnionStage:
    source: str


@dataclass
class MvExpandStage:
    column: str


@dataclass
class ParseStage:
    """KQL ``parse Col with ['*'] 'lit' Name[:type] 'lit' ... [Name[:type]]``
    (simple mode): alternating literals and captures compile to ONE anchored
    regex — each capture is lazy up to the next literal, a trailing capture
    takes the rest of the line, ``*`` skips without capturing. Typed
    captures (`:long` etc.) go NULL on non-matching rows; untyped captures
    keep KQL's empty-string convention. Pure regexp_extract expressions —
    the statement-level form of the pipeline's grok parse."""

    column: str
    segments: list  # [("lit", s) | ("col", name, type|None) | ("star",)]


@dataclass
class ParseKvStage:
    """KQL ``parse-kv Col as (k1[:type], k2, ...) with
    (pair_delimiter='...', kv_delimiter='...')`` — keyed extraction from
    key=value text (defaults: pair ' ', kv '='). Each requested key is
    one anchored ``regexp_extract`` (first occurrence wins); untyped
    keys keep KQL's empty-string-on-missing convention, typed keys go
    NULL then cast. Delimiters are single characters so the value
    pattern stays a plain negated character class — replayable on RE2
    engines (DuckDB oracles), which have no lookahead."""

    column: str
    keys: list  # [(name, type|None)]
    pair_delim: str = " "
    kv_delim: str = "="


@dataclass
class MakeSeriesStage:
    """KQL ``make-series a = agg(x) [default = d], ... on ts step 1h
    [by k1, k2]`` — regular-grid time-series materialization: one row per
    key combination, each aggregate an ARRAY over the dense time grid
    (missing bins filled with the default), plus the grid itself in the
    time column."""

    aggs: list      # [(alias, fnname, args, default_ast | None)]
    ts_col: str
    step: object    # Lit(timedelta)
    keys: list      # [str]


@dataclass
class FuncDef:
    """``let f = (x: type [, ...]) { [let y = expr;]* expr };`` — a scalar
    user-defined function (kql.pest:373-378); inlined at compile time."""

    params: list  # [(name, default_ast | None)]
    inner_lets: list  # [(name, ast)]
    body: object


@dataclass
class Query:
    source: str
    stages: list
    let_scalars: list | None = None  # [(name, ast)] in declaration order
    let_funcs: dict | None = None    # {name: FuncDef}


# ---------------------------------------------------------------------------
# parser (recursive descent; precedence: or < and < not < cmp < add < mul)

class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tok:
        t = self.peek()
        if t is None:
            raise OplSyntaxError("unexpected end of query")
        self.i += 1
        return t

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise OplSyntaxError(f"expected {text!r}, got {t.text!r}")
        return t

    def at(self, text: str) -> bool:
        t = self.peek()
        return t is not None and t.text == text

    # --- expressions ---

    def expr(self):
        return self.or_expr()

    def or_expr(self):
        e = self.and_expr()
        while self.at("or"):
            self.next()
            e = Bin("or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.not_expr()
        while self.at("and"):
            self.next()
            e = Bin("and", e, self.not_expr())
        return e

    def not_expr(self):
        if self.at("not"):
            self.next()
            return Not(self.not_expr())
        return self.cmp_expr()

    def cmp_expr(self):
        e = self.add_expr()
        t = self.peek()
        if t and t.text in ("==", "!=", ">", ">=", "<", "<=", "=~"):
            self.next()
            return Bin(t.text, e, self.add_expr())
        if t and t.text == "is":
            # type check: expr is String / Int / Double / Bool / ...
            # (opl.pest type_check_expression; flow_control.md:116-157)
            self.next()
            tname = self.next()
            if tname.kind != "ident":
                raise OplSyntaxError("'is' expects a type name")
            return TypeCheck(e, tname.text)
        return e

    def add_expr(self):
        e = self.mul_expr()
        while self.peek() and self.peek().text in ("+", "-"):
            op = self.next().text
            e = Bin(op, e, self.mul_expr())
        return e

    def mul_expr(self):
        e = self.atom()
        while self.peek() and self.peek().text in ("*", "/", "%"):
            op = self.next().text
            e = Bin(op, e, self.atom())
        return e

    def atom(self):
        t = self.next()
        if t.text == "is" and self.peek() is not None and self.peek().text in (
            "Log", "Metric", "Span",
        ):
            return SignalIs(self.next().text)
        if t.text == "-":
            # unary minus: fold into numeric literals, else 0 - expr
            inner = self.atom()
            if isinstance(inner, Lit) and isinstance(inner.value, (int, float)):
                return Lit(-inner.value)
            return Bin("-", Lit(0), inner)
        if t.kind == "num":
            return Lit(float(t.text) if "." in t.text else int(t.text))
        if t.kind == "timespan":
            # KQL timespan literal 1h / 30m / 10s / 500ms / 2d
            # (kql.pest:125 time_expression)
            import datetime as dt
            import re as _re

            m = _re.fullmatch(r"([\d.]+)(ms|d|h|m|s)", t.text)
            mult = {"ms": 0.001, "s": 1, "m": 60, "h": 3600, "d": 86400}[m.group(2)]
            return Lit(dt.timedelta(seconds=float(m.group(1)) * mult))
        if t.kind == "str":
            return Lit(_unquote(t.text))
        if t.text == "(":
            e = self.expr()
            self.expect(")")
            return e
        if t.text == "[":
            # list literal (["a", "b"] — OTTL keep_keys-style arguments)
            items = []
            if not self.at("]"):
                items.append(self.expr())
                while self.at(","):
                    self.next()
                    items.append(self.expr())
            self.expect("]")
            return ListLit(items)
        if t.kind == "ident":
            if t.text == "timestamp" and self.peek() is not None and self.peek().kind == "str":
                # tagged literal timestamp"<iso8601>" (opl.pest:24,
                # expression.rs:791-797); Z/offset normalized to naive UTC so
                # it compares against TIMESTAMP_NTZ columns
                import datetime as dt

                raw = _unquote(self.next().text)
                val = dt.datetime.fromisoformat(raw.replace("Z", "+00:00"))
                if val.tzinfo is not None:
                    val = val.astimezone(dt.timezone.utc).replace(tzinfo=None)
                return Lit(val)
            if t.text == "true":
                return Lit(True)
            if t.text == "false":
                return Lit(False)
            if t.text == "null":
                return Lit(None)
            if self.at("("):
                self.next()
                args = []
                if not self.at(")"):
                    args.append(self.expr())
                    while self.at(","):
                        self.next()
                        args.append(self.expr())
                self.expect(")")
                return Call(t.text, args)
            if self.at("["):
                self.next()
                key = self.next()
                if key.kind != "str":
                    raise OplSyntaxError("map access key must be a string literal")
                self.expect("]")
                return AttrAccess(t.text, _unquote(key.text))
            return Col(t.text)
        raise OplSyntaxError(f"unexpected token {t.text!r}")

    # --- stages ---

    def parse_query(self) -> Query:
        # leading let-statements (kql.pest:368,373 variable / user-defined
        # function definitions), then the tabular query
        scalars: list = []
        funcs: dict = {}
        while self.at("let"):
            self.next()
            name = self.next()
            if name.kind != "ident":
                raise OplSyntaxError("let expects a name")
            self.expect("=")
            if self.at("(") and self._funcdef_ahead():
                funcs[name.text] = self._funcdef()
            else:
                scalars.append((name.text, self.expr()))
            self.expect(";")
        src = self.next()
        if src.kind != "ident":
            raise OplSyntaxError("query must start with a source name")
        stages = []
        while self.at("|"):
            self.next()
            stages.append(self.stage())
        if self.peek() is not None:
            raise OplSyntaxError(f"trailing input at {self.peek().text!r}")
        return Query(src.text, stages, scalars or None, funcs or None)

    def _funcdef_ahead(self) -> bool:
        """Lookahead: at '(' — is this a function definition (matching ')'
        followed by '{') or a parenthesized scalar expression?"""
        depth = 0
        for j in range(self.i, len(self.toks)):
            t = self.toks[j].text
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
                if depth == 0:
                    return j + 1 < len(self.toks) and self.toks[j + 1].text == "{"
        return False

    def _funcdef(self) -> FuncDef:
        self.expect("(")
        params = []
        if not self.at(")"):
            while True:
                pname = self.next().text
                default = None
                if self.at(":"):  # typed param: name: type [= default]
                    self.next()
                    self.next()  # type name (advisory only — Spark infers)
                    if self.at("="):
                        self.next()
                        default = self.expr()
                params.append((pname, default))
                if not self.at(","):
                    break
                self.next()
        self.expect(")")
        self.expect("{")
        inner = []
        while self.at("let"):
            self.next()
            n = self.next().text
            self.expect("=")
            inner.append((n, self.expr()))
            self.expect(";")
        body = self.expr()
        if self.at(";"):
            self.next()
        self.expect("}")
        return FuncDef(params, inner, body)

    def _block(self) -> list:
        """``{ stage | stage | ... }`` — a nested branch pipeline
        (flow_control.md: branch bodies are full pipelines)."""
        self.expect("{")
        stages = []
        if not self.at("}"):
            stages.append(self.stage())
            while self.at("|"):
                self.next()
                stages.append(self.stage())
        self.expect("}")
        return stages

    def stage(self):
        t = self.next()
        if t.text == "where":
            return WhereStage(self.expr())
        if t.text == "if":
            # if (pred) { … } else if (pred) { … } else { … }
            self.expect("(")
            pred = self.expr()
            self.expect(")")
            branches = [(pred, self._block())]
            otherwise = None
            while self.at("else"):
                self.next()
                if self.at("if"):
                    self.next()
                    self.expect("(")
                    p2 = self.expr()
                    self.expect(")")
                    branches.append((p2, self._block()))
                else:
                    otherwise = self._block()
                    break
            return IfStage(branches, otherwise)
        if t.text == "fork":
            # fork { … } { … } — each branch gets a copy of the batch,
            # branch outputs unioned (opl.pest:211-217, fork.rs:25-31)
            branches = [self._block()]
            while self.at("{"):
                branches.append(self._block())
            return ForkStage(branches)
        if t.text == "apply":
            # apply <map_col> { where <pred(key,value)> | set value = <expr> }
            # (attr_operators.md:107-253: a nested pipeline over the
            # attribute key/value stream)
            col = self.next()
            if col.kind != "ident":
                raise OplSyntaxError("apply expects a map column name")
            return ApplyAttrsStage(col.text, self._block())
        if t.text == "project":
            if self.at("-"):
                # KQL spellings: project-away (drop; == OPL remove for map
                # keys, opl.pest:223), project-keep, project-rename
                # (kql.pest tabular_expressions)
                self.next()
                kind = self.next().text
                if kind == "away":
                    return self._remove_stage()
                if kind == "keep":
                    cols = [self.next().text]
                    while self.at(","):
                        self.next()
                        cols.append(self.next().text)
                    return ProjectStage(cols)
                if kind == "rename":
                    # new_name = old_name [, ...]
                    pairs = []
                    while True:
                        new = self.next().text
                        self.expect("=")
                        old = self.next().text
                        pairs.append((old, new))
                        if not self.at(","):
                            break
                        self.next()
                    return ColRenameStage(pairs)
                raise OplSyntaxError(f"unknown project-{kind!r}")
            cols = [self.next().text]
            while self.at(","):
                self.next()
                cols.append(self.next().text)
            return ProjectStage(cols)
        if t.text == "remove":
            return self._remove_stage()
        if t.text == "rename":
            # rename <map_col> "old" as "new" [, "old2" as "new2"]
            # (opl.pest:219-221 rename_operator_call)
            target = self.next()
            if target.kind != "ident":
                raise OplSyntaxError("rename expects a map column name")
            pairs = [self._rename_pair()]
            while self.at(","):
                self.next()
                pairs.append(self._rename_pair())
            return RenameStage(target.text, pairs)
        if t.text == "take" or t.text == "limit":
            n = self.next()
            if n.kind != "num":
                raise OplSyntaxError("take expects a number")
            return TakeStage(int(n.text))
        if t.text == "count" and (self.peek() is None or self.at("|")):
            # bare KQL `| count` — row count as a single `Count` column
            return SummarizeStage([("Count", "count", [])], [])
        if t.text == "join":
            # KQL `join kind=<k> (source) on c1, c2` — equi-join against a
            # named source; kinds map 1:1 onto Spark join types
            kind = "inner"
            if self.at("kind"):
                self.next()
                self.expect("=")
                kind = self.next().text
            self.expect("(")
            other = self.next()
            if other.kind != "ident":
                raise OplSyntaxError("join expects a source name")
            self.expect(")")
            if not self.at("on"):
                raise OplSyntaxError("join expects 'on'")
            self.next()
            cols = [self.next().text]
            while self.at(","):
                self.next()
                cols.append(self.next().text)
            return JoinStage(kind, other.text, cols)
        if t.text == "make" and self.peek() and self.peek().text == "-":
            # KQL `make-series alias = agg(x) [default = lit], ... on ts
            # step 1h [by keys]` (time-series materialization)
            self.next()
            kw = self.next()
            if kw.text != "series":
                raise OplSyntaxError("expected make-series")
            aggs = []
            while True:
                alias, name, args = self._agg()
                default = None
                if self.at("default"):
                    self.next()
                    self.expect("=")
                    default = self.expr()
                aggs.append((alias, name, args, default))
                if not self.at(","):
                    break
                self.next()
            if not self.at("on"):
                raise OplSyntaxError("make-series expects 'on <time column>'")
            self.next()
            ts = self.next()
            if ts.kind != "ident":
                raise OplSyntaxError("make-series 'on' expects a column name")
            if not self.at("step"):
                raise OplSyntaxError("make-series expects 'step <timespan>'")
            self.next()
            step = self.atom()
            keys = []
            if self.at("by"):
                self.next()
                keys.append(self.next().text)
                while self.at(","):
                    self.next()
                    keys.append(self.next().text)
            return MakeSeriesStage(aggs, ts.text, step, keys)
        if t.text == "mv" and self.peek() and self.peek().text == "-":
            # KQL `mv-expand col` — explode an array column (one output row
            # per element) or a map/property-bag column (one row per entry,
            # as a {key, value} struct in the same column)
            self.next()
            kw = self.next()
            if kw.text != "expand":
                raise OplSyntaxError("expected mv-expand")
            col = self.next()
            if col.kind != "ident":
                raise OplSyntaxError("mv-expand expects a column name")
            return MvExpandStage(col.text)
        if t.text == "parse" and self.peek() and self.peek().text == "-":
            # KQL `parse-kv Col as (k1[:type], ...) with (pair_delimiter=..., kv_delimiter=...)`
            self.next()
            kw = self.next()
            if kw.text != "kv":
                raise OplSyntaxError("expected parse-kv")
            src = self.next()
            if src.kind != "ident":
                raise OplSyntaxError("parse-kv expects a source column name")
            if not self.at("as"):
                raise OplSyntaxError("parse-kv expects 'as (keys...)'")
            self.next()
            self.expect("(")
            keys = []
            while True:
                name = self.next()
                if name.kind != "ident":
                    raise OplSyntaxError("parse-kv expects key names")
                typ = None
                if self.at(":"):
                    self.next()
                    ty = self.next()
                    if ty.kind != "ident":
                        raise OplSyntaxError("parse-kv key type expected")
                    typ = ty.text
                keys.append((name.text, typ))
                if self.at(","):
                    self.next()
                    continue
                break
            self.expect(")")
            pd, kvd = " ", "="
            if self.at("with"):
                self.next()
                self.expect("(")
                while True:
                    opt = self.next()
                    if opt.kind != "ident" or opt.text not in (
                        "pair_delimiter", "kv_delimiter"
                    ):
                        raise OplSyntaxError(
                            "parse-kv with() accepts pair_delimiter/kv_delimiter"
                        )
                    self.expect("=")
                    val = self.next()
                    if val.kind != "str":
                        raise OplSyntaxError("delimiter must be a string literal")
                    v = _unquote(val.text)
                    if len(v) != 1:
                        raise OplSyntaxError(
                            "parse-kv delimiters must be single characters"
                        )
                    if opt.text == "pair_delimiter":
                        pd = v
                    else:
                        kvd = v
                    if self.at(","):
                        self.next()
                        continue
                    break
                self.expect(")")
            return ParseKvStage(src.text, keys, pd, kvd)
        if t.text == "parse":
            src = self.next()
            if src.kind != "ident":
                raise OplSyntaxError("parse expects a source column name")
            if not self.at("with"):
                raise OplSyntaxError("parse expects 'with'")
            self.next()
            segments = []
            while self.peek() is not None and not self.at("|"):
                if self.at("*"):
                    self.next()
                    segments.append(("star",))
                    continue
                tok = self.next()
                if tok.kind == "str":
                    segments.append(("lit", _unquote(tok.text)))
                elif tok.kind == "ident":
                    typ = None
                    if self.at(":"):
                        self.next()
                        ty = self.next()
                        if ty.kind != "ident":
                            raise OplSyntaxError("parse capture type expected")
                        typ = ty.text
                    segments.append(("col", tok.text, typ))
                else:
                    raise OplSyntaxError(
                        f"parse expects literals and captures, got {tok.text!r}"
                    )
            if not any(s[0] == "col" for s in segments):
                raise OplSyntaxError("parse needs at least one capture column")
            for a, b in zip(segments, segments[1:]):
                if a[0] != "lit" and b[0] != "lit":
                    raise OplSyntaxError(
                        "parse captures must be separated by literals"
                    )
            return ParseStage(src.text, segments)
        if t.text == "union":
            self.expect("(")
            other = self.next()
            if other.kind != "ident":
                raise OplSyntaxError("union expects a source name")
            self.expect(")")
            return UnionStage(other.text)
        if t.text in ("sort", "order"):
            # KQL `sort by expr [asc|desc], ...` — KQL defaults DESCENDING
            if not self.at("by"):
                raise OplSyntaxError("sort expects 'by'")
            self.next()
            keys = [self._sort_key()]
            while self.at(","):
                self.next()
                keys.append(self._sort_key())
            return SortStage(keys)
        if t.text == "top" and self.peek() and self.peek().text == "-":
            # KQL `top-nested ...` / `top-hitters N of Col [by NumCol]`
            self.next()
            kw = self.next()
            if kw.text == "hitters":
                n = self.next()
                if n.kind != "num":
                    raise OplSyntaxError("top-hitters expects a number")
                if not self.at("of"):
                    raise OplSyntaxError("top-hitters expects 'of <column>'")
                self.next()
                col = self.next()
                if col.kind != "ident":
                    raise OplSyntaxError(
                        "top-hitters 'of' expects a column name"
                    )
                by = None
                if self.at("by"):
                    self.next()
                    byc = self.next()
                    if byc.kind != "ident":
                        raise OplSyntaxError(
                            "top-hitters 'by' expects a column name"
                        )
                    by = byc.text
                return TopHittersStage(int(n.text), col.text, by)
            if kw.text != "nested":
                raise OplSyntaxError("expected top-nested or top-hitters")
            levels = [self._top_nested_level()]
            while self.at(","):
                self.next()
                nxt = self.next()
                if not (nxt.text == "top" and self.peek()
                        and self.peek().text == "-"):
                    raise OplSyntaxError(
                        "top-nested continuation expects 'top-nested'"
                    )
                self.next()
                kw = self.next()
                if kw.text != "nested":
                    raise OplSyntaxError("expected top-nested")
                levels.append(self._top_nested_level())
            return TopNestedStage(levels)
        if t.text == "top":
            # KQL `top N by expr [asc|desc]`
            n = self.next()
            if n.kind != "num":
                raise OplSyntaxError("top expects a number")
            if not self.at("by"):
                raise OplSyntaxError("top expects 'by'")
            self.next()
            key, desc = self._sort_key()
            return TopStage(int(n.text), key, desc)
        if t.text == "distinct":
            if self.at("*"):
                self.next()
                return DistinctStage(None)
            cols = [self.next().text]
            while self.at(","):
                self.next()
                cols.append(self.next().text)
            return DistinctStage(cols)
        if t.text == "extend":
            # KQL extend == OPL set (same IR in the reference)
            assignments = [self._assignment()]
            while self.at(","):
                self.next()
                assignments.append(self._assignment())
            return SetStage(assignments)
        if t.text == "drop":
            return DropStage()
        if t.text == "route_to":
            port = self.next()
            if port.kind != "str":
                raise OplSyntaxError("route_to expects a string port name")
            return RouteToStage(_unquote(port.text))
        if t.text == "set":
            assignments = [self._assignment()]
            while self.at(","):
                self.next()
                assignments.append(self._assignment())
            return SetStage(assignments)
        if t.text == "summarize":
            aggs = [self._agg()]
            while self.at(","):
                self.next()
                aggs.append(self._agg())
            keys = []
            if self.at("by"):
                self.next()
                keys.append(self._group_key(len(keys)))
                while self.at(","):
                    self.next()
                    keys.append(self._group_key(len(keys)))
            return SummarizeStage(aggs, keys)
        raise OplSyntaxError(f"unknown stage {t.text!r}")

    def _sort_key(self):
        node = self.expr()
        desc = True  # the KQL default
        if self.at("asc"):
            self.next()
            desc = False
        elif self.at("desc"):
            self.next()
        return (node, desc)

    def _group_key(self, idx: int):
        """``by`` list entry (kql.pest group_by_expression): a bare column,
        ``alias = expr``, or a bare expression (auto-aliased ``key<idx>``).
        Returns (alias, ast)."""
        start = self.i
        node = self.expr()
        # ``alias = expr`` — a bare Col followed by '='
        if isinstance(node, Col) and self.at("="):
            self.next()
            return (node.name, self.expr())
        if isinstance(node, Col):
            return (node.name, node)
        del start
        return (f"key{idx}", node)

    def _rename_pair(self):
        old = self.next()
        if old.kind != "str":
            raise OplSyntaxError("rename expects string key literals")
        kw = self.next()
        if kw.text != "as":
            raise OplSyntaxError("rename pair must be '\"old\" as \"new\"'")
        new = self.next()
        if new.kind != "str":
            raise OplSyntaxError("rename expects string key literals")
        return (_unquote(old.text), _unquote(new.text))

    def _remove_stage(self):
        # remove / project-away: map keys (attributes['k'] / map.key,
        # opl.pest:223-225) or whole columns (KQL project-away)
        targets = []
        while True:
            node = self.atom()
            if isinstance(node, AttrAccess):
                targets.append(("mapkey", node.map_col, node.key))
            elif isinstance(node, Col) and "." in node.name:
                mc, key = node.name.split(".", 1)
                targets.append(("mapkey", mc, key))
            elif isinstance(node, Col):
                targets.append(("col", node.name))
            else:
                raise OplSyntaxError(
                    "remove expects attributes['k'], map.key, or column targets"
                )
            if not self.at(","):
                break
            self.next()
        return RemoveKeysStage(targets)

    def _assignment(self):
        target = self.atom()
        if not isinstance(target, (Col, AttrAccess)):
            raise OplSyntaxError("set target must be a field or attributes['k']")
        self.expect("=")
        return (target, self.expr())

    def _top_nested_level(self):
        n = self.next()
        if n.kind != "num":
            raise OplSyntaxError("top-nested expects a number")
        if not self.at("of"):
            raise OplSyntaxError("top-nested expects 'of <column>'")
        self.next()
        col = self.next()
        if col.kind != "ident":
            raise OplSyntaxError("top-nested 'of' expects a column name")
        if not self.at("by"):
            raise OplSyntaxError("top-nested expects 'by <aggregate>'")
        self.next()
        call = self.atom()
        if not isinstance(call, Call):
            raise OplSyntaxError("top-nested 'by' expects an aggregate call")
        return (int(n.text), col.text, call.name, list(call.args))

    def _agg(self):
        alias = self.next().text
        self.expect("=")
        call = self.atom()
        if not isinstance(call, Call):
            raise OplSyntaxError("summarize expects alias = fn(...)")
        return (alias, call.name, list(call.args))


_ESCAPES = {"'": "'", '"': '"', "\\": "\\", "n": "\n", "t": "\t", "r": "\r"}


def _unquote(s: str) -> str:
    """String-literal decode. ``r'...'``/``r"..."`` are raw (no escape
    processing — the OPL user guide's regex-literal form); in plain strings
    only \\' \\" \\\\ \\n \\t \\r are escapes, any other backslash is
    preserved so ``'\\d+'`` still means the regex ``\\d+``."""
    if s[0] in "rR":
        return s[2:-1]
    return re.sub(
        r"\\(.)", lambda m: _ESCAPES.get(m.group(1), "\\" + m.group(1)), s[1:-1]
    )


def parse(src: str) -> Query:
    return _Parser(tokenize(src)).parse_query()


# ---------------------------------------------------------------------------
# compiler: AST → Column / DataFrame

def _kql_bin(v, s):
    """KQL bin(value, roundTo) (kql.pest:211): floor to a multiple of
    roundTo. With a timespan literal the value is treated as a timestamp
    (floored in epoch-microsecond space); numeric otherwise."""
    import datetime as dt

    sv = _LIT_STACK[-1].get(id(s)) if _LIT_STACK else None
    if isinstance(sv, dt.timedelta):
        us = int(sv.total_seconds() * 1_000_000)
        floored = (F.floor(F.unix_micros(v.cast("timestamp")) / F.lit(us)) * us).cast(
            "long"
        )
        return F.timestamp_micros(floored)
    return F.floor(v / s) * s


def _kql_case(*args):
    """KQL case(pred1, val1, ..., predN, valN, default) (kql.pest:154)."""
    if len(args) < 3 or len(args) % 2 == 0:
        raise OplSyntaxError("case expects pred/value pairs plus a default")
    expr = F.when(args[0], args[1])
    for i in range(2, len(args) - 1, 2):
        expr = expr.when(args[i], args[i + 1])
    return expr.otherwise(args[-1])


_FUNCTIONS = {
    # OPL name → callable(Column args…) → Column (functions.md binding table,
    # expr/planner.rs:1844-1877)
    "case": _kql_case,
    "bin": _kql_bin,
    "now": lambda: F.current_timestamp(),
    "datetime": lambda s: F.to_timestamp(s),
    # KQL math surface (scalar_functions math group)
    "round": lambda c, s=None: F.round(c, _lit_int(s)) if s is not None else F.round(c),
    "floor": _kql_bin,  # KQL floor(x, roundTo) is an alias of bin
    "ceiling": F.ceil,
    "abs": F.abs,
    "sqrt": F.sqrt,
    "exp": F.exp,
    "log": F.log,
    "pow": F.pow,
    "contains": lambda a, b: fns.contains(a, b),
    "matches": lambda a, b: a.rlike(_lit_str(b)),
    "starts_with": lambda a, b: F.startswith(a, b),
    "ends_with": lambda a, b: F.endswith(a, b),
    "lower_case": F.lower,
    "upper_case": F.upper,
    "concat": lambda *a: F.concat(*a),
    "join": lambda sep, *a: F.concat_ws(_lit_str(sep), *a),
    # the guide's canonical name (functions.md:77) — same binding
    "concat_ws": lambda sep, *a: F.concat_ws(_lit_str(sep), *a),
    "substring": lambda s, st, ln=None: F.substr(s, st + F.lit(1)) if ln is None
    else F.substr(s, st + F.lit(1), ln),
    "replace": F.replace,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    "regexp_capture": lambda s, p, g: F.nullif(
        F.regexp_extract(s, _lit_str(p), _lit_int(g)), F.lit("")
    ),
    # reference arg order (functions/regexp_substr.rs:33):
    # (str, pattern [, start [, occurrence [, flags [, group]]]])
    "regexp_substr": lambda s, p, st=None, occ=None, fl=None, grp=None: fns.regexp_substr(
        s,
        _lit_str(p),
        _lit_int(st) if st is not None else 1,
        _lit_int(occ) if occ is not None else 1,
        _lit_str(fl) if fl is not None else None,
        _lit_int(grp) if grp is not None else 0,
    ),
    "sha256": lambda c: F.sha2(c.cast("string"), 256),
    "sha512": lambda c: F.sha2(c.cast("string"), 512),
    "md5": lambda c: F.md5(c.cast("string")),
    "sha1": lambda c: F.sha1(c.cast("string")),
    "fnv": fns.fnv64,
    "murmur3": F.hash,
    "xxh3": F.xxhash64,
    "xxh128": F.xxhash64,  # 64-bit stand-in, same family (functions/xxh128.rs)
    "encode": lambda c, enc: fns.opl_encode(c, _lit_str(enc)),
    "log10": F.log10,
    "format_datetime": lambda ts, fmt: F.date_format(ts, _lit_str(fmt)),
    "coalesce": lambda *a: F.coalesce(*a),
    "count": None,  # aggregate, handled in summarize
    "is_null": F.isnull,
    # KQL scalar surface (experimental query_engine kql.pest:121-198)
    "iff": lambda c, a, b: F.when(c, a).otherwise(b),
    "iif": lambda c, a, b: F.when(c, a).otherwise(b),
    "strlen": F.length,
    "strcat": lambda *a: F.concat(*a),
    "strcat_delim": lambda sep, *a: F.concat_ws(_lit_str(sep), *a),
    "replace_string": F.replace,
    # KQL extract(regex, captureGroup, text) — regex-first arg order
    "extract": lambda p, g, s: F.nullif(
        F.regexp_extract(s, _lit_str(p), _lit_int(g)), F.lit("")
    ),
    "tostring": lambda c: c.cast("string"),
    "toint": lambda c: c.cast("int"),
    "tolong": lambda c: c.cast("long"),
    "todouble": lambda c: c.cast("double"),
    "toreal": lambda c: c.cast("double"),
    "tofloat": lambda c: c.cast("double"),
    "tobool": lambda c: c.cast("boolean"),
    "todatetime": lambda c: c.cast("timestamp"),
    "tolower": F.lower,
    "toupper": F.upper,
    "gettype": lambda c: F.typeof(c),
    "parse_json": lambda c: F.try_parse_json(c),
    # zero-arg uuid forms (expr/planner.rs:1871-1872): uuid() is random v4
    # (Spark's built-in, same semantics); uuidv7() is time-ordered — bound to
    # the deterministic-capable uuid7 with wall-clock + random entropy, or
    # uuidv7(ts, entropy) for a reproducible batch form.
    "uuid": lambda: F.expr("uuid()"),
    "uuidv7": lambda ts=None, entropy=None: fns.uuid7(
        ts if ts is not None else F.current_timestamp(),
        entropy if entropy is not None else F.rand(),
    ),
}

_AGG_FUNCTIONS = {
    # KQL summarize surface (aggregate_expressions.rs:58-80) …
    "count": lambda: F.count(F.lit(1)),
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    # … plus the wider KQL aggregate set (exceeds the reference, same
    # policy as the scalar-function table). dcount is the EXACT tier —
    # KQL's is approximate (HLL), but exactness is within its contract
    # and keeps results engine-reproducible.
    "dcount": F.count_distinct,
    "countif": lambda p: F.sum(p.cast("long")),
    "sumif": lambda c, p: F.sum(F.when(p, c)),
    "avgif": lambda c, p: F.avg(F.when(p, c)),
    # KQL percentile(expr, P) with P in 0..100; Spark percentile is exact
    # (linear interpolation), matching DuckDB quantile_cont
    "percentile": lambda c, p: F.percentile(c, p / F.lit(100.0)),
    "stdev": F.stddev_samp,
    "variance": F.var_samp,
    "make_set": lambda c: F.array_sort(F.collect_set(c)),
    # KQL arg_max/arg_min(ordering_expr, return_expr) — latest-wins lookups
    "arg_max": lambda o, r: F.max_by(r, o),
    "arg_min": lambda o, r: F.min_by(r, o),
}

# literal back-extraction for functions whose Spark binding needs a python
# value (regex patterns, formats)
_LIT_STACK: list = []
# user-defined function scope (let f = (...) { ... }), per run_opl call
_USER_FUNCS: list = []


def _lit_str(c) -> str:
    if _LIT_STACK and isinstance(_LIT_STACK[-1].get(id(c)), str):
        return _LIT_STACK[-1][id(c)]
    raise OplSyntaxError("expected a string literal argument")


def _lit_int(c) -> int:
    if _LIT_STACK and isinstance(_LIT_STACK[-1].get(id(c)), int):
        return _LIT_STACK[-1][id(c)]
    raise OplSyntaxError("expected an integer literal argument")


def compile_expr(node, env: dict[str, Column] | None = None) -> Column:
    lits = _LIT_STACK[-1]
    if isinstance(node, Lit):
        c = F.lit(node.value)
        lits[id(c)] = node.value
        return c
    if isinstance(node, Col):
        if env and node.name in env:
            return env[node.name]
        return F.col(node.name)
    if isinstance(node, AttrAccess):
        return F.col(node.map_col).getItem(node.key)
    if isinstance(node, ListLit):
        return F.array(*[compile_expr(i, env) for i in node.items])
    if isinstance(node, Not):
        return ~compile_expr(node.expr, env)
    if isinstance(node, Bin):
        l, r = compile_expr(node.left, env), compile_expr(node.right, env)
        if node.op in ("==", "!=", ">", ">=", "<", "<="):
            # AnyValue-comparison semantics for the string-map attribute
            # layout: attributes['k'] compared to a numeric literal coerces
            # with try_cast, so a non-numeric value is a type-mismatch
            # (NULL → no match), never an ANSI cast error.
            def _num(ast):
                return isinstance(ast, Lit) and isinstance(ast.value, (int, float)) \
                    and not isinstance(ast.value, bool)

            if isinstance(node.left, AttrAccess) and _num(node.right):
                l = l.try_cast("double")
                r = r.cast("double")
            elif isinstance(node.right, AttrAccess) and _num(node.left):
                r = r.try_cast("double")
                l = l.cast("double")
        return {
            "and": lambda: l & r,
            "or": lambda: l | r,
            "==": lambda: l == r,
            "!=": lambda: l != r,
            ">": lambda: l > r,
            ">=": lambda: l >= r,
            "<": lambda: l < r,
            "<=": lambda: l <= r,
            "=~": lambda: F.lower(l) == F.lower(r),
            "+": lambda: l + r,
            "-": lambda: l - r,
            "*": lambda: l * r,
            "/": lambda: l / r,
            "%": lambda: l % r,
        }[node.op]()
    if isinstance(node, SignalIs):
        return F.col("signal_type") == F.lit(node.signal.lower())
    if isinstance(node, TypeCheck):
        # runtime type check against the storage type (F.typeof is
        # JVM-side); a NULL value (e.g. a missing attribute key) is NOT of
        # any type, matching the reference's AnyValue-tag semantics.
        c = compile_expr(node.expr, env)
        names = {
            "String": ["string"],
            "Int": ["int", "bigint", "smallint", "tinyint"],
            "Long": ["bigint"],
            "Double": ["double", "float"],
            "Float": ["double", "float"],
            "Bool": ["boolean"],
            "Boolean": ["boolean"],
            "Timestamp": ["timestamp", "timestamp_ntz"],
        }.get(node.type_name)
        if names is not None:
            match = F.typeof(c).isin(*names)
        elif node.type_name in ("Array", "Map"):
            match = F.typeof(c).startswith(node.type_name.lower())
        else:
            raise OplSyntaxError(f"unknown type name {node.type_name!r}")
        return c.isNotNull() & match
    if isinstance(node, Call):
        # user-defined functions (let f = (...) { ... }) inline first
        ufuncs = _USER_FUNCS[-1] if _USER_FUNCS else {}
        fdef = ufuncs.get(node.name)
        if fdef is not None:
            newenv = dict(env or {})
            for (pname, default), i in zip(
                fdef.params, range(len(fdef.params))
            ):
                if i < len(node.args):
                    newenv[pname] = compile_expr(node.args[i], env)
                elif default is not None:
                    newenv[pname] = compile_expr(default, env)
                else:
                    raise OplSyntaxError(
                        f"missing argument {pname!r} for {node.name!r}"
                    )
            for n, ast in fdef.inner_lets:
                newenv[n] = compile_expr(ast, newenv)
            return compile_expr(fdef.body, newenv)
        fn = _FUNCTIONS.get(node.name)
        if fn is None:
            raise OplSyntaxError(f"unknown function {node.name!r}")
        return fn(*[compile_expr(a, env) for a in node.args])
    raise OplSyntaxError(f"cannot compile {node!r}")


def _compile_kv(node, k: Column, v: Column) -> Column:
    """Compile an expression over the attribute key/value stream: the bare
    identifiers ``key`` and ``value`` bind to the map lambda variables."""
    return compile_expr(node, env={"key": k, "value": v})


@dataclass
class OplResult:
    """Execution result: the default output plus named route_to ports
    (RouterImpl analog, transform_processor/routing.rs:14-39 — routed
    ports receive the stream; the default output continues empty)."""

    default: DataFrame
    ports: dict[str, DataFrame]


# KQL parse capture types → Spark cast targets (string stays untyped:
# KQL's empty-string-on-no-match convention only applies to strings)
_PARSE_TYPES = {
    "long": "long",
    "int": "int",
    "real": "double",
    "decimal": "decimal(38,9)",
    "datetime": "timestamp",
    "bool": "boolean",
    "string": "string",
}

_REGEX_META = set(r"\.[]{}()*+?^$|")


def _regex_escape(s: str) -> str:
    return "".join("\\" + c if c in _REGEX_META else c for c in s)


def _compile_parse_regex(segments: list) -> tuple[str, list]:
    """segments → (one anchored regex, [(col, type), ...] in group order).

    Captures are lazy ``(.*?)`` when a literal follows (match exactly up to
    it), greedy ``(.*)`` in final position (rest of line). Both Java regex
    (Spark) and RE2 (DuckDB oracles) agree on these constructs, so the
    identical pattern string replays cross-engine."""
    parts = ["^"]
    captures: list = []
    for i, seg in enumerate(segments):
        last = i == len(segments) - 1
        if seg[0] == "lit":
            parts.append(_regex_escape(seg[1]))
        elif seg[0] == "star":
            parts.append(".*" if last else ".*?")
        else:
            parts.append("(.*)" if last else "(.*?)")
            captures.append((seg[1], seg[2]))
    return "".join(parts), captures


def _apply_stages(
    df: DataFrame,
    stages: list,
    ports: dict[str, DataFrame],
    env: dict | None = None,
    sources: dict[str, DataFrame] | None = None,
) -> DataFrame:
    for stage in stages:
        if isinstance(stage, WhereStage):
            df = df.filter(compile_expr(stage.predicate, env))
        elif isinstance(stage, DropStage):
            # planned as a folded constant filter (planner.rs:186-200)
            df = df.filter(F.lit(False))
        elif isinstance(stage, SetStage):
            # consecutive sets coalesce via CollapseProject — the
            # reference coalesces them explicitly (planner.rs:106-158)
            for target, expr in stage.assignments:
                val = compile_expr(expr, env)
                if isinstance(target, Col):
                    if "." in target.name:
                        # nested struct-field assignment
                        # (set resource.schema_url = ..., basic_operators.md)
                        root, path = target.name.split(".", 1)
                        df = df.withColumn(
                            root, F.col(root).withField(path, val)
                        )
                    else:
                        df = df.withColumn(target.name, val)
                elif "." in target.map_col:
                    # nested map upsert: set resource.attributes["k"] = v —
                    # rebuild the struct field, not a flat dotted column
                    from otel_arrow_spark.plans.ottl import _upsert_expr

                    root, path = target.map_col.split(".", 1)
                    m = F.col(target.map_col)
                    df = df.withColumn(
                        root,
                        F.col(root).withField(
                            path, _upsert_expr(m, target.key, val)
                        ),
                    )
                else:  # attribute upsert (upsert_attributes.rs analog)
                    from otel_arrow_spark.operators.attributes import attrs_upsert

                    df = attrs_upsert(df, target.map_col, target.key, val)
        elif isinstance(stage, RouteToStage):
            # divert the stream; default output becomes empty
            # (flow_control.md:159-212). Two branches routing to the SAME
            # port union (the documented combining-with-if pattern) —
            # overwriting would silently drop all but the last branch.
            p = stage.port
            ports[p] = (
                ports[p].unionByName(df, allowMissingColumns=True)
                if p in ports
                else df
            )
            df = df.filter(F.lit(False))
        elif isinstance(stage, IfStage):
            # first-match exclusive branch pipelines, outputs unioned
            # (flow_control.md:6-114; conditional.rs:39) — reuses the
            # operator-level implementation
            from otel_arrow_spark.operators.flow import conditional_branches

            branches = [
                (compile_expr(pred, env), (lambda d, ss=ss: _apply_stages(d, ss, ports, env, sources)))
                for pred, ss in stage.branches
            ]
            otherwise = (
                (lambda d, ss=stage.otherwise: _apply_stages(d, ss, ports, env, sources))
                if stage.otherwise is not None
                else (lambda d: d)
            )
            df = conditional_branches(df, branches, otherwise=otherwise)
        elif isinstance(stage, RenameStage):
            # ordered key renames on the map column (rename_operator_call;
            # attributes_processor Action::Rename kernel); dotted targets
            # (rename resource.attributes ...) rebuild the struct field
            from otel_arrow_spark.operators.attributes import (
                attrs_rename,
                rename_expr,
            )

            if "." in stage.map_col:
                root, path = stage.map_col.split(".", 1)
                expr = F.col(stage.map_col)
                for old, new in stage.pairs:
                    expr = rename_expr(expr, old, new)
                df = df.withColumn(root, F.col(root).withField(path, expr))
            else:
                for old, new in stage.pairs:
                    df = attrs_rename(df, stage.map_col, old, new)
        elif isinstance(stage, RemoveKeysStage):
            # remove / project-away: map keys get ONE map_filter pass per
            # map column; whole-column targets become a single drop
            by_col: dict[str, list] = {}
            drop_cols = []
            for tgt in stage.targets:
                if tgt[0] == "mapkey":
                    by_col.setdefault(tgt[1], []).append(tgt[2])
                else:
                    drop_cols.append(tgt[1])

            def _not_in(ks):
                # factory, not default-arg closure: pyspark derives HOF
                # lambda arity from the full python signature
                return lambda k, _: ~k.isin(*ks)

            for mc, keys in by_col.items():
                filtered = F.map_filter(F.col(mc), _not_in(keys))
                if "." in mc:
                    # nested: remove resource.attributes["k"] rebuilds the
                    # struct field (attr_operators.md remove examples)
                    root, path = mc.split(".", 1)
                    df = df.withColumn(root, F.col(root).withField(path, filtered))
                else:
                    df = df.withColumn(mc, filtered)
            if drop_cols:
                df = df.drop(*drop_cols)
        elif isinstance(stage, ColRenameStage):
            for old, new in stage.pairs:
                df = df.withColumnRenamed(old, new)
        elif isinstance(stage, ForkStage):
            # duplicate the stream into each branch pipeline, union the
            # results (fork.rs:25-31: "results are then unioned back") —
            # route_to inside a branch still diverts to its port
            outs = [_apply_stages(df, ss, ports, env, sources) for ss in stage.branches]
            df = outs[0]
            for o in outs[1:]:
                df = df.unionByName(o, allowMissingColumns=True)
        elif isinstance(stage, ApplyAttrsStage):
            # nested pipeline over the attribute stream: `key`/`value`
            # resolve to the lambda variables (execute_on_attributes
            # contract, pipeline.rs:73-99); where → map_filter,
            # set value = … → transform_values
            # NOTE: pyspark derives higher-order-lambda arity from the
            # python signature INCLUDING defaults — closures must be built
            # by a factory, never via default args
            def _kv(ast):
                return lambda k, v: _compile_kv(ast, k, v)

            for sub in stage.stages:
                if isinstance(sub, WhereStage):
                    df = df.withColumn(
                        stage.map_col,
                        F.map_filter(F.col(stage.map_col), _kv(sub.predicate)),
                    )
                elif isinstance(sub, SetStage):
                    for target, expr in sub.assignments:
                        if not (isinstance(target, Col) and target.name == "value"):
                            raise OplSyntaxError(
                                "apply attributes set target must be `value`"
                            )
                        df = df.withColumn(
                            stage.map_col,
                            F.transform_values(F.col(stage.map_col), _kv(expr)),
                        )
                else:
                    raise OplSyntaxError(
                        "apply attributes supports where/set stages only"
                    )
        elif isinstance(stage, ProjectStage):
            df = df.select(*stage.columns)
        elif isinstance(stage, TakeStage):
            df = df.limit(stage.n)
        elif isinstance(stage, SortStage):
            df = df.orderBy(
                *[
                    compile_expr(k, env).desc() if d else compile_expr(k, env).asc()
                    for k, d in stage.keys
                ]
            )
        elif isinstance(stage, TopStage):
            # orderBy + limit: Catalyst plans TakeOrderedAndProject — a
            # per-partition top-N plus a single-partition merge of N-row
            # partials, never a global sort
            key = compile_expr(stage.key, env)
            df = df.orderBy(key.desc() if stage.descending else key.asc()).limit(
                stage.n
            )
        elif isinstance(stage, TopNestedStage):
            # Level k: aggregate the RAW rows on the first k columns,
            # keep only rows whose (k-1)-prefix survived (left_semi), rank
            # within the prefix (row_number desc on the aggregate, column
            # asc as the deterministic tiebreak), keep ≤ Nk. Joining the
            # level frames back together yields the KQL output shape
            # (Col1, aggregated_Col1, Col2, aggregated_Col2, …). Post-
            # aggregate data is top-k-bounded, so the level-1 empty
            # partitionBy (a single-partition window) ranks at most
            # |distinct Col1| rows — never raw-corpus rows.
            from pyspark.sql import Window as _W

            src = df
            kept = None
            result = None
            prefix: list[str] = []
            for n, col, aggname, args in stage.levels:
                fn = _AGG_FUNCTIONS.get(aggname)
                if fn is None:
                    raise OplSyntaxError(f"unknown aggregate {aggname!r}")
                cols_ = [compile_expr(a, env) for a in args]
                try:
                    agg_col = fn(*cols_)
                except TypeError as ex:
                    raise OplSyntaxError(
                        f"aggregate {aggname!r}: wrong argument count"
                    ) from ex
                out_name = f"aggregated_{col}"
                g = src.groupBy(*prefix, col).agg(agg_col.alias(out_name))
                if kept is not None:
                    g = g.join(kept, prefix, "left_semi")
                w = (
                    _W.partitionBy(*[F.col(c) for c in prefix])
                    .orderBy(F.col(out_name).desc(), F.col(col).asc())
                )
                g = (
                    g.withColumn("__rk", F.row_number().over(w))
                    .where(F.col("__rk") <= n)
                    .drop("__rk")
                )
                if result is None:
                    result = g
                else:
                    result = result.join(g, prefix)
                prefix = [*prefix, col]
                kept = g.select(*prefix)
            df = result
        elif isinstance(stage, TopHittersStage):
            # one partial+final hash aggregate, then TakeOrderedAndProject
            # over the aggregate's (distinct-value-bounded) output; value
            # asc as the deterministic tiebreak
            if stage.by is None:
                out = f"approximate_count_{stage.column}"
                agg = F.count(F.lit(1))
            else:
                out = f"approximate_sum_{stage.by}"
                agg = F.sum(stage.by)
            df = (
                df.groupBy(stage.column)
                .agg(agg.alias(out))
                .orderBy(F.col(out).desc(), F.col(stage.column).asc())
                .limit(stage.n)
            )
        elif isinstance(stage, DistinctStage):
            df = (
                df.distinct()
                if stage.columns is None
                else df.select(*stage.columns).distinct()
            )
        elif isinstance(stage, JoinStage):
            if not sources or stage.source not in sources:
                raise OplSyntaxError(f"unknown join source {stage.source!r}")
            df = df.join(sources[stage.source], on=stage.on, how=stage.kind)
        elif isinstance(stage, UnionStage):
            if not sources or stage.source not in sources:
                raise OplSyntaxError(f"unknown union source {stage.source!r}")
            df = df.unionByName(sources[stage.source])
        elif isinstance(stage, ParseKvStage):
            import re as _re

            pd_cls = _re.escape(stage.pair_delim)
            kvd = _re.escape(stage.kv_delim)
            src = F.col(stage.column)
            for name, typ in stage.keys:
                pattern = (
                    f"(?:^|[{pd_cls}]){_re.escape(name)}{kvd}([^{pd_cls}]*)"
                )
                e = F.regexp_extract(src, pattern, 1)
                if typ is not None:
                    spark_ty = _PARSE_TYPES.get(typ)
                    if spark_ty is None:
                        raise OplSyntaxError(f"unknown parse-kv type {typ!r}")
                    e = F.when(e == "", F.lit(None)).otherwise(e).cast(spark_ty)
                df = df.withColumn(name, e)
        elif isinstance(stage, ParseStage):
            regex, captures = _compile_parse_regex(stage.segments)
            src = F.col(stage.column)
            for idx, (name, typ) in enumerate(captures, start=1):
                e = F.regexp_extract(src, regex, idx)
                if typ is not None:
                    spark_ty = _PARSE_TYPES.get(typ)
                    if spark_ty is None:
                        raise OplSyntaxError(f"unknown parse type {typ!r}")
                    e = F.when(e == "", F.lit(None)).otherwise(e).cast(spark_ty)
                df = df.withColumn(name, e)
        elif isinstance(stage, MvExpandStage):
            from pyspark.sql import types as _T

            dt = df.schema[stage.column].dataType
            if isinstance(dt, _T.ArrayType):
                df = df.withColumn(stage.column, F.explode_outer(stage.column))
            elif isinstance(dt, _T.MapType):
                others = [c for c in df.columns if c != stage.column]
                df = df.select(
                    *others,
                    F.explode_outer(stage.column).alias("_k", "_v"),
                ).withColumn(
                    stage.column, F.struct(F.col("_k").alias("key"), F.col("_v").alias("value"))
                ).drop("_k", "_v")
            else:
                raise OplSyntaxError(
                    f"mv-expand expects an array or map column, got {dt.simpleString()}"
                )
        elif isinstance(stage, MakeSeriesStage):
            # Scale shape: ONE binned aggregate (partial+final), one
            # per-key aggregate building bin→value maps, a broadcast
            # 1-row crossJoin for the global grid bounds, and a pure
            # expression (sequence + try_element_at) densifying the grid
            # — no explode, no per-bin join. Array length is bounded by
            # the grid span over the step.
            import datetime as _dt

            if not (isinstance(stage.step, Lit)
                    and isinstance(stage.step.value, _dt.timedelta)):
                raise OplSyntaxError("make-series step must be a timespan literal")
            step_us = int(stage.step.value.total_seconds() * 1_000_000)
            ts = F.col(stage.ts_col).cast("timestamp")
            bin_col = F.timestamp_micros(
                (F.floor(F.unix_micros(ts) / F.lit(step_us)) * step_us).cast("long")
            )
            agg_cols, defaults = [], {}
            for alias, name, args, default in stage.aggs:
                fn = _AGG_FUNCTIONS.get(name)
                if fn is None:
                    raise OplSyntaxError(f"unknown aggregate {name!r}")
                cols = [compile_expr(a, env) for a in args]
                agg_cols.append(fn(*cols).alias(alias))
                if default is not None:
                    if not isinstance(default, Lit):
                        raise OplSyntaxError(
                            "make-series default must be a literal"
                        )
                    defaults[alias] = default.value
            keys = [F.col(k) for k in stage.keys]
            binned = df.groupBy(*keys, bin_col.alias("__ms_bin")).agg(*agg_cols)
            bounds = binned.agg(
                F.min("__ms_bin").alias("__lo"), F.max("__ms_bin").alias("__hi")
            )
            per_key = binned.groupBy(*keys).agg(
                *[
                    F.map_from_entries(
                        F.collect_list(F.struct(F.col("__ms_bin"), F.col(a)))
                    ).alias(f"__m_{a}")
                    for a, _, _, _ in stage.aggs
                ]
            )
            joined = per_key.crossJoin(F.broadcast(bounds))
            grid = F.sequence(
                F.col("__lo"), F.col("__hi"),
                F.expr(f"INTERVAL '{step_us}' MICROSECOND"),
            )
            def _fill(a: str, dv):
                # closure factory: Spark infers the lambda arity from the
                # Python signature, so defaults-as-kwargs would read as a
                # 3-arg lambda
                return lambda t: F.coalesce(
                    F.try_element_at(F.col(f"__m_{a}"), t), F.lit(dv)
                )

            sel = [F.col(k) for k in stage.keys]
            for alias, _, _, _ in stage.aggs:
                sel.append(
                    F.transform(grid, _fill(alias, defaults.get(alias)))
                    .alias(alias)
                )
            sel.append(grid.alias(stage.ts_col))
            df = joined.select(*sel)
        elif isinstance(stage, SummarizeStage):
            aggs = []
            for alias, name, args in stage.aggs:
                fn = _AGG_FUNCTIONS.get(name)
                if fn is None:
                    raise OplSyntaxError(f"unknown aggregate {name!r}")
                cols = [compile_expr(a, env) for a in args]
                try:
                    agg_col = fn(*cols)
                except TypeError as ex:
                    raise OplSyntaxError(
                        f"aggregate {name!r}: wrong argument count"
                    ) from ex
                aggs.append(agg_col.alias(alias))
            # keys: legacy plain strings or (alias, expr) tuples —
            # expression keys (bin(ts, 1h) etc.) compile + alias
            key_cols = [
                F.col(k) if isinstance(k, str)
                else compile_expr(k[1], env).alias(k[0])
                for k in stage.keys
            ]
            df = df.groupBy(*key_cols).agg(*aggs)
        else:  # pragma: no cover
            raise OplSyntaxError(f"unknown stage {stage!r}")
    return df


def run_opl(query: str, sources: dict[str, DataFrame]) -> OplResult:
    """Parse and execute an OPL query against named source DataFrames.

    The same entry point serves the KQL-flavored spellings the reference's
    KQL front-end shares with OPL via the common IR
    (kql-parser/src/tabular_expressions.rs): ``extend`` (== set),
    ``project``, ``take``/``limit``, ``summarize ... by ...``.
    """
    q = parse(query)
    if q.source not in sources:
        raise OplSyntaxError(f"unknown source {q.source!r}")
    ports: dict[str, DataFrame] = {}
    _LIT_STACK.append({})
    _USER_FUNCS.append(q.let_funcs or {})
    try:
        # let-bound scalars compile once, in declaration order; later lets
        # may reference earlier ones (kql.pest variable_definition)
        env: dict[str, Column] = {}
        for name, ast in q.let_scalars or []:
            env[name] = compile_expr(ast, env)
        df = _apply_stages(sources[q.source], q.stages, ports, env or None, sources)
        return OplResult(default=df, ports=ports)
    finally:
        _USER_FUNCS.pop()
        _LIT_STACK.pop()


run_kql = run_opl  # the dialects share the IR; aliases kept for clarity
