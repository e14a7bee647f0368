"""OTTL front-end: collector-style statements compiled to DataFrame ops.

Reference: the transform processor's third query language
(core-nodes/src/processors/transform_processor/mod.rs:177 — a list of
``log_statements``, one pipeline per statement, applied in order) parsed by
query-engine-languages/src/ottl/{ottl.pest, editor_expression.rs}. The
reference grammar today supports exactly the ``set(destination, source)``
editor (editor_expression.rs:41-55); this module covers that surface plus
the standard collector editors the OTTL LANGUAGE.md defines for map-typed
attributes (delete_key / delete_matching_keys / keep_keys /
keep_matching_keys / replace_pattern / replace_all_patterns /
truncate_all) and the ``<editor> where <condition>`` guard form.

Shared IR: statements reuse the OPL tokenizer / expression parser / Column
compiler (plans/opl.py), exactly as the reference routes all three languages
into one PipelineExpression IR (transform_processor/mod.rs:150-199). Spark
realization: every guarded editor is ONE conditional column expression
(``when(cond, edited).otherwise(original)``) — rows never fork, the whole
statement list collapses into a single Project via CollapseProject.

OTTL spellings handled: ``nil`` for null (ottl.pest null_literal),
double- or single-quoted strings, ``attributes["key"]`` paths, bare
identifiers for top-level fields.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from otel_arrow_spark.plans.opl import (
    _LIT_STACK,
    AttrAccess,
    Call,
    Col,
    ListLit,
    Lit,
    OplSyntaxError,
    _Parser,
    compile_expr,
    tokenize,
)


@dataclass
class OttlStatement:
    editor: Call
    where: object | None  # predicate AST or None


def parse_statement(src: str) -> OttlStatement:
    """Parse one OTTL statement: ``editor(args...) [where <condition>]``.

    Mirrors program = statement_expression (ottl.pest:74) with the
    collector's optional where-clause extension (LANGUAGE.md "statements").
    """
    toks = tokenize(src)
    for t in toks:
        if t.kind == "ident" and t.text == "nil":  # OTTL null spelling
            t.text = "null"
    p = _Parser(toks)
    call = p.atom()
    if not isinstance(call, Call):
        raise OplSyntaxError("OTTL statement must be an editor call: fn(...)")
    cond = None
    if p.at("where"):
        p.next()
        cond = p.expr()
    if p.peek() is not None:
        raise OplSyntaxError(f"trailing input at {p.peek().text!r}")
    return OttlStatement(call, cond)


def _lit_of(node, what: str):
    if not isinstance(node, Lit):
        raise OplSyntaxError(f"{what} must be a literal")
    return node.value


def _str_list_of(node, what: str) -> list[str]:
    if not isinstance(node, ListLit):
        raise OplSyntaxError(f"{what} must be a list literal [\"a\", ...]")
    return [_lit_of(i, what) for i in node.items]


def _map_target(node, what: str) -> str:
    if not isinstance(node, Col):
        raise OplSyntaxError(f"{what} expects a map column name")
    return node.name


def _upsert_expr(m: Column, key: str, value: Column) -> Column:
    """Insert-or-replace as a pure expression (attrs_upsert analog,
    upsert_attributes.rs semantics; null map → fresh single-entry map).
    Values stringify into the map<string,string> layout (see
    operators/attributes.py _coerce)."""
    value = value.cast("string")
    without = F.map_filter(m, lambda k, _: k != F.lit(key))
    return F.when(m.isNull(), F.create_map(F.lit(key), value)).otherwise(
        F.map_concat(without, F.create_map(F.lit(key), value))
    )


def _apply_statement(df: DataFrame, st: OttlStatement) -> DataFrame:
    cond = compile_expr(st.where) if st.where is not None else None

    def guarded(new: Column, old: Column) -> Column:
        return new if cond is None else F.when(cond, new).otherwise(old)

    name, args = st.editor.name, st.editor.args

    if name == "set":
        # the reference's one supported editor (editor_expression.rs:42):
        # set(destination, source)
        if len(args) != 2:
            raise OplSyntaxError("set expects (target, value)")
        target, value = args[0], compile_expr(args[1])
        if isinstance(target, Col):
            old = (
                F.col(target.name)
                if target.name in df.columns
                else F.lit(None)
            )
            return df.withColumn(target.name, guarded(value, old))
        if isinstance(target, AttrAccess):
            m = F.col(target.map_col)
            return df.withColumn(
                target.map_col, guarded(_upsert_expr(m, target.key, value), m)
            )
        raise OplSyntaxError("set target must be a field or attributes[\"k\"]")

    if name == "delete_key":
        mcol = _map_target(args[0], "delete_key")
        key = _lit_of(args[1], "delete_key key")
        m = F.col(mcol)
        return df.withColumn(
            mcol, guarded(F.map_filter(m, lambda k, _: k != F.lit(key)), m)
        )

    if name == "delete_matching_keys":
        mcol = _map_target(args[0], "delete_matching_keys")
        pat = _lit_of(args[1], "pattern")
        m = F.col(mcol)
        return df.withColumn(
            mcol, guarded(F.map_filter(m, lambda k, _: ~k.rlike(pat)), m)
        )

    if name == "keep_keys":
        mcol = _map_target(args[0], "keep_keys")
        keys = _str_list_of(args[1], "keep_keys keys")
        m = F.col(mcol)
        return df.withColumn(
            mcol, guarded(F.map_filter(m, lambda k, _: k.isin(*keys)), m)
        )

    if name == "keep_matching_keys":
        mcol = _map_target(args[0], "keep_matching_keys")
        pat = _lit_of(args[1], "pattern")
        m = F.col(mcol)
        return df.withColumn(
            mcol, guarded(F.map_filter(m, lambda k, _: k.rlike(pat)), m)
        )

    if name == "replace_pattern":
        # replace_pattern(target, regex, replacement) — all occurrences
        if len(args) != 3:
            raise OplSyntaxError("replace_pattern expects (target, regex, replacement)")
        pat = _lit_of(args[1], "regex")
        rep = _lit_of(args[2], "replacement")
        target = args[0]
        if isinstance(target, Col):
            old = F.col(target.name)
            return df.withColumn(
                target.name, guarded(F.regexp_replace(old, pat, rep), old)
            )
        if isinstance(target, AttrAccess):
            m = F.col(target.map_col)
            new = F.transform_values(
                m,
                lambda k, v: F.when(
                    k == F.lit(target.key), F.regexp_replace(v, pat, rep)
                ).otherwise(v),
            )
            return df.withColumn(target.map_col, guarded(new, m))
        raise OplSyntaxError("replace_pattern target must be a field or attributes[\"k\"]")

    if name == "replace_all_patterns":
        # replace_all_patterns(map, "value", regex, replacement)
        mcol = _map_target(args[0], "replace_all_patterns")
        mode = _lit_of(args[1], "mode")
        pat = _lit_of(args[2], "regex")
        rep = _lit_of(args[3], "replacement")
        m = F.col(mcol)
        if mode == "value":
            new = F.transform_values(m, lambda k, v: F.regexp_replace(v, pat, rep))
        elif mode == "key":
            new = F.map_from_entries(
                F.transform(
                    F.map_entries(m),
                    lambda e: F.struct(
                        F.regexp_replace(e["key"], pat, rep).alias("key"),
                        e["value"].alias("value"),
                    ),
                )
            )
        else:
            raise OplSyntaxError("replace_all_patterns mode must be 'key' or 'value'")
        return df.withColumn(mcol, guarded(new, m))

    if name == "truncate_all":
        mcol = _map_target(args[0], "truncate_all")
        n = _lit_of(args[1], "limit")
        m = F.col(mcol)
        new = F.transform_values(m, lambda k, v: F.substring(v, 1, int(n)))
        return df.withColumn(mcol, guarded(new, m))

    raise OplSyntaxError(f"editor function {name!r} not supported")


def run_ottl(df: DataFrame, statements: str | list[str]) -> DataFrame:
    """Apply OTTL ``log_statements`` in order to a log-shaped DataFrame.

    The list form mirrors the transform processor's OTTL config (one
    Transform per statement, executed sequentially,
    transform_processor/mod.rs:177-196).
    """
    if isinstance(statements, str):
        statements = [statements]
    _LIT_STACK.append({})
    try:
        for src in statements:
            df = _apply_statement(df, parse_statement(src))
        return df
    finally:
        _LIT_STACK.pop()
