"""Filter-expression compiler: the reference CLI grammar -> pyspark Column.

Grammar parity with the reference CLI filter language
(reference: src/cli/commands/filter.ts:26-123):

- ``col == value`` / ``col != value``     string equality on the raw field
- ``col > n`` ``>= < <=``                 numeric compare; non-numeric fields
                                          compare false (reference: NaN-safe)
- ``col contains v``                      substring (value case-sensitive)
- ``col startsWith v`` / ``col endsWith`` prefix/suffix
- ``col matches regex``                   regex — documented in the reference
                                          README (README.md:213) but missing
                                          from filter.ts; implemented here as
                                          ``rlike`` per the documented intent
- ``a && b`` / ``a || b`` / ``!a`` / parens — the reference only reaches
  compound forms through a raw-JS ``new Function`` fallback
  (filter.ts:113-123); we parse them natively and NEVER eval.

Keywords (contains/startsWith/endsWith/matches, and/or/not aliases) are
case-insensitive; comparison *values* are case-sensitive, matching the
reference. Values may be single-quoted, double-quoted, or bare words.

Null semantics: a comparison on a NULL field is false (standard SQL
three-valued logic collapsed at the filter). The reference coerces JS
``undefined`` through ``String()`` which yields the literal text
``"undefined"`` — an accident we intentionally do not replicate.

Everything compiles to built-in Column expressions: filters stay JVM-side,
participate in whole-stage codegen, and push down into parquet/CSV scans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


class ExprError(ValueError):
    """Raised when a filter expression cannot be parsed. No eval fallback."""


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<and>&&) |
        (?P<or>\|\|) |
        (?P<op>==|!=|>=|<=|>|<) |
        (?P<not>!) |
        (?P<squote>'(?:[^'\\]|\\.)*') |
        (?P<dquote>"(?:[^"\\]|\\.)*") |
        (?P<word>[^\s()!<>=&|]+)
    )""",
    re.VERBOSE,
)

_KEYWORD_OPS = {"contains", "startswith", "endswith", "matches"}
_WORD_LOGIC = {"and": "&&", "or": "||", "not": "!"}


@dataclass
class _Tok:
    kind: str  # lparen rparen and or not op value word
    text: str


def _tokenize(expr: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m or m.end() == pos:
            if expr[pos:].strip() == "":
                break
            raise ExprError(f"cannot tokenize filter expression at: {expr[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind in ("squote", "dquote"):
            body = text[1:-1]
            body = re.sub(r"\\(.)", r"\1", body)
            toks.append(_Tok("value", body))
        elif kind == "word":
            lowered = text.lower()
            if lowered in _WORD_LOGIC:
                sym = _WORD_LOGIC[lowered]
                toks.append(_Tok({"&&": "and", "||": "or", "!": "not"}[sym], sym))
            else:
                toks.append(_Tok("word", text))
        else:
            toks.append(_Tok(kind, text))
    return toks


class _Parser:
    def __init__(self, toks: list[_Tok], raw: str):
        self.toks = toks
        self.i = 0
        self.raw = raw

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        tok = self.peek()
        if tok is None:
            raise ExprError(f"unexpected end of filter expression: {self.raw!r}")
        self.i += 1
        return tok

    def parse(self) -> Column:
        col = self._or()
        if self.peek() is not None:
            raise ExprError(
                f"trailing tokens in filter expression {self.raw!r}: "
                f"{self.toks[self.i].text!r}"
            )
        return col

    def _or(self) -> Column:
        left = self._and()
        while (tok := self.peek()) is not None and tok.kind == "or":
            self.next()
            left = left | self._and()
        return left

    def _and(self) -> Column:
        left = self._not()
        while (tok := self.peek()) is not None and tok.kind == "and":
            self.next()
            left = left & self._not()
        return left

    def _not(self) -> Column:
        tok = self.peek()
        if tok is not None and tok.kind == "not":
            self.next()
            return ~self._not()
        return self._primary()

    def _primary(self) -> Column:
        tok = self.peek()
        if tok is None:
            raise ExprError(f"unexpected end of filter expression: {self.raw!r}")
        if tok.kind == "lparen":
            self.next()
            inner = self._or()
            closing = self.next()
            if closing.kind != "rparen":
                raise ExprError(f"expected ')' in filter expression {self.raw!r}")
            return inner
        return self._comparison()

    def _comparison(self) -> Column:
        col_tok = self.next()
        if col_tok.kind not in ("word", "value"):
            raise ExprError(
                f"expected column name, got {col_tok.text!r} in {self.raw!r}"
            )
        op_tok = self.next()
        if op_tok.kind == "op":
            op = op_tok.text
        elif op_tok.kind == "word" and op_tok.text.lower() in _KEYWORD_OPS:
            op = op_tok.text.lower()
        else:
            raise ExprError(f"expected operator after {col_tok.text!r} in {self.raw!r}")
        val_tok = self.next()
        if val_tok.kind not in ("word", "value"):
            raise ExprError(
                f"expected comparison value, got {val_tok.text!r} in {self.raw!r}"
            )
        return _compare(col_tok.text, op, val_tok.text)


def _compare(col: str, op: str, value: str) -> Column:
    c = F.col(col)
    if op in ("==", "!="):
        # String equality on the field text (filter.ts:60-72).
        lhs = c.cast("string")
        return lhs == F.lit(value) if op == "==" else lhs != F.lit(value)
    if op in (">", ">=", "<", "<="):
        # Numeric compare; unparseable -> NULL -> filter-false, matching the
        # reference's NaN-safe-false behavior (filter.ts:74-88).
        try:
            num = float(value)
        except ValueError:
            raise ExprError(
                f"numeric comparison {op!r} needs a numeric literal, got {value!r}"
            ) from None
        lhs = c.try_cast("double")
        return {
            ">": lhs > num,
            ">=": lhs >= num,
            "<": lhs < num,
            "<=": lhs <= num,
        }[op]
    lhs = c.cast("string")
    if op == "contains":
        return lhs.contains(value)
    if op == "startswith":
        return lhs.startswith(value)
    if op == "endswith":
        return lhs.endswith(value)
    if op == "matches":
        return lhs.rlike(value)
    raise ExprError(f"unknown operator {op!r}")


def compile_filter(expr: str) -> Column:
    """Compile a reference-CLI filter expression string into a Column.

    >>> df.filter(compile_filter("age > 21 && name startsWith 'A'"))
    """
    toks = _tokenize(expr)
    if not toks:
        raise ExprError("empty filter expression")
    return _Parser(toks, expr).parse()
