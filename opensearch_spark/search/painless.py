"""Painless EXPRESSION subset -> Spark SQL expression transpiler.

The reference scripts aggregations/scoring/filters in Painless
(``/root/reference/modules/lang-painless``). This repo's scripting
surface is Spark SQL expressions and Python callables; this module
closes the most common porting gap: single-expression Painless scripts
(the overwhelming majority of script_score / script-filter /
script-field bodies) transpile mechanically to Catalyst expressions,
so they keep running verbatim with ``"lang": "painless"``.

Supported subset (documented contract — anything else raises):
- ``doc['field'].value`` / ``doc.field.value`` -> the corpus column
- ``doc['field'].size()`` -> 0/1 null-presence (the scripting idiom
  for exists checks)
- ``params.name`` / ``params['name']`` -> the bound literal
- ``_score`` -> the per-hit score column
- arithmetic ``+ - * / %``, comparisons ``== != < <= > >=``,
  boolean ``&& || !``, ternary ``c ? a : b``, parentheses
- ``Math.log/log10/sqrt/abs/exp/floor/ceil/pow/min/max``, ``Math.E``,
  ``Math.PI``
- number / single-quoted string / boolean / null literals

Numeric semantics follow Spark SQL, not Java: ``/`` is double
division (Painless truncates for two integers — use Math.floor
explicitly when porting integer-division scripts) and there is no
integer overflow wrap-around. Statements (defs, loops, returns),
field mutation, and the full
Painless type system are out of scope — those scripts use the Python
callable hook instead (SURVEY §2.10 documented variant).
"""

from __future__ import annotations

import re
from typing import Mapping, Optional

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
    | (?P<str>'(?:[^'\\]|\\.)*')
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>\?:|&&|\|\||==|!=|<=|>=|[-+*/%<>!?:()\[\].,])
    )""", re.X)

_MATH_FN = {
    "log": "ln", "log10": "log10", "sqrt": "sqrt", "abs": "abs",
    "exp": "exp", "floor": "floor", "ceil": "ceil", "pow": "power",
    "min": "least", "max": "greatest",
}
_MATH_CONST = {"E": "2.718281828459045", "PI": "3.141592653589793"}


class PainlessError(ValueError):
    pass


def _lex(src: str):
    out, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m or m.end() == i:
            rest = src[i:].strip()
            if not rest:
                break
            raise PainlessError(f"painless: cannot tokenize at {rest[:20]!r}")
        i = m.end()
        for kind in ("num", "str", "name", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


def _sql_str(painless_str: str) -> str:
    inner = painless_str[1:-1].replace("\\'", "'").replace('\\\\', '\\')
    # Spark's default string parser processes backslash escapes —
    # double them so the emitted literal round-trips verbatim
    return "'" + inner.replace("\\", "\\\\").replace("'", "''") + "'"


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return ("'" + str(v).replace("\\", "\\\\").replace("'", "''")
            + "'")


class _Parser:
    def __init__(self, toks, params: Mapping, score_col: str):
        self.toks = toks
        self.i = 0
        self.params = params
        self.score_col = score_col

    def peek(self):
        return self.toks[self.i]

    def take(self, want: Optional[str] = None):
        kind, val = self.toks[self.i]
        if want is not None and val != want:
            raise PainlessError(f"painless: expected {want!r}, got {val!r}")
        self.i += 1
        return kind, val

    # precedence climbing: ternary < or < and < cmp < add < mul < unary
    def expr(self) -> str:
        cond = self.or_()
        if self.peek()[1] == "?":
            self.take("?")
            a = self.expr()
            self.take(":")
            b = self.expr()
            return f"(CASE WHEN {cond} THEN {a} ELSE {b} END)"
        return cond

    def or_(self) -> str:
        left = self.and_()
        while self.peek()[1] == "||":
            self.take()
            left = f"({left} OR {self.and_()})"
        return left

    def and_(self) -> str:
        left = self.cmp()
        while self.peek()[1] == "&&":
            self.take()
            left = f"({left} AND {self.cmp()})"
        return left

    def cmp(self) -> str:
        left = self.add()
        op = self.peek()[1]
        if op in ("==", "!=", "<", "<=", ">", ">="):
            self.take()
            right = self.add()
            # Painless null equality is identity; SQL `= NULL` is never
            # true — emit IS [NOT] NULL (either side may be the null)
            if op in ("==", "!=") and "NULL" in (left, right):
                other = right if left == "NULL" else left
                neg = " NOT" if op == "!=" else ""
                return f"({other} IS{neg} NULL)"
            sql_op = {"==": "=", "!=": "<>"}.get(op, op)
            return f"({left} {sql_op} {right})"
        return left

    def add(self) -> str:
        left = self.mul()
        while self.peek()[1] in ("+", "-"):
            _k, op = self.take()
            left = f"({left} {op} {self.mul()})"
        return left

    def mul(self) -> str:
        left = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            _k, op = self.take()
            left = f"({left} {op} {self.unary()})"
        return left

    def unary(self) -> str:
        kind, val = self.peek()
        if val == "!":
            self.take()
            return f"(NOT {self.unary()})"
        if val == "-":
            self.take()
            return f"(- {self.unary()})"
        return self.atom()

    def atom(self) -> str:
        kind, val = self.take()
        if kind == "num":
            return val
        if kind == "str":
            return _sql_str(val)
        if kind == "name":
            if val in ("true", "false", "null"):
                return {"null": "NULL"}.get(val, val)
            if val == "_score":
                return f"`{self.score_col}`"
            if val == "doc":
                return self._doc()
            if val == "params":
                return self._param()
            if val == "Math":
                return self._math()
            raise PainlessError(f"painless: unknown identifier {val!r} "
                                "(variables/defs are out of scope)")
        if val == "(":
            e = self.expr()
            self.take(")")
            return e
        raise PainlessError(f"painless: unexpected token {val!r}")

    def _doc(self) -> str:
        kind, val = self.take()
        if val == "[":
            k, field = self.take()
            if k != "str":
                raise PainlessError("painless: doc[...] needs a string key")
            field = field[1:-1]
            self.take("]")
        elif val == ".":
            _k, field = self.take()
        else:
            raise PainlessError("painless: expected doc['field'] or doc.field")
        self.take(".")
        _k, attr = self.take()
        if attr == "value":
            return f"`{field}`"
        if attr == "size":
            self.take("(")
            self.take(")")
            return f"(CASE WHEN `{field}` IS NULL THEN 0 ELSE 1 END)"
        raise PainlessError(f"painless: unsupported doc accessor .{attr}")

    def _param(self) -> str:
        kind, val = self.take()
        if val == ".":
            _k, name = self.take()
        elif val == "[":
            k, name = self.take()
            if k != "str":
                raise PainlessError("painless: params[...] needs a string key")
            name = name[1:-1]
            self.take("]")
        else:
            raise PainlessError("painless: expected params.name")
        if name not in self.params:
            raise PainlessError(f"painless: missing param {name!r}")
        return _lit(self.params[name])

    def _math(self) -> str:
        self.take(".")
        _k, name = self.take()
        if name in _MATH_CONST and self.peek()[1] != "(":
            return _MATH_CONST[name]
        if name not in _MATH_FN:
            raise PainlessError(f"painless: unsupported Math.{name}")
        self.take("(")
        args = [self.expr()]
        while self.peek()[1] == ",":
            self.take(",")
            args.append(self.expr())
        self.take(")")
        return f"{_MATH_FN[name]}({', '.join(args)})"


def painless_to_sql(source: str, params: Mapping | None = None,
                    score_col: str = "score") -> str:
    """Transpile a single Painless expression to a Spark SQL expression
    string. ``params`` are bound as literals (the reference compiles a
    script once per params set too); ``_score`` maps to ``score_col``.
    Raises PainlessError on anything outside the documented subset."""
    src = source.strip()
    if src.startswith("return "):
        src = src[len("return "):]
    src = src.rstrip(";").strip()
    p = _Parser(_lex(src), params or {}, score_col)
    out = p.expr()
    if p.peek()[0] != "eof":
        raise PainlessError(
            f"painless: trailing tokens at {p.peek()[1]!r} "
            "(multi-statement scripts are out of scope)")
    return out
