"""Painless subset -> Spark SQL expression transpiler.

The reference scripts aggregations/scoring/filters in Painless
(``/root/reference/modules/lang-painless``). This repo's scripting
surface is Spark SQL expressions and Python callables; this module
closes the most common porting gap: Painless script_score /
script-filter / script-field bodies — single expressions AND the
common statement shapes — transpile mechanically to Catalyst
expressions, so they keep running verbatim with ``"lang":
"painless"``.

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
- STATEMENTS (the Compiler.java shapes a porting user hits first):
  local declarations ``def/double/float/int/long/short/byte/boolean/
  String name = expr;`` (int-family declarations cast with Spark's
  truncating CAST AS BIGINT — Painless's narrowing), re-assignment
  (``=  +=  -=  *=  /=``), ``if (...) {...} else if ... else {...}``
  chains (transpiled to CASE WHEN via symbolic per-branch
  environments, branch-scoped declarations honoured), ``return expr;``
  on any subset of paths (every path must return by script end), and
  — through :func:`painless_update_to_sql`, used by update_by_query —
  ``ctx._source.field = expr`` mutation with ``ctx._source`` reads.

Numeric semantics follow Spark SQL, not Java: ``/`` is double
division (Painless truncates for two integers — declare the result
``int``/``long`` or use Math.floor when porting integer-division
scripts), there is no integer overflow wrap-around, and a NULL
``if``/ternary condition takes the else path where Painless would
throw. Loops, method calls on values, and the full Painless type
system are out of scope — those scripts use the Python callable hook
instead (SURVEY §2.10 documented variant).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
    | (?P<str>'(?:[^'\\]|\\.)*')
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>\?:|&&|\|\||==|!=|<=|>=|\+=|-=|\*=|/=|[-+*/%<>!?:()\[\].,;{}=])
    )""", re.X)

_MATH_FN = {
    "log": "ln", "log10": "log10", "sqrt": "sqrt", "abs": "abs",
    "exp": "exp", "floor": "floor", "ceil": "ceil", "pow": "power",
    "min": "least", "max": "greatest",
}
# cast like every other fractional literal: a bare decimal is DECIMAL
# in Spark SQL and decimal arithmetic diverges from Painless doubles
_MATH_CONST = {"E": "CAST(2.718281828459045 AS DOUBLE)",
               "PI": "CAST(3.141592653589793 AS DOUBLE)"}


class PainlessError(ValueError):
    pass


class _E(str):
    """SQL fragment tagged with 'is this statically known to be a
    String' — Painless overloads ``+`` as concatenation when either
    operand is a String; Spark's ``+`` would numeric-coerce. Tags
    originate at string literals, string params and ``String``
    declarations and propagate through ``+``/``def`` assignment;
    concatenating two UNTYPED doc values needs an explicit ``String``
    declaration (documented subset)."""

    is_str = False


def _e(sql: str, is_str: bool = False) -> "_E":
    out = _E(sql)
    out.is_str = is_str
    return out


def _is_str(v) -> bool:
    return getattr(v, "is_str", False)


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
    if isinstance(v, float):
        # Painless floats are doubles; a bare 2.5 literal is DECIMAL in
        # Spark SQL and decimal arithmetic diverges (found by the
        # differential property test) — force DOUBLE. Non-finite values
        # need the string form (a bare `inf` parses as a column ref).
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, int):
        return repr(v)
    return ("'" + str(v).replace("\\", "\\\\").replace("'", "''")
            + "'")


# declaration keywords -> SQL cast applied on assignment (Painless's
# narrowing conversion; Spark CAST(double AS BIGINT) truncates toward
# zero exactly like a Java (long) cast)
_DECL_CAST = {
    "def": None, "boolean": None, "String": None,
    "double": "DOUBLE", "float": "DOUBLE",
    "int": "BIGINT", "long": "BIGINT", "short": "BIGINT", "byte": "BIGINT",
}

_CTX_PREFIX = "ctx._source."


class _Parser:
    def __init__(self, toks, params: Mapping, score_col: str,
                 mode: str = "score"):
        self.toks = toks
        self.i = 0
        self.params = params
        self.score_col = score_col
        self.mode = mode          # "score" | "update"
        self.env: Dict[str, str] = {}   # local var -> SQL expr
        self.ctx: Dict[str, str] = {}   # source field -> pending SQL expr
        self.types: Dict[str, str] = {}  # local var -> declared keyword

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
            return _e(f"(CASE WHEN {cond} THEN {a} ELSE {b} END)",
                      _is_str(a) and _is_str(b))
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
            right = self.mul()
            if op == "+" and (_is_str(left) or _is_str(right)):
                left = _e(f"concat({left}, {right})", True)
            else:
                left = f"({left} {op} {right})"
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
            # fractional/exponent literals are doubles in Painless; a
            # bare 2.5 is DECIMAL in Spark SQL (decimal division/
            # rounding semantics differ) — force DOUBLE
            if "." in val or "e" in val or "E" in val:
                return f"CAST({val} AS DOUBLE)"
            return val
        if kind == "str":
            return _e(_sql_str(val), True)
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
            if val == "ctx":
                return self._ctx_read()
            if val in self.env:
                return self.env[val]
            raise PainlessError(f"painless: unknown identifier {val!r} "
                                "(declare it first; loops/methods are "
                                "out of scope)")
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
        v = self.params[name]
        return _e(_lit(v), isinstance(v, str))

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

    # ------------------------------------------------------------------
    # ctx._source access (update_by_query scripts; mode == "update")

    def _ctx_field(self) -> str:
        """Consume ``._source.name`` / ``._source['name']`` after ``ctx``
        and return the field name."""
        self.take(".")
        _k, part = self.take()
        if part != "_source":
            raise PainlessError(
                f"painless: only ctx._source is supported, got ctx.{part}")
        kind, val = self.take()
        if val == ".":
            _k, field = self.take()
            return field
        if val == "[":
            k, field = self.take()
            if k != "str":
                raise PainlessError("painless: ctx._source[...] needs a "
                                    "string key")
            self.take("]")
            return field[1:-1]
        raise PainlessError("painless: expected ctx._source.field")

    def _ctx_read(self) -> str:
        if self.mode != "update":
            raise PainlessError(
                "painless: ctx._source is only available in update "
                "scripts (update_by_query)")
        field = self._ctx_field()
        return self.ctx.get(_CTX_PREFIX + field, f"`{field}`")

    # ------------------------------------------------------------------
    # statements

    def exec_script(self):
        """Execute the whole script. Returns (pending, final): ``final``
        is the SQL returned on every residual path (None if the script
        falls off the end); ``pending`` is an ordered [(guard, sql)]
        list of early returns (CASE WHEN chain)."""
        pending, final = self._exec_stmts(top=True)
        if self.peek()[0] != "eof":
            raise PainlessError(
                f"painless: trailing tokens at {self.peek()[1]!r}")
        return pending, final

    @staticmethod
    def _fold(pending, final: Optional[str]) -> Optional[str]:
        """Collapse early-return guards + the fall-through value into
        one CASE expression."""
        if not pending:
            return final
        if final is None:
            return None
        whens = " ".join(f"WHEN {g} THEN {v}" for g, v in pending)
        return f"(CASE {whens} ELSE {final} END)"

    def _exec_stmts(self, top: bool = False):
        """Execute statements until ``}`` / eof. Returns (pending,
        final) as in exec_script; mutates self.env / self.ctx to the
        fall-through state."""
        pending: list = []
        while True:
            kind, val = self.peek()
            if kind == "eof" or val == "}":
                return pending, None
            if val == ";":          # stray empty statement
                self.take()
                continue
            if val in ("for", "while", "do"):
                raise PainlessError(
                    "painless: loops are out of scope (use the Python "
                    "callable hook)")
            if val == "return":
                if self.mode == "update":
                    raise PainlessError(
                        "painless: return inside an update script is "
                        "out of scope")
                self.take()
                final = self.expr()
                self._semi()
                k2, v2 = self.peek()
                if k2 != "eof" and v2 != "}":
                    raise PainlessError(
                        f"painless: unreachable code after return "
                        f"(at {v2!r})")
                return pending, final
            if val == "if":
                br_pending, br_final = self._exec_if()
                pending.extend(br_pending)
                if br_final is not None:
                    k2, v2 = self.peek()
                    if k2 != "eof" and v2 != "}":
                        raise PainlessError(
                            "painless: unreachable code after an "
                            "if/else where every branch returns")
                    return pending, br_final
                continue
            if val in _DECL_CAST and self.toks[self.i + 1][0] == "name":
                self.take()
                _k, name = self.take()
                if name in self.env:
                    raise PainlessError(
                        f"painless: variable {name!r} is already declared "
                        "(Painless forbids redeclaration/shadowing)")
                self.take("=")
                e = self.expr()
                self._semi()
                self.types[name] = val
                cast = _DECL_CAST[val]
                tagged = val == "String" or _is_str(e)
                self.env[name] = (_e(f"CAST({e} AS {cast})") if cast
                                  else _e(f"({e})", tagged))
                continue
            if val == "ctx":
                self.take()
                field = self._ctx_field()
                if self.mode != "update":
                    raise PainlessError(
                        "painless: ctx._source mutation needs an update "
                        "script (update_by_query)")
                self._assign(_CTX_PREFIX + field, is_ctx=True)
                continue
            if kind == "name" and self.toks[self.i + 1][1] in (
                    "=", "+=", "-=", "*=", "/="):
                self.take()
                if val not in self.env:
                    raise PainlessError(
                        f"painless: assignment to undeclared variable "
                        f"{val!r}")
                self._assign(val, is_ctx=False)
                continue
            # expression statement: only meaningful as an implicit
            # return in tail position (the historical bare-expression
            # script form)
            e = self.expr()
            if self.peek()[1] == ";":
                self.take()
            k2, v2 = self.peek()
            if top and k2 == "eof" and self.mode == "score":
                return pending, e
            raise PainlessError(
                "painless: a bare expression is only allowed as the "
                "final (implicitly returned) statement")

    def _assign(self, key: str, is_ctx: bool):
        """Consume ``(=|+=|-=|*=|/=) expr ;`` and bind into env/ctx."""
        _k, op = self.take()
        if op not in ("=", "+=", "-=", "*=", "/="):
            raise PainlessError(f"painless: expected assignment, got {op!r}")
        e = self.expr()
        self._semi()
        store = self.ctx if is_ctx else self.env
        # the declared type persists across re-assignment: int-family
        # re-applies the truncating cast, String keeps + as concat
        # (review r5 findings)
        decl = None if is_ctx else self.types.get(key)
        cast = _DECL_CAST.get(decl) if decl else None
        if op == "=":
            new, tag = f"({e})", decl == "String" or _is_str(e)
        else:
            cur = (store.get(key, f"`{key[len(_CTX_PREFIX):]}`")
                   if is_ctx else store[key])
            if op == "+=" and (decl == "String" or _is_str(cur)
                               or _is_str(e)):
                new, tag = f"concat({cur}, {e})", True
            else:
                new, tag = f"({cur} {op[0]} {e})", False
        store[key] = _e(f"CAST({new} AS {cast})") if cast else _e(new, tag)

    def _semi(self):
        """Statement terminator: ';' (optional before '}' / eof)."""
        kind, val = self.peek()
        if val == ";":
            self.take()
        elif kind != "eof" and val != "}":
            raise PainlessError(f"painless: expected ';' before {val!r}")

    def _exec_if(self):
        """Execute one if/else-if/else chain. Returns (pending, final)
        for the chain; self.env / self.ctx end in the merged
        fall-through state (branch-local declarations dropped)."""
        self.take()  # if
        self.take("(")
        cond = self.expr()
        self.take(")")
        snap_env, snap_ctx = dict(self.env), dict(self.ctx)
        pend_t, final_t = self._exec_branch()
        env_t, ctx_t = self.env, self.ctx
        self.env, self.ctx = dict(snap_env), dict(snap_ctx)
        pend_e, final_e = [], None
        if self.peek()[1] == "else":
            self.take()
            if self.peek()[1] == "if":
                pend_e, final_e = self._exec_if()
            else:
                pend_e, final_e = self._exec_branch()
        env_e, ctx_e = self.env, self.ctx

        if final_t is not None and final_e is not None:
            # every branch returns: one closed CASE, nothing falls out
            return [], (f"(CASE WHEN {cond} "
                        f"THEN {self._fold(pend_t, final_t)} "
                        f"ELSE {self._fold(pend_e, final_e)} END)")

        pending: list = []
        if final_t is not None:
            pending.append((cond, self._fold(pend_t, final_t)))
        else:
            pending.extend(
                (f"({cond} AND {g})", v) for g, v in pend_t)
        if final_e is not None:
            pending.append((f"(NOT coalesce({cond}, false))",
                            self._fold(pend_e, final_e)))
        else:
            pending.extend(
                (f"((NOT coalesce({cond}, false)) AND {g})", v)
                for g, v in pend_e)

        if final_t is None and final_e is None:
            self.env = self._merge(cond, env_t, env_e, snap_env, False)
            self.ctx = self._merge(cond, ctx_t, ctx_e, snap_ctx, True)
        elif final_t is None:             # else returned: continue under cond
            self.env = {k: v for k, v in env_t.items() if k in snap_env}
            self.ctx = ctx_t
        else:                             # then returned: continue under !cond
            self.env = {k: v for k, v in env_e.items() if k in snap_env}
            self.ctx = ctx_e
        return pending, None

    def _exec_branch(self):
        """One if/else branch: a ``{...}`` block, or a single unbraced
        return / assignment / nested if."""
        kind, val = self.peek()
        if val == "{":
            self.take()
            pending, final = self._exec_stmts()
            self.take("}")
            return pending, final
        if val == "return":
            if self.mode == "update":
                raise PainlessError(
                    "painless: return inside an update script is out "
                    "of scope")
            self.take()
            e = self.expr()
            self._semi()
            return [], e
        if val == "if":
            return self._exec_if()
        if val == "ctx":
            self.take()
            field = self._ctx_field()
            if self.mode != "update":
                raise PainlessError(
                    "painless: ctx._source mutation needs an update "
                    "script (update_by_query)")
            self._assign(_CTX_PREFIX + field, is_ctx=True)
            return [], None
        if kind == "name" and self.toks[self.i + 1][1] in (
                "=", "+=", "-=", "*=", "/="):
            self.take()
            if val not in self.env:
                raise PainlessError(
                    f"painless: assignment to undeclared variable {val!r}")
            self._assign(val, is_ctx=False)
            return [], None
        raise PainlessError(
            "painless: an unbraced if/else branch must be a return, an "
            "assignment, or a nested if")

    def _merge(self, cond: str, a: Dict[str, str], b: Dict[str, str],
               snap: Dict[str, str], is_ctx: bool) -> Dict[str, str]:
        """Merge two branch environments under ``cond``. Variables
        declared inside a branch are block-scoped and dropped; ctx
        fields default to the untouched column."""
        out: Dict[str, str] = {}
        for name in dict.fromkeys(list(a) + list(b)):
            if not is_ctx and name not in snap:
                continue  # branch-local declaration
            default = (snap.get(name, f"`{name[len(_CTX_PREFIX):]}`")
                       if is_ctx else snap[name])
            va = a.get(name, default)
            vb = b.get(name, default)
            out[name] = (va if va == vb else
                         _e(f"(CASE WHEN {cond} THEN {va} ELSE {vb} END)",
                            _is_str(va) and _is_str(vb)))
        return out


def painless_to_sql(source: str, params: Mapping | None = None,
                    score_col: str = "score") -> str:
    """Transpile a Painless script (expression, or the statement subset
    in the module docstring) to ONE Spark SQL expression string.
    ``params`` are bound as literals (the reference compiles a script
    once per params set too); ``_score`` maps to ``score_col``. Every
    control path must produce a value (an explicit ``return``, or a
    bare final expression). Raises PainlessError on anything outside
    the documented subset."""
    p = _Parser(_lex(source.strip()), params or {}, score_col)
    pending, final = p.exec_script()
    out = p._fold(pending, final)
    if out is None:
        raise PainlessError(
            "painless: not every path returns a value")
    return out


def painless_update_to_sql(source: str,
                           params: Mapping | None = None) -> Dict[str, str]:
    """Transpile an update_by_query Painless script (``ctx._source``
    mutations, local declarations, if/else) to a {column: SQL
    expression} map — exactly the dict form ``index.reindex.
    update_by_query`` applies with ``withColumn`` (reference: the
    reindex module's UpdateByQueryAction runs the same script per doc
    via Painless; here each field's final value is one Catalyst
    expression, so the whole update is a single vectorized
    projection)."""
    p = _Parser(_lex(source.strip()), params or {}, "score", mode="update")
    pending, final = p.exec_script()
    if pending or final is not None:
        raise PainlessError("painless: update scripts must not return")
    if not p.ctx:
        raise PainlessError(
            "painless: update script assigns no ctx._source field")
    return {field[len(_CTX_PREFIX):]: sql for field, sql in p.ctx.items()}
