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
  ``ctx._source.field = expr`` mutation with ``ctx._source`` reads,
  and ``ctx.op = 'index' | 'noop' | 'delete'`` (plain or
  branch-conditional) for per-row update routing.

- COUNTED LOOPS: ``for (init; cond; update) { ... }`` and
  ``while (cond) { ... }`` whose CONTROL (condition + update) depends
  only on compile-time constants — literals, params, and variables
  assigned from them. The symbolic executor tracks constness through
  arithmetic/comparison/boolean operators and unrolls the loop at
  transpile time (bounded by ``LOOP_UNROLL_LIMIT``), so the whole
  script is still ONE Catalyst expression; body statements may read
  doc values freely. ``i++``/``i--``/``++i`` statements are
  supported, and ``for (<type> x : params.list)`` FOR-EACH over a
  compile-time-constant params list unrolls one body execution per
  element. Data-dependent loop conditions or iterables (doc values),
  break/continue and ``return`` inside a loop raise (those scripts
  use the Python callable hook). A const-condition ``if``/ternary
  executes only the taken branch's effects (no dead CASE arms in the
  unrolled SQL).
- VALUE METHOD CALLS: the common String methods — ``length contains
  startsWith endsWith indexOf toLowerCase toUpperCase trim isEmpty
  replace substring equals`` — plus numeric ``intValue/longValue/
  doubleValue/floatValue`` map 1:1 to Spark SQL functions; explicit
  primitive casts ``(int) expr`` etc. apply the same narrowing CAST
  as declarations.

Numeric semantics follow Spark SQL, not Java: ``/`` is double
division (Painless truncates for two integers — declare the result
``int``/``long``, cast ``(int)``, or use Math.floor when porting
integer-division scripts), there is no integer overflow wrap-around,
and a NULL ``if``/ternary/loop condition takes the else/exit path
where Painless would throw. The full Painless type system,
data-dependent iteration, and user-defined functions are out of
scope — those scripts use the Python callable hook instead (SURVEY
§2.10 documented variant).
"""

from __future__ import annotations

import math
import re
from typing import Dict, Mapping, Optional

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
    | (?P<str>'(?:[^'\\]|\\.)*')
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>\?:|&&|\|\||\+\+|--|==|!=|<=|>=|\+=|-=|\*=|/=|[-+*/%<>!?:()\[\].,;{}=])
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


_NO = object()   # sentinel: "not a compile-time constant"

class _E(str):
    """SQL fragment tagged with (a) 'is this statically known to be a
    String' — Painless overloads ``+`` as concatenation when either
    operand is a String; Spark's ``+`` would numeric-coerce — and (b)
    its compile-time constant value when one is known (literals,
    params, and arithmetic over them). Constants are what make counted
    loops transpilable: the unroller decides the loop condition from
    them. Tags originate at literals, params and ``String``
    declarations and propagate through operators; concatenating two
    UNTYPED doc values needs an explicit ``String`` declaration
    (documented subset)."""

    is_str = False
    const = _NO


def _e(sql: str, is_str: bool = False, const=_NO) -> "_E":
    out = _E(sql)
    out.is_str = is_str
    out.const = const
    return out


def _is_str(v) -> bool:
    return getattr(v, "is_str", False)


def _const(v):
    return getattr(v, "const", _NO)


def _fold_bin(op: str, left, right):
    """Compile-time value of ``left op right`` under the module's
    documented numeric semantics (Spark double ``/``, Java-sign ``%``),
    or _NO. NULL operands never fold (SQL three-valued logic)."""
    lc, rc = _const(left), _const(right)
    if lc is _NO or rc is _NO or lc is None or rc is None:
        return _NO
    try:
        if op == "+":
            if isinstance(lc, str) or isinstance(rc, str):
                # fold concat only when BOTH sides are strings (Java
                # number->string formatting is not replicated here)
                return lc + rc if isinstance(lc, str) \
                    and isinstance(rc, str) else _NO
            return lc + rc
        if op == "-":
            return lc - rc
        if op == "*":
            return lc * rc
        if op == "/":
            return lc / rc          # Spark SQL: always double division
        if op == "%":               # remainder keeps the dividend's sign
            r = math.fmod(lc, rc)
            return r if isinstance(lc, float) or isinstance(rc, float) \
                else int(r)
        if op in ("<", "<=", ">", ">=", "==", "!="):
            # Fold comparisons only on like-kinded operands: Spark SQL
            # COERCES a mixed string/number comparison to numeric
            # (1 = '1' is true) while Python says False — folding there
            # would silently change the emitted answer. Strings fold
            # only for (in)equality (ordering is locale/byte-order
            # territory); everything else must be both-numeric/bool.
            ls, rs = isinstance(lc, str), isinstance(rc, str)
            if ls != rs:
                return _NO
            if ls and op not in ("==", "!="):
                return _NO
            if op == "<":
                return lc < rc
            if op == "<=":
                return lc <= rc
            if op == ">":
                return lc > rc
            if op == ">=":
                return lc >= rc
            if op == "==":
                return lc == rc
            return lc != rc
        if op == "&&":
            if isinstance(lc, str) or isinstance(rc, str):
                return _NO
            return bool(lc) and bool(rc)
        if op == "||":
            if isinstance(lc, str) or isinstance(rc, str):
                return _NO
            return bool(lc) or bool(rc)
    except Exception:
        return _NO
    return _NO


def _apply_cast_const(cast: Optional[str], c):
    """Apply a declaration cast to a known constant (_NO passes
    through; CAST(NULL AS x) is NULL)."""
    if c is _NO or c is None or cast is None:
        return c
    try:
        if cast == "BIGINT":
            return int(math.trunc(c))
        if cast == "DOUBLE":
            return float(c)
    except Exception:
        return _NO
    return c


def _with_const(sql: str, is_str: bool, c) -> "_E":
    """Build the _E stored in a variable environment. When the value is
    a known scalar constant, store the LITERAL as the SQL instead of
    the accumulated expression — this is what keeps an unrolled loop
    variable O(1) in the emitted SQL (``i`` appears as ``3``, not as a
    tower of CAST((... + 1)) fragments)."""
    if c is not _NO and (c is None or isinstance(c, (bool, int, float, str))):
        return _e(_lit(c), isinstance(c, str), c)
    return _e(sql, is_str, c)


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
# reserved ctx slot for ``ctx.op`` ('index' | 'noop' | 'delete' — the
# reference's update_by_query row-level verdict); exposed to
# update_by_query through painless_update_to_sql under this key
CTX_OP_FIELD = "__op__"

# hard bound on transpile-time loop unrolling: the emitted SQL grows
# with every doc-dependent accumulation, and Catalyst expression trees
# a few thousand nodes deep stop being the right tool — a loop that
# long belongs in the Python callable hook (or an agg)
LOOP_UNROLL_LIMIT = 1000


class _Parser:
    def __init__(self, toks, params: Mapping, score_col: str,
                 mode: str = "score"):
        self.toks = toks
        self.i = 0
        self.params = params
        self.score_col = score_col
        self.mode = mode          # "score" | "update"
        self.unrolled = 0         # TOTAL body executions across ALL
        #                           loops incl. nesting (a per-loop
        #                           bound lets nested loops multiply
        #                           to unbounded transpile work)
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
            cc = _const(cond)
            if cc is not _NO and cc is not None:
                # const condition: the taken branch IS the expression
                # (both consumed above; no dead CASE arm emitted)
                return a if cc else b
            return _e(f"(CASE WHEN {cond} THEN {a} ELSE {b} END)",
                      _is_str(a) and _is_str(b))
        return cond

    def or_(self) -> str:
        left = self.and_()
        while self.peek()[1] == "||":
            self.take()
            right = self.and_()
            left = _e(f"({left} OR {right})",
                      const=_fold_bin("||", left, right))
        return left

    def and_(self) -> str:
        left = self.cmp()
        while self.peek()[1] == "&&":
            self.take()
            right = self.cmp()
            left = _e(f"({left} AND {right})",
                      const=_fold_bin("&&", left, right))
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
                oc = _const(other)
                return _e(f"({other} IS{neg} NULL)",
                          const=_NO if oc is _NO else
                          ((oc is None) if op == "==" else (oc is not None)))
            sql_op = {"==": "=", "!=": "<>"}.get(op, op)
            return _e(f"({left} {sql_op} {right})",
                      const=_fold_bin(op, left, right))
        return left

    def add(self) -> str:
        left = self.mul()
        while self.peek()[1] in ("+", "-"):
            _k, op = self.take()
            right = self.mul()
            if op == "+" and (_is_str(left) or _is_str(right)):
                left = _e(f"concat({left}, {right})", True,
                          const=_fold_bin("+", left, right))
            else:
                left = _e(f"({left} {op} {right})",
                          const=_fold_bin(op, left, right))
        return left

    def mul(self) -> str:
        left = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            _k, op = self.take()
            right = self.unary()
            left = _e(f"({left} {op} {right})",
                      const=_fold_bin(op, left, right))
        return left

    def unary(self) -> str:
        kind, val = self.peek()
        if val == "!":
            self.take()
            e = self.unary()
            c = _const(e)
            return _e(f"(NOT {e})",
                      const=_NO if c is _NO or c is None else not c)
        if val == "-":
            self.take()
            e = self.unary()
            c = _const(e)
            return _e(f"(- {e})",
                      const=_NO if c is _NO or c is None
                      or isinstance(c, (str, bool)) else -c)
        return self.atom()

    def atom(self) -> str:
        kind, val = self.take()
        if kind == "num":
            # fractional/exponent literals are doubles in Painless; a
            # bare 2.5 is DECIMAL in Spark SQL (decimal division/
            # rounding semantics differ) — force DOUBLE
            if "." in val or "e" in val or "E" in val:
                return self._postfix(
                    _e(f"CAST({val} AS DOUBLE)", const=float(val)))
            return self._postfix(_e(val, const=int(val)))
        if kind == "str":
            return self._postfix(_e(_sql_str(val), True, const=val[1:-1]
                                    .replace("\\'", "'")
                                    .replace("\\\\", "\\")))
        if kind == "name":
            if val in ("true", "false", "null"):
                return _e({"null": "NULL"}.get(val, val),
                          const={"true": True, "false": False,
                                 "null": None}[val])
            if val == "_score":
                return self._postfix(_e(f"`{self.score_col}`"))
            if val == "doc":
                return self._postfix(self._doc())
            if val == "params":
                return self._postfix(self._param())
            if val == "Math":
                return self._math()
            if val == "ctx":
                return self._postfix(self._ctx_read())
            if val in self.env:
                return self._postfix(self.env[val])
            raise PainlessError(f"painless: unknown identifier {val!r} "
                                "(declare it first; for-each loops and "
                                "user functions are out of scope)")
        if val == "(":
            # explicit primitive cast: (int) expr — same narrowing CAST
            # as declarations
            k2, v2 = self.peek()
            if (k2 == "name" and v2 in _DECL_CAST
                    and self.toks[self.i + 1][1] == ")"):
                self.take()
                self.take(")")
                operand = self.unary()
                cast = _DECL_CAST[v2]
                if cast is None:
                    return operand
                return _e(f"CAST({operand} AS {cast})",
                          const=_apply_cast_const(cast, _const(operand)))
            e = self.expr()
            self.take(")")
            return self._postfix(e)
        raise PainlessError(f"painless: unexpected token {val!r}")

    # value method calls: the common String/number methods map 1:1 to
    # Spark SQL functions (reference: Painless's allowlisted
    # java.lang.String methods in modules/lang-painless/src/main/
    # resources/.../java.lang.txt)
    def _postfix(self, e):
        while (self.peek()[1] == "."
               and self.toks[self.i + 1][0] == "name"
               and self.toks[self.i + 2][1] == "("):
            self.take(".")
            _k, m = self.take()
            self.take("(")
            args = []
            if self.peek()[1] != ")":
                args.append(self.expr())
                while self.peek()[1] == ",":
                    self.take(",")
                    args.append(self.expr())
            self.take(")")
            e = self._method(e, m, args)
        return e

    def _method(self, r, m: str, args):
        def fold(fn, *vals):
            cs = [_const(v) for v in vals]
            if any(c is _NO or c is None for c in cs):
                return _NO
            try:
                return fn(*cs)
            except Exception:
                return _NO

        n = len(args)
        if m == "length" and n == 0:
            return _e(f"length({r})", const=fold(len, r))
        if m == "contains" and n == 1:
            return _e(f"contains({r}, {args[0]})",
                      const=fold(lambda a, b: b in a, r, args[0]))
        if m == "startsWith" and n == 1:
            return _e(f"startswith({r}, {args[0]})",
                      const=fold(str.startswith, r, args[0]))
        if m == "endsWith" and n == 1:
            return _e(f"endswith({r}, {args[0]})",
                      const=fold(str.endswith, r, args[0]))
        if m == "indexOf" and n == 1:
            # Java indexOf is 0-based with -1 absent; instr is 1-based
            # with 0 absent
            return _e(f"(instr({r}, {args[0]}) - 1)",
                      const=fold(str.find, r, args[0]))
        if m == "toLowerCase" and n == 0:
            return _e(f"lower({r})", True, const=fold(str.lower, r))
        if m == "toUpperCase" and n == 0:
            return _e(f"upper({r})", True, const=fold(str.upper, r))
        if m == "trim" and n == 0:
            return _e(f"trim({r})", True, const=fold(str.strip, r))
        if m == "isEmpty" and n == 0:
            return _e(f"(length({r}) = 0)",
                      const=fold(lambda a: len(a) == 0, r))
        if m == "replace" and n == 2:
            # Java String.replace is LITERAL, like Spark's replace()
            return _e(f"replace({r}, {args[0]}, {args[1]})", True,
                      const=fold(str.replace, r, args[0], args[1]))
        if m == "equals" and n == 1:
            return _e(f"({r} = {args[0]})",
                      const=fold(lambda a, b: a == b, r, args[0]))
        if m == "substring" and n in (1, 2):
            # Java: 0-based begin, end-exclusive; Spark substring is
            # 1-based with a LENGTH third argument
            b = args[0]
            if n == 1:
                return _e(f"substring({r}, ({b}) + 1)", True,
                          const=fold(lambda s, i: s[i:], r, b))
            return _e(f"substring({r}, ({b}) + 1, ({args[1]}) - ({b}))",
                      True,
                      const=fold(lambda s, i, j: s[i:j], r, b, args[1]))
        if m in ("intValue", "longValue") and n == 0:
            return _e(f"CAST({r} AS BIGINT)",
                      const=_apply_cast_const("BIGINT", _const(r)))
        if m in ("doubleValue", "floatValue") and n == 0:
            return _e(f"CAST({r} AS DOUBLE)",
                      const=_apply_cast_const("DOUBLE", _const(r)))
        raise PainlessError(
            f"painless: unsupported method .{m}/{n} (supported: length, "
            "contains, startsWith, endsWith, indexOf, toLowerCase, "
            "toUpperCase, trim, isEmpty, replace, equals, substring, "
            "intValue, longValue, doubleValue, floatValue)")

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

    def _param_value(self):
        """Parse a ``params.name`` / ``params['name']`` accessor and
        return ``(name, python_value)``."""
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
        return name, self.params[name]

    def _param(self) -> str:
        _name, v = self._param_value()
        return _e(_lit(v), isinstance(v, str),
                  const=v if v is None
                  or isinstance(v, (bool, int, float, str)) else _NO)

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
        if part == "op":
            return CTX_OP_FIELD
        if part != "_source":
            raise PainlessError(
                f"painless: only ctx._source and ctx.op are supported, "
                f"got ctx.{part}")
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
        if field == CTX_OP_FIELD:
            return self.ctx.get(_CTX_PREFIX + field, "'index'")
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
            if val in ("for", "while"):
                self._exec_loop()
                continue
            if val == "do":
                raise PainlessError(
                    "painless: do-while loops are out of scope (rewrite "
                    "as while, or use the Python callable hook)")
            if val in ("break", "continue"):
                raise PainlessError(
                    "painless: break/continue are out of scope (loops "
                    "unroll at transpile time — hoist the condition "
                    "into the loop bound, or use the Python hook)")
            if val in ("++", "--"):
                self.take()
                _k, name = self.take()
                self._incdec(name, val)
                self._semi()
                continue
            if kind == "name" and self.toks[self.i + 1][1] in ("++", "--"):
                self.take()
                _k, op = self.take()
                self._incdec(val, op)
                self._semi()
                continue
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
                self._exec_decl()
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

    def _exec_decl(self):
        """Consume one ``<type> name = expr ;`` declaration."""
        _k, kw = self.take()
        _k2, name = self.take()
        if name in self.env:
            raise PainlessError(
                f"painless: variable {name!r} is already declared "
                "(Painless forbids redeclaration/shadowing)")
        self.take("=")
        e = self.expr()
        self._semi()
        self.types[name] = kw
        cast = _DECL_CAST[kw]
        tagged = kw == "String" or _is_str(e)
        c = _apply_cast_const(cast, _const(e))
        self.env[name] = (_with_const(f"CAST({e} AS {cast})", False, c)
                          if cast else _with_const(f"({e})", tagged, c))

    def _incdec(self, name: str, op: str):
        """``name++`` / ``name--`` (statement or for-update position)."""
        if name not in self.env:
            raise PainlessError(
                f"painless: increment of undeclared variable {name!r}")
        cur = self.env[name]
        decl = self.types.get(name)
        cast = _DECL_CAST.get(decl) if decl else None
        one = _e("1", const=1)
        c = _apply_cast_const(cast, _fold_bin(op[0], cur, one))
        self.env[name] = _with_const(
            f"CAST(({cur} {op[0]} 1) AS {cast})" if cast
            else f"({cur} {op[0]} 1)", False, c)

    def _assign(self, key: str, is_ctx: bool, semi: bool = True):
        """Consume ``(=|+=|-=|*=|/=) expr [;]`` and bind into env/ctx."""
        _k, op = self.take()
        if op not in ("=", "+=", "-=", "*=", "/="):
            raise PainlessError(f"painless: expected assignment, got {op!r}")
        if is_ctx and key == _CTX_PREFIX + CTX_OP_FIELD and op != "=":
            raise PainlessError(
                "painless: ctx.op only supports plain assignment")
        e = self.expr()
        if semi:
            self._semi()
        store = self.ctx if is_ctx else self.env
        # the declared type persists across re-assignment: int-family
        # re-applies the truncating cast, String keeps + as concat
        # (review r5 findings)
        decl = None if is_ctx else self.types.get(key)
        cast = _DECL_CAST.get(decl) if decl else None
        if op == "=":
            new, tag, c = f"({e})", decl == "String" or _is_str(e), _const(e)
        else:
            cur = (store.get(key, f"`{key[len(_CTX_PREFIX):]}`")
                   if is_ctx else store[key])
            if op == "+=" and (decl == "String" or _is_str(cur)
                               or _is_str(e)):
                new, tag = f"concat({cur}, {e})", True
                c = _fold_bin("+", cur, e)
                if c is not _NO and not isinstance(c, str):
                    c = _NO
            else:
                new, tag, c = f"({cur} {op[0]} {e})", False, \
                    _fold_bin(op[0], cur, e)
        c = _apply_cast_const(cast, c)
        store[key] = (_with_const(f"CAST({new} AS {cast})", False, c)
                      if cast else _with_const(new, tag, c))

    def _semi(self):
        """Statement terminator: ';' (optional before '}' / eof)."""
        kind, val = self.peek()
        if val == ";":
            self.take()
        elif kind != "eof" and val != "}":
            raise PainlessError(f"painless: expected ';' before {val!r}")

    # ------------------------------------------------------------------
    # counted loops: unrolled at transpile time

    def _skip_balanced(self):
        """self.i at an opening bracket; advance past its match."""
        opens = []
        while True:
            kind, val = self.take()
            if kind == "eof":
                raise PainlessError("painless: unbalanced brackets")
            if val in "([{":
                opens.append({"(": ")", "[": "]", "{": "}"}[val])
            elif opens and val == opens[-1]:
                opens.pop()
                if not opens:
                    return

    def _skip_stmt(self):
        """Advance past one ';'-terminated simple statement."""
        depth = 0
        while True:
            kind, val = self.take()
            if kind == "eof":
                raise PainlessError(
                    "painless: unterminated loop-body statement")
            if val in "([{":
                depth += 1
            elif val in ")]}":
                depth -= 1
            elif val == ";" and depth == 0:
                return

    def _skip_to_close_paren(self):
        """Advance past the ')' matching an already-consumed '('."""
        depth = 1
        while True:
            kind, val = self.take()
            if kind == "eof":
                raise PainlessError("painless: unbalanced loop header")
            if val in "([{":
                depth += 1
            elif val in ")]}":
                depth -= 1
                if depth == 0:
                    return

    def _exec_update_clause(self):
        """The third clause of a for header: empty | name++ | name-- |
        ++name | assignment. Ends at the header's ')'."""
        kind, val = self.peek()
        if val != ")":
            if val in ("++", "--"):
                self.take()
                _k, name = self.take()
                self._incdec(name, val)
            elif kind == "name":
                self.take()
                nxt = self.peek()[1]
                if nxt in ("++", "--"):
                    self.take()
                    self._incdec(val, nxt)
                elif nxt in ("=", "+=", "-=", "*=", "/="):
                    if val not in self.env:
                        raise PainlessError(
                            f"painless: assignment to undeclared "
                            f"variable {val!r}")
                    self._assign(val, is_ctx=False, semi=False)
                else:
                    raise PainlessError(
                        "painless: unsupported for-loop update clause")
            else:
                raise PainlessError(
                    "painless: unsupported for-loop update clause")
        self.take(")")

    def _exec_loop(self):
        """``for``/``while`` with compile-time-decidable control:
        symbolically execute the body once per iteration by resetting
        the token cursor (the unrolled result is still one Catalyst
        expression). The loop CONDITION (and for-update) must fold to
        constants — literals, params, and variables assigned from them;
        body statements may use doc values freely."""
        _k, kw = self.take()
        self.take("(")
        outer = set(self.env)      # for-init declarations are loop-scoped
        upd_start = None
        if kw == "for":
            kind, val = self.peek()
            if val == ";":
                self.take()
            elif val in _DECL_CAST and self.toks[self.i + 1][0] == "name":
                if self.toks[self.i + 2][1] == ":":
                    # for-each over a compile-time-constant list
                    # (params arrays): unrolled one body execution per
                    # element; data-dependent iterables still raise
                    self._exec_foreach()
                    self.env = {k: v for k, v in self.env.items()
                                if k in outer}
                    return
                self._exec_decl()          # consumes the header's ';'
            elif kind == "name" and self.toks[self.i + 1][1] in (
                    "=", "+=", "-=", "*=", "/="):
                self.take()
                if val not in self.env:
                    raise PainlessError(
                        f"painless: assignment to undeclared variable "
                        f"{val!r}")
                self._assign(val, is_ctx=False)   # consumes ';'
            else:
                raise PainlessError(
                    "painless: unsupported for-loop initializer")
            cond_start = self.i
            self.expr()
            self.take(";")
            upd_start = self.i
            self._skip_to_close_paren()
        else:
            cond_start = self.i
            self.expr()
            self.take(")")
        body_start = self.i
        kind, val = self.peek()
        if val == "{":
            self._skip_balanced()
        elif val in ("if", "for", "while", "do"):
            raise PainlessError(
                "painless: brace compound loop bodies ({ ... })")
        else:
            self._skip_stmt()
        body_end = self.i

        n = 0
        while True:
            self.i = cond_start
            c = self.expr()
            cc = _const(c)
            if cc is _NO:
                raise PainlessError(
                    "painless: loop condition must be compile-time "
                    "decidable (literals, params, and variables assigned "
                    "from them) — data-dependent loops use the Python "
                    "callable hook")
            if cc is None or not cc:
                break
            n += 1
            self.unrolled += 1
            if self.unrolled > LOOP_UNROLL_LIMIT:
                raise PainlessError(
                    f"painless: script exceeds the {LOOP_UNROLL_LIMIT}-"
                    "iteration total unroll budget (nested loop trip "
                    "counts multiply)")
            self.i = body_start
            snap = set(self.env)
            pend, fin = self._exec_branch()
            if pend or fin is not None:
                raise PainlessError(
                    "painless: return inside a loop is out of scope "
                    "(assign to a declared variable instead)")
            # body-local declarations are block-scoped per iteration
            self.env = {k: v for k, v in self.env.items() if k in snap}
            if upd_start is not None:
                self.i = upd_start
                self._exec_update_clause()
        self.i = body_end
        self.env = {k: v for k, v in self.env.items() if k in outer}

    def _exec_foreach(self):
        """``for (<type> x : params.list)`` — the iterable must be a
        compile-time-constant LIST (a params array, the common script
        shape: iterate over user-supplied boosts/terms). Each element
        binds the loop variable to its literal and the body unrolls,
        exactly like the counted-loop path; doc-value or other
        data-dependent iterables raise with the Python-hook message.
        Cursor starts at the type keyword; consumes through the body."""
        _k, kw = self.take()
        _k2, name = self.take()
        if name in self.env:
            raise PainlessError(
                f"painless: variable {name!r} is already declared "
                "(Painless forbids redeclaration/shadowing)")
        self.take(":")
        k, val = self.take()
        if val != "params":
            raise PainlessError(
                "painless: for-each iterates only params lists — "
                "data-dependent iterables use the Python callable hook")
        pname, items = self._param_value()
        self.take(")")
        if not isinstance(items, (list, tuple)):
            raise PainlessError(
                f"painless: for-each over params.{pname} needs a "
                "list value")
        body_start = self.i
        _kind, v2 = self.peek()
        if v2 == "{":
            self._skip_balanced()
        elif v2 in ("if", "for", "while", "do"):
            raise PainlessError(
                "painless: brace compound loop bodies ({ ... })")
        else:
            self._skip_stmt()
        body_end = self.i
        cast = _DECL_CAST[kw]
        for elem in items:
            if elem is not None and not isinstance(
                    elem, (bool, int, float, str)):
                raise PainlessError(
                    "painless: for-each elements must be scalars "
                    f"(got {type(elem).__name__} in params.{pname})")
            self.unrolled += 1
            if self.unrolled > LOOP_UNROLL_LIMIT:
                raise PainlessError(
                    f"painless: script exceeds the {LOOP_UNROLL_LIMIT}-"
                    "iteration total unroll budget (nested loop trip "
                    "counts multiply)")
            self.i = body_start
            tagged = kw == "String" or isinstance(elem, str)
            c = _apply_cast_const(cast, elem)
            self.types[name] = kw
            self.env[name] = (
                _with_const(f"CAST({_lit(elem)} AS {cast})", False, c)
                if cast else _with_const(_lit(elem), tagged, c))
            snap = set(self.env)
            pend, fin = self._exec_branch()
            if pend or fin is not None:
                raise PainlessError(
                    "painless: return inside a loop is out of scope "
                    "(assign to a declared variable instead)")
            self.env = {k2: v3 for k2, v3 in self.env.items()
                        if k2 in snap}
        self.env.pop(name, None)
        self.types.pop(name, None)
        self.i = body_end

    def _exec_if(self):
        """Execute one if/else-if/else chain. Returns (pending, final)
        for the chain; self.env / self.ctx end in the merged
        fall-through state (branch-local declarations dropped)."""
        self.take()  # if
        self.take("(")
        cond = self.expr()
        self.take(")")
        snap_env, snap_ctx = dict(self.env), dict(self.ctx)
        cc = _const(cond)
        if cc is not _NO:
            # compile-time condition (common in unrolled loop bodies:
            # `if (i % 2 == 0) ...`): execute only the taken branch's
            # EFFECTS — both branches still consume their tokens — and
            # emit no dead CASE arm. A null condition takes else, the
            # documented variant of Painless's throw.
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
            taken = cc is not None and cc
            env, ctx = (env_t, ctx_t) if taken else (env_e, ctx_e)
            self.env = {k: v for k, v in env.items() if k in snap_env}
            self.ctx = ctx
            pend, fin = (pend_t, final_t) if taken else (pend_e, final_e)
            if fin is not None and (final_t is None or final_e is None):
                # Const-folding must not tighten reachability: when the
                # chain does NOT structurally return on every branch
                # (e.g. a const-true if with no else), Painless still
                # allows trailing code. Keep the taken return as an
                # always-true early-return guard; Catalyst's
                # SimplifyConditionals folds the CASE away.
                return pend + [("true", fin)], None
            return pend, fin
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
        if val in ("++", "--"):
            self.take()
            _k, name = self.take()
            self._incdec(name, val)
            self._semi()
            return [], None
        if kind == "name" and self.toks[self.i + 1][1] in ("++", "--"):
            self.take()
            _k, op = self.take()
            self._incdec(val, op)
            self._semi()
            return [], None
        if val in ("for", "while"):
            self._exec_loop()
            return [], None
        raise PainlessError(
            "painless: an unbraced if/else branch must be a return, an "
            "assignment, an increment, a loop, or a nested if")

    def _merge(self, cond: str, a: Dict[str, str], b: Dict[str, str],
               snap: Dict[str, str], is_ctx: bool) -> Dict[str, str]:
        """Merge two branch environments under ``cond``. Variables
        declared inside a branch are block-scoped and dropped; ctx
        fields default to the untouched column."""
        out: Dict[str, str] = {}
        for name in dict.fromkeys(list(a) + list(b)):
            if not is_ctx and name not in snap:
                continue  # branch-local declaration
            if is_ctx:
                untouched = ("'index'"
                             if name == _CTX_PREFIX + CTX_OP_FIELD
                             else f"`{name[len(_CTX_PREFIX):]}`")
                default = snap.get(name, untouched)
            else:
                default = snap[name]
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
    projection). A ``ctx.op = 'noop' | 'delete'`` assignment (plain or
    branch-conditional) appears in the map under the reserved key
    ``CTX_OP_FIELD`` (``__op__``) as an expression over the ORIGINAL
    row evaluating to 'index' / 'noop' / 'delete' — update_by_query
    routes rows on it (reference: UpdateByQueryRequest's scripted
    ctx.op contract)."""
    p = _Parser(_lex(source.strip()), params or {}, "score", mode="update")
    pending, final = p.exec_script()
    if pending or final is not None:
        raise PainlessError("painless: update scripts must not return")
    if not p.ctx:
        raise PainlessError(
            "painless: update script assigns no ctx._source field")
    return {field[len(_CTX_PREFIX):]: sql for field, sql in p.ctx.items()}
