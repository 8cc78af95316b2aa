"""Search templates — a Mustache subset (reference: the `_search/template`
endpoint + `lang-mustache` module, ``script/mustache/
MustacheScriptEngine.java``; template scripts render to a query body
before parsing).

Supported constructs (the subset real search templates overwhelmingly
use):

- ``{{var}}``            — substitution (string-interpolated)
- ``{{#toJson}}var{{/toJson}}`` — JSON-encode the parameter value
- ``{{var}}{{^var}}default{{/var}}`` — inverted section as default value
- ``{{#var}}...{{/var}}`` — section rendered iff param is truthy (no
  iteration; list iteration is out of scope, use toJson)

``render`` produces the JSON string; ``render_query`` parses it into the
query-body dict. A tiny in-memory registry mirrors the stored-script
API (`PUT _scripts/<id>`).
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict

_VAR = re.compile(r"\{\{\s*([\w.]+)\s*\}\}")
_TOJSON = re.compile(r"\{\{#toJson\}\}\s*([\w.]+)\s*\{\{/toJson\}\}")
_SECTION = re.compile(
    r"\{\{#\s*([\w.]+)\s*\}\}(.*?)\{\{/\s*\1\s*\}\}", re.DOTALL
)
_INVERTED = re.compile(
    r"\{\{\^\s*([\w.]+)\s*\}\}(.*?)\{\{/\s*\1\s*\}\}", re.DOTALL
)


_MISSING = object()


def _lookup(params: Dict[str, Any], dotted: str):
    cur: Any = params
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return _MISSING
        cur = cur[part]
    return cur


def _truthy(v: Any) -> bool:
    """Mustache falsiness: absent, None, False, and empty containers are
    falsy; the NUMBER 0 is truthy (spec behavior — a present size=0 must
    render, not trigger the inverted-section default)."""
    if v is _MISSING or v is None or v is False:
        return False
    if isinstance(v, (str, list, dict)) and len(v) == 0:
        return False
    return True


def render(template: str, params: Dict[str, Any] | None = None) -> str:
    params = params or {}
    # toJson first — its {{#toJson}} wrapper must not be parsed as a
    # boolean section
    def tojson(m: "re.Match") -> str:
        v = _lookup(params, m.group(1))
        return json.dumps(None if v is _MISSING else v)

    out = _TOJSON.sub(tojson, template)

    def sec(m: "re.Match") -> str:
        return m.group(2) if _truthy(_lookup(params, m.group(1))) else ""

    def inv(m: "re.Match") -> str:
        return "" if _truthy(_lookup(params, m.group(1))) else m.group(2)

    prev = None
    while prev != out:  # nested sections resolve in passes
        prev = out
        out = _SECTION.sub(sec, out)
        out = _INVERTED.sub(inv, out)

    def var(m: "re.Match") -> str:
        v = _lookup(params, m.group(1))
        if v is _MISSING or v is None:
            return ""
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    return _VAR.sub(var, out)


def render_query(template: str, params: Dict[str, Any] | None = None) -> dict:
    """Render + parse into a `_search` body dict."""
    return json.loads(render(template, params))


class TemplateRegistry:
    """Stored search templates (reference: `PUT _scripts/<id>` with
    lang=mustache)."""

    def __init__(self) -> None:
        self._scripts: Dict[str, str] = {}

    def put(self, script_id: str, template: str) -> None:
        self._scripts[script_id] = template

    def get(self, script_id: str) -> str:
        return self._scripts[script_id]

    def render(self, script_id: str, params: Dict[str, Any] | None = None) -> dict:
        return render_query(self._scripts[script_id], params)
