"""Schema inference: suggest a ``.medea`` schema from sample documents.

The reference ships no inference — users hand-write schemata
(conformance corpus style).  For a corpus that already exists, the
natural workflow is the reverse: sample documents, infer a conservative
schema, review, then validate the full table with it.  This module
implements that driver-side step with a ROUND-TRIP GUARANTEE: the
inferred text always compiles (`compile_schema_text`), and every
document it was inferred from validates against it.

Inference rules (conservative; closed-world):

* a position's type spec is the alternation of the JSON types observed
  there (``$null`` included only when a null was seen);
* objects are CLOSED (no ``$additional-properties-allowed``): every
  observed key is listed, keys present in every object are required,
  the rest ``$optional-property`` — unseen keys fail validation, which
  is the safe default for a validation schema (loosen by hand);
* homogeneous primitive list elements use ``$element-type``; anything
  richer (mixed types, nested objects/arrays) gets a generated child
  schema named by its path;
* string enums are NOT inferred (a sample's value set is evidence of
  type, not of closure) — documented, not silently guessed.

No Spark here: this is a driver-side compile op, like
``compiler/diff.py`` (sample collection is the caller's job —
``df.select(col).limit(n).collect()``).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

_PRIM_OF = {
    type(None): "$null",
    bool: "$boolean",
    int: "$number",
    float: "$number",
    str: "$string",
}

_IDENT_OK = re.compile(r"[^A-Za-z0-9_.-]")

#: inverse of tokens._SIMPLE_ESCAPES for the characters that would
#: break the line-oriented syntax (or the quotes) if emitted raw
_KEY_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\0": "\\0",
    "\a": "\\a",
    "\b": "\\b",
    "\f": "\\f",
    "\v": "\\v",
}


def _quote_key(key: str) -> str:
    return '"' + "".join(_KEY_ESCAPES.get(c, c) for c in key) + '"'


@dataclass
class _Shape:
    """Merged structural summary of every value observed at a position."""

    types: set = field(default_factory=set)  # medea prim idents
    n_objects: int = 0
    prop_shapes: dict = field(default_factory=dict)   # key -> _Shape
    prop_counts: dict = field(default_factory=dict)   # key -> presence count
    elem: "_Shape | None" = None
    saw_elements: bool = False


def _observe(shape: _Shape, value) -> None:
    if isinstance(value, dict):
        shape.types.add("$object")
        shape.n_objects += 1
        for k, v in value.items():
            child = shape.prop_shapes.setdefault(k, _Shape())
            shape.prop_counts[k] = shape.prop_counts.get(k, 0) + 1
            _observe(child, v)
    elif isinstance(value, list):
        shape.types.add("$array")
        for v in value:
            if shape.elem is None:
                shape.elem = _Shape()
            shape.saw_elements = True
            _observe(shape.elem, v)
    elif isinstance(value, bool):
        # bool before int: bool IS an int in Python
        shape.types.add("$boolean")
    else:
        try:
            shape.types.add(_PRIM_OF[type(value)])
        except KeyError:  # pragma: no cover - json.loads never yields others
            raise ValueError(f"unsupported JSON value type: {type(value)!r}")


_TYPE_ORDER = ["$null", "$boolean", "$number", "$string", "$array", "$object"]


def _is_inline(shape: _Shape) -> str | None:
    """A single primitive type with no structure inlines as its ident."""
    if (
        len(shape.types) == 1
        and not shape.prop_shapes
        and shape.elem is None
    ):
        (t,) = shape.types
        if t not in ("$object", "$array") or (
            t == "$object" and not shape.prop_shapes
        ) or (t == "$array" and shape.elem is None):
            return t
    return None


def _child_name(path: list[str], taken: set) -> str:
    base = _IDENT_OK.sub("_", ".".join(path)) or "node"
    if base.startswith("$"):
        base = "_" + base
    name = base[:32]
    i = 2
    while name in taken:
        suffix = f".{i}"
        name = base[: 32 - len(suffix)] + suffix
        i += 1
    return name


def infer_schema_text(docs) -> str:
    """Infer a complete ``.medea`` schema text from an iterable of JSON
    document strings.  Raises ``ValueError`` on empty input or
    malformed JSON (with the offending index) — inference from
    invalid samples would bake the corruption into the schema."""
    root = _Shape()
    n = 0
    for i, doc in enumerate(docs):
        try:
            value = json.loads(doc)
        except Exception as exc:
            raise ValueError(f"sample {i} is not valid JSON: {exc}") from exc
        _observe(root, value)
        n += 1
    if n == 0:
        raise ValueError("cannot infer a schema from zero samples")

    blocks: list[str] = []
    taken: set = set()

    def emit(shape: _Shape, name: str, path: list[str]) -> None:
        taken.add(name)
        lines = [f"$schema {name}", "    $type"]
        for t in _TYPE_ORDER:
            if t in shape.types:
                lines.append(f"        {t}")
        pending: list[tuple[_Shape, str, list[str]]] = []
        if shape.prop_shapes:
            lines.append("    $properties")
            for key in sorted(shape.prop_shapes):
                child = shape.prop_shapes[key]
                inline = _is_inline(child)
                if inline is None:
                    cname = _child_name(path + [key], taken)
                    taken.add(cname)
                    pending.append((child, cname, path + [key]))
                    ref = cname
                else:
                    ref = inline
                lines.append(f"        $property-name {_quote_key(key)}")
                lines.append(f"        $property-schema {ref}")
                if shape.prop_counts[key] < shape.n_objects:
                    lines.append("        $optional-property")
        if shape.elem is not None:
            inline = _is_inline(shape.elem)
            if inline is None:
                cname = _child_name(path + ["elem"], taken)
                taken.add(cname)
                pending.append((shape.elem, cname, path + ["elem"]))
                ref = cname
            else:
                ref = inline
            lines.append("    $element-type")
            lines.append(f"        {ref}")
        blocks.append("\n".join(lines) + "\n")
        for child, cname, cpath in pending:
            emit(child, cname, cpath)

    emit(root, "$start", [])
    return "\n".join(blocks)
