"""Per-document validation kernel (pure Python, Spark-free).

Reference parity: src/Data/Medea.hs:225-232 (validate) and its helper
state machine :260-415 (checkTypes / checkAny / checkPrim /
checkArray / checkObject / checkCustoms).

Evaluation model: a recursive walk threading ``(candidate node set,
parent schema name)``.  Candidate sets are *sorted tuples* of nodes so
alternation order matches the reference's ``NESet`` order:
AnyNode < PrimitiveNode < CustomNode, primitives in JSONType order,
custom nodes by name (Analysis.hs:84-88).

Semantics preserved (SURVEY.md §2.B fine print):

1. Specs (string enums, array bounds, element/tuple, properties) apply
   only when the value is reached *through a named schema* — the
   ``parent`` is set exclusively by entering a CustomNode
   (Medea.hs:395-407); children always recurse with ``parent=None``
   (Medea.hs:353-359, 368-370).  Consequence exploited for speed: a
   child paired with a *primitive* node needs exactly a type-equality
   check (its own children pair with AnyNode — Medea.hs:329-336), and a
   child paired with a *custom* node enters that schema directly.
2. AnyNode accepts the whole subtree unexamined (Medea.hs:302-307).
3. First-error-wins, depth-first: a failing document reports the error
   of the first applicable alternative (primitive branch, then custom
   nodes in name order), mirroring the reference's Alternative instance
   plus first-non-empty error semigroup (Medea.hs:212-217, 278-286).
4. Objects check banned-additional properties over all keys first, then
   missing-required, then recurse into values (Medea.hs:372-391).

Violations are ``(json_pointer, failed_constraint, schema_name)``
triples; RFC 6901 pointers are assembled lazily on the unwind of the
(rare) error path, so the happy path allocates nothing per node.
Constraint codes mirror the ValidationError constructors
(Medea.hs:173-210).
"""

from __future__ import annotations

import json
from typing import Any

from medea_spark.compiler.analyzer import ANY_NODE, Node, SchemaGraph
from medea_spark.compiler.tokens import (
    JSON_ARRAY,
    JSON_BOOLEAN,
    JSON_NULL,
    JSON_NUMBER,
    JSON_OBJECT,
    JSON_STRING,
)

# failed_constraint vocabulary (reference: Medea.hs:173-210).
NOT_JSON = "NOT_JSON"
NOT_ONE_OF_OPTIONS = "NOT_ONE_OF_OPTIONS"
ADDITIONAL_PROP_FOUND_BUT_BANNED = "ADDITIONAL_PROP_FOUND_BUT_BANNED"
REQUIRED_PROPERTY_IS_MISSING = "REQUIRED_PROPERTY_IS_MISSING"
OUT_OF_BOUNDS_ARRAY_LENGTH = "OUT_OF_BOUNDS_ARRAY_LENGTH"
MAX_DEPTH_EXCEEDED = "MAX_DEPTH_EXCEEDED"
IMPLEMENTATION_ERROR = "IMPLEMENTATION_ERROR"

Violation = tuple[str, str, str]  # (json_pointer, failed_constraint, schema)

_MAX_DEPTH = 256
_START_NODES: tuple[Node, ...] = ((2, 0, "$start"),)


def _reject_constant(_: str) -> Any:
    # Aeson rejects NaN/Infinity; Python's json accepts them by default.
    raise ValueError("non-standard JSON constant")


# json.loads yields exactly these concrete types, so an exact-type map
# is both correct and the fastest dispatch (one dict hit vs a branch
# cascade — _type_of runs once per JSON node, the hottest line of the
# kernel).
_TYPE_MAP = {
    type(None): JSON_NULL,
    bool: JSON_BOOLEAN,
    int: JSON_NUMBER,
    float: JSON_NUMBER,
    str: JSON_STRING,
    list: JSON_ARRAY,
    dict: JSON_OBJECT,
}


def _type_of(v: Any) -> int:
    """Reference parity: JSONType.hs:29-36 typeOf.  Foreign types (a
    caller passing Decimal/OrderedDict/tuple through the public
    validate_value) fall back to JSON_OBJECT as before the dispatch-map
    rewrite — never a KeyError escaping the kernel."""
    try:
        return _TYPE_MAP[type(v)]
    except KeyError:
        return JSON_OBJECT


def _escape_pointer_token(token: str) -> str:
    """RFC 6901 token escaping."""
    if "~" in token or "/" in token:
        token = token.replace("~", "~0").replace("/", "~1")
    return token


def _prefixed(sub: list[Violation], token: str) -> list[Violation]:
    """Prepend one pointer segment while unwinding an error path."""
    seg = f"/{token}"
    return [(seg + p, c, s) for p, c, s in sub]


def _check_types(
    graph: SchemaGraph,
    v: Any,
    nodes: tuple[Node, ...],
    parent: str | None,
    depth: int,
    short_circuit: bool,
    owner: str = "",
) -> list[Violation]:
    """Returns [] on success; violations carry pointers relative to this
    node (first error only when ``short_circuit``).

    ``owner`` is reporting-only: the schema that *declared* the
    constraint being checked (the reference's NotOneOfOptions carries no
    schema name; our violation rows attribute the specifying schema).
    """
    if depth > _MAX_DEPTH:
        return [("", MAX_DEPTH_EXCEEDED, parent or owner)]
    # checkAny (Medea.hs:302-307): AnyNode sorts first.
    if nodes[0] == ANY_NODE:
        return []
    tn = _type_of(v)
    prim_errs: list[Violation] | None = None
    if (1, tn, "") in nodes:
        prim_errs = _check_prim(graph, v, tn, parent, depth, short_circuit)
        if not prim_errs:
            return []
    # checkCustoms (Medea.hs:395-407): customs in sorted name order.
    first_custom_errs: list[Violation] | None = None
    for node in nodes:
        if node[0] != 2:
            continue
        scm = graph.get(node[2])
        if scm is None:  # unreachable post-analysis (Medea.hs:409-415)
            return [("", IMPLEMENTATION_ERROR, node[2])]
        sub = _check_types(
            graph, v, scm.types_as, node[2], depth + 1, short_circuit, node[2]
        )
        if not sub:
            return []
        if first_custom_errs is None:
            first_custom_errs = sub
    # Error preference: the primitive branch's *specific* failure if it was
    # applicable, else the first custom alternative's failure, else plain
    # non-membership.  (The reference only distinguishes pass/fail in its
    # conformance suite — Medea.hs:212-217 keeps the first non-empty error.)
    if prim_errs is not None:
        return prim_errs
    if first_custom_errs is not None:
        return first_custom_errs
    return [("", NOT_ONE_OF_OPTIONS, parent or owner)]


def _check_prim(
    graph: SchemaGraph,
    v: Any,
    tn: int,
    parent: str | None,
    depth: int,
    short_circuit: bool,
) -> list[Violation]:
    """Reference parity: Medea.hs:310-336 checkPrim (type membership was
    already confirmed by the caller)."""
    if tn <= JSON_NUMBER:  # null / boolean / number need no further checks
        return []
    if tn == JSON_STRING:
        if parent is not None:
            scm = graph[parent]
            if scm.string_val_set and v not in scm.string_val_set:
                return [("", NOT_ONE_OF_OPTIONS, parent)]
        return []
    if parent is None:
        # Bare $array / $object: children validate against AnyNode
        # (Medea.hs:329-336) — trivially valid, skip the walk.
        return []
    if tn == JSON_ARRAY:
        return _check_array(graph, v, parent, depth, short_circuit)
    return _check_object(graph, v, parent, depth, short_circuit)


def _check_child(
    graph: SchemaGraph,
    val: Any,
    node: Node,
    attribution: str,
    depth: int,
    short_circuit: bool,
) -> list[Violation]:
    """Child value against a single node with no parent context
    (Medea.hs:353-359, 368-370): AnyNode accepts; a primitive node is a
    bare type check (the child's own children pair with AnyNode); a
    custom node enters that schema."""
    kind = node[0]
    if kind == 0:
        return []
    if kind == 1:
        if _type_of(val) == node[1]:
            return []
        return [("", NOT_ONE_OF_OPTIONS, attribution)]
    name = node[2]
    scm = graph.get(name)
    if scm is None:
        return [("", IMPLEMENTATION_ERROR, name)]
    return _check_types(graph, val, scm.types_as, name, depth + 1, short_circuit, name)


def _check_array(
    graph: SchemaGraph,
    arr: list,
    parent: str,
    depth: int,
    short_circuit: bool,
) -> list[Violation]:
    """Reference parity: Medea.hs:339-359 checkArray."""
    scm = graph[parent]
    n = len(arr)
    lo = scm.min_array_len
    hi = scm.max_array_len
    if (lo is not None and n < lo) or (hi is not None and n > hi):
        return [("", OUT_OF_BOUNDS_ARRAY_LENGTH, parent)]
    kind = scm.array_kind
    if kind is None:
        return []  # elements pair with AnyNode — trivially valid
    errs: list[Violation] = []
    if kind == "list":
        node = scm.list_node
        if node == ANY_NODE:
            return []
        if node[0] == 1:  # homogeneous primitive list: flat type scan
            want = node[1]
            for i, item in enumerate(arr):
                if _type_of(item) != want:
                    errs.append((f"/{i}", NOT_ONE_OF_OPTIONS, parent))
                    if short_circuit:
                        return errs
            return errs
        for i, item in enumerate(arr):
            sub = _check_child(graph, item, node, parent, depth, short_circuit)
            if sub:
                errs.extend(_prefixed(sub, str(i)))
                if short_circuit:
                    return errs
    else:  # tuple — bounds already enforce the exact length
        for i, (item, node) in enumerate(zip(arr, scm.tuple_nodes)):
            sub = _check_child(graph, item, node, parent, depth, short_circuit)
            if sub:
                errs.extend(_prefixed(sub, str(i)))
                if short_circuit:
                    return errs
    return errs


def _check_object(
    graph: SchemaGraph,
    obj: dict,
    parent: str,
    depth: int,
    short_circuit: bool,
) -> list[Violation]:
    """Reference parity: Medea.hs:362-391 — banned-additional first (all
    keys), then required-missing, then value recursion."""
    scm = graph[parent]
    props = scm.props
    errs: list[Violation] = []
    pairing: list[tuple[str, Any, Node]] | None = None
    additional_node = scm.additional_prop_schema
    allow_additional = scm.additional_props
    for key, val in obj.items():
        hit = props.get(key)
        if hit is not None:
            node = hit[0]
        elif allow_additional:
            node = additional_node
        else:
            errs.append(
                (f"/{_escape_pointer_token(key)}", ADDITIONAL_PROP_FOUND_BUT_BANNED, parent)
            )
            if short_circuit:
                return errs
            continue
        if node[0] != 0:  # AnyNode children need no check at all
            if pairing is None:
                pairing = []
            pairing.append((key, val, node))
    for key in scm.required_keys:
        if key not in obj:
            errs.append(
                (f"/{_escape_pointer_token(key)}", REQUIRED_PROPERTY_IS_MISSING, parent)
            )
            if short_circuit:
                return errs
    if pairing:
        # _check_child inlined: one call per property is the kernel's
        # hottest call site, and the primitive-node case is a bare
        # type-equality check.
        tm_get = _TYPE_MAP.get
        for key, val, node in pairing:
            if node[0] == 1:
                if tm_get(type(val), JSON_OBJECT) == node[1]:
                    continue
                sub: list[Violation] = [("", NOT_ONE_OF_OPTIONS, parent)]
            else:
                name = node[2]
                scm2 = graph.get(name)
                if scm2 is None:
                    sub = [("", IMPLEMENTATION_ERROR, name)]
                else:
                    sub = _check_types(
                        graph, val, scm2.types_as, name, depth + 1, short_circuit, name
                    )
            if sub:
                errs.extend(_prefixed(sub, _escape_pointer_token(key)))
                if short_circuit:
                    return errs
    return errs


def validate_value(
    graph: SchemaGraph, value: Any, collect_all: bool = False
) -> list[Violation]:
    """Validate an already-parsed JSON value; [] means valid.

    Root dispatch starts from ``{CustomNode $start}`` with no parent
    (reference: Medea.hs:230-232).
    """
    try:
        return _check_types(graph, value, _START_NODES, None, 0, not collect_all)
    except RecursionError:
        return [("", MAX_DEPTH_EXCEEDED, "")]


def resolve_pointer(value: Any, pointer: str) -> tuple[bool, Any]:
    """Resolve an RFC 6901 pointer against a parsed JSON value.

    Returns ``(found, subvalue)``; when the final segment is absent
    (e.g. a REQUIRED_PROPERTY_IS_MISSING violation points at the key
    that is not there) the *enclosing* value is returned with
    ``found=False`` — matching the reference's error payloads, which
    embed the object that lacked the property (Medea.hs:181-204).
    """
    if not pointer:
        return True, value
    node = value
    tokens = pointer.split("/")[1:]
    for i, raw in enumerate(tokens):
        token = raw.replace("~1", "/").replace("~0", "~")
        nxt: Any
        if isinstance(node, dict) and token in node:
            nxt = node[token]
        elif isinstance(node, list) and token.isdigit() and int(token) < len(node):
            nxt = node[int(token)]
        else:
            return False, node
        node = nxt
    return True, node


def offending_value_json(
    value: Any, pointer: str, max_len: int = 256
) -> str:
    """Dev-mode payload for a violation row: the offending JSON chunk
    (reference parity: NotOneOfOptions !Value etc. embed the value),
    serialized compactly and truncated for row-width safety at scale."""
    _, sub = resolve_pointer(value, pointer)
    try:
        s = json.dumps(sub, separators=(",", ":"), ensure_ascii=False)
    except (TypeError, ValueError):
        s = repr(sub)
    if len(s) > max_len:
        s = s[: max_len - 1] + "…"
    return s


def validate_document(
    graph: SchemaGraph, content: str | bytes, collect_all: bool = False
) -> tuple[bool, list[Violation]]:
    """Validate one JSON document (text) against a compiled schema graph.

    Returns ``(is_valid, violations)``.  A JSON parse failure yields the
    single violation ``NOT_JSON`` at pointer ``""`` (reference:
    Medea.hs:225-228 decodeStrict → NotJSON).
    """
    try:
        value = json.loads(content, parse_constant=_reject_constant)
    except (ValueError, TypeError, RecursionError):
        return False, [("", NOT_JSON, "")]
    violations = validate_value(graph, value, collect_all)
    return not violations, violations
