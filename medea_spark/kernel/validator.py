"""Per-document validation kernel (pure Python, Spark-free).

Reference parity: src/Data/Medea.hs:225-232 (validate) and its helper
state machine :260-415 (checkTypes / checkAny / checkPrim /
checkArray / checkObject / checkCustoms).

Evaluation model: a recursive walk over a *pointer-linked* runtime view
of the compiled graph (:func:`link_graph`): every custom-node reference
is resolved to a direct ``_Linked`` schema object at link time, so the
hot path never touches the name→schema dict (the per-reference
``graph.get`` + tuple unpacking was ~75% of validate_document before
this).  A candidate set is a precomputed triple ``(has_any, prim_mask,
customs)`` — alternation order matches the reference's ``NESet`` order:
AnyNode < PrimitiveNode < CustomNode, primitives in JSONType order,
custom nodes by name (Analysis.hs:84-88) — the linker preserves the
sorted ``types_as`` order of the compiled nodes.

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
from typing import Any, Mapping

from medea_spark.compiler.analyzer import CompiledSchema
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


def _reject_constant(_: str) -> Any:
    # Aeson rejects NaN/Infinity; Python's json accepts them by default.
    raise ValueError("non-standard JSON constant")


# json.loads(s, parse_constant=...) constructs a fresh JSONDecoder per
# call (~10% of end-to-end kernel time); decode through one shared
# instance instead.  JSONDecoder is stateless after construction, so
# sharing is thread-safe.
_DECODER_DECODE = json.JSONDecoder(parse_constant=_reject_constant).decode

# Fast path: orjson parses ~4x faster and is STRICTER than the stdlib
# decoder (rejects NaN/Infinity like our parse_constant hook, rejects
# >64-bit ints, lone surrogates, invalid UTF-8).  Everything it rejects
# falls back to the stdlib path, which keeps the verdict — so using it
# can never change a result, only speed up documents both accept.  The
# parsed values are the same concrete types (dict/list/str/int/float/
# bool/None), which is all the walk dispatches on.  Gated behind an
# import-try for environments without it.
try:
    import orjson as _orjson

    _ORJSON_LOADS = _orjson.loads
    _ORJSON_ERROR = _orjson.JSONDecodeError
except ImportError:  # pragma: no cover - exercised only without orjson
    _ORJSON_LOADS = None
    _ORJSON_ERROR = ()


# json.loads yields exactly these concrete types, so an exact-type map
# is both correct and the fastest dispatch (one dict hit vs a branch
# cascade — it runs once per JSON node, the hottest line of the
# kernel).  Foreign types (a caller passing Decimal/OrderedDict/tuple
# through the public validate_value) fall back to JSON_OBJECT — never a
# KeyError escaping the kernel (reference parity: JSONType.hs:29-36).
_TYPE_MAP = {
    type(None): JSON_NULL,
    bool: JSON_BOOLEAN,
    int: JSON_NUMBER,
    float: JSON_NUMBER,
    str: JSON_STRING,
    list: JSON_ARRAY,
    dict: JSON_OBJECT,
}


# --- linked runtime view ---------------------------------------------------

# Child-node encoding after linking: ``None`` = AnyNode, ``int`` = a
# PrimitiveNode's JSON type, ``_Linked`` = a resolved CustomNode.
# Candidate sets become ``(has_any, prim_mask, customs)`` where
# prim_mask is a 6-bit membership mask over the JSON types and customs
# is a name-ordered tuple of _Linked schemas.

# Identity marker for a dangling reference surviving into the walk —
# unreachable after semantic analysis (Medea.hs:409-415) but guarded,
# like the reference (B14): entering it reports IMPLEMENTATION_ERROR.
_BROKEN_CAND = (False, 0, ())

_MISSING = object()  # props.get sentinel (None legitimately means AnyNode)


class _Linked:
    """Pointer-resolved twin of CompiledSchema — plain slots the walk
    reads directly; no dict lookups, no tuple unpacking."""

    __slots__ = (
        "name",
        "cand",
        "string_val_set",
        "min_array_len",
        "max_array_len",
        "array_kind",
        "list_node",
        "tuple_nodes",
        "props",
        "required_keys",
        "additional_props",
        "additional_node",
        "trivial_object",  # no props/required, additional=Any: objects pass
    )


def _broken(name: str) -> _Linked:
    lk = _Linked()
    lk.name = name
    lk.cand = _BROKEN_CAND
    lk.string_val_set = frozenset()
    lk.min_array_len = lk.max_array_len = None
    lk.array_kind = None
    lk.list_node = lk.tuple_nodes = None
    lk.props = {}
    lk.required_keys = ()
    lk.additional_props = True
    lk.additional_node = None
    lk.trivial_object = True
    return lk


def link_graph(graph: Mapping[str, CompiledSchema]) -> tuple:
    """Compile-once linking pass: name references → direct pointers.

    Returns the root candidate set ``{CustomNode $start}``
    (Medea.hs:230-232).  Property/list/tuple references may legally be
    cyclic (only the types-as relation is acyclic), so linking is
    two-phase: allocate every _Linked first, then fill the slots.
    """
    pool: dict[str, _Linked] = {name: _Linked() for name in graph}

    def resolve(node) -> None | int | _Linked:
        kind = node[0]
        if kind == 0:
            return None
        if kind == 1:
            return node[1]
        hit = pool.get(node[2])
        if hit is None:
            hit = pool[node[2]] = _broken(node[2])
        return hit

    for name, scm in graph.items():
        lk = pool[name]
        lk.name = name
        prim_mask = 0
        customs = []
        has_any = False
        for node in scm.types_as:  # already in NESet order
            kind = node[0]
            if kind == 0:
                has_any = True
            elif kind == 1:
                prim_mask |= 1 << node[1]
            else:
                customs.append(resolve(node))
        lk.cand = (has_any, prim_mask, tuple(customs))
        lk.string_val_set = scm.string_val_set
        lk.min_array_len = scm.min_array_len
        lk.max_array_len = scm.max_array_len
        lk.array_kind = scm.array_kind
        lk.list_node = resolve(scm.list_node) if scm.list_node is not None else None
        lk.tuple_nodes = (
            tuple(resolve(n) for n in scm.tuple_nodes)
            if scm.tuple_nodes is not None
            else None
        )
        lk.props = {k: resolve(v[0]) for k, v in scm.props.items()}
        lk.required_keys = scm.required_keys
        lk.additional_props = scm.additional_props
        lk.additional_node = resolve(scm.additional_prop_schema)
        lk.trivial_object = (
            not lk.props
            and not lk.required_keys
            and lk.additional_props
            and lk.additional_node is None
        )
    start = pool.get("$start")
    if start is None:
        start = _broken("$start")
    return (False, 0, (start,))


def _root_cand(graph) -> tuple:
    """Linked root for ``graph``, cached on the SchemaGraph instance
    (plain dicts can't carry attributes and relink per call — fine for
    one-off test graphs, never on the compile path)."""
    try:
        return graph._linked_root
    except AttributeError:
        pass
    root = link_graph(graph)
    try:
        graph._linked_root = root
    except (AttributeError, TypeError):
        pass
    return root


# --- the walk --------------------------------------------------------------


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
    v: Any,
    cand: tuple,
    parent: _Linked | None,
    depth: int,
    short_circuit: bool,
) -> list[Violation]:
    """Returns [] on success; violations carry pointers relative to this
    node (first error only when ``short_circuit``).  Attribution: the
    schema that declared the constraint (the reference's
    NotOneOfOptions carries no schema name; our violation rows
    attribute the specifying schema)."""
    if depth > _MAX_DEPTH:
        return [("", MAX_DEPTH_EXCEEDED, parent.name if parent else "")]
    has_any, prim_mask, customs = cand
    # checkAny (Medea.hs:302-307): AnyNode sorts first.
    if has_any:
        return []
    tn = _TYPE_MAP.get(type(v), JSON_OBJECT)
    prim_errs: list[Violation] | None = None
    if prim_mask >> tn & 1:
        # checkPrim inlined (Medea.hs:310-336) — type membership just
        # confirmed; the scalar cases return without a function call.
        if tn <= JSON_NUMBER:  # null / boolean / number: nothing further
            return []
        if tn == JSON_STRING:
            if parent is None:
                return []
            svs = parent.string_val_set
            if not svs or v in svs:
                return []
            prim_errs = [("", NOT_ONE_OF_OPTIONS, parent.name)]
        elif parent is None:
            # Bare $array / $object: children validate against AnyNode
            # (Medea.hs:329-336) — trivially valid, skip the walk.
            return []
        elif tn == JSON_ARRAY:
            prim_errs = _check_array(v, parent, depth, short_circuit)
            if not prim_errs:
                return []
        else:
            prim_errs = _check_object(v, parent, depth, short_circuit)
            if not prim_errs:
                return []
    # checkCustoms (Medea.hs:395-407): customs in sorted name order.
    first_custom_errs: list[Violation] | None = None
    for scm in customs:
        sc = scm.cand
        if sc is _BROKEN_CAND:  # unreachable post-analysis (Medea.hs:409-415)
            return [("", IMPLEMENTATION_ERROR, scm.name)]
        sub = _check_types(v, sc, scm, depth + 1, short_circuit)
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
    return [("", NOT_ONE_OF_OPTIONS, parent.name if parent else "")]


def _check_child(
    val: Any,
    node: None | int | _Linked,
    attribution: str,
    depth: int,
    short_circuit: bool,
) -> list[Violation]:
    """Child value against a single node with no parent context
    (Medea.hs:353-359, 368-370): AnyNode accepts; a primitive node is a
    bare type check (the child's own children pair with AnyNode); a
    custom node enters that schema."""
    if node is None:
        return []
    if node.__class__ is int:
        if _TYPE_MAP.get(type(val), JSON_OBJECT) == node:
            return []
        return [("", NOT_ONE_OF_OPTIONS, attribution)]
    cand = node.cand
    if cand is _BROKEN_CAND:
        return [("", IMPLEMENTATION_ERROR, node.name)]
    return _check_types(val, cand, node, depth + 1, short_circuit)


def _check_array(
    arr: list,
    parent: _Linked,
    depth: int,
    short_circuit: bool,
) -> list[Violation]:
    """Reference parity: Medea.hs:339-359 checkArray."""
    n = len(arr)
    lo = parent.min_array_len
    hi = parent.max_array_len
    if (lo is not None and n < lo) or (hi is not None and n > hi):
        return [("", OUT_OF_BOUNDS_ARRAY_LENGTH, parent.name)]
    kind = parent.array_kind
    if kind is None:
        return []  # elements pair with AnyNode — trivially valid
    errs: list[Violation] = []
    if kind == "list":
        node = parent.list_node
        if node is None:
            return []
        if node.__class__ is int:  # homogeneous primitive list: flat type scan
            tm_get = _TYPE_MAP.get
            pname = parent.name
            for i, item in enumerate(arr):
                if tm_get(type(item), JSON_OBJECT) != node:
                    errs.append((f"/{i}", NOT_ONE_OF_OPTIONS, pname))
                    if short_circuit:
                        return errs
            return errs
        for i, item in enumerate(arr):
            sub = _check_child(item, node, parent.name, depth, short_circuit)
            if sub:
                errs.extend(_prefixed(sub, str(i)))
                if short_circuit:
                    return errs
    else:  # tuple — bounds already enforce the exact length
        for i, (item, node) in enumerate(zip(arr, parent.tuple_nodes)):
            sub = _check_child(item, node, parent.name, depth, short_circuit)
            if sub:
                errs.extend(_prefixed(sub, str(i)))
                if short_circuit:
                    return errs
    return errs


def _check_object(
    obj: dict,
    parent: _Linked,
    depth: int,
    short_circuit: bool,
) -> list[Violation]:
    """Reference parity: Medea.hs:362-391 — banned-additional first (all
    keys), then required-missing, then value recursion."""
    if parent.trivial_object:
        # No property specs, no required keys, additional allowed with
        # AnyNode: every key pairs with AnyNode — nothing to walk.
        return []
    props = parent.props
    errs: list[Violation] = []
    # Deferred work discovered during the key scan, emitted AFTER the
    # required-missing pass (error-order parity).  node=None marks a
    # primitive type check that already failed — checking prims eagerly
    # (while deferring only the error emission) skips a second pass and
    # a pairing append for every passing primitive property, the
    # kernel's most common case.
    pairing: list[tuple[str, Any, _Linked | None]] | None = None
    additional_node = parent.additional_node
    allow_additional = parent.additional_props
    tm_get = _TYPE_MAP.get
    for key, val in obj.items():
        hit = props.get(key, _MISSING)
        if hit is _MISSING:
            if allow_additional:
                hit = additional_node
            else:
                errs.append(
                    (f"/{_escape_pointer_token(key)}", ADDITIONAL_PROP_FOUND_BUT_BANNED, parent.name)
                )
                if short_circuit:
                    return errs
                continue
        if hit is None:  # AnyNode children need no check at all
            continue
        if hit.__class__ is int:
            if tm_get(type(val), JSON_OBJECT) == hit:
                continue
            hit = None  # failed-prim marker
        if pairing is None:
            pairing = []
        pairing.append((key, val, hit))
    for key in parent.required_keys:
        if key not in obj:
            errs.append(
                (f"/{_escape_pointer_token(key)}", REQUIRED_PROPERTY_IS_MISSING, parent.name)
            )
            if short_circuit:
                return errs
    if pairing:
        # _check_child inlined: one call per property is the kernel's
        # hottest call site.
        for key, val, node in pairing:
            if node is None:
                sub: list[Violation] = [("", NOT_ONE_OF_OPTIONS, parent.name)]
            else:
                cand = node.cand
                if cand is _BROKEN_CAND:
                    sub = [("", IMPLEMENTATION_ERROR, node.name)]
                else:
                    sub = _check_types(val, cand, node, depth + 1, short_circuit)
            if sub:
                errs.extend(_prefixed(sub, _escape_pointer_token(key)))
                if short_circuit:
                    return errs
    return errs


# --- public API ------------------------------------------------------------


def validate_value(
    graph: Mapping[str, CompiledSchema], value: Any, collect_all: bool = False
) -> list[Violation]:
    """Validate an already-parsed JSON value; [] means valid.

    Root dispatch starts from ``{CustomNode $start}`` with no parent
    (reference: Medea.hs:230-232).
    """
    try:
        return _check_types(value, _root_cand(graph), None, 0, not collect_all)
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
    graph: Mapping[str, CompiledSchema], content: str | bytes, collect_all: bool = False
) -> tuple[bool, list[Violation]]:
    """Validate one JSON document (text) against a compiled schema graph.

    Returns ``(is_valid, violations)``.  A JSON parse failure yields the
    single violation ``NOT_JSON`` at pointer ``""`` (reference:
    Medea.hs:225-228 decodeStrict → NotJSON).
    """
    try:
        value = parse_json(content)
    except Exception:
        return False, [("", NOT_JSON, "")]
    violations = validate_value(graph, value, collect_all)
    return not violations, violations


def parse_json(content: str | bytes) -> Any:
    """THE kernel document parse — validate_document and every dev-mode
    companion (engine.annotate_sample) must agree on what counts as
    JSON, so they all route here.  orjson fast path when present, with
    the stdlib decoder (NaN/Infinity rejected via parse_constant) as
    the reference-faithful arbiter for everything orjson rejects (big
    ints, escaped lone surrogates, non-UTF-8 encodings).  Raises
    ValueError/TypeError/AttributeError on non-JSON."""
    if _ORJSON_LOADS is not None:
        try:
            return _ORJSON_LOADS(content)
        except _ORJSON_ERROR:
            pass  # stricter than stdlib: let the slow path decide
    if not isinstance(content, str):
        # bytes input: same UTF-8/16/32 sniffing json.loads applies
        # (Aeson decodeStrict parses bytes too — Medea.hs:225).
        # strict errors: invalid UTF-8 must stay NOT_JSON.  isinstance,
        # not an exact-type check: str subclasses (numpy.str_ and
        # friends) must take the str path, not bytes .decode().
        content = content.decode(json.detect_encoding(content))
    return _DECODER_DECODE(content)
