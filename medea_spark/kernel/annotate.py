"""Dev-mode annotated validation — the reference's ``ValidatedJSON``.

The reference returns the input JSON re-annotated at every node with
the schema it validated against (``Cofree ValidJSONF SchemaInformation``,
Medea.hs:118-143).  At scale we never materialize that tree (the
violation relation carries the product information), but for debugging
a single document the annotation is recoverable: :func:`annotate_value`
returns a parallel tree of ``SchemaInformation`` labels.

Labels mirror the reference's constructors (Medea.hs:118-138):
``"$any" | "$null" | "$boolean" | "$number" | "$string" | "$array" |
"$object"`` for structural matches and the schema name for named
matches, whose ``cls`` field distinguishes ``StartSchema`` (the
``$start`` root) from ``UserDefined`` (Medea.hs:133-135).
"""

from __future__ import annotations

from typing import Any

from medea_spark.compiler.analyzer import ANY_NODE, Node, SchemaGraph
from medea_spark.kernel.validator import validate_value

_PRIM_LABELS = ("$null", "$boolean", "$number", "$string", "$array", "$object")


def _type_label(v: Any) -> str:
    if v is None:
        return "$null"
    t = type(v)
    if t is bool:
        return "$boolean"
    if t is int or t is float:
        return "$number"
    if t is str:
        return "$string"
    if t is list:
        return "$array"
    return "$object"


def _annotate(graph: SchemaGraph, v: Any, nodes: tuple[Node, ...], parent: str | None, depth: int):
    """Mirror of the kernel's alternation, returning the annotation tree
    of the *first succeeding* alternative (same order as validation), or
    None if nothing matches."""
    if depth > 256:
        return None
    if nodes[0] == ANY_NODE:
        return {"schema": "$any", "children": _annotate_children_any(v)}
    label = _type_label(v)
    tn = _PRIM_LABELS.index(label)
    if (1, tn, "") in nodes:
        ann = _annotate_prim(graph, v, label, parent, depth)
        if ann is not None:
            return ann
    for node in nodes:
        if node[0] != 2:
            continue
        scm = graph.get(node[2])
        if scm is None:
            continue
        sub = _annotate(graph, v, scm.types_as, node[2], depth + 1)
        if sub is not None:
            return {
                "schema": node[2],
                # Reference constructor parity (Medea.hs:133-135): the
                # $start schema annotates as StartSchema, every other
                # named schema as UserDefined.
                "cls": "StartSchema" if node[2] == "$start" else "UserDefined",
                "via": sub["schema"],
                "children": sub.get("children"),
            }
    return None


def _annotate_children_any(v: Any):
    if type(v) is list:
        return [{"schema": "$any", "children": _annotate_children_any(e)} for e in v]
    if type(v) is dict:
        return {
            k: {"schema": "$any", "children": _annotate_children_any(e)}
            for k, e in v.items()
        }
    return None


def _annotate_prim(graph: SchemaGraph, v: Any, label: str, parent: str | None, depth: int):
    if label in ("$null", "$boolean", "$number"):
        return {"schema": label, "children": None}
    if label == "$string":
        if parent is not None:
            scm = graph[parent]
            if scm.string_val_set and v not in scm.string_val_set:
                return None
        return {"schema": label, "children": None}
    scm = graph[parent] if parent is not None else None
    if label == "$array":
        if scm is None:
            return {"schema": label, "children": _annotate_children_any(v)}
        n = len(v)
        if (scm.min_array_len is not None and n < scm.min_array_len) or (
            scm.max_array_len is not None and n > scm.max_array_len
        ):
            return None
        if scm.array_kind == "list":
            pairs = [(e, scm.list_node) for e in v]
        elif scm.array_kind == "tuple":
            pairs = list(zip(v, scm.tuple_nodes))
        else:
            pairs = [(e, ANY_NODE) for e in v]
        children = []
        for e, node in pairs:
            sub = _annotate(graph, e, (node,), None, depth + 1)
            if sub is None:
                return None
            children.append(sub)
        return {"schema": label, "children": children}
    # object
    if scm is None:
        return {"schema": label, "children": _annotate_children_any(v)}
    children = {}
    for key, val in v.items():
        hit = scm.props.get(key)
        if hit is not None:
            node = hit[0]
        elif scm.additional_props:
            node = scm.additional_prop_schema
        else:
            return None
        sub = _annotate(graph, val, (node,), None, depth + 1)
        if sub is None:
            return None
        children[key] = sub
    for key in scm.prop_order:
        node, optional = scm.props[key]
        if not optional and key not in v:
            return None
    return {"schema": label, "children": children}


def flatten_annotation(tree: dict, pointer: str = "") -> list[tuple]:
    """Flatten an :func:`annotate_value` tree into
    ``(json_pointer, schema, cls, via)`` rows — the relational carrier
    of the Cofree annotation (RFC 6901 pointers encode the tree
    positions, so the nesting is recoverable).  This is the shape the
    Spark dev-mode UDF (engine.annotate_sample) returns as a nested
    ``array<struct<...>>`` column."""
    rows: list[tuple] = [
        (pointer, tree["schema"], tree.get("cls"), tree.get("via"))
    ]
    ch = tree.get("children")
    if isinstance(ch, list):
        for i, sub in enumerate(ch):
            if sub is not None:
                rows.extend(flatten_annotation(sub, f"{pointer}/{i}"))
    elif isinstance(ch, dict):
        for k, sub in ch.items():
            if sub is not None:
                tok = k.replace("~", "~0").replace("/", "~1")
                rows.extend(flatten_annotation(sub, f"{pointer}/{tok}"))
    return rows


def annotate_value(graph: SchemaGraph, value: Any) -> dict | None:
    """Annotation tree for a valid document; None when invalid.

    Use the kernel (:func:`validate_value`) for verdicts and violations;
    this is the debugging companion (``validAgainst``/``toValue`` parity,
    Medea.hs:158-170).
    """
    if validate_value(graph, value):
        return None
    return _annotate(graph, value, ((2, 0, "$start"),), None, 0)
