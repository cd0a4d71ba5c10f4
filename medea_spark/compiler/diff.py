"""Structural diff of two compiled schema graphs.

The review tool that pairs with temporal (as-of) validation
(engine/temporal.py): before registering a new schema version, show
exactly what changed — schemas added/removed, type lists widened or
narrowed, properties added/dropped/re-optioned, array bounds moved,
enum values changed.  Pure driver-side Python over CompiledSchema
(compiler/analyzer.py); no Spark involved.

Each change is a dict ``{schema, kind, detail, old, new}`` with stable
``kind`` codes, so the output can be rendered, asserted in CI, or
loaded into a DataFrame."""

from __future__ import annotations

from typing import Any

from medea_spark.compiler.analyzer import CompiledSchema, SchemaGraph


def _change(schema: str, kind: str, detail: str, old: Any, new: Any) -> dict:
    return {"schema": schema, "kind": kind, "detail": detail, "old": old, "new": new}


def _diff_schema(name: str, a: CompiledSchema, b: CompiledSchema) -> list[dict]:
    out: list[dict] = []
    if a.types_as != b.types_as:
        out.append(
            _change(name, "TYPES_CHANGED", "types-as list", list(a.types_as), list(b.types_as))
        )
    if (a.min_array_len, a.max_array_len) != (b.min_array_len, b.max_array_len):
        out.append(
            _change(
                name,
                "ARRAY_BOUNDS_CHANGED",
                "min/max array length",
                (a.min_array_len, a.max_array_len),
                (b.min_array_len, b.max_array_len),
            )
        )
    if a.array_kind != b.array_kind or a.list_node != b.list_node or a.tuple_nodes != b.tuple_nodes:
        out.append(
            _change(
                name,
                "ARRAY_SPEC_CHANGED",
                "element/tuple spec",
                (a.array_kind, a.list_node, a.tuple_nodes),
                (b.array_kind, b.list_node, b.tuple_nodes),
            )
        )
    for prop in sorted(set(a.props) - set(b.props)):
        out.append(_change(name, "PROPERTY_REMOVED", prop, a.props[prop], None))
    for prop in sorted(set(b.props) - set(a.props)):
        out.append(_change(name, "PROPERTY_ADDED", prop, None, b.props[prop]))
    for prop in sorted(set(a.props) & set(b.props)):
        (node_a, opt_a), (node_b, opt_b) = a.props[prop], b.props[prop]
        if node_a != node_b:
            out.append(_change(name, "PROPERTY_SCHEMA_CHANGED", prop, node_a, node_b))
        if opt_a != opt_b:
            out.append(
                _change(
                    name,
                    "PROPERTY_OPTIONALITY_CHANGED",
                    prop,
                    "optional" if opt_a else "required",
                    "optional" if opt_b else "required",
                )
            )
    if a.additional_props != b.additional_props or (
        a.additional_prop_schema != b.additional_prop_schema
    ):
        out.append(
            _change(
                name,
                "ADDITIONAL_PROPS_CHANGED",
                "additional-properties policy",
                (a.additional_props, a.additional_prop_schema),
                (b.additional_props, b.additional_prop_schema),
            )
        )
    if a.string_vals != b.string_vals:
        out.append(
            _change(
                name,
                "STRING_VALUES_CHANGED",
                "string enumeration",
                list(a.string_vals),
                list(b.string_vals),
            )
        )
    return out


def schema_diff(old: SchemaGraph, new: SchemaGraph) -> list[dict]:
    """All structural changes from ``old`` to ``new``, ordered by
    schema name then change kind (deterministic)."""
    changes: list[dict] = []
    for name in sorted(set(old) - set(new)):
        changes.append(_change(name, "SCHEMA_REMOVED", name, old[name], None))
    for name in sorted(set(new) - set(old)):
        changes.append(_change(name, "SCHEMA_ADDED", name, None, new[name]))
    for name in sorted(set(old) & set(new)):
        changes.extend(_diff_schema(name, old[name], new[name]))
    return changes


def is_backward_compatible(old: SchemaGraph, new: SchemaGraph) -> tuple[bool, list[dict]]:
    """Cheap necessary-condition screen: every change kind that can
    REJECT documents the old schema accepted flags as breaking.  Kinds
    that only ever widen acceptance (SCHEMA_ADDED, PROPERTY_ADDED as
    optional, optionality relaxed required→optional) pass.  This is a
    structural approximation, not a semantic proof — a TYPES_CHANGED
    that strictly widens still flags (deciding sub-schema containment
    in general needs the full lattice)."""
    breaking: list[dict] = []
    for ch in schema_diff(old, new):
        kind = ch["kind"]
        if kind in ("SCHEMA_ADDED",):
            continue
        if kind == "PROPERTY_ADDED":
            _node, optional = ch["new"]
            if optional:
                continue
        if kind == "PROPERTY_OPTIONALITY_CHANGED" and ch["new"] == "optional":
            continue
        breaking.append(ch)
    return (not breaking, breaking)
