"""Deterministic edge-case tests for the kernel (SURVEY.md §2.B fine print)."""

from __future__ import annotations

from medea_spark.compiler import compile_schema_text
from medea_spark.kernel import (
    ADDITIONAL_PROP_FOUND_BUT_BANNED,
    NOT_JSON,
    NOT_ONE_OF_OPTIONS,
    OUT_OF_BOUNDS_ARRAY_LENGTH,
    REQUIRED_PROPERTY_IS_MISSING,
    validate_document,
)


def make(text: str):
    return compile_schema_text(text)


EMPTY_TUPLE = make(
    "$schema $start\n"
    "    $type\n"
    "        $array\n"
    "    $tuple\n"
)

EMPTY_PROPS = make(
    "$schema $start\n"
    "    $type\n"
    "        $object\n"
    "    $properties\n"
)

KV_SCHEMA = make(
    "$schema $start\n"
    "    $type\n"
    "        $object\n"
    "    $properties\n"
    '        $property-name "k"\n'
    "        $property-schema $number\n"
)

RECURSIVE_PROPS = make(
    "$schema $start\n"
    "    $type\n"
    "        node\n"
    "\n"
    "$schema node\n"
    "    $type\n"
    "        $object\n"
    "    $properties\n"
    '        $property-name "value"\n'
    "        $property-schema $number\n"
    '        $property-name "next"\n'
    "        $property-schema node\n"
    "        $optional-property\n"
)


def test_empty_tuple_only_accepts_unit():
    # SPEC via Analysis.hs:268-270 — empty $tuple implies exact length 0.
    assert validate_document(EMPTY_TUPLE, "[]")[0]
    ok, v = validate_document(EMPTY_TUPLE, "[1]")
    assert not ok and v[0][1] == OUT_OF_BOUNDS_ARRAY_LENGTH


def test_empty_properties_only_accepts_empty_object():
    # SPEC.md:359-362 — $properties with nothing else: only {} is valid.
    assert validate_document(EMPTY_PROPS, "{}")[0]
    ok, v = validate_document(EMPTY_PROPS, '{"a": 1}')
    assert not ok and v[0][1] == ADDITIONAL_PROP_FOUND_BUT_BANNED


def test_not_json():
    ok, v = validate_document(KV_SCHEMA, '{"k": 1')
    assert not ok and v == [("", NOT_JSON, "")]
    ok, v = validate_document(KV_SCHEMA, "NaN")
    assert not ok and v[0][1] == NOT_JSON  # Aeson rejects NaN/Infinity


def test_violation_pointers_and_codes():
    ok, v = validate_document(KV_SCHEMA, '{"k": "no"}')
    assert not ok and v == [("/k", NOT_ONE_OF_OPTIONS, "$start")]
    ok, v = validate_document(KV_SCHEMA, "{}")
    assert not ok and v == [("/k", REQUIRED_PROPERTY_IS_MISSING, "$start")]
    ok, v = validate_document(KV_SCHEMA, '{"x": 1}')
    assert not ok and v[0] == ("/x", ADDITIONAL_PROP_FOUND_BUT_BANNED, "$start")
    ok, v = validate_document(KV_SCHEMA, "7")
    assert not ok and v == [("", NOT_ONE_OF_OPTIONS, "$start")]


def test_banned_additional_precedes_required_and_recursion():
    # Medea.hs:372-391 — ban check over all keys first, then required.
    ok, v = validate_document(KV_SCHEMA, '{"z": {"deep": 1}}')
    assert not ok
    assert v[0] == ("/z", ADDITIONAL_PROP_FOUND_BUT_BANNED, "$start")


def test_collect_all_mode():
    ok, v = validate_document(KV_SCHEMA, '{"x": 1, "y": 2}', collect_all=True)
    assert not ok
    codes = sorted((p, c) for p, c, _ in v)
    assert codes == [
        ("/k", REQUIRED_PROPERTY_IS_MISSING),
        ("/x", ADDITIONAL_PROP_FOUND_BUT_BANNED),
        ("/y", ADDITIONAL_PROP_FOUND_BUT_BANNED),
    ]


def test_recursive_property_schema():
    # Only $type edges must be acyclic (Analysis.hs:115-121); property
    # references may recurse.
    doc = '{"value": 1, "next": {"value": 2, "next": {"value": 3}}}'
    assert validate_document(RECURSIVE_PROPS, doc)[0]
    bad = '{"value": 1, "next": {"value": "x"}}'
    ok, v = validate_document(RECURSIVE_PROPS, bad)
    assert not ok and v == [("/next/value", NOT_ONE_OF_OPTIONS, "node")]


def test_deep_nesting_guard():
    deep = "[" * 300 + "]" * 300
    ok, v = validate_document(make("$schema $start\n"), deep)
    # Either verdict is defensible for >256 depth, but it must not crash.
    assert isinstance(ok, bool)


def test_json_pointer_escaping():
    graph = make(
        "$schema $start\n"
        "    $type\n"
        "        $object\n"
        "    $properties\n"
        '        $property-name "a/b"\n'
        "        $property-schema $number\n"
    )
    ok, v = validate_document(graph, '{"a/b": "s"}')
    assert not ok and v[0][0] == "/a~1b"


def test_sum_type_first_success_wins():
    graph = make(
        "$schema $start\n"
        "    $type\n"
        "        aaa\n"
        "        bbb\n"
        "\n"
        "$schema aaa\n"
        "    $type\n"
        "        $string\n"
        "    $string-values\n"
        '        "hit"\n'
        "\n"
        "$schema bbb\n"
        "    $type\n"
        "        $string\n"
    )
    # "hit" matches aaa; any other string falls through to bbb.
    assert validate_document(graph, '"hit"')[0]
    assert validate_document(graph, '"other"')[0]
    assert not validate_document(graph, "5")[0]


def test_specs_only_apply_through_named_schema():
    # A bare $array element reached with no parent checks type only
    # (Medea.hs:329-336): inner arrays of any shape are fine.
    graph = make(
        "$schema $start\n"
        "    $type\n"
        "        $array\n"
        "    $min-length 1\n"
        "    $element-type\n"
        "        $array\n"
    )
    assert validate_document(graph, "[[1, \"x\", {}]]")[0]
    assert not validate_document(graph, "[]")[0]  # min-length on $start
    assert not validate_document(graph, "[5]")[0]  # element not an array


def test_resolve_pointer_and_offending_value():
    from medea_spark.kernel.validator import offending_value_json, resolve_pointer

    doc = {"a": [1, {"b/c": "x"}], "long": "y" * 500}
    assert resolve_pointer(doc, "") == (True, doc)
    assert resolve_pointer(doc, "/a/1/b~1c") == (True, "x")
    # missing final segment returns the enclosing value (the reference's
    # RequiredPropertyIsMissing payload embeds the object lacking the key)
    found, sub = resolve_pointer(doc, "/a/1/zzz")
    assert not found and sub == {"b/c": "x"}
    assert offending_value_json(doc, "/a/1/b~1c") == '"x"'
    assert len(offending_value_json(doc, "/long")) == 256


def test_foreign_parsed_types_fall_back_to_object():
    """validate_value accepts any user-parsed tree: types outside the
    json.loads vocabulary (Decimal, OrderedDict, tuples) judge as
    objects instead of raising (pre-dispatch-map behavior)."""
    from collections import OrderedDict
    from decimal import Decimal

    from medea_spark.compiler import compile_schema_text
    from medea_spark.kernel.validator import validate_value

    g = compile_schema_text(
        "$schema $start\n    $type\n        $object\n    $properties\n"
        '        $property-name "k"\n        $property-schema $number\n'
    )
    assert validate_value(g, OrderedDict({"k": 1})) == []
    viols = validate_value(g, {"k": Decimal("1")})
    assert viols and viols[0][1] == "NOT_ONE_OF_OPTIONS"


def test_graph_mutation_invalidates_linked_cache():
    """Mutating a compiled SchemaGraph after a first validation must
    relink — verdicts follow the live graph, never stale pointers."""
    num = make("$schema $start\n    $type\n        $number\n")
    string = make("$schema $start\n    $type\n        $string\n")
    assert validate_document(num, "5")[0] is True  # caches linked view
    num["$start"] = string["$start"]
    assert validate_document(num, "5")[0] is False
    assert validate_document(num, '"x"')[0] is True
    num.update(string)
    assert validate_document(num, '"y"')[0] is True


def test_graph_inplace_or_invalidates_linked_cache():
    """`graph |= other` hits C-level dict.__ior__, which bypasses the
    overridden update()/__setitem__ — SchemaGraph must override __ior__
    too, or the stale linked view survives the merge and verdicts come
    from the old graph (round-3 advice, reproduced)."""
    num = make("$schema $start\n    $type\n        $number\n")
    string = make("$schema $start\n    $type\n        $string\n")
    assert validate_document(num, "5")[0] is True  # caches linked view
    num |= {"$start": string["$start"]}
    assert validate_document(num, "5")[0] is False
    assert validate_document(num, '"x"')[0] is True


def test_str_subclass_content():
    """str subclasses (numpy.str_ and friends) must take the str parse
    path, not bytes .decode() — exact-type dispatch broke this once."""

    class S(str):
        pass

    g = make("$schema $start\n    $type\n        $number\n")
    assert validate_document(g, S("5")) == (True, [])
    ok, v = validate_document(g, S('"x"'))
    assert ok is False and v[0][1] == "NOT_ONE_OF_OPTIONS"


def test_parse_json_orjson_subset_property():
    """The orjson fast path may only ever ACCEPT a subset of what the
    stdlib decoder accepts, with structurally-equal values (number
    class, not bit-equality: >64-bit ints legally come back as floats —
    same JSON_NUMBER class, the only thing the walk dispatches on).
    Anything orjson rejects falls back to the stdlib decoder, so this
    property is exactly 'using orjson cannot change a verdict'."""
    import pytest

    orjson = pytest.importorskip("orjson")
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def structurally_equal(a, b):
        if isinstance(a, bool) or isinstance(b, bool):
            return a is b
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return True  # same JSON number class
        if type(a) is not type(b):
            return False
        if isinstance(a, list):
            return len(a) == len(b) and all(
                structurally_equal(x, y) for x, y in zip(a, b)
            )
        if isinstance(a, dict):
            return a.keys() == b.keys() and all(
                structurally_equal(a[k], b[k]) for k in a
            )
        return a == b

    raw = st.one_of(
        st.text(max_size=80),
        st.text(
            alphabet='{}[]",:0123456789.eE+-truefalsn ulINaify\\', max_size=80
        ),
    )

    @settings(max_examples=500, deadline=None)
    @given(raw)
    def check(s):
        try:
            ov = orjson.loads(s)
        except Exception:
            return  # rejected: the stdlib fallback decides — trivially safe
        sv = _json.loads(s)  # orjson accepted => stdlib must accept
        assert structurally_equal(ov, sv)

    check()


def test_schema_diff_and_compat():
    """Structural diff between two schema versions: property add/remove,
    optionality, enum change; the compatibility screen flags exactly
    the acceptance-narrowing changes."""
    from medea_spark.compiler import compile_schema_text
    from medea_spark.compiler.diff import is_backward_compatible, schema_diff

    v1 = compile_schema_text(
        "$schema $start\n    $type\n        $object\n    $properties\n"
        '        $property-name "k"\n        $property-schema $number\n'
    )
    v2 = compile_schema_text(
        "$schema $start\n    $type\n        $object\n    $properties\n"
        '        $property-name "k"\n        $property-schema $string\n'
        '        $property-name "tag"\n        $property-schema $string\n'
        "        $optional-property\n"
    )
    changes = schema_diff(v1, v2)
    kinds = {(c["schema"], c["kind"], c["detail"]) for c in changes}
    assert ("$start", "PROPERTY_SCHEMA_CHANGED", "k") in kinds
    assert ("$start", "PROPERTY_ADDED", "tag") in kinds
    ok, breaking = is_backward_compatible(v1, v2)
    assert ok is False  # k: number -> string narrows acceptance
    assert all(c["kind"] != "PROPERTY_ADDED" for c in breaking)  # optional add is fine
    # identical graphs: no changes, compatible
    assert schema_diff(v1, v1) == []
    assert is_backward_compatible(v1, v1) == (True, [])


def test_infer_schema_round_trip_and_closed_world():
    """infer_schema_text: the inferred text compiles, every sample
    validates, required/optional split matches presence, and the
    closed-world default rejects unseen keys and wrong types."""
    import pytest

    from medea_spark.compiler import compile_schema_text, infer_schema_text
    from medea_spark.kernel.validator import validate_document

    docs = [
        '{"name": "a", "size": 3, "tags": ["x", "y"], "meta": {"k": 1}}',
        '{"name": "b", "size": 4.5, "tags": [], "extra": null}',
        '{"name": "c", "size": 0, "tags": ["z"], "meta": {"k": 2}}',
    ]
    text = infer_schema_text(docs)
    g = compile_schema_text(text)
    for d in docs:
        ok, viols = validate_document(g, d)
        assert ok, (d, viols)
    # optional/required split: name+size+tags in all docs, meta/extra not
    assert text.count("$optional-property") == 2
    # closed world: unseen key banned; observed types enforced
    assert validate_document(g, '{"name": "a", "size": 1, "tags": [], "zz": 1}')[1][0][1] \
        == "ADDITIONAL_PROP_FOUND_BUT_BANNED"
    assert validate_document(g, '{"name": 5, "size": 1, "tags": []}')[1][0][1] \
        == "NOT_ONE_OF_OPTIONS"
    # mixed-type property -> generated child schema with alternation
    mixed = infer_schema_text(['{"v": 1}', '{"v": "s"}'])
    gm = compile_schema_text(mixed)
    assert validate_document(gm, '{"v": 2}')[0]
    assert validate_document(gm, '{"v": "t"}')[0]
    assert not validate_document(gm, '{"v": true}')[0]

    with pytest.raises(ValueError, match="zero samples"):
        infer_schema_text([])
    with pytest.raises(ValueError, match="sample 1"):
        infer_schema_text(['{"a": 1}', "not json"])


def test_infer_schema_hypothesis_round_trip():
    """Property: for ANY list of JSON documents, the inferred schema
    compiles and validates every document it was inferred from."""
    import json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from medea_spark.compiler import compile_schema_text, infer_schema_text
    from medea_spark.kernel.validator import validate_document

    scalars = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-10**6, 10**6),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(max_size=8),
    )
    json_values = st.recursive(
        scalars,
        lambda children: st.one_of(
            st.lists(children, max_size=4),
            st.dictionaries(st.text(max_size=6), children, max_size=4),
        ),
        max_leaves=12,
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(json_values, min_size=1, max_size=5))
    def prop(values):
        docs = [json.dumps(v) for v in values]
        g = compile_schema_text(infer_schema_text(docs))
        for d in docs:
            ok, viols = validate_document(g, d)
            assert ok, (d, viols)

    prop()
