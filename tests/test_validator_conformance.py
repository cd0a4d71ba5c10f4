"""Property-based replay of the reference validator suite.

Mirrors /root/reference/test/validator-quickcheck/Main.hs:31-224: for
each of the 36 schemas in conformance/validation/, generate random JSON
(shapes follow test/Data/Aeson/Arbitrary.hs:35-97) and assert that our
verdict equals the oracle predicate.  This is *stronger* than the
reference (which asserts two implications); we assert the equivalence.
"""

from __future__ import annotations

import json
from functools import lru_cache

from hypothesis import given, settings, strategies as st

from medea_spark.compiler import compile_schema_text
from medea_spark.kernel import validate_document

from tests.conftest import CONFORMANCE

VALIDATION = CONFORMANCE / "validation"


@lru_cache(maxsize=None)
def graph_for(name: str):
    return compile_schema_text((VALIDATION / name).read_bytes())


def verdict(schema_file: str, value) -> bool:
    ok, violations = validate_document(
        graph_for(schema_file), json.dumps(value)
    )
    assert ok == (not violations)
    return ok


# --- generators (shapes follow Arbitrary.hs:72-97) -------------------------

_scalar = (
    st.none()
    | st.booleans()
    | st.integers(min_value=-(10**6), max_value=10**6)
    | st.floats(allow_nan=False, allow_infinity=False, width=32)
    | st.text(max_size=8)
)

json_value = st.recursive(
    _scalar,
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=6), children, max_size=4),
    max_leaves=12,
)


def obj_gen(required: list[str], optional: list[str], max_additional: int):
    """Mirror of ObjGenOpts (Arbitrary.hs:35, 89-97): required props
    always present, optional props coin-flipped, up to N additional
    random keys."""

    @st.composite
    def gen(draw):
        obj = {}
        n_add = draw(st.integers(0, max_additional))
        for _ in range(n_add):
            key = draw(st.text(max_size=6))
            obj[key] = draw(json_value)
        for k in required:
            obj[k] = draw(json_value)
        for k in optional:
            if draw(st.booleans()):
                obj[k] = draw(json_value)
        return obj

    return gen()


def arr_gen(lo: int, hi: int):
    return st.lists(json_value, min_size=lo, max_size=hi)


# --- type predicates --------------------------------------------------------

is_null = lambda v: v is None
is_bool = lambda v: type(v) is bool
is_number = lambda v: type(v) in (int, float)
is_string = lambda v: type(v) is str
is_array = lambda v: type(v) is list
is_object = lambda v: type(v) is dict


def has_prop(obj, key, pred):
    return key in obj and pred(obj[key])


def has_opt_prop(obj, key, pred):
    return key not in obj or pred(obj[key])


def closed_world(obj, allowed):
    return all(k in allowed for k in obj)


def additional_pred(obj, specified, pred):
    return all(pred(v) for k, v in obj.items() if k not in specified)


# --- singular type schemas (Main.hs:33-43) ----------------------------------

SINGULAR = {
    "null.medea": is_null,
    "boolean.medea": is_bool,
    "number.medea": is_number,
    "string.medea": is_string,
    "array.medea": is_array,
    "object.medea": is_object,
    "nullable-boolean.medea": lambda v: is_null(v) or is_bool(v),
    "nullable-number.medea": lambda v: is_null(v) or is_number(v),
    "nullable-string.medea": lambda v: is_null(v) or is_string(v),
    "nullable-array.medea": lambda v: is_null(v) or is_array(v),
    "nullable-object.medea": lambda v: is_null(v) or is_object(v),
}


@settings(max_examples=1000, deadline=None)
@given(v=json_value)
def test_any(v):
    assert verdict("any.medea", v)


@settings(max_examples=1000, deadline=None)
@given(v=json_value, data=st.data())
def test_singular_types(v, data):
    name = data.draw(st.sampled_from(sorted(SINGULAR)))
    assert verdict(name, v) == SINGULAR[name](v)


# --- string enumerations (Main.hs:44-46, 307-315) ----------------------------

STRING_VALS = {
    "stringVals.medea": ["bar", "baz"],
    "stringVals2.medea": ["accountant", "barber", "bishop", "baker"],
}


@settings(max_examples=1000, deadline=None)
@given(data=st.data())
def test_string_vals(data):
    name = data.draw(st.sampled_from(sorted(STRING_VALS)))
    vals = STRING_VALS[name]
    v = data.draw(st.sampled_from(vals) | json_value)
    assert verdict(name, v) == (type(v) is str and v in vals)


# --- object schemas (Main.hs:47-141) -----------------------------------------
# (gen_required, gen_optional, max_additional, predicate)

OBJECT_CASES = {
    "1-property-no-additional-1.medea": (
        ["foo"], [], 2,
        lambda o: has_prop(o, "foo", is_bool) and closed_world(o, {"foo"}),
    ),
    "1-property-no-additional-2.medea": (
        ["foo"], [], 2,
        lambda o: has_prop(o, "foo", is_null) and closed_world(o, {"foo"}),
    ),
    "1-property-no-additional-3.medea": (
        [], ["foo"], 2,
        lambda o: has_opt_prop(o, "foo", is_array) and closed_world(o, {"foo"}),
    ),
    "1-property-additional-1.medea": (
        ["foo"], [], 3,
        lambda o: has_prop(o, "foo", is_string),
    ),
    "1-property-additional-2.medea": (
        ["foo"], [], 3,
        lambda o: has_prop(o, "foo", is_number),
    ),
    "1-property-additional-3.medea": (
        [], ["foo"], 3,
        lambda o: has_opt_prop(o, "foo", is_object),
    ),
    "3-property-no-additional-1.medea": (
        ["foo", "bar", "bazz"], [], 1,
        lambda o: has_prop(o, "foo", lambda v: is_number(v) or is_array(v))
        and "bar" in o
        and has_prop(o, "bazz", lambda v: is_null(v) or is_bool(v))
        and closed_world(o, {"foo", "bar", "bazz"}),
    ),
    "3-property-no-additional-2.medea": (
        ["bar", "bazz"], ["foo"], 1,
        lambda o: has_opt_prop(o, "foo", lambda v: is_number(v) or is_array(v))
        and "bar" in o
        and has_prop(o, "bazz", lambda v: is_null(v) or is_bool(v))
        and closed_world(o, {"foo", "bar", "bazz"}),
    ),
    "3-property-additional-allowed-1.medea": (
        ["foo", "bar", "bazz"], [], 3,
        lambda o: has_prop(o, "foo", is_bool)
        and "bar" in o
        and has_prop(o, "bazz", is_string),
    ),
    "3-property-additional-allowed-2.medea": (
        ["bar", "bazz"], ["foo"], 3,
        lambda o: has_opt_prop(o, "foo", is_number)
        and "bar" in o
        and has_prop(o, "bazz", is_null),
    ),
    "map-number-bool.medea": (
        [], [], 3,
        lambda o: additional_pred(o, set(), lambda v: is_number(v) or is_bool(v)),
    ),
    "map-with-1-specified.medea": (
        ["foo"], [], 3,
        lambda o: has_prop(o, "foo", lambda v: is_array(v) or is_object(v))
        and additional_pred(o, {"foo"}, lambda v: is_number(v) or is_bool(v)),
    ),
    "map-with-2-specified.medea": (
        ["foo"], ["bazz"], 3,
        lambda o: has_prop(o, "foo", lambda v: is_array(v) or is_object(v))
        and additional_pred(o, {"foo", "bazz"}, lambda v: is_number(v) or is_bool(v)),
    ),
}


@settings(max_examples=1000, deadline=None)
@given(data=st.data())
def test_objects(data):
    name = data.draw(st.sampled_from(sorted(OBJECT_CASES)))
    required, optional, max_add, pred = OBJECT_CASES[name]
    o = data.draw(obj_gen(required, optional, max_add))
    assert verdict(name, o) == pred(o)


@settings(max_examples=1000, deadline=None)
@given(v=json_value, data=st.data())
def test_objects_reject_non_objects(v, data):
    name = data.draw(st.sampled_from(sorted(OBJECT_CASES)))
    if not is_object(v):
        assert not verdict(name, v)


# --- list schemas (Main.hs:142-186) ------------------------------------------
# (gen_len_range, element predicate, length predicate)

LIST_CASES = {
    "list-1.medea": ((0, 3), lambda v: is_number(v) or is_bool(v) or is_object(v), lambda n: True),
    "list-2.medea": ((0, 3), lambda v: is_number(v) or is_bool(v) or is_object(v), lambda n: True),
    "list-3.medea": ((0, 6), lambda v: True, lambda n: n >= 2),
    "list-4.medea": ((0, 6), lambda v: True, lambda n: n <= 5),
    "list-5.medea": ((0, 6), lambda v: True, lambda n: 3 <= n <= 5),
    "list-6.medea": ((0, 4), lambda v: is_null(v) or is_bool(v) or is_number(v), lambda n: 2 <= n <= 3),
    "list-7.medea": ((0, 4), lambda v: is_null(v) or is_bool(v) or is_number(v), lambda n: 2 <= n <= 3),
}


@settings(max_examples=1000, deadline=None)
@given(data=st.data())
def test_lists(data):
    name = data.draw(st.sampled_from(sorted(LIST_CASES)))
    (lo, hi), elem_pred, len_pred = LIST_CASES[name]
    arr = data.draw(arr_gen(lo, hi))
    expected = len_pred(len(arr)) and all(elem_pred(e) for e in arr)
    assert verdict(name, arr) == expected


# --- tuple schemas (Main.hs:187-200) -----------------------------------------

TUPLE_CASES = {
    "2-tuple.medea": [
        lambda v: is_object(v) or is_null(v),
        lambda v: is_string(v) or is_number(v),
    ],
    "3-tuple.medea": [
        lambda v: is_number(v) or is_array(v),
        is_bool,
        lambda v: True,
    ],
}


@settings(max_examples=1000, deadline=None)
@given(data=st.data())
def test_tuples(data):
    name = data.draw(st.sampled_from(sorted(TUPLE_CASES)))
    preds = TUPLE_CASES[name]
    n = len(preds)
    arr = data.draw(arr_gen(max(0, n - 1), n + 1))
    expected = len(arr) == n and all(p(e) for p, e in zip(preds, arr))
    assert verdict(name, arr) == expected


def test_all_36_schemas_compile():
    files = sorted(VALIDATION.glob("*.medea"))
    assert len(files) == 36
    for f in files:
        graph_for(f.name)
