"""Schema-level fuzzing: random Medea schema graphs × random documents.

Two invariants beyond the fixture corpus:

1. compile+validate never crash on any generated (schema, document)
   pair — verdicts are always booleans with well-formed violations;
2. the dev-mode annotator agrees with the validator: a document
   annotates iff it validates (they implement the same alternation
   independently).
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from medea_spark.compiler import compile_schema_text
from medea_spark.kernel import validate_document
from medea_spark.kernel.annotate import annotate_value

PRIMS = ["$null", "$boolean", "$number", "$string", "$array", "$object"]


@st.composite
def schema_graph_text(draw) -> str:
    """A random, always-compilable schema graph: $start plus up to 3
    helper schemas, with type sums, enums, list/tuple specs, and
    property maps wired so every analysis gate passes."""
    n_helpers = draw(st.integers(0, 3))
    helper_names = [f"helper{i}" for i in range(n_helpers)]

    def render(name: str, referables: list[str]) -> str:
        lines = [f"$schema {name}"]
        choice = draw(st.sampled_from(["bare", "sum", "string", "list", "tuple", "object"]))
        if choice == "bare":
            if draw(st.booleans()) and referables:
                lines.append("    $type")
                for t in draw(
                    st.lists(st.sampled_from(PRIMS + referables), min_size=1, max_size=3, unique=True)
                ):
                    lines.append(f"        {t}")
        elif choice == "sum":
            lines.append("    $type")
            for t in draw(
                st.lists(st.sampled_from(PRIMS + referables), min_size=1, max_size=4, unique=True)
            ):
                lines.append(f"        {t}")
        elif choice == "string":
            lines.append("    $type")
            lines.append("        $string")
            lines.append("    $string-values")
            for v in draw(st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=3)):
                lines.append(f'        "{v}"')
        elif choice == "list":
            lines.append("    $type")
            lines.append("        $array")
            if draw(st.booleans()):
                lines.append("    $element-type")
                lines.append(f"        {draw(st.sampled_from(PRIMS + referables))}")
                if draw(st.booleans()):
                    lines.append(f"    $max-length {draw(st.integers(1, 4))}")
            else:
                lo = draw(st.integers(1, 2))
                lines.append(f"    $min-length {lo}")
                lines.append(f"    $max-length {lo + draw(st.integers(0, 3))}")
        elif choice == "tuple":
            lines.append("    $type")
            lines.append("        $array")
            lines.append("    $tuple")
            for t in draw(st.lists(st.sampled_from(PRIMS + referables), max_size=3)):
                lines.append(f"        {t}")
        else:  # object
            lines.append("    $type")
            lines.append("        $object")
            lines.append("    $properties")
            for i in range(draw(st.integers(0, 3))):
                lines.append(f'        $property-name "p{i}"')
                if draw(st.booleans()):
                    lines.append(
                        f"        $property-schema {draw(st.sampled_from(PRIMS + referables))}"
                    )
                if draw(st.booleans()):
                    lines.append("        $optional-property")
            if draw(st.booleans()):
                lines.append("        $additional-properties-allowed")
                if draw(st.booleans()):
                    lines.append(
                        f"        $additional-property-schema {draw(st.sampled_from(PRIMS + referables))}"
                    )
        return "\n".join(lines) + "\n"

    # Helpers may only reference later helpers (keeps the type graph
    # acyclic by construction); $start may reference all of them.
    blocks = []
    for i, name in enumerate(helper_names):
        blocks.append(render(name, helper_names[i + 1 :]))
    blocks.append(render("$start", helper_names))
    # Reference every helper from $start's perspective is not guaranteed;
    # weave unused helpers into a sum type on $start to pass the
    # isolation check.
    text = "\n".join(blocks)
    unused = [h for h in helper_names if f" {h}\n" not in text.split("$schema $start")[-1]
              and f"schema {h}" in text]
    referenced = set()
    for h in helper_names:
        rest = text.replace(f"$schema {h}\n", "")
        if f"        {h}\n" in rest or f"$property-schema {h}" in rest or f"$additional-property-schema {h}" in rest:
            referenced.add(h)
    leftovers = [h for h in helper_names if h not in referenced]
    if leftovers:
        start_block = blocks[-1]
        if "\n    $type\n" not in start_block:
            start_block = start_block.rstrip("\n") + "\n    $type\n        $object\n"
            # appending $object may conflict with specs; safest: rebuild
            # $start as a pure sum over everything
            start_block = "$schema $start\n    $type\n" + "".join(
                f"        {t}\n" for t in (["$null"] + helper_names)
            )
        else:
            head, tail = start_block.split("\n    $type\n", 1)
            type_lines, *rest = tail.split("\n    $", 1)
            for h in leftovers:
                type_lines += f"\n        {h}"
            start_block = head + "\n    $type\n" + type_lines
            if rest:
                start_block += "\n    $" + rest[0]
        blocks[-1] = start_block
        text = "\n".join(blocks)
    return text


json_value = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(-100, 100)
    | st.floats(allow_nan=False, allow_infinity=False, width=32)
    | st.sampled_from(["a", "b", "c", "dd", "x"])
    | st.dictionaries(st.sampled_from(["p0", "p1", "p2", "q"]), st.none(), max_size=0),
    lambda ch: st.lists(ch, max_size=3)
    | st.dictionaries(st.sampled_from(["p0", "p1", "p2", "q"]), ch, max_size=3),
    max_leaves=8,
)


@settings(max_examples=1000, deadline=None)
@given(text=schema_graph_text(), value=json_value)
def test_fuzz_compile_validate_annotate(text, value):
    from medea_spark.compiler import MedeaError

    try:
        graph = compile_schema_text(text)
    except MedeaError:
        # Generator aims for compilable graphs but the weave step can
        # still produce rejects; rejection with a typed error is fine.
        return
    ok, violations = validate_document(graph, json.dumps(value))
    assert isinstance(ok, bool)
    if ok:
        assert violations == []
    else:
        assert violations
        for ptr, code, schema in violations:
            assert isinstance(ptr, str) and isinstance(code, str) and isinstance(schema, str)
            assert code.isupper()
    ann = annotate_value(graph, value)
    assert (ann is not None) == ok, f"validator/annotator disagree on {value!r}\n{text}"
