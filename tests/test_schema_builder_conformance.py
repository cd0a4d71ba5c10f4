"""Replay of the reference schema-builder conformance corpus.

Mirrors /root/reference/test/schema-builder/Main.hs:16-36: files under
``conformance/schema-builder/fail`` must parse but raise an analysis
error (TestM.hs:18-34); files under ``pass`` must fully build (schemas
referenced only via list/tuple/property/additional-property are not
"isolated").  We additionally pin the *specific* error class per file.
"""

from __future__ import annotations

import pytest

from medea_spark.compiler import (
    MedeaAnalysisError,
    compile_schema_text,
    compile_schemata,
    parse_schema_text,
)

from tests.conftest import conformance_files

FAIL_FILES = conformance_files("schema-builder/fail")
PASS_FILES = conformance_files("schema-builder/pass")

# Expected analysis error code per fail fixture (derived from the cited
# reference checks; see medea_spark/compiler/errors.py for the mapping
# to the reference's AnalysisError constructors).
EXPECTED_CODES = {
    "duplicate-prop.medea": "DUPLICATE_PROP_NAME",
    "duplicate-schemata.medea": "DUPLICATE_SCHEMA_NAME",
    "indirect-self-typing.medea": "TYPE_RELATION_IS_CYCLIC",
    "isolated-schemata.medea": "DEFINED_BUT_NOT_USED",
    "list-spec-without-array-1.medea": "LIST_WITHOUT_ARRAY",
    "list-spec-without-array-2.medea": "LIST_WITHOUT_ARRAY",
    "list-spec-without-array-3.medea": "LIST_WITHOUT_ARRAY",
    "list-spec-without-array-4.medea": "LIST_WITHOUT_ARRAY",
    "missing-additional-prop-schema.medea": "DANGLING_TYPE_REF_PROP",
    "missing-list-schema.medea": "DANGLING_TYPE_REF_TUPLE",
    "missing-prop-schema.medea": "DANGLING_TYPE_REF_PROP",
    "missing-schema.medea": "DANGLING_TYPE_REFERENCE",
    "missing-tuple-schema.medea": "DANGLING_TYPE_REF_TUPLE",
    "no-start-schema.medea": "NO_START_SCHEMA",
    "property-spec-without-object-1.medea": "PROPERTY_WITHOUT_OBJECT",
    "property-spec-without-object-2.medea": "PROPERTY_WITHOUT_OBJECT",
    "property-spec-without-object-3.medea": "PROPERTY_WITHOUT_OBJECT",
    "property-spec-without-object-4.medea": "PROPERTY_WITHOUT_OBJECT",
    "reserved-redefined.medea": "RESERVED_DEFINED",
    "self-typing.medea": "TYPE_RELATION_IS_CYCLIC",
    "stringVals-without-string.medea": "STRING_VALS_WITHOUT_STRING",
    "tuple-spec-without-array.medea": "TUPLE_WITHOUT_ARRAY",
    "type-length.medea": "MIN_MORE_THAN_MAX",
}


def test_corpus_present():
    assert len(FAIL_FILES) == 23
    assert len(PASS_FILES) == 4


@pytest.mark.parametrize("path", FAIL_FILES, ids=lambda p: p.name)
def test_schema_builder_fail(path):
    specs = parse_schema_text(path.read_bytes())  # must parse cleanly
    with pytest.raises(MedeaAnalysisError) as exc_info:
        compile_schemata(specs)
    expected = EXPECTED_CODES[path.name]
    assert exc_info.value.code == expected, (
        f"{path.name}: expected {expected}, got {exc_info.value.code}"
    )


@pytest.mark.parametrize("path", PASS_FILES, ids=lambda p: p.name)
def test_schema_builder_pass(path):
    graph = compile_schema_text(path.read_bytes())
    assert "$start" in graph
