"""Replay of the reference parser conformance corpus.

Mirrors /root/reference/test/parser/Main.hs:8-27: every file under
``conformance/parser/fail`` must raise a parse-class error (NotUtf8 or
ParsingFailed — TestM.hs:13-16); every file under
``conformance/parser/pass`` must parse (analysis errors are allowed —
the parser suite checks syntax only).
"""

from __future__ import annotations

import pytest

from medea_spark.compiler import MedeaParseError, parse_schema_text
from medea_spark.compiler.errors import NotUtf8Error

from tests.conftest import conformance_files

FAIL_FILES = conformance_files("parser/fail")
PASS_FILES = conformance_files("parser/pass")


def test_corpus_present():
    assert len(FAIL_FILES) == 19
    assert len(PASS_FILES) == 23


@pytest.mark.parametrize("path", FAIL_FILES, ids=lambda p: p.name)
def test_parser_fail(path):
    with pytest.raises(MedeaParseError):
        parse_schema_text(path.read_bytes())


@pytest.mark.parametrize("path", PASS_FILES, ids=lambda p: p.name)
def test_parser_pass(path):
    specs = parse_schema_text(path.read_bytes())
    assert specs, "expected at least one schema"


def test_not_utf8_is_distinct():
    with pytest.raises(NotUtf8Error):
        parse_schema_text(b"\xff\xfe\x00b")
