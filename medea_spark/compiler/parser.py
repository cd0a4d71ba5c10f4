"""Line-oriented parser for Medea schema graph files.

Reference parity: src/Data/Medea/Parser/Spec/*.hs.  This is a fresh,
line-cursor recursive-descent design (the reference uses megaparsec
permutation parsers); observable accept/reject behaviour matches the
reference's conformance corpus:

* a file is one or more schema blocks separated by exactly one blank
  line, ending at EOF (Spec/Schemata.hs:18-22);
* a schema block is a ``$schema <name>`` header line at indent 0
  followed by at most one each of the four specification blocks, in
  any order (Spec/Schema.hs:37-45 uses a permutation parser — order
  insensitivity is the observable semantics);
* indentation is exact: 4 spaces for block headers, 8 for their lines
  (Primitive.hs:171-173 parseLine);
* the array sub-blocks (``$min-length`` / ``$max-length`` /
  ``$element-type`` / ``$tuple``) form a single contiguous group, with
  the three conflict checks of Spec/Array.hs:44-55.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from medea_spark.compiler.errors import (
    ConflictingSpecRequirementsError,
    EmptyArrayElementsError,
    EmptyLengthArraySpecError,
    EmptyStringValuesSpecError,
    MedeaParseError,
    NotUtf8Error,
)
from medea_spark.compiler.tokens import (
    check_identifier,
    parse_natural,
    parse_quoted_string,
)

# --------------------------------------------------------------------------
# AST (reference parity: Parser/Spec/{Schema,Type,String,Array,Object,
# Property}.hs record types)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class PropertySpec:
    """One object property section (reference: Spec/Property.hs:24-29)."""

    name: str
    schema: str | None
    optional: bool


@dataclass(frozen=True)
class ObjectSpec:
    """Reference: Spec/Object.hs:33-38."""

    properties: tuple[PropertySpec, ...]
    additional_allowed: bool
    additional_schema: str | None


@dataclass(frozen=True)
class ArraySpec:
    """Reference: Spec/Array.hs:26-32.  ``tuple_spec`` of ``None`` means
    "no tuple spec"; an empty tuple means the 0-length tuple (unit)."""

    min_length: int | None = None
    max_length: int | None = None
    element_type: str | None = None
    tuple_spec: tuple[str, ...] | None = None

    @property
    def is_empty(self) -> bool:
        return (
            self.min_length is None
            and self.max_length is None
            and self.element_type is None
            and self.tuple_spec is None
        )


@dataclass(frozen=True)
class SchemaSpec:
    """One parsed schema block (reference: Spec/Schema.hs:28-35)."""

    name: str
    types: tuple[str, ...] = ()
    string_vals: tuple[str, ...] = ()
    array: ArraySpec = field(default_factory=ArraySpec)
    object: ObjectSpec | None = None
    line: int = 0


# --------------------------------------------------------------------------
# Cursor
# --------------------------------------------------------------------------

_ARRAY_KEYS = ("$min-length", "$max-length", "$element-type", "$tuple")


class _Cursor:
    """A cursor over physical lines; every consumed line was newline-terminated."""

    def __init__(self, lines: list[str]) -> None:
        self._lines = lines
        self.pos = 0

    @property
    def lineno(self) -> int:
        return self.pos + 1

    def peek(self) -> str | None:
        if self.pos < len(self._lines):
            return self._lines[self.pos]
        return None

    def advance(self) -> str:
        line = self._lines[self.pos]
        self.pos += 1
        return line

    def at_eof(self) -> bool:
        return self.pos >= len(self._lines)


def _split_lines(text: str) -> list[str]:
    """Split into newline-terminated lines; reject an unterminated tail.

    The reference's parseLine requires an ``eol`` after every line
    (Primitive.hs:171-173), so a file whose last line lacks a newline
    cannot parse.  ``\\r\\n`` and ``\\n`` both terminate a line.
    """
    if text == "":
        raise MedeaParseError("empty schema file", line=1)
    raw = text.split("\n")
    if raw[-1] != "":
        raise MedeaParseError("file does not end with a newline", line=len(raw))
    raw.pop()
    return [ln[:-1] if ln.endswith("\r") else ln for ln in raw]


# --------------------------------------------------------------------------
# Line helpers — exact indentation and single-space token separation
# --------------------------------------------------------------------------


def _dedent(line: str, spaces: int, lineno: int) -> str:
    """Strip exactly ``spaces`` leading spaces; the payload must not start
    with another space (identifiers cannot contain separators)."""
    prefix = " " * spaces
    if not line.startswith(prefix):
        raise MedeaParseError(
            f"expected {spaces}-space indentation", line=lineno
        )
    body = line[len(prefix) :]
    if not body or body.startswith(" "):
        raise MedeaParseError(
            f"expected content after {spaces}-space indentation", line=lineno
        )
    return body


def _expect_key_only(body: str, key: str, lineno: int) -> None:
    if body != key:
        raise MedeaParseError(f"expected {key!r} alone on line, got {body!r}", line=lineno)


def _split_key_val(body: str, key: str, lineno: int) -> str:
    """``<key><one space><value>`` with a non-empty, separator-free value."""
    if not body.startswith(key + " "):
        raise MedeaParseError(f"expected {key!r} followed by a value", line=lineno)
    return body[len(key) + 1 :]


def _leading_word(body: str) -> str:
    return body.split(" ", 1)[0]


# --------------------------------------------------------------------------
# Block parsers
# --------------------------------------------------------------------------


def _parse_type_block(cur: _Cursor) -> tuple[str, ...]:
    """``$type`` + one or more 8-indent identifier lines
    (reference: Spec/Type.hs:30-34)."""
    lineno = cur.lineno
    _expect_key_only(_dedent(cur.advance(), 4, lineno), "$type", lineno)
    idents: list[str] = []
    while (line := cur.peek()) is not None and _is_sub_ident_line(line):
        idents.append(check_identifier(line[8:], cur.lineno))
        cur.advance()
    if not idents:
        raise MedeaParseError("$type requires at least one type line", line=cur.lineno)
    return tuple(idents)


def _is_sub_ident_line(line: str) -> bool:
    """8 spaces then an identifier-shaped token (no further separators)."""
    return (
        line.startswith("        ")
        and len(line) > 8
        and line[8] != " "
        and " " not in line[8:]
    )


def _parse_string_vals_block(cur: _Cursor) -> tuple[str, ...]:
    """``$string-values`` + one or more 8-indent quoted strings
    (reference: Spec/String.hs:37-43)."""
    lineno = cur.lineno
    _expect_key_only(_dedent(cur.advance(), 4, lineno), "$string-values", lineno)
    vals: list[str] = []
    while (line := cur.peek()) is not None and line.startswith('        "'):
        value, rest = parse_quoted_string(line[8:], cur.lineno)
        if rest:
            raise MedeaParseError(
                f"unexpected content after string literal: {rest!r}", line=cur.lineno
            )
        vals.append(value)
        cur.advance()
    if not vals:
        raise EmptyStringValuesSpecError(
            "$string-values requires at least one string", line=cur.lineno
        )
    return tuple(vals)


def _parse_array_group(cur: _Cursor) -> ArraySpec:
    """A maximal contiguous run of array sub-blocks, each at most once,
    in any order; then the three conflict checks
    (reference: Spec/Array.hs:40-84)."""
    start_line = cur.lineno
    min_len: int | None = None
    max_len: int | None = None
    element_type: str | None = None
    tuple_spec: tuple[str, ...] | None = None
    while (line := cur.peek()) is not None and line.startswith("    "):
        body = line[4:]
        word = _leading_word(body)
        if word == "$min-length" and min_len is None:
            lineno = cur.lineno
            min_len = parse_natural(
                _split_key_val(_dedent(cur.advance(), 4, lineno), "$min-length", lineno),
                lineno,
            )
        elif word == "$max-length" and max_len is None:
            lineno = cur.lineno
            max_len = parse_natural(
                _split_key_val(_dedent(cur.advance(), 4, lineno), "$max-length", lineno),
                lineno,
            )
        elif body == "$element-type" and element_type is None:
            cur.advance()
            nxt = cur.peek()
            if nxt is None or not _is_sub_ident_line(nxt):
                raise EmptyArrayElementsError(
                    "$element-type requires an element line", line=cur.lineno
                )
            element_type = check_identifier(nxt[8:], cur.lineno)
            cur.advance()
        elif body == "$tuple" and tuple_spec is None:
            cur.advance()
            positions: list[str] = []
            while (nxt := cur.peek()) is not None and _is_sub_ident_line(nxt):
                positions.append(check_identifier(nxt[8:], cur.lineno))
                cur.advance()
            tuple_spec = tuple(positions)
        else:
            break
    spec = ArraySpec(min_len, max_len, element_type, tuple_spec)
    if spec.is_empty:
        raise EmptyLengthArraySpecError("empty array specification", line=start_line)
    if element_type is not None and tuple_spec is not None:
        raise ConflictingSpecRequirementsError(
            "$element-type conflicts with $tuple", line=start_line
        )
    if (min_len is not None or max_len is not None) and tuple_spec is not None:
        raise ConflictingSpecRequirementsError(
            "length bounds conflict with $tuple", line=start_line
        )
    return spec


def _parse_object_block(cur: _Cursor) -> ObjectSpec:
    """``$properties`` + property sections + optional additional lines
    (reference: Spec/Object.hs:40-61, Spec/Property.hs:31-46)."""
    lineno = cur.lineno
    _expect_key_only(_dedent(cur.advance(), 4, lineno), "$properties", lineno)
    props: list[PropertySpec] = []
    while (line := cur.peek()) is not None and line.startswith("        $property-name "):
        pn_line = cur.lineno
        body = _dedent(cur.advance(), 8, pn_line)
        raw = _split_key_val(body, "$property-name", pn_line)
        name, rest = parse_quoted_string(raw, pn_line)
        if rest:
            raise MedeaParseError(
                f"unexpected content after property name: {rest!r}", line=pn_line
            )
        schema: str | None = None
        nxt = cur.peek()
        if nxt is not None and nxt.startswith("        $property-schema "):
            ps_line = cur.lineno
            schema = check_identifier(
                _split_key_val(_dedent(cur.advance(), 8, ps_line), "$property-schema", ps_line),
                ps_line,
            )
            nxt = cur.peek()
        optional = False
        if nxt is not None and nxt == "        $optional-property":
            cur.advance()
            optional = True
        props.append(PropertySpec(name, schema, optional))
    additional_allowed = False
    if cur.peek() == "        $additional-properties-allowed":
        cur.advance()
        additional_allowed = True
    additional_schema: str | None = None
    nxt = cur.peek()
    if nxt is not None and nxt.startswith("        $additional-property-schema "):
        as_line = cur.lineno
        additional_schema = check_identifier(
            _split_key_val(
                _dedent(cur.advance(), 8, as_line), "$additional-property-schema", as_line
            ),
            as_line,
        )
    if additional_schema is not None and not additional_allowed:
        # Reference: Spec/Object.hs:46-47 — schema without the allowed flag.
        raise ConflictingSpecRequirementsError(
            "$additional-property-schema without $additional-properties-allowed",
            line=lineno,
        )
    return ObjectSpec(tuple(props), additional_allowed, additional_schema)


# --------------------------------------------------------------------------
# Schema / schemata
# --------------------------------------------------------------------------


def _parse_schema(cur: _Cursor) -> SchemaSpec:
    header_line = cur.lineno
    line = cur.peek()
    if line is None:
        raise MedeaParseError("expected a schema header", line=header_line)
    if not line.startswith("$schema "):
        raise MedeaParseError(
            f"expected '$schema <name>' at column 0, got {line!r}", line=header_line
        )
    cur.advance()
    name = check_identifier(_split_key_val(line, "$schema", header_line), header_line)

    types: tuple[str, ...] | None = None
    string_vals: tuple[str, ...] | None = None
    array: ArraySpec | None = None
    obj: ObjectSpec | None = None

    # Order-insensitive block set, each at most once (permutation semantics
    # of Spec/Schema.hs:37-45).
    while (line := cur.peek()) is not None and line != "":
        if not line.startswith("    ") or len(line) <= 4 or line[4] == " ":
            raise MedeaParseError(
                f"expected a 4-space-indented specification block, got {line!r}",
                line=cur.lineno,
            )
        body = line[4:]
        word = _leading_word(body)
        if body == "$type" and types is None:
            types = _parse_type_block(cur)
        elif body == "$string-values" and string_vals is None:
            string_vals = _parse_string_vals_block(cur)
        elif (word in _ARRAY_KEYS) and array is None:
            array = _parse_array_group(cur)
        elif body == "$properties" and obj is None:
            obj = _parse_object_block(cur)
        else:
            raise MedeaParseError(
                f"unexpected line in schema {name!r}: {line!r}", line=cur.lineno
            )
    return SchemaSpec(
        name=name,
        types=types or (),
        string_vals=string_vals or (),
        array=array or ArraySpec(),
        object=obj,
        line=header_line,
    )


def parse_schema_text(source: str | bytes) -> list[SchemaSpec]:
    """Parse a Medea schema graph file into a list of schema specs.

    Raises :class:`MedeaParseError` subclasses on any syntactic problem
    (reference: Loader.hs buildSchema stages 1-2).
    """
    if isinstance(source, (bytes, bytearray)):
        try:
            source = bytes(source).decode("utf-8")
        except UnicodeDecodeError as exc:
            raise NotUtf8Error("schema file is not valid UTF-8") from exc
    cur = _Cursor(_split_lines(source))
    schemas = [_parse_schema(cur)]
    # Exactly one blank separator line between schema blocks
    # (Schemata.hs:18-22 sepBy1 eol); a trailing blank line cannot parse.
    while not cur.at_eof():
        sep_line = cur.lineno
        if cur.advance() != "":
            raise MedeaParseError(
                "expected a blank line between schemata", line=sep_line
            )
        schemas.append(_parse_schema(cur))
    return schemas
