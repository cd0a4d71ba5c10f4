"""Lexical primitives of the Medea schema language.

Reference parity: src/Data/Medea/Parser/Primitive.hs.

Key rules (SPEC.md:46-85):
* identifier — non-empty, at most 32 *UTF-8 bytes*, no symbols from
  Unicode categories Zs, Zl, Zp or Cc;
* natural    — ASCII digits only, no leading zero (``0`` itself is a
  leading zero per the reference, Primitive.hs:154-160);
* string     — double-quoted, with backslash escapes
  (the reference uses Haskell's charLiteral, Primitive.hs:166-169).
"""

from __future__ import annotations

import unicodedata

from medea_spark.compiler.errors import (
    IdentifierTooLongError,
    LeadingZeroError,
    MedeaParseError,
)

# JSON primitive type tags (reference: src/Data/Medea/JSONType.hs:18-25).
# The integer order mirrors the Haskell constructor (Ord) order — it is
# load-bearing for candidate-set ordering during validation.
JSON_NULL = 0
JSON_BOOLEAN = 1
JSON_NUMBER = 2
JSON_STRING = 3
JSON_ARRAY = 4
JSON_OBJECT = 5

JSON_TYPE_NAMES = ("null", "boolean", "number", "string", "array", "object")

# The 19 reserved identifiers (reference: Primitive.hs:52-121).
RESERVED = frozenset(
    {
        "$schema",
        "$start",
        "$type",
        "$string-values",
        "$properties",
        "$property-name",
        "$property-schema",
        "$additional-properties-allowed",
        "$additional-property-schema",
        "$optional-property",
        "$min-length",
        "$max-length",
        "$element-type",
        "$tuple",
        "$array",
        "$boolean",
        "$null",
        "$number",
        "$object",
        "$string",
    }
)

# Primitive type identifiers (reference: Primitive.hs:136-143).
PRIM_TYPE_IDENTS = {
    "$null": JSON_NULL,
    "$boolean": JSON_BOOLEAN,
    "$object": JSON_OBJECT,
    "$array": JSON_ARRAY,
    "$number": JSON_NUMBER,
    "$string": JSON_STRING,
}

_BANNED_CATEGORIES = ("Zs", "Zl", "Zp", "Cc")


def is_separator_or_control(ch: str) -> bool:
    """True for Unicode categories Zs/Zl/Zp (separators) and Cc (control).

    Reference parity: Primitive.hs:186-187 (Data.Char isSeparator/isControl).
    """
    return unicodedata.category(ch) in _BANNED_CATEGORIES


def is_identifier_text(text: str) -> bool:
    """Whether ``text`` is lexically a Medea identifier (ignoring length)."""
    return bool(text) and not any(is_separator_or_control(c) for c in text)


def check_identifier(text: str, line: int) -> str:
    """Validate an identifier token; returns it or raises.

    Reference parity: Primitive.hs:47-50 (parseIdentifier) and :179-184
    (checkedConstruct — the 32-byte limit measured on the UTF-8 encoding).
    """
    if not is_identifier_text(text):
        raise MedeaParseError(f"invalid identifier {text!r}", line=line)
    if len(text.encode("utf-8")) > 32:
        raise IdentifierTooLongError(f"identifier {text!r} exceeds 32 bytes", line=line)
    return text


def is_reserved(text: str) -> bool:
    """Reference parity: Primitive.hs:145-146."""
    return text in RESERVED


def parse_natural(text: str, line: int) -> int:
    """Parse a Medea natural number.

    Reference parity: Primitive.hs:154-160 — ASCII digits only, and any
    leading zero (including the bare ``0``) is an error.
    """
    if not text or not all("0" <= c <= "9" for c in text):
        raise MedeaParseError(f"expected natural number, got {text!r}", line=line)
    if text[0] == "0":
        raise LeadingZeroError(f"natural number {text!r} has a leading zero", line=line)
    return int(text)


_SIMPLE_ESCAPES = {
    "n": "\n",
    "t": "\t",
    "r": "\r",
    "\\": "\\",
    '"': '"',
    "'": "'",
    "0": "\0",
    "a": "\a",
    "b": "\b",
    "f": "\f",
    "v": "\v",
}


def parse_quoted_string(text: str, line: int) -> tuple[str, str]:
    """Parse a double-quoted Medea string at the start of ``text``.

    Returns ``(value, rest_of_line)``.  Escape handling mirrors the
    spirit of Haskell ``charLiteral`` for the common escapes
    (reference: Primitive.hs:166-169); the conformance corpus uses
    plain strings only.
    """
    if not text or text[0] != '"':
        raise MedeaParseError(f"expected opening quote at {text!r}", line=line)
    out: list[str] = []
    i = 1
    n = len(text)
    while i < n:
        c = text[i]
        if c == '"':
            return "".join(out), text[i + 1 :]
        if c == "\\" and i + 1 < n:
            nxt = text[i + 1]
            if nxt in _SIMPLE_ESCAPES:
                out.append(_SIMPLE_ESCAPES[nxt])
                i += 2
                continue
        out.append(c)
        i += 1
    raise MedeaParseError("unterminated string literal", line=line)
