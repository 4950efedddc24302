"""Group-query DSL: parser + in-memory filter evaluation.

Grammar (reference: internal/core/query_parser.go:11-29):

    Query     := Expr
    Expr      := AndChain ( "OR" AndChain )*
    AndChain  := Condition ( "AND" Condition )*
    Condition := "NOT"? ( Filter | "(" Expr ")" )
    Filter    := "COUNT" "(" ident ")" ("<"|">"|"=") int
               | ident ("CONTAINS"|"<"|">"|"=") quoted-string

Normative semantics are the in-memory filter tree evaluated during inference
(internal/core/filters.go:14-113), NOT the SQL search backend:
  COUNT(l) < v  ->  count in (-1, v) exclusive  (min=-1, max=v)
  COUNT(l) > v  ->  count in (v, +inf) exclusive
  COUNT(l) = v  ->  count in (v-1, v+1) exclusive
  l CONTAINS s  ->  exists entity with case-SENSITIVE substring s
  l = / < / > s ->  exists entity with byte-wise string compare
(query_parser.go:281-292, filters.go:48-113).

The AST nodes double as the input for the Spark compiler in
ner_backend_spark/spark/query_compile.py.
"""

from __future__ import annotations

import re
import sys
from dataclasses import dataclass

from .entity import Entity

LabelToEntities = dict[str, list[Entity]]

MAX_INT = sys.maxsize


class QueryParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST / filter nodes


@dataclass(frozen=True)
class AndFilter:
    filters: tuple

    def matches(self, entities: LabelToEntities) -> bool:
        return all(f.matches(entities) for f in self.filters)


@dataclass(frozen=True)
class OrFilter:
    filters: tuple

    def matches(self, entities: LabelToEntities) -> bool:
        return any(f.matches(entities) for f in self.filters)


@dataclass(frozen=True)
class NotFilter:
    filter: object

    def matches(self, entities: LabelToEntities) -> bool:
        return not self.filter.matches(entities)


@dataclass(frozen=True)
class CountFilter:
    label: str
    min: int  # exclusive
    max: int  # exclusive

    def matches(self, entities: LabelToEntities) -> bool:
        count = len(entities.get(self.label, ()))
        return self.min < count < self.max


@dataclass(frozen=True)
class SubstringFilter:
    label: str
    substr: str

    def matches(self, entities: LabelToEntities) -> bool:
        return any(self.substr in e.text for e in entities.get(self.label, ()))


@dataclass(frozen=True)
class StringEqFilter:
    label: str
    value: str

    def matches(self, entities: LabelToEntities) -> bool:
        return any(e.text == self.value for e in entities.get(self.label, ()))


@dataclass(frozen=True)
class StringLtFilter:
    label: str
    value: str

    def matches(self, entities: LabelToEntities) -> bool:
        return any(e.text < self.value for e in entities.get(self.label, ()))


@dataclass(frozen=True)
class StringGtFilter:
    label: str
    value: str

    def matches(self, entities: LabelToEntities) -> bool:
        return any(e.text > self.value for e in entities.get(self.label, ()))


# ---------------------------------------------------------------------------
# Tokenizer + recursive-descent parser

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<op><|>|=) |
        (?P<string>"(?:\\.|[^"\\])*") |
        (?P<int>\d+) |
        (?P<ident>\w+)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "COUNT", "CONTAINS"}


def _tokenize(query: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(query):
        m = _TOKEN_RE.match(query, pos)
        if m is None:
            if query[pos:].strip() == "":
                break
            raise QueryParseError(
                f"error parsing query '{query}': unexpected character at {pos}"
            )
        pos = m.end()
        kind = m.lastgroup
        value = m.group(kind)
        if kind == "ident" and value in _KEYWORDS:
            kind = value
        tokens.append((kind, value))
    return tokens


_ESCAPE_RE = re.compile(
    r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|x[0-9a-fA-F]{2}|[0-7]{3}|.)"
)
# NOTE: no "'" entry — Go strconv.Unquote rejects \' inside a double-quoted
# string ('unknown escape'), and the reference parser surfaces that error
_SIMPLE_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "a": "\a", "b": "\b",
    "f": "\f", "v": "\v", "\\": "\\", '"': '"',
}


def _unquote(s: str) -> str:
    """participle.Unquote ≙ Go strconv.Unquote: resolve standard escapes.

    Byte semantics, not code-point semantics (round-4 advice): in a Go
    double-quoted string, ``\\xNN`` and ``\\NNN`` (octal) escapes contribute
    RAW BYTES — ``"\\xc3\\xbc"`` is the two UTF-8 bytes of 'ü', not the two
    code points U+00C3 U+00BC. So escapes are decoded into a byte buffer
    (literal text and \\u/\\U escapes contribute their UTF-8 encoding, byte
    escapes a single byte) and the assembled buffer is UTF-8-decoded once.
    Byte escapes that don't form valid UTF-8 are preserved via
    surrogateescape — like Go's byte-wise comparison, they can never equal
    any real (valid-UTF-8) document text. Like strconv.Unquote, an UNKNOWN
    escape is an error (octal must be exactly 3 digits and <= \\377, \\u may
    not encode a surrogate half, \\' is rejected in double quotes) — a
    silent guess would make the filter match a different byte string than
    the reference with no signal.
    """
    out = bytearray()
    body = s[1:-1]
    pos = 0
    for m in _ESCAPE_RE.finditer(body):
        out += body[pos : m.start()].encode("utf-8")
        pos = m.end()
        g = m.group(1)
        if len(g) > 1 and g[0] in "uU":
            cp = int(g[1:], 16)
            if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
                raise QueryParseError(
                    f"invalid escape sequence \\{g} in {s!r}"
                )
            out += chr(cp).encode("utf-8")
        elif len(g) > 1 and g[0] == "x":
            out.append(int(g[1:], 16))
        elif len(g) == 3 and all(c in "01234567" for c in g):
            v = int(g, 8)
            if v > 0xFF:
                raise QueryParseError(
                    f"invalid escape sequence \\{g} in {s!r}"
                )
            out.append(v)
        elif g in _SIMPLE_ESCAPES:
            out += _SIMPLE_ESCAPES[g].encode("utf-8")
        else:
            raise QueryParseError(f"invalid escape sequence \\{g} in {s!r}")
    out += body[pos:].encode("utf-8")
    return out.decode("utf-8", "surrogateescape")


class _Parser:
    def __init__(self, query: str):
        self.query = query
        self.tokens = _tokenize(query)
        self.pos = 0

    def _peek(self) -> tuple[str, str] | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def _next(self) -> tuple[str, str]:
        tok = self._peek()
        if tok is None:
            raise QueryParseError(
                f"error parsing query '{self.query}': unexpected end of input"
            )
        self.pos += 1
        return tok

    def _expect(self, kind: str) -> str:
        tok = self._next()
        if tok[0] != kind:
            raise QueryParseError(
                f"error parsing query '{self.query}': expected {kind}, got {tok[1]!r}"
            )
        return tok[1]

    def parse(self):
        expr = self.parse_expr()
        if self._peek() is not None:
            raise QueryParseError(
                f"error parsing query '{self.query}': trailing input "
                f"{self._peek()[1]!r}"
            )
        return expr

    def parse_expr(self):
        terms = [self.parse_and_chain()]
        while self._peek() is not None and self._peek()[0] == "OR":
            self._next()
            terms.append(self.parse_and_chain())
        return terms[0] if len(terms) == 1 else OrFilter(tuple(terms))

    def parse_and_chain(self):
        terms = [self.parse_condition()]
        while self._peek() is not None and self._peek()[0] == "AND":
            self._next()
            terms.append(self.parse_condition())
        return terms[0] if len(terms) == 1 else AndFilter(tuple(terms))

    def parse_condition(self):
        negate = False
        if self._peek() is not None and self._peek()[0] == "NOT":
            self._next()
            negate = True
        tok = self._peek()
        if tok is None:
            raise QueryParseError(
                f"error parsing query '{self.query}': unexpected end of input"
            )
        if tok[0] == "lparen":
            self._next()
            inner = self.parse_expr()
            self._expect("rparen")
            node = inner
        else:
            node = self.parse_filter()
        return NotFilter(node) if negate else node

    def parse_filter(self):
        tok = self._next()
        if tok[0] == "COUNT":
            self._expect("lparen")
            label = self._expect("ident")
            self._expect("rparen")
            op = self._expect("op")
            value = int(self._expect("int"))
            # query_parser.go:281-292
            if op == "<":
                return CountFilter(label, -1, value)
            if op == ">":
                return CountFilter(label, value, MAX_INT)
            return CountFilter(label, value - 1, value + 1)
        if tok[0] == "ident":
            label = tok[1]
            op_tok = self._next()
            if op_tok[0] == "CONTAINS":
                op = "CONTAINS"
            elif op_tok[0] == "op":
                op = op_tok[1]
            else:
                raise QueryParseError(
                    f"error parsing query '{self.query}': expected operator, "
                    f"got {op_tok[1]!r}"
                )
            value = _unquote(self._expect("string"))
            # query_parser.go:320-332
            if op == "CONTAINS":
                return SubstringFilter(label, value)
            if op == "<":
                return StringLtFilter(label, value)
            if op == ">":
                return StringGtFilter(label, value)
            return StringEqFilter(label, value)
        raise QueryParseError(
            f"error parsing query '{self.query}': expected filter, got {tok[1]!r}"
        )


def parse_query(query: str):
    """Parse a group query into a Filter tree (core.ParseQuery equivalent)."""
    return _Parser(query).parse()
