"""Parser for the femformal ``cspec`` dialect emitted by the coder LLM.

Generated programs (reference example bank,
``utils/few_shot_prompts/examples/one_d_heat/examples.jsonl``) define
atomic-proposition regions

    apc0 = logic.APCont([5, 97], ">", lambda x: 0.0771 * x + 326.154, ...)
    cregions = {"A": apc0}

and a spec string over region names

    cspec = "((F_[1.8288, 4.6769] (A)))"
    cspec = "((F_[a, b] (A)) & (G_[c, d] (B)))"

This module parses the spec string + region table into the typed `Formula`
AST.  Grammar:

    spec   ::= term (('&' | '|') term)*
    term   ::= '(' spec ')' | temporal
    temporal ::= ('G'|'F') '_[' num ',' num ']' '(' NAME ')'

Junctions at the same bracket level left-fold, matching femformal's binary
spec tree.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Tuple

from pdec.stl.ast import Clause, Formula


class CSpecParseError(ValueError):
    pass


@dataclass(frozen=True)
class APCont:
    """An atomic-proposition region: forall x in [x0,x1]: u(x) ~ m*x + b.

    Mirrors femformal's ``logic.APCont(interval, op, mu, dmu)``.
    """

    x0: float
    x1: float
    cmp: str  # '<' | '>' | '='
    m: float
    b: float


_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<temporal>[GF])_\[\s*(?P<t0>[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?)\s*,"
    r"\s*(?P<t1>[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?)\s*\]"
    r"|(?P<lparen>\()"
    r"|(?P<rparen>\))"
    r"|(?P<junction>[&|])"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9]*)"
    r")"
)


def _tokenize(spec: str) -> List[Tuple[str, object]]:
    tokens: List[Tuple[str, object]] = []
    pos = 0
    while pos < len(spec):
        if spec[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(spec, pos)
        if not m:
            raise CSpecParseError(f"bad token at {spec[pos:pos+20]!r}")
        if m.group("temporal"):
            tokens.append(
                ("temporal", (m.group("temporal"), float(m.group("t0")), float(m.group("t1"))))
            )
        elif m.group("lparen"):
            tokens.append(("lparen", "("))
        elif m.group("rparen"):
            tokens.append(("rparen", ")"))
        elif m.group("junction"):
            tokens.append(("junction", "and" if m.group("junction") == "&" else "or"))
        elif m.group("name"):
            tokens.append(("name", m.group("name")))
        pos = m.end()
    return tokens


class _Parser:
    def __init__(self, tokens: List[Tuple[str, object]], regions: Dict[str, APCont]):
        self.tokens = tokens
        self.pos = 0
        self.regions = regions

    def peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else ("eof", None)

    def next(self):
        tok = self.peek()
        self.pos += 1
        return tok

    def expect(self, kind):
        tok = self.next()
        if tok[0] != kind:
            raise CSpecParseError(f"expected {kind}, got {tok}")
        return tok

    def parse_spec(self) -> Formula:
        result = self.parse_term()
        while self.peek()[0] == "junction":
            _, op = self.next()
            rhs = self.parse_term()
            result = (op, result, rhs)
        return result

    def parse_term(self) -> Formula:
        kind, val = self.peek()
        if kind == "lparen":
            self.next()
            inner = self.parse_spec()
            self.expect("rparen")
            return inner
        if kind == "temporal":
            self.next()
            temporal_op, t0, t1 = val
            self.expect("lparen")
            _, name = self.expect("name")
            self.expect("rparen")
            if name not in self.regions:
                raise CSpecParseError(f"unknown region {name!r}")
            r = self.regions[name]
            return Clause.make(temporal_op, (t0, t1), (r.x0, r.x1), r.m, r.b, r.cmp)
        raise CSpecParseError(f"unexpected token {(kind, val)}")


def parse_cspec(spec: str, regions: Dict[str, APCont]) -> Formula:
    """Parse a femformal cspec string + region table into a `Formula`."""
    tokens = _tokenize(spec)
    if not tokens:
        raise CSpecParseError("empty cspec")
    parser = _Parser(tokens, regions)
    formula = parser.parse_spec()
    if parser.peek()[0] != "eof":
        raise CSpecParseError(f"trailing tokens at {parser.peek()}")
    return formula


def format_cspec(formula: Formula) -> Tuple[str, Dict[str, APCont]]:
    """Serialize a Formula into (cspec string, region table) — inverse of
    `parse_cspec`, used by datagen to emit coder-dialect programs."""
    regions: Dict[str, APCont] = {}

    def walk(f: Formula) -> str:
        if isinstance(f, Clause):
            name = chr(ord("A") + len(regions))
            regions[name] = APCont(x0=f.x0, x1=f.x1, cmp=f.cmp_str, m=f.m, b=f.b)
            return f"({f.temporal_op_str}_[{f.t0:.10g}, {f.t1:.10g}] ({name}))"
        op, left, right = f
        tok = "&" if op == "and" else "|"
        return f"({walk(left)} {tok} {walk(right)})"

    body = walk(formula)
    if isinstance(formula, Clause):
        body = f"({body})"
    return body, regions
