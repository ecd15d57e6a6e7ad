"""Tokenizer + recursive-descent parser for the VPL query subset.

Reference surface: crates/varpulis-parser/src/varpulis.pest (stream_expr
grammar line 77, stream_op 124-129); AST crates/varpulis-core/src/ast.rs.
This is a clean-room subset parser: stream declarations whose source is an
event type or a `->` pattern chain, followed by dotted operator calls.

Expression grammar (precedence low→high):
    or  →  and  →  not  →  comparison (== != < <= > >=)  →  additive (+ -)
    →  multiplicative (* / %)  →  unary -  →  postfix (member access .f)
    →  atom (literal | duration | ident | string | ( expr ))
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Lit:
    value: object


@dataclass
class Dur:
    text: str  # duration literal like 30m


@dataclass
class Ref:
    parts: list[str]  # field  or  alias.field


@dataclass
class Bin:
    op: str
    left: object
    right: object


@dataclass
class Un:
    op: str
    operand: object


@dataclass
class Call:
    name: str
    args: list[object]


@dataclass
class PatternStep:
    event_type: str
    alias: str | None
    where: object | None
    kleene: bool = False  # `all T ... as x`


@dataclass
class OpCall:
    name: str
    args: list[object] = field(default_factory=list)
    kwargs: dict[str, object] = field(default_factory=dict)


@dataclass
class StreamDecl:
    name: str
    steps: list[PatternStep]  # len 1 + no alias ⇒ plain typed source
    ops: list[OpCall] = field(default_factory=list)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*|//[^\n]*)
  | (?P<arrow>->)
  | (?P<op>==|!=|<=|>=|[=<>+\-*/%().,:\[\]])
  | (?P<dur>\d+(?:\.\d+)?(?:ns|us|ms|s|m|h|d|w)\b)
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<ident>[A-Za-z_]\w*)
    """,
    re.VERBOSE,
)

KEYWORDS = {"stream", "where", "as", "all", "and", "or", "not", "true", "false", "null"}


def tokenize(src: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(src):
        m = TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"VPL tokenizer stuck at: {src[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        text = m.group()
        if kind == "ident" and text in KEYWORDS:
            out.append((text, text))
        else:
            out.append((kind, text))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


class Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None):
        k, tx = self.peek()
        if k == kind and (text is None or tx == text):
            return self.next()
        return None

    def expect(self, kind: str, text: str | None = None):
        t = self.accept(kind, text)
        if t is None:
            raise SyntaxError(f"expected {text or kind}, got {self.peek()}")
        return t

    # -- program ------------------------------------------------------------

    def program(self) -> list[StreamDecl]:
        decls = []
        while self.peek()[0] != "eof":
            if self.accept("stream"):
                decls.append(self.stream_decl())
            else:
                self.next()  # skip unsupported top-level tokens gracefully
        return decls

    def stream_decl(self) -> StreamDecl:
        name = self.expect("ident")[1]
        self.expect("op", "=")
        steps = [self.pattern_step()]
        while self.accept("arrow"):
            steps.append(self.pattern_step())
        ops = []
        while self.accept("op", "."):
            ops.append(self.op_call())
        return StreamDecl(name, steps, ops)

    def pattern_step(self) -> PatternStep:
        kleene = bool(self.accept("all"))
        etype = self.expect("ident")[1]
        where = None
        alias = None
        if self.accept("where"):
            where = self.expr()
        if self.accept("as"):
            alias = self.expect("ident")[1]
        return PatternStep(etype, alias, where, kleene)

    def op_call(self) -> OpCall:
        # `.not(...)` uses a keyword token as the method name
        k, _tx = self.peek()
        if k in ("not", "all", "where"):
            name = self.next()[1]
        else:
            name = self.expect("ident")[1]
        self.expect("op", "(")
        args: list[object] = []
        kwargs: dict[str, object] = {}
        if not self.accept("op", ")"):
            while True:
                # kwarg?  ident ':' expr   (emit fields, window session:, ...)
                if self.peek()[0] == "ident" and self.peek(1) == ("op", ":"):
                    key = self.next()[1]
                    self.next()
                    kwargs[key] = self.op_arg()
                else:
                    args.append(self.op_arg())
                if self.accept("op", ")"):
                    break
                self.expect("op", ",")
        return OpCall(name, args, kwargs)

    def op_arg(self):
        # `.not(Type where expr)` takes a pattern-step-shaped argument
        if (
            self.peek()[0] == "ident"
            and self.peek()[1][:1].isupper()
            and self.peek(1)[0] in ("where", "op")
            and (self.peek(1)[0] == "where" or self.peek(1)[1] in (")", ","))
        ):
            kleene = False
            etype = self.next()[1]
            where = None
            if self.accept("where"):
                where = self.expr()
            alias = None
            if self.accept("as"):
                alias = self.expect("ident")[1]
            return PatternStep(etype, alias, where, kleene)
        return self.expr()

    # -- expressions ----------------------------------------------------------

    def expr(self):
        return self.or_expr()

    def or_expr(self):
        left = self.and_expr()
        while self.accept("or"):
            left = Bin("or", left, self.and_expr())
        return left

    def and_expr(self):
        left = self.not_expr()
        while self.accept("and"):
            left = Bin("and", left, self.not_expr())
        return left

    def not_expr(self):
        if self.accept("not"):
            return Un("not", self.not_expr())
        return self.comparison()

    def comparison(self):
        left = self.additive()
        k, tx = self.peek()
        if k == "op" and tx in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            return Bin(tx, left, self.additive())
        return left

    def additive(self):
        left = self.multiplicative()
        while True:
            k, tx = self.peek()
            if k == "op" and tx in ("+", "-"):
                self.next()
                left = Bin(tx, left, self.multiplicative())
            else:
                return left

    def multiplicative(self):
        left = self.unary()
        while True:
            k, tx = self.peek()
            if k == "op" and tx in ("*", "/", "%"):
                self.next()
                left = Bin(tx, left, self.unary())
            else:
                return left

    def unary(self):
        if self.accept("op", "-"):
            return Un("-", self.unary())
        return self.postfix()

    def postfix(self):
        node = self.atom()
        while self.peek() == ("op", ".") and self.peek(1)[0] == "ident":
            # member access only when node is a Ref/Call chain
            self.next()
            part = self.expect("ident")[1]
            if isinstance(node, Ref):
                node.parts.append(part)
            else:
                node = Ref([repr(node), part])  # unsupported chain — opaque
        return node

    def atom(self):
        k, tx = self.peek()
        if k == "num":
            self.next()
            return Lit(float(tx) if "." in tx else int(tx))
        if k == "dur":
            self.next()
            return Dur(tx)
        if k == "str":
            self.next()
            return Lit(tx[1:-1].replace('\\"', '"'))
        if k in ("true", "false"):
            self.next()
            return Lit(k == "true")
        if k == "null":
            self.next()
            return Lit(None)
        if k == "ident":
            name = self.next()[1]
            if self.peek() == ("op", "("):  # function call fn(args)
                self.next()
                args = []
                if not self.accept("op", ")"):
                    while True:
                        args.append(self.expr())
                        if self.accept("op", ")"):
                            break
                        self.expect("op", ",")
                return Call(name, args)
            return Ref([name])
        if self.accept("op", "("):
            e = self.expr()
            self.expect("op", ")")
            return e
        raise SyntaxError(f"unexpected token {self.peek()}")


def parse_program(src: str) -> list[StreamDecl]:
    return Parser(tokenize(src)).program()
