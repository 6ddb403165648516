"""Query lexer + recursive-descent parser, faithful to the reference grammar.

Reference semantics: /root/reference/query/src/Lexer.cpp (tokenization),
/root/reference/query/src/Token.h (types + ExtractQuoteTerms),
/root/reference/query/src/Parser.h:112-216 (grammar).

Faithfully reproduced quirks:

* Infix ``NOT`` discards the left operand and *returns immediately*:
  ``A NOT B`` parses to ``NOT(B)``; ``A NOT B C`` leaves an unconsumed token
  and the whole parse fails (Parser.h:120-130 + :60-62).
* Adjacent components imply ``AND`` — but a PHRASE ('…') token is *not* in
  the implicit-AND lookahead list, so ``foo 'bar baz'`` fails to parse while
  ``'bar baz' foo`` succeeds (Parser.h:133-139).
* ``title:``/``url:``/``anchor:``/``desc:`` prefixes are recognized only when
  followed by at least one character (Lexer.cpp:136-144).
* A parse failure yields an *empty result set* (QueryEngine.h:46-73 catches).
"""

from __future__ import annotations

from dataclasses import dataclass

# Token types (Token.h:7-22)
(WORD, QUOTE, PHRASE, TITLE, URL, ANCHOR, DESC, OPERATOR,
 LPAREN, RPAREN, FIELD, EOFTOKEN) = range(12)

_OPERATORS = frozenset(("AND", "OR", "NOT"))
_C_SPACE = frozenset(" \t\n\r\f\v")


class ParseException(Exception):
    pass


@dataclass
class Token:
    type: int
    value: str = ""


def lex(query: str) -> list[Token]:
    """Lexer::NextToken until EOF (Lexer.cpp:13-197)."""
    tokens: list[Token] = []
    i = 0
    n = len(query)
    while True:
        while i < n and query[i] in _C_SPACE:
            i += 1
        if i >= n:
            break
        c = query[i]
        if c == '"':
            i += 1
            j = query.find('"', i)
            if j == -1:
                raise ParseException("Unterminated quoted phrase")
            tokens.append(Token(QUOTE, query[i:j]))
            i = j + 1
        elif c == "'":
            i += 1
            j = query.find("'", i)
            if j == -1:
                raise ParseException("Unterminated single quoted phrase")
            tokens.append(Token(PHRASE, query[i:j]))
            i = j + 1
        elif c == "(":
            tokens.append(Token(LPAREN, "("))
            i += 1
        elif c == ")":
            tokens.append(Token(RPAREN, ")"))
            i += 1
        else:
            start = i
            while i < n and query[i] not in _C_SPACE and query[i] not in "()\"'":
                i += 1
            word = query[start:i]
            if len(word) > 6 and word[:6] == "title:":
                tokens.append(Token(TITLE, word[6:]))
            elif len(word) > 4 and word[:4] == "url:":
                tokens.append(Token(URL, word[4:]))
            elif len(word) > 7 and word[:7] == "anchor:":
                tokens.append(Token(ANCHOR, word[7:]))
            elif len(word) > 5 and word[:5] == "desc:":
                tokens.append(Token(DESC, word[5:]))
            elif word in _OPERATORS:
                tokens.append(Token(OPERATOR, word))
            else:
                tokens.append(Token(WORD, word))
    return tokens


# --- query tree (Query.h:64-358) ---

class Node:
    pass


@dataclass
class TermNode(Node):
    token_type: int
    value: str


@dataclass
class AndNode(Node):
    left: Node
    right: Node


@dataclass
class OrNode(Node):
    left: Node
    right: Node


@dataclass
class NotNode(Node):
    expr: Node


@dataclass
class QuoteNode(Node):
    value: str


@dataclass
class PhraseNode(Node):
    value: str


def extract_quote_terms(value: str) -> list[str]:
    """ExtractQuoteTerms (Token.h:82-104): split on single spaces."""
    return [t for t in value.split(" ") if t]


_IMPLICIT_AND_TYPES = frozenset((WORD, QUOTE, FIELD, LPAREN, TITLE, URL, ANCHOR, DESC))


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.tokens = tokens
        self.pos = 0

    def is_at_end(self) -> bool:
        return self.pos >= len(self.tokens)

    def peek(self) -> Token:
        if self.is_at_end():
            raise ParseException("Unexpected end of input")
        return self.tokens[self.pos]

    def match(self, ttype: int) -> bool:
        if self.is_at_end() or self.tokens[self.pos].type != ttype:
            return False
        self.pos += 1
        return True

    def match_operator(self, op: str) -> bool:
        if (
            self.is_at_end()
            or self.tokens[self.pos].type != OPERATOR
            or self.tokens[self.pos].value != op
        ):
            return False
        self.pos += 1
        return True

    def expect(self, ttype: int, message: str) -> Token:
        if self.is_at_end() or self.tokens[self.pos].type != ttype:
            raise ParseException(message)
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def parse(self) -> Node:
        if not self.tokens:
            raise ParseException("Empty token list")
        result = self.parse_expression()
        if not self.is_at_end():
            raise ParseException("Unexpected tokens after expression")
        return result

    def parse_expression(self) -> Node:
        left = self.parse_query_component()
        while not self.is_at_end():
            if (
                self.match_operator("AND")
                or self.match_operator("OR")
                or self.match_operator("NOT")
            ):
                op = self.tokens[self.pos - 1].value
                right = self.parse_query_component()
                if op == "AND":
                    left = AndNode(left, right)
                elif op == "OR":
                    left = OrNode(left, right)
                else:  # NOT — discards the left operand and returns (quirk)
                    return NotNode(right)
            elif self.peek().type in _IMPLICIT_AND_TYPES:
                right = self.parse_query_component()
                left = AndNode(left, right)
            else:
                break
        return left

    def parse_query_component(self) -> Node:
        if self.match_operator("NOT"):
            return NotNode(self.parse_query_component())
        if (
            self.match(WORD)
            or self.match(TITLE)
            or self.match(URL)
            or self.match(ANCHOR)
            or self.match(DESC)
        ):
            tok = self.tokens[self.pos - 1]
            return TermNode(tok.type, tok.value)
        if self.match(QUOTE):
            return QuoteNode(self.tokens[self.pos - 1].value)
        if self.match(PHRASE):
            return PhraseNode(self.tokens[self.pos - 1].value)
        if self.match(LPAREN):
            expr = self.parse_expression()
            self.expect(RPAREN, "Expected ')' after expression")
            return expr
        raise ParseException("Expected keyword, field, exact match, or grouped expression")


def parse_query(query: str) -> Node:
    """Lex + parse; raises ParseException (callers map that to empty results)."""
    return _Parser(lex(query)).parse()


def query_leaf_terms(node: Node) -> tuple[set[str], set[str]]:
    """Collect (normalized index terms, raw quote/phrase terms) a query needs.

    Used by the Spark planner to prune the postings scan before shard
    evaluation. Returns (decorated normalized terms incl. the 5 generic
    variants, raw quote/phrase words looked up verbatim by TermQuote/Phrase).
    """
    from ..text.normalize import ALL as F_ALL
    from ..text.normalize import ANCHOR as F_ANCHOR
    from ..text.normalize import DESC as F_DESC
    from ..text.normalize import STOPWORDS
    from ..text.normalize import TITLE as F_TITLE
    from ..text.normalize import URL as F_URL
    from ..text.normalize import normalize

    field_of = {TITLE: F_TITLE, URL: F_URL, ANCHOR: F_ANCHOR, DESC: F_DESC}
    norm_terms: set[str] = set()
    raw_terms: set[str] = set()

    def visit(nd: Node) -> None:
        if isinstance(nd, TermNode):
            raw = nd.value.encode("utf-8")
            field = field_of.get(nd.token_type, F_ALL)
            normalized = normalize(raw, field)
            if not normalized or raw in STOPWORDS:
                return
            term = normalized.decode("latin-1")
            if field == F_ALL:
                for dec in ("", "#", "@", "$", "%"):
                    norm_terms.add(dec + term)
            else:
                norm_terms.add(term)
        elif isinstance(nd, (QuoteNode, PhraseNode)):
            raw_terms.update(extract_quote_terms(nd.value))
        elif isinstance(nd, (AndNode, OrNode)):
            visit(nd.left)
            visit(nd.right)
        elif isinstance(nd, NotNode):
            visit(nd.expr)

    visit(node)
    return norm_terms, raw_terms
