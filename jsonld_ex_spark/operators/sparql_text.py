"""Textual SPARQL front-end for the BGP compiler.

The engine's query algebra (operators/bgp.py, operators/property_paths.py)
is complete — SELECT / ASK / CONSTRUCT / DESCRIBE, OPTIONAL / UNION /
MINUS / EXISTS / NOT EXISTS / FILTER / BIND / VALUES / GRAPH quads /
aggregates / subqueries / property paths / DISTINCT-ORDER-LIMIT-OFFSET —
but callers had to assemble pattern tuples and expression ASTs by hand.
This module adds the missing last mile: a real SPARQL *parser*, so a
query arrives as the text a SPARQL user already has:

    PREFIX v: <https://sparkld.dev/vocab#>
    SELECT ?turn ?entity WHERE {
      ?turn v:role "tool" ; v:mentions ?entity .
      FILTER(STRSTARTS(?entity, "https://"))
    } ORDER BY ?turn ?entity LIMIT 100

``parse_sparql`` compiles the text once into a normalized plan spec;
``sparql_query`` hands that spec to the established Spark compiler and
``sparql_oracle_sql`` hands the SAME spec to the established DuckDB
oracle generators — so every textual query is cross-engine checkable
exactly like the programmatic forms, and the parser itself adds zero
new runtime semantics (the plan shapes, pushdowns, and join strategies
are the audited ones in bgp.py).

Reference note: rdf-elixir/jsonld-ex has no query language (it is a
JSON-LD processor; see /root/reference/lib); the SPARQL surface is this
repo's extension, written from the public SPARQL 1.1 grammar
(https://www.w3.org/TR/sparql11-query/#grammar).

Coverage (maps 1:1 onto engine capabilities; anything outside raises a
positioned ValueError rather than mis-executing):

* Query forms: SELECT (with DISTINCT/REDUCED, aggregates + GROUP BY +
  HAVING, ORDER BY + LIMIT + OFFSET paging, expression projections),
  ASK, CONSTRUCT, DESCRIBE <iri>... and DESCRIBE ?var WHERE.
* Group graph patterns: triple blocks with ``;`` / ``,`` elision,
  blank-node labels as scoped non-projectable variables,
  property paths in predicate position (``/ | ^ * + ? !(...)``),
  OPTIONAL / MINUS / FILTER [NOT] EXISTS groups (each accepting
  group-INTERNAL scalar FILTERs — the LeftJoin(A, Filter(C, P))
  algebra), BIND, VALUES (single- and multi-variable), GRAPH blocks
  (constant and variable graph terms), UNION (embedded — joined with
  the rest of the query — when branches bind identical variables;
  standalone NULL-padding otherwise), and nested aggregate SELECT
  subqueries.
* Expressions: BOUND, REGEX, STRSTARTS, STRENDS, CONTAINS,
  LANGMATCHES, LANG, DATATYPE, isIRI/isURI/isLiteral/isBlank, STR,
  CONCAT, COALESCE, IF, LCASE, UCASE, SUBSTR, REPLACE, STRBEFORE,
  STRAFTER, STRLEN, ``IN``, ``&& || !``, comparisons (including
  numeric-expression and lexical var-to-var ordering), and integer
  ``+ - *`` arithmetic — exactly the function library
  _cond_col/_bind_col compiles to both engines.
* Updates (parse_sparql_update / run_sparql_update): INSERT DATA /
  DELETE DATA (exact-term) / DELETE WHERE / [WITH g]
  DELETE-INSERT-WHERE / LOAD <uri> [INTO GRAPH g] / CLEAR / ADD /
  COPY / MOVE over the snapshot store.

Design choices a reviewer should know:

* ``LANG(?x)`` / ``DATATYPE(?x)`` compile to the engine's *annotation*
  mechanism (the term's language/datatype is projected from the one
  pattern scan that binds ``?x`` in object position).  When they appear
  inside FILTER/BIND expressions the parser introduces a hidden
  annotation variable (``_lang_x`` / ``_dt_x``) and keeps it out of the
  ``SELECT *`` projection.
* A FILTER that is a conjunction of simple ``?var <op> literal``
  comparisons is split and routed into the engine's pushdown ``filters``
  (compiled into the pattern scans — the 100-TB-relevant placement);
  anything else becomes a post-OPTIONAL ``filter_exprs`` condition.
  ``FILTER(?v IN (...))`` routes to the VALUES/isin form.
* Typed/language-tagged literal CONSTANTS in triple patterns are
  rejected (the pattern layer matches lexical forms; filter on
  LANG()/DATATYPE() instead) — matching the documented engine term
  model, not silently ignoring the tag.
* ORDER BY requires LIMIT (and vice versa): the engine's paging
  operator is the bounded TakeOrdered shape; an unbounded global sort
  is a scale hazard the API refuses by design (results are otherwise
  unordered solution bags, per SPARQL).
"""

from __future__ import annotations

import re
from collections import namedtuple

from jsonld_ex_spark.operators import bgp as _bgp

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

Token = namedtuple("Token", "kind text pos")

_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+|\#[^\n]*)
    | (?P<IRIREF><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<STRING>"(?:[^"\\\n]|\\.)*")
    | (?P<VAR>[?$][A-Za-z_][A-Za-z_0-9]*)
    | (?P<INT>[0-9]+)
    | (?P<PNAME>(?:[A-Za-z_][A-Za-z_0-9-]*)?:
                (?:[A-Za-z_0-9](?:[A-Za-z_0-9.-]*[A-Za-z_0-9-])?)?)
    | (?P<WORD>[A-Za-z_][A-Za-z_0-9]*)
    | (?P<PUNCT>\^\^|&&|\|\||!=|<=|>=|[{}().,;|/^*+?!=<>@-])
    """,
    re.X,
)

_STRING_ESCAPES = {
    '"': '"', "\\": "\\", "n": "\n", "t": "\t", "r": "\r",
    "b": "\b", "f": "\f", "'": "'",
}


def _tokenize(text: str) -> list[Token]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(f"SPARQL lex error at offset {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "WS":
            out.append(Token(kind, m.group(), m.start()))
    return out


def _unescape(raw: str) -> str:
    body, out, i = raw[1:-1], [], 0
    while i < len(body):
        ch = body[i]
        if ch == "\\":
            i += 1
            if i >= len(body):
                raise ValueError(f"dangling escape in {raw!r}")
            esc = body[i]
            if esc == "u":
                hex4 = body[i + 1:i + 5]
                if len(hex4) != 4 or any(c not in "0123456789abcdefABCDEF" for c in hex4):
                    raise ValueError(f"malformed \\uXXXX escape in {raw!r}")
                out.append(chr(int(hex4, 16)))
                i += 4
            elif esc in _STRING_ESCAPES:
                out.append(_STRING_ESCAPES[esc])
            else:
                raise ValueError(f"unsupported escape \\{esc} in {raw!r}")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


_AGG_FN_BY_KEYWORD = {
    "COUNT": "count", "SUM": "sum", "MIN": "min", "MAX": "max",
    "AVG": "avg", "SAMPLE": "sample", "GROUP_CONCAT": "group_concat",
}
_AGG_KEYWORDS = set(_AGG_FN_BY_KEYWORD)
_CMP_TOKENS = {"=": "eq", "!=": "ne", "<": "lt", ">": "gt", "<=": "le", ">=": "ge"}


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        # group-level accumulators (top-level WHERE group)
        self.patterns: list[tuple[str, ...]] = []
        self.paths: list[tuple[str, object, str]] = []
        self.optional: list[list[tuple[str, ...]]] = []
        self.minus: list[list[tuple[str, ...]]] = []
        self.exists: list[list[tuple[str, ...]]] = []
        self.not_exists: list[list[tuple[str, ...]]] = []
        self.filters: list[tuple[str, str, object]] = []
        self.filter_exprs: list = []
        self.bind: dict[str, object] = {}
        self.annotations: dict[str, tuple[str, str]] = {}
        self.hidden_annots: set[str] = set()
        self.bnode_vars: set[str] = set()
        self.values: dict[str, list[str]] = {}
        self.values_rows: tuple | None = None
        self.subqueries: list[dict] = []
        self.union_alts: list[list[tuple[str, ...]]] | None = None
        self.embedded_unions: list = []
        self._union_groups: list = []
        self._pending_conds: list = []

    # --- token helpers -------------------------------------------------
    def _peek(self, ahead: int = 0) -> Token | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def _next(self) -> Token:
        t = self._peek()
        if t is None:
            raise ValueError("unexpected end of SPARQL query")
        self.i += 1
        return t

    def _err(self, msg: str) -> ValueError:
        t = self._peek()
        where = f" at offset {t.pos} near {t.text!r}" if t else " at end of query"
        return ValueError(f"SPARQL parse error{where}: {msg}")

    def _at_word(self, *words: str) -> bool:
        t = self._peek()
        return t is not None and t.kind == "WORD" and t.text.upper() in words

    def _accept_word(self, *words: str) -> bool:
        if self._at_word(*words):
            self.i += 1
            return True
        return False

    def _expect_word(self, word: str) -> None:
        if not self._accept_word(word):
            raise self._err(f"expected {word}")

    def _at_punct(self, *p: str) -> bool:
        t = self._peek()
        return t is not None and t.kind == "PUNCT" and t.text in p

    def _accept_punct(self, *p: str) -> bool:
        if self._at_punct(*p):
            self.i += 1
            return True
        return False

    def _expect_punct(self, p: str) -> None:
        if not self._accept_punct(p):
            raise self._err(f"expected {p!r}")

    # exact-term object constants ("lex"^^<dt> / "lex"@lang) are only
    # meaningful on the UPDATE side (graph_update's term-identity
    # matching); query patterns keep rejecting them with guidance
    _allow_exact_literals = False
    # blank-node labels compile to variables — legal in QUERY patterns
    # (SPARQL: query bnodes ARE scoped variables) but forbidden in
    # updates (a bnode in DELETE WHERE is spec-illegal and would
    # silently become a mass-matching wildcard) and in CONSTRUCT
    # (template bnodes mint FRESH nodes per solution, which this
    # compiler does not do — raising beats silently coreferencing)
    _forbid_bnodes: str | None = None

    # --- terms ---------------------------------------------------------
    def _expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise ValueError(f"undeclared prefix {pfx!r}: in {pname!r}")
        return self.prefixes[pfx] + local

    def _maybe_bnode_var(self) -> str | None:
        """``_:label`` in a query pattern is, per SPARQL, a variable
        scoped to the query that cannot be projected — compiled to a
        hidden ``_bn_<label>`` variable."""
        t = self._peek()
        if t is not None and t.kind == "PNAME" and t.text.startswith("_:"):
            if self._forbid_bnodes:
                raise self._err(
                    f"blank-node labels are not allowed in {self._forbid_bnodes} "
                    "(use a named ?variable)"
                )
            self._next()
            name = "_bn_" + t.text[2:]
            self.bnode_vars.add(name)
            return "?" + name
        return None

    def _iri_token(self) -> str:
        """Consume an IRI (IRIREF or PNAME or 'a'), return the bare IRI."""
        t = self._peek()
        if t is None:
            raise self._err("expected an IRI")
        if t.kind == "IRIREF":
            self._next()
            return t.text[1:-1]
        if t.kind == "PNAME":
            self._next()
            return self._expand_pname(t.text)
        if t.kind == "WORD" and t.text == "a":
            self._next()
            return RDF_TYPE
        raise self._err("expected an IRI")

    def _term(self, position: str) -> str:
        """Consume one triple-pattern term, returning the engine form
        (``?var`` / ``<iri>`` / ``"literal"``)."""
        t = self._peek()
        if t is None:
            raise self._err(f"expected a {position} term")
        if t.kind == "VAR":
            self._next()
            return "?" + t.text[1:]
        bnode = self._maybe_bnode_var()
        if bnode is not None:
            return bnode
        if t.kind in ("IRIREF", "PNAME") or (t.kind == "WORD" and t.text == "a"):
            return f"<{self._iri_token()}>"
        if t.kind == "STRING":
            self._next()
            val = _unescape(t.text)
            if self._at_punct("@") or self._at_punct("^^"):
                if not self._allow_exact_literals:
                    raise self._err(
                        "language-tagged/typed literal constants are not supported "
                        "in triple patterns (the pattern layer matches lexical "
                        "forms; FILTER on LANG()/DATATYPE() instead)"
                    )
                if self._accept_punct("^^"):
                    return f'"{val}"^^<{self._iri_token()}>'
                self._expect_punct("@")
                return f'"{val}"@{self._langtag()}'
            return f'"{val}"'
        if t.kind == "INT":
            self._next()
            return f'"{t.text}"'
        if t.kind == "PUNCT" and t.text == "-" and (
            self._peek(1) is not None and self._peek(1).kind == "INT"
        ):
            self._next()
            return f'"-{self._next().text}"'
        if t.kind == "WORD" and t.text in ("true", "false"):
            self._next()
            return f'"{t.text}"'
        raise self._err(f"expected a {position} term")

    def _langtag(self) -> str:
        t = self._next()
        if t.kind != "WORD":
            raise self._err("expected a language tag after @")
        parts = [t.text]
        while self._at_punct("-"):
            nxt = self._peek(1)
            if nxt is None or nxt.kind not in ("WORD", "INT"):
                break
            self._next()
            parts.append(self._next().text)
        return "-".join(parts)

    # --- property paths ------------------------------------------------
    def _maybe_path(self):
        """Parse a predicate position: returns ("iri", term) for a plain
        predicate or ("path", ast) for a property path."""
        start = self.i
        t = self._peek()
        if t is not None and t.kind == "VAR":
            self._next()
            return ("iri", "?" + t.text[1:])
        ast = self._path_alt()
        if isinstance(ast, str) and self.i == start + 1:
            return ("iri", f"<{ast}>")
        return ("path", ast)

    def _path_alt(self):
        parts = [self._path_seq()]
        while self._accept_punct("|"):
            parts.append(self._path_seq())
        return parts[0] if len(parts) == 1 else ("alt", *parts)

    def _path_seq(self):
        parts = [self._path_elt_or_inverse()]
        while self._accept_punct("/"):
            parts.append(self._path_elt_or_inverse())
        return parts[0] if len(parts) == 1 else ("seq", *parts)

    def _path_elt_or_inverse(self):
        if self._accept_punct("^"):
            return ("inv", self._path_elt())
        return self._path_elt()

    def _path_elt(self):
        prim = self._path_primary()
        if self._accept_punct("*"):
            return ("star", prim)
        if self._accept_punct("+"):
            return ("plus", prim)
        # a bare '?' is the zero-or-one modifier; '?name' is a variable
        # (the tokenizer already decided: VAR tokens include the name)
        if self._accept_punct("?"):
            return ("opt", prim)
        return prim

    def _path_primary(self):
        if self._accept_punct("!"):
            if self._accept_punct("("):
                iris = [self._iri_token()]
                while self._accept_punct("|"):
                    iris.append(self._iri_token())
                self._expect_punct(")")
                return ("neg", *iris)
            return ("neg", self._iri_token())
        if self._accept_punct("("):
            inner = self._path_alt()
            self._expect_punct(")")
            return inner
        return self._iri_token()

    # --- triples blocks ------------------------------------------------
    def _triples_block(self, graph_term: str | None, restricted: str | None):
        """Parse one subject's predicate-object list (``;``/``,``
        elision), appending to self.patterns/self.paths (top level) or
        returning plain patterns (restricted contexts)."""
        out: list[tuple[str, ...]] = []
        subj = self._term("subject")
        while True:
            kind, pred = self._maybe_path()
            if kind == "path":
                if restricted:
                    raise self._err(
                        f"property paths are not supported inside {restricted} "
                        "groups (join the path in the required patterns)"
                    )
                if graph_term is not None:
                    raise self._err(
                        "property paths inside GRAPH blocks are not supported "
                        "(paths evaluate over the union graph)"
                    )
            while True:
                obj = self._term("object")
                if kind == "path":
                    self.paths.append((subj, pred, obj))
                else:
                    pat = (subj, pred, obj)
                    if graph_term is not None:
                        pat = pat + (graph_term,)
                    out.append(pat)
                if not self._accept_punct(","):
                    break
            if not self._accept_punct(";"):
                break
            if self._at_punct(".", "}"):  # trailing ';'
                break
        self._accept_punct(".")
        return out

    def _plain_group(self, label: str):
        """Parse ``{ triples... }`` allowing only plain triple patterns
        (the engine's OPTIONAL/MINUS/EXISTS/UNION groups are pattern
        lists).  Scalar ``FILTER(?v op literal)`` constraints are
        collected and applied INSIDE the group — the
        ``OPTIONAL { P FILTER(C) }`` algebra — returning the engine's
        (patterns, filters) group form when any are present."""
        self._expect_punct("{")
        pats: list[tuple[str, ...]] = []
        gfilters: list[tuple[str, str, object]] = []
        while not self._at_punct("}"):
            if self._at_word("FILTER"):
                self._next()
                self._expect_punct("(")
                cond = self._to_cond(self._bool_or_value())
                self._expect_punct(")")
                conjuncts = list(cond[1:]) if cond[0] == "and" else [cond]
                if not all(c[0] == "cmp" for c in conjuncts):
                    raise self._err(
                        f"only scalar comparisons are supported in {label}-"
                        "group FILTERs (move richer conditions to a "
                        "post-OPTIONAL FILTER with BOUND)"
                    )
                gfilters.extend((c[1], c[2], c[3]) for c in conjuncts)
                continue
            if self._at_word(
                "OPTIONAL", "MINUS", "FILTER", "BIND", "VALUES", "GRAPH",
            ) or self._at_punct("{"):
                raise self._err(
                    f"only plain triple patterns are supported inside {label} groups"
                )
            pats.extend(self._triples_block(None, restricted=label))
        self._expect_punct("}")
        if not pats:
            raise self._err(f"empty {label} group")
        return (pats, gfilters) if gfilters else pats

    # --- expressions ---------------------------------------------------
    # Intermediate value AST: ("var", v) ("lit", s) ("int", n) ("iri", i)
    # ("call", NAME, args...) ("arith", op, a, b)

    def _value_expr(self):
        return self._value_add()

    def _value_add(self):
        left = self._value_mul()
        while self._at_punct("+", "-"):
            op = "add" if self._next().text == "+" else "sub"
            left = ("arith", op, left, self._value_mul())
        return left

    def _value_mul(self):
        left = self._value_primary()
        while self._at_punct("*"):
            self._next()
            left = ("arith", "mul", left, self._value_primary())
        return left

    def _value_primary(self):
        t = self._peek()
        if t is None:
            raise self._err("expected an expression")
        if t.kind == "VAR":
            self._next()
            return ("var", t.text[1:])
        if t.kind == "STRING":
            self._next()
            val = _unescape(t.text)
            if self._at_punct("@") or self._at_punct("^^"):
                raise self._err(
                    "typed/language-tagged literals in expressions are not supported"
                )
            return ("lit", val)
        if t.kind == "INT":
            self._next()
            return ("int", int(t.text))
        if t.kind == "PUNCT" and t.text == "-":
            nxt = self._peek(1)
            if nxt is not None and nxt.kind == "INT":
                self._next()
                return ("int", -int(self._next().text))
            raise self._err("expected an integer after unary '-'")
        if t.kind in ("IRIREF", "PNAME"):
            return ("iri", self._iri_token())
        if t.kind == "WORD":
            name = t.text.upper()
            nxt = self._peek(1)
            if nxt is not None and nxt.kind == "PUNCT" and nxt.text == "(":
                self._next()
                self._next()
                args = []
                if not self._at_punct(")"):
                    args.append(self._bool_or_value())
                    while self._accept_punct(","):
                        args.append(self._bool_or_value())
                self._expect_punct(")")
                return ("call", name, *args)
            if t.text in ("true", "false"):
                self._next()
                return ("lit", t.text)
        if t.kind == "PUNCT" and t.text == "(":
            self._next()
            inner = self._bool_or_value()
            self._expect_punct(")")
            return inner
        raise self._err("expected an expression")

    # Boolean expression grammar (FILTER constraints, IF conditions)
    def _bool_or_value(self):
        """Parse either a boolean expression or a value expression —
        IF()'s first argument is boolean, the rest are values; the
        relational layer disambiguates."""
        return self._bool_or()

    def _bool_or(self):
        parts = [self._bool_and()]
        while self._accept_punct("||"):
            parts.append(self._bool_and())
        return parts[0] if len(parts) == 1 else ("bool_or", *parts)

    def _bool_and(self):
        parts = [self._bool_not()]
        while self._accept_punct("&&"):
            parts.append(self._bool_not())
        return parts[0] if len(parts) == 1 else ("bool_and", *parts)

    def _bool_not(self):
        if self._accept_punct("!"):
            return ("bool_not", self._bool_not())
        return self._bool_rel()

    def _bool_rel(self):
        left = self._value_expr()
        t = self._peek()
        if t is not None and t.kind == "PUNCT" and t.text in _CMP_TOKENS:
            op = _CMP_TOKENS[self._next().text]
            right = self._value_expr()
            return ("rel", op, left, right)
        if t is not None and t.kind == "WORD" and t.text.upper() == "IN":
            self._next()
            self._expect_punct("(")
            vals = [self._value_expr()]
            while self._accept_punct(","):
                vals.append(self._value_expr())
            self._expect_punct(")")
            return ("in", left, vals)
        return left

    # --- conversion: intermediate AST -> engine ASTs -------------------
    _ANNOT_KINDS = {"lang": "lang", "dt": "datatype", "tt": "termtype"}

    def _annot_var(self, var: str, kind: str) -> str:
        name = f"_{kind}_{var}"
        if name not in self.annotations:
            self.annotations[name] = (var, self._ANNOT_KINDS[kind])
            self.hidden_annots.add(name)
        return name

    def _to_strexpr(self, node):
        """Intermediate value AST -> engine string-expression AST
        (_bind_string_part forms)."""
        tag = node[0]
        if tag == "var":
            return node[1]
        if tag == "lit":
            return ("lit", node[1])
        if tag == "int":
            return ("lit", str(node[1]))
        if tag == "iri":
            return ("lit", node[1])
        if tag == "call":
            name, args = node[1], node[2:]
            if name == "STR" and len(args) == 1 and args[0][0] == "var":
                return ("str", args[0][1])
            if name in ("LANG", "DATATYPE") and len(args) == 1 and args[0][0] == "var":
                return self._annot_var(args[0][1], "lang" if name == "LANG" else "dt")
            if name == "CONCAT":
                return ("concat", *[self._to_strexpr(a) for a in args])
            if name == "COALESCE":
                return ("coalesce", *[self._to_strexpr(a) for a in args])
            if name == "IF" and len(args) == 3:
                return (
                    "if", self._to_cond(args[0]),
                    self._to_strexpr(args[1]), self._to_strexpr(args[2]),
                )
            if name in ("LCASE", "UCASE") and len(args) == 1:
                return (name.lower(), self._to_strexpr(args[0]))
            if name == "SUBSTR" and len(args) in (2, 3):
                ints = [a[1] for a in args[1:] if a[0] == "int"]
                if len(ints) != len(args) - 1:
                    raise ValueError("SUBSTR start/length must be integer literals")
                return ("substr", self._to_strexpr(args[0]), *ints)
            if name == "REPLACE" and len(args) == 3:
                if args[1][0] != "lit" or args[2][0] != "lit":
                    raise ValueError("REPLACE find/replacement must be string literals")
                # the engine's replace form is deliberately FIXED-STRING
                # (bgp.py keeps the regex form out); SPARQL's REPLACE
                # pattern arg is a regex, so a pattern with metacharacters
                # would silently change meaning — reject it instead
                if any(c in args[1][1] for c in ".^$*+?{}[]()|\\"):
                    raise ValueError(
                        "REPLACE supports fixed-string patterns only (regex "
                        "metacharacters in the find argument are rejected "
                        "rather than silently matched literally)"
                    )
                return ("replace", self._to_strexpr(args[0]), args[1][1], args[2][1])
            if name in ("STRBEFORE", "STRAFTER") and len(args) == 2:
                if args[1][0] != "lit":
                    raise ValueError(f"{name} needle must be a string literal")
                return (name.lower(), self._to_strexpr(args[0]), args[1][1])
            raise ValueError(f"unsupported function {name} in a string expression")
        raise ValueError(f"not a string-valued expression: {node!r}")

    def _to_numexpr(self, node):
        """Intermediate value AST -> engine numeric BIND AST."""
        tag = node[0]
        if tag == "var":
            return node[1]
        if tag == "int":
            return node[1]
        if tag == "arith":
            return (node[1], self._to_numexpr(node[2]), self._to_numexpr(node[3]))
        if tag == "call" and node[1] == "STRLEN" and len(node) == 3 and node[2][0] == "var":
            return ("strlen", node[2][1])
        raise ValueError(f"not a numeric expression: {node!r}")

    def _is_numeric(self, node) -> bool:
        return node[0] in ("arith",) or (node[0] == "call" and node[1] == "STRLEN")

    def _to_cond(self, node):
        """Intermediate boolean AST -> engine condition AST (_cond_col)."""
        tag = node[0]
        if tag == "bool_or":
            return ("or", *[self._to_cond(c) for c in node[1:]])
        if tag == "bool_and":
            return ("and", *[self._to_cond(c) for c in node[1:]])
        if tag == "bool_not":
            return ("not", self._to_cond(node[1]))
        if tag == "rel":
            _, op, left, right = node
            # simple ?var <op> literal -> the engine's scalar cmp form
            # (push-down-capable), checked FIRST
            if left[0] == "var" and right[0] in ("int", "lit"):
                return ("cmp", left[1], op, right[1])
            if right[0] == "var" and left[0] in ("int", "lit"):
                flip = {"lt": "gt", "gt": "lt", "le": "ge", "ge": "le"}
                return ("cmp", right[1], flip.get(op, op), left[1])
            # a numeric expression on either side (STRLEN / arithmetic)
            # -> the engine's num_cmp condition
            if self._is_numeric(left) or self._is_numeric(right):
                return (
                    "num_cmp", self._to_numexpr(left), op, self._to_numexpr(right),
                )
            if op in ("eq", "ne"):
                return (op, self._to_strexpr(left), self._to_strexpr(right))
            # ordering between expressions: LEXICAL via str_cmp — but a
            # bare ?a < ?b is ambiguous (lexical "9" < "10" is FALSE
            # while numeric 9 < 10 is TRUE, and both engines would
            # agree on the silently-wrong answer), so it must be made
            # explicit: STR(?a) < STR(?b) for lexical order, ?a + 0 <
            # ?b + 0 for the numeric path
            if left[0] == "var" and right[0] == "var":
                raise ValueError(
                    "ordering two variables is ambiguous over lexical "
                    "bindings: write STR(?a) < STR(?b) for lexical "
                    "(codepoint) order, or ?a + 0 < ?b + 0 for numeric "
                    "comparison under the strict-integer guard"
                )
            return (
                "str_cmp", self._to_strexpr(left), op, self._to_strexpr(right),
            )
        if tag == "in":
            _, left, vals = node
            if left[0] != "var":
                raise ValueError("IN requires a variable on the left")
            parts = []
            for v in vals:
                if v[0] not in ("int", "lit", "iri"):
                    raise ValueError("IN list entries must be literals or IRIs")
                # keep ints as ints: SPARQL defines IN as '=' over each
                # element, and '=' against an int takes the numeric path
                parts.append(("cmp", left[1], "eq", v[1]))
            return parts[0] if len(parts) == 1 else ("or", *parts)
        if tag == "call":
            name, args = node[1], node[2:]
            if name == "BOUND" and len(args) == 1 and args[0][0] == "var":
                return ("bound", args[0][1])
            if name == "REGEX" and len(args) == 2 and args[0][0] == "var" and args[1][0] == "lit":
                return ("cmp", args[0][1], "regex", args[1][1])
            if name in ("STRSTARTS", "STRENDS", "CONTAINS") and len(args) == 2:
                if args[1][0] != "lit":
                    raise ValueError(f"{name} needle must be a string literal")
                return (name.lower(), self._to_strexpr(args[0]), args[1][1])
            if name == "LANGMATCHES" and len(args) == 2:
                if args[1][0] != "lit":
                    raise ValueError("LANGMATCHES range must be a string literal")
                return ("langmatches", self._to_strexpr(args[0]), args[1][1])
            if name in ("ISIRI", "ISURI", "ISLITERAL", "ISBLANK") and \
                    len(args) == 1 and args[0][0] == "var":
                # the matched term's kind via the termtype annotation
                # ('iri' | 'literal' | 'bnode')
                tt = self._annot_var(args[0][1], "tt")
                want = {"ISIRI": "iri", "ISURI": "iri",
                        "ISLITERAL": "literal", "ISBLANK": "bnode"}[name]
                return ("eq", tt, ("lit", want))
            raise ValueError(f"unsupported boolean function {name}")
        raise ValueError(f"not a boolean expression: {node!r}")

    # --- FILTER routing ------------------------------------------------
    def _route_filter(self, cond, scope_vars: set[str]) -> None:
        """Push simple scalar comparisons on required/path variables into
        the engine's scan-level ``filters`` (conjuncts split per SPARQL
        equivalence); everything else becomes a post-OPTIONAL
        filter_exprs condition."""
        conjuncts = list(cond[1:]) if cond[0] == "and" else [cond]
        rest = []
        for c in conjuncts:
            if c[0] == "cmp" and c[1] in scope_vars:
                self.filters.append((c[1], c[2], c[3]))
            else:
                rest.append(c)
        if len(rest) == 1:
            self.filter_exprs.append(rest[0])
        elif rest:
            self.filter_exprs.append(("and", *rest))

    # --- group graph pattern (top level) -------------------------------
    def _group_graph_pattern(self) -> None:
        self._expect_punct("{")
        saw_non_union = False
        while not self._at_punct("}"):
            if self._accept_word("OPTIONAL"):
                self.optional.append(self._plain_group("OPTIONAL"))
                saw_non_union = True
            elif self._accept_word("MINUS"):
                self.minus.append(self._plain_group("MINUS"))
                saw_non_union = True
            elif self._accept_word("FILTER"):
                self._filter_clause()
                saw_non_union = True
            elif self._accept_word("BIND"):
                self._bind_clause()
                saw_non_union = True
            elif self._accept_word("VALUES"):
                self._values_clause()
                saw_non_union = True
            elif self._accept_word("GRAPH"):
                gt = self._term("graph")
                if gt.startswith('"'):
                    raise self._err("GRAPH term must be an IRI or variable")
                self._expect_punct("{")
                while not self._at_punct("}"):
                    if self._accept_word("FILTER"):
                        # value-constraint FILTER inside GRAPH: same
                        # deferred routing as the enclosing group
                        # (equivalent for conjunctive queries).  EXISTS
                        # groups are NOT graph-invariant — they would
                        # evaluate over the union graph instead of the
                        # enclosing GRAPH scope — so they are rejected.
                        if self._at_word("EXISTS", "NOT"):
                            raise self._err(
                                "FILTER [NOT] EXISTS inside GRAPH blocks is "
                                "not supported (the existence group would "
                                "evaluate over the union graph; add the "
                                "graph term to its patterns at top level)"
                            )
                        self._filter_clause()
                        continue
                    self.patterns.extend(self._triples_block(gt, restricted=None))
                self._expect_punct("}")
                saw_non_union = True
            elif self._at_punct("{"):
                nxt = self._peek(1)
                if nxt is not None and nxt.kind == "WORD" and nxt.text.upper() == "SELECT":
                    self._subquery_clause()
                    saw_non_union = True
                else:
                    self._union_clause()
            else:
                self.patterns.extend(self._triples_block(None, restricted=None))
                saw_non_union = True
        self._expect_punct("}")
        # UNION routing: the EMBEDDED form (a joined union relation) is
        # strictly more capable — it composes with other patterns,
        # aggregates, and modifiers — but requires every alternative to
        # bind the same variables.  A lone union whose branches bind
        # DIFFERENT variable sets keeps the standalone NULL-padding
        # form (bgp_union); everything else is embedded.
        if self._union_groups:
            def _alt_vars(alt):
                pats, _f = _bgp._norm_group(alt)
                return {t[1:] for p in pats for t in p if t.startswith("?")}

            lone = len(self._union_groups) == 1 and not saw_non_union
            sets = [_alt_vars(a) for a in self._union_groups[0]]
            if lone and any(s != sets[0] for s in sets):
                self.union_alts = self._union_groups[0]
            else:
                self.embedded_unions = self._union_groups
            self._union_groups = []
        scope = {v for p in self.patterns for k, v in
                 (_bgp._parse_term(t) for t in p) if k == "var"}
        scope |= self._path_vars()
        for ui, alternatives in enumerate(self.embedded_unions):
            scope |= _bgp._union_parts(alternatives, ui)[1]
        for cond in self._pending_conds:
            self._route_filter(cond, scope)
        self._pending_conds = []

    def _filter_clause(self) -> None:
        if self._accept_word("EXISTS"):
            self.exists.append(self._plain_group("EXISTS"))
            return
        if self._at_word("NOT"):
            save = self.i
            self._next()
            if self._accept_word("EXISTS"):
                self.not_exists.append(
                    self._plain_group("NOT EXISTS")
                )
                return
            self.i = save
        self._expect_punct("(")
        node = self._bool_or_value()
        self._expect_punct(")")
        if node[0] == "in":
            # standalone FILTER(?v IN (...)) with STRING/IRI entries ->
            # the VALUES/isin form; integer entries fall through to the
            # or-of-'=' compilation so they keep '=' numeric semantics
            # (lexical '05' matches ?v IN (5) exactly like ?v = 5)
            _, left, vals = node
            if left[0] == "var" and all(v[0] in ("lit", "iri") for v in vals):
                var = left[1]
                if var in self.values:
                    raise ValueError(f"duplicate IN/VALUES restriction on ?{var}")
                self.values[var] = [v[1] for v in vals]
                return
        # routing is deferred to the end of the group: SPARQL filter
        # scope is the WHOLE group, so a filter may precede the pattern
        # that binds its variable
        self._pending_conds.append(self._to_cond(node))

    def _path_vars(self) -> set[str]:
        out = set()
        for s, _ast, o in self.paths:
            for term in (s, o):
                if term.startswith("?"):
                    out.add(term[1:])
        return out

    def _bind_clause(self) -> None:
        self._expect_punct("(")
        node = self._bool_or_value()
        self._expect_word("AS")
        t = self._next()
        if t.kind != "VAR":
            raise self._err("expected a variable after AS")
        out = t.text[1:]
        self._expect_punct(")")
        self._register_bind(out, node)

    def _register_bind(self, out: str, node) -> None:
        if out in self.bind or out in self.annotations:
            raise ValueError(f"duplicate BIND/annotation output ?{out}")
        # BIND(LANG(?x) AS ?l) / BIND(DATATYPE(?x) AS ?d): the engine's
        # annotation mechanism, surfaced as a visible variable
        if node[0] == "call" and node[1] in ("LANG", "DATATYPE") and \
                len(node) == 3 and node[2][0] == "var":
            self.annotations[out] = (
                node[2][1], "lang" if node[1] == "LANG" else "datatype",
            )
            return
        if self._is_numeric(node):
            self.bind[out] = self._to_numexpr(node)
        else:
            self.bind[out] = self._to_strexpr(node)

    def _values_clause(self) -> None:
        t = self._peek()
        if t is not None and t.kind == "VAR":
            var = self._next().text[1:]
            self._expect_punct("{")
            vals = []
            while not self._at_punct("}"):
                vals.append(self._values_datum())
            self._expect_punct("}")
            if var in self.values:
                raise ValueError(f"duplicate VALUES restriction on ?{var}")
            self.values[var] = vals
            return
        self._expect_punct("(")
        vars_ = []
        while not self._at_punct(")"):
            t = self._next()
            if t.kind != "VAR":
                raise self._err("expected a variable in VALUES header")
            vars_.append(t.text[1:])
        self._expect_punct(")")
        self._expect_punct("{")
        rows = []
        while self._accept_punct("("):
            row = []
            while not self._at_punct(")"):
                row.append(self._values_datum())
            self._expect_punct(")")
            rows.append(tuple(row))
        self._expect_punct("}")
        if self.values_rows is not None:
            raise ValueError("multiple multi-variable VALUES blocks are not supported")
        self.values_rows = (tuple(vars_), rows)

    def _values_datum(self) -> str:
        t = self._peek()
        if t is not None and t.kind == "WORD" and t.text.upper() == "UNDEF":
            raise self._err("UNDEF in VALUES is not supported (use OPTIONAL)")
        term = self._term("VALUES")
        if term.startswith("?"):
            raise self._err("variables are not valid VALUES data")
        return term[1:-1]  # strip <>/"" — bindings hold lexical values

    def _subquery_clause(self) -> None:
        self._expect_punct("{")
        sub = _Parser("")  # fresh accumulators, shared token stream
        sub.toks, sub.i, sub.prefixes = self.toks, self.i, self.prefixes
        spec = sub._select_query(subquery=True)
        self.i = sub.i
        self._expect_punct("}")
        agg = spec.get("agg")
        if agg is None:
            raise ValueError(
                "subqueries must aggregate (SELECT ... GROUP BY ...) — "
                "plain nested SELECTs add nothing over inlining the patterns"
            )
        entry = {
            "patterns": spec["patterns"],
            "group_by": agg["group_by"],
            "aggs": agg["aggs"],
        }
        if agg["having"]:
            entry["having"] = agg["having"]
        if spec["filters"]:
            entry["filters"] = spec["filters"]
        for key in (
            "paths", "optional", "minus", "filter_exprs", "bind",
            "annotations", "values", "values_rows", "subqueries", "union",
            "unions", "order_by", "offset",
        ):
            if spec.get(key):
                raise ValueError(f"subqueries do not support {key}")
        if spec["limit"] is not None:  # explicit: LIMIT 0 must not slip through
            raise ValueError("subqueries do not support limit")
        if spec["distinct"]:
            raise ValueError("subqueries do not support DISTINCT (groups are already distinct)")
        self.subqueries.append(entry)

    def _union_clause(self) -> None:
        alts = [self._plain_group("UNION")]
        while self._accept_word("UNION"):
            alts.append(self._plain_group("UNION"))
        if len(alts) < 2:
            raise ValueError("UNION needs at least two alternatives")
        self._union_groups.append(alts)

    # --- SELECT clause -------------------------------------------------
    def _select_query(self, subquery: bool = False) -> dict:
        self._expect_word("SELECT")
        distinct = False
        if self._accept_word("DISTINCT"):
            distinct = True
        elif self._accept_word("REDUCED"):
            distinct = True  # REDUCED permits dedup; we always do it
        projection: list[str] | None = []
        aggs: dict[str, tuple[str, str | None]] = {}
        proj_binds: list[tuple[str, object]] = []
        if self._accept_punct("*"):
            projection = None
        else:
            while True:
                t = self._peek()
                if t is not None and t.kind == "VAR":
                    self._next()
                    projection.append(t.text[1:])
                elif self._at_punct("("):
                    self._next()
                    alias, parsed = self._projection_expr()
                    projection.append(alias)
                    if parsed[0] == "agg":
                        aggs[alias] = parsed[1]
                    else:
                        proj_binds.append((alias, parsed[1]))
                else:
                    break
            if not projection:
                raise self._err("empty SELECT projection")
        self._accept_word("WHERE")
        self._group_graph_pattern()
        for alias, node in proj_binds:
            self._register_bind(alias, node)
        group_by: list[str] = []
        having: list[tuple[str, str, object]] = []
        if self._accept_word("GROUP"):
            self._expect_word("BY")
            while self._peek() is not None and self._peek().kind == "VAR":
                group_by.append(self._next().text[1:])
            if not group_by:
                raise self._err("empty GROUP BY")
        if self._accept_word("HAVING"):
            having = self._having_clause(aggs)
        order_by: list[tuple[str, str]] = []
        limit = offset = None
        while True:
            if self._accept_word("ORDER"):
                self._expect_word("BY")
                order_by = self._order_clause()
            elif self._accept_word("LIMIT"):
                limit = self._int_token("LIMIT")
            elif self._accept_word("OFFSET"):
                offset = self._int_token("OFFSET")
            else:
                break
        if self.union_alts is not None and (
            aggs or group_by or having or self.bind or self.annotations
        ):
            # the UNION dispatch evaluates standalone alternatives only —
            # silently dropping the aggregation/binds would NULL-pad the
            # aliases instead of computing them
            raise ValueError(
                "UNION queries do not support aggregates, GROUP BY, or "
                "expression projections (aggregate over the union in a "
                "wrapping query instead)"
            )
        if aggs and not group_by:
            raise ValueError(
                "aggregate projections require GROUP BY (whole-relation "
                "aggregates: group by a constant-bound variable instead)"
            )
        if group_by and not aggs:
            raise ValueError("GROUP BY without aggregate projections")
        if group_by:
            bare = [v for v in (projection or []) if v not in aggs]
            stray = [v for v in bare if v not in group_by]
            if stray:
                raise ValueError(
                    f"projected variables {stray} are neither aggregated nor "
                    "in GROUP BY"
                )
            if self.bind or self.values or self.subqueries or \
                    self.exists or self.not_exists:
                raise ValueError(
                    "aggregate queries do not support BIND/VALUES/subqueries/"
                    "EXISTS groups (aggregate in a subquery instead)"
                )
        agg_spec = (
            {"group_by": group_by, "aggs": aggs, "having": having}
            if group_by else None
        )
        return {
            "form": "select",
            "distinct": distinct,
            "project": projection,
            "agg": agg_spec,
            "order_by": order_by,
            "limit": limit,
            "offset": offset or 0,
            "patterns": self.patterns,
            "paths": self.paths,
            "optional": self.optional,
            "minus": self.minus,
            "exists": self.exists,
            "not_exists": self.not_exists,
            "filters": self.filters,
            "filter_exprs": self.filter_exprs,
            "bind": self.bind,
            "annotations": self.annotations,
            "hidden_annots": self.hidden_annots,
            "bnode_vars": self.bnode_vars,
            "values": self.values,
            "values_rows": self.values_rows,
            "subqueries": self.subqueries,
            "union": self.union_alts,
            "unions": self.embedded_unions,
        }

    def _projection_expr(self):
        """Inside ``( ... AS ?alias )``: an aggregate call or a BIND
        expression."""
        t = self._peek()
        if t is not None and t.kind == "WORD" and t.text.upper() in _AGG_KEYWORDS:
            fn_word = self._next().text.upper()
            self._expect_punct("(")
            distinct = self._accept_word("DISTINCT")
            if self._accept_punct("*"):
                var = None
            else:
                vt = self._next()
                if vt.kind != "VAR":
                    raise self._err("expected a variable in the aggregate")
                var = vt.text[1:]
            if fn_word == "GROUP_CONCAT" and self._accept_punct(";"):
                self._expect_word("SEPARATOR")
                self._expect_punct("=")
                sep_t = self._next()
                if sep_t.kind != "STRING" or _unescape(sep_t.text) != _bgp.GROUP_CONCAT_SEP:
                    raise ValueError(
                        f"GROUP_CONCAT separator must be {_bgp.GROUP_CONCAT_SEP!r} "
                        "(fixed so Spark and the oracle can never drift)"
                    )
            self._expect_punct(")")
            self._expect_word("AS")
            at = self._next()
            if at.kind != "VAR":
                raise self._err("expected a variable after AS")
            self._expect_punct(")")
            if var is None and fn_word != "COUNT":
                raise ValueError(f"{fn_word}(*) is not valid SPARQL")
            if distinct:
                if fn_word != "COUNT" or var is None:
                    raise ValueError("DISTINCT is supported in COUNT(DISTINCT ?v) only")
                return at.text[1:], ("agg", ("count_distinct", var))
            return at.text[1:], ("agg", (_AGG_FN_BY_KEYWORD[fn_word], var))
        node = self._bool_or_value()
        self._expect_word("AS")
        at = self._next()
        if at.kind != "VAR":
            raise self._err("expected a variable after AS")
        self._expect_punct(")")
        return at.text[1:], ("bind", node)

    def _having_clause(self, aggs) -> list[tuple[str, str, object]]:
        out = []
        while self._accept_punct("("):
            t = self._next()
            if t.kind == "VAR":
                alias = t.text[1:]
                if alias not in aggs:
                    raise ValueError(f"HAVING variable ?{alias} is not an aggregate alias")
            elif t.kind == "WORD" and t.text.upper() in _AGG_KEYWORDS:
                # HAVING(COUNT(?v) > n): resolve to the matching alias
                fn_word = t.text.upper()
                self._expect_punct("(")
                distinct = self._accept_word("DISTINCT")
                if self._accept_punct("*"):
                    var = None
                else:
                    var = self._next().text[1:]
                self._expect_punct(")")
                fn = "count_distinct" if distinct else _AGG_FN_BY_KEYWORD[fn_word]
                matches = [a for a, spec in aggs.items() if spec == (fn, var)]
                if not matches:
                    raise ValueError(
                        f"HAVING aggregate {fn_word} has no matching SELECT "
                        "alias (project it first)"
                    )
                alias = matches[0]
            else:
                raise self._err("expected an aggregate alias or call in HAVING")
            op_t = self._next()
            if op_t.kind != "PUNCT" or op_t.text not in _CMP_TOKENS:
                raise self._err("expected a comparison operator in HAVING")
            val_t = self._next()
            if val_t.kind == "INT":
                value: object = int(val_t.text)
            elif val_t.kind == "STRING":
                value = _unescape(val_t.text)
            else:
                raise self._err("expected a literal in HAVING")
            out.append((alias, _CMP_TOKENS[op_t.text], value))
            self._expect_punct(")")
        if not out:
            raise self._err("empty HAVING")
        return out

    def _int_token(self, what: str) -> int:
        t = self._peek()
        if t is None or t.kind != "INT":
            raise self._err(f"{what} takes a non-negative integer")
        self._next()
        return int(t.text)

    def _order_clause(self) -> list[tuple[str, str]]:
        out = []
        while True:
            t = self._peek()
            if t is None:
                break
            if t.kind == "VAR":
                self._next()
                out.append((t.text[1:], "asc"))
            elif t.kind == "WORD" and t.text.upper() in ("ASC", "DESC"):
                self._next()
                self._expect_punct("(")
                vt = self._next()
                if vt.kind != "VAR":
                    raise self._err("expected a variable in ASC()/DESC()")
                self._expect_punct(")")
                out.append((vt.text[1:], t.text.lower()))
            else:
                break
        if not out:
            raise self._err("empty ORDER BY")
        return out

    def _prologue(self) -> None:
        while self._at_word("PREFIX", "BASE"):
            if self._next().text.upper() == "BASE":
                raise ValueError("BASE is not supported (use absolute IRIs)")
            pt = self._next()
            if pt.kind != "PNAME" or not pt.text.endswith(":") or ":" in pt.text[:-1]:
                raise self._err("expected 'prefix:' in PREFIX declaration")
            it = self._next()
            if it.kind != "IRIREF":
                raise self._err("expected an IRI in PREFIX declaration")
            self.prefixes[pt.text[:-1]] = it.text[1:-1]

    # --- update forms --------------------------------------------------
    def _quad_block(self, label: str, ground: bool) -> list[tuple[str, ...]]:
        """Parse ``{ triples... GRAPH g { triples... } ... }`` into 3/4
        tuples (the QuadData / QuadPattern productions).  ``ground``
        additionally forbids variables (the DATA forms)."""
        self._expect_punct("{")
        out: list[tuple[str, ...]] = []
        while not self._at_punct("}"):
            if self._accept_word("GRAPH"):
                gt = self._term("graph")
                if gt.startswith('"'):
                    raise self._err("GRAPH term must be an IRI or variable")
                self._expect_punct("{")
                while not self._at_punct("}"):
                    out.extend(self._triples_block(gt, restricted=label))
                self._expect_punct("}")
            else:
                out.extend(self._triples_block(None, restricted=label))
        self._expect_punct("}")
        if not out:
            raise self._err(f"empty {label} block")
        if ground:
            for q in out:
                for term in q:
                    if term.startswith("?"):
                        raise ValueError(
                            f"{label} takes ground terms only (found {term})"
                        )
        return out

    def _graph_or_default(self) -> str | None:
        if self._accept_word("DEFAULT"):
            return None
        self._accept_word("GRAPH")
        return self._iri_token()

    def _modify_where(self) -> dict:
        """Restricted WHERE group for DELETE/INSERT-WHERE: the surface
        delete_insert supports (patterns, filters, paths, EXISTS / NOT
        EXISTS) — everything else raises instead of being dropped."""
        self._group_graph_pattern()
        unsupported = {
            "OPTIONAL": self.optional, "MINUS": self.minus,
            "BIND": self.bind, "VALUES": self.values or self.values_rows,
            "subqueries": self.subqueries,
            "UNION": self.union_alts or self.embedded_unions,
            "expression FILTER": self.filter_exprs,
            "LANG/DATATYPE": self.annotations,
        }
        for what, val in unsupported.items():
            if val:
                raise ValueError(
                    f"update WHERE clauses do not support {what} (the "
                    "mutation surface is patterns + scalar FILTER + paths "
                    "+ EXISTS/NOT EXISTS)"
                )
        return {
            "where": self.patterns,
            "filters": self.filters,
            "paths": self.paths,
            "exists": self.exists,
            "not_exists": self.not_exists,
        }

    def parse_update(self) -> dict:
        self._allow_exact_literals = True
        # SPARQL 1.1 Update forbids blank nodes in DELETE templates /
        # DELETE WHERE / DELETE DATA; permitting them here would turn a
        # spec-illegal label into a mass-matching free variable
        self._forbid_bnodes = "update patterns"
        self._prologue()
        if self._accept_word("LOAD"):
            t = self._next()
            if t.kind != "IRIREF":
                raise self._err("LOAD takes a source IRI (<file:...> or a path IRI)")
            into = None
            if self._accept_word("INTO"):
                self._expect_word("GRAPH")
                into = self._iri_token()
            spec: dict = {"form": "load", "source": t.text[1:-1], "into": into}
        elif self._accept_word("CLEAR"):
            spec = {"form": "clear", "graph": self._graph_or_default()}
        elif self._at_word("ADD", "COPY", "MOVE"):
            op = self._next().text.lower()
            src = self._graph_or_default()
            self._expect_word("TO")
            dst = self._graph_or_default()
            spec = {"form": op, "src": src, "dst": dst}
        elif self._accept_word("INSERT"):
            if self._accept_word("DATA"):
                spec = {
                    "form": "insert_data",
                    "quads": self._quad_block("INSERT DATA", ground=True),
                }
            else:
                tmpl = self._quad_block("INSERT template", ground=False)
                self._expect_word("WHERE")
                spec = {"form": "modify", "delete": [], "insert": tmpl,
                        "with_graph": None, **self._modify_where()}
        else:
            with_graph = None
            if self._accept_word("WITH"):
                with_graph = self._iri_token()
            self._expect_word("DELETE")
            if with_graph is None and self._accept_word("DATA"):
                spec = {
                    "form": "delete_data",
                    "quads": self._quad_block("DELETE DATA", ground=True),
                }
            elif self._accept_word("WHERE"):
                spec = {
                    "form": "delete_where",
                    "patterns": self._quad_block("DELETE WHERE", ground=False),
                    "with_graph": with_graph,
                }
            else:
                tmpl = self._quad_block("DELETE template", ground=False)
                ins: list[tuple[str, ...]] = []
                if self._accept_word("INSERT"):
                    ins = self._quad_block("INSERT template", ground=False)
                self._expect_word("WHERE")
                spec = {"form": "modify", "delete": tmpl, "insert": ins,
                        "with_graph": with_graph, **self._modify_where()}
        if self._peek() is not None:
            raise self._err("trailing tokens after the update")
        return spec

    # --- query forms ---------------------------------------------------
    def parse(self) -> dict:
        self._prologue()
        if self._at_word("SELECT"):
            spec = self._select_query()
        elif self._accept_word("ASK"):
            self._accept_word("WHERE")
            self._group_graph_pattern()
            if (self.paths or self.optional or self.minus or self.exists or
                    self.not_exists or self.filters or self.filter_exprs or
                    self.bind or self.annotations or self.values or
                    self.values_rows or self.subqueries or self.union_alts or
                    self.embedded_unions):
                raise ValueError(
                    "ASK supports plain triple patterns only (wrap richer "
                    "groups in a SELECT and test for rows)"
                )
            spec = {"form": "ask", "patterns": self.patterns}
        elif self._accept_word("CONSTRUCT"):
            # template bnodes mint fresh nodes per solution in SPARQL —
            # not coreferenced variables; reject rather than mis-build
            self._forbid_bnodes = "CONSTRUCT queries"
            template: list[tuple[str, ...]] = []
            if self._at_punct("{"):
                self._next()
                while not self._at_punct("}"):
                    template.extend(
                        self._triples_block(None, restricted="CONSTRUCT template")
                    )
                self._expect_punct("}")
                self._accept_word("WHERE")
            else:
                # CONSTRUCT WHERE { ... } shorthand: the pattern IS the
                # template (plain triples only, per the SPARQL grammar)
                self._expect_word("WHERE")
            self._group_graph_pattern()
            if not template:
                if self.optional:
                    raise ValueError(
                        "CONSTRUCT WHERE takes a plain BGP (no OPTIONAL) — "
                        "use the explicit-template form"
                    )
                template = [p for p in self.patterns]
                if any(len(p) == 4 for p in template):
                    raise ValueError(
                        "CONSTRUCT WHERE does not support GRAPH-scoped patterns"
                    )
            if (self.paths or self.minus or self.exists or self.not_exists or
                    self.filters or self.filter_exprs or self.bind or
                    self.annotations or self.values or self.values_rows or
                    self.subqueries or self.union_alts or self.embedded_unions):
                raise ValueError(
                    "CONSTRUCT supports plain patterns + OPTIONAL groups only"
                )
            if not template:
                raise ValueError("empty CONSTRUCT template")
            spec = {
                "form": "construct", "template": template,
                "patterns": self.patterns, "optional": self.optional,
            }
        elif self._accept_word("DESCRIBE"):
            t = self._peek()
            if t is not None and t.kind == "VAR":
                var = self._next().text[1:]
                self._accept_word("WHERE")
                self._group_graph_pattern()
                for what, val in (
                    ("BIND", self.bind), ("VALUES", self.values or self.values_rows),
                    ("subqueries", self.subqueries),
                    ("UNION", self.union_alts or self.embedded_unions),
                    ("LANG/DATATYPE", self.annotations), ("MINUS", self.minus),
                ):
                    if val:
                        raise ValueError(
                            f"DESCRIBE ?var WHERE does not support {what} "
                            "(bind the roots with patterns/paths/FILTER/"
                            "EXISTS groups)"
                        )
                spec = {
                    "form": "describe_where", "var": var,
                    "patterns": self.patterns, "paths": self.paths,
                    "optional": self.optional, "filters": self.filters,
                    "filter_exprs": self.filter_exprs,
                    "exists": self.exists, "not_exists": self.not_exists,
                }
            else:
                roots = []
                while self._peek() is not None and self._peek().kind in ("IRIREF", "PNAME"):
                    roots.append(self._iri_token())
                if not roots:
                    raise self._err("DESCRIBE takes one or more IRIs or one ?var")
                spec = {"form": "describe", "roots": roots}
        else:
            raise self._err("expected SELECT, ASK, CONSTRUCT or DESCRIBE")
        if self._peek() is not None:
            raise self._err("trailing tokens after the query")
        return spec


def parse_sparql_update(text: str) -> dict:
    """Parse a SPARQL 1.1 Update string — INSERT DATA / DELETE DATA /
    DELETE WHERE / [WITH g] DELETE-INSERT-WHERE / CLEAR / ADD / COPY /
    MOVE — into the normalized spec :func:`run_sparql_update` executes
    against the snapshot store.  Exact-term literal constants
    (``"lex"^^<dt>`` / ``"lex"@lang``) are accepted here (term-identity
    matching is an update-side concept)."""
    return _Parser(text).parse_update()


_UPDATE_ROW_SCHEMA = (
    "subj string, pred string, obj string, obj_is_iri boolean, "
    "obj_dt string, obj_lang string, graph string"
)


def _ground_quad_to_row(quad: tuple[str, ...]) -> tuple:
    """One INSERT DATA ground quad -> a standard triple-schema row.
    Tagged literals store (lex, lang); typed store (lex, dt); xsd:string
    normalizes to the plain form (RDF 1.1: they are the same term)."""
    from jsonld_ex_spark.operators.graph_update import _parse_exact_object

    s, p, o = quad[0], quad[1], quad[2]
    g = quad[3][1:-1] if len(quad) == 4 else None
    if not (s.startswith("<") and p.startswith("<")):
        raise ValueError(f"INSERT DATA subject/predicate must be IRIs: {quad!r}")
    exact = _parse_exact_object(o)
    if exact is not None:
        lex, dt_n, lang = exact
        if lang is not None:
            return (s[1:-1], p[1:-1], lex, False, None, lang, g)
        dt = None if dt_n == _bgp.XSD_STRING else dt_n
        return (s[1:-1], p[1:-1], lex, False, dt, None, g)
    if o.startswith("<"):
        return (s[1:-1], p[1:-1], o[1:-1], True, None, None, g)
    if o.startswith('"'):
        return (s[1:-1], p[1:-1], o[1:-1], False, None, None, g)
    raise ValueError(f"bad INSERT DATA object {o!r}")


def run_sparql_update(spark, table_dir: str, text: str) -> dict:
    """Execute a SPARQL Update string against a snapshot triple table
    (sources/snapshot_table.py) via the audited mutation operators in
    operators/graph_update.py.  Returns {"kind": ..., "snapshot": id}
    (snapshot -1 for the no-op graph-management cases that return the
    reader-visible snapshot unchanged)."""
    from jsonld_ex_spark.operators import graph_update as gu

    spec = parse_sparql_update(text)
    form = spec["form"]
    if form == "load":
        # SPARQL LOAD: ingest an N-Quads document (the reference
        # ecosystem's interchange format; read_nquads is the
        # line-splittable zero-shuffle source) and append-commit it —
        # INTO GRAPH <g> rewrites the destination graph, per spec.
        from pyspark.sql import functions as F

        from jsonld_ex_spark.operators.triples import read_nquads

        src = spec["source"]
        path = src[len("file://"):] if src.startswith("file://") else src
        df = read_nquads(spark, path)
        if spec["into"] is not None:
            df = df.withColumn("graph", F.lit(spec["into"]))
        snap = gu.insert_data(df, table_dir)
        return {"kind": "load", "snapshot": snap}
    if form == "insert_data":
        rows = [_ground_quad_to_row(q) for q in spec["quads"]]
        df = spark.createDataFrame(rows, _UPDATE_ROW_SCHEMA)
        snap = gu.insert_data(df, table_dir)
    elif form == "delete_data":
        snap = gu.delete_data(spark, table_dir, spec["quads"])
    elif form == "delete_where":
        snap = gu.delete_where(
            spark, table_dir, spec["patterns"], with_graph=spec["with_graph"]
        )
    elif form == "modify":
        snap = gu.delete_insert(
            spark, table_dir, spec["delete"], spec["insert"], spec["where"],
            filters=spec["filters"] or None, paths=spec["paths"] or None,
            exists=spec["exists"] or None,
            not_exists=spec["not_exists"] or None,
            with_graph=spec["with_graph"],
        )
    elif form == "clear":
        snap = gu.clear_graph(spark, table_dir, spec["graph"])
    else:
        fn = {"add": gu.add_graph, "copy": gu.copy_graph, "move": gu.move_graph}[form]
        snap = fn(spark, table_dir, spec["src"], spec["dst"])
    return {"kind": form, "snapshot": snap}


def parse_sparql(text: str) -> dict:
    """Parse a SPARQL query string into the engine's normalized plan
    spec (pattern tuples + expression ASTs + solution modifiers).  Pure
    Python — no Spark session required; raises ValueError with the
    offending offset on anything outside the supported fragment."""
    return _Parser(text).parse()


def _visible_project(spec) -> list[str] | None:
    """SELECT * projection when hidden annotation variables exist:
    enumerate the user-visible variables so helper columns stay out."""
    if spec.get("project") is not None:
        project = spec["project"]
        stray = set(project) & (spec.get("bnode_vars") or set())
        if stray:
            raise ValueError(
                f"blank-node variables cannot be projected: {sorted(stray)}"
            )
        return project
    hidden = (spec.get("hidden_annots") or set()) | (spec.get("bnode_vars") or set())
    if not hidden:
        return None
    vis: set[str] = set()
    for p in spec["patterns"]:
        for term in p:
            if term.startswith("?"):
                vis.add(term[1:])
    for s, _ast, o in spec["paths"]:
        for term in (s, o):
            if term.startswith("?"):
                vis.add(term[1:])
    for group in spec["optional"]:
        gpatterns, _gfilters = _bgp._norm_group(group)
        for p in gpatterns:
            for term in p:
                if term.startswith("?"):
                    vis.add(term[1:])
    vis |= {a for a in spec["annotations"] if a not in hidden}
    vis |= set(spec["bind"])
    for sub in spec["subqueries"]:
        vis |= set(sub["group_by"]) | set(sub["aggs"])
    for ui, alternatives in enumerate(spec.get("unions") or []):
        vis |= _bgp._union_parts(alternatives, ui)[1]
    out = sorted(vis - hidden)
    if not out:
        raise ValueError(
            "SELECT * would project nothing (every variable is a "
            "blank-node label); name at least one ?variable"
        )
    return out


def _select_kwargs(spec) -> dict:
    return {
        "optional": spec["optional"] or None,
        "minus": spec["minus"] or None,
        "filters": spec["filters"] or None,
        "paths": spec["paths"] or None,
        "values": spec["values"] or None,
        "exists": spec["exists"] or None,
        "not_exists": spec["not_exists"] or None,
        "bind": spec["bind"] or None,
        "annotations": spec["annotations"] or None,
        "filter_exprs": spec["filter_exprs"] or None,
        "subqueries": spec["subqueries"] or None,
        "values_rows": spec["values_rows"],
        "unions": spec.get("unions") or None,
    }


def _agg_args(spec) -> tuple[tuple, dict]:
    """Positional + keyword arguments shared by bgp_aggregate and its
    oracle mirror — ONE place so the two compilations cannot drift."""
    agg = spec["agg"]
    return (spec["patterns"], agg["group_by"], agg["aggs"]), {
        "optional": spec["optional"] or None, "minus": spec["minus"] or None,
        "filters": spec["filters"] or None, "paths": spec["paths"] or None,
        "having": agg["having"] or None,
        "annotations": spec["annotations"] or None,
        "filter_exprs": spec["filter_exprs"] or None,
        "values_rows": spec["values_rows"],
        "unions": spec.get("unions") or None,
    }


def _describe_where_kwargs(spec) -> dict:
    return {
        "optional": spec["optional"] or None, "filters": spec["filters"] or None,
        "paths": spec["paths"] or None, "filter_exprs": spec["filter_exprs"] or None,
        "exists": spec["exists"] or None, "not_exists": spec["not_exists"] or None,
    }


def _check_modifiers(spec) -> None:
    if spec["order_by"] and spec["limit"] is None:
        raise ValueError(
            "ORDER BY requires LIMIT (the engine pages with the bounded "
            "TakeOrdered shape; an unbounded global sort is refused by design)"
        )
    if spec["limit"] is not None and not spec["order_by"]:
        raise ValueError(
            "LIMIT requires ORDER BY over a total order (an unordered LIMIT "
            "is non-deterministic)"
        )
    if spec["offset"] and spec["limit"] is None:
        raise ValueError("OFFSET requires ORDER BY + LIMIT")


def sparql_query(triples, text: str):
    """Execute a SPARQL query string over the triple table — the full
    textual path: parse -> the audited BGP compiler -> DataFrame."""
    spec = parse_sparql(text)
    if spec["form"] == "ask":
        return _bgp.bgp_ask_df(triples, {"ask": spec["patterns"]})
    if spec["form"] == "construct":
        return _bgp.bgp_construct(
            triples, spec["patterns"], spec["template"],
            optional=spec["optional"] or None,
        )
    if spec["form"] == "describe":
        return _bgp.bgp_describe(triples, spec["roots"])
    if spec["form"] == "describe_where":
        roots = _bgp.bgp_select(
            triples, spec["patterns"], project=[spec["var"]],
            **_describe_where_kwargs(spec),
        )
        return _bgp.bgp_describe(triples, roots)
    _check_modifiers(spec)
    if spec["union"] is not None:
        if spec["project"] is None:
            raise ValueError("UNION queries need an explicit SELECT projection")
        df = _bgp.bgp_union(triples, spec["union"], spec["project"])
    elif spec["agg"] is not None:
        pos, kw = _agg_args(spec)
        df = _bgp.bgp_aggregate(triples, *pos, **kw)
        if spec["project"]:
            df = df.select(*spec["project"])
    else:
        df = _bgp.bgp_select(
            triples, spec["patterns"], project=_visible_project(spec),
            **_select_kwargs(spec),
        )
    if spec["order_by"]:
        return _bgp.bgp_order_limit(
            df, spec["order_by"], spec["limit"], spec["offset"],
            distinct=spec["distinct"],
        )
    if spec["distinct"]:
        df = df.dropDuplicates()
    return df


def sparql_oracle_sql(triples_sql: str, text: str) -> str:
    """DuckDB mirror of :func:`sparql_query` — the SAME parsed spec
    compiled through the established oracle generators, so a textual
    query is cross-engine checkable exactly like the programmatic
    forms."""
    spec = parse_sparql(text)
    if spec["form"] == "ask":
        return _bgp.bgp_ask_oracle_sql(triples_sql, {"ask": spec["patterns"]})
    if spec["form"] == "construct":
        return _bgp.bgp_construct_oracle_sql(
            triples_sql, spec["patterns"], spec["template"],
            optional=spec["optional"] or None,
        )
    if spec["form"] == "describe":
        roots_sql = " UNION ALL ".join(
            f"SELECT {_bgp._sql_quote(r)} AS root" for r in spec["roots"]
        )
        return _bgp.bgp_describe_oracle_sql(triples_sql, roots_sql)
    if spec["form"] == "describe_where":
        inner = _bgp.bgp_oracle_sql(
            triples_sql, spec["patterns"], project=[spec["var"]],
            **_describe_where_kwargs(spec),
        )
        roots_sql = f"SELECT {spec['var']} AS root FROM ({inner}) AS bound_roots"
        return _bgp.bgp_describe_oracle_sql(triples_sql, roots_sql)
    _check_modifiers(spec)
    if spec["union"] is not None:
        if spec["project"] is None:
            raise ValueError("UNION queries need an explicit SELECT projection")
        inner = _bgp.bgp_union_oracle_sql(triples_sql, spec["union"], spec["project"])
    elif spec["agg"] is not None:
        pos, kw = _agg_args(spec)
        inner = _bgp.bgp_aggregate_oracle_sql(triples_sql, *pos, **kw)
        if spec["project"]:
            inner = (
                f"SELECT {', '.join(spec['project'])} FROM ({inner}) AS aggregated"
            )
    else:
        inner = _bgp.bgp_oracle_sql(
            triples_sql, spec["patterns"], project=_visible_project(spec),
            **_select_kwargs(spec),
        )
    if spec["order_by"]:
        return _bgp.bgp_order_limit_oracle_sql(
            inner, spec["order_by"], spec["limit"], spec["offset"],
            distinct=spec["distinct"],
        )
    if spec["distinct"]:
        return f"SELECT DISTINCT * FROM ({inner}) AS solutions"
    return inner
