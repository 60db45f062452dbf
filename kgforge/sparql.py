"""Minimal SPARQL SELECT evaluator over the canonical triple DataFrame.

The reference interacts with its Jena ``Model`` exclusively through SPARQL
(11 templates built in ``data/QueryBuildingService.java``, executed by Jena
ARQ in ``data/QueryService.java``).  Those templates are each implemented as
dedicated operators elsewhere in this repo; this module adds what a Jena
user actually reaches for when they *switch*: ad-hoc SPARQL over the triple
table, compiled to a DataFrame plan so Catalyst/AQE — not a driver loop —
executes it.

Supported subset (covers every shape the reference's templates use, plus
the common exploratory forms):

- ``PREFIX pfx: <iri>`` declarations
- ``SELECT [DISTINCT] ?a ?b …``, ``SELECT *``, aggregate projections
  ``(COUNT(?v) AS ?alias)`` / ``COUNT(*)`` / ``COUNT(DISTINCT ?v)`` /
  ``SUM`` / ``AVG`` / ``MIN`` / ``MAX`` /
  ``GROUP_CONCAT(?v; SEPARATOR="…")`` (operands SORTED before joining so
  the result is partition-invariant — a documented divergence from Jena's
  encounter order, which is undefined under distribution), and projected
  ``(EXISTS { … } AS ?flag)`` (a LEFT join against the inner group's
  distinct shared variables, flag coalesced to false — lexical
  ``"true"``/``"false"`` bindings)
- ``DELETE { … } WHERE { … }`` updates via :func:`sparql_delete` — the
  template instantiates like CONSTRUCT and the graph is LEFT ANTI joined
  against it (the reference's delete-originals query runs verbatim)
- every SPARQL template the reference builds in
  ``data/QueryBuildingService.java`` parses and runs UNCHANGED after
  Jena's ``ParameterizedSparqlString`` parameter substitution
  (``tests/test_sparql_reference_templates.py`` executes all of them)
- ``WHERE { … }`` with:
  - basic graph patterns, ``.``-separated, with ``;`` predicate-object
    lists and ``,`` object lists; ``a`` sugar for rdf:type
  - property paths over constant predicates: ``^p`` (inverse), ``p1/p2``
    (sequence), ``p1|p2`` (alternation), ``p+``/``p*`` (transitive
    closure — a semi-naive iterated-DataFrame fixpoint, rounds bounded by
    the path diameter; ``*`` adds the spec's zero-length identity over the
    graph's terms), with parentheses — the ``rdf:rest*/rdf:first`` idiom
    the reference's attributeOrder closure walks
  - ``OPTIONAL { … }`` groups (compiled to left joins)
  - ``{ … } UNION { … }`` alternatives (compiled to ``unionByName`` with
    null-padding for variables bound on one side only)
  - negation: ``MINUS { … }`` and ``FILTER NOT EXISTS { … }`` compile to
    LEFT ANTI joins on the shared variables, ``FILTER EXISTS { … }`` to a
    LEFT SEMI join — the Spark-native forms (no row multiplication, AQE
    broadcasts the probe side when small).  Spec divergences kept: with NO
    shared variables MINUS removes nothing while (NOT) EXISTS tests the
    inner group's mere non-emptiness, both per spec; the inner group is
    compiled standalone, so correlated FILTERs that reference *outer*
    variables are not supported, and rows whose shared variable is unbound
    (from OPTIONAL) follow anti-join null semantics (kept) rather than the
    spec's unbound-is-compatible rule
  - ``{ SELECT … }`` subqueries (SPARQL 1.1 §12): evaluated bottom-up,
    only projected variables visible to the enclosing group (separate
    scope for inner non-projected names per spec); aggregate /
    DISTINCT / top-k (ORDER BY + LIMIT) subqueries all compile to the
    same DataFrame shapes as top-level queries and merge into the outer
    group as one more equi-join — the "join against a pre-aggregated
    side" idiom Catalyst/AQE already plans well at scale
  - ``VALUES ?v { … }`` / ``VALUES (?a ?b) { (…) … }`` inline data
    (``UNDEF`` → null), compiled to a literal DataFrame join — at scale
    this is the broadcast-join idiom for "restrict to this ID list"
  - ``FILTER ( expr )`` with ``= != < <= > >= && || !``, arithmetic
    ``+ - * /`` (operands coerced to double), ``regex(?v, "pat")``,
    ``bound(?v)``, ``isIRI(?v)``, ``isLiteral(?v)``, ``str(?v)``, and the
    SPARQL 1.1 builtins ``STRLEN UCASE LCASE CONCAT SUBSTR STRSTARTS
    STRENDS CONTAINS STRBEFORE STRAFTER REPLACE ABS CEIL FLOOR ROUND IF
    COALESCE`` — all compiled to JVM expressions, no Python in the row path
  - ``BIND ( expr AS ?var )`` — extends each solution with a computed
    literal binding (stored lexically like every binding, datatype in the
    companion column so CONSTRUCT emits a typed literal); applied after
    the group's pattern joins and before FILTER/negation, rebinding a
    bound variable is an error per spec, and a group of only BINDs
    extends the unit solution
  - a group of only OPTIONALs extends the spec's unit solution (one empty
    mapping), and an OPTIONAL sharing no variables is a true left join —
    the left row survives an empty inner group (both shapes appear in the
    reference's KPI-data template)
- ``GROUP BY ?a ?b`` + ``HAVING ( expr )`` (expr over aliases/keys)
- ``ORDER BY [ASC|DESC](?v) …``, ``LIMIT n`` and ``OFFSET n`` (either
  order; OFFSET without ORDER BY is implementation-defined per spec), and
  the ``SAMPLE`` aggregate (deterministically narrowed to the group MIN,
  like GROUP_CONCAT's sorted operands — documented divergences from
  Jena's arbitrary pick)

Aggregate typing over lexical bindings: ``COUNT`` counts non-null
bindings; ``SUM``/``AVG`` cast operands with ``try_cast`` to double
(SPARQL numeric aggregation over this engine's stored datatypes);
``MIN``/``MAX`` compare lexical forms (document the cast if you need
numeric extrema: ``xsd:integer`` lexical order ≠ numeric order).

Terms: ``?var``, ``<iri>``, ``pfx:local``, ``"string"``, integers/decimals,
``true``/``false``.

Compilation model — one scan per triple pattern, joined on shared
variables:

- a CONSTANT predicate becomes ``pred = <iri>`` on the scan, which is a
  partition-pruning predicate on the pred-partitioned graph sink
  (``kgforge/kg/io.py``) — at 100 TB each pattern reads only its
  predicate's partitions;
- constant subjects/objects push down as parquet filters;
- join order is left as written and joins are plain equi-joins on the
  shared variable columns — AQE picks broadcast/shuffle per side at
  runtime, exactly the decision we should not hand-schedule;
- patterns with no shared variables produce a cross join (a real SPARQL
  semantics corner — allowed, documented, and visible in the plan).

Variable bindings are lexical forms (strings); comparisons against a
numeric literal cast both sides with ``try_cast`` to double, matching
SPARQL's numeric-vs-numeric operator mapping for the datatypes this engine
stores.  DISTINCT/ORDER BY/LIMIT map to the DataFrame operators of the
same name (ORDER BY + LIMIT collapses to TakeOrdered).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class SparqlError(ValueError):
    pass


# --- tokenizer ---------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRI><[^<>\s]*>)
  | (?P<VAR>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<STRING>"(?:[^"\\]|\\.)*")
  | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+))
  | (?P<PNAME>[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z0-9_.-]*)
  | (?P<KEYWORD>[A-Za-z][A-Za-z0-9_]*)
  | (?P<OP><=|>=|!=|&&|\|\||[=<>!{}().;,*+/^|-])
    """,
    re.VERBOSE,
)


def _tokenize(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            raise SparqlError(f"unexpected character at offset {i}: {q[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "WS":
            out.append((kind, m.group()))
    out.append(("EOF", ""))
    return out


# --- AST ---------------------------------------------------------------------


@dataclass
class Term:
    kind: str  # "var" | "iri" | "str" | "num" | "bool"
    value: str


@dataclass
class Path:
    """Property-path expression over constant predicates.

    op ∈ {"iri", "inv", "seq", "alt", "plus", "star"}; args are child
    Paths ("iri" carries the IRI string instead)."""
    op: str
    args: list


@dataclass
class Pattern:
    s: Term
    p: Term | Path
    o: Term


@dataclass
class Group:
    patterns: list = field(default_factory=list)   # Pattern
    optionals: list = field(default_factory=list)  # Group
    filters: list = field(default_factory=list)    # expr AST tuples
    unions: list = field(default_factory=list)     # list[list[Group]]
    values: list = field(default_factory=list)     # (vars, rows) blocks
    subqueries: list = field(default_factory=list)  # Query ({ SELECT … })
    minuses: list = field(default_factory=list)    # Group (MINUS)
    exists: list = field(default_factory=list)     # Group (FILTER EXISTS)
    not_exists: list = field(default_factory=list)  # Group (FILTER NOT EXISTS)
    binds: list = field(default_factory=list)      # (expr AST, var) pairs

    def is_plain_triples(self) -> bool:
        return not (self.optionals or self.filters or self.unions
                    or self.values or self.minuses or self.exists
                    or self.not_exists or self.binds or self.subqueries)


@dataclass
class Agg:
    fn: str            # count | sum | avg | min | max | group_concat
    arg: str | None    # variable name, or None for COUNT(*)
    distinct: bool
    alias: str
    sep: str = " "     # GROUP_CONCAT separator (spec default: single space)


@dataclass
class ExistsProj:
    """``(EXISTS { … } AS ?alias)`` in a SELECT projection — evaluated as a
    LEFT join of the solutions against the inner group's distinct shared
    variables, flag coalesced to false (the Spark-native correlated-EXISTS
    plan; with no shared variables it degrades to a non-emptiness probe)."""
    group: Group
    alias: str


@dataclass
class Query:
    select: list  # var names / Agg items, or ["*"]
    distinct: bool
    where: Group
    group_by: list  # var names
    having: list    # expr AST tuples
    order_by: list  # (var, asc) pairs
    limit: int | None
    form: str = "select"            # select | ask | construct
    template: Group | None = None   # construct template (patterns only)
    offset: int | None = None       # OFFSET n (solution-slice skip)


class _Parser:
    def __init__(self, q: str):
        self.toks = _tokenize(q)
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str):
        k, v = self.next()
        if v.upper() != text.upper():
            raise SparqlError(f"expected {text!r}, got {v!r}")
        return v

    def kw(self, word: str) -> bool:
        k, v = self.peek()
        if k == "KEYWORD" and v.upper() == word.upper():
            self.next()
            return True
        return False

    # -- terms --
    def term(self) -> Term:
        k, v = self.next()
        if k == "VAR":
            return Term("var", v[1:])
        if k == "IRI":
            return Term("iri", v[1:-1])
        if k == "STRING":
            return Term("str", _unescape(v[1:-1]))
        if k == "NUMBER":
            return Term("num", v)
        if k == "PNAME":
            pfx, local = v.split(":", 1)
            if pfx not in self.prefixes:
                raise SparqlError(f"undeclared prefix {pfx!r}")
            return Term("iri", self.prefixes[pfx] + local)
        if k == "KEYWORD":
            if v == "a":
                return Term("iri", RDF_TYPE)
            if v.lower() in ("true", "false"):
                return Term("bool", v.lower())
        raise SparqlError(f"expected term, got {v!r}")

    # -- query --
    def parse(self) -> Query:
        while self.kw("PREFIX"):
            k, v = self.next()
            if k != "PNAME" or not v.endswith(":"):
                raise SparqlError(f"bad prefix name {v!r}")
            name = v[:-1]
            k2, v2 = self.next()
            if k2 != "IRI":
                raise SparqlError(f"bad prefix IRI {v2!r}")
            self.prefixes[name] = v2[1:-1]
        if self.kw("ASK"):
            where = self.group()
            k, v = self.next()
            if k != "EOF":
                raise SparqlError(f"trailing input at {v!r}")
            return Query([], False, where, [], [], [], None, form="ask")
        if self.kw("CONSTRUCT"):
            template = self.group()
            if not template.is_plain_triples():
                raise SparqlError("CONSTRUCT template must be plain triples")
            if any(isinstance(p.p, Path) for p in template.patterns):
                raise SparqlError("property paths are not valid in a CONSTRUCT template")
            if not template.patterns:
                raise SparqlError("empty CONSTRUCT template")
            if not self.kw("WHERE"):
                raise SparqlError("CONSTRUCT needs a WHERE clause")
            where = self.group()
            limit = None
            if self.kw("LIMIT"):
                k, v = self.next()
                if k != "NUMBER":
                    raise SparqlError("LIMIT expects a number")
                limit = int(v)
            k, v = self.next()
            if k != "EOF":
                raise SparqlError(f"trailing input at {v!r}")
            return Query([], False, where, [], [], [], limit,
                         form="construct", template=template)
        if self.kw("DESCRIBE"):
            terms = []
            while self.peek()[0] in ("VAR", "IRI", "PNAME"):
                terms.append(self.term())
            if not terms:
                raise SparqlError("empty DESCRIBE")
            where = Group()
            if self.kw("WHERE"):
                where = self.group()
            k, v = self.next()
            if k != "EOF":
                raise SparqlError(f"trailing input at {v!r}")
            return Query(terms, False, where, [], [], [], None, form="describe")
        if self.kw("DELETE"):
            template = self.group()
            if not template.is_plain_triples():
                raise SparqlError("DELETE template must be plain triples")
            if any(isinstance(p.p, Path) for p in template.patterns):
                raise SparqlError("property paths are not valid in a DELETE template")
            if not template.patterns:
                raise SparqlError("empty DELETE template")
            if not self.kw("WHERE"):
                raise SparqlError("DELETE needs a WHERE clause")
            where = self.group()
            k, v = self.next()
            if k != "EOF":
                raise SparqlError(f"trailing input at {v!r}")
            return Query([], False, where, [], [], [], None,
                         form="delete", template=template)
        q = self.select_query()
        k, v = self.next()
        if k != "EOF":
            raise SparqlError(f"trailing input at {v!r}")
        return q

    def select_query(self) -> Query:
        """``SELECT … WHERE { … } [GROUP BY/HAVING/ORDER BY/LIMIT]`` — the
        shared core of a top-level query and a ``{ SELECT … }`` subquery
        (which stops at the enclosing ``}`` instead of EOF)."""
        if not self.kw("SELECT"):
            raise SparqlError(
                "only SELECT/ASK/CONSTRUCT/DELETE queries are supported"
            )
        distinct = self.kw("DISTINCT")
        select: list = []
        while True:
            k, v = self.peek()
            if k == "VAR":
                select.append(self.next()[1][1:])
            elif v == "(":
                self.next()
                nk, nv = self.peek()
                if nk == "KEYWORD" and nv.upper() == "EXISTS":
                    self.next()
                    eg = self.group()
                    if not self.kw("AS"):
                        raise SparqlError("EXISTS projection needs AS ?alias")
                    a = self.term()
                    if a.kind != "var":
                        raise SparqlError("AS expects a variable")
                    self.expect(")")
                    select.append(ExistsProj(eg, a.value))
                else:
                    select.append(self.agg_item())
            elif v == "*":
                self.next()
                select = ["*"]
                break
            else:
                break
        if not select:
            raise SparqlError("empty SELECT clause")
        if not self.kw("WHERE"):
            raise SparqlError("missing WHERE")
        where = self.group()
        group_by: list[str] = []
        if self.kw("GROUP"):
            self.expect("BY")
            while self.peek()[0] == "VAR":
                group_by.append(self.next()[1][1:])
            if not group_by:
                raise SparqlError("empty GROUP BY")
        having: list = []
        if self.kw("HAVING"):
            self.expect("(")
            having.append(self.expr())
            self.expect(")")
        order_by: list[tuple[str, bool]] = []
        if self.kw("ORDER"):
            self.expect("BY")
            while True:
                k, v = self.peek()
                if k == "KEYWORD" and v.upper() in ("ASC", "DESC"):
                    asc = self.next()[1].upper() == "ASC"
                    self.expect("(")
                    var = self.term()
                    self.expect(")")
                elif k == "VAR":
                    asc, var = True, self.term()
                else:
                    break
                if var.kind != "var":
                    raise SparqlError("ORDER BY expects a variable")
                order_by.append((var.value, asc))
            if not order_by:
                raise SparqlError("empty ORDER BY")
        limit = offset = None
        while True:  # LIMIT / OFFSET accepted in either order, per spec
            if limit is None and self.kw("LIMIT"):
                k, v = self.next()
                if k != "NUMBER":
                    raise SparqlError("LIMIT expects a number")
                limit = int(v)
            elif offset is None and self.kw("OFFSET"):
                k, v = self.next()
                if k != "NUMBER":
                    raise SparqlError("OFFSET expects a number")
                offset = int(v)
            else:
                break
        return Query(select, distinct, where, group_by, having, order_by,
                     limit, offset=offset)

    def agg_item(self) -> Agg:
        """``AGG([DISTINCT] ?v | *) AS ?alias`` — the '(' is consumed.
        ``GROUP_CONCAT`` additionally accepts ``; SEPARATOR="…"``."""
        k, v = self.next()
        fn = v.lower()
        if k != "KEYWORD" or fn not in (
            "count", "sum", "avg", "min", "max", "group_concat", "sample"
        ):
            raise SparqlError(f"expected aggregate function, got {v!r}")
        self.expect("(")
        distinct = self.kw("DISTINCT")
        arg: str | None
        if self.peek()[1] == "*":
            if fn != "count":
                raise SparqlError(f"{fn.upper()}(*) is not valid")
            self.next()
            arg = None
        else:
            t = self.term()
            if t.kind != "var":
                raise SparqlError("aggregate argument must be a variable")
            arg = t.value
        sep = " "
        if self.peek()[1] == ";":
            if fn != "group_concat":
                raise SparqlError("only GROUP_CONCAT takes a SEPARATOR")
            self.next()
            if not self.kw("SEPARATOR"):
                raise SparqlError("expected SEPARATOR after ';'")
            self.expect("=")
            sk, sv = self.next()
            if sk != "STRING":
                raise SparqlError("SEPARATOR expects a string literal")
            sep = _unescape(sv[1:-1])
        self.expect(")")
        if not self.kw("AS"):
            raise SparqlError("aggregate projection needs AS ?alias")
        a = self.term()
        if a.kind != "var":
            raise SparqlError("AS expects a variable")
        self.expect(")")
        return Agg(fn, arg, distinct, a.value, sep)

    def group(self) -> Group:
        self.expect("{")
        g = Group()
        while True:
            k, v = self.peek()
            if v == "}":
                self.next()
                return g
            if k == "KEYWORD" and v.upper() == "OPTIONAL":
                self.next()
                g.optionals.append(self.group())
                continue
            if k == "KEYWORD" and v.upper() == "MINUS":
                self.next()
                g.minuses.append(self.group())
                continue
            if k == "KEYWORD" and v.upper() == "FILTER":
                self.next()
                nk, nv = self.peek()
                if nk == "KEYWORD" and nv.upper() == "EXISTS":
                    self.next()
                    g.exists.append(self.group())
                    continue
                if nk == "KEYWORD" and nv.upper() == "NOT":
                    self.next()
                    if not self.kw("EXISTS"):
                        raise SparqlError("expected EXISTS after FILTER NOT")
                    g.not_exists.append(self.group())
                    continue
                self.expect("(")
                g.filters.append(self.expr())
                self.expect(")")
                continue
            if k == "KEYWORD" and v.upper() == "VALUES":
                self.next()
                g.values.append(self.values_block())
                continue
            if k == "KEYWORD" and v.upper() == "BIND":
                self.next()
                self.expect("(")
                e = self.expr()
                if not self.kw("AS"):
                    raise SparqlError("expected AS in BIND(expr AS ?var)")
                t = self.term()
                if t.kind != "var":
                    raise SparqlError("BIND target must be a variable")
                self.expect(")")
                g.binds.append((e, t.value))
                if self.peek()[1] == ".":
                    self.next()
                continue
            if v == "{" and self.i + 1 < len(self.toks) and (
                self.toks[self.i + 1][0] == "KEYWORD"
                and self.toks[self.i + 1][1].upper() == "SELECT"
            ):  # { SELECT … } subquery
                self.next()
                g.subqueries.append(self.select_query())
                self.expect("}")
                if self.peek()[1] == ".":
                    self.next()
                continue
            if v == "{":  # { … } UNION { … } [UNION { … }]*
                alts = [self.group()]
                while self.kw("UNION"):
                    alts.append(self.group())
                g.unions.append(alts)  # a lone nested group is a 1-way union
                if self.peek()[1] == ".":
                    self.next()
                continue
            # triple pattern with ; and , lists
            s = self.term()
            while True:
                p = self.path()
                while True:
                    o = self.term()
                    g.patterns.append(Pattern(s, p, o))
                    if self.peek()[1] == ",":
                        self.next()
                        continue
                    break
                if self.peek()[1] == ";":
                    self.next()
                    if self.peek()[1] in ("}", "."):
                        break  # dangling ';' tolerated, Turtle-style
                    continue
                break
            if self.peek()[1] == ".":
                self.next()

    # -- property paths: alt → seq → step → primary --
    def path(self) -> Term | Path:
        """Predicate position: a variable, a plain IRI, or a property path
        (``^p``, ``p1/p2``, ``p1|p2``, ``p+``, ``p*``, parentheses)."""
        if self.peek()[0] == "VAR":
            return self.term()  # a var predicate admits no path operators
        node = self._path_seq()
        while self.peek()[1] == "|":
            self.next()
            node = Path("alt", [node, self._path_seq()])
        if isinstance(node, Path) and node.op == "iri":
            return Term("iri", node.args[0])  # plain predicate fast path
        return node

    def _path_seq(self) -> Path:
        node = self._path_step()
        while self.peek()[1] == "/":
            self.next()
            node = Path("seq", [node, self._path_step()])
        return node

    def _path_step(self) -> Path:
        inv = False
        if self.peek()[1] == "^":
            self.next()
            inv = True
        if self.peek()[1] == "(":
            self.next()
            node = self.path()
            if isinstance(node, Term):
                if node.kind != "iri":
                    raise SparqlError("variables cannot appear inside a path")
                node = Path("iri", [node.value])
            self.expect(")")
        else:
            t = self.term()
            if t.kind != "iri":
                raise SparqlError(f"property path expects an IRI, got {t!r}")
            node = Path("iri", [t.value])
        if inv:
            node = Path("inv", [node])
        nxt = self.peek()[1]
        if nxt in ("+", "*"):
            self.next()
            node = Path("plus" if nxt == "+" else "star", [node])
        return node

    def values_block(self) -> tuple[list[str], list[list]]:
        """``VALUES ?v { t … }`` or ``VALUES (?a ?b) { (t t) … }``."""
        vars_: list[str] = []
        if self.peek()[1] == "(":
            self.next()
            while self.peek()[0] == "VAR":
                vars_.append(self.next()[1][1:])
            self.expect(")")
        elif self.peek()[0] == "VAR":
            vars_.append(self.next()[1][1:])
        if not vars_:
            raise SparqlError("VALUES needs at least one variable")
        self.expect("{")
        rows: list[list] = []
        while self.peek()[1] != "}":
            if self.peek()[1] == "(":
                self.next()
                row = []
                while self.peek()[1] != ")":
                    row.append(self._values_term())
                self.next()
            else:
                row = [self._values_term()]
            if len(row) != len(vars_):
                raise SparqlError(
                    f"VALUES row width {len(row)} != {len(vars_)} variables"
                )
            rows.append(row)
        self.next()  # }
        return vars_, rows

    def _values_term(self):
        k, v = self.peek()
        if k == "KEYWORD" and v.upper() == "UNDEF":
            self.next()
            return None
        t = self.term()
        if t.kind == "var":
            raise SparqlError("VALUES data must be constants")
        return t.value

    # -- filter expressions: or → and → unary → cmp → primary --
    def expr(self):
        node = self.expr_and()
        while self.peek()[1] == "||":
            self.next()
            node = ("or", node, self.expr_and())
        return node

    def expr_and(self):
        node = self.expr_unary()
        while self.peek()[1] == "&&":
            self.next()
            node = ("and", node, self.expr_unary())
        return node

    def expr_unary(self):
        if self.peek()[1] == "!":
            self.next()
            return ("not", self.expr_unary())
        if self.peek()[1] == "(":
            self.next()
            node = self.expr()
            self.expect(")")
            return node
        return self.expr_cmp()

    def expr_cmp(self):
        left = self.expr_add()
        k, v = self.peek()
        if v in ("=", "!=", "<", "<=", ">", ">="):
            self.next()
            right = self.expr_add()
            return ("cmp", v, left, right)
        return ("truthy", left)

    def expr_add(self):
        node = self.expr_mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("arith", op, node, self.expr_mul())
        return node

    def expr_mul(self):
        node = self.primary()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            node = ("arith", op, node, self.primary())
        return node

    _FUNCS = (
        "regex", "bound", "isiri", "isliteral", "str",
        "strlen", "ucase", "lcase", "concat", "substr",
        "strstarts", "strends", "contains", "strbefore", "strafter",
        "replace", "abs", "ceil", "floor", "round", "if", "coalesce",
    )

    def primary(self):
        k, v = self.peek()
        if k == "KEYWORD" and v.lower() in self._FUNCS:
            fn = self.next()[1].lower()
            self.expect("(")
            args = [self.expr()]
            while self.peek()[1] == ",":
                self.next()
                args.append(self.expr())
            self.expect(")")
            return ("fn", fn, args)
        if v == "(":
            self.next()
            node = self.expr()
            self.expect(")")
            return node
        return ("term", self.term())


def _unescape(s: str) -> str:
    return (
        s.replace("\\\\", "\x00").replace('\\"', '"').replace("\\n", "\n")
        .replace("\\t", "\t").replace("\x00", "\\")
    )


# --- compiler ----------------------------------------------------------------


def _m_iri(v: str) -> str:
    return f"__m_{v}_iri"


def _m_dt(v: str) -> str:
    return f"__m_{v}_dt"


_REL_COLS = ["_ps", "_ps_iri", "_ps_dt", "_po", "_po_iri", "_po_dt"]


def _path_rel(triples: DataFrame, path: Path, max_iter: int = 64) -> DataFrame:
    """Compile a property path to its binary relation: columns ``_ps … _po``
    with the endpoints' IRI-ness/datatype companions.

    ``seq``/``alt``/``inv`` are joins/unions/column swaps.  ``plus``/``star``
    run a semi-naive transitive-closure loop — per round one equi-join of the
    frontier against the base edges, a distinct, and an anti-join against
    what's already reached; rounds are bounded by the path's diameter, and
    each round ``localCheckpoint``s to keep the plan flat (the same shape as
    ``kgforge/kg/components.py``'s hash-min loop).  ``star`` adds zero-length
    paths: per the SPARQL spec those connect every term IN THE GRAPH to
    itself, so the identity relation is built from the graph's subjects and
    objects."""
    if path.op == "iri":
        return triples.filter(F.col("pred") == path.args[0]).select(
            F.col("subj").alias("_ps"),
            F.lit(True).alias("_ps_iri"),
            F.lit("iri").alias("_ps_dt"),
            F.col("obj_value").alias("_po"),
            F.col("obj_is_iri").alias("_po_iri"),
            F.col("obj_dtype").alias("_po_dt"),
        )
    if path.op == "inv":
        r = _path_rel(triples, path.args[0], max_iter)
        return r.select(
            F.col("_po").alias("_ps"), F.col("_po_iri").alias("_ps_iri"),
            F.col("_po_dt").alias("_ps_dt"), F.col("_ps").alias("_po"),
            F.col("_ps_iri").alias("_po_iri"), F.col("_ps_dt").alias("_po_dt"),
        )
    if path.op == "seq":
        r1 = _path_rel(triples, path.args[0], max_iter)
        r2 = _path_rel(triples, path.args[1], max_iter).select(
            *[F.col(c).alias(f"{c}__r") for c in _REL_COLS]
        )
        return r1.join(r2, F.col("_po") == F.col("_ps__r")).select(
            "_ps", "_ps_iri", "_ps_dt",
            F.col("_po__r").alias("_po"), F.col("_po_iri__r").alias("_po_iri"),
            F.col("_po_dt__r").alias("_po_dt"),
        )
    if path.op == "alt":
        r1 = _path_rel(triples, path.args[0], max_iter)
        return r1.unionByName(_path_rel(triples, path.args[1], max_iter)).distinct()
    if path.op in ("plus", "star"):
        base = _path_rel(triples, path.args[0], max_iter).distinct()
        step = base.select(*[F.col(c).alias(f"{c}__r") for c in _REL_COLS])
        reach = base.localCheckpoint(eager=True)
        frontier = reach
        for _ in range(max_iter):
            nxt = (
                frontier.join(step, F.col("_po") == F.col("_ps__r"))
                .select(
                    "_ps", "_ps_iri", "_ps_dt",
                    F.col("_po__r").alias("_po"),
                    F.col("_po_iri__r").alias("_po_iri"),
                    F.col("_po_dt__r").alias("_po_dt"),
                )
                .distinct()
                .join(reach, ["_ps", "_po"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if not nxt.limit(1).count():
                break
            frontier = nxt
            reach = reach.unionByName(nxt).localCheckpoint(eager=True)
        else:
            raise SparqlError(
                f"property path closure did not converge in {max_iter} rounds"
            )
        if path.op == "plus":
            return reach
        terms = triples.select(
            F.col("subj").alias("_t"), F.lit(True).alias("_t_iri"),
            F.lit("iri").alias("_t_dt"),
        ).unionByName(
            triples.select(
                F.col("obj_value").alias("_t"),
                F.col("obj_is_iri").alias("_t_iri"),
                F.col("obj_dtype").alias("_t_dt"),
            )
        ).distinct()
        ident = terms.select(
            F.col("_t").alias("_ps"), F.col("_t_iri").alias("_ps_iri"),
            F.col("_t_dt").alias("_ps_dt"), F.col("_t").alias("_po"),
            F.col("_t_iri").alias("_po_iri"), F.col("_t_dt").alias("_po_dt"),
        )
        return reach.unionByName(ident).distinct()
    raise SparqlError(f"unsupported path operator {path.op!r}")


def _path_pattern_df(triples: DataFrame, pat: Pattern) -> tuple[DataFrame, set]:
    """A triple pattern whose predicate is a property path: endpoints bind
    against the path's compiled relation (either endpoint may be a literal —
    an inverse path puts the original object on the left)."""
    df = _path_rel(triples, pat.p)
    out_cols: list[Column] = []
    bound: set[str] = set()
    seen: dict[str, str] = {}
    for (vcol, icol, dcol), term in (
        (("_ps", "_ps_iri", "_ps_dt"), pat.s),
        (("_po", "_po_iri", "_po_dt"), pat.o),
    ):
        if term.kind == "var":
            if term.value in seen:
                df = df.filter(F.col(vcol) == F.col(seen[term.value]))
            else:
                seen[term.value] = vcol
                out_cols.append(F.col(vcol).alias(term.value))
                out_cols.append(F.col(icol).alias(_m_iri(term.value)))
                out_cols.append(F.col(dcol).alias(_m_dt(term.value)))
                bound.add(term.value)
        elif term.kind == "iri":
            df = df.filter((F.col(vcol) == term.value) & F.col(icol))
        elif term.kind in ("str", "bool"):
            df = df.filter((F.col(vcol) == term.value) & (~F.col(icol)))
        elif term.kind == "num":
            df = df.filter(
                F.expr(f"try_cast({vcol} AS DOUBLE)") == float(term.value)
            )
    return df.select(*out_cols), bound


def _pattern_df(triples: DataFrame, pat: Pattern) -> tuple[DataFrame, set]:
    """One triple pattern → a filtered scan projected to its variables.

    Each variable also carries two hidden companion columns
    (``__m_<v>_iri``, ``__m_<v>_dt``): the binding's IRI-ness and datatype.
    Subject/predicate bindings are IRIs by RDF definition; object bindings
    copy the triple's ``obj_is_iri``/``obj_dtype``.  CONSTRUCT templates and
    ``isIRI()`` read these instead of guessing from the lexical shape."""
    if isinstance(pat.p, Path):
        return _path_pattern_df(triples, pat)
    df = triples
    out_cols: list[Column] = []
    bound: set[str] = set()
    slots = (("subj", pat.s), ("pred", pat.p), ("obj_value", pat.o))
    seen: dict[str, str] = {}
    for col, term in slots:
        if term.kind == "var":
            if term.value in seen:  # e.g. ?x ?p ?x — intra-pattern equality
                df = df.filter(F.col(col) == F.col(seen[term.value]))
            else:
                seen[term.value] = col
                out_cols.append(F.col(col).alias(term.value))
                if col == "obj_value":
                    out_cols.append(F.col("obj_is_iri").alias(_m_iri(term.value)))
                    out_cols.append(F.col("obj_dtype").alias(_m_dt(term.value)))
                else:
                    out_cols.append(F.lit(True).alias(_m_iri(term.value)))
                    out_cols.append(F.lit("iri").alias(_m_dt(term.value)))
                bound.add(term.value)
        elif term.kind == "iri":
            df = df.filter(F.col(col) == term.value)
            if col == "obj_value":
                df = df.filter(F.col("obj_is_iri"))
        elif term.kind in ("str", "bool"):
            if col != "obj_value":
                raise SparqlError("literals are only valid in object position")
            df = df.filter(
                (F.col("obj_value") == term.value) & (~F.col("obj_is_iri"))
            )
        elif term.kind == "num":
            if col != "obj_value":
                raise SparqlError("literals are only valid in object position")
            df = df.filter(
                F.expr("try_cast(obj_value AS DOUBLE)") == float(term.value)
            )
    return df.select(*out_cols), bound


def _union_df(triples: DataFrame, alts: list) -> tuple[DataFrame, set]:
    """``{A} UNION {B}`` → unionByName with null-padding: a variable bound
    in only one branch is null in the other's rows (SPARQL's unbound)."""
    dfs, all_vars = [], set()
    for alt in alts:
        adf, avars = _join_group(triples, alt)
        dfs.append((adf, avars))
        all_vars |= avars
    sel_cols = []
    for v in sorted(all_vars):
        sel_cols.append((v, "string"))
        sel_cols.append((_m_iri(v), "boolean"))
        sel_cols.append((_m_dt(v), "string"))
    padded = [
        adf.select(*[
            F.col(c) if c in adf.columns else F.lit(None).cast(t).alias(c)
            for c, t in sel_cols
        ])
        for adf, avars in dfs
    ]
    out = padded[0]
    for p in padded[1:]:
        out = out.unionByName(p)
    return out, all_vars


def _values_df(spark, vars_: list, rows: list) -> DataFrame:
    """Inline data; bindings carry literal-string companions (VALUES terms
    that are IRIs still join fine — companions matter only in CONSTRUCT
    object slots and isIRI())."""
    df = spark.createDataFrame(
        [tuple(r) for r in rows], schema=", ".join(f"{v} string" for v in vars_)
    )
    for v in vars_:
        df = df.withColumn(_m_iri(v), F.lit(False)).withColumn(
            _m_dt(v), F.lit("string")
        )
    return df


def _merge(acc, bound, pdf, pvars, how: str = "inner"):
    if acc is None:
        return pdf, set(pvars)
    shared = sorted(bound & pvars)
    if shared:
        # the left side already carries the shared vars' companions
        dup = [c for v in shared for c in (_m_iri(v), _m_dt(v))
               if c in pdf.columns]
        acc = acc.join(pdf.drop(*dup), on=shared, how=how)
    elif how == "inner":
        acc = acc.crossJoin(pdf)
    else:
        # SPARQL leftjoin with no shared variables: cross product, but the
        # left row survives when the inner group is empty
        acc = acc.join(pdf, F.lit(True), how="left")
    return acc, bound | pvars


def _join_group(triples: DataFrame, g: Group) -> tuple[DataFrame, set]:
    acc: DataFrame | None = None
    bound: set[str] = set()
    for pat in g.patterns:
        pdf, pvars = _pattern_df(triples, pat)
        acc, bound = _merge(acc, bound, pdf, pvars)
    for alts in g.unions:
        udf, uvars = _union_df(triples, alts)
        acc, bound = _merge(acc, bound, udf, uvars)
    for vars_, rows in g.values:
        vdf = _values_df(triples.sparkSession, vars_, rows)
        acc, bound = _merge(acc, bound, vdf, set(vars_))
    for sq in g.subqueries:
        sdf, svars = _subquery_df(triples, sq)
        acc, bound = _merge(acc, bound, sdf, svars)
    if acc is None:
        if not (g.optionals or g.exists or g.not_exists or g.binds):
            raise SparqlError("empty graph pattern")
        # the spec's unit solution: a group of only OPTIONALs/negation
        # extends one empty mapping (the reference's KPI-data query shape)
        acc = triples.sparkSession.range(1).select(
            F.lit(True).alias("__unit")
        )
    for og in g.optionals:
        odf, ovars = _join_group(triples, og)
        acc, bound = _merge(acc, bound, odf, ovars, how="left")
    for bexpr, bvar in g.binds:
        # BIND extends each solution with a computed literal binding.  It is
        # applied after the group's pattern joins (so it may reference any
        # variable the group binds) and before FILTER/negation; the value is
        # stored lexically (string) like every binding, with its dtype in
        # the companion column so CONSTRUCT emits a typed literal.
        if bvar in bound:
            raise SparqlError(f"BIND would rebind already-bound ?{bvar}")
        col = _compile_expr(bexpr, bound, set(acc.columns))
        acc = (
            acc.withColumn(bvar, col.cast("string"))
            .withColumn(_m_iri(bvar), F.lit(False))
            .withColumn(_m_dt(bvar), F.lit(_expr_dtype(bexpr)))
        )
        bound = bound | {bvar}
    for mg in g.minuses:
        mdf, mvars = _join_group(triples, mg)
        shared = sorted(bound & mvars)
        # spec: MINUS with disjoint variable domains removes nothing
        if shared:
            acc = acc.join(mdf.select(*shared), on=shared, how="left_anti")
    for eg, how in [(x, "left_semi") for x in g.exists] + \
                   [(x, "left_anti") for x in g.not_exists]:
        edf, evars = _join_group(triples, eg)
        shared = sorted(bound & evars)
        if shared:
            acc = acc.join(edf.select(*shared), on=shared, how=how)
        else:
            # no shared variables: (NOT) EXISTS tests mere non-emptiness
            probe = edf.select(F.lit(1).alias("__k_exists")).limit(1)
            acc = acc.withColumn("__k_exists", F.lit(1)).join(
                probe, on="__k_exists", how=how
            ).drop("__k_exists")
    for fexpr in g.filters:
        acc = acc.filter(_compile_expr(fexpr, bound, set(acc.columns)))
    return acc, bound


def _compile_term(t: Term, bound: set, numeric: bool = False):
    if t.kind == "var":
        if t.value not in bound:
            raise SparqlError(f"filter references unbound variable ?{t.value}")
        c = F.col(t.value)
        return c.cast("double") if numeric else c
    if t.kind == "num":
        return F.lit(float(t.value))
    if t.kind == "bool":
        return F.lit(t.value)
    return F.lit(t.value)


_BOOL_FNS = ("regex", "bound", "isiri", "isliteral",
             "strstarts", "strends", "contains")


def _expr_dtype(node) -> str:
    """Static datatype of a BIND expression for the companion column."""
    if node[0] == "truthy":
        return _expr_dtype(node[1])
    if node[0] in ("or", "and", "not", "cmp"):
        return "boolean"
    if node[0] == "arith":
        return "double"
    if node[0] == "fn":
        fn = node[1]
        if fn in _BOOL_FNS:
            return "boolean"
        if fn in ("strlen", "ceil", "floor", "round"):
            return "long"
        if fn == "abs":
            return "double"
        if fn == "if":
            return _expr_dtype(node[2][1])
        if fn == "coalesce":
            return _expr_dtype(node[2][0])
        return "string"
    if node[0] == "term":
        t = node[1]
        return {"num": "double", "bool": "boolean"}.get(t.kind, "string")
    return "string"


def _unwrap_term(node) -> Term | None:
    """Peel ``truthy`` wrappers; return the underlying Term or None."""
    while node[0] == "truthy":
        node = node[1]
    return node[1] if node[0] == "term" else None


def _is_numeric_node(node) -> bool:
    if node[0] == "truthy":
        return _is_numeric_node(node[1])
    if node[0] == "arith":
        return True
    if node[0] == "fn":
        return node[1] in ("strlen", "abs", "ceil", "floor", "round")
    return node[0] == "term" and node[1].kind == "num"


def _lit_str(node, what: str) -> str:
    t = _unwrap_term(node)
    if t is None or t.kind != "str":
        raise SparqlError(f"{what} must be a string literal")
    return t.value


def _compile_expr(node, bound: set, meta: set = frozenset()) -> Column:
    op = node[0]
    if op == "or":
        return _compile_expr(node[1], bound, meta) | _compile_expr(node[2], bound, meta)
    if op == "and":
        return _compile_expr(node[1], bound, meta) & _compile_expr(node[2], bound, meta)
    if op == "not":
        return ~_compile_expr(node[1], bound, meta)
    if op == "truthy":
        return _compile_expr(node[1], bound, meta)
    if op == "cmp":
        _, sym, ln, rn = node
        numeric = any(_is_numeric_node(n) for n in (ln, rn))
        lc = _compile_operand(ln, bound, numeric, meta)
        rc = _compile_operand(rn, bound, numeric, meta)
        return {
            "=": lc == rc, "!=": lc != rc, "<": lc < rc,
            "<=": lc <= rc, ">": lc > rc, ">=": lc >= rc,
        }[sym]
    if op == "arith":
        _, sym, ln, rn = node
        lc = _compile_operand(ln, bound, True, meta)
        rc = _compile_operand(rn, bound, True, meta)
        return {
            "+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc,
        }[sym]
    if op == "fn":
        _, fn, args = node

        def S(i):  # string-typed operand
            return _compile_operand(args[i], bound, False, meta)

        def N(i):  # numeric-typed operand
            return _compile_operand(args[i], bound, True, meta)

        if fn == "regex":
            return S(0).rlike(_lit_str(args[1], "regex() pattern"))
        if fn == "bound":
            return S(0).isNotNull()
        if fn in ("isiri", "isliteral"):
            t = _unwrap_term(args[0])
            if t is not None and t.kind == "var" and _m_iri(t.value) in meta:
                # the binding's real IRI flag, carried from the scan;
                # unbound (null) is neither an IRI nor a literal
                flag = F.col(_m_iri(t.value))
                c = flag if fn == "isiri" else ~flag
                return F.coalesce(c, F.lit(False))
            if t is not None and t.kind == "iri":
                return F.lit(fn == "isiri")
            if t is not None and t.kind in ("str", "num", "bool"):
                return F.lit(fn == "isliteral")
            # fallback (e.g. HAVING scope): approximate by lexical shape
            shaped = S(0).rlike("^[a-z][a-z0-9+.-]*:")
            return shaped if fn == "isiri" else ~shaped
        if fn == "str":
            return S(0).cast("string")
        if fn == "strlen":
            return F.length(S(0))
        if fn == "ucase":
            return F.upper(S(0))
        if fn == "lcase":
            return F.lower(S(0))
        if fn == "concat":
            return F.concat(*[S(i) for i in range(len(args))])
        if fn == "substr":
            # SPARQL SUBSTR is 1-based like Spark substring
            pos = _unwrap_term(args[1])
            if pos is None or pos.kind != "num":
                raise SparqlError("SUBSTR position must be a numeric literal")
            if len(args) > 2:
                ln = _unwrap_term(args[2])
                if ln is None or ln.kind != "num":
                    raise SparqlError("SUBSTR length must be a numeric literal")
                return F.substring(S(0), int(float(pos.value)), int(float(ln.value)))
            return F.substring(S(0), int(float(pos.value)), 2**31 - 1)
        if fn == "strstarts":
            return S(0).startswith(S(1))
        if fn == "strends":
            return S(0).endswith(S(1))
        if fn == "contains":
            return S(0).contains(S(1))
        if fn in ("strbefore", "strafter"):
            needle = _lit_str(args[1], f"{fn.upper()} needle")
            s = S(0)
            pos = F.locate(needle, s)
            if fn == "strbefore":
                hit = F.substring_index(s, needle, 1)
            else:
                # everything after the FIRST occurrence (spec)
                hit = s.substr(pos + F.lit(len(needle)), F.length(s))
            return F.when(pos > 0, hit).otherwise(F.lit(""))
        if fn == "replace":
            return F.regexp_replace(
                S(0),
                _lit_str(args[1], "REPLACE pattern"),
                _lit_str(args[2], "REPLACE replacement"),
            )
        if fn == "abs":
            return F.abs(N(0))
        if fn == "ceil":
            return F.ceil(N(0))
        if fn == "floor":
            return F.floor(N(0))
        if fn == "round":
            return F.round(N(0), 0)
        if fn == "if":
            return F.when(
                _compile_expr(args[0], bound, meta), S(1)
            ).otherwise(S(2))
        if fn == "coalesce":
            return F.coalesce(*[S(i) for i in range(len(args))])
        raise SparqlError(f"unsupported function {fn}()")
    if op == "term":
        return _compile_term(node[1], bound)
    raise SparqlError(f"unsupported filter expression {node!r}")


def _compile_operand(node, bound: set, numeric: bool, meta: set = frozenset()) -> Column:
    if node[0] == "term":
        return _compile_term(node[1], bound, numeric)
    c = _compile_expr(node, bound, meta)
    return c.cast("double") if numeric else c


def _aggregate(acc: DataFrame, bound: set, q: Query,
               with_companions: bool = False) -> DataFrame:
    """GROUP BY + aggregate projection → one hash-aggregate (map-side
    partials + one shuffle on the group keys — Catalyst's HashAggregate
    pair, the same physical shape a hand-written groupBy().agg() gets)."""
    keys = q.group_by
    plain = [s for s in q.select if not isinstance(s, Agg)]
    if q.select == ["*"]:
        raise SparqlError("SELECT * cannot be combined with aggregates")
    for v in set(plain) | set(keys):
        if v not in bound:
            raise SparqlError(f"GROUP BY/SELECT references unbound variable ?{v}")
    stray = [v for v in plain if v not in keys]
    if stray:
        raise SparqlError(f"non-aggregated SELECT variables not in GROUP BY: {stray}")
    exprs = []
    for a in (s for s in q.select if isinstance(s, Agg)):
        if a.arg is None:
            if a.distinct:
                raise SparqlError("COUNT(DISTINCT *) is not supported")
            c = F.count(F.lit(1))
        else:
            if a.arg not in bound:
                raise SparqlError(f"aggregate over unbound variable ?{a.arg}")
            col = F.col(a.arg)
            if a.fn in ("sum", "avg"):
                col = F.expr(f"try_cast({a.arg} AS DOUBLE)")
            if a.fn == "count":
                c = F.countDistinct(col) if a.distinct else F.count(col)
            elif a.fn == "group_concat":
                # Jena concatenates in encounter order, which is not a
                # well-defined order under distribution; sort the operands
                # so the result is partition-invariant (documented
                # divergence — the reference's consumer splits and counts,
                # so order never matters to it)
                lst = F.collect_set(col) if a.distinct else F.collect_list(col)
                c = F.array_join(F.array_sort(lst), a.sep)
            elif a.distinct and a.fn in ("sum", "avg"):
                # SPARQL set semantics: dedup the numeric operand first
                c = F.expr(f"{a.fn}(DISTINCT try_cast({a.arg} AS DOUBLE))")
            elif a.fn == "sample":
                # SAMPLE may return ANY value from the group per spec; pick
                # min so the result is deterministic across engines and
                # partitionings (a documented narrowing, like GROUP_CONCAT's
                # sorted operands)
                c = F.min(col)
            else:  # DISTINCT under min/max is a semantic no-op
                c = getattr(F, a.fn)(col)
        exprs.append(c.alias(a.alias))
    if with_companions:
        # subquery exports: group keys keep their real companions (every
        # row in a group shares the key's lexical form; first() resolves
        # the rare same-lexical/different-type collision), aggregate
        # aliases get derived ones (COUNT → xsd:integer, SUM/AVG →
        # xsd:double, else string; never IRIs)
        for kcol in keys:
            exprs.append(F.first(F.col(_m_iri(kcol))).alias(_m_iri(kcol)))
            exprs.append(F.first(F.col(_m_dt(kcol))).alias(_m_dt(kcol)))
    grouped = acc.groupBy(*keys) if keys else acc.groupBy()
    out = grouped.agg(*exprs)
    if with_companions:
        for a in (s for s in q.select if isinstance(s, Agg)):
            dt = ("xsd:integer" if a.fn == "count"
                  else "xsd:double" if a.fn in ("sum", "avg") else "string")
            out = out.withColumn(_m_iri(a.alias), F.lit(False)).withColumn(
                _m_dt(a.alias), F.lit(dt)
            )
    out_cols = set(keys) | {a.alias for a in q.select if isinstance(a, Agg)}
    for h in q.having:
        out = out.filter(_compile_expr(h, out_cols))
    order = [s if isinstance(s, str) else s.alias for s in q.select]
    if with_companions:
        order = [c for v in order for c in (v, _m_iri(v), _m_dt(v))]
    return out.select(*order)


def _subquery_df(triples: DataFrame, q: Query) -> tuple[DataFrame, set]:
    """``{ SELECT … }`` subquery → (bindings DataFrame, exported vars).

    Evaluated bottom-up per the SPARQL 1.1 spec: only PROJECTED variables
    are visible to the enclosing group (inner non-projected variables,
    even ones sharing a name with outer variables, are a separate scope —
    the merge joins exclusively on exported names).  Exported bindings
    carry companion columns so CONSTRUCT templates and isIRI() work on
    subquery-bound variables.  ORDER BY inside a subquery matters only
    with LIMIT (top-k per group of nothing — the solution SET is otherwise
    order-free), so a bare ORDER BY is skipped rather than paying a global
    sort the outer join would immediately destroy."""
    if any(isinstance(s, ExistsProj) for s in q.select):
        raise SparqlError("EXISTS projections are not supported in subqueries")
    acc, bound = _join_group(triples, q.where)
    aggs = [s for s in q.select if isinstance(s, Agg)]
    if aggs or q.group_by:
        out = _aggregate(acc, bound, q, with_companions=True)
        names = [s if isinstance(s, str) else s.alias for s in q.select]
    else:
        if q.having:
            raise SparqlError("HAVING requires GROUP BY or aggregates")
        names = sorted(bound) if q.select == ["*"] else list(q.select)
        missing = [v for v in names if v not in bound]
        if missing:
            raise SparqlError(f"SELECT references unbound variables: {missing}")
        out = acc.select(*[c for v in names for c in (v, _m_iri(v), _m_dt(v))])
    if q.distinct:
        out = out.distinct()
    if q.limit is not None or q.offset:
        if q.order_by:
            out = out.orderBy(
                *[F.col(v).asc() if asc else F.col(v).desc()
                  for v, asc in q.order_by]
            )
        if q.offset:
            out = out.offset(q.offset)
        if q.limit is not None:
            out = out.limit(q.limit)
    return out, set(names)


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Evaluate a SPARQL SELECT query over a canonical triple DataFrame.

    Returns a DataFrame with one column per selected variable (lexical
    forms; IRIs as their string value).  See the module docstring for the
    supported subset and the compilation model.
    """
    q = _Parser(query).parse()
    if q.form != "select":
        raise SparqlError(
            f"{q.form.upper()} is evaluated by sparql_{q.form}(), not sparql_select()"
        )
    acc, bound = _join_group(triples, q.where)
    aggs = [s for s in q.select if isinstance(s, Agg)]
    eprojs = [s for s in q.select if isinstance(s, ExistsProj)]
    if eprojs and (aggs or q.group_by):
        raise SparqlError("EXISTS projections cannot mix with aggregates")
    for ep in eprojs:
        edf, evars = _join_group(triples, ep.group)
        shared = sorted(bound & evars)
        flag = f"__e_{ep.alias}"
        if shared:
            probe = edf.select(*shared).distinct().withColumn(flag, F.lit(True))
            acc = acc.join(probe, on=shared, how="left")
        else:
            probe = edf.select(F.lit(True).alias(flag)).limit(1)
            acc = acc.join(probe, F.lit(True), how="left")
        acc = acc.withColumn(
            ep.alias,
            F.when(F.coalesce(F.col(flag), F.lit(False)), "true")
            .otherwise("false"),
        )
        bound = bound | {ep.alias}
    if aggs or q.group_by:
        out = _aggregate(acc, bound, q)
    elif q.having:
        raise SparqlError("HAVING requires GROUP BY or aggregates")
    elif q.select == ["*"]:
        out = acc.select(*sorted(bound))
    else:
        names = [s if isinstance(s, str) else s.alias for s in q.select]
        missing = [v for v in names if v not in bound]
        if missing:
            raise SparqlError(f"SELECT references unbound variables: {missing}")
        out = acc.select(*names)
    if q.distinct:
        out = out.distinct()
    if q.order_by:
        out = out.orderBy(
            *[F.col(v).asc() if asc else F.col(v).desc() for v, asc in q.order_by]
        )
    if q.offset:
        # SPARQL slice: skip OFFSET solutions, then take LIMIT.  Without an
        # ORDER BY the skipped prefix is implementation-defined, per spec.
        out = out.offset(q.offset)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


def sparql_ask(triples: DataFrame, query: str) -> bool:
    """Evaluate a SPARQL ASK query: does the pattern have any solution?

    Compiles the group exactly like SELECT and probes with ``limit(1)`` —
    Spark stops the scan at the first matching row."""
    q = _Parser(query).parse()
    if q.form != "ask":
        raise SparqlError("sparql_ask() expects an ASK query")
    acc, _ = _join_group(triples, q.where)
    return bool(acc.limit(1).count())


def _template_term(term: Term, slot: str, bound: set):
    """One CONSTRUCT template slot → (value, dtype, is_iri) columns."""
    if term.kind == "var":
        if term.value not in bound:
            raise SparqlError(f"CONSTRUCT template uses unbound variable ?{term.value}")
        return (
            F.col(term.value),
            F.col(_m_dt(term.value)),
            F.coalesce(F.col(_m_iri(term.value)), F.lit(False)),
        )
    if term.kind == "iri":
        return F.lit(term.value), F.lit("iri"), F.lit(True)
    if slot != "obj":
        raise SparqlError(f"literal is not a valid {slot} in a CONSTRUCT template")
    if term.kind == "num":
        dt = "xsd:integer" if re.fullmatch(r"[+-]?\d+", term.value) else "xsd:decimal"
        return F.lit(term.value), F.lit(dt), F.lit(False)
    if term.kind == "bool":
        return F.lit(term.value), F.lit("xsd:boolean"), F.lit(False)
    return F.lit(term.value), F.lit("string"), F.lit(False)


def sparql_describe(triples: DataFrame, query: str) -> DataFrame:
    """Evaluate ``DESCRIBE <iri>… [?var…] [WHERE { … }]`` → the canonical
    triple rows whose SUBJECT is a described resource.

    Described resources are the explicit IRIs plus, for each DESCRIBE
    variable, its IRI-valued bindings in the WHERE solutions (literal
    bindings are not resources and are skipped, read from the IRI-ness
    companion — never guessed from lexical shape).  The description is the
    subject-rows form (Concise Bounded Description minus blank-node
    closure: this engine's graphs have no blank subjects after ingest,
    which labels every bnode).  One distinct resource set + one left-semi
    join — at scale the semi-join probe side is the small one and AQE
    broadcasts it."""
    q = _Parser(query).parse()
    if q.form != "describe":
        raise SparqlError("sparql_describe() expects a DESCRIBE query")
    spark = triples.sparkSession
    iris = [t.value for t in q.select if t.kind == "iri"]
    vars_ = [t.value for t in q.select if t.kind == "var"]
    subs = (
        spark.createDataFrame([(i,) for i in iris], "subj string")
        if iris
        else None
    )
    if vars_:
        if q.where.is_plain_triples() and not q.where.patterns:
            raise SparqlError("DESCRIBE ?var needs a WHERE clause")
        acc, bound = _join_group(triples, q.where)
        for v in vars_:
            if v not in bound:
                raise SparqlError(f"DESCRIBE references unbound variable ?{v}")
            col = acc.filter(
                F.coalesce(F.col(_m_iri(v)), F.lit(False))
            ).select(F.col(v).alias("subj"))
            subs = col if subs is None else subs.unionByName(col)
    return triples.join(subs.distinct(), "subj", "left_semi")


def sparql_construct(triples: DataFrame, query: str) -> DataFrame:
    """Evaluate a SPARQL CONSTRUCT query → a canonical triple DataFrame
    (``subj, pred, obj_value, obj_dtype, obj_is_iri``).

    Each template pattern projects the solution set into one triple family
    (same columns, narrow select) and the families union; ``distinct()``
    gives CONSTRUCT's graph-set semantics, exactly how this repo's own KG
    pipeline materializes its triple families.  Rows where any slot is
    unbound (an OPTIONAL variable) emit no triple, per the SPARQL spec.
    Subject/predicate slots must be IRIs or variables; a variable there
    emits whatever it is bound to (this engine does not re-check IRI-ness
    of subject bindings — bindings from subject/predicate positions are
    IRIs by construction)."""
    q = _Parser(query).parse()
    if q.form != "construct":
        raise SparqlError("sparql_construct() expects a CONSTRUCT query")
    acc, bound = _join_group(triples, q.where)
    if q.limit is not None:
        acc = acc.limit(q.limit)
    return _instantiate(acc, bound, q.template)


def _instantiate(acc: DataFrame, bound: set, template: Group) -> DataFrame:
    """Project a solution set through a plain-triples template: one triple
    family per template pattern, unioned, set semantics.  Rows where any
    slot is unbound (an OPTIONAL variable) emit no triple, per spec."""
    fams = []
    for pat in template.patterns:
        sv, _, _ = _template_term(pat.s, "subject", bound)
        pv, _, _ = _template_term(pat.p, "predicate", bound)
        ov, od, oi = _template_term(pat.o, "obj", bound)
        fams.append(
            acc.select(
                sv.cast("string").alias("subj"),
                pv.cast("string").alias("pred"),
                ov.cast("string").alias("obj_value"),
                od.cast("string").alias("obj_dtype"),
                oi.cast("boolean").alias("obj_is_iri"),
            ).filter(
                F.col("subj").isNotNull()
                & F.col("pred").isNotNull()
                & F.col("obj_value").isNotNull()
            )
        )
    out = fams[0]
    for f in fams[1:]:
        out = out.unionByName(f)
    return out.distinct()


def sparql_delete(triples: DataFrame, query: str) -> DataFrame:
    """Evaluate a SPARQL UPDATE ``DELETE { … } WHERE { … }`` against the
    triple DataFrame and return the surviving graph.

    The template instantiates over the WHERE solutions exactly like
    CONSTRUCT (unbound slots — e.g. the reference's ``OPTIONAL { ?value ?p
    ?o }`` one-hop cascade — emit nothing for that solution), and the
    original graph is LEFT ANTI joined against the doomed set on
    ``(subj, pred, obj_value, obj_is_iri)`` — node identity is lexical form
    + IRI-ness, the same identity the anonymization engine's own delete
    path uses.  One shuffle, no driver materialization; covers the
    reference's ``deleteOriginalPropertyQuery`` (M3 delete-originals +
    one-hop) verbatim."""
    q = _Parser(query).parse()
    if q.form != "delete":
        raise SparqlError("sparql_delete() expects a DELETE WHERE update")
    acc, bound = _join_group(triples, q.where)
    doomed = _instantiate(acc, bound, q.template).select(
        "subj", "pred", "obj_value", "obj_is_iri"
    )
    return triples.join(
        doomed, on=["subj", "pred", "obj_value", "obj_is_iri"], how="left_anti"
    )
