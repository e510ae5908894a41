"""Gremlin-subset traversal-string frontend → the GIE operator surface.

Reference path: Gremlin strings enter GIE through
``IrStandardOpProcessor.java`` (interactive_engine/compiler/src/main/java/
com/alibaba/graphscope/gremlin/plugin/processor/IrStandardOpProcessor.java)
and are planned to the dataflow algebra by ``GraphPlanner.java:96-230``.
This is that pipeline reduced to the chain subset the repo's operators
already execute: each step lowers onto EdgeExpand / GetV / Select / Dedup /
GroupBy from :mod:`graphscope_spark.operators.relational`.

Supported chain grammar::

    g.V([id, ...]) | g.E([elabel])   # E(): the traverser starts as the
         EDGE (src/dst + property columns); otherV() is undefined there
     .out([elabel]) | .in([elabel]) | .both([elabel])
     .out('lo..hi' [, elabel, ...]) [.with('PATH_OPT', ARBITRARY|SIMPLE
         |TRAIL)] [.with('RESULT_OPT', END_V|ALL_V)] [.endV()]
         # GIE PathExpand sugar: [lo, hi) hops; ALL_V (default) carries
         # the vertex-path collection (sinks as `path`, endV() unfolds
         # the end vertex); END_V keeps only the end vertex
     .outE([elabel]) | .inE([elabel]) | .bothE([elabel])  # traverser
         becomes the EDGE — its property columns drive has()/values();
         .inV()/.outV()/.otherV()/.bothV() return to vertices; an
         unterminated edge chain sinks (src, dst, props)
     .repeat(out([elabel])).times(n) [.emit()]   # fixed-hop unroll; emit
         streams every intermediate frontier (hops 1..n)
     .repeat(out([elabel])).until(hasId(..) | has(prop, P)) [.emit()]
         [.times(cap)]           # do-while loop: traversers exit when the
         predicate first holds; dead-ends drop out; a times(cap) bounds
         the loop (remaining traversers exit at the cap, Gremlin OR
         semantics); without a cap the loop raises loudly after
         _UNTIL_MAX_ROUNDS non-converged rounds
     .has(prop, literal | P)      # P: lt/lte/gt/gte/eq/neq/within(...)
     .has(prop)                   # keep elements WITH the property
     .has(label, prop, literal | P)   # fused hasLabel + has
     .hasNot(prop)                # keep elements WITHOUT the property
     .hasId(id, ...)              # keep the listed vertex ids
     .hasLabel(label)             # PropertyGraph only
     .as(tag)
     .where(eq(tag) | neq(tag))   # cycle close against a tagged vertex
     .where(out(..) | in(..) | both(..) | outE(..) | inE(..))
                                  # existence filter (GIE where-traversal
                                  # → semi-join); .not(...) is the anti
     .where(expr(...)) | .not(expr(...))   # SQL-expression sugar
         # (supported_gremlin_steps.md §Expression, both the 0.27.0 and
         # legacy @-spellings): _.prop / tag.prop refs, = <> < <= > >=,
         # AND/OR/NOT, IN [..], IS [NOT] NULL, STARTS/ENDS WITH,
         # CONTAINS, + - * / %, & | ^ << >> bit ops, POWER(x, y),
         # LABELS(t)/elementId(t); null outcomes drop the traverser
     .union(out(..), in(..), ...) # branch merge of single-step traversals
     .identity()                  # no-op (GIE IdentityStep)
     .match(__.as(t).out().as(u), ...)   # composite pattern → the match()
         join DAG; bindings continue into select()/count()/dedup()/limit()
         (simple Graph; labeled patterns belong to the Cypher frontend)
     .subgraph([name])            # terminal on edge traversers: the
         deduplicated edge-induced subgraph as (src, dst)
     .dedup([tag, ...])
     .order().by(prop|select(tag) [, asc|desc]).by(...)  # multi-key sort
     .limit(n) | .range(lo, hi) | .sample(n) | .coin(p)  # range keeps
         [lo, hi) in stream order (deterministic after order());
         sample/coin are deterministic seeded
     .values(prop)                # traverser becomes the property VALUE;
         value traversers support is(P)/dedup()/limit()/sample()/coin()
         and the aggregate/fold terminals below
     .is(literal | P)             # filter value traversers
    terminal:
     .count()                     → 1 row, column `count`
     .sum()|min()|max()|mean()    → 1-row aggregate over value traversers
     .fold()                      → 1 row, sorted array of the stream
     .groupCount([.by(select(tag) | prop)])  → (tag|v|prop, count)
     .group().by(key).by(val)     → key: prop | select(tag) | id default;
         val: count() | fold() | sum(prop)|min(prop)|max(prop)|mean(prop)
         (fold default) — columns (key, count|value)
     .group().by(values(p).as(k), out().count().as(k2), ...)
             .by(count().as(v), values(p).sum().as(v2), ...)
         # extended GIE GroupStep (§Aggregate (Group)): multiple aliased
         # keys (property / out|in|both-degree) × multiple aliased
         # aggregates — one column per alias
     .project(k1, k2, ...).by(spec)...   → one column per key; spec:
         prop | values(p) | id() | select(tag) | out/in/both().count() |
         expr(...)
     .select(tag, ...)            → tag columns
     .select(expr(...))           → the expression value, column `value`
     .valueMap(prop, ...)         → (id, prop, ...) columns; edge
         traversers sink (src, dst, prop, ...)
     .elementMap(prop, ...)       → (id, label, prop, ...); PropertyGraph
     .id()                        → vertex ids, column `id`
     .label()                     → vertex label, columns (id, label)
     .constant(x)                 → x per traverser, column `constant`
     .path()                      → visited-vertex history (array column)
    (a chain without a terminal sinks the current elements as `id`)

Execution state is a DataFrame with column ``_cur`` (current vertex) plus
one column per ``as`` tag — the traverser-path rendering of the reference's
streaming traversers. Works over the simple
:class:`~graphscope_spark.graph.graph.Graph` (ids only) and the multi-label
:class:`~graphscope_spark.graph.property_graph.PropertyGraph` (labels +
properties).

Example — the two-hop neighborhood count::

    gremlin(g, "g.V().has('id', lt(10)).as('v').out().out().as('y')"
               ".dedup('v','y').groupCount().by(select('v'))")
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph
from graphscope_spark.graph.property_graph import PropertyGraph
from graphscope_spark.operators.relational import edge_expand

__all__ = ["parse_gremlin", "gremlin"]

_STEP_NAME = re.compile(r"\s*\.\s*([A-Za-z_][A-Za-z_0-9]*)\s*\(")
# safety cap for repeat().until() loops with no explicit .times(cap): the
# loop raises loudly (never silently truncates) when it is exhausted
_UNTIL_MAX_ROUNDS = 64
_NUM = re.compile(r"^-?\d+(\.\d+)?$")
_PREDS = {"lt", "lte", "gt", "gte", "eq", "neq", "within"}


def _scan_args(s: str, pos: int) -> tuple[str, int]:
    """Return the argument substring of a balanced (...) starting at pos
    (which must point at the opening paren) and the index after ')'.
    Both quote styles shield parens: '...' (step literals) and "..."
    (expr() literals, supported_gremlin_steps.md §Expression)."""
    depth, i, quote = 0, pos, None
    while i < len(s):
        c = s[i]
        if quote:
            if c == quote:
                quote = None
        elif c in ("'", '"'):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return s[pos + 1 : i], i + 1
        i += 1
    raise ValueError(f"unbalanced parentheses at: {s[pos:]!r}")


def _split_top(s: str) -> list[str]:
    out, depth, quote, cur = [], 0, None, []
    for c in s:
        if quote:
            cur.append(c)
            if c == quote:
                quote = None
        elif c in ("'", '"'):
            quote = c
            cur.append(c)
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def _parse_arg(raw: str):
    raw = raw.strip()
    if raw.startswith("'") and raw.endswith("'"):
        return ("str", raw[1:-1])
    if raw.startswith('"') and raw.endswith('"'):
        return ("str", raw[1:-1])
    if _NUM.match(raw):
        return ("num", float(raw) if "." in raw else int(raw))
    if raw in ("asc", "desc", "Order.asc", "Order.desc", "incr", "decr"):
        d = raw.split(".")[-1]
        return ("ord", {"incr": "asc", "decr": "desc"}.get(d, d))
    if raw in ("local", "Scope.local"):
        # count(local)/sum(local)/… over a folded list
        # (supported_gremlin_steps.md §local)
        return ("scope", "local")
    m = re.match(r"^expr\s*\(", raw)
    if m:
        # SQL-expression sugar (supported_gremlin_steps.md §Expression):
        # the payload is captured RAW and parsed by the expression grammar
        # at execution time (it is not a step chain)
        inner, end = _scan_args(raw, m.end() - 1)
        if raw[end:].strip():
            raise ValueError(f"trailing content after expr(): {raw!r}")
        return ("expr", inner.strip())
    m = re.match(r"^__\s*\.\s*as\s*\(", raw)
    if m:
        # multi-step anonymous chain — the match() sentence form
        # (__.as('a').out().as('b')); parsed like a top-level chain
        steps = []
        pos = raw.index(".")
        while pos < len(raw):
            sm = _STEP_NAME.match(raw, pos)
            if not sm:
                raise ValueError(f"expected a .step(...) at: {raw[pos:]!r}")
            inner, pos = _scan_args(raw, sm.end() - 1)
            steps.append(
                (
                    sm.group(1),
                    [_parse_arg(a) for a in _split_top(inner)]
                    if inner.strip()
                    else [],
                )
            )
        return ("chain", steps)
    m = re.match(r"^(?:__\s*\.\s*)?([A-Za-z_]\w*)\s*\(", raw)
    if m and m.group(1) in (
        "out", "in", "both", "outE", "inE", "bothE", "hasId", "has",
        "count", "fold", "sum", "min", "max", "mean", "values", "select",
        "id",
    ):
        # anonymous traversal argument: repeat(out('label')) /
        # until(hasId(3)) / where(out('x')) / group().by(..).by(count());
        # multi-step chains (values('p').as('k'), out().count().as('k'))
        # feed the extended group()/project() modulators
        steps = []
        pos0 = raw.index("__.") + 2 if raw.startswith("__") else None
        if pos0 is None:
            inner, end = _scan_args(raw, m.end() - 1)
            steps.append(
                (
                    m.group(1),
                    [_parse_arg(a) for a in _split_top(inner)]
                    if inner.strip()
                    else [],
                )
            )
            pos = end
        else:
            pos = pos0
        while pos < len(raw):
            sm = _STEP_NAME.match(raw, pos)
            if not sm:
                raise ValueError(f"expected a .step(...) at: {raw[pos:]!r}")
            inner, pos = _scan_args(raw, sm.end() - 1)
            steps.append(
                (
                    sm.group(1),
                    [_parse_arg(a) for a in _split_top(inner)]
                    if inner.strip()
                    else [],
                )
            )
        if len(steps) == 1:
            name0, vals = steps[0]
            if name0 == "select":
                return ("select", vals)
            return ("step", (name0, vals))
        return ("chain", steps)
    m = re.match(r"^(?:P\s*\.\s*)?([A-Za-z_]\w*)\s*\(", raw)
    if m and m.group(1) in _PREDS | {"select"}:
        inner, end = _scan_args(raw, m.end() - 1)
        if raw[end:].strip():
            raise ValueError(f"trailing content in argument: {raw!r}")
        vals = [_parse_arg(a) for a in _split_top(inner)]
        return (m.group(1), vals)
    raise ValueError(f"unsupported argument: {raw!r}")


def parse_gremlin(query: str) -> list[tuple[str, list]]:
    """Parse a ``g.V()...`` chain into [(step_name, args), ...]."""
    q = query.strip().rstrip(";")
    m = re.match(r"^g\s*\.\s*([VE])\s*\(", q)
    if not m:
        raise ValueError("traversal must start with g.V(...) or g.E(...)")
    args, pos = _scan_args(q, m.end() - 1)
    steps = [(m.group(1), [_parse_arg(a) for a in _split_top(args)])]
    while pos < len(q):
        sm = _STEP_NAME.match(q, pos)
        if not sm:
            raise ValueError(f"expected a .step(...) at: {q[pos:]!r}")
        args, pos = _scan_args(q, sm.end() - 1)
        steps.append((sm.group(1), [_parse_arg(a) for a in _split_top(args)]))
    return steps


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------


def _pred_col(col, arg):
    kind, val = arg
    if kind in ("num", "str"):
        return col == F.lit(val)
    if kind == "within":
        return col.isin([v for _k, v in val])
    lit = F.lit(val[0][1])
    return {
        "lt": col < lit,
        "lte": col <= lit,
        "gt": col > lit,
        "gte": col >= lit,
        "eq": col == lit,
        "neq": col != lit,
    }[kind]


def _edges_for(graph, direction: str, elabel: str | None) -> DataFrame:
    if isinstance(graph, Graph):
        if elabel is not None:
            raise ValueError("edge labels need a PropertyGraph")
        return graph.edges.select("src", "dst")
    parts = [
        df.select("src", "dst")
        for (el, _sl, _dl), df in graph.edges.items()
        if elabel is None or el == elabel
    ]
    if not parts:
        raise ValueError(f"no edge tables with label {elabel!r}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _edges_full(graph, elabel: str | None) -> DataFrame:
    """Edge tables WITH their property columns (for the edge-element steps
    outE/inE). A simple Graph keeps every edge column (weight, …); a
    PropertyGraph unions per-label tables on (src, dst) only — per-label
    property schemas differ, so edge-property access there needs a
    single-label step, which keeps that label's columns."""
    if isinstance(graph, Graph):
        if elabel is not None:
            raise ValueError("edge labels need a PropertyGraph")
        return graph.edges
    parts = [
        df for (el, _sl, _dl), df in graph.edges.items()
        if elabel is None or el == elabel
    ]
    if not parts:
        raise ValueError(f"no edge tables with label {elabel!r}")
    if len(parts) == 1:
        return parts[0]
    out = parts[0].select("src", "dst")
    for p in parts[1:]:
        out = out.unionByName(p.select("src", "dst"))
    return out


def _all_vertices(graph) -> DataFrame:
    if isinstance(graph, Graph):
        return graph.vertices.select(F.col("id").alias("_cur"))
    parts = [df.select(F.col("id").alias("_cur")) for df in graph.vertices.values()]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def _prop_table(graph, prop: str) -> DataFrame:
    """Union of (id, prop) over the vertex tables carrying the property."""
    if isinstance(graph, Graph):
        raise ValueError(
            f"property {prop!r} access needs a PropertyGraph (simple-graph "
            "vertices carry only ids — use has('id', ...))"
        )
    parts = [
        df.select(F.col("id").alias("_cur"), F.col(prop).alias("_p"))
        for df in graph.vertices.values()
        if prop in df.columns
    ]
    if not parts:
        raise ValueError(f"no vertex label has property {prop!r}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# expr() — SQL-expression sugar (supported_gremlin_steps.md §Expression)
# ---------------------------------------------------------------------------

_EXPR_TOKEN = re.compile(
    r'"(?:[^"\\]|\\.)*"'
    r"|'(?:[^'\\]|\\.)*'"
    r"|\d+\.\d+[fFdD]?|\d+[lLfFdD]?"
    r"|@[A-Za-z_0-9]*(?:\.[A-Za-z_~][A-Za-z0-9_]*)?"
    r"|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_~][A-Za-z0-9_]*)?"
    r"|<<|>>|<=|>=|<>|!=|==|&&|\|\||[-+*/%&|^=<>(),\[\]!~]"
)

_EXPR_KEYWORDS = {
    "AND", "OR", "NOT", "IN", "IS", "NULL", "TRUE", "FALSE",
    "STARTS", "ENDS", "WITH", "CONTAINS", "WITHIN", "WITHOUT",
}
_EXPR_FUNCS = {"POWER", "ELEMENTID", "LABELS", "TYPE", "LENGTH"}


def _parse_expr(raw: str):
    """Parse an ``expr()`` payload into a predicate/value AST.

    Grammar per the SQL-standard precedence table in
    supported_gremlin_steps.md §Expression (both the 0.27.0 syntax —
    ``_.name = "marko" AND a.age > 10`` — and the legacy ``@.name ==
    "marko" && @a.age > 10`` spellings). Nodes: ("lit", v) | ("list",
    [v…]) | ("var", scope, prop|None) | ("func", name, [args]) |
    ("neg"|"not", x) | ("bin", op, l, r) | ("strp", op, l, r) |
    ("in", x, [v…]) | ("null", x, is_not) | ("cmp", op, l, r) |
    ("bool", "and"|"or", [parts])."""
    toks = _EXPR_TOKEN.findall(raw)
    if "".join(toks).replace(" ", "") != raw.replace(" ", ""):
        raise ValueError(f"unsupported characters in expr(): {raw!r}")
    pos = 0

    def peek(ahead: int = 0):
        return toks[pos + ahead] if pos + ahead < len(toks) else None

    def eat(tok: str | None = None):
        nonlocal pos
        t = peek()
        if t is None or (tok is not None and t.upper() != tok.upper()):
            raise ValueError(f"expected {tok!r} in expr(): {raw!r}")
        pos += 1
        return t

    def is_kw(t, kw):
        return t is not None and t.upper() == kw

    def literal_of(t):
        if t.startswith('"') or t.startswith("'"):
            body = t[1:-1]
            return re.sub(r"\\(.)", r"\1", body)
        if re.match(r"^\d+\.\d+[fFdD]?$", t):
            return float(t.rstrip("fFdD"))
        if re.match(r"^\d+[lL]?$", t):
            return int(t.rstrip("lL"))
        if re.match(r"^\d+[fFdD]$", t):
            return float(t[:-1])
        if t.upper() == "TRUE":
            return True
        if t.upper() == "FALSE":
            return False
        return None

    def parse_list():
        eat("[")
        vals = []
        while not is_kw(peek(), "]"):
            neg = False
            if peek() == "-":
                eat()
                neg = True
            v = literal_of(eat())
            if v is None or isinstance(v, bool) and neg:
                raise ValueError(f"expr() lists take literals: {raw!r}")
            vals.append(-v if neg else v)
            if peek() == ",":
                eat()
        eat("]")
        return ("list", vals)

    def primary():
        nonlocal pos
        t = peek()
        if t is None:
            raise ValueError(f"unexpected end of expr(): {raw!r}")
        if t == "(":
            eat()
            node = or_expr()
            eat(")")
            return node
        if t == "[":
            return parse_list()
        lit = literal_of(t)
        if lit is not None or t.upper() in ("TRUE", "FALSE"):
            eat()
            return ("lit", lit)
        if t.upper() in _EXPR_FUNCS and peek(1) == "(":
            fname = eat().upper()
            eat("(")
            fargs = [or_expr()]
            while peek() == ",":
                eat()
                fargs.append(or_expr())
            eat(")")
            return ("func", fname, fargs)
        # variable: _ | _.prop | @ | @.prop | tag | tag.prop | @tag.prop
        m = re.match(r"^(@?)([A-Za-z_0-9]*)(?:\.([A-Za-z_~][A-Za-z0-9_]*))?$", t)
        if m and (m.group(1) or m.group(2)) and m.group(2).upper() not in _EXPR_KEYWORDS:
            eat()
            scope = m.group(2) or "_"
            if scope == "_" or (m.group(1) and not m.group(2)):
                scope = "_"
            return ("var", scope, m.group(3))
        raise ValueError(f"unsupported expr() token: {t!r} in {raw!r}")

    def unary():
        if peek() == "-":
            eat()
            return ("neg", unary())
        if peek() == "~":
            # bit reverse (supported_cypher.md BitOpr "~" row,
            # reference-planned)
            eat()
            return ("bnot", unary())
        return primary()

    def mul_expr():
        node = unary()
        while peek() in ("*", "/", "%"):
            op = eat()
            node = ("bin", op, node, unary())
        return node

    def add_expr():
        node = mul_expr()
        while peek() in ("+", "-", "&", "|", "^", "<<", ">>"):
            op = eat()
            node = ("bin", op, node, mul_expr())
        return node

    def str_expr():
        node = add_expr()
        t = peek()
        if is_kw(t, "STARTS") or is_kw(t, "ENDS"):
            kind = eat().upper()
            eat("WITH")
            return ("strp", "startswith" if kind == "STARTS" else "endswith",
                    node, add_expr())
        if is_kw(t, "CONTAINS"):
            eat()
            return ("strp", "contains", node, add_expr())
        if is_kw(t, "IN") or is_kw(t, "WITHIN"):
            eat()
            lst = parse_list()
            return ("in", node, lst[1])
        return node

    def cmp_expr():
        node = str_expr()
        t = peek()
        if t in ("=", "==", "<>", "!=", "<", "<=", ">", ">="):
            op = eat()
            op = {"==": "=", "!=": "<>"}.get(op, op)
            return ("cmp", op, node, str_expr())
        return node

    def null_expr():
        node = cmp_expr()
        if is_kw(peek(), "IS"):
            eat()
            is_not = False
            if is_kw(peek(), "NOT"):
                eat()
                is_not = True
            eat("NULL")
            return ("null", node, is_not)
        return node

    def not_expr():
        if is_kw(peek(), "NOT") or peek() == "!":
            eat()
            return ("not", not_expr())
        return null_expr()

    def and_expr():
        parts = [not_expr()]
        while is_kw(peek(), "AND") or peek() == "&&":
            eat()
            parts.append(not_expr())
        return parts[0] if len(parts) == 1 else ("bool", "and", parts)

    def or_expr():
        parts = [and_expr()]
        while is_kw(peek(), "OR") or peek() == "||":
            eat()
            parts.append(and_expr())
        return parts[0] if len(parts) == 1 else ("bool", "or", parts)

    node = or_expr()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in expr(): {' '.join(toks[pos:])!r}")
    return node


def _expr_refs(node):
    """Yield every ("var", scope, prop) reference in an expr AST."""
    kind = node[0]
    if kind == "var":
        yield node
    elif kind == "func":
        if node[1] == "ELEMENTID":
            # elementId(a) reads the id, never a property
            for a in node[2]:
                for r in _expr_refs(a):
                    yield ("var", r[1], None)
        elif node[1] in ("LABELS", "TYPE"):
            for a in node[2]:
                for r in _expr_refs(a):
                    yield ("var", r[1], "~label")
        else:
            for a in node[2]:
                yield from _expr_refs(a)
    elif kind in ("neg", "not", "bnot"):
        yield from _expr_refs(node[1])
    elif kind == "bin" or kind == "strp" or kind == "cmp":
        yield from _expr_refs(node[2])
        yield from _expr_refs(node[3])
    elif kind == "in":
        yield from _expr_refs(node[1])
    elif kind == "null":
        yield from _expr_refs(node[1])
    elif kind == "bool":
        for p in node[2]:
            yield from _expr_refs(p)


def _expr_col(node, ref) -> "F.Column":
    """Compile an expr AST to a Column; ``ref(scope, prop)`` resolves
    variable references (prop None = the element id)."""
    kind = node[0]
    if kind == "lit":
        return F.lit(node[1])
    if kind == "var":
        return ref(node[1], node[2])
    if kind == "func":
        fname, fargs = node[1], node[2]
        if fname == "POWER":
            if len(fargs) != 2:
                raise ValueError("POWER(x, y) takes two arguments")
            return F.pow(_expr_col(fargs[0], ref), _expr_col(fargs[1], ref))
        if fname == "ELEMENTID":
            if len(fargs) != 1 or fargs[0][0] != "var":
                raise ValueError("elementId() takes one tag")
            return ref(fargs[0][1], None)
        if fname in ("LABELS", "TYPE"):
            if len(fargs) != 1 or fargs[0][0] != "var":
                raise ValueError(f"{fname}() takes one tag")
            return ref(fargs[0][1], "~label")
        raise ValueError(f"{fname}() is not supported in expr() (no path "
                         "bindings in this frontend subset)")
    if kind == "neg":
        return -_expr_col(node[1], ref)
    if kind == "bnot":
        return F.bitwise_not(_expr_col(node[1], ref))
    if kind == "not":
        return ~_expr_col(node[1], ref)
    if kind == "bin":
        op = node[1]
        l, r = _expr_col(node[2], ref), _expr_col(node[3], ref)
        if op in ("<<", ">>"):
            if node[3][0] != "lit" or not isinstance(node[3][1], int):
                raise ValueError("shift amounts must be integer literals")
            return (F.shiftleft if op == "<<" else F.shiftright)(l, node[3][1])
        return {
            "+": lambda: l + r, "-": lambda: l - r, "*": lambda: l * r,
            "/": lambda: l / r, "%": lambda: l % r,
            "&": lambda: l.bitwiseAND(r), "|": lambda: l.bitwiseOR(r),
            "^": lambda: l.bitwiseXOR(r),
        }[op]()
    if kind == "strp":
        l, r = _expr_col(node[2], ref), _expr_col(node[3], ref)
        return getattr(l, node[1])(r)
    if kind == "in":
        return _expr_col(node[1], ref).isin(node[2])
    if kind == "cmp":
        op = node[1]
        l, r = _expr_col(node[2], ref), _expr_col(node[3], ref)
        return {
            "=": lambda: l == r, "<>": lambda: l != r, "<": lambda: l < r,
            "<=": lambda: l <= r, ">": lambda: l > r, ">=": lambda: l >= r,
        }[op]()
    if kind == "null":
        col = _expr_col(node[1], ref)
        return col.isNotNull() if node[2] else col.isNull()
    # bool
    cols = [_expr_col(p, ref) for p in node[2]]
    out = cols[0]
    for c in cols[1:]:
        out = (out & c) if node[1] == "and" else (out | c)
    return out


def _label_table(graph) -> DataFrame:
    """(id, label) over every vertex table of a PropertyGraph."""
    if isinstance(graph, Graph):
        raise ValueError("LABELS()/TYPE() need a PropertyGraph")
    parts = [
        vdf.select(F.col("id").alias("_cur"), F.lit(lab).alias("_p"))
        for lab, vdf in graph.vertices.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _bind_expr(graph, df, tags, raw, cur_kind, edge_cols, val_col):
    """Attach the property lookups an expr() needs to the traverser frame.

    Returns (frame, column, temp_cols): ``frame`` is ``df`` with one
    left-joined ``_x__scope__prop`` column per distinct property
    reference (left join — a missing property is null, and Gremlin's
    filter semantics drop null outcomes at the filter itself), ``column``
    is the compiled expression, ``temp_cols`` must be dropped afterwards."""
    node = _parse_expr(raw)
    refs = sorted({(s, p) for _k, s, p in _expr_refs(node)},
                  key=lambda x: (x[0], x[1] or ""))
    temp: list[str] = []
    frame = df
    for scope, prop in refs:
        if prop is None or prop == "id":
            if scope != "_" and scope not in tags:
                raise ValueError(f"unbound tag {scope!r} in expr()")
            continue
        if scope == "_" and cur_kind == "e":
            if prop not in edge_cols:
                raise ValueError(
                    f"edge expr() needs an edge property (available: "
                    f"{edge_cols}, got {prop!r})"
                )
            continue
        if scope == "_" and cur_kind == "val":
            raise ValueError(
                "value traversers carry no properties — reference the "
                "value as `_` in expr()"
            )
        if scope != "_" and scope not in tags:
            raise ValueError(f"unbound tag {scope!r} in expr()")
        cname = f"_x__{scope}__{prop.lstrip('~')}"
        if cname in frame.columns:
            temp.append(cname)
            continue
        tbl = (_label_table(graph) if prop == "~label"
               else _prop_table(graph, prop))
        join_on = "_cur" if scope == "_" else scope
        frame = frame.join(
            tbl.select(F.col("_cur").alias(join_on), F.col("_p").alias(cname)),
            join_on, "left",
        )
        temp.append(cname)

    def ref(scope, prop):
        if prop is None or prop == "id":
            if scope == "_":
                if cur_kind == "val":
                    return F.col(val_col)
                if cur_kind == "e":
                    raise ValueError("edge traversers have no element id — "
                                     "reference a property instead")
                return F.col("_cur")
            return F.col(scope)
        if scope == "_" and cur_kind == "e":
            return F.col(prop)
        return F.col(f"_x__{scope}__{prop.lstrip('~')}")

    return frame, _expr_col(node, ref), temp


def gremlin(graph: Graph | PropertyGraph, query: str) -> DataFrame:
    """Execute a Gremlin chain; returns the terminal-step DataFrame (see
    module docstring for the column contract of each terminal)."""
    steps = parse_gremlin(query)
    df: DataFrame | None = None
    tags: list[str] = []
    pending_group: str | None = None  # waiting for an optional .by(...)
    pending_grp: dict | None = None  # group(): {'key': spec, 'val': spec}
    pending_order: list | None = None  # [(sort_col, 'asc'|'desc'), ...]
    n_ord = 0
    # vertex-history tracking is paid only when a path() terminal asks
    track_path = any(name == "path" for name, _a in steps)
    # 'v' = vertex traversers (_cur), 'e' = edge traversers,
    # 'val' = value traversers (after values())
    cur_kind = "v"
    edge_cols: list[str] = []  # edge property columns while cur_kind == 'e'
    val_col: str | None = None  # value column name while cur_kind == 'val'
    has_anchor = False  # edge traversers carry _eanchor (outE/inE/bothE)

    def finish_group(by_tag: str | None) -> DataFrame:
        key = F.col(by_tag) if by_tag else F.col("_cur").alias("v")
        return df.groupBy(key).agg(F.count(F.lit(1)).cast("bigint").alias("count"))

    def _norm_group_keys(args) -> list:
        """Normalize a key by()-step argument list to [(kind, payload,
        alias)] — kind: 'id' | 'tag' | 'prop' | 'degree'. The extended GIE
        GroupStep (supported_gremlin_steps.md §Aggregate (Group)) allows
        multiple keys, each a values('p').as('k') / out().count().as('k')
        chain."""
        out = []
        for a in args:
            kind = a[0]
            if kind == "str":
                out.append(("id" if a[1] == "id" else "prop", a[1], a[1]))
            elif kind == "select" and len(a[1]) == 1:
                tag = a[1][0][1]
                if tag not in tags:
                    raise ValueError(
                        f"unbound tag {tag!r} in group().by(select())"
                    )
                out.append(("tag", tag, tag))
            elif kind == "step" and a[1][0] == "values" and len(a[1][1]) == 1:
                prop = a[1][1][0][1]
                out.append(("prop", prop, prop))
            elif kind == "step" and a[1] == ("id", []):
                out.append(("id", "id", "id"))
            elif kind == "chain":
                ch = a[1]
                alias = None
                if ch[-1][0] == "as" and len(ch[-1][1]) == 1:
                    alias = ch[-1][1][0][1]
                    ch = ch[:-1]
                if len(ch) == 1 and ch[0][0] == "values" and len(ch[0][1]) == 1:
                    prop = ch[0][1][0][1]
                    out.append(("prop", prop, alias or prop))
                elif (
                    len(ch) == 2
                    and ch[0][0] in ("out", "in", "both")
                    and ch[1] == ("count", [])
                ):
                    elabel = ch[0][1][0][1] if ch[0][1] else None
                    out.append(("degree", (ch[0][0], elabel),
                                alias or "count"))
                else:
                    raise ValueError(
                        f"unsupported group() key chain: {a!r}"
                    )
            else:
                raise ValueError(f"unsupported group().by() key: {a!r}")
        return out

    def _norm_group_vals(args) -> list:
        """Normalize a value by()-step argument list to [(agg, prop|None,
        alias)] — agg: 'count' | 'fold' | 'sum'|'min'|'max'|'mean'."""
        out = []
        for a in args:
            kind = a[0]
            if kind == "step":
                vname, vargs = a[1]
                if vname in ("count", "fold") and not vargs:
                    out.append((vname, None,
                                "count" if vname == "count" else "value"))
                elif vname in ("sum", "min", "max", "mean") and len(vargs) == 1:
                    out.append((vname, vargs[0][1], vname))
                else:
                    raise ValueError(
                        f"unsupported group() value step: {a!r}"
                    )
            elif kind == "chain":
                ch = a[1]
                alias = None
                if ch[-1][0] == "as" and len(ch[-1][1]) == 1:
                    alias = ch[-1][1][0][1]
                    ch = ch[:-1]
                if len(ch) == 1 and ch[0][0] == "count" and not ch[0][1]:
                    out.append(("count", None, alias or "count"))
                elif (
                    len(ch) == 2
                    and ch[0][0] == "values"
                    and len(ch[0][1]) == 1
                    and ch[1][0] in ("sum", "min", "max", "mean")
                    and not ch[1][1]
                ):
                    out.append((ch[1][0], ch[0][1][0][1], alias or ch[1][0]))
                else:
                    raise ValueError(
                        f"unsupported group() value chain: {a!r}"
                    )
            else:
                raise ValueError(f"unsupported group() value by(): {a!r}")
        return out

    def finish_grp(keyspecs, valspecs) -> DataFrame:
        """group().by(key…).by(val…) → one row per key tuple (GIE
        GroupStep, incl. the extended multi-key/multi-value forms of
        supported_gremlin_steps.md §Aggregate (Group)).

        keys: None (vertex id) | normalized list from _norm_group_keys;
        vals: None (fold — Gremlin's default group value) | normalized
        list from _norm_group_vals. fold sorts the collected list so the
        result is deterministic across partitionings; degree keys count
        one-hop neighbors (vertices without edges key at 0)."""
        keyed = df
        keycols = []
        for kn, (kind, payload, alias) in enumerate(
            keyspecs or [("id", "id", "v")]
        ):
            if kind == "id":
                keycols.append(F.col("_cur").alias(alias if keyspecs else "v"))
            elif kind == "tag":
                keycols.append(F.col(payload).alias(alias))
            elif kind == "prop":
                cname = f"_gkey{kn}"
                keyed = keyed.join(
                    _prop_table(graph, payload).withColumnRenamed("_p", cname),
                    "_cur",
                )
                keycols.append(F.col(cname).alias(alias))
            else:  # degree
                direction, elabel = payload
                e = _edges_for(graph, direction, elabel)
                if direction == "out":
                    deg = e.groupBy(F.col("src").alias("_cur"))
                elif direction == "in":
                    deg = e.groupBy(F.col("dst").alias("_cur"))
                else:
                    deg = (
                        e.select(F.col("src").alias("_cur"))
                        .unionAll(e.select(F.col("dst").alias("_cur")))
                        .groupBy("_cur")
                    )
                cname = f"_gkey{kn}"
                keyed = keyed.join(
                    deg.agg(F.count(F.lit(1)).alias(cname)), "_cur", "left"
                ).withColumn(
                    cname, F.coalesce(F.col(cname), F.lit(0)).cast("bigint")
                )
                keycols.append(F.col(cname).alias(alias))
        aggs = []
        prop_slots: dict[str, str] = {}
        for vn, (agg, prop, alias) in enumerate(
            valspecs or [("fold", None, "value")]
        ):
            if agg == "count":
                aggs.append(F.count(F.lit(1)).cast("bigint").alias(alias))
            elif agg == "fold":
                aggs.append(
                    F.sort_array(F.collect_list(F.col("_cur"))).alias(alias)
                )
            else:
                if prop not in prop_slots:
                    cname = f"_gval{vn}"
                    keyed = keyed.join(
                        _prop_table(graph, prop).withColumnRenamed(
                            "_p", cname
                        ),
                        "_cur",
                    )
                    prop_slots[prop] = cname
                fn = {"sum": F.sum, "min": F.min, "max": F.max, "mean": F.avg}
                aggs.append(fn[agg](F.col(prop_slots[prop])).alias(alias))
        return keyed.groupBy(*keycols).agg(*aggs)

    def apply_order() -> DataFrame:
        exprs = [
            F.col(c).asc() if d == "asc" else F.col(c).desc()
            for c, d in pending_order
        ]
        return df.orderBy(*exprs)

    consumed: set[int] = set()  # modulator steps folded into repeat()
    for i, (name, args) in enumerate(steps):
        if i in consumed:
            continue
        if pending_order is not None and name != "by":
            # first non-by step closes the order scope; the _ord columns
            # stay in the frame so Catalyst can plan orderBy+limit+project
            # as one TakeOrderedAndProject — terminals project them away
            if not pending_order:
                pending_order = [("_cur", "asc")]
            df = apply_order()
            pending_order = None
        if pending_group is not None:
            if name == "by":
                if i != len(steps) - 1:
                    raise ValueError("groupCount().by() must be terminal")
                if (
                    len(args) == 1
                    and args[0][0] == "select"
                    and len(args[0][1]) == 1
                ):
                    tag = args[0][1][0][1]
                    if tag not in tags:
                        raise ValueError(f"unbound tag {tag!r} in by(select(...))")
                    return finish_group(tag)
                if len(args) == 1 and args[0][0] == "str":
                    # groupCount().by('prop'): count traversers per property
                    # value (elements without the property are dropped, as
                    # Gremlin throws for them)
                    prop = args[0][1]
                    keyed = (
                        df
                        if prop == "id"
                        else df.join(_prop_table(graph, prop), "_cur")
                    )
                    key = F.col("_cur" if prop == "id" else "_p").alias(prop)
                    return keyed.groupBy(key).agg(
                        F.count(F.lit(1)).cast("bigint").alias("count")
                    )
                raise ValueError(
                    ".by() after groupCount takes select('tag') or 'prop'"
                )
            raise ValueError("groupCount() may only be followed by .by(...)")
        if pending_grp is not None:
            if name == "by":
                if not args:
                    raise ValueError("group().by() needs arguments")
                if pending_grp["n_by"] == 0:
                    pending_grp["key"] = _norm_group_keys(args)
                elif pending_grp["n_by"] == 1:
                    pending_grp["val"] = _norm_group_vals(args)
                else:
                    raise ValueError("group() takes at most two .by(...)")
                pending_grp["n_by"] += 1
                if i == len(steps) - 1:
                    return finish_grp(pending_grp["key"], pending_grp["val"])
                continue
            raise ValueError("group() may only be followed by .by(...)")
        if pending_order is not None and name == "by":
            # by('prop' [, desc]) | by(select('tag') [, desc]) | by(desc)
            direction = "asc"
            keyargs = list(args)
            if keyargs and keyargs[-1][0] == "ord":
                direction = keyargs.pop()[1]
            if not keyargs:
                col = "_cur"
            elif keyargs[0][0] == "str":
                prop = keyargs[0][1]
                if prop == "id":
                    col = "_cur"
                else:
                    n_ord += 1
                    col = f"_ord{n_ord}"
                    pt = _prop_table(graph, prop).withColumnRenamed("_p", col)
                    df = df.join(pt, "_cur")
            elif keyargs[0][0] == "select" and len(keyargs[0][1]) == 1:
                col = keyargs[0][1][0][1]
                if col not in tags:
                    raise ValueError(f"unbound tag {col!r} in order().by()")
            else:
                raise ValueError(f"unsupported order().by() argument: {args!r}")
            pending_order.append((col, direction))
            continue

        if cur_kind == "e" and name not in (
            "has", "hasNot", "values", "valueMap", "count", "limit",
            "range", "sample", "coin", "inV", "outV", "otherV", "bothV",
            "dedup", "fold", "subgraph",
        ):
            raise ValueError(
                f"step {name}() is not supported on edge traversers — "
                "return to vertices with inV()/outV() first"
            )
        if cur_kind == "val" and name not in (
            "is", "count", "sum", "min", "max", "mean", "fold", "dedup",
            "limit", "range", "sample", "coin",
        ):
            raise ValueError(
                f"step {name}() is not supported on value traversers "
                "(after values())"
            )
        if cur_kind == "p" and name not in ("endV", "count", "limit"):
            raise ValueError(
                f"step {name}() is not supported on path-collection "
                "traversers (RESULT_OPT ALL_V) — call endV() first"
            )
        if cur_kind == "m" and name not in ("select", "count", "dedup", "limit"):
            raise ValueError(
                f"step {name}() is not supported on match() bindings — "
                "use select()/count()/dedup()/limit()"
            )
        if name == "V":
            df = _all_vertices(graph)
            if args:
                df = df.filter(
                    F.col("_cur").isin([v for _k, v in args])
                )
            if track_path:
                df = df.withColumn("_path", F.array(F.col("_cur")))
        elif name == "E":
            # edge source: the traverser starts as the edge element (GIE
            # E-step, supported_gremlin_steps.md §Source). No anchor vertex
            # exists, so otherV() is undefined here.
            if df is not None:
                raise ValueError("E() must be the source step")
            if track_path:
                raise ValueError(
                    "path() together with edge steps is not supported "
                    "(the path array is vertex-only)"
                )
            elabel = args[0][1] if args else None
            e = _edges_full(graph, elabel)
            df = e.withColumnRenamed("src", "_esrc").withColumnRenamed(
                "dst", "_edst"
            )
            edge_cols = [c for c in e.columns if c not in ("src", "dst")]
            cur_kind, has_anchor = "e", False
        elif df is None:
            raise ValueError("traversal must start with g.V(...) or g.E(...)")
        elif name in ("out", "in", "both"):
            rng = (
                args[0][1]
                if args
                and args[0][0] == "str"
                and re.match(r"^\d+\.\.\d+$", args[0][1])
                else None
            )
            if rng is not None:
                # GIE PathExpand syntactic sugar
                # (supported_gremlin_steps.md §PathExpand): out("lo..hi",
                # label...) expands [lo, hi) hops; with('PATH_OPT',
                # ARBITRARY|SIMPLE|TRAIL) and with('RESULT_OPT',
                # END_V|ALL_V) configure it; endV() returns to the end
                # vertex from the ALL_V path collection
                from graphscope_spark.operators.relational import path_expand

                if track_path:
                    raise ValueError(
                        "path() together with PathExpand sugar is not "
                        "supported (use RESULT_OPT ALL_V)"
                    )
                lo, hi = map(int, rng.split(".."))
                if not (0 <= lo < hi):
                    raise ValueError(f"bad PathExpand range {rng!r}")
                elabels = [v for _k, v in args[1:]] or [None]
                path_opt, result_opt = "ARBITRARY", "ALL_V"
                j = i + 1
                while j < len(steps) and steps[j][0] == "with":
                    margs = steps[j][1]
                    if (
                        len(margs) != 2
                        or margs[0][0] != "str"
                        or margs[1][0] != "str"
                    ):
                        raise ValueError(
                            ".with() takes ('PATH_OPT'|'RESULT_OPT', value)"
                        )
                    key, val = margs[0][1].upper(), margs[1][1].upper()
                    if key == "PATH_OPT":
                        path_opt = val
                    elif key == "RESULT_OPT":
                        result_opt = val
                    else:
                        raise ValueError(f"unknown with() option {key!r}")
                    consumed.add(j)
                    j += 1
                if path_opt not in ("ARBITRARY", "SIMPLE", "TRAIL"):
                    raise ValueError(f"unsupported PATH_OPT {path_opt!r}")
                if result_opt not in ("END_V", "ALL_V"):
                    raise ValueError(
                        f"unsupported RESULT_OPT {result_opt!r} (ALL_V_E "
                        "needs edge elements, which this subset does not "
                        "model in paths)"
                    )
                parts = [_edges_for(graph, name, el) for el in elabels]
                e = parts[0]
                for p in parts[1:]:
                    e = e.unionByName(p)
                if name == "in":
                    e = e.select(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    )
                elif name == "both":
                    e = e.unionByName(
                        e.select(
                            F.col("dst").alias("src"),
                            F.col("src").alias("dst"),
                        )
                    )
                starts = df.select("_cur").distinct()
                paths = path_expand(
                    starts, e, lo, hi - 1,
                    semantics=path_opt.lower(), v_col="_cur",
                )
                pe = paths.select(
                    F.col("start").alias("_cur"),
                    F.col("end").alias("_peend"),
                    F.col("path").alias("_pepath"),
                )
                df = (
                    df.join(pe, "_cur")
                    .drop("_cur")
                    .withColumnRenamed("_peend", "_cur")
                )
                if result_opt == "END_V":
                    df = df.drop("_pepath")
                else:
                    cur_kind = "p"  # path-collection traverser
                continue
            elabel = args[0][1] if args else None
            e = _edges_for(graph, name, elabel)
            df = edge_expand(df, e, name, "_cur", "_nxt").drop("_cur").withColumnRenamed(
                "_nxt", "_cur"
            )
            if track_path:
                df = df.withColumn(
                    "_path", F.concat(F.col("_path"), F.array(F.col("_cur")))
                )
        elif name in ("outE", "inE", "bothE"):
            # edge-element step: the traverser becomes the EDGE, its
            # property columns exposed for has()/values(); _eanchor keeps
            # the vertex we arrived from so otherV() can leave the other way
            if track_path:
                raise ValueError(
                    "path() together with edge steps is not supported "
                    "(the path array is vertex-only)"
                )
            elabel = args[0][1] if args else None
            e = _edges_full(graph, elabel)
            eprops = [c for c in e.columns if c not in ("src", "dst")]
            for c in eprops:
                if c in df.columns:
                    raise ValueError(
                        f"edge property {c!r} collides with a bound tag"
                    )

            def attach(base, key):
                other = "dst" if key == "src" else "src"
                return (
                    base.withColumn("_eanchor", F.col("_cur"))
                    .join(e.withColumnRenamed(key, "_cur"), "_cur")
                    .withColumnRenamed(
                        "_cur", "_esrc" if key == "src" else "_edst"
                    )
                    .withColumnRenamed(
                        other, "_edst" if key == "src" else "_esrc"
                    )
                )

            if name == "outE":
                df = attach(df, "src")
            elif name == "inE":
                df = attach(df, "dst")
            else:  # bothE: incident edges in either orientation
                df = attach(df, "src").unionByName(attach(df, "dst"))
            edge_cols = eprops
            cur_kind, has_anchor = "e", True
        elif name in ("inV", "outV", "otherV", "bothV"):
            if cur_kind != "e":
                raise ValueError(f"{name}() needs edge traversers (outE/inE/E)")
            anchor = ["_eanchor"] if has_anchor else []
            if name == "bothV":
                # both endpoints: each edge traverser splits into two
                # vertex traversers (TinkerPop bothV)
                df = df.withColumn("_cur", F.col("_esrc")).unionByName(
                    df.withColumn("_cur", F.col("_edst"))
                ).drop("_esrc", "_edst", *anchor, *edge_cols)
            else:
                if name == "otherV":
                    if not has_anchor:
                        raise ValueError(
                            "otherV() is undefined after E() — no anchor "
                            "vertex; use bothV()/inV()/outV()"
                        )
                    nxt = F.when(
                        F.col("_eanchor") == F.col("_esrc"), F.col("_edst")
                    ).otherwise(F.col("_esrc"))
                else:
                    nxt = F.col("_edst" if name == "inV" else "_esrc")
                df = df.withColumn("_cur", nxt).drop(
                    "_esrc", "_edst", *anchor, *edge_cols
                )
            cur_kind, edge_cols = "v", []
        elif name == "repeat":
            # repeat(step) + modulators: GIE's PathExpand iteration scope.
            # .times(n) unrolls a fixed hop count; .until(pred) runs a
            # do-while loop where traversers exit as soon as the predicate
            # holds; .emit() streams every intermediate frontier.
            if (
                len(args) != 1
                or args[0][0] != "step"
                or args[0][1][0] not in ("out", "in", "both")
            ):
                raise ValueError("repeat() takes one anonymous out/in/both step")
            inner_name, inner_args = args[0][1]
            n_times: int | None = None
            until_step = None
            do_emit = False
            j = i + 1
            while j < len(steps) and steps[j][0] in ("times", "until", "emit"):
                mname, margs = steps[j]
                if mname == "times":
                    if len(margs) != 1 or margs[0][0] != "num":
                        raise ValueError(".times(n) takes one integer argument")
                    n_times = int(margs[0][1])
                elif mname == "until":
                    if (
                        len(margs) != 1
                        or margs[0][0] != "step"
                        or margs[0][1][0] not in ("hasId", "has")
                    ):
                        raise ValueError(
                            ".until() takes one anonymous hasId(...)/has(...) step"
                        )
                    until_step = margs[0][1]
                elif mname == "emit":
                    if margs:
                        raise ValueError(".emit() takes no arguments")
                    do_emit = True
                consumed.add(j)
                j += 1
            if n_times is None and until_step is None:
                raise ValueError(
                    "repeat(...) needs a .times(n) and/or .until(...) modulator"
                )
            elabel = inner_args[0][1] if inner_args else None
            e = _edges_for(graph, inner_name, elabel)

            def expand_once(fr: DataFrame) -> DataFrame:
                fr = (
                    edge_expand(fr, e, inner_name, "_cur", "_nxt")
                    .drop("_cur")
                    .withColumnRenamed("_nxt", "_cur")
                )
                if track_path:
                    fr = fr.withColumn(
                        "_path",
                        F.concat(F.col("_path"), F.array(F.col("_cur"))),
                    )
                return fr

            if until_step is None and not do_emit:
                # pure fixed-hop unroll: stays lazy, one linear plan
                for _ in range(n_times):
                    df = expand_once(df)
            elif until_step is None:
                # times + emit: every hop's frontier is both the next hop's
                # input and an output branch — checkpoint per hop so the
                # emitted union doesn't recompute the expansion prefix
                outs = []
                for _ in range(n_times):
                    df = expand_once(df).localCheckpoint(eager=True)
                    outs.append(df)
                df = outs[0]
                for part in outs[1:]:
                    df = df.unionByName(part)
            else:
                cname, cvals = until_step

                def split_until(fr: DataFrame):
                    """(satisfying, continuing) split of a frontier."""
                    if cname == "hasId":
                        if not cvals:
                            raise ValueError("until(hasId(...)) needs ids")
                        cond = F.col("_cur").isin([v for _k, v in cvals])
                        return fr.filter(cond), fr.filter(~cond)
                    if len(cvals) != 2 or cvals[0][0] != "str":
                        raise ValueError(
                            "until(has(...)) takes (prop, literal | P)"
                        )
                    prop = cvals[0][1]
                    if prop == "id":
                        cond = _pred_col(F.col("_cur"), cvals[1])
                        return fr.filter(cond), fr.filter(~cond)
                    ids = (
                        _prop_table(graph, prop)
                        .filter(_pred_col(F.col("_p"), cvals[1]))
                        .select("_cur")
                    )
                    return (
                        fr.join(ids, "_cur", "left_semi"),
                        fr.join(ids, "_cur", "left_anti"),
                    )

                cap = n_times if n_times is not None else _UNTIL_MAX_ROUNDS
                frontier: DataFrame | None = df
                outs = []
                for _r in range(cap):
                    frontier = expand_once(frontier).localCheckpoint(
                        eager=True
                    )
                    sat, unsat = split_until(frontier)
                    # emit streams the whole post-step frontier (the
                    # satisfying subset is part of it — not double-counted)
                    outs.append(frontier if do_emit else sat)
                    frontier = unsat
                    if frontier.isEmpty():
                        frontier = None
                        break
                if frontier is not None:
                    if n_times is not None:
                        # Gremlin until-OR-times: the cap breaks the loop
                        # and the remaining traversers exit with the rest
                        if not do_emit:
                            outs.append(frontier)
                    else:
                        raise RuntimeError(
                            f"repeat().until() did not converge within "
                            f"{cap} rounds ({frontier.count()} traversers "
                            "still looping) — add .times(cap) to bound it"
                        )
                df = outs[0]
                for part in outs[1:]:
                    df = df.unionByName(part)
        elif name in ("times", "until", "emit"):
            raise ValueError(f".{name}(...) must follow repeat(...)")
        elif name == "with":
            raise ValueError(
                ".with(...) must follow a PathExpand out/in/both('lo..hi')"
            )
        elif name == "unfold":
            raise ValueError("unfold() must follow fold() in this subset")
        elif name == "endV":
            # unfold the ALL_V path collection to its end vertex
            # (supported_gremlin_steps.md §endV); a no-op after END_V
            if cur_kind == "p":
                df = df.drop("_pepath")
                cur_kind = "v"
            elif cur_kind != "v":
                raise ValueError("endV() follows a PathExpand step")
        elif name == "has":
            if len(args) == 3:
                # has(label, prop, value) — TinkerPop's fused
                # hasLabel+has form (supported_gremlin_steps.md §has())
                if cur_kind != "v" or args[0][0] != "str":
                    raise ValueError(
                        "has(label, prop, value) applies to vertex traversers"
                    )
                if isinstance(graph, Graph):
                    raise ValueError("has(label, ...) needs a PropertyGraph")
                lab = args[0][1]
                if lab not in graph.vertices:
                    raise ValueError(f"unknown vertex label {lab!r}")
                ids = graph.vertices[lab].select(F.col("id").alias("_cur"))
                df = df.join(ids, "_cur", "left_semi")
                args = args[1:]
            if len(args) == 1 and args[0][0] == "str":
                # has(prop) — keep elements that HAVE the property
                # (non-null); the complement of hasNot()
                prop = args[0][1]
                if cur_kind == "e":
                    if prop not in edge_cols:
                        df = df.filter(F.lit(False))
                    else:
                        df = df.filter(F.col(prop).isNotNull())
                elif prop == "id":
                    pass  # every element has its id
                else:
                    try:
                        pt = _prop_table(graph, prop)
                    except ValueError:
                        pt = None
                    if pt is None:
                        df = df.filter(F.lit(False))
                    else:
                        df = df.join(
                            pt.filter(F.col("_p").isNotNull()).select("_cur"),
                            "_cur",
                            "left_semi",
                        )
                continue
            if len(args) != 2 or args[0][0] != "str":
                raise ValueError("has() takes (prop, literal | P-predicate)")
            prop = args[0][1]
            if cur_kind == "e":
                if prop not in edge_cols:
                    raise ValueError(
                        f"edge has() needs an edge property "
                        f"(available: {edge_cols})"
                    )
                df = df.filter(_pred_col(F.col(prop), args[1]))
            elif prop == "id":
                df = df.filter(_pred_col(F.col("_cur"), args[1]))
            else:
                # _prop_table raises for a simple Graph (ids only) — never
                # silently reinterpret a named property as the vertex id
                pt = _prop_table(graph, prop).filter(_pred_col(F.col("_p"), args[1]))
                df = df.join(pt.select("_cur"), "_cur", "left_semi")
        elif name == "hasNot":
            # keep elements WITHOUT the property (TinkerPop hasNot /
            # supported_gremlin_steps.md §Filter): null-valued counts as
            # absent
            if len(args) != 1 or args[0][0] != "str":
                raise ValueError("hasNot() takes one property name")
            prop = args[0][1]
            if cur_kind == "e":
                if prop in edge_cols:
                    df = df.filter(F.col(prop).isNull())
                # else: no edge carries it — everything passes
            else:
                try:
                    pt = _prop_table(graph, prop)
                except ValueError:
                    pt = None  # no label carries it — everything passes
                if pt is not None:
                    df = df.join(
                        pt.filter(F.col("_p").isNotNull()).select("_cur"),
                        "_cur",
                        "left_anti",
                    )
        elif name == "hasLabel":
            if isinstance(graph, Graph):
                raise ValueError("hasLabel needs a PropertyGraph")
            labs = [v for _k, v in args]
            parts = [
                graph.vertices[lab].select(F.col("id").alias("_cur"))
                for lab in labs
            ]
            ids = parts[0]
            for p in parts[1:]:
                ids = ids.unionByName(p)
            df = df.join(ids, "_cur", "left_semi")
        elif name == "as":
            tag = args[0][1]
            df = df.withColumn(tag, F.col("_cur"))
            if tag not in tags:
                tags.append(tag)
        elif name in ("where", "not"):
            if len(args) == 1 and args[0][0] == "step":
                # existence filter: where(out('x')) keeps traversers whose
                # vertex has a matching incident edge (GIE where-traversal
                # → semi-join, supported_gremlin_steps.md §Filter);
                # not(...) is the anti-join complement
                sname, sargs = args[0][1]
                if sname not in ("out", "in", "both", "outE", "inE", "bothE"):
                    raise ValueError(
                        f"{name}() traversal supports a single "
                        "out/in/both/outE/inE/bothE step"
                    )
                direction = {"outE": "out", "inE": "in", "bothE": "both"}.get(
                    sname, sname
                )
                elabel = sargs[0][1] if sargs else None
                e = _edges_for(graph, direction, elabel)
                if direction == "out":
                    ids = e.select(F.col("src").alias("_cur"))
                elif direction == "in":
                    ids = e.select(F.col("dst").alias("_cur"))
                else:
                    ids = e.select(F.col("src").alias("_cur")).unionByName(
                        e.select(F.col("dst").alias("_cur"))
                    )
                how = "left_semi" if name == "where" else "left_anti"
                df = df.join(ids, "_cur", how)
            elif name == "where" and len(args) == 1 and args[0][0] in (
                "eq", "neq",
            ):
                tag = args[0][1][0][1]
                if tag not in tags:
                    raise ValueError(f"unbound tag {tag!r} in where()")
                cond = F.col("_cur") == F.col(tag)
                df = df.filter(cond if args[0][0] == "eq" else ~cond)
            elif (
                name == "where"
                and len(args) == 2
                and args[0][0] == "str"
                and args[1][0] in ("eq", "neq")
            ):
                # where('a', eq('b')): compare two tagged vertices
                # (supported_gremlin_steps.md §where(predicate))
                a_t, b_t = args[0][1], args[1][1][0][1]
                for t in (a_t, b_t):
                    if t not in tags:
                        raise ValueError(f"unbound tag {t!r} in where()")
                cond = F.col(a_t) == F.col(b_t)
                df = df.filter(cond if args[1][0] == "eq" else ~cond)
            elif len(args) == 1 and args[0][0] == "expr":
                # SQL-expression filter (supported_gremlin_steps.md
                # §Expression): where(expr(_.name = "marko")); property
                # lookups left-join onto the frame, a null outcome drops
                # the traverser (Gremlin filter semantics); not(expr(..))
                # keeps the complement of the TRUE set
                frame, col, temp = _bind_expr(
                    graph, df, tags, args[0][1], cur_kind, edge_cols, val_col
                )
                cond = (
                    ~F.coalesce(col, F.lit(False)) if name == "not" else col
                )
                df = frame.filter(cond).drop(*temp)
            else:
                raise ValueError(
                    f"{name}() supports eq('tag') / neq('tag') / "
                    "expr(...) / an anonymous traversal step"
                )
        elif name == "union":
            # union(out(..), in(..), ...): apply each single-step branch to
            # the incoming traversers and merge the streams (GIE UnionStep)
            if not args or any(
                a[0] != "step" or a[1][0] not in ("out", "in", "both")
                for a in args
            ):
                raise ValueError(
                    "union() takes one or more anonymous out/in/both steps"
                )
            branches = []
            for _k, (sname, sargs) in args:
                elabel = sargs[0][1] if sargs else None
                e = _edges_for(graph, sname, elabel)
                br = (
                    edge_expand(df, e, sname, "_cur", "_nxt")
                    .drop("_cur")
                    .withColumnRenamed("_nxt", "_cur")
                )
                if track_path:
                    br = br.withColumn(
                        "_path", F.concat(F.col("_path"), F.array(F.col("_cur")))
                    )
                branches.append(br)
            df = branches[0]
            for br in branches[1:]:
                df = df.unionByName(br)
        elif name == "identity":
            if args:
                raise ValueError("identity() takes no arguments")
        elif name == "match":
            # composite pattern step (supported_gremlin_steps.md §Match):
            # sentences __.as('a').out().as('b') lower onto the match()
            # join-DAG operator (closing-first greedy order); incoming
            # traversers restrict the first sentence's start tag (TinkerPop
            # match-start binding). Labeled patterns belong to the Cypher
            # frontend (cypher_property), which owns per-label edge tables.
            from graphscope_spark.operators.match import match as _match

            if not isinstance(graph, Graph):
                raise ValueError(
                    "match() step supports the simple Graph — use "
                    "cypher_property for labeled patterns"
                )
            if tags:
                raise ValueError(
                    "match() must run before as() tags are bound"
                )
            if not args:
                raise ValueError("match() needs at least one sentence")
            sentences: list[tuple[str, str, str]] = []
            first_tag: str | None = None
            anon = 0
            for a in args:
                if a[0] != "chain":
                    raise ValueError(
                        "match() sentences are __.as('t').out().as('u') chains"
                    )
                chain = a[1]
                if (
                    chain[0][0] != "as"
                    or len(chain[0][1]) != 1
                    or chain[0][1][0][0] != "str"
                ):
                    raise ValueError("match() sentences start with as('tag')")
                cur = chain[0][1][0][1]
                if first_tag is None:
                    first_tag = cur
                k = 1
                if k == len(chain):
                    raise ValueError(
                        "match() sentence needs at least one expand step"
                    )
                while k < len(chain):
                    sname, sargs = chain[k]
                    if sname not in ("out", "in", "both"):
                        raise ValueError(
                            f"match() sentences support as/out/in/both "
                            f"steps, got {sname}()"
                        )
                    if sargs:
                        raise ValueError(
                            "edge labels in match() sentences need the "
                            "Cypher frontend"
                        )
                    k += 1
                    if k < len(chain) and chain[k][0] == "as":
                        if (
                            len(chain[k][1]) != 1
                            or chain[k][1][0][0] != "str"
                        ):
                            raise ValueError("as() takes one tag string")
                        nxt = chain[k][1][0][1]
                        k += 1
                    elif k == len(chain):
                        raise ValueError(
                            "match() sentence must end with as('tag')"
                        )
                    else:
                        nxt = f"_m{anon}"  # anonymous mid-chain vertex
                        anon += 1
                    if sname == "in":
                        sentences.append((nxt, "out", cur))
                    else:
                        sentences.append((cur, sname, nxt))
                    cur = nxt
            bound = _match(graph, sentences)
            bound = bound.drop(
                *[c for c in bound.columns if c.startswith("_m")]
            )
            df = bound.join(
                df.select(F.col("_cur").alias(first_tag)).distinct(),
                first_tag,
                "left_semi",
            )
            tags = list(df.columns)
            cur_kind = "m"
        elif name == "is":
            # filter value traversers (GIE IsStep): values('age').is(gt(30))
            if cur_kind != "val":
                raise ValueError("is() applies to value traversers (values())")
            if len(args) != 1:
                raise ValueError("is() takes one literal or P-predicate")
            df = df.filter(_pred_col(F.col(val_col), args[0]))
        elif name == "dedup":
            # Gremlin semantics: dedup by the named tags (or the current
            # element); which traverser survives per group is arbitrary, so
            # later steps should only read the dedup keys
            if cur_kind == "e":
                if args:
                    raise ValueError("edge dedup() takes no tags")
                df = df.dropDuplicates(["_esrc", "_edst"])
            elif cur_kind == "val":
                if args:
                    raise ValueError("value dedup() takes no tags")
                df = df.dropDuplicates([val_col])
            else:
                default = list(tags) if cur_kind == "m" else ["_cur"]
                cols = [v for _k, v in args] or default
                for c in cols:
                    if c != "_cur" and c not in tags:
                        raise ValueError(f"unbound tag {c!r} in dedup()")
                df = df.dropDuplicates(cols)
        elif name == "hasId":
            if cur_kind != "v":
                raise ValueError("hasId() applies to vertex traversers")
            ids = [v for _k, v in args]
            if not ids:
                raise ValueError("hasId() needs at least one id")
            df = df.filter(F.col("_cur").isin(ids))
        elif name == "limit":
            df = df.limit(int(args[0][1]))
        elif name == "range":
            # range(lo, hi) keeps traversers [lo, hi) in stream order —
            # deterministic only after order(), same caveat as Gremlin
            if len(args) != 2:
                raise ValueError("range() takes (low, high)")
            lo, hi = int(args[0][1]), int(args[1][1])
            if not (0 <= lo <= hi):
                raise ValueError("range() needs 0 <= low <= high")
            df = df.offset(lo).limit(hi - lo)
        elif name == "sample":
            # deterministic seeded-hash sample of n traversers (GIE Sample;
            # stable across partitionings unlike df.sample)
            from graphscope_spark.operators.relational import sample_n

            df = sample_n(df, int(args[0][1]))
        elif name == "coin":
            # keep each traverser with probability p — seeded hash of the
            # full row, so the same traverser always flips the same way
            p = float(args[0][1])
            hv = F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns], F.lit(7)),
                F.lit(1_000_000),
            )
            df = df.filter(hv < F.lit(int(p * 1_000_000)))
        elif name == "count":
            if i != len(steps) - 1:
                raise ValueError("count() must be terminal")
            return df.agg(F.count(F.lit(1)).cast("bigint").alias("count"))
        elif name == "path":
            if i != len(steps) - 1:
                raise ValueError("path() must be terminal in this subset")
            # vertex-path subset of Gremlin's path(): the traverser's
            # visited-vertex history as an array column
            return df.select(F.col("_path").alias("path"))
        elif name == "order":
            if args:
                raise ValueError("order() takes no arguments (use .by(...))")
            pending_order = []
            continue
        elif name == "groupCount":
            pending_group = "_cur"
            continue
        elif name == "select":
            if i != len(steps) - 1:
                raise ValueError("select() must be terminal in this subset")
            if len(args) == 1 and args[0][0] == "expr":
                # projection form: select(expr(_.name)) → column `value`
                frame, col, _temp = _bind_expr(
                    graph, df, tags, args[0][1], cur_kind, edge_cols, val_col
                )
                return frame.select(col.alias("value"))
            cols = [v for _k, v in args]
            for c in cols:
                if c not in tags:
                    raise ValueError(f"unbound tag {c!r} in select()")
            return df.select(*cols)
        elif name == "project":
            # project('k1','k2').by(spec).by(spec) → one column per key
            # (TinkerPop ProjectStep / GIE Project); by specs: 'prop' |
            # values('p') | id() | select('tag') | out/in/both().count() |
            # expr(...). One by() per key, terminal.
            keys = [v for k, v in args if k == "str"]
            if not keys or len(keys) != len(args):
                raise ValueError("project() takes one or more string keys")
            bys = []
            j = i + 1
            while j < len(steps) and steps[j][0] == "by":
                if len(steps[j][1]) != 1:
                    raise ValueError("project().by() takes one argument")
                bys.append(steps[j][1][0])
                consumed.add(j)
                j += 1
            if j != len(steps):
                raise ValueError(
                    "project().by(...) must be terminal in this subset"
                )
            if len(bys) != len(keys):
                raise ValueError(
                    f"project() needs one .by() per key "
                    f"({len(keys)} keys, {len(bys)} by-steps)"
                )
            frame = df
            outcols = []
            for kn, (key, spec) in enumerate(zip(keys, bys)):
                if spec[0] == "expr":
                    frame, col, _t = _bind_expr(
                        graph, frame, tags, spec[1], cur_kind, edge_cols,
                        val_col,
                    )
                    outcols.append(col.alias(key))
                    continue
                kind, payload, _al = _norm_group_keys([spec])[0]
                if kind == "id":
                    col = F.col("_cur")
                elif kind == "tag":
                    col = F.col(payload)
                elif kind == "prop":
                    cname = f"_pj{kn}"
                    frame = frame.join(
                        _prop_table(graph, payload).withColumnRenamed(
                            "_p", cname
                        ),
                        "_cur", "left",
                    )
                    col = F.col(cname)
                else:  # degree
                    direction, elabel = payload
                    e = _edges_for(graph, direction, elabel)
                    if direction == "out":
                        deg = e.groupBy(F.col("src").alias("_cur"))
                    elif direction == "in":
                        deg = e.groupBy(F.col("dst").alias("_cur"))
                    else:
                        deg = (
                            e.select(F.col("src").alias("_cur"))
                            .unionAll(e.select(F.col("dst").alias("_cur")))
                            .groupBy("_cur")
                        )
                    cname = f"_pj{kn}"
                    frame = frame.join(
                        deg.agg(F.count(F.lit(1)).alias(cname)), "_cur", "left"
                    ).withColumn(
                        cname,
                        F.coalesce(F.col(cname), F.lit(0)).cast("bigint"),
                    )
                    col = F.col(cname)
                outcols.append(col.alias(key))
            return frame.select(*outcols)
        elif name == "valueMap":
            if i != len(steps) - 1:
                raise ValueError("valueMap() must be terminal in this subset")
            props = [v for _k, v in args]
            if cur_kind == "e":
                props = props or edge_cols
                bad = [p for p in props if p not in edge_cols]
                if bad:
                    raise ValueError(
                        f"edge valueMap() needs edge properties "
                        f"(available: {edge_cols}, got {bad})"
                    )
                return df.select(
                    F.col("_esrc").alias("src"),
                    F.col("_edst").alias("dst"),
                    *props,
                )
            if not props:
                raise ValueError(
                    "vertex valueMap() needs explicit property names in "
                    "this subset (per-label schemas differ)"
                )
            # DataFrame rendering of the property map: one column per
            # requested key; elements missing a property carry null
            # (Gremlin drops the key — a null column is the flat-schema
            # equivalent)
            out = df.select("_cur")
            for p in props:
                out = out.join(
                    _prop_table(graph, p).withColumnRenamed("_p", p),
                    "_cur",
                    "left",
                )
            return out.select(F.col("_cur").alias("id"), *props)
        elif name == "values":
            # the traverser becomes the property VALUE (TinkerPop values);
            # later steps run in value mode (is/dedup/limit/aggregates)
            if len(args) != 1 or args[0][0] != "str":
                raise ValueError("values() takes one property name")
            prop = args[0][1]
            if cur_kind == "e":
                if prop not in edge_cols:
                    raise ValueError(
                        f"edge values() needs an edge property "
                        f"(available: {edge_cols})"
                    )
                df = df.select(F.col(prop).alias(prop))
            elif prop == "id":
                df = df.select(F.col("_cur").alias(prop))
            else:
                df = df.join(_prop_table(graph, prop), "_cur").select(
                    F.col("_p").alias(prop)
                )
            cur_kind, val_col = "val", prop
        elif name in ("sum", "min", "max", "mean"):
            if cur_kind != "val":
                raise ValueError(
                    f"{name}() aggregates value traversers — call values() "
                    "first"
                )
            if args:
                raise ValueError(f"{name}() takes no arguments")
            if i != len(steps) - 1:
                raise ValueError(f"{name}() must be terminal")
            agg = {"sum": F.sum, "min": F.min, "max": F.max, "mean": F.avg}
            return df.agg(agg[name](val_col).alias(name))
        elif name == "fold":
            # fold the whole stream into one list row (TinkerPop fold);
            # sorted so the result is deterministic across partitionings.
            # fold().unfold() round-trips (supported_gremlin_steps.md
            # §Unfold) — the pair cancels, modulo the sort.
            if args:
                raise ValueError("fold() takes no arguments")
            if i + 1 < len(steps) and steps[i + 1][0] == "unfold":
                if steps[i + 1][1]:
                    raise ValueError("unfold() takes no arguments")
                consumed.add(i + 1)
                continue
            nxt = steps[i + 1] if i + 1 < len(steps) else None
            if nxt and nxt[0] in (
                "count", "sum", "min", "max", "mean"
            ) and nxt[1] == [("scope", "local")]:
                # fold().X(local) — the local-scope aggregate over the
                # folded list (supported_gremlin_steps.md §local:
                # g.V().fold().count(local),
                # g.V().values('age').fold().sum(local))
                if i + 1 != len(steps) - 1:
                    raise ValueError(f"{nxt[0]}(local) must be terminal")
                if nxt[0] != "count" and cur_kind == "e":
                    raise ValueError(
                        f"{nxt[0]}(local) needs numeric elements — fold "
                        "values() or vertex ids, not edges"
                    )
                consumed.add(i + 1)
                if cur_kind == "val":
                    col = F.col(val_col)
                elif cur_kind == "e":
                    col = F.struct(
                        F.col("_esrc").alias("src"),
                        F.col("_edst").alias("dst"),
                    )
                else:
                    col = F.col("_cur")
                fdf = df.agg(
                    F.sort_array(F.collect_list(col)).alias("folded")
                )
                c = F.col("folded")
                if nxt[0] == "count":
                    out = F.size(c).cast("long")
                elif nxt[0] == "min":
                    out = F.array_min(c)
                elif nxt[0] == "max":
                    out = F.array_max(c)
                else:
                    total = F.aggregate(
                        c, F.lit(0.0), lambda a, x: a + x.cast("double")
                    )
                    out = total if nxt[0] == "sum" else total / F.size(c)
                return fdf.select(out.alias(nxt[0]))
            if i != len(steps) - 1:
                raise ValueError("fold() must be terminal in this subset")
            if cur_kind == "val":
                col = F.col(val_col)
            elif cur_kind == "e":
                col = F.struct(
                    F.col("_esrc").alias("src"), F.col("_edst").alias("dst")
                )
            else:
                col = F.col("_cur")
            return df.agg(F.sort_array(F.collect_list(col)).alias("folded"))
        elif name == "group":
            if args:
                raise ValueError("group() takes no arguments (use .by(...))")
            pending_grp = {"key": None, "val": None, "n_by": 0}
            if i == len(steps) - 1:
                return finish_grp(None, None)
            continue
        elif name == "id":
            if args:
                raise ValueError("id() takes no arguments")
            if i != len(steps) - 1:
                raise ValueError("id() must be terminal in this subset")
            return df.select(F.col("_cur").alias("id"))
        elif name == "label":
            # vertex label projection (TinkerPop label); per-label vertex
            # tables make this a union of (id, lit(label)) lookups
            if isinstance(graph, Graph):
                raise ValueError("label() needs a PropertyGraph")
            if i != len(steps) - 1:
                raise ValueError("label() must be terminal in this subset")
            parts = [
                vdf.select(F.col("id").alias("_cur"), F.lit(lab).alias("label"))
                for lab, vdf in graph.vertices.items()
            ]
            labs = parts[0]
            for p in parts[1:]:
                labs = labs.unionByName(p)
            return df.join(labs, "_cur").select(
                F.col("_cur").alias("id"), "label"
            )
        elif name == "subgraph":
            # edge-induced subgraph (supported_gremlin_steps.md §Subgraph:
            # g.E().subgraph('sg')): the deduplicated edge set of the
            # current edge traversers as a new Graph. The name argument is
            # TinkerPop's side-effect key — accepted, unused (the subgraph
            # IS the result here).
            if cur_kind != "e":
                raise ValueError(
                    "subgraph() applies to edge traversers (E()/outE()/...)"
                )
            if i != len(steps) - 1:
                raise ValueError("subgraph() must be terminal in this subset")
            if args and (len(args) != 1 or args[0][0] != "str"):
                raise ValueError("subgraph() takes an optional name string")
            return df.select(
                F.col("_esrc").alias("src"), F.col("_edst").alias("dst")
            ).dropDuplicates(["src", "dst"])
        elif name == "constant":
            if len(args) != 1 or args[0][0] not in ("num", "str"):
                raise ValueError("constant() takes one literal")
            if i != len(steps) - 1:
                raise ValueError("constant() must be terminal in this subset")
            return df.select(F.lit(args[0][1]).alias("constant"))
        elif name == "elementMap":
            # valueMap + id + label (TinkerPop elementMap)
            if cur_kind != "v":
                raise ValueError("elementMap() applies to vertex traversers")
            if isinstance(graph, Graph):
                raise ValueError("elementMap() needs a PropertyGraph")
            if i != len(steps) - 1:
                raise ValueError("elementMap() must be terminal in this subset")
            props = [v for _k, v in args]
            parts = [
                vdf.select(F.col("id").alias("_cur"), F.lit(lab).alias("label"))
                for lab, vdf in graph.vertices.items()
            ]
            labs = parts[0]
            for p in parts[1:]:
                labs = labs.unionByName(p)
            out = df.select("_cur").join(labs, "_cur")
            for p in props:
                out = out.join(
                    _prop_table(graph, p).withColumnRenamed("_p", p),
                    "_cur",
                    "left",
                )
            return out.select(F.col("_cur").alias("id"), "label", *props)
        else:
            raise ValueError(f"unsupported step: {name}()")

    if pending_group is not None:
        return finish_group(None)
    if pending_order is not None:
        if not pending_order:
            pending_order = [("_cur", "asc")]
        df = apply_order()
    # non-terminated chain: the current elements, GIE Sink-style
    if cur_kind == "e":
        return df.select(
            F.col("_esrc").alias("src"), F.col("_edst").alias("dst"),
            *edge_cols,
        )
    if cur_kind == "val":
        return df  # already the single value column named after the prop
    if cur_kind == "p":
        # ALL_V path collections sink as the vertex-array column
        return df.select(F.col("_pepath").alias("path"))
    if cur_kind == "m":
        return df.select(*sorted(tags))
    return df.select(F.col("_cur").alias("id"))
