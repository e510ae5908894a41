"""Cypher-subset frontend: MATCH / WHERE / RETURN → the Pattern join DAG.

Reference path: GIE parses Cypher with ``CypherAntlr4Parser.java`` and plans
MATCH through ``GraphPlanner`` → Pattern/ExtendIntersect
(interactive_engine/compiler/src/main/java/com/alibaba/graphscope/common/ir/
planner/GraphPlanner.java:96-230); WHERE predicates are pushed into the
pattern join by ``FilterIntoJoinRule`` / ``FilterMatchRule``
(compiler/.../planner/rules/FilterMatchRule.java, PlannerGroup.java:84-197).

Two execution surfaces:

- :func:`cypher` — unlabeled patterns over the single-label simple
  :class:`~graphscope_spark.graph.graph.Graph` (tags bind vertex ids; WHERE
  may compare bare tags and literals).
- :func:`cypher_property` — labeled patterns over the multi-label
  :class:`~graphscope_spark.graph.property_graph.PropertyGraph`:

      MATCH (a:customer)-[:knows]->(b:customer)-[:buys_from]->(s:supplier)
      WHERE a.id < 100 AND s.nationkey >= 10
      RETURN s.id AS supplier_id, count(*) AS n_paths

  Vertex labels select the per-label edge tables; single-tag property
  predicates are pushed below the pattern joins as semi-joins on the
  filtered vertex table (the FilterIntoJoinRule shape); cross-tag
  predicates filter the bound rows after property joins. ``count(*)``
  alongside other RETURN items groups by them (Cypher's implicit
  aggregation).

Grammar (subset)::

    query  := MATCH path (, path)* [OPTIONAL MATCH path (, path)*]
              [WHERE pred (AND pred)*]
              (WITH [DISTINCT] item (, item)* [WHERE pred (AND pred)*]
               | UNWIND (alias | path_var | '[' lit, ... ']') AS name)*
              RETURN [DISTINCT] item (, item)*
              [ORDER BY alias [ASC|DESC] (, ...)*] [SKIP n] [LIMIT n]
              (the optional pattern LEFT-joins on its shared tags; unmatched
              rows carry nulls for optional-only tags; WITH pipelines one
              projection/aggregation stage — its WHERE filters the
              aggregated frame, Cypher's HAVING shape — and RETURN then
              sees only the WITH aliases)
    node   := '(' tag [':' label] ')'
              (a node-only path `(a)` is a vertex scan: joins on a shared
              tag, else a Cypher cartesian product)
    edge   := -[var?][:elabel?][*lo..hi]-> | <-[...]- | -[...]- | --> | <-- | --
              (variable-length patterns need a finite upper bound and lower
              to PathExpand with TRAIL semantics; labels/predicates bind the
              endpoints only, as in Cypher; a relationship variable on a
              single-hop pattern binds the edge's property columns for
              var.prop access in WHERE/RETURN — single-variable relationship
              predicates filter the edge scan itself)
    item   := count(*) | count([DISTINCT] tag[.prop]) | sum(tag[.prop])
              | min(...) | max(...) | avg(...) | collect(...)  # sorted list
              | tag | tag.prop            — each with optional [AS a];
              non-aggregate items are the implicit grouping keys
    pred   := bool expression over comparisons: cmp (AND|OR cmp)*,
              NOT cmp, parenthesized groups — standard precedence
              (NOT > AND > OR); a top-level conjunct touching a single
              tag's properties pushes down to that vertex table even
              when it is an OR/NOT group. Also:
              operand IS [NOT] NULL   — never pushed below an OPTIONAL
              MATCH (evaluates on the bound frame);
              [NOT] EXISTS((x)-[:lab]->(y))  — top-level conjunct only;
              semi/anti join against the pattern's edge table
              (supported_cypher.md "WHERE NOT EXIST … anti join")
    cmp    := operand (= | <> | != | < | <= | > | >=) operand
              | operand (STARTS WITH | ENDS WITH | CONTAINS) operand
              | operand =~ 'regex'      # rlike; literal pattern only
    operand:= arith over primaries: + - * / % with standard precedence and
              unary minus (no parens — those belong to the boolean grammar;
              '/' is always double division, Spark semantics)
    primary:= tag.prop | tag | int | float | 'string'
    RETURN/WITH also accept `arith AS alias` projection items (alias
    mandatory); aggregates take a bare primary only
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph
from graphscope_spark.graph.property_graph import PropertyGraph
from graphscope_spark.operators.match import match

__all__ = [
    "parse_cypher", "parse_match", "cypher", "cypher_property", "cypher_call",
]

_NODE = re.compile(
    r"\(\s*([A-Za-z_][A-Za-z_0-9]*)\s*(?::\s*([A-Za-z_][A-Za-z_0-9]*))?\s*\)"
)
_EDGE = re.compile(
    r"(<-|-)\s*(?:\[\s*([A-Za-z_][A-Za-z_0-9]*)?\s*"
    r"(?::\s*([A-Za-z_][A-Za-z_0-9]*))?\s*"
    r"(?:(\*)\s*(\d+)?\s*(?:(\.\.)\s*(\d+)?)?)?\s*\]\s*)?(->|-)"
)
_RETURN_ITEM = re.compile(
    r"^(?:(count)\s*\(\s*\*\s*\)"
    r"|(count|sum|min|max|avg|collect)\s*\(\s*(DISTINCT\s+)?"
    r"([A-Za-z_][A-Za-z_0-9]*)(?:\.([A-Za-z_][A-Za-z_0-9]*))?\s*\)"
    r"|([A-Za-z_][A-Za-z_0-9]*)(?:\.([A-Za-z_][A-Za-z_0-9]*))?)"
    r"(?:\s+AS\s+([A-Za-z_][A-Za-z_0-9]*))?$",
    re.IGNORECASE,
)
_OPERAND = re.compile(
    r"^(?:([A-Za-z_][A-Za-z_0-9]*)(?:\.([A-Za-z_][A-Za-z_0-9]*))?"
    r"|(-?\d+\.\d+)|(-?\d+)|'([^']*)')$"
)
_PRED = re.compile(r"^(.+?)\s*(<=|>=|<>|!=|=|<|>)\s*(.+)$")
# Cypher string predicates; tried before _PRED so '=~' never half-matches '='
_STR_PRED = re.compile(
    r"(?i)^(.+?)\s+(STARTS\s+WITH|ENDS\s+WITH|CONTAINS)\s+(.+)$"
)
_RE_PRED = re.compile(r"^(.+?)\s*=~\s*(.+)$")
# datetime(<epoch-ms>) literal (supported_cypher.md UDF row
# gs.function.datetime): rewritten to a paren-free __ts_<ms> token before
# the WHERE tokenizer runs, because the boolean grammar owns parentheses
_DATETIME_LIT = re.compile(r"(?i)\bdatetime\s*\(\s*(\d+)\s*\)")
_TS_TOKEN = re.compile(r"^__ts_(\d+)$")
# duration(<ms>) / duration({days: 1, hours: 2, …}) literal
# (supported_cypher.md Temporal Mathematical rows): rewritten to a
# paren-free __dur_<ms> token like datetime(). Only fixed-length units
# (days/hours/minutes/seconds/milliseconds) are accepted — months and
# years are calendar-dependent and have no single millisecond value.
_DURATION_LIT = re.compile(
    r"(?i)\bduration\s*\(\s*(\d+|\{[^}]*\})\s*\)"
)
_DUR_TOKEN = re.compile(r"^__dur_(\d+)$")
_DUR_UNIT_MS = {
    "day": 86_400_000, "days": 86_400_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "minute": 60_000, "minutes": 60_000,
    "second": 1_000, "seconds": 1_000,
    "millisecond": 1, "milliseconds": 1,
}


def _duration_ms(arg: str) -> int:
    """Total milliseconds of a duration() literal argument: a bare ms
    integer or a {unit: value, …} map over fixed-length units."""
    arg = arg.strip()
    if not arg.startswith("{"):
        return int(arg)
    total = 0
    body = arg[1:-1].strip()
    if not body:
        return 0
    for part in body.split(","):
        m = re.match(r"(?i)^\s*([A-Za-z]+)\s*:\s*(-?\d+)\s*$", part)
        if not m:
            raise ValueError(f"unsupported duration component: {part!r}")
        unit = m.group(1).lower()
        if unit not in _DUR_UNIT_MS:
            raise ValueError(
                f"unsupported duration unit {unit!r} — fixed-length units "
                "only (days/hours/minutes/seconds/milliseconds); months "
                "and years are calendar-dependent"
            )
        total += int(m.group(2)) * _DUR_UNIT_MS[unit]
    if total < 0:
        raise ValueError(
            "duration() literal is negative — negate it in the "
            "expression instead (- duration({...}))"
        )
    return total
# <temporal>.<interval> extraction (supported_cypher.md Extract row):
# tag.prop.year … tag.prop.second over a timestamp property
_EXTRACT_RE = re.compile(
    r"(?i)^([A-Za-z_]\w*)\.([A-Za-z_]\w*)"
    r"\.(year|month|day|hour|minute|second)$"
)
_EXTRACT_FNS = {
    "year": F.year, "month": F.month, "day": F.dayofmonth,
    "hour": F.hour, "minute": F.minute, "second": F.second,
}
# p = shortestPath((a)-[*..6]->(b)) — GIE's Cypher shortest-path surface;
# allShortestPaths(...) is the ALL SHORTEST path modifier
# (supported_cypher.md Path Modifier rows)
_SHORTEST = re.compile(
    r"(?is)^(?:([A-Za-z_][A-Za-z_0-9]*)\s*=\s*)?"
    r"(allShortestPaths|shortestPath)\s*\((.*)\)\s*$"
)

# WHERE tokens: quoted strings survive intact so AND/OR inside a literal
# never splits a predicate
_WHERE_TOKEN = re.compile(r"'[^']*'|\(|\)|[^()\s]+")

_EXISTS_CONJ = re.compile(r"(?is)^(NOT\s+)?EXISTS\s*\((.*)\)$")


def _split_items_text(text: str) -> list[str]:
    """Split a RETURN/WITH item list on commas OUTSIDE brackets/braces and
    string literals, so [a, b] list and {k: v} map literals stay one item."""
    parts, cur, depth, in_str = [], [], 0, False
    for ch in text:
        if in_str:
            cur.append(ch)
            in_str = ch != "'"
            continue
        if ch == "'":
            in_str = True
        elif ch in "[{":
            depth += 1
        elif ch in "]}":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_case(body: str, parse_operand, parse_pred) -> tuple[list, object]:
    """Parse a searched-CASE body (the text between CASE and END —
    supported_cypher.md Branch row, reference-planned) into
    ``([(pred_tree, value_operand), …], else_operand | None)``.

    Splits on top-level WHEN/THEN/ELSE keywords outside string literals
    and parentheses; each predicate goes through the WHERE grammar
    (``parse_pred``), each result value through ``parse_operand``."""
    toks: list[tuple[str, str]] = []  # (kw, following-text)
    depth, in_str, i, kw, start = 0, False, 0, None, 0
    out: list[tuple[str | None, str]] = []
    while i < len(body):
        c = body[i]
        if in_str:
            in_str = c != "'"
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and (i == 0 or not (body[i - 1].isalnum() or body[i - 1] == "_")):
            m = re.match(r"(?i)(WHEN|THEN|ELSE)(?![A-Za-z0-9_])", body[i:])
            if m:
                out.append((kw, body[start:i]))
                kw = m.group(1).upper()
                i += len(m.group(1))
                start = i
                continue
        i += 1
    out.append((kw, body[start:]))
    toks = [(k, t.strip()) for k, t in out if k is not None or t.strip()]
    if not toks:
        raise ValueError("empty CASE")
    # simple form: `CASE <expr> WHEN <value> THEN …` — the leading kw=None
    # token is the test operand; each WHEN value becomes an equality predicate
    test = None
    if toks[0][0] is None:
        test = parse_operand(toks[0][1])
        toks = toks[1:]
    if not toks or toks[0][0] != "WHEN":
        raise ValueError("CASE must start with WHEN (or `CASE expr WHEN`)")
    whens: list[tuple] = []
    els = None
    j = 0
    while j < len(toks):
        k, t = toks[j]
        if k == "WHEN":
            if j + 1 >= len(toks) or toks[j + 1][0] != "THEN":
                raise ValueError("CASE WHEN without a matching THEN")
            if test is not None:
                pred = ("cmp", test, "=", parse_operand(t))
            else:
                conj = parse_pred(t)
                pred = conj[0] if len(conj) == 1 else ("and", conj)
            whens.append((pred, parse_operand(toks[j + 1][1])))
            j += 2
        elif k == "ELSE":
            if els is not None or j != len(toks) - 1:
                raise ValueError("CASE allows one trailing ELSE")
            els = parse_operand(t)
            j += 1
        else:
            raise ValueError(f"unexpected {k} in CASE")
    return whens, els


def _split_top_and(text: str) -> list[str]:
    """Split a WHERE expression on its top-level ANDs (outside parentheses
    and string literals) — the unit at which [NOT] EXISTS(...) conjuncts
    are peeled off before the boolean parser sees the rest."""
    parts, cur = [], []
    depth, in_str, i = 0, False, 0
    while i < len(text):
        c = text[i]
        if in_str:
            cur.append(c)
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
            cur.append(c)
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif (
            depth == 0
            and re.match(r"(?i)AND(?![A-Za-z0-9_])", text[i:])
            and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_"))
        ):
            parts.append("".join(cur))
            cur = []
            i += 3
            continue
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_where(text: str, parse_operand) -> list:
    """Parse a WHERE expression into top-level conjunct trees.

    Grammar (Cypher precedence NOT > AND > XOR > OR):
    expr := xterm (OR xterm)* ; xterm := term (XOR term)* ;
    term := factor (AND factor)* ;
    factor := NOT factor | '(' expr ')' | operand cmp operand.
    Nodes: ("cmp", lhs, op, rhs) | ("and"|"or"|"xor", [nodes]) |
    ("not", node). Returns the AND-flattened top level as a list — the
    unit the planner's single-tag pushdown reasons over."""
    toks = _WHERE_TOKEN.findall(text.strip())
    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def is_kw(t, kw: str) -> bool:
        return t is not None and t.upper() == kw

    def expr():
        nonlocal pos
        parts = [xterm()]
        while is_kw(peek(), "OR"):
            pos += 1
            parts.append(xterm())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def xterm():
        nonlocal pos
        parts = [term()]
        while is_kw(peek(), "XOR"):
            pos += 1
            parts.append(term())
        return parts[0] if len(parts) == 1 else ("xor", parts)

    def term():
        nonlocal pos
        parts = [factor()]
        while is_kw(peek(), "AND"):
            pos += 1
            parts.append(factor())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def factor():
        nonlocal pos
        t = peek()
        if is_kw(t, "NOT"):
            pos += 1
            return ("not", factor())
        if t == "(":
            pos += 1
            node = expr()
            if peek() != ")":
                raise ValueError(f"unbalanced parentheses in WHERE: {text!r}")
            pos += 1
            return node
        atom = []
        while (
            peek() is not None
            and peek() not in ("(", ")")
            and (
                peek().upper() not in ("AND", "OR", "XOR", "NOT")
                # `IS NOT NULL`: the NOT belongs to the null test, not the
                # boolean grammar
                or (
                    peek().upper() == "NOT"
                    and atom
                    and atom[-1].upper() == "IS"
                )
            )
        ):
            atom.append(toks[pos])
            pos += 1
        raw = " ".join(atom)
        nm = re.match(r"(?i)^(.+?)\s+IS\s+(NOT\s+)?NULL$", raw)
        if nm:
            return ("null", parse_operand(nm.group(1)), bool(nm.group(2)))
        sm = _STR_PRED.match(raw)
        if sm:
            op = {
                "STARTS": "startswith",
                "ENDS": "endswith",
                "CONTAINS": "contains",
            }[sm.group(2).upper().split()[0]]
            return (
                "cmp", parse_operand(sm.group(1)), op,
                parse_operand(sm.group(3)),
            )
        rm = _RE_PRED.match(raw)
        if rm:
            return (
                "cmp", parse_operand(rm.group(1)), "=~",
                parse_operand(rm.group(2)),
            )
        pm = _PRED.match(raw)
        if not pm:
            raise ValueError(f"unsupported predicate: {raw!r}")
        op = "<>" if pm.group(2) == "!=" else pm.group(2)
        return ("cmp", parse_operand(pm.group(1)), op, parse_operand(pm.group(3)))

    node = expr()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in WHERE: {' '.join(toks[pos:])!r}")
    return list(node[1]) if node[0] == "and" else [node]


def _operand_leaves(operand):
    """Yield the primary leaves (prop/tag/lit) under an operand, descending
    through arithmetic nodes."""
    kind = operand[0]
    if kind == "arith":
        yield from _operand_leaves(operand[2])
        yield from _operand_leaves(operand[3])
    elif kind == "neg":
        yield from _operand_leaves(operand[1])
    elif kind == "extract":
        # interval extraction reads the underlying property — pushdown
        # reasoning sees it as that property reference
        yield ("prop", operand[1], operand[2])
    else:
        yield operand


def _cmp_operands(node):
    """Yield every comparison operand LEAF in a predicate tree (arithmetic
    expressions contribute their primaries)."""
    kind = node[0]
    if kind == "cmp":
        yield from _operand_leaves(node[1])
        yield from _operand_leaves(node[3])
    elif kind == "null":
        yield from _operand_leaves(node[1])
    elif kind == "not":
        yield from _cmp_operands(node[1])
    else:  # and / or
        for child in node[1]:
            yield from _cmp_operands(child)


def _has_null_test(node) -> bool:
    """True when a predicate tree contains an IS [NOT] NULL test — such
    conjuncts must evaluate on the BOUND frame (post), never push into a
    vertex scan: pushing `b.p IS NULL` below an OPTIONAL MATCH would turn
    matched-but-non-null rows into unmatched null rows instead of dropping
    them."""
    kind = node[0]
    if kind == "null":
        return True
    if kind == "cmp":
        return False
    if kind == "not":
        return _has_null_test(node[1])
    return any(_has_null_test(c) for c in node[1])


def _item_prop_refs(items):
    """(tag, prop) pairs a projection-item list reads, including the
    primaries inside arithmetic expr items."""
    for kind, tag, prop, _al in items:
        if kind == "expr":
            for o in _operand_leaves(tag):
                if o[0] == "prop":
                    yield o[1], o[2]
        elif kind == "listexpr":
            for node in tag:
                for o in _operand_leaves(node):
                    if o[0] == "prop":
                        yield o[1], o[2]
        elif kind == "case":
            for pred, val in tag:
                for o in _cmp_operands(pred):
                    if o[0] == "prop":
                        yield o[1], o[2]
                for o in _operand_leaves(val):
                    if o[0] == "prop":
                        yield o[1], o[2]
            if prop is not None:  # the ELSE operand rides the prop slot
                for o in _operand_leaves(prop):
                    if o[0] == "prop":
                        yield o[1], o[2]
        elif kind == "mapexpr":
            for _key, node in tag:
                for o in _operand_leaves(node):
                    if o[0] == "prop":
                        yield o[1], o[2]
        elif prop is not None and (kind == "prop" or kind.startswith("agg:")):
            yield tag, prop


def _parse_arith(raw: str, leaf):
    """Parse ``raw`` as an arithmetic expression over primaries: + - * / %
    and ^ (exponentiation, right-associative, binds tightest —
    supported_cypher.md maps it to power(a, b)) with standard precedence
    and unary minus (no parentheses — those belong to the boolean grammar
    in WHERE). ``leaf(token) -> operand`` builds and validates each
    primary. Nodes: ("arith", op, l, r) | ("neg", x)."""
    toks = [
        t for t in re.split(r"\s*([+\-*/%^])\s*", raw.strip()) if t != ""
    ]
    pos = 0

    def prim():
        nonlocal pos
        if pos < len(toks) and toks[pos] == "-":
            pos += 1
            return ("neg", prim())
        if pos >= len(toks) or toks[pos] in "+-*/%^":
            raise ValueError(f"unsupported operand: {raw!r}")
        node = leaf(toks[pos])
        pos += 1
        return node

    def power():
        nonlocal pos
        node = prim()
        if pos < len(toks) and toks[pos] == "^":
            pos += 1
            node = ("arith", "^", node, power())  # right-associative
        return node

    def term():
        nonlocal pos
        node = power()
        while pos < len(toks) and toks[pos] in ("*", "/", "%"):
            op = toks[pos]
            pos += 1
            node = ("arith", op, node, power())
        return node

    def expr():
        nonlocal pos
        node = term()
        while pos < len(toks) and toks[pos] in ("+", "-"):
            op = toks[pos]
            pos += 1
            node = ("arith", op, node, term())
        return node

    node = expr()
    if pos != len(toks):
        raise ValueError(f"unsupported operand: {raw!r}")
    if node[0] not in ("arith", "neg"):
        raise ValueError(f"unsupported operand: {raw!r}")
    return node


def _pred_to_col(node, opcol) -> "Column":
    """Compile a predicate tree to a Column; ``opcol(operand) -> Column``."""
    kind = node[0]
    if kind == "cmp":
        if node[2] == "=~":
            rhs = node[3]
            if rhs[0] != "lit" or not isinstance(rhs[1], str):
                raise ValueError("=~ needs a string-literal regex")
            return opcol(node[1]).rlike(rhs[1])
        return _OPS[node[2]](opcol(node[1]), opcol(node[3]))
    if kind == "null":
        col = opcol(node[1])
        return col.isNotNull() if node[2] else col.isNull()
    if kind == "not":
        return ~_pred_to_col(node[1], opcol)
    cols = [_pred_to_col(c, opcol) for c in node[1]]
    out = cols[0]
    for c in cols[1:]:
        if kind == "and":
            out = out & c
        elif kind == "xor":
            # boolean exclusive disjunction (supported_cypher.md XOR row)
            out = out != c
        else:
            out = out | c
    return out


def _strip_comments(q: str) -> str:
    """Drop ``//`` line comments (supported_cypher.md Keyword/Comments row)
    outside single-quoted string literals."""
    out, i, in_str = [], 0, False
    while i < len(q):
        c = q[i]
        if in_str:
            in_str = c != "'"
        elif c == "'":
            in_str = True
        elif c == "/" and i + 1 < len(q) and q[i + 1] == "/":
            nl = q.find("\n", i)
            i = len(q) if nl < 0 else nl
            continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_cypher(query: str, extra_names: set | None = None) -> dict:
    """Parse the MATCH/WHERE/RETURN subset into a plain-dict AST:

    ``{"sentences": [(src_tag, dir, dst_tag, edge_label|None)],
    "labels": {tag: label|None}, "where": [conjunct trees],
    "return": {"distinct": bool, "items": [(kind, tag, prop, alias)]}}``

    where operands are ``("prop", tag, name)`` / ``("tag", tag)`` /
    ``("lit", value)`` and item kind ∈ {"tag", "prop", "count"}.
    """
    q = _strip_comments(query).strip().rstrip(";")
    # datetime(<ms>) literals become paren-free tokens the WHERE/RETURN
    # grammars can carry (note: a literal `datetime(123)` INSIDE a quoted
    # string would also rewrite — datetime-shaped string content is not
    # supported)
    q = _DATETIME_LIT.sub(lambda m: f"__ts_{m.group(1)}", q)
    # duration(<ms> | {unit: value, …}) literals likewise — rewritten
    # before parsing so the map form's commas/braces never reach the
    # item/WHERE grammars
    q = _DURATION_LIT.sub(lambda m: f"__dur_{_duration_ms(m.group(1))}", q)
    # WITH is a clause keyword only when it does not complete a string
    # predicate — `STARTS WITH` / `ENDS WITH` stay inside their WHERE text
    toks = re.split(
        r"(?is)\b(OPTIONAL\s+MATCH|MATCH|WHERE|"
        r"(?<!STARTS\s)(?<!ENDS\s)WITH|UNWIND|RETURN)\b",
        q,
    )
    if toks[0].strip() or len(toks) < 3:
        raise ValueError(
            "expected 'MATCH <patterns> [OPTIONAL MATCH <patterns>] "
            "[WHERE <preds>] [WITH <items> [WHERE <preds>]] RETURN <items>'"
        )
    pattern_parts: list[str] = []
    where_parts: list[str] = []
    optional_part = return_part = None
    # each WITH opens a pipeline stage: [{"text": items, "where": [texts]}]
    with_stages_raw: list[dict] = []
    scope = "match"  # WHERE binds to the MATCH scope until WITH is seen
    for kw, text in zip(toks[1::2], toks[2::2]):
        kw = re.sub(r"\s+", " ", kw.upper())
        text = text.strip()
        if kw == "MATCH":
            # several MATCH clauses join on their shared tags — for the
            # inner-pattern subset this equals one comma-joined pattern list
            if optional_part is not None:
                raise ValueError("MATCH may not follow OPTIONAL MATCH")
            if scope != "match":
                raise ValueError("MATCH after WITH is not supported")
            pattern_parts.append(text)
        elif kw == "OPTIONAL MATCH":
            if optional_part is not None:
                raise ValueError("only one OPTIONAL MATCH clause is supported")
            if scope != "match":
                raise ValueError("OPTIONAL MATCH after WITH is not supported")
            optional_part = text
        elif kw == "WHERE":
            if scope == "match":
                # per-clause WHEREs all filter the joined match frame (AND)
                where_parts.append(text)
            else:
                with_stages_raw[-1]["where"].append(text)
        elif kw == "WITH":
            with_stages_raw.append({"text": text, "where": []})
            scope = "with"
        elif kw == "UNWIND":
            # UNWIND list AS x — GIE's UNFOLD (supported_cypher.md keyword
            # table): one output row per list element, other columns kept
            with_stages_raw.append({"unwind_text": text, "where": []})
            scope = "with"
        else:  # RETURN
            return_part = text
    if not pattern_parts or return_part is None:
        raise ValueError("query needs both a MATCH and a RETURN clause")
    pattern_part = ", ".join(pattern_parts)
    where_part = " AND ".join(where_parts) if where_parts else None

    sentences: list[tuple[str, str, str, str | None]] = []
    bare: list[str] = []  # node-only patterns `(a)` — vertex scans
    labels: dict[str, str | None] = {}
    # sentence index → (min_hops, max_hops) for -[*a..b]-> patterns
    var_hops: dict[int, tuple[int, int]] = {}
    # sentence index → {"var": path var|None, "max": depth bound|None} for
    # p = shortestPath((a)-[*..k]->(b)) patterns
    shortest: dict[int, dict] = {}
    path_vars: dict[str, int] = {}
    # relationship variable → sentence index, for -[r:label]-> edge-property
    # access (r.prop in WHERE/RETURN)
    edge_vars: dict[str, int] = {}

    def note_label(tag: str, label: str | None) -> None:
        prev = labels.get(tag)
        if prev is not None and label is not None and prev != label:
            raise ValueError(f"tag {tag!r} bound to two labels: {prev}, {label}")
        labels[tag] = label if label is not None else prev

    def parse_shortest(
        path: str, sp_var: str | None, inner: str, all_paths: bool = False
    ) -> None:
        """p = shortestPath((a)-[:lab?][*lo..hi?]->(b)) — ONE edge pattern;
        an unbounded [*] is allowed here (BFS terminates regardless).
        ``all_paths`` marks allShortestPaths(...) (ALL SHORTEST): every
        minimal-hop path binds, not one deterministic representative."""
        pos = 0
        node = _NODE.match(inner, pos)
        if not node:
            raise ValueError(f"expected a node pattern at: {inner[pos:]!r}")
        a = node.group(1)
        note_label(a, node.group(2))
        pos = node.end()
        em = _EDGE.match(inner, pos)
        if not em:
            raise ValueError(f"expected an edge pattern at: {inner[pos:]!r}")
        left, evar, elabel, _star, _hmin, _dots, hmax, right = em.groups()
        if evar is not None:
            raise ValueError(
                "relationship variables inside shortestPath() are not "
                "supported (bind the path: p = shortestPath(...))"
            )
        pos = em.end()
        node = _NODE.match(inner, pos)
        if not node or node.end() != len(inner):
            raise ValueError(
                f"shortestPath takes exactly one edge pattern: {path!r}"
            )
        b = node.group(1)
        note_label(b, node.group(2))
        if left == "-" and right == "->":
            sentences.append((a, "out", b, elabel))
        elif left == "<-" and right == "-":
            sentences.append((b, "out", a, elabel))
        elif left == "-" and right == "-":
            sentences.append((a, "both", b, elabel))
        else:
            raise ValueError(f"unsupported edge direction {left}…{right}")
        idx = len(sentences) - 1
        shortest[idx] = {
            "var": sp_var, "max": int(hmax) if hmax else None,
            "all": all_paths,
        }
        if sp_var is not None:
            if sp_var in path_vars or sp_var in labels:
                raise ValueError(f"path variable {sp_var!r} already bound")
            path_vars[sp_var] = idx

    def parse_part(part_text: str) -> None:
        for path in (p.strip() for p in part_text.split(",") if p.strip()):
            sp = _SHORTEST.match(path)
            if sp:
                parse_shortest(
                    path, sp.group(1), sp.group(3).strip(),
                    sp.group(2).lower().startswith("all"),
                )
                continue
            pos = 0
            node = _NODE.match(path, pos)
            if not node:
                raise ValueError(f"expected a node pattern at: {path[pos:]!r}")
            cur = node.group(1)
            note_label(cur, node.group(2))
            pos = node.end()
            if pos == len(path):
                # node-only pattern `(a[:label])`: a vertex scan — joins on
                # the tag when it also appears in an edge pattern, else a
                # Cypher cartesian product
                bare.append(cur)
                continue
            while pos < len(path):
                em = _EDGE.match(path, pos)
                if not em:
                    raise ValueError(f"expected an edge pattern at: {path[pos:]!r}")
                left, evar, elabel, star, hmin, dots, hmax, right = em.groups()
                if evar is not None:
                    if star:
                        raise ValueError(
                            "relationship variables on variable-length "
                            "patterns are not supported"
                        )
                    if evar in edge_vars or evar in path_vars:
                        raise ValueError(
                            f"relationship variable {evar!r} already bound"
                        )
                    edge_vars[evar] = len(sentences)  # index after append
                hops = None
                if star:
                    lo = int(hmin) if hmin else 1
                    if hmax:
                        hi = int(hmax)
                    elif hmin and not dots:
                        hi = lo  # [*n] = exactly n
                    else:
                        hi = None  # [*], [*n..], [*..] — unbounded
                    if hi is None:
                        raise ValueError(
                            "unbounded variable-length patterns ([*], [*n..]) "
                            "are not supported — give an upper bound"
                        )
                    if lo < 1 or hi < lo:
                        raise ValueError(f"bad hop range *{lo}..{hi}")
                    hops = (lo, hi)
                pos = em.end()
                node = _NODE.match(path, pos)
                if not node:
                    raise ValueError(f"expected a node pattern at: {path[pos:]!r}")
                nxt = node.group(1)
                note_label(nxt, node.group(2))
                pos = node.end()
                if left == "-" and right == "->":
                    sentences.append((cur, "out", nxt, elabel))
                elif left == "<-" and right == "-":
                    sentences.append((nxt, "out", cur, elabel))
                elif left == "-" and right == "-":
                    sentences.append((cur, "both", nxt, elabel))
                else:
                    raise ValueError(f"unsupported edge direction {left}…{right}")
                if hops is not None:
                    var_hops[len(sentences) - 1] = hops
                cur = nxt

    parse_part(pattern_part)
    n_mandatory = len(sentences)
    n_bare_mandatory = len(bare)
    if optional_part:
        parse_part(optional_part)
    if not sentences and not bare:
        raise ValueError("empty MATCH pattern")
    clash = set(edge_vars) & set(labels)
    if clash:
        raise ValueError(
            f"name(s) {sorted(clash)} bound as both a node tag and a "
            f"relationship variable"
        )
    tags = set(labels)
    # names pre-bound by an earlier pipeline segment (WITH … MATCH
    # continuation): legal in WHERE/WITH/RETURN as scalar references; they
    # are NOT pattern tags (labels/pattern logic never consults them)
    tags |= set(extra_names or ())

    def parse_primary(raw: str):
        tm = _TS_TOKEN.match(raw.strip())
        if tm:
            # rewritten datetime(<ms>) literal → a timestamp constant
            return ("lit_ts", int(tm.group(1)))
        dm = _DUR_TOKEN.match(raw.strip())
        if dm:
            # rewritten duration(…) literal → a millisecond constant
            return ("lit_dur", int(dm.group(1)))
        xm = _EXTRACT_RE.match(raw.strip())
        if xm:
            etag, eprop, part = xm.group(1), xm.group(2), xm.group(3).lower()
            if etag not in tags and etag not in edge_vars:
                raise ValueError(f"WHERE references unbound tag {etag!r}")
            return ("extract", etag, eprop, part)
        om = _OPERAND.match(raw.strip())
        if not om:
            raise ValueError(f"unsupported operand: {raw!r}")
        tag, prop, flt, intg, s = om.groups()
        if tag is not None:
            if tag in edge_vars:
                if not prop:
                    raise ValueError(
                        f"bare relationship variable {tag!r} in WHERE — "
                        f"compare a property ({tag}.prop)"
                    )
                return ("prop", tag, prop)
            if tag not in tags:
                raise ValueError(f"WHERE references unbound tag {tag!r}")
            return ("prop", tag, prop) if prop else ("tag", tag)
        if flt is not None:
            return ("lit", float(flt))
        if intg is not None:
            return ("lit", int(intg))
        return ("lit", s)

    def parse_operand(raw: str):
        raw = raw.strip()
        if (
            _TS_TOKEN.match(raw)
            or _DUR_TOKEN.match(raw)
            or _EXTRACT_RE.match(raw)
            or _OPERAND.match(raw)
        ):
            return parse_primary(raw)
        # not a plain primary: arithmetic expression over primaries
        return _parse_arith(raw, parse_primary)

    # --- peel [NOT] EXISTS((x)-[:lab]->(y)) conjuncts off the WHERE text
    # (reference: supported_cypher.md "WHERE NOT EXIST (an edge/path)
    # implements as anti join"; FilterIntoJoinRule plans the positive form
    # as a semi join) -------------------------------------------------------
    exists_preds: list[dict] = []

    def parse_exists_pattern(inner: str, negated: bool) -> None:
        s = re.sub(r"\s+", "", inner)
        node = _NODE.match(s, 0)
        if not node:
            raise ValueError(f"expected a node pattern in EXISTS: {inner!r}")
        a, alabel = node.group(1), node.group(2)
        em = _EDGE.match(s, node.end())
        if not em:
            raise ValueError(f"expected an edge pattern in EXISTS: {inner!r}")
        left, evar, elabel, star, _hmin, _dots, _hmax, right = em.groups()
        if evar or star:
            raise ValueError(
                "EXISTS supports a single fixed-length unlabeled-variable "
                "edge pattern"
            )
        node2 = _NODE.match(s, em.end())
        if not node2 or node2.end() != len(s):
            raise ValueError(
                f"EXISTS takes exactly one edge pattern: {inner!r}"
            )
        b, blabel = node2.group(1), node2.group(2)
        if left == "-" and right == "->":
            rec = {"a": a, "b": b, "dir": "out"}
        elif left == "<-" and right == "-":
            rec = {"a": b, "b": a, "dir": "out"}
            alabel, blabel = blabel, alabel
        elif left == "-" and right == "-":
            rec = {"a": a, "b": b, "dir": "both"}
        else:
            raise ValueError(f"unsupported EXISTS edge direction {left}…{right}")
        rec.update(
            {"alabel": alabel, "blabel": blabel, "elabel": elabel,
             "neg": negated}
        )
        exists_preds.append(rec)

    plain_conjuncts: list[str] = []
    if where_part:
        for conj in _split_top_and(where_part):
            xm = _EXISTS_CONJ.match(conj)
            if xm:
                parse_exists_pattern(xm.group(2), bool(xm.group(1)))
            elif re.search(r"(?i)\bEXISTS\s*\(", conj):
                raise ValueError(
                    "EXISTS is supported only as a top-level [NOT] "
                    "EXISTS(...) conjunct"
                )
            else:
                plain_conjuncts.append(conj)
    where_part = " AND ".join(plain_conjuncts) if plain_conjuncts else None

    preds = _parse_where(where_part, parse_operand) if where_part else []

    def parse_items(text: str, names: set, allow_props: bool, what: str):
        distinct = False
        text = text.strip()
        dm = re.match(r"(?i)^DISTINCT\s+(.*)$", text)
        if dm:
            distinct = True
            text = dm.group(1)
        items = []
        for raw in _split_items_text(text):
            lm = re.match(
                r"(?i)^length\s*\(\s*([A-Za-z_][A-Za-z_0-9]*)\s*\)"
                r"(?:\s+AS\s+([A-Za-z_][A-Za-z_0-9]*))?$",
                raw,
            )
            if lm:
                pv = lm.group(1)
                if pv not in path_vars or not allow_props:
                    raise ValueError(
                        f"length() takes a bound shortestPath variable, "
                        f"got {pv!r}"
                    )
                items.append(("pathlen", pv, None, lm.group(2) or f"length_{pv}"))
                continue
            pm = re.match(
                r"(?i)^(nodes|relationships)\s*"
                r"\(\s*([A-Za-z_][A-Za-z_0-9]*)\s*\)"
                r"(?:\s+AS\s+([A-Za-z_][A-Za-z_0-9]*))?$",
                raw,
            )
            if pm:
                # nodes(p) / relationships(p) — supported_cypher.md UDF
                # rows (gs.function.nodes/relationships): the path's vertex
                # array / its consecutive (src, dst) edge structs
                fname = pm.group(1).lower()
                pv, falias = pm.group(2), pm.group(3)
                if pv not in path_vars or not allow_props:
                    raise ValueError(
                        f"{fname}() takes a bound shortestPath variable, "
                        f"got {pv!r}"
                    )
                kind = "pathvar" if fname == "nodes" else "pathrels"
                items.append((kind, pv, None, falias or f"{fname}_{pv}"))
                continue
            em = re.match(
                r"(?i)^(startNode|endNode)\s*"
                r"\(\s*([A-Za-z_][A-Za-z_0-9]*)\s*\)"
                r"(?:\s+AS\s+([A-Za-z_][A-Za-z_0-9]*))?$",
                raw,
            )
            if em:
                # startNode(r) / endNode(r) — supported_cypher.md UDF rows:
                # the relationship's endpoint vertex ids, statically the
                # pattern's bound endpoint tags (sentences are normalized
                # to src→dst orientation at parse time)
                fname = em.group(1).lower()
                rv, falias = em.group(2), em.group(3)
                if rv not in edge_vars or not allow_props:
                    raise ValueError(
                        f"{fname}() takes a relationship variable, got {rv!r}"
                    )
                sa, sdir, sb, _sel = sentences[edge_vars[rv]]
                if sdir != "out":
                    raise ValueError(
                        f"{fname}() is undefined on undirected patterns"
                    )
                items.append((
                    "tag", sa if fname == "startnode" else sb, None,
                    falias or f"{fname.replace('node', 'Node')}_{rv}",
                ))
                continue
            fm = re.match(
                r"(?i)^(labels|type|elementId)\s*"
                r"\(\s*([A-Za-z_][A-Za-z_0-9]*)\s*\)"
                r"(?:\s+AS\s+([A-Za-z_][A-Za-z_0-9]*))?$",
                raw,
            )
            if fm:
                # labels(n) / type(r) / elementId(n) — supported_cypher.md
                # operator table (single-label model: labels() is the one
                # label string, not a list)
                fname = fm.group(1).lower()
                ftag, falias = fm.group(2), fm.group(3)
                if not allow_props:
                    raise ValueError(
                        f"{fname}() after WITH is not supported — project "
                        "it in the WITH items"
                    )
                if fname == "type":
                    if ftag not in edge_vars:
                        raise ValueError(
                            f"type() takes a relationship variable, got "
                            f"{ftag!r}"
                        )
                    el = sentences[edge_vars[ftag]][3]
                    if el is None:
                        raise ValueError(
                            "type() needs a labeled relationship pattern"
                        )
                    items.append(("etype", ftag, el, falias or f"type_{ftag}"))
                elif fname == "elementid":
                    if ftag not in names:
                        raise ValueError(
                            f"elementId() references unbound tag {ftag!r}"
                        )
                    items.append(
                        ("tag", ftag, None, falias or f"elementId_{ftag}")
                    )
                else:  # labels
                    if ftag not in names:
                        raise ValueError(
                            f"labels() references unbound tag {ftag!r}"
                        )
                    items.append(
                        ("labels", ftag, None, falias or f"labels_{ftag}")
                    )
                continue
            cs = re.match(
                r"(?is)^CASE\s+(.*?)\s+END\s+AS\s+([A-Za-z_]\w*)$", raw
            )
            if cs and allow_props:
                # searched CASE WHEN … THEN … [ELSE …] END AS alias
                # (supported_cypher.md Branch row; alias mandatory —
                # there is no canonical name for an expression)
                whens, els = _parse_case(
                    cs.group(1),
                    parse_operand,
                    lambda t: _parse_where(t, parse_operand),
                )
                items.append(("case", whens, els, cs.group(2)))
                continue
            mm = re.match(
                r"(?is)^\{(.*)\}\s+AS\s+([A-Za-z_]\w*)$", raw
            )
            if mm and allow_props:
                # {key: expr, …} AS alias — MapLiteral fold
                # (supported_cypher.md MapLiteral row). Cypher maps are
                # heterogeneous, so the faithful Spark type is a named
                # struct, not a map<k,v> (which forces one value type).
                pairs = []
                for kv in _split_items_text(mm.group(1)):
                    km2 = re.match(r"(?s)^([A-Za-z_]\w*)\s*:\s*(.+)$", kv)
                    if not km2:
                        raise ValueError(f"bad map-literal entry: {kv!r}")
                    pairs.append((km2.group(1), parse_operand(km2.group(2))))
                if not pairs:
                    raise ValueError(f"empty map literal: {raw!r}")
                items.append(("mapexpr", pairs, None, mm.group(2)))
                continue
            km = re.match(
                r"(?is)^\[(.*)\]\s+AS\s+([A-Za-z_]\w*)$", raw
            )
            if km and allow_props:
                # [expr, …] AS alias — ListLiteral fold
                # (supported_cypher.md ListLiteral row); alias mandatory
                elems = [
                    parse_operand(e)
                    for e in _split_items_text(km.group(1))
                ]
                if not elems:
                    raise ValueError(f"empty list literal: {raw!r}")
                items.append(("listexpr", elems, None, km.group(2)))
                continue
            bm = re.match(
                r"(?i)^(__ts_|__dur_)(\d+)\s+AS\s+([A-Za-z_]\w*)$", raw
            )
            if bm and allow_props:
                # bare datetime()/duration() literal projection — would
                # otherwise false-match the identifier item form below
                node = (
                    "lit_ts" if bm.group(1).lower() == "__ts_" else "lit_dur",
                    int(bm.group(2)),
                )
                items.append(("expr", node, None, bm.group(3)))
                continue
            im = _RETURN_ITEM.match(raw)
            if not im:
                # arithmetic projection: expr AS alias (alias mandatory —
                # there is no canonical name for an expression)
                am = re.match(
                    r"(?i)^(.+?)\s+AS\s+([A-Za-z_][A-Za-z_0-9]*)$", raw
                )
                if am and allow_props:
                    node = parse_operand(am.group(1))
                    if node[0] in (
                        "arith", "neg", "extract", "lit_ts", "lit_dur"
                    ):
                        items.append(("expr", node, None, am.group(2)))
                        continue
                raise ValueError(f"unsupported {what} item: {raw!r}")
            cnt, fn, dkw, atag, aprop, tag, prop, alias = im.groups()
            if cnt:
                items.append(("count", "*", None, alias or "count"))
            elif fn:
                fn = fn.lower()
                if atag in edge_vars and allow_props:
                    if not aprop:
                        raise ValueError(
                            f"{fn}() over a bare relationship variable — "
                            f"aggregate a property ({atag}.prop)"
                        )
                elif atag not in names:
                    raise ValueError(f"{fn}() references unbound name {atag!r}")
                if aprop and not allow_props:
                    raise ValueError(
                        "property access after WITH is not supported — "
                        "project the property in the WITH items"
                    )
                if dkw and fn not in ("count", "collect"):
                    raise ValueError(
                        "DISTINCT inside an aggregate supports count() and "
                        "collect() only"
                    )
                kind = f"agg:{fn}" + (":d" if dkw else "")
                default = f"{fn}_{atag}" + (f"_{aprop}" if aprop else "")
                items.append((kind, atag, aprop, alias or default))
            elif prop:
                if not allow_props:
                    raise ValueError(
                        "property access after WITH is not supported — "
                        "project the property in the WITH items"
                    )
                if tag not in names and tag not in edge_vars:
                    raise ValueError(f"{what} references unbound tag {tag!r}")
                items.append(("prop", tag, prop, alias or f"{tag}_{prop}"))
            else:
                if tag in path_vars and allow_props:
                    # a bare path variable projects the vertex array
                    items.append(("pathvar", tag, None, alias or tag))
                    continue
                if tag in edge_vars and allow_props:
                    raise ValueError(
                        f"bare relationship variable {tag!r} in {what} — "
                        f"project a property ({tag}.prop)"
                    )
                if tag not in names:
                    raise ValueError(f"{what} references unbound tag {tag!r}")
                items.append(("tag", tag, None, alias or tag))
        if not items:
            raise ValueError(f"empty {what}")
        return distinct, items

    def parse_alias_operand(raw: str, names: set):
        tm = _TS_TOKEN.match(raw.strip())
        if tm:
            return ("lit_ts", int(tm.group(1)))
        dm = _DUR_TOKEN.match(raw.strip())
        if dm:
            return ("lit_dur", int(dm.group(1)))
        om = _OPERAND.match(raw.strip())
        if not om:
            raise ValueError(f"unsupported operand: {raw!r}")
        tag, prop, flt, intg, s = om.groups()
        if tag is not None:
            if prop:
                raise ValueError("property access after WITH is not supported")
            if tag not in names:
                raise ValueError(
                    f"WHERE after WITH references unknown alias {tag!r}"
                )
            return ("tag", tag)
        if flt is not None:
            return ("lit", float(flt))
        if intg is not None:
            return ("lit", int(intg))
        return ("lit", s)

    with_specs: list[dict] = []
    cur_names, cur_props = tags, True
    for stage in with_stages_raw:
        if "unwind_text" in stage:
            um = re.match(
                r"(?is)^(.+?)\s+AS\s+([A-Za-z_][A-Za-z_0-9]*)$",
                stage["unwind_text"].strip(),
            )
            if not um:
                raise ValueError(
                    f"UNWIND takes 'list AS alias': {stage['unwind_text']!r}"
                )
            src, alias = um.group(1).strip(), um.group(2)
            if alias in cur_names:
                raise ValueError(f"UNWIND alias {alias!r} already bound")
            if re.match(r"^\[.*\]$", src, re.S):
                elems = []
                # split elements on commas outside string literals
                raws = [
                    r.strip().lstrip(",").strip()
                    for r in re.findall(r"'[^']*'|[^,]+", src[1:-1])
                ]
                for raw in (r for r in raws if r):
                    om = _OPERAND.match(raw)
                    if not om or om.group(1) is not None:
                        raise ValueError(
                            f"UNWIND list literal takes literals: {raw!r}"
                        )
                    _t, _p, flt, intg, s = om.groups()
                    elems.append(
                        float(flt) if flt else int(intg) if intg else s
                    )
                spec = ("lit", elems, alias)
            elif src in path_vars and cur_props:
                spec = ("path", src, alias)
            elif src in cur_names:
                spec = ("name", src, alias)
            else:
                raise ValueError(
                    f"UNWIND references unknown name {src!r} (a bound "
                    "alias, path variable, or [literal, ...] list)"
                )
            waliases = set(cur_names) | {alias}
            wpreds = []
            for wtext in stage["where"]:
                wpreds.extend(
                    _parse_where(
                        wtext, lambda raw: parse_alias_operand(raw, waliases)
                    )
                )
            with_specs.append({"unwind": spec, "where": wpreds})
            cur_names = waliases  # cur_props unchanged: no projection ran
            continue
        wdistinct, witems = parse_items(
            stage["text"], cur_names, cur_props, "WITH"
        )
        waliases = {it[3] for it in witems}
        wpreds = []
        for wtext in stage["where"]:
            wpreds.extend(
                _parse_where(
                    wtext, lambda raw: parse_alias_operand(raw, waliases)
                )
            )
        with_specs.append(
            {"distinct": wdistinct, "items": witems, "where": wpreds}
        )
        cur_names, cur_props = waliases, False
    ret_names, ret_props = cur_names, cur_props

    rp = return_part.strip()
    tm = re.match(
        r"(?is)^(.*?)(?:\s+ORDER\s+BY\s+(.*?))?(?:\s+SKIP\s+(\d+))?"
        r"(?:\s+LIMIT\s+(\d+))?$",
        rp,
    )
    rp, order_part, skip_n, limit_n = tm.groups()
    order = []
    if order_part:
        for raw in (x.strip() for x in order_part.split(",")):
            om = re.match(r"(?i)^(.*?)(?:\s+(ASC|DESC))?$", raw)
            key, direction = om.group(1).strip(), (om.group(2) or "ASC").upper()
            order.append((key, direction == "DESC"))
    distinct, items = parse_items(rp, ret_names, ret_props, "RETURN")
    out_names = {it[3] for it in items} | {
        it[1] for it in items if it[0] == "tag"
    }
    for key, _desc in order:
        if key not in out_names:
            raise ValueError(
                f"ORDER BY key {key!r} must be a RETURN item alias"
            )
    return {
        "sentences": sentences,
        "n_mandatory": n_mandatory,
        "bare": bare,
        "n_bare_mandatory": n_bare_mandatory,
        "labels": labels,
        "var_hops": var_hops,
        "shortest": shortest,
        "edge_vars": edge_vars,
        "where": preds,
        "exists": exists_preds,
        "with": with_specs,
        "return": {
            "distinct": distinct,
            "items": items,
            "order": order,
            "skip": int(skip_n) if skip_n else None,
            "limit": int(limit_n) if limit_n else None,
        },
    }


def parse_match(query: str) -> tuple[list[tuple[str, str, str]], dict]:
    """Simple-graph compat parser: (3-tuple sentences, return_spec) — raises
    on vertex/edge labels, WHERE, and property access (use
    :func:`cypher_property` for those)."""
    ast = parse_cypher(query)
    if any(lab is not None for lab in ast["labels"].values()):
        raise ValueError(
            "vertex labels are not supported on the simple graph "
            "(use cypher_property over a PropertyGraph)"
        )
    if any(el is not None for _a, _d, _b, el in ast["sentences"]):
        raise ValueError(
            "edge labels are not supported on the simple-graph surface "
            "(use cypher_property over a PropertyGraph)"
        )
    if ast["where"]:
        raise ValueError("WHERE is not supported by parse_match")
    if ast["exists"]:
        raise ValueError("EXISTS requires cypher_property")
    if ast["var_hops"]:
        raise ValueError(
            "variable-length patterns require cypher_property (PathExpand)"
        )
    if ast["shortest"]:
        raise ValueError("shortestPath() requires cypher_property")
    if ast["n_mandatory"] != len(ast["sentences"]):
        raise ValueError("OPTIONAL MATCH requires cypher_property")
    if ast["bare"]:
        raise ValueError("node-only patterns require cypher_property")
    if ast["with"]:
        raise ValueError("WITH requires cypher_property")
    if ast["return"]["order"] or ast["return"]["skip"] or (
        ast["return"]["limit"] is not None
    ):
        raise ValueError("ORDER BY/SKIP/LIMIT require cypher_property")
    items = []
    for kind, tag, prop, alias in ast["return"]["items"]:
        if kind == "prop":
            raise ValueError("property access requires cypher_property")
        if kind.startswith("agg:"):
            raise ValueError("aggregate functions require cypher_property")
        if kind not in ("tag", "count"):
            raise ValueError(
                f"{kind} projections require cypher_property"
            )
        items.append((kind, tag if kind == "tag" else "*", alias))
    return (
        [(a, d, b) for a, d, b, _el in ast["sentences"]],
        {"distinct": ast["return"]["distinct"], "items": items},
    )


def cypher(
    graph: Graph,
    query: str,
    distinct_vertices: bool = False,
    wco: bool = False,
) -> DataFrame:
    """Run a MATCH/RETURN query string over a simple Graph; returns a
    DataFrame with the RETURN columns (tags → bound vertex ids)."""
    if re.match(r"(?is)^\s*CALL\b", query):
        return cypher_call(graph, query)
    sentences, ret = parse_match(query)
    bound = match(
        graph, sentences, distinct_vertices=distinct_vertices, wco=wco
    )
    if any(kind == "count" for kind, _n, _a in ret["items"]):
        if len(ret["items"]) != 1:
            raise ValueError("count(*) cannot be mixed with tags in this subset")
        alias = ret["items"][0][2]
        return bound.agg(F.count(F.lit(1)).cast("bigint").alias(alias))
    cols = [F.col(name).alias(alias) for _k, name, alias in ret["items"]]
    out = bound.select(*cols)
    return out.distinct() if ret["distinct"] else out


# ---------------------------------------------------------------------------
# PropertyGraph execution (labels + WHERE + property access)
# ---------------------------------------------------------------------------


def _sentence_edges(
    pg: PropertyGraph, a_label, b_label, elabel, direction, props: tuple = ()
) -> DataFrame:
    """Union the per-label edge tables matching one MATCH sentence, oriented
    a→b (parse_cypher normalizes ``<-`` arrows to ``out`` sentences, so
    direction is 'out' or 'both'). Edge-table keys are (edge_label,
    src_label, dst_label); endpoints are guaranteed within their label
    tables by PropertyGraph.add_edges. ``props`` keeps the named edge
    property columns (a relationship variable binds them); every matched
    table must carry them."""

    def pick(df, key):
        missing = [p for p in props if p not in df.columns]
        if missing:
            raise ValueError(
                f"edge table {key!r} has no propert"
                f"{'ies' if len(missing) > 1 else 'y'} {missing}"
            )
        return df

    parts = [
        pick(df, k).select("src", "dst", *props)
        for k, df in pg.edges.items()
        for (el, sl, dl) in [k]
        if (elabel is None or el == elabel)
        and (a_label is None or sl == a_label)
        and (b_label is None or dl == b_label)
    ]
    if direction == "both":
        # each relationship also binds in the reverse orientation (Cypher
        # undirected semantics: one row per direction assignment)
        parts += [
            pick(df, k).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), *props
            )
            for k, df in pg.edges.items()
            for (el, sl, dl) in [k]
            if (elabel is None or el == elabel)
            and (a_label is None or dl == a_label)
            and (b_label is None or sl == b_label)
        ]
    if not parts:
        raise ValueError(
            f"no edge tables match (label={elabel!r}, {a_label!r}→{b_label!r})"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_OPS = {
    "=": Column.__eq__,
    "<>": Column.__ne__,
    "<": Column.__lt__,
    "<=": Column.__le__,
    ">": Column.__gt__,
    ">=": Column.__ge__,
    "startswith": Column.startswith,
    "endswith": Column.endswith,
    "contains": Column.contains,
}


_ARITH_OPS = {
    "+": Column.__add__,
    "-": Column.__sub__,
    "*": Column.__mul__,
    "/": Column.__truediv__,  # Cypher-on-Spark: always double division
    "%": Column.__mod__,
    "^": lambda a, b: F.pow(a, b),  # supported_cypher.md: ^ → power(a, b)
}


def _operand_col(operand, propcol, tagcol=None, propkind=None) -> Column:
    return _operand_typed(operand, propcol, tagcol, propkind)[0]


def _ts_propkind(dtypes: dict, name_fn):
    """propkind callback over a dtypes map: a property is temporal ("ts")
    when its underlying column is a Spark timestamp; name_fn(tag, prop)
    gives the column name in that frame."""
    def pk(tag: str, prop: str) -> str:
        dt = dtypes.get(name_fn(tag, prop), "")
        return "ts" if dt.startswith("timestamp") else "unk"
    return pk


def _temporal_arith(op, lc, lk, rc, rk):
    """Lower + - * / with a temporal ("ts") or duration ("dur") side
    (supported_cypher.md Temporal Mathematical rows). Everything reduces
    to epoch-millisecond arithmetic: durations ARE bigint milliseconds,
    and an "unk" (property) operand combined with a temporal one is
    coerced to timestamp — the only typing under which the expression is
    defined."""

    def ms(c, k):
        # cast first: TIMESTAMP_NTZ (parquet's naive timestamps) is not
        # accepted by unix_millis; the cast reads NTZ wall-clock in the
        # session timezone — run sessions in UTC (session.py does) so it
        # matches DuckDB's naive-as-UTC epoch_ms
        return F.unix_millis(c.cast("timestamp")) if k in ("ts", "unk") else c

    if op == "+":
        if lk == "dur" and rk == "dur":
            return lc + rc, "dur"
        if "dur" in (lk, rk):  # <temporal> + <duration> (either order)
            tsc, tsk = (lc, lk) if rk == "dur" else (rc, rk)
            dc = rc if rk == "dur" else lc
            return F.timestamp_millis(ms(tsc, tsk) + dc), "ts"
        raise ValueError("temporal + temporal is not defined")
    if op == "-":
        if rk == "dur":
            if lk == "dur":
                return lc - rc, "dur"
            # <temporal> - <duration>
            return F.timestamp_millis(ms(lc, lk) - rc), "ts"
        if lk == "dur":
            raise ValueError("duration - temporal is not defined")
        # <temporal> - <temporal> → duration in milliseconds
        return (ms(lc, lk) - ms(rc, rk)).cast("long"), "dur"
    if op in ("*", "/"):
        if lk == "ts" or rk == "ts":
            raise ValueError(f"{op} is not defined for temporal values")
        if lk == "dur" and rk == "dur":
            raise ValueError(f"duration {op} duration is not defined")
        if op == "/" and rk == "dur":
            raise ValueError("numeric / duration is not defined")
        dc, nc = (lc, rc) if lk == "dur" else (rc, lc)
        out = (dc * nc) if op == "*" else (dc / nc)
        return out.cast("long"), "dur"
    raise ValueError(f"operator {op} is not defined for temporal operands")


def _operand_typed(
    operand, propcol, tagcol=None, propkind=None
) -> tuple[Column, str]:
    """Compile an operand tree to (Column, kind) where kind ∈ {"num",
    "ts" (timestamp), "dur" (bigint milliseconds), "unk" (a property or
    alias whose type is the underlying column's)}. Plain numeric
    arithmetic is untouched; a temporal/duration side routes through
    _temporal_arith. ``propkind(tag, prop) -> kind`` (optional) resolves
    property operands against the frame's actual dtypes, so
    ``b.ts - a.ts`` over timestamp properties lowers to a millisecond
    duration (supported_cypher.md temporal-subtraction row) instead of a
    Spark interval."""
    kind = operand[0]
    if kind == "lit":
        return F.lit(operand[1]), "num"
    if kind == "lit_ts":
        # datetime(<epoch-ms>) literal → timestamp constant
        return F.timestamp_millis(F.lit(operand[1])), "ts"
    if kind == "lit_dur":
        # duration(…) literal → bigint milliseconds
        return F.lit(operand[1]).cast("long"), "dur"
    if kind == "extract":
        # tag.prop.year … — interval extraction over a temporal property
        return _EXTRACT_FNS[operand[3]](
            propcol(operand[1], operand[2])
        ).cast("long"), "num"
    if kind == "tag":
        return (tagcol(operand[1]) if tagcol else F.col(operand[1])), "unk"
    if kind == "neg":
        c, k = _operand_typed(operand[1], propcol, tagcol, propkind)
        if k == "ts":
            raise ValueError("cannot negate a temporal value")
        return -c, k
    if kind == "arith":
        lc, lk = _operand_typed(operand[2], propcol, tagcol, propkind)
        rc, rk = _operand_typed(operand[3], propcol, tagcol, propkind)
        if "ts" in (lk, rk) or "dur" in (lk, rk):
            return _temporal_arith(operand[1], lc, lk, rc, rk)
        return _ARITH_OPS[operand[1]](lc, rc), (
            "unk" if "unk" in (lk, rk) else "num"
        )
    pk = propkind(operand[1], operand[2]) if propkind else "unk"
    return propcol(operand[1], operand[2]), pk


_CLAUSE_RE = re.compile(
    r"(?is)\b(OPTIONAL\s+MATCH|MATCH|WHERE|"
    r"(?<!STARTS\s)(?<!ENDS\s)WITH|UNWIND|RETURN)\b"
)
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*$")


def _split_continuation(query: str) -> tuple[str, str] | None:
    """Detect ``… WITH items [WHERE …] MATCH …`` (a pipeline continuation —
    the LDBC-BI staple: aggregate, then keep matching) and split it into
    (prefix_query, suffix_query): the prefix re-RETURNs the last WITH
    stage's aliases, the suffix starts at the MATCH. ``cypher_property``
    executes the prefix, then the suffix with the prefix frame pre-bound —
    chained continuations recurse naturally. Returns None when the query
    has no MATCH after a WITH."""
    q = _strip_comments(query).strip().rstrip(";")
    scope = "match"
    last_with_end = None
    for m in _CLAUSE_RE.finditer(q):
        kw = re.sub(r"\s+", " ", m.group(1).upper())
        if kw == "WITH":
            scope = "with"
            last_with_end = m.end()
        elif kw == "UNWIND":
            scope = "unwind"
        elif kw in ("MATCH", "OPTIONAL MATCH") and scope != "match":
            if scope == "unwind":
                raise ValueError("MATCH after UNWIND is not supported")
            # items text runs to the next clause keyword (WHERE or this one)
            nxt = _CLAUSE_RE.search(q, last_with_end)
            items_text = q[last_with_end:nxt.start()].strip()
            items_text = re.sub(r"(?is)^DISTINCT\b", "", items_text).strip()
            aliases = []
            for item in _split_items_text(items_text):
                am = re.search(r"(?is)\sAS\s+([A-Za-z_][A-Za-z0-9_]*)\s*$",
                               item)
                if am:
                    aliases.append(am.group(1))
                elif _IDENT_RE.fullmatch(item.strip()):
                    aliases.append(item.strip())
                else:
                    raise ValueError(
                        f"WITH item {item.strip()!r} before a MATCH "
                        "continuation needs an AS alias"
                    )
            prefix = q[: m.start()].strip() + " RETURN " + ", ".join(aliases)
            return prefix, q[m.start():].strip()
    return None


_OPT_PREFIX_RE = re.compile(r"(?is)^\s*OPTIONAL\s+")


def cypher_property(
    pg: PropertyGraph, query: str, distinct_vertices: bool = False,
    _pre_frame: DataFrame | None = None, _pre_join: str = "inner",
) -> DataFrame:
    """Execute a labeled MATCH/WHERE/RETURN query over a PropertyGraph.

    Single-tag property predicates are pushed below the pattern joins
    (semi-join each touching edge table on the filtered vertex-label ids —
    the reference's FilterIntoJoinRule plan shape); remaining predicates
    filter bound rows after the needed property joins.

    ``MATCH … WITH … MATCH …`` pipelines split into segments: each
    segment's frame is pre-bound into the next (joined on the shared
    aliases/tags, Cypher bag semantics), so aggregate-then-expand BI
    queries compose. ``_pre_frame`` is that internal plumbing.
    """
    if re.match(r"(?is)^\s*CALL\b", query):
        return cypher_call(pg, query)
    split = _split_continuation(query)
    if split is not None:
        frame = cypher_property(
            pg, split[0], _pre_frame=_pre_frame, _pre_join=_pre_join
        )
        suffix = split[1]
        opt = _OPT_PREFIX_RE.match(suffix)
        if opt:
            # OPTIONAL MATCH continuation: run the pattern as a plain MATCH
            # (its WHERE filters the pattern BEFORE the join — Cypher's
            # OPTIONAL MATCH…WHERE scoping), then left-join the previous
            # stage's frame onto it (every earlier row survives, unmatched
            # pattern tags go null).
            suffix = suffix[opt.end():]
        return cypher_property(
            pg, suffix, distinct_vertices, _pre_frame=frame,
            _pre_join="left" if opt else "inner",
        )
    ast = parse_cypher(
        query,
        extra_names=set(_pre_frame.columns) if _pre_frame is not None else None,
    )
    labels, preds = ast["labels"], ast["where"]
    evars = ast["edge_vars"]  # relationship variable → sentence index
    evar_by_idx = {i: v for v, i in evars.items()}

    def tag_label(tag: str) -> str:
        lab = labels.get(tag)
        if lab is None:
            raise ValueError(
                f"tag {tag!r} needs a vertex label for property access"
            )
        if lab not in pg.vertices:
            raise ValueError(f"unknown vertex label {lab!r}")
        return lab

    # --- split WHERE: pushdown (one tag's props vs literals) vs post --------
    # unit = top-level conjunct tree (OR/NOT groups travel whole: an OR
    # over one tag's properties still pushes down as a vertex filter)
    def pred_tags(pred) -> set[str]:
        return {
            o[1] for o in _cmp_operands(pred) if o[0] in ("prop", "tag")
        }

    def has_prop(pred) -> bool:
        return any(o[0] == "prop" for o in _cmp_operands(pred))

    pushdown: dict[str, list] = {}
    edge_push: dict[str, list] = {}  # single-edge-var predicates → edge scan
    post: list = []
    for pred in preds:
        ts = pred_tags(pred)
        if has_prop(pred) and len(ts) == 1 and not _has_null_test(pred):
            t = next(iter(ts))
            (edge_push if t in evars else pushdown).setdefault(t, []).append(
                pred
            )
        else:
            post.append(pred)

    # edge properties each relationship variable must CARRY through the join
    # DAG (post-WHERE + first projection stage); filter-only props stay
    # inside the edge scan
    # the first PROJECTION stage's items (UNWIND stages don't project —
    # pattern-tag properties stay accessible through them)
    stage1_items = next(
        (w["items"] for w in ast["with"] if "items" in w),
        ast["return"]["items"],
    )
    eprops_keep: dict[str, set] = {}
    for pred in post:
        for o in _cmp_operands(pred):
            if o[0] == "prop" and o[1] in evars:
                eprops_keep.setdefault(o[1], set()).add(o[2])
    for t, p in _item_prop_refs(stage1_items):
        if t in evars:
            eprops_keep.setdefault(t, set()).add(p)

    allowed: dict[str, DataFrame] = {}
    for tag, plist in pushdown.items():
        v = pg.vertices[tag_label(tag)]
        # evaluated against the vertex table itself: tag → id, prop →
        # column; propkind from the table's own dtypes
        vpk = _ts_propkind(dict(v.dtypes), lambda _t, p: p)

        def _vertex_local_col(o, vpk=vpk):
            return _operand_col(
                o, lambda _t, p: F.col(p), lambda _t: F.col("id"), vpk
            )

        for pred in plist:
            v = v.filter(_pred_to_col(pred, _vertex_local_col))
        allowed[tag] = v.select("id")

    # --- build oriented per-sentence edge DataFrames, semi-joined with the
    # pushed-down vertex filters (FilterIntoJoinRule) ------------------------
    def _label_ids(tag: str) -> DataFrame | None:
        lab = labels.get(tag)
        return pg.vertices[lab].select("id") if lab else None

    def _tag_ids(tag: str) -> DataFrame:
        """Label-filtered + pushdown-filtered id set for a tag (all labels'
        vertices when the tag is unlabeled)."""
        if tag in allowed:
            # built from the tag's label table — label constraint included
            return allowed[tag]
        if labels.get(tag) is not None:
            return pg.vertices[labels[tag]].select("id")
        parts = [v.select("id") for v in pg.vertices.values()]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.distinct()

    sentence_dfs: list[tuple[str, str, DataFrame]] = []
    for i, (a, direction, b, elabel) in enumerate(ast["sentences"]):
        if i in ast["shortest"]:
            # p = shortestPath((a)-[:lab*..k]->(b)): BFS over the matching
            # edge tables from the (label+predicate-)filtered a-set to the
            # filtered b-set — GIE's shortest-path PathExpand
            # (algebra.proto path_opt=SHORTEST). Intermediate vertices are
            # unconstrained, so endpoint labels do NOT filter the edge
            # union, only the source/target sets. Unreachable pairs drop
            # (no binding), matching GIE.
            from graphscope_spark.graph.graph import Graph as _SimpleGraph
            from graphscope_spark.operators.relational import (
                all_shortest_paths_expand,
                shortest_path_expand,
            )

            spec = ast["shortest"][i]
            e = _sentence_edges(pg, None, None, elabel, direction)
            g = _SimpleGraph(e.select("src", "dst"))
            pairs = (
                _tag_ids(a).select(F.col("id").alias("a"))
                .crossJoin(_tag_ids(b).select(F.col("id").alias("b")))
            )
            expand = (
                all_shortest_paths_expand
                if spec.get("all")
                else shortest_path_expand
            )
            sp = expand(g, pairs, max_depth=spec["max"] or 10_000)
            key = spec["var"]
            cols = [
                F.col("a").alias("src"),
                F.col("b").alias("dst"),
            ]
            if key is not None:
                cols += [
                    F.col("hops").alias(f"{key}__hops"),
                    F.col("path").alias(f"{key}__path"),
                ]
            sentence_dfs.append((a, b, sp.select(*cols)))
            continue
        if i in ast["var_hops"]:
            # -[*lo..hi]-> : PathExpand with TRAIL semantics (Cypher's
            # no-repeated-relationship rule), one row per path — bag
            # multiplicities flow into the join DAG. Only the ENDPOINTS
            # carry the tags' label/predicate constraints (Cypher leaves
            # intermediate vertices unconstrained), so the edge table is
            # filtered by edge label alone; the a-side label + pushed
            # predicates restrict the expansion's start set (the cheap
            # side) and the b-side ones filter path endpoints.
            from graphscope_spark.operators.relational import path_expand

            if direction == "both":
                # the fwd+rev union makes one relationship two directed
                # rows, which path_expand's trail dedup cannot identify —
                # Cypher's relationship-uniqueness rule would be violated
                raise ValueError(
                    "undirected variable-length patterns are not supported "
                    "(trail semantics needs directed relationships)"
                )
            lo, hi = ast["var_hops"][i]
            e = _sentence_edges(pg, None, None, elabel, direction)
            starts = e.select(F.col("src").alias("v")).distinct()
            for df in (_label_ids(a), allowed.get(a)):
                if df is not None:
                    starts = starts.join(
                        df.withColumnRenamed("id", "v"), "v", "left_semi"
                    )
            paths = path_expand(starts, e, lo, hi, semantics="trail")
            e = paths.select(
                F.col("start").alias("src"), F.col("end").alias("dst")
            )
            for df in (_label_ids(b), allowed.get(b)):
                if df is not None:
                    e = e.join(
                        df.withColumnRenamed("id", "dst"), "dst", "left_semi"
                    )
            sentence_dfs.append((a, b, e))
            continue
        ev = evar_by_idx.get(i)
        keep = sorted(eprops_keep.get(ev, ())) if ev else []
        scan_props = set(keep)
        for pred in edge_push.get(ev, []) if ev else []:
            scan_props.update(
                o[2] for o in _cmp_operands(pred) if o[0] == "prop"
            )
        e = _sentence_edges(
            pg, labels.get(a), labels.get(b), elabel, direction,
            props=tuple(sorted(scan_props)),
        )
        if ev:
            # single-variable relationship predicates filter the edge scan
            # itself (the edge half of FilterIntoJoinRule)
            epk = _ts_propkind(dict(e.dtypes), lambda _t, p: p)
            for pred in edge_push.get(ev, []):
                e = e.filter(
                    _pred_to_col(
                        pred,
                        lambda o, epk=epk: _operand_col(
                            o, lambda _t, p: F.col(p), None, epk
                        ),
                    )
                )
            e = e.select(
                "src", "dst",
                *[F.col(p).alias(f"{ev}__{p}") for p in keep],
            )
        if a in allowed:
            e = e.join(allowed[a].withColumnRenamed("id", "src"), "src", "left_semi")
        if b in allowed:
            e = e.join(allowed[b].withColumnRenamed("id", "dst"), "dst", "left_semi")
        sentence_dfs.append((a, b, e))

    # --- greedy closing-first join DAG (the match() plan over per-sentence
    # tables) ----------------------------------------------------------------
    def run_dag(
        dfs: list, bare_tags: list | None = None
    ) -> tuple[DataFrame, set[str]]:
        remaining = list(dfs)
        bound: set[str] = set()
        out: DataFrame | None = None
        while remaining:
            best_i, best_score = 0, -1
            for i, (a, b, _e) in enumerate(remaining):
                score = (a in bound) + (b in bound)
                if score > best_score:
                    best_i, best_score = i, score
            a, b, e = remaining.pop(best_i)
            if a == b:
                # self-loop pattern (a)-->(a): a unary constraint, not a
                # join — aliasing src and dst to the same name would create
                # duplicate columns
                loops = e.filter(F.col("src") == F.col("dst")).select(
                    F.col("src").alias(a),
                    *[c for c in e.columns if c not in ("src", "dst")],
                )
                if out is None:
                    out = loops
                    bound.add(a)
                elif a in bound:
                    out = out.join(loops, a)
                else:
                    out = out.crossJoin(loops)
                    bound.add(a)
                continue
            # shortest-path sentences carry {p}__hops/{p}__path side columns
            extras = [c for c in e.columns if c not in ("src", "dst")]
            e = e.select(
                F.col("src").alias(a), F.col("dst").alias(b), *extras
            )
            if out is None:
                out = e
                bound.update((a, b))
            elif a in bound and b in bound:
                # INNER join, not semi: a closing sentence with
                # multiplicities (variable-length paths, parallel edges
                # across label tables) contributes one binding per
                # relationship/path — Cypher bag semantics
                out = out.join(e, [a, b])
            elif a in bound:
                out = out.join(e, a)
                bound.add(b)
            elif b in bound:
                out = out.join(e, b)
                bound.add(a)
            else:
                out = out.crossJoin(e)
                bound.update((a, b))
        for tag in bare_tags or []:
            # node-only pattern: label+pushdown-filtered vertex scan —
            # joins on an already-bound tag (multiplicity 1: vertex tables
            # are unique by id), else a Cypher cartesian product
            ids = _tag_ids(tag).select(F.col("id").alias(tag))
            if out is None:
                out = ids
                bound.add(tag)
            elif tag in bound:
                out = out.join(ids, tag)
            else:
                out = out.crossJoin(ids)
                bound.add(tag)
        return out, bound

    n_mand = ast["n_mandatory"]
    n_bmand = ast["n_bare_mandatory"]
    out, bound = run_dag(sentence_dfs[:n_mand], ast["bare"][:n_bmand])
    optional_only: set[str] = set()
    if sentence_dfs[n_mand:] or ast["bare"][n_bmand:]:
        # OPTIONAL MATCH: evaluate the optional pattern as its own DAG and
        # LEFT-join it on the shared tags — unmatched bindings keep the
        # mandatory row with nulls for the optional-only tags (Cypher's
        # optional semantics). Single-tag predicates on optional tags were
        # pushed into the pattern above (= Cypher's OPTIONAL MATCH…WHERE);
        # cross-tag post-predicates run after the left join and therefore
        # drop null rows, as a top-level WHERE does in Cypher.
        opt_out, opt_bound = run_dag(
            sentence_dfs[n_mand:], ast["bare"][n_bmand:]
        )
        shared = sorted(bound & opt_bound)
        if not shared:
            raise ValueError(
                "OPTIONAL MATCH must share at least one tag with MATCH"
            )
        out = out.join(opt_out, shared, "left")
        optional_only = opt_bound - bound
        bound = bound | opt_bound
    if _pre_frame is not None and _pre_join == "left":
        # OPTIONAL MATCH continuation: the pattern (incl. its WHERE, EXISTS
        # conjuncts, property access) evaluates on its own frame; the
        # previous stage's rows join in just before projection, left, so
        # unmatched rows survive with null pattern bindings. Those
        # bindings may be null downstream — mark every pattern tag
        # optional so later keyed joins stay left joins.
        optional_only = optional_only | bound
        pre_only = set(_pre_frame.columns) - bound
        for pred in post:
            bad = {
                o[1]
                for o in _cmp_operands(pred)
                if o[0] == "tag" and o[1] in pre_only
            }
            if bad:
                raise ValueError(
                    "OPTIONAL MATCH continuation WHERE may only reference "
                    f"pattern names (got {sorted(bad)})"
                )
    elif _pre_frame is not None:
        # pipeline continuation: join the previous segment's frame on the
        # shared aliases/tags (inner, bag semantics — each earlier row
        # pairs with every new pattern match sharing its bindings); with
        # no shared name Cypher semantics is the cartesian product.
        pkeys = sorted(set(_pre_frame.columns) & set(out.columns))
        out = out.join(_pre_frame, pkeys) if pkeys else out.crossJoin(
            _pre_frame
        )
    if distinct_vertices:
        tags = sorted(bound)
        for i in range(len(tags)):
            for j in range(i + 1, len(tags)):
                neq = F.col(tags[i]) != F.col(tags[j])
                if tags[i] in optional_only or tags[j] in optional_only:
                    # unmatched optional bindings (null) are not duplicates
                    neq = (
                        F.col(tags[i]).isNull()
                        | F.col(tags[j]).isNull()
                        | neq
                    )
                out = out.filter(neq)

    # --- join vertex properties needed by post-WHERE / RETURN ---------------
    # props consumed by the first projection stage (stage1_items computed
    # above); edge-variable props already ride the sentence DataFrames as
    # {var}__{prop} columns, so only vertex tags join here
    need_props = {
        (o[1], o[2])
        for pred in post
        for o in _cmp_operands(pred)
        if o[0] == "prop" and o[1] not in evars
    } | {
        (t, p) for t, p in _item_prop_refs(stage1_items) if t not in evars
    }
    for tag, prop in sorted(need_props):
        v = pg.vertices[tag_label(tag)]
        if prop not in v.columns:
            raise ValueError(f"label {tag_label(tag)!r} has no property {prop!r}")
        out = out.join(
            v.select(F.col("id").alias(tag), F.col(prop).alias(f"{tag}__{prop}")),
            tag,
            # null bindings from OPTIONAL MATCH must survive prop access
            "left" if tag in optional_only else "inner",
        )

    def propcol(tag: str, prop: str) -> Column:
        return F.col(f"{tag}__{prop}")

    if post:
        # propkind over the bound frame's materialized {tag}__{prop}
        # columns (vertex props just joined; edge props ride the sentences)
        ppk = _ts_propkind(dict(out.dtypes), lambda t, p: f"{t}__{p}")
        for pred in post:
            out = out.filter(
                _pred_to_col(
                    pred, lambda o: _operand_col(o, propcol, None, ppk)
                )
            )

    # --- [NOT] EXISTS(pattern) conjuncts: semi/anti join the bound frame
    # against the pattern's edge table (supported_cypher.md "WHERE NOT
    # EXIST … implements as anti join"). Tags the pattern introduces are
    # purely existential; at least one endpoint must be bound. Null
    # bindings from OPTIONAL MATCH never match a join key, so EXISTS is
    # false / NOT EXISTS true for them — Cypher's null semantics. ----------
    for ex in ast["exists"]:
        a, b = ex["a"], ex["b"]
        alab = ex["alabel"] or labels.get(a)
        blab = ex["blabel"] or labels.get(b)
        for t, lab_in in ((a, ex["alabel"]), (b, ex["blabel"])):
            prev = labels.get(t)
            if lab_in and prev and lab_in != prev:
                raise ValueError(
                    f"EXISTS binds tag {t!r} to label {lab_in!r} but MATCH "
                    f"bound it to {prev!r}"
                )
        e = _sentence_edges(pg, alab, blab, ex["elabel"], ex["dir"])
        a_bound, b_bound = a in bound, b in bound
        how = "left_anti" if ex["neg"] else "left_semi"
        if a == b:
            if not a_bound:
                raise ValueError(
                    f"EXISTS pattern references no bound tag ({a!r})"
                )
            out = out.join(
                e.filter(F.col("src") == F.col("dst")).select(
                    F.col("src").alias(a)
                ),
                [a],
                how,
            )
        elif a_bound and b_bound:
            out = out.join(
                e.select(F.col("src").alias(a), F.col("dst").alias(b)),
                [a, b],
                how,
            )
        elif a_bound:
            out = out.join(e.select(F.col("src").alias(a)), [a], how)
        elif b_bound:
            out = out.join(e.select(F.col("dst").alias(b)), [b], how)
        else:
            raise ValueError(
                f"EXISTS pattern must reference at least one bound tag "
                f"(got {a!r}, {b!r})"
            )

    # --- labels(tag) columns: constant for labeled tags, a label-union
    # join for unlabeled ones ------------------------------------------------
    for tag in sorted({it[1] for it in stage1_items if it[0] == "labels"}):
        col = f"{tag}__labels"
        if labels.get(tag) is not None:
            out = out.withColumn(col, F.lit(labels[tag]))
        else:
            parts = [
                vdf.select(F.col("id").alias(tag), F.lit(lab).alias(col))
                for lab, vdf in pg.vertices.items()
            ]
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            out = out.join(
                u, tag, "left" if tag in optional_only else "inner"
            )

    if _pre_frame is not None and _pre_join == "left":
        pkeys = sorted(set(_pre_frame.columns) & set(out.columns))
        if not pkeys:
            raise ValueError(
                "OPTIONAL MATCH continuation must share at least one name "
                "with the preceding WITH stage"
            )
        out = _pre_frame.join(out, pkeys, "left")

    # --- WITH / RETURN: projection / implicit grouping ----------------------
    # (Cypher's implicit aggregation: non-aggregate items are the grouping
    # keys; aggregates reduce each group)
    def apply_items(df, items, distinct, pcol):
        keys, aggs = [], []
        dpk = (
            _ts_propkind(dict(df.dtypes), lambda t, p: f"{t}__{p}")
            if pcol is not None
            else None
        )
        for kind, tag, prop, alias in items:
            if kind == "pathlen":
                # Cypher length(p) = relationship count = BFS hop count
                keys.append(F.col(f"{tag}__hops").cast("bigint").alias(alias))
                continue
            if kind == "pathvar":
                keys.append(F.col(f"{tag}__path").alias(alias))
                continue
            if kind == "pathrels":
                # relationships(p): consecutive (src, dst) pairs along the
                # path's vertex array
                pc = f"{tag}__path"
                keys.append(
                    F.expr(
                        f"transform(slice({pc}, 1, size({pc}) - 1), "
                        f"(x, i) -> struct(x AS src, {pc}[i + 1] AS dst))"
                    ).alias(alias)
                )
                continue
            if kind == "labels":
                keys.append(F.col(f"{tag}__labels").alias(alias))
                continue
            if kind == "etype":
                # the relationship label, statically known from the pattern
                keys.append(F.lit(prop).alias(alias))
                continue
            if kind == "expr":
                # arithmetic over bound tags / joined property columns
                keys.append(_operand_col(tag, pcol, None, dpk).alias(alias))
                continue
            if kind == "listexpr":
                # [expr, …] list literal (supported_cypher.md ListLiteral
                # row): fold the element expressions into one array column
                keys.append(
                    F.array(
                        *[_operand_col(n, pcol, None, dpk) for n in tag]
                    ).alias(alias)
                )
                continue
            if kind == "case":
                # searched CASE (supported_cypher.md Branch row) →
                # F.when chain; no ELSE → NULL (Cypher semantics)
                opc = lambda o: _operand_col(o, pcol, None, dpk)  # noqa: E731
                col = None
                for pred, val in tag:
                    cond = _pred_to_col(pred, opc)
                    col = (
                        F.when(cond, opc(val))
                        if col is None
                        else col.when(cond, opc(val))
                    )
                if prop is not None:  # ELSE operand rides the prop slot
                    col = col.otherwise(opc(prop))
                keys.append(col.alias(alias))
                continue
            if kind == "mapexpr":
                # {key: expr, …} map literal → named struct (heterogeneous
                # value types, so map<k,v> would be lossy)
                keys.append(
                    F.struct(
                        *[
                            _operand_col(n, pcol, None, dpk).alias(k)
                            for k, n in tag
                        ]
                    ).alias(alias)
                )
                continue
            col = None
            if tag != "*":
                col = F.col(tag) if prop is None else pcol(tag, prop)
            if kind == "count":
                aggs.append(F.count(F.lit(1)).cast("bigint").alias(alias))
            elif kind.startswith("agg:"):
                parts = kind.split(":")
                fn, dct = parts[1], len(parts) > 2
                if fn == "count":
                    cnt = F.countDistinct(col) if dct else F.count(col)
                    aggs.append(cnt.cast("bigint").alias(alias))
                elif fn == "collect":
                    # Cypher leaves collect() order unspecified; sort for
                    # a deterministic, engine-comparable result.
                    # collect(DISTINCT x) = Cypher's set collection.
                    agg = F.collect_set(col) if dct else F.collect_list(col)
                    aggs.append(F.sort_array(agg).alias(alias))
                else:
                    aggs.append(
                        {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}[
                            fn
                        ](col).alias(alias)
                    )
            else:
                keys.append(col.alias(alias))
        if aggs and keys:
            res = df.groupBy(*keys).agg(*aggs)
            return res.select(*[al for _k, _t, _p, al in items])
        if aggs:
            return df.agg(*aggs)
        res = df.select(*keys)
        return res.distinct() if distinct else res

    items = ast["return"]["items"]
    if ast["with"]:
        # pattern-tag properties stay visible until the first PROJECTION
        # stage runs; UNWIND stages only add a column
        pcol_active = propcol
        for w in ast["with"]:
            if "unwind" in w:
                kind, src, alias = w["unwind"]
                if kind == "lit":
                    col = F.array(*[F.lit(v) for v in src])
                elif kind == "path":
                    col = F.col(f"{src}__path")
                else:
                    col = F.col(src)
                out = out.withColumn(alias, F.explode(col))
            else:
                out = apply_items(out, w["items"], w["distinct"], pcol_active)
                pcol_active = None
            for pred in w["where"]:
                # WITH-scope predicates see only bare aliases and literals
                out = out.filter(
                    _pred_to_col(pred, lambda o: _operand_col(o, None))
                )
        out = apply_items(out, items, ast["return"]["distinct"], pcol_active)
    else:
        out = apply_items(out, items, ast["return"]["distinct"], propcol)
    # ORDER BY / SKIP / LIMIT → orderBy + offset + limit (TakeOrdered when
    # Catalyst sees orderBy().limit())
    ret = ast["return"]
    if ret["order"]:
        out = out.orderBy(
            *[
                F.col(k).desc() if desc else F.col(k).asc()
                for k, desc in ret["order"]
            ]
        )
    if ret["skip"]:
        out = out.offset(ret["skip"])
    if ret["limit"] is not None:
        out = out.limit(ret["limit"])
    return out


# ---------------------------------------------------------------------------
# CALL — stored-procedure invocation
# ---------------------------------------------------------------------------

_CALL = re.compile(
    r"(?is)^CALL\s+([A-Za-z_][\w.]*)\s*\((.*?)\)\s*(?:YIELD\s+(.+?))?$"
)


def cypher_call(graph, query: str) -> DataFrame:
    """``CALL [gs.procedure.]name(literal, ...) [YIELD col, ...]`` — the
    reference's Cypher procedure-invocation form (supported_cypher.md CALL
    table; GIE ProcedureCall). The graph is passed as the procedure's first
    argument; remaining arguments are int/float/'string' literals. YIELD
    projects the named result columns."""
    from graphscope_spark.operators.procedures import call_procedure

    m = _CALL.match(query.strip().rstrip(";"))
    if not m:
        raise ValueError(
            "expected 'CALL name(arg, ...) [YIELD col, ...]': " f"{query!r}"
        )
    name, argtext, yield_part = m.groups()
    if name.lower().startswith("gs.procedure."):
        name = name[len("gs.procedure."):]
    args = []
    raws = [
        r.strip().lstrip(",").strip()
        for r in re.findall(r"'[^']*'|[^,]+", argtext)
    ]
    for raw in (r for r in raws if r):
        om = _OPERAND.match(raw)
        if not om or om.group(1) is not None:
            raise ValueError(f"CALL arguments must be literals: {raw!r}")
        _t, _p, flt, intg, s = om.groups()
        args.append(float(flt) if flt else int(intg) if intg is not None else s)
    df = call_procedure(name, graph, *args)
    if yield_part:
        df = df.select(*[c.strip() for c in yield_part.split(",")])
    return df
