"""Basic-graph-pattern (BGP) queries over the RDF triple table.

The reference (rdf-elixir/jsonld-ex) materializes JSON-LD as RDF; the
natural next question a KG user asks is a *pattern* query ("which turns
with role X mention entity ?e").  This module compiles a SPARQL-style
BGP — a conjunction of (subject, predicate, object) patterns with
shared variables — into a Spark DataFrame plan of hash equi-joins over
the triple relation, plus the equivalent ANSI-SQL text so the same
pattern is independently checkable by DuckDB.

Term syntax (one string per position):

- ``?name``      — variable; binds the lexical value of that position.
- ``<iri>``      — IRI constant.  In the object position it only
                   matches IRI objects (``obj_is_iri = true``).
- ``"literal"``  — plain-literal constant (object position only;
                   matches ``obj_is_iri = false`` regardless of
                   datatype — the gate's triple model stores the
                   lexical form in ``obj``).

Planning (the 100-TB shape):

- Each pattern becomes a filtered projection of the triple scan —
  constants are pushed down as scan predicates (PushedFilters on a
  persisted parquet/Iceberg triple table), variables become columns
  named after themselves.
- Patterns are joined left-deep in greedy order: most-constant
  (most selective) pattern first, then any pattern sharing a variable
  with the bound set, preferring more constants.  A pattern that
  shares no variable with the accumulated plan is a cross product and
  is rejected (``allow_cartesian=True`` to override) — on a 10^12-
  triple table an accidental cartesian is the difference between a
  query and an outage.
- Join *strategy* is deliberately left to AQE: pattern selectivity is
  data-dependent (``role = "tool"`` may be 20% of turns, a specific
  subject IRI may be 5 rows), so hard-coding broadcast here would be
  wrong at scale; AQE converts small sides to broadcast at runtime
  from observed sizes and handles skewed join keys (hot entities).

Self-joins re-scan the input once per pattern.  Over a *persisted*
triple table that is N column-pruned parquet scans with pushed
filters — exactly what you want.  The self-contained gate queries
instead run the construction pipeline once and ``localCheckpoint`` the
triples so the pattern joins read the materialized result instead of
re-running the Python stage per pattern (same trick as
dedup_ops._connected_components; cache() would not truncate lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VAR, _IRI, _LIT = "var", "iri", "lit"


def _parse_term(term: str) -> tuple[str, str]:
    if term.startswith("?") and len(term) > 1:
        return (_VAR, term[1:])
    if term.startswith("<") and term.endswith(">") and len(term) > 2:
        return (_IRI, term[1:-1])
    if term.startswith('"') and term.endswith('"') and len(term) > 1:
        return (_LIT, term[1:-1])
    raise ValueError(f"bad BGP term {term!r}: expected ?var, <iri> or \"literal\"")


def _parse_pattern(pattern: tuple[str, str, str]) -> list[tuple[str, str]]:
    s, p, o = (_parse_term(t) for t in pattern)
    if s[0] == _LIT:
        raise ValueError("literal subjects are not valid RDF")
    if p[0] == _LIT:
        raise ValueError("literal predicates are not valid RDF")
    if all(kind != _VAR for kind, _ in (s, p, o)):
        raise ValueError("pattern with no variables is not supported")
    return [s, p, o]


def _pattern_vars(parsed: list[tuple[str, str]]) -> set[str]:
    return {val for kind, val in parsed if kind == _VAR}


def _n_constants(parsed: list[tuple[str, str]]) -> int:
    return sum(1 for kind, _ in parsed if kind != _VAR)


def _join_order(parsed: list[list[tuple[str, str]]], allow_cartesian: bool) -> list[int]:
    """Greedy left-deep order: most constants first, then connected
    patterns by constant count; stable tie-break on original index so
    plans (and oracle SQL) are deterministic."""
    remaining = list(range(len(parsed)))
    remaining.sort(key=lambda i: (-_n_constants(parsed[i]), i))
    order = [remaining.pop(0)]
    bound = set(_pattern_vars(parsed[order[0]]))
    while remaining:
        connected = [i for i in remaining if _pattern_vars(parsed[i]) & bound]
        if not connected:
            if not allow_cartesian:
                raise ValueError(
                    "BGP is disconnected (cross product); pass allow_cartesian=True"
                )
            connected = remaining
        nxt = min(connected, key=lambda i: (-_n_constants(parsed[i]), i))
        remaining.remove(nxt)
        order.append(nxt)
        bound |= _pattern_vars(parsed[nxt])
    return order


_POS_COLS = ("subj", "pred", "obj")

# SPARQL-style FILTER support: a filter is (var, op, value); op in
# _FILTER_OPS.  An int value compares numerically (the lexical form is
# cast — Spark CAST and DuckDB TRY_CAST both yield NULL on non-numeric
# strings, so non-numeric bindings drop out identically); a str value
# compares lexically; "regex" matches Java/RE2-common syntax via rlike
# (Spark) / regexp_matches (DuckDB).
_FILTER_SQL_OPS = {"gt": ">", "ge": ">=", "lt": "<", "le": "<=", "eq": "=", "ne": "<>"}


def _check_filters(filters) -> None:
    for var, op, value in filters:
        if op != "regex" and op not in _FILTER_SQL_OPS:
            raise ValueError(f"unsupported filter op {op!r}")
        if op == "regex" and not isinstance(value, str):
            raise ValueError("regex filter value must be a string")


def _filter_cond_spark(src_col: str, op: str, value):
    c = F.col(src_col)
    if op == "regex":
        return c.rlike(value)
    if isinstance(value, int) and not isinstance(value, bool):
        # try_cast, not cast: ANSI mode (Spark 4 default) makes CAST
        # throw on a non-numeric lexical form; try_cast → NULL drops
        # the binding, exactly like the oracle's TRY_CAST
        c = c.try_cast("long")
    lit = F.lit(value)
    return {
        "gt": c > lit, "ge": c >= lit, "lt": c < lit,
        "le": c <= lit, "eq": c == lit, "ne": c != lit,
    }[op]


def _filter_cond_sql(src_col: str, op: str, value) -> str:
    if op == "regex":
        return f"regexp_matches({src_col}, {_sql_quote(value)})"
    if isinstance(value, int) and not isinstance(value, bool):
        return f"TRY_CAST({src_col} AS BIGINT) {_FILTER_SQL_OPS[op]} {value}"
    return f"{src_col} {_FILTER_SQL_OPS[op]} {_sql_quote(value)}"


def _pattern_df(
    triples: DataFrame, parsed: list[tuple[str, str]], filters=()
) -> DataFrame:
    conds = []
    cols: dict[str, str] = {}  # var name -> source column
    for pos, (kind, val) in zip(_POS_COLS, parsed):
        if kind == _VAR:
            if val in cols:  # repeated variable inside one pattern
                conds.append(F.col(cols[val]) == F.col(pos))
            else:
                cols[val] = pos
        else:
            conds.append(F.col(pos) == F.lit(val))
            if pos == "obj":
                conds.append(F.col("obj_is_iri") == F.lit(kind == _IRI))
    # FILTERs on variables this pattern binds are applied on the SOURCE
    # column, BELOW the projection and therefore below every join —
    # the filtered pattern scan is what the join consumes (pushdown is
    # plan-asserted in tests/test_bgp.py)
    for var, op, value in filters:
        if var in cols:
            conds.append(_filter_cond_spark(cols[var], op, value))
    df = triples
    for c in conds:
        df = df.filter(c)
    return df.select(*[F.col(src).alias(var) for var, src in cols.items()])


def _bgp_join(triples: DataFrame, parsed, order, filters=()) -> DataFrame:
    acc = _pattern_df(triples, parsed[order[0]], filters)
    bound = set(acc.columns)
    for i in order[1:]:
        pdf = _pattern_df(triples, parsed[i], filters)
        shared = sorted(bound & set(pdf.columns))
        acc = acc.join(pdf, on=shared, how="inner") if shared else acc.crossJoin(pdf)
        bound |= set(pdf.columns)
    return acc


def _check_optional_group(
    parsed_group, bound: set[str], group_idx: int
) -> list[str]:
    gvars = set().union(*(_pattern_vars(p) for p in parsed_group))
    shared = sorted(gvars & bound)
    if not shared:
        raise ValueError(
            f"optional group {group_idx} shares no variable with the "
            "required patterns (would be a cartesian left join)"
        )
    return shared


def bgp_select(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    project: list[str] | None = None,
    optional: list[list[tuple[str, str, str]]] | None = None,
    minus: list[list[tuple[str, str, str]]] | None = None,
    allow_cartesian: bool = False,
    filters: list[tuple[str, str, object]] | None = None,
    paths: list[tuple[str, object, str]] | None = None,
    values: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Compile a BGP into a DataFrame of variable bindings (bag
    semantics, like SPARQL BGP matching).  Column names are the
    variable names; ``project`` selects/orders output variables.

    ``values`` is the SPARQL VALUES clause in its common single-
    variable form: {var: [value, ...]} restricts that variable's
    bindings to the listed lexical values (the inline-data join
    degenerates to an IN filter for one variable; value lists are
    treated as sets).  VALUES variables must be bound by the required
    patterns or paths.

    ``paths`` is a list of PROPERTY-PATH triple patterns
    (subj_term, path_ast, obj_term) — see operators/property_paths for
    the AST — inner-joined onto the required bindings on their shared
    variables (a path pattern's relation is a SET of node pairs, per
    SPARQL arbitrary-length-path semantics).  Paths are joined after
    the plain patterns and before OPTIONAL/MINUS groups; ``patterns``
    may be empty when at least one path is given.  FILTTER variables
    must still be bound by plain patterns (filters compile into
    pattern scans).

    ``filters`` is a list of SPARQL-style FILTER expressions
    (var, op, value) with op in {gt, ge, lt, le, eq, ne, regex} —
    e.g. ``("idx", "gt", 5)`` for FILTER(?idx > 5) or
    ``("text", "regex", "error")`` for FILTER(regex(?text, "error")).
    Int values compare numerically (non-numeric bindings drop out in
    both engines), str values lexically.  Every filter variable must be
    bound by the REQUIRED patterns; each filter is compiled into the
    scan of every pattern that binds its variable, BELOW the joins
    (pushdown — at 10^12 triples a post-join FILTER is the difference
    between scanning a slice and materializing the full binding bag).

    ``optional`` is a list of OPTIONAL pattern groups (SPARQL
    semantics: each group left-joins onto the required bindings on its
    shared variables; group-only variables come back null when the
    group doesn't match).  Groups are applied in order; a variable may
    be introduced by at most one optional group.

    ``minus`` is a list of MINUS pattern groups: a solution is dropped
    when the group matches on its shared variables (left-anti join —
    SPARQL MINUS for groups that share at least one variable, which
    the compiler requires).  MINUS is applied to the required+optional
    result, and may not reference optional-introduced variables (the
    anti-join null-key semantics would diverge from SPARQL)."""
    paths = paths or []
    if not patterns and not paths:
        raise ValueError("empty BGP")
    parsed = [_parse_pattern(p) for p in patterns]
    filters = filters or []
    _check_filters(filters)
    required = set().union(*(_pattern_vars(p) for p in parsed)) if parsed else set()
    unbound = [v for v, _, _ in filters if v not in required]
    if unbound:
        raise ValueError(
            f"filter variables not bound by required patterns: {unbound}"
        )
    if parsed:
        order = _join_order(parsed, allow_cartesian)
        acc = _bgp_join(triples, parsed, order, filters)
        bound = set(acc.columns)
    else:
        acc, bound = None, set()
    for pi, (s_term, ast, o_term) in enumerate(paths):
        from jsonld_ex_spark.operators.property_paths import path_select

        rel = path_select(triples, s_term, ast, o_term)
        if acc is None:
            acc, bound = rel, set(rel.columns)
            continue
        shared = sorted(bound & set(rel.columns))
        if not shared and not allow_cartesian:
            raise ValueError(
                f"path pattern {pi} shares no variable with the prior "
                "patterns (cross product); pass allow_cartesian=True"
            )
        acc = acc.join(rel, on=shared, how="inner") if shared else acc.crossJoin(rel)
        bound |= set(rel.columns)
    for var, vals in (values or {}).items():
        if var not in bound:
            raise ValueError(f"VALUES variable {var!r} not bound by required patterns/paths")
        acc = acc.filter(F.col(var).isin(list(vals)))
    required_vars = set(bound)
    optional_vars: set[str] = set()
    for gi, group in enumerate(optional or []):
        gparsed = [_parse_pattern(p) for p in group]
        gvars = set().union(*(_pattern_vars(p) for p in gparsed))
        if gvars & optional_vars:
            # joining on a nullable optional-introduced column would
            # silently diverge from SPARQL's compatible-binding rules
            raise ValueError(
                "optional groups must not reference variables introduced "
                "by another optional group"
            )
        shared = _check_optional_group(gparsed, bound, gi)
        gdf = _bgp_join(triples, gparsed, _join_order(gparsed, allow_cartesian))
        acc = acc.join(gdf, on=shared, how="left")
        optional_vars |= set(gdf.columns) - bound
        bound |= set(gdf.columns)
    for mi, group in enumerate(minus or []):
        mparsed = [_parse_pattern(p) for p in group]
        mvars = set().union(*(_pattern_vars(p) for p in mparsed))
        if mvars & optional_vars:
            raise ValueError(
                "minus groups must not reference optional-introduced variables"
            )
        shared = sorted(mvars & required_vars)
        if not shared:
            raise ValueError(
                f"minus group {mi} shares no variable with the required "
                "patterns (SPARQL MINUS with disjoint domains is a no-op; "
                "the compiler rejects it as almost certainly a mistake)"
            )
        mdf = _bgp_join(triples, mparsed, _join_order(mparsed, allow_cartesian))
        acc = acc.join(mdf.select(*shared).dropDuplicates(), on=shared, how="left_anti")
    if project is not None:
        missing = [v for v in project if v not in bound]
        if missing:
            raise ValueError(f"projected variables not bound: {missing}")
        acc = acc.select(*project)
    else:
        # deterministic default order, identical to bgp_oracle_sql's
        # default projection (join accumulation order depends on the
        # engine's USING-column hoisting, so neither side uses it)
        acc = acc.select(*sorted(bound))
    return acc


_AGG_FNS = {"count", "count_distinct", "min", "max"}


def bgp_aggregate(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    group_by: list[str],
    aggs: dict[str, tuple[str, str | None]],
    optional: list[list[tuple[str, str, str]]] | None = None,
    minus: list[list[tuple[str, str, str]]] | None = None,
) -> DataFrame:
    """SPARQL SELECT-with-GROUP-BY over BGP bindings: ``aggs`` maps
    output column -> (fn, var), fn in {count, count_distinct, min,
    max}; ``("count", None)`` counts solutions.  Numeric SUM/AVG over
    lexical forms is deliberately out of scope (the triple model's
    objects are strings; cast in a downstream select if the datatype
    warrants it)."""
    b = bgp_select(triples, patterns, optional=optional, minus=minus)
    cols = []
    for out, (fn, var) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported aggregate {fn!r}")
        if fn == "count" and var is None:
            cols.append(F.count(F.lit(1)).alias(out))
            continue
        if var is None or var not in b.columns:
            raise ValueError(f"aggregate {out}: variable {var!r} not bound")
        cols.append(
            {
                "count": F.count(F.col(var)),
                "count_distinct": F.countDistinct(F.col(var)),
                "min": F.min(F.col(var)),
                "max": F.max(F.col(var)),
            }[fn].alias(out)
        )
    return b.groupBy(*group_by).agg(*cols)


def bgp_aggregate_oracle_sql(
    triples_sql: str,
    patterns: list[tuple[str, str, str]],
    group_by: list[str],
    aggs: dict[str, tuple[str, str | None]],
    optional: list[list[tuple[str, str, str]]] | None = None,
    minus: list[list[tuple[str, str, str]]] | None = None,
) -> str:
    """SQL mirror of :func:`bgp_aggregate` (counts CAST to BIGINT so
    DuckDB's types render identically to Spark's longs)."""
    inner = bgp_oracle_sql(triples_sql, patterns, optional=optional, minus=minus)
    parts = []
    for out, (fn, var) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported aggregate {fn!r}")
        if fn == "count" and var is None:
            parts.append(f"CAST(count(*) AS BIGINT) AS {out}")
        elif fn == "count":
            parts.append(f"CAST(count({var}) AS BIGINT) AS {out}")
        elif fn == "count_distinct":
            parts.append(f"CAST(count(DISTINCT {var}) AS BIGINT) AS {out}")
        else:
            parts.append(f"{fn}({var}) AS {out}")
    sel = ", ".join(group_by + parts)
    return (
        f"WITH bindings AS ({inner})\n"
        f"SELECT {sel} FROM bindings GROUP BY {', '.join(group_by)}"
    )


def bgp_order_limit(
    bindings: DataFrame,
    order_by: list[tuple[str, str]],
    limit: int,
) -> DataFrame:
    """SPARQL solution modifiers ORDER BY + LIMIT over a binding
    relation (bgp_select / bgp_aggregate output).  ``order_by`` is
    [(column, "asc"|"desc"), ...] and MUST be a total order (include a
    unique tie-break column) — otherwise the selected prefix is
    engine-dependent and no oracle can reproduce it.  Spark plans
    orderBy().limit(n) as TakeOrderedAndProject: per-partition top-n
    heaps + one n-row merge at the driver — no global sort, the only
    LIMIT shape that survives 10^12 bindings."""
    if not order_by:
        raise ValueError("order_by must not be empty (LIMIT without a total order is non-deterministic)")
    if limit <= 0:
        raise ValueError("limit must be positive")
    cols = []
    for col, direction in order_by:
        if direction not in ("asc", "desc"):
            raise ValueError(f"bad direction {direction!r}")
        cols.append(F.col(col).asc() if direction == "asc" else F.col(col).desc())
    return bindings.orderBy(*cols).limit(limit)


def bgp_order_limit_oracle_sql(
    inner_sql: str,
    order_by: list[tuple[str, str]],
    limit: int,
) -> str:
    """SQL mirror of :func:`bgp_order_limit`."""
    if not order_by:
        raise ValueError("order_by must not be empty (LIMIT without a total order is non-deterministic)")
    if limit <= 0:
        raise ValueError("limit must be positive")
    parts = []
    for col, direction in order_by:
        if direction not in ("asc", "desc"):
            raise ValueError(f"bad direction {direction!r}")
        parts.append(f"{col} {direction.upper()}")
    return (
        f"SELECT * FROM ({inner_sql}) AS solutions "
        f"ORDER BY {', '.join(parts)} LIMIT {limit}"
    )


def bgp_union(
    triples: DataFrame,
    alternatives: list[list[tuple[str, str, str]]],
    project: list[str],
    allow_cartesian: bool = False,
) -> DataFrame:
    """SPARQL UNION: evaluate each alternative BGP and concatenate the
    binding bags.  ``project`` fixes the output schema; an alternative
    that doesn't bind a projected variable contributes NULL for it
    (SPARQL's unbound), mirroring UNION of differently-shaped groups."""
    if not alternatives:
        raise ValueError("empty UNION")
    out = None
    for alt in alternatives:
        b = bgp_select(triples, alt, allow_cartesian=allow_cartesian)
        cols = [
            F.col(v).alias(v) if v in b.columns
            else F.lit(None).cast("string").alias(v)
            for v in project
        ]
        part = b.select(*cols)
        out = part if out is None else out.unionByName(part)
    return out


def bgp_union_oracle_sql(
    triples_sql: str,
    alternatives: list[list[tuple[str, str, str]]],
    project: list[str],
    allow_cartesian: bool = False,
) -> str:
    """SQL mirror of :func:`bgp_union` (UNION ALL with NULL padding)."""
    if not alternatives:
        raise ValueError("empty UNION")
    parts = []
    for alt in alternatives:
        parsed = [_parse_pattern(p) for p in alt]
        bound = set().union(*(_pattern_vars(p) for p in parsed))
        sel = ", ".join(
            v if v in bound else f"CAST(NULL AS VARCHAR) AS {v}" for v in project
        )
        inner = _group_sql(parsed, _join_order(parsed, allow_cartesian))
        parts.append(f"SELECT {sel} FROM ({inner}) alt")
    body = " UNION ALL ".join(parts)
    return f"WITH triples AS ({triples_sql})\n{body}"


def bgp_over_table(
    spark,
    table_path: str,
    patterns: list[tuple[str, str, str]],
    project: list[str] | None = None,
    optional: list[list[tuple[str, str, str]]] | None = None,
    filters: list[tuple[str, str, object]] | None = None,
) -> DataFrame:
    """PRODUCTION form: BGP over a persisted triple table
    (``write_triples`` output).  Each pattern becomes a column-pruned
    parquet scan whose constant terms AND string-typed FILTER
    conditions are PUSHED filters (tests/test_bgp.py asserts
    PushedFilters in the plan) — at 10^12 triples the subject-bucketed
    layout additionally prunes files for subject-constant patterns."""
    return bgp_select(
        spark.read.parquet(table_path), patterns, project=project,
        optional=optional, filters=filters,
    )


def bgp_construct(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    optional: list[list[tuple[str, str, str]]] | None = None,
    distinct: bool = True,
) -> DataFrame:
    """SPARQL-style CONSTRUCT: evaluate the BGP, then instantiate each
    template pattern once per binding, emitting rows in the standard
    triple schema (subj, pred, obj, obj_is_iri, obj_dt, obj_lang,
    graph — the last three null: constructed objects are IRIs or plain
    literals).  ``distinct=True`` dedupes, because an RDF graph is a
    set — e.g. a type triple instantiated once per mention collapses
    to one row per entity.  Per SPARQL CONSTRUCT semantics, a template
    pattern referencing a variable that is unbound in a solution (an
    OPTIONAL group that didn't match) is simply not instantiated for
    that solution — never emitted with NULL terms.  The output feeds
    straight back into write_triples / bgp_select, closing the
    query→enrichment loop."""
    bindings = bgp_select(triples, patterns, optional=optional)
    if len(template) > 1:
        # each template pattern projects the same binding relation;
        # materialize it once instead of re-running the BGP join per
        # union branch
        bindings = bindings.localCheckpoint(eager=False)
    null_s = F.lit(None).cast("string")

    def term_col(term: str, position: str):
        kind, val = _parse_term(term)
        if kind == _VAR:
            if val not in bindings.columns:
                raise ValueError(f"template variable ?{val} not bound by the BGP")
            return F.col(val), None, val
        if kind == _LIT and position != "obj":
            raise ValueError("literal subjects/predicates are not valid RDF")
        return F.lit(val), kind, None

    out = None
    for s, p, o in template:
        sc, _, svar = term_col(s, "subj")
        pc, _, pvar = term_col(p, "pred")
        oc, okind, ovar = term_col(o, "obj")
        # a variable object carries whatever the matched triple had;
        # the BGP binds lexical forms, so constructed var-objects are
        # emitted as IRIs when they parse as absolute IRIs is NOT
        # decidable from the lexical form alone — the caller states it
        # per template pattern via <>/""; bare variables default to IRI
        is_iri = F.lit(okind != _LIT)
        src = bindings
        for var in (svar, pvar, ovar):
            if var is not None:
                src = src.filter(F.col(var).isNotNull())
        row = src.select(
            sc.alias("subj"),
            pc.alias("pred"),
            oc.alias("obj"),
            is_iri.alias("obj_is_iri"),
            null_s.alias("obj_dt"),
            null_s.alias("obj_lang"),
            null_s.alias("graph"),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("empty CONSTRUCT template")
    return out.dropDuplicates() if distinct else out


def bgp_construct_oracle_sql(
    triples_sql: str,
    patterns: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    optional: list[list[tuple[str, str, str]]] | None = None,
    distinct: bool = True,
) -> str:
    """SQL mirror of :func:`bgp_construct` over the oracle triples CTE."""
    inner = bgp_oracle_sql(triples_sql, patterns, optional=optional)

    def term_sql(term: str, position: str) -> tuple[str, str]:
        kind, val = _parse_term(term)
        if kind == _VAR:
            return val, kind
        if kind == _LIT and position != "obj":
            raise ValueError("literal subjects/predicates are not valid RDF")
        return _sql_quote(val), kind

    parts = []
    for s, p, o in template:
        ssql, skind = term_sql(s, "subj")
        psql, pkind = term_sql(p, "pred")
        osql, okind = term_sql(o, "obj")
        is_iri = "false" if okind == _LIT else "true"
        # SPARQL CONSTRUCT: skip solutions where a template variable is
        # unbound (same rule as the DataFrame side)
        notnull = [
            f"{sql} IS NOT NULL"
            for sql, kind in ((ssql, skind), (psql, pkind), (osql, okind))
            if kind == _VAR
        ]
        where = " WHERE " + " AND ".join(notnull) if notnull else ""
        parts.append(
            f"SELECT {ssql} AS subj, {psql} AS pred, {osql} AS obj, "
            f"{is_iri} AS obj_is_iri, CAST(NULL AS VARCHAR) AS obj_dt, "
            "CAST(NULL AS VARCHAR) AS obj_lang, CAST(NULL AS VARCHAR) AS graph "
            f"FROM bindings{where}"
        )
    body = " UNION ALL ".join(parts)
    sel = "SELECT DISTINCT * FROM" if distinct else "SELECT * FROM"
    return f"WITH bindings AS ({inner})\n{sel} ({body}) AS constructed"


def _sql_quote(val: str) -> str:
    return "'" + val.replace("'", "''") + "'"


def _pattern_sql(
    parsed: list[tuple[str, str]], rel: str = "triples", filters=()
) -> str:
    conds = []
    cols: dict[str, str] = {}
    for pos, (kind, val) in zip(_POS_COLS, parsed):
        if kind == _VAR:
            if val in cols:
                conds.append(f"{cols[val]} = {pos}")
            else:
                cols[val] = pos
        else:
            conds.append(f"{pos} = {_sql_quote(val)}")
            if pos == "obj":
                conds.append(f"obj_is_iri = {'true' if kind == _IRI else 'false'}")
    for var, op, value in filters:
        if var in cols:
            conds.append(_filter_cond_sql(cols[var], op, value))
    proj = ", ".join(f"{src} AS {var}" for var, src in cols.items())
    where = " AND ".join(conds) if conds else "true"
    return f"SELECT {proj} FROM {rel} WHERE {where}"


def _group_sql(parsed, order) -> str:
    parts = [f"({_pattern_sql(parsed[order[0]])}) g0"]
    bound = _pattern_vars(parsed[order[0]])
    for n, i in enumerate(order[1:], 1):
        shared = sorted(bound & _pattern_vars(parsed[i]))
        kw = f"JOIN ({_pattern_sql(parsed[i])}) g{n}"
        parts.append(
            f"{kw} USING ({', '.join(shared)})" if shared else f"CROSS {kw}"
        )
        bound |= _pattern_vars(parsed[i])
    return "SELECT * FROM " + " ".join(parts)


def bgp_oracle_sql(
    triples_sql: str,
    patterns: list[tuple[str, str, str]],
    project: list[str] | None = None,
    optional: list[list[tuple[str, str, str]]] | None = None,
    minus: list[list[tuple[str, str, str]]] | None = None,
    allow_cartesian: bool = False,
    filters: list[tuple[str, str, object]] | None = None,
    paths: list[tuple[str, object, str]] | None = None,
    values: dict[str, list[str]] | None = None,
) -> str:
    """ANSI-SQL text with the SAME bag semantics as :func:`bgp_select`
    (same greedy join order, USING-joins on shared variables, LEFT
    JOINs for optional groups, NOT EXISTS for minus groups, FILTER
    conditions inside every pattern CTE that binds the variable,
    WITH RECURSIVE closures for property-path patterns), runnable by
    DuckDB over the relationally-derived triples CTE — the oracle
    never touches the Spark plan."""
    paths = paths or []
    if not patterns and not paths:
        raise ValueError("empty BGP")
    parsed = [_parse_pattern(p) for p in patterns]
    filters = filters or []
    _check_filters(filters)
    required = set().union(*(_pattern_vars(p) for p in parsed)) if parsed else set()
    unbound = [v for v, _, _ in filters if v not in required]
    if unbound:
        raise ValueError(
            f"filter variables not bound by required patterns: {unbound}"
        )
    path_ctes: list[str] = []
    counter = [0]
    if parsed:
        order = _join_order(parsed, allow_cartesian)
        ctes = [f"p{i} AS ({_pattern_sql(parsed[i], filters=filters)})" for i in order]
        joins = [f"p{order[0]}"]
        bound = _pattern_vars(parsed[order[0]])
        for i in order[1:]:
            shared = sorted(bound & _pattern_vars(parsed[i]))
            if shared:
                joins.append(f"JOIN p{i} USING ({', '.join(shared)})")
            else:
                joins.append(f"CROSS JOIN p{i}")
            bound |= _pattern_vars(parsed[i])
    else:
        ctes, joins, bound = [], [], set()
    for pi, (s_term, ast, o_term) in enumerate(paths):
        from jsonld_ex_spark.operators.property_paths import (
            _parse_term as _path_term,
        )
        from jsonld_ex_spark.operators.property_paths import path_pattern_sql

        rel = path_pattern_sql(s_term, ast, o_term, path_ctes, counter)
        name = f"pth{pi}"
        ctes.append(f"{name} AS (SELECT * FROM {rel} AS p)")
        pvars = {v for kind, v in (_path_term(s_term), _path_term(o_term)) if kind == "var"}
        if not joins:
            joins, bound = [name], set(pvars)
            continue
        shared = sorted(bound & pvars)
        if shared:
            joins.append(f"JOIN {name} USING ({', '.join(shared)})")
        elif allow_cartesian:
            joins.append(f"CROSS JOIN {name}")
        else:
            raise ValueError(
                f"path pattern {pi} shares no variable with the prior "
                "patterns (cross product); pass allow_cartesian=True"
            )
        bound |= pvars
    ctes = path_ctes + ctes
    values_conds = []
    for var, vals in (values or {}).items():
        if var not in bound:
            raise ValueError(f"VALUES variable {var!r} not bound by required patterns/paths")
        lst = ", ".join(_sql_quote(str(v)) for v in vals)
        # IN on a required-bound column commutes with the LEFT JOINs
        # below, so the outer WHERE matches bgp_select's pre-optional
        # filter exactly
        values_conds.append(f"{var} IN ({lst})")
    required_vars = set(bound)
    optional_vars: set[str] = set()
    for gi, group in enumerate(optional or []):
        gparsed = [_parse_pattern(p) for p in group]
        gvars = set().union(*(_pattern_vars(p) for p in gparsed))
        if gvars & optional_vars:
            raise ValueError(
                "optional groups must not reference variables introduced "
                "by another optional group"
            )
        shared = _check_optional_group(gparsed, bound, gi)
        ctes.append(
            f"opt{gi} AS ({_group_sql(gparsed, _join_order(gparsed, allow_cartesian))})"
        )
        joins.append(f"LEFT JOIN opt{gi} USING ({', '.join(shared)})")
        optional_vars |= gvars - bound
        bound |= gvars
    neg_conds = []
    for mi, group in enumerate(minus or []):
        mparsed = [_parse_pattern(p) for p in group]
        mvars = set().union(*(_pattern_vars(p) for p in mparsed))
        if mvars & optional_vars:
            raise ValueError(
                "minus groups must not reference optional-introduced variables"
            )
        shared = sorted(mvars & required_vars)
        if not shared:
            raise ValueError(
                f"minus group {mi} shares no variable with the required "
                "patterns (SPARQL MINUS with disjoint domains is a no-op; "
                "the compiler rejects it as almost certainly a mistake)"
            )
        ctes.append(
            f"m{mi} AS ({_group_sql(mparsed, _join_order(mparsed, allow_cartesian))})"
        )
        cond = " AND ".join(f"m{mi}.{v} = base.{v}" for v in shared)
        neg_conds.append(f"NOT EXISTS (SELECT 1 FROM m{mi} WHERE {cond})")
    proj = ", ".join(project) if project is not None else ", ".join(sorted(bound))
    base = f"SELECT {', '.join(sorted(bound))} FROM {' '.join(joins)}"
    # WITH RECURSIVE needed when a path closure CTE is present (legal
    # in DuckDB even when some CTEs are non-recursive)
    with_kw = "WITH RECURSIVE" if path_ctes else "WITH"
    conds = values_conds + neg_conds
    if not conds:
        return (
            f"{with_kw} triples AS ({triples_sql}),\n" + ",\n".join(ctes) + "\n"
            f"SELECT {proj} FROM ({base}) base"
        )
    where = " AND ".join(conds)
    return (
        f"{with_kw} triples AS ({triples_sql}),\n" + ",\n".join(ctes) + "\n"
        f"SELECT {proj} FROM ({base}) base WHERE {where}"
    )


def bgp_ask(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    optional: list[list[tuple[str, str, str]]] | None = None,
    minus: list[list[tuple[str, str, str]]] | None = None,
) -> bool:
    """SPARQL ASK: does at least one solution exist?  Evaluates with a
    limit(1) so Spark stops at the first match instead of materializing
    the binding bag."""
    return (
        bgp_select(triples, patterns, optional=optional, minus=minus)
        .limit(1)
        .count()
        > 0
    )


def bgp_ask_df(
    triples: DataFrame, asks: dict[str, list[tuple[str, str, str]]]
) -> DataFrame:
    """Batch ASK form returning a DataFrame (ask_id, result) — one
    boolean row per named ASK, each evaluated with the same limit-1
    plan as :func:`bgp_ask` so Spark stops at the first matching
    binding instead of materializing the bag.  This is the gateable
    shape (the driver hashes DataFrames, not Python bools)."""
    out = None
    for name, patterns in asks.items():
        row = (
            bgp_select(triples, patterns)
            .limit(1)
            .agg((F.count(F.lit(1)) > 0).alias("result"))
            .select(F.lit(name).alias("ask_id"), "result")
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("empty ASK batch")
    return out


def bgp_ask_oracle_sql(
    triples_sql: str, asks: dict[str, list[tuple[str, str, str]]]
) -> str:
    """SQL mirror of :func:`bgp_ask_df`: EXISTS over the same compiled
    BGP each ask evaluates (count(*) > 0 on the full binding bag —
    equivalent to the limit-1 existence check)."""
    if not asks:
        raise ValueError("empty ASK batch")
    parts = [
        f"SELECT {_sql_quote(name)} AS ask_id, "
        f"(SELECT count(*) FROM ({bgp_oracle_sql(triples_sql, patterns)}) t) > 0 AS result"
        for name, patterns in asks.items()
    ]
    return " UNION ALL ".join(parts)
