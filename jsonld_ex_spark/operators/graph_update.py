"""SPARQL-Update-style graph mutation over the snapshot triple store —
the WRITE side of the query stack (operators/bgp.py is the read side).

The reference ecosystem treats the RDF store as updatable (SPARQL 1.1
Update: INSERT DATA / DELETE WHERE / DELETE-INSERT-WHERE); this module
expresses those forms Spark-first over the manifest-committed snapshot
table (sources/snapshot_table.py), so every mutation is an ATOMIC
snapshot commit — readers see the pre- or post-update graph, never a
torn state, and time travel keeps the pre-update snapshot readable
(the audit trail a 100 TB KG pipeline needs).

Semantics and the 100-TB shape:

* ``insert_data``       — INSERT DATA: append-commit new triples.  A
  metadata-only commit of one new data directory; the existing table
  is untouched.
* ``delete_where``      — DELETE WHERE { P }: bind P against the
  CURRENT snapshot, instantiate P with every solution (the same
  machinery as CONSTRUCT), and commit the graph minus those triples.
  The removal is ONE left-anti hash equi-join on the matching key —
  never a per-solution loop.
* ``delete_insert``     — DELETE { D } INSERT { I } WHERE { W }: one
  binding pass over W feeds both template instantiations; removal
  anti-join plus insertion union in a single overwrite commit (the
  SPARQL "modify" operation — both halves see the PRE-update graph,
  per spec).

Matching key: (subj, pred, obj) — the BGP layer binds LEXICAL forms
(its documented data model) and a CONSTRUCT-instantiated template
cannot know a bound object's IRI-ness, so a VARIABLE-object delete
template matches every term (IRI or literal, any datatype/language)
sharing the lexical triple.  EXACT-TERM deletion (round-6 verdict
item 6) is available wherever the object is stated as a ground
constant: ``delete_data`` (the spec's ground-triple DELETE DATA form)
and delete templates whose object uses the N-Triples-style constants
``"lex"^^<datatype-iri>`` / ``"lex"@lang`` match the FULL RDF term —
an identical-lexical literal under a different datatype/language
survives.  Term identity normalizes the two storage conventions RDF
1.1 makes equivalent (a plain literal IS an xsd:string literal; a
tagged literal IS rdf:langString regardless of a stored datatype).

Deletion rewrites (an overwrite commit references only the surviving
rows); at 10^12 triples you would partition the anti-join by the same
subject buckets as the sink layout so only buckets containing matches
rewrite — the subject-bucketed layout (operators/triples.py) is what
makes that pruning possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_MATCH_KEY = ["subj", "pred", "obj"]
_TRIPLE_COLS = ["subj", "pred", "obj", "obj_is_iri", "obj_dt", "obj_lang", "graph"]


def _parse_exact_object(term: str):
    """Parse an EXACT-TERM literal constant — the N-Triples forms
    ``"lex"^^<datatype-iri>`` and ``"lex"@lang`` — to (lex, norm_dt,
    lang), or return None when ``term`` is not one (plain ``"lex"``,
    ``<iri>`` and ``?var`` keep their existing meanings).  norm_dt is
    the RDF-1.1-normalized datatype: rdf:langString for tagged
    literals, the stated IRI otherwise."""
    from jsonld_ex_spark.operators.bgp import RDF_LANGSTRING

    if not (term.startswith('"') and len(term) > 2):
        return None
    if term.endswith(">") and '"^^<' in term:
        lex, _, dt = term[1:-1].rpartition('"^^<')
        if not dt:
            raise ValueError(f"bad exact-term object {term!r}")
        return (lex, dt, None)
    if not term.endswith('"') and '"@' in term:
        lex, _, lang = term[1:].rpartition('"@')
        if not lang:
            raise ValueError(f"bad exact-term object {term!r}")
        return (lex, RDF_LANGSTRING, lang)
    return None


def _norm_dt_col():
    """Term-identity datatype of a stored row (RDF 1.1): IRIs have
    none, tagged literals are rdf:langString whatever the row stores,
    plain literals are xsd:string whether the row spells it out (the
    JSON-LD pipeline does) or leaves it NULL (template-inserted
    rows) — the same normalization the read side's DATATYPE()
    annotation applies (bgp._annot_col)."""
    import pyspark.sql.functions as F

    from jsonld_ex_spark.operators.bgp import RDF_LANGSTRING, XSD_STRING

    return (
        F.when(F.col("obj_is_iri"), F.lit(None).cast("string"))
        .when(F.col("obj_lang").isNotNull(), F.lit(RDF_LANGSTRING))
        .when(F.col("obj_dt").isNotNull(), F.col("obj_dt"))
        .otherwise(F.lit(XSD_STRING))
    )


def _exact_anti_join(
    remaining: DataFrame, doomed: DataFrame, match_graph: bool = True
) -> DataFrame:
    """Remove rows whose FULL TERM IDENTITY matches ``doomed`` —
    columns (subj, pred, obj, obj_is_iri, dt_n, lang_n[, graph]), with
    dt_n the normalized datatype (NULL for IRIs), lang_n the language
    tag (NULL when none) and graph NULL for the default graph.
    ``match_graph=False`` is the triple-template legacy scope (remove
    from every graph).  One broadcast-friendly left-anti join (exact
    doomed sets are ground or template-instantiated and small; AQE
    broadcasts them)."""
    import pyspark.sql.functions as F

    cols = ["subj", "pred", "obj", "obj_is_iri", "dt_n", "lang_n"]
    if match_graph:
        cols.append("graph")
    d = doomed.select(*(F.col(c).alias(f"__d_{c}") for c in cols))
    cond = (
        (remaining["subj"] == d["__d_subj"])
        & (remaining["pred"] == d["__d_pred"])
        & (remaining["obj"] == d["__d_obj"])
        & (remaining["obj_is_iri"] == d["__d_obj_is_iri"])
        & _norm_dt_col().eqNullSafe(d["__d_dt_n"])
        & remaining["obj_lang"].eqNullSafe(d["__d_lang_n"])
    )
    if match_graph:
        cond = cond & remaining["graph"].eqNullSafe(d["__d_graph"])
    return remaining.join(d, cond, "left_anti")


def delete_data(
    spark: SparkSession, table_dir: str, quads: list[tuple[str, ...]]
) -> int:
    """SPARQL ``DELETE DATA { ... }`` — the spec's GROUND-TRIPLE form:
    ``quads`` are (s, p, o) triples or (s, p, o, g) quads of CONSTANT
    terms only (no variables): s/p/g are ``<iri>``, o is ``<iri>``,
    ``"lex"`` (plain = xsd:string), ``"lex"^^<dt>`` or ``"lex"@lang``.
    Matching is EXACT-TERM: an identical-lexical literal under a
    different datatype or language tag survives.  Per spec, a triple
    names the DEFAULT graph; a quad names its graph.  One validated
    overwrite commit; returns the new snapshot id."""
    import pyspark.sql.functions as F

    from jsonld_ex_spark.operators.bgp import XSD_STRING, _parse_term
    from jsonld_ex_spark.sources.snapshot_table import write_triples_snapshot

    if not quads:
        raise ValueError("DELETE DATA with no triples is a no-op")
    rows = []
    for q in quads:
        if len(q) not in (3, 4):
            raise ValueError(f"DELETE DATA takes triples or quads, got {q!r}")
        s, p, o = q[0], q[1], q[2]
        g = q[3] if len(q) == 4 else None
        skind, sval = _parse_term(s)
        pkind, pval = _parse_term(p)
        if skind != "iri" or pkind != "iri":
            raise ValueError(
                f"DELETE DATA terms must be ground ({s!r} {p!r}); use "
                "delete_where for pattern deletion"
            )
        if g is not None:
            gkind, gval = _parse_term(g)
            if gkind != "iri":
                raise ValueError(f"DELETE DATA graph term {g!r} must be a <iri>")
        else:
            gval = None
        exact = _parse_exact_object(o)
        if exact is not None:
            lex, dt_n, lang = exact
            rows.append((sval, pval, lex, False, dt_n, lang, gval))
            continue
        okind, oval = _parse_term(o)
        if okind == "iri":
            rows.append((sval, pval, oval, True, None, None, gval))
        elif okind == "lit":
            rows.append((sval, pval, oval, False, XSD_STRING, None, gval))
        else:
            raise ValueError(f"DELETE DATA object {o!r} must be ground")
    doomed = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "dt_n string, lang_n string, graph string",
    )
    parent, cur = _pinned_current(spark, table_dir)
    return write_triples_snapshot(
        _exact_anti_join(cur, doomed).select(*_TRIPLE_COLS),
        table_dir, operation="overwrite", require_parent=parent,
    )


def _check_update_patterns(patterns, what: str) -> None:
    from jsonld_ex_spark.operators.bgp import _parse_term

    for p in patterns:
        if len(p) not in (3, 4):
            raise ValueError(
                f"{what} patterns are triples or (s, p, o, graph) quads, "
                f"got {p!r}"
            )
        if len(p) == 4 and _parse_term(p[3])[0] == "lit":
            raise ValueError(
                f"{what} graph term {p[3]!r} must be a <graph-iri> or a "
                "variable"
            )


def _scope_to_graph(
    patterns: list[tuple[str, ...]], graph_iri: str
) -> list[tuple[str, ...]]:
    """SPARQL ``WITH <g>``: every TRIPLE pattern is scoped to graph g;
    explicit quads keep their own graph term (the spec's GRAPH-clause
    override)."""
    g = f"<{graph_iri}>"
    return [p if len(p) == 4 else (*p, g) for p in patterns]


def insert_data(triples: DataFrame, table_dir: str) -> int:
    """SPARQL INSERT DATA: atomically append ``triples`` (standard
    triple schema) as a new snapshot.  Returns the snapshot id.

    This is the O(1)-metadata append — the existing table is neither
    read nor rewritten, so rows already present are NOT deduplicated
    (dedup requires a full-scan anti-join; run dedup_triples before
    calling, or use delete_insert whose insertion dedupes against the
    surviving graph)."""
    from jsonld_ex_spark.sources.snapshot_table import write_triples_snapshot

    return write_triples_snapshot(
        triples.select(*_TRIPLE_COLS), table_dir, operation="append"
    )


def delete_where(
    spark: SparkSession,
    table_dir: str,
    patterns: list[tuple[str, ...]],
    with_graph: str | None = None,
) -> int:
    """SPARQL DELETE WHERE { P }: P is both the match and the delete
    template.  Commits the surviving graph as an overwrite snapshot
    and returns its id (the pre-update snapshot stays readable)."""
    return delete_insert(
        spark, table_dir, patterns, [], patterns, with_graph=with_graph
    )


def delete_insert(
    spark: SparkSession,
    table_dir: str,
    delete_template: list[tuple[str, ...]],
    insert_template: list[tuple[str, ...]],
    where: list[tuple[str, ...]],
    filters: list[tuple[str, str, object]] | None = None,
    paths: list[tuple[str, object, str]] | None = None,
    exists: list[list[tuple[str, ...]]] | None = None,
    not_exists: list[list[tuple[str, ...]]] | None = None,
    with_graph: str | None = None,
) -> int:
    """SPARQL DELETE/INSERT WHERE (the "modify" operation): ONE binding
    pass over ``where`` against the CURRENT snapshot (the solution
    relation is localCheckpointed and instantiates BOTH templates);
    both see the PRE-update graph (per spec — the delete cannot hide
    bindings from the insert).  The whole mutation is ONE atomic
    overwrite commit VALIDATED against the snapshot it read
    (require_parent): a concurrent commit between read and write
    raises SnapshotConflictError instead of silently clobbering it
    (Iceberg's conflict model) — re-read and re-run the update.

    Inserted triples carry null datatype/language; each insert-template
    OBJECT must state its term kind (``<iri>`` or ``"literal"``) or be
    a variable — and a bare-variable object is REJECTED, because the
    binding relation carries lexical forms only: the instantiated term
    kind would be a guess, persisted forever (acceptable for transient
    CONSTRUCT output, not for the write side).  Delete templates may
    use variable objects freely (the matching key ignores term kind).

    ``filters``/``paths``/``exists``/``not_exists`` refine the WHERE
    clause with the full read-side surface (bgp_select semantics) —
    DELETE WHERE with a FILTER or an EXISTS guard is the everyday
    SPARQL Update shape ("remove mentions from late turns that have no
    tool attachment").

    GRAPH SCOPE: templates and WHERE patterns may be ``(s, p, o, g)``
    QUADS (g a ``<graph-iri>`` constant or a variable bound by a quad
    WHERE pattern).  A quad DELETE template removes the lexical triple
    from THAT named graph only (matching key (subj, pred, obj, graph));
    a TRIPLE delete template keeps the documented legacy behavior —
    the lexical triple is removed from every graph.  A quad INSERT
    template inserts into its named graph; a triple template inserts
    into the default graph (graph NULL) — insertion dedup is
    graph-exact (null-safe), so inserting a triple into a second graph
    is never suppressed by its presence in the first.  ``with_graph``
    is SPARQL's ``WITH <g>``: every TRIPLE pattern in both templates
    and the WHERE clause is scoped to that named graph (explicit quads
    keep their own graph term, per spec)."""
    from jsonld_ex_spark.operators.bgp import (
        _parse_term,
        bgp_construct,
        bgp_select,
    )
    from jsonld_ex_spark.sources.snapshot_table import write_triples_snapshot

    if not delete_template and not insert_template:
        raise ValueError("delete_insert with neither template is a no-op")
    _check_update_patterns(delete_template, "delete_template")
    _check_update_patterns(insert_template, "insert_template")
    _check_update_patterns(where, "where")
    if with_graph is not None:
        delete_template = _scope_to_graph(delete_template, with_graph)
        insert_template = _scope_to_graph(insert_template, with_graph)
        where = _scope_to_graph(where, with_graph)
    ins_exact = [t for t in insert_template if _parse_exact_object(t[2]) is not None]
    insert_template = [t for t in insert_template if _parse_exact_object(t[2]) is None]
    for tpl in insert_template:
        if _parse_term(tpl[2])[0] == "var":
            raise ValueError(
                f"insert template object {tpl[2]!r} is a bare variable: the "
                "binding relation carries lexical forms only, so the "
                "persisted term kind would be a guess — state it with "
                "<...> / \"...\" in the template"
            )
    parent, current = _pinned_current(spark, table_dir)
    bindings = bgp_select(
        current, where, filters=filters, paths=paths,
        exists=exists, not_exists=not_exists,
    ).localCheckpoint(eager=False)
    import pyspark.sql.functions as F

    remaining = current
    del_exact = [t for t in delete_template if _parse_exact_object(t[2]) is not None]
    delete_template = [t for t in delete_template if _parse_exact_object(t[2]) is None]
    for tpl in del_exact:
        lex, dt_n, lang = _parse_exact_object(tpl[2])
        src = bindings
        cols = []
        for term, name in ((tpl[0], "subj"), (tpl[1], "pred")):
            kind, val = _parse_term(term)
            if kind == "var":
                if val not in bindings.columns:
                    raise ValueError(f"template variable ?{val} not bound by WHERE")
                src = src.filter(F.col(val).isNotNull())
                cols.append(F.col(val).alias(name))
            elif kind == "iri":
                cols.append(F.lit(val).alias(name))
            else:
                raise ValueError("literal subjects/predicates are not valid RDF")
        cols += [
            F.lit(lex).alias("obj"),
            F.lit(False).alias("obj_is_iri"),
            F.lit(dt_n).alias("dt_n"),
            F.lit(lang).cast("string").alias("lang_n"),
        ]
        if len(tpl) == 4:
            gkind, gval = _parse_term(tpl[3])
            if gkind == "var":
                if gval not in bindings.columns:
                    raise ValueError(f"template variable ?{gval} not bound by WHERE")
                src = src.filter(F.col(gval).isNotNull())
                cols.append(F.col(gval).alias("graph"))
            else:
                cols.append(F.lit(gval).alias("graph"))
        # EXACT-TERM delete template: matches the full RDF term, so an
        # identical-lexical literal under another datatype/lang
        # survives; triple templates keep the module's every-graph
        # scope, quads are graph-exact — same rule as lexical templates
        doomed_x = src.select(*cols).dropDuplicates()
        remaining = _exact_anti_join(remaining, doomed_x, match_graph=len(tpl) == 4)
    del_triples = [t for t in delete_template if len(t) == 3]
    del_quads = [t for t in delete_template if len(t) == 4]
    if del_triples:
        # bindings= overrides the pattern args in bgp_construct: the
        # shared relation instantiates every template (one WHERE pass)
        doomed = bgp_construct(
            current, where, del_triples, distinct=True, bindings=bindings
        ).select(*_MATCH_KEY)
        remaining = remaining.join(doomed, on=_MATCH_KEY, how="left_anti")
    if del_quads:
        # graph-exact removal; instantiated quad graphs are never NULL
        # (constants are IRIs, ?g binds named graphs only), so the
        # equi-join correctly leaves default-graph rows untouched
        doomed_q = bgp_construct(
            current, where, del_quads, distinct=True, bindings=bindings
        ).select(*_MATCH_KEY, "graph")
        remaining = remaining.join(
            doomed_q, on=[*_MATCH_KEY, "graph"], how="left_anti"
        )
    if insert_template:
        inserted = bgp_construct(
            current, where, insert_template, distinct=True, bindings=bindings
        )
        # an RDF dataset is a set of graphs, each a set of triples: do
        # not duplicate triples the TARGET graph already holds — the
        # dedup key is (subj, pred, obj, graph), null-safe on graph so
        # default-graph inserts (graph NULL) dedupe too
        surv = remaining.select(
            *(F.col(c).alias(f"__r_{c}") for c in (*_MATCH_KEY, "graph"))
        )
        cond = (
            (inserted["subj"] == surv["__r_subj"])
            & (inserted["pred"] == surv["__r_pred"])
            & (inserted["obj"] == surv["__r_obj"])
            & inserted["graph"].eqNullSafe(surv["__r_graph"])
        )
        inserted = inserted.join(surv, cond, "left_anti").select(*_TRIPLE_COLS)
        remaining = remaining.select(*_TRIPLE_COLS).unionByName(inserted)
    if ins_exact:
        from jsonld_ex_spark.operators.bgp import RDF_LANGSTRING

        insx = None
        for tpl in ins_exact:
            lex, dt_n, lang = _parse_exact_object(tpl[2])
            src = bindings
            cols = []
            for term, name in ((tpl[0], "subj"), (tpl[1], "pred")):
                kind, val = _parse_term(term)
                if kind == "var":
                    if val not in bindings.columns:
                        raise ValueError(f"template variable ?{val} not bound by WHERE")
                    src = src.filter(F.col(val).isNotNull())
                    cols.append(F.col(val).alias(name))
                elif kind == "iri":
                    cols.append(F.lit(val).alias(name))
                else:
                    raise ValueError("literal subjects/predicates are not valid RDF")
            # EXACT-TERM insert template: the persisted row carries the
            # stated datatype / language (tagged literals store
            # rdf:langString, the pipeline's own convention)
            cols += [
                F.lit(lex).alias("obj"),
                F.lit(False).alias("obj_is_iri"),
                F.lit(dt_n if lang is None else RDF_LANGSTRING).alias("obj_dt"),
                F.lit(lang).cast("string").alias("obj_lang"),
            ]
            if len(tpl) == 4:
                gkind, gval = _parse_term(tpl[3])
                if gkind == "var":
                    if gval not in bindings.columns:
                        raise ValueError(f"template variable ?{gval} not bound by WHERE")
                    src = src.filter(F.col(gval).isNotNull())
                    cols.append(F.col(gval).alias("graph"))
                else:
                    cols.append(F.lit(gval).alias("graph"))
            else:
                cols.append(F.lit(None).cast("string").alias("graph"))
            row = src.select(*cols).dropDuplicates()
            insx = row if insx is None else insx.unionByName(row)
        # term-exact, graph-exact set dedup against the surviving graph
        r = remaining.select(
            F.col("subj").alias("__r_subj"), F.col("pred").alias("__r_pred"),
            F.col("obj").alias("__r_obj"), F.col("obj_is_iri").alias("__r_iri"),
            _norm_dt_col().alias("__r_dt"), F.col("obj_lang").alias("__r_lang"),
            F.col("graph").alias("__r_graph"),
        )
        cond = (
            (insx["subj"] == r["__r_subj"]) & (insx["pred"] == r["__r_pred"])
            & (insx["obj"] == r["__r_obj"]) & (insx["obj_is_iri"] == r["__r_iri"])
            & _norm_dt_col().eqNullSafe(r["__r_dt"])
            & insx["obj_lang"].eqNullSafe(r["__r_lang"])
            & insx["graph"].eqNullSafe(r["__r_graph"])
        )
        insx = insx.join(r, cond, "left_anti").select(*_TRIPLE_COLS)
        remaining = remaining.select(*_TRIPLE_COLS).unionByName(insx)
    return write_triples_snapshot(
        remaining, table_dir, operation="overwrite", require_parent=parent
    )


def _pinned_current(spark: SparkSession, table_dir: str):
    """(parent_snapshot_id, triples-of-that-snapshot) — the
    read-modify-write prologue shared by every validated mutation.

    The parent we read from, validate against, and commit onto must be
    ONE snapshot id, derived exactly as commit_snapshot derives it
    (max of CURRENT and the highest CLAIMED manifest — a crashed
    writer's claimed-but-unswapped head is a valid parent; deriving
    from CURRENT alone would livelock every validated commit behind
    such an orphan) and the data read PINNED to it: re-resolving
    CURRENT at read time could observe a different snapshot than the
    one validation certifies (round-5 review)."""
    from jsonld_ex_spark.sources.snapshot_table import (
        _max_claimed_id,
        current_snapshot_id,
        read_snapshot,
    )

    parent = max(current_snapshot_id(table_dir), _max_claimed_id(table_dir))
    cur = read_snapshot(spark, table_dir, snapshot_id=parent).select(*_TRIPLE_COLS)
    return parent, cur


def _graph_cond(graph_iri: str | None):
    import pyspark.sql.functions as F

    # None = the default graph (NULL column), per SPARQL's DEFAULT
    return F.col("graph").eqNullSafe(F.lit(graph_iri))


def clear_graph(
    spark: SparkSession, table_dir: str, graph_iri: str | None
) -> int:
    """SPARQL ``CLEAR GRAPH <g>`` / ``CLEAR DEFAULT`` (g=None): remove
    every triple in that graph, as one validated overwrite commit.
    This store's empty graph and absent graph are indistinguishable
    (no graph registry), so CLEAR == DROP — both are provided."""
    from jsonld_ex_spark.sources.snapshot_table import write_triples_snapshot

    parent, cur = _pinned_current(spark, table_dir)
    return write_triples_snapshot(
        cur.filter(~_graph_cond(graph_iri)),
        table_dir, operation="overwrite", require_parent=parent,
    )


drop_graph = clear_graph  # SPARQL DROP: identical without a graph registry


def _graph_transfer(
    spark: SparkSession,
    table_dir: str,
    src_iri: str | None,
    dst_iri: str | None,
    op: str,
) -> int:
    """SPARQL Update graph management — ADD/COPY/MOVE ``src TO dst``
    (None = DEFAULT) in one validated overwrite commit:

    * ADD:  dst ∪= src (set union — already-present triples not duplicated)
    * COPY: dst := src (dst's prior content is dropped)
    * MOVE: dst := src, then src is cleared

    Per spec, src TO src is a no-op for all three (MOVE must NOT clear
    src in that case).  All are metadata-light single-pass plans: one
    scan, one union, one overwrite commit — no joins except ADD's
    set-dedup anti-join on the (subj, pred, obj) matching key."""
    import pyspark.sql.functions as F

    from jsonld_ex_spark.sources.snapshot_table import write_triples_snapshot

    parent, cur = _pinned_current(spark, table_dir)
    if src_iri == dst_iri:
        # spec no-op: nothing committed — report the snapshot readers
        # actually see, not the (possibly higher) claimed-head parent
        from jsonld_ex_spark.sources.snapshot_table import current_snapshot_id

        return current_snapshot_id(table_dir)
    moved = cur.filter(_graph_cond(src_iri)).withColumn(
        "graph", F.lit(dst_iri).cast("string")
    )
    if op == "add":
        # dedup against dst's existing content (a graph is a set); the
        # lexical matching key, same granularity as delete_insert
        existing_dst = cur.filter(_graph_cond(dst_iri)).select(*_MATCH_KEY)
        moved = moved.join(existing_dst, on=_MATCH_KEY, how="left_anti")
        keep = cur
    elif op == "copy":
        keep = cur.filter(~_graph_cond(dst_iri))
    elif op == "move":
        keep = cur.filter(~_graph_cond(dst_iri) & ~_graph_cond(src_iri))
    else:
        raise ValueError(f"unknown graph transfer op {op!r}")
    return write_triples_snapshot(
        keep.select(*_TRIPLE_COLS).unionByName(moved.select(*_TRIPLE_COLS)),
        table_dir, operation="overwrite", require_parent=parent,
    )


def add_graph(spark, table_dir, src_iri, dst_iri) -> int:
    """SPARQL ``ADD <src> TO <dst>`` (None = DEFAULT)."""
    return _graph_transfer(spark, table_dir, src_iri, dst_iri, "add")


def copy_graph(spark, table_dir, src_iri, dst_iri) -> int:
    """SPARQL ``COPY <src> TO <dst>`` (None = DEFAULT)."""
    return _graph_transfer(spark, table_dir, src_iri, dst_iri, "copy")


def move_graph(spark, table_dir, src_iri, dst_iri) -> int:
    """SPARQL ``MOVE <src> TO <dst>`` (None = DEFAULT)."""
    return _graph_transfer(spark, table_dir, src_iri, dst_iri, "move")
