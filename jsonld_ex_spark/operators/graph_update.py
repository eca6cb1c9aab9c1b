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
cannot know a bound object's IRI-ness, so deletion matches every term
(IRI or literal, any datatype/language) sharing the lexical triple;
exact-term deletion of typed literals is out of scope, like
typed-literal matching in the read-side patterns.

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


def _current_triples(spark: SparkSession, table_dir: str) -> DataFrame:
    from jsonld_ex_spark.sources.snapshot_table import read_snapshot

    return read_snapshot(spark, table_dir).select(*_TRIPLE_COLS)


def _check_update_patterns(patterns, what: str) -> None:
    for p in patterns:
        if len(p) != 3:
            raise ValueError(
                f"{what} takes TRIPLE patterns only, got {p!r}: graph-scoped "
                "update (quads) is out of scope — the matching key is the "
                "lexical (subj, pred, obj) triple across all graphs"
            )


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
    spark: SparkSession, table_dir: str, patterns: list[tuple[str, ...]]
) -> int:
    """SPARQL DELETE WHERE { P }: P is both the match and the delete
    template.  Commits the surviving graph as an overwrite snapshot
    and returns its id (the pre-update snapshot stays readable)."""
    return delete_insert(spark, table_dir, patterns, [], patterns)


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
    tool attachment")."""
    from jsonld_ex_spark.operators.bgp import (
        _parse_term,
        bgp_construct,
        bgp_select,
    )
    from jsonld_ex_spark.sources.snapshot_table import (
        _max_claimed_id,
        current_snapshot_id,
        read_snapshot,
        write_triples_snapshot,
    )

    if not delete_template and not insert_template:
        raise ValueError("delete_insert with neither template is a no-op")
    _check_update_patterns(delete_template, "delete_template")
    _check_update_patterns(insert_template, "insert_template")
    _check_update_patterns(where, "where")
    for _s, _p, o in insert_template:
        if _parse_term(o)[0] == "var":
            raise ValueError(
                f"insert template object {o!r} is a bare variable: the "
                "binding relation carries lexical forms only, so the "
                "persisted term kind would be a guess — state it with "
                "<...> / \"...\" in the template"
            )
    # the parent we read from, validate against, and commit onto must
    # be ONE snapshot id, derived exactly as commit_snapshot derives it
    # (max of CURRENT and the highest CLAIMED manifest — a crashed
    # writer's claimed-but-unswapped head is a valid parent; deriving
    # from CURRENT alone would livelock every validated commit behind
    # such an orphan) and the data read PINNED to it (re-resolving
    # CURRENT at read time could observe a different snapshot than the
    # one validation certifies — round-5 review)
    parent = max(current_snapshot_id(table_dir), _max_claimed_id(table_dir))
    current = read_snapshot(spark, table_dir, snapshot_id=parent).select(*_TRIPLE_COLS)
    bindings = bgp_select(
        current, where, filters=filters, paths=paths,
        exists=exists, not_exists=not_exists,
    ).localCheckpoint(eager=False)
    remaining = current
    if delete_template:
        # bindings= overrides the pattern args in bgp_construct: the
        # shared relation instantiates both templates (one WHERE pass)
        doomed = bgp_construct(
            current, where, delete_template, distinct=True, bindings=bindings
        ).select(*_MATCH_KEY)
        remaining = current.join(doomed, on=_MATCH_KEY, how="left_anti")
    if insert_template:
        inserted = bgp_construct(
            current, where, insert_template, distinct=True, bindings=bindings
        )
        # an RDF graph is a set: do not duplicate triples the surviving
        # graph already holds (matching-key granularity, as above)
        inserted = inserted.join(
            remaining.select(*_MATCH_KEY), on=_MATCH_KEY, how="left_anti"
        ).select(*_TRIPLE_COLS)
        remaining = remaining.select(*_TRIPLE_COLS).unionByName(inserted)
    return write_triples_snapshot(
        remaining, table_dir, operation="overwrite", require_parent=parent
    )
