"""Unit tests for the facade's per-scan predicate extractor
(lake/scanscope.py) — pure string-level, no SparkSession.

The safety property under test throughout: a conjunct is attributed to
a view only when it provably scopes that view's single scan; everything
ambiguous (shared bare columns, derived tables, outer-join null sides,
multi-reference views, subqueries) must yield NO predicate rather than
a wrong one — a wrong predicate under-estimates a scan and could
broadcast something huge at 100 TB.
"""

from __future__ import annotations

from demo_iceberg_permanent_delete_spark.lake.scanscope import (
    extract_scan_predicates,
)

COLS = {
    "default__fat": {"day", "amount", "k", "name"},
    "default__dim": {"k", "label"},
}


def _x(sql, occ=None):
    return extract_scan_predicates(
        sql, COLS, occ or {"default__fat": 1, "default__dim": 1}
    )


def test_single_table_conjunction():
    out = _x("SELECT * FROM default__fat WHERE day = '2024-01-02' AND amount > 5")
    assert out == {"default__fat": "day = '2024-01-02' AND amount > 5"}


def test_qualified_split_across_join_sides():
    out = _x(
        "SELECT f.k FROM default__fat f JOIN default__dim d ON f.k = d.k "
        "WHERE f.day = 'a' AND d.label = 'x' AND f.amount BETWEEN 1 AND 9"
    )
    assert out["default__fat"] == "day = 'a' AND amount BETWEEN 1 AND 9"
    assert out["default__dim"] == "label = 'x'"


def test_bare_column_shared_by_both_sides_is_dropped():
    out = _x(
        "SELECT * FROM default__fat f JOIN default__dim d ON f.k = d.k "
        "WHERE day = 'a' AND k = 5"
    )
    # k exists in both views — unattributable; day is fat-only
    assert out == {"default__fat": "day = 'a'"}


def test_left_join_null_side_gets_nothing():
    out = _x(
        "SELECT * FROM default__fat f LEFT JOIN default__dim d ON f.k = d.k "
        "WHERE d.label IS NULL AND f.day = 'a'"
    )
    # IS NULL on the null-producing side matches null-EXTENDED rows; it
    # must never scope dim's scan estimate
    assert out == {"default__fat": "day = 'a'"}


def test_right_and_full_join_scopes_refused():
    assert (
        _x(
            "SELECT * FROM default__fat f RIGHT JOIN default__dim d "
            "ON f.k = d.k WHERE f.day = 'a'"
        )
        == {}
    )
    assert (
        _x(
            "SELECT * FROM default__fat f FULL OUTER JOIN default__dim d "
            "ON f.k = d.k WHERE f.day = 'a'"
        )
        == {}
    )


def test_multi_reference_view_gets_nothing():
    out = _x(
        "SELECT * FROM default__fat a JOIN default__fat b ON a.k = b.k "
        "WHERE a.day = 'x'",
        occ={"default__fat": 2},
    )
    assert out == {}
    out = _x(
        "SELECT k FROM default__fat WHERE day = 'a' "
        "UNION ALL SELECT k FROM default__fat WHERE day = 'b'",
        occ={"default__fat": 2},
    )
    assert out == {}


def test_subquery_conjunct_skipped_but_siblings_kept():
    out = _x(
        "SELECT * FROM default__fat WHERE "
        "k IN (SELECT k FROM default__dim) AND day = 'a'",
        occ={"default__fat": 1, "default__dim": 1},
    )
    assert out == {"default__fat": "day = 'a'"}


def test_cte_inner_scope_extracts_outer_bare_columns_refused():
    out = _x(
        "WITH c AS (SELECT k FROM default__fat WHERE day = 'a') "
        "SELECT * FROM c JOIN default__dim d ON c.k = d.k "
        "WHERE d.label = 'z' AND k = 1"
    )
    # inner scope scopes fat; outer scope has an unknown item (c) so the
    # bare k is refused while the d-qualified conjunct is kept
    assert out == {"default__fat": "day = 'a'", "default__dim": "label = 'z'"}


def test_string_literals_survive_and_never_split():
    out = _x(
        "SELECT * FROM default__fat WHERE "
        "name = 'a.b AND c''s' AND day = 'T 2024'"
    )
    assert out == {"default__fat": "name = 'a.b AND c''s' AND day = 'T 2024'"}


def test_in_list_or_group_and_function_args():
    out = _x(
        "SELECT * FROM default__fat WHERE day IN ('a', 'b') "
        "AND (amount > 2 OR amount < 0) AND length(name) > 3"
    )
    assert out == {
        "default__fat": "day IN ('a', 'b') AND (amount > 2 OR amount < 0)"
        " AND length(name) > 3"
    }


def test_comma_join_and_join_condition_in_where():
    out = _x(
        "SELECT * FROM default__fat f, default__dim d "
        "WHERE f.k = d.k AND f.day = 'a'"
    )
    # the cross-table equality conjunct is dropped; the single-side one kept
    assert out == {"default__fat": "day = 'a'"}


def test_unknown_qualifier_refused():
    out = _x("SELECT * FROM default__fat f WHERE z.day = 'a' AND f.amount > 1")
    assert out == {"default__fat": "amount > 1"}


def test_no_where_no_predicates():
    assert _x("SELECT k FROM default__fat") == {}


def test_top_level_or_never_splits_into_false_conjuncts():
    """Review finding (round 5): `a AND b OR c` is `(a AND b) OR c` —
    neither a nor b is required, so extracting `a` as a filter would
    under-estimate the scan (the broadcast-OOM hazard). A top-level OR
    makes the whole WHERE one unit: attributable only when it scopes a
    single view."""
    out = _x(
        "SELECT * FROM default__fat f JOIN default__dim d ON f.k = d.k "
        "WHERE f.name = 'x' AND f.day = 'd3' OR d.label = 'z'"
    )
    assert out == {}  # spans two views → nothing extractable
    # single-view disjunction still extracts as a whole
    out = _x(
        "SELECT * FROM default__fat "
        "WHERE name = 'x' AND day = 'd3' OR amount > 9"
    )
    assert out == {
        "default__fat": "name = 'x' AND day = 'd3' OR amount > 9"
    }


# ---------------------------------------------------------------- property
def test_extracted_predicate_is_implied_by_where():
    """THE soundness property (hypothesis-driven): whatever the extractor
    returns for a single-table statement must be IMPLIED by the full
    WHERE under three-valued logic — W true ⇒ P true — because file
    pruning by P keeps every file that might contain a P-true row, so
    implication guarantees no W-matching row's file is pruned. Checked
    against DuckDB over a null-bearing value grid for hundreds of
    generated AND/OR/NOT/BETWEEN/IN/IS NULL shapes (this is the property
    the round-5 top-level-OR bug violated)."""
    import duckdb
    from hypothesis import assume, given, settings, strategies as st

    leaves = st.sampled_from(
        [
            "a > 3",
            "a < 7",
            "a = 5",
            "b = 'x'",
            "b = 'y AND z'",
            "c BETWEEN 2 AND 5",
            "a IN (1, 2, 3)",
            "b IS NULL",
            "b IS NOT NULL",
            "c >= 4",
            "length(b) > 1",
        ]
    )

    def combine(children):
        a, b = children
        return st.sampled_from(
            [
                f"{a} AND {b}",
                f"{a} OR {b}",
                f"({a} AND {b})",
                f"({a} OR {b})",
                f"NOT ({a})",
                f"{a} AND NOT ({b})",
            ]
        )

    exprs = st.recursive(
        leaves, lambda e: st.tuples(e, e).flatmap(combine), max_leaves=6
    )

    def fresh_con():
        c = duckdb.connect()
        c.execute(
            "CREATE TABLE t AS SELECT * FROM ("
            "SELECT unnest([0,1,2,3,4,5,6,7,8,NULL]) AS a) "
            "CROSS JOIN (SELECT unnest(['x','y','y AND z','',NULL]) AS b) "
            "CROSS JOIN (SELECT unnest([1,3,5,7,NULL]) AS c)"
        )
        return c

    state = {"con": fresh_con()}

    @settings(max_examples=300, deadline=None)
    @given(where=exprs)
    def prop(where):
        out = extract_scan_predicates(
            f"SELECT * FROM default__t WHERE {where}",
            {"default__t": {"a", "b", "c"}},
            {"default__t": 1},
        )
        if not out:
            return
        pred = out["default__t"]
        try:
            violated = state["con"].execute(
                f"SELECT count(*) FROM t WHERE ({where}) "
                f"AND NOT COALESCE(({pred}), FALSE)"
            ).fetchone()[0]
        except duckdb.InternalException:
            # duckdb 1.0.0 optimizer bug on duplicated BETWEEN disjuncts;
            # the crash also poisons the connection — rebuild and skip
            state["con"] = fresh_con()
            assume(False)
        assert violated == 0, (where, pred)

    prop()


# ------------------------------------------------ inner-join ON conjuncts
def test_inner_join_on_literal_conjunct_extracted():
    # an INNER join's ON conjuncts are WHERE-equivalent: the literal leg
    # scopes dim's scan, the two-sided equi leg attributes to nobody
    out = _x(
        "SELECT f.k FROM default__fat f JOIN default__dim d "
        "ON f.k = d.k AND d.label = 'x' WHERE f.day = 'a'"
    )
    assert out["default__dim"] == "label = 'x'"
    assert out["default__fat"] == "day = 'a'"


def test_inner_join_on_combines_with_where_conjuncts():
    out = _x(
        "SELECT * FROM default__fat f INNER JOIN default__dim d "
        "ON f.k = d.k AND f.day = '2024-01-02' "
        "WHERE f.amount > 5"
    )
    assert out["default__fat"] == "day = '2024-01-02' AND amount > 5"


def test_left_join_on_conjunct_refused():
    # a LEFT join's ON condition does NOT filter the preserved side, and
    # the null side is refused wholesale
    out = _x(
        "SELECT * FROM default__fat f LEFT JOIN default__dim d "
        "ON f.k = d.k AND d.label = 'x' AND f.day = 'a'"
    )
    assert out == {}


def test_semi_and_anti_join_on_conjuncts_refused():
    # ANTI join ON conjuncts EXCLUDE matches — treating one as a scan
    # filter would be wrong, not just unsound-estimate; SEMI is refused
    # for symmetry (its ON is an EXISTS condition, not a scan filter)
    for kind in ("LEFT SEMI", "LEFT ANTI", "SEMI", "ANTI"):
        out = _x(
            f"SELECT f.k FROM default__fat f {kind} JOIN default__dim d "
            "ON f.k = d.k AND f.day = 'a'"
        )
        assert "default__fat" not in out, kind


def test_on_conjunct_with_subquery_skipped():
    out = _x(
        "SELECT f.k FROM default__fat f JOIN default__dim d "
        "ON f.k = d.k AND d.k IN (SELECT k FROM default__dim) "
        "WHERE f.day = 'a'",
        occ={"default__fat": 1, "default__dim": 2},
    )
    # dim referenced twice → nothing for dim either way; fat keeps WHERE
    assert out == {"default__fat": "day = 'a'"}


def test_inner_on_with_derived_right_side():
    # the derived side is unknown: bare columns refuse, but a qualified
    # literal conjunct on the known side still extracts (inner ON is
    # WHERE-equivalent regardless of what the other side is)
    out = _x(
        "SELECT f.k FROM default__fat f JOIN (SELECT 1 AS k) x "
        "ON f.k = x.k AND f.day = 'a'"
    )
    assert out.get("default__fat") == "day = 'a'"


def test_inner_on_parenthesized_condition_conservative():
    # a fully parenthesized ON body is one span; mixed owners → dropped
    out = _x(
        "SELECT f.k FROM default__fat f JOIN default__dim d "
        "ON (f.k = d.k AND d.label = 'x')"
    )
    assert out == {}


def test_inner_on_extraction_preserves_join_results_property():
    """Hypothesis + DuckDB differential for the ON path: replacing each
    view's scan with (SELECT * FROM view WHERE extracted-P) must leave an
    inner join's result multiset IDENTICAL — the exact substitution the
    facade's pruned registration performs. Covers random AND/OR/NOT
    trees mixing both sides' columns in ON position, null-bearing
    grids."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    leaves = st.sampled_from(
        [
            "f.k = d.k",
            "f.k > 2",
            "d.a > 3",
            "d.a = 5",
            "d.b = 'x'",
            "d.c BETWEEN 2 AND 5",
            "d.b IS NULL",
            "d.b IS NOT NULL",
            "d.a IN (1, 2, 3)",
        ]
    )

    def combine(children):
        a, b = children
        return st.sampled_from(
            [
                f"{a} AND {b}",
                f"{a} OR {b}",
                f"{a} AND NOT ({b})",
                f"({a} OR {b}) AND {a}",
            ]
        )

    exprs = st.recursive(
        leaves, lambda e: st.tuples(e, e).flatmap(combine), max_leaves=5
    )

    def fresh_con():
        c = duckdb.connect()
        c.execute(
            "CREATE TABLE default__f AS "
            "SELECT unnest([0,1,2,3,4,5,NULL]) AS k"
        )
        c.execute(
            "CREATE TABLE default__d AS SELECT * FROM ("
            "SELECT unnest([0,1,2,3,4,5,6,NULL]) AS k) "
            "CROSS JOIN (SELECT unnest([1,3,5,NULL]) AS a) "
            "CROSS JOIN (SELECT unnest(['x','y',NULL]) AS b) "
            "CROSS JOIN (SELECT unnest([2,4,NULL]) AS c)"
        )
        return c

    state = {"con": fresh_con()}
    cols = {"default__f": {"k"}, "default__d": {"k", "a", "b", "c"}}

    @settings(max_examples=200, deadline=None)
    @given(on=exprs)
    def prop(on):
        from hypothesis import assume

        sql = (
            "SELECT f.k, d.a, d.b, d.c FROM default__f f "
            f"JOIN default__d d ON {on}"
        )
        out = extract_scan_predicates(
            sql, cols, {"default__f": 1, "default__d": 1}
        )
        if not out:
            return
        pruned = sql
        for view, pred in out.items():
            pruned = pruned.replace(
                view, f"(SELECT * FROM {view} WHERE {pred})", 1
            )
        try:
            want = sorted(
                map(tuple, state["con"].execute(sql).fetchall()), key=repr
            )
            got = sorted(
                map(tuple, state["con"].execute(pruned).fetchall()), key=repr
            )
        except duckdb.InternalException:
            # duckdb 1.0.0 optimizer bug on duplicated BETWEEN disjuncts
            # (same skip as the WHERE property test); the crash poisons
            # the connection — rebuild and discard the example
            state["con"] = fresh_con()
            assume(False)
        assert got == want, (on, out)

    prop()


# ------------------------- pass-through CTE bodies (round-7 verdict item 6)
def test_cte_pass_through_star_filters_underlying_scan():
    out = _x(
        "WITH c AS (SELECT * FROM default__fat) "
        "SELECT k FROM c WHERE c.day = 'a' AND amount > 5"
    )
    assert out == {"default__fat": "day = 'a' AND amount > 5"}


def test_cte_pass_through_projection_limits_columns():
    out = _x(
        "WITH c AS (SELECT k, day FROM default__fat) "
        "SELECT k FROM c WHERE day = 'a'"
    )
    assert out == {"default__fat": "day = 'a'"}
    # a conjunct on a NON-projected column must not attribute through it
    out2 = _x(
        "WITH c AS (SELECT k FROM default__fat) "
        "SELECT k FROM c WHERE amount > 5"
    )
    assert out2 == {}


def test_cte_body_where_conjoins_with_outer_filter():
    out = _x(
        "WITH c AS (SELECT * FROM default__fat WHERE day = 'a') "
        "SELECT k FROM c WHERE amount > 5"
    )
    assert out == {"default__fat": "day = 'a' AND amount > 5"}


def test_cte_chained_pass_through_resolves_transitively():
    out = _x(
        "WITH a AS (SELECT * FROM default__fat), "
        "b AS (SELECT k, day FROM a) "
        "SELECT k FROM b WHERE day = 'a'"
    )
    assert out == {"default__fat": "day = 'a'"}


def test_cte_refusals_contribute_nothing():
    # renamed column
    assert (
        _x(
            "WITH c AS (SELECT k AS kk FROM default__fat) "
            "SELECT kk FROM c WHERE kk = 1"
        )
        == {}
    )
    # computed column
    assert (
        _x(
            "WITH c AS (SELECT amount + 1 AS a2, day FROM default__fat) "
            "SELECT a2 FROM c WHERE day = 'a'"
        )
        == {}
    )
    # DISTINCT body
    assert (
        _x(
            "WITH c AS (SELECT DISTINCT day FROM default__fat) "
            "SELECT day FROM c WHERE day = 'a'"
        )
        == {}
    )
    # multi-table body
    assert (
        _x(
            "WITH c AS (SELECT f.k FROM default__fat f, default__dim d) "
            "SELECT k FROM c WHERE k = 1"
        )
        == {}
    )
    # GROUP BY body (k survives as a name but the rows are aggregated)
    assert (
        _x(
            "WITH c AS (SELECT k FROM default__fat GROUP BY k) "
            "SELECT k FROM c WHERE k = 1"
        )
        == {}
    )
    # LIMIT body: a filter above a LIMIT does not scope the scan below it
    assert (
        _x(
            "WITH c AS (SELECT k FROM default__fat LIMIT 10) "
            "SELECT k FROM c WHERE k = 1"
        )
        == {}
    )
    # UNION body
    assert (
        _x(
            "WITH c AS (SELECT k FROM default__fat UNION ALL "
            "SELECT k FROM default__dim) SELECT k FROM c WHERE k = 1"
        )
        == {}
    )


def test_cte_referenced_twice_gets_nothing_from_outer_where():
    out = _x(
        "WITH c AS (SELECT * FROM default__fat WHERE day = 'a') "
        "SELECT x.k FROM c x JOIN c y ON x.k = y.k WHERE x.amount > 5"
    )
    # the body's own WHERE still scopes the (single) underlying scan;
    # the outer conjunct must NOT (a second consumer scans c unfiltered)
    assert out == {"default__fat": "day = 'a'"}


def test_cte_over_view_referenced_elsewhere_is_dropped():
    out = _x(
        "WITH c AS (SELECT * FROM default__fat) "
        "SELECT c.k FROM c JOIN default__fat f ON c.k = f.k "
        "WHERE c.day = 'a'",
        occ={"default__fat": 2, "default__dim": 1},
    )
    assert out == {}


def test_cte_shadowing_known_view_is_ignored():
    out = _x(
        "WITH default__dim AS (SELECT k, day FROM default__fat) "
        "SELECT k FROM default__dim WHERE day = 'a'",
        occ={"default__fat": 1, "default__dim": 1},
    )
    # the CTE shadows a registered view name — attribution through it
    # could scope the WRONG table's scan, so nothing is extracted for
    # the shadowed name; (the real dim is never scanned here anyway)
    assert "default__fat" not in out


def test_cte_pass_through_extraction_is_implied_property():
    """Hypothesis extension of THE soundness property to pass-through
    CTEs (round-7 verdict item 6): for ``WITH c AS (SELECT <proj> FROM t
    [WHERE wb]) SELECT * FROM c WHERE wo``, a row of t contributes to the
    result iff (wb AND wo) holds, so whatever predicate the extractor
    attributes to t must be implied by that conjunction under
    three-valued logic — verified against DuckDB on a null-bearing
    grid."""
    import duckdb
    from hypothesis import assume, given, settings, strategies as st

    ALL_LEAVES = {
        "a": ["a > 3", "a < 7", "a = 5", "a IN (1, 2, 3)"],
        "b": ["b = 'x'", "b IS NULL", "b IS NOT NULL"],
        "c": ["c BETWEEN 2 AND 5", "c >= 4"],
    }

    def exprs_over(cols):
        leaves = st.sampled_from([l for c in cols for l in ALL_LEAVES[c]])

        def combine(children):
            x, y = children
            return st.sampled_from(
                [f"{x} AND {y}", f"({x} OR {y})", f"NOT ({x})"]
            )

        return st.recursive(
            leaves, lambda e: st.tuples(e, e).flatmap(combine), max_leaves=4
        )

    proj_st = st.sampled_from(["*", "a, b, c", "a, c"])

    def fresh_con():
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM ("
            "SELECT unnest([0,1,2,3,4,5,6,7,8,NULL]) AS a) "
            "CROSS JOIN (SELECT unnest(['x','y','',NULL]) AS b) "
            "CROSS JOIN (SELECT unnest([1,3,5,7,NULL]) AS c)"
        )
        return con

    state = {"con": fresh_con()}

    @settings(max_examples=200, deadline=None)
    @given(data=st.data())
    def prop(data):
        proj = data.draw(proj_st)
        proj_cols = (
            ["a", "b", "c"] if proj in ("*", "a, b, c")
            else [c.strip() for c in proj.split(",")]
        )
        wb = data.draw(st.none() | exprs_over(["a", "b", "c"]))
        wo = data.draw(exprs_over(proj_cols))
        body = f"SELECT {proj} FROM default__t" + (
            f" WHERE {wb}" if wb else ""
        )
        sql = f"WITH c AS ({body}) SELECT * FROM c WHERE {wo}"
        out = extract_scan_predicates(
            sql, {"default__t": {"a", "b", "c"}}, {"default__t": 1}
        )
        if not out:
            return
        pred = out["default__t"]
        full = f"({wb}) AND ({wo})" if wb else f"({wo})"
        try:
            violated = state["con"].execute(
                f"SELECT count(*) FROM t WHERE {full} "
                f"AND NOT COALESCE(({pred}), FALSE)"
            ).fetchone()[0]
        except duckdb.InternalException:
            state["con"] = fresh_con()
            assume(False)
        assert violated == 0, (sql, pred)

    prop()


def test_cte_chain_with_extra_intermediate_consumption_refused():
    """Round-8 review catch: in WITH a AS (… FROM t), b AS (… FROM a) …
    FROM b JOIN a, the intermediate a is consumed TWICE — folding b's
    outer filter onto t would drop a-side join rows. Every chain link
    must be consumed exactly once."""
    out = _x(
        "WITH a AS (SELECT * FROM default__fat), "
        "b AS (SELECT * FROM a) "
        "SELECT b.k FROM b JOIN a x ON b.k = x.k WHERE b.day = 'z'"
    )
    assert out == {}
    # same via a set-op consumer of the intermediate
    out2 = _x(
        "WITH a AS (SELECT * FROM default__fat), "
        "b AS (SELECT k, day FROM a) "
        "SELECT k FROM b WHERE day = 'z' UNION ALL SELECT k FROM a"
    )
    assert out2 == {}


def test_cte_offset_and_fetch_bodies_refused():
    """Round-8 review catch: a filter above an OFFSET/FETCH changes which
    rows the OFFSET skips — such bodies are not pass-through."""
    assert (
        _x(
            "WITH c AS (SELECT k, day FROM default__fat WHERE k > 0 OFFSET 5) "
            "SELECT k FROM c WHERE day = 'x'"
        )
        == {}
    )
    assert (
        _x(
            "WITH c AS (SELECT k, day FROM default__fat "
            "WHERE k > 0 FETCH FIRST 5 ROWS ONLY) "
            "SELECT k FROM c WHERE day = 'x'"
        )
        == {}
    )
