"""Per-scan predicate extraction from SELECT statements, for the facade's
stats-injected broadcast hints (SURVEY.md §4; round-5 brief item 1).

Iceberg reports PER-SCAN statistics to Catalyst: a fat table behind
``WHERE day = X`` is sized by its pruned file set, not its raw bytes
(the reference relies on exactly this via the SparkSessionCatalog
extensions wiring, docker-compose.yml:26). The facade's view
registration (lake/sql.py `_select`) previously estimated every table
UNSCOPED, so a large table that a statement's WHERE shrinks below the
broadcast threshold missed the hint. This module closes that gap: given
the rewritten statement text and the referenced views' schemas, it
returns, per view, the conjunction of WHERE predicates that provably
apply to that view's scan — suitable for `scan_estimate(t, predicate)`.

The extraction is deliberately conservative — a missed predicate only
costs a missed broadcast (safe); a WRONG predicate could under-estimate
a scan and broadcast something huge (an executor OOM at 100 TB). A
conjunct is attributed to a view only when ALL of these hold:

- the view is referenced exactly once in the whole statement (a second
  reference may scan it unfiltered, and the hint attaches to the shared
  registered view);
- the conjunct sits in the WHERE of the SELECT scope whose FROM/JOIN
  list introduces that reference, with subqueries masked out (so a
  correlated or nested WHERE can never leak into the wrong scope);
- every column it references resolves to that view — via an alias
  declared in that scope's FROM/JOIN, or bare when the scope has no
  derived/unknown FROM items and exactly one scope view carries the
  column;
- the view is not on the null-producing side of an outer join in that
  scope (``WHERE r.x IS NULL`` on a LEFT JOIN's right side matches
  null-EXTENDED rows — it does not filter r's scan at all). RIGHT and
  FULL joins disqualify the whole scope rather than model preserved
  sides;
- the conjunct contains no subquery and no BETWEEN-AND mis-split (the
  splitter is BETWEEN-aware).

Structure detection (scopes, clauses, identifiers) runs on a masked
copy of the statement — string-literal interiors and subquery bodies
blanked, both length-preserving — while the predicate TEXT handed to
the planner is always sliced from the original at the same offsets, so
literal values survive intact. Downstream,
`lake/pruning.py:candidate_files` is itself conservative (an
unevaluable leaf keeps every file), so handing it any conjunct that
truly applies to the scan can only shrink the estimate soundly.
"""

from __future__ import annotations

import re

# identifiers that are never column references inside a conjunct
_NON_COLUMN = frozenset(
    """and or not between in is null like ilike escape true false
    date timestamp interval case when then else end exists distinct
    cast as rlike regexp""".split()
)
# a word in alias position that is actually the next clause/keyword
_NOT_ALIAS = frozenset(
    """on using where group order having window limit qualify union
    intersect except join inner left right full cross outer natural
    anti semi lateral as values select""".split()
)
_JOIN_WORDS = frozenset(
    "join inner left right full cross outer natural anti semi".split()
)

_SELECT_RE = re.compile(r"\bSELECT\b", re.I)
_WHERE_RE = re.compile(
    r"\bWHERE\b(?P<body>.*?)(?=\bGROUP\s+BY\b|\bORDER\s+BY\b|\bHAVING\b"
    r"|\bWINDOW\b|\bLIMIT\b|\bQUALIFY\b|\bUNION\b|\bINTERSECT\b"
    r"|\bEXCEPT\b|$)",
    re.I | re.S,
)
_FROM_RE = re.compile(
    r"\bFROM\b(?P<body>.*?)(?=\bWHERE\b|\bGROUP\s+BY\b|\bORDER\s+BY\b"
    r"|\bHAVING\b|\bWINDOW\b|\bLIMIT\b|\bQUALIFY\b|\bUNION\b"
    r"|\bINTERSECT\b|\bEXCEPT\b|$)",
    re.I | re.S,
)
_WORD_RE = re.compile(r"[A-Za-z_]\w*")
_QUALIFIED_RE = re.compile(r"\b([A-Za-z_]\w*)(\s*\.\s*)([A-Za-z_]\w*)")


def _mask_strings(sql: str) -> str:
    """Blank the interiors of single-quoted literals (length-preserving,
    '' escapes handled) so keyword/identifier scans never match inside
    strings."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        else:
            i += 1
    return "".join(out)


def _depths(sql: str) -> list[int]:
    """Paren depth per character; '(' and ')' carry their OUTER depth so
    a scope slice at depth d includes its own parens intact."""
    depth, d = [], 0
    for ch in sql:
        if ch == "(":
            depth.append(d)
            d += 1
        elif ch == ")":
            d -= 1
            depth.append(d)
        else:
            depth.append(d)
    return depth


def _mask_subqueries(text: str) -> str:
    """Blank the interior of any parenthesized group containing SELECT
    (keeping the parens, length-preserving), leaving IN-lists and
    grouping parens alone."""
    out = list(text)
    i, n = 0, len(text)
    while i < n:
        if text[i] == "(":
            d, j = 1, i + 1
            while j < n and d:
                if text[j] == "(":
                    d += 1
                elif text[j] == ")":
                    d -= 1
                j += 1
            inner = text[i + 1 : j - 1]
            if _SELECT_RE.search(inner):
                for k in range(i + 1, j - 1):
                    out[k] = " "
            # no recursion needed: a masked group hides everything inside;
            # an unmasked group (no SELECT anywhere inside) has nothing
            # left to mask either.
            i = j
        else:
            i += 1
    return "".join(out)


def _scopes(masked_sql: str) -> list[tuple[int, str]]:
    """One (start-offset, subquery-masked text) per SELECT keyword: from
    the SELECT to the point where paren depth drops below the SELECT's,
    or the next same-depth SELECT (a UNION branch) — whichever first."""
    depth = _depths(masked_sql)
    starts = [
        (m.start(), depth[m.start()]) for m in _SELECT_RE.finditer(masked_sql)
    ]
    scopes = []
    for idx, (start, d) in enumerate(starts):
        end = len(masked_sql)
        for pos, sd in starts[idx + 1 :]:
            if sd <= d:
                end = pos
                break
        for j in range(start, end):
            if depth[j] < d:
                end = j
                break
        scopes.append((start, _mask_subqueries(masked_sql[start:end])))
    return scopes


def _parse_from(
    from_body: str, known_views: set[str]
) -> (
    tuple[
        dict[str, str],
        bool,
        set[str],
        list[tuple[int, int, bool]],
        dict[str, int],
    ]
    | None
):
    """Parse one scope's FROM/JOIN list.

    Returns ``(alias_map, has_unknown_item, null_producing_views,
    on_spans, ref_counts)`` — ref_counts counts known-view references one
    per FROM item (two aliases of one view = 2); on_spans are (start,
    end, is_inner) character spans of
    each ON condition within ``from_body`` (is_inner = a plain/INNER
    join: its ON conjuncts are WHERE-equivalent; LEFT/SEMI/ANTI ON
    conjuncts are NOT scan filters for the preserved side and are marked
    False) — or None when the scope uses shapes we refuse to model
    (RIGHT/FULL/NATURAL joins, LATERAL, malformed text).
    """
    toks = [
        (m.group(0), m.start(), m.end())
        for m in re.finditer(r"\w+|[(),]", from_body)
    ]
    alias_map: dict[str, str] = {}
    ref_counts: dict[str, int] = {}  # one per FROM item, not per view —
    # `FROM c x JOIN c y` references c TWICE (a filter attributed through
    # either alias would wrongly scope the other consumer's rows)
    has_unknown = False
    null_producing: set[str] = set()
    on_spans: list[tuple[int, int, bool]] = []
    i, n = 0, len(toks)
    pending_left = False  # next item is the null side of a LEFT JOIN
    pending_filtering = False  # SEMI/ANTI/CROSS: ON is never WHERE-like

    def _skip_parens(i: int) -> int:
        d = 0
        while i < n:
            if toks[i][0] == "(":
                d += 1
            elif toks[i][0] == ")":
                d -= 1
                if d == 0:
                    return i + 1
            i += 1
        return i

    first_item = True
    while i < n:
        t = toks[i][0]
        low = t.lower()
        if low in ("right", "full", "natural", "lateral"):
            return None
        if low == "left":
            pending_left = True
            i += 1
            continue
        if low in ("anti", "semi", "cross"):
            pending_filtering = True
            i += 1
            continue
        if low in ("inner", "outer"):
            i += 1
            continue
        if low == "join" or t == "," or first_item:
            if t == ",":
                pending_left = False
                pending_filtering = False
            if not first_item:
                i += 1
            first_item = False
            # item follows
            if i < n and toks[i][0] == "(":
                i = _skip_parens(i)
                has_unknown = True
                if i < n and toks[i][0].lower() == "as":
                    i += 1
                if (
                    i < n
                    and re.match(r"\w+$", toks[i][0])
                    and toks[i][0].lower() not in _NOT_ALIAS
                ):
                    i += 1
            else:
                if i >= n or not re.match(r"\w+$", toks[i][0]):
                    return None
                name = toks[i][0]
                i += 1
                alias = name
                if i < n and toks[i][0].lower() == "as":
                    i += 1
                if (
                    i < n
                    and re.match(r"\w+$", toks[i][0])
                    and toks[i][0].lower() not in _NOT_ALIAS
                ):
                    alias = toks[i][0]
                    i += 1
                if name in known_views:
                    if alias in alias_map:
                        return None  # alias collision — refuse
                    alias_map[alias] = name
                    ref_counts[name] = ref_counts.get(name, 0) + 1
                    if name != alias:
                        if name in alias_map and alias_map[name] != name:
                            return None
                        alias_map.setdefault(name, name)
                    if pending_left:
                        null_producing.add(name)
                else:
                    has_unknown = True
            is_inner = not pending_left and not pending_filtering
            pending_left = False
            pending_filtering = False
            # walk the ON/USING condition up to the next separator,
            # recording the ON body's character span + this join's kind
            on_start = None
            if i < n and toks[i][0].lower() == "on":
                on_start = toks[i][2]  # text begins after the ON keyword
                i += 1
            while (
                i < n
                and toks[i][0].lower() not in _JOIN_WORDS
                and toks[i][0] != ","
            ):
                if toks[i][0] == "(":
                    i = _skip_parens(i)
                else:
                    i += 1
            if on_start is not None:
                on_end = toks[i][1] if i < n else len(from_body)
                on_spans.append((on_start, on_end, is_inner))
            continue
        return None  # unparseable shape
    return alias_map, has_unknown, null_producing, on_spans, ref_counts


def _split_conjuncts(where_body: str) -> list[tuple[int, int]]:
    """Spans of top-level AND-separated conjuncts (BETWEEN-aware).

    A top-level OR makes the ANDs around it non-conjunctive
    (``a AND b OR c`` is ``(a AND b) OR c`` — neither a nor b is
    required), so the whole body is returned as ONE span: it then either
    attributes wholly to a single view (sound — the full disjunction
    still scopes that scan) or is dropped. Splitting anyway would keep
    `a` as a "required" filter and under-estimate the scan — the
    broadcast-OOM hazard this module exists to prevent.
    """
    if any(
        m.group(0).upper() == "OR"
        for m in _or_depth_scan(where_body)
    ):
        return [(0, len(where_body))]
    spans, cur_start = [], 0
    depth, pending_between = 0, 0
    for m in re.finditer(r"[()]|\b(?:AND|BETWEEN)\b", where_body, re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0 and tok.upper() == "BETWEEN":
            pending_between += 1
        elif depth == 0:  # AND
            if pending_between:
                pending_between -= 1
            else:
                spans.append((cur_start, m.start()))
                cur_start = m.end()
    spans.append((cur_start, len(where_body)))
    return spans


def _or_depth_scan(where_body: str):
    """Yield OR tokens at paren depth 0 of the body."""
    depth = 0
    for m in re.finditer(r"[()]|\bOR\b", where_body, re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            yield m


def _attribute(
    masked_conj: str,
    alias_map: dict[str, str],
    scope_views: set[str],
    view_columns: dict[str, set[str]],
    has_unknown: bool,
) -> tuple[str, list[tuple[int, int]]] | None:
    """Return (the single view this conjunct provably scopes, spans of
    ``alias.``-qualifier prefixes to strip), or None."""
    owners: set[str] = set()
    qualified_spans: list[tuple[int, int]] = []
    strip_spans: list[tuple[int, int, str]] = []
    for m in _QUALIFIED_RE.finditer(masked_conj):
        alias, col = m.group(1), m.group(3)
        view = alias_map.get(alias)
        if view is None or col not in view_columns.get(view, set()):
            return None
        owners.add(view)
        qualified_spans.append(m.span())
        strip_spans.append((m.start(), m.start(3), view))
    for m in _WORD_RE.finditer(masked_conj):
        if any(s <= m.start() < e for s, e in qualified_spans):
            continue
        word = m.group(0)
        if word.lower() in _NON_COLUMN or word.isdigit():
            continue
        # function call — the NAME is not a column (its args still are)
        if re.match(r"\s*\(", masked_conj[m.end() :]):
            continue
        if has_unknown:
            return None  # a derived item could own this bare column
        cands = [v for v in scope_views if word in view_columns.get(v, set())]
        if len(cands) != 1:
            return None
        owners.add(cands[0])
    if len(owners) != 1:
        return None
    view = next(iter(owners))
    return view, [(s, e) for s, e, v in strip_spans if v == view]


_WITH_RE = re.compile(r"^\s*WITH\b", re.I)
_CTE_HEAD_RE = re.compile(r"\s*([A-Za-z_]\w*)\s+AS\s*\(", re.I)
_CTE_BODY_RE = re.compile(
    r"^\s*SELECT\s+(?P<cols>.*?)\s+FROM\s+(?P<view>[A-Za-z_]\w*)"
    r"(?P<rest>\s.*)?$",
    re.I | re.S,
)
_CTE_REST_STOP_RE = re.compile(
    r"[(),]|\b(?:GROUP|ORDER|HAVING|WINDOW|LIMIT|OFFSET|FETCH|QUALIFY"
    r"|UNION|INTERSECT|EXCEPT|JOIN|LATERAL|AS)\b",
    re.I,
)


def _parse_ctes(
    masked: str, view_columns: dict[str, set[str]]
) -> dict[str, tuple[str, set[str], tuple[str, ...]]]:
    """PASS-THROUGH CTEs of a ``WITH`` prologue: name → (underlying
    registered view, projected column set, chain of CTE names crossed —
    the fold gate must verify EVERY link is consumed exactly once, not
    just the tail: in ``WITH a AS (… FROM t), b AS (… FROM a) … FROM b
    JOIN a``, a is consumed twice and filtering t's scan through b would
    drop a-side rows). A CTE qualifies only when its
    body is ``SELECT * | <bare column list> FROM <single known view>
    [WHERE …]`` — no renames (AS), computed columns, DISTINCT, joins,
    GROUP/ORDER/LIMIT/set-ops (round-6 verdict item 5's refusal list): a
    WHERE conjunct on such a CTE's column provably filters the underlying
    scan (the body's own WHERE just conjoins). Chained pass-through CTEs
    resolve transitively. Anything else — including a CTE shadowing a
    real view name — contributes nothing (sound: only a missed hint)."""
    if not _WITH_RE.match(masked):
        return {}
    depth = _depths(masked)
    out: dict[str, tuple[str, set[str], tuple[str, ...]]] = {}
    pos = _WITH_RE.match(masked).end()
    while True:
        hm = _CTE_HEAD_RE.match(masked, pos)
        if not hm:
            break
        name, open_paren = hm.group(1), hm.end() - 1
        d = depth[open_paren]
        close = None
        for j in range(open_paren + 1, len(masked)):
            if masked[j] == ")" and depth[j] == d:
                close = j
                break
        if close is None:
            return {}
        body = _mask_subqueries(masked[open_paren + 1 : close])
        bm = _CTE_BODY_RE.match(body)
        if bm and name not in view_columns and name not in out:
            src = bm.group("view")
            resolved = out.get(src)
            src_view, src_cols, src_chain = (
                resolved
                if resolved
                else (src, view_columns.get(src, set()), ())
            )
            chain = src_chain + (name,)
            rest = (bm.group("rest") or "").strip()
            rest_ok = rest == "" or (
                re.match(r"^WHERE\b", rest, re.I)
                and not _unsupported_in_rest(rest[5:])
            )
            cols_txt = bm.group("cols").strip()
            if src_view in view_columns and rest_ok:
                if cols_txt == "*":
                    out[name] = (src_view, set(src_cols), chain)
                else:
                    cols = [c.strip() for c in cols_txt.split(",")]
                    if all(
                        re.fullmatch(r"[A-Za-z_]\w*", c)
                        and c.lower() not in _NON_COLUMN
                        and c in src_cols
                        for c in cols
                    ):
                        out[name] = (src_view, set(cols), chain)
        pos = close + 1
        cm = re.match(r"\s*,", masked[pos:])
        if not cm:
            break
        pos += cm.end()
    return out


def _unsupported_in_rest(rest: str) -> bool:
    """Depth-0 clause keywords after the body's WHERE that would change
    the CTE's row set beyond a plain filter (LIMIT, set-ops, …)."""
    d = 0
    for m in _CTE_REST_STOP_RE.finditer(rest):
        t = m.group(0)
        if t == "(":
            d += 1
        elif t == ")":
            d -= 1
        elif t in (",",):
            if d == 0:
                return True
        elif d == 0 and t.upper() not in ("AS",):
            return True
    return False


def extract_scan_predicates(
    sql: str,
    view_columns: dict[str, set[str]],
    occurrences: dict[str, int],
) -> dict[str, str]:
    """Map view name → WHERE conjunction that provably scopes its scan.

    ``sql`` is the facade-rewritten statement (lake tables already appear
    as ``ns__table`` view identifiers); ``view_columns`` maps each
    registered view to its column set; ``occurrences`` counts each
    view's textual references across the WHOLE statement (subqueries
    included — computed by the facade's rewrite pass, which sees text
    this module masks away). Views referenced ≠ 1 time get no predicate.
    """
    masked = _mask_strings(sql)
    # pass-through CTEs act as aliases of their underlying view for
    # attribution: a main-scope WHERE on the CTE's (projected) columns
    # scopes the underlying scan (round-6 verdict item 5). They join the
    # known-view set with their PROJECTED column sets so a conjunct on a
    # non-projected column can never attribute through them.
    cte_map = _parse_ctes(masked, view_columns)
    local_columns = dict(view_columns)
    for cte, (_v, cols, _chain) in cte_map.items():
        local_columns[cte] = cols
    view_columns = local_columns
    known = set(view_columns)
    out: dict[str, list[str]] = {}
    seen_in_scopes: dict[str, int] = {}
    for scope_start, scope in _scopes(masked):
        fm = _FROM_RE.search(scope)
        if not fm:
            continue
        parsed = _parse_from(fm.group("body"), known)
        if parsed is None:
            # unmodeled join shape — still count this scope's references
            # so a second, extractable scope can't claim a shared view
            for v in known:
                if re.search(rf"(?<!\w){re.escape(v)}(?!\w)", fm.group("body")):
                    seen_in_scopes[v] = seen_in_scopes.get(v, 0) + 1
            continue
        alias_map, has_unknown, null_side, on_spans, ref_counts = parsed
        scope_views = set(alias_map.values())
        for v, n in ref_counts.items():
            seen_in_scopes[v] = seen_in_scopes.get(v, 0) + n

        def _harvest(body: str, abs_start: int) -> None:
            """Attribute one predicate body's conjuncts (a WHERE body, or
            an INNER-join ON body — WHERE-equivalent for inner joins)."""
            for s, e in _split_conjuncts(body):
                masked_conj = body[s:e]
                if not masked_conj.strip():
                    continue
                orig_conj = sql[abs_start + s : abs_start + e]
                if _SELECT_RE.search(orig_conj):
                    continue  # subquery (blanked in masked text) — skip
                res = _attribute(
                    masked_conj,
                    alias_map,
                    scope_views,
                    view_columns,
                    has_unknown,
                )
                if res is None:
                    continue
                view, strips = res
                if view in null_side:
                    continue
                # remove the `alias.` qualifier prefixes by span (positions
                # are identical between masked and original text)
                pieces, pos = [], 0
                for ss, se in sorted(strips):
                    pieces.append(orig_conj[pos:ss])
                    pos = se
                pieces.append(orig_conj[pos:])
                out.setdefault(view, []).append("".join(pieces).strip())

        # inner-join ON literal conjuncts are scan predicates too
        # (round-5 verdict item 4): `... JOIN t ON t.day = DATE'…' AND …`
        # filters t exactly like a WHERE conjunct. LEFT/SEMI/ANTI ON
        # conjuncts are recorded with is_inner=False and never harvested —
        # they don't filter the preserved side's scan.
        from_abs = scope_start + fm.start("body")
        for s, e, is_inner in on_spans:
            if is_inner:
                _harvest(fm.group("body")[s:e], from_abs + s)
        wm = _WHERE_RE.search(scope)
        if not wm:
            continue
        _harvest(wm.group("body"), scope_start + wm.start("body"))
    # fold pass-through-CTE conjuncts onto the underlying view. Gates:
    # EVERY link of the CTE chain is consumed exactly once — the tail by
    # the filtering scope, each intermediate by the next body; a second
    # reference to ANY link scans it unfiltered (review catch: `FROM b
    # JOIN a` passed when only b was gated). The underlying view keeps
    # its own occurrence gates below (its single reference is the first
    # body's).
    for cte, (v, _cols, chain) in cte_map.items():
        conjs = out.pop(cte, None)
        if conjs and all(seen_in_scopes.get(l, 0) == 1 for l in chain):
            out.setdefault(v, []).extend(conjs)
    return {
        v: " AND ".join(conjs)
        for v, conjs in out.items()
        if occurrences.get(v, 0) == 1 and seen_in_scopes.get(v, 0) == 1
    }
