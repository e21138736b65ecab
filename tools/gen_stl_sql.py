"""Generator for the numeric-loess STL oracle SQL (imported by
__spark_entry__._sql_stl; kept as a module so the pieces are testable).

Replays functions/stl.stl_deterministic_stats in DuckDB: every loess is
a table-form weighted fit — eval rows carry q/lo/dmax as COLUMNS (the
let-bindings SQL lambdas lack), tap terms come from a correlated
generate_series unnest, tricube weights build through chained CTE columns
mirroring the twin's op order (t -> u = 1 - (t*t)*t -> w = (u*u)*u), and
the five regression sums are ordered ``list_sum(list(. ORDER BY jj))``
reductions. Stage outputs reassemble to per-source lists. All float
constants are scientific-notation literals (CLAUDE.md rule).
"""

from __future__ import annotations

PERIOD = 7
S_WIN = 15  # already odd
INNER = 2


def _loess_ctes(tag: str, src_cte: str, lst: str, idx_expr: str,
                evals_sql: str, w_expr: str,
                rho_cte: str | None = None) -> str:
    """CTE chain computing a degree-1 loess; final CTE ``{tag}`` has
    (event_type, f list ordered by eval index).

    ``evals_sql``: SELECT emitting (event_type, n, i, xe, m [, ph]) eval
    rows. ``idx_expr``: 1-based index into ``{lst}`` for tap position
    ``lo + jj`` (may use e.ph). ``w_expr``: SQL int expr for the window
    (may use m or n). ``rho_cte``: optional robustness-weight CTE
    (event_type, rho list, same length/indexing as the source list); the
    tap weight becomes ``((u*u)*u) * rho`` — one extra correctly-rounded
    multiply, mirroring ``_loess1_det(rho=...)``; an all-zero window
    (every tap a pure outlier) fits 0 like the production wsum clamp."""
    rho_join = f"\n  JOIN {rho_cte} r USING (event_type)" if rho_cte else ""
    rv = f",\n         r.rho[{idx_expr}] AS rv" if rho_cte else ""
    w_sql = "((u * u) * u) * rv" if rho_cte else "(u * u) * u"
    return f"""
{tag}_e AS MATERIALIZED (
  SELECT *, GREATEST(2, LEAST({w_expr}, m)) AS q
  FROM ({evals_sql})
), {tag}_e2 AS MATERIALIZED (
  SELECT *, LEAST(GREATEST(xe - (q - 1) // 2, 0), m - q) AS lo
  FROM {tag}_e
), {tag}_e3 AS MATERIALIZED (
  SELECT *,
    CASE WHEN GREATEST(xe - lo, lo + q - 1 - xe) = 0 THEN 1e0
         WHEN {w_expr} > m
         THEN CAST(GREATEST(xe - lo, lo + q - 1 - xe) AS DOUBLE)
              * (CAST({w_expr} AS DOUBLE) / CAST(m AS DOUBLE))
         ELSE CAST(GREATEST(xe - lo, lo + q - 1 - xe) AS DOUBLE)
    END AS dmax
  FROM {tag}_e2
), {tag}_t0 AS MATERIALIZED (
  SELECT e.event_type, e.i, t.jj,
         CAST(e.lo + t.jj - e.xe AS DOUBLE) AS xc,
         s.{lst}[{idx_expr}] AS yv,
         abs(CAST(e.lo + t.jj - e.xe AS DOUBLE)) / e.dmax AS tt{rv}
  FROM {tag}_e3 e
  JOIN {src_cte} s USING (event_type){rho_join},
       unnest(generate_series(0, CAST(e.q AS INTEGER) - 1)) AS t(jj)
), {tag}_t1 AS MATERIALIZED (
  SELECT *, GREATEST(1e0 - (tt * tt) * tt, 0e0) AS u FROM {tag}_t0
), {tag}_t AS MATERIALIZED (
  SELECT *, {w_sql} AS w FROM {tag}_t1
), {tag}_s AS MATERIALIZED (
  SELECT event_type, i,
         list_sum(list(w ORDER BY jj)) AS sw,
         list_sum(list(w * xc ORDER BY jj)) AS sx,
         list_sum(list((w * xc) * xc ORDER BY jj)) AS sxx,
         list_sum(list(w * yv ORDER BY jj)) AS sy,
         list_sum(list((w * xc) * yv ORDER BY jj)) AS sxy
  FROM {tag}_t GROUP BY 1, 2
), {tag} AS MATERIALIZED (
  SELECT event_type,
         list(CASE WHEN sw = 0e0 THEN 0e0
              WHEN abs(sw * sxx - sx * sx) < 1e-12 THEN sy / sw
              ELSE (sxx * sy - sx * sxy) / (sw * sxx - sx * sx) END
              ORDER BY i) AS f
  FROM {tag}_s GROUP BY 1
)"""


def _ma_cte(tag: str, src_cte: str, lst: str, w: int, out_len: str) -> str:
    """Length-reducing MA: out[i] = ordered-sum({lst}[i+1 .. i+w]) / w.
    ``out_len`` may reference n (joined from lists)."""
    return f"""
{tag}_t AS MATERIALIZED (
  SELECT s.event_type, e.i, t.jj, s.{lst}[e.i + t.jj + 1] AS yv
  FROM {src_cte} s
  JOIN lists l2 USING (event_type),
       unnest(generate_series(0, CAST({out_len} AS INTEGER) - 1)) AS e(i),
       unnest(generate_series(0, {w - 1})) AS t(jj)
), {tag} AS MATERIALIZED (
  SELECT event_type, list(sv ORDER BY i) AS f
  FROM (SELECT event_type, i, list_sum(list(yv ORDER BY jj)) / {w} AS sv
        FROM {tag}_t GROUP BY 1, 2)
  GROUP BY 1
)"""


def _iteration(it: int, detr_cte: str, detr_col: str,
               rho_cte: str | None = None) -> str:
    """One STL inner iteration: phase loess -> low pass -> seasonal ->
    deseasonalize -> trend. Emits CTEs suffixed _{it}. ``rho_cte``
    weights the phase and trend loess (NOT the low pass — Cleveland 1990
    robustness applies to the data smoothers only)."""
    p = PERIOD
    ni = "CAST(n AS INTEGER)"
    phase_evals = f"""
  SELECT event_type, n, g.pos AS i,
         g.pos % {p} AS ph,
         g.pos // {p} - 1 AS xe,
         (n - 1 - (g.pos % {p})) // {p} + 1 AS m
  FROM {detr_cte}, unnest(generate_series(0, {ni} + {2 * p} - 1)) AS g(pos)
"""
    c = _loess_ctes(
        f"c_{it}", detr_cte, detr_col,
        f"e.ph + {p} * (e.lo + t.jj) + 1", phase_evals, str(S_WIN),
        rho_cte=rho_cte,
    )
    ma1 = _ma_cte(f"lpa_{it}", f"c_{it}", "f", p, f"l2.n + {p} + 1")
    ma2 = _ma_cte(f"lpb_{it}", f"lpa_{it}", "f", p, "l2.n + 2")
    ma3 = _ma_cte(f"lpc_{it}", f"lpb_{it}", "f", 3, "l2.n")
    lp_evals = f"""
  SELECT event_type, n, g.i, g.i AS xe, n AS m
  FROM {detr_cte}, unnest(generate_series(0, {ni} - 1)) AS g(i)
"""
    lp = _loess_ctes(f"lp_{it}", f"lpc_{it}", "f", "e.lo + t.jj + 1",
                     lp_evals, str(PERIOD))
    tr_evals = f"""
  SELECT event_type, n, g.i, g.i AS xe, n AS m
  FROM des_{it}, unnest(generate_series(0, {ni} - 1)) AS g(i)
"""
    twin = "CASE WHEN n % 2 = 1 THEN n ELSE n + 1 END"
    rest = f"""
seas_{it} AS MATERIALIZED (
  SELECT l.event_type, l.n, l.xs,
         list_transform(generate_series(1, CAST(l.n AS INTEGER)), k ->
           c.f[{p} + k] - p2.f[k]) AS s
  FROM lists l
  JOIN c_{it} c USING (event_type)
  JOIN lp_{it} p2 USING (event_type)
), des_{it} AS MATERIALIZED (
  SELECT event_type, n, xs, s,
         list_transform(generate_series(1, CAST(n AS INTEGER)), k ->
           xs[k] - s[k]) AS dd
  FROM seas_{it}
)"""
    tr = _loess_ctes(f"tr_{it}", f"des_{it}", "dd", "e.lo + t.jj + 1",
                     tr_evals, twin, rho_cte=rho_cte)
    return ",".join([c, ma1, ma2, ma3, lp, rest, tr])


DEFAULT_D_SQL = """d AS MATERIALIZED (
  SELECT event_type, date_trunc('day', ts) AS b,
         CAST(round(sum(value) * 100) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
)"""


def sql_stl(d_sql: str | None = None, key_out: str = "event_type",
            robust: bool = False) -> str:
    """STL oracle over any daily tier: ``d_sql`` must be a complete CTE
    block ending in ``d(event_type, b, x)`` (the internal CTEs are keyed on
    the literal name ``event_type``); ``key_out`` renames the key column in
    the final projection (e.g. ``source`` for the derived-sequences tier).

    ``robust=True`` replays ``stl_robust_deterministic_stats`` (one
    Cleveland outer pass, the stlplus default the reference invokes at
    ``R/rtsa.stl.R:360``): after the plain two-iteration pass, bisquare
    weights from ``6 * median|remainder|`` (explicit sorted-list median)
    feed a second rho-weighted pass; the output adds ``rho_min_e4``."""
    if d_sql is None:
        d_sql = DEFAULT_D_SQL
    p = PERIOD
    it1 = _iteration(1, "lists", "xs")
    detr2 = f"""
detr_2 AS MATERIALIZED (
  SELECT l.event_type, l.n, l.xs,
         list_transform(generate_series(1, CAST(l.n AS INTEGER)), k ->
           l.xs[k] - t.f[k]) AS dt
  FROM lists l JOIN tr_1 t USING (event_type)
)"""
    it2 = _iteration(2, "detr_2", "dt")
    body = f"{it1},{detr2},{it2}"
    final_seas, final_tr = "seas_2", "tr_2"
    rho_cols = ""
    rho_join = ""
    if robust:
        # bisquare weights from the pass-1 remainder: h = 6 * median|r|
        # (sorted-list median: middle element, or mean of the two
        # middles), u = min(|r|/h, 1), rho = (1-u*u)*(1-u*u) — each a
        # fixed sequence of correctly-rounded double ops.
        rho_ctes = f"""
resid AS MATERIALIZED (
  SELECT l.event_type, l.n,
         list_transform(generate_series(1, CAST(l.n AS INTEGER)), k ->
           abs(l.xs[k] - s.s[k] - t.f[k])) AS r,
         list_max(list_transform(l.xs, v -> abs(v))) AS amax
  FROM lists l
  JOIN seas_2 s USING (event_type)
  JOIN tr_2 t USING (event_type)
), medr AS MATERIALIZED (
  SELECT event_type, n, r, amax,
         CASE WHEN n % 2 = 1
              THEN list_sort(r)[(CAST(n AS INTEGER) + 1) // 2]
              ELSE (list_sort(r)[CAST(n AS INTEGER) // 2]
                    + list_sort(r)[CAST(n AS INTEGER) // 2 + 1]) / 2e0
         END AS md
  FROM resid
), rhol AS MATERIALIZED (
  SELECT event_type, n,
         -- noise-scale remainder guard (twin: h <= 1e-9 * max|x|)
         CASE WHEN 6e0 * md <= 1e-9 * amax THEN list_transform(r, v -> 1e0)
              ELSE list_transform(r, v ->
                CASE WHEN v / (6e0 * md) > 1e0 THEN 0e0
                     ELSE (1e0 - (v / (6e0 * md)) * (v / (6e0 * md)))
                          * (1e0 - (v / (6e0 * md)) * (v / (6e0 * md)))
                END)
         END AS rho
  FROM medr
)"""
        detr3 = f"""
detr_3 AS MATERIALIZED (
  SELECT l.event_type, l.n, l.xs,
         list_transform(generate_series(1, CAST(l.n AS INTEGER)), k ->
           l.xs[k] - t.f[k]) AS dt
  FROM lists l JOIN tr_2 t USING (event_type)
)"""
        it3 = _iteration(3, "detr_3", "dt", rho_cte="rhol")
        detr4 = f"""
detr_4 AS MATERIALIZED (
  SELECT l.event_type, l.n, l.xs,
         list_transform(generate_series(1, CAST(l.n AS INTEGER)), k ->
           l.xs[k] - t.f[k]) AS dt
  FROM lists l JOIN tr_3 t USING (event_type)
)"""
        it4 = _iteration(4, "detr_4", "dt", rho_cte="rhol")
        body = f"{body},{rho_ctes},{detr3},{it3},{detr4},{it4}"
        final_seas, final_tr = "seas_4", "tr_4"
        rho_cols = f""",
       CASE WHEN l.n >= {2 * p} THEN
         CAST(floor(1e4 * list_min(rh.rho)) AS BIGINT)
       ELSE 10000 END AS rho_min_e4"""
        rho_join = (
            f"\nLEFT JOIN rhol rh ON l.event_type = rh.event_type"
            f" AND l.n >= {2 * p}"
        )
    return f"""
WITH {d_sql}, lists AS MATERIALIZED (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS x_sum,
         list(x::DOUBLE ORDER BY b) AS xs
  FROM d GROUP BY 1
),{body}
SELECT l.event_type AS {key_out}, l.n AS n_buckets, l.x_sum,
       CASE WHEN l.n >= {2 * p} THEN
         CAST(floor(1e4 * (list_max(s2.s) - list_min(s2.s))) AS BIGINT)
       ELSE 0 END AS seas_amp_e4,
       CASE WHEN l.n >= {2 * p} THEN CAST(floor(1e4 * t2.f[1]) AS BIGINT)
            ELSE CAST(floor(1e4 * l.xs[1]) AS BIGINT) END AS trend_first_e4,
       CASE WHEN l.n >= {2 * p} THEN
         CAST(floor(1e4 * t2.f[CAST(l.n AS INTEGER)]) AS BIGINT)
       ELSE CAST(floor(1e4 * l.xs[CAST(l.n AS INTEGER)]) AS BIGINT)
       END AS trend_last_e4{rho_cols}
FROM lists l
LEFT JOIN {final_seas} s2 ON l.event_type = s2.event_type AND l.n >= {2 * p}
LEFT JOIN {final_tr} t2 ON l.event_type = t2.event_type AND l.n >= {2 * p}{rho_join}
"""


if __name__ == "__main__":
    print(sql_stl())
