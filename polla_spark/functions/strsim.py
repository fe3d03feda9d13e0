"""Jaro-Winkler string similarity in EXACT ppm integers — the real
edit-based comparator ER toolkits score names with (q206's bigram
overlap is the banding-friendly integer test; this is the classic
sequential algorithm itself), expressed fully declaratively in BOTH
engines so it is oracle-checkable:

- Spark: one within-row ``aggregate()`` fold over the first string's
  positions; the per-step greedy window search is a NESTED lambda
  (``filter`` referencing the outer fold's accumulator — supported
  since Spark 2.4), the used-positions set is a bitmask in a long.
  No UDF, no shuffle, no Python: higher-order functions evaluate in
  Spark's INTERPRETED expression mode (not whole-stage codegen), but
  entirely JVM-side per row — which is also why the window search is
  let-bound to evaluate once per step (see ``with_jaro_winkler``).
- DuckDB (oracle): the same greedy recurrence as a RECURSIVE CTE
  (DuckDB 1.0's ``list_reduce`` has no initial accumulator and its
  nested lambdas cannot capture outer lambda variables, so the fold
  becomes row-per-step recursion — same arithmetic, same mask).

Algorithm (Jaro 1989 / Winkler 1990), all integer:

- match window w = max(|a|, |b|) div 2 − 1 (≥ 0);
- greedy left-to-right matching: position i of ``a`` takes the
  SMALLEST unused j in [i−w, i+w] with a[i] = b[j];
- m = matches; d = positions where the two matched sequences differ;
  t = d div 2 — the canonical INTEGER convention (jellyfish/strsim
  use floor(d/2); with odd d the exact t = d/2 would differ);
- jaro = (m/|a| + m/|b| + (m−t)/m) / 3 with the last term written
  (2m − 2·(d div 2))/(2m), computed as ONE exact floor division over
  the common denominator 6·m·|a|·|b|, scaled to ppm —
  floor-div-exact in both engines, never a float;
- Winkler boost (only above 0.7): jw = jaro + ℓ·(10^6 − jaro) div 10
  with ℓ = common prefix length capped at 4.

Conventions (documented, both engines): both strings empty → 10^6
(identical); one empty or zero matches → 0. Inputs must be NON-NULL
(callers filter); char-based substring keeps multibyte text correct
in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000
#: Winkler boost applies only above this (the standard 0.7 gate)
JW_BOOST_PPM = 700_000


def _spark_cj(a: str, b: str, lb: str, w: str) -> str:
    """The per-step greedy pick: smallest UNUSED j in [i−w, i+w] with
    b[j] = a[i] (NULL when none). ``sequence(lo, hi)`` DESCENDS when
    lo > hi in Spark, so the upper bound is clamped to ≥ lo and the
    true bound re-checked inside the lambda."""
    lo = f"greatest(1, i - {w})"
    hi = f"least({lb}, i + {w})"
    return (
        f"array_min(filter(sequence({lo}, greatest({hi}, {lo})), "
        f"j -> j <= {hi} and substring({b}, j, 1) = substring({a}, i, 1) "
        f"and (shiftright(acc.mask, cast(j - 1 as int)) & 1) = 0))"
    )


def with_jaro_winkler(
    df: DataFrame, a: str, b: str, *, out: str = "jw"
) -> DataFrame:
    """Add ``{out}_jaro_ppm`` and ``{out}_ppm`` columns scoring the
    NON-NULL string columns ``a`` vs ``b``. Pure column expressions,
    all JVM-side.

    LENGTH CAP: ``b`` must be ≤ 64 characters — the used-positions
    set is one long, and ``shiftleft`` wraps its shift amount mod 64,
    so position 65 would silently alias position 1 (and DuckDB's
    ``<<`` would diverge). ENFORCED with an in-plan abort rather than
    documented-only (r8 review finding): callers score bounded name
    fields; a longer field is a contract violation, not data."""
    la, lb = f"__{out}_la", f"__{out}_lb"
    w, st = f"__{out}_w", f"__{out}_st"
    m, bm, d, l = (f"__{out}_m", f"__{out}_bm", f"__{out}_d", f"__{out}_l")
    cj = _spark_cj(a, b, lb, w)
    res = (
        # the cap test must be NULL-TOLERANT: Catalyst reorders
        # filters, so this assert can evaluate BEFORE an upstream
        # not-null gate (it did, on q211's lead()-padded rows — the
        # q205 advice class); a NULL b is the caller's contract
        # violation to surface as NULL scores, not this guard's
        df.filter(
            F.coalesce(
                F.assert_true(
                    F.coalesce(F.length(b), F.lit(0)) <= 64,
                    F.lit("jaro_winkler: second string exceeds the 64-char "
                          "mask capacity (shiftleft wraps mod 64)"),
                ),
                F.lit(True),
            )
        )
        .withColumn(la, F.length(a).cast("long"))
        .withColumn(lb, F.length(b).cast("long"))
        .withColumn(
            w, F.expr(f"greatest(greatest({la}, {lb}) div 2 - 1, cast(0 as bigint))")
        )
        .withColumn(
            st,
            # HOFs run INTERPRETED (not codegen), so the window
            # search must be evaluated ONCE per step: the
            # transform-over-1-element-array wrapper is SQL's let —
            # `c` binds the cj result, both struct fields read the
            # binding (measured 2x on the SNM workload)
            F.expr(f"""
              aggregate(
                sequence(cast(1 as bigint), greatest({la}, cast(1 as bigint))),
                named_struct('mask', cast(0 as bigint), 'am', ''),
                (acc, i) -> if(i > {la}, acc,
                  element_at(transform(array({cj}), c -> named_struct(
                    'mask', if(c is null, acc.mask,
                               acc.mask | shiftleft(cast(1 as bigint), cast(c - 1 as int))),
                    'am',   if(c is null, acc.am,
                               concat(acc.am, substring({a}, i, 1)))
                  )), 1))
              )"""),
        )
        .withColumn(m, F.expr(f"cast(length({st}.am) as bigint)"))
        .withColumn(
            bm,
            F.expr(
                f"concat_ws('', transform("
                f"filter(sequence(cast(1 as bigint), greatest({lb}, cast(1 as bigint))), "
                f"j -> j <= {lb} and (shiftright({st}.mask, cast(j - 1 as int)) & 1) = 1), "
                f"j -> substring({b}, j, 1)))"
            ),
        )
        .withColumn(
            d,
            F.expr(
                f"cast(size(filter(sequence(cast(1 as bigint), greatest({m}, cast(1 as bigint))), "
                f"k -> k <= {m} and substring({st}.am, k, 1) != substring({bm}, k, 1))) as bigint)"
            ),
        )
        .withColumn(
            l,
            F.expr(
                f"cast(size(filter(sequence(1, 4), "
                f"k -> k <= least({la}, {lb}) "
                f"and substring({a}, 1, k) = substring({b}, 1, k))) as bigint)"
            ),
        )
        .withColumn(
            f"{out}_jaro_ppm",
            F.expr(f"""
              case when {la} = 0 and {lb} = 0 then cast({PPM} as bigint)
                   when {m} = 0 then cast(0 as bigint)
                   else ({PPM} * (2 * {m} * {m} * {lb} + 2 * {m} * {m} * {la}
                                  + (2 * {m} - 2 * ({d} div 2)) * {la} * {lb}))
                        div (6 * {m} * {la} * {lb})
              end"""),
        )
        .withColumn(
            f"{out}_ppm",
            F.expr(f"""
              case when {out}_jaro_ppm > {JW_BOOST_PPM}
                   then {out}_jaro_ppm
                        + {l} * ({PPM} - {out}_jaro_ppm) div 10
                   else {out}_jaro_ppm end"""),
        )
    )
    return res.drop(la, lb, w, st, m, bm, d, l)


def o_jaro_winkler_ctes(pairs_cte: str = "pairs") -> str:
    """DuckDB twin: CTE chain scoring a ``{pairs_cte}`` relation with
    UNIQUE key (doc_a, doc_b, w_dist) and NON-NULL strings (ta, tb).
    Emits a final CTE ``jwscore`` (doc_a, doc_b, w_dist, jaro_ppm,
    jw_ppm). Returned WITHOUT a leading WITH; requires the statement
    to be WITH RECURSIVE."""
    cj = (
        "list_min(list_filter("
        "generate_series(greatest(1, (i + 1) - w), least(lb, (i + 1) + w)), "
        "j -> substr(tb, j, 1) = substr(ta, i + 1, 1) "
        "AND ((mask >> CAST(j - 1 AS INTEGER)) & 1) = 0))"
    )
    return f"""jrec AS (
  SELECT doc_a, doc_b, w_dist, ta, tb,
         CAST(length(ta) AS BIGINT) AS la, CAST(length(tb) AS BIGINT) AS lb,
         greatest(greatest(CAST(length(ta) AS BIGINT),
                           CAST(length(tb) AS BIGINT)) // 2 - 1, 0) AS w,
         CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS mask, '' AS am
  FROM {pairs_cte}
  -- twin of the Spark-side in-plan abort: a >64-char tb would
  -- silently alias mask bits (BIGINT << shifts >= 64) instead of
  -- failing loudly — corrupt the oracle, not crash it (ADVICE r8)
  WHERE CASE WHEN length(tb) > 64
             THEN CAST(error('jaro_winkler oracle: second string exceeds '
                             || 'the 64-char mask capacity') AS BOOLEAN)
             ELSE TRUE END
  UNION ALL
  SELECT doc_a, doc_b, w_dist, ta, tb, la, lb, w, i + 1,
         CASE WHEN cj IS NULL THEN mask
              ELSE mask | (CAST(1 AS BIGINT) << CAST(cj - 1 AS INTEGER)) END,
         CASE WHEN cj IS NULL THEN am ELSE am || substr(ta, CAST(i + 1 AS BIGINT), 1) END
  FROM (SELECT *, {cj} AS cj FROM jrec WHERE i < la) s
), jfinal AS (
  SELECT doc_a, doc_b, w_dist, ta, tb, la, lb, mask,
         am, CAST(length(am) AS BIGINT) AS m,
         array_to_string(list_transform(
           list_filter(generate_series(1, CAST(lb AS INTEGER)),
                       j -> ((mask >> CAST(j - 1 AS INTEGER)) & 1) = 1),
           j -> substr(tb, j, 1)), '') AS bm
  FROM jrec WHERE i = la
), jd AS (
  SELECT *,
         CAST(len(list_filter(generate_series(1, CAST(m AS INTEGER)),
              k -> substr(am, k, 1) <> substr(bm, k, 1))) AS BIGINT) AS d,
         CAST(len(list_filter(generate_series(1, 4),
              k -> k <= least(la, lb)
                   AND substr(ta, 1, k) = substr(tb, 1, k))) AS BIGINT) AS l
  FROM jfinal
), jjaro AS (
  SELECT doc_a, doc_b, w_dist, l,
         CASE WHEN la = 0 AND lb = 0 THEN CAST({PPM} AS BIGINT)
              WHEN m = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(({PPM} * (2 * m * m * lb + 2 * m * m * la
                                  + (2 * m - 2 * (d // 2)) * la * lb))
                        // (6 * m * la * lb) AS BIGINT)
         END AS jaro_ppm
  FROM jd
), jwscore AS (
  SELECT doc_a, doc_b, w_dist, jaro_ppm,
         CASE WHEN jaro_ppm > {JW_BOOST_PPM}
              THEN jaro_ppm + l * ({PPM} - jaro_ppm) // 10
              ELSE jaro_ppm END AS jw_ppm
  FROM jjaro
)"""


# ---------------------------------------------------------------------------
# American Soundex — the classic PHONETIC blocking key (Russell 1918,
# the NARA/Knuth TAOCP vol. 3 variant with the H/W bridging rule).
# One expression template shared by the Spark plan and the DuckDB
# oracle: every building block (upper / translate-with-deletion /
# regexp run-collapse / substr / replace / rpad) evaluates inside
# whole-stage codegen on the Spark side and identically in DuckDB —
# no UDF, no fold, no recursion. The ONLY dialect difference is that
# DuckDB's regexp_replace defaults to first-match-only and needs the
# explicit 'g' option (Spark always replaces globally).
#
# Algorithm, expressed as string algebra:
#   1. map EVERY letter to its code digit with vowels→'0' and H/W
#      DELETED (translate with a shorter replacement string deletes —
#      deleting H/W BEFORE the run-collapse is exactly the "letters
#      separated by h or w count as one" rule);
#   2. collapse runs of each digit ('1+'→'1', … '0+'→'0' — seven
#      backreference-free patterns, since RE2 has no backrefs);
#   3. drop the leading digit UNLESS the first letter was H/W (its
#      code was deleted, so the leading digit belongs to letter 2 —
#      the Hall→H400 case);
#   4. strip the vowel separators ('0'), keep 3 digits, pad with '0',
#      prepend the original first letter.
#
# Verified against the published classics in tests/test_strsim.py:
# Robert→R163, Rupert→R163, Ashcraft→A261 (the h/w rule), Tymczak→
# T522, Pfister→P236 (first-letter collapse), Honeyman→H555,
# Hall→H400 — plus a Hypothesis sweep vs an independent procedural
# Python implementation.

#: letters, in code-group order; H and W have NO replacement (deleted)
SOUNDEX_MATCH = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
SOUNDEX_REP = "111122222222334556000000"


def soundex_sql(col: str, dialect: str = "spark") -> str:
    """The Soundex code of ``col`` (a non-empty alphabetic word, any
    case) as one engine-portable SQL expression. ``dialect`` is
    'spark' or 'duck' — identical text except the 'g' regexp flag."""
    g = ", 'g'" if dialect == "duck" else ""
    m = f"translate(upper({col}), '{SOUNDEX_MATCH}', '{SOUNDEX_REP}')"
    for d in "0123456":
        m = f"regexp_replace({m}, '{d}+', '{d}'{g})"
    first = f"substring(upper({col}), 1, 1)"
    fc = f"translate({first}, '{SOUNDEX_MATCH}', '{SOUNDEX_REP}')"
    digits = (
        f"(CASE WHEN {fc} = '' THEN {m} ELSE substring({m}, 2) END)"
    )
    return (
        f"concat({first}, "
        f"rpad(substring(replace({digits}, '0', ''), 1, 3), 3, '0'))"
    )
