"""Fellegi-Sunter probabilistic record linkage — ONE source of truth
for the field-agreement geometry, the millibit scoring weights, and
the exact-ppm EM training algebra shared by q206 (scoring), q207
(training), q208 (trained classification) and streaming twin #32.

Everything here is EXACT INTEGER arithmetic so Spark and the DuckDB
oracle hash identically:

- the four field comparisons are integer/set tests (never floats);
- EM runs in ppm (10^6-scaled) with floor division — products of a
  prior and four ppm likelihood terms stay under DECIMAL(38,0) /
  HUGEINT (1e6^5 = 1e30, ×1e6 = 1e36 < 1e38) and divide identically
  in both engines;
- classification thresholds are ppm posteriors (log-free: millibit
  log2 weights are display constants, never re-derived in-plan —
  log2 is not bit-portable across engines, the q186 lesson).

The reference (polla) has no record-linkage surface; this family is
declared north-star scope (SURVEY.md §2.6 dedup). Semantics follow
Fellegi & Sunter (1969 JASA) and Winkler's unsupervised EM, the loop
Splink-style toolkits run.

Field comparators (all over the q128 sorted-neighborhood pairs):

- ``src``: exact source equality;
- ``len``: lengths within ~10% of their mean (|la−lb|·20 ≤ la+lb);
- ``jac``: 3-token-shingle Jaccard ≥ 0.5 (2·|∩| ≥ |∪|);
- ``bg`` (r8): character-BIGRAM OVERLAP coefficient ≥ 0.5 on the
  24-char title prefix (2·|∩| ≥ min(|A|,|B|)) — the integer-exact
  stand-in for the Jaro-Winkler-class string comparators ER toolkits
  score names with (same monotone role: typo-tolerant, prefix-
  weighted by construction since the prefix IS the compared field;
  rational arithmetic only, hence oracle-checkable).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

PPM = 1_000_000

#: comparator order — g1..g4 everywhere (census keys, EM, oracles)
FS_FIELDS = ("src", "len", "jac", "bg")

#: chars of ``text`` the bigram comparator reads (the "name field")
BG_PREFIX = 24

_BG_TITLE = f"substring(text, 1, {BG_PREFIX})"
#: Spark expr: DISTINCT character bigrams of the title prefix.
#: greatest(·,1) keeps 0/1-char titles well-defined (one degenerate
#: short gram) identically in both engines. NULL text must yield a
#: NULL SET in BOTH engines (so the flag folds to the 0 pattern via
#: the CASE): without the explicit CASE, Spark builds [NULL] (size 1)
#: while DuckDB's list_distinct strips the NULL to [] (size 0) and
#: the overlap test diverges — r8 review finding, pinned in
#: tests/test_kernel_units.py.
BG_SPARK_EXPR = (
    f"CASE WHEN text IS NULL THEN NULL ELSE "
    f"array_distinct(transform(sequence(1, greatest(length({_BG_TITLE}) - 1, 1)), "
    f"i -> substring({_BG_TITLE}, i, 2))) END"
)
_O_BG_TITLE = f"substr(text, 1, {BG_PREFIX})"
BG_DUCK_EXPR = (
    f"CASE WHEN text IS NULL THEN NULL ELSE "
    f"list_distinct(list_transform(generate_series(1, greatest(length({_O_BG_TITLE}) - 1, 1)), "
    f"i -> substr({_O_BG_TITLE}, i, 2))) END"
)


def with_bigram_set(df: DataFrame) -> DataFrame:
    """documents-shaped frame → + ``bg`` = the title-prefix bigram
    set (the _with_shingle_sets discipline: one definition)."""
    return df.withColumn("bg", F.expr(BG_SPARK_EXPR))


#: DuckDB-side agreement tests over an ``_o_snm_neighbors`` frame
#: (shingles arrive as sa/sb, extra fields as <f>_a/<f>_b).
FS_SQL_AGREE = {
    "src": "source_a = source_b",
    "len": "abs(n_chars_a - n_chars_b) * 20 <= n_chars_a + n_chars_b",
    "jac": ("2 * len(list_intersect(sa, sb)) "
            ">= len(sa) + len(sb) - len(list_intersect(sa, sb))"),
    "bg": ("2 * len(list_intersect(bg_a, bg_b)) "
           ">= least(len(bg_a), len(bg_b))"),
}


def fs_agreements() -> list[Column]:
    """Spark twin of :data:`FS_SQL_AGREE`: the four field-agreement
    Columns over a ``_snm_neighbors(d, ("source", "n_chars", "bg"))``
    frame, in :data:`FS_FIELDS` order."""
    inter = F.size(F.array_intersect("sha", "shb"))
    un = F.size("sha") + F.size("shb") - inter
    bg_inter = F.size(F.array_intersect("bg_a", "bg_b"))
    return [
        F.col("source_a") == F.col("source_b"),
        F.abs(F.col("n_chars_a") - F.col("n_chars_b")) * 20
        <= F.col("n_chars_a") + F.col("n_chars_b"),
        2 * inter >= un,
        2 * bg_inter >= F.least(F.size("bg_a"), F.size("bg_b")),
    ]


def fs_flag_cols() -> list[Column]:
    """The agreement flags as EXPLICIT 0/1 longs (g1..g4) — CASE
    semantics, so a NULL comparison (NULL source/n_chars/text) folds
    into the 0 pattern exactly like the oracle's CASE...ELSE 0 and
    the census keeps its documented ≤2^4-row shape (ADVICE r7: a bare
    cast('long') would group NULL patterns separately)."""
    return [
        F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("long").alias(f"g{k}")
        for k, cond in enumerate(fs_agreements(), start=1)
    ]


def fs_sql_flag_select() -> str:
    """DuckDB twin of :func:`fs_flag_cols`: ``CASE WHEN … END AS gk``
    column list (no trailing comma)."""
    return ",\n         ".join(
        f"CASE WHEN {FS_SQL_AGREE[f]} THEN 1 ELSE 0 END AS g{k}"
        for k, f in enumerate(FS_FIELDS, start=1)
    )


# Millibit scoring weights for q206 — round(1000·log2(m/u)) /
# round(1000·log2((1−m)/(1−u))) for the documented (m, u) pairs,
# precomputed as integer constants shared verbatim by both engines:
#   source match:   m=0.50, u=0.05 -> +3322 / -926
#   length ~10%:    m=0.80, u=0.30 -> +1415 / -1807
#   jaccard >=0.5:  m=0.70, u=0.01 -> +6129 / -1722
#   bigram overlap: m=0.85, u=0.15 -> +2503 / -2503
FS_W = {
    "src": (3322, -926),
    "len": (1415, -1807),
    "jac": (6129, -1722),
    "bg": (2503, -2503),
}
FS_LINK, FS_POSSIBLE = 5000, 0  # millibit LLR thresholds (q206)

#: ppm EM priors (p = match prevalence, m/u per field — one shared
#: prior per side keeps the init census-independent)
EM_INIT = {"p": 100_000, "m": 700_000, "u": 300_000}

#: ppm POSTERIOR thresholds for trained classification (q208):
#: link at ≥ 0.9, possible at ≥ 0.1 — the standard Splink-style cut.
LINK_PPM, POSSIBLE_PPM = 900_000, 100_000

_N = len(FS_FIELDS)
_DEC = "CAST({} AS DECIMAL(38,0))"


def _pm_pu_exprs(prefix: str = "") -> tuple[str, str]:
    """The E-step's two product terms as Spark SQL strings over a
    frame carrying g1..g4 and {prefix}p/m_k/u_k ppm columns."""
    def term(g: str, m: str) -> str:
        return f"(CASE WHEN {g} = 1 THEN {m} ELSE {PPM} - {m} END)"

    pm = _DEC.format(f"{prefix}p")
    pu = _DEC.format(f"{PPM} - {prefix}p")
    for k in range(1, _N + 1):
        pm += f" * {term(f'g{k}', f'{prefix}m{k}')}"
        pu += f" * {term(f'g{k}', f'{prefix}u{k}')}"
    return pm, pu


def fs_posterior_expr(prefix: str = "") -> str:
    """Spark SQL expr: the pattern's ppm match posterior
    w = p·Πm · 10^6 div (p·Πm + (1−p)·Πu) — the E-step weight AND
    q208's classification score (same algebra, trained params)."""
    pm, pu = _pm_pu_exprs(prefix)
    return f"CAST(({pm}) * {PPM} div (({pm}) + ({pu})) AS LONG)"


def fs_em_round(census: DataFrame, params: DataFrame) -> DataFrame:
    """One Winkler EM round in exact ppm integers.

    ``census``: (g1..g4, c) agreement-pattern counts (≤2^4 rows);
    ``params``: 1-row (p, m1..m4, u1..u4) ppm frame. Returns the next
    round's 1-row params frame. All data-sized work happened in the
    census — this runs on ≤16 rows × a broadcast 1-row frame, so
    iteration cost is independent of corpus size.
    """
    j = census.crossJoin(F.broadcast(params))
    w = j.withColumn("w", F.expr(fs_posterior_expr()))
    agg = [
        F.expr(f"CAST(sum({_DEC.format('w')} * c) AS DECIMAL(38,0))").alias("sw"),
        F.expr(
            f"CAST(sum({_DEC.format(f'{PPM} - w')} * c) AS DECIMAL(38,0))"
        ).alias("snw"),
        F.sum("c").alias("n"),
    ]
    for k in range(1, _N + 1):
        agg.append(F.expr(
            f"CAST(sum({_DEC.format('w')} * c * g{k}) AS DECIMAL(38,0))"
        ).alias(f"swg{k}"))
        agg.append(F.expr(
            f"CAST(sum({_DEC.format(f'{PPM} - w')} * c * g{k}) AS DECIMAL(38,0))"
        ).alias(f"snwg{k}"))
    stats = w.agg(*agg)
    return stats.select(
        F.expr("CAST(sw div n AS LONG)").alias("p"),
        *[
            F.expr(f"CAST(swg{k} * {PPM} div sw AS LONG)").alias(f"m{k}")
            for k in range(1, _N + 1)
        ],
        *[
            F.expr(f"CAST(snwg{k} * {PPM} div snw AS LONG)").alias(f"u{k}")
            for k in range(1, _N + 1)
        ],
    )


def fs_em_params_py(
    census_rows: list[tuple], rounds: int = 2
) -> list[dict[str, int]]:
    """DRIVER-side twin of the :func:`fs_em_round` recursion: the same
    Winkler EM in exact ppm integers over an already-collected census,
    in pure Python (r13, guide §1.2). Python ints are arbitrary
    precision, every operand is non-negative, and ``//`` (floor) equals
    Spark's DECIMAL ``div`` (truncate) on non-negatives, so the params
    are BIT-identical to the LocalRelation recursion — pinned against
    :func:`fs_em_round` on crafted and corpus censuses in
    tests/test_fs_em_py.py. Why it exists: the LocalRelation form
    re-embedded ~14 exchanges of BroadcastNestedLoopJoin/HashAggregate
    plan per EM round into EVERY downstream action (measured r13:
    q215's final plan carried 110 Exchange mentions, 6 copies of the
    EM chain), all to reduce ≤2^N rows the driver already holds.

    ``census_rows``: (g1..gN, c) tuples/Rows. Returns the param dicts
    (keys ``p``, ``m1..mN``, ``u1..uN``) for init + each round. A zero
    divisor yields ``None`` for that field, mirroring Spark's NULL on
    decimal div-by-zero (degenerate censuses only)."""
    census = [
        (tuple(int(r[k]) for k in range(_N)), int(r[_N])) for r in census_rows
    ]
    params: dict[str, int] = {
        "p": EM_INIT["p"],
        **{f"m{k}": EM_INIT["m"] for k in range(1, _N + 1)},
        **{f"u{k}": EM_INIT["u"] for k in range(1, _N + 1)},
    }
    out = [dict(params)]
    for _ in range(rounds):
        sw = snw = n = 0
        swg = [0] * _N
        snwg = [0] * _N
        for gs, c in census:
            w = fs_posterior_ppm_py(gs, params)
            sw += w * c
            snw += (PPM - w) * c
            n += c
            for i, g in enumerate(gs):
                if g:
                    swg[i] += w * c
                    snwg[i] += (PPM - w) * c
        params = {
            "p": sw // n if n else None,
            **{
                f"m{k}": (swg[k - 1] * PPM // sw if sw else None)
                for k in range(1, _N + 1)
            },
            **{
                f"u{k}": (snwg[k - 1] * PPM // snw if snw else None)
                for k in range(1, _N + 1)
            },
        }
        out.append(dict(params))
    return out


def fs_posterior_ppm_py(gs: tuple, params: dict[str, int]) -> int:
    """DRIVER-side twin of :func:`fs_posterior_expr`: the pattern's
    ppm match posterior w = p·Πm·10^6 // (p·Πm + (1−p)·Πu) in exact
    Python ints (same non-negative floor-div argument as
    :func:`fs_em_params_py`, pinned by the same test)."""
    pm = params["p"]
    pu = PPM - params["p"]
    for k in range(1, _N + 1):
        pm *= params[f"m{k}"] if gs[k - 1] == 1 else PPM - params[f"m{k}"]
        pu *= params[f"u{k}"] if gs[k - 1] == 1 else PPM - params[f"u{k}"]
    return pm * PPM // (pm + pu)


def fs_init_params(spark) -> DataFrame:
    """The 1-row ppm prior frame (:data:`EM_INIT`)."""
    cols = "p long, " + ", ".join(
        f"m{k} long" for k in range(1, _N + 1)
    ) + ", " + ", ".join(f"u{k} long" for k in range(1, _N + 1))
    return spark.createDataFrame(
        [(EM_INIT["p"], *([EM_INIT["m"]] * _N), *([EM_INIT["u"]] * _N))],
        cols,
    )


def fs_param_cols() -> list[str]:
    """The parameter report columns (p, m1..mN, u1..uN) — derived
    from :data:`FS_FIELDS` so a comparator addition cannot leave a
    consumer (q207, the streaming finisher) at the old width."""
    return (
        ["p"]
        + [f"m{k}" for k in range(1, _N + 1)]
        + [f"u{k}" for k in range(1, _N + 1)]
    )


def fs_census_flag_cols() -> list[str]:
    """The census pattern-key columns (g1..gN), same derivation."""
    return [f"g{k}" for k in range(1, _N + 1)]


def fs_em_report(spark, census: DataFrame, rounds: int = 2) -> DataFrame:
    """The (round, p, m…, u…) training report — init + ``rounds`` EM
    rounds over ``census``. ONE assembly shared by batch q207 and the
    streaming twin's finisher (a hardcoded column list in either
    would silently drop fields when a comparator is added — r8 review
    finding).

    r12 materialized the census (≤2^N rows by construction)
    DRIVER-side so the EM recursion ran over LocalRelations; r13 runs
    the recursion ITSELF on the driver (:func:`fs_em_params_py`,
    bit-pinned against the :func:`fs_em_round` expression form): the
    LocalRelation recursion still planned ~2 exchanges + a
    BroadcastNestedLoopJoin per round into the report action — ~8
    scheduled stages for ≤16 rows of state (measured r13: q207 11
    jobs / 22 stages, 1.5 s of plan construction at sf0.1). Now the
    one data-sized action is the census collect and the report is a
    LocalRelation (guide §1.2)."""
    cols = fs_param_cols()
    rows = [
        (i, *[None if p[c] is None else int(p[c]) for c in cols])
        for i, p in enumerate(
            fs_em_params_py(census.collect(), rounds=rounds)
        )
    ]
    schema = "round int, " + ", ".join(f"{c} long" for c in cols)
    return spark.createDataFrame(rows, schema).orderBy("round")


def fs_classify(spark, flags: DataFrame, *, ordered: bool = True) -> DataFrame:
    """q208's trained-classification tail over a ``(doc_a, doc_b,
    w_dist, g1..g4)`` frame: census → 2 exact-ppm EM rounds →
    posterior table → broadcast classification. ONE assembly shared
    by batch q208 and streaming twin #35's finisher (the
    fs_em_report discipline: a threshold or comparator change moves
    both paths together).

    The census is ≤16 rows and is materialized DRIVER-side (one
    deliberate action, the q205/q208 disclosure); the EM rounds and
    the per-pattern posteriors run in exact-integer Python on those
    rows (r13, :func:`fs_em_params_py` — bit-pinned against the
    expression form in tests/test_fs_em_py.py), so the posterior
    table downstream actions broadcast is a plain ≤16-row
    LocalRelation instead of a re-planned BroadcastNestedLoopJoin +
    HashAggregate chain per plan reference (measured r13: the chain
    put 32/110 Exchange mentions into q214/q215's final plans).

    The ``flags`` frame itself is LOCAL-CHECKPOINTED (r12, guide
    §1.2/§3.3/§5): it is the pairs-grain NARROW projection —
    (doc_a, doc_b, w_dist, g1..g4), seven small ints per candidate
    pair, one-to-two orders of magnitude under the corpus text bytes
    at any scale — while recomputing it costs the full scan →
    shingle-set → SNM-window pipeline (the heavy text pass AND its
    shingle-array exchange). Before r12 the census collect and the
    final classification each ran that pipeline once per consumer
    (q208 2×, q214/q215 3-4× via the component collects), and every
    one of those actions re-ran Catalyst + codegen over the full SNM
    tree; the checkpoint computes the pipeline ONCE and truncates
    the lineage to a LogicalRDD leaf. r13 makes it LAZY
    (``eager=False``, VERDICT r12 #1): identical truncation, but the
    materialization rides the census collect's own job instead of a
    separate prior action — one barrier, not two. Tradeoff,
    disclosed: checkpointed partitions are not recomputable on
    executor loss (the operators/graph.py per-round caveat) — for a
    lost-task-restarts-the-query batch report that is the right
    trade at any scale. Read-side streaming finishers (#35-#37) pass
    state-table-sized frames where the checkpoint is equally safe.

    ``ordered=False`` skips the report ORDER BY for composing
    consumers (the q214/q215 er tier): their filter → components →
    aggregate tail is order-independent, while the sort is a global
    pairs-grain range exchange that rode along once per plan
    reference (measured r13: two copies inside q214's final union
    plus one under the component probe). The REPORT queries (q208,
    twin #35) keep the ordered output contract — their result is the
    ordered pair table itself."""
    gcols = fs_census_flag_cols()
    flags = flags.localCheckpoint(eager=False)
    census_lazy = flags.groupBy(*gcols).agg(F.count("*").alias("c"))
    census_rows = census_lazy.collect()
    r2 = fs_em_params_py(census_rows, rounds=2)[-1]
    post_rows = [
        tuple(
            [int(r[k]) for k in range(_N)]
            + [fs_posterior_ppm_py(tuple(r[k] for k in range(_N)), r2)]
        )
        for r in census_rows
    ]
    post = spark.createDataFrame(
        post_rows, ", ".join(f"{g} long" for g in gcols) + ", w_ppm long"
    )
    verdict = (
        F.when(F.col("w_ppm") >= LINK_PPM, "link")
        .when(F.col("w_ppm") >= POSSIBLE_PPM, "possible")
        .otherwise("non_link")
    )
    out = (
        flags.join(F.broadcast(post), gcols)
        .select("doc_a", "doc_b", "w_dist", "w_ppm")
        .withColumn("verdict", verdict)
    )
    return out.orderBy("doc_a", "doc_b", "w_dist") if ordered else out


def er_entities(classified: DataFrame) -> DataFrame:
    """Trained ``link`` verdicts → entity merge census: transitive
    closure over the sparse link graph (the shared
    ``operators/graph.connected_components``), one row per entity
    with the component-min canonical id, size, n_merged and an exact
    membership checksum. ONE assembly shared by batch q214 and
    streaming twin #36's finisher. ``possible`` pairs go to clerical
    review in the Fellegi-Sunter decision model — never auto-merge."""
    return (
        er_members(classified)
        .groupBy("entity")
        .agg(
            F.count("*").alias("size"),
            F.sum("node").cast("long").alias("sum_members"),
        )
        .select(
            "entity",
            "size",
            (F.col("size") - F.lit(1)).alias("n_merged"),
            "sum_members",
        )
        .orderBy("entity")
    )


def er_golden_records(classified: DataFrame, docs: DataFrame) -> DataFrame:
    """Golden-record SURVIVORSHIP — the merge step after
    :func:`er_entities` clusters the trained ``link`` verdicts: one
    canonical output record per entity, with each attribute picked by
    a deterministic survivorship rule (the MDM "most complete / most
    frequent" policy):

    - ``rep_doc`` / ``rep_chars``: the representative text is the
      LONGEST member's (max ``n_chars``), tie-break lowest doc_id —
      the "most complete attribute" rule;
    - ``src_surv`` / ``src_votes``: the surviving ``source`` is the
      modal value among members, tie-break lexicographically smallest
      — the "most frequent attribute" rule;
    - ``size`` / ``sum_chars``: merge census + an exact checksum.

    ONE assembly shared by batch q215 and streaming twin #37's
    finisher. 100 TB shape: the member table is link-graph-sized
    (near-dup-sparse), so it BROADCASTS onto the corpus scan — the
    corpus is probed once by a broadcast hash join and never
    shuffles; every window/agg downstream runs on member-sized data.

    Every tie-break is total (doc_id unique; source a key of its
    group), so row_number picks are deterministic and oracle-exact.
    """
    from pyspark.sql import Window

    members = er_members(classified)
    mem = docs.join(
        F.broadcast(members), docs["doc_id"] == members["node"]
    ).select("entity", "doc_id", "source", "n_chars")
    w_rep = Window.partitionBy("entity").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    rep = (
        mem.withColumn("rn", F.row_number().over(w_rep))
        .filter(F.col("rn") == 1)
        .select(
            "entity",
            F.col("doc_id").alias("rep_doc"),
            F.col("n_chars").alias("rep_chars"),
        )
    )
    w_src = Window.partitionBy("entity").orderBy(
        F.col("src_votes").desc(), F.col("source")
    )
    smode = (
        mem.groupBy("entity", "source")
        .agg(F.count("*").alias("src_votes"))
        .withColumn("rn", F.row_number().over(w_src))
        .filter(F.col("rn") == 1)
        .select("entity", F.col("source").alias("src_surv"), "src_votes")
    )
    stats = mem.groupBy("entity").agg(
        F.count("*").alias("size"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    return (
        # rep/smode are ≤ member-sized (one row per entity): broadcast
        # so the final assembly never exchanges — the static planner
        # can't size post-agg frames and would pick sort-merge
        stats.join(F.broadcast(rep), "entity")
        .join(F.broadcast(smode), "entity")
        .select(
            "entity", "size", "rep_doc", "rep_chars",
            "src_surv", "src_votes", "sum_chars",
        )
        .orderBy("entity")
    )


def er_members(classified: DataFrame) -> DataFrame:
    """(node, entity) membership of the trained link graph — the
    component pass :func:`er_entities` aggregates, exposed so
    survivorship (:func:`er_golden_records`) can join members back to
    their source records without re-deriving the closure."""
    from ..operators.graph import connected_components

    links = classified.filter(F.col("verdict") == "link").select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    nodes = (
        links.select(F.col("src").alias("node"))
        .unionByName(links.select(F.col("dst").alias("node")))
        .distinct()
    )
    return connected_components(nodes, links).select(
        "node", F.col("label").alias("entity")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle generators (the CTE chain O207/O208 are assembled from)

def _o_pm_pu(src: str) -> tuple[str, str]:
    def term(g: str, m: str) -> str:
        return f"(CASE WHEN {g} = 1 THEN {src}.{m} ELSE {PPM} - {src}.{m} END)"

    pm = f"CAST({src}.p AS HUGEINT)"
    pu = f"CAST({PPM} - {src}.p AS HUGEINT)"
    for k in range(1, _N + 1):
        pm += f" * {term(f'g{k}', f'm{k}')}"
        pu += f" * {term(f'g{k}', f'u{k}')}"
    return pm, pu


def o_fs_posterior(src: str) -> str:
    """DuckDB twin of :func:`fs_posterior_expr` over params CTE ``src``."""
    pm, pu = _o_pm_pu(src)
    return f"CAST(({pm}) * {PPM} // (({pm}) + ({pu})) AS HUGEINT)"


def o_fs_em_ctes(rounds: int = 2) -> str:
    """The p0, w1, p1, … w{rounds}, p{rounds} CTE bodies (expects a
    ``census`` CTE with g1..g4, c). Returned WITHOUT a leading WITH —
    append after the caller's census CTE."""
    gs = ", ".join(f"g{k}" for k in range(1, _N + 1))
    p0 = (
        f"p0 AS (\n  SELECT {EM_INIT['p']} AS p, "
        + ", ".join(f"{EM_INIT['m']} AS m{k}" for k in range(1, _N + 1))
        + ",\n         "
        + ", ".join(f"{EM_INIT['u']} AS u{k}" for k in range(1, _N + 1))
        + "\n)"
    )
    parts = [p0]
    for r in range(1, rounds + 1):
        prev = f"p{r - 1}"
        parts.append(
            f"w{r} AS (\n  SELECT {gs}, c,\n         "
            f"{o_fs_posterior(prev)} AS w\n"
            f"  FROM census CROSS JOIN {prev}\n)"
        )
        m_lines = ",\n         ".join(
            f"CAST(SUM(w * c * g{k}) * {PPM} // SUM(w * c) AS BIGINT) AS m{k}"
            for k in range(1, _N + 1)
        )
        u_lines = ",\n         ".join(
            f"CAST(SUM(({PPM} - w) * c * g{k}) * {PPM} "
            f"// SUM(({PPM} - w) * c) AS BIGINT) AS u{k}"
            for k in range(1, _N + 1)
        )
        parts.append(
            f"p{r} AS (\n  SELECT CAST(SUM(w * c) // SUM(c) AS BIGINT) AS p,\n"
            f"         {m_lines},\n         {u_lines}\n  FROM w{r}\n)"
        )
    return ", ".join(parts)


# ---------------------------------------------------------------------------
# Streaming twins #32/#33: per-lang-block kernels.

FS_CENSUS_SCHEMA = "lang string, g1 long, g2 long, g3 long, g4 long, c long"
_FS_CENSUS_STATE = "seen long"

SNM_PAIR_SCHEMA = (
    "doc_a long, doc_b long, w_dist long, title_a string, title_b string"
)


def make_snm_pair_kernel(window: int = 3):
    """``applyInPandasWithState`` kernel for twin #33: one WHOLE lang
    block in → its sorted-neighborhood candidate PAIRS out, carrying
    the title fields. Same atomicity contract (and the same abort on
    a split block) as :func:`make_fs_census_kernel`; deliberately
    emits UNSCORED pairs — the finisher scores them through the SAME
    ``functions/strsim.with_jaro_winkler`` operator batch q211 runs,
    so the twin cannot drift from the batch comparator by
    construction (nothing is re-implemented)."""

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        lang = key[0]
        if state.exists:
            raise RuntimeError(
                f"snm pairs: lang block {lang!r} split across micro-batches "
                "(whole-block atomicity contract)"
            )
        state.update((1,))
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(
            ["n_chars", "doc_id"], na_position="first"
        ).reset_index(drop=True)
        out = []
        n = len(rows)
        for i in range(n):
            for d in range(1, window + 1):
                if i + d >= n:
                    break
                a, b = rows.iloc[i], rows.iloc[i + d]
                out.append((int(a["doc_id"]), int(b["doc_id"]), d,
                            a["title"], b["title"]))
        yield pd.DataFrame(
            out, columns=["doc_a", "doc_b", "w_dist", "title_a", "title_b"]
        )

    return fn


def snm_flagged_pairs(rows, window: int = 3) -> list[tuple]:
    """Enumerate a SORTED lang block's sorted-neighborhood pairs with
    their 4 agreement flags: ``(doc_a, doc_b, w_dist, g1, g2, g3,
    g4)`` per pair. ONE enumerator shared by the census kernel (twin
    #32 sums it) and the flagged-pair kernel (twin #35 emits it) —
    the streamed census and the streamed pair stream cannot disagree
    about what a pair or a flag is, because both are this function.

    NULL semantics mirror the batch CASE exprs: any NULL operand
    folds the flag to 0 (arrays arrive as numpy objects — explicit
    None tests, never truthiness)."""
    import pandas as pd

    def flags(i: int, j: int) -> tuple[int, int, int, int]:
        a, b = rows.iloc[i], rows.iloc[j]
        src = int(
            a["source"] is not None and b["source"] is not None
            and a["source"] == b["source"]
        )
        if a["n_chars"] is None or b["n_chars"] is None or \
                pd.isna(a["n_chars"]) or pd.isna(b["n_chars"]):
            ln = 0
        else:
            la, lb = int(a["n_chars"]), int(b["n_chars"])
            ln = int(abs(la - lb) * 20 <= la + lb)
        if a["sh"] is None or b["sh"] is None:
            jac = 0
        else:
            sa, sb = set(a["sh"]), set(b["sh"])
            inter = len(sa & sb)
            jac = int(2 * inter >= len(sa) + len(sb) - inter)
        if a["bg"] is None or b["bg"] is None:
            bg = 0
        else:
            ba, bb = set(a["bg"]), set(b["bg"])
            bg = int(2 * len(ba & bb) >= min(len(ba), len(bb)))
        return (src, ln, jac, bg)

    out = []
    n = len(rows)
    for i in range(n):
        for d in range(1, window + 1):
            if i + d >= n:
                break
            out.append(
                (
                    int(rows.iloc[i]["doc_id"]),
                    int(rows.iloc[i + d]["doc_id"]),
                    d,
                    *flags(i, i + d),
                )
            )
    return out


def make_fs_census_kernel(window: int = 3):
    """``applyInPandasWithState`` kernel: one WHOLE lang-block in →
    that block's agreement-pattern census rows out.

    ATOMICITY CONTRACT (q189's whole-unit discipline, stated
    explicitly per the r7 verdict): sorted-neighborhood pairs depend
    on the complete in-block sort, so each lang block must arrive
    WHOLE in a single micro-batch — the kernel keeps a "seen" flag in
    state and ABORTS if a lang shows up in a second batch, rather
    than silently emitting a census over half-derived neighborhoods.
    Pattern counts themselves are plain sums, merge-closed across
    blocks/batches — which is why the census (and the trained
    parameters, a deterministic function of it) streams exactly.

    Input rows carry doc_id, n_chars, source, sh, bg — the SET
    columns are computed by the SAME Spark exprs as the batch path
    (``_with_shingle_sets`` / :data:`BG_SPARK_EXPR`) in the streaming
    projection, so the kernel never re-tokenizes (no Java-vs-Python
    regex drift); it only sorts, leads, and compares sets.
    """

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        lang = key[0]
        if state.exists:
            raise RuntimeError(
                f"fs census: lang block {lang!r} split across micro-batches "
                "(whole-block atomicity contract)"
            )
        state.update((1,))

        rows = pd.concat(list(pdfs), ignore_index=True)
        # the batch window's sort: n_chars NULLS FIRST, then doc_id
        rows = rows.sort_values(
            ["n_chars", "doc_id"], na_position="first"
        ).reset_index(drop=True)

        census: dict[tuple[int, int, int, int], int] = {}
        for *_pair, g1, g2, g3, g4 in snm_flagged_pairs(rows, window):
            k = (g1, g2, g3, g4)
            census[k] = census.get(k, 0) + 1
        out = [(lang, *k, c) for k, c in sorted(census.items())]
        yield pd.DataFrame(
            out, columns=["lang", "g1", "g2", "g3", "g4", "c"]
        )

    return fn


FS_PAIR_SCHEMA = (
    "doc_a long, doc_b long, w_dist long, "
    "g1 long, g2 long, g3 long, g4 long"
)


def make_fs_pair_kernel(window: int = 3):
    """``applyInPandasWithState`` kernel for twin #35: one WHOLE lang
    block in → its FLAGGED sorted-neighborhood pairs out — the same
    atomicity contract and the same :func:`snm_flagged_pairs`
    enumerator as the census kernel, emitted per-pair instead of
    summed. The finisher re-derives the census from this stream by
    the same sums and classifies every pair through the identical
    batch :func:`fs_classify` — q208 streamed with nothing
    re-implemented."""

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        lang = key[0]
        if state.exists:
            raise RuntimeError(
                f"fs pairs: lang block {lang!r} split across micro-batches "
                "(whole-block atomicity contract)"
            )
        state.update((1,))
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(
            ["n_chars", "doc_id"], na_position="first"
        ).reset_index(drop=True)
        yield pd.DataFrame(
            snm_flagged_pairs(rows, window),
            columns=["doc_a", "doc_b", "w_dist", "g1", "g2", "g3", "g4"],
        )

    return fn


#: twin #34's bounded state: the last ≤w rows of the sorted block
SNM_SORTED_STATE = "nc array<long>, ids array<long>, titles array<string>"


def make_snm_sorted_kernel(window: int = 3):
    """``applyInPandasWithState`` kernel for twin #34 — the classic
    BOUNDED-STATE streaming sorted-neighborhood form: state per lang
    is only the LAST ``window`` rows of the sorted order (O(w), not
    O(block)), so a lang block may span any number of micro-batches.

    CONTRACT (the dual of the whole-block kernels' atomicity): rows
    of a lang must ARRIVE in block-sort order across micro-batches —
    each batch is self-sorted (intra-batch order is free), but a
    batch's first row must not sort before the previous batch's last
    row; the kernel compares against the stored tail and ABORTS on a
    violation instead of silently dropping neighborhoods. Under the
    contract the emitted pair set is IDENTICAL to the whole-block
    kernel's by construction: the pair (i, i+d) is emitted when row
    i+d arrives, pairing it with the d-th row back in the buffer.

    This is the 100 TB streaming path the r8 verdict asked for —
    twins #32/#33/#35 hold a whole lang block per group (disclosed
    O(block) kernel memory; batch is the bulk path), while this
    kernel's state is w rows regardless of block size."""

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def k_of(nc, did):
            # the batch sort key: n_chars NULLS FIRST, then doc_id
            return (nc is not None, nc if nc is not None else 0, did)

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(
            ["n_chars", "doc_id"], na_position="first"
        ).reset_index(drop=True)
        if state.exists:
            ncs, ids, titles = state.get
            buf = pd.DataFrame(
                {
                    "n_chars": [None if n is None else int(n) for n in ncs],
                    "doc_id": [int(i) for i in ids],
                    "title": list(titles),
                }
            )
        else:
            buf = rows.iloc[0:0]
        # sorted-arrival contract: the kernel self-sorts each batch,
        # so only the batch/state BOUNDARY can violate — one scalar
        # comparison replaces the per-row check (r9 verdict task #8:
        # the sequential recurrence is the buffer carry, and shifts
        # express it, so the per-row Python loop was never inherent)
        if len(buf) and len(rows):
            r0 = rows.iloc[0]
            nc0 = None if pd.isna(r0["n_chars"]) else int(r0["n_chars"])
            tl = buf.iloc[-1]
            tn = None if pd.isna(tl["n_chars"]) else int(tl["n_chars"])
            if k_of(nc0, int(r0["doc_id"])) < k_of(tn, int(tl["doc_id"])):
                raise RuntimeError(
                    f"snm sorted: lang block {key[0]!r} violated the "
                    "sorted-arrival contract (row sorts before the "
                    "previous batch's tail)"
                )
        # vectorized pair emission: in the (state-tail + batch)
        # concatenation, arriving row i pairs with rows i-1..i-w —
        # one shift per distance, masked to (i is a batch row) AND
        # (the d-back neighbor exists); identical pair set to the
        # per-row form by construction
        cat = pd.concat([buf, rows], ignore_index=True)
        m = len(buf)
        parts = []
        for d in range(1, window + 1):
            a = cat.shift(d)
            lo = max(m, d)
            if lo >= len(cat):
                continue
            sel = cat.index >= lo
            parts.append(
                pd.DataFrame(
                    {
                        "doc_a": a.loc[sel, "doc_id"].astype("int64").values,
                        "doc_b": cat.loc[sel, "doc_id"].astype("int64").values,
                        "w_dist": d,
                        "title_a": a.loc[sel, "title"].values,
                        "title_b": cat.loc[sel, "title"].values,
                        "_i": cat.index[sel],
                    }
                )
            )
        if parts:
            out = (
                pd.concat(parts, ignore_index=True)
                .sort_values(["_i", "w_dist"])
                .drop(columns="_i")
                .reset_index(drop=True)
            )
        else:
            out = pd.DataFrame(
                columns=["doc_a", "doc_b", "w_dist", "title_a", "title_b"]
            )
        tail = cat.tail(window)
        state.update((
            [None if pd.isna(v) else int(v) for v in tail["n_chars"]],
            [int(v) for v in tail["doc_id"]],
            # mirror the n_chars handling: str(NaN) would corrupt a
            # NULL title to the literal "None" across micro-batches
            [None if pd.isna(v) else str(v) for v in tail["title"]],
        ))
        yield out

    return fn
