"""Registry invariants: unique names, oracle coverage, and the
family-interleaved ordering a time-budgeted correctness sweep relies
on (a truncated sweep must still sample every family)."""

from __future__ import annotations

from polla_spark.plans import consensus_q, llmdata, registry, relational, windows_q


def test_registry_names_unique_and_oracled():
    reg = registry()
    names = list(reg)
    assert len(names) == len(set(names)) == 109
    no_oracle = [n for n, q in reg.items() if q.oracle is None]
    # only the HLL sketch is rows-only by design
    assert no_oracle == ["q38_approx_count_distinct"]


def test_registry_interleaves_families():
    fam_of = {}
    for mod, fam in (
        (relational, "rel"),
        (consensus_q, "consensus"),
        (llmdata, "llm"),
        (windows_q, "win"),
    ):
        for q in mod.QUERIES:
            fam_of[q.name] = fam
    names = list(registry())
    # round-robin: every 8-query prefix already covers all 4 families,
    # and the first 50 (round 1's truncation point) cover them many
    # times over
    assert {fam_of[n] for n in names[:8]} == {"rel", "consensus", "llm", "win"}
    first50 = [fam_of[n] for n in names[:50]]
    assert min(first50.count(f) for f in ("rel", "consensus", "llm", "win")) >= 5


def test_driver_contract_exposes_registry():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    reg = registry()
    assert set(qs) == set(reg)
    assert set(oracles) == {n for n, q in reg.items() if q.oracle is not None}
