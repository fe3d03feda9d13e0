"""Model-based consensus check: a pure-Python model of the reference's
merge semantics (majority vote, insertion-order tie-break via source
priority, deviation, missing sources) vs the Spark plan, over ~40
randomized runs executed in ONE multi-run job.

This is the independent-implementation check the DuckDB oracle can't
give (the oracle SQL was written by the same author as the plan); the
model below follows the reference's dict-merge description
(polla_app/pipeline.py:135-225) directly.
"""

from __future__ import annotations

import datetime as dt
import random

from polla_spark.operators import consensus as C
from polla_spark.schemas import SOURCE_PAYLOAD

CATS = ["Loto Clásico", "Recargado", "Revancha", "Desquite", "Total estimado"]
VALS = [100, 100, 100, 250, 500, 999]  # repeats force vote collisions


def _gen_runs(rng: random.Random, n_runs: int):
    """run_id -> list of (source_name, priority, montos dict)."""
    runs = {}
    for i in range(n_runs):
        n_sources = rng.randint(1, 4)
        payloads = []
        for prio in range(n_sources):
            montos = {}
            for cat in CATS:
                if rng.random() < 0.75:
                    montos[cat] = rng.choice(VALS)
            if montos:
                payloads.append((f"s{prio}", prio, montos))
        if payloads:
            runs[f"r{i}"] = payloads
    return runs


def _model(payloads):
    """Reference semantics for one run: per-category winner/deviation/
    missing. Votes tally per value; winner = most votes, tie broken by
    the earliest (lowest-priority) source that reported the value."""
    entries: dict[str, list] = {}
    roster = [(prio, name) for name, prio, _ in payloads]
    for name, prio, montos in sorted(payloads, key=lambda x: x[1]):
        for cat, val in montos.items():
            if cat.lower().startswith("total"):
                continue
            entries.setdefault(cat, []).append((prio, name, val))
    out = {}
    for cat, rows in entries.items():
        votes: dict[int, dict] = {}
        for prio, name, val in rows:
            v = votes.setdefault(val, {"n": 0, "first": 10**9, "voters": []})
            v["n"] += 1
            v["first"] = min(v["first"], prio)
            v["voters"].append(name)
        ordered = sorted(votes.items(), key=lambda kv: (-kv[1]["n"], kv[1]["first"]))
        winner_val = ordered[0][0]
        n_values = len(votes)
        if n_values > 1:
            dev = (
                max(abs(v - winner_val) / winner_val for v in votes)
                if winner_val > 0
                else 0.0
            )
        else:
            dev = None
        responded = {name for _, name, _ in rows}
        missing = [n for p, n in sorted(roster) if n not in responded]
        out[cat] = {
            "winner": winner_val,
            "n_values": n_values,
            "dev": dev,
            "voters": sorted(votes[winner_val]["voters"]),
            "missing": missing,
        }
    return out


def test_consensus_matches_python_model(spark):
    rng = random.Random(20260813)
    runs = _gen_runs(rng, 40)
    rows = []
    for run_id, payloads in runs.items():
        for name, prio, montos in payloads:
            rows.append(
                {
                    "run_id": run_id,
                    "source_name": name,
                    "source_priority": prio,
                    "fuente": f"https://x/{name}",
                    "fetched_at": dt.datetime(2026, 8, 13, 12, 0),
                    "sha256": f"sha_{run_id}_{name}",
                    "estimado": True,
                    "user_agent": "ua",
                    "sorteo": 1,
                    "fecha": dt.date(2026, 8, 14),
                    "montos": montos,
                }
            )
    pdf = spark.createDataFrame(rows, SOURCE_PAYLOAD)
    cats = C.consensus(pdf)["categories"].collect()

    seen = set()
    for r in cats:
        want = _model(runs[r["run_id"]])[r["categoria"]]
        key = (r["run_id"], r["categoria"])
        seen.add(key)
        assert r["winner_valor"] == want["winner"], key
        assert r["n_values"] == want["n_values"], key
        assert sorted(r["winner_voters"]) == want["voters"], key
        assert list(r["missing_sources"]) == want["missing"], key
        if want["dev"] is None:
            assert r["max_deviation"] is None, key
        else:
            # Spark rounds half-up at 4 places; compare within half an ulp
            assert abs(r["max_deviation"] - round(want["dev"], 4)) <= 5.1e-5, key
    expected_keys = {
        (run_id, cat)
        for run_id, payloads in runs.items()
        for cat in _model(payloads)
    }
    assert seen == expected_keys
