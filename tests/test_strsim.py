"""Jaro-Winkler comparator (functions/strsim.py) pinned against a
from-scratch Python implementation — the q207/q210 discipline: the
DuckDB oracle proves cross-engine portability, an INDEPENDENT
reference proves the algorithm itself."""

from __future__ import annotations

import random

PPM = 1_000_000


def _py_jaro_winkler(a: str, b: str) -> tuple[int, int]:
    """Classic Jaro (greedy windowed matching, transpositions) +
    Winkler prefix boost above 0.7, in the same exact ppm floor
    arithmetic the engine documents. Written from the published
    algorithm, no polla_spark code."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return PPM, PPM
    w = max(max(la, lb) // 2 - 1, 0)
    used = [False] * lb
    am = []
    for i in range(la):
        for j in range(max(0, i - w), min(lb, i + w + 1)):
            if not used[j] and b[j] == a[i]:
                used[j] = True
                am.append(a[i])
                break
    m = len(am)
    if m == 0:
        return 0, 0
    bm = [b[j] for j in range(lb) if used[j]]
    d = sum(1 for k in range(m) if am[k] != bm[k])
    t = d // 2  # canonical integer convention (jellyfish/strsim)
    jaro = (PPM * (2 * m * m * lb + 2 * m * m * la
                   + (2 * m - 2 * t) * la * lb)) // (6 * m * la * lb)
    pref = 0
    for k in range(min(4, la, lb)):
        if a[k] == b[k]:
            pref += 1
        else:
            break
    jw = jaro + pref * (PPM - jaro) // 10 if jaro > 700_000 else jaro
    return jaro, jw


def _spark_scores(spark, cases):
    from polla_spark.functions.strsim import with_jaro_winkler

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(cases)],
        "pid long, ta string, tb string",
    )
    return {
        r["pid"]: (r["jw_jaro_ppm"], r["jw_ppm"])
        for r in with_jaro_winkler(df, "ta", "tb").collect()
    }


def test_jaro_winkler_published_classics(spark):
    """The literature's worked examples, exact in ppm: Winkler's
    MARTHA/MARHTA (0.944/0.961), DIXON/DICKSONX (0.767/0.813),
    DWAYNE/DUANE (0.822/0.840)."""
    cases = [("martha", "marhta"), ("dixon", "dicksonx"),
             ("dwayne", "duane")]
    got = _spark_scores(spark, cases)
    assert got[0] == (944444, 961110)
    assert got[1] == (766666, 813332)
    assert got[2] == (822222, 839999)


def test_jaro_winkler_edge_contract(spark):
    """Documented conventions: both empty -> 1.0; one empty or no
    matches -> 0; identity -> 1.0; window 0 means adjacent swaps of a
    2-char string do NOT match (w = max(2,2)//2 - 1 = 0)."""
    cases = [("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
             ("ab", "ba")]
    got = _spark_scores(spark, cases)
    want = [_py_jaro_winkler(a, b) for a, b in cases]
    assert [got[i] for i in range(len(cases))] == want
    assert got[0] == (PPM, PPM) and got[1] == (0, 0) and got[4] == (0, 0)


def test_jaro_winkler_randomized_vs_python(spark):
    """200 seeded random pairs (lengths 0..16, small alphabet so
    matches/transpositions are dense) — Spark fold == the independent
    Python reference on every pair, jaro and jw both."""
    rng = random.Random(20260815)
    alpha = "abcdef "
    cases = []
    for _ in range(200):
        n1, n2 = rng.randint(0, 16), rng.randint(0, 16)
        cases.append((
            "".join(rng.choice(alpha) for _ in range(n1)).strip(),
            "".join(rng.choice(alpha) for _ in range(n2)).strip(),
        ))
    got = _spark_scores(spark, cases)
    for i, (a, b) in enumerate(cases):
        assert got[i] == _py_jaro_winkler(a, b), (i, a, b, got[i])


def test_jaro_winkler_aborts_past_mask_capacity(spark):
    """The 64-char cap on the second string is ENFORCED in-plan
    (shiftleft wraps its shift amount mod 64 — a 65th position would
    silently alias position 1), and the guard is NULL-tolerant
    (Catalyst reorders filters, so it can see pre-not-null rows)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from polla_spark.functions.strsim import with_jaro_winkler

    ok = spark.createDataFrame(
        [("abc", "x" * 64), ("abc", None)], "ta string, tb string"
    )
    rows = with_jaro_winkler(ok, "ta", "tb").collect()  # 64 + NULL pass
    assert len(rows) == 2
    bad = spark.createDataFrame([("abc", "x" * 65)], "ta string, tb string")
    with pytest.raises((SparkRuntimeException, Py4JJavaError),
                       match="64-char mask"):
        with_jaro_winkler(bad, "ta", "tb").collect()


def test_oracle_ctes_abort_past_mask_capacity():
    """The DuckDB oracle chain carries a twin of the Spark-side
    64-char abort: a >64-char tb raises instead of silently aliasing
    mask bits (BIGINT << wraps at shift >= 64) — a contract violation
    must crash the oracle, not corrupt it (ADVICE r8)."""
    import duckdb
    import pytest

    from polla_spark.functions.strsim import o_jaro_winkler_ctes

    con = duckdb.connect()
    sql = (
        "WITH RECURSIVE pairs AS (SELECT 1 AS doc_a, 2 AS doc_b, "
        "0 AS w_dist, 'abc' AS ta, {tb} AS tb), "
        + o_jaro_winkler_ctes("pairs")
        + " SELECT * FROM jwscore"
    )
    ok = con.execute(sql.format(tb=f"'{'x' * 64}'")).fetchall()
    assert len(ok) == 1
    with pytest.raises(duckdb.Error, match="64-char mask"):
        con.execute(sql.format(tb=f"'{'x' * 65}'")).fetchall()


def test_q211_scores_match_python_on_corpus(spark):
    """q211's report re-scored by the Python reference: every
    (pair -> jaro/jw) row agrees, titles recomputed independently
    from the parquet."""
    import os

    import duckdb

    from polla_spark.plans.llmdata import _JW_TITLE, q211_jaro_winkler

    sf = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    titles = dict(con.execute(
        f"SELECT doc_id, substr(text, 1, {_JW_TITLE}) "
        f"FROM read_parquet('{sf}/documents.parquet') WHERE text IS NOT NULL"
    ).fetchall())
    rows = q211_jaro_winkler(spark, sf).collect()
    assert len(rows) > 0
    for r in rows:
        want = _py_jaro_winkler(titles[r["doc_a"]], titles[r["doc_b"]])
        assert (r["jaro_ppm"], r["jw_ppm"]) == want, (r, want)


# ---------------------------------------------------------------------------
# Soundex (q216's phonetic blocking key)


def _py_soundex(word: str) -> str:
    """American Soundex written PROCEDURALLY from the published
    algorithm (Knuth TAOCP vol. 3 / NARA variant): walk the word with
    a last-code state, H/W transparent (bridging), vowels reset. No
    polla_spark code — the independent reference for the string-
    algebra expression."""
    codes = {}
    for letters, d in (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                       ("l", "4"), ("mn", "5"), ("r", "6")):
        for ch in letters:
            codes[ch] = d
    w = word.lower()
    out: list[str] = []
    prev = codes.get(w[0])  # None for vowels AND h/w initials
    for c in w[1:]:
        if c in "hw":
            continue  # transparent: prev survives across h/w
        d = codes.get(c)
        if d is None:
            prev = None  # vowel separator
            continue
        if d != prev:
            out.append(d)
        prev = d
    return (w[0].upper() + "".join(out) + "000")[:4]


def _spark_soundex(spark, words):
    from pyspark.sql import functions as F

    from polla_spark.functions.strsim import soundex_sql

    df = spark.createDataFrame([(w,) for w in words], "w string")
    return {
        r["w"]: r["code"]
        for r in df.withColumn(
            "code", F.expr(soundex_sql("w", "spark"))
        ).collect()
    }


def test_soundex_published_classics(spark):
    """The worked examples every Soundex description publishes,
    including the H/W-bridging cases (Ashcraft, Tymczak) and the
    first-letter-collapse case (Pfister)."""
    expect = {
        "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Hall": "H400", "Jackson": "J250",
        "Washington": "W252", "Lee": "L000", "Gutierrez": "G362",
        "Euler": "E460", "Gauss": "G200", "Hilbert": "H416",
        "Knuth": "K530", "Lloyd": "L300", "Lukasiewicz": "L222",
        "Wu": "W000",
    }
    got = _spark_soundex(spark, list(expect))
    assert got == expect
    for w, c in expect.items():
        assert _py_soundex(w) == c  # the reference agrees on its own


def test_soundex_randomized_three_way(spark):
    """300 random alphabetic words: the Spark expression, the DuckDB
    dialect of the SAME template, and the independent procedural
    Python all agree."""
    import duckdb

    from polla_spark.functions.strsim import soundex_sql

    rng = random.Random(2161)
    words = sorted(
        {
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(2, 16)))
            for _ in range(300)
        }
    )
    got_spark = _spark_soundex(spark, words)
    import pandas as pd

    con = duckdb.connect()
    con.register("words", pd.DataFrame({"w": words}))
    got_duck = dict(
        con.sql(
            "SELECT w, " + soundex_sql("w", "duck") + " AS code FROM words"
        ).fetchall()
    )
    for w in words:
        assert got_spark[w] == _py_soundex(w) == got_duck[w], w
