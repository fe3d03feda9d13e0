"""MinHash/LSH contracts q52/q53 rest on, pinned directly:

1. signatures are a pure function of the DISTINCT shingle set —
   re-ordering or duplicating sentences never changes them;
2. docs with identical shingle sets collide in EVERY band, so the
   band join can never miss an exact near-duplicate (the recall floor
   the candidates->rescore pipeline assumes)."""

from __future__ import annotations


def test_identical_shingle_sets_collide_in_every_band(spark):
    from polla_spark.plans.llmdata import with_minhash

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (1, base),  # identical text = identical shingle set
        (2, base.replace("delta", "DELTA")),  # one token changed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: (r["mh0"], r["mh1"], r["mh2"], r["mh3"])
           for r in with_minhash(df).collect()}
    assert sig[0] == sig[1]          # identical sets -> identical signature
    assert sig[0] != sig[2]          # a changed token moves >=1 band
    # every band collides for the identical pair -> the q53 band join
    # surfaces it no matter which band bucketing runs
    for b in range(4):
        assert sig[0][b] == sig[1][b]
