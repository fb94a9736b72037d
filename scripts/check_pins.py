#!/usr/bin/env python3
"""Live-DuckDB fixture lane for pinned cross-engine constants (VERDICT r14 #6).

Three times across rounds a "measured DuckDB behavior" was pinned as a
Scala literal or scaladoc claim (Jaro-Winkler byte semantics, `ascii`
code points, `//` on negatives). This script RE-MEASURES every such pin
against the DuckDB the oracle actually runs, so a DuckDB version bump
that changes any of them fails the verify flow loudly instead of
silently invalidating fixtures.

Run it as part of verify (see .claude/skills/verify/SKILL.md):

    python3 scripts/check_pins.py

Exit 0 = every pin re-measured at its recorded value. Nonzero = a pin
diverged; the offending Scala site is named in the output.
"""
import math
import sys

import duckdb


FAILURES = []


def pin(label, where, sql, expected):
    got = duckdb.sql(sql).fetchone()[0]
    ok = (
        math.isclose(got, expected, rel_tol=0, abs_tol=1e-12)
        if isinstance(expected, float)
        else got == expected
    )
    status = "ok " if ok else "PIN DIVERGED"
    print(f"{status} {label}: {sql!r} -> {got!r} (pinned {expected!r}) [{where}]")
    if not ok:
        FAILURES.append(label)


def pin_raises(label, where, sql, needle):
    try:
        duckdb.sql(sql).fetchall()
        print(f"PIN DIVERGED {label}: {sql!r} did not raise [{where}]")
        FAILURES.append(label)
    except Exception as e:
        ok = needle in str(e)
        status = "ok " if ok else "PIN DIVERGED"
        print(f"{status} {label}: raises {str(e)!r} [{where}]")
        if not ok:
            FAILURES.append(label)


# -- integer division `//` truncates toward zero (NOT floor), matching
#    Spark's `div`: the trainer's signed g12 weight updates rely on it
#    (TextQueries.lrTrainCtes and every `div n div 1000` site), and
#    Round15Spec pins the Spark half of the same matrix.
for sql, exp in [
    ("SELECT (-7)//2", -3),
    ("SELECT 7//(-2)", -3),
    ("SELECT (-7)//(-2)", 3),
    ("SELECT 7//2", 3),
    ("SELECT (-1)//1000", 0),
]:
    pin("int-div-trunc", "TextQueries.lrTrainCtes / membershipInfer grid", sql, exp)

# -- jaro_winkler_similarity: BYTE semantics + both-empty = 0.0
#    (functions/JaroWinkler.scala scaladoc + JaroWinklerSpec fixtures;
#    adjudicated by the r14 judge against the ADVICE claim of 1.0).
pin("jw-both-empty", "functions/JaroWinkler.scala",
    "SELECT jaro_winkler_similarity('','')", 0.0)
pin("jw-bytes-naive", "functions/JaroWinkler.scala",
    "SELECT jaro_winkler_similarity('naïve','naive')", 0.8577777777777779)
pin("jw-bytes-mathbb", "functions/JaroWinkler.scala",
    "SELECT jaro_winkler_similarity('𝕊x','𝕊y')", 0.92)

# -- ascii() returns the full CODE POINT, not a byte
#    (functions/PolyHash.scala scaladoc + PolyHashSpec fixtures).
pin("ascii-codepoint-e", "functions/PolyHash.scala",
    "SELECT ascii('é')", 233)
pin("ascii-codepoint-s", "functions/PolyHash.scala",
    "SELECT ascii('𝕊')", 120138)

# -- strlen counts BYTES, length counts CHARACTERS: the audio oracle
#    (MultimodalQueries.audioFeaturesSql) mixes strlen-based sample
#    counts with substr char indexing — they coincide only on ASCII,
#    which Round15Spec enforces over the shipped corpus.
pin("strlen-bytes", "MultimodalQueries.audioFeaturesSql",
    "SELECT strlen('é')", 2)
pin("length-chars", "MultimodalQueries.audioFeaturesSql",
    "SELECT length('é')", 1)

# -- error() raises inside a CASE arm (the membershipInfer s6 fence's
#    SQL twin, TextQueries.membershipInferSql).
pin("case-error-pass", "TextQueries.membershipInferSql",
    "SELECT CASE WHEN abs(-5) < 10 THEN CAST(-5 AS BIGINT)"
    " ELSE error('fence') END", -5)
pin_raises("case-error-raise", "TextQueries.membershipInferSql",
    "SELECT CASE WHEN abs(-50) < 10 THEN CAST(-50 AS BIGINT)"
    " ELSE error('fence') END", "fence")

# -- round() on a DOUBLE diverges from Spark's HALF_UP at the observed
#    boundary (70.47625 → 70.4762 in DuckDB, 70.4763 in Spark): the
#    reason Det.rnd/rndSql spell out floor(x*10^s + 0.5) instead of
#    round() (functions/Det.scala header's observed divergence). On
#    DECIMAL literals DuckDB rounds half-up (70.4763) — the pin is the
#    DOUBLE path, which is what avg()/division feed it.
pin("round-double-boundary", "functions/Det.scala",
    "SELECT round(CAST(70.47625 AS DOUBLE), 4)", 70.4762)

# -- floor() on a double returns a DOUBLE (no bigint clamp), so
#    Det.rndSql's identity branch guards only the 2^53 exactness
#    threshold, not an engine-side overflow (functions/Det.scala rnd
#    domain guard — Spark's floor RETURNS LONG and clamps, DuckDB's
#    does not; the guard keeps both engines on the identity branch
#    before either effect can bite).
pin("floor-negative", "functions/Det.scala", "SELECT floor(-0.5)", -1.0)
pin("floor-double", "functions/Det.scala",
    "SELECT floor(9007199254740993000.0) = 9007199254740993000.0", True)

print()
if FAILURES:
    print(f"{len(FAILURES)} PIN(S) DIVERGED: {sorted(set(FAILURES))}")
    sys.exit(1)
print(f"ALL PINS GREEN (duckdb {duckdb.__version__})")
