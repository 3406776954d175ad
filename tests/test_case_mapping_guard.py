"""Case-mapping emulation completeness guard (r7).

The DuckDB oracles emulate Java's case mappings only where the hostile
sweeps can actually produce the divergent character: `upper('ß')`→'ss'
pre-substitution, `upper`/title of 'ΰ' (U+03B0) → Υ+0308+0301, and the
contextual final-sigma lower. An r7 exhaustive BMP enumeration (Spark
vs DuckDB, per codepoint — ROUND7_NOTES §16) found 112 upper and 9
lower per-character divergences in total, ALL outside the fuzz
generator's `_FUZZ_RANGES` except the two emulated ones: the Greek
polytonic block (U+1F50–U+1FFC ypogegrammeni/breathing expansions),
the ligatures (U+FB00–17), 'İ' (U+0130), 'ŉ', 'ǰ', 'և', 'ẖ'–'ẚ', and
seven utf8proc-lagging Latin additions (U+2C2F/U+A7Cx 1:1 pairs).

This test re-derives the divergence set over exactly the reachable
content space — every codepoint in `_FUZZ_RANGES` plus every character
of the static `POOL` — and asserts it equals the emulated set. If a
future round widens the generator ranges (ligatures, Latin Extended-A,
polytonic Greek), this fails loudly naming the characters whose
emulation is missing at the upper/lower oracle sites, BEFORE a fuzz
seed trips over them.
"""

from __future__ import annotations

import importlib.util
import os
import unicodedata

import duckdb

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: characters whose Java-vs-utf8proc divergence the oracles emulate
#: (CLAUDE.md invariant 7): full-mapping upper/title expansions.
EMULATED_UPPER = {"ß", "ΰ"}
#: per-character lower divergences emulated (the contextual final
#: sigma is a multi-char effect invisible to per-char enumeration and
#: is pinned by the static POOL entry 'τέλοΣ' instead).
EMULATED_LOWER: set[str] = set()


def _load_hostile_probe():
    spec = importlib.util.spec_from_file_location(
        "hostile_probe", os.path.join(REPO_ROOT, "scripts", "hostile_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _reachable_chars() -> list[str]:
    hp = _load_hostile_probe()
    cps: set[int] = set()
    for lo, hi in hp._FUZZ_RANGES:
        cps.update(range(lo, hi + 1))
    for s in hp.POOL:
        cps.update(ord(c) for c in s)
    for s in hp._ZERO_WIDTH:
        cps.update(ord(c) for c in s)
    return [
        chr(c)
        for c in sorted(cps)
        if not 0xD800 <= c <= 0xDFFF
        and unicodedata.category(chr(c))[0] != "C"
    ]


def test_fuzz_reachable_case_divergences_are_all_emulated(spark):
    from pyspark.sql import functions as F

    chars = _reachable_chars()
    rows = (
        spark.createDataFrame([(c,) for c in chars], "s string")
        .select("s", F.upper("s").alias("u"), F.lower("s").alias("l"))
        .collect()
    )
    con = duckdb.connect()
    values = ",".join(f"(chr({ord(c)}))" for c in chars)
    duck = {
        s: (u, lo)
        for s, u, lo in con.execute(
            f"SELECT s, upper(s), lower(s) FROM (VALUES {values}) v(s)"
        ).fetchall()
    }
    div_upper = {r["s"] for r in rows if r["u"] != duck[r["s"]][0]}
    div_lower = {r["s"] for r in rows if r["l"] != duck[r["s"]][1]}
    assert div_upper == EMULATED_UPPER, (
        "fuzz-reachable upper() divergences changed; add/remove the "
        "pre-substitution at every upper/title oracle site "
        f"(CLAUDE.md invariant 7): {sorted(map(ord, div_upper ^ EMULATED_UPPER))}"
    )
    assert div_lower == EMULATED_LOWER, (
        "fuzz-reachable lower() divergences changed; emulate at every "
        f"lower oracle site: {sorted(map(ord, div_lower ^ EMULATED_LOWER))}"
    )
