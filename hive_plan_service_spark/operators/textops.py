"""Text-analysis building blocks (SURVEY.md B29 + north-star text ops).

Everything here is built-in-function array algebra — JVM-side, codegen'd,
zero Python in the hot path — so it runs unchanged over 100 TB of
documents. Shingling, fingerprinting and hashing operate on the token
array *in place* (higher-order functions), deferring any explode until
an operator genuinely needs row form (e.g. the LSH bucket join).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the language-ID heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "in", "to", "is"),
    "es": ("el", "la", "de", "que", "y", "los", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]

#: Rolling-hash modulus (2^31 − 1, Mersenne prime) and base.
FNV_MOD = 2_147_483_647
FNV_BASE = 31


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization — the cheap path for word-soup corpora."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(words: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array (array-side, no explode)."""
    return F.array_distinct(
        F.transform(
            # size ≥ n → indices 0..size−n; shorter docs get one partial
            # shingle (concat_ws skips the out-of-range NULLs, same as the
            # DuckDB oracle's behavior).
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + k + 1) for k in range(n)]
            ),
        )
    )


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash of the character stream, mod 2^31−1.

    Deliberately engine-portable (plain integer arithmetic, no engine
    hash builtin) so the DuckDB oracle can verify it bit-for-bit; the
    fast non-portable alternative is ``F.xxhash64``.
    """
    c = F.col(text) if isinstance(text, str) else text
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, code: (acc * FNV_BASE + code) % FNV_MOD,
    )


def minhash_signature(shingle_arr: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: array of ``num_hashes`` BIGINT minima.

    h_i(s) = xxhash64(i ⊕ s); the signature is computed entirely
    array-side per row — the only shuffle in MinHash-LSH dedup is the
    band-bucket join that follows.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingle_arr,
                lambda s: F.xxhash64(F.concat(i.cast("string"), F.lit("\x1f"), s)),
            )
        ),
    )


def simhash64_expr(hashes_col: str, n_col: str) -> Column:
    """64-bit SimHash from a precomputed BIGINT token-hash array column.

    bit b of the output is set iff the majority of token hashes have bit
    b set (±1 weight voting). Pure array algebra — no shuffle, no UDF.
    SQL-expr form because the shift amount is the lambda variable ``b``
    (the PySpark ``shiftright`` wrapper only accepts literal shifts).
    ``(h >> b) & 1`` extracts bit b correctly for negative hashes too —
    sign extension only touches bits above the mask.
    """
    return F.expr(
        f"""
        aggregate(
          sequence(0, 63),
          CAST(0 AS BIGINT),
          (acc, b) -> acc + IF(
            2 * size(filter({hashes_col}, h -> (shiftright(h, b) & 1) = 1)) > {n_col},
            shiftleft(CAST(1 AS BIGINT), b),
            CAST(0 AS BIGINT)))
        """
    )


def token_hashes(words: Column) -> Column:
    """xxhash64 of each token — the input to SimHash/MinHash fast paths."""
    return F.transform(words, lambda w: F.xxhash64(w))


def stopword_hits(words: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of tokens that are in the given stopword list."""
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w))).cast("bigint")
