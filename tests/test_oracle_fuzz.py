"""Hypothesis-driven oracle parity on GENERATED document content
(r6 VERDICT #6, the pytest half — the registry-wide sweep is
``scripts/hostile_probe.py --fuzz``).

The hostile pools (static and fuzz) are finite; this property test
lets hypothesis explore the content space directly: each example
builds a documents fixture from generated text (unicode incl.
combining marks and zero-width characters, numerals, whitespace
runs — the classes every cross-engine divergence so far came from)
and runs a representative slice of the document oracles through the
driver-grade parity check. ``derandomize=True`` keeps it
reproducible in CI; a failing example is its own minimal repro
(hypothesis shrinks it).

Exclusions mirror the documented probe design: no control characters
(a08 rejects them by design) and no lone surrogates (invalid UTF-8).
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_plan_service_spark.plans.registry import all_queries
from parity import TABLES, check_query

#: the classes that found every divergence so far: numerals at word
#: positions (TRY_CAST), accents/CJK (length/codepoint logic),
#: combining marks, zero-width chars, whitespace runs
_ALPHABET = st.one_of(
    st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    st.characters(min_codepoint=0xC0, max_codepoint=0xFF),
    st.characters(min_codepoint=0x300, max_codepoint=0x30F),
    st.characters(min_codepoint=0x4E00, max_codepoint=0x4E2F),
    st.sampled_from("0123456789.-e "),  # weight numerals/sci-notation up
    # zero-width space/non-joiner, BOM, nbsp, plain space
    st.sampled_from("\u200b\u200c\ufeff\u00a0 "),
)

#: cheap, content-heavy oracles: tokenizer+stopword scoring, n-gram
#: langid, rolling-hash fingerprint, regex scrub, exact dedup
_SLICE = (
    "b29_text_quality",
    "b29_text_langid_ngram",
    "b29_text_fingerprint",
    "llm_pii_scrub",
)


def _docs_dir(texts: list[str], sf_dir: str) -> str:
    out = tempfile.mkdtemp(prefix="fuzz_docs_")
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    langs = ["en", "es", "de"]
    srcs = ["web", "book"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(
                    [langs[i % 3] for i in range(len(texts))], pa.string()
                ),
                "source": pa.array(
                    [srcs[i % 2] for i in range(len(texts))], pa.string()
                ),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{out}/documents.parquet",
    )
    return out


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    texts=st.lists(
        st.text(alphabet=_ALPHABET, max_size=160), min_size=0, max_size=10
    )
)
def test_document_oracles_hold_on_generated_content(spark, sf_dir, texts):
    qs = all_queries()
    d = _docs_dir(texts, sf_dir)
    for name in _SLICE:
        check_query(spark, qs[name], d)
