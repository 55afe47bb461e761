"""Python UDTFs (Spark 4 user-defined table functions): row → N rows
generators callable from SQL via LATERAL, the API-level twin of the
mapInPandas 1→N operators in operators/multimodal.py.

Where mapInPandas owns whole-partition batch transforms, a UDTF is the
right shape when the fan-out is per-row and the call site is SQL — the
planner sees a proper table function (projectable, filterable) instead
of an opaque partition closure. ``useArrow=True`` keeps the transfer
Arrow-batched, so per-row Python dispatch is the only interpreted part.

Sentence splitting is the canonical training-data case: chunking
documents into model-sized units happens AFTER quality filtering and
BEFORE packing (operators/corpus.pack_sequences), and at 100 TB it must
run embarrassingly parallel with no shuffle — a UDTF applied per row
does exactly that (the plan is scan → generate, nothing moves).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

# One pattern, three engines: Python re (executor-side) and the DuckDB
# oracle's RE2. Alternatives with distinct first characters + no
# lookaround (RE2 has none) keep leftmost-first and leftmost-longest
# matching identical, so the split points agree byte-for-byte. The
# " the " alternative is the stand-in sentence boundary for the
# synthetic corpus, whose texts carry no punctuation.
SENTENCE_PATTERN = r"[.!?]+ +| the "

_compiled: dict[str, "re.Pattern[str]"] = {}


@udtf(returnType="sent_idx int, sentence string, n_chars int", useArrow=True)
class SentenceSplit:
    """Split one text into sentences on the given delimiter pattern.
    Indices are 1-based over the RAW split vector (empty segments keep
    their slot but are not emitted) so the oracle's parallel-unnest
    numbering matches exactly."""

    def eval(self, text: str, pattern: str):  # noqa: D102 — contract above
        rx = _compiled.get(pattern)
        if rx is None:
            rx = _compiled[pattern] = re.compile(pattern)
        for i, part in enumerate(rx.split(text or ""), 1):
            if part != "":
                yield i, part, len(part)


def register_udtfs(spark: SparkSession) -> None:
    """Idempotent session-level registration for SQL call sites."""
    spark.udtf.register("sentence_split", SentenceSplit)


SENTENCE_SPLIT_ORACLE = f"""
WITH s AS (
  SELECT doc_id, regexp_split_to_array(text, '{SENTENCE_PATTERN}') AS parts
  FROM documents
), u AS (
  SELECT doc_id,
         unnest(generate_series(1, len(parts))) AS sent_idx,
         unnest(parts) AS sentence
  FROM s
)
SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx, sentence,
       CAST(length(sentence) AS INT) AS n_chars
FROM u WHERE sentence <> ''
"""
