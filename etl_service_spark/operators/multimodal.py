"""Multimodal columns: images/audio/video as opaque binary + metadata.

The pattern a 100 TB multimodal pipeline needs: payloads travel as
``binary`` columns with typed metadata beside them; decode/feature
steps are Arrow-batched ``mapInPandas`` stages so bytes never cross the
Python boundary row-at-a-time.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
the decode kernel is stubbed (deterministic fake features, clearly
marked) — but the Spark-side plumbing is real and tested: schema,
batch iteration, partition-parallel execution, metadata passthrough.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("source", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_dim", LongType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Treat document text as an opaque payload — the binary-column
    plumbing is identical for real image/audio bytes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.col("source"),
    )


def _decode_stub(payload: bytes) -> list[float]:
    """STUB decode kernel. A real pipeline would decode image/audio here
    (PIL.Image.open / librosa.load — not installed in this container).
    Deterministic fake: byte-value histogram moments."""
    if not payload:
        return [0.0, 0.0]
    total = sum(payload)
    return [total / len(payload) / 255.0, float(len(payload))]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas: each executor processes whole Arrow batches; the stub
    kernel is where a real decoder plugs in. Partitioning: inherits the
    upstream layout — repartition by size class upstream if payload
    sizes are skewed.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: _decode_stub(bytes(p) if p is not None else b""))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_mean": feats.map(lambda v: v[0]),
                    "feat_dim": feats.map(lambda v: float(len(v))).astype("int64"),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Frame sampling: one input row expands to N frame rows (the
    video→frames UDTF shape). The STUB 'codec' slices the payload into
    fixed windows — a real pipeline swaps in ffmpeg keyframe extraction;
    the Spark contract (mapInPandas 1→N expansion, schema, ordering
    column) is exactly what production needs.

    Scale: output multiplicity is bounded (max_frames) so task output
    stays proportional to input; downstream repartitions on media_id if
    frames feed a per-media aggregation."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_payload": [], "frame_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                for idx in range(min(max_frames, max(1, (len(raw) + every_n_bytes - 1) // every_n_bytes))):
                    frame = raw[idx * every_n_bytes : (idx + 1) * every_n_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_payload"].append(frame)
                    out["frame_bytes"].append(len(frame))
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB image resize: real impl needs PIL (not installed). Raises at
    execution; exists to pin the operator signature + schema contract."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError("image resize requires PIL; not available in this container")
        yield  # pragma: no cover

    return media.mapInPandas(kernel, schema=media.schema)


def media_stats_sql(view: str = "documents") -> tuple[str, str]:
    """Binary metadata stats, oracle-checkable: payload byte length per
    source (UTF-8 octet length — exact in both engines)."""
    from ..functions.portable import bi_sql

    template = """
SELECT source,
       COUNT(*) AS n_items,
       CAST(SUM({octets}) AS BIGINT) AS total_bytes,
       CAST(MAX({octets}) AS BIGINT) AS max_bytes
FROM {view}
GROUP BY source
"""
    return bi_sql(
        template,
        octets=("octet_length(encode(text, 'UTF-8'))", "octet_length(encode(text))"),
        view=view,
    )


CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", LongType()),
        StructField("chunk_len", LongType()),
        StructField("n_tokens", LongType()),
    ]
)


def chunk_payload(media_text: DataFrame, window: int = 512) -> DataFrame:
    """Fixed-window chunking of long payloads — the "split documents /
    audio into training windows" op. Arrow-batched ``mapInPandas``:
    each task chunks its partition's rows locally, output multiplicity
    is len/window per row, no shuffle introduced.

    Tokens are counted per RAW chunk independently (a token straddling
    a boundary counts in both sides' fragments) — the cheap, alignment-
    free convention; exact-boundary chunking would need the tokenizer
    in the loop. Because the fake payloads are ASCII text, the whole
    kernel is reproducible as pure SQL (substr + the portable token
    regex), giving this mapInPandas path a full value-level oracle —
    the UDF-equivalence check the codec stubs can't have."""
    import re

    token_re = re.compile("[^a-z0-9]+")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "chunk_idx": [], "chunk_len": [], "n_tokens": []
            }
            for mid, text in zip(pdf["media_id"], pdf["text"]):
                s = text or ""
                n_chunks = max(0, (len(s) + window - 1) // window)
                for idx in range(n_chunks):
                    chunk = s[idx * window : (idx + 1) * window]
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(idx)
                    out["chunk_len"].append(len(chunk))
                    out["n_tokens"].append(
                        sum(1 for t in token_re.split(chunk.lower()) if t)
                    )
            yield pd.DataFrame(out)

    return media_text.mapInPandas(kernel, schema=CHUNK_SCHEMA)


def chunk_oracle_sql(window: int = 512, view: str = "documents") -> str:
    """DuckDB twin of :func:`chunk_payload` (ASCII text ⇒ chars == bytes)."""
    sub = f"substr(text, i * {window} + 1, {window})"
    return f"""
WITH x AS (
  SELECT doc_id, text,
         unnest(range((LENGTH(text) + {window} - 1) // {window})) AS i
  FROM {view}
)
SELECT doc_id AS media_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(LENGTH({sub}) AS BIGINT) AS chunk_len,
       CAST(len(list_filter(regexp_split_to_array(lower({sub}), '[^a-z0-9]+'),
                            x -> x != '')) AS BIGINT) AS n_tokens
FROM x
"""
