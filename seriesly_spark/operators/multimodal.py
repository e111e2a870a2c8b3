"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct alongside. The Spark-side machinery that matters at scale —
schema, Arrow batch shape, ``mapInPandas`` signatures, partition-friendly
layout — is real and tested; the actual codec step is STUBBED
(``decode_image`` raises NotImplementedError: the image/audio libraries are
not in this container) behind a deterministic byte-level metadata
extractor, so the pipeline shape is verifiable end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, n_bytes long, width long, height long, n_frames long"


def decode_image(payload: bytes):  # pragma: no cover - deliberate stub
    """Real decoder entry point (PIL/libav territory). Not available in
    this environment; the plumbing below uses byte-derived fake metadata."""
    raise NotImplementedError("image/audio codecs are not available in this container")


def payload_metadata(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Treat the UTF-8 bytes of ``text_col`` as an opaque payload (stand-in
    for image bytes) and extract deterministic metadata per Arrow batch via
    ``mapInPandas`` — the exact plan shape a real decode/resize/
    frame-sample stage uses (vectorized batches, no per-row Python)."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.encode(text_col, "UTF-8").alias("payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": n % 256,
                    "height": (n // 256) % 256,
                    "n_frames": 1,
                }
            )

    return src.mapInPandas(extract, META_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_id long, frame_len long"


def frame_sample(
    docs: DataFrame,
    frame_size: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame/chunk sampling over an opaque payload: one output row per
    fixed-size slice (video frame / audio window analogue). The byte
    slicing is real; a codec would replace the slice with a decoded frame.
    Row explosion happens inside the Arrow batch (no per-row Python calls,
    no JVM<->Python chatter per frame)."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.encode(text_col, "UTF-8").alias("payload")
    )

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, lens = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, max(len(b), 1), frame_size):
                    frame = b[i : i + frame_size]
                    ids.append(doc_id)
                    fids.append(i // frame_size)
                    lens.append(len(frame))
            yield pd.DataFrame({"doc_id": ids, "frame_id": fids, "frame_len": lens})

    return src.mapInPandas(explode_frames, FRAME_SCHEMA)


EMBED_DIM = 8
EMBED_SCHEMA = "doc_id long, feature array<float>"


def payload_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Feature-extraction plumbing: payload -> fixed-dim float vector via
    mapInPandas (the resize/encode/embed stage shape). The model call is
    STUBBED with a deterministic function of the byte length so the oracle
    can verify the batch plumbing end-to-end; swapping in a real encoder
    changes only the function body."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.encode(text_col, "UTF-8").alias("payload")
    )

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": [
                        [float((nb * (i + 1)) % 97) / 97.0 for i in range(EMBED_DIM)]
                        for nb in n
                    ],
                }
            )

    return src.mapInPandas(embed, EMBED_SCHEMA)
