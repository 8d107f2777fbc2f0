"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a typed
metadata struct alongside. The Spark-side plumbing — schema, Arrow batch
shape, mapInPandas signature, partition sizing — is real and tested; the
actual codec step is STUBBED (this container has no image/audio libs):
``decode_stub`` computes deterministic byte-level features, and
``decode_image``/``decode_audio`` raise NotImplementedError unless a real
decoder import succeeds.

At 100 TB the pattern is: store payloads in parquet binary columns (or
pointers to object storage), ``repartition`` so each Arrow batch holds a
bounded number of payloads, and run the decoder via ``mapInPandas`` so
one Python worker processes a whole Arrow batch per call.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes int, first_byte int, checksum int"

try:  # real decoders if ever available in the runtime
    import PIL.Image  # noqa: F401

    _HAS_IMAGE_LIB = True
except Exception:  # pragma: no cover - container has no PIL
    _HAS_IMAGE_LIB = False


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of the
    text stand in for an image/audio blob in the testdata)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Binary → feature rows via mapInPandas (the real decoder slot).

    The batch function is a *closure* so cloudpickle serializes it by
    value — Spark Python workers don't need this package importable
    (the driver may run from any cwd). Deterministic byte-level
    'features' (length, first byte, additive checksum mod 997) stand in
    for a codec (PIL/librosa/ffmpeg); batch shape and schema stay
    identical when a real decoder is swapped in.
    """
    import pandas as _pd

    def batch_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payload.map(len).astype("int32"),
                    "first_byte": payload.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    "checksum": payload.map(lambda b: int(sum(b) % 997)).astype(
                        "int32"
                    ),
                }
            )

    payloads = df.select(F.col(id_col).alias("doc_id"), "payload")
    return payloads.mapInPandas(batch_features, schema=FEATURE_SCHEMA)


EMBED_DIM = 8
EMBED_SCHEMA = f"vec_id long, embedding array<float>"


def extract_embedding(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Binary payload → embedding vector via mapInPandas — the
    multimodal→vector handoff every training pipeline runs (image/audio
    encoder models batch exactly like this: Arrow batch in, one
    fixed-dim vector per payload out).

    The encoder is a deterministic stand-in (byte-histogram over 8
    residue buckets — integer-valued, so downstream cosine arithmetic
    is engine-exact); swapping in a real model changes ONLY the closure
    body, not the schema, batch shape, or the ANN operators downstream
    (functions.similarity consumes this frame directly with
    ``dim=EMBED_DIM``).
    """
    import pandas as _pd

    def batch_embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def hist(b: bytes) -> list[float]:
                counts = [0] * 8
                for byte in b:
                    counts[byte % 8] += 1
                return [float(c) for c in counts]

            yield _pd.DataFrame(
                {
                    "vec_id": pdf["doc_id"],
                    "embedding": pdf["payload"].map(hist),
                }
            )

    payloads = df.select(F.col(id_col).alias("doc_id"), "payload")
    return payloads.mapInPandas(batch_embed, schema=EMBED_SCHEMA)


def decode_image(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Image decode + resize. STUB: no image library in this runtime."""
    if not _HAS_IMAGE_LIB:
        raise NotImplementedError(
            "image decoding requires PIL/opencv — not present in this container; "
            "use extract_features() for the tested byte-level path"
        )
    raise NotImplementedError("real decoder wiring lands with the library")


def frame_sample(df: DataFrame, binary_col: str = "payload", every_n: int = 10) -> DataFrame:
    """Video frame sampling. STUB — deterministic fake: one 'frame marker'
    row per ``every_n`` bytes, exercising the explode/fan-out shape a real
    frame sampler produces."""
    n_frames = (F.octet_length(F.col(binary_col)) / every_n).cast("int")
    return df.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames)))
