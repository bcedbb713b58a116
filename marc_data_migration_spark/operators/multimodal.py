"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
pipelines.

The decode step is STUBBED (no image/audio libs in this container):
``decode_media`` raises ``NotImplementedError`` unless a codec hook is
injected, and ``fake_decode`` provides the deterministic stand-in used
by tests/benchmarks. Everything around the stub — schema, batch
iteration, partitioning, feature extraction signatures — is the real
Spark plumbing a production decode would run in.

Scale notes: media payloads dominate bytes; keep them in their own
table keyed like the transcripts (conv_id, turn_idx), repartitioned by
key hash so decode fan-out is even; never collect payloads; features
come back as narrow typed columns.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_md5 string, feat array<double>"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents fixture:
    payload = utf-8 bytes of the text (a stand-in blob)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit("conv-"), (F.col("doc_id") % 100).cast("string")).alias("conv_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(F.lit("n_chars"), F.col("n_chars").cast("string")).alias("meta"),
    )


def fake_decode(payload: bytes, kind: str) -> list[float]:
    """Deterministic decode stand-in: fixed-length byte statistics.
    Replace with a real PIL/librosa/ffmpeg hook on a real cluster."""
    if payload is None:
        return [0.0] * 4
    n = len(payload)
    return [
        float(n),
        float(payload[0]) if n else 0.0,
        float(payload[-1]) if n else 0.0,
        float(sum(payload[:64]) % 997),
    ]


def decode_media(
    df: DataFrame, codec: Callable[[bytes, str], list[float]] | None = None
) -> DataFrame:
    """mapInPandas feature-extraction pipeline over the media table.
    ``codec`` decodes one payload → feature vector; None raises (stub)."""
    if codec is None:
        raise NotImplementedError(
            "no media codec in this environment — pass codec=fake_decode "
            "or a real decoder (PIL/librosa) on a cluster with the libs"
        )
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_md5": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feat": [codec(p, k) for p, k in zip(pdf["payload"], pdf["kind"])],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 128) -> DataFrame:
    """'Frame sampling' plumbing for video-kind rows: slice the payload
    into fixed strides (the real version samples decoded frames); one
    output row per sampled frame, JVM-side only."""
    frames = F.transform(
        F.sequence(
            F.lit(1),
            F.greatest((F.length("payload") / every_n_bytes).cast("int"), F.lit(1)),
        ),
        lambda i: F.substring(F.col("payload"), (i - 1) * every_n_bytes + 1, every_n_bytes),
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.posexplode(frames).alias("frame_idx", "frame"))
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def fake_resize(payload: bytes, kind: str, target_bytes: int) -> bytes:
    """Deterministic resize stand-in: truncate or zero-pad the blob to
    ``target_bytes`` (a real hook decodes, rescales to WxH / resamples,
    re-encodes). Replace on a cluster with PIL/ffmpeg."""
    if payload is None:
        return b"\x00" * target_bytes
    return payload[:target_bytes] + b"\x00" * max(target_bytes - len(payload), 0)


def resize_media(
    df: DataFrame,
    target_bytes: int = 256,
    resizer: Callable[[bytes, str, int], bytes] | None = None,
) -> DataFrame:
    """mapInPandas resize pass — same Arrow-batched plumbing a real
    image/audio rescale runs in (binary in → binary out, metadata map
    updated with the new size; schema/partitioning/batch shape are the
    real contract, the byte transform is the stub). ``resizer=None``
    raises, mirroring decode_media's stubbed-codec policy."""
    if resizer is None:
        raise NotImplementedError(
            "no media resizer in this environment — pass resizer=fake_resize "
            "or a real rescaler (PIL/ffmpeg) on a cluster with the libs"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resizer(p, k, target_bytes) for p, k in zip(pdf["payload"], pdf["kind"])]
            meta = [
                {**(m if isinstance(m, dict) else dict(m or {})), "resized_bytes": str(target_bytes)}
                for m in pdf["meta"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out,
                    "meta": meta,
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)
