"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
pipelines.

The DEFAULT decode/resize hooks are REAL pure-python codecs
(operators/codecs.py: uncompressed 24-bit BMP + binary PPM for image
rows, 16-bit PCM RIFF WAV for audio rows, uncompressed-DIB AVI for
video rows — ``media_features`` routes by kind) — image decode parses
headers/stride/BGR/bottom-up storage and extracts pixel statistics;
audio decode walks the RIFF chunk list and extracts
duration/rate/channels/RMS; video decode walks the RIFF tree to the
movi '00db' frames and extracts frame-count/fps/dims/mean-luma;
resize is decode → nearest-neighbor resample → re-encode. Every kind
also decodes a COMPRESSED format: image adds 8-bit truecolor PNG
(stdlib zlib inflate + real per-scanline unfiltering, all five filter
types) on the same ``decode_image`` sniffer; audio adds G.711 µ-law
WAV (format tag 7, expanded to int16 inside ``decode_wav``); video
adds palettized BI_RLE8 AVI ('00dc' frames, palette from the strf
header). Resize re-encodes each payload in its own format. Lossier
compressed formats (JPEG/MP3/H.264 …) still take an injected hook —
``fake_decode``/``fake_resize`` are the deterministic byte-level
stand-ins used where such a table must flow end-to-end in this
container, and a real cluster injects PIL/librosa/ffmpeg through the
same signatures. The Spark plumbing (schemas, Arrow batch iteration,
partitioning) is identical for every hook.

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


def synthesize_image_media(docs: DataFrame, include_png: bool = False) -> DataFrame:
    """Deterministic REAL image table from the documents fixture: one
    encoded bitmap per doc — BMP, with every third row P6 PPM so both
    container formats flow through the same pipeline. Dimensions and
    pixel values are pure arithmetic in media_id, so decoded statistics
    are closed-form replayable by a SQL oracle:

        w = 8 + id % 5, h = 6 + id % 4
        r = (7x + 13y + 31·id) % 256
        g = (11x + 17y + id)  % 256
        b = (5x + 3y + 23·id) % 256

    ``include_png=True`` additionally encodes the ``id % 3 == 1`` rows
    as compressed PNG (per-row filter type cycling through all five, so
    the unfilter paths run distributed too). It is opt-in because the
    ``media_decode_features`` oracle pins container byte sizes in
    closed form, which a DEFLATE stream has none.

    Encoding runs distributed in mapInPandas (payload bytes are built
    executor-side; the driver never sees a pixel)."""
    from .codecs import encode_bmp, encode_png, encode_ppm

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 8 + mid % 5, 6 + mid % 4
                grid = [
                    [
                        (
                            (7 * x + 13 * y + 31 * mid) % 256,
                            (11 * x + 17 * y + mid) % 256,
                            (5 * x + 3 * y + 23 * mid) % 256,
                        )
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                if mid % 3 == 0:
                    enc = encode_ppm
                elif include_png and mid % 3 == 1:
                    def enc(g, _mid=mid, _h=h):
                        return encode_png(g, filters=[(_mid + y) % 5 for y in range(_h)])
                else:
                    enc = encode_bmp
                rows.append(
                    {
                        "media_id": mid,
                        "conv_id": f"conv-{mid % 100}",
                        "kind": "image",
                        "payload": enc(grid),
                        "meta": {"w": str(w), "h": str(h)},
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "conv_id", "kind", "payload", "meta"])

    return docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
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
    ``codec`` decodes one payload → feature vector. The default is the
    real pure-python image codec (BMP/PPM parse → [w, h, mean_r,
    mean_g, mean_b]); it raises inside the task on non-image kinds or
    undecodable payloads, so filter/route first or inject a
    kind-routing codec for mixed tables."""
    if codec is None:
        from .codecs import image_features as codec
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
    """mapInPandas resize pass — binary in → binary out, metadata map
    updated with the new size. The default resizer is the real image
    path (decode → nearest-neighbor resample to the largest square
    fitting ``target_bytes`` → re-encode); like decode_media it raises
    in-task on non-image rows. For mixed tables pass
    ``codecs.media_resize_router`` (image resample / audio PCM
    downsample / video per-frame resample); ``fake_resize`` (byte
    truncate/pad) stands in only for compressed formats this container
    cannot decode."""
    if resizer is None:
        from .codecs import image_resize as resizer

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
