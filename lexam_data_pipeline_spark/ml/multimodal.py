"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction run as Arrow-batched ``mapInPandas``
stages.  Decode is REAL for WAV PCM audio, P6 PPM images, and 8-bit PNG
(zlib + Paeth unfiltering — ml/media_codecs.py, stdlib + numpy only,
shipped to executors by-value so workers need neither this package nor a
codec library); codecs needing external libraries (MP3/H.264,
progressive JPEG) are
honestly STUBBED —
``NotImplementedError`` unless ``deterministic_fake=True``, which
substitutes a reproducible byte-histogram feature so the Spark-side
plumbing — schema, batching, partitioning — stays testable everywhere.

Scale design: payloads never pass through Python row-at-a-time; Arrow
moves whole column batches, and ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds executor memory per batch (binary payloads can be large — size the
batch so batch_rows × max_payload fits the executor).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lexam_data_pipeline_spark.catalog import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def decode_stub(payload: bytes, media_type: str, deterministic_fake: bool = False) -> list[float]:
    """Codec stand-in.  Real deployments plug PIL/ffmpeg here; this
    container has neither, so either fake deterministically or refuse."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires an image/audio codec library not present "
            "in this environment; pass deterministic_fake=True for plumbing tests"
        )
    # 8-dim reproducible fake: byte histogram moments of the payload.
    if not payload:
        return [0.0] * 8
    acc = [0] * 8
    for i, byte in enumerate(payload[:4096]):
        acc[i % 8] += byte
    norm = float(max(sum(acc), 1))
    return [a / norm for a in acc]


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table by treating document text bytes as an opaque
    payload — exercises the exact binary+metadata schema real media uses."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        (F.pmod(F.col("doc_id"), F.lit(640)) + 1).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(480)) + 1).cast("int").alias("height"),
        F.length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
    )


def media_table_real(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL decodable formats, synthesized
    deterministically from each document's bytes: image rows carry an
    8×8 PNG (Paeth-filtered so decode exercises the full filter path),
    an Adam7-INTERLACED PNG (7-pass deinterlace path, doc_id % 16 == 0;
    the other % 4 == 0 residues stay sequential Paeth so BOTH decode
    paths remain corpus-reachable),
    a paletted color-type-3 PNG (PLTE lookup path),
    a single-frame GIF (LZW + palette path),
    or a baseline JPEG (huffman + IDCT path), audio rows a 16-bit PCM
    WAV, video rows a PPM frame.  This makes the
    whole multimodal tier run with ``deterministic_fake=False`` — every
    payload goes through a real ``bytes → ndarray`` codec.

    The synthesis itself is an Arrow-batched stage (same shape a real
    ingest's transcode step would have); media_codecs travels by value so
    executors need no importable package.
    """
    import numpy as _np

    from pyspark import cloudpickle

    from lexam_data_pipeline_spark.ml import media_codecs

    cloudpickle.register_pickle_by_value(media_codecs)
    _enc_png = media_codecs.encode_png
    _enc_png_pal = media_codecs.encode_png_palette
    _enc_wav = media_codecs.encode_wav
    _enc_ppm = media_codecs.encode_ppm
    _enc_jpeg = media_codecs.encode_jpeg
    _enc_gif = media_codecs.encode_gif

    def run(batches):
        import numpy as np
        import pandas as _pd

        def synth(doc_id, raw):
            # 192 deterministic bytes derived from the text
            seed = np.frombuffer((raw * (192 // max(len(raw), 1) + 1))[:192], dtype=np.uint8)
            if doc_id % 16 == 4:  # image: 8x8 paletted (color-type-3) PNG
                return (
                    _enc_png_pal(seed[:64].reshape(8, 8) % 16, seed[64:112].reshape(16, 3)),
                    "image",
                )
            if doc_id % 16 == 12:  # image: 8x8 GIF (LZW + palette path)
                pal = seed[64:112].reshape(16, 3)
                return _enc_gif(pal[seed[:64].reshape(8, 8) % 16]), "image"
            if doc_id % 16 == 0:  # image: 8x8 RGB PNG, Adam7 interlaced
                return (
                    _enc_png(seed.reshape(8, 8, 3), filter_type=4, interlace=True),
                    "image",
                )
            # remaining doc_id % 4 == 0 (i.e. % 16 == 8, plus % 8 == 0
            # residues not taken above): sequential Paeth RGB — kept
            # reachable so the corpus still exercises the multi-byte-bpp
            # sequential unfilter path (round-6 review finding)
            if doc_id % 4 == 0:
                return _enc_png(seed.reshape(8, 8, 3), filter_type=4), "image"
            if doc_id % 4 == 1:  # audio: 96-sample 16-bit mono WAV
                samples = (seed.astype(np.float64)[:96] - 128.0) / 128.0
                return _enc_wav(samples, rate=8000), "audio"
            if doc_id % 4 == 2:  # image: 8x8 baseline JPEG (lossy path)
                return _enc_jpeg(seed.reshape(8, 8, 3), quality=90), "image"
            return _enc_ppm(seed.reshape(8, 8, 3)), "video"  # frame as PPM

        for pdf in batches:
            payloads, types = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or " ").encode("utf-8") or b" "
                p, t = synth(int(doc_id), raw)
                payloads.append(p)
                types.append(t)
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": types,
                    "width": _pd.Series([8] * len(pdf), dtype="int32"),
                    "height": _pd.Series([8] * len(pdf), dtype="int32"),
                    "n_bytes": _pd.Series([len(p) for p in payloads], dtype="int64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run,
        schema="media_id long, payload binary, media_type string, "
        "width int, height int, n_bytes long",
    )


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The batch function must work on executor workers that have neither
    this package on sys.path nor any codec library: the closure itself
    is self-contained, and the real-codec module is registered for
    cloudpickle BY-VALUE serialization, so its functions travel inside
    the pickle instead of by import path.

    Decode order per payload: real uncompressed codec if the payload
    sniffs as WAV/PPM (ml/media_codecs.decode_features), else the
    deterministic fake when allowed, else ``NotImplementedError``
    (compressed formats need a codec library).
    """
    fake = deterministic_fake
    from pyspark import cloudpickle

    from lexam_data_pipeline_spark.ml import media_codecs

    cloudpickle.register_pickle_by_value(media_codecs)
    real_decode = media_codecs.decode_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def decode(payload, _media_type):
            try:
                feats = real_decode(payload)
            except Exception:
                # sniffed as WAV/PPM but malformed/unsupported-depth: in
                # fake mode degrade like any undecodable payload instead
                # of failing the task (fake mode's no-raise contract)
                if not fake:
                    raise
                feats = None
            if feats is not None:
                return feats
            if not fake:
                raise NotImplementedError("compressed media decode needs a codec library")
            if payload is None or len(payload) == 0:
                return [0.0] * 8
            acc = [0] * 8
            for i, byte in enumerate(payload[:4096]):
                acc[i % 8] += byte
            norm = float(max(sum(acc), 1))
            return [a / norm for a in acc]

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": [
                        decode(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal tier on fixture data (rows-only check):
    synthesize REAL payloads (PNG/JPEG/WAV/PPM, media_table_real) → Arrow
    decode through the actual codecs (``deterministic_fake=False`` — no
    fake path anywhere) → typed features → per-media-type aggregate."""
    docs = load_table(spark, sf_dir, "documents", fan=True)
    media = media_table_real(docs)
    feats = extract_features(media, deterministic_fake=False)
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_f0"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", IntegerType(), True),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def resize_media(
    media: DataFrame, target_w: int, target_h: int, deterministic_fake: bool = True
) -> DataFrame:
    """Resize stage: metadata transforms JVM-side, payload re-encode in an
    Arrow batch.  PPM payloads get a REAL nearest-neighbor resize
    (ml/media_codecs, by-value pickled); compressed formats fall back to
    the deterministic fake (proportional truncate/pad, so downstream size
    accounting stays realistic) or raise without it.
    """
    fake = deterministic_fake
    tw, th = int(target_w), int(target_h)
    from pyspark import cloudpickle

    from lexam_data_pipeline_spark.ml import media_codecs

    cloudpickle.register_pickle_by_value(media_codecs)
    _sniff = media_codecs.sniff
    _dec = media_codecs.decode_ppm
    _enc = media_codecs.encode_ppm
    _dec_png = media_codecs.decode_png
    _enc_png = media_codecs.encode_png
    _dec_bmp = media_codecs.decode_bmp
    _enc_bmp = media_codecs.encode_bmp
    _dec_jpeg = media_codecs.decode_jpeg
    _enc_jpeg = media_codecs.encode_jpeg
    _to_rgb = media_codecs._to_rgb
    _resize = media_codecs.resize_nearest
    _dec_gif = media_codecs.decode_gif
    _enc_gif = media_codecs.encode_gif

    def run(batches):
        import pandas as _pd

        for pdf in batches:
            out_payload = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if payload is None or not w or not h:
                    out_payload.append(None)
                    continue
                payload = bytes(payload)
                kind = _sniff(payload)
                if kind in ("ppm", "png", "bmp", "jpeg", "gif"):
                    try:
                        if kind == "ppm":
                            out_payload.append(_enc(_resize(_dec(payload), tw, th)))
                        elif kind == "png":
                            out_payload.append(
                                _enc_png(_resize(_to_rgb(_dec_png(payload)), tw, th))
                            )
                        elif kind == "jpeg":
                            out_payload.append(
                                _enc_jpeg(_resize(_to_rgb(_dec_jpeg(payload)), tw, th))
                            )
                        elif kind == "gif":
                            # nearest-neighbor keeps the palette: stays <=256
                            out_payload.append(
                                _enc_gif(_resize(_dec_gif(payload), tw, th))
                            )
                        else:
                            out_payload.append(
                                _enc_bmp(_resize(_dec_bmp(payload), tw, th))
                            )
                        continue
                    except Exception:
                        if not fake:  # malformed image: fake mode degrades
                            raise
                if not fake:
                    raise NotImplementedError(
                        "compressed media resize needs a codec library"
                    )
                scale = (tw * th) / float(w * h)
                n = max(1, int(len(payload) * scale))
                body = (bytes(payload) * (n // max(len(payload), 1) + 1))[:n]
                out_payload.append(body)
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": tw,
                    "height": th,
                    "payload": out_payload,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 4, deterministic_fake: bool = True
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (1:N explode
    inside the Arrow batch).  Videos only; the fake splits the payload
    into ``n_frames`` even chunks — the real codec would seek keyframes.

    At scale this is the fan-out stage whose output feeds the per-frame
    feature extractor; partition count follows the input, and
    ``arrow.maxRecordsPerBatch`` bounds per-batch payload memory."""
    fake = deterministic_fake
    k = int(n_frames)

    def run(batches):
        import pandas as _pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("frame sampling needs a codec library")
            ids, idxs, frames = [], [], []
            vids = pdf[pdf["media_type"] == "video"]
            for media_id, payload in zip(vids["media_id"], vids["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                chunk = max(1, len(payload) // k)
                for i in range(k):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * chunk : (i + 1) * chunk]))
            yield _pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_payload": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
