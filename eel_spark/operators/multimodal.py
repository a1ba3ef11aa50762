"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions via
``mapInPandas``.

Decode kernels: images in PPM (P6) format and audio in raw PCM s16le are
decoded FOR REAL with pure numpy (no image/audio libraries needed) —
pixel statistics, nearest-neighbor resize, and sample RMS all operate on
actual decoded arrays. Formats that genuinely need external codecs
(JPEG/PNG, compressed audio, video containers) raise NotImplementedError
unless ``fake=True`` substitutes a deterministic synthetic result; the
Spark-side contract — schemas, batch iteration, partition sizing, UDF
signatures — is identical either way, so swapping in PIL/torchaudio
changes one inner function, not the pipeline.

Scale notes: binary payloads dominate row size, so ``target_rows_per_batch``
and a ``repartition`` by byte-budget (``pack_by_bytes``) keep Arrow batches
bounded; metadata-only transformations never touch the payload column
(column pruning drops it at the scan).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def encode_ppm(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 numpy array as a PPM P6 image — the
    textbook zero-dependency raster format (header ``P6\\n{w} {h}\\n255\\n``
    followed by row-major RGB bytes)."""
    import numpy as np

    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError(f"P6 needs 3 channels, got {c}")
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_ppm(payload: bytes):
    """Decode a PPM P6 payload to an (h, w, 3) uint8 numpy array.

    Pure numpy — parses the three whitespace-separated header tokens
    (``#`` comments allowed per the spec) then views the raster bytes.
    Raises ValueError on anything that is not a complete 8-bit P6 file.
    """
    import numpy as np

    if payload is None or len(payload) < 2 or payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval; then ONE whitespace byte
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    if len(tokens) < 3:
        raise ValueError("truncated P6 header")
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only 8-bit P6 supported (maxval={maxval})")
    i += 1  # the single whitespace after maxval
    raster = payload[i : i + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated P6 raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _rgb_to_ycbcr(px):
    """Full-range BT.601 RGB → YCbCr, uint8 in/out (pure numpy)."""
    import numpy as np

    r, g, b = (px[..., k].astype(np.float64) for k in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.stack([y, cb, cr], axis=-1).round(), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(px):
    """Inverse of ``_rgb_to_ycbcr`` (±1 rounding per channel)."""
    import numpy as np

    y = px[..., 0].astype(np.float64)
    cb = px[..., 1].astype(np.float64) - 128.0
    cr = px[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def encode_y4m(frames, fps: tuple[int, int] = (4, 1)) -> bytes:
    """Encode an (n, h, w, 3) uint8 RGB array as YUV4MPEG2 (y4m), C444.

    y4m is the zero-dependency video container: one ASCII header line
    (``YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 C444``) then per frame a
    ``FRAME`` line followed by raw Y, Cb, Cr planes (C444 = no chroma
    subsampling, so each plane is w·h bytes). RGB is converted to full-
    range BT.601 YCbCr; ``decode_y4m``/``y4m_frame`` invert it."""
    import numpy as np

    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[-1] != 3:
        raise ValueError(f"need (n, h, w, 3) frames, got shape {arr.shape}")
    # planar: full Y plane, then Cb, then Cr
    planes = np.stack([_rgb_to_ycbcr(f).transpose(2, 0, 1) for f in arr])
    return encode_y4m_planes(planes, fps=fps)


def encode_y4m_planes(planes, fps: tuple[int, int] = (4, 1)) -> bytes:
    """Encode an (n, 3, h, w) uint8 YCbCr plane stack directly as C444
    y4m — the RGB-free sibling of ``encode_y4m`` for payloads born in
    YCbCr (or for planting engine-neutral plane values that must survive
    the container round-trip bit-exactly, with no BT.601 rounding)."""
    import numpy as np

    arr = np.ascontiguousarray(planes, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[1] != 3:
        raise ValueError(f"need (n, 3, h, w) planes, got shape {arr.shape}")
    n, _, h, w = arr.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444\n".encode("ascii")]
    for k in range(n):
        out.append(b"FRAME\n" + arr[k].tobytes())
    return b"".join(out)


def parse_y4m(payload: bytes) -> dict:
    """Parse a y4m stream header → dict(width, height, fps_num, fps_den,
    n_frames, data_offset, frame_stride). C444 only (the format this
    module emits); other chroma modes raise ValueError — pure numpy has
    no business resampling 4:2:0 chroma here."""
    if payload is None or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = fps_num = fps_den = None
    chroma = "420"  # the spec's default when no C param is present
    for tok in payload[len(b"YUV4MPEG2"):nl].split():
        tag, val = chr(tok[0]), tok[1:].decode("ascii")
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            fps_num, fps_den = (int(x) for x in val.split(":"))
        elif tag == "C":
            chroma = val
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if chroma != "444":
        raise ValueError(
            f"only C444 y4m is supported (got C{chroma}); chroma-subsampled "
            "streams need a real decoder"
        )
    frame_bytes = 3 * w * h
    stride = len(b"FRAME\n") + frame_bytes
    data_offset = nl + 1
    body = len(payload) - data_offset
    if body % stride:
        raise ValueError("truncated y4m stream (partial frame)")
    n_frames = body // stride
    # frames with parameters on the FRAME line would break the constant
    # stride. Verifying EVERY marker here would make header parsing
    # O(n_frames) — and frame sampling O(n_frames²) for long videos — so
    # only frame 0 is checked eagerly; ``y4m_frame`` verifies the marker
    # of the frame it actually extracts (any parameterized frame shifts
    # all later offsets, so the next extraction fails loudly).
    if n_frames and payload[data_offset : data_offset + 6] != b"FRAME\n":
        raise ValueError("y4m frame 0 has parameters or is misaligned")
    return {
        "width": w,
        "height": h,
        "fps_num": fps_num or 25,
        "fps_den": fps_den or 1,
        "n_frames": n_frames,
        "data_offset": data_offset,
        "frame_stride": stride,
    }


def y4m_frame_planes(payload: bytes, k: int):
    """Raw (3, h, w) uint8 YCbCr planes of frame ``k`` of a C444 y4m
    stream — the container-level decode (indexes straight into the plane
    bytes, so extracting one frame never materializes the others).
    ``y4m_frame`` layers the BT.601 RGB conversion on top."""
    import numpy as np

    info = parse_y4m(payload)
    if not 0 <= k < info["n_frames"]:
        raise IndexError(f"frame {k} out of range 0..{info['n_frames'] - 1}")
    w, h = info["width"], info["height"]
    off = info["data_offset"] + k * info["frame_stride"]
    if payload[off : off + 6] != b"FRAME\n":
        raise ValueError(f"y4m frame {k} has parameters or is misaligned")
    off += len(b"FRAME\n")
    planes = np.frombuffer(payload[off : off + 3 * w * h], dtype=np.uint8)
    return planes.reshape(3, h, w)


def y4m_frame(payload: bytes, k: int):
    """Decode frame ``k`` of a C444 y4m stream to (h, w, 3) uint8 RGB."""
    return _ycbcr_to_rgb(y4m_frame_planes(payload, k).transpose(1, 2, 0))


def decode_y4m(payload: bytes):
    """Decode ALL frames of a C444 y4m stream to (n, h, w, 3) uint8 RGB."""
    import numpy as np

    info = parse_y4m(payload)
    return np.stack(
        [y4m_frame(payload, k) for k in range(info["n_frames"])]
    ) if info["n_frames"] else np.zeros(
        (0, info["height"], info["width"], 3), dtype=np.uint8
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests.

    Every modality carries a REAL decodable payload: images are PPM P6
    with a seeded gradient raster (dimensions matching ``meta``); audio
    is raw PCM s16le samples of a seeded sine-ish wave; video is a
    YUV4MPEG2 (C444) stream at 4 fps — quarter-resolution seeded
    gradient frames, one per 250 ms of ``duration_ms`` (a 0-duration
    video still carries one frame)."""
    import numpy as np

    def gradient(w_, h_, seed):
        yy, xx = np.mgrid[0:h_, 0:w_]
        return np.stack(
            [
                (xx * 3 + seed) % 256,
                (yy * 5 + 2 * seed) % 256,
                (xx + yy + 7 * seed) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)

    rows = []
    for i in range(n):
        media_type = ["image", "audio", "video"][i % 3]
        w, h = 64 + i % 32, 48 + i % 16
        if media_type == "image":
            payload = encode_ppm(gradient(w, h, i))
        elif media_type == "audio":
            t = np.arange(256 + (i % 5) * 64, dtype=np.float64)
            wave = np.sin(t * (0.05 + 0.01 * (i % 7))) * (1000 + 100 * i)
            payload = wave.astype("<i2").tobytes()
        else:
            dur, fps = 1000 * (i % 7), 4
            n_frames = max(1, dur * fps // 1000)
            vw, vh = w // 4, h // 4
            payload = encode_y4m(
                np.stack([gradient(vw, vh, i + 13 * t) for t in range(n_frames)]),
                fps=(fps, 1),
            )
        rows.append(
            (i, payload, media_type,
             (w, h, 1000 * (i % 7), "ppm" if media_type == "image"
              else ("pcm_s16le" if media_type == "audio" else "y4m")))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_media_lcg(spark, n: int = 64) -> DataFrame:
    """Engine-neutral synthetic media table: every payload byte/sample is
    a pure function of (media_id, coordinate) in integer modular
    arithmetic, so an external oracle (DuckDB) can reproduce the decoded
    statistics from ``generate_series`` arithmetic WITHOUT decoding —
    while the Spark side still exercises the REAL codecs
    (``decode_ppm`` / ``decode_pcm_s16le`` / ``parse_y4m`` +
    ``y4m_frame_planes``). The r8/r9 deterministic-corpus pattern
    (see queries/pipeline.py) applied to binary payloads.

    Per modality (w = 64 + i%32, h = 48 + i%16):
    - image (i ≡ 0 mod 3): P6, channel values at (x, y) =
      ((x·3 + i) % 256, (y·5 + 2i) % 256, (x + y + 7i) % 256);
    - audio (i ≡ 1 mod 3): 256 + (i%5)·64 PCM s16le samples,
      s_k = ((i·1000003 + k·40503 + 12345)·2654435761) % 65536 − 32768;
    - video (i ≡ 2 mod 3): C444 y4m at 1 fps with i%7 + 1 frames of
      quarter-resolution (w//4 × h//4) YCbCr planes planted DIRECTLY
      (``encode_y4m_planes`` — no lossy BT.601 round-trip), plane p of
      frame k at (x, y) = (x·3 + y·5 + 17p + 13k + i) % 256.
    """
    import numpy as np

    rows = []
    for i in range(n):
        media_type = ["image", "audio", "video"][i % 3]
        w, h = 64 + i % 32, 48 + i % 16
        if media_type == "image":
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [(xx * 3 + i) % 256, (yy * 5 + 2 * i) % 256,
                 (xx + yy + 7 * i) % 256],
                axis=-1,
            ).astype(np.uint8)
            payload, codec = encode_ppm(px), "ppm"
        elif media_type == "audio":
            ns = 256 + (i % 5) * 64
            samples = [
                ((i * 1000003 + k * 40503 + 12345) * 2654435761) % 65536 - 32768
                for k in range(ns)
            ]
            payload, codec = np.array(samples, dtype="<i2").tobytes(), "pcm_s16le"
        else:
            nf, vw, vh = i % 7 + 1, w // 4, h // 4
            yy, xx = np.mgrid[0:vh, 0:vw]
            planes = np.stack(
                [
                    np.stack(
                        [(xx * 3 + yy * 5 + 17 * p + 13 * k + i) % 256
                         for p in range(3)],
                        axis=0,
                    )
                    for k in range(nf)
                ]
            ).astype(np.uint8)
            payload, codec = encode_y4m_planes(planes, fps=(1, 1)), "y4m"
        rows.append(
            (i, payload, media_type, (w, h, 1000 * (i % 7), codec))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


PAYLOAD_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("n_units", T.LongType(), True),
        T.StructField("unit_sum", T.LongType(), True),
        T.StructField("unit_sq_sum", T.LongType(), True),
    ]
)


def payload_integer_stats(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Exact integer statistics of every payload's decoded units — ONE
    Arrow-batched mapInPandas over all three modalities (no union, no
    shuffle), dispatching on media_type:

    - image: ``decode_ppm`` → raster bytes (units = w·h·3 channel values);
    - audio: PCM s16le samples (units = int16 sample values, sum may be
      negative);
    - video: ``parse_y4m`` + ``y4m_frame_planes`` on frames sampled at
      t = 0..duration_ms step ``every_ms`` (a 0-duration video samples
      frame 0 once); units = raw YCbCr plane bytes of the sampled frames
      — container-level, so no float conversion touches the values.

    Returns (media_id, media_type, n_bytes, n_units, unit_sum,
    unit_sq_sum), all integers — the hash-exact form the DuckDB oracle
    reproduces arithmetically for ``synth_media_lcg`` corpora. Undecodable
    payloads fail loudly (ValueError), never silently drop."""
    import numpy as np

    def stats(payload, media_type, meta):
        if media_type == "image":
            px = decode_ppm(payload).astype(np.int64)
            return len(payload), px.size, int(px.sum()), int((px * px).sum())
        if media_type == "audio":
            s = np.frombuffer(payload, dtype="<i2").astype(np.int64)
            return len(payload), s.size, int(s.sum()), int((s * s).sum())
        info = parse_y4m(payload)
        dur = 0 if meta is None or meta["duration_ms"] is None else meta["duration_ms"]
        n = tot = sq = 0
        for ts in range(0, int(dur) + 1, every_ms):
            idx = min(
                info["n_frames"] - 1,
                ts * info["fps_num"] // (1000 * info["fps_den"]),
            )
            planes = y4m_frame_planes(payload, idx).astype(np.int64)
            n += planes.size
            tot += int(planes.sum())
            sq += int((planes * planes).sum())
        return len(payload), n, tot, sq

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                stats(p, mt, m)
                for p, mt, m in zip(pdf["payload"], pdf["media_type"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [o[0] for o in out],
                    "n_units": [o[1] for o in out],
                    "unit_sum": [o[2] for o in out],
                    "unit_sq_sum": [o[3] for o in out],
                }
            )

    return df.mapInPandas(run, PAYLOAD_STATS_SCHEMA)


def _image_features(payload: bytes, fake: bool) -> list[float]:
    """8 real statistics of the decoded raster, all in [0, 1): per-channel
    means and stds, luminance mean, and mean absolute horizontal gradient
    of luminance (an edge-density proxy). Non-PPM payloads fall back to
    the deterministic double under ``fake=True`` or fail honestly."""
    import numpy as np

    if payload is None or len(payload) == 0:
        return [0.0] * 8
    try:
        px = decode_ppm(payload).astype(np.float64)
    except ValueError:
        if not fake:
            raise NotImplementedError(
                "non-PPM image decode requires PIL/opencv (not in this "
                "container); pass fake=True for the deterministic double"
            )
        return [float(sum(payload[k::8]) % 997) / 997.0 for k in range(8)]
    means = px.mean(axis=(0, 1)) / 256.0
    stds = px.std(axis=(0, 1)) / 128.0
    lum = px @ np.array([0.299, 0.587, 0.114])
    grad = np.abs(np.diff(lum, axis=1)).mean() / 256.0 if px.shape[1] > 1 else 0.0
    return [float(x) for x in (*means, *stds, lum.mean() / 256.0, grad)]


def extract_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    PPM (P6) payloads are decoded for real (pure numpy) into pixel
    statistics; other formats need PIL/opencv and either raise or (with
    ``fake=True``) use the deterministic double. Batch iterator in, batch
    iterator out, bounded memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "features": pdf["payload"].map(
                        lambda p: _image_features(p, fake)
                    ),
                }
            )
            yield out

    return df.filter(F.col("media_type") == "image").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _resize_image(payload: bytes, w: int, h: int, fake: bool) -> bytes:
    """Real nearest-neighbor resize for P6 payloads (decode → numpy index
    sampling → re-encode); non-PPM formats fall back to the deterministic
    double under ``fake=True`` or fail honestly."""
    import numpy as np

    if payload is None:
        return b""
    try:
        px = decode_ppm(payload)
    except ValueError:
        if not fake:
            raise NotImplementedError(
                "non-PPM image resize requires PIL/opencv (not in this "
                "container); pass fake=True for the deterministic double"
            )
        target = max(1, (w * h) // 64)
        reps = (target // max(1, len(payload))) + 1
        return (payload * reps)[:target]
    sh, sw = px.shape[:2]
    rows = np.minimum((np.arange(h) * sh) // h, sh - 1)
    cols = np.minimum((np.arange(w) * sw) // w, sw - 1)
    return encode_ppm(px[rows][:, cols])


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, fake: bool = False
) -> DataFrame:
    """Image resize as mapInPandas: binary in, binary out, metadata
    updated — the write-back shape (payload column replaced, not
    appended) a re-encode pipeline uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(
                        lambda p: _resize_image(p, width, height, fake)
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return df.filter(F.col("media_type") == "image").mapInPandas(run, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def decode_pcm_s16le(payload: bytes):
    """Raw PCM s16le → float64 sample array in [-1, 1) — pure numpy (raw
    PCM has no container to parse; an odd trailing byte means the payload
    is not sample-aligned and is rejected)."""
    import numpy as np

    if len(payload) % 2:
        raise ValueError("PCM s16le payload has odd byte length")
    return np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0


def extract_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Audio feature extraction (duration passthrough + sample RMS).

    Raw PCM s16le payloads are decoded for real (pure numpy); compressed
    codecs need torchaudio/librosa and either raise or (with
    ``fake=True``) use the byte-level deterministic double. Real Arrow
    batch contract either way."""

    def rms(p: bytes, codec) -> float:
        if p is None or len(p) == 0:
            return 0.0
        if codec == "pcm_s16le":
            return float((decode_pcm_s16le(p) ** 2).mean() ** 0.5)
        if not fake:
            raise NotImplementedError(
                f"audio decode for codec {codec!r} requires torchaudio/"
                "librosa (not in this container); pass fake=True for the "
                "deterministic double"
            )
        return (sum(b * b for b in p) / len(p)) ** 0.5 / 255.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "duration_ms": pdf["meta"].map(
                        lambda m: None if m is None else m["duration_ms"]
                    ),
                    "rms": [
                        rms(p, None if m is None else m["codec"])
                        for p, m in zip(pdf["payload"], pdf["meta"])
                    ],
                }
            )

    return df.filter(F.col("media_type") == "audio").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes per-row frame timestamps to
    sample (metadata-only — payload column pruned away), the shape a real
    decoder fans out over. Returns (media_id, frame_ts_ms array).
    """
    return df.filter(F.col("media_type") == "video").select(
        "media_id",
        F.when(
            F.col("meta.duration_ms") > 0,
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("frame_ts_ms"),
    )


def pack_by_bytes(df: DataFrame, byte_col: F.Column, target_mb: int = 64) -> DataFrame:
    """Repartition so each partition holds ~target_mb of payload — the
    knob that keeps Arrow batches and executor memory bounded when rows
    are megabytes each."""
    total = df.agg(F.sum(byte_col).alias("b")).first()["b"] or 0
    parts = max(1, int(total / (target_mb * 1024 * 1024)))
    return df.repartition(parts)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _decode_frame(payload: bytes, ts_ms: int, fake: bool) -> bytes:
    """Frame nearest ``ts_ms``, re-encoded as PPM P6 so sampled frames
    feed straight back into the image kernels (extract_image_features /
    resize_images). y4m payloads decode FOR REAL (pure numpy); container
    formats (mp4/mkv/webm) need ffmpeg and either raise or, with
    ``fake=True``, use the timestamp-keyed deterministic double."""
    if payload is None or len(payload) == 0:
        return b""
    try:
        info = parse_y4m(payload)
    except ValueError:
        if not fake:
            raise NotImplementedError(
                "non-y4m video decode requires ffmpeg/opencv (not in this "
                "container); pass fake=True for the deterministic double"
            )
        # deterministic "frame": a timestamp-keyed slice of the payload
        start = ts_ms % max(1, len(payload))
        return (payload[start:] + payload[:start])[:32]
    if info["n_frames"] == 0:
        return b""
    idx = min(
        info["n_frames"] - 1,
        ts_ms * info["fps_num"] // (1000 * info["fps_den"]),
    )
    return encode_ppm(y4m_frame(payload, idx))


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Video → sampled frames, the fan-OUT multimodal shape: one input row
    becomes len(duration/every_ms) output rows.

    The timestamp plan is computed JVM-side (frame_sample_plan) and the
    payload is carried through ONE mapInPandas that explodes to frames —
    batch iterator in/out, so a 2 GB video with 300 sampled frames never
    materializes all frames of a batch's videos at once beyond the yielded
    frame rows. y4m payloads decode for real; other containers are
    gated behind ``fake`` (see ``_decode_frame``).
    """
    planned = df.filter(F.col("media_type") == "video").select(
        "media_id",
        "payload",
        F.when(
            F.col("meta.duration_ms") > 0,
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("frame_ts_ms"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tss, frames = [], [], []
            for mid, payload, ts_list in zip(
                pdf["media_id"], pdf["payload"], pdf["frame_ts_ms"]
            ):
                for ts in ts_list:
                    ids.append(mid)
                    tss.append(int(ts))
                    frames.append(_decode_frame(payload, int(ts), fake))
            yield pd.DataFrame({"media_id": ids, "frame_ts_ms": tss, "frame": frames})

    return planned.mapInPandas(run, FRAME_SCHEMA)
