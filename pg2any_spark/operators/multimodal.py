"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video bytes are carried as ``binary`` columns with typed
metadata alongside (MEDIA_SCHEMA). The Spark-side plumbing — schema,
partition sizing, Arrow batch shape, ``mapInPandas`` UDF signatures —
is real and tested. Decoding has three tiers:

1. **Built-in PNG kernel** (``functions.png``): a real decoder/encoder
   /resizer over stdlib zlib + numpy — works in this container, tested
   against real PNG bytes including all five scanline filters.
2. **PIL fast path** (import-guarded): when pillow is installed, every
   format PIL reads works; PNG still prefers the built-in kernel so
   results stay bit-deterministic across environments.
3. **Deterministic fake** (``fake=True``): pseudo-features derived
   from ``md5(payload)`` — used by the fixture-driven oracle queries,
   whose payloads are text bytes, not images.

Scale notes: media payloads dominate row size, so batch sizing is the
knob that matters — ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds Arrow batch memory, and payload columns must be pruned out of
any query that only needs metadata (Parquet column pruning gives this
for free if metadata and payload live in separate columns, which is
why MEDIA_SCHEMA keeps them flat rather than in a struct).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from pg2any_spark.sources.fixtures import load_table

#: Arrow schema produced by extract_image_features / mapInPandas.
IMAGE_FEATURE_SCHEMA = (
    "asset_id long, n_bytes int, fake_width int, fake_height int, "
    "brightness double, payload_md5 string"
)

FRAME_SAMPLE_SCHEMA = "asset_id long, frame_idx int, frame_md5 string"


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from the documents fixture:
    payload = UTF-8 bytes of the text (a stand-in blob), typed metadata
    derived from doc_id. Real pipelines replace this with a Parquet/
    Iceberg table of actual media bytes — the schema is the contract."""
    docs = load_table(spark, "documents", sf_dir)
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media_type.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        (F.col("n_chars") * 10.0).alias("duration_ms"),
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "flac")
        .otherwise("h264")
        .alias("codec"),
    )


def _fake_image_features(payload: bytes) -> tuple[int, int, float]:
    """Deterministic pseudo-decode: dimensions + brightness derived
    from the md5 digest. Stands in for a real decoder so the
    distributed plumbing is testable without codec libraries."""
    digest = hashlib.md5(payload).digest()
    width = 16 + digest[0] * 4
    height = 16 + digest[1] * 4
    brightness = round(sum(digest) / (len(digest) * 255.0), 6)
    return width, height, brightness


def _pil_image_module():
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_array(payload: bytes):
    """Decode an image payload → uint8 numpy array.

    PNG decodes with the built-in kernel (``functions.png``, stdlib
    zlib — no third-party codec needed). Other formats go through PIL
    when installed; otherwise a clear error names the fix."""
    from pg2any_spark.functions import png as _png

    data = bytes(payload)
    if data.startswith(_png.PNG_SIGNATURE):
        return _png.decode_png(data)
    image_mod = _pil_image_module()
    if image_mod is not None:
        import io  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415

        return np.asarray(image_mod.open(io.BytesIO(data)))
    raise ValueError(
        "payload is not PNG and PIL is not installed; install pillow "
        "for JPEG/WebP/... support (PNG decodes without it)"
    )


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload → (width, height, brightness).

    Real path: ``decode_array`` (built-in PNG kernel, PIL for other
    formats); brightness = mean color-channel value / 255, alpha
    excluded, rounded to 6 places. ``fake=True`` uses the
    md5-deterministic pseudo-decoder (oracle-reproducible)."""
    if fake:
        return _fake_image_features(payload)
    arr = decode_array(payload)
    if arr.ndim == 3 and arr.shape[2] in (2, 4):  # drop alpha plane
        arr = arr[:, :, : arr.shape[2] - 1]
    h, w = arr.shape[0], arr.shape[1]
    brightness = round(float(arr.mean()) / 255.0, 6)
    return w, h, brightness


def extract_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over image assets.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame;
    per-batch vectorized work, constant memory per batch. The payload
    column is pruned at the scan for any downstream query that drops
    it.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(lambda p: decode_image(bytes(p), fake=fake))
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "fake_width": feats.map(lambda t: t[0]).astype("int32"),
                    "fake_height": feats.map(lambda t: t[1]).astype("int32"),
                    "brightness": feats.map(lambda t: t[2]),
                    "payload_md5": pdf["payload"].map(
                        lambda p: hashlib.md5(bytes(p)).hexdigest()
                    ),
                }
            )
            yield out

    return media.filter(F.col("media_type") == "image").select(
        "asset_id", "payload"
    ).mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame sampling stub for video assets: emits one 'frame' per
    ``every_n_bytes`` slice of the payload (a real implementation
    decodes keyframes; the fan-out shape — one input row → many frame
    rows — is what matters for partition sizing)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                for i in range(0, max(len(data), 1), every_n_bytes):
                    ids.append(aid)
                    idxs.append(i // every_n_bytes)
                    hashes.append(hashlib.md5(data[i : i + every_n_bytes]).hexdigest())
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                }
            )

    return media.filter(F.col("media_type") == "video").select(
        "asset_id", "payload"
    ).mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


RESIZED_SCHEMA = (
    "asset_id long, width int, height int, payload binary, payload_md5 string"
)


def resize_payload(data: bytes, target_w: int, target_h: int) -> bytes:
    """Real resize of one image payload: decode (built-in PNG kernel /
    PIL), deterministic nearest-neighbor resample (integer index map —
    identical on every platform), re-encode as PNG."""
    from pg2any_spark.functions import png as _png

    arr = decode_array(data)
    return _png.encode_png(_png.resize_nearest(arr, target_w, target_h))


def resize_image(
    media: DataFrame, target_w: int = 64, target_h: int = 64, fake: bool = True
) -> DataFrame:
    """Resize image assets to ``target_w × target_h``.

    ``fake=False`` is the REAL path: per-payload decode → nearest-
    neighbor resample → PNG re-encode (``resize_payload``); works on
    actual PNG bytes with no third-party codec, and on any PIL-readable
    format when pillow is installed. ``fake=True`` keeps the
    md5-hex-chain resampler, which exists because the fixture payloads
    are text (not images) and its output is exactly reproducible in
    the DuckDB oracle.

    The Spark-side shape is shared by both paths: ``mapInPandas`` over
    payload-bearing Arrow batches, constant memory per batch, output
    schema fixed (RESIZED_SCHEMA). At scale the input payload column
    dominates batch size, so cap
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
    multi-MB.
    """
    n_out = max((target_w * target_h) // 64, 16)

    def _fake_resample(data: bytes) -> bytes:
        # Hex-string md5 chain (not raw-digest chain): each link hashes
        # the previous *hexdigest* text, so the whole chain is
        # reproducible in engines whose md5() only accepts VARCHAR
        # (DuckDB) — that is what makes this operator oracle-able.
        seed = hashlib.md5(data).hexdigest()
        buf = bytearray()
        while len(buf) < n_out:
            seed = hashlib.md5(seed.encode("ascii")).hexdigest()
            buf.extend(bytes.fromhex(seed))
        return bytes(buf[:n_out])

    def _resample(data: bytes) -> bytes:
        if fake:
            return _fake_resample(data)
        return resize_payload(data, target_w, target_h)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(lambda p: _resample(bytes(p)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "payload": resized,
                    "payload_md5": resized.map(
                        lambda p: hashlib.md5(p).hexdigest()
                    ),
                }
            )

    return media.filter(F.col("media_type") == "image").select(
        "asset_id", "payload"
    ).mapInPandas(batches, RESIZED_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata projection (no payload decode): byte size +
    content hash per asset. Payload-column pruning applies upstream."""
    return media.select(
        "asset_id",
        "media_type",
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
        "width",
        "height",
        F.round(F.col("duration_ms"), 2).alias("duration_ms"),
        "codec",
    )


# ---------------------------------------------------------------------------
# audio: WAV plumbing + feature extraction
# ---------------------------------------------------------------------------

#: Arrow schema produced by extract_audio_features / mapInPandas.
AUDIO_FEATURE_SCHEMA = (
    "asset_id long, sample_rate int, n_samples int, duration_s double, "
    "rms double, peak int"
)

AUDIO_SR = 8000
_AUDIO_AMP = 60000  # sawtooth span before the -30000 offset


def _synth_pcm(asset_id: int, label: int):
    """Deterministic int16 sawtooth: pure INTEGER arithmetic so the
    closed-form SQL oracle reproduces every sample exactly — no libm
    sin() whose low bits could differ across engines."""
    import numpy as np

    n = 4000 + (asset_id % 5) * 2000
    f = 100 + (label % 8) * 50
    k = np.arange(n, dtype=np.int64)
    s = ((k * f) % AUDIO_SR) * _AUDIO_AMP // AUDIO_SR - _AUDIO_AMP // 2
    return s.astype(np.int16)


def _wav_bytes(pcm) -> bytes:
    """Canonical 44-byte mono 16-bit RIFF/WAVE container."""
    import struct

    data = pcm.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, AUDIO_SR, AUDIO_SR * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synth_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic audio table from the embeddings fixture: one mono
    16-bit WAV payload per vector (length keyed by vec_id, pitch by
    label). The container bytes are REAL — the parser below reads them
    like any other WAV — only the waveform is synthetic, chosen
    integer-exact so features are closed-form oracle-able. Built batch
    -wise in ``mapInPandas`` (payloads never pass through a row-Python
    UDF)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["vec_id"],
                    "payload": [
                        _wav_bytes(_synth_pcm(int(a), int(lb)))
                        for a, lb in zip(pdf["vec_id"], pdf["label"])
                    ],
                }
            )

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "label")
    return emb.mapInPandas(batches, "asset_id long, payload binary")


def parse_wav(payload: bytes):
    """Parse a canonical mono 16-bit PCM WAV: (sample_rate, samples).
    Validates the RIFF/WAVE magic and the fmt fields it relies on —
    a malformed payload raises instead of yielding garbage features."""
    import struct

    import numpy as np

    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_size, audio_fmt, n_ch, sr = struct.unpack_from("<IHHI", payload, 16)
    bits = struct.unpack_from("<H", payload, 34)[0]
    if (fmt_size, audio_fmt, n_ch, bits) != (16, 1, 1, 16):
        raise ValueError("only canonical mono 16-bit PCM supported")
    if payload[36:40] != b"data":
        raise ValueError("missing data chunk")
    (data_len,) = struct.unpack_from("<I", payload, 40)
    samples = np.frombuffer(payload, dtype="<i2", count=data_len // 2, offset=44)
    return sr, samples


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """Duration / RMS / peak per audio asset via ``mapInPandas``.

    The sum of squares is accumulated in EXACT int64 (max |sample| =
    30000 → < 2^53 even at billions of samples per asset), so
    ``rms = round(sqrt(ss / n), 4)`` is bit-identical to the SQL
    oracle's integer aggregate — float summation order never enters.
    Arrow batch sizing notes are the same as images: payloads dominate
    row size, bound batches with arrow.maxRecordsPerBatch and keep the
    payload column pruned out of metadata-only consumers."""
    import math

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "asset_id": [], "sample_rate": [], "n_samples": [],
                "duration_s": [], "rms": [], "peak": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                sr, s = parse_wav(bytes(payload))
                s64 = s.astype(np.int64)
                n = len(s)
                ss = int(np.dot(s64, s64))
                out["asset_id"].append(int(aid))
                out["sample_rate"].append(sr)
                out["n_samples"].append(n)
                out["duration_s"].append(round(n / sr, 4))
                out["rms"].append(round(math.sqrt(ss / n), 4) if n else 0.0)
                out["peak"].append(int(np.max(np.abs(s64))) if n else 0)
            yield pd.DataFrame(out)

    return audio.mapInPandas(batches, AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual hashing (image near-dup)
# ---------------------------------------------------------------------------

#: dHash grid: ROWS×COLS luminance cells → ROWS×(COLS−1) adjacent
#: comparisons = 56 bits (sign bit clear, so the fingerprint is a
#: plain BIGINT in both engines).
DHASH_ROWS, DHASH_COLS = 7, 9


def _fake_pixel_grid(payload: bytes, n: int = DHASH_ROWS * DHASH_COLS) -> list:
    """Deterministic pseudo-luminance grid: the md5-hex chain of the
    payload (the same chain construction as the fake resizer), read as
    bytes — oracle-reproducible in SQL via the strpos hex decode."""
    cur = hashlib.md5(payload).hexdigest()
    out = b""
    while len(out) < n:
        cur = hashlib.md5(cur.encode("ascii")).hexdigest()
        out += bytes.fromhex(cur)
    return list(out[:n])


def _real_pixel_grid(payload: bytes) -> list:
    """Real luminance grid: decode, average color channels, then
    block-average down to the DHASH grid (integer floor — exact)."""
    import numpy as np

    arr = decode_array(payload)
    if arr.ndim == 3 and arr.shape[2] in (2, 4):
        arr = arr[:, :, : arr.shape[2] - 1]
    gray = arr.astype("int64")
    if gray.ndim == 3:
        gray = gray.sum(axis=2) // gray.shape[2]
    h, w = gray.shape
    grid = []
    for r in range(DHASH_ROWS):
        for c in range(DHASH_COLS):
            r0, r1 = r * h // DHASH_ROWS, max((r + 1) * h // DHASH_ROWS, r * h // DHASH_ROWS + 1)
            c0, c1 = c * w // DHASH_COLS, max((c + 1) * w // DHASH_COLS, c * w // DHASH_COLS + 1)
            block = gray[r0:r1, c0:c1]
            grid.append(int(block.sum()) // block.size)
    return grid


def _dhash_of_grid(grid: list, shift: int = 0) -> int:
    """Difference hash: bit (r,c) set iff the brightness-shifted cell
    right of (r,c) is strictly brighter. A uniform shift preserves
    every comparison except at the 255 clip — so a global
    brightness/contrast nudge moves the hash only a few bits, which is
    the property that makes dHash a near-dup detector."""
    def px(i: int) -> int:
        return min(255, grid[i] + shift)

    h = 0
    for r in range(DHASH_ROWS):
        for c in range(DHASH_COLS - 1):
            if px(r * DHASH_COLS + c + 1) > px(r * DHASH_COLS + c):
                h |= 1 << (r * (DHASH_COLS - 1) + c)
    return h


def image_dhash(
    media: DataFrame,
    fake: bool = True,
    brightness_shift: int = 0,
    id_out: str = "asset_id",
) -> DataFrame:
    """Per-image 56-bit perceptual difference hash (dHash) over the
    binary payload column — the standard image near-dup fingerprint
    (Arrow-batched mapInPandas, like every decoder in this module;
    ``fake=True`` derives the luminance grid from the md5 chain so the
    DuckDB oracle reproduces it bit-for-bit, ``fake=False`` decodes
    the real pixels through the built-in PNG kernel)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            grids = [
                _fake_pixel_grid(bytes(p)) if fake else _real_pixel_grid(bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    id_out: pdf["asset_id"].astype("int64"),
                    "dhash": [
                        _dhash_of_grid(g, brightness_shift) for g in grids
                    ],
                }
            )

    imgs = media.filter(F.col("media_type") == "image").select(
        "asset_id", "payload"
    )
    return imgs.mapInPandas(batches, schema=f"{id_out} long, dhash long")
