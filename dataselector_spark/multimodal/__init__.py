"""Multimodal column handling (SURVEY.md §2 B16).

Pattern: media payloads are opaque ``binary`` columns travelling next to a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker touches whole record batches, never
rows. The Spark-side plumbing (schema, batch iteration, partition sizing) is
real and tested; the actual codec step is stubbed deterministically because
image/audio libraries are not in this container — swap `_decode_stub` for a
PIL/ffmpeg call and nothing else changes.

Scale notes: binary payloads dominate row size, so partition sizing must key
off `spark.sql.files.maxPartitionBytes`, not row counts; feature extraction
is map-only (no shuffle) and the output (small numeric features) should be
written columnar so downstream training reads never touch the blobs again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    pass

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary payload + metadata struct from the
    documents table (the container has no real media files): payload =
    UTF-8 bytes of the text; width/height derived from doc_id. Exercises the
    exact schema a real ingest would produce."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.pmod(F.col("doc_id"), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(48)) + 12).cast("int").alias("height"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas:
    per-record byte statistics (the stand-in for pixel/frame statistics).
    Map-only — no shuffle; output is small numeric columns.

    The batch closure is deliberately self-contained (captures only plain
    values + pandas): Spark's Python workers cannot import this package when
    the driver runs from outside the repo, so no module-level names may leak
    into the pickled closure."""
    have_pil = HAVE_PIL

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(payload: bytes) -> bytes:
            # Stand-in for a real codec (PIL/ffmpeg) — deterministic identity.
            if have_pil:
                raise NotImplementedError(
                    "real decode path intentionally unimplemented in this container"
                )
            return payload

        for pdf in it:
            decoded = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": decoded.map(len).astype("int64"),
                    "byte_mean": decoded.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "byte_min": decoded.map(lambda b: min(b) if len(b) else 0),
                    "byte_max": decoded.map(lambda b: max(b) if len(b) else 0),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Binary-in / binary-out transform (the resize stage of an image
    pipeline) via mapInPandas. The codec is stubbed deterministically —
    payload truncated/cycled to exactly width*height bytes — but the
    plumbing is the real thing: binary columns both ways, metadata struct
    rebuilt to reflect the new dimensions, map-only (no shuffle).
    Swap the stub for PIL's `Image.resize` and nothing else changes."""
    w, h = int(width), int(height)

    def batches(it):
        import pandas as pd

        target = w * h

        def fake_resize(payload: bytes) -> bytes:
            # Deterministic stand-in for a real resample: cycle the source
            # bytes to the target length (empty source -> zero bytes).
            if not payload:
                return bytes(target)
            reps = target // len(payload) + 1
            return (payload * reps)[:target]

        for pdf in it:
            resized = pdf["payload"].map(fake_resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "meta": [
                        {
                            "media_type": m["media_type"],
                            "width": w,
                            "height": h,
                            "n_bytes": len(p),
                        }
                        for m, p in zip(pdf["meta"], resized)
                    ],
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int, every_n: int = 2) -> DataFrame:
    """Row-expanding transform (the frame-sampling stage of a video
    pipeline): treat each payload as consecutive ``frame_bytes`` chunks and
    emit every ``every_n``-th chunk as its own row — 1 row in, N rows out,
    the generator shape `explode` can't give you when the expansion needs
    imperative logic. Map-only; output partition count follows input."""
    fb, k = int(frame_bytes), int(every_n)

    def batches(it):
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // fb
                for i in range(0, n_frames, k):
                    chunk = payload[i * fb : (i + 1) * fb]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(chunk)
                    out["n_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)


BITMAP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def synthesize_bitmaps(docs: DataFrame) -> DataFrame:
    """Deterministic RAW grayscale bitmaps (no codec needed): each doc gets a
    (height x width) uint8 raster with pixel(r, c) = (doc_id*31 + r*7 + c*13)
    mod 256, exactly width*height payload bytes. Unlike `synthesize_media`'s
    text bytes, these are honest raster payloads, so downstream raster ops
    (resize, stats) can do REAL pixel arithmetic with numpy — no PIL/ffmpeg
    required, and every byte is reproducible for tests and rows-only checks."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for doc_id in pdf["doc_id"]:
                w = int(doc_id) % 64 + 16
                h = int(doc_id) % 48 + 12
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                img = ((int(doc_id) * 31 + r * 7 + c * 13) % 256).astype(np.uint8)
                payloads.append(img.tobytes())
                metas.append(
                    {
                        "media_type": "image/raw8",
                        "width": w,
                        "height": h,
                        "n_bytes": w * h,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id").mapInPandas(batches, BITMAP_SCHEMA)


def encode_pgm(media: DataFrame) -> DataFrame:
    """Encode raw uint8 rasters as binary PGM (P5) — a REAL image format,
    written byte-exact with no codec library: header ``P5\\n<w> <h>\\n255\\n``
    followed by the row-major raster. Arrow-batched mapInPandas, map-only.
    Output payloads open in any image viewer / PIL / ImageMagick."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                header = f"P5\n{m['width']} {m['height']}\n255\n".encode("ascii")
                payloads.append(header + bytes(p))
                metas.append(
                    {
                        "media_type": "image/x-portable-graymap",
                        "width": m["width"],
                        "height": m["height"],
                        "n_bytes": len(header) + len(p),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, BITMAP_SCHEMA)


def decode_pgm(media: DataFrame) -> DataFrame:
    """REAL image decode with no optional dependency: parse the binary PGM
    (P5) header — magic, whitespace/comment handling, dimensions, maxval —
    and return the raw uint8 raster + rebuilt metadata. This is the honest
    version of the former `_decode_stub`: actual bytes of an actual image
    format are parsed per the netpbm spec (comments starting '#' allowed
    between header tokens), so the decode stage of the pipeline exercises
    real codec logic end-to-end. Swap in PIL for compressed formats (JPEG/
    PNG) — schema, batching, and partitioning stay identical."""

    def batches(it):
        import pandas as pd

        def parse(buf: bytes):
            # netpbm header: 'P5', then 3 ints (w, h, maxval) separated by
            # whitespace, '#' comments running to end-of-line allowed; a
            # single whitespace byte then separates header from raster.
            if buf[:2] != b"P5":
                raise ValueError(f"not a P5/PGM payload: {buf[:2]!r}")
            pos, tokens = 2, []
            while len(tokens) < 3:
                while pos < len(buf) and buf[pos : pos + 1].isspace():
                    pos += 1
                if buf[pos : pos + 1] == b"#":
                    while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                        pos += 1
                    continue
                start = pos
                while pos < len(buf) and not buf[pos : pos + 1].isspace():
                    pos += 1
                tokens.append(int(buf[start:pos]))
            pos += 1  # the single whitespace after maxval
            w, h, maxval = tokens
            if maxval != 255:
                raise ValueError(f"only 8-bit PGM supported, maxval={maxval}")
            raster = buf[pos : pos + w * h]
            if len(raster) != w * h:
                raise ValueError(f"truncated raster: {len(raster)} != {w * h}")
            if len(buf) - pos != w * h:
                # strict: trailing bytes mean a corrupted or concatenated
                # payload — decoding it silently would hide the corruption
                # (ADVICE r5 #4)
                raise ValueError(
                    f"trailing bytes after raster: {len(buf) - pos - w * h}"
                )
            return w, h, raster

        for pdf in it:
            payloads, metas = [], []
            for buf in pdf["payload"]:
                w, h, raster = parse(bytes(buf))
                payloads.append(raster)
                metas.append(
                    {
                        "media_type": "image/raw8",
                        "width": w,
                        "height": h,
                        "n_bytes": w * h,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, BITMAP_SCHEMA)


def synthesize_rgb_bitmaps(docs: DataFrame) -> DataFrame:
    """Deterministic RAW interleaved-RGB bitmaps (the color twin of
    `synthesize_bitmaps`): each doc gets a (height x width x 3) uint8 raster
    with channel(r, c, k) = (doc_id*31 + r*7 + c*13 + k*101) mod 256 and
    exactly width*height*3 payload bytes. Closed-form per-byte, so the PPM
    encode→decode roundtrip can be value-verified pixel-exactly in SQL.
    Dimensions are kept smaller than the grayscale twin (3× the bytes per
    pixel) so the DuckDB oracle's per-pixel replay stays cheap."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for doc_id in pdf["doc_id"]:
                w = int(doc_id) % 32 + 8
                h = int(doc_id) % 24 + 6
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                k = np.arange(3, dtype=np.int64)[None, None, :]
                img = ((int(doc_id) * 31 + r * 7 + c * 13 + k * 101) % 256).astype(
                    np.uint8
                )
                payloads.append(img.tobytes())
                metas.append(
                    {
                        "media_type": "image/raw24",
                        "width": w,
                        "height": h,
                        "n_bytes": w * h * 3,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id").mapInPandas(batches, BITMAP_SCHEMA)


def encode_ppm(media: DataFrame) -> DataFrame:
    """Encode raw interleaved-RGB rasters as binary PPM (P6) — the color
    sibling of `encode_pgm`, same netpbm family: header ``P6\\n<w> <h>\\n255\\n``
    followed by row-major RGB triplets. Byte-exact, no codec library;
    Arrow-batched mapInPandas, map-only."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                header = f"P6\n{m['width']} {m['height']}\n255\n".encode("ascii")
                payloads.append(header + bytes(p))
                metas.append(
                    {
                        "media_type": "image/x-portable-pixmap",
                        "width": m["width"],
                        "height": m["height"],
                        "n_bytes": len(header) + len(p),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, BITMAP_SCHEMA)


def decode_ppm(media: DataFrame) -> DataFrame:
    """REAL color-image decode with no optional dependency: parse the binary
    PPM (P6) header per the netpbm spec — magic, whitespace/'#'-comment
    handling, dimensions, maxval — and return the raw interleaved-RGB raster
    + rebuilt metadata. Strict: truncated rasters AND trailing bytes both
    raise (a concatenated/corrupted payload must not decode silently)."""

    def batches(it):
        import pandas as pd

        def parse(buf: bytes):
            if buf[:2] != b"P6":
                raise ValueError(f"not a P6/PPM payload: {buf[:2]!r}")
            pos, tokens = 2, []
            while len(tokens) < 3:
                while pos < len(buf) and buf[pos : pos + 1].isspace():
                    pos += 1
                if buf[pos : pos + 1] == b"#":
                    while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                        pos += 1
                    continue
                start = pos
                while pos < len(buf) and not buf[pos : pos + 1].isspace():
                    pos += 1
                tokens.append(int(buf[start:pos]))
            pos += 1  # the single whitespace after maxval
            w, h, maxval = tokens
            if maxval != 255:
                raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
            n = w * h * 3
            if len(buf) - pos < n:
                raise ValueError(f"truncated raster: {len(buf) - pos} != {n}")
            if len(buf) - pos != n:
                raise ValueError(f"trailing bytes after raster: {len(buf) - pos - n}")
            return w, h, buf[pos : pos + n]

        for pdf in it:
            payloads, metas = [], []
            for buf in pdf["payload"]:
                w, h, raster = parse(bytes(buf))
                payloads.append(raster)
                metas.append(
                    {
                        "media_type": "image/raw24",
                        "width": w,
                        "height": h,
                        "n_bytes": w * h * 3,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, BITMAP_SCHEMA)


def resize_bitmap_nn(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL nearest-neighbor resize over raw uint8 rasters via numpy index
    mapping — the actual resample arithmetic (source row r' = r*h//out_h,
    col c' = c*w//out_w), not a byte-cycling stand-in. Arrow-batched
    mapInPandas, map-only, binary-in/binary-out; swap in PIL only if you
    need fancier filters (bilinear/Lanczos) — the Spark plumbing is
    identical."""
    ow, oh = int(out_w), int(out_h)

    def batches(it):
        import numpy as np
        import pandas as pd

        rows_idx_cache = {}

        def resize(payload: bytes, w: int, h: int) -> bytes:
            img = np.frombuffer(payload, dtype=np.uint8).reshape(h, w)
            key = (w, h)
            if key not in rows_idx_cache:
                rows_idx_cache[key] = (
                    (np.arange(oh) * h) // oh,
                    (np.arange(ow) * w) // ow,
                )
            ri, ci = rows_idx_cache[key]
            return img[ri][:, ci].tobytes()

        for pdf in it:
            payloads = [
                resize(p, m["width"], m["height"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "meta": [
                        {
                            "media_type": m["media_type"],
                            "width": ow,
                            "height": oh,
                            "n_bytes": ow * oh,
                        }
                        for m in pdf["meta"]
                    ],
                }
            )

    return media.mapInPandas(batches, BITMAP_SCHEMA)


AUDIO_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", AUDIO_META),
    ]
)


def synthesize_pcm(docs: DataFrame) -> DataFrame:
    """Deterministic mono int16 PCM clips (the audio sibling of
    `synthesize_bitmaps`): doc_id gets n = doc_id%512 + 256 samples at
    8 kHz with sample(i) = ((doc_id*7919 + i*2654435761) mod 65536) - 32768
    — integer closed form, so every decoded sample is replayable in SQL
    with no float trig. Little-endian int16 payload bytes, reproducible on
    any executor layout."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 512 + 256
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 7919 + i * 2654435761) % 65536 - 32768).astype(
                    "<i2"
                )
                payloads.append(samples.tobytes())
                metas.append(
                    {
                        "media_type": "audio/raw-s16le",
                        "sample_rate": 8000,
                        "n_samples": n,
                        "n_bytes": 2 * n,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id").mapInPandas(batches, AUDIO_SCHEMA)


def encode_wav(media: DataFrame) -> DataFrame:
    """Encode raw int16 PCM as a REAL RIFF/WAVE file, byte-exact with no
    codec library: ``RIFF <size> WAVE`` + a 16-byte PCM ``fmt `` chunk
    (format 1, mono, 16-bit, byte-rate/block-align derived) + the ``data``
    chunk. Output payloads play in any audio player / load with the stdlib
    ``wave`` module. Arrow-batched mapInPandas, map-only."""

    def batches(it):
        import struct

        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                pcm = bytes(p)
                sr, ch, bits = int(m["sample_rate"]), 1, 16
                block = ch * bits // 8
                fmt = struct.pack(
                    "<4sIHHIIHH", b"fmt ", 16, 1, ch, sr, sr * block, block, bits
                )
                data = struct.pack("<4sI", b"data", len(pcm)) + pcm
                riff = struct.pack(
                    "<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE"
                )
                buf = riff + fmt + data
                payloads.append(buf)
                metas.append(
                    {
                        "media_type": "audio/wav",
                        "sample_rate": sr,
                        "n_samples": len(pcm) // block,
                        "n_bytes": len(buf),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, AUDIO_SCHEMA)


def decode_wav(media: DataFrame) -> DataFrame:
    """REAL audio decode with no optional dependency: walk the RIFF chunk
    list per spec (magic, chunk ids + sizes, word alignment), require a PCM
    (format 1) mono 16-bit ``fmt `` chunk before ``data``, and reject
    trailing bytes, unknown compression codes, or a truncated data chunk —
    the same strictness contract as `decode_pgm`/`decode_ppm` (a silent
    partial decode would hide corruption). Unknown NON-essential chunks
    (e.g. LIST metadata) are skipped, as the spec requires. Returns the raw
    s16le payload + rebuilt metadata. Swap in soundfile/ffmpeg for
    compressed codecs — schema, batching, and partitioning stay identical."""

    def batches(it):
        import struct

        import pandas as pd

        def parse(buf: bytes):
            if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
                raise ValueError(f"not a RIFF/WAVE payload: {buf[:12]!r}")
            (riff_size,) = struct.unpack_from("<I", buf, 4)
            if 8 + riff_size != len(buf):
                raise ValueError(
                    f"RIFF size {riff_size} != payload {len(buf) - 8}"
                )
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(buf):
                cid, csize = struct.unpack_from("<4sI", buf, pos)
                body = buf[pos + 8 : pos + 8 + csize]
                if len(body) != csize:
                    raise ValueError(f"truncated {cid!r} chunk")
                if cid == b"fmt ":
                    if csize < 16:
                        raise ValueError(f"fmt chunk too short: {csize}")
                    code, ch, sr, _br, _ba, bits = struct.unpack_from(
                        "<HHIIHH", body, 0
                    )
                    if code != 1 or ch != 1 or bits != 16:
                        raise ValueError(
                            f"only PCM mono 16-bit supported: "
                            f"code={code} ch={ch} bits={bits}"
                        )
                    fmt = sr
                elif cid == b"data":
                    if fmt is None:
                        raise ValueError("data chunk before fmt chunk")
                    data = body
                # other chunks (LIST, fact, ...) skipped per spec
                pos += 8 + csize + (csize & 1)  # chunks are word-aligned
            if pos != len(buf):
                raise ValueError(f"trailing bytes after last chunk: {len(buf) - pos}")
            if data is None:
                raise ValueError("no data chunk")
            if len(data) % 2:
                raise ValueError("odd data length for 16-bit samples")
            return fmt, data

        for pdf in it:
            payloads, metas = [], []
            for buf in pdf["payload"]:
                sr, pcm = parse(bytes(buf))
                payloads.append(pcm)
                metas.append(
                    {
                        "media_type": "audio/raw-s16le",
                        "sample_rate": sr,
                        "n_samples": len(pcm) // 2,
                        "n_bytes": len(pcm),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, AUDIO_SCHEMA)


VIDEO_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", VIDEO_META),
    ]
)


def synthesize_clips(docs: DataFrame) -> DataFrame:
    """Deterministic multi-frame grayscale clips (the video sibling of
    `synthesize_bitmaps`): doc_id gets n = doc_id%6 + 2 frames of
    (h = doc_id%12 + 6) x (w = doc_id%16 + 8) uint8 luma with
    pixel(t, r, c) = (doc_id*31 + t*17 + r*7 + c*13) mod 256 — closed-form,
    so every decoded pixel of every frame is replayable in SQL. Payload =
    frames concatenated row-major."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, nf = d % 16 + 8, d % 12 + 6, d % 6 + 2
                t = np.arange(nf, dtype=np.int64)[:, None, None]
                r = np.arange(h, dtype=np.int64)[None, :, None]
                c = np.arange(w, dtype=np.int64)[None, None, :]
                clip = ((d * 31 + t * 17 + r * 7 + c * 13) % 256).astype(
                    np.uint8
                )
                payloads.append(clip.tobytes())
                metas.append(
                    {
                        "media_type": "video/raw8",
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "n_bytes": w * h * nf,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id").mapInPandas(batches, VIDEO_SCHEMA)


def encode_y4m(media: DataFrame) -> DataFrame:
    """Encode raw luma clips as a REAL video container — YUV4MPEG2 (.y4m),
    byte-exact with no codec library: stream header
    ``YUV4MPEG2 W<w> H<h> F25:1 Ip A1:1 Cmono\\n`` then per frame
    ``FRAME\\n`` + the row-major luma plane (Cmono = luma-only, so plane
    size is exactly w*h). Output payloads play in ffplay/mpv and parse
    with ffprobe. Arrow-batched mapInPandas, map-only."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                raw = bytes(p)
                w, h, nf = int(m["width"]), int(m["height"]), int(m["n_frames"])
                head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode()
                frames = b"".join(
                    b"FRAME\n" + raw[i * w * h : (i + 1) * w * h]
                    for i in range(nf)
                )
                buf = head + frames
                payloads.append(buf)
                metas.append(
                    {
                        "media_type": "video/x-yuv4mpeg2",
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "n_bytes": len(buf),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, VIDEO_SCHEMA)


def decode_y4m(media: DataFrame) -> DataFrame:
    """REAL video-container decode with no optional dependency: parse the
    YUV4MPEG2 stream header (magic, space-separated W/H/F/I/A/C parameter
    tagged fields — unknown X extension fields skipped per spec), require
    Cmono (luma-only; subsampled chroma needs a real pixel lib), then walk
    the FRAME markers — each may carry its own parameters up to the
    newline, and every plane must be exactly w*h bytes. Strictness contract
    as decode_pgm/decode_wav: wrong magic, missing W/H, unsupported
    colorspace, truncated plane, or trailing bytes all raise. Returns the
    concatenated raw luma + rebuilt metadata; swap in ffmpeg for compressed
    codecs with identical schema/batching/partitioning."""

    def batches(it):
        import pandas as pd

        def parse(buf: bytes):
            nl = buf.find(b"\n")
            if nl < 0 or not buf.startswith(b"YUV4MPEG2"):
                raise ValueError(f"not a YUV4MPEG2 payload: {buf[:12]!r}")
            w = h = None
            cs = "420"  # the spec default when no C field is present
            for tok in buf[9:nl].split(b" "):
                if not tok:
                    continue
                tag, val = tok[:1], tok[1:]
                if tag == b"W":
                    w = int(val)
                elif tag == b"H":
                    h = int(val)
                elif tag == b"C":
                    cs = val.decode("ascii")
                # F/I/A/X fields are valid but irrelevant to the raster
            if w is None or h is None:
                raise ValueError("stream header missing W or H")
            if cs != "mono":
                raise ValueError(f"only Cmono supported, got C{cs}")
            pos, planes = nl + 1, []
            while pos < len(buf):
                if buf[pos : pos + 5] != b"FRAME":
                    raise ValueError(f"expected FRAME marker at {pos}")
                fnl = buf.find(b"\n", pos)
                if fnl < 0:
                    raise ValueError("unterminated FRAME header")
                plane = buf[fnl + 1 : fnl + 1 + w * h]
                if len(plane) != w * h:
                    raise ValueError(
                        f"truncated frame plane: {len(plane)} != {w * h}"
                    )
                planes.append(plane)
                pos = fnl + 1 + w * h
            if not planes:
                raise ValueError("no frames")
            return w, h, b"".join(planes)

        for pdf in it:
            payloads, metas = [], []
            for buf in pdf["payload"]:
                w, h, raw = parse(bytes(buf))
                payloads.append(raw)
                metas.append(
                    {
                        "media_type": "video/raw8",
                        "width": w,
                        "height": h,
                        "n_frames": len(raw) // (w * h),
                        "n_bytes": len(raw),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, VIDEO_SCHEMA)


def synthesize_bitmaps_paired(docs: DataFrame) -> DataFrame:
    """Deterministic rasters with BUILT-IN near-duplicates: docs 2k and 2k+1
    share one base raster (dims and pixels derived from base = doc_id - the
    parity bit), and the odd doc adds a checkerboard +1 perturbation — the
    re-encoded/re-screenshotted variant of the same image a web crawl
    yields. The base pixel rides ``% 255`` (range 0..254) so the +1 never
    wraps: a pair's rasters differ by at most 1 per pixel. Per-base gradient steps
    (7 + base%5, 13 + base%11) plus an r*c cross term (3 + base%7) give each
    base a distinct curved texture — a PURELY linear generator downsamples
    to near-identical half-plane 8x8 bit patterns under the mean threshold,
    and a perceptual hash correctly (but unhelpfully) calls the whole corpus
    one near-dup cluster (observed: 941 pairs instead of ~250 at sf0.01
    before the cross term). Closed-form, so perceptual-hash
    oracles replay every pixel (the synthesize_bitmaps contract)."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                base = doc_id - (doc_id % 2)
                w = base % 64 + 16
                h = base % 48 + 12
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                rstep = 7 + base % 5
                cstep = 13 + base % 11
                xstep = 3 + base % 7
                img = (base * 31 + r * rstep + c * cstep + r * c * xstep) % 255 + (
                    doc_id % 2
                ) * ((r + c) % 2)
                payloads.append(img.astype(np.uint8).tobytes())
                metas.append(
                    {
                        "media_type": "image/raw8",
                        "width": w,
                        "height": h,
                        "n_bytes": w * h,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id").mapInPandas(batches, BITMAP_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash_lo", T.LongType()),
        T.StructField("ahash_hi", T.LongType()),
    ]
)


def ahash64(media: DataFrame) -> DataFrame:
    """64-bit average perceptual hash (aHash) of raw uint8 rasters — the
    classic image-dedup fingerprint: nearest-neighbor downsample to 8x8
    (resize_bitmap_nn's exact index mapping), then bit j = 1 iff
    pixel_j * 64 >= sum(pixels) — the mean comparison as an integer
    cross-multiply, so every bit is exact integer arithmetic an oracle can
    replay (no float mean, no rounding mode). Returned as two longs
    (bits 0-31 -> ahash_lo, 32-63 -> ahash_hi) so neither engine touches
    the sign bit of a 64-bit value. Arrow-batched mapInPandas, map-only;
    near-duplicate images differ in O(few) bits, unrelated images in ~32."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            los, his = [], []
            for d, p, m in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                w, h = int(m["width"]), int(m["height"])
                if len(p) != w * h:
                    raise ValueError(
                        f"ahash64: doc_id={d} raster payload is {len(p)} "
                        f"bytes, expected width*height={w}*{h}={w * h}"
                    )
                img = np.frombuffer(p, dtype=np.uint8).reshape(h, w)
                ri = (np.arange(8) * h) // 8
                ci = (np.arange(8) * w) // 8
                small = img[ri][:, ci].astype(np.int64).ravel()  # row-major
                s = int(small.sum())
                bits = (small * 64 >= s).astype(np.int64)
                lo = int((bits[:32] << np.arange(32)).sum())
                hi = int((bits[32:] << np.arange(32)).sum())
                los.append(lo)
                his.append(hi)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ahash_lo": los, "ahash_hi": his}
            )

    return media.mapInPandas(batches, AHASH_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [T.StructField(f"h{k}", T.LongType()) for k in range(8)]
)


def phash256(media: DataFrame) -> DataFrame:
    """256-bit perceptual hash: 16x16 nearest-neighbor downsample, then the
    same integer mean test as ahash64 (bit j = pixel_j * 256 >= sum). The
    WIDER fingerprint exists for scale, not accuracy: exact-recall LSH
    banding on a 64-bit hash is stuck with <=9-bit bands (pigeonhole), whose
    256-value buckets only cut all-pairs work by a constant ~32x
    (tools/ahash_ladder.py measured brute codegen winning through 80k
    images). 256 bits give 16 bands of 16 bits — 65536-value buckets, so
    banded candidates scale as n^2/65536 and the equi-join actually prunes
    once corpora outgrow the brute scan. Returned as 8 longs of 32 bits
    (h0..h7, row-major bit order), sign-bit free in both engines."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            cols: dict[str, list] = {f"h{k}": [] for k in range(8)}
            for d, p, m in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                w, h = int(m["width"]), int(m["height"])
                if len(p) != w * h:
                    raise ValueError(
                        f"phash256: doc_id={d} raster payload is {len(p)} "
                        f"bytes, expected width*height={w}*{h}={w * h}"
                    )
                img = np.frombuffer(p, dtype=np.uint8).reshape(h, w)
                ri = (np.arange(16) * h) // 16
                ci = (np.arange(16) * w) // 16
                small = img[ri][:, ci].astype(np.int64).ravel()
                s = int(small.sum())
                bits = (small * 256 >= s).astype(np.int64)
                for k in range(8):
                    chunk = bits[32 * k : 32 * k + 32]
                    cols[f"h{k}"].append(int((chunk << np.arange(32)).sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **cols})

    return media.mapInPandas(batches, PHASH_SCHEMA)


def synthesize_scene_clips(docs: DataFrame) -> DataFrame:
    """`synthesize_clips` with PLANTED SCENE BOUNDARIES: doc_id gets
    n = doc_id%6 + 2 frames of (h = doc_id%12 + 6) x (w = doc_id%16 + 8)
    uint8 luma where pixel(t, r, c) =
    (doc_id*31 + (t // L)*101 + t*3 + r*7 + c*13) mod 256 with scene
    length L = doc_id%3 + 2. Within a scene consecutive frames differ by
    a +3 luma drift (mean abs diff ~6 including mod-256 wrap); across a
    boundary the (t // L) term jumps by 101 (mean abs diff ~123) — a
    >20x planted contrast, and still fully closed-form so the oracle
    can replay every pixel of every frame."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, nf = d % 16 + 8, d % 12 + 6, d % 6 + 2
                scene_len = d % 3 + 2
                t = np.arange(nf, dtype=np.int64)[:, None, None]
                r = np.arange(h, dtype=np.int64)[None, :, None]
                c = np.arange(w, dtype=np.int64)[None, None, :]
                clip = (
                    (d * 31 + (t // scene_len) * 101 + t * 3 + r * 7 + c * 13)
                    % 256
                ).astype(np.uint8)
                payloads.append(clip.tobytes())
                metas.append(
                    {
                        "media_type": "video/raw8",
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "n_bytes": w * h * nf,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id").mapInPandas(batches, VIDEO_SCHEMA)


SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_cuts", T.LongType()),
        T.StructField("first_cut", T.LongType()),
    ]
)


def detect_scene_cuts(media: DataFrame, threshold: int = 50) -> DataFrame:
    """Shot-boundary detection on raw luma clips: a cut between frames
    t-1 and t when the sum of absolute pixel differences exceeds
    threshold * (pixels per frame). ALL-INTEGER decision math (uint8 ->
    int16 diff, int64 sum, integer threshold product), so the verdict is
    bit-exact and replayable — no float mean to accumulate differently
    across engines. Map-only (one pass over payload bytes, no shuffle);
    emits per-clip n_cuts and the first cut index (NULL when the clip is
    a single shot). Defensive shape check names the doc_id on a payload
    whose length disagrees with meta (the ADVICE r8 ahash rule)."""
    thr = int(threshold)

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "n_frames": [], "n_cuts": [], "first_cut": []}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                w, h, nf = (
                    int(meta["width"]),
                    int(meta["height"]),
                    int(meta["n_frames"]),
                )
                if len(payload) != w * h * nf:
                    raise ValueError(
                        f"doc_id={int(doc_id)}: payload {len(payload)}B, "
                        f"meta says {w}x{h}x{nf}={w * h * nf}B"
                    )
                clip = np.frombuffer(payload, dtype=np.uint8).reshape(
                    nf, h * w
                )
                sad = np.abs(
                    clip[1:].astype(np.int64) - clip[:-1].astype(np.int64)
                ).sum(axis=1)
                cuts = np.nonzero(sad > thr * h * w)[0] + 1
                out["doc_id"].append(int(doc_id))
                out["n_frames"].append(nf)
                out["n_cuts"].append(int(cuts.size))
                out["first_cut"].append(
                    int(cuts[0]) if cuts.size else None
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, SCENE_CUT_SCHEMA)


def synthesize_gapped_pcm(docs: DataFrame) -> DataFrame:
    """`synthesize_pcm` with PLANTED SILENCE: same n = doc_id%512 + 256
    samples and integer-hash waveform, but every 4th block of
    G = doc_id%32 + 16 samples (blocks with (i // G) % 4 == 1) is zeroed
    — silence runs of length >= 16 alternating with ~3G of loud hash
    noise (mean |s| ~ 16k), a >30x contrast at any sane threshold, and
    still fully closed-form so the oracle can replay every sample."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 512 + 256
                g = d % 32 + 16
                i = np.arange(n, dtype=np.int64)
                samples = (
                    (d * 7919 + i * 2654435761) % 65536 - 32768
                ).astype(np.int64)
                samples[(i // g) % 4 == 1] = 0
                payloads.append(samples.astype("<i2").tobytes())
                metas.append(
                    {
                        "media_type": "audio/raw-s16le",
                        "sample_rate": 8000,
                        "n_samples": n,
                        "n_bytes": 2 * n,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id").mapInPandas(batches, AUDIO_SCHEMA)


SILENCE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_runs", T.LongType()),
        T.StructField("silent_samples", T.LongType()),
        T.StructField("first_run_start", T.LongType()),
    ]
)


def detect_silence_runs(
    media: DataFrame, threshold: int = 512, min_run: int = 8
) -> DataFrame:
    """Silence segmentation on raw PCM: maximal runs of consecutive
    samples with |s| <= threshold; runs shorter than min_run are noise
    dropouts and ignored. ALL-INTEGER decision math (int16 -> int64 abs
    vs an integer threshold), map-only, one pass per payload; emits
    per-clip qualifying-run count, samples inside qualifying runs, and
    the first run's start index (NULL when the clip has none). The
    defensive shape check names the doc_id (the ADVICE r8 rule)."""
    thr, mr = int(threshold), int(min_run)

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {
                "doc_id": [],
                "n_runs": [],
                "silent_samples": [],
                "first_run_start": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                n = int(meta["n_samples"])
                if len(payload) != 2 * n:
                    raise ValueError(
                        f"doc_id={int(doc_id)}: payload {len(payload)}B, "
                        f"meta says {n} s16 samples = {2 * n}B"
                    )
                s = np.frombuffer(payload, dtype="<i2").astype(np.int64)
                quiet = np.abs(s) <= thr
                padded = np.concatenate(([False], quiet, [False]))
                starts = np.nonzero(padded[1:-1] & ~padded[:-2])[0]
                ends = np.nonzero(padded[1:-1] & ~padded[2:])[0]
                lens = ends - starts + 1
                keep = lens >= mr
                out["doc_id"].append(int(doc_id))
                out["n_runs"].append(int(keep.sum()))
                out["silent_samples"].append(int(lens[keep].sum()))
                out["first_run_start"].append(
                    int(starts[keep][0]) if keep.any() else None
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, SILENCE_SCHEMA)
