"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video cells are opaque
``binary`` columns plus typed metadata columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` so the bytes never round-trip through Python row objects.

Container-header METADATA decoding is REAL and pure-stdlib:
``parse_image_dims`` reads PNG IHDR / GIF logical-screen / JPEG SOF
headers, ``parse_wav_meta`` reads RIFF/WAVE headers (``wave`` + struct).
PIXEL/SAMPLE decoding is REAL for every format stdlib can express —
24-bit BI_RGB BMP (``decode_bmp_pixels``), 8-bit PNG including all five
scanline filters (``decode_png_pixels``, zlib inflate + unfilter), GIF
(``decode_gif_pixels``, pure-Python variable-width LZW + palette), and
8/16-bit PCM WAV (``decode_wav_samples``). JPEG's DCT entropy coding and
compressed audio (mp3/ogg) raise ValueError where PIL/libvips/ffmpeg
would plug in. Payloads that are not a recognized container fall back to
a deterministic md5-derived fake in the metadata extractors so the
plumbing stays testable on arbitrary bytes.

Scale notes: binary payloads inflate row size — keep
``spark.sql.files.maxPartitionBytes`` low enough that an Arrow batch of
payloads fits executor memory, and select the payload column as late as
possible so column pruning keeps it out of unrelated scans.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of ``text_col``).

    Stands in for reading real image/audio bytes; the rest of the pipeline
    treats it as opaque media bytes."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8"))


# -- real stdlib container-header parsers ------------------------------------


def parse_image_dims(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a PNG / GIF / JPEG header, or None.

    Pure stdlib: PNG IHDR (bytes 16-24 after the 8-byte signature), GIF
    logical screen descriptor (4 LE bytes after 'GIF8xa'), JPEG SOF0-SOF15
    frame header (marker scan; DHT/JPG/DAC excluded). No pixel decode."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return int(w), int(h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return int(w), int(h)
    if b[:2] == b"\xff\xd8":
        i, n = 2, len(b)
        while i + 4 <= n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
                i += 2  # padding / standalone markers carry no length
                continue
            if marker == 0xDA:
                # SOS: entropy-coded data follows — a frame header past
                # this point can't be trusted (0xFF bytes inside the scan
                # would be misread as markers)
                return None
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= n:
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return int(w), int(h)
                return None
            i += 2 + seglen
    return None


def parse_wav_meta(b: bytes) -> tuple[int, int] | None:
    """(sample_rate, n_frames) from a RIFF/WAVE header, or None.

    Uses the stdlib ``wave`` reader over an in-memory buffer — fmt/data
    chunk walking, compression-code validation, frame accounting for
    free."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(b)) as w:
            return w.getframerate(), w.getnframes()
    except (wave.Error, EOFError, struct.error):
        return None


# -- synthetic container builders (tests + gate fixtures) --------------------


def make_wav_payload(data: bytes, sample_rate: int) -> bytes:
    """A real 8-bit PCM mono WAV file around ``data`` (1 byte = 1 frame)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(data)
    return buf.getvalue()


def make_png_payload(width: int, height: int) -> bytes:
    """A real PNG signature + IHDR chunk (valid CRC; no pixel data)."""
    ihdr = struct.pack(">II5B", width, height, 8, 0, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def make_png_rgb_payload(width: int, height: int, pixel_rows: bytes) -> bytes:
    """A REAL complete 8-bit RGB PNG: signature + IHDR + one IDAT
    (zlib-compressed scanlines, filter 0) + IEND. ``pixel_rows`` is
    height*(3*width) RGB bytes, top-down. Pure stdlib (zlib + struct)."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(
        b"\x00" + pixel_rows[y * 3 * width : (y + 1) * 3 * width]
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def decode_png_pixels(b: bytes):
    """REAL pixel decode for 8-bit non-interlaced PNG — stdlib zlib
    inflate + the five scanline unfilters (None/Sub/Up/Average/Paeth),
    vectorized per row with numpy.

    Returns (width, height, ndarray[height, width, channels] uint8).
    Palette/interlaced/16-bit images raise ValueError (out of scope)."""
    import numpy as np

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    pos, n = 8, len(b)
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos + 8 <= n:
        length = struct.unpack_from(">I", b, pos)[0]
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">II5B", body
            )
            if bit_depth != 8:
                raise ValueError("only 8-bit PNG supported")
            if color_type not in _PNG_CHANNELS:
                raise ValueError("palette PNG not supported")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("scanline data size mismatch")
    img = np.empty((height, stride), np.uint16)
    zero = np.zeros(stride, np.uint16)
    for y in range(height):
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).astype(
            np.uint16
        )
        ftype = raw[y * (stride + 1)]
        prev = img[y - 1] if y else zero
        if ftype == 0:
            img[y] = line
        elif ftype == 2:  # Up
            img[y] = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth depend on the just-reconstructed left
            # neighbor — sequential in x over pixel positions; channels
            # within a position stay vectorized
            cur = img[y]
            for x in range(0, stride, ch):
                a = cur[x - ch : x] if x else zero[:ch]
                seg = slice(x, x + ch)
                if ftype == 1:
                    cur[seg] = (line[seg] + a) & 0xFF
                elif ftype == 3:
                    cur[seg] = (line[seg] + (a + prev[seg]) // 2) & 0xFF
                else:
                    c_ = prev[x - ch : x] if x else zero[:ch]
                    p = a.astype(np.int32) + prev[seg].astype(np.int32) - c_.astype(np.int32)
                    pa = np.abs(p - a)
                    pb = np.abs(p - prev[seg])
                    pc = np.abs(p - c_)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a,
                        np.where(pb <= pc, prev[seg], c_),
                    )
                    cur[seg] = (line[seg] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
    return width, height, img.astype(np.uint8).reshape(height, width, ch)


def make_gif_payload(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def make_jpeg_payload(width: int, height: int) -> bytes:
    """Minimal JPEG: SOI + 1-component SOF0 frame header + EOI."""
    sof = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xc0"
        + struct.pack(">H", 2 + len(sof))
        + sof
        + b"\xff\xd9"
    )


def make_bmp_payload(width: int, height: int, pixel_rows: bytes) -> bytes:
    """A real uncompressed 24-bit BI_RGB BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER). ``pixel_rows`` is height*(3*width) BGR bytes,
    top-down; the file stores them bottom-up with 4-byte row padding, per
    the format."""
    stride = (3 * width + 3) & ~3
    pad = b"\x00" * (stride - 3 * width)
    body = b"".join(
        pixel_rows[y * 3 * width : (y + 1) * 3 * width] + pad
        for y in range(height - 1, -1, -1)
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height,
        2835, 2835, 0, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return head + dib + body


def decode_bmp_pixels(b: bytes):
    """REAL pixel decode for uncompressed 24-bit BI_RGB BMP — pure
    stdlib struct + numpy view, no imaging library.

    Returns (width, height, ndarray[height, width, 3] uint8 BGR,
    top-down). Raises ValueError for anything that isn't this exact
    (and most common uncompressed) BMP flavor; compressed codecs
    (PNG/GIF/JPEG entropy coding) stay out of scope by design."""
    import numpy as np

    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP file")
    offset = struct.unpack_from("<I", b, 10)[0]
    header_size = struct.unpack_from("<I", b, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    width, height = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BI_RGB supported")
    top_down = height < 0
    height = abs(height)
    stride = (3 * width + 3) & ~3
    arr = (
        np.frombuffer(b, np.uint8, stride * height, offset)
        .reshape(height, stride)[:, : 3 * width]
        .reshape(height, width, 3)
    )
    return width, height, (arr if top_down else arr[::-1])


def decode_image(payload: bytes):
    """Pixel decode dispatch — pure stdlib+numpy end to end: BMP (struct
    + numpy view), 8-bit PNG (zlib inflate + the five unfilters), GIF
    (pure-Python LZW + palette), baseline-sequential JPEG (canonical
    Huffman + dequant + IDCT, ``decode_jpeg_pixels``). Progressive JPEG
    and subsampled chroma raise ValueError from the JPEG decoder."""
    raw = bytes(payload)
    if raw[:2] == b"BM":
        return decode_bmp_pixels(raw)
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(raw)
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(raw)
    if raw[:2] == b"\xff\xd8":
        return decode_jpeg_pixels(raw)
    raise ValueError("unrecognized image container")


def extract_image_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Image metadata via REAL header parsing: PNG IHDR / GIF logical
    screen / JPEG SOF (``parse_image_dims``, pure stdlib). Payloads that
    are not a recognized image container fall back to deterministic
    md5-derived dims (1 + first/second 16 bits mod 512) so arbitrary
    bytes still flow through the Arrow-batched plumbing."""

    out_schema = f"{id_col} long, width long, height long"

    def one(b) -> tuple[int, int]:
        raw = bytes(b)
        dims = parse_image_dims(raw)
        if dims is None:
            h = hashlib.md5(raw).hexdigest()
            dims = (1 + int(h[:4], 16) % 512, 1 + int(h[4:8], 16) % 512)
        return dims

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf[payload_col].map(one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def resize_dims(width, height, max_dim: int = 256):
    """Aspect-preserving thumbnail dimensions as Column expressions
    (integer math, floor scaling, min 1px). The geometry half of a resize
    operator — the pixel half plugs into decode_image_stub."""
    from pyspark.sql import Column

    w = F.col(width) if isinstance(width, str) else width
    h = F.col(height) if isinstance(height, str) else height
    longest = F.greatest(w, h)
    new_w = F.greatest(F.floor(w * max_dim / longest), F.lit(1)).cast("long")
    new_h = F.greatest(F.floor(h * max_dim / longest), F.lit(1)).cast("long")
    keep = longest <= max_dim
    return (
        F.when(keep, w).otherwise(new_w).cast("long"),
        F.when(keep, h).otherwise(new_h).cast("long"),
    )


def attach_wav_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    payload_col: str = "payload",
) -> DataFrame:
    """Materialize a REAL WAV container per row: 8-bit PCM mono, sample
    rate = AUDIO_RATES[id % 4], frame data = the UTF-8 bytes of
    ``text_col`` (1 byte = 1 frame). Gives the audio-metadata operators a
    genuine RIFF/WAVE header to parse while keeping every field derivable
    from (id, text) — which is what lets the SQL oracle state the expected
    values without building bytes."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def wav(ids: pd.Series, texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                make_wav_payload(t.encode("utf-8"), AUDIO_RATES[int(i) % 4])
                for i, t in zip(ids, texts)
            ]
        )

    return df.withColumn(payload_col, wav(F.col(id_col), F.col(text_col)))


def attach_png_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    w_mult: int = 37,
    h_mult: int = 53,
    mod: int = 512,
) -> DataFrame:
    """Materialize a REAL PNG header per row with deterministic dims
    width = 1 + (id*w_mult) % mod, height = 1 + (id*h_mult) % mod — a
    genuine IHDR for ``extract_image_meta`` to parse, with dims the SQL
    oracle can restate from ``id`` alone."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def png(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [
                make_png_payload(
                    1 + int(i) * w_mult % mod, 1 + int(i) * h_mult % mod
                )
                for i in ids
            ]
        )

    return df.withColumn(payload_col, png(F.col(id_col)))


def decode_wav_samples(b: bytes):
    """REAL sample decode for PCM WAV — stdlib ``wave`` + numpy view.

    Returns (sample_rate, ndarray[n_frames, n_channels] int64; 8-bit PCM
    is unsigned [0,255], 16-bit signed). Raises ValueError for non-PCM /
    other widths — compressed audio needs an external codec."""
    import numpy as np

    try:
        with wave.open(io.BytesIO(bytes(b))) as w:
            rate = w.getframerate()
            channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"not a PCM WAV file: {e}") from e
    if sampwidth == 1:
        arr = np.frombuffer(raw, np.uint8).astype(np.int64)
    elif sampwidth == 2:
        arr = np.frombuffer(raw, "<i2").astype(np.int64)
    else:
        raise ValueError("only 8/16-bit PCM supported")
    return rate, arr.reshape(-1, channels)


def decode_audio(payload: bytes):
    """Audio decode dispatch: PCM WAV decodes for real (stdlib);
    compressed codecs (mp3/ogg/aac) need ffmpeg/soundfile."""
    return decode_wav_samples(payload)


AUDIO_RATES = (8000, 16000, 22050, 44100)


def _audio_meta_one(b) -> tuple[int, int]:
    """(sample_rate, n_samples): REAL RIFF/WAVE header when the payload is
    a WAV file, md5-derived deterministic fallback otherwise."""
    raw = bytes(b)
    meta = parse_wav_meta(raw)
    if meta is None:
        h = hashlib.md5(raw).hexdigest()
        meta = (AUDIO_RATES[int(h[:2], 16) % 4], int(h[8:12], 16) % 100_000 + len(raw))
    return meta


def extract_audio_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Audio metadata via REAL header parsing: RIFF/WAVE sample rate and
    frame count (``parse_wav_meta``, stdlib ``wave``). Non-WAV payloads
    fall back to deterministic md5-derived values. Arrow-batched
    mapInPandas; output (id, sample_rate, n_samples, duration_ms)."""

    out_schema = f"{id_col} long, sample_rate long, n_samples long, duration_ms long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf[payload_col].map(_audio_meta_one)
            rates = meta.map(lambda m: m[0]).astype("int64")
            n_samples = meta.map(lambda m: m[1]).astype("int64")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": rates,
                    "n_samples": n_samples,
                    "duration_ms": (n_samples * 1000 // rates).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_ms: int = 500,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame —
    (id, frame_idx, frame_ts_ms, frame_hash). The media duration comes
    from the REAL container header when the payload is an MJPEG AVI
    (``parse_avi_meta`` — frame hashes then key off the DECODED frame
    pixels; see ``sample_video_frames`` for the full per-frame pixel
    stats) or a WAV file (``parse_wav_meta`` via ``_audio_meta_one``),
    else the deterministic md5 stub; the one-in-many-out Arrow batch
    row explosion is the production part."""

    out_schema = f"{id_col} long, frame_idx long, frame_ts_ms long, frame_hash string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, hashes = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                avi = parse_avi_meta(b)
                if avi is not None:
                    _, _, uspf, n_avi = avi
                    _, _, _, av_frames = decode_avi_frames(b)
                    h = hashlib.md5(
                        b"".join(f.tobytes() for f in av_frames)
                    ).hexdigest()
                    duration_ms = n_avi * uspf // 1000
                    # strict ts < duration, matching sample_video_frames
                    # on the same payload (ts == duration is media time
                    # that does not exist; the WAV/stub branches below
                    # keep their long-pinned inclusive endpoint)
                    n_frames = (
                        min((duration_ms - 1) // every_ms + 1, max_frames)
                        if duration_ms > 0
                        else 0
                    )
                    for i in range(n_frames):
                        ids.append(rid)
                        idxs.append(i)
                        tss.append(i * every_ms)
                        hashes.append(
                            hashlib.md5(f"{h}:{i}".encode()).hexdigest()
                        )
                    continue
                rate, n_samples = _audio_meta_one(b)
                # the frame hash keys off the DECODED sample data (WAV
                # frames), not the container bytes — container metadata
                # doesn't change frame content; non-containers hash whole
                data = b
                if parse_wav_meta(b) is not None:
                    with wave.open(io.BytesIO(b)) as w:
                        data = w.readframes(w.getnframes())
                h = hashlib.md5(data).hexdigest()
                duration_ms = n_samples * 1000 // rate
                n_frames = min(duration_ms // every_ms + 1, max_frames)
                for i in range(n_frames):
                    ids.append(rid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    hashes.append(hashlib.md5(f"{h}:{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def extract_binary_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake decode: byte_len + md5 hex of the payload. The
    mapInPandas shape (iterator of pandas batches in/out, explicit output
    schema) is exactly what a real decoder uses; swap the body, keep the
    harness."""
    out_schema = f"{id_col} long, byte_len long, content_hash string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def attach_bmp_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    mod: int = 16,
    bias: int = 0,
    src_col: str | None = None,
    texture: bool = False,
) -> DataFrame:
    """Materialize a REAL 24-bit BMP per row with deterministic pixels:
    dims (1 + id % mod, 1 + id*3 % mod), channel values at (x, y) =
    (id + x*7 + y*13 + bias, id + x*11 + y*3 + bias, id + x*5 + y*17
    + bias) mod 256 for (B, G, R). A genuine uncompressed container for
    decode_bmp_pixels, with every pixel restatable from ``id`` alone —
    which is what lets the SQL oracle state exact channel sums without
    building bytes.

    ``bias`` models a brightness tweak of the same underlying image
    (near-duplicate fixture for perceptual hashing); ``src_col`` lets a
    row's pixels derive from a DIFFERENT column than its id (e.g. a
    perturbed copy keyed by a fresh doc_id whose pixels come from the
    original's id); ``texture`` adds an id-dependent x*y cross term
    (``x*y*(1 + id % 7)``) to every channel so distinct ids produce
    perceptually DISTINCT images (without it the additive formulas make
    same-dims images order-identical, collapsing perceptual hashes)."""
    import numpy as np

    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def bmp(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h = 1 + i % mod, 1 + (i * 3) % mod
            x = np.arange(w).reshape(1, w)
            y = np.arange(h).reshape(h, 1)
            t = x * y * (1 + i % 7) if texture else 0
            px = np.empty((h, w, 3), np.uint8)
            px[:, :, 0] = (i + x * 7 + y * 13 + bias + t) % 256
            px[:, :, 1] = (i + x * 11 + y * 3 + bias + t) % 256
            px[:, :, 2] = (i + x * 5 + y * 17 + bias + t) % 256
            out.append(make_bmp_payload(w, h, px.tobytes()))
        return pd.Series(out)

    return df.withColumn(payload_col, bmp(F.col(src_col or id_col)))


def extract_pixel_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder=None,
    channel_cols: tuple = ("sum_b", "sum_g", "sum_r"),
) -> DataFrame:
    """REAL pixel statistics over image payloads: decode every pixel
    (default ``decode_bmp_pixels``; pass ``decode_image`` to also accept
    PNG — both stdlib-only) and reduce to exact integer channel sums.
    Arrow-batched mapInPandas; output (id, width, height, n_pixels,
    *channel_cols) — all BIGINT, so the oracle compares exactly, no
    float tolerance."""
    if decoder is None:
        decoder = decode_bmp_pixels
    out_schema = (
        f"{id_col} long, width long, height long, n_pixels long, "
        + ", ".join(f"{c} long" for c in channel_cols)
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in
                    (id_col, "width", "height", "n_pixels", *channel_cols)}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = decoder(bytes(b))
                nch = px.shape[2]
                sums = px.reshape(-1, nch).sum(axis=0, dtype="int64")
                rows[id_col].append(int(i))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                for k, col in enumerate(channel_cols):
                    rows[col].append(int(sums[k]))
            yield pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in rows.items()})

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def attach_pcm_wav_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    base_samples: int = 16,
    mod_samples: int = 64,
    bias: int = 0,
    src_col: str | None = None,
    texture: bool = False,
) -> DataFrame:
    """Materialize a REAL 8-bit PCM mono WAV per row with deterministic
    samples: n = base + id % mod samples, sample i = (id*31 + i*7
    + bias [+ (i*i % 16) * (1 + id % 5) if texture]) % 256,
    rate = AUDIO_RATES[id % 4] — every sample restatable from ``id`` for
    the SQL oracle.

    ``bias`` models a DC/level shift of the same recording (near-dup
    fixture for audio fingerprinting); ``src_col`` keys the samples off
    a different column than the row id; ``texture`` adds an
    id-dependent quadratic ripple so distinct ids produce waveforms
    with DISTINCT local shape (the plain sawtooth is order-identical
    across ids, which collapses difference fingerprints)."""
    import numpy as np

    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def wav(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            n = base_samples + i % mod_samples
            idx = np.arange(n)
            t = (idx * idx % 16) * (1 + i % 5) if texture else 0
            data = ((i * 31 + idx * 7 + bias + t) % 256).astype(np.uint8).tobytes()
            out.append(make_wav_payload(data, AUDIO_RATES[i % 4]))
        return pd.Series(out)

    return df.withColumn(payload_col, wav(F.col(src_col or id_col)))


def extract_audio_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL sample statistics over PCM WAV payloads: decode every frame
    (decode_wav_samples — stdlib wave + numpy) and reduce to exact
    integer stats. Output (id, sample_rate, n_samples, sum_samples,
    peak) — all BIGINT, exact oracle compare."""
    out_schema = (
        f"{id_col} long, sample_rate long, n_samples long, "
        "sum_samples long, peak long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in
                    (id_col, "sample_rate", "n_samples", "sum_samples", "peak")}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                rate, samples = decode_wav_samples(bytes(b))
                flat = samples.reshape(-1)
                rows[id_col].append(int(i))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(flat))
                rows["sum_samples"].append(int(flat.sum()))
                rows["peak"].append(int(flat.max()) if len(flat) else 0)
            yield pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in rows.items()})

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def attach_png_rgb_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    mod: int = 16,
) -> DataFrame:
    """Materialize a REAL complete PNG per row (IDAT pixels, zlib) with
    the SAME deterministic id-derived dims/channel formulas as
    attach_bmp_payload — so one SQL oracle covers both containers and a
    decode through the zlib+unfilter path must land on identical sums."""
    import numpy as np

    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def png(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h = 1 + i % mod, 1 + (i * 3) % mod
            x = np.arange(w).reshape(1, w)
            y = np.arange(h).reshape(h, 1)
            px = np.empty((h, w, 3), np.uint8)
            px[:, :, 0] = (i + x * 7 + y * 13) % 256
            px[:, :, 1] = (i + x * 11 + y * 3) % 256
            px[:, :, 2] = (i + x * 5 + y * 17) % 256
            out.append(make_png_rgb_payload(w, h, px.tobytes()))
        return pd.Series(out)

    return df.withColumn(payload_col, png(F.col(id_col)))


def make_gif_indexed_payload(
    width: int, height: int, indices: bytes, palette: bytes
) -> bytes:
    """A REAL complete GIF89a: logical screen + 256-entry global color
    table + one image block, pixel indices LZW-coded with the classic
    "uncompressed GIF" scheme (9-bit literal codes, clear code re-emitted
    before the dictionary would force a width change). ``indices`` is
    width*height palette indices top-down; ``palette`` is 768 RGB bytes."""
    assert len(palette) == 768 and len(indices) == width * height
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256 entries
    out += palette
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW minimum code size
    clear, bits = 256, 9
    codes = [clear]
    for i, px in enumerate(indices):
        codes.append(px)
        # 254 literals after a clear keeps next_code < 512 -> width stays 9
        if i % 254 == 253:
            codes.append(clear)
    codes.append(257)  # end of information
    # pack codes LSB-first
    acc = n_acc = 0
    data = bytearray()
    for code in codes:
        acc |= code << n_acc
        n_acc += bits
        while n_acc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
    if n_acc:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-flavor LZW: variable code width, clear/EOI codes, dictionary
    grows to 4096 then freezes until the next clear."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh():
        return {i: bytes([i]) for i in range(1 << min_code_size)}

    table = fresh()
    next_code = eoi + 1
    bits = min_code_size + 1
    acc = n_acc = pos = 0
    prev = None
    out = bytearray()
    while len(out) < n_pixels:
        while n_acc < bits:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << n_acc
            pos += 1
            n_acc += 8
        code = acc & ((1 << bits) - 1)
        acc >>= bits
        n_acc -= bits
        if code == clear:
            table, next_code, bits, prev = fresh(), eoi + 1, min_code_size + 1, None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << bits) and bits < 12:
                bits += 1
        prev = entry
    return out


def decode_gif_pixels(b: bytes):
    """REAL pixel decode for non-interlaced GIF87a/89a — pure-Python LZW
    (variable-width codes, clear/EOI, 4096-entry dictionary) + palette
    mapping. Returns (width, height, ndarray[h, w, 3] uint8 RGB) for the
    FIRST image block. Interlaced images raise ValueError."""
    import numpy as np

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = b[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:
            _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", b, pos + 1)
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = b[pos : pos + 3 * n]
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(data), min_code, w * h)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            pal_arr = np.frombuffer(pal, np.uint8).reshape(-1, 3)
            img = pal_arr[np.frombuffer(bytes(idx[: w * h]), np.uint8)]
            return w, h, img.reshape(h, w, 3)
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("no image block in GIF")


def attach_gif_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    mod: int = 16,
) -> DataFrame:
    """Materialize a REAL LZW-coded GIF per row: dims (1 + id % mod,
    1 + id*3 % mod) as the BMP/PNG fixtures, palette index at (x, y) =
    (id + x*7 + y*13) % 256, palette entry i -> (i, 3i % 256, 7i % 256).
    Decoded channel sums are therefore restatable from ``id`` arithmetic
    alone — through a genuine LZW bitstream."""
    import numpy as np

    from pyspark.sql.types import BinaryType

    palette = bytes(
        np.array(
            [[i, (i * 3) % 256, (i * 7) % 256] for i in range(256)], np.uint8
        )
    )

    @F.pandas_udf(BinaryType())
    def gif(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h = 1 + i % mod, 1 + (i * 3) % mod
            x = np.arange(w).reshape(1, w)
            y = np.arange(h).reshape(h, 1)
            idx = ((i + x * 7 + y * 13) % 256).astype(np.uint8)
            out.append(make_gif_indexed_payload(w, h, idx.tobytes(), palette))
        return pd.Series(out)

    return df.withColumn(payload_col, gif(F.col(id_col)))


def extract_dhash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder=None,
    grid: tuple = (9, 8),
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image — the standard
    near-duplicate fingerprint for photos (Krawetz; the 'resize to 9x8,
    compare neighbors' hash): decode the payload, nearest-neighbor
    sample onto a ``grid`` = (9, 8) grayscale raster, set bit (i, j)
    when gray(i+1, j) > gray(i, j), pack the 8x8 comparisons LSB-first
    into ONE int64. Brightness shifts and re-encodes barely move it;
    different photos land far apart in Hamming space.

    Every step is integer-exact so a SQL oracle can restate the hash
    from deterministic pixel formulas: sample src = ((2t + 1) * dim) //
    (2 * target), gray = (B + G + R) // 3. Arrow-batched mapInPandas —
    pixels never become Python row objects; output (id, dhash) feeds
    ``operators.dedup.hamming_pairs64`` for banded near-dup pairing."""
    import numpy as np

    if decoder is None:
        decoder = decode_bmp_pixels
    gx, gy = grid
    out_schema = f"{id_col} long, width long, height long, dhash long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, hashes = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = decoder(bytes(b))
                xs = ((2 * np.arange(gx) + 1) * w) // (2 * gx)
                ys = ((2 * np.arange(gy) + 1) * h) // (2 * gy)
                g = px[ys][:, xs].astype(np.int64).sum(axis=2) // 3
                bits = g[:, 1:] > g[:, :-1]  # (gy rows j, gx-1 cols i)
                val = 0
                for j in range(gy):
                    for i_ in range(gx - 1):
                        if bits[j, i_]:
                            val |= 1 << (j * (gx - 1) + i_)
                if val >= 1 << 63:
                    val -= 1 << 64  # two's-complement int64 wrap
                ids.append(int(i))
                ws.append(w)
                hs.append(h)
                hashes.append(val)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "width": pd.Series(ws, dtype="int64"),
                 "height": pd.Series(hs, dtype="int64"),
                 "dhash": pd.Series(hashes, dtype="int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def extract_audio_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_points: int = 65,
) -> DataFrame:
    """Difference fingerprint over decoded PCM samples — the waveform
    analogue of ``extract_dhash`` (Chromaprint-style local-shape bits,
    minus the spectral transform): nearest-neighbor sample ``n_points``
    = 65 amplitudes across the clip (src = ((2t + 1) * n) // (2 *
    n_points) — duration-invariant, so re-sampled/trimmed-pad twins
    still align), bit t = amp(t+1) > amp(t), packed LSB-first into one
    int64. DC/level shifts barely move it; different recordings land
    far apart. Arrow-batched mapInPandas, zero shuffles; output
    (id, sample_rate, n_samples, fingerprint) feeds
    ``operators.dedup.hamming_pairs64``."""
    import numpy as np

    out_schema = f"{id_col} long, sample_rate long, n_samples long, fingerprint long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, rates, ns, fps = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                rate, arr = decode_wav_samples(bytes(b))
                mono = arr[:, 0]
                n = mono.shape[0]
                src = ((2 * np.arange(n_points) + 1) * n) // (2 * n_points)
                amp = mono[src]
                val = 0
                for t in range(n_points - 1):
                    if amp[t + 1] > amp[t]:
                        val |= 1 << t
                if val >= 1 << 63:
                    val -= 1 << 64
                ids.append(int(i))
                rates.append(int(rate))
                ns.append(int(n))
                fps.append(val)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "sample_rate": pd.Series(rates, dtype="int64"),
                 "n_samples": pd.Series(ns, dtype="int64"),
                 "fingerprint": pd.Series(fps, dtype="int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


# --- JPEG baseline sequential (ITU-T T.81, public spec) ---------------------
#
# Closes the one "external-codec boundary" the earlier rounds documented:
# a real baseline-DCT encoder + decoder in stdlib+numpy. The encoder
# defaults to a flat (all-ones) quantization table, under which any image
# that is CONSTANT WITHIN EACH 8x8 BLOCK round-trips LOSSLESSLY (constant
# block => DC = 8*(c-128) exactly, AC = 0 exactly), which is what lets a
# SQL oracle restate decoded pixel sums from id arithmetic alone — the
# same fixture strategy as attach_bmp_payload. General images encode with
# a real float DCT and decode within ~1 gray level (tested).
#
# Reference parity: reference src/parse/binary.zig stops at JPEG SOF
# header metadata; this extends the repo's decode surface per SURVEY
# §2's multimodal extension rows.

# Annex K.3 typical Huffman tables (public ITU-T T.81 text)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_zigzag() -> list:
    """Scan-order -> raster-index table, COMPUTED by walking the 8x8
    anti-diagonals (T.81 figure 5) rather than transcribed — even-sum
    diagonals run up-right (row descending), odd-sum down-left."""
    order = []
    for s in range(15):
        diag = [(s - j, j) for j in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 1:
            diag.reverse()
        order += [r * 8 + c for r, c in diag]
    return order


_ZIGZAG = _jpeg_zigzag()


def _huff_encode_table(bits: list, vals: list) -> dict:
    """Canonical JPEG Huffman assignment: symbol -> (length, code)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits: list, vals: list) -> dict:
    """(length, code) -> symbol, same canonical assignment."""
    return {lc: sym for sym, lc in _huff_encode_table(bits, vals).items()}


def _dct_matrix():
    import numpy as np

    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


class _JpegBitWriter:
    """MSB-first bit packer with T.81 byte stuffing (0xFF -> 0xFF 0x00)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per T.81 F.1.2.3


def _prep_components(planes: list, width: int, height: int, samp: list):
    """Box-average each full-res plane down to its T.81 A.1.1
    dimensions and edge-pad to the MCU grid. Returns (component
    planes, mcx, mcy) — shared by the baseline and progressive
    encoders."""
    import numpy as np

    hmax = max(hv[0] for hv in samp)
    vmax = max(hv[1] for hv in samp)
    assert all(hmax % hv[0] == 0 and vmax % hv[1] == 0 for hv in samp)
    mcx, mcy = -(-width // (8 * hmax)), -(-height // (8 * vmax))
    comp = []
    for p, (hi, vi) in zip(planes, samp):
        p = np.asarray(p, np.float64)
        fx, fy = hmax // hi, vmax // vi
        cw, ch = -(-width * hi // hmax), -(-height * vi // vmax)
        pf = np.pad(p, ((0, ch * fy - height), (0, cw * fx - width)), mode="edge")
        c = pf.reshape(ch, fy, cw, fx).mean(axis=(1, 3))
        comp.append(
            np.pad(c, ((0, mcy * vi * 8 - ch), (0, mcx * hi * 8 - cw)), mode="edge")
        )
    return comp, mcx, mcy


def _encode_baseline(
    planes: list, width: int, height: int, quant, samp: list | None = None
) -> bytes:
    """Shared baseline-sequential encoder core: ``planes`` is 1 (gray)
    or 3 (YCbCr) float arrays, all FULL-RES height x width. ``samp`` is
    the per-component (h, v) sampling-factor list (default all (1,1) =
    4:4:4); a subsampled component is box-averaged down to its T.81
    A.1.1 dimensions before the DCT. One quant table and the Annex K
    luminance Huffman pair serve every component (legal — SOS table
    selectors just all point at slot 0). Each MCU interleaves h*v
    blocks per component in raster order (T.81 A.2.3) with
    per-component DC predictors."""
    import numpy as np

    q = np.ones(64, np.int64) if quant is None else np.asarray(quant, np.int64)
    assert q.shape == (64,) and (q > 0).all() and (q < 256).all()
    nc = len(planes)
    assert nc in (1, 3)
    samp = samp or [(1, 1)] * nc
    assert len(samp) == nc
    comp, mcx, mcy = _prep_components(planes, width, height, samp)
    C = _dct_matrix()
    dc_t = _huff_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_t = _huff_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    qm = q.reshape(8, 8)

    bw = _JpegBitWriter()
    prev_dc = [0] * nc

    def emit(ci: int, by: int, bx: int) -> None:
        blk = comp[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        coef = np.rint((C @ blk @ C.T) / qm).astype(np.int64)
        zz = coef.reshape(-1)[_ZIGZAG]
        diff = int(zz[0]) - prev_dc[ci]
        prev_dc[ci] = int(zz[0])
        s = int(abs(diff)).bit_length()
        ln, code = dc_t[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_t[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s = abs(v).bit_length()
            ln, code = ac_t[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            ln, code = ac_t[0x00]  # EOB
            bw.write(code, ln)

    if nc == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the MCU
        # is one data unit and blocks go in pure raster order regardless
        # of the declared sampling factors (identical to the MCU walk
        # when samp=(1,1), the only gray layout the public helpers emit)
        for by in range(-(-height // 8)):
            for bx in range(-(-width // 8)):
                emit(0, by, bx)
    else:
        for my in range(mcy):
            for mx in range(mcx):
                for ci in range(nc):
                    hi, vi = samp[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            emit(ci, my * vi + v, mx * hi + hh)
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)  # APP0: 1x1 density, no thumb
    zz_q = q.reshape(-1)[_ZIGZAG]  # DQT stores zigzag order
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(int(v) for v in zz_q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, height, width, nc)
    for ci in range(nc):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0x00])
    out += (
        b"\xff\xc4"
        + struct.pack(">HB", 19 + len(_JPEG_DC_VALS), 0x00)
        + bytes(_JPEG_DC_BITS)
        + bytes(_JPEG_DC_VALS)
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">HB", 19 + len(_JPEG_AC_VALS), 0x10)
        + bytes(_JPEG_AC_BITS)
        + bytes(_JPEG_AC_VALS)
    )
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00])
    out += b"\x00\x3f\x00"
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def make_jpeg_gray_payload(
    width: int, height: int, gray_rows: bytes, quant: list | None = None
) -> bytes:
    """A REAL baseline-sequential grayscale JFIF: SOI/APP0/DQT/SOF0/
    DHT(DC+AC, Annex K typical tables)/SOS + Huffman-coded DCT MCUs.
    ``gray_rows`` is width*height bytes top-down; edges pad by pixel
    replication to 8-multiples (standard practice, decoder crops).

    Default ``quant`` is all ones: real forward float DCT + rint
    quantization, EXACTLY lossless for images constant within each 8x8
    block (constant c => DC = 8*(c-128), every AC rounds to 0) — the
    property the oracle-checked fixtures rely on."""
    import numpy as np

    img = np.frombuffer(gray_rows, np.uint8, width * height).reshape(
        height, width
    )
    return _encode_baseline([img], width, height, quant)


def make_jpeg_color_payload(
    width: int,
    height: int,
    bgr_rows: bytes,
    quant: list | None = None,
    subsampling: str = "444",
) -> bytes:
    """A REAL baseline-sequential COLOR JFIF: BGR input (the
    decode_bmp_pixels channel order) converted to JFIF YCbCr (BT.601
    full range), three interleaved components sharing the flat quant
    table. ``subsampling`` is ``"444"`` (one block per component per
    MCU) or ``"420"`` (Y at 2x2, chroma box-averaged to quarter size —
    the layout virtually every camera/web JPEG uses; 16x16-pixel MCUs
    with 4 Y + 1 Cb + 1 Cr blocks). Round trip through
    ``decode_jpeg_pixels`` is near-lossless for 4:4:4 block-constant
    input and for 4:2:0 input constant per 16x16 macroblock (chroma
    box-average of a constant is the constant)."""
    import numpy as np

    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    px = (
        np.frombuffer(bgr_rows, np.uint8, width * height * 3)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    b, g, r = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    samp = [(2, 2), (1, 1), (1, 1)] if subsampling == "420" else None
    return _encode_baseline([y, cb, cr], width, height, quant, samp)


# custom Huffman table for progressive AC REFINEMENT scans: the Annex K
# AC table lacks the EOBn symbols (0x10..0xE0) multi-block EOB runs
# need, so refinement scans carry their own 32-symbol table (EOB0..14,
# ZRL, (r,1) for r=0..15), all at code length 6 (Kraft sum 0.5 — valid)
_JPEG_ACR_VALS = (
    [r << 4 for r in range(15)] + [0xF0] + [(r << 4) | 1 for r in range(16)]
)
_JPEG_ACR_BITS = [0, 0, 0, 0, 0, 32, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]


def _encode_progressive(
    planes: list, width: int, height: int, quant, samp: list | None = None
) -> bytes:
    """Progressive (SOF2) encoder core — same quantized coefficients as
    ``_encode_baseline`` (identical DCT/quant math), transmitted across
    a T.81 Annex G scan script that exercises every progressive decode
    path: DC first (Al=1, interleaved) -> DC refinement (raw bits) ->
    per-component AC first scans with SPECTRAL SELECTION (component 0's
    band split 1-5 / 6-63) at Al=1 -> per-component AC refinement scans
    (Ah=1, Al=0) with real multi-block EOB runs and buffered correction
    bits. Because the coefficients are transmitted losslessly, decoding
    a progressive encoding must produce pixels BIT-IDENTICAL to
    decoding the baseline encoding of the same input."""
    import numpy as np

    q = np.ones(64, np.int64) if quant is None else np.asarray(quant, np.int64)
    assert q.shape == (64,) and (q > 0).all() and (q < 256).all()
    nc = len(planes)
    assert nc in (1, 3)
    samp = samp or [(1, 1)] * nc
    assert len(samp) == nc
    hmax = max(hv[0] for hv in samp)
    vmax = max(hv[1] for hv in samp)
    comp, mcx, mcy = _prep_components(planes, width, height, samp)
    C = _dct_matrix()
    qm = q.reshape(8, 8)

    # quantize every block up front (zigzag order, int)
    zzs = []
    for ci in range(nc):
        bh, bw_ = comp[ci].shape[0] // 8, comp[ci].shape[1] // 8
        arr = np.zeros((bh, bw_, 64), np.int64)
        for by in range(bh):
            for bx in range(bw_):
                blk = comp[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = np.rint((C @ blk @ C.T) / qm).astype(np.int64)
                arr[by, bx] = coef.reshape(-1)[_ZIGZAG]
        zzs.append(arr)

    dc_t = _huff_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_t = _huff_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    acr_t = _huff_encode_table(_JPEG_ACR_BITS, _JPEG_ACR_VALS)

    def mcu_blocks():
        """(ci, by, bx) in interleaved MCU order (DC scans)."""
        for my in range(mcy):
            for mx in range(mcx):
                for ci in range(nc):
                    hi, vi = samp[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            yield ci, my * vi + v, mx * hi + hh

    def comp_blocks(ci):
        """(by, bx) raster over the component's OWN block grid (AC
        scans are non-interleaved; MCU-pad blocks carry DC only)."""
        hi, vi = samp[ci]
        cw, ch = -(-width * hi // hmax), -(-height * vi // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield by, bx

    def sos_header(comps_tabs, ss, se, ah, al):
        ns = len(comps_tabs)
        seg = bytearray(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns))
        for cid, dc_sel, ac_sel in comps_tabs:
            seg += bytes([cid, (dc_sel << 4) | ac_sel])
        seg += bytes([ss, se, (ah << 4) | al])
        return bytes(seg)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)
    zz_q = q.reshape(-1)[_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(int(v) for v in zz_q)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, height, width, nc)
    for ci in range(nc):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0x00])
    for cls_id, bits, vals in (
        (0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
        (0x10, _JPEG_AC_BITS, _JPEG_AC_VALS),
        (0x11, _JPEG_ACR_BITS, _JPEG_ACR_VALS),
    ):
        out += (
            b"\xff\xc4"
            + struct.pack(">HB", 19 + len(vals), cls_id)
            + bytes(bits)
            + bytes(vals)
        )

    # ---- scan 1: DC first, interleaved, Al=1 -----------------------------
    bw = _JpegBitWriter()
    pred = [0] * nc
    for ci, by, bx in mcu_blocks():
        v = int(zzs[ci][by, bx, 0]) >> 1  # arithmetic shift per G.1.2.1
        diff = v - pred[ci]
        pred[ci] = v
        s = abs(diff).bit_length()
        ln, code = dc_t[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += sos_header([(ci + 1, 0, 0) for ci in range(nc)], 0, 0, 0, 1) + bw.buf

    # ---- scan 2: DC refinement, raw bits, Ah=1 Al=0 -----------------------
    bw = _JpegBitWriter()
    for ci, by, bx in mcu_blocks():
        bw.write(int(zzs[ci][by, bx, 0]) & 1, 1)
    bw.flush()
    out += sos_header([(ci + 1, 0, 0) for ci in range(nc)], 0, 0, 1, 0) + bw.buf

    # ---- AC first scans, Al=1, spectral selection on component 0 ----------
    bands = []
    for ci in range(nc):
        bands += [(ci, 1, 5), (ci, 6, 63)] if ci == 0 else [(ci, 1, 63)]
    for ci, ss, se in bands:
        bw = _JpegBitWriter()
        for by, bx in comp_blocks(ci):
            zz = zzs[ci][by, bx]
            run = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                av = abs(v) >> 1  # magnitude shift (trunc toward zero)
                if av == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_t[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = av.bit_length()
                ln, code = ac_t[(run << 4) | s]
                bw.write(code, ln)
                sv = av if v > 0 else -av
                bw.write(sv if sv > 0 else sv + (1 << s) - 1, s)
                run = 0
            if run:  # EOB0 per block — Annex K table has no EOBn>0
                ln, code = ac_t[0x00]
                bw.write(code, ln)
        bw.flush()
        out += sos_header([(ci + 1, 0, 0)], ss, se, 0, 1) + bw.buf

    # ---- AC refinement scans, Ah=1 Al=0, custom table, real EOB runs ------
    for ci in range(nc):
        bw = _JpegBitWriter()
        eobrun = 0
        # TWO correction-bit buffers (the distinction the decoder's read
        # order forces): run_bits belong to blocks already swallowed by
        # the pending EOB run (the decoder re-reads them right after the
        # EOBn symbol, block by block); pending are the CURRENT block's
        # bits since its last symbol (the decoder re-reads them while
        # advancing under this block's next symbol)
        run_bits: list = []
        pending: list = []

        def emit(sym, extra=None, bits=None):
            ln, code = acr_t[sym]
            bw.write(code, ln)
            if extra is not None:
                bw.write(*extra)
            if bits:
                for bit in bits:
                    bw.write(bit, 1)
                bits.clear()

        def flush_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                r = eobrun.bit_length() - 1
                emit(r << 4, (eobrun - (1 << r), r) if r else None, run_bits)
                eobrun = 0

        for by, bx in comp_blocks(ci):
            zz = zzs[ci][by, bx]
            absv = [abs(int(zz[k])) for k in range(64)]
            eob = 0  # last newly-nonzero position (T.81 G.1.2.3)
            for k in range(1, 64):
                if absv[k] == 1:
                    eob = k
            r = 0
            for k in range(1, 64):
                t = absv[k]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    flush_eobrun()
                    emit(0xF0, None, pending)
                    r -= 16
                if t > 1:
                    pending.append(t & 1)
                    continue
                # t == 1: newly nonzero
                flush_eobrun()
                emit((r << 4) | 1, (1 if int(zz[k]) > 0 else 0, 1), pending)
                r = 0
            if r > 0 or pending:
                # band tail never closed by a symbol — the block joins
                # the EOB run and its tail bits move to the run buffer
                run_bits.extend(pending)
                pending.clear()
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun()
        flush_eobrun()
        bw.flush()
        out += sos_header([(ci + 1, 0, 1)], 1, 63, 1, 0) + bw.buf

    out += b"\xff\xd9"
    return bytes(out)


def make_jpeg_progressive_payload(
    width: int,
    height: int,
    bgr_rows: bytes,
    quant: list | None = None,
    subsampling: str = "444",
) -> bytes:
    """A REAL progressive (SOF2) COLOR JFIF — same input contract and
    quantization as ``make_jpeg_color_payload``, but transmitted as an
    Annex G scan script (DC first/refine, spectral-selection AC bands,
    AC refinement with EOB runs). Decoding it must match decoding the
    baseline encoding of the same input BIT-EXACTLY (the coefficients
    are identical; only their transmission order differs)."""
    import numpy as np

    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    px = (
        np.frombuffer(bgr_rows, np.uint8, width * height * 3)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    b, g, r = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    samp = [(2, 2), (1, 1), (1, 1)] if subsampling == "420" else None
    return _encode_progressive([y, cb, cr], width, height, quant, samp)


def make_jpeg_progressive_gray_payload(
    width: int, height: int, gray_rows: bytes, quant: list | None = None
) -> bytes:
    """Progressive grayscale twin of ``make_jpeg_gray_payload``."""
    import numpy as np

    img = np.frombuffer(gray_rows, np.uint8, width * height).reshape(
        height, width
    )
    return _encode_progressive([img], width, height, quant)


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF 0x00,
    surfaces RSTn markers to the MCU loop via ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.d):
                raise ValueError("truncated JPEG entropy data")
            b = self.d[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.d):
                    raise ValueError("truncated JPEG entropy data")
                nxt = self.d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    raise ValueError("unexpected RST marker inside block")
                else:
                    raise ValueError(f"marker 0x{nxt:02x} inside entropy data")
            else:
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (DRI intervals)."""
        self.n = 0
        if self.pos + 1 >= len(self.d):
            raise ValueError("truncated JPEG entropy data")
        if self.d[self.pos] != 0xFF or not (0xD0 <= self.d[self.pos + 1] <= 0xD7):
            raise ValueError("expected RST marker")
        self.pos += 2


def _huff_decode(br: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _decode_scan(br, comps, scan, htabs, coefs, w, h, hmax, vmax,
                 mcx, mcy, restart_interval, ss, se, ah, al, progressive):
    """Decode ONE entropy-coded scan into the per-component zigzag
    coefficient arrays (T.81 E/F baseline, G progressive). Handles the
    four progressive scan kinds (DC/AC x first/refinement) plus the
    baseline full-band scan (ss=0, se=63, ah=al=0 — DC-first + AC-first
    over the whole band, eobrun degenerate). Returns the bit reader
    (caller resyncs ``pos`` from it)."""
    import numpy as np

    sampmap = {cid: (hi, vi) for cid, _, hi, vi in comps}
    dctab = {cid: htabs.get((0, dc)) for cid, dc, _ in scan}
    actab = {cid: htabs.get((1, ac)) for cid, _, ac in scan}
    # validate table presence BEFORE entropy decoding starts: a corrupt
    # file whose SOS references an undefined table must raise the same
    # clear ValueError as every other malformed-input path, not an
    # AttributeError from deep inside _huff_decode. Which class a scan
    # needs depends on its kind — DC-first/baseline (ss==0, ah==0)
    # consumes DC tables, any scan covering AC bands (se>0) consumes AC
    # tables, DC refinement (ss==0, ah>0) reads raw bits only.
    for cid, dc, ac in scan:
        if ss == 0 and ah == 0 and dctab[cid] is None:
            raise ValueError(f"missing Huffman table (DC, {dc})")
        if se > 0 and actab[cid] is None:
            raise ValueError(f"missing Huffman table (AC, {ac})")
    pred = {cid: 0 for cid, _, _ in scan}
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)

    def refine_nonzero(zz, k):
        # correction bit for a coefficient already nonzero in history
        if br.bit() and (int(zz[k]) & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1

    def block_baseline(cid, zz):
        s = _huff_decode(br, dctab[cid])
        diff = _extend(br.bits(s), s) if s else 0
        pred[cid] += diff
        zz[0] = pred[cid]
        k = 1
        while k < 64:
            rs = _huff_decode(br, actab[cid])
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _extend(br.bits(s), s)
            k += 1

    def block_dc_first(cid, zz):
        s = _huff_decode(br, dctab[cid])
        diff = _extend(br.bits(s), s) if s else 0
        pred[cid] += diff
        zz[0] = pred[cid] << al

    def block_dc_refine(cid, zz):
        if br.bit():
            zz[0] = int(zz[0]) | p1

    def block_ac_first(cid, zz):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(br, actab[cid])
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = 1 << r  # EOBn: run of (1<<r)+bits(r) blocks
                if r:
                    eobrun += br.bits(r)
                eobrun -= 1  # current block is part of the run
                break
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            zz[k] = _extend(br.bits(s), s) << al
            k += 1

    def block_ac_refine(cid, zz):
        # T.81 G.1.2.3 successive-approximation AC refinement: newly
        # nonzero coefficients arrive as ±2^al, history coefficients
        # take one correction bit each as the scan passes them, and an
        # EOBn covers whole blocks whose remaining band is corrections
        # only. Standard algorithm (same control flow libjpeg uses).
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _huff_decode(br, actab[cid])
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.bits(r)
                        break
                    # ZRL: skip 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("bad AC refinement magnitude")
                    newval = p1 if br.bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        refine_nonzero(zz, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if k > se:
                    break
                if newval:
                    zz[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0:
                    refine_nonzero(zz, k)
                k += 1
            eobrun -= 1

    if not progressive:
        block = block_baseline
    elif ss == 0:
        block = block_dc_refine if ah else block_dc_first
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
    else:
        block = block_ac_refine if ah else block_ac_first
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")

    def do_restart():
        nonlocal pred, eobrun
        br.restart()
        pred = {cid: 0 for cid, _, _ in scan}
        eobrun = 0

    if len(scan) == 1:
        # T.81 A.2: single-component scan = NON-interleaved; blocks in
        # raster order over the COMPONENT's own block grid (ceil of its
        # A.1.1 dimensions), MCU = one data unit
        cid0 = scan[0][0]
        hi, vi = sampmap[cid0]
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        bw_cols, bh_rows = -(-cw // 8), -(-ch // 8)
        arr = coefs[cid0]
        for m in range(bw_cols * bh_rows):
            if restart_interval and m and m % restart_interval == 0:
                do_restart()
            by, bx = divmod(m, bw_cols)
            block(cid0, arr[by, bx])
    else:
        for m in range(mcx * mcy):
            if restart_interval and m and m % restart_interval == 0:
                do_restart()
            my, mx = divmod(m, mcx)
            # T.81: MCU interleave follows the SOS component list; within
            # a component the h*v blocks go in raster order (A.2.3)
            for cid, _dc, _ac in scan:
                hi, vi = sampmap[cid]
                arr = coefs[cid]
                for v in range(vi):
                    for hh in range(hi):
                        block(cid, arr[my * vi + v, mx * hi + hh])
    return br


def decode_jpeg_pixels(b: bytes):
    """JPEG decoder, stdlib+numpy: baseline sequential (SOF0/SOF1) AND
    progressive (SOF2, r10) — DQT/DHT/SOS/DRI parsing, canonical
    Huffman decode, multi-scan coefficient accumulation (spectral
    selection + successive approximation per T.81 Annex G: DC/AC first
    and refinement scans, EOB runs, per-scan restart intervals), then
    one dequantize + de-zigzag + float IDCT + level shift + clamp pass.
    Grayscale and 3-component frames at any sampling-factor layout
    where each component's factors divide the maxima — 4:4:4, 4:2:0
    (the layout virtually every camera/web JPEG uses), 4:2:2, 4:1:1;
    subsampled chroma upsamples by pixel replication (box/nearest,
    spec-legal).

    Returns (width, height, ndarray[h, w, 3] uint8 BGR, matching
    decode_bmp_pixels) — grayscale replicates into all three channels;
    color converts JFIF YCbCr -> RGB (x1.402/0.344136/0.714136/1.772,
    rint, clamp)."""
    import numpy as np

    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (no SOI)")
    pos = 2
    qtabs: dict = {}
    htabs: dict = {}
    frame = None
    progressive = False
    restart_interval = 0
    coefs: dict = {}
    geo = None  # (hmax, vmax, mcx, mcy)
    any_scan = False
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker expected")
        while b[pos + 1] == 0xFF:  # T.81 B.1.1.2: fill bytes before a marker
            pos += 1
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack_from(">H", b, pos)[0]
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                o += 1
                if pq:
                    vals = np.frombuffer(seg, ">u2", 64, o).astype(np.int64)
                    o += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, 64, o).astype(np.int64)
                    o += 64
                t = np.zeros(64, np.int64)
                t[_ZIGZAG] = vals  # file stores zigzag order
                qtabs[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                o += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            progressive = marker == 0xC2
            comps = []
            for ci in range(nc):
                cid, sampb, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = sampb >> 4, sampb & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("invalid sampling factors in SOF")
                comps.append((cid, tq, hi, vi))
            frame = (w, h, comps)
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            if any(hmax % c[2] or vmax % c[3] for c in comps):
                raise ValueError("unsupported sampling-factor combination")
            mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            geo = (hmax, vmax, mcx, mcy)
            coefs = {
                cid: np.zeros((mcy * vi, mcx * hi, 64), np.int64)
                for cid, _, hi, vi in comps
            }
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                    for i in range(ns)]
            ss_, se_ = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah_, al_ = ahal >> 4, ahal & 0xF
            if not progressive:
                ss_, se_, ah_, al_ = 0, 63, 0, 0
            w_, h_, comps_ = frame
            hmax, vmax, mcx, mcy = geo
            br = _decode_scan(
                _JpegBitReader(b, pos + seglen), comps_, scan, htabs, coefs,
                w_, h_, hmax, vmax, mcx, mcy, restart_interval,
                ss_, se_, ah_, al_, progressive,
            )
            any_scan = True
            # resync to the next marker after the entropy-coded data
            # (br.pos already points past any partially-consumed byte —
            # the pad bits to the byte boundary belong to this scan)
            pos = br.pos
            while pos + 1 < len(b) and not (
                b[pos] == 0xFF and b[pos + 1] != 0x00
                and not (0xD0 <= b[pos + 1] <= 0xD7)
            ):
                pos += 1
            continue
        pos += seglen
    if frame is None or not any_scan:
        raise ValueError("missing SOF/SOS")

    w, h, comps = frame
    hmax, vmax, mcx, mcy = geo
    quant = {cid: qtabs[tq] for cid, tq, _, _ in comps}
    C = _dct_matrix()
    crop = []
    for cid, _, hi, vi in comps:
        arr = coefs[cid]
        bh_rows, bw_cols = arr.shape[0], arr.shape[1]
        plane = np.zeros((bh_rows * 8, bw_cols * 8), np.float64)
        qflat = quant[cid].reshape(-1)[_ZIGZAG]
        for by in range(bh_rows):
            for bx in range(bw_cols):
                coef = np.zeros(64, np.float64)
                coef[_ZIGZAG] = arr[by, bx] * qflat
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    C.T @ coef.reshape(8, 8) @ C + 128.0
                )
        fy, fx = vmax // vi, hmax // hi
        if fy > 1:
            plane = plane.repeat(fy, axis=0)
        if fx > 1:
            plane = plane.repeat(fx, axis=1)
        crop.append(np.clip(np.rint(plane[:h, :w]), 0, 255))
    out = np.empty((h, w, 3), np.uint8)
    if len(crop) == 1:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = crop[0]
    else:
        y, cb, cr = crop
        r = np.clip(np.rint(y + 1.402 * (cr - 128)), 0, 255)
        g = np.clip(np.rint(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255)
        bl = np.clip(np.rint(y + 1.772 * (cb - 128)), 0, 255)
        out[:, :, 0], out[:, :, 1], out[:, :, 2] = bl, g, r
    return w, h, out


def attach_jpeg_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    src_col: str | None = None,
    bias: int = 0,
) -> DataFrame:
    """Materialize a REAL baseline JPEG per row whose pixels are CONSTANT
    within each 8x8 block — gray of block (bx, by) = (id + bx*7 + by*13
    + bias) mod 256, dims (8*(1 + id%8), 8*(1 + id*3%8)) — so the flat
    quant table makes the full DCT round trip LOSSLESS and the SQL
    oracle restates every decoded pixel from id arithmetic (the JPEG
    analogue of attach_bmp_payload's contract)."""
    import numpy as np

    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def jpg(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            wb, hb = 1 + i % 8, 1 + (i * 3) % 8
            bx = np.arange(wb).reshape(1, wb)
            by = np.arange(hb).reshape(hb, 1)
            g = ((i + bx * 7 + by * 13 + bias) % 256).astype(np.uint8)
            px = np.repeat(np.repeat(g, 8, axis=0), 8, axis=1)
            out.append(make_jpeg_gray_payload(wb * 8, hb * 8, px.tobytes()))
        return pd.Series(out)

    return df.withColumn(payload_col, jpg(F.col(src_col or id_col)))


def _jpeg_macroblock_fixture(i: int):
    """(width, height, bgr_bytes) of the macroblock-constant gray-valued
    fixture BOTH JPEG-subsampling gates encode — 4:2:0 baseline
    (attach_jpeg420_payload) and progressive (attach_jpeg_progressive_
    payload) share it, and their oracles share one SQL restatement, so
    the pixel formula must live in exactly one place: macroblock
    (bx, by) = (i + bx*7 + by*13) % 256, dims 16*(1+i%4) x 16*(1+i*3%4)."""
    import numpy as np

    wb, hb = 1 + i % 4, 1 + (i * 3) % 4
    bx = np.arange(wb).reshape(1, wb)
    by = np.arange(hb).reshape(hb, 1)
    g = ((i + bx * 7 + by * 13) % 256).astype(np.uint8)
    px = np.repeat(np.repeat(g, 16, axis=0), 16, axis=1)
    bgr = np.stack([px, px, px], axis=-1)
    return wb * 16, hb * 16, bgr.tobytes()


def attach_jpeg420_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    src_col: str | None = None,
) -> DataFrame:
    """Materialize a REAL 4:2:0-subsampled color JPEG per row (the
    layout virtually every camera/web JPEG uses: 16x16 MCUs of 4 Y +
    1 Cb + 1 Cr blocks). Pixels are gray-valued (b=g=r) and CONSTANT
    within each 16x16 MACROBLOCK — value of macroblock (bx, by) =
    (id + bx*7 + by*13) mod 256, dims (16*(1 + id%4), 16*(1 + id*3%4)).
    Chroma box-averaging of a constant is the constant and gray-valued
    input keeps Cb=Cr=128 with integer Y, so the flat-quant round trip
    is EXACTLY lossless and the SQL oracle restates every decoded pixel
    from id arithmetic — the subsampled analogue of
    attach_jpeg_payload's contract."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def jpg(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            w, h, bgr = _jpeg_macroblock_fixture(int(i))
            out.append(make_jpeg_color_payload(w, h, bgr, subsampling="420"))
        return pd.Series(out)

    return df.withColumn(payload_col, jpg(F.col(src_col or id_col)))


def attach_jpeg_progressive_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    src_col: str | None = None,
) -> DataFrame:
    """Materialize a REAL progressive (SOF2) 4:2:0 color JPEG per row —
    the exact macroblock-constant fixture of ``attach_jpeg420_payload``
    transmitted through the Annex G scan script (DC first/refine,
    spectral-selection AC bands, AC refinement with EOB runs). The
    quantized coefficients are identical to the baseline encoding, so
    the decoded pixels — and therefore the SQL oracle arithmetic — are
    exactly those of the 4:2:0 gate; only the wire format differs."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def jpg(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            w, h, bgr = _jpeg_macroblock_fixture(int(i))
            out.append(make_jpeg_progressive_payload(w, h, bgr, subsampling="420"))
        return pd.Series(out)

    return df.withColumn(payload_col, jpg(F.col(src_col or id_col)))


# --- MJPEG-in-AVI video container (RIFF — the WAV parser's sibling) ---------
#
# Reference parity note: the reference engine (bun-csv) has no video
# support at all; this is part of the LLM-data-pipeline extension surface.
# The container work is REAL (RIFF chunk walk, avih/strh/strf headers,
# movi 00dc frames, idx1 index) and each frame is a full baseline JPEG
# through the from-scratch codec above — no stub left in the video path.


def make_avi_mjpeg_payload(
    frames: "list[tuple[int, int, bytes]]", us_per_frame: int = 40000
) -> bytes:
    """A real MJPEG-in-AVI file: RIFF('AVI ') with LIST hdrl (avih +
    LIST strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)), LIST movi
    holding one '00dc' chunk per frame (a complete baseline 4:2:0 JPEG
    from ``make_jpeg_color_payload``), and a standard idx1 index. All
    frames must share one (width, height) — the AVI stream format pins
    frame dims in strf. Odd-sized chunks get the RIFF pad byte."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    w0, h0 = frames[0][0], frames[0][1]
    if any((w, h) != (w0, h0) for w, h, _ in frames):
        raise ValueError("all AVI frames must share one (width, height)")
    jpegs = [
        make_jpeg_color_payload(w, h, bgr, subsampling="420")
        for w, h, bgr in frames
    ]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    n = len(jpegs)
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        us_per_frame,                 # dwMicroSecPerFrame
        max_bytes * 1_000_000 // us_per_frame,  # dwMaxBytesPerSec
        0,                            # dwPaddingGranularity
        0x10,                         # dwFlags: AVIF_HASINDEX
        n, 0, 1,                      # totalFrames, initialFrames, streams
        max_bytes,                    # dwSuggestedBufferSize
        w0, h0, 0, 0, 0, 0,           # width, height, reserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, us_per_frame, 1_000_000, 0, n,
                      max_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, w0, h0)
    )
    strf = struct.pack(
        "<I2i2H4sI2i2I", 40, w0, h0, 1, 24, b"MJPG", w0 * h0 * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks, idx, off = [], [], 4  # offsets relative to 'movi' fourcc
    for j in jpegs:
        movi_chunks.append(chunk(b"00dc", j))
        idx.append(struct.pack("<4s3I", b"00dc", 0x10, off, len(j)))
        off += len(movi_chunks[-1])
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(b: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) walking a RIFF chunk run,
    honoring declared sizes and even padding; truncated declarations
    raise (fail fast, like every malformed-input path here)."""
    p = start
    while p + 8 <= end:
        fourcc = b[p:p + 4]
        (size,) = struct.unpack_from("<I", b, p + 4)
        if p + 8 + size > end:
            raise ValueError("truncated RIFF chunk")
        yield fourcc, p + 8, size
        p += 8 + size + (size % 2)


def parse_avi_meta(b: bytes) -> "tuple[int, int, int, int] | None":
    """(width, height, us_per_frame, n_frames) from a RIFF/AVI header
    via a real chunk walk (LIST hdrl -> avih), or None when the payload
    is not an AVI. Malformed AVI (bad sizes, missing avih) raises."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    (riff_size,) = struct.unpack_from("<I", b, 4)
    end = min(len(b), 8 + riff_size)
    for fourcc, off, size in _riff_chunks(b, 12, end):
        if fourcc == b"LIST" and b[off:off + 4] == b"hdrl":
            for c4, o2, s2 in _riff_chunks(b, off + 4, off + size):
                if c4 == b"avih":
                    if s2 < 40:
                        raise ValueError("truncated avih header")
                    v = struct.unpack_from("<10I", b, o2)
                    return v[8], v[9], v[0], v[4]
            raise ValueError("AVI hdrl without avih")
    raise ValueError("AVI without hdrl list")


def _avi_frame_spans(b: bytes):
    """Index an AVI's MJPEG frames WITHOUT decoding any: walk LIST movi
    and collect the (offset, size) span of every STREAM-00 video chunk
    ('00dc'/'00db' — the single 'vids' stream the header parser
    returns; a second stream's '01dc' chunks are someone else's frames,
    not ours to interleave). Returns (width, height, us_per_frame,
    [(off, size), ...]) with the frame count validated against the avih
    header — the fail-fast contract holds before any pixel work, and a
    caller that samples k frames pays k decodes, not n."""
    meta = parse_avi_meta(b)
    if meta is None:
        raise ValueError("not a RIFF/AVI payload")
    w, h, uspf, n_frames = meta
    (riff_size,) = struct.unpack_from("<I", b, 4)
    end = min(len(b), 8 + riff_size)
    spans = []
    for fourcc, off, size in _riff_chunks(b, 12, end):
        if fourcc == b"LIST" and b[off:off + 4] == b"movi":
            for c4, o2, s2 in _riff_chunks(b, off + 4, off + size):
                if c4 in (b"00dc", b"00db"):
                    spans.append((o2, s2))
    if len(spans) != n_frames:
        raise ValueError(
            f"avih declares {n_frames} frames, movi carries {len(spans)}"
        )
    return w, h, uspf, spans


def _avi_decode_span(b: bytes, span, w: int, h: int):
    """Decode one indexed frame chunk and enforce the stream dims."""
    off, size = span
    fw, fh, px = decode_jpeg_pixels(b[off:off + size])
    if (fw, fh) != (w, h):
        raise ValueError(f"frame dims {(fw, fh)} != stream dims {(w, h)}")
    return px


def decode_avi_frames(b: bytes):
    """Decode every MJPEG frame of an AVI: index the stream-00 movi
    chunks (``_avi_frame_spans``), decode each through
    ``decode_jpeg_pixels``. Returns (width, height, us_per_frame,
    [HxWx3 uint8 BGR arrays]). Raises ValueError on a non-AVI payload,
    a frame-count mismatch vs the avih header, or any malformed chunk —
    never silently-wrong frames."""
    w, h, uspf, spans = _avi_frame_spans(b)
    return w, h, uspf, [_avi_decode_span(b, s, w, h) for s in spans]


def _avi_macroblock_fixture(i: int, n_frames: int):
    """Frame list for doc ``i``: the JPEG gates' macroblock-constant
    fixture extended with a per-frame term — frame f's macroblock
    (bx, by) = (i + f*29 + bx*7 + by*13) % 256, dims pinned per doc at
    16*(1+i%4) x 16*(1+i*3%4) (AVI streams have constant frame dims).
    Same lossless-round-trip argument as _jpeg_macroblock_fixture, so a
    SQL oracle restates every decoded pixel of every frame."""
    import numpy as np

    wb, hb = 1 + i % 4, 1 + (i * 3) % 4
    bx = np.arange(wb).reshape(1, wb)
    by = np.arange(hb).reshape(hb, 1)
    out = []
    for f in range(n_frames):
        g = ((i + f * 29 + bx * 7 + by * 13) % 256).astype(np.uint8)
        px = np.repeat(np.repeat(g, 16, axis=0), 16, axis=1)
        out.append((wb * 16, hb * 16, np.stack([px, px, px], -1).tobytes()))
    return out


def attach_avi_mjpeg_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    src_col: str | None = None,
    us_per_frame: int = 40000,
) -> DataFrame:
    """Materialize a REAL MJPEG-in-AVI video per row: 2 + id%3 frames
    of the per-frame macroblock fixture at 25 fps (40 ms/frame), each
    frame a complete baseline 4:2:0 JPEG. Deterministic from the id, so
    the oracle restates every sampled frame's pixel sums."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def avi(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            frames = _avi_macroblock_fixture(int(i), 2 + int(i) % 3)
            out.append(make_avi_mjpeg_payload(frames, us_per_frame))
        return pd.Series(out)

    return df.withColumn(payload_col, avi(F.col(src_col or id_col)))


def sample_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_ms: int = 500,
    max_frames: int = 8,
) -> DataFrame:
    """REAL video frame sampling: walk each AVI payload's movi chunks,
    decode the MJPEG frame nearest each sampling instant (ts = k *
    every_ms for ts < duration, capped at ``max_frames``; frame_idx =
    ts*1000 // us_per_frame), and emit exact integer channel sums per
    sampled frame — the video analogue of ``extract_pixel_stats``,
    hash-checkable against id arithmetic for the fixture payloads.

    Scale shape: one-in-many-out Arrow-batched mapInPandas, zero
    shuffles — each video is decoded where its bytes live, only the
    (id, frame) stat rows leave the executor; at 100 TB of video the
    decode parallelizes with the scan, and because the movi chunks are
    INDEXED first (``_avi_frame_spans`` — a header walk, no pixel
    work), only the <= ``max_frames`` frames under sampling instants
    are ever decoded, so per-row decode cost is bounded by the stride,
    not the clip length."""
    out_schema = (
        f"{id_col} long, frame_idx long, frame_ts_ms long, width long, "
        "height long, sum_b long, sum_g long, sum_r long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = {k: [] for k in (id_col, "frame_idx", "frame_ts_ms",
                                    "width", "height", "sum_b", "sum_g",
                                    "sum_r")}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                w, h, uspf, spans = _avi_frame_spans(raw)
                duration_ms = len(spans) * uspf // 1000
                k = 0
                while k < max_frames and k * every_ms < duration_ms:
                    ts = k * every_ms
                    fi = ts * 1000 // uspf
                    px = _avi_decode_span(raw, spans[fi], w, h)
                    sums = px.reshape(-1, 3).sum(0, dtype="int64")
                    cols[id_col].append(int(rid))
                    cols["frame_idx"].append(fi)
                    cols["frame_ts_ms"].append(ts)
                    cols["width"].append(w)
                    cols["height"].append(h)
                    cols["sum_b"].append(int(sums[0]))
                    cols["sum_g"].append(int(sums[1]))
                    cols["sum_r"].append(int(sums[2]))
                    k += 1
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in cols.items()}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)
