"""Multimodal / binary columns (X5): opaque binary payloads with typed
metadata, decode/feature-extract plumbing as Arrow-batched Pandas UDFs.

Mirrors the reference's only binary surface — the package icon
(``Icon{Data []byte, MediaType string}``, /root/reference/main.go:305-316)
— generalized to the image/audio/video columns a training-data pipeline
carries: BinaryType payload + media-type + size metadata, processed by
``mapInPandas`` so each Arrow batch crosses the JVM↔Python boundary once.

Decoders: ``decoder='image'`` is a REAL stdlib-only 24-bit BMP codec
(header parse + bottom-up padded pixel rows, struct module only);
``decoder='png'`` is a REAL stdlib-only 8-bit RGB/RGBA PNG codec (CRC'd
chunks, zlib inflate, all five scanline filters) — the format the
reference's actual catalog icons ship in. Both compute features from
decoded pixels. ``decoder='svg'`` is a REAL stdlib XML parse extracting
structural metadata (size/viewBox/element census/depth) — the vector
icon format where no pixel decode exists. ``decoder='jpeg'`` is a REAL
stdlib SOF-marker scan (frame dimensions/components/precision, no
entropy decode). ``decoder='wav'`` is a REAL stdlib PCM decode (the
``wave`` module) computing signal features from actual samples.
``decoder='fake'`` remains the deterministic byte-stat stand-in for
opaque payloads. ``decoder='jpeg_pixels'`` is a REAL
baseline-sequential JPEG decode (canonical huffman + dequantize +
orthonormal IDCT + chroma upsample), stdlib + numpy, with a matching
fixture encoder. ``decoder='gif'`` is a REAL stdlib GIF89a codec
(variable-width LZW, palette-exact, 4-pass interlace). Same split for
``resize_payload``: 'image'/'png'/'jpeg'/'gif' are real
nearest-neighbor pixel resamples re-encoded in their format.
``decoder='adpcm'`` is a REAL IMA-ADPCM compressed-audio decode and
``decoder='mjpeg'`` a REAL AVI/MJPEG video FRAME decode (RIFF walk +
per-frame baseline JPEG) — every media column (image, compressed audio,
video frames) has at least one genuinely-decoded format. Only
perceptual audio (MP3/AAC/Opus) and inter-predicted video
(H.264/VP9/AV1) stay behind the gated slot, raising
``NotImplementedError`` with the library they need.
"""

from __future__ import annotations

import struct
import zlib

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Binary column construction (fixtures carry no real media, so documents
# are wrapped into binary payloads — the plumbing is what's under test)
# --------------------------------------------------------------------------

def binary_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, media_type, n_bytes): the
    engine's canonical multimodal column layout (payload + typed
    metadata, the Icon model generalized)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.when(F.col("lang") == "zh", "text/plain; charset=utf-8")
        .otherwise("text/plain")
        .alias("media_type"),
        F.length(payload).alias("n_bytes"),
    )


IMG_W = IMG_H = 8


def _doc_pixels(doc_id: int, w: int = IMG_W, h: int = IMG_H) -> list[list[tuple[int, int, int]]]:
    """Deterministic per-document RGB raster (id-seeded linear pattern),
    so every fixture doc owns a REAL decodable image with pixel stats
    that unit tests can compute independently."""
    return [
        [
            (
                (doc_id * 7 + 13 * x + 31 * y) % 256,
                (doc_id * 11 + 17 * x + 5 * y) % 256,
                (doc_id * 3 + 23 * x + 29 * y) % 256,
            )
            for x in range(w)
        ]
        for y in range(h)
    ]


def image_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=REAL BMP bytes, media_type, n_bytes).

    Encoding runs distributed inside mapInPandas (the builder is itself
    an operator, not a driver loop); payloads round-trip through the
    stdlib codec above."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [encode_bmp(IMG_W, IMG_H, _doc_pixels(int(d))) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": BMP_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


@_register(
    "mm_binary_stats",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           base64(encode(substring(text, 1, 32))) AS head_b64,
           CASE WHEN lang = 'zh' THEN 'text/plain; charset=utf-8'
                ELSE 'text/plain' END AS media_type
    FROM documents
    """,
)
def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata projection: byte length, base64 head,
    media type — the queryable surface of opaque payloads (X5)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(F.encode("text", "utf-8")).alias("n_bytes"),
        F.base64(F.encode(F.substring("text", 1, 32), "utf-8")).alias("head_b64"),
        F.when(F.col("lang") == "zh", "text/plain; charset=utf-8")
        .otherwise("text/plain")
        .alias("media_type"),
    )


# --------------------------------------------------------------------------
# Stdlib BMP codec (24-bit BI_RGB): the real decode path. A BMP is a
# 14-byte file header + 40-byte BITMAPINFOHEADER + bottom-up rows of BGR
# triples padded to 4-byte boundaries — parseable with struct alone,
# which makes it the one raster format an image pipeline can genuinely
# decode in this container (mirrors the reference's binary icon payloads,
# main.go:305-316, which ship image bytes + media type).
# --------------------------------------------------------------------------

BMP_MEDIA_TYPE = "image/bmp"


def encode_bmp(width: int, height: int, rgb_rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode top-down RGB rows as a bottom-up 24-bit BMP."""
    pad = (4 - (width * 3) % 4) % 4
    body = b"".join(
        b"".join(bytes((b, g, r)) for r, g, b in row) + b"\x00" * pad
        for row in reversed(rgb_rows)
    )
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return file_hdr + info + body


def decode_bmp(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a 24-bit uncompressed BMP to (width, height, top-down RGB rows)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={comp})")
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    stride = (width * 3 + 3) & ~3
    if pixel_off + stride * height > len(payload):
        raise ValueError("truncated BMP payload")
    rows = []
    for y in range(height):
        off = pixel_off + y * stride
        row = [
            (payload[off + 3 * x + 2], payload[off + 3 * x + 1], payload[off + 3 * x])
            for x in range(width)
        ]
        rows.append(row)
    if bottom_up:
        rows.reverse()
    return width, height, rows


# --------------------------------------------------------------------------
# Stdlib PNG codec (8-bit RGB / RGBA, non-interlaced): the reference's
# real icon payloads are base64 PNG (main.go:305-316 ships icon bytes +
# media type), and PNG is fully decodable with the stdlib — chunks with
# CRC-32 (zlib.crc32), a DEFLATE pixel stream (zlib.decompress), and the
# five scanline filters (None/Sub/Up/Average/Paeth) reconstructed
# byte-exactly per the PNG spec. No PIL needed.
# --------------------------------------------------------------------------

PNG_MEDIA_TYPE = "image/png"
PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4): nearest of left/up/up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    rows: list[list[tuple[int, ...]]],
    filters: int | list[int] = 0,
) -> bytes:
    """Encode top-down RGB(A) rows as an 8-bit non-interlaced PNG.

    ``rows`` holds (r,g,b) or (r,g,b,a) tuples; ``filters`` selects the
    per-scanline filter (single int, or one per row — any of 0..4 is a
    valid encoding, which lets fixtures exercise every decoder filter
    path).
    """
    bpp = len(rows[0][0])
    if bpp not in (3, 4):
        raise ValueError("rows must hold RGB or RGBA tuples")
    color_type = 2 if bpp == 3 else 6
    stride = width * bpp
    flist = [filters] * height if isinstance(filters, int) else list(filters)
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(v for px in rows[y] for v in px)
        ft = flist[y]
        if ft == 0:
            enc = bytearray(line)
        else:
            enc = bytearray(stride)
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 2:
                    pred = prev[i]
                elif ft == 3:
                    pred = (a + prev[i]) >> 1
                elif ft == 4:
                    c = prev[i - bpp] if i >= bpp else 0
                    pred = _paeth(a, prev[i], c)
                else:
                    raise ValueError(f"unknown PNG filter type {ft}")
                enc[i] = (line[i] - pred) & 0xFF
        raw.append(ft)
        raw += enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, list[list[tuple[int, ...]]]]:
    """Decode an 8-bit RGB/RGBA non-interlaced PNG to (width, height,
    top-down pixel rows). Validates chunk CRCs and pixel-stream length;
    raises ValueError on anything truncated, corrupt, or outside the
    supported variant (matching decode_bmp's error contract)."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr: bytes | None = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG {ctype!r} chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    else:
        raise ValueError("truncated PNG payload (no IEND)")
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color_type not in (2, 6):
        raise ValueError(
            f"unsupported PNG variant (bit_depth={depth}, color_type={color_type})"
        )
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG compression/filter/interlace method")
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    bpp = 3 if color_type == 2 else 4
    stride = w * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG pixel stream: {e}") from e
    if len(raw) != h * (1 + stride):
        raise ValueError("truncated PNG pixel data")
    rows: list[list[tuple[int, ...]]] = []
    prev = bytearray(stride)
    for y in range(h):
        off = y * (1 + stride)
        ft = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        rows.append([tuple(line[x * bpp : (x + 1) * bpp]) for x in range(w)])
        prev = line
    return w, h, rows


def png_image_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=REAL PNG bytes, media_type, n_bytes).

    Same distributed-builder shape as image_table, but PNG: even docs get
    RGB, odd docs RGBA (alpha = (id+x+y) % 256), and the per-row filter
    cycles through all five types — every fixture payload exercises the
    full unfilter matrix of the decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                px = _doc_pixels(d)
                if d % 2:  # RGBA branch (color type 6)
                    px = [
                        [(*px[y][x], (d + x + y) % 256) for x in range(IMG_W)]
                        for y in range(IMG_H)
                    ]
                filters = [(d + y) % 5 for y in range(IMG_H)]
                payloads.append(encode_png(IMG_W, IMG_H, px, filters))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": PNG_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


# --------------------------------------------------------------------------
# SVG codec slot (stdlib XML): metadata extraction, no rasterizing
# --------------------------------------------------------------------------
# OLM catalog icons commonly ship as SVG next to PNG (the reference's
# icon surface, main.go:305-316, is format-agnostic base64+mediatype).
# A vector format has no pixels to stat — the useful, scalable analysis
# is structural metadata: declared size, viewBox geometry, element
# census, nesting depth. All stdlib xml.etree, no rasterizer.

SVG_MEDIA_TYPE = "image/svg+xml"
SVG_NS = "http://www.w3.org/2000/svg"


def _svg_len(value: str | None) -> float:
    """Parse an SVG length attribute ("64", "64px", "4.5in" → leading
    numeric; percentages and malformed values → 0, callers fall back to
    the viewBox)."""
    if not value or value.endswith("%"):
        return 0.0
    num = ""
    for ch in value.strip():
        if ch.isdigit() or ch in ".+-eE":
            num += ch
        else:
            break
    try:
        return float(num)
    except ValueError:
        return 0.0


def svg_features(payload: bytes) -> list[float]:
    """REAL parse: stdlib ElementTree over the SVG document → [width,
    height, viewbox_w, viewbox_h, n_elements, n_paths, max_depth,
    has_title]. width/height prefer the root attributes (units
    stripped) and fall back to the viewBox box; element counts use XML
    local names, so namespaced and plain documents behave identically."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(bytes(payload).decode("utf-8"))
    if root.tag.split("}")[-1] != "svg":
        raise ValueError(f"not an svg root: {root.tag!r}")
    vb = (root.get("viewBox") or "").replace(",", " ").split()
    vb_w = float(vb[2]) if len(vb) == 4 else 0.0
    vb_h = float(vb[3]) if len(vb) == 4 else 0.0
    width = _svg_len(root.get("width")) or vb_w
    height = _svg_len(root.get("height")) or vb_h

    n_elements = 0
    n_paths = 0
    has_title = 0.0
    max_depth = 0

    def walk(el, depth):
        nonlocal n_elements, n_paths, has_title, max_depth
        for child in el:
            tag = child.tag.split("}")[-1]
            n_elements += 1
            max_depth = max(max_depth, depth)
            if tag == "path":
                n_paths += 1
            if tag == "title":
                has_title = 1.0
            walk(child, depth + 1)

    walk(root, 1)
    return [
        width,
        height,
        vb_w,
        vb_h,
        float(n_elements),
        float(n_paths),
        float(max_depth),
        has_title,
    ]


def svg_icon_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=REAL SVG bytes, media_type, n_bytes).

    Distributed builder (same shape as image_table): every doc owns a
    deterministic id-seeded SVG — declared size with a px unit, a
    matching viewBox, an id-varied census of rect/circle/path elements,
    an id-varied nesting depth, and a <title> on every third doc — so
    the parser's whole surface is exercised by fixtures whose expected
    features tests can compute independently."""

    def svg_doc(d: int) -> bytes:
        w, h = (d % 96) + 8, (d % 64) + 8
        parts = [
            f'<svg xmlns="{SVG_NS}" width="{w}px" height="{h}px" '
            f'viewBox="0 0 {w} {h}">'
        ]
        if d % 3 == 0:
            parts.append(f"<title>icon-{d}</title>")
        for i in range(d % 4 + 1):
            parts.append(f'<rect x="{i}" y="{i}" width="4" height="4"/>')
        for i in range(d % 3):
            parts.append(f'<circle cx="{i + 1}" cy="{i + 1}" r="2"/>')
        for i in range(d * 7 % 3):
            parts.append(f'<path d="M0 {i} L{i + 1} 0"/>')
        depth = d % 3 + 1
        parts.extend("<g>" * depth)
        parts.append('<rect x="0" y="0" width="1" height="1"/>')
        parts.extend("</g>" * depth)
        parts.append("</svg>")
        return "".join(parts).encode("utf-8")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [svg_doc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": SVG_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


# --------------------------------------------------------------------------
# JPEG codec slot (stdlib marker scan): SOF header metadata, no pixel decode
# --------------------------------------------------------------------------
# The reference's icon surface (main.go:305-316) carries base64 payloads
# with arbitrary mediatypes — image/jpeg is a common one alongside PNG and
# SVG. Full JPEG pixel decode needs an entropy decoder (PIL/libjpeg, not in
# this container), but the frame header is plain marker-framed bytes:
# walking SOI → APPn/DQT/... → SOFn yields width, height, component count,
# sample precision, and progressive-vs-baseline without touching the scan
# data. That is exactly the metadata a 100 TB media-curation pass filters
# on (resolution/aspect/mode gates) — and it reads only the first ~1 KB of
# each payload regardless of image size.

JPEG_MEDIA_TYPE = "image/jpeg"

# SOFn marker bytes carry the frame header. 0xC4/0xC8/0xCC look like SOFs
# but are DHT/JPG-extension/DAC per the JPEG spec (ITU T.81 table B.1).
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
_JPEG_STANDALONE = frozenset(range(0xD0, 0xD8)) | {0x01}  # RSTn, TEM


def jpeg_metadata(payload: bytes) -> dict:
    """REAL parse: walk the JPEG marker stream up to the first SOFn and
    return the frame header plus marker census — width, height,
    n_components, precision (bits/sample), progressive flag (SOF2/6/10/14),
    JFIF/EXIF presence, and DQT count. Raises ValueError on non-JPEG or
    truncated-before-SOF input (malformed media must be *detected*, not
    silently zeroed — callers quarantine)."""
    b = bytes(payload)
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        raise ValueError("not a JPEG: missing SOI marker")
    has_jfif = has_exif = False
    n_dqt = 0
    i = 2
    while i + 1 < len(b):
        if b[i] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {i}")
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in _JPEG_STANDALONE:
            i += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        if i + 3 >= len(b):
            break
        seglen = (b[i + 2] << 8) | b[i + 3]
        if seglen < 2:
            raise ValueError(f"bad segment length {seglen} at byte {i}")
        seg = b[i + 4 : i + 2 + seglen]
        if marker == 0xE0 and seg[:5] == b"JFIF\x00":
            has_jfif = True
        elif marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            has_exif = True
        elif marker == 0xDB:
            n_dqt += 1
        elif marker in _JPEG_SOF_MARKERS:
            if len(seg) < 6:
                raise ValueError("truncated SOF segment")
            return {
                "precision": seg[0],
                "height": (seg[1] << 8) | seg[2],
                "width": (seg[3] << 8) | seg[4],
                "n_components": seg[5],
                "progressive": marker in (0xC2, 0xC6, 0xCA, 0xCE),
                "has_jfif": has_jfif,
                "has_exif": has_exif,
                "n_dqt": n_dqt,
            }
        elif marker == 0xDA:  # scan data starts; SOF must precede SOS
            break
        i += 2 + seglen
    raise ValueError("no SOF frame header found")


def jpeg_features(payload: bytes) -> list[float]:
    """JPEG header metadata as the standard 8-dim feature vector:
    [width, height, n_components, precision, progressive, has_jfif,
    has_exif, n_dqt]. Same mapInPandas slot as the BMP/PNG/SVG paths."""
    m = jpeg_metadata(payload)
    return [
        float(m["width"]),
        float(m["height"]),
        float(m["n_components"]),
        float(m["precision"]),
        float(m["progressive"]),
        float(m["has_jfif"]),
        float(m["has_exif"]),
        float(m["n_dqt"]),
    ]


def encode_jpeg_header(
    width: int,
    height: int,
    n_components: int = 3,
    progressive: bool = False,
    with_jfif: bool = True,
) -> bytes:
    """Structurally-valid JPEG marker stream (SOI, APP0/JFIF, DQT, SOFn,
    SOS with placeholder entropy data, EOI) for fixture generation. The
    entropy-coded scan is a stub — any standards-compliant *metadata*
    reader (including ours) parses everything before it; only a full
    pixel decoder would notice."""
    out = bytearray(b"\xff\xd8")  # SOI
    if with_jfif:
        app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
    dqt = bytes([0]) + bytes(range(1, 65))  # table id 0 + 64 coefficients
    out += b"\xff\xdb" + (len(dqt) + 2).to_bytes(2, "big") + dqt
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = bytearray([8])  # 8-bit precision
    sof += height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(n_components)
    for c in range(n_components):
        sof += bytes([c + 1, 0x11, 0])  # id, 1x1 sampling, qtable 0
    out += sof_marker + (len(sof) + 2).to_bytes(2, "big") + sof
    sos = bytearray([n_components])
    for c in range(n_components):
        sos += bytes([c + 1, 0])
    sos += b"\x00\x3f\x00"  # spectral selection
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    out += b"\x00" * 8  # placeholder entropy-coded data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_icon_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=JPEG marker stream, media_type,
    n_bytes). Distributed builder, same shape as svg_icon_table: each doc
    owns a deterministic id-seeded header (id-varied dimensions,
    grayscale-vs-RGB, baseline-vs-progressive) so the parser's whole
    surface is covered by fixtures whose expected metadata tests can
    compute independently."""

    def jpeg_doc(d: int) -> bytes:
        return encode_jpeg_header(
            width=(d % 96) + 8,
            height=(d % 64) + 8,
            n_components=1 if d % 5 == 0 else 3,
            progressive=d % 2 == 1,
            with_jfif=d % 3 != 2,
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [jpeg_doc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": JPEG_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


# --------------------------------------------------------------------------
# Baseline-JPEG PIXEL codec (stdlib + numpy): the last image gap behind
# the reference's icon mediatypes (main.go:314-315). Baseline sequential
# DCT (SOF0) is fully decodable without PIL: segment parse → canonical
# huffman decode → dequantize → orthonormal IDCT → chroma upsample →
# YCbCr→RGB. The matching encoder exists for fixture generation (same
# pattern as encode_bmp/encode_png/encode_wav): standard Annex K huffman
# tables, caller-controlled quantization, optional 4:2:0 subsampling —
# with unit quant tables a flat 8x8 block is DC-only and the round trip
# is pixel-EXACT, which is what the tests pin.
# --------------------------------------------------------------------------

# zigzag index -> linear (row*8+col) position, JPEG spec Figure A.6
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Standard huffman tables (JPEG Annex K.3): (BITS counts per code length
# 1..16, HUFFVAL symbol list)
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
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
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical huffman assignment (spec C.2): symbol -> (length, code)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the bit-at-a-time decoder."""
    return {(ln, code): sym for sym, (ln, code) in _huff_codes(bits, vals).items()}


def _dct_matrix():
    """8x8 orthonormal DCT-II matrix T: coeffs = T @ block @ T.T."""
    import numpy as np

    t = np.zeros((8, 8))
    for i in range(8):
        c = (1 / 8) ** 0.5 if i == 0 else 0.25**0.5
        for j in range(8):
            t[i, j] = c * np.cos((2 * j + 1) * i * np.pi / 16)
    return t


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        """Pad the partial byte with 1-bits (spec F.1.2.3) — the state
        every restart marker must be emitted at."""
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0

    def marker(self, m: int) -> None:
        """Emit a literal marker (never stuffed) — caller aligns first."""
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _encode_block(coeffs, prev_dc: int, dc_tbl, ac_tbl, w: _BitWriter) -> int:
    """Entropy-encode one zigzagged quantized block; returns its DC."""

    def magnitude(v: int) -> tuple[int, int]:
        size = abs(v).bit_length()
        return size, (v if v >= 0 else v + (1 << size) - 1)

    dc = int(coeffs[0])
    size, mbits = magnitude(dc - prev_dc)
    ln, code = dc_tbl[size]
    w.write(code, ln)
    if size:
        w.write(mbits, size)
    run = 0
    for k in range(1, 64):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tbl[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size, mbits = magnitude(v)
        ln, code = ac_tbl[(run << 4) | size]
        w.write(code, ln)
        w.write(mbits, size)
        run = 0
    if run:
        ln, code = ac_tbl[0x00]  # EOB
        w.write(code, ln)
    return dc


def encode_baseline_jpeg(
    rgb_rows: list[list[tuple[int, int, int]]],
    quant_luma: list[int] | None = None,
    quant_chroma: list[int] | None = None,
    subsample_420: bool = False,
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode top-down RGB rows as a REAL baseline-sequential JPEG
    (SOF0, standard Annex K huffman tables, true entropy-coded scan).

    Quant tables default to all-ones (lossless quantization — the DCT
    round trip is then exact for flat blocks, the test fixture law);
    values must be 1..255 (the 8-bit DQT form — validated, because a
    silently truncated table would corrupt every decoder's dequant).
    ``subsample_420`` encodes chroma at quarter resolution (2x2 mean)
    inside 16x16 MCUs; ``grayscale`` emits a single-component scan;
    ``restart_interval`` N emits a DRI segment plus byte-aligned RSTn
    markers (DC predictors reset) every N MCUs — the resync structure
    real camera/libjpeg output uses.
    """
    import numpy as np

    h = len(rgb_rows)
    wd = len(rgb_rows[0])
    rgb = np.array(rgb_rows, dtype=np.float64)  # (h, w, 3)
    for tbl in (quant_luma, quant_chroma):
        if tbl is not None and any(
            not (1 <= int(v) <= 255) for v in tbl
        ):
            raise ValueError(
                "quantization values must be 1..255 (8-bit DQT); "
                "0 divides to inf, >255 would silently truncate"
            )
    ql = np.array(quant_luma or [1] * 64, dtype=np.float64)
    qc = np.array(quant_chroma or [1] * 64, dtype=np.float64)
    t = _dct_matrix()

    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128

    def pad_to(img, mult):
        ph = (-img.shape[0]) % mult
        pw = (-img.shape[1]) % mult
        return np.pad(img, ((0, ph), (0, pw)), mode="edge")

    # Quant tables are stored zigzagged in DQT and coefficients are
    # emitted zigzagged — one reorder serves both.
    def zz(img_block_coef):
        return img_block_coef.reshape(64)[_JPEG_ZIGZAG]

    def blocks_of(img):
        for by in range(0, img.shape[0], 8):
            for bx in range(0, img.shape[1], 8):
                yield img[by : by + 8, bx : bx + 8]

    dc_l = _huff_codes(*_STD_DC_LUMA)
    ac_l = _huff_codes(*_STD_AC_LUMA)
    dc_c = _huff_codes(*_STD_DC_CHROMA)
    ac_c = _huff_codes(*_STD_AC_CHROMA)
    bw = _BitWriter()

    def quantized(blk, qt):
        coef = t @ (blk - 128.0) @ t.T
        return np.round(zz(coef) / qt)

    prevs = [0, 0, 0]
    rst_state = {"mcu": 0, "rst": 0}

    def mcu_boundary() -> None:
        """Call at the top of each MCU: emits the byte-aligned RSTn and
        resets DC predictors every restart_interval MCUs (spec E.2.4)."""
        i = rst_state["mcu"]
        if restart_interval and i and i % restart_interval == 0:
            bw.align()
            bw.marker(0xD0 + rst_state["rst"] % 8)
            rst_state["rst"] += 1
            prevs[:] = [0, 0, 0]
        rst_state["mcu"] = i + 1

    if grayscale:
        yp = pad_to(y, 8)
        for blk in blocks_of(yp):
            mcu_boundary()
            prevs[0] = _encode_block(quantized(blk, ql), prevs[0], dc_l, ac_l, bw)
        comps = [(1, 0x11, 0)]
    elif not subsample_420:
        yp, cbp, crp = pad_to(y, 8), pad_to(cb, 8), pad_to(cr, 8)
        for by in range(0, yp.shape[0], 8):
            for bx in range(0, yp.shape[1], 8):
                mcu_boundary()
                sl = (slice(by, by + 8), slice(bx, bx + 8))
                prevs[0] = _encode_block(quantized(yp[sl], ql), prevs[0], dc_l, ac_l, bw)
                prevs[1] = _encode_block(quantized(cbp[sl], qc), prevs[1], dc_c, ac_c, bw)
                prevs[2] = _encode_block(quantized(crp[sl], qc), prevs[2], dc_c, ac_c, bw)
        comps = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
    else:
        yp = pad_to(y, 16)
        # chroma at quarter resolution: 2x2 mean, then pad to 8
        def down(img):
            p = pad_to(img, 2)
            return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0

        cbp, crp = pad_to(down(cb), 8), pad_to(down(cr), 8)
        for my in range(0, yp.shape[0], 16):
            for mx in range(0, yp.shape[1], 16):
                mcu_boundary()
                for dy, dx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                    sl = (slice(my + dy, my + dy + 8), slice(mx + dx, mx + dx + 8))
                    prevs[0] = _encode_block(
                        quantized(yp[sl], ql), prevs[0], dc_l, ac_l, bw
                    )
                csl = (slice(my // 2, my // 2 + 8), slice(mx // 2, mx // 2 + 8))
                prevs[1] = _encode_block(quantized(cbp[csl], qc), prevs[1], dc_c, ac_c, bw)
                prevs[2] = _encode_block(quantized(crp[csl], qc), prevs[2], dc_c, ac_c, bw)
        comps = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]

    scan = bw.flush()

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
    for tid, qt in ((0, ql), (1, qc)) if not grayscale else ((0, ql),):
        dqt = bytes([tid]) + bytes(int(v) for v in qt[:64])  # validated 1..255
        out += b"\xff\xdb" + (len(dqt) + 2).to_bytes(2, "big") + dqt
    if restart_interval:
        out += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
    sof = bytearray([8]) + h.to_bytes(2, "big") + wd.to_bytes(2, "big")
    sof.append(len(comps))
    for cid, samp, qid in comps:
        sof += bytes([cid, samp, qid])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    tables = [(0x00, _STD_DC_LUMA), (0x10, _STD_AC_LUMA)]
    if not grayscale:
        tables += [(0x01, _STD_DC_CHROMA), (0x11, _STD_AC_CHROMA)]
    for tclass_id, (bits, vals) in tables:
        dht = bytes([tclass_id]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    sos = bytearray([len(comps)])
    for cid, _, qid in comps:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing. Restart markers are NOT consumed as data: the decoder
    calls :meth:`expect_restart` at each scheduled restart boundary
    (spec E.2.4) — encountering any marker mid-symbol is an error, so a
    corrupt stream fails loudly instead of decoding garbage."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def expect_restart(self) -> None:
        """Byte-align (drop the current byte's padding bits) and consume
        the RSTn marker that must sit at this restart boundary."""
        self.acc = 0
        self.n = 0
        if not (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError(
                f"expected restart marker at byte {self.pos} "
                "(DRI interval does not match the scan)"
            )
        self.pos += 2

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        while self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _read_huff_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in scan")


def _extend(v: int, size: int) -> int:
    """Spec F.2.2.1 EXTEND: map `size` received bits to a signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_baseline(
    payload: bytes,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """REAL pixel decode of a baseline-sequential JPEG (SOF0): huffman →
    dequantize → orthonormal IDCT → nearest-neighbor chroma upsample →
    YCbCr→RGB (BT.601/JFIF), clamped to 0..255. Supports grayscale and
    1-2 sampling factors per axis (4:4:4 / 4:2:2 / 4:2:0), interleaved
    single-scan, with restart markers. Progressive (SOF2) and arithmetic
    coding raise — those genuinely need a wider decoder."""
    import numpy as np

    b = payload
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qtables: dict[int, "np.ndarray"] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 1 < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF or marker in _JPEG_STANDALONE:
            i += 1 if marker == 0xFF else 2
            continue
        if marker == 0xD9:
            break
        seglen = (b[i + 2] << 8) | b[i + 3]
        seg = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                n = 64 * (2 if prec else 1)
                raw = seg[p + 1 : p + 1 + n]
                vals = (
                    [int.from_bytes(raw[k : k + 2], "big") for k in range(0, n, 2)]
                    if prec
                    else list(raw)
                )
                qtables[tid] = np.array(vals, dtype=np.float64)
                p += 1 + n
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                tclass, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                htables[(tclass, tid)] = _huff_decoder(bits, vals)
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker in _JPEG_SOF_MARKERS:
            if marker != 0xC0:
                raise ValueError(
                    "only baseline sequential (SOF0) pixel decode is supported"
                )
            height = (seg[1] << 8) | seg[2]
            width = (seg[3] << 8) | seg[4]
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F, "q": qid})
            frame = {"w": width, "h": height, "comps": comps}
        elif marker == 0xDA:  # SOS: scan header then entropy data
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tbl = {}
            for s in range(ns):
                cid, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                scan_tbl[cid] = (tt >> 4, tt & 0x0F)
            data_start = i + 2 + seglen
            return _decode_scan(
                b, data_start, frame, scan_tbl, qtables, htables, restart_interval
            )
        i += 2 + seglen
    raise ValueError("no scan found")


def _decode_scan(
    b, pos, frame, scan_tbl, qtables, htables, restart_interval
):
    import numpy as np

    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    t = _dct_matrix()
    unzz = np.argsort(np.array(_JPEG_ZIGZAG))  # linear -> zigzag position

    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    ]
    br = _BitReader(b, pos)
    prevs = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.expect_restart()  # byte-align + consume RSTn
                prevs = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_tbl = htables[(0, scan_tbl[c["id"]][0])]
                ac_tbl = htables[(1, scan_tbl[c["id"]][1])]
                qt = qtables[c["q"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zzc = np.zeros(64)
                        s = _read_huff_symbol(br, dc_tbl)
                        diff = _extend(br.bits(s), s) if s else 0
                        prevs[ci] += diff
                        zzc[0] = prevs[ci]
                        k = 1
                        while k < 64:
                            rs = _read_huff_symbol(br, ac_tbl)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zzc[k] = _extend(br.bits(size), size)
                            k += 1
                        coef = (zzc * qt)[unzz].reshape(8, 8)
                        blk = t.T @ coef @ t + 128.0
                        py = (my * c["v"] + by) * 8
                        px = (mx * c["h"] + bx) * 8
                        planes[ci][py : py + 8, px : px + 8] = blk

    # upsample each plane to full MCU-grid resolution, crop to (h, w)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.int64)
        rows = [[(int(v), int(v), int(v)) for v in row] for row in y]
        return w, h, rows
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = np.clip(np.round(y + 1.402 * cr), 0, 255).astype(np.int64)
    g = np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255).astype(np.int64)
    bl = np.clip(np.round(y + 1.772 * cb), 0, 255).astype(np.int64)
    rows = [
        [(int(r[yy, xx]), int(g[yy, xx]), int(bl[yy, xx])) for xx in range(w)]
        for yy in range(h)
    ]
    return w, h, rows


def jpeg_pixel_features(payload: bytes) -> list[float]:
    """REAL decode: baseline-JPEG huffman+IDCT → pixel statistics, same
    vector as the BMP/PNG paths."""
    return _pixel_stats(*decode_jpeg_baseline(bytes(payload)))


# --------------------------------------------------------------------------
# WAV codec slot (stdlib ``wave``): REAL PCM decode + signal features
# --------------------------------------------------------------------------
# The audio column of a multimodal corpus. Compressed audio (mp3/ogg/
# flac) needs external codecs, but PCM WAV — the interchange format
# feature-extraction pipelines normalize to before analysis — decodes
# with the stdlib ``wave`` module, so this tier computes REAL signal
# statistics from REAL samples, not byte stats. numpy (baked into the
# container and already a pandas dependency) vectorizes the per-payload
# sample math inside the Arrow batch.

WAV_MEDIA_TYPE = "audio/wav"


def encode_wav(
    sample_rate: int, channels: int, samples: "list[int]"
) -> bytes:
    """16-bit PCM WAV from interleaved int16 samples (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        import array

        w.writeframes(array.array("h", samples).tobytes())
    return buf.getvalue()


def wav_metadata(payload: bytes) -> dict:
    """REAL parse: RIFF/fmt header via stdlib ``wave`` — sample rate,
    channels, bit depth, frame count, duration. Raises wave.Error on
    non-WAV input (malformed media is detected, not zeroed)."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        return {
            "sample_rate": w.getframerate(),
            "n_channels": w.getnchannels(),
            "bit_depth": w.getsampwidth() * 8,
            "n_frames": w.getnframes(),
            "duration_sec": w.getnframes() / w.getframerate(),
        }


def wav_features(payload: bytes) -> list[float]:
    """REAL decode: stdlib wave → PCM samples → signal features
    [sample_rate, n_channels, bit_depth, duration_sec, rms, peak,
    zero_crossing_rate, dc_offset]. Amplitudes normalized to [-1, 1]
    (int16 full scale); ZCR is sign changes per sample interval over
    the channel-mean signal. 8/16-bit PCM supported — the stdlib
    module's own coverage."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        nframes = w.getnframes()
        raw = w.readframes(nframes)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM width {width} bytes")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    n = len(x)
    if n == 0:
        rms = peak = zcr = dc = 0.0
    else:
        rms = float(np.sqrt(np.mean(x * x)))
        peak = float(np.max(np.abs(x)))
        dc = float(np.mean(x))
        zcr = (
            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            if n > 1
            else 0.0
        )
    return [
        float(rate),
        float(nch),
        float(width * 8),
        n / rate,
        rms,
        peak,
        zcr,
        dc,
    ]


def wav_audio_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=REAL 16-bit PCM WAV, media_type,
    n_bytes). Distributed builder, same shape as the icon tables: each
    doc owns a deterministic id-seeded square wave (id-varied rate,
    period, amplitude, mono/stereo, length) whose RMS, peak, ZCR and DC
    offset tests compute independently in closed form."""

    def wav_doc(d: int) -> bytes:
        rate = (8000, 16000, 22050, 44100)[d % 4]
        period = (d % 7) + 2  # samples per half-cycle
        amp = ((d % 5) + 1) * 5000
        nch = 2 if d % 3 == 0 else 1
        n = 64 * period  # whole half-cycles, so RMS == amp exactly
        mono = [amp if (i // period) % 2 == 0 else -amp for i in range(n)]
        samples = (
            [s for s in mono for _ in range(2)] if nch == 2 else mono
        )
        return encode_wav(rate, nch, samples)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [wav_doc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": WAV_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


# --------------------------------------------------------------------------
# IMA-ADPCM codec slot (stdlib+numpy): REAL compressed audio, 4:1
# --------------------------------------------------------------------------
# The compressed-audio slot was library-gated ("needs librosa/ffmpeg");
# IMA/DVI ADPCM (WAVE format tag 0x0011) is a genuine compressed audio
# format — 4-bit adaptive differential coding, 4:1 vs 16-bit PCM — whose
# full codec fits in portable integer arithmetic. Perceptual codecs
# (MP3/AAC/Opus) stay gated; this closes the format-decode plumbing with
# a real bitstream.

ADPCM_MEDIA_TYPE = "audio/wav"  # WAV container, compressed payload
WAVE_FORMAT_IMA_ADPCM = 0x0011

_ADPCM_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_ADPCM_INDEX_DELTA = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _adpcm_step_sample(nibble: int, predictor: int, index: int) -> tuple[int, int]:
    """Shared decoder-side state transition (the encoder mirrors it so
    both stay in lockstep): nibble → (new predictor, new index)."""
    step = _ADPCM_STEPS[index]
    diffq = step >> 3
    if nibble & 4:
        diffq += step
    if nibble & 2:
        diffq += step >> 1
    if nibble & 1:
        diffq += step >> 2
    predictor = _adpcm_clamp16(
        predictor - diffq if nibble & 8 else predictor + diffq
    )
    index = max(0, min(88, index + _ADPCM_INDEX_DELTA[nibble]))
    return predictor, index


def encode_adpcm_wav(
    sample_rate: int, samples: "list[int]", block_align: int = 256
) -> bytes:
    """Mono IMA-ADPCM WAV (format 0x0011): block header carries the
    int16 predictor seed + step index, then 4-bit adaptive differential
    codes — (block_align-4)*2 samples per block after the seed."""
    spb = (block_align - 4) * 2 + 1  # samples per block incl. seed
    blocks = bytearray()
    index = 0
    i = 0
    n = len(samples)
    while i < n:
        chunk = samples[i : i + spb]
        i += spb
        predictor = _adpcm_clamp16(int(chunk[0]))
        blocks += struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = _ADPCM_STEPS[index]
            diff = int(s) - predictor
            nibble = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nibble |= 4
                diff -= step
            if diff >= step >> 1:
                nibble |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nibble |= 1
            predictor, index = _adpcm_step_sample(nibble, predictor, index)
            nibbles.append(nibble)
        nibbles += [0] * ((block_align - 4) * 2 - len(nibbles))  # pad block
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            blocks.append(lo | (hi << 4))

    n_blocks = -(-n // spb) if n else 0
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM, 1, sample_rate, byte_rate,
        block_align, 4, 2, spb,
    )
    out = bytearray()
    data_len = n_blocks * block_align
    riff_len = 4 + (8 + len(fmt)) + (8 + 4) + (8 + data_len)
    out += b"RIFF" + struct.pack("<I", riff_len) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<II", 4, n)
    out += b"data" + struct.pack("<I", data_len) + blocks
    return bytes(out)


def decode_adpcm_wav(payload: bytes) -> tuple[int, list[int]]:
    """REAL IMA-ADPCM decode: manual RIFF walk (stdlib ``wave`` only
    handles PCM), per-block predictor reseed, 4-bit state machine.
    Returns (sample_rate, int16 samples)."""
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    n_samples = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        ln = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact" and ln >= 4:
            n_samples = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    tag, nch, rate, _, block_align = struct.unpack_from("<HHIIH", fmt, 0)
    if tag != WAVE_FORMAT_IMA_ADPCM:
        raise ValueError(f"not IMA-ADPCM (format tag 0x{tag:04x})")
    if nch != 1:
        raise ValueError("only mono IMA-ADPCM supported")
    spb = (block_align - 4) * 2 + 1
    out: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            raise ValueError("ADPCM: truncated block header")
        predictor, index, _ = struct.unpack_from("<hBB", block, 0)
        if index > 88:
            raise ValueError(f"ADPCM: bad step index {index}")
        out.append(predictor)
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                predictor, index = _adpcm_step_sample(nibble, predictor, index)
                out.append(predictor)
    if n_samples is not None:
        out = out[:n_samples]
    return rate, out


def adpcm_features(payload: bytes) -> list[float]:
    """REAL compressed-audio decode: IMA-ADPCM bitstream → samples →
    the same signal-feature vector as the PCM path ([rate, channels,
    bit_depth=4, duration, rms, peak, zcr, dc])."""
    import numpy as np

    rate, samples = decode_adpcm_wav(bytes(payload))
    x = np.asarray(samples, dtype=np.float64) / 32768.0
    n = len(x)
    if n == 0:
        rms = peak = zcr = dc = 0.0
    else:
        rms = float(np.sqrt(np.mean(x * x)))
        peak = float(np.max(np.abs(x)))
        dc = float(np.mean(x))
        zcr = (
            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            if n > 1
            else 0.0
        )
    return [float(rate), 1.0, 4.0, n / rate, rms, peak, zcr, dc]


def adpcm_audio_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=REAL IMA-ADPCM WAV, media_type,
    n_bytes). Each doc owns an id-seeded sine (rate, frequency,
    amplitude, length vary) — smooth signals the 4-bit coder tracks
    closely, so tests can bound reconstruction error."""

    def adpcm_doc(d: int) -> bytes:
        import math

        rate = (8000, 16000, 22050)[d % 3]
        freq = 110.0 * ((d % 5) + 1)
        amp = ((d % 4) + 1) * 6000
        n = 512 + (d % 3) * 256
        samples = [
            int(amp * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)
        ]
        return encode_adpcm_wav(rate, samples)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [adpcm_doc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": ADPCM_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


# --------------------------------------------------------------------------
# AVI/MJPEG codec slot: REAL video FRAME decode (RIFF walk + baseline JPEG)
# --------------------------------------------------------------------------
# Motion-JPEG in an AVI container is a genuine video format (cameras,
# capture cards, scientific imaging): every frame is an independent
# baseline JPEG inside a RIFF '00dc' chunk — no inter-frame prediction.
# That makes it the one video format whose FRAMES this engine can really
# decode: the RIFF walk is the same struct-level parsing as WAV/ADPCM,
# and each frame feeds the existing huffman+IDCT baseline-JPEG decoder.
# Inter-predicted codecs (H.264/VP9/AV1) remain the honestly-gated slot.

AVI_MEDIA_TYPE = "video/x-msvideo"


def _riff_chunks(b: bytes, start: int, end: int):
    """Iterate (fourcc, payload_start, payload_len) over a RIFF chunk
    sequence; word-aligned like WAV."""
    pos = start
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        ln = struct.unpack_from("<I", b, pos + 4)[0]
        yield cid, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def encode_avi_mjpeg(
    width: int,
    height: int,
    frames: "list[list[list[tuple[int, int, int]]]]",
    fps: int = 10,
) -> bytes:
    """Minimal valid AVI/MJPEG: RIFF('AVI ') → LIST hdrl (avih + LIST
    strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) → LIST movi with
    one '00dc' baseline-JPEG chunk per frame."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    jpegs = [encode_baseline_jpeg(f) for f in frames]
    n = len(jpegs)
    max_bytes = max((len(j) for j in jpegs), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        max_bytes * fps,  # max bytes per sec
        0, 0x10, n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes):
    """REAL video frame decode: RIFF walk → '00dc' MJPEG chunks → the
    baseline-JPEG huffman+IDCT decoder per frame. Returns
    (width, height, fps, frames) with frames as top-down RGB rows."""
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    fps = None
    frames = []
    width = height = None

    def walk(start: int, end: int) -> None:
        nonlocal fps, width, height
        for cid, off, ln in _riff_chunks(b, start, end):
            if cid == b"LIST":
                walk(off + 4, off + ln)
            elif cid == b"avih" and ln >= 4:
                us = struct.unpack_from("<I", b, off)[0]
                fps = round(1_000_000 / us) if us else None
            elif cid == b"00dc":
                w, h, rows = decode_jpeg_baseline(b[off : off + ln])
                if width is None:
                    width, height = w, h
                elif (w, h) != (width, height):
                    raise ValueError("AVI: frame dimensions change mid-stream")
                frames.append(rows)

    walk(12, len(b))
    if not frames:
        raise ValueError("AVI: no MJPEG frames")
    return width, height, fps, frames


def mjpeg_video_features(payload: bytes) -> list[float]:
    """REAL per-frame decode features: [width, height, fps, n_frames,
    duration_sec, mean_luma_first, mean_luma_last, temporal_motion] —
    temporal_motion = mean |luma(t) - luma(t-1)| across consecutive
    frames (the scene-change / static-clip curation signal that needs
    actual pixels)."""
    w, h, fps, frames = decode_avi_mjpeg(bytes(payload))
    n = w * h

    def luma_plane(rows):
        return [
            (299 * p[0] + 587 * p[1] + 114 * p[2]) / 1000.0
            for row in rows
            for p in row
        ]

    planes = [luma_plane(f) for f in frames]
    mean_first = sum(planes[0]) / n
    mean_last = sum(planes[-1]) / n
    if len(planes) > 1:
        motion = sum(
            sum(abs(a - c) for a, c in zip(p1, p0)) / n
            for p0, p1 in zip(planes, planes[1:])
        ) / (len(planes) - 1)
    else:
        motion = 0.0
    return [
        float(w),
        float(h),
        float(fps or 0),
        float(len(frames)),
        len(frames) / fps if fps else 0.0,
        mean_first,
        mean_last,
        motion,
    ]


def mjpeg_video_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=REAL AVI/MJPEG bytes, media_type,
    n_bytes). Each doc owns a 4-frame clip of its id-seeded raster
    ROTATED one row per frame — deterministic motion every fixture clip
    exhibits, so the temporal-diff feature is exercised by real pixel
    change."""

    def avi_doc(d: int) -> bytes:
        base = _doc_pixels(d)
        frames = [base[i:] + base[:i] for i in range(4)]
        return encode_avi_mjpeg(IMG_W, IMG_H, frames, fps=10)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [avi_doc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": AVI_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


# --------------------------------------------------------------------------
# MP4 codec slot (stdlib box walk): ISO-BMFF container metadata, no decode
# --------------------------------------------------------------------------
# The video column of a multimodal corpus. Frame decode needs ffmpeg, but
# the MP4 container is a length-prefixed box tree ([size:4][type:4] big-
# endian, children nested in the payload): walking ftyp → moov → mvhd/trak
# yields duration, timescale, track count and per-track dimensions from
# header bytes alone — the metadata a curation pass filters on
# (length/resolution/track-shape gates) without touching a single frame.

MP4_MEDIA_TYPE = "video/mp4"


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) for the sibling boxes
    in b[start:end]. size==1 (64-bit largesize) and size==0 (to-end) per
    ISO/IEC 14496-12 §4.2."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(b[i : i + 4], "big")
        btype = b[i + 4 : i + 8]
        payload = i + 8
        if size == 1:
            if i + 16 > end:
                raise ValueError(f"truncated largesize box at {i}")
            size = int.from_bytes(b[i + 8 : i + 16], "big")
            payload = i + 16
        elif size == 0:
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError(f"bad box size {size} at {i}")
        yield btype, payload, i + size
        i += size


def mp4_metadata(payload: bytes) -> dict:
    """REAL parse: ISO-BMFF box walk → container metadata — major brand
    (ftyp), movie timescale/duration (mvhd, both version 0 and 1),
    track count, and the first video-track width/height (tkhd, 16.16
    fixed point). Raises ValueError on non-MP4 or truncated input."""
    b = bytes(payload)
    brand = None
    timescale = duration = None
    n_tracks = 0
    width = height = 0.0
    found_moov = False
    for btype, s, e in _walk_boxes(b, 0, len(b)):
        if btype == b"ftyp":
            brand = b[s : s + 4].decode("latin-1")
        elif btype == b"moov":
            found_moov = True
            for ctype, cs, ce in _walk_boxes(b, s, e):
                if ctype == b"mvhd":
                    ver = b[cs]
                    if ver == 1:  # 64-bit times
                        timescale = int.from_bytes(b[cs + 20 : cs + 24], "big")
                        duration = int.from_bytes(b[cs + 24 : cs + 32], "big")
                    else:
                        timescale = int.from_bytes(b[cs + 12 : cs + 16], "big")
                        duration = int.from_bytes(b[cs + 16 : cs + 20], "big")
                elif ctype == b"trak":
                    n_tracks += 1
                    for t2, ts_, te in _walk_boxes(b, cs, ce):
                        if t2 == b"tkhd":
                            ver = b[ts_]
                            off = ts_ + (96 if ver == 1 else 84)
                            w = int.from_bytes(b[off - 8 : off - 4], "big") / 65536.0
                            h = int.from_bytes(b[off - 4 : off], "big") / 65536.0
                            if width == 0.0 and w > 0:
                                width, height = w, h
    if brand is None or not found_moov or timescale in (None, 0):
        raise ValueError("not an MP4: missing ftyp/moov/mvhd")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_sec": duration / timescale,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


def mp4_features(payload: bytes) -> list[float]:
    """MP4 container metadata as the standard 8-dim feature vector:
    [duration_sec, timescale, n_tracks, width, height, has_video,
    n_bytes, brand_is_isom]."""
    m = mp4_metadata(payload)
    return [
        m["duration_sec"],
        float(m["timescale"]),
        float(m["n_tracks"]),
        m["width"],
        m["height"],
        1.0 if m["width"] > 0 else 0.0,
        float(len(bytes(payload))),
        1.0 if m["brand"] == "isom" else 0.0,
    ]


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + btype + payload


def encode_mp4_header(
    duration_sec: float,
    timescale: int = 1000,
    video_size: tuple | None = (640, 480),
    n_audio_tracks: int = 0,
) -> bytes:
    """Structurally-valid ISO-BMFF box tree (ftyp + moov[mvhd + trak...]
    + empty mdat) for fixture generation. Sample tables are absent — any
    standards-compliant *container metadata* reader parses everything
    here; only a frame decoder would notice."""
    dur = int(round(duration_sec * timescale))
    mvhd = bytes(4) + bytes(8) + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big") + bytes(80)
    boxes = [_mp4_box(b"mvhd", mvhd)]

    def tkhd(w: int, h: int) -> bytes:
        # version0 tkhd: 84-byte payload, width/height 16.16 at the end
        body = bytearray(84)
        body[76:80] = (w << 16).to_bytes(4, "big")
        body[80:84] = (h << 16).to_bytes(4, "big")
        return _mp4_box(b"trak", _mp4_box(b"tkhd", bytes(body)))

    if video_size is not None:
        boxes.append(tkhd(*video_size))
    for _ in range(n_audio_tracks):
        boxes.append(tkhd(0, 0))
    return (
        _mp4_box(b"ftyp", b"isom" + bytes(4) + b"isommp42")
        + _mp4_box(b"moov", b"".join(boxes))
        + _mp4_box(b"mdat", b"")
    )


def mp4_video_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=MP4 box tree, media_type, n_bytes).
    Distributed builder: id-seeded duration/timescale/resolution/track
    census so the parser's whole surface is covered by fixtures whose
    expected metadata tests compute independently."""

    def mp4_doc(d: int) -> bytes:
        return encode_mp4_header(
            duration_sec=(d % 30) + 1.5,
            timescale=(1000, 600, 90000)[d % 3],
            video_size=None if d % 7 == 0 else ((d % 16) * 80 + 160, (d % 9) * 60 + 120),
            n_audio_tracks=d % 2,
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [mp4_doc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": MP4_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


# --------------------------------------------------------------------------
# GIF codec slot (stdlib): palette build + LZW + interlace, full decode
# --------------------------------------------------------------------------
# The fourth REAL raster codec (after BMP/PNG/baseline-JPEG): GIF89a with
# a genuine variable-width LZW coder (LSB-first bit packing, CLEAR/EOI
# codes, 12-bit dictionary cap, the decoder-side KwKwK special case) and
# both scanline orders (sequential + 4-pass interlace). Palette-indexed
# like real icon GIFs; the encoder builds an exact palette from the
# image's distinct colors (8x8 fixtures have ≤64), so decode is
# bit-exact against the source raster.

GIF_MEDIA_TYPE = "image/gif"
_GIF_MAX_CODE_SIZE = 12
_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(h: int) -> list[int]:
    order: list[int] = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def _gif_lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF LZW: variable-width codes, LSB-first packing. The encoder's
    width bump lags the decoder's by one dictionary entry (the decoder
    reconstructs each entry one code later than the encoder adds it)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    cs = min_code_size + 1
    out: list[tuple[int, int]] = [(clear, cs)]
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        out.append((table[w], cs))
        if next_code < (1 << _GIF_MAX_CODE_SIZE):
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << cs) + 1 and cs < _GIF_MAX_CODE_SIZE:
                cs += 1
        w = (k,)
    if w:
        out.append((table[w], cs))
    out.append((eoi, cs))

    buf = bytearray()
    acc = nbits = 0
    for code, width in out:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("GIF: LZW stream truncated")
        v = 0
        for i in range(width):
            if data[(pos + i) >> 3] >> ((pos + i) & 7) & 1:
                v |= 1 << i
        pos += width
        return v

    out: list[int] = []
    table: dict[int, tuple[int, ...]] | None = None
    cs = min_code_size + 1
    next_code = eoi + 1
    prev: int | None = None
    while len(out) < n_pixels:
        code = read(cs)
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            cs = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if table is None:
            raise ValueError("GIF: code before CLEAR")
        if prev is None:
            if code >= clear:
                raise ValueError("GIF: bad first code")
            out.extend(table[code])
            prev = code
            continue
        if code in table:
            entry = table[code]
        elif code == next_code:  # KwKwK
            entry = table[prev] + (table[prev][0],)
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out.extend(entry)
        if next_code < (1 << _GIF_MAX_CODE_SIZE):
            table[next_code] = table[prev] + (entry[0],)
            next_code += 1
            if next_code == (1 << cs) and cs < _GIF_MAX_CODE_SIZE:
                cs += 1
        prev = code
    if len(out) < n_pixels:
        raise ValueError("GIF: LZW stream ended early")
    return out[:n_pixels]


def encode_gif(
    width: int,
    height: int,
    rgb_rows: list[list[tuple[int, int, int]]],
    interlace: bool = False,
) -> bytes:
    """Encode an RGB raster as a palette-exact GIF89a (≤256 distinct
    colors; deterministic sorted palette, power-of-two global color
    table, optional 4-pass interlace)."""
    palette = sorted({px for row in rgb_rows for px in row})
    if len(palette) > 256:
        raise ValueError("GIF: more than 256 distinct colors")
    idx = {c: i for i, c in enumerate(palette)}
    gct_bits = 1
    while (1 << gct_bits) < len(palette):
        gct_bits += 1
    gct_size = 1 << gct_bits

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | (7 << 4) | (gct_bits - 1))
    out += b"\x00\x00"  # background index, aspect ratio
    for c in palette:
        out += bytes(c)
    out += b"\x00\x00\x00" * (gct_size - len(palette))

    out.append(0x2C)
    out += struct.pack("<HHHH", 0, 0, width, height)
    out.append(0x40 if interlace else 0x00)

    rows = (
        [rgb_rows[y] for y in _gif_interlace_order(height)]
        if interlace
        else rgb_rows
    )
    indices = [idx[px] for row in rows for px in row]
    mcs = max(2, gct_bits)
    out.append(mcs)
    comp = _gif_lzw_encode(indices, mcs)
    for i in range(0, len(comp), 255):
        block = comp[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """REAL GIF decode: header + screen/image descriptors, global and
    local color tables, extension skip, LZW decompress, de-interlace.
    Returns (width, height, top-down RGB rows) of the first image."""
    try:
        return _decode_gif_inner(bytes(payload))
    except (IndexError, struct.error) as exc:  # ran off the byte stream
        raise ValueError("GIF: truncated payload") from exc


def _decode_gif_inner(b: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = b[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:  # extension: label byte + data sub-blocks
            pos += 1
            while b[pos]:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        _, _, w, h = struct.unpack_from("<HHHH", b, pos)
        pos += 8
        iflags = b[pos]
        pos += 1
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: no color table")
        mcs = b[pos]
        pos += 1
        comp = bytearray()
        while b[pos]:
            ln = b[pos]
            comp += b[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = _gif_lzw_decode(bytes(comp), mcs, w * h)
        rows = [[pal[indices[y * w + x]] for x in range(w)] for y in range(h)]
        if iflags & 0x40:
            deinterlaced: list = [None] * h
            for dst, src_row in zip(_gif_interlace_order(h), rows):
                deinterlaced[dst] = src_row
            rows = deinterlaced
        return w, h, rows
    raise ValueError("GIF: no image data")


def gif_pixel_features(payload: bytes) -> list[float]:
    """REAL decode: GIF LZW decompress → pixel statistics, same vector
    as the BMP/PNG/JPEG paths."""
    return _pixel_stats(*decode_gif(bytes(payload)))


def gif_image_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=REAL GIF bytes, media_type, n_bytes).
    Same id-seeded raster as the BMP/PNG/JPEG fixtures; odd docs are
    interlaced so both scanline orders are exercised end-to-end."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                encode_gif(IMG_W, IMG_H, _doc_pixels(d), interlace=bool(d % 2))
                for d in (int(x) for x in pdf["doc_id"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": GIF_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


# --------------------------------------------------------------------------
# Decode / feature-extraction plumbing (Pandas-UDF over mapInPandas)
# --------------------------------------------------------------------------

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a media decoder: fixed-dim features
    from byte statistics. Replace with PIL/librosa/ffmpeg in production."""
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 256),
        float(min(payload)),
        float(max(payload)),
        float(len(set(payload))),
        float(sum(payload) / n),
    ]


def _pixel_stats(w: int, h: int, rows) -> list[float]:
    """Pixel statistics from decoded top-down rows — [width, height,
    mean_r, mean_g, mean_b, min_luma, max_luma, mean_luma] (luma = the
    BT.601 integer approximation (299R+587G+114B)/1000). RGBA rows use
    the color channels; alpha doesn't enter the stats."""
    n = w * h
    sr = sg = sb = sl = 0
    lmin, lmax = 255000, 0
    for row in rows:
        for px in row:
            r, g, b = px[0], px[1], px[2]
            sr += r
            sg += g
            sb += b
            luma = 299 * r + 587 * g + 114 * b
            sl += luma
            lmin = min(lmin, luma)
            lmax = max(lmax, luma)
    return [
        float(w),
        float(h),
        sr / n,
        sg / n,
        sb / n,
        lmin / 1000.0,
        lmax / 1000.0,
        sl / n / 1000.0,
    ]


def _image_features(payload: bytes) -> list[float]:
    """REAL decode: stdlib BMP parse → pixel statistics."""
    return _pixel_stats(*decode_bmp(bytes(payload)))


def _png_features(payload: bytes) -> list[float]:
    """REAL decode: stdlib PNG parse (zlib inflate + unfilter) → pixel
    statistics, same vector as the BMP path."""
    return _pixel_stats(*decode_png(bytes(payload)))


_DECODERS = {
    "fake": _fake_decode,
    "image": _image_features,
    "png": _png_features,
    "svg": svg_features,
    "jpeg": jpeg_features,  # header metadata (cheap path; any SOFn)
    "jpeg_pixels": jpeg_pixel_features,  # REAL baseline huffman+IDCT decode
    "wav": wav_features,  # REAL PCM decode (stdlib wave)
    "mp4": mp4_features,  # container metadata only — frame decode is gated
    "gif": gif_pixel_features,  # REAL LZW decode (stdlib, incl. interlace)
    "adpcm": adpcm_features,  # REAL compressed-audio decode (IMA-ADPCM 4:1)
    "mjpeg": mjpeg_video_features,  # REAL video FRAME decode (AVI/MJPEG)
}


def extract_features(
    binary_df: DataFrame, decoder: str = "fake", batch_hint: int | None = None
) -> DataFrame:
    """Decode + feature-extract each payload via ``mapInPandas``.

    ``decoder='image'`` (BMP), ``decoder='png'``, and
    ``decoder='jpeg_pixels'`` (baseline-sequential huffman+IDCT) REALLY
    decode and compute features from pixels; ``decoder='svg'`` REALLY
    parses (stdlib XML) and ``decoder='jpeg'`` REALLY parses the SOF
    marker stream — both extract structural metadata, not pixels;
    ``decoder='wav'`` REALLY decodes PCM (stdlib wave) and computes
    signal features from samples; ``decoder='fake'`` uses deterministic
    byte-stat features for opaque payloads. Compressed audio and video
    frames plug into the same slot but need external libraries.

    Arrow moves whole batches across the JVM↔Python boundary; the
    operator preserves partitioning (no shuffle) so at scale it is an
    embarrassingly-parallel map over executors. (A ``mapInArrow``
    variant — RecordBatches without the pandas materialization — was
    A/B'd at sf0.1 and is within noise: the per-payload decode
    dominates, so the simpler pandas surface stays.)
    """
    if decoder in ("audio_compressed", "video_frames"):
        raise NotImplementedError(
            f"{decoder} decoding requires ffmpeg/librosa — not available "
            "in this container; 'image' (BMP), 'png', 'gif', 'jpeg_pixels' "
            "(baseline decode), 'svg', 'jpeg' (header metadata), 'wav' "
            "(PCM), 'adpcm' (IMA-ADPCM compressed audio), 'mp4' (container "
            "metadata), and 'fake' are built in — perceptual codecs "
            "(MP3/AAC/Opus) and video frame decode remain gated"
        )
    if decoder not in _DECODERS:
        raise ValueError(f"unknown decoder {decoder!r}")
    decode = _DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": [decode(bytes(p)) for p in pdf["payload"]],
                }
            )

    return binary_df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(
    binary_df: DataFrame, every_n_bytes: int = 64, max_frames: int = 4
) -> DataFrame:
    """"Frame sampling" over opaque payloads: slice each payload at a
    fixed byte stride (the video-frame-sampling plumbing, with byte
    slices standing in for decoded frames). Pure built-ins: sequence +
    transform + posexplode, no Python."""
    offsets = F.sequence(
        F.lit(1),
        F.least(F.length("payload"), F.lit(every_n_bytes * max_frames)),
        F.lit(every_n_bytes),
    )
    frames = F.transform(offsets, lambda o: F.col("payload").substr(o, F.lit(every_n_bytes)))
    return binary_df.select(
        "doc_id", F.posexplode(frames).alias("frame_idx", "frame_bytes")
    )


@_register("mm_feature_extract", None)  # rows-only: Pandas-UDF features not SQL-expressible
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: binary column → mapInPandas
    decode (deterministic fake) → fixed-dim feature vectors."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(binary_table(d))
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.round(F.element_at("features", 8), 6).alias("mean_byte"),
        F.element_at("features", 7).alias("n_distinct_bytes"),
    )


@_register("mm_image_features", None)  # rows-only: pixel decode not SQL-expressible
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image pipeline: per-doc BMP payloads (distributed encode) →
    stdlib BMP decode → pixel-statistic features. The decode is genuine
    byte-level parsing, not a stand-in; tests pin exact pixel stats."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(image_table(d), decoder="image")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 1).alias("width"),
        F.element_at("features", 2).alias("height"),
        F.round(F.element_at("features", 3), 6).alias("mean_r"),
        F.round(F.element_at("features", 8), 6).alias("mean_luma"),
    )


@_register("mm_png_features", None)  # rows-only: pixel decode not SQL-expressible
def mm_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG pipeline: per-doc PNG payloads (distributed encode:
    RGB + RGBA, every scanline filter exercised) → stdlib zlib-inflate +
    unfilter decode → pixel-statistic features. The real-world analog of
    the reference's base64-PNG catalog icons (main.go:305-316)."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(png_image_table(d), decoder="png")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 1).alias("width"),
        F.element_at("features", 2).alias("height"),
        F.round(F.element_at("features", 3), 6).alias("mean_r"),
        F.round(F.element_at("features", 8), 6).alias("mean_luma"),
    )


@_register("mm_svg_features", None)  # rows-only: XML parse not SQL-expressible
def mm_svg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL SVG pipeline: per-doc SVG payloads (distributed encode) →
    stdlib XML parse → structural metadata features (declared size,
    viewBox, element census, nesting depth). The vector-format half of
    the reference's icon surface (main.go:305-316), where no pixel
    decode exists by construction."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(svg_icon_table(d), decoder="svg")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 1).alias("width"),
        F.element_at("features", 2).alias("height"),
        F.element_at("features", 5).alias("n_elements"),
        F.element_at("features", 6).alias("n_paths"),
        F.element_at("features", 7).alias("max_depth"),
        F.element_at("features", 8).alias("has_title"),
    )


@_register("mm_jpeg_features", None)  # rows-only: marker scan not SQL-expressible
def mm_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG pipeline: per-doc JPEG marker streams (distributed
    encode) → stdlib SOF-marker scan → frame-header metadata (width,
    height, components, precision, progressive). The image/jpeg half of
    the reference's icon surface (main.go:305-316) — resolution/mode
    filtering without an entropy decoder, reading only header bytes."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(jpeg_icon_table(d), decoder="jpeg")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 1).alias("width"),
        F.element_at("features", 2).alias("height"),
        F.element_at("features", 3).alias("n_components"),
        F.element_at("features", 4).alias("precision"),
        F.element_at("features", 5).alias("progressive"),
    )


def jpeg_pixel_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=REAL baseline-JPEG bytes, media_type,
    n_bytes). Distributed encode (mapInPandas), same id-seeded raster as
    the BMP/PNG fixtures so per-doc pixel stats are independently
    computable; doc_id rotates the encoder surface: 4:4:4, 4:2:0, and
    grayscale scans."""

    def jpeg_doc(d: int) -> bytes:
        px = _doc_pixels(d)
        if d % 3 == 0:
            return encode_baseline_jpeg(px)
        if d % 3 == 1:
            return encode_baseline_jpeg(px, subsample_420=True)
        return encode_baseline_jpeg(px, grayscale=True)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [jpeg_doc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": JPEG_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


@_register("mm_jpeg_pixels", None)  # rows-only: pixel decode not SQL-expressible
def mm_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG PIXEL pipeline (the formerly library-gated slot): per-doc
    baseline-JPEG payloads with true entropy-coded scans (distributed
    encode) → huffman+dequant+IDCT decode → pixel-statistic features,
    same vector as the BMP/PNG paths. Closes the image half of the
    reference's icon mediatypes (main.go:314-315) with zero external
    libraries; compressed audio / video frames remain the only gated
    slots."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(jpeg_pixel_table(d), decoder="jpeg_pixels")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 1).alias("width"),
        F.element_at("features", 2).alias("height"),
        F.round(F.element_at("features", 3), 6).alias("mean_r"),
        F.round(F.element_at("features", 8), 6).alias("mean_luma"),
    )


@_register("mm_gif_features", None)  # rows-only: LZW decode not SQL-expressible
def mm_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF pipeline: per-doc palette-exact GIF payloads (distributed
    encode; odd docs interlaced) → stdlib LZW decode (variable-width
    codes, KwKwK case, de-interlace) → pixel-statistic features, same
    vector as the BMP/PNG/JPEG paths. The fourth raster format of the
    reference's format-agnostic icon surface (main.go:305-316)."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(gif_image_table(d), decoder="gif")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 1).alias("width"),
        F.element_at("features", 2).alias("height"),
        F.round(F.element_at("features", 3), 6).alias("mean_r"),
        F.round(F.element_at("features", 8), 6).alias("mean_luma"),
    )


@_register("mm_wav_features", None)  # rows-only: PCM decode not SQL-expressible
def mm_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio pipeline: per-doc PCM WAV payloads (distributed
    encode) → stdlib wave decode → signal features (RMS, peak, zero-
    crossing rate, DC offset) from actual samples. The audio column of
    the multimodal tier, with the decode the stdlib genuinely provides."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(wav_audio_table(d), decoder="wav")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 1).alias("sample_rate"),
        F.element_at("features", 2).alias("n_channels"),
        F.element_at("features", 4).alias("duration_sec"),
        F.round(F.element_at("features", 5), 9).alias("rms"),
        F.round(F.element_at("features", 7), 9).alias("zero_crossing_rate"),
    )


@_register("mm_adpcm_features", None)  # rows-only: bitstream decode not SQL-expressible
def mm_adpcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-audio pipeline (the formerly library-gated slot):
    per-doc IMA-ADPCM WAV payloads (distributed 4-bit adaptive
    differential encode) → full bitstream decode (per-block predictor
    reseed + step-index state machine) → signal features from the
    reconstructed samples. Perceptual codecs (MP3/AAC) stay gated; the
    compressed-format plumbing itself is now real end-to-end."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(adpcm_audio_table(d), decoder="adpcm")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 1).alias("sample_rate"),
        F.element_at("features", 4).alias("duration_sec"),
        F.round(F.element_at("features", 5), 9).alias("rms"),
        F.round(F.element_at("features", 7), 9).alias("zero_crossing_rate"),
    )


@_register("mm_mjpeg_video_features", None)  # rows-only: frame decode not SQL-expressible
def mm_mjpeg_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video FRAME pipeline (the formerly library-gated slot): per-
    doc AVI/MJPEG clips (distributed encode, 4 rotating frames) → RIFF
    walk + per-frame baseline-JPEG huffman+IDCT decode → clip features
    including the temporal-motion signal only actual pixels can give.
    Inter-predicted codecs (H.264/VP9) remain the gated slot; the video
    column's decode plumbing itself is now real end-to-end."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(mjpeg_video_table(d), decoder="mjpeg")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 1).alias("width"),
        F.element_at("features", 4).alias("n_frames"),
        F.element_at("features", 5).alias("duration_sec"),
        F.round(F.element_at("features", 6), 6).alias("mean_luma_first"),
        F.round(F.element_at("features", 8), 6).alias("temporal_motion"),
    )


@_register("mm_mp4_features", None)  # rows-only: box walk not SQL-expressible
def mm_mp4_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container pipeline: per-doc MP4 box trees (distributed
    encode) → stdlib ISO-BMFF walk → container metadata (duration,
    timescale, tracks, resolution). The video column's curation-pass
    filter surface — length/resolution gates — without a frame decoder."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(mp4_video_table(d), decoder="mp4")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("duration_sec"),
        F.element_at("features", 2).alias("timescale"),
        F.element_at("features", 3).alias("n_tracks"),
        F.element_at("features", 4).alias("width"),
        F.element_at("features", 5).alias("height"),
        F.element_at("features", 6).alias("has_video"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("out_bytes", T.IntegerType()),
    ]
)


def _nn_resample(rows, w: int, h: int, out_w: int, out_h: int):
    return [
        [rows[(y * h) // out_h][(x * w) // out_w] for x in range(out_w)]
        for y in range(out_h)
    ]


def resize_bmp(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL thumbnail: decode, nearest-neighbor resample to (out_w,
    out_h), re-encode — all stdlib."""
    w, h, rows = decode_bmp(bytes(payload))
    return encode_bmp(out_w, out_h, _nn_resample(rows, w, h, out_w, out_h))


def resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """PNG thumbnail: decode (inflate+unfilter), nearest-neighbor
    resample, re-encode (filter 0) — all stdlib. RGBA stays RGBA."""
    w, h, rows = decode_png(bytes(payload))
    return encode_png(out_w, out_h, _nn_resample(rows, w, h, out_w, out_h))


def resize_jpeg(payload: bytes, out_w: int, out_h: int) -> bytes:
    """JPEG thumbnail: baseline decode (huffman+IDCT), nearest-neighbor
    resample, baseline re-encode (unit quant, 4:4:4) — stdlib + numpy."""
    w, h, rows = decode_jpeg_baseline(bytes(payload))
    return encode_baseline_jpeg(_nn_resample(rows, w, h, out_w, out_h))


def resize_gif(payload: bytes, out_w: int, out_h: int) -> bytes:
    """GIF thumbnail: LZW decode, nearest-neighbor resample, re-encode
    (sequential scan order) — all stdlib."""
    w, h, rows = decode_gif(bytes(payload))
    return encode_gif(out_w, out_h, _nn_resample(rows, w, h, out_w, out_h))


def resize_payload(
    binary_df: DataFrame,
    target_bytes: int = 64,
    resizer: str = "fake",
    target_width: int = 4,
    target_height: int = 4,
) -> DataFrame:
    """Resize (image thumbnail / audio downsample slot).

    ``resizer='image'`` (BMP), ``resizer='png'``, and ``resizer='jpeg'``
    (baseline decode/re-encode) REALLY resize: decode → nearest-neighbor
    resample to (target_width, target_height) → re-encode.
    ``resizer='fake'`` strides raw bytes down to ``target_bytes`` for
    opaque non-image payloads. All run in the same mapInPandas batch
    loop (one Arrow crossing per batch, no shuffle).
    """
    if resizer in ("audio", "video"):
        raise NotImplementedError(
            f"{resizer} resizing requires ffmpeg — not available in this "
            "container; 'image' (BMP), 'png', 'jpeg', and 'fake' are built in"
        )
    if resizer not in ("fake", "image", "png", "jpeg", "gif"):
        raise ValueError(f"unknown resizer {resizer!r}")

    def one(raw: bytes) -> bytes:
        if resizer == "image":
            return resize_bmp(raw, target_width, target_height)
        if resizer == "png":
            return resize_png(raw, target_width, target_height)
        if resizer == "jpeg":
            return resize_jpeg(raw, target_width, target_height)
        if resizer == "gif":
            return resize_gif(raw, target_width, target_height)
        if len(raw) <= target_bytes:
            return raw
        step = -(-len(raw) // target_bytes)  # ceil div
        return raw[::step][:target_bytes]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [one(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "resized": out,
                    "out_bytes": [len(r) for r in out],
                }
            )

    return binary_df.mapInPandas(batches, RESIZED_SCHEMA)


# --------------------------------------------------------------------------
# Perceptual hash (pHash) — near-duplicate image fingerprinting
# --------------------------------------------------------------------------

PHASH_GRID = 32  # luma raster is resampled to this square before the DCT


def phash64(rgb_rows: list) -> int:
    """64-bit perceptual hash of an RGB raster (pHash): Rec.601 luma →
    nearest-neighbor resample to PHASH_GRID² → orthonormal 2-D DCT-II →
    the 8x8 low-frequency block minus its DC term → one bit per
    coefficient, set iff above the block median.

    Dropping the DC coefficient makes the hash EXACTLY invariant to
    any uniform brightness shift that doesn't clip (a constant offset
    lives entirely in DC), and the median threshold makes it invariant
    to contrast scaling — the two transformations that defeat
    byte-exact dedup. Pure numpy; deterministic."""
    import numpy as np

    a = np.asarray(rgb_rows, dtype=np.float64)
    gray = a @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    yi = (np.arange(PHASH_GRID) * h) // PHASH_GRID
    xi = (np.arange(PHASH_GRID) * w) // PHASH_GRID
    g = gray[np.ix_(yi, xi)]
    n = PHASH_GRID
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    basis *= np.sqrt(2.0 / n)
    basis[0, :] *= 1.0 / np.sqrt(2.0)
    d = basis @ g @ basis.T
    vals = d[:8, :8].flatten()[1:]  # 63 AC coefficients
    med = float(np.median(vals))
    out = 0
    for i, v in enumerate(vals):
        if v > med:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


@_register("mm_image_phash", None)  # rows-only: pixel decode not SQL-expressible
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash fingerprints for the corpus image payloads: the
    near-duplicate detector byte-exact dedup cannot be (re-encoded,
    brightness-shifted, contrast-stretched copies collide on pHash but
    not on sha2). Decode + hash run in one mapInPandas pass; the
    64-bit hash lands in a plain bigint column, so downstream grouping
    or banded hamming-join is ordinary relational work.

    Laws (tests/test_llmops_unit.py): determinism; EXACT invariance
    to unclipped brightness shifts; pinned hamming separation between
    distinct fixture images."""
    d = load_table(spark, sf_dir, "documents")
    imgs = image_table(d)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for payload in pdf["payload"]:
                _, _, rows = decode_bmp(bytes(payload))
                hashes.append(phash64(rows))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": pd.array(hashes, dtype="int64"),
                    "n_bytes": pdf["n_bytes"],
                }
            )

    return imgs.mapInPandas(
        batches, "doc_id long, phash long, n_bytes int"
    ).orderBy("doc_id")


PHASH_BANDS = 8  # 8 bands x 8 bits: pigeonhole-EXACT for hamming <= 7
PHASH_MAX_HAMMING = 6


def phash_near_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = PHASH_MAX_HAMMING,
) -> DataFrame:
    """Near-duplicate pairs by banded hamming join over 64-bit pHashes.

    Each hash splits into PHASH_BANDS byte-bands; candidate pairs must
    share at least one (band index, band value) bucket, then verify
    with bit_count(xor). With 8 bands, any pair within hamming 7 has
    ≤7 differing bits spread over 8 bands, so at least one band
    matches exactly — the banding is EXACT (zero missed pairs) for
    every threshold ≤ 7, not probabilistic (law-pinned vs the
    brute-force join). Scale: candidates arise only where byte-bands
    collide — never an all-pairs product; verification is two JVM
    bit ops per candidate."""
    band_idx = F.sequence(F.lit(0), F.lit(PHASH_BANDS - 1))
    banded = hashes.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(band_idx).alias("_b"),
    ).withColumn("_bv", F.expr("shiftright(_h, _b * 8) & 255"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._b") == F.col("b._b"))
            & (F.col("a._bv") == F.col("b._bv"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._h").alias("h_a"),
            F.col("b._h").alias("h_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


@_register("dedup_image_phash_near", None)  # rows-only: pixel decode not SQL-expressible
def dedup_image_phash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs over the corpus payloads: pHash
    fingerprints (mm_image_phash) through the banded hamming join —
    the X5 counterpart of MinHash-LSH text dedup. The fixture's
    doc_id-derived images are mutually distinct, so an empty result is
    the CORRECT answer here; the operator's recall law (banded ==
    brute force for hamming <= 7) is pinned on planted near-dups in
    tests/test_llmops_unit.py."""
    return phash_near_pairs(mm_image_phash(spark, sf_dir)).orderBy(
        "id_a", "id_b"
    )


# --------------------------------------------------------------------------
# MPEG-1 Layer III (MP3) frame-stream slot: REAL framing, gated decode
# --------------------------------------------------------------------------
# Perceptual DECODE (hybrid filterbank + huffman + psychoacoustics) stays
# honestly library-gated, but MP3 FRAMING is a pure bit-level container
# spec (ISO/IEC 11172-3): an 11-bit sync word, version/layer/bitrate/
# samplerate/padding fields, and a closed-form frame length. Parsing it
# is the same tier the engine already ships for JPEG (SOF metadata) and
# MP4 (box walk) — real structural metadata, not pixels/samples — and is
# what a 100 TB ingest needs first anyway: validate, measure, and
# deduplicate audio BEFORE paying for perceptual decode.

MP3_MEDIA_TYPE = "audio/mpeg"
_MP3_BITRATES_KBPS = (  # MPEG-1 Layer III, index 1..14
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_SAMPLE_RATES = (44100, 48000, 32000)  # index 0..2
_MP3_SAMPLES_PER_FRAME = 1152


def _mp3_frame_len(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Closed-form MPEG-1 Layer III frame length in bytes."""
    return 144_000 * bitrate_kbps // sample_rate + padding


def encode_mp3_stream(
    bitrate_idx: int, rate_idx: int, paddings: list, seed: int
) -> bytes:
    """A VALID CBR MPEG-1 Layer III frame stream: every frame carries a
    spec-correct 4-byte header (sync/version/layer/bitrate/samplerate/
    padding) and deterministic seed-derived main_data filler bytes —
    the frame STRUCTURE is real and any MP3 header scanner agrees on
    frame count, bitrate, and duration; the payload carries no encoded
    audio (perceptual encode is the gated half)."""
    import numpy as np

    out = bytearray()
    kbps = _MP3_BITRATES_KBPS[bitrate_idx]
    rate = _MP3_SAMPLE_RATES[rate_idx]
    for i, pad in enumerate(paddings):
        h0 = 0xFF
        h1 = 0xE0 | (0b11 << 3) | (0b01 << 1) | 0b1  # MPEG-1, Layer III, no CRC
        h2 = (bitrate_idx << 4) | (rate_idx << 2) | (pad << 1)
        h3 = 0b11000100  # single channel, no emphasis bits set meaningfully
        out.extend((h0, h1, h2, h3))
        body = _mp3_frame_len(kbps, rate, pad) - 4
        # vectorized filler (r14 optimization round, guide §4.2): same
        # bytes as the per-byte generator — (seed*2654435761 + i*40503
        # + j) & 0xFF; uint64 wraparound preserves the low 8 bits the
        # mask keeps, so the numpy form is bit-identical at any seed
        out.extend(
            (
                (np.uint64((seed * 2654435761 + i * 40503) & 0xFFFFFFFFFFFFFFFF)
                 + np.arange(body, dtype=np.uint64))
                & np.uint64(0xFF)
            ).astype(np.uint8).tobytes()
        )
    return bytes(out)


def _mp3_skip_id3v2(payload: bytes) -> int:
    """Real MP3 files usually lead with an ID3v2 tag; return the offset
    of the first audio frame (synchsafe 28-bit size per the ID3 spec).
    The footer flag (bit 4 of the flags byte) adds 10 more bytes — an
    ID3v2.4 tag with a footer occupies 10 + size + 10."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = 0
    for b in payload[6:10]:
        size = (size << 7) | (b & 0x7F)
    footer = 10 if payload[5] & 0x10 else 0
    return 10 + size + footer


def mp3_frame_features(payload: bytes) -> list[float]:
    """REAL frame-stream parse: walk every frame header, validate sync/
    version/layer, check CBR consistency, and return
    [version, layer, sample_rate, bitrate_kbps, n_frames, duration_ms,
    n_padded, n_bytes]. Tolerates the standard real-world envelopes —
    a leading ID3v2 tag (incl. the v2.4 footer flag) and a trailing
    128-byte ID3v1 block — and raises ValueError on broken sync or a
    truncated trailing frame: a malformed payload must surface, not
    count as shorter audio."""
    p = bytes(payload)
    pos = _mp3_skip_id3v2(p)
    end = len(p)
    # standard trailing ID3v1 block: exactly 128 bytes starting "TAG"
    if end - pos >= 128 and p[end - 128:end - 125] == b"TAG":
        end -= 128
    n_frames = n_padded = 0
    kbps = rate = None
    while pos < end:
        if pos + 4 > end:
            raise ValueError("truncated MP3 frame header")
        b0, b1, b2 = p[pos], p[pos + 1], p[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"bad MP3 sync at byte {pos}")
        if (b1 >> 3) & 0b11 != 0b11 or (b1 >> 1) & 0b11 != 0b01:
            raise ValueError("only MPEG-1 Layer III streams supported")
        bidx, ridx, pad = b2 >> 4, (b2 >> 2) & 0b11, (b2 >> 1) & 1
        if not 1 <= bidx <= 14 or ridx > 2:
            raise ValueError("reserved bitrate/samplerate index")
        f_kbps, f_rate = _MP3_BITRATES_KBPS[bidx], _MP3_SAMPLE_RATES[ridx]
        if kbps is None:
            kbps, rate = f_kbps, f_rate
        elif (f_kbps, f_rate) != (kbps, rate):
            raise ValueError("VBR stream: frame parameters changed mid-stream")
        flen = _mp3_frame_len(f_kbps, f_rate, pad)
        if pos + flen > end:
            raise ValueError("truncated MP3 frame body")
        n_frames += 1
        n_padded += pad
        pos += flen
    if n_frames == 0:
        raise ValueError("no MP3 frames")
    duration_ms = n_frames * _MP3_SAMPLES_PER_FRAME * 1000.0 / rate
    return [
        1.0,  # MPEG version
        3.0,  # layer
        float(rate),
        float(kbps),
        float(n_frames),
        duration_ms,
        float(n_padded),
        float(len(p)),
    ]


_DECODERS["mp3"] = mp3_frame_features  # framing metadata; perceptual decode stays gated


def mp3_audio_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=REAL MP3 frame stream, media_type,
    n_bytes). Distributed builder, same shape as the other media
    tables: id-seeded bitrate/samplerate/frame-count/padding pattern,
    closed-form per doc so the round-trip law recomputes every parsed
    field independently."""

    def mp3_doc(d: int) -> bytes:
        bidx = 1 + (d % 14)
        ridx = d % 3
        n_frames = 3 + (d % 5)
        paddings = [1 if (d + i) % 3 == 0 else 0 for i in range(n_frames)]
        return encode_mp3_stream(bidx, ridx, paddings, seed=d)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [mp3_doc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": MP3_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


@_register("mm_mp3_features", None)  # rows-only: bit-level framing not SQL-expressible
def mm_mp3_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 frame-stream pipeline: per-doc CBR MPEG-1 Layer III payloads
    (distributed spec-correct framing encode) → full header-walk parse
    (sync validation, CBR consistency, ID3v2 skip) → stream metadata
    (rate, bitrate, frames, duration). The same metadata tier as
    mm_jpeg_features / mm_mp4_features; perceptual sample decode stays
    honestly gated (multimodal.extract_features docstring)."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(mp3_audio_table(d), decoder="mp3")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 3).alias("sample_rate"),
        F.element_at("features", 4).alias("bitrate_kbps"),
        F.element_at("features", 5).alias("n_frames"),
        F.round(F.element_at("features", 6), 6).alias("duration_ms"),
        F.element_at("features", 7).alias("n_padded_frames"),
    )


# --------------------------------------------------------------------------
# AAC/ADTS frame-stream slot: REAL framing, gated decode (MP3's sibling)
# --------------------------------------------------------------------------

AAC_MEDIA_TYPE = "audio/aac"
_ADTS_SAMPLE_RATES = (  # sampling_frequency_index 0..12 (13.7818-7)
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)
_AAC_SAMPLES_PER_FRAME = 1024  # per raw data block (AAC-LC)


def encode_adts_stream(
    rate_idx: int, channels: int, frame_bodies: list, seed: int
) -> bytes:
    """A VALID ADTS (AAC transport) frame stream: each frame carries a
    spec-correct 7-byte header — 12-bit syncword, MPEG-4 AAC-LC
    profile, sampling_frequency_index, channel_configuration, and the
    13-bit aac_frame_length that INCLUDES the header — followed by
    ``frame_bodies[i]`` deterministic filler bytes (the raw_data_block
    slot; perceptual encode is the gated half)."""
    import numpy as np

    out = bytearray()
    for i, body in enumerate(frame_bodies):
        flen = 7 + body
        h = bytearray(7)
        h[0] = 0xFF
        h[1] = 0xF1  # sync 0xFFF | MPEG-4 | layer 00 | no CRC
        h[2] = (0b01 << 6) | (rate_idx << 2) | ((channels >> 2) & 1)
        h[3] = ((channels & 0b11) << 6) | ((flen >> 11) & 0b11)
        h[4] = (flen >> 3) & 0xFF
        h[5] = ((flen & 0b111) << 5) | 0x1F  # buffer fullness high bits
        h[6] = 0xFC  # fullness low | number_of_raw_data_blocks-1 = 0
        out.extend(h)
        # vectorized filler (r14, guide §4.2): bit-identical to the
        # per-byte generator — uint64 wrap preserves the masked low byte
        out.extend(
            (
                (np.uint64((seed * 69069 + i * 97) & 0xFFFFFFFFFFFFFFFF)
                 + np.arange(body, dtype=np.uint64))
                & np.uint64(0xFF)
            ).astype(np.uint8).tobytes()
        )
    return bytes(out)


def adts_frame_features(payload: bytes) -> list[float]:
    """REAL ADTS frame-stream parse: walk every header, validate sync /
    layer / frame-length sanity, check CBR-style parameter consistency,
    and return [mpeg_version(4/2), profile+1, sample_rate, channels,
    n_frames, duration_ms, total_raw_bytes, n_bytes]. Raises
    ValueError on broken sync, reserved indices, or truncation."""
    p = bytes(payload)
    pos, end = 0, len(p)
    n_frames = 0
    raw_bytes = 0
    rate = ch = prof = ver = None
    while pos < end:
        if pos + 7 > end:
            raise ValueError("truncated ADTS header")
        if p[pos] != 0xFF or (p[pos + 1] & 0xF0) != 0xF0:
            raise ValueError(f"bad ADTS sync at byte {pos}")
        if (p[pos + 1] >> 1) & 0b11 != 0:
            raise ValueError("ADTS layer must be 00")
        f_ver = 2 if (p[pos + 1] >> 3) & 1 else 4  # MPEG-2 vs MPEG-4
        f_prof = (p[pos + 2] >> 6) & 0b11
        ridx = (p[pos + 2] >> 2) & 0b1111
        if ridx >= len(_ADTS_SAMPLE_RATES):
            raise ValueError("reserved sampling_frequency_index")
        f_rate = _ADTS_SAMPLE_RATES[ridx]
        f_ch = ((p[pos + 2] & 1) << 2) | ((p[pos + 3] >> 6) & 0b11)
        flen = ((p[pos + 3] & 0b11) << 11) | (p[pos + 4] << 3) | (p[pos + 5] >> 5)
        crc_absent = p[pos + 1] & 1
        hdr = 7 if crc_absent else 9
        if flen < hdr:
            raise ValueError("ADTS frame length smaller than its header")
        if pos + flen > end:
            raise ValueError("truncated ADTS frame body")
        if rate is None:
            ver, prof, rate, ch = f_ver, f_prof, f_rate, f_ch
        elif (f_ver, f_prof, f_rate, f_ch) != (ver, prof, rate, ch):
            raise ValueError("ADTS stream parameters changed mid-stream")
        n_frames += 1
        raw_bytes += flen - hdr
        pos += flen
    if n_frames == 0:
        raise ValueError("no ADTS frames")
    duration_ms = n_frames * _AAC_SAMPLES_PER_FRAME * 1000.0 / rate
    return [
        float(ver),
        float(prof + 1),  # profile is object-type-1 (AAC-LC header = 1 -> 2)
        float(rate),
        float(ch),
        float(n_frames),
        duration_ms,
        float(raw_bytes),
        float(len(p)),
    ]


_DECODERS["aac"] = adts_frame_features  # framing metadata; perceptual decode stays gated


def aac_audio_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=REAL ADTS frame stream, media_type,
    n_bytes). Id-seeded rate/channels/frame-count/body-size pattern,
    closed-form per doc for the round-trip law."""

    def aac_doc(d: int) -> bytes:
        ridx = d % 13
        channels = 1 + (d % 2)
        n_frames = 2 + (d % 6)
        bodies = [32 + ((d + i) % 5) * 17 for i in range(n_frames)]
        return encode_adts_stream(ridx, channels, bodies, seed=d)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [aac_doc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": AAC_MEDIA_TYPE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, payload binary, media_type string, n_bytes int"
    )


@_register("mm_aac_features", None)  # rows-only: bit-level framing not SQL-expressible
def mm_aac_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AAC/ADTS frame-stream pipeline — mm_mp3_features' sibling for
    the other dominant perceptual-audio transport: per-doc spec-correct
    ADTS streams (distributed framing encode) → full header-walk parse
    (sync/layer validation, 13-bit frame-length bounds, parameter-
    consistency guard) → stream metadata. Perceptual AAC sample decode
    stays honestly gated; together with MP3 this completes FRAMING
    coverage of both mainstream compressed-audio envelopes."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(aac_audio_table(d), decoder="aac")
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.element_at("features", 3).alias("sample_rate"),
        F.element_at("features", 4).alias("channels"),
        F.element_at("features", 5).alias("n_frames"),
        F.round(F.element_at("features", 6), 6).alias("duration_ms"),
        F.element_at("features", 7).alias("raw_data_bytes"),
    )
