"""PNG / PPM image IO with dtype conversion — no external dependencies.

Rebuild of ``demo/image_io.h`` (libpng/PPM loaders with dtype conversion,
``demo/image_io.h:1-50``) using Python's stdlib zlib for PNG encode/decode.
Supports 8-bit grayscale/RGB/RGBA PNGs (non-interlaced) and binary PPM/PGM.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def save_png(path: str, image: np.ndarray) -> None:
    """Write HxW (gray) or HxWx{3,4} uint8/float array as PNG.

    Floats are assumed in [0, 1] and quantized to 8-bit, matching the
    reference's float→uint8 conversion on save (``demo/image_io.h``).
    """
    img = np.asarray(image)
    if np.issubdtype(img.dtype, np.floating):
        img = np.clip(img, 0.0, 1.0)
        img = (img * 255.0 + 0.5).astype(np.uint8)
    img = img.astype(np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    raw = bytearray()
    for row in img:
        raw.append(0)  # filter type: None
        raw.extend(row.tobytes())

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    with open(path, "wb") as fh:
        fh.write(_PNG_SIG)
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"IDAT", zlib.compress(bytes(raw), 6)))
        fh.write(chunk(b"IEND", b""))


def load_png(path: str, dtype=np.float32) -> np.ndarray:
    """Read an 8-bit non-interlaced PNG into HxW[xC]; float dtypes scaled to
    [0, 1]."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:8] != _PNG_SIG:
        raise ValueError(f"{path}: not a PNG file")
    pos = 8
    idat = bytearray()
    w = h = bit_depth = color_type = None
    palette = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8 or interlace:
                raise ValueError(
                    f"{path}: only 8-bit non-interlaced PNG supported"
                )
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    posr = 0
    for y in range(h):
        ftype = raw[posr]
        line = np.frombuffer(raw[posr + 1 : posr + 1 + stride], np.uint8).copy()
        posr += 1 + stride
        line = _unfilter(line, prev, ftype, channels)
        out[y] = line
        prev = line
    img = out.reshape(h, w, channels)
    if color_type == 3:
        img = palette[img[:, :, 0]]
    if img.shape[2] == 1:
        img = img[:, :, 0]
    if np.issubdtype(np.dtype(dtype), np.floating):
        return (img.astype(dtype) / 255.0).astype(dtype)
    return img.astype(dtype)


def _unfilter(line, prev, ftype, bpp):
    if ftype == 0:
        return line
    out = line.astype(np.int32)
    if ftype == 2:  # Up
        return ((out + prev) & 0xFF).astype(np.uint8)
    # Sub / Average / Paeth need a sequential pass.
    res = np.zeros_like(line)
    for i in range(len(line)):
        a = int(res[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        if ftype == 1:
            v = line[i] + a
        elif ftype == 3:
            v = line[i] + ((a + b) >> 1)
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = line[i] + pred
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        res[i] = v & 0xFF
    return res


def save_ppm(path: str, image: np.ndarray) -> None:
    """Binary PPM (P6) / PGM (P5) writer."""
    img = np.asarray(image)
    if np.issubdtype(img.dtype, np.floating):
        img = (np.clip(img, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    img = img.astype(np.uint8)
    with open(path, "wb") as fh:
        if img.ndim == 2:
            fh.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        else:
            fh.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        fh.write(img.tobytes())


def load_ppm(path: str, dtype=np.float32) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) reader."""
    with open(path, "rb") as fh:
        data = fh.read()
    parts = data.split(maxsplit=4)
    magic, w, h, maxval = parts[0], int(parts[1]), int(parts[2]), int(parts[3])
    pixels = parts[4]
    if magic == b"P5":
        img = np.frombuffer(pixels[: w * h], np.uint8).reshape(h, w)
    elif magic == b"P6":
        img = np.frombuffer(pixels[: w * h * 3], np.uint8).reshape(h, w, 3)
    else:
        raise ValueError(f"{path}: unsupported PPM magic {magic!r}")
    if np.issubdtype(np.dtype(dtype), np.floating):
        return (img.astype(dtype) / float(maxval)).astype(dtype)
    return img.astype(dtype)
