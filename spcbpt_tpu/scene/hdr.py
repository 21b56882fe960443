"""Radiance .hdr (RGBE) loader.

Replaces the reference HDRLoader (reference: scene_shift.cpp:334-590): RLE and
flat RGBE scanlines to a float32 (H, W, 3) raster.
"""
from __future__ import annotations

import numpy as np


def load_hdr(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()

    # header
    pos = 0
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line == b"":
            break
    eol = data.index(b"\n", pos)
    dims = data[pos:eol].split()
    pos = eol + 1
    if dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"{path}: unsupported orientation {dims}")
    height, width = int(dims[1]), int(dims[3])

    rgbe = np.zeros((height, width, 4), np.uint8)
    buf = np.frombuffer(data, np.uint8, offset=pos)
    bp = 0
    for y in range(height):
        if width < 8 or width > 0x7FFF or buf[bp] != 2 or buf[bp + 1] != 2:
            # flat (possibly old-RLE, not handled) scanline
            row = buf[bp:bp + width * 4].reshape(width, 4)
            rgbe[y] = row
            bp += width * 4
            continue
        # new RLE: 4 channel planes
        bp += 4
        for c in range(4):
            x = 0
            while x < width:
                count = int(buf[bp]); bp += 1
                if count > 128:
                    count -= 128
                    rgbe[y, x:x + count, c] = buf[bp]
                    bp += 1
                else:
                    rgbe[y, x:x + count, c] = buf[bp:bp + count]
                    bp += count
                x += count

    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136))  # 2^(e-128)/256
    rgb = rgbe[..., :3].astype(np.float32) * scale[..., None].astype(np.float32)
    return rgb
