#!/usr/bin/env python3
"""Dump libwebp's RGBA decode of every existing lossy still fixture.

WebPDecodeRGBA uses libwebp's DEFAULT pipeline — fancy chroma
upsampling + the 14-bit fixed-point YUV->RGB — which is exactly what
Vp8.decodeFrame reimplements; Vp8RgbSpec compares byte-for-byte.

  src/test/resources/vp8/<name>.rgba: i32-BE w, h, then w*h RGBA bytes

Run offline; deterministic given the libwebp version that produced the
checked-in files (the spec compares against the files, not the lib).
"""
import ctypes
import glob
import os
import struct

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

OUT = "src/test/resources/vp8"

for path in sorted(glob.glob(f"{OUT}/*.webp")):
    name = os.path.basename(path)[:-5]
    if name.startswith("anim_"):
        continue  # animations have their own dumps (gen_anim_fixtures)
    data = open(path, "rb").read()
    if data[12:16] == b"VP8L":
        continue  # lossless stills are exact by construction (Vp8lSpec)
    if b"VP8 " not in data:
        continue
    w = ctypes.c_int(); h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, f"decode failed: {name}"
    n = w.value * h.value * 4
    with open(f"{OUT}/{name}.rgba", "wb") as f:
        f.write(struct.pack(">ii", w.value, h.value))
        f.write(bytes(p[i] for i in range(n)))
    print(name, w.value, h.value)
