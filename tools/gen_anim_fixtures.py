#!/usr/bin/env python3
"""Generate animated-WebP fixtures for WebpAnimSpec.

libwebp here has no mux/demux, so the animation CONTAINER is assembled
by hand per the public WebP container spec (VP8X + ANIM + ANMF chunks)
around frame payloads produced by the system libwebp encoder — the
same encoder the still fixtures use. Expected composited canvases are
computed by an independent Python compositor implementing the spec's
dispose/blend semantics (integer rounding), with frame pixels taken
from libwebp's OWN decode of each frame payload.

Outputs (checked in):
  src/test/resources/vp8/anim_<name>.webp    container bytes
  src/test/resources/vp8/anim_<name>.rgba    i32-BE w, h, nframes, then
                                             nframes * (i32-BE duration
                                             + w*h*4 RGBA canvas bytes)
"""
import ctypes
import os
import struct

lib = ctypes.CDLL("libwebp.so.7")
for fn in ("WebPEncodeRGB", "WebPEncodeRGBA", "WebPEncodeLosslessRGBA"):
    f = getattr(lib, fn)
    f.restype = ctypes.c_size_t
    f.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                  ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPEncodeLosslessRGBA.argtypes = lib.WebPEncodeLosslessRGBA.argtypes[:4] + [
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]

OUT = "src/test/resources/vp8"


def enc_lossy_rgb(rgb, w, h, q=60.0):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(bytes(rgb), w, h, w * 3, q, ctypes.byref(out))
    assert n > 0
    return bytes(out[i] for i in range(n))


def enc_lossy_rgba(rgba, w, h, q=60.0):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(bytes(rgba), w, h, w * 4, q, ctypes.byref(out))
    assert n > 0
    return bytes(out[i] for i in range(n))


def enc_lossless_rgba(rgba, w, h):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(bytes(rgba), w, h, w * 4,
                                   ctypes.byref(out))
    assert n > 0
    return bytes(out[i] for i in range(n))


def dec_rgba(webp):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(webp, len(webp), ctypes.byref(w), ctypes.byref(h))
    assert p
    return bytes(p[i] for i in range(w.value * h.value * 4)), w.value, h.value


def chunks_of(webp):
    """All (tag, payload) chunks of a still webp, in order."""
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    out = []
    off = 12
    while off + 8 <= len(webp):
        tag = webp[off:off + 4]
        size = struct.unpack("<I", webp[off + 4:off + 8])[0]
        out.append((tag, webp[off + 8:off + 8 + size]))
        off += 8 + size + (size & 1)
    return out


def frame_payload(still):
    """The ALPH?+(VP8 |VP8L) chunk bytes of a still, re-serialized."""
    keep = [c for c in chunks_of(still) if c[0] in (b"ALPH", b"VP8 ", b"VP8L")]
    assert keep, [c[0] for c in chunks_of(still)]
    out = b""
    for tag, payload in keep:
        out += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            out += b"\x00"
    return out


def chunk(tag, payload):
    out = tag + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def u24(v):
    return struct.pack("<I", v)[:3]


def build_anim(cw, ch, frames):
    """frames: list of (x, y, fw, fh, dur, blend, dispose_bg, payload)."""
    body = chunk(b"VP8X", bytes([0x12, 0, 0, 0]) + u24(cw - 1) + u24(ch - 1))
    body += chunk(b"ANIM", struct.pack("<IH", 0xFF000000, 0))
    for (x, y, fw, fh, dur, blend, dispose, payload) in frames:
        flags = (0 if blend else 2) | (1 if dispose else 0)
        hdr = u24(x // 2) + u24(y // 2) + u24(fw - 1) + u24(fh - 1) \
            + u24(dur) + bytes([flags])
        body += chunk(b"ANMF", hdr + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def blend_px(src, dst):
    """The spec's non-premultiplied src-over in 8-bit integer rounding."""
    sr, sg, sb, sa = src
    if sa == 0:
        return dst
    if sa == 255:
        return src
    dr, dg, db, da = dst
    blend_a = sa + da * (255 - sa) // 255
    if blend_a == 0:
        return (0, 0, 0, 0)
    scale = sa * 255 // blend_a
    def ch_(s, d):
        return (s * scale + d * (255 - scale)) // 255
    return (ch_(sr, dr), ch_(sg, dg), ch_(sb, db), blend_a)


def composite(cw, ch, frames, frame_pixels):
    """Python reassembly per the container spec; returns per-frame
    canvas snapshots."""
    canvas = [(0, 0, 0, 0)] * (cw * ch)
    snaps = []
    for (x, y, fw, fh, dur, blend, dispose, _), px in zip(frames,
                                                          frame_pixels):
        for yy in range(fh):
            for xx in range(fw):
                s = px[yy * fw + xx]
                at = (y + yy) * cw + (x + xx)
                canvas[at] = blend_px(s, canvas[at]) if blend else s
        snaps.append((dur, list(canvas)))
        if dispose:
            for yy in range(fh):
                for xx in range(fw):
                    canvas[(y + yy) * cw + (x + xx)] = (0, 0, 0, 0)
    return snaps


def px_list(rgba, w, h):
    return [tuple(rgba[i * 4:i * 4 + 4]) for i in range(w * h)]


def write_fixture(name, cw, ch, frames):
    stills = [f[-1] for f in frames]          # still webp per frame
    payloads = [frame_payload(s) for s in stills]
    pixels = []
    for s, (x, y, fw, fh, *_r) in zip(stills, frames):
        rgba, w, h = dec_rgba(s)
        assert (w, h) == (fw, fh), (name, w, h, fw, fh)
        pixels.append(px_list(rgba, w, h))
    specs = [f[:-1] + (p,) for f, p in zip(frames, payloads)]
    anim = build_anim(cw, ch, specs)
    snaps = composite(cw, ch, specs, pixels)
    with open(f"{OUT}/anim_{name}.webp", "wb") as f:
        f.write(anim)
    with open(f"{OUT}/anim_{name}.rgba", "wb") as f:
        f.write(struct.pack(">iii", cw, ch, len(snaps)))
        for dur, canvas in snaps:
            f.write(struct.pack(">i", dur))
            f.write(bytes(v for px in canvas for v in px))
    print(f"anim_{name}: {len(anim)} bytes, {len(snaps)} frames")


def grad_rgb(w, h, seed):
    return bytes(((x * 5 + seed) % 256 if c == 0 else
                  (y * 7 + seed) % 256 if c == 1 else
                  (x + y + seed) % 256)
                 for y in range(h) for x in range(w) for c in range(3))


def rgba_mix(w, h, seed):
    """Quadrants: transparent / semi / opaque / semi2 — exercises every
    blend branch."""
    out = bytearray()
    for y in range(h):
        for x in range(w):
            r, g, bl = (x * 9 + seed) % 256, (y * 11) % 256, (x ^ y) % 256
            if x < w // 2 and y < h // 2:
                a = 0
            elif x >= w // 2 and y < h // 2:
                a = 128
            elif x < w // 2:
                a = 255
            else:
                a = 64
            out += bytes((r, g, bl, a))
    return bytes(out)


def rgba_flat_alpha(w, h, color=(120, 200, 40)):
    """Flat color with alpha quadrants 0/128/255/64 — flat chroma makes
    the lossy decode upsampler-independent, so cross-decoder RGB
    differences reduce to YUV->RGB rounding (spec compares with a small
    tolerance); the ALPH plane itself is lossless."""
    out = bytearray()
    for y in range(h):
        for x in range(w):
            if x < w // 2 and y < h // 2:
                a = 0
            elif x >= w // 2 and y < h // 2:
                a = 128
            elif x < w // 2:
                a = 255
            else:
                a = 64
            out += bytes(color) + bytes([a])
    return bytes(out)


def main():
    os.makedirs(OUT, exist_ok=True)
    # 1) lossless-only, replace mode + dispose: the container mechanics
    #    isolated from blending — expected canvases are EXACT
    cw, ch = 40, 24
    f0 = enc_lossless_rgba(
        bytes(v for i in range(cw * ch)
              for v in ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256, 255)),
        cw, ch)
    f1 = enc_lossless_rgba(
        bytes(v for i in range(cw * ch)
              for v in ((i * 11) % 256, (i * 13) % 256, (i * 17) % 256, 255)),
        cw, ch)
    write_fixture("replace", cw, ch, [
        (0, 0, cw, ch, 100, False, False, f0),
        (0, 0, cw, ch, 50, False, True, f1),   # dispose wipes canvas
        (8, 4, 16, 8, 70, False, False,
         enc_lossless_rgba(rgba_mix(16, 8, 3), 16, 8)),  # sub-rect on cleared bg
    ])
    # 2) lossless-only alpha blending: sub-rects with all four alpha
    #    quadrants over an opaque lossless base — EXACT
    cw2, ch2 = 48, 32
    base = enc_lossless_rgba(
        bytes(v for i in range(cw2 * ch2)
              for v in ((i * 7) % 256, (i * 3) % 256, (i * 19) % 256, 255)),
        cw2, ch2)
    mid = enc_lossless_rgba(rgba_mix(24, 16, 11), 24, 16)
    top = enc_lossless_rgba(rgba_mix(16, 16, 19), 16, 16)
    write_fixture("blend", cw2, ch2, [
        (0, 0, cw2, ch2, 40, False, False, base),
        (12, 8, 24, 16, 60, True, False, mid),
        (0, 16, 16, 16, 80, True, False, top),
    ])
    # 3) lossy frames inside ANMF (VP8 color + lossless ALPH alpha):
    #    flat colors so the expected canvas is upsampler-independent;
    #    the spec allows small per-channel YUV->RGB rounding differences
    cw3, ch3 = 32, 32
    base3 = enc_lossy_rgb(bytes((30, 60, 200) * (cw3 * ch3)), cw3, ch3, 90)
    top3 = enc_lossy_rgba(rgba_flat_alpha(16, 16), 16, 16, 90)
    assert b"ALPH" in top3, "lossy-RGBA still lost its alpha plane"
    write_fixture("lossy", cw3, ch3, [
        (0, 0, cw3, ch3, 25, False, False, base3),
        (8, 8, 16, 16, 35, True, False, top3),
    ])


if __name__ == "__main__":
    main()
