#!/usr/bin/env python3
"""Generate lossy-WebP test fixtures for Vp8Spec.

Uses the system libwebp (the de-facto VP8 reference implementation) to
ENCODE deterministic synthetic images as lossy webp, and to DECODE them
back to YUV planes — the expected output the Scala decoder must
reproduce bit-exactly. Each fixture pair is checked in:

  src/test/resources/vp8/<name>.webp   the lossy container bytes
  src/test/resources/vp8/<name>.yuv    i32-BE w, h, then Y (w*h),
                                       U, V (ceil(w/2)*ceil(h/2)) bytes

Run offline; deterministic given the libwebp version that produced the
checked-in files (the spec compares against the files, not the lib).
"""
import ctypes
import os
import struct

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = lib.WebPEncodeRGB.argtypes
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

OUT = "src/test/resources/vp8"
os.makedirs(OUT, exist_ok=True)


def encode(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(bytes(rgb), w, h, w * 3, float(q),
                          ctypes.byref(out))
    assert n > 0, "encode failed"
    data = bytes(out[i] for i in range(n))
    assert data[12:16] == b"VP8 ", f"not lossy: {data[12:16]}"
    return data


def decode_yuv(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y, "decode failed"
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yp = bytes(y[r * stride.value + c] for r in range(H) for c in range(W))
    up = bytes(u[r * uv_stride.value + c]
               for r in range(ch) for c in range(cw))
    vp = bytes(v[r * uv_stride.value + c]
               for r in range(ch) for c in range(cw))
    return W, H, yp, up, vp


def emit(name, rgb, w, h, q):
    data = encode(rgb, w, h, q)
    W, H, yp, up, vp = decode_yuv(data)
    assert (W, H) == (w, h)
    open(f"{OUT}/{name}.webp", "wb").write(data)
    with open(f"{OUT}/{name}.yuv", "wb") as f:
        f.write(struct.pack(">ii", W, H))
        f.write(yp); f.write(up); f.write(vp)
    print(f"{name}: {w}x{h} q={q} webp={len(data)}B")


ABI = 0x020f  # libwebp 1.2.x encoder ABI


class WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int)]


WriterFunc = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                              ctypes.c_size_t, ctypes.c_void_p)


class WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p), ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", WriterFunc), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int), ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2)]


def encode_advanced(rgb, w, h, q, partitions):
    """Advanced-API encode: the simple API always writes ONE token
    partition; config.partitions=N exercises the 2^N-partition layout
    (per-MB-row interleave) the decoder must also parse."""
    out = bytearray()

    def _write(data, size, _ptr):
        out.extend(bytes(ctypes.cast(
            data, ctypes.POINTER(ctypes.c_uint8 * size)).contents))
        return 1
    writer = WriterFunc(_write)
    cfg = WebPConfig()
    assert lib.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(q), ABI)
    cfg.partitions = partitions
    assert lib.WebPValidateConfig(ctypes.byref(cfg))
    pic = WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), ABI)
    pic.width, pic.height = w, h
    pic.use_argb = 0
    pic.writer = writer
    assert lib.WebPPictureImportRGB(ctypes.byref(pic), bytes(rgb), w * 3)
    assert lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic)), \
        pic.error_code
    lib.WebPPictureFree(ctypes.byref(pic))
    data = bytes(out)
    assert data[12:16] == b"VP8 "
    return data


def emit_advanced(name, rgb, w, h, q, partitions):
    data = encode_advanced(rgb, w, h, q, partitions)
    W, H, yp, up, vp = decode_yuv(data)
    assert (W, H) == (w, h)
    open(f"{OUT}/{name}.webp", "wb").write(data)
    with open(f"{OUT}/{name}.yuv", "wb") as f:
        f.write(struct.pack(">ii", W, H))
        f.write(yp); f.write(up); f.write(vp)
    print(f"{name}: {w}x{h} q={q} parts=2^{partitions} webp={len(data)}B")


def rng(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        yield (s >> 33) & 0xff


# 1. flat gray — DC-only blocks, minimal stream
emit("flat32", [128] * (32 * 32 * 3), 32, 32, 75)

# 2. horizontal gradient — V/H/TM predictors, small residuals
g = []
for y in range(32):
    for x in range(48):
        g += [x * 5 % 256, x * 5 % 256, x * 5 % 256]
emit("hgrad48x32", g, 48, 32, 75)

# 3. color blocks + vertical gradient — chroma coefficients
g = []
for y in range(48):
    for x in range(64):
        if x < 32:
            g += [y * 5 % 256, 40, 200 - (y * 4) % 200]
        else:
            g += [30, (x * 7) % 256, y % 256]
emit("color64x48", g, 64, 48, 80)

# 4. deterministic noise, odd dims — B_PRED-heavy, crop path
r = rng(42)
g = [next(r) for _ in range(36 * 3 * 20)][: 35 * 19 * 3]
emit("noise35x19", g, 35, 19, 60)

# 5. checkerboard at low quality — coarse quantizers, strong loop filter
g = []
for y in range(32):
    for x in range(32):
        v = 255 if ((x // 4) + (y // 4)) % 2 == 0 else 0
        g += [v, v, 255 - v]
emit("check32q25", g, 32, 32, 25)

# 6. mixed content, larger, high quality — many token categories
r = rng(7)
g = []
for y in range(64):
    for x in range(80):
        base = (x * 3 + y * 2) % 256
        n = next(r) % 32
        g += [(base + n) % 256, (base * 2 + n) % 256, (255 - base + n) % 256]
emit("mixed80x64", g, 80, 64, 92)

# 7. single-MB noise — the minimal B_PRED/4x4-mode exercise (this one
# caught the libwebp-vs-RFC B-mode numbering mismatch)
r = rng(99)
emit("dbg16", [next(r) for _ in range(16 * 16 * 3)], 16, 16, 60)

def emit_alpha(name, rgba, w, h, q):
    """Lossy + alpha fixture (VP8X + ALPH + VP8 chunks): expected YUV
    from WebPDecodeYUV (color) plus the straight alpha bytes from
    WebPDecodeRGBA, appended to the .yuv dump."""
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(bytes(rgba), w, h, w * 4, float(q),
                           ctypes.byref(out))
    assert n > 0
    data = bytes(out[i] for i in range(n))
    assert b"ALPH" in data[:64], "no alpha chunk emitted"
    W, H, yp, up, vp = decode_yuv(data)
    assert (W, H) == (w, h)
    dw = ctypes.c_int(); dh = ctypes.c_int()
    rp = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(dw),
                            ctypes.byref(dh))
    alpha = bytes(rp[i * 4 + 3] for i in range(w * h))
    open(f"{OUT}/{name}.webp", "wb").write(data)
    with open(f"{OUT}/{name}.yuv", "wb") as f:
        f.write(struct.pack(">ii", W, H))
        f.write(yp); f.write(up); f.write(vp); f.write(alpha)
    print(f"{name}: {w}x{h} q={q} webp={len(data)}B (alpha)")


# A1. smooth alpha gradient over colored content
g = []
for y in range(48):
    for x in range(64):
        g += [(x * 4) % 256, (y * 5) % 256, 160, (x * 255 // 63)]
emit_alpha("alpha64x48", g, 64, 48, 75)

# A2. hard-edged alpha shapes (binary transparency, filter stress)
g = []
for y in range(32):
    for x in range(32):
        inside = (8 <= x < 24 and 8 <= y < 24) and not (14 <= x < 18)
        g += [200, 60, 90, 255 if inside else 0]
emit_alpha("alphashape32", g, 32, 32, 80)

# M1. EIGHT token partitions (advanced API) — rows interleave across
# all partition bool-decoders
r = rng(5)
g = []
for y in range(80):
    for x in range(96):
        n = next(r)
        g += [(x * 3 + n) % 256, (y * 2 + n // 3) % 256, (x + y + n) % 256]
emit_advanced("parts8_96x80", g, 96, 80, 70, partitions=3)

# 8. photo-ish blend, larger, mid quality — smooth + edges + texture
r = rng(1234)
g = []
for y in range(96):
    for x in range(144):
        smooth = (x + y * 2) % 256
        edge = 200 if (x // 24) % 2 == 0 else 60
        tex = next(r) % 24
        g += [(smooth + tex) % 256, (edge + tex) % 256,
              ((smooth + edge) // 2 + tex) % 256]
emit("photo144x96", g, 144, 96, 55)
