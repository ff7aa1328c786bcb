#!/usr/bin/env python3
# Dev-only differential harness for the graft VP8 (lossy WebP) codec —
# NOT part of the Spark library (which is pure Scala/JVM). Uses the
# system libwebp via ctypes as the independent reference implementation:
#   1. encodes test images with libwebp at filter_strength=0 (so decoded
#      output is bit-exact comparable; see kernel/Vp8.scala scaladoc),
#      writing /tmp/vp8_<name>.webp + libwebp's own decoded planes to
#      /tmp/vp8_<name>.yuv;
#   2. `sbt "runMain graft.Vp8Probe"` then decodes the same streams with
#      the from-scratch Scala decoder and reports byte-exactness.
# The reverse direction (graft-encoded fixtures decoded by libwebp) was
# validated the same way during development; MediaSpec carries the
# self-contained round-trip and bool-coder property tests.
import ctypes, sys, struct
lw = ctypes.CDLL('/usr/lib/x86_64-linux-gnu/libwebp.so.7')

class WebPConfig(ctypes.Structure):
    _fields_ = [('lossless', ctypes.c_int), ('quality', ctypes.c_float), ('method', ctypes.c_int),
                ('image_hint', ctypes.c_int), ('target_size', ctypes.c_int), ('target_PSNR', ctypes.c_float),
                ('segments', ctypes.c_int), ('sns_strength', ctypes.c_int), ('filter_strength', ctypes.c_int),
                ('filter_sharpness', ctypes.c_int), ('filter_type', ctypes.c_int), ('autofilter', ctypes.c_int),
                ('alpha_compression', ctypes.c_int), ('alpha_filtering', ctypes.c_int), ('alpha_quality', ctypes.c_int),
                ('pass_', ctypes.c_int), ('show_compressed', ctypes.c_int), ('preprocessing', ctypes.c_int),
                ('partitions', ctypes.c_int), ('partition_limit', ctypes.c_int), ('emulate_jpeg_size', ctypes.c_int),
                ('thread_level', ctypes.c_int), ('low_memory', ctypes.c_int), ('near_lossless', ctypes.c_int),
                ('exact', ctypes.c_int), ('use_delta_palette', ctypes.c_int), ('use_sharp_yuv', ctypes.c_int),
                ('qmin', ctypes.c_int), ('qmax', ctypes.c_int)]

WriterFunc = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t, ctypes.c_void_p)

class WebPPicture(ctypes.Structure):
    _fields_ = [('use_argb', ctypes.c_int), ('colorspace', ctypes.c_int),
                ('width', ctypes.c_int), ('height', ctypes.c_int),
                ('y', ctypes.POINTER(ctypes.c_uint8)), ('u', ctypes.POINTER(ctypes.c_uint8)),
                ('v', ctypes.POINTER(ctypes.c_uint8)),
                ('y_stride', ctypes.c_int), ('uv_stride', ctypes.c_int),
                ('a', ctypes.POINTER(ctypes.c_uint8)), ('a_stride', ctypes.c_int),
                ('pad1', ctypes.c_uint32 * 2),
                ('argb', ctypes.POINTER(ctypes.c_uint32)), ('argb_stride', ctypes.c_int),
                ('pad2', ctypes.c_uint32 * 3),
                ('writer', WriterFunc), ('custom_ptr', ctypes.c_void_p),
                ('extra_info_type', ctypes.c_int), ('extra_info', ctypes.POINTER(ctypes.c_uint8)),
                ('stats', ctypes.c_void_p), ('error_code', ctypes.c_int),
                ('progress_hook', ctypes.c_void_p), ('user_data', ctypes.c_void_p),
                ('pad3', ctypes.c_uint32 * 3),
                ('pad4', ctypes.POINTER(ctypes.c_uint8)), ('pad5', ctypes.POINTER(ctypes.c_uint8)),
                ('pad6', ctypes.c_uint32 * 8),
                ('memory_', ctypes.c_void_p), ('memory_argb_', ctypes.c_void_p),
                ('pad7', ctypes.c_void_p * 2)]

ABI = 0x0210

def encode_yuv(w, h, yplane, uplane, vplane, quality=75.0, filter_strength=0,
               segments=1, partitions=0, method=4, sns=0):
    cfg = WebPConfig()
    assert lw.WebPConfigInitInternal(ctypes.byref(cfg), 0, ctypes.c_float(quality), ABI) == 1
    cfg.filter_strength = filter_strength
    cfg.autofilter = 0
    cfg.segments = segments
    cfg.partitions = partitions
    cfg.method = method
    cfg.sns_strength = sns
    pic = WebPPicture()
    assert lw.WebPPictureInitInternal(ctypes.byref(pic), ABI) == 1
    pic.width = w; pic.height = h
    pic.use_argb = 0; pic.colorspace = 0  # WEBP_YUV420
    assert lw.WebPPictureAlloc(ctypes.byref(pic)) == 1
    cw, ch = (w+1)//2, (h+1)//2
    for r in range(h):
        ctypes.memmove(ctypes.addressof(pic.y.contents) + r*pic.y_stride,
                       bytes(yplane[r*w:(r+1)*w]), w)
    for r in range(ch):
        ctypes.memmove(ctypes.addressof(pic.u.contents) + r*pic.uv_stride,
                       bytes(uplane[r*cw:(r+1)*cw]), cw)
        ctypes.memmove(ctypes.addressof(pic.v.contents) + r*pic.uv_stride,
                       bytes(vplane[r*cw:(r+1)*cw]), cw)
    out = bytearray()
    def wr(data, size, _):
        out.extend(ctypes.string_at(data, size)); return 1
    wfn = WriterFunc(wr)
    pic.writer = wfn
    r = lw.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    err = pic.error_code
    lw.WebPPictureFree(ctypes.byref(pic))
    assert r == 1, f'encode failed err={err}'
    return bytes(out)

def decode_yuv(webp):
    W = ctypes.c_int(); H = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    yp = lw.WebPDecodeYUV(webp, len(webp), ctypes.byref(W), ctypes.byref(H),
                          ctypes.byref(u), ctypes.byref(v), ctypes.byref(stride), ctypes.byref(uv_stride))
    assert yp, 'decode failed'
    w, h = W.value, H.value
    Y = [yp[r*stride.value + c] for r in range(h) for c in range(w)]
    cw, chh = (w+1)//2, (h+1)//2
    Uo = [u[r*uv_stride.value + c] for r in range(chh) for c in range(cw)]
    Vo = [v[r*uv_stride.value + c] for r in range(chh) for c in range(cw)]
    return w, h, Y, Uo, Vo

def gen(name, w, h, kind, **kw):
    import math
    y = [0]*(w*h); cw, ch = (w+1)//2, (h+1)//2
    u = [128]*(cw*ch); v = [128]*(cw*ch)
    for r in range(h):
        for c in range(w):
            if kind=='grad': y[r*w+c] = (c*3 + r*2) % 256
            elif kind=='flat': y[r*w+c] = 128
            elif kind=='blocks': y[r*w+c] = ((c//16 + r//16)*40) % 256
            elif kind=='noise':
                y[r*w+c] = (c*97 + r*131 + (c*r)%53) % 256
            elif kind=='sine': y[r*w+c] = int(128+100*math.sin(c/7.0)*math.cos(r/9.0))
    if kind=='chroma':
        for r in range(h):
            for c in range(w): y[r*w+c] = (c*2+r) % 256
        for r in range(ch):
            for c in range(cw):
                u[r*cw+c] = (c*5) % 256; v[r*cw+c] = (r*7) % 256
    webp = encode_yuv(w, h, y, u, v, **kw)
    dw, dh, Y, U, V = decode_yuv(webp)
    assert (dw, dh) == (w, h)
    with open(f'/tmp/vp8_{name}.webp','wb') as f: f.write(webp)
    with open(f'/tmp/vp8_{name}.yuv','wb') as f:
        f.write(struct.pack('<4i', w, h, len(U), len(V)))
        f.write(bytes(Y)); f.write(bytes(U)); f.write(bytes(V))
    print(name, w, h, len(webp), 'bytes')

gen('grad', 64, 48, 'grad')
gen('flat', 32, 32, 'flat')
gen('blocks', 80, 64, 'blocks')
gen('noise', 48, 40, 'noise', quality=40.0)
gen('sine', 56, 56, 'sine', quality=90.0)
gen('chroma', 64, 32, 'chroma')
gen('odd', 33, 17, 'grad')
gen('parts', 128, 96, 'blocks', partitions=2)
gen('seg', 96, 80, 'sine', segments=4, sns=50)
gen('q10', 64, 48, 'grad', quality=10.0)


# ---- round-4 additions: loop-filtered streams (the probe decodes all of
# these byte-exactly too — normal + simple filter, sharpness, segment
# loop-filter deltas, chroma edges)
def encode_yuv_f(w, h, y, u, v, quality=75.0, filter_strength=60, sharpness=0,
                 ftype=1, segments=1, partitions=0, method=4, sns=0):
    cfg = WebPConfig()
    assert lw.WebPConfigInitInternal(ctypes.byref(cfg), 0, ctypes.c_float(quality), ABI) == 1
    cfg.filter_strength = filter_strength; cfg.filter_sharpness = sharpness
    cfg.filter_type = ftype; cfg.autofilter = 0
    cfg.segments = segments; cfg.partitions = partitions
    cfg.method = method; cfg.sns_strength = sns
    pic = WebPPicture()
    assert lw.WebPPictureInitInternal(ctypes.byref(pic), ABI) == 1
    pic.width = w; pic.height = h; pic.use_argb = 0; pic.colorspace = 0
    assert lw.WebPPictureAlloc(ctypes.byref(pic)) == 1
    cw, ch = (w+1)//2, (h+1)//2
    for r in range(h):
        ctypes.memmove(ctypes.addressof(pic.y.contents) + r*pic.y_stride, bytes(y[r*w:(r+1)*w]), w)
    for r in range(ch):
        ctypes.memmove(ctypes.addressof(pic.u.contents) + r*pic.uv_stride, bytes(u[r*cw:(r+1)*cw]), cw)
        ctypes.memmove(ctypes.addressof(pic.v.contents) + r*pic.uv_stride, bytes(v[r*cw:(r+1)*cw]), cw)
    out = bytearray()
    def wr(data, size, _):
        out.extend(ctypes.string_at(data, size)); return 1
    wfn = WriterFunc(wr); pic.writer = wfn
    r = lw.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    err = pic.error_code
    lw.WebPPictureFree(ctypes.byref(pic))
    assert r == 1, f'encode failed err={err}'
    return bytes(out)

def gen_f(name, w, h, kind, **kw):
    import math
    y = [0]*(w*h); cw, ch = (w+1)//2, (h+1)//2
    u = [128]*(cw*ch); v = [128]*(cw*ch)
    for r in range(h):
        for c in range(w):
            if kind=='grad': y[r*w+c] = (c*3 + r*2) % 256
            elif kind=='blocks': y[r*w+c] = ((c//16 + r//16)*40) % 256
            elif kind=='noise': y[r*w+c] = (c*97 + r*131 + (c*r)%53) % 256
            else: y[r*w+c] = int(128+100*math.sin(c/7.0)*math.cos(r/9.0))
    if kind=='chroma':
        for r in range(ch):
            for c in range(cw):
                u[r*cw+c] = (c*5)%256; v[r*cw+c] = (r*7)%256
    webp = encode_yuv_f(w, h, y, u, v, **kw)
    dw, dh, Y, U, V = decode_yuv(webp)
    assert (dw, dh) == (w, h)
    open(f'/tmp/vp8_{name}.webp','wb').write(webp)
    with open(f'/tmp/vp8_{name}.yuv','wb') as f:
        f.write(struct.pack('<4i', w, h, len(U), len(V)))
        f.write(bytes(Y)); f.write(bytes(U)); f.write(bytes(V))
    print(name, w, h, len(webp), 'bytes')

gen_f('f60', 64, 48, 'sine', filter_strength=60)
gen_f('f100s3', 80, 64, 'blocks', filter_strength=100, sharpness=3)
gen_f('fsimple', 64, 48, 'sine', filter_strength=80, ftype=0)
gen_f('fseg', 96, 80, 'sine', filter_strength=70, segments=4, sns=60)
gen_f('fq10', 64, 48, 'blocks', quality=10.0, filter_strength=90)
gen_f('fsharp7', 48, 48, 'noise', quality=30.0, filter_strength=60, sharpness=7)
gen_f('fchroma', 64, 32, 'chroma', filter_strength=60)
