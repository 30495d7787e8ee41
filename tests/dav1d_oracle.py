"""Test-only ctypes oracle over the system libdav1d.

Decodes a raw AV1 OBU stream (the av01 item payload out of
``parse_avif``) to its YUV planes, with the in-loop filter set
selectable — which gives the from-scratch decoder in
``fft_restoration_tpu/utils/av1_decode.py`` a plane-exact verification
ladder: reconstruction only, +deblock, +CDEF, all.

Same role as the libwebp/OpenJPEG oracles in the other codec test
files: tests may call system decoders; the package itself never does.
Counterpart surface: /root/reference/serial.cpp:22 (cv::imread).
"""

from __future__ import annotations

import ctypes as C

import numpy as np

_lib = None
_FREE_CB_T = C.CFUNCTYPE(None, C.c_void_p, C.c_void_p)
_noop_free = _FREE_CB_T(lambda _buf, _cookie: None)

# enum Dav1dInloopFilterType
INLOOP_NONE = 0
INLOOP_DEBLOCK = 1
INLOOP_CDEF = 2
INLOOP_RESTORATION = 4
INLOOP_ALL = 7


def _load():
    global _lib
    if _lib is None:
        _lib = C.CDLL("libdav1d.so.6")
        _lib.dav1d_version.restype = C.c_char_p
    return _lib


class _Data(C.Structure):
    # Dav1dData: data, sz, ref, m{timestamp,duration,offset,size,user{2}}
    _fields_ = [
        ("data", C.c_void_p),
        ("sz", C.c_size_t),
        ("ref", C.c_void_p),
        ("m_timestamp", C.c_int64),
        ("m_duration", C.c_int64),
        ("m_offset", C.c_int64),
        ("m_size", C.c_size_t),
        ("m_user_data", C.c_void_p * 2),
    ]


class _Picture(C.Structure):
    # Dav1dPicture head: seq_hdr, frame_hdr, data[3], stride[2],
    # p{w,h,layout,bpc}, then m + refs we never touch (padding below).
    _fields_ = [
        ("seq_hdr", C.c_void_p),
        ("frame_hdr", C.c_void_p),
        ("data", C.c_void_p * 3),
        ("stride", C.c_ssize_t * 2),
        ("p_w", C.c_int),
        ("p_h", C.c_int),
        ("p_layout", C.c_int),
        ("p_bpc", C.c_int),
        ("_tail", C.c_uint8 * 256),
    ]


def decode_yuv(obu_payload: bytes, inloop_filters: int = INLOOP_ALL):
    """Decode one still AV1 frame -> (planes, layout, bpc).

    planes: list of np.uint8 arrays (Y, then U/V when not monochrome),
    each tightly cropped to its plane dimensions.
    layout: 0 mono, 1 420, 2 422, 3 444 (Dav1dPixelLayout).
    """
    lib = _load()
    settings = (C.c_uint8 * 1024)()
    lib.dav1d_default_settings(C.byref(settings))
    # Dav1dSettings field offsets (dav1d 1.x / ABI 6, x86-64):
    # n_threads 0, max_frame_delay 4, apply_grain 8, operating_point 12,
    # all_layers 16, frame_size_limit 20, allocator 24 (3 ptr),
    # logger 48 (2 ptr), strict_std_compliance 64,
    # output_invisible_frames 68, inloop_filters 72, decode_frame_type 76
    C.cast(C.byref(settings, 0), C.POINTER(C.c_int))[0] = 1  # n_threads
    C.cast(C.byref(settings, 8), C.POINTER(C.c_int))[0] = 0  # apply_grain
    C.cast(C.byref(settings, 72), C.POINTER(C.c_int))[0] = inloop_filters

    ctx = C.c_void_p()
    rc = lib.dav1d_open(C.byref(ctx), C.byref(settings))
    if rc != 0:
        raise RuntimeError(f"dav1d_open failed: {rc}")
    try:
        buf = C.create_string_buffer(obu_payload, len(obu_payload))
        data = _Data()
        ptr = lib.dav1d_data_wrap(
            C.byref(data),
            C.cast(buf, C.c_void_p),
            C.c_size_t(len(obu_payload)),
            _noop_free,
            C.cast(None, C.c_void_p),
        )
        if ptr != 0:
            raise RuntimeError(f"dav1d_data_wrap failed: {ptr}")
        rc = lib.dav1d_send_data(ctx, C.byref(data))
        if rc not in (0,):
            raise RuntimeError(f"dav1d_send_data failed: {rc}")
        pic = _Picture()
        rc = lib.dav1d_get_picture(ctx, C.byref(pic))
        if rc == -11:  # EAGAIN: flush for the still frame
            empty = _Data()
            lib.dav1d_send_data(ctx, C.byref(empty))
            rc = lib.dav1d_get_picture(ctx, C.byref(pic))
        if rc != 0:
            raise RuntimeError(f"dav1d_get_picture failed: {rc}")
        try:
            w, h, layout = pic.p_w, pic.p_h, pic.p_layout
            assert pic.p_bpc == 8, "oracle is scoped to 8-bit streams"
            planes = []
            ss_x = 1 if layout == 1 else 0
            ss_y = 1 if layout == 1 else 0
            if layout == 2:
                ss_x = 1
            for i in range(1 if layout == 0 else 3):
                if i == 0:
                    pw, ph, stride = w, h, pic.stride[0]
                else:
                    pw = (w + ss_x) >> ss_x
                    ph = (h + ss_y) >> ss_y
                    stride = pic.stride[1]
                raw = np.ctypeslib.as_array(
                    C.cast(pic.data[i], C.POINTER(C.c_uint8)),
                    shape=(ph, int(stride)),
                )
                planes.append(raw[:, :pw].copy())
            return planes, layout, pic.p_bpc
        finally:
            lib.dav1d_picture_unref(C.byref(pic))
    finally:
        lib.dav1d_close(C.byref(ctx))
