"""ctypes bridge to the C rANS coder (librans.so), batched array API.

Unlike the reference's per-element ``.tolist()`` crossings
(entropy_models.py:195-226, utils/ckbd.py:83-125), every call here moves one
contiguous int32 numpy array across the boundary, so a whole checkerboard
phase (or a whole latent) is one C call.

The shared library is compiled on first import (g++ -O3) and cached next to
the source; set RGBDC_RANS_NO_BUILD=1 to forbid compilation (CI images that
prebuild it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..entropy.tables import CdfTable

_SRC = Path(__file__).parent / "csrc" / "rans.cpp"
_LIB_PATH = Path(__file__).parent / "csrc" / "librans.so"
_lock = threading.Lock()
_lib = None


def _build_library() -> None:
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-march=native",
        str(_SRC),
        "-o",
        str(_LIB_PATH),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            if os.environ.get("RGBDC_RANS_NO_BUILD"):
                raise RuntimeError(f"librans.so missing at {_LIB_PATH}")
            _build_library()
        lib = ctypes.CDLL(str(_LIB_PATH))

        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)

        lib.rans_encoder_new.restype = ctypes.c_void_p
        lib.rans_encoder_free.argtypes = [ctypes.c_void_p]
        lib.rans_encoder_buffer.argtypes = [
            ctypes.c_void_p, i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int32, i32p, i32p,
        ]
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.rans_encoder_buffer_i16u8.argtypes = [
            ctypes.c_void_p, i16p, u8p, ctypes.c_int64, i32p, ctypes.c_int32, i32p, i32p,
        ]
        lib.rans_encoder_flush.restype = ctypes.c_int64
        lib.rans_encoder_flush.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]

        lib.rans_decoder_new.restype = ctypes.c_void_p
        lib.rans_decoder_new.argtypes = [u8p, ctypes.c_int64]
        lib.rans_decoder_free.argtypes = [ctypes.c_void_p]
        lib.rans_decoder_decode.argtypes = [
            ctypes.c_void_p, i32p, ctypes.c_int64, i32p, ctypes.c_int32, i32p, i32p, i32p,
        ]
        lib.rans_decoder_decode_u8i16.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int64, i32p, ctypes.c_int32, i32p, i32p, i16p,
        ]

        lib.pmf_to_quantized_cdf.restype = ctypes.c_int32
        lib.pmf_to_quantized_cdf.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32, i32p]

        lib.rans32_interleaved_encode.restype = ctypes.c_int64
        lib.rans32_interleaved_encode.argtypes = [
            i16p, u8p, ctypes.c_int64, ctypes.c_int32,
            i32p, ctypes.c_int32, i32p, i32p, u8p, ctypes.c_int64,
        ]
        lib.rans32_interleaved_decode.restype = ctypes.c_int32
        lib.rans32_interleaved_decode.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int64, ctypes.c_int32,
            i32p, ctypes.c_int32, i32p, i32p, i16p,
        ]

        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.rans32_lanes_encode.restype = ctypes.c_int64
        lib.rans32_lanes_encode.argtypes = [
            i16p, u8p, i64p, ctypes.c_int32, ctypes.c_int32,
            i32p, ctypes.c_int32, i32p, i32p, u8p, ctypes.c_int64,
        ]
        lib.rans32_lanes_decode.restype = ctypes.c_int32
        lib.rans32_lanes_decode.argtypes = [
            u8p, ctypes.c_int64, u8p, i64p, ctypes.c_int32, ctypes.c_int32,
            i32p, ctypes.c_int32, i32p, i32p, i16p,
        ]

        _lib = lib
        return _lib


def _i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _as_contig_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), dtype=np.int32)


class RansEncoder:
    """Buffered LIFO rANS encoder (semantics of the reference
    BufferedRansEncoder, rans_interface.cpp:119-192)."""

    def __init__(self):
        self._lib = _load()
        self._enc = self._lib.rans_encoder_new()

    def __del__(self):
        if getattr(self, "_enc", None):
            self._lib.rans_encoder_free(self._enc)
            self._enc = None

    def buffer(self, symbols, indexes, table: CdfTable) -> None:
        """Buffer symbols for encoding. Accepts int32 symbols with int32
        indexes, or the compact wire format int16 symbols + uint8 indexes
        (zero-copy into C)."""
        symbols = np.asarray(symbols).reshape(-1)
        indexes = np.asarray(indexes).reshape(-1)
        assert symbols.shape == indexes.shape
        if symbols.dtype == np.int16 and indexes.dtype == np.uint8:
            symbols = np.ascontiguousarray(symbols)
            indexes = np.ascontiguousarray(indexes)
            self._lib.rans_encoder_buffer_i16u8(
                self._enc,
                symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                symbols.size,
                _i32(table.cdf),
                table.cdf.shape[1],
                _i32(table.cdf_length),
                _i32(table.offset),
            )
            return
        symbols = _as_contig_i32(symbols)
        indexes = _as_contig_i32(indexes)
        self._lib.rans_encoder_buffer(
            self._enc,
            _i32(symbols),
            _i32(indexes),
            symbols.size,
            _i32(table.cdf),
            table.cdf.shape[1],
            _i32(table.cdf_length),
            _i32(table.offset),
        )

    def flush(self) -> bytes:
        capacity = 1 << 16
        while True:
            out = np.empty(capacity, dtype=np.uint8)
            n = self._lib.rans_encoder_flush(
                self._enc, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), capacity
            )
            if n >= 0:
                return out[:n].tobytes()
            capacity = -n


class RansDecoder:
    """Streaming rANS decoder over one bitstream; each ``decode`` call pops
    ``len(indexes)`` symbols (reference RansDecoder.decode_stream)."""

    def __init__(self, data: bytes):
        self._lib = _load()
        buf = np.frombuffer(data, dtype=np.uint8)
        self._buf = np.ascontiguousarray(buf)  # keep alive; C copies anyway
        self._dec = self._lib.rans_decoder_new(
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), self._buf.size
        )

    def __del__(self):
        if getattr(self, "_dec", None):
            self._lib.rans_decoder_free(self._dec)
            self._dec = None

    def decode(self, indexes, table: CdfTable) -> np.ndarray:
        """Decode len(indexes) symbols. uint8 indexes use the compact path
        and return int16 symbols; int32 indexes return int32."""
        indexes = np.asarray(indexes)
        shape = indexes.shape
        if indexes.dtype == np.uint8:
            indexes = np.ascontiguousarray(indexes.reshape(-1))
            out = np.empty(indexes.size, dtype=np.int16)
            self._lib.rans_decoder_decode_u8i16(
                self._dec,
                indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                indexes.size,
                _i32(table.cdf),
                table.cdf.shape[1],
                _i32(table.cdf_length),
                _i32(table.offset),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            )
            return out.reshape(shape)
        indexes = _as_contig_i32(indexes)
        out = np.empty(indexes.size, dtype=np.int32)
        self._lib.rans_decoder_decode(
            self._dec,
            _i32(indexes),
            indexes.size,
            _i32(table.cdf),
            table.cdf.shape[1],
            _i32(table.cdf_length),
            _i32(table.offset),
            _i32(out),
        )
        return out.reshape(shape)


def encode_with_tables(symbols, indexes, table: CdfTable) -> bytes:
    """One-shot encode (reference RansEncoder.encode_with_indexes)."""
    enc = RansEncoder()
    enc.buffer(symbols, indexes, table)
    return enc.flush()


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """C implementation; exact mirror of entropy.tables.pmf_to_quantized_cdf_py."""
    lib = _load()
    pmf = np.ascontiguousarray(pmf, dtype=np.float32)
    out = np.empty(pmf.size + 1, dtype=np.int32)
    rc = lib.pmf_to_quantized_cdf(
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pmf.size, precision, _i32(out)
    )
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed with code {rc}")
    return out


def interleaved_encode(symbols, indexes, table: CdfTable, lanes: int = 128) -> bytes:
    """Lane-interleaved rans32 encode (the wire format a vectorized/TPU
    decoder consumes: one shared word stream, lane = i % lanes)."""
    lib = _load()
    symbols = np.ascontiguousarray(np.asarray(symbols).reshape(-1), dtype=np.int16)
    indexes = np.ascontiguousarray(np.asarray(indexes).reshape(-1), dtype=np.uint8)
    assert symbols.shape == indexes.shape
    # C worst case: 4*lanes state header + 2*(7*n + 16*lanes + 64) body
    capacity = 14 * symbols.size + 36 * lanes + 128
    while True:
        out = np.empty(capacity, dtype=np.uint8)
        nbytes = lib.rans32_interleaved_encode(
            symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            symbols.size,
            lanes,
            _i32(table.cdf),
            table.cdf.shape[1],
            _i32(table.cdf_length),
            _i32(table.offset),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            capacity,
        )
        if nbytes >= 0:
            return out[:nbytes].tobytes()
        capacity = -nbytes  # encoder reports required size; retry


def interleaved_decode(data: bytes, indexes, table: CdfTable, lanes: int = 128):
    lib = _load()
    buf = np.frombuffer(data, dtype=np.uint8)
    buf = np.ascontiguousarray(buf)
    indexes = np.ascontiguousarray(np.asarray(indexes).reshape(-1), dtype=np.uint8)
    out = np.empty(indexes.size, dtype=np.int16)
    rc = lib.rans32_interleaved_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size,
        indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        indexes.size,
        lanes,
        _i32(table.cdf),
        table.cdf.shape[1],
        _i32(table.cdf_length),
        _i32(table.offset),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    assert rc == 0
    return out


# --- lane-split rans32 (the TPU decoder's wire format) ------------------------


def lanes_encode(
    symbols, indexes, group_lens, table: CdfTable, lanes: int = 128
) -> bytes:
    """Encode one lane-split stream: every lane is an independent rans32
    stream; symbol j of group g goes to lane j % lanes.  ``group_lens``
    must sum to len(symbols).  The result is decodable by both the C
    mirror (:func:`lanes_decode`) and the JAX lockstep decoder
    (coder/rans_tpu.py)."""
    lib = _load()
    symbols = np.ascontiguousarray(np.asarray(symbols).reshape(-1), dtype=np.int16)
    indexes = np.ascontiguousarray(np.asarray(indexes).reshape(-1), dtype=np.uint8)
    assert symbols.shape == indexes.shape
    gl = np.ascontiguousarray(np.asarray(group_lens).reshape(-1), dtype=np.int64)
    assert int(gl.sum()) == symbols.size, (gl.sum(), symbols.size)
    capacity = 24 * symbols.size + 8 * lanes + 64
    while True:
        out = np.empty(capacity, dtype=np.uint8)
        nbytes = lib.rans32_lanes_encode(
            symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            gl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            gl.size,
            lanes,
            _i32(table.cdf),
            table.cdf.shape[1],
            _i32(table.cdf_length),
            _i32(table.offset),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            capacity,
        )
        if nbytes >= 0:
            return out[:nbytes].tobytes()
        if -nbytes <= capacity:
            # not a capacity hint: a real encode error (e.g. -3 = a lane's
            # word/nibble count exceeds the u16 container field)
            raise RuntimeError(f"rans32_lanes_encode failed with code {nbytes}")
        capacity = -nbytes


def lanes_decode(
    data: bytes, indexes, group_lens, table: CdfTable, lanes: int = 128
) -> np.ndarray:
    """C mirror of the JAX lane decoder (used for parity tests)."""
    lib = _load()
    buf = np.ascontiguousarray(np.frombuffer(data, dtype=np.uint8))
    indexes = np.ascontiguousarray(np.asarray(indexes).reshape(-1), dtype=np.uint8)
    gl = np.ascontiguousarray(np.asarray(group_lens).reshape(-1), dtype=np.int64)
    assert int(gl.sum()) == indexes.size
    out = np.empty(indexes.size, dtype=np.int16)
    rc = lib.rans32_lanes_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size,
        indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        gl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        gl.size,
        lanes,
        _i32(table.cdf),
        table.cdf.shape[1],
        _i32(table.cdf_length),
        _i32(table.offset),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    assert rc == 0, f"lanes_decode failed with code {rc}"
    return out


def lanes_split(data: bytes, lanes: int = 128):
    """Split a lane-split container (compact v3 header: u8 version, u8
    flags, u32 states, u16 word counts, u16 nibble counts only when the
    stream has escapes) into (states u32[lanes], words u16[lanes, W],
    nibble_words u16[lanes, B]) with zero-padded rows — the arrays the JAX
    decoder uploads to the device.  Nibble words pack the escape-bypass
    chunks, 4 per u16, least-significant first."""
    buf = np.frombuffer(data, dtype=np.uint8)
    assert buf[0] == 3, f"unknown lane-container version {buf[0]}"
    has_nibs = bool(buf[1] & 1)
    off = 4
    states = buf[off : off + 4 * lanes].view(np.uint32).copy()
    off += 4 * lanes
    wcounts = buf[off : off + 2 * lanes].view(np.uint16).astype(np.uint32)
    off += 2 * lanes
    if has_nibs:
        ncounts = buf[off : off + 2 * lanes].view(np.uint16).astype(np.uint32)
        off += 2 * lanes
    else:
        ncounts = np.zeros(lanes, np.uint32)
    nwcounts = (ncounts + 3) // 4
    rest = buf[off:].view(np.uint16)
    w = max(int(wcounts.max()) if lanes else 0, 1)
    bw = max(int(nwcounts.max()) if lanes else 0, 1)
    words = np.zeros((lanes, w), dtype=np.uint16)
    nwords = np.zeros((lanes, bw), dtype=np.uint16)
    pos = 0
    for l in range(lanes):
        c = int(wcounts[l])
        words[l, :c] = rest[pos : pos + c]
        pos += c
    for l in range(lanes):
        c = int(nwcounts[l])
        nwords[l, :c] = rest[pos : pos + c]
        pos += c
    return states, words, nwords


def lanes_split_flat(data: bytes, lanes: int = 128):
    """Flat-layout variant of ``lanes_split``: returns (states u32[lanes],
    wflat u16[n], wbase i32[lanes], nibflat u16[m], nibbase i32[lanes]).

    The container payload is ALREADY lane-major flat in consume order, so
    this is just views + cumsums — no per-lane unflatten loop, and the
    upload carries the stream's exact bytes instead of per-lane padded
    rows (the decoder inits each lane's word/nibble cursor at its base
    offset; see models/codec.py RGBDC_FLAT_UPLOAD)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    assert buf[0] == 3, f"unknown lane-container version {buf[0]}"
    has_nibs = bool(buf[1] & 1)
    off = 4
    states = buf[off : off + 4 * lanes].view(np.uint32).copy()
    off += 4 * lanes
    wcounts = buf[off : off + 2 * lanes].view(np.uint16).astype(np.int64)
    off += 2 * lanes
    if has_nibs:
        ncounts = buf[off : off + 2 * lanes].view(np.uint16).astype(np.int64)
        off += 2 * lanes
    else:
        ncounts = np.zeros(lanes, np.int64)
    nwcounts = (ncounts + 3) // 4
    rest = buf[off:].view(np.uint16)
    nw = int(wcounts.sum())
    wflat = rest[:nw].copy()
    nibflat = rest[nw : nw + int(nwcounts.sum())].copy()
    wbase = np.zeros(lanes, np.int32)
    wbase[1:] = np.cumsum(wcounts[:-1]).astype(np.int32)
    nibbase = np.zeros(lanes, np.int32)
    nibbase[1:] = np.cumsum(nwcounts[:-1]).astype(np.int32)
    return states, wflat, wbase, nibflat, nibbase


def assemble_lanes_container(states, wcounts, words_emitted, nib_streams):
    """Build a lane-split container (compact v3 header, see lanes_split)
    from the ON-DEVICE encoder's outputs (coder/rans_tpu.py encode_groups):
    per-lane words arrive in EMISSION order and are flipped here into
    decode-consume order; nib_streams is a per-lane list of bypass nibble
    values (forward decode order), built by the caller from the escape
    sideband."""
    lanes = states.shape[0]
    states = np.ascontiguousarray(states, dtype=np.uint32)
    wcounts = np.ascontiguousarray(wcounts, dtype=np.uint32)
    assert int(wcounts.max(initial=0)) <= 0xFFFF, "lane word count exceeds u16"
    ncounts = np.asarray([len(nib_streams[l]) for l in range(lanes)], np.uint32)
    has_nibs = bool(ncounts.any())
    parts = [
        bytes([3, 1 if has_nibs else 0, 0, 0]),
        states.tobytes(),
        wcounts.astype(np.uint16).tobytes(),
    ]
    if has_nibs:
        assert int(ncounts.max()) <= 0xFFFF, "lane nibble count exceeds u16"
        parts.append(ncounts.astype(np.uint16).tobytes())
    for l in range(lanes):
        c = int(wcounts[l])
        parts.append(np.ascontiguousarray(words_emitted[l, :c][::-1]).tobytes())
    for l in range(lanes):
        nibs = nib_streams[l]
        nw = np.zeros((len(nibs) + 3) // 4, np.uint16)
        for j, v in enumerate(nibs):
            nw[j >> 2] |= np.uint16(v) << (4 * (j & 3))
        parts.append(nw.tobytes())
    return b"".join(parts)


def assemble_lanes_containers_batch(states, wcounts, words_emitted,
                                    nib_streams_list=None):
    """Vectorized whole-batch assemble_lanes_container (byte-identical,
    pinned by tests): the per-lane slice+reverse+tobytes loop costs ~70 ms
    of GIL-bound host time per batch-32 at 512 lanes (2 x 512 x 32 small
    numpy ops); here the lane reversal + concatenation is ONE masked
    extraction per image (reverse each lane row, keep the tail wcount
    entries — that tail IS the consume order).

    states [b, L] u32, wcounts [b, L], words_emitted [b, L, wb] in
    emission order; nib_streams_list: per-image per-lane nibble lists (or
    None).  Images with nibbles fall back to the per-lane path."""
    b, lanes = states.shape
    wb = words_emitted.shape[-1]
    states = np.ascontiguousarray(states, dtype=np.uint32)
    wcounts_u = np.ascontiguousarray(wcounts, dtype=np.uint32)
    assert int(wcounts_u.max(initial=0)) <= 0xFFFF, "lane word count exceeds u16"
    rev = words_emitted[:, :, ::-1]
    cols = np.arange(wb)
    mask = cols >= (wb - wcounts_u.astype(np.int64)[..., None])
    head = bytes([3, 0, 0, 0])
    wc16 = wcounts_u.astype(np.uint16)
    out = []
    for i in range(b):
        nibs = nib_streams_list[i] if nib_streams_list is not None else None
        if nibs is not None and any(len(s) for s in nibs):
            out.append(
                assemble_lanes_container(states[i], wcounts_u[i],
                                         words_emitted[i], nibs)
            )
            continue
        out.append(
            head + states[i].tobytes() + wc16[i].tobytes()
            + np.ascontiguousarray(rev[i][mask[i]]).tobytes()
        )
    return out


def build_nibble_streams(esc_list, group_lens, lanes):
    """Distribute (global_pos, nibbles) escape records into per-lane FIFO
    nibble streams using the group-restarting lane assignment (symbol j of
    group g -> lane (j - g_start) % lanes)."""
    bounds = np.cumsum([0] + [int(g) for g in group_lens])
    streams = [[] for _ in range(lanes)]
    gi = 0
    for pos, nibs in esc_list:  # esc_list is in increasing pos order
        while pos >= bounds[gi + 1]:
            gi += 1
        streams[(pos - bounds[gi]) % lanes].extend(nibs)
    return streams
