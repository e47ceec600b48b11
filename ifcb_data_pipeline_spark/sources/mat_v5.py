"""Minimal MAT-file v5 parser — pure stdlib/numpy, no scipy.

Implements the subset of the MathWorks Level-5 MAT-file format (the
published public spec) that classifier score files use
(``ifcb-dashboard-metadata-pipeline.Rmd:705-714``: ``TBclass`` cell
array of char arrays + ``classifierName`` char array):

* 128-byte header (text + version + endian indicator)
* data elements with normal (8-byte tag) and small (packed) formats,
  8-byte aligned
* ``miMATRIX`` holding numeric arrays (Fortran order), char arrays
  (miUINT8/miUINT16) and cell arrays (nested ``miMATRIX``)
* ``miCOMPRESSED`` zlib wrappers

Little-endian files only (the 'IM' endian indicator) — that is what any
IEEE-era MATLAB writes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MI_COMPRESSED = 15
MI_MATRIX = 14

# mi numeric type → numpy little-endian dtype
_MI_DTYPES = {
    1: "<i1", 2: "<u1", 3: "<i2", 4: "<u2", 5: "<i4", 6: "<u4",
    7: "<f4", 9: "<f8", 12: "<i8", 13: "<u8",
}

MX_CELL = 1
MX_CHAR = 4
_MX_NUMERIC = {6: "<f8", 7: "<f4", 8: "<i1", 9: "<u1", 10: "<i2",
               11: "<u2", 12: "<i4", 13: "<u4", 14: "<i8", 15: "<u8"}


def _iter_elements(buf: bytes, offset: int, end: int):
    """Yield (mi_type, payload) data elements, handling the small-element
    packing and 8-byte alignment."""
    while offset + 8 <= end:
        (first,) = struct.unpack_from("<I", buf, offset)
        small_nbytes = first >> 16
        if small_nbytes:
            mtype = first & 0xFFFF
            yield mtype, buf[offset + 4 : offset + 4 + small_nbytes]
            offset += 8
        else:
            (nbytes,) = struct.unpack_from("<I", buf, offset + 4)
            yield first, buf[offset + 8 : offset + 8 + nbytes]
            offset += 8 + nbytes
            offset += (-offset) % 8


def _decode_char(mtype: int, payload: bytes) -> str:
    if mtype in (4, 11):  # miUINT16 / (rare) miINT16 — UTF-16LE code units
        return payload.decode("utf-16-le")
    return payload.decode("latin-1")


def _parse_matrix(data: bytes):
    """One miMATRIX payload → (name, value).  value: str (char array),
    list (cell array) or numpy array (numeric, Fortran-order reshaped)."""
    it = _iter_elements(data, 0, len(data))
    _, flags_raw = next(it)
    mx_class = flags_raw[0]  # low byte of the first flags word
    _, dims_raw = next(it)
    dims = np.frombuffer(dims_raw, dtype="<i4")
    _, name_raw = next(it)
    name = name_raw.rstrip(b"\x00").decode("ascii")
    if mx_class == MX_CELL:
        cells = []
        for mtype, sub in it:
            if mtype == MI_MATRIX:
                cells.append(_parse_matrix(sub)[1])
        return name, cells
    if mx_class == MX_CHAR:
        mtype, payload = next(it)
        return name, _decode_char(mtype, payload)
    # numeric: first remaining element is the real part
    mtype, payload = next(it)
    arr = np.frombuffer(payload, dtype=_MI_DTYPES[mtype])
    if mx_class in _MX_NUMERIC:
        arr = arr.astype(_MX_NUMERIC[mx_class])
    return name, arr.reshape(tuple(int(d) for d in dims), order="F")


def parse_mat_v5(content: bytes) -> dict[str, object]:
    """Parse a little-endian MAT v5 file → {variable name: value}."""
    if len(content) < 128:
        raise ValueError("not a MAT v5 file: truncated header")
    endian = content[126:128]
    if endian != b"IM":
        raise ValueError(f"unsupported MAT endianness marker {endian!r}")
    out: dict[str, object] = {}
    for mtype, payload in _iter_elements(content, 128, len(content)):
        if mtype == MI_COMPRESSED:
            sub = zlib.decompress(payload)
            for mt2, p2 in _iter_elements(sub, 0, len(sub)):
                if mt2 == MI_MATRIX:
                    name, value = _parse_matrix(p2)
                    out[name] = value
        elif mtype == MI_MATRIX:
            name, value = _parse_matrix(payload)
            out[name] = value
    return out
