"""Minimal pure-Python HDF5 reader — the hermetic decode path for S5.

The reference's CNN class-score files are HDF5 with flat root-level
datasets (``convert_h5_to_irfcb_format.R:48-65``: ``class_name`` /
``output_scores`` / ``roi_numbers`` / ``thresholds``).  Executor images
normally ship h5py; this container does not, so — mirroring the MAT v5
approach in :mod:`.mat_v5` — this module implements just enough of the
public HDF5 file format specification to read the files the score
pipeline produces, and :mod:`.binary_formats` keeps the injected-parser
seam for the real library.

Supported subset (deliberately small, validated against spec-built
fixture bytes in ``tests/hdf5_fixture.py``):

* superblock version 0, 8-byte offsets/lengths, little-endian files
* version-1 object headers, including continuation blocks
* root group via v1 B-tree + local heap + SNOD symbol-table nodes
  (one level; nested groups out of scope)
* contiguous data layout (layout message v3)
* fixed-point, IEEE floating-point and fixed-length string datatypes

No chunking, no compression, no variable-length types, no superblock
v2+ — files outside the subset raise :class:`Hdf5LiteError` so callers
can fall back to the injected h5py parser.
"""

from __future__ import annotations

import struct

import numpy as np

SIGNATURE = b"\x89HDF\r\n\x1a\n"
UNDEFINED = 0xFFFFFFFFFFFFFFFF

MSG_NIL = 0x0000
MSG_DATASPACE = 0x0001
MSG_DATATYPE = 0x0003
MSG_LAYOUT = 0x0008
MSG_CONTINUATION = 0x0010
MSG_SYMBOL_TABLE = 0x0011


class Hdf5LiteError(ValueError):
    """File is not HDF5 or uses features outside the supported subset."""


def _u(buf: bytes, off: int, n: int) -> int:
    return int.from_bytes(buf[off : off + n], "little")


def _superblock(buf: bytes) -> int:
    """Returns the root group's object-header address."""
    if buf[:8] != SIGNATURE:
        raise Hdf5LiteError("not an HDF5 file (bad signature)")
    version = buf[8]
    if version != 0:
        raise Hdf5LiteError(f"superblock v{version} unsupported (subset: v0)")
    size_offsets, size_lengths = buf[13], buf[14]
    if (size_offsets, size_lengths) != (8, 8):
        raise Hdf5LiteError("non-8-byte offsets/lengths unsupported")
    # 24-byte fixed prefix, then 4 addresses, then the root symbol-table
    # entry: link name offset (8) + object header address (8) + ...
    return _u(buf, 24 + 32 + 8, 8)


def _messages(buf: bytes, ohdr_addr: int) -> list[tuple[int, bytes]]:
    """All (type, body) messages of a v1 object header, following
    continuation blocks."""
    version = buf[ohdr_addr]
    if version != 1:
        raise Hdf5LiteError(f"object header v{version} unsupported (subset: v1)")
    nmsgs = _u(buf, ohdr_addr + 2, 2)
    hdr_size = _u(buf, ohdr_addr + 8, 4)
    # v1 prefix is 12 bytes + 4 pad so messages start 8-aligned.
    blocks = [(ohdr_addr + 16, hdr_size)]
    out: list[tuple[int, bytes]] = []
    bi = 0
    off, end = blocks[0][0], blocks[0][0] + blocks[0][1]
    while len(out) < nmsgs:
        if off + 8 > end:
            bi += 1
            if bi >= len(blocks):
                raise Hdf5LiteError("object header truncated")
            off, end = blocks[bi][0], blocks[bi][0] + blocks[bi][1]
            continue
        mtype = _u(buf, off, 2)
        msize = _u(buf, off + 2, 2)
        body = buf[off + 8 : off + 8 + msize]
        off += 8 + msize
        if mtype == MSG_CONTINUATION:
            blocks.append((_u(body, 0, 8), _u(body, 8, 8)))
        out.append((mtype, body))
    return out


def _dataspace(body: bytes) -> tuple[int, ...]:
    version, ndims = body[0], body[1]
    if version == 1:
        dims_at = 8
    elif version == 2:
        dims_at = 4
    else:
        raise Hdf5LiteError(f"dataspace v{version} unsupported")
    return tuple(_u(body, dims_at + 8 * i, 8) for i in range(ndims))


def _datatype(body: bytes) -> np.dtype:
    cls = body[0] & 0x0F
    bit0 = body[1]
    size = _u(body, 4, 4)
    if bit0 & 0x01 and cls in (0, 1):
        raise Hdf5LiteError("big-endian datatypes unsupported")
    if cls == 0:  # fixed-point; bit 3 of the first flag byte = signed
        sign = "i" if bit0 & 0x08 else "u"
        return np.dtype(f"<{sign}{size}")
    if cls == 1:  # IEEE float
        return np.dtype(f"<f{size}")
    if cls == 3:  # fixed-length string
        return np.dtype(f"S{size}")
    raise Hdf5LiteError(f"datatype class {cls} unsupported (subset: int/float/str)")


def _layout(body: bytes) -> tuple[int, int]:
    version = body[0]
    if version != 3:
        raise Hdf5LiteError(f"layout message v{version} unsupported")
    lclass = body[1]
    if lclass != 1:
        raise Hdf5LiteError("non-contiguous layout unsupported (subset: contiguous)")
    return _u(body, 2, 8), _u(body, 10, 8)


def _heap_string(buf: bytes, heap_addr: int, name_off: int) -> str:
    if buf[heap_addr : heap_addr + 4] != b"HEAP":
        raise Hdf5LiteError("bad local heap signature")
    data_addr = _u(buf, heap_addr + 24, 8)
    start = data_addr + name_off
    return buf[start : buf.index(b"\x00", start)].decode("utf-8")


def _group_entries(buf: bytes, btree_addr: int, heap_addr: int) -> list[tuple[str, int]]:
    """(name, object-header address) pairs under one group node."""
    if buf[btree_addr : btree_addr + 4] != b"TREE":
        raise Hdf5LiteError("bad B-tree signature")
    node_type, level = buf[btree_addr + 4], buf[btree_addr + 5]
    if node_type != 0:
        raise Hdf5LiteError("non-group B-tree node")
    n = _u(buf, btree_addr + 6, 2)
    # keys (8) and child pointers (8) alternate after the 24-byte header
    children = [_u(buf, btree_addr + 24 + 8 + i * 16, 8) for i in range(n)]
    entries: list[tuple[str, int]] = []
    for child in children:
        if level > 0:
            entries.extend(_group_entries_at_level(buf, child, heap_addr, level - 1))
            continue
        entries.extend(_snod_entries(buf, child, heap_addr))
    return entries


def _group_entries_at_level(
    buf: bytes, addr: int, heap_addr: int, level: int
) -> list[tuple[str, int]]:
    n = _u(buf, addr + 6, 2)
    children = [_u(buf, addr + 24 + 8 + i * 16, 8) for i in range(n)]
    out: list[tuple[str, int]] = []
    for child in children:
        if level > 0:
            out.extend(_group_entries_at_level(buf, child, heap_addr, level - 1))
        else:
            out.extend(_snod_entries(buf, child, heap_addr))
    return out


def _snod_entries(buf: bytes, addr: int, heap_addr: int) -> list[tuple[str, int]]:
    if buf[addr : addr + 4] != b"SNOD":
        raise Hdf5LiteError("bad symbol-table node signature")
    nsyms = _u(buf, addr + 6, 2)
    out = []
    for i in range(nsyms):
        e = addr + 8 + 40 * i
        name = _heap_string(buf, heap_addr, _u(buf, e, 8))
        out.append((name, _u(buf, e + 8, 8)))
    return out


def read_hdf5(buf: bytes) -> dict[str, np.ndarray]:
    """Parse root-level datasets of an HDF5 file within the subset.

    Returns {dataset name: numpy array}; fixed-length string datasets
    come back as ``S``-dtype arrays (callers decode).
    """
    root = _superblock(buf)
    btree_addr = heap_addr = None
    for mtype, body in _messages(buf, root):
        if mtype == MSG_SYMBOL_TABLE:
            btree_addr, heap_addr = _u(body, 0, 8), _u(body, 8, 8)
    if btree_addr is None:
        raise Hdf5LiteError("root group has no symbol table (new-style groups?)")
    if btree_addr == UNDEFINED:
        return {}  # empty group
    out: dict[str, np.ndarray] = {}
    for name, ohdr in _group_entries(buf, btree_addr, heap_addr):
        dims = dtype = layout = None
        for mtype, body in _messages(buf, ohdr):
            if mtype == MSG_DATASPACE:
                dims = _dataspace(body)
            elif mtype == MSG_DATATYPE:
                dtype = _datatype(body)
            elif mtype == MSG_LAYOUT:
                layout = _layout(body)
        if dims is None or dtype is None or layout is None:
            continue  # a sub-group or non-dataset object: skip
        addr, nbytes = layout
        count = int(np.prod(dims)) if dims else 1
        if addr == UNDEFINED or count == 0:
            out[name] = np.empty(dims, dtype=dtype)
            continue
        if nbytes < count * dtype.itemsize:
            raise Hdf5LiteError(f"dataset {name!r}: stored size too small")
        arr = np.frombuffer(buf, dtype=dtype, count=count, offset=addr)
        out[name] = arr.reshape(dims)
    return out
