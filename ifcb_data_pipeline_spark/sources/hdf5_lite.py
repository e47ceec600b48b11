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
* chunked data layout (layout message v3 class 2) via the v1 raw-data
  B-tree, with the deflate/gzip filter (id 1) — the layout real CNN
  score files use (h5 writers chunk+deflate by default,
  ``convert_h5_to_irfcb_format.R:48-65``); edge chunks are clipped
* fixed-point, IEEE floating-point and fixed-length string datatypes

No non-deflate filters, no variable-length types, no superblock v2+ —
files outside the subset raise :class:`Hdf5LiteError` so callers can
fall back to the injected h5py parser.
"""

from __future__ import annotations

import zlib

import numpy as np

SIGNATURE = b"\x89HDF\r\n\x1a\n"
UNDEFINED = 0xFFFFFFFFFFFFFFFF

MSG_NIL = 0x0000
MSG_DATASPACE = 0x0001
MSG_DATATYPE = 0x0003
MSG_LAYOUT = 0x0008
MSG_FILTER_PIPELINE = 0x000B
MSG_CONTINUATION = 0x0010
MSG_SYMBOL_TABLE = 0x0011

FILTER_DEFLATE = 1


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
        # v2/v3 superblocks come from h5py's libver='latest' (and some
        # modern writers); they relocate every root-group structure, so
        # nothing past this byte can be parsed by the v0 reader.  The
        # supported escape hatch is the parser seam: pass a real h5py
        # parser to sources.binary_formats.h5_class_scan(parser=...)
        # (reference convert_h5_to_irfcb_format.R:48-65 reads these via
        # rhdf5 the same way).
        raise Hdf5LiteError(
            f"superblock v{version} unsupported (pure-Python subset reads "
            "v0 only; files written with libver='latest' use v2/v3 — "
            "inject an h5py-backed parser via "
            "binary_formats.h5_class_scan(parser=...) for these)"
        )
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


def _layout(body: bytes):
    """('contiguous', addr, nbytes) or ('chunked', btree_addr, chunk_dims).

    Chunked (v3 class 2) body: dimensionality (= rank+1, the trailing
    entry being the element size), the chunk B-tree address, then that
    many 4-byte chunk dimensions."""
    version = body[0]
    if version != 3:
        raise Hdf5LiteError(f"layout message v{version} unsupported")
    lclass = body[1]
    if lclass == 1:
        return "contiguous", _u(body, 2, 8), _u(body, 10, 8)
    if lclass == 2:
        ndims = body[2]
        btree = _u(body, 3, 8)
        dims = tuple(_u(body, 11 + 4 * i, 4) for i in range(ndims))
        return "chunked", btree, dims[:-1]  # drop the element-size entry
    raise Hdf5LiteError("layout class unsupported (subset: contiguous/chunked)")


def _filters(body: bytes) -> list[int]:
    """Filter ids from a v1 filter-pipeline message, in pipeline order."""
    version, nfilters = body[0], body[1]
    if version != 1:
        raise Hdf5LiteError(f"filter pipeline v{version} unsupported")
    ids, off = [], 8
    for _ in range(nfilters):
        fid = _u(body, off, 2)
        name_len = _u(body, off + 2, 2)
        n_client = _u(body, off + 6, 2)
        off += 8 + name_len + 4 * n_client
        if n_client % 2:  # odd client-value count pads to 8 bytes
            off += 4
        ids.append(fid)
    return ids


def _chunk_entries(buf: bytes, addr: int, rank: int) -> list[tuple[int, int, tuple[int, ...], int]]:
    """(stored nbytes, filter mask, chunk offsets, data address) for every
    chunk under a v1 raw-data B-tree node, recursing through levels."""
    if buf[addr : addr + 4] != b"TREE":
        raise Hdf5LiteError("bad chunk B-tree signature")
    node_type, level = buf[addr + 4], buf[addr + 5]
    if node_type != 1:
        raise Hdf5LiteError("not a raw-data chunk B-tree node")
    n = _u(buf, addr + 6, 2)
    key_size = 8 + 8 * (rank + 1)  # size+mask, then rank+1 8-byte offsets
    out: list[tuple[int, int, tuple[int, ...], int]] = []
    off = addr + 24
    for _ in range(n):
        nbytes = _u(buf, off, 4)
        mask = _u(buf, off + 4, 4)
        offsets = tuple(_u(buf, off + 8 + 8 * i, 8) for i in range(rank))
        child = _u(buf, off + key_size, 8)
        if level > 0:
            out.extend(_chunk_entries(buf, child, rank))
        else:
            out.append((nbytes, mask, offsets, child))
        off += key_size + 8
    return out


def _read_chunked(
    buf: bytes,
    btree_addr: int,
    chunk_dims: tuple[int, ...],
    dims: tuple[int, ...],
    dtype: np.dtype,
    filters: list[int],
) -> np.ndarray:
    for fid in filters:
        if fid != FILTER_DEFLATE:
            raise Hdf5LiteError(f"filter id {fid} unsupported (subset: deflate)")
    out = np.zeros(dims, dtype=dtype)
    if btree_addr == UNDEFINED:
        return out  # no chunks written: fill value (zeros)
    rank = len(dims)
    csize = int(np.prod(chunk_dims)) * dtype.itemsize
    for nbytes, mask, offsets, child in _chunk_entries(buf, btree_addr, rank):
        raw = bytes(buf[child : child + nbytes])
        # bit i of the mask EXCLUDES filter i for this chunk
        if FILTER_DEFLATE in filters and not (mask & 1):
            raw = zlib.decompress(raw)
        if len(raw) < csize:
            raise Hdf5LiteError("chunk smaller than chunk size after filters")
        chunk = np.frombuffer(raw, dtype=dtype, count=int(np.prod(chunk_dims)))
        chunk = chunk.reshape(chunk_dims)
        # clip the edge chunks to the dataspace
        dest = tuple(
            slice(o, min(o + c, d)) for o, c, d in zip(offsets, chunk_dims, dims)
        )
        src = tuple(slice(0, s.stop - s.start) for s in dest)
        out[dest] = chunk[src]
    return out


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
        filters: list[int] = []
        for mtype, body in _messages(buf, ohdr):
            if mtype == MSG_DATASPACE:
                dims = _dataspace(body)
            elif mtype == MSG_DATATYPE:
                dtype = _datatype(body)
            elif mtype == MSG_LAYOUT:
                layout = _layout(body)
            elif mtype == MSG_FILTER_PIPELINE:
                filters = _filters(body)
        if dims is None or dtype is None or layout is None:
            continue  # a sub-group or non-dataset object: skip
        if layout[0] == "chunked":
            _, chunk_btree, chunk_dims = layout
            out[name] = _read_chunked(buf, chunk_btree, chunk_dims, dims, dtype, filters)
            continue
        _, addr, nbytes = layout
        if filters:
            raise Hdf5LiteError("filters on contiguous layout unsupported")
        count = int(np.prod(dims)) if dims else 1
        if addr == UNDEFINED or count == 0:
            out[name] = np.empty(dims, dtype=dtype)
            continue
        if nbytes < count * dtype.itemsize:
            raise Hdf5LiteError(f"dataset {name!r}: stored size too small")
        arr = np.frombuffer(buf, dtype=dtype, count=count, offset=addr)
        out[name] = arr.reshape(dims)
    return out
