"""Spec-built HDF5 fixture bytes (no h5py in this container).

Writes the same subset ``sources/hdf5_lite.py`` reads — superblock v0,
v1 object headers, one root group (B-tree + local heap + one SNOD),
contiguous datasets — following the public HDF5 file format spec, the
way ``tests/test_sources.py`` builds MAT v5 fixtures from the MAT spec.
The writer is test-only on purpose: the engine never needs to *produce*
HDF5, only scan it (S5).
"""

from __future__ import annotations

import itertools
import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


def _align(n: int, a: int = 8) -> int:
    return (n + a - 1) // a * a


def _datatype_msg(dt: np.dtype) -> bytes:
    if dt.kind in ("i", "u"):
        head = bytes([0x10 | 0, 0x08 if dt.kind == "i" else 0x00, 0, 0])
        head += struct.pack("<I", dt.itemsize)
        props = struct.pack("<HH", 0, dt.itemsize * 8)  # bit offset, precision
        return head + props
    if dt.kind == "f":
        head = bytes([0x10 | 1, 0x20, 0x3F if dt.itemsize == 4 else 0x7F, 0])
        head += struct.pack("<I", dt.itemsize)
        if dt.itemsize == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        return head + props
    if dt.kind == "S":
        head = bytes([0x10 | 3, 0, 0, 0]) + struct.pack("<I", dt.itemsize)
        return head
    raise ValueError(f"unsupported fixture dtype {dt}")


def _message(mtype: int, body: bytes) -> bytes:
    body = body + b"\x00" * (_align(len(body)) - len(body))
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _dataset_header(shape: tuple[int, ...], dt: np.dtype, data_addr: int, nbytes: int) -> bytes:
    space = struct.pack("<BB6x", 1, len(shape)) + b"".join(
        struct.pack("<Q", d) for d in shape
    )
    msgs = (
        _message(0x0001, space)
        + _message(0x0003, _datatype_msg(dt))
        + _message(0x0008, struct.pack("<BBQQ", 3, 1, data_addr, nbytes))
    )
    hdr = struct.pack("<BxHII4x", 1, 3, 1, len(msgs))
    return hdr + msgs


def _dataset_header_chunked(
    shape: tuple[int, ...],
    dt: np.dtype,
    btree_addr: int,
    chunk_shape: tuple[int, ...],
    gzip_level: int,
) -> bytes:
    """v1 object header for a chunked+deflate dataset: dataspace,
    datatype, filter pipeline (deflate, one client value = level), and a
    v3 class-2 layout pointing at the chunk B-tree."""
    space = struct.pack("<BB6x", 1, len(shape)) + b"".join(
        struct.pack("<Q", d) for d in shape
    )
    filt = (
        struct.pack("<BB6x", 1, 1)
        + struct.pack("<HHHH", 1, 0, 0, 1)  # id=deflate, no name, 1 value
        + struct.pack("<I", gzip_level)
        + b"\x00" * 4  # odd client-value count pads to 8
    )
    layout = (
        struct.pack("<BBB", 3, 2, len(shape) + 1)
        + struct.pack("<Q", btree_addr)
        + b"".join(struct.pack("<I", c) for c in chunk_shape)
        + struct.pack("<I", dt.itemsize)
    )
    msgs = (
        _message(0x0001, space)
        + _message(0x0003, _datatype_msg(dt))
        + _message(0x000B, filt)
        + _message(0x0008, layout)
    )
    hdr = struct.pack("<BxHII4x", 1, 4, 1, len(msgs))
    return hdr + msgs


def _chunk_blobs(
    a: np.ndarray, chunk_shape: tuple[int, ...], gzip_level: int
) -> list[tuple[tuple[int, ...], bytes]]:
    """(chunk offsets, deflate blob) per chunk; edge chunks zero-padded
    to the full chunk shape, as real writers store them."""
    grid = [range(0, d, c) for d, c in zip(a.shape, chunk_shape)]
    out = []
    for offs in itertools.product(*grid):
        full = np.zeros(chunk_shape, dtype=a.dtype)
        src = tuple(
            slice(o, min(o + c, d)) for o, c, d in zip(offs, chunk_shape, a.shape)
        )
        full[tuple(slice(0, s.stop - s.start) for s in src)] = a[src]
        out.append((offs, zlib.compress(full.tobytes(), gzip_level)))
    return out


def _chunk_btree(
    blobs: list[tuple[tuple[int, ...], bytes]],
    rank: int,
    data_addrs: list[int],
) -> bytes:
    """One level-0 v1 raw-data B-tree node covering every chunk."""
    key_size = 8 + 8 * (rank + 1)
    bt = b"TREE" + bytes([1, 0]) + struct.pack("<H", len(blobs))
    bt += struct.pack("<QQ", UNDEF, UNDEF)
    for (offs, blob), addr in zip(blobs, data_addrs):
        bt += struct.pack("<II", len(blob), 0)  # stored size, filter mask
        bt += b"".join(struct.pack("<Q", o) for o in offs) + struct.pack("<Q", 0)
        bt += struct.pack("<Q", addr)
    bt += b"\x00" * key_size  # the trailing (n+1)-th key
    return bt


def chunk_btree_size(n_chunks: int, rank: int) -> int:
    key_size = 8 + 8 * (rank + 1)
    return 24 + n_chunks * (key_size + 8) + key_size


def write_hdf5(
    datasets: dict[str, np.ndarray],
    chunks: dict[str, tuple[int, ...]] | None = None,
    gzip_level: int = 6,
) -> bytes:
    """Serialize {name: array} as a flat HDF5 file within the subset.

    Datasets named in ``chunks`` are written chunked+deflate (v1 chunk
    B-tree, zero-padded edge chunks) — the layout real h5 writers emit;
    the rest stay contiguous."""
    arrays = {
        name: np.ascontiguousarray(a) for name, a in datasets.items()
    }
    names = list(arrays)
    chunks = chunks or {}

    # ---- local heap data segment: names, null-terminated, 8-aligned;
    # offset 0 reserved (an 8-byte free-block stub, as real files do).
    heap_data = bytearray(b"\x00" * 8)
    name_off: dict[str, int] = {}
    for n in names:
        name_off[n] = len(heap_data)
        raw = n.encode() + b"\x00"
        heap_data += raw + b"\x00" * (_align(len(raw)) - len(raw))

    # ---- fixed-size pieces laid out back to back from offset 0
    superblock_size = 96
    root_hdr_size = 16 + len(_message(0x0011, b"\x00" * 16))
    heap_hdr_size = 32
    btree_size = 24 + 24  # one SNOD child: key0, ptr, key1
    snod_size = 8 + 40 * len(names)

    sb_at = 0
    root_at = sb_at + superblock_size
    heap_at = root_at + root_hdr_size
    heap_data_at = heap_at + heap_hdr_size
    btree_at = heap_data_at + len(heap_data)
    snod_at = btree_at + btree_size

    # dataset object headers, then raw data (chunked: B-tree then blobs)
    blobs: dict[str, list[tuple[tuple[int, ...], bytes]]] = {
        n: _chunk_blobs(arrays[n], chunks[n], gzip_level) for n in chunks
    }
    ds_hdr_at: dict[str, int] = {}
    cursor = snod_at + snod_size
    for n in names:
        ds_hdr_at[n] = cursor
        if n in chunks:
            cursor += len(
                _dataset_header_chunked(
                    arrays[n].shape, arrays[n].dtype, 0, chunks[n], gzip_level
                )
            )
        else:
            cursor += len(_dataset_header(arrays[n].shape, arrays[n].dtype, 0, 0))
    data_at: dict[str, int] = {}
    blob_at: dict[str, list[int]] = {}
    for n in names:
        data_at[n] = cursor
        if n in chunks:
            cursor += chunk_btree_size(len(blobs[n]), arrays[n].ndim)
            addrs = []
            for _, blob in blobs[n]:
                addrs.append(cursor)
                cursor += _align(len(blob))
            blob_at[n] = addrs
        else:
            cursor += _align(arrays[n].nbytes)
    eof = cursor

    out = bytearray(eof)

    # superblock v0
    sb = b"\x89HDF\r\n\x1a\n" + bytes([0, 0, 0, 0, 0, 8, 8, 0])
    sb += struct.pack("<HHI", 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    sb += struct.pack("<QQII16x", 0, root_at, 0, 0)  # root symbol-table entry
    out[sb_at : sb_at + len(sb)] = sb

    # root group object header: one symbol-table message
    stab = _message(0x0011, struct.pack("<QQ", btree_at, heap_at))
    root = struct.pack("<BxHII4x", 1, 1, 1, len(stab)) + stab
    out[root_at : root_at + len(root)] = root

    # local heap
    heap = b"HEAP" + bytes([0, 0, 0, 0]) + struct.pack(
        "<QQQ", len(heap_data), 0, heap_data_at
    )
    out[heap_at : heap_at + len(heap)] = heap
    out[heap_data_at : heap_data_at + len(heap_data)] = heap_data

    # group B-tree: one leaf entry pointing at the SNOD
    bt = b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
    bt += struct.pack("<QQ", UNDEF, UNDEF)
    last = name_off[sorted(names)[-1]] if names else 0
    bt += struct.pack("<QQQ", 0, snod_at, last)
    out[btree_at : btree_at + len(bt)] = bt

    # SNOD entries must be in increasing-name order
    sn = b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(names))
    for n in sorted(names):
        sn += struct.pack("<QQII16x", name_off[n], ds_hdr_at[n], 0, 0)
    out[snod_at : snod_at + len(sn)] = sn

    for n in names:
        a = arrays[n]
        if n in chunks:
            hdr = _dataset_header_chunked(
                a.shape, a.dtype, data_at[n], chunks[n], gzip_level
            )
            out[ds_hdr_at[n] : ds_hdr_at[n] + len(hdr)] = hdr
            bt = _chunk_btree(blobs[n], a.ndim, blob_at[n])
            out[data_at[n] : data_at[n] + len(bt)] = bt
            for (_, blob), addr in zip(blobs[n], blob_at[n]):
                out[addr : addr + len(blob)] = blob
        else:
            hdr = _dataset_header(a.shape, a.dtype, data_at[n], _align(a.nbytes))
            out[ds_hdr_at[n] : ds_hdr_at[n] + len(hdr)] = hdr
            raw = a.tobytes()
            out[data_at[n] : data_at[n] + len(raw)] = raw

    return bytes(out)
