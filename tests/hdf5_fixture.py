"""Spec-built HDF5 fixture bytes (no h5py in this container).

Writes the same subset ``sources/hdf5_lite.py`` reads — superblock v0,
v1 object headers, one root group (B-tree + local heap + one SNOD),
contiguous datasets — following the public HDF5 file format spec, the
way ``tests/test_sources.py`` builds MAT v5 fixtures from the MAT spec.
The writer is test-only on purpose: the engine never needs to *produce*
HDF5, only scan it (S5).
"""

from __future__ import annotations

import struct

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


def write_hdf5(datasets: dict[str, np.ndarray]) -> bytes:
    """Serialize {name: array} as a flat HDF5 file within the subset."""
    arrays = {
        name: np.ascontiguousarray(a) for name, a in datasets.items()
    }
    names = list(arrays)

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

    # dataset object headers, then raw data
    ds_hdr_at: dict[str, int] = {}
    cursor = snod_at + snod_size
    for n in names:
        ds_hdr_at[n] = cursor
        cursor += len(_dataset_header(arrays[n].shape, arrays[n].dtype, 0, 0))
    data_at: dict[str, int] = {}
    for n in names:
        data_at[n] = cursor
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
        hdr = _dataset_header(a.shape, a.dtype, data_at[n], _align(a.nbytes))
        out[ds_hdr_at[n] : ds_hdr_at[n] + len(hdr)] = hdr
        raw = a.tobytes()
        out[data_at[n] : data_at[n] + len(raw)] = raw

    return bytes(out)
