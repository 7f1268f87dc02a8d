"""Test-only minimal HDF5 WRITER (public File Format Spec v0 layout).

Produces the classic libhdf5 default structure — superblock v0, v1
object headers, old-style groups (symbol-table message -> v1 B-tree ->
SNOD -> local heap), contiguous little-endian datasets — to validate
the engine's pure-NumPy reader (`ml/h5lite.py`) against the spec
rather than against itself-in-memory.  Just enough for Keras-style
weight checkpoints; not a general writer.
"""

from __future__ import annotations

import struct

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


class H5Writer:
    def __init__(self) -> None:
        # reserve the 96-byte v0 superblock; filled in finish()
        self.buf = bytearray(96)

    def _alloc(self, data: bytes) -> int:
        addr = len(self.buf)
        self.buf += data
        pad = (-len(self.buf)) % 8
        self.buf += b"\x00" * pad
        return addr

    # ---- object headers (v1) -------------------------------------------

    def _object_header(self, messages: list[tuple[int, bytes]]) -> int:
        body = bytearray()
        for mtype, mbody in messages:
            padded = mbody + b"\x00" * ((-len(mbody)) % 8)
            body += struct.pack("<HHB3x", mtype, len(padded), 0)
            body += padded
        hdr = struct.pack("<BxHI", 1, len(messages), 1)  # ver, nmsg, refcnt
        hdr += struct.pack("<I4x", len(body))
        return self._alloc(hdr + bytes(body))

    # ---- datasets -------------------------------------------------------

    def dataset(self, arr: np.ndarray) -> int:
        arr = np.ascontiguousarray(arr)
        kind = arr.dtype.kind
        size = arr.dtype.itemsize
        if kind == "f":
            # IEEE float LE: class 1, bit field 0x20 (sign loc unused
            # flags zeroed besides mantissa norm), properties per spec
            cls_ver = 0x11
            if size == 8:
                props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
                bits = b"\x20\x3f\x00"
            else:
                props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
                bits = b"\x20\x1f\x00"
            dt = struct.pack("<B3sI", cls_ver, bits, size) + props
        elif kind in "iu":
            cls_ver = 0x10
            bits = bytes([0x08 if kind == "i" else 0x00, 0, 0])
            dt = struct.pack("<B3sI", cls_ver, bits, size)
            dt += struct.pack("<HH", 0, size * 8)
        else:
            raise ValueError(f"unsupported dtype {arr.dtype}")
        if arr.dtype.byteorder == ">":
            raise ValueError("little-endian only")

        raw = arr.tobytes()
        data_addr = self._alloc(raw)
        dims = b"".join(struct.pack("<Q", d) for d in arr.shape)
        dataspace = struct.pack("<BB B5x", 1, arr.ndim, 0) + dims
        layout = struct.pack("<BB", 3, 1) + struct.pack(
            "<QQ", data_addr, len(raw)
        )
        return self._object_header(
            [(0x0001, dataspace), (0x0003, dt), (0x0008, layout)]
        )

    # ---- groups ---------------------------------------------------------

    def group(self, children: dict[str, int]) -> int:
        """children: name -> object header address.  Returns the group's
        object header address."""
        # local heap: NUL-terminated names (first byte reserved so no
        # name sits at offset 0, which the root entry uses)
        heap_data = bytearray(b"\x00" * 8)
        offsets: dict[str, int] = {}
        for name in sorted(children):
            offsets[name] = len(heap_data)
            heap_data += name.encode() + b"\x00"
        heap_data += b"\x00" * ((-len(heap_data)) % 8)
        heap_data_addr = self._alloc(bytes(heap_data))
        heap_addr = self._alloc(
            b"HEAP"
            + struct.pack(
                "<B3xQQQ", 0, len(heap_data), UNDEF, heap_data_addr
            )
        )
        # one SNOD with every entry (sorted by name per spec)
        entries = b""
        for name in sorted(children):
            entries += struct.pack(
                "<QQI4x16x", offsets[name], children[name], 0
            )
        snod = self._alloc(
            b"SNOD" + struct.pack("<BxH", 1, len(children)) + entries
        )
        # B-tree: level 0, 1 child; keys = heap offsets of min/max names
        first = offsets[min(children)] if children else 0
        last = offsets[max(children)] if children else 0
        btree = self._alloc(
            b"TREE"
            + struct.pack("<BBH", 0, 0, 1)
            + struct.pack("<QQ", UNDEF, UNDEF)
            + struct.pack("<QQQ", first, snod, last)
        )
        symtab = struct.pack("<QQ", btree, heap_addr)
        return self._object_header([(0x0011, symtab)])

    def finish(self, root_addr: int) -> bytes:
        sb = bytearray()
        sb += b"\x89HDF\r\n\x1a\n"
        sb += struct.pack(
            "<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0
        )  # versions + offset/length sizes
        sb += struct.pack("<HHI", 4, 16, 0)  # leaf k, internal k, flags
        sb += struct.pack("<QQQQ", 0, UNDEF, len(self.buf), UNDEF)
        # root symbol table entry (cache type 0)
        sb += struct.pack("<QQI4x16x", 0, root_addr, 0)
        self.buf[: len(sb)] = sb
        return bytes(self.buf)


def write_h5(tree: dict) -> bytes:
    """``{"group": {...}, "dset": np.ndarray}`` nested dict -> HDF5
    bytes."""
    w = H5Writer()

    def emit(node) -> int:
        if isinstance(node, dict):
            return w.group({k: emit(v) for k, v in node.items()})
        return w.dataset(np.asarray(node))

    root = emit(tree)
    return w.finish(root)
