"""Minimal pure-NumPy HDF5 reader for Keras weight checkpoints.

A Keras v3 ``.keras`` archive is a zip holding ``config.json`` plus
``model.weights.h5`` — an HDF5 file.  This container has no TensorFlow
and no h5py, so loading a reference user's artifact directly needs a
reader for the SUBSET of HDF5 that weight checkpoints actually use:

* superblock v0/v1 (libhdf5 default) and v2/v3 (``libver='latest'``)
* object headers v1 and v2 (``OHDR``)
* "old-style" groups (symbol-table message -> v1 B-tree -> SNOD nodes
  -> local heap names) and "new-style" compact groups (link messages)
* contiguous and compact dataset layouts
* fixed-point and IEEE-float datatypes, little- or big-endian

Everything here is implemented from the public HDF5 File Format
Specification (v3, hdfgroup.org).  Features a weight checkpoint never
uses (chunked/filtered layouts, dense link storage via fractal heaps,
variable-length types) raise ``H5Unsupported`` with guidance to run the
one-step TF-environment export instead (``keras_bridge`` CLI) — fail
loudly, never mis-read.

Scale note: model weights are driver-side metadata (a few MB); this
never touches the Spark executors.
"""

from __future__ import annotations

import struct

import numpy as np

SIGNATURE = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF


class H5Unsupported(Exception):
    """Input uses HDF5 features outside the checkpoint subset."""


def _u(data: bytes, off: int, n: int) -> int:
    return int.from_bytes(data[off : off + n], "little")


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        if data[:8] != SIGNATURE:
            raise H5Unsupported("not an HDF5 file (bad signature)")
        ver = data[8]
        if ver in (0, 1):
            # v0/v1 superblock: sizes at fixed offsets, root symbol
            # table entry at the end of the superblock.
            self.off_size = data[13]
            self.len_size = data[14]
            root_entry = 24 if ver == 0 else 28
            root_entry += 4 * self.off_size  # base/free/eof/driver addrs
            # symbol table entry: link name offset, object header addr
            self.root = _u(data, root_entry + self.off_size, self.off_size)
        elif ver in (2, 3):
            self.off_size = data[9]
            self.len_size = data[10]
            # flags(1) base(8) ext(8) eof(8) root objhdr(8) checksum(4)
            self.root = _u(data, 12 + 3 * self.off_size, self.off_size)
        else:
            raise H5Unsupported(f"superblock version {ver}")
        if self.off_size != 8 or self.len_size != 8:
            raise H5Unsupported("only 8-byte offsets/lengths supported")

    # ---- object headers -------------------------------------------------

    def messages(self, addr: int) -> list[tuple[int, bytes]]:
        """All (type, body) messages of the object header at ``addr``,
        following continuation blocks."""
        d = self.d
        out: list[tuple[int, bytes]] = []
        if d[addr : addr + 4] == b"OHDR":  # version 2
            flags = d[addr + 5]
            pos = addr + 6
            if flags & 0x20:
                pos += 8  # access/mod/change/birth times
            if flags & 0x10:
                pos += 4  # max compact / min dense
            size_bytes = 1 << (flags & 0x3)
            chunk0 = _u(d, pos, size_bytes)
            pos += size_bytes
            self._v2_msgs(pos, chunk0, flags, out)
        else:  # version 1
            if d[addr] != 1:
                raise H5Unsupported(f"object header version {d[addr]}")
            nmsg = _u(d, addr + 2, 2)
            hdr_size = _u(d, addr + 8, 4)
            self._v1_msgs(addr + 16, hdr_size, nmsg, out)
        return out

    def _v1_msgs(self, pos: int, size: int, nmax: int, out: list) -> None:
        d = self.d
        end = pos + size
        while pos + 8 <= end and len(out) < nmax:
            mtype = _u(d, pos, 2)
            msize = _u(d, pos + 2, 2)
            body = d[pos + 8 : pos + 8 + msize]
            pos += 8 + msize
            pos += (8 - pos % 8) % 8
            if mtype == 0x0010:  # continuation: offset(8) + length(8)
                self._v1_msgs(_u(body, 0, 8), _u(body, 8, 8), nmax, out)
            elif mtype != 0x0000:
                out.append((mtype, body))

    def _v2_msgs(self, pos: int, size: int, flags: int, out: list) -> None:
        d = self.d
        end = pos + size - 4  # gap/checksum tail
        while pos + 4 <= end:
            mtype = d[pos]
            msize = _u(d, pos + 1, 2)
            pos += 4
            if flags & 0x4:
                pos += 2  # creation order
            body = d[pos : pos + msize]
            pos += msize
            if mtype == 0x10:
                # v2 continuation blocks start with an OCHK signature
                caddr, clen = _u(body, 0, 8), _u(body, 8, 8)
                if d[caddr : caddr + 4] != b"OCHK":
                    raise H5Unsupported("bad OCHK continuation")
                self._v2_msgs(caddr + 4, clen - 4, flags, out)
            elif mtype != 0x00:
                out.append((mtype, body))

    # ---- groups ---------------------------------------------------------

    def group_links(self, addr: int) -> dict[str, int] | None:
        """name -> child object-header address, or None if ``addr`` is
        not a group."""
        links: dict[str, int] = {}
        is_group = False
        for mtype, body in self.messages(addr):
            if mtype == 0x0011:  # symbol table: btree addr + heap addr
                is_group = True
                btree, heap = _u(body, 0, 8), _u(body, 8, 8)
                self._walk_btree(btree, heap, links)
            elif mtype == 0x0006:  # link message (compact new-style)
                is_group = True
                name, child = self._parse_link(body)
                links[name] = child
            elif mtype == 0x0002:  # link info
                is_group = True
                # fractal-heap address != UNDEF means dense storage
                fheap = _u(body, -16, 8)
                if fheap != UNDEF:
                    raise H5Unsupported("dense link storage (fractal heap)")
        return links if is_group else None

    def _parse_link(self, body: bytes) -> tuple[str, int]:
        ver, flags = body[0], body[1]
        pos = 2
        if flags & 0x8:
            if body[pos] != 0:
                raise H5Unsupported("soft/external link")
            pos += 1
        if flags & 0x4:
            pos += 8  # creation order
        if flags & 0x10:
            pos += 1  # charset
        nlen_size = 1 << (flags & 0x3)
        nlen = _u(body, pos, nlen_size)
        pos += nlen_size
        name = body[pos : pos + nlen].decode()
        pos += nlen
        return name, _u(body, pos, 8)  # hard link: objhdr address

    def _walk_btree(self, addr: int, heap: int, links: dict) -> None:
        d = self.d
        if d[addr : addr + 4] != b"TREE":
            raise H5Unsupported("bad group B-tree signature")
        level = d[addr + 5]
        n = _u(d, addr + 6, 2)
        heap_data = _u(d, heap + 24, 8)  # local heap data segment addr
        pos = addr + 8 + 2 * 8  # skip siblings
        pos += 8  # key 0
        for _ in range(n):
            child = _u(d, pos, 8)
            pos += 8 + 8  # child + next key
            if level > 0:
                self._walk_btree(child, heap, links)
                continue
            if d[child : child + 4] != b"SNOD":
                raise H5Unsupported("bad symbol-table node")
            nsym = _u(d, child + 6, 2)
            epos = child + 8
            for _ in range(nsym):
                name_off = _u(d, epos, 8)
                objhdr = _u(d, epos + 8, 8)
                end = d.index(b"\x00", heap_data + name_off)
                links[d[heap_data + name_off : end].decode()] = objhdr
                epos += 40

    # ---- datasets -------------------------------------------------------

    def dataset(self, addr: int) -> np.ndarray | None:
        dims: tuple[int, ...] | None = None
        dtype: np.dtype | None = None
        raw: bytes | None = None
        for mtype, body in self.messages(addr):
            if mtype == 0x0001:  # dataspace
                ver = body[0]
                ndim = body[1]
                start = 8 if ver == 1 else 4
                dims = tuple(
                    _u(body, start + 8 * i, 8) for i in range(ndim)
                )
            elif mtype == 0x0003:  # datatype
                dtype = self._dtype(body)
            elif mtype == 0x0008:  # layout
                raw = self._layout(body)
        if dims is None or dtype is None or raw is None:
            return None
        n = int(np.prod(dims)) if dims else 1
        return (
            np.frombuffer(raw, dtype=dtype, count=n)
            .reshape(dims)
            .copy()
        )

    def _dtype(self, body: bytes) -> np.dtype:
        cls = body[0] & 0x0F
        bits = body[1]
        size = _u(body, 4, 4)
        endian = ">" if bits & 0x1 else "<"
        if cls == 0:  # fixed-point
            kind = "i" if bits & 0x8 else "u"
        elif cls == 1:  # IEEE float
            kind = "f"
        else:
            raise H5Unsupported(f"datatype class {cls}")
        return np.dtype(f"{endian}{kind}{size}")

    def _layout(self, body: bytes) -> bytes:
        ver = body[0]
        if ver != 3:
            raise H5Unsupported(f"data layout version {ver}")
        lclass = body[1]
        if lclass == 0:  # compact: size(2) + inline data
            size = _u(body, 2, 2)
            return body[4 : 4 + size]
        if lclass == 1:  # contiguous: address(8) + size(8)
            a, s = _u(body, 2, 8), _u(body, 10, 8)
            return self.d[a : a + s]
        raise H5Unsupported("chunked/virtual dataset layout")


def read_datasets(data: bytes) -> dict[str, np.ndarray]:
    """All datasets in the file as ``{"/group/.../name": array}``."""
    r = _Reader(data)
    out: dict[str, np.ndarray] = {}

    def visit(addr: int, path: str) -> None:
        links = r.group_links(addr)
        if links is None:
            arr = r.dataset(addr)
            if arr is not None:
                out[path] = arr
            return
        for name, child in sorted(links.items()):
            visit(child, f"{path}/{name}")

    visit(r.root, "")
    return out
