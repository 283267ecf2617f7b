"""Minimal pure-numpy HDF5 reader (reference E1, annhdf5.rs:36-202).

The container has no h5py, but ann-benchmarks datasets are plain HDF5:
superblock version 0, root group addressed through a v1 B-tree + symbol
table, and four root-level datasets (train / test / neighbors /
distances) written contiguously with little-endian numeric types — the
exact subset this module parses. Everything is derived from the public
HDF5 File Format Specification (version 1.0/1.8 layouts); no libhdf5.

Deliberately NOT supported (clear errors instead): chunked or filtered
(compressed) layouts, v2 B-trees / fractal-heap groups (superblock v2-3
files whose groups use "link" messages are partially supported via the
Link message path), variable-length and compound datatypes, big-endian
data. ann-benchmarks files need none of these; for anything richer,
convert to Parquet offline (see FIXTURES.md) — the 100 TB path decodes
legacy formats once and lands them columnar anyway (annfile.py).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_SIGNATURE = b"\x89HDF\r\n\x1a\n"

# object-header message types (format spec IV.A.2)
_MSG_DATASPACE = 0x0001
_MSG_LINK_INFO = 0x0002
_MSG_DATATYPE = 0x0003
_MSG_LAYOUT = 0x0008
_MSG_LINK = 0x0006
_MSG_CONTINUATION = 0x0010
_MSG_SYMBOL_TABLE = 0x0011

_UNDEF = 0xFFFFFFFFFFFFFFFF


class HDF5FormatError(ValueError):
    """Unreadable or out-of-subset HDF5 structure."""


@dataclass
class _Dataset:
    shape: tuple[int, ...]
    dtype: np.dtype
    data_addr: int
    data_size: int
    compact: bytes | None = None


def _u(buf: bytes, off: int, n: int) -> int:
    return int.from_bytes(buf[off : off + n], "little")


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        # the signature may sit at offset 0, 512, 1024, ... (spec II.A)
        off = 0
        while True:
            if buf[off : off + 8] == _SIGNATURE:
                break
            off = 512 if off == 0 else off * 2
            if off + 8 > len(buf):
                raise HDF5FormatError("HDF5 signature not found")
        self.base = off
        sb_ver = buf[off + 8]
        if sb_ver in (0, 1):
            self.off_size = buf[off + 13]
            self.len_size = buf[off + 14]
            # v0: sig(8) vers(4 bytes of version fields) ... root symbol
            # table entry at fixed offset 24 + 4*offsets
            p = off + 24 + 4 * self.off_size
            self.root_header_addr = self._entry_header_addr(p)
        elif sb_ver in (2, 3):
            self.off_size = buf[off + 9]
            self.len_size = buf[off + 10]
            p = off + 12 + 3 * self.off_size  # base, ext, eof
            self.root_header_addr = _u(buf, p, self.off_size)
        else:
            raise HDF5FormatError(f"unsupported superblock version {sb_ver}")

    # -- symbol-table plumbing (v0 groups) --------------------------------

    def _entry_header_addr(self, p: int) -> int:
        # symbol table entry: link_name_offset(O), object_header_addr(O), ...
        return _u(self.buf, p + self.off_size, self.off_size)

    def _iter_symbol_entries(self, p: int):
        """Yield (name_heap_offset, header_addr) from one symbol entry."""
        name_off = _u(self.buf, p, self.off_size)
        header = _u(self.buf, p + self.off_size, self.off_size)
        yield name_off, header

    def _read_local_heap(self, addr: int) -> int:
        buf = self.buf
        if buf[addr : addr + 4] != b"HEAP":
            raise HDF5FormatError("bad local heap signature")
        # ver(1) reserved(3) data_size(L) free_head(L) data_addr(O)
        p = addr + 8 + 2 * self.len_size
        return _u(buf, p, self.off_size)

    def _walk_btree(self, addr: int, heap_data: int, out: dict[str, int]):
        buf = self.buf
        if buf[addr : addr + 4] != b"TREE":
            raise HDF5FormatError("bad v1 B-tree signature")
        node_type = buf[addr + 4]
        level = buf[addr + 5]
        used = _u(buf, addr + 6, 2)
        if node_type != 0:
            raise HDF5FormatError("non-group v1 B-tree in group walk")
        p = addr + 8 + 2 * self.off_size  # skip left/right siblings
        # keys are heap offsets (length L); children are addresses
        p += self.len_size  # key 0
        for _ in range(used):
            child = _u(buf, p, self.off_size)
            p += self.off_size + self.len_size  # child + next key
            if level > 0:
                self._walk_btree(child, heap_data, out)
            else:
                self._read_snod(child, heap_data, out)

    def _read_snod(self, addr: int, heap_data: int, out: dict[str, int]):
        buf = self.buf
        if buf[addr : addr + 4] != b"SNOD":
            raise HDF5FormatError("bad symbol node signature")
        nsyms = _u(buf, addr + 6, 2)
        entry_size = 2 * self.off_size + 4 + 4 + 16
        p = addr + 8
        for _ in range(nsyms):
            name_off = _u(buf, p, self.off_size)
            header = _u(buf, p + self.off_size, self.off_size)
            name = self._heap_string(heap_data + name_off)
            out[name] = header
            p += entry_size

    def _heap_string(self, addr: int) -> str:
        end = self.buf.index(b"\x00", addr)
        return self.buf[addr:end].decode("utf-8")

    # -- object headers ----------------------------------------------------

    def _iter_messages(self, header_addr: int):
        """Yield (msg_type, data_offset, data_size) for a v1 or v2 object
        header, following continuation blocks."""
        buf = self.buf
        if buf[header_addr : header_addr + 4] == b"OHDR":
            yield from self._iter_messages_v2(header_addr)
            return
        ver = buf[header_addr]
        if ver != 1:
            raise HDF5FormatError(f"unsupported object header version {ver}")
        nmsgs = _u(buf, header_addr + 2, 2)
        size = _u(buf, header_addr + 8, 4)
        # v1 prefix is 12 bytes padded to 16; message data 8-byte aligned
        blocks = [(header_addr + 16, size)]
        emitted = 0
        while blocks and emitted < nmsgs:
            start, length = blocks.pop(0)
            p, end = start, start + length
            while p + 8 <= end and emitted < nmsgs:
                mtype = _u(buf, p, 2)
                msize = _u(buf, p + 2, 2)
                body = p + 8
                if mtype == _MSG_CONTINUATION:
                    caddr = _u(buf, body, self.off_size)
                    clen = _u(buf, body + self.off_size, self.len_size)
                    blocks.append((caddr, clen))
                else:
                    yield mtype, body, msize
                emitted += 1
                p = body + msize

    def _iter_messages_v2(self, header_addr: int):
        buf = self.buf
        flags = buf[header_addr + 5]
        p = header_addr + 6
        if flags & 0x20:
            p += 4  # access times x2? (times are 4 fields x4 bytes)
            p += 12
        if flags & 0x10:
            p += 4  # max compact/min dense
        chunk0_len = _u(buf, p, 1 << (flags & 0x3))
        p += 1 << (flags & 0x3)
        end = p + chunk0_len
        while p + 4 <= end:
            mtype = _u(buf, p, 1)
            msize = _u(buf, p + 1, 2)
            body = p + 4 + (1 if flags & 0x4 else 0)
            if mtype == _MSG_CONTINUATION:
                caddr = _u(buf, body, self.off_size)
                clen = _u(buf, body + self.off_size, self.len_size)
                # continuation blocks in v2 start with "OCHK" + end with gap
                q, qend = caddr + 4, caddr + clen - 4
                while q + 4 <= qend:
                    t2 = _u(buf, q, 1)
                    s2 = _u(buf, q + 1, 2)
                    b2 = q + 4 + (1 if flags & 0x4 else 0)
                    yield t2, b2, s2
                    q = b2 + s2
            else:
                yield mtype, body, msize
            p = body + msize

    # -- messages -> dataset metadata --------------------------------------

    def _parse_dataspace(self, p: int) -> tuple[int, ...]:
        buf = self.buf
        ver = buf[p]
        rank = buf[p + 1]
        flags = buf[p + 2]
        if ver == 1:
            q = p + 8
        elif ver == 2:
            q = p + 4
        else:
            raise HDF5FormatError(f"unsupported dataspace version {ver}")
        dims = tuple(_u(buf, q + i * self.len_size, self.len_size) for i in range(rank))
        return dims

    def _parse_datatype(self, p: int) -> np.dtype:
        buf = self.buf
        cls_ver = buf[p]
        cls, ver = cls_ver & 0x0F, cls_ver >> 4
        bits0 = buf[p + 1]
        size = _u(buf, p + 4, 4)
        if bits0 & 0x01:
            raise HDF5FormatError("big-endian data not supported; convert offline")
        if cls == 0:  # fixed-point
            signed = bool(bits0 & 0x08)
            return np.dtype(f"{'i' if signed else 'u'}{size}")
        if cls == 1:  # IEEE float
            return np.dtype(f"f{size}")
        raise HDF5FormatError(
            f"unsupported datatype class {cls} (only int/float); convert offline"
        )

    def _parse_layout(self, p: int) -> tuple[int, int, bytes | None]:
        buf = self.buf
        ver = buf[p]
        if ver == 3:
            layout_class = buf[p + 1]
            if layout_class == 0:  # compact
                sz = _u(buf, p + 2, 2)
                return _UNDEF, sz, bytes(buf[p + 4 : p + 4 + sz])
            if layout_class == 1:  # contiguous
                addr = _u(buf, p + 2, self.off_size)
                sz = _u(buf, p + 2 + self.off_size, self.len_size)
                return addr, sz, None
            raise HDF5FormatError(
                "chunked/filtered dataset layout not supported — ann-benchmarks "
                "files are contiguous; re-export without compression or convert "
                "to Parquet offline"
            )
        raise HDF5FormatError(f"unsupported data layout version {ver}")

    def _read_dataset(self, header_addr: int) -> _Dataset:
        shape = dtype = None
        addr = size = None
        compact = None
        for mtype, body, msize in self._iter_messages(header_addr):
            if mtype == _MSG_DATASPACE:
                shape = self._parse_dataspace(body)
            elif mtype == _MSG_DATATYPE:
                dtype = self._parse_datatype(body)
            elif mtype == _MSG_LAYOUT:
                addr, size, compact = self._parse_layout(body)
        if shape is None or dtype is None or (addr is None and compact is None):
            raise HDF5FormatError("object header is not a readable dataset")
        return _Dataset(shape, dtype, addr, size, compact)

    # -- group listing ------------------------------------------------------

    def root_datasets(self) -> dict[str, int]:
        """name -> object header address for root-group members."""
        out: dict[str, int] = {}
        link_names: dict[str, int] = {}
        for mtype, body, msize in self._iter_messages(self.root_header_addr):
            if mtype == _MSG_SYMBOL_TABLE:
                btree = _u(self.buf, body, self.off_size)
                heap = _u(self.buf, body + self.off_size, self.off_size)
                heap_data = self._read_local_heap(heap)
                self._walk_btree(btree, heap_data, out)
            elif mtype == _MSG_LINK:
                name, header = self._parse_link(body)
                link_names[name] = header
        out.update(link_names)
        if not out:
            raise HDF5FormatError("no readable root-group members found")
        return out

    def _parse_link(self, p: int) -> tuple[str, int]:
        buf = self.buf
        ver = buf[p]
        if ver != 1:
            raise HDF5FormatError(f"unsupported link message version {ver}")
        flags = buf[p + 1]
        q = p + 2
        if flags & 0x08:
            q += 1  # link type (0 = hard)
        if flags & 0x04:
            q += 8  # creation order
        if flags & 0x10:
            q += 1  # charset
        ln_size = 1 << (flags & 0x3)
        ln = _u(buf, q, ln_size)
        q += ln_size
        name = buf[q : q + ln].decode("utf-8")
        q += ln
        header = _u(buf, q, self.off_size)
        return name, header

    def load(self, name: str, header_addr: int) -> np.ndarray:
        ds = self._read_dataset(header_addr)
        count = int(np.prod(ds.shape)) if ds.shape else 1
        if ds.compact is not None:
            raw = ds.compact
        else:
            if ds.data_addr == _UNDEF:
                raise HDF5FormatError(f"dataset {name!r} has no allocated data")
            raw = self.buf[ds.data_addr : ds.data_addr + count * ds.dtype.itemsize]
        arr = np.frombuffer(raw, dtype=ds.dtype, count=count)
        return arr.reshape(ds.shape).copy()


def read_hdf5(path: str) -> dict[str, np.ndarray]:
    """Read every root-level numeric dataset of a simple HDF5 file."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    return {name: r.load(name, addr) for name, addr in r.root_datasets().items()}
