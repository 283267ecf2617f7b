"""fvecs/bvecs/ivecs source tests (reference E3, bigann.rs:47-157):
round-trip through the binary format, id density, prefix reads, and
error paths."""

import os
import struct
import tempfile

import numpy as np
import pytest

from rust_diskann_spark.sources import annfile


def _write_vecs(path: str, mat: np.ndarray, kind: str) -> None:
    elem = {"fvecs": "<f4", "ivecs": "<i4", "bvecs": "<u1"}[kind]
    with open(path, "wb") as f:
        for row in mat:
            f.write(struct.pack("<i", len(row)))
            f.write(np.asarray(row, dtype=elem).tobytes())


@pytest.fixture(scope="module")
def tmpdir():
    with tempfile.TemporaryDirectory(prefix="rds_annfile_") as d:
        yield d


def test_fvecs_roundtrip(spark, tmpdir):
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((40, 8)).astype(np.float32)
    path = os.path.join(tmpdir, "a.fvecs")
    _write_vecs(path, mat, "fvecs")
    df = annfile.read_vecs(spark, path, "fvecs")
    rows = df.orderBy("id").collect()
    assert [r["id"] for r in rows] == list(range(40))
    got = np.array([r["vec"] for r in rows], dtype=np.float32)
    assert np.array_equal(got, mat)


def test_bvecs_roundtrip_and_widen(spark, tmpdir):
    mat = np.arange(60, dtype=np.uint8).reshape(12, 5)
    path = os.path.join(tmpdir, "b.bvecs")
    _write_vecs(path, mat, "bvecs")
    df = annfile.u8_to_f32(annfile.read_vecs(spark, path, "bvecs"))
    rows = df.orderBy("id").collect()
    got = np.array([r["vec"] for r in rows], dtype=np.float32)
    assert np.array_equal(got, mat.astype(np.float32))
    assert dict(df.dtypes)["vec"] == "array<float>"


def test_ivecs_multifile_dense_ids(spark, tmpdir):
    sub = os.path.join(tmpdir, "multi")
    os.makedirs(sub, exist_ok=True)
    m1 = np.arange(12, dtype=np.int32).reshape(4, 3)
    m2 = np.arange(100, 118, dtype=np.int32).reshape(6, 3)
    _write_vecs(os.path.join(sub, "p1.ivecs"), m1, "ivecs")
    _write_vecs(os.path.join(sub, "p2.ivecs"), m2, "ivecs")
    df = annfile.read_vecs(spark, sub, "ivecs")
    rows = df.orderBy("id").collect()
    assert [r["id"] for r in rows] == list(range(10))
    # path sort order: p1 rows get ids 0..3, p2 rows 4..9
    assert rows[0]["vec"] == m1[0].tolist()
    assert rows[4]["vec"] == m2[0].tolist()


def test_prefix_read(spark, tmpdir):
    mat = np.random.default_rng(1).standard_normal((30, 4)).astype(np.float32)
    path = os.path.join(tmpdir, "cap.fvecs")
    _write_vecs(path, mat, "fvecs")
    df = annfile.read_vecs(spark, path, "fvecs", max_vectors=7)
    assert df.count() == 7


def test_truncated_file_errors(spark, tmpdir):
    path = os.path.join(tmpdir, "bad.fvecs")
    with open(path, "wb") as f:
        f.write(struct.pack("<i", 4))
        f.write(b"\x00" * 10)  # not a full record
    with pytest.raises(Exception, match="not a multiple|truncated"):
        annfile.read_vecs(spark, path, "fvecs").collect()


def test_unsupported_kind(spark):
    with pytest.raises(ValueError, match="unsupported kind"):
        annfile.read_vecs(spark, "/tmp/x", "hvecs")


def test_hdf5_missing_file():
    # E1 is now implemented (pure-numpy subset reader, sources/hdf5.py);
    # a missing path surfaces as the normal file error
    with pytest.raises(FileNotFoundError):
        annfile.load_hdf5_dataset("/tmp/none.hdf5")


# ---------------------------------------------------------------------------
# pure-numpy HDF5 subset reader (sources/hdf5.py) — the fixture below is
# byte-crafted straight from the HDF5 File Format Specification (superblock
# v0, v1 object headers, symbol-table group, contiguous layout), NOT by the
# reader under test, so offset/layout bugs can't cancel out.
# ---------------------------------------------------------------------------

UNDEF = 0xFFFFFFFFFFFFFFFF


def _u(v, n):
    return int(v).to_bytes(n, "little")


def _write_minimal_hdf5(path, arrays):
    """Spec-conformant minimal HDF5: one root group (symbol table), each
    array a contiguous little-endian dataset. Names must sort ascending."""
    import numpy as np

    names = sorted(arrays)
    # local heap payload: nul-terminated names
    heap_off = {}
    heap = b""
    for n in names:
        heap_off[n] = len(heap)
        heap += n.encode() + b"\x00"
    heap += b"\x00" * (-len(heap) % 8)

    SB, ROOT_OH = 0, 96
    HEAP_HDR = ROOT_OH + 40          # root header is 16 + 24
    HEAP_DATA = HEAP_HDR + 32
    BTREE = HEAP_DATA + len(heap)
    SNOD = BTREE + 48
    OH0 = SNOD + 8 + 40 * len(names)

    def dtype_msg(dt):
        if dt.kind == "f":
            body = bytes([0x11, 0x20, 0, 0]) + _u(dt.itemsize, 4)
            if dt.itemsize == 4:
                body += _u(0, 2) + _u(32, 2) + bytes([0, 8, 0, 23]) + _u(127, 4)
            else:
                body += _u(0, 2) + _u(64, 2) + bytes([0, 11, 0, 52]) + _u(1023, 4)
        else:
            body = bytes([0x10, 0x08, 0, 0]) + _u(dt.itemsize, 4)
            body += _u(0, 2) + _u(dt.itemsize * 8, 2)
        body += b"\x00" * (-len(body) % 8)
        return body

    # object headers (fixed 3 messages; compute data addresses afterwards)
    ohs, datas, addr = [], [], None
    data_addr = None  # filled after sizing headers

    def build_oh(arr, daddr):
        dims = b"".join(_u(d, 8) for d in arr.shape)
        space = bytes([1, arr.ndim, 0, 0, 0, 0, 0, 0]) + dims
        dtype_b = dtype_msg(arr.dtype)
        layout = bytes([3, 1]) + _u(daddr, 8) + _u(arr.nbytes, 8)
        layout += b"\x00" * (-len(layout) % 8)
        msgs = (
            _u(0x0001, 2) + _u(len(space), 2) + b"\x00" * 4 + space
            + _u(0x0003, 2) + _u(len(dtype_b), 2) + b"\x00" * 4 + dtype_b
            + _u(0x0008, 2) + _u(len(layout), 2) + b"\x00" * 4 + layout
        )
        prefix = bytes([1, 0]) + _u(3, 2) + _u(1, 4) + _u(len(msgs), 4) + b"\x00" * 4
        return prefix + msgs

    # two passes: size headers with dummy addresses, then place data
    sizes = [len(build_oh(arrays[n], 0)) for n in names]
    oh_addrs = []
    a = OH0
    for s in sizes:
        oh_addrs.append(a)
        a += s
    data_start = a
    d_addrs = []
    for n in names:
        d_addrs.append(data_start)
        data_start += arrays[n].nbytes
    eof = data_start

    out = bytearray()
    out += b"\x89HDF\r\n\x1a\n" + bytes([0, 0, 0, 0, 0, 8, 8, 0])
    out += _u(4, 2) + _u(16, 2) + _u(0, 4)
    out += _u(0, 8) + _u(UNDEF, 8) + _u(eof, 8) + _u(UNDEF, 8)
    out += _u(0, 8) + _u(ROOT_OH, 8) + _u(0, 4) + _u(0, 4) + b"\x00" * 16
    assert len(out) == ROOT_OH
    st_msg = _u(0x0011, 2) + _u(16, 2) + b"\x00" * 4 + _u(BTREE, 8) + _u(HEAP_HDR, 8)
    out += bytes([1, 0]) + _u(1, 2) + _u(1, 4) + _u(len(st_msg), 4) + b"\x00" * 4 + st_msg
    assert len(out) == HEAP_HDR
    out += b"HEAP" + bytes([0, 0, 0, 0]) + _u(len(heap), 8) + _u(0, 8) + _u(HEAP_DATA, 8)
    out += heap
    assert len(out) == BTREE
    out += b"TREE" + bytes([0, 0]) + _u(len(names) and 1, 2)
    out += _u(UNDEF, 8) + _u(UNDEF, 8)
    out += _u(0, 8) + _u(SNOD, 8) + _u(0, 8)
    assert len(out) == SNOD
    out += b"SNOD" + bytes([1, 0]) + _u(len(names), 2)
    for n, oa in zip(names, oh_addrs):
        out += _u(heap_off[n], 8) + _u(oa, 8) + _u(0, 4) + _u(0, 4) + b"\x00" * 16
    for n, da in zip(names, d_addrs):
        out += build_oh(arrays[n], da)
    for n in names:
        a = arrays[n]
        out += a.astype(a.dtype.newbyteorder("<"), copy=False).tobytes("C")
    assert len(out) == eof
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_pure_numpy_hdf5_reader(tmp_path):
    import numpy as np
    from rust_diskann_spark.sources.hdf5 import read_hdf5
    from rust_diskann_spark.sources.annfile import load_hdf5_dataset

    rng = np.random.default_rng(42)
    arrays = {
        "train": rng.random((20, 8)).astype(np.float32),
        "test": rng.random((4, 8)).astype(np.float32),
        "neighbors": rng.integers(0, 20, (4, 10)).astype(np.int64),
        "distances": rng.random((4, 10)).astype(np.float32),
    }
    p = str(tmp_path / "quad.h5")
    _write_minimal_hdf5(p, arrays)

    got = read_hdf5(p)
    assert sorted(got) == sorted(arrays)
    for k in arrays:
        assert got[k].dtype == arrays[k].dtype
        assert got[k].shape == arrays[k].shape
        np.testing.assert_array_equal(got[k], arrays[k])

    quad = load_hdf5_dataset(p)
    assert list(quad) == ["train", "test", "neighbors", "distances"]
    np.testing.assert_array_equal(quad["train"], arrays["train"])


def test_pure_numpy_hdf5_reader_rejects_garbage(tmp_path):
    import pytest as _pytest

    from rust_diskann_spark.sources.hdf5 import HDF5FormatError, read_hdf5

    p = str(tmp_path / "bad.h5")
    with open(p, "wb") as f:
        f.write(b"not an hdf5 file at all" * 10)
    with _pytest.raises(HDF5FormatError):
        read_hdf5(p)
