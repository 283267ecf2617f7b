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


def test_hdf5_gated():
    with pytest.raises(NotImplementedError, match="h5py"):
        annfile.load_hdf5_dataset("/tmp/none.hdf5")
