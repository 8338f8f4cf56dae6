"""BigFile round-trip and reference-format compatibility tests."""

import os

import numpy as np
import pytest

from laff_tpu.store import BigFile, StreamFile, txt2bin, write_bigfile


@pytest.fixture
def store_dir(tmp_path, rng):
    names = [f"video{i}" for i in range(17)]
    mat = rng.standard_normal((17, 5)).astype(np.float32)
    d = str(tmp_path / "feat")
    write_bigfile(d, names, mat)
    return d, names, mat


def test_roundtrip_gather(store_dir):
    d, names, mat = store_dir
    bf = BigFile(d)
    assert bf.shape() == [17, 5]
    found, vecs = bf.gather(["video3", "video0", "video16"])
    assert found == ["video3", "video0", "video16"]
    np.testing.assert_allclose(vecs, mat[[3, 0, 16]])


def test_gather_drops_unknown(store_dir):
    d, names, mat = store_dir
    bf = BigFile(d)
    found, vecs = bf.gather(["video1", "nope", "video2"])
    assert found == ["video1", "video2"]
    assert vecs.shape == (2, 5)


def test_reference_read_semantics(store_dir):
    """read() de-dups and returns row-index order, like the reference."""
    d, names, mat = store_dir
    bf = BigFile(d)
    renamed, vecs = bf.read(["video9", "video2", "video9"])
    assert renamed == ["video2", "video9"]
    np.testing.assert_allclose(np.array(vecs), mat[[2, 9]], rtol=1e-6)


def test_read_one(store_dir):
    d, names, mat = store_dir
    bf = BigFile(d)
    np.testing.assert_allclose(bf.read_one("video7"), mat[7], rtol=1e-6)


def test_streamfile(store_dir):
    d, names, mat = store_dir
    sf = StreamFile(d)
    sf.open()
    out = list(sf)
    assert [n for n, _ in out] == names
    np.testing.assert_allclose(np.array([v for _, v in out]), mat, rtol=1e-6)


def test_txt2bin(tmp_path):
    txt = tmp_path / "feat.txt"
    txt.write_text(
        "a 1.0 2.0 3.0\n"
        "b 4.0 5.0 6.0\n"
        "bad 1.0 nan 2.0\n"
        "c 7.0 8.0 9.0\n"
    )
    out = str(tmp_path / "bin")
    n = txt2bin(3, str(txt), out)
    assert n == 3  # NaN row dropped
    bf = BigFile(out)
    assert bf.names == ["a", "b", "c"]
    np.testing.assert_allclose(bf.read_one("b"), [4.0, 5.0, 6.0])


def test_space_separated_ids(tmp_path, rng):
    """id.txt may be space-separated (reference fallback)."""
    mat = rng.standard_normal((3, 2)).astype(np.float32)
    d = tmp_path / "sp"
    d.mkdir()
    mat.tofile(str(d / "feature.bin"))
    (d / "id.txt").write_text("x y z")
    (d / "shape.txt").write_text("3 2")
    bf = BigFile(str(d))
    assert bf.names == ["x", "y", "z"]
