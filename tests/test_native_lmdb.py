"""Native LMDB reader (C++ B+tree over data.mdb) against the fixture writer.

Covers the EpicHOIDataset lmdb interface (bytes key -> pickled dict) without
liblmdb: single-leaf trees, multi-level branch trees (thousands of keys),
overflow (F_BIGDATA) values, misses, iteration order.
"""

import os
import pickle

import numpy as np
import pytest

from handsonvlm_tpu.data import native_lmdb
from handsonvlm_tpu.data.native_lmdb import (
    NativeLmdbDict,
    native_available,
    write_lmdb_fixture,
    write_lmdb_pickled,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ build unavailable"
)


def test_small_roundtrip(tmp_path):
    data = {b"banana": b"yellow", b"apple": b"red", b"cherry": b"dark"}
    path = write_lmdb_fixture(str(tmp_path / "data.mdb"), data)
    db = NativeLmdbDict(path, unpickle=False)
    assert len(db) == 3
    for k, v in data.items():
        assert k in db
        assert db[k] == v
    assert b"durian" not in db
    with pytest.raises(KeyError):
        db[b"durian"]
    assert db.get(b"nope", 42) == 42
    assert list(db.keys()) == sorted(data)  # B+tree iterates in key order
    db.close()


def test_open_directory(tmp_path):
    write_lmdb_pickled(str(tmp_path / "data.mdb"), {b"k": "v"})
    db = NativeLmdbDict(str(tmp_path))  # dir form, like lmdb.open(subdir=True)
    assert db[b"k"] == "v"
    db.close()


def test_multilevel_tree(tmp_path):
    # enough keys to force >= 2 branch levels at psize 4096
    data = {f"P{i:02d}/rgb_frames/P{i:02d}_{j:02d}/frame_{k:010d}.jpg".encode():
            f"value-{i}-{j}-{k}".encode() * 3
            for i in range(6) for j in range(6) for k in range(40)}
    assert len(data) > 1000
    path = write_lmdb_fixture(str(tmp_path / "data.mdb"), data)
    db = NativeLmdbDict(path, unpickle=False)
    assert len(db) == len(data)
    keys = sorted(data)
    for k in (keys[0], keys[1], keys[len(keys) // 2], keys[-2], keys[-1]):
        assert db[k] == data[k]
    rng = np.random.default_rng(0)
    for idx in rng.integers(0, len(keys), 200):
        k = keys[int(idx)]
        assert db[k] == data[k]
    assert b"P99/zzz" not in db
    assert b"" not in db  # smaller than every key
    assert list(db.keys()) == keys
    db.close()


def test_overflow_values(tmp_path):
    rng = np.random.default_rng(1)
    data = {
        b"small": b"x",
        b"one-page": bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
        b"many-pages": bytes(rng.integers(0, 256, 50_000, dtype=np.uint8)),
        b"exact": bytes(4096),
    }
    path = write_lmdb_fixture(str(tmp_path / "data.mdb"), data)
    db = NativeLmdbDict(path, unpickle=False)
    for k, v in data.items():
        assert db[k] == v, k
    db.close()


def test_pickled_feature_dicts(tmp_path):
    """The reference value format: pickled dict of TSN features + bboxes
    (epic_structures.py GLOBAL/HAND/OBJ feats)."""
    rng = np.random.default_rng(2)
    frame = {
        "GLOBAL_FEAT": rng.standard_normal(1024).astype(np.float32),
        "HAND_RIGHT_FEAT": rng.standard_normal(1024).astype(np.float32),
        "HAND_RIGHT_BBOX": np.asarray([0.1, 0.2, 0.3, 0.4], np.float32),
    }
    key = b"P24/rgb_frames/P24_05/frame_0000075700.jpg"
    path = write_lmdb_pickled(str(tmp_path / "data.mdb"), {key: frame})
    db = NativeLmdbDict(path)
    out = db[key]
    np.testing.assert_array_equal(out["GLOBAL_FEAT"], frame["GLOBAL_FEAT"])
    np.testing.assert_array_equal(out["HAND_RIGHT_BBOX"], frame["HAND_RIGHT_BBOX"])
    db.close()


def test_empty_db(tmp_path):
    path = write_lmdb_fixture(str(tmp_path / "data.mdb"), {})
    db = NativeLmdbDict(path, unpickle=False)
    assert len(db) == 0
    assert b"k" not in db
    assert list(db.keys()) == []
    db.close()


def test_epic_structures_integration(tmp_path):
    """_open_lmdb falls back to the native reader when lmdb pkgs are absent."""
    from handsonvlm_tpu.data.epic_structures import _open_lmdb

    key = b"P01/rgb_frames/P01_01/frame_0000000001.jpg"
    write_lmdb_pickled(str(tmp_path / "data.mdb"), {key: {"GLOBAL_FEAT": [1, 2]}})
    env = _open_lmdb(str(tmp_path))
    assert key in env
    assert env[key]["GLOBAL_FEAT"] == [1, 2]
