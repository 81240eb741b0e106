"""herostore tests: roundtrip, native reader parity, LZ4 codec."""

import os

import numpy as np
import pytest

from hero_tpu.data import store as store_lib


def test_roundtrip_msgpack_and_raw(tmp_path):
    db = str(tmp_path / "db")
    with store_lib.HeroStoreWriter(db) as w:
        w.put("a", {"input_ids": [[1, 2, 3], [4, 5]],
                    "unique_sub2frames": [(0, [0, 1]), (1, [2])]})
        w.put("feat", np.arange(24, dtype=np.float16).reshape(4, 6))
        w.put("nested", {"arr": np.ones((2, 3), np.float32), "x": 7})
    s = store_lib.HeroStore(db)
    assert len(s) == 3 and "a" in s
    a = s["a"]
    assert a["input_ids"] == [[1, 2, 3], [4, 5]]
    np.testing.assert_array_equal(
        s["feat"], np.arange(24, dtype=np.float16).reshape(4, 6))
    np.testing.assert_array_equal(s["nested"]["arr"],
                                  np.ones((2, 3), np.float32))
    assert s["nested"]["x"] == 7


def test_native_reader_matches_python(tmp_path):
    from hero_tpu.native import herostore as native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    db = str(tmp_path / "db")
    r = np.random.RandomState(0)
    values = {f"k{i}": r.randn(r.randint(1, 20), 8).astype(np.float16)
              for i in range(50)}
    with store_lib.HeroStoreWriter(db) as w:
        for k, v in values.items():
            w.put(k, v)
    s = store_lib.HeroStore(db)
    assert s._native is not None, "native reader should be active"
    for k, v in values.items():
        np.testing.assert_array_equal(s[k], v)
    # read_many gather
    idx = s._index
    keys = list(values)[:10]
    offs = [idx[k][0] for k in keys]
    lens = [idx[k][1] for k in keys]
    buf, starts = native.read_many(s._handle, offs, lens)
    for i, k in enumerate(keys):
        got = store_lib.unpack_value(
            buf[int(starts[i]):int(starts[i]) + lens[i]], idx[k][2])
        np.testing.assert_array_equal(got, values[k])


def test_lz4_roundtrip():
    from hero_tpu.native import herostore as native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    r = np.random.RandomState(1)
    for size in (0, 1, 13, 100, 5000, 1 << 16):
        # compressible data (repeats) + random tail
        data = (b"hello world, this repeats. " * (size // 20 + 1))[:size]
        data += r.bytes(size // 3)
        comp = native.lz4_compress(data)
        got = native.lz4_decompress(comp, len(data))
        assert got == data
    # highly compressible data actually compresses
    big = b"a" * 100000
    assert len(native.lz4_compress(big)) < 1000


def test_lz4_matches_reference_lz4_if_available():
    """If the real lz4 package exists, our decompressor must accept its
    output and vice versa (block format)."""
    try:
        import lz4.block
    except ImportError:
        pytest.skip("lz4 package not installed (expected)")
    from hero_tpu.native import herostore as native
    data = b"some repetitive data " * 100
    ours = native.lz4_compress(data)
    assert lz4.block.decompress(ours, uncompressed_size=len(data)) == data


def test_native_build_portable_and_provenance_checked(tmp_path,
                                                      monkeypatch):
    """VERDICT r3 #8: no -march=native; the .so is cached per
    (source, arch) outside the tree with a provenance sidecar, and a
    foreign/stale entry is rebuilt rather than loaded."""
    import importlib
    from hero_tpu.native import herostore as native

    monkeypatch.setenv("HERO_NATIVE_CACHE", str(tmp_path))
    native._reset_for_tests()
    try:
        if not native.available():
            pytest.skip("native toolchain unavailable")
        assert "-march=native" not in " ".join(native._CFLAGS)
        prov = native._provenance()
        lib_path = native._lib_path(prov)
        assert lib_path.startswith(str(tmp_path))
        assert os.path.exists(lib_path)
        assert os.path.exists(lib_path + ".json")
        import json
        sidecar = json.load(open(lib_path + ".json"))
        assert sidecar["machine"] == prov["machine"]

        # foreign provenance (e.g. another host's compiler wrote here):
        # next load must rebuild, not trust the binary
        json.dump({**sidecar, "machine": "alien64"},
                  open(lib_path + ".json", "w"))
        before = os.path.getmtime(lib_path)
        native._reset_for_tests()
        assert native.available()
        assert json.load(open(lib_path + ".json")) == prov
        assert os.path.getmtime(lib_path) >= before

        # a different arch resolves a DIFFERENT cache entry entirely
        other = native._lib_path({**prov, "machine": "aarch64"})
        assert other != lib_path
    finally:
        native._reset_for_tests()


def test_typed_wrappers(tmp_path):
    db = str(tmp_path / "vfeat")
    with store_lib.HeroStoreWriter(db) as w:
        w.put("vid0", np.ones((12, 16), np.float16))
    import json
    with open(os.path.join(db, "id2nframe.json"), "w") as f:
        json.dump({"vid0": 12}, f)
    vs = store_lib.VideoFeatStore(db, max_clip_len=8)
    assert vs.name2nframe["vid0"] == 8
    assert vs["vid0"].shape == (8, 16)
    # storage dtype preserved (reference VideoFeatLmdb yields float16 too;
    # models cast at ingestion)
    assert vs["vid0"].dtype == np.float16
