"""joblib_lite: TF/sklearn/joblib-free scaler artifact reading."""

from __future__ import annotations

import numpy as np
import pytest

from prometheus_anomaly_detection_lstm_spark.ml.joblib_lite import (
    JoblibUnsupported,
    read_joblib,
    scaler_params_from_joblib,
)

from .joblib_fixture import (
    dump_joblib_like,
    dump_joblib_like_compressed,
    fitted_minmax,
    fitted_standard,
)

FEATURES = ["click", "error", "purchase"]


def test_minmax_scaler_roundtrip(tmp_path):
    lo, hi = [0.0, -2.5, 10.0], [1.0, 7.5, 10.0]  # one degenerate col
    path = str(tmp_path / "scaler.joblib")
    dump_joblib_like(fitted_minmax(lo, hi), path)
    rows = scaler_params_from_joblib(path, FEATURES)
    assert [r["feature"] for r in rows] == FEATURES
    assert [r["min"] for r in rows] == lo
    assert [r["max"] for r in rows] == hi


@pytest.mark.parametrize("align", [None, 8, 16])
@pytest.mark.parametrize("protocol", [2, 4, 5])
def test_layout_matrix(tmp_path, align, protocol):
    """Aligned and legacy-unaligned payloads, framed and unframed
    pickle protocols, all land the same arrays."""
    path = str(tmp_path / f"s_{align}_{protocol}.joblib")
    dump_joblib_like(
        fitted_minmax([1.5, 2.5], [9.0, 2.5]), path,
        protocol=protocol, align=align,
    )
    obj = read_joblib(path)
    assert type(obj).__name__ == "MinMaxScaler"
    np.testing.assert_array_equal(obj.data_min_, [1.5, 2.5])
    np.testing.assert_array_equal(obj.data_max_, [9.0, 2.5])


def test_standard_scaler(tmp_path):
    path = str(tmp_path / "std.joblib")
    dump_joblib_like(fitted_standard([1.0, 2.0, 3.0], [4.0, 0.0, 9.0]), path)
    rows = scaler_params_from_joblib(path, FEATURES)
    assert [r["mean"] for r in rows] == [1.0, 2.0, 3.0]
    assert [r["std_pop"] for r in rows] == [2.0, 0.0, 3.0]
    assert all(np.isnan(r["min"]) for r in rows)


def test_multi_dim_and_orders(tmp_path):
    """2-D payloads in both memory orders survive (the wrapper's order
    field drives the reshape)."""
    a = np.arange(12, dtype="float64").reshape(3, 4)
    for arr in (np.ascontiguousarray(a), np.asfortranarray(a)):
        s = fitted_minmax([0.0], [1.0])
        s.__dict__["extra_matrix_"] = arr
        path = str(tmp_path / "m.joblib")
        dump_joblib_like(s, path)
        got = read_joblib(path).extra_matrix_
        np.testing.assert_array_equal(got, a)


@pytest.mark.parametrize("codec", ["zlib", "gzip", "bz2", "lzma"])
def test_compressed_containers(tmp_path, codec):
    """Stdlib-codec compressed containers (joblib compress=N and the
    gzip/bz2/lzma writers) decompress in place and land the same
    scaler — no joblib needed."""
    lo, hi = [0.0, -2.5, 10.0], [1.0, 7.5, 10.0]
    path = str(tmp_path / f"c_{codec}.joblib")
    dump_joblib_like_compressed(fitted_minmax(lo, hi), path, codec=codec)
    rows = scaler_params_from_joblib(path, FEATURES)
    assert [r["min"] for r in rows] == lo
    assert [r["max"] for r in rows] == hi


def test_unsupported_paths(tmp_path):
    # legacy ZF container magic (pre-0.10 zfile layout)
    p = tmp_path / "c.joblib"
    p.write_bytes(b"ZF\x01" + b"x" * 32)
    with pytest.raises(JoblibUnsupported, match="container"):
        read_joblib(str(p))
    # zstd frame magic (no stdlib codec, not implemented from scratch)
    pz = tmp_path / "cz.joblib"
    pz.write_bytes(b"\x28\xb5\x2f\xfd" + b"x" * 32)
    with pytest.raises(JoblibUnsupported, match="container"):
        read_joblib(str(pz))
    # lz4 now decodes via lz4lite — garbage after the magic is a
    # malformed FRAME (LZ4Error), no longer an unsupported container
    from prometheus_anomaly_detection_lstm_spark.ml.lz4lite import LZ4Error
    p4 = tmp_path / "c4.joblib"
    p4.write_bytes(b"\x04\x22\x4d\x18" + b"x" * 32)
    with pytest.raises(LZ4Error):
        read_joblib(str(p4))
    # unfitted scaler (missing attributes)
    path = str(tmp_path / "unfit.joblib")
    s = fitted_minmax([0.0], [1.0])
    del s.__dict__["data_min_"]
    dump_joblib_like(s, path)
    with pytest.raises(JoblibUnsupported, match="data_min_"):
        scaler_params_from_joblib(str(path), ["x"])
    # wrong feature count
    path2 = str(tmp_path / "narrow.joblib")
    dump_joblib_like(fitted_minmax([0.0], [1.0]), path2)
    with pytest.raises(ValueError, match="features"):
        scaler_params_from_joblib(path2, FEATURES)


def test_against_real_joblib(tmp_path):
    """Ground-truth pin: runs wherever joblib+sklearn exist (the user's
    training environment); skipped in this container."""
    joblib = pytest.importorskip("joblib")
    sklearn_prep = pytest.importorskip("sklearn.preprocessing")
    # the fixture registers STUB joblib/sklearn modules in sys.modules;
    # only run against the real libraries
    if not hasattr(joblib, "dump") or not hasattr(sklearn_prep, "MinMaxScaler"):
        pytest.skip("real joblib/sklearn not installed (fixture stubs only)")
    s = sklearn_prep.MinMaxScaler().fit(
        np.array([[0.0, 5.0], [2.0, 9.0], [1.0, 7.0]])
    )
    path = str(tmp_path / "real.joblib")
    joblib.dump(s, path)
    rows = scaler_params_from_joblib(path, ["a", "b"])
    assert [r["min"] for r in rows] == [0.0, 5.0]
    assert [r["max"] for r in rows] == [2.0, 9.0]
    # compressed ground truth (zlib is joblib's compress=N default)
    cpath = str(tmp_path / "real_c.joblib")
    joblib.dump(s, cpath, compress=3)
    crows = scaler_params_from_joblib(cpath, ["a", "b"])
    assert [r["min"] for r in crows] == [0.0, 5.0]
    assert [r["max"] for r in crows] == [2.0, 9.0]
