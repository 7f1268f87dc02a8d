"""Test-only WRITER producing byte-layouts matching uncompressed
``joblib.dump`` output, so ``ml/joblib_lite`` can be exercised without
joblib installed.

Mirrors the documented layout joblib_lite reads: a pickle stream where
each ndarray is replaced by a ``joblib.numpy_pickle.NumpyArrayWrapper``
(state: subclass/shape/order/dtype/allow_mmap[, alignment]) whose raw
bytes follow the wrapper's opcodes, after a forced frame commit and —
for the aligned layout — one padding-length byte plus padding.

``tests/test_joblib_lite.py`` additionally contains a round-trip test
against REAL joblib+sklearn that runs wherever those libraries exist
(skipped in this container), pinning the fixture writer to ground
truth in user environments.
"""

from __future__ import annotations

import pickle
import sys
import types

import numpy as np

_WRAPPER_MODULE = "joblib.numpy_pickle"


def _cls(module: str, name: str, ns: dict | None = None) -> type:
    return type(name, (), {**(ns or {}), "__module__": module})


NumpyArrayWrapper = _cls(_WRAPPER_MODULE, "NumpyArrayWrapper")
MinMaxScaler = _cls("sklearn.preprocessing._data", "MinMaxScaler")
StandardScaler = _cls("sklearn.preprocessing._data", "StandardScaler")

_FAKE_CLASSES = (NumpyArrayWrapper, MinMaxScaler, StandardScaler)


class _fake_modules:
    """TRANSIENTLY register the fake joblib/sklearn module tree so
    pickle's save_global name-lookup succeeds during a dump, then
    restore sys.modules exactly — a lingering fake (with no __spec__)
    breaks every later importlib.util.find_spec('sklearn') in the
    test process (observed via pyspark.testing)."""

    def __enter__(self):
        self._added: list[str] = []
        for cls in _FAKE_CLASSES:
            parts = cls.__module__.split(".")
            for i in range(1, len(parts) + 1):
                name = ".".join(parts[:i])
                if name not in sys.modules:
                    sys.modules[name] = types.ModuleType(name)
                    self._added.append(name)
            setattr(sys.modules[cls.__module__], cls.__name__, cls)
        return self

    def __exit__(self, *exc):
        for name in reversed(self._added):
            sys.modules.pop(name, None)
        return False


class _FixturePickler(pickle._Pickler):  # pure-Python: framer access
    def __init__(self, fh, protocol, align: int | None):
        super().__init__(fh, protocol)
        self._fh = fh
        self._align = align

    def save(self, obj, save_persistent_id=True):
        if isinstance(obj, np.ndarray):
            w = NumpyArrayWrapper()
            w.__dict__.update(
                subclass=np.ndarray,
                shape=obj.shape,
                order="F" if (obj.flags.f_contiguous and not obj.flags.c_contiguous) else "C",
                dtype=obj.dtype,
                allow_mmap=True,
            )
            if self._align:
                w.__dict__["numpy_array_alignment_bytes"] = self._align
            super().save(w)
            # payload outside the pickle frames, like joblib
            self.framer.commit_frame(force=True)
            if self._align:
                pos = self._fh.tell() + 1
                pad = -pos % self._align
                self._fh.write(pad.to_bytes(1, "little"))
                self._fh.write(b"\x00" * pad)
            order = w.__dict__["order"]
            self._fh.write(np.asarray(obj, order=order).tobytes(order))
            return
        super().save(obj, save_persistent_id)


def dump_joblib_like(
    obj, path: str, protocol: int = 4, align: int | None = 8
) -> None:
    with _fake_modules(), open(path, "wb") as fh:
        _FixturePickler(fh, protocol, align).dump(obj)


def dump_joblib_like_compressed(
    obj, path: str, codec: str = "zlib", protocol: int = 4
) -> None:
    """Compressed-container twin: the file is one stdlib compression
    stream wrapping the identical pickle layout (what modern joblib's
    compress=N / gzip / bz2 / lzma writers produce).  Alignment is
    disabled inside compressed containers, mirroring joblib."""
    import importlib
    import io as _io

    buf = _io.BytesIO()
    with _fake_modules():
        _FixturePickler(buf, protocol, None).dump(obj)
    with open(path, "wb") as fh:
        fh.write(importlib.import_module(codec).compress(buf.getvalue()))


def fitted_minmax(data_min, data_max):
    s = MinMaxScaler()
    lo = np.asarray(data_min, dtype="float64")
    hi = np.asarray(data_max, dtype="float64")
    s.__dict__.update(
        feature_range=(0, 1),
        copy=True,
        clip=False,
        n_features_in_=len(lo),
        n_samples_seen_=1000,
        data_min_=lo,
        data_max_=hi,
        data_range_=hi - lo,
        scale_=1.0 / np.where(hi - lo == 0, 1.0, hi - lo),
        min_=-lo / np.where(hi - lo == 0, 1.0, hi - lo),
    )
    return s


def fitted_standard(mean, var):
    s = StandardScaler()
    mu = np.asarray(mean, dtype="float64")
    v = np.asarray(var, dtype="float64")
    s.__dict__.update(
        with_mean=True,
        with_std=True,
        copy=True,
        n_features_in_=len(mu),
        n_samples_seen_=1000,
        mean_=mu,
        var_=v,
        scale_=np.sqrt(v),
    )
    return s
