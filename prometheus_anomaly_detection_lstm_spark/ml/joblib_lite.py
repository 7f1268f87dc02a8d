"""From-scratch reader for UNCOMPRESSED ``joblib.dump`` artifacts — no
joblib, no sklearn (closing the reference-parity asterisk for the
saved scaler, ``preprocess_data.py:97`` / ``realtime_detector.py:104``,
the same way ``h5lite`` closed the ``.keras`` one).

Format (public, per the joblib on-disk layout): an uncompressed
``joblib.dump(obj, path)`` file is a standard Python pickle stream in
which every numpy array has been REPLACED by a small
``joblib.numpy_pickle.NumpyArrayWrapper`` object carrying
(subclass, shape, order, dtype, allow_mmap[, numpy_array_alignment_bytes]),
with the array's RAW BYTES written into the file immediately after the
wrapper's pickle opcodes (the pickler force-commits its protocol-4/5
frame first, so the payload sits between frames).  Newer layouts align
the payload for mmap: one length byte + that many padding bytes
precede the raw data.  Reading therefore needs a pickle
``Unpickler`` whose BUILD step recognizes a wrapper on the stack,
consumes the payload from the underlying file, and substitutes the
materialized array — which is what this module implements, on the
pure-Python ``pickle._Unpickler`` (the C unpickler's buffering would
read past the payload).

Compressed containers (modern joblib ``compress=N`` zlib, and the
gzip/bz2/lzma writers) are one stdlib compression stream wrapping the
identical layout — decompressed in memory and read the same way
(round 6; closes the last drop-in-parity asterisk for environments
with neither joblib nor sklearn).

Classes from absent libraries (sklearn, joblib) resolve to generated
STUB types whose state lands in ``__dict__`` — for artifact reading we
only need the fitted attributes (``data_min_``, ``mean_``, ...), not
behavior.  lz4 frames decode through the
from-scratch frame/block reader in ``lz4lite`` (round 7).  Anything
the subset cannot represent (legacy ZF zfile containers, zstd frames,
object-dtype arrays, pickled functions)
raises ``JoblibUnsupported`` with guidance to the one-step export path
in ``keras_bridge`` (which runs in the user's own environment where
sklearn exists).

Security note: this is NOT a general unpickler hardening layer — like
``joblib.load`` itself, only load artifacts you trust.  Stubbing does,
however, mean no third-party import side effects run.
"""

from __future__ import annotations

import io
import pickle
from typing import Any

import numpy as np


class JoblibUnsupported(Exception):
    """Artifact uses joblib features outside the uncompressed-pickle
    subset this reader supports."""


#: compressed-container magics joblib's modern (>= 0.10) compressor
#: registry writes: the FILE is one plain compression stream wrapping
#: the identical pickle-with-inline-payload layout, so stdlib codecs
#: decompress it and the same unpickler reads the result.  (joblib
#: compressor.py dispatches on these same prefixes.)
_STDLIB_DECOMPRESSORS: dict[bytes, str] = {
    b"\x78": "zlib",       # zlib stream (the compress=N default)
    b"\x1f\x8b": "gzip",
    b"BZh": "bz2",
    b"\xfd7zXZ": "lzma",
}
#: lz4 frames have no stdlib codec — decoded by the from-scratch
#: frame/block reader in ``lz4lite`` (round 7), checksums verified.
_LZ4_MAGIC = b"\x04\x22\x4d\x18"
#: containers we still cannot read without third-party code: the
#: legacy joblib < 0.10 'ZF' zfile layout (side-car .npy members) and
#: zstd frames.
_UNSUPPORTED_PREFIXES = (b"ZF", b"\x28\xb5\x2f\xfd")


class _Stub:
    """Instance stand-in for a class from an absent library: pickle
    BUILD fills ``__dict__``; attribute access reads it."""

    _module: str = "?"
    _name: str = "?"

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<stub {self._module}.{self._name} {sorted(self.__dict__)}>"


_STUB_CACHE: dict[tuple[str, str], type] = {}


def _stub_class(module: str, name: str) -> type:
    key = (module, name)
    if key not in _STUB_CACHE:
        _STUB_CACHE[key] = type(
            name, (_Stub,), {"_module": module, "_name": name}
        )
    return _STUB_CACHE[key]


#: modules whose classes resolve for REAL during unpickling (numpy
#: arrays/dtypes/scalars reconstruct through numpy's own machinery).
_REAL_MODULE_ROOTS = ("numpy",)


class _ArrayWrapperStub(_Stub):
    """joblib.numpy_pickle.NumpyArrayWrapper stand-in: state from the
    pickle, payload consumed from the raw file right after BUILD."""

    def read_payload(self, fh) -> np.ndarray:
        dtype = np.dtype(self.__dict__["dtype"])
        shape = tuple(self.__dict__["shape"])
        order = self.__dict__.get("order", "C")
        if dtype.hasobject:
            raise JoblibUnsupported(
                "object-dtype array payloads are pickled recursively; "
                "export via the keras_bridge CLI instead"
            )
        align = self.__dict__.get("numpy_array_alignment_bytes")
        if align:
            pad = fh.read(1)
            if len(pad) != 1:
                raise JoblibUnsupported("truncated alignment byte")
            fh.read(int.from_bytes(pad, "little"))
        n_bytes = int(np.prod(shape, dtype="int64")) * dtype.itemsize
        raw = fh.read(n_bytes)
        if len(raw) != n_bytes:
            raise JoblibUnsupported(
                f"truncated array payload: wanted {n_bytes}, got {len(raw)}"
            )
        arr = np.frombuffer(bytearray(raw), dtype=dtype)
        return arr.reshape(shape, order=order)


class _LiteUnpickler(pickle._Unpickler):  # pure-Python on purpose
    def __init__(self, fh):
        super().__init__(fh)
        self._raw_fh = fh

    def find_class(self, module: str, name: str):
        if module.split(".")[0] in _REAL_MODULE_ROOTS:
            return super().find_class(module, name)
        if name == "NDArrayWrapper":
            # pre-0.10 layout kept arrays in SIDE .npy files
            raise JoblibUnsupported(
                "legacy NDArrayWrapper (side .npy files) layout; "
                "re-dump with a current joblib or use the CLI export"
            )
        if name == "NumpyArrayWrapper":
            return _wrapper_class(module)
        return _stub_class(module, name)

    def load_build(self):
        super().load_build()
        top = self.stack[-1]
        if isinstance(top, _ArrayWrapperStub):
            self.stack[-1] = top.read_payload(self._raw_fh)

    dispatch = dict(pickle._Unpickler.dispatch)
    dispatch[pickle.BUILD[0]] = load_build


def _wrapper_class(module: str) -> type:
    key = (module, "NumpyArrayWrapper")
    if key not in _STUB_CACHE:
        _STUB_CACHE[key] = type(
            "NumpyArrayWrapper",
            (_ArrayWrapperStub,),
            {"_module": module, "_name": "NumpyArrayWrapper"},
        )
    return _STUB_CACHE[key]


def read_joblib(path: str) -> Any:
    """Load the root object of a ``joblib.dump`` file — uncompressed,
    or compressed with any stdlib-codec container (zlib, the
    ``compress=N`` default; gzip; bz2; lzma/xz).  Arrays come back as
    real ndarrays; foreign classes as stubs whose ``__dict__`` holds
    the fitted state.

    Compressed containers decompress fully in memory before
    unpickling — correct for model/scaler artifacts (KBs-MBs); this is
    an artifact reader, not a dataset codec."""
    with open(path, "rb") as fh:
        head = fh.read(8)
        fh.seek(0)
        for magic in _UNSUPPORTED_PREFIXES:
            if head.startswith(magic):
                raise JoblibUnsupported(
                    "legacy-ZF or zstd joblib container; re-dump "
                    "with a stdlib codec (compress=N/gzip/bz2/lzma) or "
                    "use the keras_bridge CLI export"
                )
        if head.startswith(_LZ4_MAGIC):
            from .lz4lite import decompress_frame

            return _LiteUnpickler(
                io.BytesIO(decompress_frame(fh.read()))
            ).load()
        for magic, codec in _STDLIB_DECOMPRESSORS.items():
            if head.startswith(magic):
                import importlib

                data = importlib.import_module(codec).decompress(
                    fh.read()
                )
                return _LiteUnpickler(io.BytesIO(data)).load()
        return _LiteUnpickler(fh).load()


def _get(obj: Any, attr: str) -> np.ndarray:
    try:
        return np.asarray(obj.__dict__[attr], dtype="float64")
    except KeyError:
        raise JoblibUnsupported(
            f"{type(obj).__name__} artifact lacks fitted attribute "
            f"{attr!r} — was the scaler fit before joblib.dump?"
        )


def scaler_params_from_joblib(
    path: str, feature_names: list[str]
) -> list[dict]:
    """One-step ``scaler.joblib`` -> the engine's params-table rows
    (operators/scale schema: feature, min, max, mean, std_pop).

    Accepts a fitted ``MinMaxScaler`` (the reference's artifact,
    preprocess_data.py:89-97) or ``StandardScaler``; the class is
    recognized by NAME from the stubbed pickle, so neither sklearn nor
    joblib needs to be installed.
    """
    from .keras_bridge import sklearn_minmax_to_params

    obj = read_joblib(path)
    kind = type(obj).__name__
    if kind == "MinMaxScaler":
        lo, hi = _get(obj, "data_min_"), _get(obj, "data_max_")
        if len(lo) != len(feature_names):
            raise ValueError(
                f"scaler has {len(lo)} features, caller named "
                f"{len(feature_names)}"
            )
        return sklearn_minmax_to_params(feature_names, lo, hi)
    if kind == "StandardScaler":
        mean = _get(obj, "mean_")
        std = np.sqrt(_get(obj, "var_"))
        if len(mean) != len(feature_names):
            raise ValueError(
                f"scaler has {len(mean)} features, caller named "
                f"{len(feature_names)}"
            )
        # min/max are not part of a standard scaler's state
        nan = np.full(len(mean), np.nan)
        return sklearn_minmax_to_params(
            feature_names, nan, nan, mean=mean, std_pop=std
        )
    raise JoblibUnsupported(
        f"unrecognized scaler class {kind!r}; supported: MinMaxScaler, "
        "StandardScaler"
    )
