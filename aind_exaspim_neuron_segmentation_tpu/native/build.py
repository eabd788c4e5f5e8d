"""Build + load the native C++ engine.

The reference delegates its heavy host-side algorithms to external C++
packages (waterz, kimimaro, fastremap -- SURVEY.md section 2.2); this repo
implements the equivalents in-tree and compiles them lazily on first
import with g++ (no network, no pybind11: plain C ABI + ctypes).

The shared library is named by a hash of the sources
(``libexaspim_native_<hash>.so``): editing a source compiles a NEW file,
so ``ctypes.CDLL`` genuinely loads the new code (dlopen dedups by
pathname -- rebuilding in place would silently keep the old handle), the
copy-then-rename is atomic for concurrent processes, and binaries are
never content-stale. Built artifacts are git-ignored (-march=native
output is host-specific).
"""

import ctypes
import glob
import hashlib
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src")
_LOCK = threading.Lock()
_loaded = None
_loaded_path = None

CXX = os.environ.get("CXX", "g++")
CXXFLAGS = [
    "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
    "-fvisibility=hidden", "-DEXA_EXPORT=1", "-pthread",
]


def _sources():
    return sorted(
        os.path.join(_SRC, f)
        for f in os.listdir(_SRC)
        if f.endswith((".cpp", ".hpp"))
    )


def _source_hash():
    h = hashlib.sha256()
    for path in _sources():
        h.update(path.encode())
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def lib_path():
    """Path of the built shared library (name keyed by source hash)."""
    return os.path.join(_HERE, f"libexaspim_native_{_source_hash()}.so")


def rebuild(target=None):
    """Compile the shared library (raises on compiler error)."""
    target = target or lib_path()
    tmp = target + f".tmp{os.getpid()}"
    cpps = [p for p in _sources() if p.endswith(".cpp")]
    # -lz / -lzstd: blosc_lite.cpp delegates zlib/zstd inner streams to
    # the system libraries (headers + sos baked into this image).
    cmd = [CXX, *CXXFLAGS, "-o", tmp, *cpps, "-lz", "-lzstd"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, target)  # atomic: concurrent loaders see old/new
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    # Best-effort cleanup of superseded builds.
    for old in glob.glob(os.path.join(_HERE, "libexaspim_native_*.so")):
        if old != target:
            try:
                os.unlink(old)
            except OSError:
                pass
    return target


def load():
    """Return the ctypes handle for the current sources, building if needed."""
    global _loaded, _loaded_path
    with _LOCK:
        target = lib_path()
        if _loaded is not None and _loaded_path == target:
            return _loaded
        if not os.path.exists(target):
            try:
                rebuild(target)
            except subprocess.CalledProcessError as err:
                raise RuntimeError(
                    f"native build failed:\n{err.stderr}"
                ) from err
        _loaded = ctypes.CDLL(target)
        _loaded_path = target
    return _loaded
