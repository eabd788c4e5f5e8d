"""Build + load the native C++ engine (libexaspim_native.so).

The reference delegates its heavy host-side algorithms to external C++
packages (waterz, kimimaro, fastremap -- SURVEY.md section 2.2); this repo
implements the equivalents in-tree and compiles them lazily on first
import with g++ (no network, no pybind11: plain C ABI + ctypes).

Rebuilds automatically when any source file is newer than the .so.
"""

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src")
_LIB = os.path.join(_HERE, "libexaspim_native.so")
_LOCK = threading.Lock()
_loaded = None

CXX = os.environ.get("CXX", "g++")
CXXFLAGS = [
    "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
    "-fvisibility=hidden", "-DEXA_EXPORT=1",
]


def _sources():
    return sorted(
        os.path.join(_SRC, f)
        for f in os.listdir(_SRC)
        if f.endswith(".cpp")
    )


def _stale():
    if not os.path.exists(_LIB):
        return True
    lib_mtime = os.path.getmtime(_LIB)
    deps = _sources() + [
        os.path.join(_SRC, f)
        for f in os.listdir(_SRC)
        if f.endswith(".hpp")
    ]
    return any(os.path.getmtime(p) > lib_mtime for p in deps)


def rebuild():
    """Compile the shared library (raises on compiler error)."""
    cmd = [CXX, *CXXFLAGS, "-o", _LIB, *_sources()]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load():
    """Return the ctypes handle, building first if needed."""
    global _loaded
    with _LOCK:
        if _loaded is None or _stale():
            if _stale():
                try:
                    rebuild()
                except subprocess.CalledProcessError as err:
                    raise RuntimeError(
                        f"native build failed:\n{err.stderr}"
                    ) from err
            _loaded = ctypes.CDLL(_LIB)
    return _loaded
