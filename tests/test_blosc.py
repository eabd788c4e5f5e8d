"""In-tree Blosc1 codec conformance vs the system libblosc 1.21 oracle.

The reference reads AIND zarr stores through numcodecs, whose default
compressor is Blosc(cname='lz4', clevel=5, shuffle=SHUFFLE) (reference
utils/img_util.py:53-75); BITSHUFFLE appears in ome-zarr writers. These
tests pin the in-tree decoder/encoder
(native/src/blosc_lite.cpp) against the real c-blosc implementation that
happens to be baked into this image -- used strictly as a test oracle,
never on the production path.
"""

import ctypes
import json

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu import native
from aind_exaspim_neuron_segmentation_tpu.io import zarr_lite


def _system_blosc():
    try:
        lib = ctypes.CDLL("libblosc.so.1")
    except OSError:
        return None
    lib.blosc_compress_ctx.restype = ctypes.c_int
    lib.blosc_decompress_ctx.restype = ctypes.c_int
    return lib


ORACLE = _system_blosc()
needs_oracle = pytest.mark.skipif(
    ORACLE is None, reason="system libblosc unavailable"
)


def oracle_compress(raw, cname=b"lz4", clevel=5, shuffle=1, typesize=4,
                    blocksize=0):
    dst = ctypes.create_string_buffer(len(raw) + 64)
    n = ORACLE.blosc_compress_ctx(
        clevel, shuffle, typesize, len(raw), raw, dst, len(raw) + 64,
        cname, blocksize, 1,
    )
    assert n > 0
    return dst.raw[:n]


def oracle_decompress(chunk, nbytes):
    out = ctypes.create_string_buffer(nbytes)
    n = ORACLE.blosc_decompress_ctx(chunk, out, nbytes, 1)
    assert n == nbytes
    return out.raw


def _payload(n, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    steps = rng.normal(0, 3, n // np.dtype(dtype).itemsize + 1)
    return np.cumsum(steps).astype(dtype).tobytes()[:n]


class TestRoundTrip:
    def test_self_roundtrip_compressible(self):
        raw = _payload(300_000)
        c = native.blosc_compress(raw, typesize=4, shuffle=1)
        assert len(c) < len(raw)
        assert native.blosc_decompress(c) == raw

    def test_self_roundtrip_incompressible_memcpyed(self):
        raw = np.random.default_rng(1).bytes(10_000)
        c = native.blosc_compress(raw, typesize=1, shuffle=0)
        assert len(c) == len(raw) + 16  # memcpyed fallback
        assert native.blosc_decompress(c) == raw

    def test_empty(self):
        c = native.blosc_compress(b"", typesize=4)
        assert native.blosc_decompress(c) == b""

    @pytest.mark.parametrize("n", [1, 7, 100, 4096, (1 << 20) + 12345])
    def test_sizes_and_leftover_blocks(self, n):
        raw = _payload(n, np.uint8, seed=n)
        for shuffle, ts in ((0, 1), (1, 2), (1, 8)):
            c = native.blosc_compress(raw, typesize=ts, shuffle=shuffle)
            assert native.blosc_decompress(c) == raw

    def test_bitshuffle_roundtrip(self):
        raw = _payload(300_000)
        for ts in (1, 2, 4, 8):
            c = native.blosc_compress(raw, typesize=ts, shuffle=2)
            assert native.blosc_decompress(c) == raw


@needs_oracle
class TestOracleConformance:
    @pytest.mark.parametrize("cname", [b"lz4", b"lz4hc", b"zstd", b"zlib"])
    @pytest.mark.parametrize("shuffle", [0, 1, 2])
    @pytest.mark.parametrize("typesize", [1, 2, 4, 8])
    def test_decode_system_chunks(self, cname, shuffle, typesize):
        """Every (codec, shuffle, typesize) the pipeline can meet decodes
        bit-exactly -- covers split and non-split block layouts (c-blosc
        splits lz4/blosclz blocks, writes the dont-split header bit for
        the rest)."""
        raw = _payload(400_000, seed=7)
        chunk = oracle_compress(
            raw, cname=cname, shuffle=shuffle, typesize=typesize
        )
        assert native.blosc_decompress(chunk) == raw

    @pytest.mark.parametrize("clevel", [1, 5, 9])
    def test_decode_system_clevels(self, clevel):
        raw = _payload(200_000, seed=clevel)
        chunk = oracle_compress(raw, clevel=clevel)
        assert native.blosc_decompress(chunk) == raw

    def test_decode_small_and_tail_blocks(self):
        for n in (1, 100, 5000, 131072 + 77):
            raw = _payload(n, np.uint16, seed=n)
            chunk = oracle_compress(raw, typesize=2, blocksize=32768)
            assert native.blosc_decompress(chunk) == raw

    def test_system_decodes_our_chunks(self):
        raw = _payload(250_000, seed=3)
        for shuffle, ts in ((0, 1), (1, 4), (1, 8), (2, 2), (2, 4)):
            c = native.blosc_compress(raw, typesize=ts, shuffle=shuffle)
            assert oracle_decompress(c, len(raw)) == raw

    @pytest.mark.parametrize("ts,n", [(2, 130), (8, 516), (4, 100),
                                      (4, 131072 + 77)])
    def test_bitshuffle_ragged_blocks(self, ts, n):
        """c-blosc skips the bit transpose for blocks < 128 bytes or
        with a non-multiple-of-8 element count (oracle-pinned rule);
        ragged tails copy verbatim."""
        raw = _payload(n, seed=n)
        chunk = oracle_compress(raw, shuffle=2, typesize=ts)
        assert native.blosc_decompress(chunk) == raw

    @pytest.mark.parametrize("clevel", [1, 5, 9])
    @pytest.mark.parametrize("shuffle", [0, 1, 2])
    def test_decode_blosclz(self, clevel, shuffle):
        """c-blosc's default cname decodes bit-exactly (token stream
        incl. 255-extended lengths and 16-bit far matches)."""
        raw = _payload(400_000, seed=11)
        chunk = oracle_compress(raw, cname=b"blosclz", clevel=clevel,
                                shuffle=shuffle, typesize=4)
        assert native.blosc_decompress(chunk) == raw

    def test_decode_blosclz_small(self):
        for n in (1, 100, 5000, 131072 + 77):
            raw = _payload(n, np.uint16, seed=n)
            chunk = oracle_compress(raw, cname=b"blosclz", typesize=2)
            assert native.blosc_decompress(chunk) == raw

    def test_snappy_rejected_clearly(self):
        """snappy is the one remaining unsupported inner codec; reject
        with a clear message (hand-built header: codec id 2)."""
        chunk = bytearray(oracle_compress(_payload(100_000)))
        chunk[2] = (chunk[2] & 0x1F) | (2 << 5)  # rewrite codec bits
        with pytest.raises(ValueError, match="inner codec"):
            native.blosc_decompress(bytes(chunk))


class TestZarrBlosc:
    def test_write_read_blosc_store(self, tmp_path):
        rng = np.random.default_rng(0)
        vol = rng.integers(0, 1000, (40, 33, 21)).astype(np.uint16)
        path = str(tmp_path / "v.zarr")
        zarr_lite.write_zarr(
            path, vol, chunks=(16, 16, 16),
            compressor={"id": "blosc", "cname": "lz4", "clevel": 5,
                        "shuffle": 1, "blocksize": 0},
        )
        # metadata must stay numcodecs-compatible (no typesize key)
        meta = json.loads((tmp_path / "v.zarr" / ".zarray").read_text())
        assert "typesize" not in meta["compressor"]
        arr = zarr_lite.open_zarr(path)
        np.testing.assert_array_equal(arr[:], vol)
        np.testing.assert_array_equal(arr[5:20, 10:30, 3:18],
                                      vol[5:20, 10:30, 3:18])

    @needs_oracle
    def test_read_store_with_system_blosc_chunks(self, tmp_path):
        """A store whose chunks were produced by the REAL c-blosc (as an
        AIND production store would be) reads bit-exactly."""
        rng = np.random.default_rng(1)
        vol = rng.integers(0, 500, (20, 24, 16)).astype(np.uint16)
        root = tmp_path / "sys.zarr"
        root.mkdir()
        meta = {
            "zarr_format": 2, "shape": list(vol.shape),
            "chunks": [10, 12, 16], "dtype": vol.dtype.str,
            "compressor": {"id": "blosc", "cname": "zstd", "clevel": 5,
                           "shuffle": 1, "blocksize": 0},
            "fill_value": 0, "order": "C", "filters": None,
        }
        (root / ".zarray").write_text(json.dumps(meta))
        for zi in range(2):
            for yi in range(2):
                block = vol[zi * 10:(zi + 1) * 10, yi * 12:(yi + 1) * 12]
                chunk = oracle_compress(
                    block.tobytes(), cname=b"zstd", typesize=2
                )
                (root / f"{zi}.{yi}.0").write_bytes(chunk)
        arr = zarr_lite.open_zarr(str(root))
        np.testing.assert_array_equal(arr[:], vol)

    def test_append_writer_blosc(self, tmp_path):
        rng = np.random.default_rng(2)
        vol = rng.normal(size=(3, 20, 16, 16)).astype(np.float32)
        path = str(tmp_path / "w.zarr")
        w = zarr_lite.ZarrAppendWriter(
            path, vol.shape, np.float32, chunks=(8, 16, 16),
            compressor={"id": "blosc", "cname": "lz4", "clevel": 5,
                        "shuffle": 1},
        )
        for z in range(0, 20, 7):
            w.append(vol[:, z:z + 7])
        w.close()
        arr = zarr_lite.open_zarr(path)
        np.testing.assert_array_equal(arr[:], vol)
