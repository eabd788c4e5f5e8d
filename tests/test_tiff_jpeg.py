"""JPEG-compressed TIFF (compression 7) and the baseline JPEG codec.

The reference ingests TIFF through tifffile (reference
img_util.py:100-121), which decodes compression-7 pages via
imagecodecs/libjpeg. The in-tree equivalents are
native/src/jpeg_lite.cpp (codec) and io/tiff_lite.py (page wiring);
Pillow is the third-party conformance oracle. Exact bit-parity with
libjpeg is not a JPEG-conformance requirement (T.81 only bounds IDCT
accuracy), so codec tests assert a +-3 per-sample envelope against
Pillow -- the decoder uses libjpeg's own "fancy" triangle chroma
upsampling, so real differences come only from IDCT/colorspace
rounding.
"""

import io
import struct

import numpy as np
import pytest

from PIL import Image

from aind_exaspim_neuron_segmentation_tpu import native
from aind_exaspim_neuron_segmentation_tpu.io import tiff_lite


def _encode(img, **save_kwargs):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", **save_kwargs)
    return buf.getvalue()


def _pil_decode(data):
    img = Image.open(io.BytesIO(data))
    if img.mode not in ("L", "RGB"):
        img = img.convert("RGB")
    return np.asarray(img)


def _smooth_rgb(rng, h, w):
    """Blockwise-smooth RGB content (JPEG-friendly, still has edges)."""
    base = rng.integers(0, 255, ((h + 11) // 12, (w + 11) // 12, 3))
    big = np.kron(base.astype(np.float32), np.ones((12, 12, 1)))
    return np.clip(big[:h, :w], 0, 255).astype(np.uint8)


def _split_tables(data):
    """Split a JPEG stream into (JPEGTables stream, abbreviated stream)
    per the TIFF 6.0 TechNote 2 convention: shared DQT/DHT/DRI move to
    the tables stream; the per-segment stream keeps everything else."""
    assert data[:2] == b"\xff\xd8"
    tables = [b"\xff\xd8"]
    rest = [b"\xff\xd8"]
    pos = 2
    while pos + 4 <= len(data):
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            rest.append(data[pos: pos + 2])
            pos += 2
            continue
        seg_len = struct.unpack(">H", data[pos + 2: pos + 4])[0]
        seg = data[pos: pos + 2 + seg_len]
        (tables if marker in (0xDB, 0xC4, 0xDD) else rest).append(seg)
        pos += 2 + seg_len
        if marker == 0xDA:  # entropy data runs to EOI
            rest.append(data[pos: len(data) - 2])
            break
    tables.append(b"\xff\xd9")
    rest.append(b"\xff\xd9")
    return b"".join(tables), b"".join(rest)


class TestJpegCodec:
    def test_grayscale_matches_pillow(self):
        rng = np.random.default_rng(0)
        img = _smooth_rgb(rng, 97, 85)[:, :, 0]
        for quality in (70, 90):
            data = _encode(img, quality=quality)
            ours = native.jpeg_decode(data)
            ref = _pil_decode(data)
            assert ours.shape == ref.shape
            assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    @pytest.mark.parametrize("subsampling", [0, 1, 2])
    def test_rgb_subsampling_matches_pillow(self, subsampling):
        rng = np.random.default_rng(1)
        img = _smooth_rgb(rng, 101, 91)
        data = _encode(img, quality=92, subsampling=subsampling)
        ours = native.jpeg_decode(data)
        ref = _pil_decode(data)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.max() <= 3
        assert diff.mean() < 0.2

    def test_restart_markers(self):
        rng = np.random.default_rng(2)
        img = _smooth_rgb(rng, 64, 80)
        data = _encode(img, quality=92, subsampling=2,
                       restart_marker_rows=1)
        assert b"\xff\xdd" in data and b"\xff\xd0" in data
        ours = native.jpeg_decode(data)
        ref = _pil_decode(data)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 3

    def test_abbreviated_stream_with_tables(self):
        rng = np.random.default_rng(3)
        img = _smooth_rgb(rng, 48, 56)
        data = _encode(img, quality=85)
        tables, abbreviated = _split_tables(data)
        assert b"\xff\xdb" not in abbreviated  # DQT moved out
        full = native.jpeg_decode(data)
        split = native.jpeg_decode(abbreviated, tables=tables)
        np.testing.assert_array_equal(full, split)

    @pytest.mark.parametrize("subsampling", [0, 2])
    def test_progressive_matches_pillow(self, subsampling):
        """SOF2 spectral-selection + successive-approximation decode
        against Pillow's libjpeg within the sequential envelope."""
        rng = np.random.default_rng(4)
        img = _smooth_rgb(rng, 49, 57)  # non-multiple-of-8 edges
        data = _encode(img, quality=85, progressive=True,
                       subsampling=subsampling)
        assert b"\xff\xc2" in data  # really progressive
        ours = native.jpeg_decode(data)
        ref = _pil_decode(data)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.max() <= 3
        assert diff.mean() < 0.2

    def test_progressive_grayscale_and_restarts(self):
        rng = np.random.default_rng(14)
        img = _smooth_rgb(rng, 40, 44)[:, :, 0]
        data = _encode(img, quality=90, progressive=True,
                       restart_marker_rows=1)
        ours = native.jpeg_decode(data)
        ref = _pil_decode(data)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 3

    def test_progressive_info(self):
        rng = np.random.default_rng(15)
        img = _smooth_rgb(rng, 33, 41)
        data = _encode(img, quality=85, progressive=True)
        from aind_exaspim_neuron_segmentation_tpu.native import _lib
        import ctypes

        info = (ctypes.c_int64 * 4)()
        src = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        assert _lib().exa_jpeg_info(src, len(data), None, 0, info) == 0
        assert tuple(info) == (33, 41, 3, 8)

    def test_color_transform_flag(self):
        rng = np.random.default_rng(5)
        img = _smooth_rgb(rng, 24, 24)
        data = _encode(img, quality=95, subsampling=0)
        rgb = native.jpeg_decode(data, color_transform=1)
        raw = native.jpeg_decode(data, color_transform=0)
        auto = native.jpeg_decode(data)
        np.testing.assert_array_equal(rgb, auto)  # 3 comps auto-convert
        assert np.abs(raw.astype(int) - rgb.astype(int)).max() > 8


def _entry(tag, typ, count, value, ext_offset=None):
    raw = struct.pack("<HHI", tag, typ, count)
    if ext_offset is not None:
        return raw + struct.pack("<I", ext_offset)
    fmt = {3: "H", 4: "I"}[typ]
    return raw + struct.pack("<" + fmt, value).ljust(4, b"\0")


def _jpeg_tiff(segments, width, length, samples, photometric,
               rows_per_strip=None, tile=None, jpeg_tables=None,
               bits=8, planar=1, subsampling=None):
    """Hand-build a classic little-endian TIFF whose strips/tiles are
    independent baseline JPEG streams (compression 7)."""
    buf = bytearray(b"II" + struct.pack("<HI", 42, 0))
    offsets = []
    for seg in segments:
        offsets.append(len(buf))
        buf += seg
        if len(buf) % 2:
            buf += b"\0"
    ext = bytearray()
    tags = [
        _entry(256, 4, 1, width),
        _entry(257, 4, 1, length),
        _entry(258, 3, 1, bits),
        _entry(259, 3, 1, 7),  # new-style JPEG
        _entry(262, 3, 1, photometric),
        _entry(277, 3, 1, samples),
        _entry(284, 3, 1, planar),
        _entry(339, 3, 1, 1),
    ]
    n = len(segments)

    def array_tag(tag, values):
        if n == 1:
            tags.append(_entry(tag, 4, 1, values[0]))
        else:
            tags.append(_entry(tag, 4, n, None, ext_offset=len(ext)))
            ext.extend(struct.pack("<%dI" % n, *values))

    if tile is not None:
        tags.append(_entry(322, 4, 1, tile[1]))
        tags.append(_entry(323, 4, 1, tile[0]))
        array_tag(324, offsets)
        array_tag(325, [len(s) for s in segments])
    else:
        tags.append(_entry(278, 4, 1, rows_per_strip))
        array_tag(273, offsets)
        array_tag(279, [len(s) for s in segments])
    if jpeg_tables is not None:
        tags.append(_entry(347, 7, len(jpeg_tables),
                           None, ext_offset=len(ext)))
        ext.extend(jpeg_tables)
    if subsampling is not None:  # YCbCrSubSampling: two inline SHORTs
        tags.append(struct.pack("<HHI", 530, 3, 2)
                    + struct.pack("<HH", *subsampling))
    tags.sort(key=lambda t: struct.unpack("<H", t[:2])[0])

    ext_base = len(buf)
    # patch external offsets now that the data block position is known
    fixed = []
    for t in tags:
        tag, typ, count = struct.unpack("<HHI", t[:8])
        external = (count > 1 and typ == 4) or tag == 347
        if external:
            (rel,) = struct.unpack("<I", t[8:12])
            t = t[:8] + struct.pack("<I", ext_base + rel)
        fixed.append(t)
    buf += ext
    ifd_off = len(buf)
    buf += struct.pack("<H", len(fixed)) + b"".join(fixed)
    buf += struct.pack("<I", 0)
    struct.pack_into("<I", buf, 4, ifd_off)
    return bytes(buf)


class TestJpegTiff:
    def test_striped_rgb(self):
        """Multi-strip YCbCr JPEG page: each strip an independent
        stream; output assembles strips and converts to RGB (the
        tifffile behavior for photometric 6)."""
        rng = np.random.default_rng(10)
        img = _smooth_rgb(rng, 40, 56)
        rps = 16
        strips, oracle = [], []
        for y0 in range(0, 40, rps):
            part = img[y0: y0 + rps]
            data = _encode(part, quality=92, subsampling=2)
            strips.append(data)
            oracle.append(_pil_decode(data))
        buf = _jpeg_tiff(strips, 56, 40, 3, photometric=6,
                         rows_per_strip=rps)
        got = tiff_lite.read_tiff(buf)
        want = np.concatenate(oracle)
        assert got.shape == (40, 56, 3)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 3

    def test_striped_grayscale(self):
        rng = np.random.default_rng(11)
        img = _smooth_rgb(rng, 33, 47)[:, :, 1]
        data = _encode(img, quality=90)
        buf = _jpeg_tiff([data], 47, 33, 1, photometric=1,
                         rows_per_strip=33)
        got = tiff_lite.read_tiff(buf)
        want = _pil_decode(data)
        assert got.shape == (33, 47)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_jpeg_tables_tag(self):
        """Abbreviated strip streams with shared tables in tag 347
        decode identically to the self-contained streams."""
        rng = np.random.default_rng(12)
        img = _smooth_rgb(rng, 32, 48)
        rps = 16
        full_strips = [
            _encode(img[y0: y0 + rps], quality=88, subsampling=0)
            for y0 in range(0, 32, rps)
        ]
        tables, _ = _split_tables(full_strips[0])
        abbreviated = [_split_tables(s)[1] for s in full_strips]
        buf_full = _jpeg_tiff(full_strips, 48, 32, 3, photometric=6,
                              rows_per_strip=rps)
        buf_abbr = _jpeg_tiff(abbreviated, 48, 32, 3, photometric=6,
                              rows_per_strip=rps, jpeg_tables=tables)
        np.testing.assert_array_equal(
            tiff_lite.read_tiff(buf_full), tiff_lite.read_tiff(buf_abbr)
        )

    def test_tiled_rgb(self):
        """Tiled JPEG page: edge tiles are encoded at full tile size
        (TIFF 6.0 section 15) and cropped on read."""
        rng = np.random.default_rng(13)
        img = _smooth_rgb(rng, 40, 56)
        th, tw = 32, 32
        tiles, oracle = [], []
        for y0 in range(0, 40, th):
            for x0 in range(0, 56, tw):
                part = img[y0: y0 + th, x0: x0 + tw]
                part = np.pad(part, ((0, th - part.shape[0]),
                                     (0, tw - part.shape[1]), (0, 0)),
                              mode="edge")
                data = _encode(part, quality=92, subsampling=2)
                tiles.append(data)
                oracle.append(_pil_decode(data))
        buf = _jpeg_tiff(tiles, 56, 40, 3, photometric=6, tile=(th, tw))
        got = tiff_lite.read_tiff(buf)
        assert got.shape == (40, 56, 3)
        want = np.zeros((40, 56, 3), int)
        ti = 0
        for y0 in range(0, 40, th):
            for x0 in range(0, 56, tw):
                ny = min(th, 40 - y0)
                nx = min(tw, 56 - x0)
                want[y0: y0 + ny, x0: x0 + nx] = oracle[ti][:ny, :nx]
                ti += 1
        assert np.abs(got.astype(int) - want).max() <= 3

    def test_rgb_photometric_skips_transform(self):
        """Photometric 2 JPEG strips hold RGB component values: the
        reader must not apply the YCbCr transform."""
        rng = np.random.default_rng(14)
        img = _smooth_rgb(rng, 24, 24)
        data = _encode(img, quality=95, subsampling=0)
        buf = _jpeg_tiff([data], 24, 24, 3, photometric=2,
                         rows_per_strip=24)
        got = tiff_lite.read_tiff(buf)
        raw = native.jpeg_decode(data, color_transform=0)
        np.testing.assert_array_equal(got, raw)

    def test_planar_jpeg_strips(self):
        """Planar-separate JPEG (PlanarConfiguration=2): the strip
        list holds plane 0's strips then plane 1's, ..., each strip an
        independent grayscale stream; planes stack on the sample
        axis."""
        rng = np.random.default_rng(15)
        img = _smooth_rgb(rng, 40, 48)
        rps = 16
        strips, oracle_planes = [], []
        for s in range(3):
            rows = []
            for y0 in range(0, 40, rps):
                data = _encode(img[y0: y0 + rps, :, s], quality=92)
                strips.append(data)
                rows.append(_pil_decode(data))
            oracle_planes.append(np.concatenate(rows))
        buf = _jpeg_tiff(strips, 48, 40, 3, photometric=2,
                         rows_per_strip=rps, planar=2)
        got = tiff_lite.read_tiff(buf)
        want = np.stack(oracle_planes, axis=-1)
        assert got.shape == (40, 48, 3)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_planar_jpeg_tiled(self):
        """Tiled planar-separate JPEG: per-plane tile grids (plane-
        major tile order), edge tiles encoded full-size and cropped."""
        rng = np.random.default_rng(16)
        img = _smooth_rgb(rng, 40, 56)
        th, tw = 32, 32
        tiles = []
        want = np.zeros((40, 56, 2), int)
        for s in range(2):
            for y0 in range(0, 40, th):
                for x0 in range(0, 56, tw):
                    part = img[y0: y0 + th, x0: x0 + tw, s]
                    part = np.pad(
                        part, ((0, th - part.shape[0]),
                               (0, tw - part.shape[1])), mode="edge",
                    )
                    data = _encode(part, quality=92)
                    tiles.append(data)
                    dec = _pil_decode(data)
                    ny = min(th, 40 - y0)
                    nx = min(tw, 56 - x0)
                    want[y0: y0 + ny, x0: x0 + nx, s] = dec[:ny, :nx]
        buf = _jpeg_tiff(tiles, 56, 40, 2, photometric=1,
                         tile=(th, tw), planar=2)
        got = tiff_lite.read_tiff(buf)
        assert got.shape == (40, 56, 2)
        assert np.abs(got.astype(int) - want).max() <= 1


# ---- 12-bit extended sequential streams (T.81 Annex B precision 12) ----
#
# Pillow/libjpeg builds rarely enable 12-bit, so the oracle here is
# analytic: the test hand-assembles streams from CHOSEN quantized
# coefficients and compares the decode against scipy's float IDCT
# (idctn type-2 ortho == the T.81 reference IDCT) -- independent of the
# C++ decoder's own math.


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1s (T.81 F.1.2.3)
        return bytes(self.out)


def _category(v):
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v, t):
    return v if v >= 0 else v + (1 << t) - 1


def _flat_huff(symbols):
    """Canonical table: all codes one length L with 2**L > len(symbols)
    (so no all-ones code). Returns (counts16, values, {sym: (code, L)})."""
    n = len(symbols)
    length = max(n.bit_length() + 1, 2)
    counts = [0] * 16
    counts[length - 1] = n
    return (bytes(counts), bytes(symbols),
            {s: (i, length) for i, s in enumerate(symbols)})


def _encode_12bit(blocks_zz, quant, width, height):
    """Assemble a single-component 12-bit extended-sequential stream.

    ``blocks_zz``: list of 64-long quantized-coefficient arrays in
    ZIGZAG order, raster block order. ``quant``: 64 natural-order
    values (16-bit allowed -> Pq=1 DQT).
    """
    zigzag = np.array([
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
    # collect the DC categories / AC (run, size) symbols actually used
    dc_syms, ac_syms = set(), {0x00}
    pred = 0
    for zz in blocks_zz:
        dc_syms.add(_category(zz[0] - pred))
        pred = zz[0]
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.add(0xF0)
                run -= 16
            ac_syms.add((run << 4) | _category(zz[k]))
            run = 0
    dc_counts, dc_vals, dc_map = _flat_huff(sorted(dc_syms))
    ac_counts, ac_vals, ac_map = _flat_huff(sorted(ac_syms))

    bw = _BitWriter()
    pred = 0
    for zz in blocks_zz:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        t = _category(diff)
        code, ln = dc_map[t]
        bw.put(code, ln)
        bw.put(_mag_bits(diff, t), t)
        run = 0
        last_nz = max([k for k in range(1, 64) if zz[k]] or [0])
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_map[0xF0]
                bw.put(code, ln)
                run -= 16
            t = _category(zz[k])
            code, ln = ac_map[(run << 4) | t]
            bw.put(code, ln)
            bw.put(_mag_bits(int(zz[k]), t), t)
            run = 0
        if last_nz < 63:
            code, ln = ac_map[0x00]
            bw.put(code, ln)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = bytes([0x10]) + b"".join(
        struct.pack(">H", int(quant[zigzag[k]])) for k in range(64)
    )
    sof = (bytes([12]) + struct.pack(">HH", height, width)
           + bytes([1, 1, 0x11, 0]))
    dht = (bytes([0x00]) + dc_counts + dc_vals
           + bytes([0x10]) + ac_counts + ac_vals)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC1, sof)
            + seg(0xC4, dht) + seg(0xDA, sos) + bw.flush() + b"\xff\xd9")


def _expected_12bit(blocks_zz, quant, width, height):
    from scipy.fft import idctn

    zigzag = np.array([
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
    across = (width + 7) // 8
    out = np.zeros(((height + 7) // 8 * 8, across * 8))
    for bi, zz in enumerate(blocks_zz):
        nat = np.zeros(64)
        nat[zigzag] = np.asarray(zz, float) * np.asarray(quant, float)[zigzag]
        pix = idctn(nat.reshape(8, 8), norm="ortho") + 2048.0
        by, bx = divmod(bi, across)
        out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = pix
    return np.clip(np.round(out), 0, 4095).astype(np.uint16)[:height, :width]


class TestJpeg12Bit:
    def _blocks(self, rng, n):
        blocks = []
        pred = 0
        for i in range(n):
            zz = np.zeros(64, np.int64)
            # DC walks across large magnitudes (categories up to ~12)
            zz[0] = int(rng.integers(-3000, 3000))
            n_ac = int(rng.integers(0, 6))
            pos = rng.choice(np.arange(1, 64), size=n_ac, replace=False)
            for k in pos:
                zz[k] = int(rng.integers(-40, 40)) or 1
            blocks.append(zz)
            pred = zz[0]
        del pred
        return blocks

    def test_decode_matches_scipy_idct(self):
        rng = np.random.default_rng(5)
        quant = np.ones(64, np.int64)
        quant[0] = 4
        quant[1:8] = 17
        quant[63] = 300  # 16-bit DQT entry (Pq=1)
        blocks = self._blocks(rng, 6)  # 16 high x 24 wide
        data = _encode_12bit(blocks, quant, width=24, height=16)
        got = native.jpeg_decode(data)
        assert got.dtype == np.uint16
        want = _expected_12bit(blocks, quant, width=24, height=16)
        assert got.shape == want.shape
        assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1

    def test_dc_only_exact(self):
        """Uniform blocks decode to the exact level-shifted DC value."""
        quant = np.ones(64, np.int64)
        blocks = [np.zeros(64, np.int64) for _ in range(2)]
        blocks[0][0] = 8 * 1000   # pixel = 1000 + 2048
        blocks[1][0] = -8 * 2100  # clamps at 0
        data = _encode_12bit(blocks, quant, width=16, height=8)
        got = native.jpeg_decode(data)
        assert got.dtype == np.uint16
        assert np.all(got[:, :8] == 3048)
        assert np.all(got[:, 8:] == 0)

    def test_12bit_jpeg_tiff_page(self):
        """A striped TIFF whose 12-bit JPEG strips map to a u16 page."""
        rng = np.random.default_rng(9)
        quant = np.ones(64, np.int64)
        strips, wants = [], []
        for s in range(2):
            blocks = self._blocks(rng, 2)  # one 8-row strip, 16 wide
            strips.append(_encode_12bit(blocks, quant, width=16, height=8))
            wants.append(_expected_12bit(blocks, quant, width=16, height=8))
        tif = _jpeg_tiff(strips, width=16, length=16, samples=1,
                         photometric=1, rows_per_strip=8, bits=12)
        page = tiff_lite.read_tiff(tif)
        assert page.dtype == np.uint16
        want = np.concatenate(wants)
        assert np.max(np.abs(page.astype(int) - want.astype(int))) <= 1

    def test_info_reports_precision(self):
        quant = np.ones(64, np.int64)
        data = _encode_12bit([np.zeros(64, np.int64)], quant, 8, 8)
        arr = native.jpeg_decode(data)
        assert arr.dtype == np.uint16 and arr.shape == (8, 8)


def _oracle_upsample(a, h, v, out_l, out_w):
    """Independent scalar re-statement of libjpeg's default chroma
    resamplers (jdsample.c): fancy triangle filters for h2v1/h2v2
    (near sample weighted 3:1 horizontally, 3:1 vertically, rounding
    +8/+7 resp. +1/+2), replication otherwise. Deliberately written
    pixel-at-a-time so it cannot share bugs with the vectorized
    tiff_lite._upsample_chroma it checks."""
    a = a.astype(np.int64)
    ch, cw = a.shape

    def at(y, x):
        return a[min(max(y, 0), ch - 1), min(max(x, 0), cw - 1)]

    out = np.zeros((out_l, out_w), np.int64)
    for y in range(out_l):
        for x in range(out_w):
            if h == 2 and v == 2:
                r0, c0 = y >> 1, x >> 1
                r1 = r0 + (1 if y & 1 else -1)
                c1 = c0 + (1 if x & 1 else -1)
                out[y, x] = (9 * at(r0, c0) + 3 * at(r0, c1)
                             + 3 * at(r1, c0) + at(r1, c1)
                             + 8 - (x & 1)) >> 4
            elif h == 2 and v == 1:
                c0 = x >> 1
                c1 = c0 + (1 if x & 1 else -1)
                out[y, x] = (3 * at(y, c0) + at(y, c1)
                             + 1 + (x & 1)) >> 2
            else:
                out[y, x] = at(y * v // max(v, 1) if v == 1 else y // v,
                               x // h)
    return out


def _oracle_convert(planes):
    """Float BT.601 full-range YCbCr->RGB, 8-bit."""
    y = planes[..., 0].astype(np.float64)
    cb = planes[..., 1].astype(np.float64) - 128.0
    cr = planes[..., 2].astype(np.float64) - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _plane_strips(plane, rps, quality=95):
    """Encode one grayscale plane as independent per-strip JPEGs and
    return (streams, PIL-decoded strips re-assembled)."""
    strips, decoded = [], []
    for y0 in range(0, plane.shape[0], rps):
        part = plane[y0: y0 + rps]
        data = _encode(part, quality=quality)
        strips.append(data)
        decoded.append(_pil_decode(data))
    return strips, np.concatenate(decoded)


class TestPlanarYcbcrJpeg:
    """Planar-separate (PlanarConfiguration=2) YCbCr JPEG pages:
    per-plane grayscale streams at YCbCrSubSampling resolution,
    upsampled and converted post-stack (reference img_util.py:100-121
    reads these through tifffile/libjpeg)."""

    def test_conversion_matches_pillow(self):
        """The post-stack BT.601 conversion itself, on exact planes,
        against Pillow's YCbCr->RGB (independent fixed-point
        implementation of the same JFIF math)."""
        rng = np.random.default_rng(20)
        ycc = rng.integers(0, 256, (31, 29, 3), dtype=np.uint8)
        ours = tiff_lite._ycbcr_to_rgb(ycc.astype(np.int32), 255)
        pil = np.asarray(
            Image.fromarray(ycc, mode="YCbCr").convert("RGB")
        )
        assert np.abs(ours - pil.astype(np.int64)).max() <= 2

    def test_upsample_matches_scalar_oracle(self):
        rng = np.random.default_rng(21)
        for (h, v), (ol, ow) in [((2, 2), (39, 55)), ((2, 1), (40, 55)),
                                 ((1, 2), (39, 56)), ((4, 2), (38, 54)),
                                 ((1, 1), (16, 16))]:
            a = rng.integers(0, 256, (-(-ol // v), -(-ow // h)),
                             dtype=np.uint8)
            got = tiff_lite._upsample_chroma(a, h, v, ol, ow)
            want = _oracle_upsample(a, h, v, ol, ow)
            np.testing.assert_array_equal(got, want, err_msg=f"{h}x{v}")

    def test_striped_444(self):
        """Subsampling (1,1): three full-resolution grayscale planes;
        output = BT.601(planes). Oracle decodes the same streams with
        Pillow and converts identically, so the envelope is the codec
        difference (+-3/plane) through the conversion gains (<=2.8x)."""
        rng = np.random.default_rng(22)
        img = _smooth_rgb(rng, 40, 56)
        ycc = np.asarray(Image.fromarray(img).convert("YCbCr"))
        rps = 16
        segments, decoded = [], []
        for s in range(3):
            strips, dec = _plane_strips(ycc[..., s], rps)
            segments.extend(strips)
            decoded.append(dec)
        tif = _jpeg_tiff(segments, 56, 40, 3, photometric=6,
                         rows_per_strip=rps, planar=2, subsampling=(1, 1))
        got = tiff_lite.read_tiff(tif)
        want = _oracle_convert(np.stack(decoded, axis=-1))
        assert got.shape == (40, 56, 3) and got.dtype == np.uint8
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 9

    def test_striped_420_default_tag(self):
        """Subsampling (2,2) via the TIFF DEFAULT (tag 530 absent):
        chroma planes at quarter resolution with rows_per_strip/2,
        fancy-upsampled. Oracle: PIL-decoded planes through the
        independent scalar upsampler + float conversion."""
        rng = np.random.default_rng(23)
        luma = _smooth_rgb(rng, 40, 56)[..., 0]
        cb = _smooth_rgb(rng, 20, 28)[..., 1]
        cr = _smooth_rgb(rng, 20, 28)[..., 2]
        rps = 16
        segments, decoded = [], []
        for plane, prps in ((luma, rps), (cb, rps // 2), (cr, rps // 2)):
            strips, dec = _plane_strips(plane, prps)
            segments.extend(strips)
            decoded.append(dec)
        tif = _jpeg_tiff(segments, 56, 40, 3, photometric=6,
                         rows_per_strip=rps, planar=2)
        got = tiff_lite.read_tiff(tif)
        planes = [decoded[0].astype(np.int64)]
        for c in (1, 2):
            planes.append(_oracle_upsample(decoded[c], 2, 2, 40, 56))
        want = _oracle_convert(np.stack(planes, axis=-1))
        assert got.shape == (40, 56, 3)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 9

    def test_tiled_422(self):
        """Tiled planar (2,1): 32x32 luma tiles, 32x16 chroma tiles,
        edge tiles cropped; h2v1 fancy upsampling."""
        rng = np.random.default_rng(24)
        luma = _smooth_rgb(rng, 40, 56)[..., 0]
        cb = _smooth_rgb(rng, 40, 28)[..., 1]
        cr = _smooth_rgb(rng, 40, 28)[..., 2]
        th, tw = 32, 32
        segments, decoded = [], []
        for plane, ptw in ((luma, tw), (cb, tw // 2), (cr, tw // 2)):
            ph, pw = plane.shape
            dec = np.zeros((ph, pw), np.uint8)
            for y0 in range(0, ph, th):
                for x0 in range(0, pw, ptw):
                    tile = np.zeros((th, ptw), np.uint8)
                    part = plane[y0: y0 + th, x0: x0 + ptw]
                    tile[: part.shape[0], : part.shape[1]] = part
                    data = _encode(tile, quality=95)
                    segments.append(data)
                    dec[y0: y0 + th, x0: x0 + ptw] = _pil_decode(
                        data
                    )[: part.shape[0], : part.shape[1]]
            decoded.append(dec)
        tif = _jpeg_tiff(segments, 56, 40, 3, photometric=6,
                         tile=(th, tw), planar=2, subsampling=(2, 1))
        got = tiff_lite.read_tiff(tif)
        planes = [decoded[0].astype(np.int64),
                  _oracle_upsample(decoded[1], 2, 1, 40, 56),
                  _oracle_upsample(decoded[2], 2, 1, 40, 56)]
        want = _oracle_convert(np.stack(planes, axis=-1))
        assert got.shape == (40, 56, 3)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 9

    def test_nonconforming_geometry_rejected(self):
        """RowsPerStrip not a multiple of the vertical subsampling is
        a spec violation (TIFF 6.0 section 21) -> clear error."""
        rng = np.random.default_rng(25)
        luma = _smooth_rgb(rng, 40, 56)[..., 0]
        strips, _ = _plane_strips(luma, 5)
        tif = _jpeg_tiff(strips * 3, 56, 40, 3, photometric=6,
                         rows_per_strip=5, planar=2, subsampling=(2, 2))
        with pytest.raises(ValueError, match="multiple of"):
            tiff_lite.read_tiff(tif)
