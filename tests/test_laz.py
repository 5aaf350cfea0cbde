"""Round-trip tests for the native LASzip (.laz) codec.

The codec (native/laz_codec.cpp + data/laz.py) replaces the reference's
laspy[lazrs] ingest (reference utils.py:20-45). Encode and decode are
independent implementations of the LAZ v2 item codecs driven by shared
adaptive models; these tests force every coding path: GPS time sequence
switches and 64-bit jumps, gray vs full-color RGB, bit-byte/classification
/intensity churn in POINT10, chunk boundaries, and degenerate sizes.
"""

import os

import numpy as np
import pytest

from flowcompare_tpu.data import las_io, laz

pytestmark = pytest.mark.skipif(
    laz.get_lib() is None, reason="native laz codec unavailable (no g++)")


def _cloud(n, seed=0, walk=0.05):
    rng = np.random.default_rng(seed)
    xyz = np.cumsum(rng.normal(0, walk, (n, 3)), axis=0) + [5e4, 4e5, 12.0]
    rgb = rng.integers(0, 65536, (n, 3)) / 65535.0
    return np.concatenate([xyz, rgb], axis=1), rng


def _roundtrip(tmp_path, pts, gps=None, chunk_size=50000, scale=1e-4):
    p = str(tmp_path / "rt.laz")
    laz.write_laz(p, pts, gps_time=gps, chunk_size=chunk_size, scale=scale)
    return laz.read_laz(p), p


def test_xyz_rgb_gps_roundtrip(tmp_path):
    pts, rng = _cloud(5000)
    gps = np.cumsum(rng.exponential(1e-5, 5000)) + 3e5
    d, p = _roundtrip(tmp_path, pts, gps, chunk_size=1000)
    assert np.abs(d["xyz"] - pts[:, :3]).max() <= 5e-5 + 1e-12
    assert np.array_equal(
        d["rgb"], np.round(np.clip(pts[:, 3:], 0, 1) * 65535).astype("u2"))
    assert np.array_equal(d["gps_time"], gps)
    # it actually compresses
    assert os.path.getsize(p) < 0.7 * (5000 * 34 + 227)


def test_point_format2_no_gps(tmp_path):
    pts, _ = _cloud(700)
    d, _ = _roundtrip(tmp_path, pts)
    assert d["point_format"] == 2
    assert np.all(d["gps_time"] == 0)
    assert np.abs(d["xyz"] - pts[:, :3]).max() <= 5e-5 + 1e-12


def test_exact_chunk_boundaries(tmp_path):
    # n a multiple of chunk_size, n = chunk_size, n = chunk_size + 1
    for n, cs in [(1000, 250), (250, 250), (251, 250), (1, 250), (2, 250)]:
        pts, rng = _cloud(n, seed=n)
        gps = np.cumsum(rng.exponential(1e-6, n))
        d, _ = _roundtrip(tmp_path, pts, gps, chunk_size=cs)
        assert np.array_equal(d["gps_time"], gps), n
        assert np.abs(d["xyz"] - pts[:, :3]).max() <= 5e-5 + 1e-12, n


def test_empty_cloud(tmp_path):
    d, _ = _roundtrip(tmp_path, np.zeros((0, 6)))
    assert d["xyz"].shape == (0, 3)


def test_constant_points_and_gray_rgb(tmp_path):
    # identical coordinates (all-zero deltas) + r==g==b (RGB bit-6 clear
    # path) + identical gps (0diff "unchanged" symbol)
    n = 400
    pts = np.tile(np.array([[1.0, 2.0, 3.0, 0.25, 0.25, 0.25]]), (n, 1))
    gps = np.full(n, 123456.75)
    d, p = _roundtrip(tmp_path, pts, gps)
    assert np.abs(d["xyz"] - pts[:, :3]).max() <= 5e-5 + 1e-12
    assert (d["rgb"] == d["rgb"][0]).all() and len(set(d["rgb"][0])) == 1
    assert np.array_equal(d["gps_time"], gps)
    # constant cloud should compress to almost nothing
    assert os.path.getsize(p) < 2500


def test_gps_sequence_switches_and_64bit_jumps(tmp_path):
    # two interleaved scanners (alternating gps sequences — exercises the
    # sequence-switch symbols) plus jumps too large for 32-bit deltas
    # (the "full" path coding high 32 compressed + low 32 raw)
    rng = np.random.default_rng(7)
    n = 2000
    a = np.cumsum(rng.exponential(1e-5, n)) + 1e5
    b = np.cumsum(rng.exponential(1e-5, n)) + 9e5   # far from a: i64 delta
    gps = np.empty(n)
    gps[0::2] = a[0::2]
    gps[1::2] = b[1::2]
    # sprinkle catastrophic jumps
    gps[500] = -3.5e12
    gps[501] = 7.25e11
    pts, _ = _cloud(n, seed=3)
    d, _ = _roundtrip(tmp_path, pts, gps, chunk_size=600)
    assert np.array_equal(d["gps_time"], gps)


def test_gps_regular_multiples(tmp_path):
    # constant inter-pulse time then x2 / x-1 / x500-style multiples —
    # exercises the multiplier branches of GPSTIME11
    base = 1e-6
    seq = [0.0]
    for mult in [1] * 50 + [2, 1, 1, -1, 1, 8, 1, 1, 600, 1, 1, 0, 0, 1] * 10:
        seq.append(seq[-1] + mult * base)
    gps = np.array(seq)
    pts, _ = _cloud(len(gps), seed=11)
    d, _ = _roundtrip(tmp_path, pts, gps)
    assert np.array_equal(d["gps_time"], gps)


def test_full_color_rgb_all_byte_paths(tmp_path):
    # force every m_byte_used bit combination: low/high byte changes on
    # each channel independently, plus gray points interleaved
    rng = np.random.default_rng(5)
    n = 3000
    rgb = rng.integers(0, 65536, (n, 3)).astype(np.uint16)
    gray = rng.random(n) < 0.3
    rgb[gray, 1] = rgb[gray, 0]
    rgb[gray, 2] = rgb[gray, 0]
    hold = rng.random(n) < 0.3           # runs of identical color
    for i in range(1, n):
        if hold[i]:
            rgb[i] = rgb[i - 1]
    pts, _ = _cloud(n, seed=5)
    pts[:, 3:] = rgb / 65535.0
    d, _ = _roundtrip(tmp_path, pts)
    assert np.array_equal(d["rgb"], rgb)


def test_point10_field_churn_via_records(tmp_path):
    # drive intensity / bit-byte / classification / psid churn through the
    # raw record encoder: build records by hand, encode+decode, compare.
    rng = np.random.default_rng(13)
    n = 4000
    rec_len = 20
    rec = np.zeros((n, rec_len), np.uint8)
    xyz_i = np.cumsum(rng.integers(-500, 500, (n, 3)), axis=0).astype("<i4")
    rec[:, :12] = xyz_i.view(np.uint8).reshape(n, 12)
    intensity = (rng.integers(0, 3, n) * rng.integers(0, 65536, n)) \
        .astype("<u2")
    rec[:, 12:14] = intensity.reshape(n, 1).view(np.uint8)
    ret_no = rng.integers(1, 6, n)
    n_ret = np.maximum(ret_no, rng.integers(1, 6, n))
    scan_dir = rng.integers(0, 2, n)
    edge = rng.integers(0, 2, n)
    rec[:, 14] = (ret_no | (n_ret << 3) | (scan_dir << 6) | (edge << 7)) \
        .astype(np.uint8)
    rec[:, 15] = rng.integers(0, 32, n).astype(np.uint8)      # classification
    rec[:, 16] = rng.integers(0, 256, n).astype(np.uint8)     # scan angle
    rec[:, 17] = rng.integers(0, 4, n).astype(np.uint8)       # user data
    psid = np.repeat(rng.integers(0, 4, (n + 99) // 100), 100)[:n] \
        .astype("<u2")
    rec[:, 18:20] = psid.reshape(n, 1).view(np.uint8)

    lib = laz.get_lib()
    items = np.array([laz._ITEM_POINT10], np.uint16)
    cap = n * rec_len * 2 + 4096
    dst = np.zeros(cap, np.uint8)
    chunk_bytes = np.zeros(4, np.int64)
    total = lib.laz_encode(np.ascontiguousarray(rec.reshape(-1)), n, rec_len,
                           items, 1, 0, 1500, dst, cap, chunk_bytes)
    assert total > 0
    starts = np.concatenate([[0], np.cumsum(chunk_bytes[:2])]).astype(np.int64)
    counts = np.array([1500, 1500, n - 3000], np.int64)
    out = np.zeros((n, rec_len), np.uint8)
    rc = lib.laz_decode(dst[:total], total, starts, counts, 3, items, 1, 0,
                        out)
    assert rc == 0
    assert np.array_equal(out, rec)


def test_extra_bytes_item(tmp_path):
    # BYTE item (extra per-point attributes beyond the standard format)
    rng = np.random.default_rng(17)
    n, extra = 800, 5
    rec_len = 20 + extra
    rec = np.zeros((n, rec_len), np.uint8)
    xyz_i = np.cumsum(rng.integers(-50, 50, (n, 3)), axis=0).astype("<i4")
    rec[:, :12] = xyz_i.view(np.uint8).reshape(n, 12)
    rec[:, 14] = 0x09
    rec[:, 20:] = rng.integers(0, 256, (n, extra)).astype(np.uint8)
    lib = laz.get_lib()
    items = np.array([laz._ITEM_POINT10, laz._ITEM_BYTE], np.uint16)
    cap = n * rec_len * 2 + 4096
    dst = np.zeros(cap, np.uint8)
    chunk_bytes = np.zeros(1, np.int64)
    total = lib.laz_encode(np.ascontiguousarray(rec.reshape(-1)), n, rec_len,
                           items, 2, extra, 50000, dst, cap, chunk_bytes)
    assert total > 0
    out = np.zeros((n, rec_len), np.uint8)
    rc = lib.laz_decode(dst[:total], total, np.zeros(1, np.int64),
                        np.array([n], np.int64), 1, items, 2, extra, out)
    assert rc == 0
    assert np.array_equal(out, rec)


def test_load_cloud_dispatches_to_native_laz(tmp_path):
    # las_io.load_cloud must read .laz through the native codec when laspy
    # is absent (reference utils.load_las contract: xyz + rgb/65536)
    pts, _ = _cloud(300, seed=21)
    p = str(tmp_path / "cloud.laz")
    laz.write_laz(p, pts)
    out = las_io.load_cloud(p)
    assert out.shape == (300, 6)
    assert np.abs(out[:, :3] - pts[:, :3]).max() <= 5e-5 + 1e-12
    exp_rgb = np.round(np.clip(pts[:, 3:], 0, 1) * 65535) / 65536.0
    assert np.abs(out[:, 3:] - exp_rgb).max() < 1e-9


def test_las_and_laz_agree(tmp_path):
    # the same cloud through the uncompressed and compressed writers must
    # decode identically (same quantization)
    pts, _ = _cloud(500, seed=23)
    p_las = str(tmp_path / "c.las")
    p_laz = str(tmp_path / "c.laz")
    las_io.save_las(p_las, pts)
    laz.write_laz(p_laz, pts)
    a = las_io.load_cloud(p_las)
    b = las_io.load_cloud(p_laz)
    assert np.allclose(a, b, atol=1e-12)
    assert os.path.getsize(p_laz) < os.path.getsize(p_las)


def test_big_coordinate_jumps(tmp_path):
    # teleporting scanner: deltas that need the full 32-bit corrector range
    rng = np.random.default_rng(29)
    n = 600
    xyz = np.cumsum(rng.normal(0, 0.02, (n, 3)), axis=0)
    jumps = rng.integers(0, n, 12)
    xyz[jumps] += rng.uniform(-5e4, 5e4, (12, 3))
    xyz = np.cumsum(np.abs(np.diff(xyz, axis=0, prepend=xyz[:1])), axis=0)
    pts = np.concatenate([xyz, rng.random((n, 3))], axis=1)
    d, _ = _roundtrip(tmp_path, pts, scale=1e-3)
    # scale auto-widens for the large extent; check against stored scale
    q = d["scale"].max() / 2
    assert np.abs(d["xyz"] - xyz).max() <= q + 1e-9


def test_threaded_chunk_codec_matches_serial(tmp_path, monkeypatch):
    """Chunks are independent arithmetic streams decoded/encoded by a
    thread pool; FLOWCOMPARE_LAZ_THREADS forces the pool on boxes where
    hardware_concurrency()==1 would silently serialize. Threaded output
    must be byte-identical to serial."""
    pts, rng = _cloud(6000, seed=47)
    gps = np.cumsum(rng.exponential(1e-5, 6000))
    p_ser = str(tmp_path / "serial.laz")
    p_thr = str(tmp_path / "threaded.laz")
    monkeypatch.setenv("FLOWCOMPARE_LAZ_THREADS", "1")
    laz.write_laz(p_ser, pts, gps_time=gps, chunk_size=500)  # 12 chunks
    monkeypatch.setenv("FLOWCOMPARE_LAZ_THREADS", "4")
    laz.write_laz(p_thr, pts, gps_time=gps, chunk_size=500)
    assert open(p_ser, "rb").read() == open(p_thr, "rb").read()
    d_thr = laz.read_laz(p_thr)                    # threaded decode
    monkeypatch.setenv("FLOWCOMPARE_LAZ_THREADS", "1")
    d_ser = laz.read_laz(p_ser)                    # serial decode
    assert np.array_equal(d_thr["point_records"], d_ser["point_records"])
    assert np.array_equal(d_thr["gps_time"], gps)


def test_corrupt_streams_do_not_crash(tmp_path):
    """Decoding flipped/truncated/garbage compressed bytes must return
    SOMETHING (wrong points) or raise LazError — never crash or hang.
    The decoder feeds zeros past file end and every model index is
    bounded, so arbitrary bytes decode to arbitrary-but-bounded output."""
    pts, rng = _cloud(2000, seed=41)
    gps = np.cumsum(rng.exponential(1e-5, 2000))
    p = str(tmp_path / "c.laz")
    laz.write_laz(p, pts, gps_time=gps, chunk_size=300)
    raw = bytearray(open(p, "rb").read())
    hdr_end = 227 + 54 + 52  # header + vlr header + payload (3 items)
    for seed in range(8):
        r2 = np.random.default_rng(seed)
        buf = bytearray(raw)
        # flip 40 random bytes inside the compressed point region
        for off in r2.integers(hdr_end + 8, len(raw) - 40, 40):
            buf[off] ^= int(r2.integers(1, 256))
        pc = str(tmp_path / f"corrupt{seed}.laz")
        open(pc, "wb").write(bytes(buf))
        try:
            d = laz.read_laz(pc)
            assert d["xyz"].shape == (2000, 3)
        except laz.LazError:
            pass  # loud rejection is fine
    # hard truncation mid-stream
    open(str(tmp_path / "trunc.laz"), "wb").write(bytes(raw[:len(raw) // 2]))
    try:
        laz.read_laz(str(tmp_path / "trunc.laz"))
    except laz.LazError:
        pass


def test_rejects_non_laz(tmp_path):
    pts, _ = _cloud(50)
    p = str(tmp_path / "plain.las")
    las_io.save_las(p, pts)
    os.rename(p, str(tmp_path / "fake.laz"))
    with pytest.raises(laz.LazError, match="no laszip VLR"):
        laz.read_laz(str(tmp_path / "fake.laz"))
