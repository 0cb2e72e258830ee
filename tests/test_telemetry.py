"""CAMM / GoPro-GPMF video telemetry parsers (data.telemetry).

Builds minimal valid ISO-BMFF files in-test (ftyp + mdat + moov with one
metadata track: stsd/stts/stsc/stsz/stco) and checks the embedded GPS
tracks decode to the shared ``[{time_s, lat, lon, alt}]`` contract the
geotag interpolation consumes (reference surface: mapillary_tools
``--geotag_source camm / gopro_videos``, main_app.py:248-264)."""

import struct

import numpy as np

from splat_one_tpu.data import telemetry as T


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, payload: bytes, version=0) -> bytes:
    return _box(fourcc, struct.pack(">I", version << 24) + payload)


def _make_mp4(entry_fourcc: bytes, samples, timescale=1000,
              delta=500) -> bytes:
    """One metadata track; each sample is one bytes blob, ``delta`` ticks
    apart, all in a single chunk inside mdat."""
    mdat_payload = b"".join(samples)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    # mdat starts right after ftyp
    mdat = _box(b"mdat", mdat_payload)
    data_off = len(ftyp) + 8  # offset of first sample
    stsd = _full(b"stsd", struct.pack(">I", 1) + _box(
        entry_fourcc, b"\x00" * 8))
    stts = _full(b"stts", struct.pack(">III", 1, len(samples), delta))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, len(samples), 1))
    stsz = _full(b"stsz", struct.pack(
        ">II", 0, len(samples)) + b"".join(
        struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", struct.pack(">II", 1, data_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale,
                                      len(samples) * delta, 0, 0))
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"meta" + b"\x00" * 13)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    return ftyp + mdat + moov


def _camm_sample6(t_gps, lat, lon, alt):
    return struct.pack("<HH", 0, 6) + struct.pack(
        "<diddfffffff", t_gps, 3, lat, lon, alt, 1.0, 1.0,
        0.0, 0.0, 0.0, 0.1)


def _camm_sample5(lat, lon, alt):
    return struct.pack("<HH", 0, 5) + struct.pack("<ddd", lat, lon, alt)


class TestCamm:
    def test_type6_track(self):
        lats = [35.0, 35.001, 35.002]
        samples = [_camm_sample6(1e9 + i, lats[i], 139.0 + i * 1e-3,
                                 40.0 + i) for i in range(3)]
        data = _make_mp4(b"camm", samples)
        track = T.parse_camm_bytes(data)
        assert len(track) == 3
        np.testing.assert_allclose([p["lat"] for p in track], lats)
        np.testing.assert_allclose(
            [p["time_s"] for p in track], [0.0, 0.5, 1.0])
        np.testing.assert_allclose(
            [p["alt"] for p in track], [40.0, 41.0, 42.0])

    def test_type5_track(self):
        samples = [_camm_sample5(-12.5 + i, 45.25, 100.0)
                   for i in range(2)]
        track = T.parse_camm_bytes(_make_mp4(b"camm", samples))
        assert [p["lat"] for p in track] == [-12.5, -11.5]

    def test_non_gps_types_skipped(self):
        gyro = struct.pack("<HH", 0, 2) + struct.pack("<fff", 0, 0, 0)
        samples = [gyro, _camm_sample5(1.0, 2.0, 3.0), gyro]
        track = T.parse_camm_bytes(_make_mp4(b"camm", samples))
        assert len(track) == 1 and track[0]["lon"] == 2.0


def _klv(cc: bytes, typ: int, ssz: int, rep: int, payload: bytes):
    pad = (-len(payload)) % 4
    return cc + bytes([typ, ssz]) + struct.pack(">H", rep) + (
        payload + b"\x00" * pad)


def _gpmf_sample(rows, scal=(10**7, 10**7, 1000, 1000, 100)):
    gps5 = b"".join(
        struct.pack(">5i", int(lat * scal[0]), int(lon * scal[1]),
                    int(alt * scal[2]), 0, 0)
        for lat, lon, alt in rows)
    strm = (_klv(b"SCAL", ord("l"), 4, 5,
                 struct.pack(">5i", *scal))
            + _klv(b"GPS5", ord("l"), 20, len(rows), gps5))
    devc = _klv(b"STRM", 0, 1, len(strm), strm)
    return _klv(b"DEVC", 0, 1, len(devc), devc)


class TestGpmf:
    def test_gps5_scaled(self):
        rows1 = [(35.1, 139.2, 12.0), (35.2, 139.3, 13.0)]
        rows2 = [(35.3, 139.4, 14.0)]
        data = _make_mp4(b"gpmd", [_gpmf_sample(rows1),
                                   _gpmf_sample(rows2)])
        track = T.parse_gpmf_bytes(data)
        assert len(track) == 3
        np.testing.assert_allclose(
            [p["lat"] for p in track], [35.1, 35.2, 35.3], atol=1e-6)
        np.testing.assert_allclose(
            [p["alt"] for p in track], [12.0, 13.0, 14.0], atol=1e-3)
        # first sample's 2 rows spread over its 0.5 s duration
        np.testing.assert_allclose(
            [p["time_s"] for p in track], [0.0, 0.25, 0.5])

    def test_auto_dispatch(self, tmp_path):
        data = _make_mp4(b"gpmd", [_gpmf_sample([(1.0, 2.0, 3.0)])])
        p = tmp_path / "v.mp4"
        p.write_bytes(data)
        track = T.parse_video_geotags(str(p), "auto")
        assert len(track) == 1 and track[0]["lat"] == 1.0


def test_wrong_track_ignored():
    # a camm parse over a gpmd file finds nothing (and vice versa)
    data = _make_mp4(b"gpmd", [_gpmf_sample([(1.0, 2.0, 3.0)])])
    assert T.parse_camm_bytes(data) == []
    data2 = _make_mp4(b"camm", [_camm_sample5(1, 2, 3)])
    assert T.parse_gpmf_bytes(data2) == []
