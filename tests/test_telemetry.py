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


def _rmc(t_ms, lat_deg, lon_deg):
    """One bracketed BlackVue RMC line."""
    def dm(v):
        d = int(abs(v))
        m = (abs(v) - d) * 60
        return f"{d:02d}{m:07.4f}"

    lat_h = "N" if lat_deg >= 0 else "S"
    lon_h = "E" if lon_deg >= 0 else "W"
    body = (f"GPRMC,120000.00,A,{dm(lat_deg)},{lat_h},"
            f"{dm(lon_deg)},{lon_h},0.0,0.0,070621,,,A")
    return f"[{t_ms}]${body}*00\r\n".encode()


class TestBlackvue:
    def test_free_box_nmea(self):
        lines = (_rmc(1623057074000, 35.5, 139.25)
                 + f"[1623057074000]$GPGGA,120000.00,,,,,1,08,1.0,"
                   f"42.5,M,,,,*00\r\n".encode()
                 + _rmc(1623057075000, 35.6, 139.35))
        data = _box(b"ftyp", b"mp42") + _box(b"free", lines) + _box(
            b"mdat", b"\x00" * 32)
        track = T.parse_blackvue_bytes(data)
        assert len(track) == 2
        np.testing.assert_allclose(
            [p["lat"] for p in track], [35.5, 35.6], atol=1e-6)
        np.testing.assert_allclose(
            [p["lon"] for p in track], [139.25, 139.35], atol=1e-6)
        # video-relative times from the bracket epochs
        np.testing.assert_allclose(
            [p["time_s"] for p in track], [0.0, 1.0])
        assert track[0]["alt"] == 42.5

    def test_auto_falls_through_to_blackvue(self, tmp_path):
        data = _box(b"ftyp", b"mp42") + _box(
            b"free", _rmc(1000000000000, 1.5, 2.5))
        p = tmp_path / "bv.mp4"
        p.write_bytes(data)
        track = T.parse_video_geotags(str(p), "auto")
        assert len(track) == 1 and abs(track[0]["lat"] - 1.5) < 1e-6
        track2 = T.parse_video_geotags(str(p), "blackvue")
        assert len(track2) == 1


class TestExiftoolXml:
    def test_rdf_track(self, tmp_path):
        xml = """<?xml version='1.0'?>
<rdf:RDF xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#'
         xmlns:Track3='http://ns.exiftool.org/QuickTime/Track3/1.0/'>
 <rdf:Description>
  <Track3:GPSDateTime>2021:06:07 12:00:00.000Z</Track3:GPSDateTime>
  <Track3:GPSLatitude>35 deg 30' 0.00" N</Track3:GPSLatitude>
  <Track3:GPSLongitude>139 deg 15' 0.00" E</Track3:GPSLongitude>
  <Track3:GPSAltitude>12.3 m</Track3:GPSAltitude>
  <Track3:GPSDateTime>2021:06:07 12:00:01.000Z</Track3:GPSDateTime>
  <Track3:GPSLatitude>35.6</Track3:GPSLatitude>
  <Track3:GPSLongitude>139.35</Track3:GPSLongitude>
  <Track3:GPSAltitude>13.3 m</Track3:GPSAltitude>
 </rdf:Description>
</rdf:RDF>"""
        p = tmp_path / "v.xml"
        p.write_text(xml)
        track = T.parse_exiftool_xml(str(p))
        assert len(track) == 2
        np.testing.assert_allclose(
            [r["lat"] for r in track], [35.5, 35.6], atol=1e-6)
        np.testing.assert_allclose(
            [r["time_s"] for r in track], [0.0, 1.0])
        np.testing.assert_allclose(
            [r["alt"] for r in track], [12.3, 13.3])

    def test_geotag_file_dispatch(self, tmp_path):
        from splat_one_tpu.data.video import parse_geotag_file

        xml = """<?xml version='1.0'?>
<rdf:RDF xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#'
         xmlns:T='http://ns.exiftool.org/QuickTime/Track3/1.0/'>
 <rdf:Description>
  <T:GPSLatitude>1.5</T:GPSLatitude>
  <T:GPSLongitude>2.5</T:GPSLongitude>
 </rdf:Description>
</rdf:RDF>"""
        p = tmp_path / "g.xml"
        p.write_text(xml)
        track = parse_geotag_file(str(p))
        assert len(track) == 1 and track[0]["lon"] == 2.5
