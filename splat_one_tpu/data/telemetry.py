"""Video-embedded telemetry: CAMM and GoPro GPMF geotag tracks.

Replaces the reference's mapillary_tools video geotag sources
``--geotag_source camm / gopro_videos`` (reference surface:
app/main_app.py:248-264, VideoProcessCommand geotag_source): a minimal
ISO-BMFF (MP4) demuxer locates the metadata track and its samples, and the
two payload parsers decode GPS fixes into the same ``[{time_s, lat, lon,
alt}]`` track format as ``data.video.parse_gpx`` (time_s is
video-relative — the sample's presentation time — so frames extracted at
``i * interval_s`` interpolate directly).

- CAMM (Android Camera Motion Metadata): little-endian samples of
  ``u16 reserved, u16 type``; type 5 = position (3 doubles lat/lon/alt),
  type 6 = full GPS (time, fix, lat/lon doubles, alt float, accuracies,
  velocities). Sample entry fourcc ``camm``.
- GPMF (GoPro metadata): big-endian KLV (fourcc, type, struct size,
  repeat); ``GPS5`` rows (lat, lon, alt, speed2d, speed3d as s32) scaled
  by the stream's ``SCAL`` divisors. Sample entry fourcc ``gpmd``; rows
  within one packet spread evenly across the sample's duration.

Pure stdlib struct parsing — no ffmpeg/av dependency; only the box types
needed for sample extraction are implemented (stsd/stts/stsc/stsz/stco/
co64, 64-bit largesize boxes included).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts",
               b"udta"}


def _boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for boxes in a range."""
    off = start
    while off + 8 <= end:
        size, typ = struct.unpack_from(">I4s", buf, off)
        hdr = 8
        if size == 1:
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            break
        yield typ, off + hdr, off + size
        off += size


def _find(buf, start, end, path):
    """First box at a nested fourcc path; returns (pstart, pend)."""
    if not path:
        return start, end
    for typ, ps, pe in _boxes(buf, start, end):
        if typ == path[0]:
            return _find(buf, ps, pe, path[1:])
    return None


def _find_all(buf, start, end, fourcc):
    return [(ps, pe) for typ, ps, pe in _boxes(buf, start, end)
            if typ == fourcc]


def mp4_metadata_samples(data: bytes, entry_fourcc: bytes):
    """Samples of the first track whose stsd entry is ``entry_fourcc``:
    [(offset, size, t_s, dur_s)] with presentation times in seconds."""
    moov = _find(data, 0, len(data), [b"moov"])
    if moov is None:
        return []
    for tps, tpe in _find_all(data, moov[0], moov[1], b"trak"):
        mdia = _find(data, tps, tpe, [b"mdia"])
        if mdia is None:
            continue
        stbl = _find(data, mdia[0], mdia[1], [b"minf", b"stbl"])
        mdhd = _find(data, mdia[0], mdia[1], [b"mdhd"])
        if stbl is None or mdhd is None:
            continue
        ver = data[mdhd[0]]
        timescale = struct.unpack_from(
            ">I", data, mdhd[0] + (20 if ver == 1 else 12))[0]
        stsd = _find(data, stbl[0], stbl[1], [b"stsd"])
        if stsd is None:
            continue
        n_entries = struct.unpack_from(">I", data, stsd[0] + 4)[0]
        off = stsd[0] + 8
        fmt = None
        for _ in range(n_entries):
            esize, efmt = struct.unpack_from(">I4s", data, off)
            fmt = efmt
            break  # first entry decides the track type
        if fmt != entry_fourcc:
            continue

        def table(cc):
            box = _find(data, stbl[0], stbl[1], [cc])
            return box

        # sample sizes
        stsz = table(b"stsz")
        const_size, n_samples = struct.unpack_from(
            ">II", data, stsz[0] + 4)
        if const_size:
            sizes = [const_size] * n_samples
        else:
            sizes = list(struct.unpack_from(
                f">{n_samples}I", data, stsz[0] + 12))
        # chunk offsets
        stco = table(b"stco")
        if stco is not None:
            n_chunks = struct.unpack_from(">I", data, stco[0] + 4)[0]
            chunk_offs = list(struct.unpack_from(
                f">{n_chunks}I", data, stco[0] + 8))
        else:
            co64 = table(b"co64")
            n_chunks = struct.unpack_from(">I", data, co64[0] + 4)[0]
            chunk_offs = list(struct.unpack_from(
                f">{n_chunks}Q", data, co64[0] + 8))
        # samples per chunk
        stsc = table(b"stsc")
        n_stsc = struct.unpack_from(">I", data, stsc[0] + 4)[0]
        stsc_rows = [
            struct.unpack_from(">III", data, stsc[0] + 8 + 12 * i)
            for i in range(n_stsc)
        ]
        # per-sample durations
        stts = table(b"stts")
        n_stts = struct.unpack_from(">I", data, stts[0] + 4)[0]
        durs: List[int] = []
        for i in range(n_stts):
            cnt, delta = struct.unpack_from(
                ">II", data, stts[0] + 8 + 8 * i)
            durs += [delta] * cnt
        durs += [durs[-1] if durs else 1] * (n_samples - len(durs))

        samples = []
        si = 0
        t = 0
        for ci, coff in enumerate(chunk_offs):
            spc = 1
            for first, cnt, _ in stsc_rows:
                if ci + 1 >= first:
                    spc = cnt
            off_in = coff
            for _ in range(spc):
                if si >= n_samples:
                    break
                samples.append((off_in, sizes[si], t / timescale,
                                durs[si] / timescale))
                off_in += sizes[si]
                t += durs[si]
                si += 1
        return samples
    return []


def parse_camm_bytes(data: bytes) -> List[Dict]:
    """CAMM GPS track (types 5/6) -> [{time_s, lat, lon, alt}]."""
    out = []
    for off, size, t_s, _dur in mp4_metadata_samples(data, b"camm"):
        if size < 4:
            continue
        _res, typ = struct.unpack_from("<HH", data, off)
        p = off + 4
        if typ == 5 and size >= 4 + 24:
            lat, lon, alt = struct.unpack_from("<ddd", data, p)
            out.append(dict(time_s=t_s, lat=lat, lon=lon, alt=alt))
        elif typ == 6 and size >= 4 + 8 + 4 + 8 + 8 + 4:
            (_t_gps, _fix, lat, lon, alt) = struct.unpack_from(
                "<diddf", data, p)
            out.append(dict(time_s=t_s, lat=lat, lon=lon, alt=alt))
    return sorted(out, key=lambda r: r["time_s"])


def _gpmf_klv(data: bytes, start: int, end: int):
    """Yield (fourcc, type, struct_size, repeat, payload_off) KLV items."""
    off = start
    while off + 8 <= end:
        cc = data[off:off + 4]
        typ = data[off + 4]
        ssz = data[off + 5]
        rep = struct.unpack_from(">H", data, off + 6)[0]
        plen = ssz * rep
        yield cc, typ, ssz, rep, off + 8
        off += 8 + ((plen + 3) & ~3)


def parse_gpmf_payload(data: bytes, start: int, end: int,
                       t0: float, dur: float) -> List[Dict]:
    """One gpmd sample payload -> GPS rows (GPS5 scaled by SCAL)."""
    rows: List[Dict] = []
    scal: Optional[List[int]] = None
    gps5: List[tuple] = []
    for cc, typ, ssz, rep, poff in _gpmf_klv(data, start, end):
        if typ == 0:  # nested container (DEVC / STRM)
            rows += parse_gpmf_payload(data, poff, poff + ssz * rep,
                                       t0, dur)
        elif cc == b"SCAL":
            n = (ssz * rep) // 4
            scal = list(struct.unpack_from(f">{n}i", data, poff))
        elif cc == b"GPS5" and ssz == 20:
            for i in range(rep):
                gps5.append(struct.unpack_from(">5i", data, poff + 20 * i))
    if gps5:
        s = scal or [1] * 5
        n = len(gps5)
        for i, (lat, lon, alt, _s2, _s3) in enumerate(gps5):
            rows.append(dict(
                time_s=t0 + dur * i / max(n, 1),
                lat=lat / s[0], lon=lon / s[1], alt=alt / s[2],
            ))
    return rows


def parse_gpmf_bytes(data: bytes) -> List[Dict]:
    """GoPro GPMF GPS track -> [{time_s, lat, lon, alt}]."""
    out: List[Dict] = []
    for off, size, t_s, dur in mp4_metadata_samples(data, b"gpmd"):
        out += parse_gpmf_payload(data, off, off + size, t_s, dur)
    return sorted(out, key=lambda r: r["time_s"])


def parse_video_geotags(video_path: str, source: str = "auto"
                        ) -> List[Dict]:
    """Extract the embedded GPS track from an MP4 (source: "camm",
    "gopro", or "auto" = try camm then gpmf).

    The file is memory-mapped, not read: capture videos are multi-GB but
    the parsers only touch the moov box tables and the located metadata
    sample ranges, so the OS pages in a few hundred KB."""
    import mmap
    import os

    if os.path.getsize(video_path) == 0:
        return []
    with open(video_path, "rb") as fh:
        with mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ) as data:
            if source in ("camm", "auto"):
                track = parse_camm_bytes(data)
                if track or source == "camm":
                    return track
            return parse_gpmf_bytes(data)
