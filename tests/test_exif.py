"""EXIF APP1/TIFF IFD walk + GPS PII scrub (operators/multimodal:
parse_jpeg_exif / strip_jpeg_exif_gps — VERDICT r12 item 4): fixtures
built by an INDEPENDENT test-side TIFF encoder, both byte orders,
closed-form GPS arithmetic, corrupt-IFD quarantine."""

import struct

import pytest

from aws_de_final_project_spark.operators import multimodal as MM


def build_tiff(endian: str, orientation: int | None,
               datetime_s: str | None,
               gps: tuple | None) -> bytes:
    """Independent TIFF-block encoder. gps = (lat_dms, lat_ref,
    lon_dms, lon_ref) with dms = ((dn,dd),(mn,md),(sn,sd))."""
    e = "<" if endian == "II" else ">"
    n0 = sum(x is not None for x in (orientation, datetime_s, gps))
    ifd0_at = 8
    ifd0_size = 2 + 12 * n0 + 4
    gps_at = ifd0_at + ifd0_size if gps else None
    gps_size = 2 + 12 * 4 + 4 if gps else 0
    data_at = ifd0_at + ifd0_size + gps_size

    data_area = bytearray()

    def defer(b: bytes) -> int:
        off = data_at + len(data_area)
        data_area.extend(b)
        return off

    entries0 = []
    if orientation is not None:
        entries0.append(
            struct.pack(e + "HHI", 0x0112, 3, 1)
            + struct.pack(e + "H", orientation) + b"\x00\x00"
        )
    if datetime_s is not None:
        raw = datetime_s.encode()[:19] + b"\x00"
        off = defer(raw)
        entries0.append(struct.pack(e + "HHII", 0x0132, 2, len(raw), off))
    if gps is not None:
        entries0.append(struct.pack(e + "HHII", 0x8825, 4, 1, gps_at))
    ifd0 = (struct.pack(e + "H", n0) + b"".join(entries0)
            + struct.pack(e + "I", 0))

    gps_ifd = b""
    if gps is not None:
        lat_dms, lat_ref, lon_dms, lon_ref = gps

        def rat3(dms):
            return defer(b"".join(
                struct.pack(e + "II", n, d) for n, d in dms
            ))

        lat_off, lon_off = rat3(lat_dms), rat3(lon_dms)
        gents = [
            struct.pack(e + "HHI", 0x0001, 2, 2)
            + lat_ref.encode() + b"\x00\x00\x00",
            struct.pack(e + "HHII", 0x0002, 5, 3, lat_off),
            struct.pack(e + "HHI", 0x0003, 2, 2)
            + lon_ref.encode() + b"\x00\x00\x00",
            struct.pack(e + "HHII", 0x0004, 5, 3, lon_off),
        ]
        gps_ifd = (struct.pack(e + "H", 4) + b"".join(gents)
                   + struct.pack(e + "I", 0))

    head = endian.encode() + struct.pack(e + "HI", 42, ifd0_at)
    return head + ifd0 + gps_ifd + bytes(data_area)


def wrap_jpeg(tiff: bytes | None) -> bytes:
    sof = b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 16, 16, 1) + b"\x01\x11\x00"
    app1 = b""
    if tiff is not None:
        app1 = (b"\xff\xe1" + struct.pack(">H", 8 + len(tiff))
                + b"Exif\x00\x00" + tiff)
    return b"\xff\xd8" + app1 + sof + b"\xff\xd9"


GPS = (((40, 1), (26, 1), (4628, 100)), "N",
       ((79, 1), (58, 1), (5612, 100)), "W")


@pytest.mark.parametrize("endian", ["II", "MM"])
def test_parse_both_byte_orders(endian):
    jpg = wrap_jpeg(build_tiff(endian, 6, "2024:01:15 10:30:05", GPS))
    m = MM.parse_jpeg_exif(jpg)
    assert m["has_exif"] is True
    assert m["byte_order"] == endian
    assert m["orientation"] == 6
    assert m["datetime"] == "2024:01:15 10:30:05"
    # 40d 26m 46.28s N -> 40*3.6M + 26*60k + 46280 = 145_606_280
    assert m["gps_lat_mas"] == 40 * 3_600_000 + 26 * 60_000 + 46_280
    # 79d 58m 56.12s W -> negative
    assert m["gps_lon_mas"] == -(79 * 3_600_000 + 58 * 60_000 + 56_120)


def test_no_exif_and_exif_without_gps():
    assert MM.parse_jpeg_exif(wrap_jpeg(None)) == {
        "has_exif": False, "byte_order": None, "orientation": None,
        "datetime": None, "gps_lat_mas": None, "gps_lon_mas": None,
    }
    m = MM.parse_jpeg_exif(wrap_jpeg(build_tiff("II", 1, None, None)))
    assert m["has_exif"] is True and m["gps_lat_mas"] is None


@pytest.mark.parametrize(
    "mutate",
    [
        # ifd0 offset beyond the tiff block
        lambda t: t[:4] + struct.pack("<I", 10_000) + t[8:],
        # byte-order mark garbage
        lambda t: b"XX" + t[2:],
        # magic != 42
        lambda t: t[:2] + struct.pack("<H", 41) + t[4:],
        # truncate mid-IFD
        lambda t: t[:14],
    ],
)
def test_corrupt_tiff_rejected(mutate):
    tiff = build_tiff("II", 3, "2024:01:01 00:00:00", GPS)
    with pytest.raises(ValueError):
        MM.parse_jpeg_exif(wrap_jpeg(mutate(tiff)))


def test_zero_denominator_rejected():
    bad_gps = (((40, 1), (26, 0), (4628, 100)), "N",
               ((79, 1), (58, 1), (5612, 100)), "W")
    with pytest.raises(ValueError):
        MM.parse_jpeg_exif(wrap_jpeg(build_tiff("MM", 1, None, bad_gps)))


def test_scrub_removes_app1_only_when_gps():
    with_gps = wrap_jpeg(build_tiff("II", 6, "2024:02:02 02:02:02", GPS))
    clean, had = MM.strip_jpeg_exif_gps(with_gps)
    assert had is True
    assert clean == wrap_jpeg(None)  # exact splice
    m = MM.parse_jpeg_exif(clean)
    assert m["has_exif"] is False
    # still a sniffable JPEG
    assert MM.sniff_media_header(clean)[0] == "jpeg"
    no_gps = wrap_jpeg(build_tiff("MM", 1, "2024:03:03 03:03:03", None))
    clean2, had2 = MM.strip_jpeg_exif_gps(no_gps)
    assert had2 is False and clean2 == no_gps  # byte-identical


def test_distributed_meta_and_scrub_quarantine(spark):
    good = wrap_jpeg(build_tiff("MM", 8, "2024:04:04 04:04:04", GPS))
    corrupt = wrap_jpeg(b"XX" + build_tiff("II", 1, None, None)[2:])
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(corrupt))],
        "media_id long, payload binary",
    )
    meta = {r.media_id: r for r in MM.media_exif_meta(df).collect()}
    assert meta[1].orientation == 8 and meta[1].byte_order == "MM"
    assert meta[1].gps_lon_mas < 0
    assert meta[2].has_exif is None  # quarantined
    scrub = {r.media_id: r for r in MM.scrub_exif_gps(df).collect()}
    assert scrub[1].had_gps is True
    assert scrub[1].bytes_removed == len(good) - len(wrap_jpeg(None))
    assert scrub[2].had_gps is None
    assert bytes(scrub[2].payload) == corrupt  # preserved for sink
