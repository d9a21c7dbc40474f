"""Baseline JPEG codec tests.

The decoder is pinned against HAND-ASSEMBLED files whose pixels follow in
closed form from the T.81 spec (a DC-only block is a constant plane; a
single AC coefficient is a cosine ramp computed here with the naive
double-sum IDCT definition) — so decoder correctness does not depend on
the encoder sharing its transform code. Round-trips then pin the encoder
via the BASELINE.json lossy invariant (PSNR >= 40 dB).
"""

import struct

import numpy as np
import pytest

from pyramidscheme_jl_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    psnr,
)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _minimal_gray(quant: int, dht_dc, dht_ac, scan: bytes) -> bytes:
    """Assemble an 8x8 single-component baseline JPEG by hand."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + bytes([quant] * 64))
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    bits_dc, vals_dc = dht_dc
    bits_ac, vals_ac = dht_ac
    out += _seg(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(vals_dc))
    out += _seg(0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(vals_ac))
    out += _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_dc_only_constant_plane():
    # DC Huffman: single 1-bit code '0' -> symbol 5 (size-5 magnitude).
    # AC Huffman: single 1-bit code '0' -> EOB.
    # Scan bits: 0 | 10101 | 0, 1-padded -> 0101_0101 = 0x55.
    # DC = EXTEND(0b10101=21, 5) = 21; dequant x8 -> 168; IDCT of a lone
    # DC coefficient c is the constant c/8 -> 21 + 128 = 149 everywhere.
    buf = _minimal_gray(
        quant=8,
        dht_dc=([1] + [0] * 15, [5]),
        dht_ac=([1] + [0] * 15, [0x00]),
        scan=bytes([0b01010101]),
    )
    img = decode_jpeg(buf)
    assert img.shape == (8, 8)
    assert (img == 149).all()


def test_decode_single_ac_matches_spec_idct():
    # DC symbol 0 (no magnitude bits, DC=0). AC codes: '00' -> (run 0,
    # size 2), '01' -> EOB. Scan bits: 0 | 00 11 | 01, 1-padded ->
    # 0001_1011 = 0x1b. Coefficient: zigzag index 1 = S(v=0, u=1), value
    # EXTEND(0b11=3, 2) = 3, dequant x16 -> 48.
    buf = _minimal_gray(
        quant=16,
        dht_dc=([1] + [0] * 15, [0]),
        dht_ac=([0, 2] + [0] * 14, [0x02, 0x00]),
        scan=bytes([0b00011011]),
    )
    img = decode_jpeg(buf)
    # naive T.81 A.3.3 inverse transform, straight from the spec text
    S = np.zeros((8, 8))
    S[0, 1] = 48.0
    expect = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * S[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            expect[y, x] = acc / 4 + 128
    np.testing.assert_array_equal(
        img, np.clip(np.round(expect), 0, 255).astype(np.uint8)
    )


@pytest.fixture(scope="module")
def photo_gray():
    """Smooth photo-like content (gradients + mild texture) — the regime
    the PSNR >= 40 dB lossy invariant is stated for."""
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:96, 0:120]
    return (
        128 + 80 * np.sin(xx / 25.0) * np.cos(yy / 19.0) + rng.randn(96, 120) * 3
    ).clip(0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def photo_rgb(photo_gray):
    g = photo_gray.astype(np.float64)
    return np.stack(
        [g, np.roll(g, 7, axis=1), (0.3 * g + 90)], axis=-1
    ).clip(0, 255).astype(np.uint8)


def test_roundtrip_gray_psnr40(photo_gray):
    dec = decode_jpeg(encode_jpeg(photo_gray, quality=90))
    assert dec.shape == photo_gray.shape
    assert psnr(photo_gray, dec) >= 40.0


def test_roundtrip_rgb_444_psnr40(photo_rgb):
    dec = decode_jpeg(encode_jpeg(photo_rgb, quality=95))
    assert dec.shape == photo_rgb.shape
    assert psnr(photo_rgb, dec) >= 40.0


def test_roundtrip_rgb_420_psnr40(photo_gray, photo_rgb):
    # 4:2:0 halves chroma resolution, so its PSNR ceiling is set by the
    # image's chroma bandwidth, not by quality. Photo-like content has
    # smooth chroma -> >= 40 dB; the deliberately chroma-textured fixture
    # (rolled channel) still bounds >= 36 dB.
    g = photo_gray.astype(np.float64)
    smooth = np.stack([g, 0.8 * g + 20, 0.6 * g + 40], axis=-1).clip(0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(smooth, quality=95, subsample=True))
    assert dec.shape == smooth.shape
    assert psnr(smooth, dec) >= 40.0
    dec = decode_jpeg(encode_jpeg(photo_rgb, quality=97, subsample=True))
    assert psnr(photo_rgb, dec) >= 36.0


def test_quality_100_near_lossless(photo_gray):
    assert psnr(photo_gray, decode_jpeg(encode_jpeg(photo_gray, quality=100))) >= 50.0


def test_quality_monotone(photo_gray):
    sizes = [len(encode_jpeg(photo_gray, quality=q)) for q in (50, 75, 90, 100)]
    assert sizes == sorted(sizes)
    p = [psnr(photo_gray, decode_jpeg(encode_jpeg(photo_gray, quality=q))) for q in (50, 90)]
    assert p[0] < p[1]


def test_restart_interval_identical_pixels(photo_rgb):
    """RSTn markers change the byte stream, not the pixels."""
    plain = decode_jpeg(encode_jpeg(photo_rgb, quality=92, subsample=True))
    rst = decode_jpeg(
        encode_jpeg(photo_rgb, quality=92, subsample=True, restart_interval=3)
    )
    np.testing.assert_array_equal(plain, rst)


def test_odd_dimensions_roundtrip(photo_gray):
    odd = photo_gray[:61, :53]
    dec = decode_jpeg(encode_jpeg(odd, quality=95))
    assert dec.shape == (61, 53)
    assert psnr(odd, dec) >= 40.0
    oddc = np.dstack([odd, odd, 255 - odd])
    dec = decode_jpeg(encode_jpeg(oddc, quality=97, subsample=True))
    assert dec.shape == (61, 53, 3)


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"PNG? nope")


def test_unsupported_sof_raises(photo_gray):
    buf = bytearray(encode_jpeg(photo_gray, quality=90))
    # rewrite SOF0 (FF C0) to SOF3 (lossless sequential — out of scope)
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(buf))


def test_missing_huffman_table_raises():
    buf = _minimal_gray(
        quant=8,
        dht_dc=([1] + [0] * 15, [5]),
        dht_ac=([1] + [0] * 15, [0x00]),
        scan=bytes([0b01010101]),
    )
    # drop the AC DHT segment (second FF C4)
    first = buf.find(b"\xff\xc4")
    second = buf.find(b"\xff\xc4", first + 2)
    seglen = struct.unpack(">H", buf[second + 2 : second + 4])[0]
    cut = buf[:second] + buf[second + 2 + seglen :]
    with pytest.raises(ValueError, match="Huffman table"):
        decode_jpeg(cut)


def test_image_features_jpeg_spark(spark):
    """fmt='jpeg' rows decode for REAL through the registry; features land
    within the lossy tolerance of the raw-path features on the same pixels."""
    from pyramidscheme_jl_spark.operators.multimodal import image_features
    from pyramidscheme_jl_spark.sources.synth import image_pixels

    img = image_pixels(0, 0)  # 256x256 uint8
    rgb = np.dstack([img, img // 2, img // 3])
    rows = [
        ("raw-0", img.tobytes(), 256, 256, "raw", "c", 0),
        ("jpg-g", encode_jpeg(img, quality=95), 256, 256, "jpeg", "c", 0),
        ("jpg-c", encode_jpeg(rgb, quality=95), 256, 256, "jpeg", "c", 0),
        ("jpg-s", encode_jpeg(rgb, quality=95, subsample=True), 256, 256, "jpg", "c", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    feats = {r["image_id"]: r for r in image_features(df).collect()}
    assert feats["jpg-g"]["mean_luma"] == pytest.approx(feats["raw-0"]["mean_luma"], abs=1.0)
    lum = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    for k in ("jpg-c", "jpg-s"):
        assert feats[k]["mean_luma"] == pytest.approx(float(lum.mean()), abs=1.5)


def test_roundtrip_rgb_422(photo_gray):
    """4:2:2 (horizontal-only chroma decimation) exercises the decoder's
    asymmetric (2,1)-sampling upsample path."""
    g = photo_gray.astype(np.float64)
    smooth = np.stack([g, 0.8 * g + 20, 0.6 * g + 40], axis=-1).clip(0, 255).astype(np.uint8)
    buf = encode_jpeg(smooth, quality=95, subsample="422")
    dec = decode_jpeg(buf)
    assert dec.shape == smooth.shape
    assert psnr(smooth, dec) >= 40.0
    # 4:2:2 carries 2x the chroma of 4:2:0 -> file sits between 444 and 420
    s444 = len(encode_jpeg(smooth, quality=95, subsample="444"))
    s420 = len(encode_jpeg(smooth, quality=95, subsample="420"))
    assert s420 < len(buf) < s444
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(smooth, subsample="411")


# ---------------------------------------------------------------------------
# Progressive (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_equals_sequential(photo_gray, photo_rgb):
    """decode(encode_progressive(x)) is BIT-IDENTICAL to decode(encode(x)):
    same quant pipeline, different scan order — pins interleaved DC scans,
    spectral selection, and successive approximation (DC + AC refinement
    with correction bits) in one shot."""
    from pyramidscheme_jl_spark.functions.jpeg import encode_jpeg_progressive

    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(photo_gray, quality=90)),
        decode_jpeg(encode_jpeg_progressive(photo_gray, quality=90)),
    )
    for ss in ("444", "420", "422"):
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg(photo_rgb, quality=92, subsample=ss)),
            decode_jpeg(encode_jpeg_progressive(photo_rgb, quality=92, subsample=ss)),
        )
    odd = photo_gray[:61, :53]
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(odd, quality=95)),
        decode_jpeg(encode_jpeg_progressive(odd, quality=95)),
    )


def _prog_file(scans: list[bytes], dhts: list[tuple[int, list, list]], quant: int = 16):
    """Hand-assemble a 16x16 single-component progressive JPEG: four 8x8
    blocks in a 2x2 grid."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + bytes([quant] * 64))
    out += _seg(0xC2, struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0]))
    for tc_th, bits, vals in dhts:
        out += _seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    out += b"".join(scans)
    out += b"\xff\xd9"
    return bytes(out)


def _sos(ss, se, ah, al, td_ta=0x00):
    return _seg(0xDA, bytes([1, 1, td_ta, ss, se, (ah << 4) | al]))


def _bits_to_bytes(bitstr: str) -> bytes:
    """MSB-first bit string -> 1-padded, 0xFF-stuffed scan bytes."""
    bitstr = bitstr + "1" * (-len(bitstr) % 8)
    raw = bytes(int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8))
    return raw.replace(b"\xff", b"\xff\x00")


def test_progressive_ac_first_eobrun():
    """EOBn with run > 1 in an AC first scan: block 0 carries a coefficient
    then EOB2 (r=1, appended bit 1 => skip 2 more blocks); block 3 carries
    its own coefficient. Annex-K tables can't express EOBn>0, so this path
    only appears in optimized-table files — pinned here by hand."""
    from pyramidscheme_jl_spark.functions.jpeg import ZIGZAG  # noqa: F401

    dhts = [
        (0x00, [1] + [0] * 15, [0]),  # DC: '0' -> size 0 (DC stays 0)
        # AC: '00'->0x02 (r=0,s=2), '01'->0x10 (EOBn r=1), '10'->0x00 (EOB1)
        (0x10, [0, 3] + [0] * 14, [0x02, 0x10, 0x00]),
    ]
    dc_scan = _sos(0, 0, 0, 0) + _bits_to_bytes("0" * 4)  # 4 blocks, DC=0
    # block0: (r0,s2)+'11'(=3) then EOBn r=1 + extra bit '1' -> EOBRUN=2
    # blocks 1,2: skipped. block3: (r0,s2)+'10'(=2) then EOB1.
    ac_scan = _sos(1, 63, 0, 0, td_ta=0x00) + _bits_to_bytes(
        "00" + "11" + "01" + "1" + "00" + "10" + "10"
    )
    img = decode_jpeg(_prog_file([dc_scan, ac_scan], dhts))
    assert img.shape == (16, 16)

    # expected: per block, coefficient S(0,1) = val*16 via the naive IDCT
    def block(val):
        out = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                out[y, x] = (
                    (1 / np.sqrt(2)) * val * 16 * np.cos((2 * x + 1) * np.pi / 16) / 4
                    + 128
                )
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    np.testing.assert_array_equal(img[:8, :8], block(3))
    np.testing.assert_array_equal(img[:8, 8:], block(0))
    np.testing.assert_array_equal(img[8:, :8], block(0))
    np.testing.assert_array_equal(img[8:, 8:], block(2))


def test_progressive_ac_refine_eobrun():
    """EOBn spanning blocks in an AC REFINEMENT scan: the run includes the
    current block, and every nonzero coefficient inside the span reads a
    correction bit (T.81 G.1.2.3)."""
    dhts = [
        (0x00, [1] + [0] * 15, [0]),  # DC size 0
        # first-scan AC: '0'->0x01 (r=0,s=1), '10'->0x00 EOB, '11'->0x10 EOBn r=1
        (0x10, [1, 2] + [0] * 14, [0x01, 0x00, 0x10]),
    ]
    dc_scan = _sos(0, 0, 0, 0) + _bits_to_bytes("0" * 4)
    # AC first scan at Al=1: every block gets coefficient 1<<1 = 2 at k=1:
    # per block: '0' (r0,s1) + sign bit '1' (=+1) + '10' (EOB1)
    ac_first = _sos(1, 63, 0, 1) + _bits_to_bytes(("0" + "1" + "10") * 4)
    # refinement scan Ah=1, Al=0: block0 emits EOBn r=1 + bit '1' ->
    # EOBRUN=3 (blocks 0,1,2): correction bits 1,0,1 for their coefficients
    # (2 -> 3, 2, 3). block3: EOB1 + correction bit '0' (2 stays 2).
    ac_refine = _sos(1, 63, 1, 0) + _bits_to_bytes(
        "11" + "1" + "1" + "0" + "1" + "10" + "0"
    )
    img = decode_jpeg(_prog_file([dc_scan, ac_first, ac_refine], dhts))

    def block(val):
        out = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                out[y, x] = (
                    (1 / np.sqrt(2)) * val * 16 * np.cos((2 * x + 1) * np.pi / 16) / 4
                    + 128
                )
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    np.testing.assert_array_equal(img[:8, :8], block(3))
    np.testing.assert_array_equal(img[:8, 8:], block(2))
    np.testing.assert_array_equal(img[8:, :8], block(3))
    np.testing.assert_array_equal(img[8:, 8:], block(2))


def test_truncated_restart_is_value_error(photo_gray):
    """A baseline file with DRI truncated at a restart boundary must fail
    with the decoder's loud ValueError, not an IndexError."""
    buf = encode_jpeg(photo_gray, quality=85, restart_interval=2)
    # cut just after the first RSTn marker's predecessor segment: find the
    # first restart marker and truncate before it
    for m in range(0xD0, 0xD8):
        i = buf.find(bytes([0xFF, m]))
        if i > 0:
            break
    assert i > 0
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(buf[:i])


def _exif_app1(orientation: int, motorola: bool = False) -> bytes:
    """Minimal APP1/EXIF segment carrying only the orientation tag."""
    end = ">" if motorola else "<"
    tiff = (
        (b"MM" if motorola else b"II")
        + struct.pack(end + "HI", 42, 8)
        + struct.pack(end + "H", 1)  # one IFD0 entry
        + struct.pack(end + "HHI", 0x0112, 3, 1)
        + struct.pack(end + "H", orientation) + b"\x00\x00"
        + struct.pack(end + "I", 0)  # next IFD
    )
    return _seg(0xE1, b"Exif\x00\x00" + tiff)


def test_exif_orientation(photo_gray):
    """EXIF orientation is parsed from APP1 (both byte orders) and the
    codec-registry decode uprights the pixels; plain files stay 1."""
    from pyramidscheme_jl_spark.functions.jpeg import (
        apply_orientation,
        jpeg_orientation,
    )
    from pyramidscheme_jl_spark.operators.multimodal import decode_image

    plain = encode_jpeg(photo_gray[:48, :80], quality=90)  # asymmetric dims
    assert jpeg_orientation(plain) == 1
    base = decode_jpeg(plain)

    for o, motorola in ((3, False), (6, True), (8, False), (5, True)):
        tagged = plain[:2] + _exif_app1(o, motorola) + plain[2:]
        assert jpeg_orientation(tagged) == o
        got = decode_image(tagged, 0, 0, "jpeg")
        np.testing.assert_array_equal(got, apply_orientation(base, o))
    # orientation 6 swaps dims (stored 48x80 -> upright 80x48)
    tagged = plain[:2] + _exif_app1(6) + plain[2:]
    assert decode_image(tagged, 0, 0, "jpeg").shape == (80, 48)
    # all 8 orientations are involutions or 4-cycles that preserve content
    rgb = np.dstack([photo_gray, photo_gray // 2, 255 - photo_gray])
    for o in range(1, 9):
        out = apply_orientation(rgb, o)
        assert sorted(out.shape) == sorted(rgb.shape)
        assert out.sum() == rgb.sum()


def test_noninterleaved_sequential_scans(photo_gray, photo_rgb):
    """A T.81-legal multi-SOS baseline file (one sequential scan per
    component) decodes to the SAME pixels as the interleaved layout —
    per-component scans cover the real block grid, not the MCU padding."""
    from pyramidscheme_jl_spark.functions.jpeg import encode_jpeg_noninterleaved

    for ss in ("444", "420", "422"):
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg(photo_rgb, quality=92, subsample=ss)),
            decode_jpeg(encode_jpeg_noninterleaved(photo_rgb, quality=92, subsample=ss)),
        )
    odd = photo_rgb[:61, :53]
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(odd, quality=95, subsample="420")),
        decode_jpeg(encode_jpeg_noninterleaved(odd, quality=95, subsample="420")),
    )
    # gray single-component: non-interleaved == the plain single scan
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(photo_gray, quality=90)),
        decode_jpeg(encode_jpeg_noninterleaved(photo_gray, quality=90)),
    )


def _cmyk_file(stored, transform=None):
    """Hand-assemble an 8x8 4-component baseline JPEG: each component one
    DC-only block holding a constant plane value from ``stored``.
    ``transform`` writes an Adobe APP14 marker (0=CMYK, 2=YCCK)."""
    from pyramidscheme_jl_spark.functions.jpeg import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _BitWriter,
        _canonical_codes,
    )

    out = bytearray(b"\xff\xd8")
    if transform is not None:
        out += _seg(0xEE, b"Adobe" + b"\x00\x64" + b"\x00\x00" * 2 + bytes([transform]))
    out += _seg(0xDB, b"\x00" + bytes([8] * 64))
    sof = struct.pack(">BHHB", 8, 8, 8, 4)
    for cid in (1, 2, 3, 4):
        sof += bytes([cid, 0x11, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    sos = bytes([4]) + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3, 4))
    out += _seg(0xDA, sos + b"\x00\x3f\x00")
    dc_codes = _canonical_codes(DC_LUMA_BITS)
    ac_eob = dict(zip(AC_LUMA_VALS, _canonical_codes(AC_LUMA_BITS)))[0x00]
    wtr = _BitWriter()
    for v in stored:
        diff = int(v) - 128  # pred 0 per component, quant 8 -> plane = v
        size = abs(diff).bit_length()
        bits = diff if diff >= 0 else diff + (1 << size) - 1
        code, length = dc_codes[size]
        wtr.write(code, length)
        wtr.write(bits, size)
        wtr.write(*ac_eob)
    out += wtr.flush() + b"\xff\xd9"
    return bytes(out)


def test_cmyk_and_ycck_decode():
    """4-component Adobe files decode to RGB with libjpeg's semantics:
    APP14 CMYK is stored inverted (R = C_s * K_s / 255), YCCK runs the
    shared YCbCr math over the inverted CMY, and a bare 4-component file
    is standard ink-valued CMYK."""
    # Adobe CMYK (transform 0): stored inverted values
    img = decode_jpeg(_cmyk_file((200, 150, 100, 250), transform=0))
    assert img.shape == (8, 8, 3)
    assert (img[:, :, 0] == round(200 * 250 / 255)).all()
    assert (img[:, :, 1] == round(150 * 250 / 255)).all()
    assert (img[:, :, 2] == round(100 * 250 / 255)).all()
    # YCCK (transform 2): neutral chroma -> all channels = Y * K / 255
    img = decode_jpeg(_cmyk_file((135, 128, 128, 250), transform=2))
    assert (img == round(135 * 250 / 255)).all()
    # bare CMYK (no APP14): ink values, inverted by the decoder
    img = decode_jpeg(_cmyk_file((55, 105, 155, 5), transform=None))
    assert (img[:, :, 0] == round(200 * 250 / 255)).all()
    assert (img[:, :, 1] == round(150 * 250 / 255)).all()
    assert (img[:, :, 2] == round(100 * 250 / 255)).all()


def test_corrupt_streams_raise_value_error(photo_gray):
    """Every mutation/truncation of a valid stream raises ValueError or
    NotImplementedError — never a stray parser exception and never a
    runaway loop (the per-row contract of a 10^12-row decode stage;
    seeded slice of the 9k-case fuzz that hardened this)."""
    from pyramidscheme_jl_spark.functions.jpeg import encode_jpeg_progressive
    from pyramidscheme_jl_spark.functions.media_codecs import decode_png, encode_png

    rng = np.random.RandomState(99)
    rgb = np.dstack([photo_gray, photo_gray // 2, 255 - photo_gray])
    cases = [
        (encode_jpeg(rgb[:48, :64], quality=80, subsample=True), decode_jpeg),
        (encode_jpeg_progressive(rgb[:48, :64], quality=80), decode_jpeg),
        (encode_png(photo_gray[:48, :64], filter_type="mixed"), decode_png),
    ]
    for buf, dec in cases:
        for trial in range(120):
            b = bytearray(buf)
            kind = trial % 3
            if kind == 0:
                b = b[: rng.randint(2, len(b))]
            elif kind == 1:
                i = rng.randint(0, len(b))
                b[i] ^= 1 << rng.randint(0, 8)
            else:
                i = rng.randint(0, len(b) - 4)
                b[i : i + 4] = bytes(rng.randint(0, 256, 4).tolist())
            try:
                dec(bytes(b))
            except (ValueError, NotImplementedError):
                pass  # the contract


def test_adobe_rgb_three_component():
    """A 3-component file with APP14 transform=0 stores literal RGB planes
    (Photoshop 'RGB jpeg') — no YCbCr conversion."""
    from pyramidscheme_jl_spark.functions.jpeg import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _BitWriter,
        _canonical_codes,
    )

    out = bytearray(b"\xff\xd8")
    out += _seg(0xEE, b"Adobe" + b"\x00\x64" + b"\x00\x00" * 2 + b"\x00")
    out += _seg(0xDB, b"\x00" + bytes([8] * 64))
    sof = struct.pack(">BHHB", 8, 8, 8, 3)
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    sos = bytes([3]) + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
    out += _seg(0xDA, sos + b"\x00\x3f\x00")
    dc_codes = _canonical_codes(DC_LUMA_BITS)
    ac_eob = dict(zip(AC_LUMA_VALS, _canonical_codes(AC_LUMA_BITS)))[0x00]
    wtr = _BitWriter()
    for v in (10, 20, 30):  # constant R/G/B planes
        diff = v - 128
        size = abs(diff).bit_length()
        bits = diff if diff >= 0 else diff + (1 << size) - 1
        code, length = dc_codes[size]
        wtr.write(code, length)
        wtr.write(bits, size)
        wtr.write(*ac_eob)
    out += wtr.flush() + b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert (img[:, :, 0] == 10).all()
    assert (img[:, :, 1] == 20).all()
    assert (img[:, :, 2] == 30).all()


def test_giant_corrupt_dims_rejected_promptly(photo_gray):
    """Flipped SOF dims (65k x 65k from a 4KB file) must raise ValueError
    BEFORE allocating coefficient stores or looping over phantom blocks —
    for sequential, progressive and non-interleaved layouts."""
    import time

    from pyramidscheme_jl_spark.functions.jpeg import (
        encode_jpeg_noninterleaved,
        encode_jpeg_progressive,
    )

    for enc in (encode_jpeg, encode_jpeg_progressive, encode_jpeg_noninterleaved):
        buf = bytearray(enc(photo_gray, quality=85))
        i = buf.find(b"\xff\xc0")
        if i < 0:
            i = buf.find(b"\xff\xc2")
        # SOF payload: len(2) prec(1) h(2) w(2) -> blow up the dims
        buf[i + 5 : i + 9] = b"\xff\xff\xff\xff"
        t0 = time.perf_counter()
        with pytest.raises(ValueError, match="too short"):
            decode_jpeg(bytes(buf))
        assert time.perf_counter() - t0 < 1.0  # prompt, no phantom loop


def test_progressive_restart_identical_pixels(photo_rgb):
    """RSTn markers in progressive scans (MCU units for interleaved DC,
    block units otherwise) change the byte stream, not the pixels —
    exercises the decoder's per-scan restart reset (preds + EOBRUN)."""
    from pyramidscheme_jl_spark.functions.jpeg import encode_jpeg_progressive

    plain = decode_jpeg(encode_jpeg_progressive(photo_rgb, quality=92, subsample=True))
    rst = decode_jpeg(
        encode_jpeg_progressive(photo_rgb, quality=92, subsample=True, restart_interval=3)
    )
    np.testing.assert_array_equal(plain, rst)
    odd = photo_rgb[:61, :53]
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(odd, quality=95)),
        decode_jpeg(encode_jpeg_progressive(odd, quality=95, restart_interval=2)),
    )


def test_build_accepts_exif_transposed_metadata(photo_gray):
    """EXIF orientations 5-8 transpose the stored SOF dims during
    uprighting; metadata recording the stored dims must still validate
    (ADVICE r3), while a genuinely wrong-size decode still raises."""
    from pyramidscheme_jl_spark.operators.build import _decode_payload

    plain = encode_jpeg(photo_gray[:48, :80], quality=90)  # stored h=48 w=80
    tagged = plain[:2] + _exif_app1(6) + plain[2:]  # upright (80, 48)
    arr = _decode_payload(tagged, 80, 48, "jpeg", "img-x")  # metadata = stored dims
    assert arr.shape == (80, 48)
    # upright metadata is accepted too (writer recorded post-rotation dims)
    assert _decode_payload(tagged, 48, 80, "jpeg", "img-x").shape == (80, 48)
    # an actual size contradiction still raises, oriented or not
    with pytest.raises(ValueError, match="contradicts metadata"):
        _decode_payload(tagged, 33, 77, "jpeg", "img-x")
    with pytest.raises(ValueError, match="contradicts metadata"):
        _decode_payload(plain, 48, 80, "jpeg", "img-x")  # plain: w/h swapped is wrong
