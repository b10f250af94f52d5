"""Pure-numpy PNG codec + real multimodal decode stage."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from rayenc.ops import multimodal, png


def test_roundtrip_shapes():
    rng = np.random.default_rng(0)
    for shape in [(20, 30, 3), (17, 9, 1), (8, 8, 4), (1, 1, 3), (64, 64, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        assert np.array_equal(png.decode(png.encode(img)), img), shape


def test_decode_all_filter_types():
    # hand-build a file using every scanline filter (0..4)
    rng = np.random.default_rng(3)
    w, h, c = 5, 6, 3
    img = rng.integers(0, 256, (h, w, c)).astype(np.uint8)
    flat = img.reshape(h, w * c).astype(np.int64)
    prev = np.zeros(w * c, np.int64)
    rows = []
    for y, ft in enumerate([0, 1, 2, 3, 4, 2]):
        cur = flat[y]
        enc = cur.copy()
        for x in range(w * c):
            left = cur[x - c] if x >= c else 0
            ul = prev[x - c] if x >= c else 0
            if ft == 1:
                enc[x] = (cur[x] - left) & 0xFF
            elif ft == 2:
                enc[x] = (cur[x] - prev[x]) & 0xFF
            elif ft == 3:
                enc[x] = (cur[x] - ((left + prev[x]) >> 1)) & 0xFF
            elif ft == 4:
                enc[x] = (cur[x] - png._paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        rows.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
        prev = cur
    idat = zlib.compress(b"".join(rows))

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body)
        )

    f = (
        png.SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png.decode(f), img)


def test_corrupt_rejected():
    img = np.zeros((4, 4, 3), np.uint8)
    raw = bytearray(png.encode(img))
    with pytest.raises(ValueError, match="signature"):
        png.decode(b"notapng" + bytes(raw))
    raw[20] ^= 0x01  # inside IHDR body -> CRC fails
    with pytest.raises(ValueError, match="CRC"):
        png.decode(bytes(raw))


def test_media_stage_decodes_real_png():
    t = multimodal.synthesize_media_table(20, fmt="png")
    stage = multimodal.ImageDecodeStage(target=4, strict=True)  # strict OK for png
    out = stage(t)
    assert out.num_rows == 20
    assert len(out.column("features")[0].as_py()) == 4 * 4 * 3
    # constant-color image recovers its value exactly
    v = 137
    one = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "m": pa.array([png.encode(np.full((8, 8, 3), v, np.uint8))], pa.binary()),
            "m_format": pa.array(["png"]),
            "m_w": pa.array([8], pa.int32()),
            "m_h": pa.array([8], pa.int32()),
        }
    )
    feats = stage(one).column("features")[0].as_py()
    assert all(round(f * 255) == v for f in feats)


def test_strict_still_raises_for_unsupported():
    stage = multimodal.ImageDecodeStage(target=4, strict=True)
    with pytest.raises(NotImplementedError):
        stage._decode(b"\xff\xd8jpegdata", 8, 8, "jpeg")


def test_wav_roundtrip_and_audio_stage():
    from rayenc.ops.png import decode_wav, encode_wav

    rng = np.random.default_rng(0)
    s = rng.integers(-32768, 32768, 5000).astype(np.int16)
    b = encode_wav(s, 8000)
    got, rate = decode_wav(b)
    assert rate == 8000 and got.shape == (5000, 1)
    assert np.array_equal((got[:, 0] * 32768.0).astype(np.int16), s)
    # constant-amplitude wav recovers its value through the strict stage
    const = encode_wav(np.full(1000, 0.5, np.float32), 16000)
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "m": pa.array([const], pa.binary()),
            "m_format": pa.array(["wav"]),
        }
    )
    stage = multimodal.AudioFrameSampleStage(frames=4, strict=True)
    frames = stage(t).column("frames")[0].as_py()
    assert all(abs(f - 0.5) < 1e-3 for f in frames)
    with pytest.raises(NotImplementedError):
        stage(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "m": pa.array([b"mp3data"], pa.binary()),
                    "m_format": pa.array(["mp3"]),
                }
            )
        )
