"""Laws for the real pixel/sample-level decoders (ext_multimodal2):
the BMP/WAV byte paths must round-trip exactly, reject malformed
containers without crashing, and handle both BMP row orders."""

import struct

import numpy as np
import pytest

from syllabus_sense_spark.queries.ext_multimodal2 import (
    _bmp_encode,
    _wav_encode,
    decode_bmp_pixels,
    decode_wav_samples,
)


def _expected_pixels(doc_id: int) -> tuple[int, int, np.ndarray]:
    w = 8 + doc_id % 9
    h = 4 + doc_id % 5
    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    rgb = np.stack(
        [
            (doc_id + x + y) % 256,
            (2 * doc_id + 3 * x + y) % 256,
            (doc_id + 5 * x + 7 * y) % 256,
        ],
        axis=2,
    )
    return w, h, rgb.astype(np.uint8) + np.zeros((h, w, 3), np.uint8)


@pytest.mark.parametrize("doc_id", [0, 1, 7, 12, 40, 123457])
def test_bmp_round_trip_exact(doc_id):
    # widths 8..16 cover every 4-byte padding residue; the decode must
    # strip pad bytes, un-flip bottom-up rows, and reorder BGR→RGB
    w, h, want = _expected_pixels(doc_id)
    got = decode_bmp_pixels(_bmp_encode(doc_id))
    assert got is not None
    gw, gh, px = got
    assert (gw, gh) == (w, h)
    np.testing.assert_array_equal(px, want)


def test_bmp_top_down_rows_supported():
    # negative biHeight means top-down storage; same pixels must come back
    blob = bytearray(_bmp_encode(9))
    w, h, want = _expected_pixels(9)
    (h_raw,) = struct.unpack_from("<i", blob, 22)
    struct.pack_into("<i", blob, 22, -h_raw)
    stride = (3 * w + 3) & ~3
    off = 14 + 40
    rows = [bytes(blob[off + j * stride : off + (j + 1) * stride]) for j in range(h)]
    blob[off:] = b"".join(reversed(rows))
    got = decode_bmp_pixels(bytes(blob))
    assert got is not None
    np.testing.assert_array_equal(got[2], want)


@pytest.mark.parametrize(
    "payload",
    [b"", b"BM", b"not a bitmap at all", b"BM" + b"\x00" * 20],
)
def test_bmp_malformed_returns_none(payload):
    assert decode_bmp_pixels(payload) is None


def test_bmp_unsupported_bpp_returns_none():
    blob = bytearray(_bmp_encode(3))
    struct.pack_into("<H", blob, 28, 8)  # 8-bit palette BMP: unsupported
    assert decode_bmp_pixels(bytes(blob)) is None


@pytest.mark.parametrize("doc_id", [0, 1, 63, 64, 12345])
def test_wav_round_trip_exact(doc_id):
    n = 64 + doc_id % 64
    i = np.arange(n)
    want = (doc_id * 31 + i * 17) % 65536 - 32768
    got = decode_wav_samples(_wav_encode(doc_id))
    assert got is not None
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_wav_extra_chunk_skipped():
    # chunk-walk decoders must skip unknown chunks (e.g. LIST) cleanly
    blob = _wav_encode(5)
    fmt_at = blob.index(b"fmt ")
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    patched = blob[:fmt_at] + extra + blob[fmt_at:]
    patched = (
        patched[:4]
        + struct.pack("<I", struct.unpack("<I", blob[4:8])[0] + len(extra))
        + patched[8:]
    )
    got = decode_wav_samples(patched)
    assert got is not None
    np.testing.assert_array_equal(got, decode_wav_samples(blob))


@pytest.mark.parametrize("payload", [b"", b"RIFF", b"RIFFxxxxWAVE"])
def test_wav_malformed_returns_none(payload):
    assert decode_wav_samples(payload) is None


def test_spark_pixel_stats_match_direct(spark, sf_dir):
    from syllabus_sense_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    rows = {
        r.doc_id: r for r in QUERIES["multimodal_pixel_stats"](spark, sf_dir).collect()
    }
    assert rows
    for did in list(rows)[:5]:
        w, h, px = _expected_pixels(did)
        r = rows[did]
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        assert r.sum_r == int(px[:, :, 0].astype(np.int64).sum())
        wt = (np.arange(w) + 1)[None, :] * (np.arange(h) + 1)[:, None]
        assert r.wsum_r == int((px[:, :, 0].astype(np.int64) * wt).sum())
