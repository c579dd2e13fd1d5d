"""GIF/LZW codec: hand-assembled golden bitstreams (a round-trip can
cancel a shared transform bug — the per-MCU rule from the JPEG suite),
LZW dictionary-growth edge cases, interlace, animation compositing,
transparency, and the Arrow-batched featurize integration."""

import numpy as np
import pytest

from pandas_to_postgres_spark.operators.media_codecs import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif,
    encode_gif,
)

RED, GREEN, BLUE, WHITE = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)


def _hand_gif() -> bytes:
    """A 2×2 GIF87a assembled byte-by-byte: 4-color global palette,
    pixel indices [0, 1, 2, 3], LZW min code size 2. The LZW payload
    44 64 0A was derived BY HAND from the spec (codes 4,0,1,2,3,5 at
    widths 3,3,3,4,4,4, packed LSB-first) — independent of both our
    encoder and decoder."""
    import struct

    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)
    for c in (RED, GREEN, BLUE, WHITE):
        out += bytes(c)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
    out += bytes([0x02, 0x03, 0x44, 0x64, 0x0A, 0x00, 0x3B])
    return bytes(out)


class TestGoldens:
    def test_hand_assembled_bitstream_decodes_exactly(self):
        frames = decode_gif(_hand_gif())
        assert frames.shape == (1, 2, 2, 3)
        assert frames[0].tolist() == [
            [list(RED), list(GREEN)],
            [list(BLUE), list(WHITE)],
        ]

    def test_encoder_reproduces_hand_packed_lzw(self):
        got = _lzw_compress(np.array([0, 1, 2, 3], dtype=np.uint8), 2)
        assert got == bytes([0x44, 0x64, 0x0A])

    def test_decoder_rejects_non_gif(self):
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"\x89PNG\r\n\x1a\nnope")


class TestLzwEdges:
    def test_width_growth_and_kwkwk(self):
        # 'aaaa...' drives the KwKwK case immediately
        seq = np.zeros(50, dtype=np.uint8)
        assert _lzw_decompress(_lzw_compress(seq, 2), 2) == seq.tobytes()

    @pytest.mark.parametrize("n,k", [(10_000, 200), (60_000, 256), (300, 2)])
    def test_long_streams_roundtrip(self, n, k):
        rng = np.random.RandomState(n + k)
        seq = rng.randint(0, k, n).astype(np.uint8)
        mc = max(2, (k - 1).bit_length())
        assert _lzw_decompress(_lzw_compress(seq, mc), mc) == seq.tobytes()

    def test_dictionary_overflow_reclears(self):
        # > 4096 dictionary entries forces the re-CLEAR path
        rng = np.random.RandomState(0)
        img = (
            rng.randint(0, 8, (120, 100, 1)) * np.array([[[31, 17, 7]]])
        ).astype(np.uint8)
        assert np.array_equal(decode_gif(encode_gif(img))[0], img)


class TestGifFeatures:
    def _img(self, seed=7, shape=(13, 9)):
        rng = np.random.RandomState(seed)
        return (
            rng.randint(0, 5, (*shape, 1)) * np.array([[[50, 30, 10]]])
        ).astype(np.uint8)

    def test_plain_and_interlaced_roundtrip(self):
        img = self._img()
        for interlace in (False, True):
            rt = decode_gif(encode_gif(img, interlace=interlace))
            assert np.array_equal(rt[0], img)

    def test_animation_draw_over_compositing(self):
        img = self._img()
        frames = [img, np.roll(img, 3, axis=0), np.roll(img, 5, axis=1)]
        rt = decode_gif(encode_gif(frames))
        assert rt.shape == (3, 13, 9, 3)
        for got, want in zip(rt, frames):
            assert np.array_equal(got, want)

    def test_transparency_shows_previous_frame(self):
        a = np.full((4, 4, 3), 200, dtype=np.uint8)
        b = a.copy()
        b[0, 0] = (9, 9, 9)  # index that will be marked transparent
        payload = encode_gif([a, b], transparent_index=1)
        frames = decode_gif(payload)
        # frame 2's transparent pixel must show frame 1's color
        assert tuple(frames[1][0, 0]) == (200, 200, 200)
        assert tuple(frames[1][1, 1]) == (200, 200, 200)

    def test_too_many_colors_rejected(self):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
        with pytest.raises(ValueError, match="256 distinct"):
            encode_gif(img)


class TestFeaturizeIntegration:
    def test_gif_payload_featurizes_through_arrow_batches(self, spark):
        from pyspark.sql import Row

        from pandas_to_postgres_spark.operators.media_codecs import (
            extract_features_real,
        )

        img = (
            np.random.RandomState(3).randint(0, 4, (8, 6, 1))
            * np.array([[[60, 40, 20]]])
        ).astype(np.uint8)
        payload = encode_gif([img, np.roll(img, 1, axis=0)])
        df = spark.createDataFrame(
            [Row(doc_id=1, payload=bytearray(payload), mime="image/gif")]
        )
        out = extract_features_real(df).collect()
        assert len(out) == 1
        f = out[0]["feature"]
        # n_frames, h, w + mean RGB of the first frame
        assert f[0] == 2.0 and f[1] == 8.0 and f[2] == 6.0
        want = img.reshape(-1, 3).mean(axis=0)
        assert np.allclose(f[3:5], want[:2])
