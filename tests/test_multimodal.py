"""Multimodal decode tests: real stdlib codecs (P6 PPM, 24-bit BMP,
PCM WAV) + magic-byte dispatch + the Spark mapInPandas path over
genuinely decodable payloads."""

import numpy as np
import pytest

from pdf_extraction_spark.kernels.mediaio import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    pooled_features,
    synth_real_payload,
)


def _img(w, h, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestPpm:
    @pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (7, 5), (16, 16)])
    def test_roundtrip(self, w, h):
        img = _img(w, h, seed=w * 100 + h)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)

    def test_comments_and_whitespace(self):
        img = _img(2, 2, seed=9)
        payload = b"P6\n# a comment\n2\t2\n# another\n255\n" + img.tobytes()
        assert np.array_equal(decode_ppm(payload), img)

    def test_rejects_non_ppm(self):
        with pytest.raises(ValueError):
            decode_ppm(b"\x89PNG....")
        with pytest.raises(ValueError):
            decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)  # 16-bit maxval
        with pytest.raises(ValueError):
            decode_ppm(b"P6\n4 4\n255\n\x00\x01")  # truncated raster


class TestBmp:
    @pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 8])  # exercise row padding
    def test_roundtrip(self, w):
        img = _img(w, 3, seed=w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_top_down_rows(self):
        img = _img(3, 2, seed=5)
        payload = bytearray(encode_bmp(img))
        # flip to top-down: negate height, reverse the stored row order
        import struct

        h = struct.unpack_from("<i", payload, 22)[0]
        struct.pack_into("<i", payload, 22, -h)
        row_size = (3 * 3 + 3) & ~3
        rows = [payload[54 + i * row_size : 54 + (i + 1) * row_size] for i in range(h)]
        payload[54:] = b"".join(reversed(rows))
        assert np.array_equal(decode_bmp(bytes(payload)), img)

    def test_rejects_unsupported(self):
        img = _img(2, 2)
        payload = bytearray(encode_bmp(img))
        import struct

        struct.pack_into("<H", payload, 28, 8)  # 8-bit palette bmp
        with pytest.raises(ValueError):
            decode_bmp(bytes(payload))


class TestWav:
    def test_roundtrip(self):
        samples = (np.sin(np.linspace(0, 12, 200)) * 20000).astype(np.int16)
        decoded = decode_wav(encode_wav(samples, 8000))
        assert decoded.shape == (200, 1)
        assert np.array_equal(decoded[:, 0], samples)


class TestDispatch:
    def test_magic_sniff_real_vs_fake(self):
        from pdf_extraction_spark.operators.multimodal import (
            _decode_audio,
            _decode_image,
            _fake_decode_image,
        )

        img = _img(4, 3, seed=1)
        assert np.array_equal(_decode_image(encode_ppm(img), 0, 0), img)
        assert np.array_equal(_decode_image(encode_bmp(img), 0, 0), img)
        # non-decodable payload → deterministic fake of the declared shape
        fake = _decode_image(b"\xff\xd8\xff jpeg-ish", 6, 5)
        assert fake.shape == (5, 6, 3)
        assert np.array_equal(fake, _fake_decode_image(b"\xff\xd8\xff jpeg-ish", 6, 5))
        samples = (np.arange(32) * 100).astype(np.int16)
        assert np.array_equal(
            _decode_audio(encode_wav(samples), 0, 0)[:, 0], samples
        )
        assert _decode_audio(b"ID3 mp3-ish", 0, 0).shape == (256, 1)

    def test_synth_real_payloads_all_decode(self):
        kinds = set()
        for i in range(24):
            mtype, payload, meta = synth_real_payload(i)
            kinds.add(payload[:2])
            if payload.startswith(b"P6"):
                arr = decode_ppm(payload)
                assert arr.shape == (meta[1], meta[0], 3)
            elif payload.startswith(b"BM"):
                arr = decode_bmp(payload)
                assert arr.shape == (meta[1], meta[0], 3)
            else:
                assert mtype == "audio" and payload.startswith(b"RIFF")
                decode_wav(payload)
        assert kinds == {b"P6", b"BM", b"RI"}  # all three formats present


class TestCorruptPayloads:
    """Magic-matching garbage must degrade to the fake decoder, never
    raise out of the batch (a single corrupt crawled file must not kill
    a Spark stage)."""

    CASES = [
        b"BM",                      # 2-byte BMP "file"
        b"BM" + b"\x00" * 20,       # truncated header
        b"P6\n99999 99999\n255\n",  # raster missing entirely
        b"P6\nnot numbers\n",
        b"RIFF",                    # 4-byte WAV
        b"RIFFxxxxWAVEfmt garbage",
    ]

    def test_image_fallback_never_raises(self):
        from pdf_extraction_spark.operators.multimodal import (
            _decode_image,
            _fake_decode_image,
        )

        for p in self.CASES:
            out = _decode_image(p, 5, 4)
            assert out.shape == (4, 5, 3)
            assert np.array_equal(out, _fake_decode_image(p, 5, 4))

    def test_audio_fallback_never_raises(self):
        from pdf_extraction_spark.operators.multimodal import _decode_audio

        for p in self.CASES:
            assert _decode_audio(p, 0, 0).shape == (256, 1)

    def test_hypothesis_fuzz_dispatch(self):
        try:
            from hypothesis import given, settings
            from hypothesis import strategies as st
        except ImportError:
            pytest.skip("hypothesis unavailable")

        from pdf_extraction_spark.operators.multimodal import (
            _decode_audio,
            _decode_image,
        )

        @settings(max_examples=300, deadline=None)
        @given(
            prefix=st.sampled_from([b"", b"P6", b"BM", b"RIFF"]),
            body=st.binary(max_size=200),
        )
        def run(prefix, body):
            img = _decode_image(prefix + body, 3, 3)
            assert img.shape[2] == 3
            au = _decode_audio(prefix + body, 0, 0)
            assert au.ndim == 2

        run()


class TestSparkPath:
    def test_real_decode_matches_sequential(self, spark):
        """Spark mapInPandas over real payloads ≡ pure-Python decode +
        pooling (the distributed plumbing under test, like the other
        recompute goldens)."""
        from pdf_extraction_spark.operators.multimodal import (
            extract_media_features,
            synth_real_media_df,
        )

        got = {
            r["media_id"]: r
            for r in extract_media_features(synth_real_media_df(spark, 12)).collect()
        }
        assert len(got) == 12
        for i in range(12):
            mtype, payload, _ = synth_real_payload(i)
            arr = (
                decode_ppm(payload)
                if payload.startswith(b"P6")
                else decode_bmp(payload)
                if payload.startswith(b"BM")
                else decode_wav(payload)
            )
            mean, vec = pooled_features(arr)
            assert got[i]["media_type"] == mtype
            assert got[i]["n_bytes"] == len(payload)
            assert got[i]["mean_intensity"] == mean  # bit-exact
            assert got[i]["feature_vec"] == vec
