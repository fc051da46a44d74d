"""Pure-stdlib WAV codec (ocr_spark.audiocodec) + the audio operator
branch (decode → resample → band features → ANN) end-to-end.

The codec is the runnable kernel behind mm_audio_stats /
mm_audio_resample / mm_audio_features; these tests pin round-trips for
both sample widths, the RIFF chunk walk (pad bytes, unknown chunks),
every structural error path, and the exact nearest-frame index mapping
the resample oracle replays in SQL.
"""

import random
import struct

import pytest
from hypothesis import given, settings, strategies as st

from ocr_spark import audiocodec as ac


def _rand_samples(rng, n, width):
    lo, hi = (-128, 127) if width == 1 else (-32768, 32767)
    return [rng.randint(lo, hi) for _ in range(n)]


class TestWavCodec:
    @pytest.mark.parametrize("width", [1, 2])
    @pytest.mark.parametrize("channels", [1, 2, 3])
    def test_round_trip(self, width, channels):
        rng = random.Random(width * 31 + channels)
        samples = _rand_samples(rng, 7 * channels, width)  # odd frame count
        buf = ac.wav_encode(samples, 44100, channels, width)
        au = ac.wav_decode(buf)
        assert au.sample_rate == 44100
        assert au.n_channels == channels
        assert au.sample_width == width
        assert au.n_frames == 7
        assert list(au.samples) == samples

    @given(
        n_frames=st.integers(0, 50),
        channels=st.integers(1, 4),
        width=st.sampled_from([1, 2]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_round_trip_property(self, n_frames, channels, width, seed):
        rng = random.Random(seed)
        samples = _rand_samples(rng, n_frames * channels, width)
        au = ac.wav_decode(ac.wav_encode(samples, 8000, channels, width))
        assert list(au.samples) == samples and au.n_frames == n_frames

    def test_odd_data_chunk_gets_pad_byte(self):
        """An odd-length 8-bit data chunk carries the RIFF word-alignment
        pad OUTSIDE the declared chunk size, and the declared RIFF size
        covers it — both readers that honor and ignore the pad agree."""
        buf = ac.wav_encode([1, -2, 3], 8000, 1, 1)
        (riff_size,) = struct.unpack_from("<I", buf, 4)
        assert riff_size + 8 == len(buf)
        assert len(buf) % 2 == 0
        assert list(ac.wav_decode(buf).samples) == [1, -2, 3]

    def test_unknown_chunks_skipped(self):
        """LIST/fact chunks (routine in crawled audio) before and after
        fmt are walked over, including an odd-sized one with its pad."""
        core = ac.wav_encode([10, -10], 8000, 1, 2)
        fmt_start = core.index(b"fmt ")
        data_start = core.index(b"data")
        odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
        even = b"fact" + struct.pack("<I", 4) + struct.pack("<I", 2)
        body = (
            b"WAVE"
            + odd
            + core[fmt_start:data_start]
            + even
            + core[data_start:]
        )
        buf = b"RIFF" + struct.pack("<I", len(body)) + body
        assert list(ac.wav_decode(buf).samples) == [10, -10]

    def test_eight_bit_sign_convention(self):
        """8-bit WAV stores unsigned with a +128 offset; the decoder
        returns signed values so downstream arithmetic never branches."""
        buf = ac.wav_encode([-128, 0, 127], 8000, 1, 1)
        data_start = buf.index(b"data") + 8
        assert buf[data_start : data_start + 3] == bytes([0, 128, 255])
        assert list(ac.wav_decode(buf).samples) == [-128, 0, 127]

    def test_encode_rejects_out_of_range_and_untiled(self):
        with pytest.raises(ValueError, match="outside"):
            ac.wav_encode([32768], 8000, 1, 2)
        with pytest.raises(ValueError, match="outside"):
            ac.wav_encode([128], 8000, 1, 1)
        with pytest.raises(ValueError, match="tile"):
            ac.wav_encode([1, 2, 3], 8000, 2, 2)

    def test_decode_rejects_structural_corruption(self):
        good = ac.wav_encode([5, -5, 9, -9], 8000, 2, 2)
        with pytest.raises(ValueError, match="not a RIFF"):
            ac.wav_decode(b"OggS" + good[4:])
        with pytest.raises(ValueError, match="RIFF declares"):
            ac.wav_decode(good[:-3])  # truncated container
        with pytest.raises(ValueError, match="not WAVE"):
            ac.wav_decode(good[:8] + b"AVI " + good[12:])
        # float WAV (wFormatTag=3)
        bad = bytearray(good)
        struct.pack_into("<H", bad, good.index(b"fmt ") + 8, 3)
        with pytest.raises(ValueError, match="wFormatTag"):
            ac.wav_decode(bytes(bad))
        # 24-bit PCM
        bad = bytearray(good)
        fmt_at = good.index(b"fmt ") + 8
        struct.pack_into("<H", bad, fmt_at + 14, 24)
        struct.pack_into("<H", bad, fmt_at + 12, 6)  # block_align 2ch*3B
        with pytest.raises(ValueError, match="24-bit"):
            ac.wav_decode(bytes(bad))
        # data chunk declared past the container end (interrupted crawl)
        bad = bytearray(good)
        struct.pack_into("<I", bad, good.index(b"data") + 4, 10**6)
        with pytest.raises(ValueError, match="past the container end"):
            ac.wav_decode(bytes(bad))
        # data size not tiling the frame layout
        bad = bytearray(good)
        struct.pack_into("<I", bad, good.index(b"data") + 4, 7)
        with pytest.raises(ValueError, match="tile"):
            ac.wav_decode(bytes(bad))
        # inconsistent block_align
        bad = bytearray(good)
        struct.pack_into("<H", bad, fmt_at + 12, 5)
        with pytest.raises(ValueError, match="block_align"):
            ac.wav_decode(bytes(bad))
        # missing data chunk entirely (fmt only, consistent RIFF size)
        body = good[8 : good.index(b"data")]
        with pytest.raises(ValueError, match="no data chunk"):
            ac.wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)
        # rate=0 header: must be a typed decode error HERE, not a
        # ZeroDivisionError in the first duration/resample division
        bad = bytearray(good)
        struct.pack_into("<I", bad, fmt_at + 4, 0)
        with pytest.raises(ValueError, match="zero sample rate"):
            ac.wav_decode(bytes(bad))

    def test_resample_exact_index_mapping(self):
        """out[j] = src[j * in_rate // out_rate] per frame, channels
        moving together — the exact map mm_audio_resample replays."""
        samples = [(7 * i + 13 * c) % 101 - 50 for i in range(48) for c in (0, 1)]
        au = ac.DecodedAudio(8000, 2, 2, tuple(samples))
        out = ac.resample_nearest(au, 3000)
        assert out.n_frames == 48 * 3000 // 8000 == 18
        for j in range(out.n_frames):
            src = j * 8000 // 3000
            assert out.samples[2 * j : 2 * j + 2] == au.samples[
                2 * src : 2 * src + 2
            ], j
        # upsample + identity
        up = ac.resample_nearest(au, 16000)
        assert up.n_frames == 96 and up.samples[0:2] == au.samples[0:2]
        assert ac.resample_nearest(au, 8000) is au
        with pytest.raises(ValueError, match=">= 1"):
            ac.resample_nearest(au, 0)


class TestAudioPipeline:
    """REAL decode → resample → band features → ANN, end-to-end
    in-sandbox over the stdlib WAV codec (the audio twin of
    TestImagePipeline)."""

    @pytest.fixture(scope="class")
    def audio(self, spark):
        from ocr_spark.operators.multimodal import synthetic_audio

        ids = spark.createDataFrame(
            [(i,) for i in range(10)], "media_id long"
        )
        return synthetic_audio(
            ids, n_frames=480, sample_rate=8000, n_channels=2
        ).persist()

    def test_decode_matches_python_oracle(self, audio):
        from ocr_spark.operators.multimodal import decode_audio_stats

        got = {r.media_id: r for r in decode_audio_stats(audio).collect()}
        src = {r.media_id: bytes(r.payload) for r in audio.collect()}
        assert set(got) == set(src) and len(got) == 10
        for mid, payload in src.items():
            au = ac.wav_decode(payload)
            r = got[mid]
            assert (r.sample_rate, r.n_channels, r.n_frames) == (8000, 2, 480)
            assert r.duration_ms == 60
            assert r.sum_abs == sum(abs(v) for v in au.samples)
            assert r.peak == max(abs(v) for v in au.samples)

    def test_resample_then_decode(self, audio):
        from ocr_spark.operators.multimodal import (
            decode_audio_stats,
            resample_audio,
        )

        stats = {
            r.media_id: r
            for r in decode_audio_stats(resample_audio(audio, 3000)).collect()
        }
        src = {r.media_id: bytes(r.payload) for r in audio.collect()}
        for mid, payload in src.items():
            want = ac.resample_nearest(ac.wav_decode(payload), 3000)
            r = stats[mid]
            assert (r.sample_rate, r.n_frames) == (3000, 180)
            assert r.sum_abs == sum(abs(v) for v in want.samples), mid

    def test_features_uneven_band_boundaries(self, spark):
        """General floor band boundaries (frames NOT divisible by
        n_bands): Spark features == ground truth computed locally."""
        from ocr_spark.operators.multimodal import (
            audio_features,
            synthetic_audio,
        )

        ids = spark.createDataFrame([(3,), (8,)], "media_id long")
        au = synthetic_audio(ids, n_frames=45, sample_rate=8000, n_channels=2)
        got = {
            r.media_id: list(r.features)
            for r in audio_features(au, n_bands=7).collect()
        }
        for mid in (3, 8):
            samples = [
                (7 * i + 13 * c + mid) % 4001 - 2000
                for i in range(45)
                for c in range(2)
            ]
            want = []
            for b in range(7):
                f0, f1 = b * 45 // 7, (b + 1) * 45 // 7
                s = sum(abs(v) for v in samples[f0 * 2 : f1 * 2])
                want.append(s / float(2 * (f1 - f0)))
            assert got[mid] == want  # exact: int sums + one division

    @staticmethod
    def _blocky_wav(seed: int) -> bytes:
        """480-frame mono clip of 60-frame constant-amplitude segments
        with per-(seed, segment) random levels — clips with DISTINCT
        band features (the gradient fixture is linear in its seed, so
        every clip's feature vector is nearly parallel; fine for decode
        oracles, useless for neighbor discrimination)."""
        rng = random.Random(seed)
        levels = [rng.randint(0, 2000) for _ in range(8)]
        samples = [
            levels[i // 60] * (1 if i % 2 == 0 else -1) for i in range(480)
        ]
        return ac.wav_encode(samples, 8000, 1, 2)

    def test_e2e_audio_bytes_to_topk_neighbors(self, spark):
        """Audio bytes → decoded band features → top-k neighbors.  A
        near-duplicate of clip 4 (same segments, resampled 8000→7500 and
        back) must rank clip 4 as its nearest neighbor."""
        import pandas as pd

        from ocr_spark.operators.multimodal import (
            audio_features,
            resample_audio,
        )
        from ocr_spark.operators.similarity import cosine_topk_bruteforce

        corpus_wavs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "media_id": list(range(10)),
                    "payload": [self._blocky_wav(i) for i in range(10)],
                }
            )
        )
        near_dup = spark.createDataFrame(
            pd.DataFrame({"media_id": [100], "payload": [self._blocky_wav(4)]})
        )
        near_dup = resample_audio(resample_audio(near_dup, 7500), 8000)
        corpus = audio_features(corpus_wavs, n_bands=8).withColumnsRenamed(
            {"media_id": "vec_id", "features": "embedding"}
        )
        query = audio_features(near_dup, n_bands=8).withColumnsRenamed(
            {"media_id": "vec_id", "features": "embedding"}
        )
        top = cosine_topk_bruteforce(corpus, query, k=3).collect()
        assert len(top) == 3
        assert all(r.query_id == 100 for r in top)
        best = max(top, key=lambda r: r.cos)
        assert best.neighbor_id == 4 and best.cos > 0.99
