"""Pure-stdlib WAV codec: RIFF/WAVE PCM, 8- and 16-bit.

The container has no soundfile/ffmpeg, but the multimodal operator family
needs a REAL, runnable audio decode for the audio branch to be testable
end-to-end the way :mod:`ocr_spark.imagecodec` made the image branch
(decode → resample → band features → ANN).  WAV-PCM is fully
implementable from the public RIFF spec with ``struct`` alone: a chunked
little-endian container, a ``fmt `` chunk declaring the sample layout,
and a ``data`` chunk of interleaved frames.

Scope (honest, enforced with loud errors — never a wrong silent decode):

- PCM (``wFormatTag = 1``), 8-bit unsigned or 16-bit signed LE, any
  channel count ≥ 1, any sample rate ≥ 1.
- Chunk walking honors the RIFF word-alignment pad byte, skips unknown
  chunks (``LIST``/``fact``/``cue `` are routine in crawled audio), and
  requires ``fmt `` before ``data``.
- Compressed codecs (MP3/AAC/IEEE-float WAV) raise ``ValueError``; a
  production cluster swaps a vectorized decoder into the same
  ``mapInPandas`` seam — the Spark-side plumbing (schema, Arrow batching,
  partitioning) is what these functions let us test, identically.

Everything here is deterministic integer arithmetic — no floats — so
decoded sample sums are exactly reproducible in SQL (the mm_audio_stats /
mm_audio_resample contract oracles recompute them analytically).

Hostile-input posture: WAV is uncompressed, so the payload size bounds
the decoded size — there is no decompression-bomb channel — but a data
chunk whose DECLARED length exceeds the bytes present is truncation (an
interrupted crawl) and raises rather than silently decoding a prefix.
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class DecodedAudio(NamedTuple):
    sample_rate: int
    n_channels: int
    sample_width: int  # bytes per sample: 1 (unsigned 8) or 2 (signed 16 LE)
    samples: tuple  # interleaved signed ints, len = n_frames * n_channels

    @property
    def n_frames(self) -> int:
        return len(self.samples) // self.n_channels


def wav_encode(
    samples,
    sample_rate: int,
    n_channels: int = 1,
    sample_width: int = 2,
) -> bytes:
    """Interleaved signed samples → canonical RIFF/WAVE PCM bytes.

    16-bit samples must lie in [-32768, 32767]; 8-bit in [-128, 127]
    (stored with the WAV-standard +128 offset).  Out-of-range values
    raise — silent wraparound would corrupt every downstream stat.
    """
    if sample_rate < 1:
        raise ValueError(f"sample_rate must be >= 1, got {sample_rate}")
    if n_channels < 1:
        raise ValueError(f"n_channels must be >= 1, got {n_channels}")
    if sample_width not in (1, 2):
        raise ValueError(f"sample_width must be 1 or 2, got {sample_width}")
    if len(samples) % n_channels:
        raise ValueError(
            f"{len(samples)} samples do not tile {n_channels} channels"
        )
    lo, hi = (-128, 127) if sample_width == 1 else (-32768, 32767)
    for v in samples:
        if not lo <= v <= hi:
            raise ValueError(
                f"sample {v} outside [{lo}, {hi}] for width {sample_width}"
            )
    if sample_width == 1:
        data = bytes((v + 128) & 0xFF for v in samples)
    else:
        data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = n_channels * sample_width
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate,
        block_align, sample_width * 8,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"  # RIFF word-alignment pad (outside the chunk size)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> DecodedAudio:
    """Strict RIFF/WAVE PCM parse — every structural violation raises.

    Returns samples as SIGNED ints regardless of width (8-bit values get
    the WAV-standard −128 offset removed) so downstream arithmetic never
    branches on the storage convention.
    """
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF":
        raise ValueError("not a RIFF container")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    if riff_size + 8 > len(buf):
        raise ValueError(
            f"RIFF declares {riff_size + 8} bytes, payload has {len(buf)}"
        )
    if buf[8:12] != b"WAVE":
        raise ValueError(f"RIFF form is {buf[8:12]!r}, not WAVE")

    fmt = None
    pos, end = 12, 8 + riff_size
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", buf, pos + 4)
        cstart = pos + 8
        if cstart + csize > end:
            raise ValueError(
                f"chunk {cid!r} declares {csize} bytes past the container end"
            )
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError(f"fmt chunk is {csize} bytes, needs >= 16")
            tag, n_channels, rate, _byte_rate, block_align, bits = (
                struct.unpack_from("<HHIIHH", buf, cstart)
            )
            if tag != 1:
                raise ValueError(
                    f"wFormatTag {tag} unsupported (PCM=1 only; "
                    "IEEE-float/compressed WAV needs a real codec)"
                )
            if bits not in (8, 16):
                raise ValueError(f"{bits}-bit PCM unsupported (8/16 only)")
            if n_channels < 1:
                raise ValueError("fmt declares zero channels")
            if rate < 1:
                # a crawled rate=0 header must fail HERE as a typed
                # decode error, not as a ZeroDivisionError inside the
                # first duration/resample division downstream
                raise ValueError("fmt declares zero sample rate")
            width = bits // 8
            if block_align != n_channels * width:
                raise ValueError(
                    f"block_align {block_align} != channels*width "
                    f"{n_channels * width}"
                )
            fmt = (rate, n_channels, width)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            rate, n_channels, width = fmt
            if csize % (n_channels * width):
                raise ValueError(
                    f"data size {csize} does not tile "
                    f"{n_channels}ch x {width}B frames"
                )
            raw = buf[cstart : cstart + csize]
            if width == 1:
                samples = tuple(b - 128 for b in raw)
            else:
                samples = struct.unpack(f"<{csize // 2}h", raw)
            return DecodedAudio(rate, n_channels, width, samples)
        # skip unknown chunks; odd sizes carry a pad byte
        pos = cstart + csize + (csize & 1)
    raise ValueError(
        "no data chunk" if fmt is not None else "no fmt chunk"
    )


def resample_nearest(audio: DecodedAudio, out_rate: int) -> DecodedAudio:
    """Nearest-frame (zero-order-hold) rate conversion — the audio twin
    of :func:`imagecodec.resize_nearest`: exact integer index mapping
    ``src_frame(j) = j * in_rate // out_rate`` over
    ``out_frames = n_frames * out_rate // in_rate`` frames, so a SQL
    oracle replays it with two integer divisions.  A production pipeline
    swaps a windowed-sinc resampler into the same seam."""
    if out_rate < 1:
        raise ValueError(f"out_rate must be >= 1, got {out_rate}")
    if out_rate == audio.sample_rate:
        return audio
    nf = audio.n_frames
    out_frames = nf * out_rate // audio.sample_rate
    ch = audio.n_channels
    out = []
    for j in range(out_frames):
        src = j * audio.sample_rate // out_rate
        base = src * ch
        out.extend(audio.samples[base : base + ch])
    return DecodedAudio(out_rate, ch, audio.sample_width, tuple(out))
