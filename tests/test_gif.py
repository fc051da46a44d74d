"""Pure-stdlib GIF codec (ocr_spark.gifcodec) + the frame operator branch.

The production encoder is a literal-code LZW writer (fixtures), so these
tests also implement a REAL dictionary-building GIF-LZW compressor and
round-trip it through the decoder — that exercises variable code width
growth to 12 bits, the KwKwK corner case, dictionary-full behavior, and
mid-stream CLEAR, none of which literal streams produce.  Plus:
interlacing, transparency, partial-rect compositing, disposal 2,
structural error paths, the pre-LZW size bomb guard, and the Spark
operators differentially against local decode.
"""

import random
import struct

import pytest

from ocr_spark import gifcodec as gc


def lzw_encode_real(indices: bytes, min_code_size: int = 8) -> bytes:
    """Reference dictionary-building GIF-LZW compressor (spec Appendix F):
    emits CLEAR, grows code width when the decoder's would grow, and
    re-CLEARs when the dictionary fills."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1

    table, next_code = fresh()
    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # the decoder's dictionary lags the encoder's by ONE entry
            # (it derives each entry from the NEXT code), so the encoder
            # grows its width one entry later than the decoder's
            # next_code == (1 << width) rule
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            width = min_code_size + 1
            table, next_code = fresh()
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _wrap_single_frame(w, h, palette, lzw_data, *, min_code=8,
                       interlace=False, gce=None, rect=None):
    """Hand-assemble a one-frame GIF89a around raw LZW bytes."""
    left, top, fw, fh = rect or (0, 0, w, h)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x07, 0, 0])
    out += palette
    if gce is not None:
        out += bytes([0x21, 0xF9, 4]) + gce + bytes([0])
    out += bytes([0x2C]) + struct.pack("<HHHH", left, top, fw, fh)
    out += bytes([0x40 if interlace else 0x00, min_code])
    for i in range(0, len(lzw_data), 255):
        chunk = lzw_data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0x00, 0x3B])
    return bytes(out)


PALETTE = b"".join(
    bytes(((7 * i) % 256, (11 * i + 3) % 256, (13 * i + 5) % 256))
    for i in range(256)
)


def _rgb(indices):
    return b"".join(PALETTE[3 * i : 3 * i + 3] for i in indices)


class TestLzw:
    @pytest.mark.parametrize("pattern", ["random", "runs", "kwkwk"])
    def test_real_compressor_round_trip(self, pattern):
        rng = random.Random(11)
        if pattern == "random":
            data = bytes(rng.randrange(256) for _ in range(6000))
        elif pattern == "runs":
            data = b"".join(
                bytes([rng.randrange(256)]) * rng.randrange(1, 60)
                for _ in range(300)
            )
        else:  # abab… drives the code == next_code (KwKwK) branch
            data = bytes([1, 2] * 3000)
        out = gc._lzw_decode(lzw_encode_real(data), 8, len(data))
        assert bytes(out) == data

    def test_width_growth_to_12_bits_and_dict_full(self):
        """All-distinct pairs force steady dictionary growth past every
        width boundary up to 4096 and a mid-stream CLEAR after."""
        rng = random.Random(3)
        data = bytes(rng.randrange(256) for _ in range(30000))
        out = gc._lzw_decode(lzw_encode_real(data), 8, len(data))
        assert bytes(out) == data

    def test_small_min_code_size(self):
        data = bytes([0, 1, 2, 3, 2, 1, 0] * 40)
        out = gc._lzw_decode(lzw_encode_real(data, 2), 2, len(data))
        assert bytes(out) == data

    def test_decoder_rejects_garbage(self):
        with pytest.raises(ValueError, match="without EOI"):
            gc._lzw_decode(b"\x00\x00", 8, 10_000)
        # a code far beyond next_code
        with pytest.raises(ValueError, match="out of range|before any"):
            gc._lzw_decode(b"\xff\xff\xff\xff", 8, 10_000)


class TestGifDecode:
    def test_real_lzw_inside_container(self):
        """A frame compressed by the REAL compressor decodes identically
        to the same frame through the literal fixture encoder."""
        rng = random.Random(5)
        w, h = 31, 17
        idx = bytes(rng.randrange(256) for _ in range(w * h))
        real = _wrap_single_frame(w, h, PALETTE, lzw_encode_real(idx))
        lit = gc.gif_encode(w, h, [idx], PALETTE)
        a, b = gc.gif_decode(real), gc.gif_decode(lit)
        assert a.frames[0] == b.frames[0] == _rgb(idx)

    def test_interlaced_frame(self):
        """Rows stored in interlace pass order must land back in display
        order."""
        w, h = 8, 11
        display = bytes((x + 3 * y) % 256 for y in range(h) for x in range(w))
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        stored = b"".join(display[y * w : (y + 1) * w] for y in order)
        buf = _wrap_single_frame(
            w, h, PALETTE, lzw_encode_real(stored), interlace=True
        )
        assert gc.gif_decode(buf).frames[0] == _rgb(display)

    def test_transparency_and_partial_rect_composite(self):
        """Frame 2 is a partial rect with a transparent index: composited
        output keeps frame 1's pixels under transparent cells and outside
        the rect."""
        w, h = 10, 6
        f1 = bytes((x + y) % 256 for y in range(h) for x in range(w))
        base = gc.gif_encode(w, h, [f1], PALETTE)
        # append a 4x2 rect at (3,1): index 9 transparent, others 200
        rect_idx = bytes([9, 200, 9, 200, 200, 9, 200, 9])
        gce = bytes([0x01]) + struct.pack("<H", 4) + bytes([9])
        frame2 = bytes([0x21, 0xF9, 4]) + gce + bytes([0])
        frame2 += bytes([0x2C]) + struct.pack("<HHHH", 3, 1, 4, 2)
        frame2 += bytes([0x00, 8])
        data = lzw_encode_real(rect_idx)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            frame2 += bytes([len(chunk)]) + chunk
        frame2 += bytes([0x00])
        buf = base[:-1] + frame2 + bytes([0x3B])
        dec = gc.gif_decode(buf)
        assert len(dec.frames) == 2
        want = bytearray(_rgb(f1))
        for ry in range(2):
            for rx in range(4):
                idx = rect_idx[ry * 4 + rx]
                if idx == 9:
                    continue  # transparent: frame 1 shows through
                o = ((1 + ry) * w + 3 + rx) * 3
                want[o : o + 3] = PALETTE[3 * idx : 3 * idx + 3]
        assert dec.frames[1] == bytes(want)

    def test_disposal_2_restores_background_rect(self):
        """After a disposal=2 frame, the NEXT frame starts from the frame
        rect reset to background (index 0 here), not from the overlay."""
        w, h = 6, 4
        f1 = bytes([10] * (w * h))
        base = gc.gif_encode(w, h, [f1], PALETTE)

        def frame(gce_flags_disposal, rect, idx_bytes):
            gce = bytes([gce_flags_disposal]) + struct.pack("<H", 4) + bytes([0])
            blk = bytes([0x21, 0xF9, 4]) + gce + bytes([0])
            left, top, fw, fh = rect
            blk += bytes([0x2C]) + struct.pack("<HHHH", left, top, fw, fh)
            blk += bytes([0x00, 8])
            data = lzw_encode_real(idx_bytes)
            for i in range(0, len(data), 255):
                chunk = data[i : i + 255]
                blk += bytes([len(chunk)]) + chunk
            return blk + bytes([0x00])

        # frame 2: disposal=2 overlay at (2,1); frame 3: full redraw of 30s
        buf = (
            base[:-1]
            + frame(0x02 << 2, (2, 1, 2, 2), bytes([77] * 4))
            + frame(0x00, (0, 0, w, h), bytes([30] * (w * h)))
            + bytes([0x3B])
        )
        dec = gc.gif_decode(buf)
        assert len(dec.frames) == 3
        # frame 2 shows the overlay
        o = (1 * w + 2) * 3
        assert dec.frames[1][o : o + 3] == PALETTE[77 * 3 : 77 * 3 + 3]
        # frame 3 is the full redraw — and would differ if the rect had
        # leaked the overlay into its canvas start
        assert dec.frames[2] == _rgb(bytes([30] * (w * h)))

    def test_disposal_3_raises(self):
        w, h = 4, 3
        gce = bytes([0x03 << 2]) + struct.pack("<H", 4) + bytes([0])
        buf = _wrap_single_frame(
            w, h, PALETTE,
            lzw_encode_real(bytes(w * h)), gce=gce,
        )
        with pytest.raises(ValueError, match="disposal=3"):
            gc.gif_decode(buf)

    def test_bomb_rejected_before_lzw(self):
        """A tiny payload declaring a huge canvas × many frames must be
        rejected from the header math, not by decoding into memory."""
        w = h = 60_000  # 60k² × 3 ≈ 10 GB per frame
        out = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
        out += bytes([0x80 | 0x07, 0, 0]) + PALETTE
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x00, 8, 1, 0x41, 0x00, 0x3B])
        with pytest.raises(ValueError, match="exceed"):
            gc.gif_decode(bytes(out))

    def test_canvas_bomb_rejected_before_allocation(self, monkeypatch):
        """The header guard must fire BEFORE the full-canvas bytearray is
        built: a ~40-byte hostile header must never trigger a multi-GB
        allocation (executor OOM) on its way to the ValueError."""
        big_allocs = []

        def spy(*a, **kw):
            b = bytearray(*a, **kw)
            if len(b) > 1 << 20:
                big_allocs.append(len(b))
            return b

        # builtins resolve through module globals first — shadowing
        # gc.bytearray intercepts every allocation the decoder makes
        monkeypatch.setattr(gc, "bytearray", spy, raising=False)
        w = h = 60_000
        out = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
        out += bytes([0x80 | 0x07, 0, 0]) + PALETTE
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x00, 8, 1, 0x41, 0x00, 0x3B])
        with pytest.raises(ValueError, match="exceeds"):
            gc.gif_decode(bytes(out))
        assert big_allocs == []

    def test_encode_rejects_delays_frames_mismatch(self):
        """zip() truncation must not silently drop frames from fixtures."""
        with pytest.raises(ValueError, match="2 delays for 3 frames"):
            gc.gif_encode(
                2, 2, [bytes(4)] * 3, PALETTE, delays_cs=[4, 4]
            )

    def test_structural_errors(self):
        good = gc.gif_encode(5, 4, [bytes(20)], PALETTE)
        with pytest.raises(ValueError, match="not a GIF"):
            gc.gif_decode(b"PNG" + good)
        with pytest.raises(ValueError, match="trailer"):
            gc.gif_decode(good[:-1])
        with pytest.raises(ValueError, match="truncated"):
            gc.gif_decode(good[:30])
        # palette index beyond a small local table
        small_lct = bytes(6)  # 2 entries
        out = bytearray(b"GIF89a") + struct.pack("<HH", 3, 1)
        out += bytes([0x00, 0, 0])  # no GCT
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 3, 1)
        out += bytes([0x80 | 0x00])  # LCT present, 2 entries
        out += small_lct
        out += bytes([2])  # min code size 2
        data = lzw_encode_real(bytes([0, 1, 3]), 2)  # index 3 > table
        out += bytes([len(data)]) + data + bytes([0x00, 0x3B])
        with pytest.raises(ValueError, match="palette index"):
            gc.gif_decode(bytes(out))
        # frame rect outside canvas — locate the image descriptor
        # structurally (0x2C also occurs inside palette bytes): header 6 +
        # LSD 7 + GCT 768 + GCE 8 = 789
        out2 = bytearray(good)
        pos = 6 + 7 + 768 + 8
        assert out2[pos] == 0x2C
        struct.pack_into("<H", out2, pos + 1, 4)  # left=4 on a 5-wide canvas
        with pytest.raises(ValueError, match="outside"):
            gc.gif_decode(bytes(out2))

    def test_max_frames_early_stop(self):
        frames = [bytes([i] * 12) for i in range(5)]
        buf = gc.gif_encode(4, 3, frames, PALETTE)
        dec = gc.gif_decode(buf, max_frames=2)
        assert len(dec.frames) == 2
        assert gc.gif_decode(buf).frames[4] == _rgb(frames[4])


class TestGifOperators:
    @pytest.fixture(scope="class")
    def gifs(self, spark):
        from ocr_spark.operators.multimodal import synthetic_gifs

        ids = spark.createDataFrame([(i,) for i in range(8)], "media_id long")
        return synthetic_gifs(ids, 24, 16, n_frames=6).persist()

    def test_frame_stats_match_local_decode(self, gifs):
        from ocr_spark.operators.multimodal import decode_gif_frames

        got = {
            (r.media_id, r.frame_i): r
            for r in decode_gif_frames(gifs, every=2).collect()
        }
        src = {r.media_id: bytes(r.payload) for r in gifs.collect()}
        assert len(got) == 8 * 3  # frames 0, 2, 4
        for mid, payload in src.items():
            dec = gc.gif_decode(payload)
            for fi in (0, 2, 4):
                r = got[(mid, fi)]
                px = dec.frames[fi]
                assert (r.width, r.height, r.n_frames) == (24, 16, 6)
                assert r.sum_r == sum(px[0::3])
                assert r.sum_g == sum(px[1::3])
                assert r.sum_b == sum(px[2::3])

    def test_frame_features_match_image_cell_map(self, gifs):
        """Per-frame features use the exact image_features cell map: check
        one frame against numpy ground truth."""
        import numpy as np

        from ocr_spark.operators.multimodal import gif_frame_features

        rows = {
            (r.media_id, r.frame_i): list(r.features)
            for r in gif_frame_features(gifs, every=3, grid=4).collect()
        }
        src = {r.media_id: bytes(r.payload) for r in gifs.collect()}
        for mid in (0, 5):
            dec = gc.gif_decode(src[mid])
            for fi in (0, 3):
                arr = np.frombuffer(dec.frames[fi], dtype=np.uint8).reshape(
                    16, 24, 3
                )
                want = []
                for cy in range(4):
                    for cx in range(4):
                        cell = arr[cy * 4 : (cy + 1) * 4, cx * 6 : (cx + 1) * 6]
                        want.append(int(cell.sum(dtype=np.int64)) / float(3 * 24))
                assert rows[(mid, fi)] == want

    def test_media_metadata_sniffs_gif(self, gifs):
        from ocr_spark.operators.multimodal import media_metadata

        kinds = {r.kind for r in media_metadata(gifs).collect()}
        assert kinds == {"image/gif"}
