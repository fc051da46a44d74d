"""Pure-stdlib GIF codec: LZW decode, frame compositing, minimal encode.

GIF is the web's native animation container — crawled pages are full of
it — and the one multimodal branch still riding a stubbed decode was
frame sampling (``sample_frames`` hashes bytes instead of decoding).
The format is fully implementable from the public GIF89a specification
with no dependencies: LZW with variable code width (9→12 bits, LSB-first
bit packing across 255-byte sub-blocks), global/local color tables,
interlacing, and per-frame compositing driven by the Graphic Control
Extension (transparency + disposal).

Scope (honest, enforced with loud errors — never a wrong silent decode):

- GIF87a and GIF89a; global and local color tables; interlaced frames;
  partial-rect frames composited onto the canvas; transparency;
  disposal methods 0 (unspecified), 1 (keep), 2 (restore background).
- Disposal 3 (restore previous) raises — rare, and silently approximating
  it would corrupt every later frame.
- The decoded size is bounded BEFORE any LZW work
  (``MAX_DECODED_BYTES``): LZW expands up to ~4000×, so a few-KB bomb
  must be rejected from the header, same policy as the PNG inflate guard.

Frames are returned as FULL-CANVAS RGB (composited), so downstream
frame features see what a viewer sees, not raw partial rects.

The encoder exists for deterministic fixtures: full-size frames, one
global 256-entry color table, LZW at 8-bit minimum code size emitting
literal codes with a CLEAR before every 254-code run (the classic
dictionary-free writer — decoders must handle CLEAR anywhere, so this
doubles as an LZW reset exercise for the decoder under test).

Everything is exact integer arithmetic, so decoded per-frame pixel sums
are reproducible analytically in SQL (the mm_gif_frames contract oracle).
"""

from __future__ import annotations

import struct
from typing import NamedTuple

# Hard ceiling on total decoded RGB bytes (canvas × frames) — hostile
# crawl input; must be enforced from header fields before LZW runs.
MAX_DECODED_BYTES = 128 * 1024 * 1024


class DecodedGif(NamedTuple):
    width: int
    height: int
    frames: list  # list[bytes], each width*height*3 composited RGB
    delays_cs: list  # per-frame delay in centiseconds (0 if unspecified)


def _read_color_table(buf: bytes, pos: int, n_entries: int):
    end = pos + 3 * n_entries
    if end > len(buf):
        raise ValueError("color table truncated")
    return buf[pos:end], end


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns (data,
    position after the 0x00 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("sub-block stream truncated")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(buf):
            raise ValueError("sub-block data truncated")
        out += buf[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-flavor LZW: LSB-first bit stream, CLEAR/EOI codes, code width
    grows 1 bit when the dictionary fills, capped at 12 bits.  Raises on
    out-of-range codes and on output exceeding ``max_pixels`` (a valid
    stream never does — image data is sized by the descriptor)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"LZW minimum code size {min_code_size} invalid")
    clear = 1 << min_code_size
    eoi = clear + 1

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            min_code_size + 1,
            eoi + 1,
        )

    table, width, next_code = reset()
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    i = 0
    n = len(data)
    while True:
        while nbits < width:
            if i >= n:
                raise ValueError("LZW stream ended without EOI code")
            acc |= data[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width, next_code = reset()
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError(f"LZW code {code} before any literal")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case (spec §Appendix F)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds declared image size")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(indices: bytes, w: int, h: int) -> bytes:
    out = bytearray(len(indices))
    src_row = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y * w : (y + 1) * w] = indices[src_row * w : (src_row + 1) * w]
            src_row += 1
    return bytes(out)


def gif_decode(payload: bytes, max_frames: int | None = None) -> DecodedGif:
    """Strict GIF parse → composited full-canvas RGB frames.

    ``max_frames`` stops decoding after that many frames (frame sampling
    rarely needs a whole animation); the header-level size guard uses
    the REAL frame count bound either way."""
    buf = bytes(payload)
    if len(buf) < 13 or buf[:4] != b"GIF8" or buf[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF87a/GIF89a payload")
    width, height = struct.unpack_from("<HH", buf, 6)
    if width == 0 or height == 0:
        raise ValueError(f"degenerate canvas {width}x{height}")
    packed = buf[10]
    bg_index = buf[11]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(buf, pos, 2 << (packed & 0x07))

    canvas_px = width * height
    # reject canvas bombs BEFORE the full-canvas allocation below: a
    # ~40-byte header declaring 65535x65535 would otherwise attempt a
    # ~12.9 GB bytearray (MemoryError in the executor worker) instead of
    # the typed ValueError the bomb policy promises
    if canvas_px * 3 > MAX_DECODED_BYTES:
        raise ValueError(
            f"canvas {width}x{height} alone exceeds "
            f"{MAX_DECODED_BYTES} decoded bytes"
        )
    frames: list[bytes] = []
    delays: list[int] = []
    # canvas state as palette-independent RGB
    if gct is not None and 3 * bg_index + 3 <= len(gct):
        bg_rgb = gct[3 * bg_index : 3 * bg_index + 3]
    else:
        bg_rgb = b"\x00\x00\x00"
    canvas = bytearray(bg_rgb * canvas_px)

    transparent: int | None = None
    disposal = 0
    delay_cs = 0

    while True:
        if pos >= len(buf):
            raise ValueError("GIF stream ended without trailer")
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(buf):
                raise ValueError("extension header truncated")
            label = buf[pos]
            pos += 1
            data, pos = _read_subblocks(buf, pos)
            if label == 0xF9:  # Graphic Control Extension
                if len(data) < 4:
                    raise ValueError("GCE block truncated")
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                delay_cs = data[1] | (data[2] << 8)
                transparent = data[3] if flags & 0x01 else None
                if disposal == 3:
                    raise ValueError(
                        "disposal=3 (restore previous) unsupported — "
                        "approximating it would corrupt later frames"
                    )
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block introducer 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(buf):
            raise ValueError("image descriptor truncated")
        left, top, fw, fh = struct.unpack_from("<HHHH", buf, pos)
        fpacked = buf[pos + 8]
        pos += 9
        if fw == 0 or fh == 0 or left + fw > width or top + fh > height:
            raise ValueError(
                f"frame rect {fw}x{fh}@({left},{top}) outside "
                f"{width}x{height} canvas"
            )
        if (len(frames) + 1) * canvas_px * 3 > MAX_DECODED_BYTES:
            raise ValueError(
                f"decoded size would exceed {MAX_DECODED_BYTES} bytes "
                f"({len(frames) + 1} frames of {width}x{height})"
            )
        lct = None
        if fpacked & 0x80:
            lct, pos = _read_color_table(buf, pos, 2 << (fpacked & 0x07))
        table = lct if lct is not None else gct
        if table is None:
            raise ValueError("frame has neither local nor global color table")
        if pos >= len(buf):
            raise ValueError("LZW header truncated")
        min_code = buf[pos]
        pos += 1
        data, pos = _read_subblocks(buf, pos)
        indices = _lzw_decode(data, min_code, fw * fh)
        if len(indices) != fw * fh:
            raise ValueError(
                f"LZW yielded {len(indices)} pixels for a {fw * fh}-pixel "
                "frame"
            )
        if fpacked & 0x40:
            indices = _deinterlace(bytes(indices), fw, fh)
        n_colors = len(table) // 3
        for y in range(fh):
            row = (top + y) * width
            base = y * fw
            for x in range(fw):
                idx = indices[base + x]
                if transparent is not None and idx == transparent:
                    continue
                if idx >= n_colors:
                    raise ValueError(
                        f"palette index {idx} outside {n_colors}-color table"
                    )
                o = (row + left + x) * 3
                canvas[o : o + 3] = table[3 * idx : 3 * idx + 3]
        frames.append(bytes(canvas))
        delays.append(delay_cs)
        if disposal == 2:
            # restore the frame RECT to background after display.
            # Compositing only wrote inside the rect, so painting the
            # rect to bg on the composited canvas is byte-identical to
            # the snapshot-and-restore formulation (and saves two
            # full-canvas copies per disposal-2 frame).
            for y in range(fh):
                row = (top + y) * width
                for x in range(fw):
                    o = (row + left + x) * 3
                    canvas[o : o + 3] = bg_rgb
        transparent, disposal, delay_cs = None, 0, 0
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image frames")
    return DecodedGif(width, height, frames, delays)


def _lzw_encode_literal(indices: bytes, min_code_size: int = 8) -> bytes:
    """Dictionary-free LZW writer: CLEAR, then literal codes at
    ``min_code_size + 1`` bits, re-CLEARing before the width would grow
    — every decoder must handle mid-stream CLEAR, so fixtures encoded
    this way exercise the decoder's reset path on every frame."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # after CLEAR the dictionary grows by one per emitted code; reset
    # before next_code reaches 1 << width so the width never grows
    span = (1 << width) - eoi - 2
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for j, idx in enumerate(indices):
        if j and j % span == 0:
            emit(clear)
        emit(idx)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(
    width: int,
    height: int,
    frames_indices: list,
    palette: bytes,
    delays_cs: list | None = None,
) -> bytes:
    """Full-size frames of palette indices + a global 256-color table →
    GIF89a bytes (fixture encoder; see :func:`_lzw_encode_literal`)."""
    if len(palette) != 256 * 3:
        raise ValueError("palette must be exactly 256 RGB entries")
    if not frames_indices:
        raise ValueError("need at least one frame")
    for f in frames_indices:
        if len(f) != width * height:
            raise ValueError("every frame must be full-canvas")
    delays_cs = delays_cs or [4] * len(frames_indices)
    if len(delays_cs) != len(frames_indices):
        # zip() would silently truncate to the shorter list — a fixture
        # meant to pin 3-frame behavior would quietly test 2 frames
        raise ValueError(
            f"{len(delays_cs)} delays for {len(frames_indices)} frames"
        )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries, bg=0
    out += palette
    for f, delay in zip(frames_indices, delays_cs):
        out += bytes([0x21, 0xF9, 4, 0x00])  # GCE: no transparency
        out += struct.pack("<H", delay)
        out += bytes([0, 0])  # transparent idx (unused), terminator
        out += bytes([0x2C])
        out += struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x00])  # no LCT, not interlaced
        out += bytes([8])  # LZW minimum code size
        data = _lzw_encode_literal(bytes(f), 8)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0x00])
    out += bytes([0x3B])
    return bytes(out)
