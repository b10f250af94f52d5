"""RLE / bit-packed hybrid encoding.

Grammar (mirrors
`parquet-column/.../values/rle/RunLengthBitPackingHybridEncoder.java:36-51`):

    encoded-data      := <run>*
    run               := <bit-packed-run> | <rle-run>
    bit-packed-run    := varint((groups << 1) | 1) <groups*width bytes>   (groups <= 63)
    rle-run           := varint(count << 1) <value in ceil(width/8) bytes LE>

Run-emission rule (state machine at
`RunLengthBitPackingHybridEncoder.java:146-273`): values buffer in groups of
8; a value repeated >= 8 times consecutively *since the last 8-group flush*
becomes an rle-run; buffered groups flush into bit-packed runs capped at 63
groups (504 values); on final flush a partial group is zero-padded.

``encode`` reproduces that state machine byte-for-byte but at run granularity
(vectorized run detection + batch bit-packing); ``encode_scalar`` is a direct
transliteration of the state machine used by tests to prove equivalence.
"""

from __future__ import annotations

import numpy as np

from .bitpack import pack_lsb, unpack_lsb
from .varint import read_uvarint, write_uvarint

MAX_GROUPS = 63  # one-byte bit-packed header: (63 << 1) | 1 = 127


def _emit_bitpacked(out: bytearray, vals: np.ndarray, width: int) -> None:
    """Emit one or more bit-packed runs for vals (len % 8 == 0 except at EOF,
    where it is zero-padded to a multiple of 8 by the caller)."""
    n = len(vals)
    if n == 0:
        return
    groups = (n + 7) // 8
    if n % 8:  # final partial group: zero-pad
        vals = np.concatenate([vals, np.zeros(groups * 8 - n, vals.dtype)])
    packed = pack_lsb(vals, width)  # one vectorized pack for the whole span
    pos = 0
    gpos = 0
    while gpos < groups:
        g = min(groups - gpos, MAX_GROUPS)
        out.append((g << 1) | 1)
        out += packed[pos : pos + g * width]
        pos += g * width
        gpos += g


def _emit_rle(out: bytearray, count: int, value: int, width: int) -> None:
    write_uvarint(out, count << 1)
    vbytes = (width + 7) // 8
    out += int(value).to_bytes(vbytes, "little")


def encode(values: np.ndarray, width: int) -> bytes:
    """Vectorized hybrid encode; byte-identical to the reference state machine."""
    v = np.ascontiguousarray(values)
    n = len(v)
    out = bytearray()
    if n == 0:
        return bytes(out)
    # run-length decomposition
    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [n])))
    rvals = v[starts]

    candidates = np.flatnonzero(lengths >= 8)
    span_ranges: list[tuple[int, int]] = []  # pending bit-packed value ranges
    span_mod = 0  # pending span length % 8 (buffer fill in the reference)
    prev_end = 0

    def flush_span() -> None:
        nonlocal span_ranges
        if span_ranges:
            vals = (
                v[span_ranges[0][0] : span_ranges[0][1]]
                if len(span_ranges) == 1
                else np.concatenate([v[a:b] for a, b in span_ranges])
            )
            _emit_bitpacked(out, vals, width)
            span_ranges = []

    for ci in candidates:
        s = int(starts[ci])
        run_len = int(lengths[ci])
        if s > prev_end:
            span_ranges.append((prev_end, s))
            span_mod = (span_mod + (s - prev_end)) % 8
        # the run first donates values to fill the current 8-value group
        # (mirrors repeatCount reset in writeOrAppendBitPackedRun)
        donate = (8 - span_mod) % 8
        rem = run_len - donate
        if rem >= 8:
            if donate:
                span_ranges.append((s, s + donate))
            flush_span()
            span_mod = 0
            _emit_rle(out, rem, int(rvals[ci]), width)
        else:
            span_ranges.append((s, s + run_len))
            span_mod = (span_mod + run_len) % 8
        prev_end = s + run_len

    if prev_end < n:
        span_ranges.append((prev_end, n))
    flush_span()
    return bytes(out)


def encode_scalar(values, width: int) -> bytes:
    """Direct transliteration of the reference state machine
    (`RunLengthBitPackingHybridEncoder.java:146-273`); test oracle only."""
    out = bytearray()
    previous = 0
    buffered: list[int] = []
    repeat = 0
    group_count = 0
    header_ptr = -1

    def end_bp_run() -> None:
        nonlocal header_ptr, group_count
        if header_ptr == -1:
            return
        out[header_ptr] = (group_count << 1) | 1
        header_ptr = -1
        group_count = 0

    def write_bp_group() -> None:
        nonlocal header_ptr, group_count, buffered, repeat
        if group_count >= MAX_GROUPS:
            end_bp_run()
        if header_ptr == -1:
            out.append(0)
            header_ptr = len(out) - 1
        out.extend(pack_lsb(np.array(buffered, np.uint64), width))
        buffered = []
        repeat = 0
        group_count += 1

    def write_rle_run() -> None:
        nonlocal repeat, buffered
        end_bp_run()
        write_uvarint(out, repeat << 1)
        out.extend(int(previous).to_bytes((width + 7) // 8, "little"))
        repeat = 0
        buffered = []

    for value in values:
        value = int(value)
        if value == previous:
            repeat += 1
            if repeat >= 8:
                continue
        else:
            if repeat >= 8:
                write_rle_run()
            repeat = 1
            previous = value
        buffered.append(value)
        if len(buffered) == 8:
            write_bp_group()

    if repeat >= 8:
        write_rle_run()
    elif buffered:
        buffered += [0] * (8 - len(buffered))
        write_bp_group()
        end_bp_run()
    else:
        end_bp_run()
    return bytes(out)


def decode(buf, n: int, width: int, out_dtype=np.uint32) -> np.ndarray:
    """Decode n values; mirrors RunLengthBitPackingHybridDecoder.java:61-108."""
    out = np.empty(n, out_dtype)
    pos = 0
    i = 0
    vbytes = (width + 7) // 8
    while pos < n:
        header, i = read_uvarint(buf, i)
        if header & 1:  # bit-packed run
            groups = header >> 1
            cnt = groups * 8
            nbytes = groups * width
            vals = unpack_lsb(buf[i : i + nbytes], cnt, width, out_dtype)
            i += nbytes
            take = min(cnt, n - pos)
            out[pos : pos + take] = vals[:take]
            pos += take
        else:  # rle run
            cnt = header >> 1
            value = int.from_bytes(bytes(buf[i : i + vbytes]), "little")
            i += vbytes
            out[pos : pos + cnt] = value
            pos += cnt
    return out


def encode_framed(values: np.ndarray, width: int) -> bytes:
    """4-byte LE length prefix + hybrid payload; mirrors
    RunLengthBitPackingHybridValuesWriter.java:66-71 (V1 levels / BOOLEAN V2)."""
    payload = encode(values, width)
    return len(payload).to_bytes(4, "little") + payload


def decode_framed(buf, n: int, width: int, out_dtype=np.uint32) -> tuple[np.ndarray, int]:
    """Returns (values, bytes_consumed_including_frame)."""
    ln = int.from_bytes(bytes(buf[:4]), "little")
    return decode(buf[4 : 4 + ln], n, width, out_dtype), 4 + ln
