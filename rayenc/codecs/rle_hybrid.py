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


class Plan:
    """Planned hybrid encoding: segment list + exact byte size, no payload
    materialization. ``emit`` does the (single) packing pass."""

    __slots__ = ("values", "width", "segments", "size")

    def __init__(self, values: np.ndarray, width: int):
        v = np.ascontiguousarray(values)
        self.values = v
        self.width = width
        n = len(v)
        # segments: ("bp", [(a,b), ...]) span | ("rle", count, value)
        segments: list = []
        size = 0
        vbytes = (width + 7) // 8
        if n:
            eq = v[1:] == v[:-1]
            if np.count_nonzero(eq) < 7:
                # high-entropy fast path: an RLE run needs >= 8 equal values
                # (>= 7 adjacent-equal pairs), so none can exist — one
                # bit-packed span, identical bytes to the general path,
                # without materializing the run-boundary arrays
                self.segments = [("bp", [(0, n)])]
                self.size = _bp_size(n, width)
                return
            change = np.flatnonzero(~eq) + 1
            starts = np.concatenate(([0], change))
            lengths = np.diff(np.concatenate((starts, [n])))
            candidates = np.flatnonzero(lengths >= 8)
            span_ranges: list[tuple[int, int]] = []
            span_len = 0
            prev_end = 0
            starts_l = starts[candidates].tolist()
            lens_l = lengths[candidates].tolist()
            vals_l = v[starts[candidates]].tolist() if len(candidates) else []
            for s, run_len, rv in zip(starts_l, lens_l, vals_l):
                if s > prev_end:
                    span_ranges.append((prev_end, s))
                    span_len += s - prev_end
                donate = (8 - span_len % 8) % 8
                rem = run_len - donate
                if rem >= 8:
                    if donate:
                        span_ranges.append((s, s + donate))
                        span_len += donate
                    if span_ranges:
                        segments.append(("bp", span_ranges))
                        size += _bp_size(span_len, width)
                    span_ranges = []
                    span_len = 0
                    segments.append(("rle", rem, int(rv)))
                    size += _uvarint_len(rem << 1) + vbytes
                else:
                    span_ranges.append((s, s + run_len))
                    span_len += run_len
                prev_end = s + run_len
            if prev_end < n:
                span_ranges.append((prev_end, n))
                span_len += n - prev_end
            if span_ranges:
                segments.append(("bp", span_ranges))
                size += _bp_size(span_len, width)
        self.segments = segments
        self.size = size

    def emit(self) -> bytes:
        out = bytearray()
        v = self.values
        for seg in self.segments:
            if seg[0] == "bp":
                ranges = seg[1]
                vals = (
                    v[ranges[0][0] : ranges[0][1]]
                    if len(ranges) == 1
                    else np.concatenate([v[a:b] for a, b in ranges])
                )
                _emit_bitpacked(out, vals, self.width)
            else:
                _emit_rle(out, seg[1], seg[2], self.width)
        return bytes(out)


def _bp_size(n_values: int, width: int) -> int:
    groups = (n_values + 7) // 8
    headers = (groups + MAX_GROUPS - 1) // MAX_GROUPS
    return headers + groups * width


def _uvarint_len(value: int) -> int:
    return max(1, (value.bit_length() + 6) // 7)


def encoded_size(values: np.ndarray, width: int) -> int:
    return Plan(values, width).size


def encode(values: np.ndarray, width: int) -> bytes:
    """Vectorized hybrid encode; byte-identical to the reference state machine."""
    return Plan(values, width).emit()


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
    """Decode n values; mirrors RunLengthBitPackingHybridDecoder.java:61-108.

    Two passes: a python skip-walk collects run descriptors (touching only
    header bytes), then ALL bit-packed payloads unpack in one vectorized
    call (group packing is byte-aligned, so concatenated payloads form one
    valid stream) and scatter back by run; RLE runs are slice fills."""
    out = np.empty(n, out_dtype)
    if n == 0:
        return out
    raw = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, np.uint8)
    rb = raw.tobytes()
    vbytes = (width + 7) // 8
    pos = 0
    i = 0
    bp_runs: list[tuple[int, int, int, int, int]] = []
    rle_runs: list[tuple[int, int, int]] = []
    while pos < n:
        b = rb[i]
        i += 1
        header = b & 0x7F
        shift = 7
        while b & 0x80:
            b = rb[i]
            i += 1
            header |= (b & 0x7F) << shift
            shift += 7
        if header & 1:  # bit-packed run
            groups = header >> 1
            cnt = groups * 8
            nbytes = groups * width
            take = cnt if cnt <= n - pos else n - pos
            bp_runs.append((i, nbytes, cnt, pos, take))
            i += nbytes
            pos += take
        else:  # rle run
            cnt = header >> 1
            value = int.from_bytes(rb[i : i + vbytes], "little")
            i += vbytes
            rle_runs.append((pos, cnt, value))
            pos += cnt
    if bp_runs:
        if len(bp_runs) == 1:
            s, nb, cnt, opos, take = bp_runs[0]
            vals = unpack_lsb(raw[s : s + nb], cnt, width, out_dtype)
            out[opos : opos + take] = vals[:take]
        else:
            payload = np.concatenate([raw[s : s + nb] for s, nb, _, _, _ in bp_runs])
            total = sum(c for _, _, c, _, _ in bp_runs)
            vals = unpack_lsb(payload, total, width, out_dtype)
            base = 0
            for _, _, cnt, opos, take in bp_runs:
                out[opos : opos + take] = vals[base : base + take]
                base += cnt
    for opos, cnt, value in rle_runs:
        out[opos : opos + cnt] = value
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
