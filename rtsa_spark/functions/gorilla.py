"""Gorilla XOR float compression + delta-of-delta timestamp compression,
implemented as fully vectorized numpy bit-packing (zero per-row Python on
the encode path — BASELINE.json ``input_hint``).

Format (self-describing given ``n_points``, MSB-first bitstream, zero-padded
to a byte boundary):

Timestamps (``dod_encode``): int64 stream. First value raw 64 bits; second
value's delta and every later delta-of-delta use the prefix classes
(Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
Database", VLDB 2015, §4.1, extended with a 64-bit escape)::

    '0'                    dod == 0
    '10'    + 7  bits      dod in [-63, 64]        (stored dod+63)
    '110'   + 9  bits      dod in [-255, 256]      (stored dod+255)
    '1110'  + 12 bits      dod in [-2047, 2048]    (stored dod+2047)
    '11110' + 32 bits      dod in [-2^31+1, 2^31]  (stored dod+2^31-1)
    '11111' + 64 bits      raw two's complement

Values (``gorilla_encode``): float64 stream viewed as uint64. First value
raw 64 bits; later values XOR with predecessor::

    '0'                          xor == 0
    '10' + meaningful bits       (leading, trailing) window equal to the
                                 previous non-zero xor's window
    '11' + 5b lead + 6b (len-1)  new window, then the meaningful bits

Reuse rule (``gorilla_encode(..., reuse=...)``): the paper reuses the
previous window whenever it *contains* the current xor, which makes the
encoder a sequential state machine. The default ``"equal"`` rule reuses
only on *exact* window equality — a stateless rule both sides compute
element-wise, keeping encode 100% vectorized. ``"containment"`` is the
paper-exact rule (Pelkonen §4.1.2), implemented as a segment-wise scan:
the committed window only changes at emit-new positions, so each numpy
step probes forward in geometrically growing chunks for the next
containment violation and fills the whole reused run at once — O(n)
total work with a small constant even under full window churn, and
python iterations proportional to emitted windows, NOT points. Both rules produce
streams the ONE decoder parses (it tracks the last transmitted window,
which is exactly the paper's receiver); they differ only in bits/point
(containment saves the 11-bit window header on contained xors at the
price of the wider committed window's payload — a few percent either
way; bench.py reports both).

Encode is O(n) numpy (bit matrix + packbits); decode is a sequential parse
(inherent to prefix codes) used on the read/verification path.
"""

from __future__ import annotations

import zlib

import numpy as np

_U64 = np.uint64
_ONE = _U64(1)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x==0 -> 64)."""
    x = x.astype(_U64, copy=True)
    n = np.full(x.shape, 64, dtype=np.int64)
    shift = np.int64(32)
    for s in (32, 16, 8, 4, 2, 1):
        s = _U64(s)
        big = (x >> s) != 0
        n = np.where(big, n - np.int64(s), n)
        x = np.where(big, x >> s, x)
    return n - (x != 0).astype(np.int64)


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (x==0 -> 64)."""
    x = x.astype(_U64)
    isolated = x & (~x + _ONE)  # lowest set bit
    return np.where(x == 0, np.int64(64), np.int64(63) - _clz64(isolated))


_PACK_CHUNK = 1 << 14  # segments per chunk: per-bit temporaries stay ~1-4 MB

# Grow-only scratch reused across calls. Spark python workers are long-lived
# and process many groups sequentially, so this stays page-warm; per-call
# fresh mmaps would pay first-touch fault cost on every block (dominant on
# lazily-faulted VMs and real NUMA boxes alike).
_SCRATCH: dict[str, np.ndarray] = {}


def _scratch(name: str, n: int, dtype) -> np.ndarray:
    buf = _SCRATCH.get(name)
    if buf is None or buf.size < n or buf.dtype != dtype:
        buf = np.empty(int(n * 1.5) + 64, dtype=dtype)
        _SCRATCH[name] = buf
    return buf[:n]


def _pack_segments(nbits: np.ndarray, vals: np.ndarray) -> bytes:
    """Concatenate variable-width codes (MSB-first) into a byte string.

    ``vals[i]`` holds code i right-aligned in a uint64; ``nbits[i]`` its
    width (0..64). Pure numpy: per segment chunk, a ragged expansion
    (repeat + arithmetic) computes every output bit, written into one flat
    reused bit buffer, then ``np.packbits`` once.
    """
    nbits = np.ascontiguousarray(nbits, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=_U64)
    m = len(vals)
    if m == 0:
        return b""
    total_bits = int(nbits.sum())
    bitbuf = _scratch("bitbuf", total_bits, np.uint8)
    c = min(_PACK_CHUNK, m)
    off = 0
    for a in range(0, m, c):
        b = min(a + c, m)
        nb = nbits[a:b]
        cnt = int(nb.sum())
        # for flat bit k in segment i: shift = (nb_i - 1) - (k - start_i)
        ends = np.cumsum(nb)  # == start_i + nb_i
        shift32 = _scratch("shift32", cnt, np.int32)
        np.subtract(
            np.repeat((ends - 1).astype(np.int32), nb),
            np.arange(cnt, dtype=np.int32),
            out=shift32,
        )
        shift8 = _scratch("shift8", cnt, np.uint8)
        np.copyto(shift8, shift32, casting="unsafe")
        vrep = _scratch("vrep", cnt, _U64)
        np.take(vals[a:b], np.repeat(np.arange(b - a, dtype=np.int32), nb), out=vrep)
        np.right_shift(vrep, shift8, out=vrep)
        np.bitwise_and(vrep, _ONE, out=vrep)
        np.copyto(bitbuf[off : off + cnt], vrep, casting="unsafe")
        off += cnt
    return np.packbits(bitbuf).tobytes()


# ---------------------------------------------------------------- DoD ints

_DOD_CLASSES = (  # (max_abs_range_hi, prefix, prefix_bits, payload_bits, bias)
    (64, 0b10, 2, 7, 63),
    (256, 0b110, 3, 9, 255),
    (2048, 0b1110, 4, 12, 2047),
    (1 << 31, 0b11110, 5, 32, (1 << 31) - 1),
)


def _dod_segments(dod: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per element: header segment (prefix [+ payload when it fits]) and
    payload segment. Returns interleaved (nbits, vals) of shape (2n,)."""
    n = len(dod)
    hdr_bits = np.ones(n, dtype=np.int64)  # class '0'
    hdr_val = np.zeros(n, dtype=_U64)
    pay_bits = np.zeros(n, dtype=np.int64)
    pay_val = np.zeros(n, dtype=_U64)
    done = dod == 0
    for hi, prefix, pbits, vbits, bias in _DOD_CLASSES:
        lo = -hi + 1
        take = (~done) & (dod >= lo) & (dod <= hi)
        hdr_bits = np.where(take, pbits, hdr_bits)
        hdr_val = np.where(take, _U64(prefix), hdr_val)
        pay_bits = np.where(take, vbits, pay_bits)
        pay_val = np.where(take, (dod + bias).astype(np.int64).view(_U64), pay_val)
        done |= take
    rest = ~done
    hdr_bits = np.where(rest, 5, hdr_bits)
    hdr_val = np.where(rest, _U64(0b11111), hdr_val)
    pay_bits = np.where(rest, 64, pay_bits)
    pay_val = np.where(rest, dod.astype(np.int64).view(_U64), pay_val)
    nbits = np.empty(2 * n, dtype=np.int64)
    vals = np.empty(2 * n, dtype=_U64)
    nbits[0::2], nbits[1::2] = hdr_bits, pay_bits
    vals[0::2], vals[1::2] = hdr_val, pay_val
    return nbits, vals


def dod_encode(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 array (need not be regular)."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    if n == 0:
        return b""
    head_bits = np.array([64], dtype=np.int64)
    head_vals = np.array([ts[0]], dtype=np.int64).view(_U64)
    if n == 1:
        return _pack_segments(head_bits, head_vals)
    deltas = np.diff(ts)
    dod = np.empty(n - 1, dtype=np.int64)
    dod[0] = deltas[0]  # first delta encoded in the same class space
    dod[1:] = deltas[1:] - deltas[:-1]
    nbits, vals = _dod_segments(dod)
    return _pack_segments(
        np.concatenate([head_bits, nbits]), np.concatenate([head_vals, vals])
    )


def _u64_to_i64(v: int) -> int:
    """Two's-complement reinterpretation of a 64-bit unsigned int."""
    v = int(v)
    return v - (1 << 64) if v >= (1 << 63) else v


def _wrap_i64(v: int) -> int:
    """Wrap a Python int to int64 two's complement (matches numpy overflow
    on the encode side, so extreme-magnitude series round-trip exactly)."""
    return ((v + (1 << 63)) & ((1 << 64) - 1)) - (1 << 63)


def dod_decode(blob: bytes, n_points: int) -> np.ndarray:
    """Sequential prefix-code parse (read path).

    A prefix code is inherently sequential; the fastest honest form here
    is plain Python ints over a pre-materialized bit list — ~6x faster
    than numpy scalar indexing per bit position (measured; numpy scalar
    ops pay ~1 us each). The vectorized-numpy rule targets per-ROW
    dataframe work; this is a per-BLOCK bitstream cursor."""
    out = np.empty(n_points, dtype=np.int64)
    if n_points == 0:
        return out
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8)).tolist()
    pos = 64
    acc = _u64_to_i64(_field(bits, 0, 64))
    out[0] = acc
    prev_delta = 0
    for i in range(1, n_points):
        if bits[pos] == 0:
            dod = 0
            pos += 1
        else:
            klass = 1
            while klass < 5 and bits[pos + klass] == 1:
                klass += 1
            pos += klass + (1 if klass < 5 else 0)
            if klass < 5:
                vbits, bias = ((7, 63), (9, 255), (12, 2047), (32, (1 << 31) - 1))[klass - 1]
                dod = _field(bits, pos, vbits) - bias
                pos += vbits
            else:
                dod = _u64_to_i64(_field(bits, pos, 64))
                pos += 64
        prev_delta = _wrap_i64(prev_delta + dod)
        acc = _wrap_i64(acc + prev_delta)
        out[i] = acc
    return out


def _field(bits: list, pos: int, width: int) -> int:
    """Right-aligned ``width``-bit field from the bit list (python ints)."""
    v = 0
    for b in bits[pos : pos + width]:
        v = (v << 1) | b
    return v


# ------------------------------------------------------------- Gorilla f64


def _containment_windows(
    lead: np.ndarray, trail: np.ndarray, nz: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Paper-exact (Pelkonen §4.1.2) reuse decisions: walk the committed
    window through the xor stream. Returns ``(reuse, wlead, wtrail)`` per
    position (only meaningful where ``nz``). Segment-wise scan: from each
    emit-new position, geometrically growing vectorized probes find the
    next xor NOT contained in the committed window; the whole contained
    run fills at once. Total work O(n); python iterations proportional
    to emitted windows plus probe chunks."""
    n = len(lead)
    reuse = np.zeros(n, dtype=bool)
    wlead = np.zeros(n, dtype=np.int64)
    wtrail = np.zeros(n, dtype=np.int64)
    nzidx = np.flatnonzero(nz)
    m = len(nzidx)
    i = 0
    # Probe the contained run in geometrically growing chunks (4, 8, 16,
    # ...) rather than scanning the whole remaining tail per emitted
    # window: incompressible data (a new window at nearly every xor)
    # would otherwise cost O(windows x n). Geometric growth keeps the
    # probe cost proportional to the run length actually found (small
    # first chunk bounds the churn case; doubling bounds long contained
    # runs to <= 2x overshoot), so total work is O(n) with a small
    # constant regardless of window churn.
    while i < m:
        p = nzidx[i]
        wl, wt = int(lead[p]), int(trail[p])  # emit new window at p
        wlead[p], wtrail[p] = wl, wt
        j = i + 1
        step = 4
        stop = None
        while j < m:
            hi = min(j + step, m)
            ck = nzidx[j:hi]
            viol = (lead[ck] < wl) | (trail[ck] < wt)
            hitpos = int(np.argmax(viol)) if viol.any() else -1
            if hitpos >= 0:
                stop = j + hitpos
                break
            j = hi
            step = min(step * 2, 65536)
        if stop is None:
            stop = m
        seg = nzidx[i + 1 : stop]
        reuse[seg] = True
        wlead[seg], wtrail[seg] = wl, wt
        i = max(stop, i + 1)
    return reuse, wlead, wtrail


def gorilla_encode(vals: np.ndarray, reuse: str = "equal") -> bytes:
    """XOR-encode a float64 array (NaNs round-trip bit-exactly).

    ``reuse``: ``"equal"`` (default — stateless exact-window reuse, fully
    vectorized) or ``"containment"`` (paper-exact stateful rule; see
    module docstring). Either stream decodes with :func:`gorilla_decode`.
    """
    if reuse not in ("equal", "containment"):
        raise ValueError(f"reuse must be 'equal' or 'containment', got {reuse!r}")
    v = np.ascontiguousarray(np.asarray(vals, dtype=np.float64)).view(_U64)
    n = len(v)
    if n == 0:
        return b""
    head_bits = np.array([64], dtype=np.int64)
    head_vals = v[:1].copy()
    if n == 1:
        return _pack_segments(head_bits, head_vals)
    x = v[1:] ^ v[:-1]
    lead = np.minimum(_clz64(x), 31)
    trail = _ctz64(x)
    nz = x != 0
    if reuse == "containment":
        same_window, wl, wt = _containment_windows(lead, trail, nz)
    else:
        # window of the last non-zero xor before each position (stateless
        # exact-equality reuse)
        idx = np.arange(len(x))
        last_nz = np.where(nz, idx, -1)
        np.maximum.accumulate(last_nz, out=last_nz)
        prev_nz = np.empty_like(last_nz)
        prev_nz[0] = -1
        prev_nz[1:] = last_nz[:-1]
        has_prev = prev_nz >= 0
        same_window = (
            has_prev
            & nz
            & (lead == np.where(has_prev, lead[np.maximum(prev_nz, 0)], -1))
            & (trail == np.where(has_prev, trail[np.maximum(prev_nz, 0)], -1))
        )
        wl, wt = lead, trail
    mlen = np.where(nz, 64 - wl - wt, 0)  # payload width under the window
    meaningful = np.where(nz, x >> wt.astype(_U64), _U64(0))

    hdr_bits = np.where(x == 0, 1, np.where(same_window, 2, 2 + 5 + 6)).astype(np.int64)
    new_win = nz & ~same_window
    hdr_val = np.zeros(len(x), dtype=_U64)
    hdr_val[same_window] = _U64(0b10)
    if new_win.any():
        hdr_val[new_win] = (
            (_U64(0b11) << _U64(11))
            | (wl[new_win].astype(_U64) << _U64(6))
            | (mlen[new_win].astype(_U64) - _ONE)
        )
    pay_bits = np.where(nz, mlen, 0).astype(np.int64)
    pay_val = meaningful

    nbits = np.empty(2 * len(x), dtype=np.int64)
    vv = np.empty(2 * len(x), dtype=_U64)
    nbits[0::2], nbits[1::2] = hdr_bits, pay_bits
    vv[0::2], vv[1::2] = hdr_val, pay_val
    return _pack_segments(
        np.concatenate([head_bits, nbits]), np.concatenate([head_vals, vv])
    )


def gorilla_decode(blob: bytes, n_points: int) -> np.ndarray:
    """Sequential parse — the SINGLE decoder for both encoder reuse
    rules (equal-window and containment streams share one wire format:
    the control bits say reuse/new-window, never WHICH rule chose them).
    Python-int cursor; see dod_decode on why that is the fast form
    here."""
    out = np.empty(n_points, dtype=_U64)
    if n_points == 0:
        return out.view(np.float64)
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8)).tolist()
    acc = _field(bits, 0, 64)
    out[0] = _U64(acc)
    pos = 64
    lead, mlen = 0, 0  # last non-zero window
    for i in range(1, n_points):
        if bits[pos] == 0:
            pos += 1
            out[i] = _U64(acc)
            continue
        if bits[pos + 1] == 0:  # reuse window
            pos += 2
        else:
            pos += 2
            lead = _field(bits, pos, 5)
            mlen = _field(bits, pos + 5, 6) + 1
            pos += 11
        meaningful = _field(bits, pos, mlen)
        pos += mlen
        trail = 64 - lead - mlen
        acc = acc ^ (meaningful << trail)
        out[i] = _U64(acc)
    return out.view(np.float64)


def block_crc(ts: np.ndarray, vals: np.ndarray) -> int:
    """CRC32 of the raw (ts, value) bytes — cheap end-to-end integrity check
    carried on every encoded block row."""
    return zlib.crc32(
        np.asarray(ts, dtype=np.int64).tobytes()
        + np.ascontiguousarray(np.asarray(vals, dtype=np.float64)).tobytes()
    )
