"""FSE (Finite State Entropy / tANS) encoder — RFC 8878 §4.1.

From-scratch implementation of the zstd-flavoured tANS coder: normalized
count serialization, the canonical symbol-spread, encoder state tables, and
backward interleaved bitstreams. Used for Huffman weight compression
(§4.2.1.2, two alternating states) and the sequences section (§3.1.1.3.2,
custom or predefined tables).

Validated end-to-end against the stock libzstd decoder in tests.
"""

from __future__ import annotations

import numpy as np


def highbit(v: int) -> int:
    return v.bit_length() - 1


# ---------------------------------------------------------------------------
# Count normalization (sum → 2^accuracy_log, zstd rules)
# ---------------------------------------------------------------------------


def normalize_counts(freqs: np.ndarray, accuracy_log: int,
                     total: int | None = None) -> np.ndarray:
    """Return normalized counts summing to 2^accuracy_log; rare symbols get
    -1 ("less than 1" probability). Mirrors FSE_normalizeCount semantics
    (not bit-exact — any valid normalization decodes identically)."""
    freqs = np.asarray(freqs, dtype=np.int64)
    total = int(freqs.sum()) if total is None else total
    table_size = 1 << accuracy_log
    assert total > 0
    norm = np.zeros_like(freqs)
    # scaled proportional shares
    scale = table_size / total
    norm = np.floor(freqs * scale).astype(np.int64)
    norm[(freqs > 0) & (norm == 0)] = -1  # low-prob symbols
    assigned = int(norm[norm > 0].sum()) + int((norm == -1).sum())
    rest = table_size - assigned
    if rest < 0:
        # shrink the largest entries
        while rest < 0:
            i = int(np.argmax(norm))
            take = min(-rest, norm[i] - 1)
            norm[i] -= take
            rest += take
    elif rest > 0:
        # give the remainder to the largest-frequency symbol(s)
        order = np.argsort(-freqs)
        for i in order:
            if norm[i] > 0:
                norm[i] += rest
                rest = 0
                break
    assert int(norm[norm > 0].sum()) + int((norm == -1).sum()) == table_size
    return norm


def write_norm_counts(norm: np.ndarray, accuracy_log: int) -> bytes:
    """FSE table description (RFC 8878 §4.1.1): 4-bit accuracy code then
    variable-bit probabilities with zero-repeat runs, little-endian packed."""
    bits_buf = 0
    bits_n = 0
    out = bytearray()

    def push(value: int, nbits: int):
        nonlocal bits_buf, bits_n
        bits_buf |= (value & ((1 << nbits) - 1)) << bits_n
        bits_n += nbits
        while bits_n >= 8:
            out.append(bits_buf & 0xFF)
            bits_buf >>= 8
            bits_n -= 8

    push(accuracy_log - 5, 4)
    table_size = 1 << accuracy_log
    remaining = table_size + 1  # spec: starts at 2^AL + 1
    s = 0
    norm = np.asarray(norm, dtype=np.int64)
    n_sym = int(np.nonzero(norm != 0)[0][-1]) + 1
    while s < n_sym and remaining > 1:
        # probability value: proba = norm[s]; stored value = proba + 1
        # (so -1 → 0, 0 → 1, ...) using a variable-size field.
        max_v = remaining + 1          # values representable: 0..max
        nbits = highbit(max_v) + 1     # full-size field
        threshold = (1 << nbits) - 1 - max_v
        v = int(norm[s]) + 1
        if v < threshold:
            push(v, nbits - 1)
        else:
            # large values use full nbits with high-range folding
            vv = v + threshold if v >= (1 << (nbits - 1)) - threshold else v
            if v >= (1 << (nbits - 1)) - threshold:
                push(v + threshold, nbits)
            else:
                push(v, nbits - 1)
        used = int(norm[s]) if norm[s] > 0 else 1
        remaining -= used if norm[s] != 0 else 0
        s += 1
        if norm[s - 1] == 0:
            # zero-probability run: 2-bit repeat counts
            run = 0
            while s + run < n_sym and norm[s + run] == 0:
                run += 1
            r = run
            while True:
                push(min(r, 3), 2)
                if r < 3:
                    break
                r -= 3
            s += run
    if bits_n:
        out.append(bits_buf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Encoder tables
# ---------------------------------------------------------------------------


def spread_symbols(norm: np.ndarray, accuracy_log: int) -> np.ndarray:
    """Canonical zstd symbol spread (§4.1.2): -1 symbols one cell each from
    the table end; others step-scattered skipping the reserved tail."""
    table_size = 1 << accuracy_log
    table = np.zeros(table_size, dtype=np.int32)
    high = table_size - 1
    for s in np.nonzero(norm == -1)[0]:
        table[high] = s
        high -= 1
    step = (table_size >> 1) + (table_size >> 3) + 3
    mask = table_size - 1
    pos = 0
    for s in np.nonzero(norm > 0)[0]:
        for _ in range(int(norm[s])):
            table[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    assert pos == 0
    return table


class CTable:
    """Encoder tables per symbol: deltaNbBits, deltaFindState + state map."""

    def __init__(self, norm: np.ndarray, accuracy_log: int):
        norm = np.asarray(norm, dtype=np.int64)
        self.accuracy_log = accuracy_log
        table_size = 1 << accuracy_log
        spread = spread_symbols(norm, accuracy_log)
        eff = np.where(norm == -1, 1, norm).astype(np.int64)
        cumul = np.concatenate([[0], np.cumsum(eff)])
        self.state_table = np.zeros(table_size, dtype=np.int64)
        fill = cumul[:-1].copy()
        for u in range(table_size):
            s = spread[u]
            self.state_table[fill[s]] = table_size + u
            fill[s] += 1
        nsym = norm.shape[0]
        self.delta_nb_bits = np.zeros(nsym, dtype=np.int64)
        self.delta_find_state = np.zeros(nsym, dtype=np.int64)
        for s in range(nsym):
            c = int(eff[s])
            if c == 0:
                continue
            if int(norm[s]) == -1 or c == 1:
                self.delta_nb_bits[s] = ((accuracy_log + 1) << 16) - \
                    (1 << accuracy_log)
                self.delta_find_state[s] = int(cumul[s]) - 1
            else:
                max_bits_out = accuracy_log - highbit(c - 1)
                min_state_plus = c << max_bits_out
                self.delta_nb_bits[s] = (max_bits_out << 16) - min_state_plus
                self.delta_find_state[s] = int(cumul[s]) - c


class BitWriter:
    """LSB-first forward bit accumulation (stream is read backwards)."""

    def __init__(self):
        self.bits = []

    def add(self, value: int, nbits: int):
        if nbits:
            self.bits.append((value & ((1 << nbits) - 1), nbits))

    def close(self) -> bytes:
        buf = 0
        pos = 0
        for v, n in self.bits:
            buf |= v << pos
            pos += n
        buf |= 1 << pos  # sentinel
        pos += 1
        nbytes = (pos + 7) // 8
        return buf.to_bytes(nbytes, "little")


class EncState:
    def __init__(self, ct: CTable):
        self.ct = ct
        self.state = 0
        self.started = False

    def init(self, symbol: int):
        ct = self.ct
        nbits = (int(ct.delta_nb_bits[symbol]) + (1 << 15)) >> 16
        sub = (nbits << 16) - int(ct.delta_nb_bits[symbol])
        self.state = int(ct.state_table[
            (sub >> nbits) + int(ct.delta_find_state[symbol])])
        self.started = True

    def encode(self, symbol: int, bw: BitWriter):
        if not self.started:
            self.init(symbol)
            return
        ct = self.ct
        nbits = (self.state + int(ct.delta_nb_bits[symbol])) >> 16
        bw.add(self.state, nbits)
        self.state = int(ct.state_table[
            (self.state >> nbits) + int(ct.delta_find_state[symbol])])

    def flush(self, bw: BitWriter):
        bw.add(self.state, self.ct.accuracy_log)


# ---------------------------------------------------------------------------
# Huffman weight compression (§4.2.1.2: two interleaved states)
# ---------------------------------------------------------------------------


def compress_weights(weights: np.ndarray) -> bytes | None:
    """FSE-compress a Huffman weight sequence. Returns the payload (table
    description + bitstream) or None when not profitable/possible."""
    w = np.asarray(weights, dtype=np.int64)
    if w.size < 2:
        return None
    freqs = np.bincount(w, minlength=int(w.max()) + 1)
    if int((freqs > 0).sum()) < 2:
        return None
    max_al = 6
    al = min(max_al, max(5, highbit(int(w.size)) ))
    al = max(al, highbit(int((freqs > 0).sum()) - 1) + 1)
    al = min(al, max_al)
    norm = normalize_counts(freqs, al)
    desc = write_norm_counts(norm, al)
    ct = CTable(norm, al)

    # Two alternating states; encoder processes weights in reverse so the
    # decoder (reading backward-stream forward) regenerates natural order.
    bw = BitWriter()
    even = EncState(ct)
    odd = EncState(ct)
    rev = w[::-1]
    # Decoder alternates starting with state1 on the first weight; encoder
    # must mirror: assign states so that reversal lines up.
    states = [even, odd]
    for i, sym in enumerate(rev):
        states[i & 1].encode(int(sym), bw)
    # Init states were consumed by first encode; flush both final states,
    # order chosen so the decoder reads state1 first.
    states[(w.size - 1) & 1].flush(bw)
    states[(w.size) & 1].flush(bw)
    payload = desc + bw.close()
    if len(payload) >= 128 or len(payload) >= w.size:
        return None
    return payload
