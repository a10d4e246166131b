// From-scratch zstd frame encoder — complete native port of the Python
// reference implementation (vbz_compression_tpu/ops/{zstd_seq,zstd_huff,
// fse}.py). One exported function, vbz_own_zstd_frame, produces frames
// BYTE-IDENTICAL to zstd_seq.compress_frame(data, matcher="host"): the
// Python path stays in-tree as the oracle and tests/test_zstd_seq.py
// asserts the identity. The reference links libzstd instead of
// implementing entropy coding (reference vbz/vbz.cpp:194-273); this file
// is the "own encoder at usable speed" counterpart (VERDICT r4 #3).
//
// Parity-sensitive spots (kept deliberately identical to the Python):
//  - normalize_counts: floor(freq * (ts/total)) in IEEE double, remainder
//    to the max-frequency symbol with (-freq, index) STABLE tie-break.
//  - the sequences-channel cost model: sequential double sums of
//    f*log2(p/tot) — the Python side loops with math.log2 (libm) in the
//    same order, so decisions match bit for bit.
//  - Huffman lengths come from vbz_huff_build_codes (vbz_native.cpp),
//    the package-merge with Python tuple ordering.

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" int32_t vbz_huff_build_codes(const int64_t* freqs,
                                        int32_t max_code_bits,
                                        uint8_t* nbits_out,
                                        uint16_t* code_out);

namespace {

using Bytes = std::vector<uint8_t>;

constexpr int64_t kBlockMax = 128 * 1024;           // zstd_huff.BLOCK_MAX
constexpr int kMaxCodeBits = 11;                    // literals Huffman limit

// ---------------------------------------------------------------------------
// Sequences code tables (RFC 8878 §3.1.1.3.2.1.1) — zstd_seq.py constants
// ---------------------------------------------------------------------------

constexpr int kLLSize = 36;
constexpr int64_t LL_BITS[kLLSize] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16};
constexpr int kMLSize = 53;
constexpr int64_t ML_BITS[kMLSize] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16};
constexpr int64_t LL_PREDEF[kLLSize] = {
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1};
constexpr int kLLPredefLog = 6;
constexpr int64_t ML_PREDEF[kMLSize] = {
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    -1, -1, -1, -1, -1, -1, -1};
constexpr int kMLPredefLog = 6;
constexpr int kOFSize = 29;
constexpr int64_t OF_PREDEF[kOFSize] = {
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    -1, -1, -1, -1, -1};
constexpr int kOFPredefLog = 5;
constexpr int kMaxLogLL = 9, kMaxLogOF = 8, kMaxLogML = 9;

int bit_length(int64_t v) {
    int b = 0;
    while (v > 0) { ++b; v >>= 1; }
    return b;
}

// ---------------------------------------------------------------------------
// Bit IO (identical byte semantics to fse.BitWriter / zstd BitPush)
// ---------------------------------------------------------------------------

// Word-flushing bit accumulator. Caller supplies a byte capacity (final
// size + >= 8 slack for the 4-byte word stores); byte output is identical
// to the Python BitWriter / BitPush (LSB-first, little-endian).
struct BitVec {
    Bytes out;
    size_t n = 0;
    uint64_t acc = 0;
    int used = 0;  // < 32 between pushes; nbits <= 31 at every call site
    explicit BitVec(size_t cap_bytes) { out.resize(cap_bytes + 8); }
    inline void push(uint64_t value, int nbits) {
        if (!nbits) return;
        acc |= (value & ((1ull << nbits) - 1)) << used;
        used += nbits;
        if (used >= 32) {
            uint32_t w = static_cast<uint32_t>(acc);
            std::memcpy(out.data() + n, &w, 4);
            n += 4;
            acc >>= 32;
            used -= 32;
        }
    }
    void drain() {
        while (used >= 8) {
            out[n++] = static_cast<uint8_t>(acc);
            acc >>= 8;
            used -= 8;
        }
        if (used) {
            out[n++] = static_cast<uint8_t>(acc);
            acc = 0;
            used = 0;
        }
    }
    // Backward-read streams (Huffman/FSE): close with a 1 sentinel.
    Bytes close_sentinel() {
        push(1, 1);
        drain();
        out.resize(n);
        return std::move(out);
    }
    // Table descriptions: flush the partial byte, no sentinel.
    Bytes close_flush() {
        drain();
        out.resize(n);
        return std::move(out);
    }
};

void append(Bytes& dst, const Bytes& src) {
    dst.insert(dst.end(), src.begin(), src.end());
}

void append_le(Bytes& dst, uint64_t v, int nbytes) {
    for (int i = 0; i < nbytes; ++i)
        dst.push_back(static_cast<uint8_t>(v >> (8 * i)));
}

// ---------------------------------------------------------------------------
// FSE machinery (fse.py ports)
// ---------------------------------------------------------------------------

// fse.normalize_counts: counts -> 2^al with -1 low-prob symbols.
bool normalize_counts(const std::vector<int64_t>& freqs, int al,
                      std::vector<int64_t>& norm) {
    int64_t total = 0;
    for (int64_t f : freqs) total += f;
    if (total <= 0) return false;
    const int64_t table_size = int64_t(1) << al;
    const size_t n = freqs.size();
    norm.assign(n, 0);
    const double scale = double(table_size) / double(total);
    for (size_t i = 0; i < n; ++i)
        norm[i] = static_cast<int64_t>(
            std::floor(double(freqs[i]) * scale));
    for (size_t i = 0; i < n; ++i)
        if (freqs[i] > 0 && norm[i] == 0) norm[i] = -1;
    int64_t assigned = 0;
    for (size_t i = 0; i < n; ++i)
        assigned += norm[i] > 0 ? norm[i] : (norm[i] == -1 ? 1 : 0);
    int64_t rest = table_size - assigned;
    if (rest < 0) {
        while (rest < 0) {
            size_t imax = 0;  // np.argmax: first index of the max
            for (size_t i = 1; i < n; ++i)
                if (norm[i] > norm[imax]) imax = i;
            int64_t take = std::min(-rest, norm[imax] - 1);
            norm[imax] -= take;
            rest += take;
        }
    } else if (rest > 0) {
        // argsort(-freqs, stable): max frequency, ties -> smallest index;
        // first entry with norm > 0 receives the remainder.
        std::ptrdiff_t best = -1;
        for (size_t i = 0; i < n; ++i)
            if (norm[i] > 0 &&
                (best < 0 || freqs[i] > freqs[best]))
                best = static_cast<std::ptrdiff_t>(i);
        if (best < 0) return false;
        norm[best] += rest;
    }
    int64_t check = 0;
    for (size_t i = 0; i < n; ++i)
        check += norm[i] > 0 ? norm[i] : (norm[i] == -1 ? 1 : 0);
    return check == table_size;
}

// fse.write_norm_counts: FSE table description bits.
Bytes write_norm_counts(const std::vector<int64_t>& norm, int al) {
    BitVec bw(norm.size() * 4 + 16);
    bw.push(al - 5, 4);
    int n_sym = 0;
    for (size_t i = 0; i < norm.size(); ++i)
        if (norm[i] != 0) n_sym = static_cast<int>(i) + 1;
    int64_t remaining = (int64_t(1) << al) + 1;
    int64_t threshold = int64_t(1) << al;
    int nb_bits = al + 1;
    int s_i = 0;
    while (remaining > 1 && s_i < n_sym) {
        int64_t proba = norm[s_i];
        int64_t value = proba + 1;
        int64_t vmax = 2 * threshold - 1 - remaining;
        if (value < vmax)
            bw.push(value, nb_bits - 1);
        else if (value < threshold)
            bw.push(value, nb_bits);
        else
            bw.push(value + vmax, nb_bits);
        remaining -= proba < 0 ? -proba : proba;
        while (remaining < threshold) {
            threshold >>= 1;
            --nb_bits;
        }
        ++s_i;
        if (proba == 0) {
            int run = 0;
            while (s_i + run < n_sym && norm[s_i + run] == 0) ++run;
            int r = run;
            for (;;) {
                bw.push(std::min(r, 3), 2);
                if (r < 3) break;
                r -= 3;
            }
            s_i += run;
        }
    }
    return bw.close_flush();
}

// fse.spread_symbols.
void spread_symbols(const std::vector<int64_t>& norm, int al,
                    std::vector<int32_t>& table) {
    const int64_t ts = int64_t(1) << al;
    table.assign(ts, 0);
    int64_t high = ts - 1;
    for (size_t s = 0; s < norm.size(); ++s)
        if (norm[s] == -1) table[high--] = static_cast<int32_t>(s);
    const int64_t step = (ts >> 1) + (ts >> 3) + 3;
    const int64_t mask = ts - 1;
    int64_t pos = 0;
    for (size_t s = 0; s < norm.size(); ++s) {
        if (norm[s] <= 0) continue;
        for (int64_t k = 0; k < norm[s]; ++k) {
            table[pos] = static_cast<int32_t>(s);
            pos = (pos + step) & mask;
            while (pos > high) pos = (pos + step) & mask;
        }
    }
}

// fse.CTable.
struct CTable {
    std::vector<int64_t> state_table, delta_nb_bits, delta_find_state;
    int al = 0;
    void build(const std::vector<int64_t>& norm, int accuracy_log) {
        al = accuracy_log;
        const int64_t ts = int64_t(1) << al;
        std::vector<int32_t> spread;
        spread_symbols(norm, al, spread);
        const size_t nsym = norm.size();
        std::vector<int64_t> eff(nsym), cumul(nsym + 1, 0);
        for (size_t s = 0; s < nsym; ++s)
            eff[s] = norm[s] == -1 ? 1 : std::max<int64_t>(norm[s], 0);
        for (size_t s = 0; s < nsym; ++s) cumul[s + 1] = cumul[s] + eff[s];
        // state_table[i] = ts + order[i], order = stable argsort of spread
        // by symbol (counting sort).
        state_table.assign(ts, 0);
        {
            std::vector<int64_t> next(cumul.begin(), cumul.end() - 1);
            for (int64_t i = 0; i < ts; ++i) {
                int32_t sym = spread[i];
                state_table[next[sym]++] = ts + i;
            }
        }
        delta_nb_bits.assign(nsym, 0);
        delta_find_state.assign(nsym, 0);
        for (size_t s = 0; s < nsym; ++s) {
            const int64_t c = eff[s];
            const bool present = c > 0;
            if (!present) continue;
            const bool single = norm[s] == -1 || c == 1;
            if (single) {
                delta_nb_bits[s] = (int64_t(al) << 16) - (int64_t(1) << al);
                delta_find_state[s] = cumul[s] - 1;
            } else {
                const int64_t hb = bit_length(c - 1) - 1;
                const int64_t mbo = al - hb;
                delta_nb_bits[s] = (mbo << 16) - (c << mbo);
                delta_find_state[s] = cumul[s] - c;
            }
        }
    }
};

// fse.EncState (always init()ed before encode in our call sites).
struct EncState {
    const CTable* ct = nullptr;
    int64_t state = 0;
    void init(int64_t sym) {
        int64_t dnb = ct->delta_nb_bits[sym];
        int64_t nbits = (dnb + (int64_t(1) << 15)) >> 16;
        int64_t sub = (nbits << 16) - dnb;
        state = ct->state_table[(sub >> nbits) + ct->delta_find_state[sym]];
    }
    void encode(int64_t sym, BitVec& bw) {
        int64_t nbits = (state + ct->delta_nb_bits[sym]) >> 16;
        bw.push(static_cast<uint64_t>(state), static_cast<int>(nbits));
        state = ct->state_table[(state >> nbits)
                                + ct->delta_find_state[sym]];
    }
    void flush(BitVec& bw) {
        bw.push(static_cast<uint64_t>(state), ct->al);
    }
};

// --- weight-payload self-verify (fse.decompress_weights port) --------------

struct BitReaderLSB {
    const uint8_t* data;
    int64_t size;
    int64_t pos = 0;  // bit position
    int64_t read(int n) {
        int64_t v = 0;
        for (int i = 0; i < n; ++i) {
            int64_t p = pos + i;
            if ((p >> 3) >= size) return -1;  // overrun: corrupt
            v |= int64_t((data[p >> 3] >> (p & 7)) & 1) << i;
        }
        pos += n;
        return v;
    }
};

bool read_norm_counts(const uint8_t* data, int64_t size,
                      std::vector<int64_t>& norm, int& al,
                      int64_t& consumed) {
    BitReaderLSB br{data, size};
    int64_t alr = br.read(4);
    if (alr < 0) return false;
    al = static_cast<int>(alr) + 5;
    int64_t remaining = (int64_t(1) << al) + 1;
    int64_t threshold = int64_t(1) << al;
    int nb_bits = al + 1;
    norm.clear();
    while (remaining > 1) {
        int64_t vmax = 2 * threshold - 1 - remaining;
        int64_t low = br.read(nb_bits - 1);
        if (low < 0) return false;
        int64_t value;
        if (low < vmax) {
            value = low;
        } else {
            int64_t msb = br.read(1);
            if (msb < 0) return false;
            int64_t full = low | (msb << (nb_bits - 1));
            value = full < threshold ? full : full - vmax;
        }
        int64_t proba = value - 1;
        norm.push_back(proba);
        remaining -= proba < 0 ? -proba : proba;
        while (remaining < threshold && threshold > 1) {
            threshold >>= 1;
            --nb_bits;
        }
        if (proba == 0) {
            for (;;) {
                int64_t rep = br.read(2);
                if (rep < 0) return false;
                for (int64_t k = 0; k < rep; ++k) norm.push_back(0);
                if (rep < 3) break;
            }
        }
        if (norm.size() > 4096) return false;  // runaway guard
    }
    consumed = (br.pos + 7) >> 3;
    return true;
}

struct BitReaderBack {
    const uint8_t* data;
    int64_t pos;  // next unread bit (exclusive top)
    BitReaderBack(const uint8_t* d, int64_t nbytes) : data(d) {
        int64_t total = nbytes * 8;
        uint8_t last = nbytes ? d[nbytes - 1] : 0;
        int bl = 0;
        for (uint8_t v = last; v; v >>= 1) ++bl;
        pos = last ? total - (8 - bl) - 1 : -1;
    }
    int64_t read(int n) {
        pos -= n;
        int64_t v = 0;
        for (int i = 0; i < n; ++i) {
            int64_t p = pos + i;
            if (p < 0) continue;
            v |= int64_t((data[p >> 3] >> (p & 7)) & 1) << i;
        }
        return v;
    }
};

bool decompress_weights_verify(const Bytes& payload,
                               const std::vector<int64_t>& expect) {
    std::vector<int64_t> norm;
    int al = 0;
    int64_t consumed = 0;
    if (!read_norm_counts(payload.data(),
                          static_cast<int64_t>(payload.size()), norm, al,
                          consumed))
        return false;
    if (consumed >= static_cast<int64_t>(payload.size())) return false;
    const int64_t ts = int64_t(1) << al;
    std::vector<int32_t> spread;
    spread_symbols(norm, al, spread);
    std::vector<int64_t> counter(norm.size());
    for (size_t s = 0; s < norm.size(); ++s)
        counter[s] = norm[s] == -1 ? 1 : std::max<int64_t>(norm[s], 0);
    std::vector<int> nbits(ts);
    std::vector<int64_t> baseline(ts);
    for (int64_t i = 0; i < ts; ++i) {
        int32_t sym = spread[i];
        int64_t x = counter[sym]++;
        int nb = al - (bit_length(x) - 1);
        nbits[i] = nb;
        baseline[i] = (x << nb) - ts;
    }
    BitReaderBack br(payload.data() + consumed,
                     static_cast<int64_t>(payload.size()) - consumed);
    if (br.pos < 0) return false;
    int64_t s1 = br.read(al);
    int64_t s2 = br.read(al);
    std::vector<int64_t> out;
    for (;;) {
        if (s1 < 0 || s1 >= ts || s2 < 0 || s2 >= ts) return false;
        out.push_back(spread[s1]);
        s1 = baseline[s1] + br.read(nbits[s1]);
        if (br.pos < 0) {
            out.push_back(spread[s2]);
            break;
        }
        out.push_back(spread[s2]);
        s2 = baseline[s2] + br.read(nbits[s2]);
        if (br.pos < 0) {
            if (s1 < 0 || s1 >= ts) return false;
            out.push_back(spread[s1]);
            break;
        }
        if (out.size() > expect.size() + 2) return false;
    }
    return out == expect;
}

// fse.compress_weights: two-interleaved-state FSE coding of the Huffman
// weight run; false => "None" (not profitable / not safely decodable).
bool compress_weights(const std::vector<int64_t>& w, Bytes& payload) {
    const int64_t n = static_cast<int64_t>(w.size());
    if (n < 2) return false;
    int64_t wmax = 0;
    for (int64_t v : w) wmax = std::max(wmax, v);
    std::vector<int64_t> freqs(wmax + 1, 0);
    for (int64_t v : w) ++freqs[v];
    int distinct = 0;
    for (int64_t f : freqs)
        if (f > 0) ++distinct;
    if (distinct < 2) return false;
    const int al = std::min(6, std::max(5, bit_length(n) - 2));
    std::vector<int64_t> norm;
    if (!normalize_counts(freqs, al, norm)) return false;
    Bytes desc = write_norm_counts(norm, al);
    CTable ct;
    ct.build(norm, al);
    BitVec bw(static_cast<size_t>(n) * 2 + 16);
    EncState c1{&ct}, c2{&ct};
    int64_t ip;
    if (n & 1) {
        c1.init(w[n - 1]);
        c2.init(w[n - 2]);
        ip = n - 3;
        if (ip >= 0) {
            c1.encode(w[ip], bw);
            --ip;
        }
    } else {
        c2.init(w[n - 1]);
        c1.init(w[n - 2]);
        ip = n - 3;
    }
    while (ip >= 0) {
        c2.encode(w[ip], bw);
        --ip;
        if (ip >= 0) {
            c1.encode(w[ip], bw);
            --ip;
        }
    }
    c2.flush(bw);
    c1.flush(bw);
    payload = std::move(desc);
    append(payload, bw.close_sentinel());
    if (static_cast<int64_t>(payload.size()) >= 128 ||
        static_cast<int64_t>(payload.size()) >= n)
        return false;
    return decompress_weights_verify(payload, w);
}

// ---------------------------------------------------------------------------
// Huffman literals section (zstd_huff.py ports)
// ---------------------------------------------------------------------------

// zstd_huff._literals_header; false on invariant breach.
bool literals_header(int64_t regenerated, int64_t compressed,
                     bool four_streams, Bytes& out) {
    if (!four_streams) {
        if (!(regenerated < (1 << 10) && compressed < (1 << 10)))
            return false;
        uint64_t bits = 0b10 | (0b00 << 2) |
                        (uint64_t(regenerated) << 4) |
                        (uint64_t(compressed) << 14);
        append_le(out, bits, 3);
        return true;
    }
    if (regenerated < (1 << 10) && compressed < (1 << 10)) {
        uint64_t bits = 0b10 | (0b01 << 2) |
                        (uint64_t(regenerated) << 4) |
                        (uint64_t(compressed) << 14);
        append_le(out, bits, 3);
        return true;
    }
    if (regenerated < (1 << 14) && compressed < (1 << 14)) {
        uint64_t bits = 0b10 | (0b10 << 2) |
                        (uint64_t(regenerated) << 4) |
                        (uint64_t(compressed) << 18);
        append_le(out, bits, 4);
        return true;
    }
    if (!(regenerated < (1 << 18) && compressed < (1 << 18))) return false;
    uint64_t bits = 0b10 | (0b11 << 2) | (uint64_t(regenerated) << 4) |
                    (uint64_t(compressed) << 22);
    append_le(out, bits, 5);
    return true;
}

// Huffman codes packed in REVERSE input order, sentinel-closed. Two
// symbols merge into one push (lengths <= 11 each, sum <= 22 < 32) —
// halves the accumulator traffic on the hottest loop in the encoder.
Bytes pack_bits_backward(const uint8_t* sym, int64_t n,
                         const uint16_t* code, const uint8_t* nbits) {
    BitVec bw(static_cast<size_t>(n) * 2 + 16);
    int64_t i = n - 1;
    for (; i >= 1; i -= 2) {
        const int nb1 = nbits[sym[i]], nb0 = nbits[sym[i - 1]];
        const uint64_t v =
            uint64_t(code[sym[i]]) | (uint64_t(code[sym[i - 1]]) << nb1);
        bw.push(v, nb1 + nb0);
    }
    if (i == 0) bw.push(code[sym[0]], nbits[sym[0]]);
    return bw.close_sentinel();
}

// zstd_huff.compressed_literals_section; false => "None".
bool compressed_literals_section(const uint8_t* chunk, int64_t n,
                                 Bytes& out) {
    int64_t freqs[256] = {0};
    for (int64_t i = 0; i < n; ++i) ++freqs[chunk[i]];
    int nz = 0;
    for (int s = 0; s < 256; ++s)
        if (freqs[s] > 0) ++nz;
    if (nz <= 1) return false;
    uint8_t nbits[256];
    uint16_t code[256];
    const int32_t max_bits =
        vbz_huff_build_codes(freqs, kMaxCodeBits, nbits, code);
    int64_t weights[256];
    for (int s = 0; s < 256; ++s)
        weights[s] = nbits[s] > 0 ? max_bits + 1 - nbits[s] : 0;
    // _check_implied_weight.
    int last = -1;
    for (int s = 0; s < 256; ++s)
        if (weights[s] > 0) last = s;
    if (last < 0) return false;
    {
        int64_t total = 0;
        for (int s = 0; s < last; ++s)
            if (weights[s] > 0) total += (int64_t(1) << weights[s]) / 2;
        int64_t target = int64_t(1) << max_bits;
        int64_t rest = target - total;
        if (!(rest > 0 && (rest & (rest - 1)) == 0 &&
              rest == (int64_t(1) << (weights[last] - 1))))
            return false;
    }
    // Weight table: FSE payload vs direct 4-bit weights; smaller wins
    // (strictly smaller for direct — the Python `<`).
    Bytes table;
    bool have_table = false;
    {
        std::vector<int64_t> w(weights, weights + last);
        Bytes payload;
        if (compress_weights(w, payload)) {
            table.clear();
            table.push_back(static_cast<uint8_t>(payload.size()));
            append(table, payload);
            have_table = true;
        }
    }
    if (last <= 127) {
        Bytes direct;
        direct.push_back(static_cast<uint8_t>(127 + last));
        for (int i = 0; i < last; i += 2) {
            int hi = static_cast<int>(weights[i]);
            int lo = i + 1 < last ? static_cast<int>(weights[i + 1]) : 0;
            direct.push_back(static_cast<uint8_t>((hi << 4) | lo));
        }
        if (!have_table || direct.size() < table.size()) {
            table = std::move(direct);
            have_table = true;
        }
    }
    if (!have_table) return false;

    const int64_t tlen = static_cast<int64_t>(table.size());
    if (n < 6 || (n < (1 << 10) && tlen + n < (1 << 10))) {
        Bytes stream = pack_bits_backward(chunk, n, code, nbits);
        int64_t lit_compressed = tlen + static_cast<int64_t>(stream.size());
        if (lit_compressed >= n) return false;
        Bytes header;
        if (!literals_header(n, lit_compressed, false, header)) return false;
        out = std::move(header);
        append(out, table);
        append(out, stream);
        return true;
    }
    // 4 streams (RFC 8878 §3.1.1.3.1.6): equal ceil(n/4) parts, shared
    // table, 6-byte jump table.
    const int64_t part = (n + 3) / 4;
    const int64_t p3 = n - 3 * part;
    if (p3 <= 0) return false;  // degenerate split
    Bytes streams[4];
    for (int k = 0; k < 4; ++k) {
        int64_t lo = k * part;
        int64_t len = k < 3 ? part : p3;
        streams[k] = pack_bits_backward(chunk + lo, len, code, nbits);
        if (k < 3 && streams[k].size() >= (1u << 16)) return false;
    }
    int64_t lit_compressed = tlen + 6;
    for (int k = 0; k < 4; ++k)
        lit_compressed += static_cast<int64_t>(streams[k].size());
    if (lit_compressed >= n || lit_compressed >= (1 << 18)) return false;
    Bytes header;
    if (!literals_header(n, lit_compressed, true, header)) return false;
    out = std::move(header);
    append(out, table);
    for (int k = 0; k < 3; ++k) append_le(out, streams[k].size(), 2);
    for (int k = 0; k < 4; ++k) append(out, streams[k]);
    return true;
}

// zstd_huff.raw_literals_section.
bool raw_literals_section(const uint8_t* chunk, int64_t n, Bytes& out) {
    if (n < 32) {
        out.push_back(static_cast<uint8_t>(0 | (n << 3)));
    } else if (n < (1 << 12)) {
        append_le(out, 0 | (0b01 << 2) | (uint64_t(n) << 4), 2);
    } else {
        if (n >= (1 << 20)) return false;
        append_le(out, 0 | (0b11 << 2) | (uint64_t(n) << 4), 3);
    }
    out.insert(out.end(), chunk, chunk + n);
    return true;
}

// zstd_huff.literals_section: best of {RLE, compressed, raw}.
bool literals_section(const uint8_t* chunk, int64_t n, Bytes& out) {
    if (n == 0) {
        out.push_back(0);
        return true;
    }
    bool constant = true;
    for (int64_t i = 1; i < n; ++i)
        if (chunk[i] != chunk[0]) { constant = false; break; }
    if (constant) {
        if (n < 32) {
            out.push_back(static_cast<uint8_t>(1 | (n << 3)));
        } else if (n < (1 << 12)) {
            append_le(out, 1 | (0b01 << 2) | (uint64_t(n) << 4), 2);
        } else {
            append_le(out, 1 | (0b11 << 2) | (uint64_t(n) << 4), 3);
        }
        out.push_back(chunk[0]);
        return true;
    }
    Bytes comp;
    bool have = compressed_literals_section(chunk, n, comp);
    Bytes raw;
    if (!raw_literals_section(chunk, n, raw)) return false;
    out = (have && comp.size() < raw.size()) ? std::move(comp)
                                             : std::move(raw);
    return true;
}

// ---------------------------------------------------------------------------
// Sequences section (zstd_seq.py ports)
// ---------------------------------------------------------------------------

// zstd_seq._nb_seq_header.
void nb_seq_header(int64_t n, Bytes& out) {
    if (n < 128) {
        out.push_back(static_cast<uint8_t>(n));
    } else if (n < 0x7F00) {
        out.push_back(static_cast<uint8_t>((n >> 8) + 0x80));
        out.push_back(static_cast<uint8_t>(n & 0xFF));
    } else {
        out.push_back(0xFF);
        append_le(out, n - 0x7F00, 2);
    }
}

// Sequential f*log2(p/tot) cross-entropy — IDENTICAL loop order and libm
// calls to the Python side (zstd_seq._channel_table.cross_entropy_bits).
double cross_entropy_bits(const std::vector<int64_t>& freqs,
                          const int64_t* dist, int64_t dsize) {
    std::vector<double> p(dsize);
    for (int64_t i = 0; i < dsize; ++i)
        p[i] = dist[i] < 0 ? 0.5 : double(dist[i]);
    double tot = 0.0;
    for (int64_t i = 0; i < dsize; ++i) tot += p[i];
    double bits = 0.0;
    const int64_t m = std::min<int64_t>(freqs.size(), dsize);
    for (int64_t i = 0; i < m; ++i)
        if (freqs[i] > 0) bits -= double(freqs[i]) * std::log2(p[i] / tot);
    return bits;
}

struct Channel {
    int mode = 0;        // RFC field value: 0=Predefined, 1=RLE, 2=FSE
    Bytes desc;
    CTable own;
    const CTable* ct = nullptr;  // null for RLE (channel absent in stream)
    bool has_ct = false;
};

// Predefined CTables built once (magic statics; channel_table was
// rebuilding them per block — 15% of encode time in gprof).
const CTable& predef_ctable(const int64_t* predef, int64_t size, int log) {
    auto build = [](const int64_t* p, int64_t s, int lg) {
        CTable t;
        std::vector<int64_t> pn(p, p + s);
        t.build(pn, lg);
        return t;
    };
    if (predef == LL_PREDEF) {
        static const CTable t = build(LL_PREDEF, kLLSize, kLLPredefLog);
        return t;
    }
    if (predef == ML_PREDEF) {
        static const CTable t = build(ML_PREDEF, kMLSize, kMLPredefLog);
        return t;
    }
    static const CTable t = build(OF_PREDEF, kOFSize, kOFPredefLog);
    (void)size;
    (void)log;
    return t;
}

// zstd_seq._channel_table.
bool channel_table(const std::vector<int64_t>& codes, const int64_t* predef,
                   int64_t predef_size, int predef_log, int max_log,
                   Channel& ch) {
    const int64_t n = static_cast<int64_t>(codes.size());
    bool all_eq = true;
    for (int64_t i = 1; i < n; ++i)
        if (codes[i] != codes[0]) { all_eq = false; break; }
    if (all_eq) {
        ch.mode = 1;
        ch.desc.assign(1, static_cast<uint8_t>(codes[0]));
        ch.ct = nullptr;
        ch.has_ct = false;
        return true;
    }
    int64_t cmax = 0;
    for (int64_t c : codes) cmax = std::max(cmax, c);
    std::vector<int64_t> freqs(std::max(predef_size, cmax + 1), 0);
    for (int64_t c : codes) ++freqs[c];
    const int al = std::min(max_log, std::max(5, bit_length(n)));
    std::vector<int64_t> norm;
    if (!normalize_counts(freqs, al, norm)) return false;
    Bytes desc = write_norm_counts(norm, al);
    const double own_bits =
        cross_entropy_bits(freqs, norm.data(),
                           static_cast<int64_t>(norm.size())) +
        8.0 * double(desc.size());
    bool use_own = static_cast<int64_t>(freqs.size()) > predef_size;
    if (!use_own) {
        const double pre_bits =
            cross_entropy_bits(freqs, predef, predef_size);
        use_own = own_bits + 4 < pre_bits;
    }
    if (use_own) {
        ch.mode = 2;
        ch.desc = std::move(desc);
        ch.own.build(norm, al);
        ch.ct = &ch.own;
        ch.has_ct = true;
        return true;
    }
    ch.mode = 0;
    ch.desc.clear();
    ch.ct = &predef_ctable(predef, predef_size, predef_log);
    ch.has_ct = true;
    return true;
}

int64_t code_of(int64_t value, const int64_t* base, int size) {
    // searchsorted(base, value, 'right') - 1 over a nondecreasing base.
    int lo = 0, hi = size;
    while (lo < hi) {
        int mid = (lo + hi) / 2;
        if (base[mid] <= value)
            lo = mid + 1;
        else
            hi = mid;
    }
    return lo - 1;
}

// zstd_seq.encode_sequences: full Sequences_Section.
bool encode_sequences(const std::vector<int64_t>& ll,
                      const std::vector<int64_t>& of,
                      const std::vector<int64_t>& ml, Bytes& out) {
    const int64_t n = static_cast<int64_t>(ll.size());
    if (n == 0) {
        out.push_back(0);
        return true;
    }
    // C++11 magic statics: thread-safe one-time init (the pipeline API
    // calls the zstd stage from a thread pool).
    struct Bases {
        int64_t ll[kLLSize], ml[kMLSize];
        Bases() {
            int64_t acc = 0;
            for (int i = 0; i < kLLSize; ++i) {
                ll[i] = acc;
                acc += int64_t(1) << LL_BITS[i];
            }
            acc = 0;
            for (int i = 0; i < kMLSize; ++i) {
                ml[i] = acc + 3;
                acc += int64_t(1) << ML_BITS[i];
            }
        }
    };
    static const Bases bases;
    const int64_t* LL_BASE = bases.ll;
    const int64_t* ML_BASE = bases.ml;
    std::vector<int64_t> llc(n), mlc(n), ofc(n);
    std::vector<int64_t> ll_extra(n), ll_bits(n), ml_extra(n), ml_bits(n),
        of_extra(n), of_bits(n);
    for (int64_t i = 0; i < n; ++i) {
        if (ml[i] < 3 || of[i] < 1) return false;
        llc[i] = code_of(ll[i], LL_BASE, kLLSize);
        mlc[i] = code_of(ml[i], ML_BASE, kMLSize);
        const int64_t ofv = of[i] + 3;
        ofc[i] = bit_length(ofv) - 1;
        ll_extra[i] = ll[i] - LL_BASE[llc[i]];
        ll_bits[i] = LL_BITS[llc[i]];
        ml_extra[i] = ml[i] - ML_BASE[mlc[i]];
        ml_bits[i] = ML_BITS[mlc[i]];
        of_extra[i] = ofv - (int64_t(1) << ofc[i]);
        of_bits[i] = ofc[i];
    }
    Channel cll, cof, cml;
    if (!channel_table(llc, LL_PREDEF, kLLSize, kLLPredefLog, kMaxLogLL,
                       cll) ||
        !channel_table(ofc, OF_PREDEF, kOFSize, kOFPredefLog, kMaxLogOF,
                       cof) ||
        !channel_table(mlc, ML_PREDEF, kMLSize, kMLPredefLog, kMaxLogML,
                       cml))
        return false;
    nb_seq_header(n, out);
    out.push_back(static_cast<uint8_t>((cll.mode << 6) | (cof.mode << 4) |
                                       (cml.mode << 2)));
    append(out, cll.desc);   // FSE desc or 1-byte RLE code; empty for mode 0
    append(out, cof.desc);
    append(out, cml.desc);

    // Interleaved backward bitstream (libzstd ZSTD_encodeSequences order).
    BitVec bw(static_cast<size_t>(n) * 12 + 16);
    EncState sll{cll.ct}, sof{cof.ct}, sml{cml.ct};
    if (cml.has_ct) sml.init(mlc[n - 1]);
    if (cof.has_ct) sof.init(ofc[n - 1]);
    if (cll.has_ct) sll.init(llc[n - 1]);
    bw.push(static_cast<uint64_t>(ll_extra[n - 1]),
            static_cast<int>(ll_bits[n - 1]));
    bw.push(static_cast<uint64_t>(ml_extra[n - 1]),
            static_cast<int>(ml_bits[n - 1]));
    bw.push(static_cast<uint64_t>(of_extra[n - 1]),
            static_cast<int>(of_bits[n - 1]));
    for (int64_t i = n - 2; i >= 0; --i) {
        if (cof.has_ct) sof.encode(ofc[i], bw);
        if (cml.has_ct) sml.encode(mlc[i], bw);
        if (cll.has_ct) sll.encode(llc[i], bw);
        bw.push(static_cast<uint64_t>(ll_extra[i]),
                static_cast<int>(ll_bits[i]));
        bw.push(static_cast<uint64_t>(ml_extra[i]),
                static_cast<int>(ml_bits[i]));
        bw.push(static_cast<uint64_t>(of_extra[i]),
                static_cast<int>(of_bits[i]));
    }
    if (cml.has_ct) sml.flush(bw);
    if (cof.has_ct) sof.flush(bw);
    if (cll.has_ct) sll.flush(bw);
    append(out, bw.close_sentinel());
    return true;
}

// ---------------------------------------------------------------------------
// LZ77 match finding (zstd_seq.build_match_index / find_sequences port —
// same hash/chain/greedy semantics as vbz_lz_match_index/vbz_lz_sequences)
// ---------------------------------------------------------------------------

inline uint32_t load32(const uint8_t* p) {
    return uint32_t(p[0]) | (uint32_t(p[1]) << 8) | (uint32_t(p[2]) << 16) |
           (uint32_t(p[3]) << 24);
}

void build_match_index(const uint8_t* buf, int64_t n,
                       std::vector<int32_t>& prev) {
    if (n < 4) {
        prev.clear();
        return;
    }
    const int64_t m = n - 3;
    prev.resize(m);
    constexpr int kHashBits = 17;
    std::vector<int32_t> table(size_t(1) << kHashBits, -1);
    for (int64_t i = 0; i < m; ++i) {
        uint32_t h = (load32(buf + i) * 2654435761u) >> (32 - kHashBits);
        prev[i] = table[h];
        table[h] = static_cast<int32_t>(i);
    }
}

// Greedy scan emitting (lit_len, offset, match_len) triples + the
// concatenated literal bytes (incl. the trailing run).
void find_sequences(const uint8_t* buf, int64_t n, int64_t bstart,
                    int64_t bend, const std::vector<int32_t>& prev,
                    std::vector<int64_t>& ll, std::vector<int64_t>& of,
                    std::vector<int64_t>& ml, Bytes& lits) {
    ll.clear();
    of.clear();
    ml.clear();
    lits.clear();
    if (prev.empty()) {
        lits.assign(buf + bstart, buf + bend);
        return;
    }
    const int64_t m = n - 3;
    const int64_t hi = std::min(bend - 4, m - 1);
    ll.reserve((bend - bstart) / 8 + 8);
    of.reserve((bend - bstart) / 8 + 8);
    ml.reserve((bend - bstart) / 8 + 8);
    lits.reserve(bend - bstart);
    int64_t anchor = bstart;
    for (int64_t i = bstart; i <= hi;) {
        const int32_t c = prev[i];
        if (c < 0 || load32(buf + c) != load32(buf + i)) {
            ++i;
            continue;
        }
        const int64_t limit = std::min<int64_t>(bend - i, 131074);
        int64_t len = 4;
        while (len < limit && buf[c + len] == buf[i + len]) ++len;
        ll.push_back(i - anchor);
        of.push_back(i - c);
        ml.push_back(len);
        lits.insert(lits.end(), buf + anchor, buf + i);
        i += len;
        anchor = i;
    }
    lits.insert(lits.end(), buf + anchor, buf + bend);
}

// ---------------------------------------------------------------------------
// Block candidates + frame assembly (zstd_seq.compress_frame port)
// ---------------------------------------------------------------------------

bool sequences_block(const uint8_t* buf, int64_t n, int64_t bstart,
                     int64_t bend, const std::vector<int32_t>& prev,
                     Bytes& out) {
    std::vector<int64_t> ll, of, ml;
    Bytes lits;
    find_sequences(buf, n, bstart, bend, prev, ll, of, ml, lits);
    if (ll.empty()) return false;
    Bytes lit_sec;
    if (!literals_section(lits.data(), static_cast<int64_t>(lits.size()),
                          lit_sec))
        return false;
    Bytes seq_sec;
    if (!encode_sequences(ll, of, ml, seq_sec)) return false;
    const int64_t total = static_cast<int64_t>(lit_sec.size()) +
                          static_cast<int64_t>(seq_sec.size());
    if (total >= bend - bstart || total >= (int64_t(1) << 21)) return false;
    out = std::move(lit_sec);
    append(out, seq_sec);
    return true;
}

bool huffman_block(const uint8_t* chunk, int64_t n, Bytes& out) {
    Bytes sec;
    if (!compressed_literals_section(chunk, n, sec)) return false;
    sec.push_back(0);  // Number_of_Sequences = 0
    if (static_cast<int64_t>(sec.size()) >= n) return false;
    out = std::move(sec);
    return true;
}

}  // namespace

extern "C" int64_t vbz_own_zstd_frame(const uint8_t* src, int64_t n,
                                      uint8_t* dst, int64_t cap) {
    if (n < 0 || (n > 0 && src == nullptr)) return -1;
    Bytes out;
    out.reserve(static_cast<size_t>(n + n / 8 + 64));
    // Frame header (single-segment; FCS width by content size).
    append_le(out, 0xFD2FB528u, 4);
    if (n < 256) {
        out.push_back(0x20);
        out.push_back(static_cast<uint8_t>(n));
    } else if (n < (int64_t(1) << 16) + 256) {
        out.push_back(0x60);
        append_le(out, n - 256, 2);
    } else {
        out.push_back(0xA0);
        append_le(out, n, 4);
    }
    if (n == 0) {
        append_le(out, 1u, 3);  // last | Raw_Block | size 0
        if (static_cast<int64_t>(out.size()) > cap) return -1;
        std::memcpy(dst, out.data(), out.size());
        return static_cast<int64_t>(out.size());
    }
    std::vector<int32_t> prev;
    build_match_index(src, n, prev);
    int64_t pos = 0;
    while (pos < n) {
        const int64_t bend = std::min(pos + kBlockMax, n);
        const uint8_t* chunk = src + pos;
        const int64_t csize = bend - pos;
        const int last = bend >= n ? 1 : 0;
        bool constant = true;
        for (int64_t i = 1; i < csize; ++i)
            if (chunk[i] != chunk[0]) { constant = false; break; }
        if (constant && csize >= 4) {
            append_le(out, uint64_t(last) | (1u << 1) | (uint64_t(csize) << 3),
                      3);
            out.push_back(chunk[0]);
            pos = bend;
            continue;
        }
        Bytes seq_content, huff_content;
        const bool have_seq =
            sequences_block(src, n, pos, bend, prev, seq_content);
        const bool have_huff = huffman_block(chunk, csize, huff_content);
        const Bytes* content = nullptr;
        if (have_seq && have_huff)
            // Python: min([seq, huff], key=len) — sequences win ties.
            content = seq_content.size() <= huff_content.size()
                          ? &seq_content
                          : &huff_content;
        else if (have_seq)
            content = &seq_content;
        else if (have_huff)
            content = &huff_content;
        if (content != nullptr) {
            append_le(out,
                      uint64_t(last) | (2u << 1) |
                          (uint64_t(content->size()) << 3),
                      3);
            append(out, *content);
        } else {
            append_le(out, uint64_t(last) | (uint64_t(csize) << 3), 3);
            out.insert(out.end(), chunk, chunk + csize);
        }
        pos = bend;
    }
    if (static_cast<int64_t>(out.size()) > cap) return -1;
    std::memcpy(dst, out.data(), out.size());
    return static_cast<int64_t>(out.size());
}
