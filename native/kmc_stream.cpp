// Native streaming kmc_tools core: sorted-stream readers over KMC1/KMC2
// databases, k-way bin merge, two-stream set operations, and KMC1 record
// emission — the hot record-level loops behind kmc_tpu/tools/db_ops.py.
//
// Reference analogues (semantics, not code): CKMC2DbReader's 512-bin sorted
// merge (kmc_tools/kmc2_db_reader.h:400-560), CKMC1DbReader
// (kmc_tools/kmc1_db_reader.h), the CUnion/CIntersection/C*Subtract sorted
// merges (kmc_tools/operations.h:85-258) and CKMC1DbWriter's record+LUT
// emission (kmc_tools/kmc1_db_writer.h).  The Python paths in
// kmc_tpu/tools/db_ops.py and kmc_tpu/formats/streaming.py remain the
// fallback and the oracle: outputs here are byte-identical to theirs.
//
// Memory model: per-section pread buffers (no mmap) + one write buffer, so
// resident set AND address space stay bounded at any database size — the
// same property as the reference's buffered per-bin readers.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

constexpr uint32_t MAX_KW = 8;          // key words: 64 bytes = k<=256
constexpr size_t SEC_BUF_BYTES = 64 << 10;   // per-section read buffer
constexpr size_t OUT_BUF_BYTES = 4 << 20;    // writer buffer

struct Key {
    uint64_t w[MAX_KW];
};

static inline int key_cmp(const Key& a, const Key& b, uint32_t kw) {
    for (uint32_t i = 0; i < kw; ++i) {
        if (a.w[i] != b.w[i]) return a.w[i] < b.w[i] ? -1 : 1;
    }
    return 0;
}

// One contiguous sorted record range of a .kmc_suf file (a KMC2 bin, or the
// whole of a KMC1 database), with LUT-driven prefix reconstruction.
struct Section {
    uint64_t pos = 0, hi = 0;      // global record indices
    const uint64_t* lut = nullptr; // lut_size+1 cumulative boundaries
    uint64_t lut_size = 0;
    uint64_t cur_prefix = 0;
    // read buffer
    std::vector<uint8_t> buf;
    uint64_t buf_first = 0;        // global index of buf[0]'s record
    uint32_t buf_n = 0, buf_i = 0; // records buffered / consumed
};

struct InputSpec {  // mirrors the ctypes struct in native_tools.py
    const char* suf_path;
    const uint64_t* luts;      // n_sections*lut_size + 1 entries, cumulative
    uint64_t n_sections;
    uint64_t lut_size;         // 4^lut_prefix_len
    uint32_t kmer_len, lut_prefix_len, counter_size;
    uint64_t ci, cx;           // input filter (effective -ci/-cx)
};

struct Reader {
    int fd = -1;
    uint32_t k = 0, lpl = 0, cs = 0;  // kmer len, lut prefix len, counter size
    uint32_t sb = 0;                  // suffix bytes
    uint32_t kb = 0;                  // (k+3)/4 total kmer bytes
    uint32_t kw = 0;                  // key words
    uint32_t pad = 0;                 // kw*8 - kb leading zero bytes
    uint32_t rec_bytes = 0;
    uint64_t ci = 1, cx = ~0ull;
    std::vector<Section> secs;
    std::vector<Key> cur_key;         // per-section decoded head
    std::vector<uint64_t> cur_cnt;
    // loser-tree merge over the live sections: tree[1..P-1] hold loser
    // slots, the winner rides outside; one root-to-leaf replay (log2 P key
    // comparisons) per pop — half a binary heap's sift-down
    std::vector<uint32_t> slot_sid;   // slot -> section id
    std::vector<uint8_t> slot_dead;
    std::vector<uint32_t> tree;
    uint32_t P = 0;                   // slots (power of two)
    bool single = false;              // one live section: skip the tree
    uint32_t single_slot = 0;
    bool sequential = false;          // file (bin) order: no merge at all
    bool ok = true;

    bool open(const InputSpec* in);
    void close() { if (fd >= 0) ::close(fd); fd = -1; }
    bool refill(Section& s);
    // decode the next record of section s that passes the input filter;
    // false when the section is exhausted
    bool advance(uint32_t sid);
    // does slot a beat slot b (smaller key; dead slots always lose)?
    inline bool wins(uint32_t a, uint32_t b) const {
        if (slot_dead[a]) return false;
        if (slot_dead[b]) return true;
        int c = key_cmp(cur_key[slot_sid[a]], cur_key[slot_sid[b]], kw);
        return c < 0 || (c == 0 && a < b);
    }
    // stream interface
    bool has = false;      // a current head exists
    uint32_t head_sid = 0;
    uint32_t head_slot = 0;
    void prime();
    void pop();
    const Key& key() const { return cur_key[head_sid]; }
    uint64_t cnt() const { return cur_cnt[head_sid]; }
};

bool Reader::open(const InputSpec* in) {
    fd = ::open(in->suf_path, O_RDONLY);
    if (fd < 0) return false;
    uint8_t marker[4];
    if (pread(fd, marker, 4, 0) != 4 || memcmp(marker, "KMCS", 4) != 0)
        return false;
    k = in->kmer_len;
    lpl = in->lut_prefix_len;
    cs = in->counter_size;
    sb = (k - lpl) / 4;
    kb = (k + 3) / 4;
    kw = (kb + 7) / 8;
    if (kw > MAX_KW) return false;
    pad = kw * 8 - kb;
    rec_bytes = sb + cs;
    ci = in->ci ? in->ci : 1;
    cx = in->cx;
    secs.resize(in->n_sections);
    cur_key.resize(in->n_sections);
    cur_cnt.assign(in->n_sections, 0);
    for (uint64_t b = 0; b < in->n_sections; ++b) {
        Section& s = secs[b];
        s.lut = in->luts + b * in->lut_size;
        s.lut_size = in->lut_size;
        s.pos = s.lut[0];
        s.hi = s.lut[in->lut_size];  // next section's first == this one's end
        s.cur_prefix = 0;
        s.buf.resize(SEC_BUF_BYTES / (rec_bytes ? rec_bytes : 1) * rec_bytes
                     + rec_bytes);
    }
    prime();
    return true;
}

bool Reader::refill(Section& s) {
    if (s.pos >= s.hi) return false;
    uint64_t want = (s.buf.size() / rec_bytes);
    uint64_t left = s.hi - s.pos;
    if (want > left) want = left;
    ssize_t got = pread(fd, s.buf.data(), want * rec_bytes,
                        4 + (off_t)s.pos * rec_bytes);
    if (got < (ssize_t)(want * rec_bytes)) { ok = false; return false; }
    s.buf_first = s.pos;
    s.buf_n = (uint32_t)want;
    s.buf_i = 0;
    return true;
}

bool Reader::advance(uint32_t sid) {
    Section& s = secs[sid];
    for (;;) {
        if (s.buf_i >= s.buf_n) {
            if (!refill(s)) return false;
        }
        const uint8_t* rec = s.buf.data() + (size_t)s.buf_i * rec_bytes;
        uint64_t idx = s.buf_first + s.buf_i;
        ++s.buf_i;
        s.pos = idx + 1;
        // prefix slot whose cumulative range contains idx
        while (s.cur_prefix + 1 <= s.lut_size && s.lut[s.cur_prefix + 1] <= idx)
            ++s.cur_prefix;
        uint64_t cnt = 1;
        if (cs) {
            cnt = 0;
            for (int32_t j = (int32_t)cs - 1; j >= 0; --j)
                cnt = (cnt << 8) | rec[sb + j];   // little-endian on disk
        }
        if (cnt < ci || cnt > cx) continue;
        // assemble the key: kb big-endian bytes = prefix bits over suffix
        Key& key = cur_key[sid];
        if (kw == 1) {
            uint64_t v = s.cur_prefix;
            for (uint32_t j = 0; j < sb; ++j) v = (v << 8) | rec[j];
            key.w[0] = v;
        } else {
            uint8_t tmp[MAX_KW * 8];
            memset(tmp, 0, kw * 8);
            uint32_t pb = kb - sb;  // prefix bytes
            uint64_t p = s.cur_prefix;
            for (int32_t j = (int32_t)pb - 1; j >= 0; --j) {
                tmp[pad + j] = (uint8_t)(p & 0xFF);
                p >>= 8;
            }
            memcpy(tmp + pad + pb, rec, sb);
            for (uint32_t wi = 0; wi < kw; ++wi) {
                uint64_t v = 0;
                for (uint32_t j = 0; j < 8; ++j)
                    v = (v << 8) | tmp[wi * 8 + j];
                key.w[wi] = v;
            }
        }
        cur_cnt[sid] = cnt;
        return true;
    }
}

void Reader::prime() {
    if (sequential) {
        // listing order = sections in file order (the CKMCFile
        // OpenForListing traversal, kmc_api/kmc_file.h:180)
        for (uint32_t sid = 0; sid < secs.size(); ++sid) {
            if (advance(sid)) {
                has = true;
                head_sid = sid;
                return;
            }
        }
        has = false;
        return;
    }
    std::vector<uint32_t> live;
    for (uint32_t sid = 0; sid < secs.size(); ++sid)
        if (advance(sid)) live.push_back(sid);
    if (live.empty()) {
        has = false;
        return;
    }
    has = true;
    if (live.size() == 1) {
        single = true;
        head_sid = live[0];
        return;
    }
    P = 1;
    while (P < live.size()) P <<= 1;
    slot_sid.assign(P, 0);
    slot_dead.assign(P, 1);
    for (uint32_t s = 0; s < live.size(); ++s) {
        slot_sid[s] = live[s];
        slot_dead[s] = 0;
    }
    // bottom-up init: winners bubble up, losers stay in the internal nodes
    tree.assign(P, 0);
    std::vector<uint32_t> win(2 * P);
    for (uint32_t i = 0; i < P; ++i) win[P + i] = i;
    for (uint32_t i = P - 1; i >= 1; --i) {
        uint32_t a = win[2 * i], b = win[2 * i + 1];
        if (wins(a, b)) {
            win[i] = a;
            tree[i] = b;
        } else {
            win[i] = b;
            tree[i] = a;
        }
    }
    head_slot = win[1];
    head_sid = slot_sid[head_slot];
}

void Reader::pop() {
    if (sequential) {
        if (advance(head_sid)) return;
        for (uint32_t sid = head_sid + 1; sid < secs.size(); ++sid) {
            if (advance(sid)) {
                head_sid = sid;
                return;
            }
        }
        has = false;
        return;
    }
    if (single) {
        if (!advance(head_sid)) has = false;
        return;
    }
    uint32_t slot = head_slot;
    if (!advance(slot_sid[slot])) slot_dead[slot] = 1;
    // replay leaf -> root against the stored losers
    uint32_t cur = slot;
    for (uint32_t i = (slot + P) >> 1; i >= 1; i >>= 1) {
        if (wins(tree[i], cur)) std::swap(tree[i], cur);
    }
    if (slot_dead[cur]) {
        has = false;
        return;
    }
    head_slot = cur;
    head_sid = slot_sid[cur];
}

// KMC1 record writer: suffix bytes + LE counter, with the output-side
// cutoff filter / clamp and the per-prefix LUT histogram.
struct Writer {
    FILE* f = nullptr;
    uint32_t k = 0, lpl = 0, cs = 0, sb = 0, kb = 0, kw = 0, pad = 0;
    uint64_t ci = 1, cx = ~0ull, csmax = ~0ull;
    int64_t set_value = -1;
    uint64_t* lut_hist = nullptr;
    uint64_t n = 0;
    std::vector<uint8_t> buf;
    size_t buf_pos = 0;
    bool ok = true;

    bool open(const char* path, uint32_t k_, uint32_t lpl_, uint32_t cs_,
              uint64_t ci_, uint64_t cx_, uint64_t csmax_, int64_t setv,
              uint64_t* hist) {
        f = fopen(path, "wb");
        if (!f) return false;
        k = k_; lpl = lpl_; cs = cs_;
        sb = (k - lpl) / 4;
        kb = (k + 3) / 4;
        kw = (kb + 7) / 8;
        pad = kw * 8 - kb;
        ci = ci_; cx = cx_; csmax = csmax_;
        set_value = setv;
        lut_hist = hist;
        buf.resize(OUT_BUF_BYTES);
        if (fwrite("KMCS", 1, 4, f) != 4) {
            fclose(f);
            f = nullptr;
            return false;
        }
        return true;
    }

    void flush() {
        if (buf_pos && fwrite(buf.data(), 1, buf_pos, f) != buf_pos)
            ok = false;
        buf_pos = 0;
    }

    bool close() {
        flush();
        if (fwrite("KMCS", 1, 4, f) != 4) ok = false;
        if (fclose(f) != 0) ok = false;
        f = nullptr;
        return ok;
    }

    inline void put(const Key& key, uint64_t cnt) {
        if (set_value >= 0) {
            // set_counts stores the fixed value verbatim, skipping the
            // cutoff/clamp checks (kmc1_db_writer.h add_kmer)
            cnt = (uint64_t)set_value;
        } else {
            if (cnt < ci || cnt > cx) return;
            if (cnt > csmax) cnt = csmax;
        }
        if (buf_pos + sb + cs + 8 > buf.size()) flush();
        uint8_t* out = buf.data() + buf_pos;
        // key bytes, big-endian: byte j of the padded repr is
        // (w[j/8] >> (8*(7-j%8))); suffix = last sb bytes
        uint64_t prefix_id;
        if (kw == 1) {
            uint64_t v = key.w[0];
            for (int32_t j = (int32_t)sb - 1; j >= 0; --j) {
                out[j] = (uint8_t)(v & 0xFF);
                v >>= 8;
            }
            prefix_id = v;  // remaining high bits = 2*lpl-bit prefix
        } else {
            uint8_t tmp[MAX_KW * 8];
            for (uint32_t wi = 0; wi < kw; ++wi) {
                uint64_t v = key.w[wi];
                for (int32_t j = 7; j >= 0; --j) {
                    tmp[wi * 8 + j] = (uint8_t)(v & 0xFF);
                    v >>= 8;
                }
            }
            memcpy(out, tmp + pad + (kb - sb), sb);
            prefix_id = 0;
            for (uint32_t j = 0; j < kb - sb; ++j)
                prefix_id = (prefix_id << 8) | tmp[pad + j];
        }
        for (uint32_t j = 0; j < cs; ++j)
            out[sb + j] = (uint8_t)((cnt >> (8 * j)) & 0xFF);
        buf_pos += sb + cs;
        ++lut_hist[prefix_id];
        ++n;
    }
};

static inline uint64_t combine(uint64_t a, uint64_t b, int mode) {
    switch (mode) {
        case 0: return a < b ? a : b;            // min
        case 1: return a > b ? a : b;            // max
        case 2: return a + b;                    // sum
        case 3: return a > b ? a - b : 0;        // diff
        case 4: return a;                        // left / from_db1
        default: return b;                       // right / from_db2
    }
}

}  // namespace

extern "C" {

// op: 0 copy (single input), 1 union, 2 intersect, 3 kmers_subtract,
//     4 counters_subtract.  mode: 0 min, 1 max, 2 sum, 3 diff, 4 left,
//     5 right.  set_value >= 0: fixed counter (set_counts).
// Writes "KMCS"+records+"KMCS" to out_suf_path, accumulates the output
// prefix histogram into lut_hist (4^out_lpl zeroed slots), returns the
// record count, or -1 on error.
int64_t kst_op(const InputSpec* a, const InputSpec* b, int32_t op,
               int32_t mode, const char* out_suf_path, uint32_t out_lpl,
               uint32_t out_cs, uint64_t out_ci, uint64_t out_cx,
               uint64_t out_csmax, int64_t set_value, uint64_t* lut_hist) {
    Reader ra;
    if (!ra.open(a)) { ra.close(); return -1; }
    Writer w;
    if (!w.open(out_suf_path, a->kmer_len, out_lpl, out_cs, out_ci, out_cx,
                out_csmax, set_value, lut_hist)) {
        ra.close();
        return -1;
    }
    if (op == 0) {
        while (ra.has) {
            w.put(ra.key(), ra.cnt());
            ra.pop();
        }
    } else {
        Reader rb;
        if (!b || !rb.open(b)) {
            ra.close();
            rb.close();
            w.close();
            return -1;
        }
        while (ra.has && rb.has) {
            int c = key_cmp(ra.key(), rb.key(), ra.kw);
            if (c < 0) {
                if (op == 1 || op == 3 || op == 4) w.put(ra.key(), ra.cnt());
                ra.pop();
            } else if (c > 0) {
                if (op == 1) w.put(rb.key(), rb.cnt());
                rb.pop();
            } else {
                if (op != 3) {
                    uint64_t cnt = combine(ra.cnt(), rb.cnt(), mode);
                    if (cnt > 0 || set_value >= 0) w.put(ra.key(), cnt);
                }
                ra.pop();
                rb.pop();
            }
        }
        while (ra.has && (op == 1 || op == 3 || op == 4)) {
            w.put(ra.key(), ra.cnt());
            ra.pop();
        }
        while (rb.has && op == 1) {
            w.put(rb.key(), rb.cnt());
            rb.pop();
        }
        bool rb_ok = rb.ok;
        rb.close();
        if (!rb_ok) { ra.close(); w.close(); return -1; }
    }
    bool read_ok = ra.ok;
    ra.close();
    if (!w.close() || !read_ok) return -1;
    return (int64_t)w.n;
}

// Text dump: "ACGT...\tCOUNT\n" per record (dump_writer.h:241).
// sorted_order != 0: globally sorted merge; 0: file (listing) order.
int64_t kst_dump(const InputSpec* a, const char* out_path,
                 int32_t sorted_order) {
    Reader r;
    r.sequential = sorted_order == 0;
    if (!r.open(a)) { r.close(); return -1; }
    FILE* f = fopen(out_path, "wb");
    if (!f) { r.close(); return -1; }
    std::vector<uint8_t> buf(OUT_BUF_BYTES);
    size_t pos = 0;
    const uint32_t k = r.k;
    static const char BASES[4] = {'A', 'C', 'G', 'T'};
    // byte -> its 4 symbols, in string order (high bits first)
    uint8_t lut4[256][4];
    for (uint32_t b = 0; b < 256; ++b) {
        lut4[b][0] = (uint8_t)BASES[(b >> 6) & 3];
        lut4[b][1] = (uint8_t)BASES[(b >> 4) & 3];
        lut4[b][2] = (uint8_t)BASES[(b >> 2) & 3];
        lut4[b][3] = (uint8_t)BASES[b & 3];
    }
    // the first used byte holds ((k-1)%4)+1 symbols; the rest hold 4 each
    const uint32_t lead = ((k - 1) & 3) + 1;
    int64_t n = 0;
    bool ok = true;
    uint8_t tmp[MAX_KW * 8];
    while (r.has) {
        if (pos + k + 24 > buf.size()) {
            if (fwrite(buf.data(), 1, pos, f) != pos) { ok = false; break; }
            pos = 0;
        }
        const Key& key = r.key();
        for (uint32_t wi = 0; wi < r.kw; ++wi) {
            uint64_t v = key.w[wi];
            for (int32_t j = 7; j >= 0; --j) {
                tmp[wi * 8 + j] = (uint8_t)(v & 0xFF);
                v >>= 8;
            }
        }
        uint8_t* out = buf.data() + pos;
        const uint8_t* kb_bytes = tmp + r.pad;
        memcpy(out, lut4[kb_bytes[0]] + (4 - lead), lead);
        uint8_t* o = out + lead;
        for (uint32_t j = 1; j < r.kb; ++j, o += 4)
            memcpy(o, lut4[kb_bytes[j]], 4);
        out[k] = '\t';
        uint64_t c = r.cnt();
        char num[24];
        int nd = 0;
        do {
            num[nd++] = (char)('0' + c % 10);
            c /= 10;
        } while (c);
        for (int j = 0; j < nd; ++j) out[k + 1 + j] = (uint8_t)num[nd - 1 - j];
        out[k + 1 + nd] = '\n';
        pos += k + 2 + nd;
        ++n;
        r.pop();
    }
    if (ok && pos && fwrite(buf.data(), 1, pos, f) != pos) ok = false;
    if (fclose(f) != 0) ok = false;
    bool read_ok = r.ok;
    r.close();
    return (ok && read_ok) ? n : -1;
}

// Counter histogram: hist[min(count, hist_len-1)] += 1 over the (input-
// filtered) records.  Order is irrelevant, so this scans the sections
// sequentially without the merge or key assembly — the analogue of the
// reference's counters_only open mode (kmc_tools.cpp:75-81).
int64_t kst_histogram(const InputSpec* a, uint64_t* hist, uint64_t hist_len) {
    int fd = ::open(a->suf_path, O_RDONLY);
    if (fd < 0) return -1;
    uint8_t marker[4];
    if (pread(fd, marker, 4, 0) != 4 || memcmp(marker, "KMCS", 4) != 0) {
        ::close(fd);
        return -1;
    }
    const uint32_t k = a->kmer_len, lpl = a->lut_prefix_len;
    const uint32_t cs = a->counter_size, sb = (k - lpl) / 4;
    const uint32_t rec_bytes = sb + cs;
    const uint64_t ci = a->ci ? a->ci : 1, cx = a->cx;
    const uint64_t lo = a->luts[0];
    const uint64_t hi = a->luts[a->n_sections * a->lut_size];
    int64_t n = 0;
    std::vector<uint8_t> buf((4u << 20) / rec_bytes * rec_bytes);
    for (uint64_t pos = lo; pos < hi;) {
        uint64_t want = buf.size() / rec_bytes;
        if (want > hi - pos) want = hi - pos;
        ssize_t got = pread(fd, buf.data(), want * rec_bytes,
                            4 + (off_t)pos * rec_bytes);
        if (got < (ssize_t)(want * rec_bytes)) { ::close(fd); return -1; }
        const uint8_t* p = buf.data() + sb;
        for (uint64_t i = 0; i < want; ++i, p += rec_bytes) {
            uint64_t c = 1;
            if (cs) {
                c = 0;
                for (int32_t j = (int32_t)cs - 1; j >= 0; --j)
                    c = (c << 8) | p[j];
            }
            if (c < ci || c > cx) continue;
            ++hist[c < hist_len ? c : hist_len - 1];
            ++n;
        }
        pos += want;
    }
    ::close(fd);
    return n;
}

// Counters for every k-mer window of a text sequence against an in-RAM
// random-access index (sorted u64 keys + u32 counts) — the hot loop of
// CKMCFile::GetCountersForRead (kmc_api/kmc_file.cpp:1193) for k<=32.
// Keys use the API's packing: the (k+3)/4 big-endian k-mer bytes occupy
// the HIGH bytes of the u64 (value << (64 - 8*KB)).  Windows broken by
// non-ACGT symbols get counter 0.  Returns the window count.
// idx16 (optional, else null): 65537-entry table, idx16[t] = first key
// index with top 16 bits >= t — narrows each lookup to a ~n/65536 range
// (the in-RAM analogue of the prefix-LUT jump in CKMCFile::CheckKmer).
int64_t kst_counters_for_seq(const uint8_t* seq, int64_t seq_len,
                             uint32_t k, int32_t both_strands,
                             const uint64_t* keys, const uint32_t* counts,
                             uint64_t n_keys, const uint64_t* idx16,
                             uint32_t* out) {
    if (k < 1 || k > 32 || seq_len < (int64_t)k) return 0;
    static uint8_t code[256];
    static bool init = false;
    if (!init) {
        memset(code, 4, sizeof(code));
        code['A'] = code['a'] = 0;
        code['C'] = code['c'] = 1;
        code['G'] = code['g'] = 2;
        code['T'] = code['t'] = 3;
        init = true;
    }
    const uint32_t kb = (k + 3) / 4;
    const uint32_t key_shift = 64 - 8 * kb;
    const uint64_t mask = (k == 32) ? ~0ull : ((1ull << (2 * k)) - 1);
    const uint32_t rc_shift = 2 * (k - 1);
    const int64_t n = seq_len - k + 1;
    uint64_t fwd = 0, rc = 0;
    int64_t last_bad = -1;  // most recent non-ACGT position
    for (int64_t i = 0; i < seq_len; ++i) {
        uint64_t c = code[seq[i]];
        if (c >= 4) {
            last_bad = i;
            c = 0;
        }
        fwd = ((fwd << 2) | c) & mask;
        rc = (rc >> 2) | ((3 - c) << rc_shift);
        int64_t w = i - (int64_t)k + 1;  // window ending at i
        if (w < 0) continue;
        if (last_bad >= w) {
            out[w] = 0;
            continue;
        }
        uint64_t v = (both_strands && rc < fwd) ? rc : fwd;
        uint64_t key = v << key_shift;
        uint64_t lo = 0, len = n_keys;
        if (idx16) {
            uint64_t t = key >> 48;
            lo = idx16[t];
            len = idx16[t + 1] - lo;
        }
        // branch-free-ish binary search (lower_bound)
        while (len > 1) {
            uint64_t half = len / 2;
            lo += (keys[lo + half - 1] < key) ? half : 0;
            len -= half;
        }
        out[w] = (len && keys[lo] == key) ? counts[lo] : 0;
    }
    return n;
}

// Record-level equality of two sorted streams (operations.h:258).
// Returns 1 equal, 0 different, -1 error.
int32_t kst_compare(const InputSpec* a, const InputSpec* b) {
    Reader ra, rb;
    if (!ra.open(a) || !rb.open(b)) { ra.close(); rb.close(); return -1; }
    int32_t eq = 1;
    while (ra.has && rb.has) {
        if (key_cmp(ra.key(), rb.key(), ra.kw) != 0 || ra.cnt() != rb.cnt()) {
            eq = 0;
            break;
        }
        ra.pop();
        rb.pop();
    }
    if (eq && (ra.has || rb.has)) eq = 0;
    bool ok = ra.ok && rb.ok;
    ra.close();
    rb.close();
    return ok ? eq : -1;
}

}  // extern "C"
