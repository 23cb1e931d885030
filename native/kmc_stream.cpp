// Native streaming kmc_tools core: sorted-stream readers over KMC1/KMC2
// databases and KFF raw sections, k-way bin merge, two-stream set
// operations, and KMC1/KFF record emission — the hot record-level loops
// behind kmc_tpu/tools/db_ops.py.
//
// Reference analogues (semantics, not code): CKMC2DbReader's 512-bin sorted
// merge (kmc_tools/kmc2_db_reader.h:400-560), CKMC1DbReader
// (kmc_tools/kmc1_db_reader.h), CKFFDbReader's raw-section streaming
// (kmc_tools/kff_db_reader.h:1226-1455), the CUnion/CIntersection/
// C*Subtract sorted merges (kmc_tools/operations.h:85-258), CKMC1DbWriter's
// record+LUT emission (kmc_tools/kmc1_db_writer.h) and CKFFDbWriter's raw
// record emission (kmc_tools/kff_db_writer.h).  The Python paths in
// kmc_tpu/tools/db_ops.py and kmc_tpu/formats/streaming.py remain the
// fallback and the oracle: outputs here are byte-identical to theirs.
//
// Memory model: per-section pread buffers (no mmap) + one write buffer, so
// resident set AND address space stay bounded at any database size — the
// same property as the reference's buffered per-bin readers.  Buffer sizes
// scale inversely with the live section count (one big KMC1 stream gets a
// multi-MB buffer; a 512-bin KMC2 merge gets 128 KiB each) under one fixed
// total budget.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

constexpr uint32_t MAX_KW = 8;               // key words: 64 bytes = k<=256

// worker threads for the chunk-parallel drivers (kst_set_threads);
// 0 = auto (hardware concurrency), 1 = the classic serial paths
std::atomic<int32_t> g_threads{1};

int32_t resolve_threads() {
    int32_t t = g_threads.load(std::memory_order_relaxed);
    if (t > 0) return t;
    unsigned hw = std::thread::hardware_concurrency();
    return hw ? (int32_t)hw : 1;
}
constexpr size_t SEC_BUF_BUDGET = 64 << 20;  // total read-buffer budget
constexpr size_t SEC_BUF_MIN = 64 << 10;
constexpr size_t SEC_BUF_MAX = 8 << 20;
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

static inline uint64_t load_be64(const uint8_t* p) {
    uint64_t v;
    memcpy(&v, p, 8);
    return __builtin_bswap64(v);
}

// Stable sort of (key, payload) pairs by the low `key_bytes` bytes of
// .first — MSD radix (one counting-scatter byte pass + insertion sorts of
// the tiny sub-buckets; std::sort's per-element branch misses measured as
// ~85% of the whole KMC2 merge drain).  Stability: the counting scatter
// and the strict-> insertion keep equal keys in append order.  `tmp` must
// have room for n elements.
static void sort_pairs_lowbytes(std::pair<uint64_t, uint64_t>* a, size_t n,
                                std::pair<uint64_t, uint64_t>* tmp,
                                uint32_t key_bytes) {
    if (n < 2) return;
    if (n < 48 || key_bytes == 0) {
        for (size_t i = 1; i < n; ++i) {
            auto v = a[i];
            size_t j = i;
            while (j && a[j - 1].first > v.first) {
                a[j] = a[j - 1];
                --j;
            }
            a[j] = v;
        }
        return;
    }
    // one MSD byte pass + insertion sorts of the tiny sub-buckets (the
    // common window bucket is ~records/prefix elements, so sub-buckets
    // hold a couple of elements each); recursion only for skewed buckets
    const uint32_t shift = 8 * (key_bytes - 1);
    uint32_t cnt[256] = {0};
    for (size_t i = 0; i < n; ++i)
        ++cnt[(a[i].first >> shift) & 0xFF];
    if (cnt[(a[0].first >> shift) & 0xFF] == n) {
        sort_pairs_lowbytes(a, n, tmp, key_bytes - 1);  // uniform byte
        return;
    }
    uint32_t off[257];
    off[0] = 0;
    for (uint32_t c = 0; c < 256; ++c) off[c + 1] = off[c] + cnt[c];
    uint32_t pos[256];
    memcpy(pos, off, sizeof(pos));
    for (size_t i = 0; i < n; ++i)
        tmp[pos[(a[i].first >> shift) & 0xFF]++] = a[i];
    for (uint32_t c = 0; c < 256; ++c) {
        const size_t lo = off[c], m = off[c + 1] - off[c];
        if (m < 2) continue;
        if (m < 48) {
            auto* s = tmp + lo;
            for (size_t i = 1; i < m; ++i) {
                auto v = s[i];
                size_t j = i;
                while (j && s[j - 1].first > v.first) {
                    s[j] = s[j - 1];
                    --j;
                }
                s[j] = v;
            }
        } else {
            sort_pairs_lowbytes(tmp + lo, m, a + lo, key_bytes - 1);
        }
    }
    memcpy(a, tmp, n * sizeof(*a));
}

static inline uint64_t load_le64(const uint8_t* p) {
    uint64_t v;
    memcpy(&v, p, 8);
    return v;
}

// LUT pointers come from Python as mmap views of .kmc_pre starting 4 bytes
// past the "KMCP" marker, so they are 4-mod-8 aligned.  An aligned(1) u64
// typedef makes every load through them a legitimate unaligned access
// (identical x86 codegen; avoids UB on the plain-uint64_t cast).
typedef uint64_t uu64 __attribute__((aligned(1), may_alias));

// One contiguous sorted record range: a KMC2 bin (or the whole of a KMC1
// database) of a .kmc_suf file with LUT-driven prefix reconstruction, or
// one KFF 'r' section (whole big-endian k-mers, BE counters, no LUT).
struct Section {
    uint64_t pos = 0, hi = 0;      // record indices (KMC: global; KFF: local)
    uint64_t off = 0;              // KFF: file offset of the record data
    const uu64* lut = nullptr;     // lut_size+1 cumulative boundaries
    uint64_t lut_size = 0;
    uint64_t cur_prefix = 0;
    // read buffer
    std::vector<uint8_t> buf;
    uint64_t buf_first = 0;        // record index of buf[0]'s record
    uint32_t buf_n = 0, buf_i = 0; // records buffered / consumed
};

struct InputSpec {  // mirrors the ctypes struct in native_tools.py
    const char* suf_path;
    const uu64* luts;          // n_sections*lut_size + 1 entries, cumulative
    uint64_t n_sections;
    uint64_t lut_size;         // 4^lut_prefix_len
    uint32_t kmer_len, lut_prefix_len, counter_size;
    uint64_t ci, cx;           // input filter (effective -ci/-cx)
    uint32_t format;           // 0 = KMC .kmc_suf, 1 = KFF raw sections
    const uint64_t* sec_offsets;  // KFF: per-section record-data offsets
    const uint64_t* sec_counts;   // KFF: per-section record counts
};

struct Reader {
    int fd = -1;
    uint32_t fmt = 0;                 // 0 KMC, 1 KFF
    uint32_t k = 0, lpl = 0, cs = 0;  // kmer len, lut prefix len, counter size
    uint32_t sb = 0;                  // stored k-mer bytes per record
    uint32_t kb = 0;                  // (k+3)/4 total kmer bytes
    uint32_t kw = 0;                  // key words
    uint32_t pad = 0;                 // kw*8 - kb leading zero bytes
    uint32_t rec_bytes = 0;
    uint64_t ci = 1, cx = ~0ull;
    uint64_t cnt_mask = 0;            // (1 << 8*cs) - 1 (0 when cs == 0)
    std::vector<Section> secs;
    std::vector<Key> cur_key;         // per-section decoded head
    std::vector<uint64_t> cur_cnt;
    // loser-tree merge over the live sections: tree[1..P-1] hold loser
    // slots, the winner rides outside; one root-to-leaf replay (log2 P key
    // comparisons) per pop — half a binary heap's sift-down
    std::vector<uint32_t> slot_sid;
    std::vector<uint8_t> slot_dead;
    std::vector<uint32_t> tree;
    uint32_t P = 0;                   // slots (power of two)
    bool single = false;              // one live section: skip the tree
    bool pair = false;                // two live sections: direct compare
    uint32_t pair_a = 0, pair_b = 0;  // live sids in pair mode
    bool sequential = false;          // file (bin) order: no merge at all
    bool ok = true;

    // prefix-major block merge (KMC multi-section): in a KMC2 database
    // every bin's records for LUT prefix p are one contiguous sorted run,
    // so the global merge collects the per-bin runs of a prefix window
    // into one scratch block and sorts it — contiguous data, no
    // per-record tree pops, no LUT walk (the prefix is the loop
    // variable).  ~2x the loser tree's throughput at 512 sections.
    bool blockmerge = false;
    static constexpr uint64_t BLOCK = 8192;
    std::vector<std::pair<uint64_t, uint64_t>> blk1;  // kw==1: key, seq|cnt
    std::vector<std::pair<uint64_t, uint64_t>> blk_tmp;  // radix scratch
    struct WideRec { Key key; uint64_t cnt; uint32_t seq; };
    std::vector<WideRec> blkw;                        // kw>1
    uint64_t blk_i = 0, blk_n = 0;
    uint64_t next_prefix = 0;
    uint64_t pfx_hi = 0;              // merge stops at this prefix (clamp)
    std::vector<uint64_t> pfx_total;  // records per prefix, all sections
    std::vector<uint64_t> win_off;    // per-window bucket offsets
    std::vector<uint32_t> win_fill;   // per-window bucket fills
    Key head_key;
    uint64_t head_cnt = 0;
    void refill_block();
    template <typename Emit>
    void collect_run(Section& s, uint64_t hi, const Emit& emit);

    bool open(const InputSpec* in);
    void close() { if (fd >= 0) ::close(fd); fd = -1; }
    // re-clamp a KMC-format reader to the prefix range [p0, p1) (in its
    // own lut_prefix_len space) and re-prime — the chunk-parallel drivers
    // reuse one Reader (fds, buffers) across their claimed chunks.  Valid
    // because chunk boundaries sit at prefix boundaries: every record of
    // a prefix lands in exactly one chunk, so per-chunk merge order (and
    // the section tie-break) concatenates to the serial order.
    void reset_range(uint64_t p0, uint64_t p1);
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
    const Key& key() const {
        return blockmerge ? head_key : cur_key[head_sid];
    }
    uint64_t cnt() const {
        return blockmerge ? head_cnt : cur_cnt[head_sid];
    }
};

bool Reader::open(const InputSpec* in) {
    fd = ::open(in->suf_path, O_RDONLY);
    if (fd < 0) return false;
    fmt = in->format;
    k = in->kmer_len;
    lpl = fmt ? 0 : in->lut_prefix_len;
    cs = in->counter_size;
    kb = (k + 3) / 4;
    sb = fmt ? kb : (k - in->lut_prefix_len) / 4;
    kw = (kb + 7) / 8;
    if (kw > MAX_KW) return false;
    pad = kw * 8 - kb;
    rec_bytes = sb + cs;
    ci = in->ci ? in->ci : 1;
    cx = in->cx;
    cnt_mask = cs >= 8 ? ~0ull : ((1ull << (8 * cs)) - 1);
    if (fmt == 0) {
        uint8_t marker[4];
        if (pread(fd, marker, 4, 0) != 4 || memcmp(marker, "KMCS", 4) != 0)
            return false;
        pfx_hi = in->lut_size;
    }
    size_t per_sec = SEC_BUF_BUDGET / (in->n_sections ? in->n_sections : 1);
    if (per_sec < SEC_BUF_MIN) per_sec = SEC_BUF_MIN;
    if (per_sec > SEC_BUF_MAX) per_sec = SEC_BUF_MAX;
    secs.resize(in->n_sections);
    cur_key.resize(in->n_sections);
    cur_cnt.assign(in->n_sections, 0);
    for (uint64_t b = 0; b < in->n_sections; ++b) {
        Section& s = secs[b];
        if (fmt) {
            s.off = in->sec_offsets[b];
            s.pos = 0;
            s.hi = in->sec_counts[b];
        } else {
            s.lut = in->luts + b * in->lut_size;
            s.lut_size = in->lut_size;
            s.pos = s.lut[0];
            s.hi = s.lut[in->lut_size];
            s.cur_prefix = 0;
        }
        // +8 slack so 8-byte loads at the final record never overrun
        s.buf.resize(per_sec / (rec_bytes ? rec_bytes : 1) * rec_bytes
                     + rec_bytes + 8);
    }
    // the prefix-major block merge needs the shared LUT structure of a
    // multi-bin KMC database; 1-2 sections run cheaper head-to-head
    blockmerge = (fmt == 0 && !sequential && secs.size() >= 3
                  && (kw > 1 || cs <= 4));
    if (blockmerge) {
        // per-prefix global record counts, accumulated SECTION-major so
        // every LUT streams sequentially (one pass, L1-resident target)
        pfx_total.assign(in->lut_size, 0);
        for (uint64_t b = 0; b < in->n_sections; ++b) {
            const uu64* lut = secs[b].lut;
            for (uint64_t p = 0; p < in->lut_size; ++p)
                pfx_total[p] += lut[p + 1] - lut[p];
        }
    }
    prime();
    return true;
}

void Reader::reset_range(uint64_t p0, uint64_t p1) {
    // KMC format only (sections carry LUTs); callers guard on fmt == 0
    for (Section& s : secs) {
        s.pos = s.lut[p0];
        s.hi = s.lut[p1];
        s.cur_prefix = p0;
        s.buf_first = 0;
        s.buf_n = s.buf_i = 0;
    }
    next_prefix = p0;
    pfx_hi = p1;
    blk_i = blk_n = 0;
    single = pair = false;
    has = false;
    prime();
}

bool Reader::refill(Section& s) {
    if (s.pos >= s.hi) return false;
    uint64_t want = (s.buf.size() - 8) / rec_bytes;
    uint64_t left = s.hi - s.pos;
    if (want > left) want = left;
    off_t base = fmt ? (off_t)s.off + (off_t)s.pos * rec_bytes
                     : 4 + (off_t)s.pos * rec_bytes;
    ssize_t got = pread(fd, s.buf.data(), want * rec_bytes, base);
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
        uint64_t cnt = 1;
        if (cs) {
            // branchless decode: 8-byte load (slack guaranteed) + mask;
            // KMC counters little-endian on disk, KFF big-endian
            cnt = fmt ? (load_be64(rec + sb) >> (64 - 8 * cs))
                      : (load_le64(rec + sb) & cnt_mask);
        }
        if (cnt < ci || cnt > cx) continue;
        Key& key = cur_key[sid];
        if (fmt) {
            // KFF: the record IS the kb big-endian k-mer bytes
            if (kw == 1) {
                key.w[0] = load_be64(rec) >> (64 - 8 * kb);
            } else {
                uint8_t tmp[MAX_KW * 8];
                memset(tmp, 0, pad);
                memcpy(tmp + pad, rec, kb);
                for (uint32_t wi = 0; wi < kw; ++wi)
                    key.w[wi] = load_be64(tmp + wi * 8);
            }
        } else {
            // prefix slot whose cumulative range contains idx
            while (s.cur_prefix + 1 <= s.lut_size
                   && s.lut[s.cur_prefix + 1] <= idx)
                ++s.cur_prefix;
            if (kw == 1) {
                uint64_t sfx = sb ? (load_be64(rec) >> (64 - 8 * sb)) : 0;
                key.w[0] = (sb < 8 ? (s.cur_prefix << (8 * sb)) : 0) | sfx;
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
                for (uint32_t wi = 0; wi < kw; ++wi)
                    key.w[wi] = load_be64(tmp + wi * 8);
            }
        }
        cur_cnt[sid] = cnt;
        return true;
    }
}

// Decode the raw records of section s from s.pos up to record index `hi`
// (monotone; buffered), invoking emit(rec_ptr, cnt) for every record that
// passes the input filter.
template <typename Emit>
void Reader::collect_run(Section& s, uint64_t hi, const Emit& emit) {
    while (s.pos < hi) {
        if (s.buf_i >= s.buf_n) {
            if (!refill(s)) return;  // read error: refill() set ok=false
        }
        uint64_t run = s.buf_n - s.buf_i;
        uint64_t left = hi - s.pos;
        if (run > left) run = left;
        const uint8_t* rec = s.buf.data() + (size_t)s.buf_i * rec_bytes;
        for (uint64_t i = 0; i < run; ++i, rec += rec_bytes) {
            uint64_t cnt = 1;
            if (cs) cnt = load_le64(rec + sb) & cnt_mask;
            if (cnt >= ci && cnt <= cx) emit(rec, cnt);
        }
        s.buf_i += (uint32_t)run;
        s.pos += run;
    }
}

void Reader::refill_block() {
    // Window = a prefix range [p0, p1) holding ~BLOCK records (always >= 1
    // prefix).  Collection runs SECTION-major so each section's LUT slice
    // and record bytes stream sequentially (prefix-major scanning touches
    // 512 scattered LUTs per prefix — measured as pure cache misses), and
    // lands records in per-prefix buckets sized from the precomputed
    // pfx_total, so only tiny per-bucket sorts (~records/prefix elements,
    // L1-resident) remain.
    const uint64_t lut_size = pfx_hi;  // clamped end (reset_range)
    const uint32_t n_secs = (uint32_t)secs.size();
    for (;;) {
        if (next_prefix >= lut_size) {
            has = false;
            return;
        }
        const uint64_t p0 = next_prefix;
        uint64_t p1 = p0;
        uint64_t total = 0;
        while (p1 < lut_size && (total == 0 || total < BLOCK))
            total += pfx_total[p1++];
        next_prefix = p1;
        if (total == 0) continue;
        const uint64_t W = p1 - p0;
        win_off.resize(W + 1);
        win_fill.assign(W, 0);
        win_off[0] = 0;
        for (uint64_t i = 0; i < W; ++i)
            win_off[i + 1] = win_off[i] + pfx_total[p0 + i];
        if (kw == 1) {
            blk1.resize(total);
            for (uint32_t b = 0; b < n_secs; ++b) {
                Section& s = secs[b];
                for (uint64_t p = p0; p < p1; ++p) {
                    const uint64_t hi = s.lut[p + 1];
                    if (s.pos >= hi) continue;
                    const uint64_t wi = p - p0;
                    const uint64_t base = win_off[wi];
                    const uint64_t pfx = sb < 8 ? (p << (8 * sb)) : 0;
                    uint32_t& fill = win_fill[wi];
                    collect_run(s, hi, [&](const uint8_t* rec,
                                           uint64_t cnt) {
                        uint64_t sfx =
                            sb ? (load_be64(rec) >> (64 - 8 * sb)) : 0;
                        // bucket-local seq in the HIGH bits: equal keys
                        // keep section/append order under the plain pair
                        // sort (the loser tree / Python tie-break); cnt
                        // fits 32 bits (cs <= 4 guard at open)
                        blk1[base + fill] = {pfx | sfx,
                                             ((uint64_t)fill << 32) | cnt};
                        ++fill;
                    });
                }
            }
            // per-bucket stable radix sort (within a bucket the prefix
            // is constant: only the low 8*sb suffix bits differ; LSD
            // stability keeps equal keys in section/append order, so the
            // seq tag is belt-and-braces) + compaction of filtered gaps
            if (blk_tmp.size() < total) blk_tmp.resize(total);
            uint64_t out = 0;
            for (uint64_t i = 0; i < W; ++i) {
                const uint64_t b0 = win_off[i];
                const uint64_t n = win_fill[i];
                if (n)
                    sort_pairs_lowbytes(blk1.data() + b0, n,
                                        blk_tmp.data(), sb);
                if (out != b0 && n)
                    memmove(blk1.data() + out, blk1.data() + b0,
                            n * sizeof(blk1[0]));
                out += n;
            }
            blk_n = out;
            blk_i = 0;
            if (blk_n) {
                head_key.w[0] = blk1[0].first;
                head_cnt = blk1[0].second & 0xFFFFFFFFull;
                return;
            }
        } else {
            blkw.resize(total);
            const uint32_t pb = kb - sb;
            for (uint32_t b = 0; b < n_secs; ++b) {
                Section& s = secs[b];
                for (uint64_t p = p0; p < p1; ++p) {
                    const uint64_t hi = s.lut[p + 1];
                    if (s.pos >= hi) continue;
                    const uint64_t wi = p - p0;
                    const uint64_t base = win_off[wi];
                    uint32_t& fill = win_fill[wi];
                    collect_run(s, hi, [&](const uint8_t* rec,
                                           uint64_t cnt) {
                        WideRec& r = blkw[base + fill];
                        uint8_t tmp[MAX_KW * 8];
                        memset(tmp, 0, kw * 8);
                        uint64_t pv = p;
                        for (int32_t j = (int32_t)pb - 1; j >= 0; --j) {
                            tmp[pad + j] = (uint8_t)(pv & 0xFF);
                            pv >>= 8;
                        }
                        memcpy(tmp + pad + pb, rec, sb);
                        for (uint32_t wi2 = 0; wi2 < kw; ++wi2)
                            r.key.w[wi2] = load_be64(tmp + wi2 * 8);
                        r.cnt = cnt;
                        r.seq = fill++;
                    });
                }
            }
            uint64_t out = 0;
            const uint32_t kww = kw;
            for (uint64_t i = 0; i < W; ++i) {
                const uint64_t b0 = win_off[i];
                const uint64_t n = win_fill[i];
                if (n)
                    std::sort(blkw.begin() + b0, blkw.begin() + b0 + n,
                              [kww](const WideRec& a, const WideRec& b) {
                                  int c = key_cmp(a.key, b.key, kww);
                                  return c < 0 || (c == 0 && a.seq < b.seq);
                              });
                if (out != b0 && n)
                    memmove(blkw.data() + out, blkw.data() + b0,
                            n * sizeof(blkw[0]));
                out += n;
            }
            blk_n = out;
            blk_i = 0;
            if (blk_n) {
                head_key = blkw[0].key;
                head_cnt = blkw[0].cnt;
                return;
            }
        }
        // fully filtered window: keep collecting
    }
}

void Reader::prime() {
    if (blockmerge) {
        has = true;
        refill_block();
        return;
    }
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
    if (live.size() == 2) {
        pair = true;
        pair_a = live[0];
        pair_b = live[1];
        head_sid = key_cmp(cur_key[pair_a], cur_key[pair_b], kw) <= 0
                       ? pair_a : pair_b;
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
    if (blockmerge) {
        if (++blk_i >= blk_n) {
            refill_block();
            return;
        }
        if (kw == 1) {
            head_key.w[0] = blk1[blk_i].first;
            head_cnt = blk1[blk_i].second & 0xFFFFFFFFull;
        } else {
            head_key = blkw[blk_i].key;
            head_cnt = blkw[blk_i].cnt;
        }
        return;
    }
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
    if (pair) {
        uint32_t other = head_sid == pair_a ? pair_b : pair_a;
        if (!advance(head_sid)) {
            single = true;
            pair = false;
            head_sid = other;
            return;
        }
        // stability: on equal keys the lower sid wins (matches the loser
        // tree's slot tie-break, which follows section order)
        int c = key_cmp(cur_key[pair_a], cur_key[pair_b], kw);
        head_sid = (c < 0 || (c == 0)) ? pair_a : pair_b;
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

// Record writer with the output-side cutoff filter / clamp.  KMC1 mode:
// suffix bytes + LE counter + per-prefix LUT histogram.  KFF mode: whole
// big-endian k-mer bytes + BE counter appended at a caller-given offset
// (the Python side writes the KFF header/index/footer around it).
struct Writer {
    FILE* f = nullptr;
    std::vector<uint8_t>* mem = nullptr;  // chunk-parallel sink (no file)
    uint32_t fmt = 0;  // 0 KMC1, 1 KFF raw records
    uint32_t k = 0, lpl = 0, cs = 0, sb = 0, kb = 0, kw = 0, pad = 0;
    uint64_t ci = 1, cx = ~0ull, csmax = ~0ull;
    int64_t set_value = -1;
    uint64_t* lut_hist = nullptr;
    uint64_t lut_base = 0;  // chunk-parallel: hist is a window slice
    uint64_t n = 0;
    std::vector<uint8_t> buf;
    size_t buf_pos = 0;
    bool ok = true;

    void open_mem(std::vector<uint8_t>* sink, uint32_t fmt_, uint32_t k_,
                  uint32_t lpl_, uint32_t cs_, uint64_t ci_, uint64_t cx_,
                  uint64_t csmax_, int64_t setv, uint64_t* hist,
                  uint64_t hist_base) {
        mem = sink;
        fmt = fmt_;
        k = k_; lpl = fmt ? 0 : lpl_; cs = cs_;
        kb = (k + 3) / 4;
        sb = fmt ? kb : (k - lpl_) / 4;
        kw = (kb + 7) / 8;
        pad = kw * 8 - kb;
        ci = ci_; cx = cx_; csmax = csmax_;
        set_value = setv;
        lut_hist = hist;
        lut_base = hist_base;
        // smaller buffer than the file path: flushes are memcpys into the
        // chunk sink, and workers keep one Writer across chunks
        buf.resize(256 << 10);
    }

    // re-aim an open_mem Writer at the next chunk's sink/hist (config
    // fields are per-op constants)
    void retarget(std::vector<uint8_t>* sink, uint64_t* hist,
                  uint64_t hist_base) {
        mem = sink;
        lut_hist = hist;
        lut_base = hist_base;
        n = 0;
        buf_pos = 0;
        ok = true;
    }

    bool open(const char* path, uint32_t fmt_, uint64_t kff_offset,
              uint32_t k_, uint32_t lpl_, uint32_t cs_,
              uint64_t ci_, uint64_t cx_, uint64_t csmax_, int64_t setv,
              uint64_t* hist) {
        fmt = fmt_;
        k = k_; lpl = fmt ? 0 : lpl_; cs = cs_;
        kb = (k + 3) / 4;
        sb = fmt ? kb : (k - lpl_) / 4;
        kw = (kb + 7) / 8;
        pad = kw * 8 - kb;
        ci = ci_; cx = cx_; csmax = csmax_;
        set_value = setv;
        lut_hist = hist;
        buf.resize(OUT_BUF_BYTES);
        if (fmt) {
            f = fopen(path, "r+b");
            if (!f) return false;
            if (fseeko(f, (off_t)kff_offset, SEEK_SET) != 0) {
                fclose(f);
                f = nullptr;
                return false;
            }
            return true;
        }
        f = fopen(path, "wb");
        if (!f) return false;
        if (fwrite("KMCS", 1, 4, f) != 4) {
            fclose(f);
            f = nullptr;
            return false;
        }
        return true;
    }

    void flush() {
        if (mem) {
            mem->insert(mem->end(), buf.data(), buf.data() + buf_pos);
            buf_pos = 0;
            return;
        }
        if (buf_pos && fwrite(buf.data(), 1, buf_pos, f) != buf_pos)
            ok = false;
        buf_pos = 0;
    }

    bool close() {
        flush();
        if (mem) return ok;
        if (fmt == 0 && fwrite("KMCS", 1, 4, f) != 4) ok = false;
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
        if (buf_pos + kw * 8 + cs + 16 > buf.size()) flush();
        uint8_t* out = buf.data() + buf_pos;
        if (fmt) {
            // KFF record: kb big-endian k-mer bytes + BE counter
            if (kw == 1) {
                uint64_t x = __builtin_bswap64(key.w[0] << (64 - 8 * kb));
                memcpy(out, &x, 8);  // first kb bytes are the k-mer
            } else {
                for (uint32_t wi = 0; wi < kw; ++wi) {
                    uint64_t x = __builtin_bswap64(key.w[wi]);
                    memcpy(out + wi * 8, &x, 8);
                }
                memmove(out, out + pad, kb);
            }
            for (int32_t j = (int32_t)cs - 1; j >= 0; --j) {
                out[kb + j] = (uint8_t)(cnt & 0xFF);
                cnt >>= 8;
            }
            buf_pos += kb + cs;
            ++n;
            return;
        }
        // KMC1 record: suffix bytes (BE) + LE counter + prefix histogram
        uint64_t prefix_id;
        if (kw == 1) {
            uint64_t v = key.w[0];
            if (sb) {
                uint64_t x = __builtin_bswap64(v << (64 - 8 * sb));
                memcpy(out, &x, 8);  // first sb bytes are the suffix
            }
            prefix_id = sb < 8 ? (v >> (8 * sb)) : 0;
        } else {
            uint8_t tmp[MAX_KW * 8];
            for (uint32_t wi = 0; wi < kw; ++wi) {
                uint64_t x = __builtin_bswap64(key.w[wi]);
                memcpy(tmp + wi * 8, &x, 8);
            }
            memcpy(out, tmp + pad + (kb - sb), sb);
            prefix_id = 0;
            for (uint32_t j = 0; j < kb - sb; ++j)
                prefix_id = (prefix_id << 8) | tmp[pad + j];
        }
        uint64_t c = cnt;
        for (uint32_t j = 0; j < cs; ++j) {
            out[sb + j] = (uint8_t)(c & 0xFF);
            c >>= 8;
        }
        buf_pos += sb + cs;
        ++lut_hist[prefix_id - lut_base];
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

// The one/two-stream merge loop of kst_op, sink-parameterized so the
// serial (file Writer) and chunk-parallel (memory Writer) paths share
// one body (reference: operations.h:85-258).
template <class Sink>
static void op_loop(Reader& ra, Reader* rb, int32_t op, int32_t mode,
                    int64_t set_value, Sink& w) {
    if (op == 0 || !rb) {
        while (ra.has) {
            w.put(ra.key(), ra.cnt());
            ra.pop();
        }
        return;
    }
    Reader& b = *rb;
    while (ra.has && b.has) {
        int c = key_cmp(ra.key(), b.key(), ra.kw);
        if (c < 0) {
            if (op == 1 || op == 3 || op == 4) w.put(ra.key(), ra.cnt());
            ra.pop();
        } else if (c > 0) {
            if (op == 1) w.put(b.key(), b.cnt());
            b.pop();
        } else {
            if (op != 3) {
                uint64_t cnt = combine(ra.cnt(), b.cnt(), mode);
                if (cnt > 0 || set_value >= 0) w.put(ra.key(), cnt);
            }
            ra.pop();
            b.pop();
        }
    }
    while (ra.has && (op == 1 || op == 3 || op == 4)) {
        w.put(ra.key(), ra.cnt());
        ra.pop();
    }
    while (b.has && op == 1) {
        w.put(b.key(), b.cnt());
        b.pop();
    }
}

// ---- chunk-parallel engine -------------------------------------------
//
// The reference's kmc_tools runs its KMC2 merge and set ops across -t
// threads (CMergerParent/CMergerChild + suf-bin reader threads,
// kmc_tools/kmc2_db_reader.h:400-560).  The native core's equivalent:
// the sorted key space is split at LUT-prefix boundaries into ~6*T
// chunks; workers claim chunks dynamically, run the IDENTICAL serial
// merge over prefix-clamped Readers into in-memory buffers, and the
// calling thread drains chunks in order (bounded by a sliding window, so
// memory stays O(threads * chunk)).  Chunk boundaries sit at prefix
// boundaries, so equal keys never straddle chunks and the concatenated
// output is byte-identical to the serial path's.

struct ChunkSlot {
    std::vector<uint8_t> bytes;
    std::vector<uint64_t> hist;  // output-LUT slice [hist_base, +size)
    uint64_t hist_base = 0;
    uint64_t n = 0;
    bool done = false;
};

// Chunk boundaries in plan_lpl prefix space, sized from the cumulative
// LUTs so every chunk holds ~equal record work.
static std::vector<uint64_t> plan_chunk_bounds(
        const InputSpec* const* ins, size_t n_ins, uint32_t plan_lpl,
        int32_t threads) {
    const uint64_t n_plan = 1ull << (2 * plan_lpl);
    std::vector<uint64_t> totals(n_plan, 0);
    for (size_t i = 0; i < n_ins; ++i) {
        const InputSpec* in = ins[i];
        const uint32_t shift = 2 * (in->lut_prefix_len - plan_lpl);
        for (uint64_t s = 0; s < in->n_sections; ++s) {
            const uu64* lut = in->luts + s * in->lut_size;
            for (uint64_t c = 0; c < n_plan; ++c)
                totals[c] += lut[(c + 1) << shift] - lut[c << shift];
        }
    }
    uint64_t total = 0;
    for (uint64_t v : totals) total += v;
    const uint64_t target = total / ((uint64_t)threads * 6) + 1;
    std::vector<uint64_t> bounds{0};
    uint64_t acc = 0;
    for (uint64_t c = 0; c < n_plan; ++c) {
        acc += totals[c];
        if (acc >= target && c + 1 < n_plan) {
            bounds.push_back(c + 1);
            acc = 0;
        }
    }
    bounds.push_back(n_plan);
    return bounds;
}

// Output-LUT window covered by plan-space prefix range [p0, p1).
static void hist_window(uint64_t p0, uint64_t p1, uint32_t plan_lpl,
                        uint32_t out_lpl, uint64_t& base, uint64_t& len) {
    if (out_lpl >= plan_lpl) {
        const uint32_t d = 2 * (out_lpl - plan_lpl);
        base = p0 << d;
        len = (p1 - p0) << d;
    } else {
        const uint32_t d = 2 * (plan_lpl - out_lpl);
        base = p0 >> d;
        len = ((p1 - 1) >> d) - base + 1;
    }
}

// Ordered chunk-parallel run: workers (one WorkerT each, reused across
// chunks) claim chunk ids; the calling thread drains slots in order into
// `f` and sums hist slices into lut_hist.  Returns total records or -1.
template <class WorkerT>
static int64_t run_chunked(const std::vector<uint64_t>& bounds,
                           int32_t threads, FILE* f, uint64_t* lut_hist,
                           const WorkerT& proto) {
    const size_t M = bounds.size() - 1;
    if ((size_t)threads > M) threads = (int32_t)M;
    std::vector<ChunkSlot> slots(M);
    std::atomic<size_t> next{0};
    std::atomic<size_t> drained{0};
    std::atomic<bool> fail{false};
    std::mutex mu;
    std::condition_variable cv_done, cv_window;
    const size_t WINDOW = (size_t)threads * 2 + 2;
    auto runner = [&]() {
        WorkerT w(proto);
        if (!w.init()) {
            fail = true;
            cv_done.notify_all();
            return;
        }
        for (;;) {
            size_t id = next.fetch_add(1);
            if (id >= M) break;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_window.wait(lk, [&] {
                    return drained.load() + WINDOW > id || fail.load();
                });
            }
            if (fail.load()) {
                std::lock_guard<std::mutex> lk(mu);
                slots[id].done = true;
            } else {
                if (!w.run_chunk(bounds[id], bounds[id + 1], slots[id]))
                    fail = true;
                std::lock_guard<std::mutex> lk(mu);
                slots[id].done = true;
            }
            cv_done.notify_all();
        }
        cv_done.notify_all();
    };
    std::vector<std::thread> pool;
    for (int32_t t = 0; t < threads; ++t) pool.emplace_back(runner);
    int64_t n_out = 0;
    for (size_t id = 0; id < M; ++id) {
        {
            std::unique_lock<std::mutex> lk(mu);
            cv_done.wait(lk, [&] { return slots[id].done || fail.load(); });
        }
        if (fail.load()) break;
        ChunkSlot& s = slots[id];
        if (!s.bytes.empty()
            && fwrite(s.bytes.data(), 1, s.bytes.size(), f)
                   != s.bytes.size())
            fail = true;
        if (lut_hist)
            for (size_t i = 0; i < s.hist.size(); ++i)
                lut_hist[s.hist_base + i] += s.hist[i];
        n_out += (int64_t)s.n;
        std::vector<uint8_t>().swap(s.bytes);
        std::vector<uint64_t>().swap(s.hist);
        {
            std::lock_guard<std::mutex> lk(mu);
            drained.store(id + 1);
        }
        cv_window.notify_all();
    }
    cv_window.notify_all();
    for (auto& th : pool) th.join();
    return fail.load() ? -1 : n_out;
}

struct OpWorker {
    const InputSpec* a = nullptr;
    const InputSpec* b = nullptr;
    int32_t op = 0, mode = 0;
    int64_t set_value = -1;
    uint32_t plan_lpl = 0, out_lpl = 0, out_cs = 0, out_fmt = 0;
    uint64_t out_ci = 1, out_cx = ~0ull, out_csmax = ~0ull;
    Reader ra, rb;
    Writer w;
    bool opened = false;

    OpWorker() = default;
    OpWorker(const OpWorker& o)
        : a(o.a), b(o.b), op(o.op), mode(o.mode), set_value(o.set_value),
          plan_lpl(o.plan_lpl), out_lpl(o.out_lpl), out_cs(o.out_cs),
          out_fmt(o.out_fmt), out_ci(o.out_ci), out_cx(o.out_cx),
          out_csmax(o.out_csmax) {}
    ~OpWorker() {
        if (opened) {
            ra.close();
            rb.close();
        }
    }

    bool init() {
        opened = true;
        if (!ra.open(a)) return false;
        if (b && !rb.open(b)) return false;
        w.open_mem(nullptr, out_fmt, a->kmer_len, out_lpl, out_cs,
                   out_ci, out_cx, out_csmax, set_value, nullptr, 0);
        return true;
    }

    bool run_chunk(uint64_t p0, uint64_t p1, ChunkSlot& s) {
        ra.reset_range(p0 << (2 * (a->lut_prefix_len - plan_lpl)),
                       p1 << (2 * (a->lut_prefix_len - plan_lpl)));
        if (b)
            rb.reset_range(p0 << (2 * (b->lut_prefix_len - plan_lpl)),
                           p1 << (2 * (b->lut_prefix_len - plan_lpl)));
        uint64_t base = 0, len = 0;
        if (out_fmt == 0) {
            hist_window(p0, p1, plan_lpl, out_lpl, base, len);
            s.hist.assign(len, 0);
        }
        s.hist_base = base;
        w.retarget(&s.bytes, out_fmt == 0 ? s.hist.data() : nullptr, base);
        op_loop(ra, b ? &rb : nullptr, op, mode, set_value, w);
        w.flush();
        s.n = w.n;
        return ra.ok && (!b || rb.ok) && w.ok;
    }
};

// Pull-based merger-network node of the complex-expression evaluator
// (the reference's CInput-over-CInput operation trees,
// expression_node.h:26-196, bundle.h:18-245, without intermediate
// databases); shared by the serial kst_expr and the chunk-parallel
// ExprWorker.
struct ENode {
    int32_t op = 0, mode = 0;
    ENode* l = nullptr;
    ENode* r = nullptr;
    Reader* rd = nullptr;
    bool has = false;
    Key key;
    uint64_t cnt = 0;

    void adv(uint32_t kw) {
        if (rd) {
            if (rd->has) {
                key = rd->key();
                cnt = rd->cnt();
                rd->pop();
                has = true;
            } else {
                has = false;
            }
            return;
        }
        step(kw);
    }

    void init(uint32_t kw) {
        if (rd) {
            adv(kw);
            return;
        }
        l->init(kw);
        r->init(kw);
        step(kw);
    }

    void step(uint32_t kw) {
        for (;;) {
            const bool lh = l->has, rh = r->has;
            if (lh && rh) {
                int c = key_cmp(l->key, r->key, kw);
                if (c < 0) {
                    if (op == 1 || op == 3 || op == 4) {
                        key = l->key;
                        cnt = l->cnt;
                        has = true;
                        l->adv(kw);
                        return;
                    }
                    l->adv(kw);
                    continue;
                }
                if (c > 0) {
                    if (op == 1) {
                        key = r->key;
                        cnt = r->cnt;
                        has = true;
                        r->adv(kw);
                        return;
                    }
                    r->adv(kw);
                    continue;
                }
                uint64_t cc = combine(l->cnt, r->cnt, mode);
                Key kk = l->key;
                l->adv(kw);
                r->adv(kw);
                if (op != 3 && cc > 0) {
                    key = kk;
                    cnt = cc;
                    has = true;
                    return;
                }
                continue;
            }
            if (lh) {
                if (op == 1 || op == 3 || op == 4) {
                    key = l->key;
                    cnt = l->cnt;
                    has = true;
                    l->adv(kw);
                    return;
                }
                has = false;
                return;
            }
            if (rh && op == 1) {
                key = r->key;
                cnt = r->cnt;
                has = true;
                r->adv(kw);
                return;
            }
            has = false;
            return;
        }
    }
};

// "ACGT...\tCOUNT\n" record formatter (dump_writer.h:241), shared by the
// serial and chunk-parallel dump paths.
struct TextFmt {
    uint32_t k = 0, kb = 0, kw = 0, pad = 0, lead = 0, kb_shift = 0;
    uint8_t lut4[256][4];
    char dd[100][2];

    void init(uint32_t k_, uint32_t kw_, uint32_t kb_, uint32_t pad_) {
        k = k_;
        kw = kw_;
        kb = kb_;
        pad = pad_;
        kb_shift = 64 - 8 * kb;
        static const char BASES[4] = {'A', 'C', 'G', 'T'};
        for (uint32_t b = 0; b < 256; ++b) {
            lut4[b][0] = (uint8_t)BASES[(b >> 6) & 3];
            lut4[b][1] = (uint8_t)BASES[(b >> 4) & 3];
            lut4[b][2] = (uint8_t)BASES[(b >> 2) & 3];
            lut4[b][3] = (uint8_t)BASES[b & 3];
        }
        // the first used byte holds ((k-1)%4)+1 symbols, the rest 4 each
        lead = ((k - 1) & 3) + 1;
        for (int d = 0; d < 100; ++d) {
            dd[d][0] = (char)('0' + d / 10);
            dd[d][1] = (char)('0' + d % 10);
        }
    }

    // caller guarantees k + 32 bytes of space at `out`
    size_t emit(const Key& key, uint64_t c, uint8_t* out) const {
        uint8_t tmp[MAX_KW * 8 + 8];
        const uint8_t* kb_bytes;
        if (kw == 1) {
            uint64_t x = __builtin_bswap64(key.w[0] << kb_shift);
            memcpy(tmp, &x, 8);
            kb_bytes = tmp;
        } else {
            for (uint32_t wi = 0; wi < kw; ++wi) {
                uint64_t x = __builtin_bswap64(key.w[wi]);
                memcpy(tmp + wi * 8, &x, 8);
            }
            kb_bytes = tmp + pad;
        }
        memcpy(out, lut4[kb_bytes[0]] + (4 - lead), lead);
        uint8_t* o = out + lead;
        for (uint32_t j = 1; j < kb; ++j, o += 4)
            memcpy(o, lut4[kb_bytes[j]], 4);
        out[k] = '\t';
        uint32_t nd;
        if (c < 10) {
            out[k + 1] = (char)('0' + c);
            nd = 1;
        } else if (c < 100) {
            memcpy(out + k + 1, dd[c], 2);
            nd = 2;
        } else if (c < 1000) {
            out[k + 1] = (char)('0' + c / 100);
            memcpy(out + k + 2, dd[c % 100], 2);
            nd = 3;
        } else {
            char num[24];
            nd = 0;
            do {
                num[nd++] = (char)('0' + c % 10);
                c /= 10;
            } while (c);
            for (uint32_t j = 0; j < nd; ++j)
                out[k + 1 + j] = (uint8_t)num[nd - 1 - j];
        }
        out[k + 1 + nd] = '\n';
        return k + 2 + nd;
    }
};

struct DumpWorker {
    const InputSpec* a = nullptr;
    uint32_t plan_lpl = 0;
    Reader r;
    TextFmt fmt;
    bool opened = false;

    DumpWorker() = default;
    DumpWorker(const DumpWorker& o) : a(o.a), plan_lpl(o.plan_lpl) {}
    ~DumpWorker() {
        if (opened) r.close();
    }

    bool init() {
        opened = true;
        if (!r.open(a)) return false;
        fmt.init(r.k, r.kw, r.kb, r.pad);
        return true;
    }

    bool run_chunk(uint64_t p0, uint64_t p1, ChunkSlot& s) {
        const uint32_t sh = 2 * (a->lut_prefix_len - plan_lpl);
        r.reset_range(p0 << sh, p1 << sh);
        size_t pos = 0;
        uint64_t n = 0;
        while (r.has) {
            if (pos + fmt.k + 32 > s.bytes.size())
                s.bytes.resize(std::max<size_t>(s.bytes.size() * 2,
                                                64 << 10));
            pos += fmt.emit(r.key(), r.cnt(), s.bytes.data() + pos);
            ++n;
            r.pop();
        }
        s.bytes.resize(pos);
        s.n = n;
        return r.ok;
    }
};

// Chunk-parallel complex-expression worker: its own leaf Readers + node
// network, re-clamped and re-primed per chunk.
struct ExprWorker {
    const InputSpec* inputs = nullptr;
    const int32_t* prog = nullptr;
    int32_t n_nodes = 0;
    uint32_t plan_lpl = 0, out_lpl = 0, out_cs = 0, out_fmt = 0;
    uint64_t out_ci = 1, out_cx = ~0ull, out_csmax = ~0ull;
    std::vector<ENode> nodes;
    std::vector<Reader*> readers;
    std::vector<const InputSpec*> leaf_in;  // per reader
    Writer w;
    uint32_t kw = 0;
    bool opened = false;

    ExprWorker() = default;
    ExprWorker(const ExprWorker& o)
        : inputs(o.inputs), prog(o.prog), n_nodes(o.n_nodes),
          plan_lpl(o.plan_lpl), out_lpl(o.out_lpl), out_cs(o.out_cs),
          out_fmt(o.out_fmt), out_ci(o.out_ci), out_cx(o.out_cx),
          out_csmax(o.out_csmax) {}
    ~ExprWorker() {
        for (Reader* rd : readers) {
            rd->close();
            delete rd;
        }
    }

    bool init() {
        opened = true;
        nodes.resize(n_nodes);
        bool ok = true;
        for (int32_t i = 0; i < n_nodes; ++i) {
            const int32_t kind = prog[4 * i];
            if (kind == 0) {
                Reader* rd = new Reader();
                readers.push_back(rd);
                leaf_in.push_back(&inputs[prog[4 * i + 1]]);
                if (!rd->open(&inputs[prog[4 * i + 1]])) ok = false;
                nodes[i].rd = rd;
                kw = rd->kw;
            } else {
                nodes[i].op = kind;
                nodes[i].mode = prog[4 * i + 3];
                nodes[i].l = &nodes[prog[4 * i + 1]];
                nodes[i].r = &nodes[prog[4 * i + 2]];
            }
        }
        w.open_mem(nullptr, out_fmt, inputs[0].kmer_len, out_lpl, out_cs,
                   out_ci, out_cx, out_csmax, -1, nullptr, 0);
        return ok;
    }

    bool run_chunk(uint64_t p0, uint64_t p1, ChunkSlot& s) {
        for (size_t i = 0; i < readers.size(); ++i) {
            const uint32_t sh = 2 * (leaf_in[i]->lut_prefix_len - plan_lpl);
            readers[i]->reset_range(p0 << sh, p1 << sh);
        }
        uint64_t base = 0, len = 0;
        if (out_fmt == 0) {
            hist_window(p0, p1, plan_lpl, out_lpl, base, len);
            s.hist.assign(len, 0);
        }
        s.hist_base = base;
        w.retarget(&s.bytes, out_fmt == 0 ? s.hist.data() : nullptr, base);
        ENode& root = nodes[n_nodes - 1];
        root.init(kw);
        while (root.has) {
            w.put(root.key, root.cnt);
            root.adv(kw);
        }
        w.flush();
        s.n = w.n;
        bool ok = w.ok;
        for (Reader* rd : readers) ok = ok && rd->ok;
        return ok;
    }
};

// W-specialized scan loop of kst_counters_for_seq_wide (below) — the
// sorted-row fallback (KFF RA / in-memory rows); same W-unrolling and
// byte-swap serialization rationale as binned_scan.
template <uint32_t W>
static void wide_scan(const uint8_t* seq, int64_t seq_len, uint32_t k,
                      int32_t both_strands, const uint8_t* key_rows,
                      uint32_t kb, const uint32_t* counts, uint64_t n_keys,
                      const uint64_t* idx16, const uint64_t* keys0,
                      uint32_t* out, const uint8_t* code) {
    const uint32_t top_bits = 2 * k - 64 * (W - 1);  // bits used in word 0
    const uint64_t top_mask =
        (top_bits >= 64) ? ~0ull : ((1ull << top_bits) - 1);
    const uint32_t ins_word = W - 1 - (2 * k - 2) / 64;  // rc insert slot
    const uint32_t ins_bit = (2 * k - 2) % 64;
    uint64_t fwd[W] = {0}, rc[W] = {0};
    int64_t last_bad = -1;
    for (int64_t i = 0; i < seq_len; ++i) {
        uint64_t c = code[seq[i]];
        if (c >= 4) {
            last_bad = i;
            c = 0;
        }
        for (uint32_t w = 0; w + 1 < W; ++w)
            fwd[w] = (fwd[w] << 2) | (fwd[w + 1] >> 62);
        fwd[W - 1] = (fwd[W - 1] << 2) | c;
        fwd[0] &= top_mask;
        for (uint32_t w = W - 1; w > 0; --w)
            rc[w] = (rc[w] >> 2) | (rc[w - 1] << 62);
        rc[0] >>= 2;
        rc[ins_word] |= (3 - c) << ins_bit;
        int64_t wpos = i - (int64_t)k + 1;
        if (wpos < 0) continue;
        if (last_bad >= wpos) {
            out[wpos] = 0;
            continue;
        }
        const uint64_t* v = fwd;
        if (both_strands) {
            for (uint32_t w = 0; w < W; ++w) {
                if (rc[w] < fwd[w]) { v = rc; break; }
                if (rc[w] > fwd[w]) break;
            }
        }
        // big-endian needle: per-word byte swap, then the last kb bytes
        uint64_t bew[W];
        for (uint32_t w = 0; w < W; ++w)
            bew[w] = __builtin_bswap64(v[w]);
        const uint8_t* need = (const uint8_t*)bew + (8 * W - kb);
        uint64_t lo = 0, len = n_keys;
        if (idx16) {
            uint64_t t = ((uint64_t)need[0] << 8) | need[1];
            lo = idx16[t];
            len = idx16[t + 1] - lo;
        }
        if (keys0) {
            const uint64_t nk0 = load_be64(need);  // kb >= 9 for k >= 33
            while (len > 1) {
                uint64_t half = len / 2;
                lo += (keys0[lo + half - 1] < nk0) ? half : 0;
                len -= half;
            }
            uint32_t c_out = 0;
            if (len && keys0[lo] == nk0) {
                while (lo < n_keys && keys0[lo] == nk0) {
                    int c = memcmp(key_rows + lo * kb + 8, need + 8, kb - 8);
                    if (c == 0) { c_out = counts[lo]; break; }
                    if (c > 0) break;
                    ++lo;
                }
            }
            out[wpos] = c_out;
            continue;
        }
        while (len > 1) {
            uint64_t half = len / 2;
            lo += (memcmp(key_rows + (lo + half - 1) * kb, need, kb) < 0)
                      ? half : 0;
            len -= half;
        }
        out[wpos] = (len && !memcmp(key_rows + lo * kb, need, kb))
                        ? counts[lo] : 0;
    }
}

// W-specialized scan loop of kst_counters_for_seq_binned (below): W as
// a template constant fully unrolls the multi-word rolling-window
// updates (a runtime-W inner loop carries ~3x the per-byte cost at
// k>32), and the canonical needle serializes via per-word byte swaps
// instead of a per-byte shift loop.
template <uint32_t W>
static void binned_scan(
        const uint8_t* seq, int64_t seq_len, uint32_t k,
        int32_t both_strands, const uint32_t* norms, uint32_t m,
        const int32_t* sig_map, const uu64* luts,
        uint32_t lut_prefix_len, const uint8_t* records,
        uint64_t n_records, uint32_t counter_size,
        const uint64_t* aux_luts, uint32_t aux_bits, uint32_t* out,
        const uint8_t* code, uint64_t* idx2_buf, uint8_t* need_buf) {
    const uint32_t kb = (k + 3) / 4;
    const uint32_t sb = (k - lut_prefix_len) / 4;  // suffix bytes
    const uint32_t pb = kb - sb;                   // prefix bytes
    const uint32_t rec_bytes = sb + counter_size;
    const uint32_t top_bits = 2 * k - 64 * (W - 1);
    const uint64_t top_mask =
        (top_bits >= 64) ? ~0ull : ((1ull << top_bits) - 1);
    const uint32_t ins_word = W - 1 - (2 * k - 2) / 64;
    const uint32_t ins_bit = (2 * k - 2) % 64;
    const uint32_t mmask = m ? (1u << (2 * m)) - 1 : 0;
    const int64_t win = m ? (int64_t)(k - m + 1) : 1;  // m-mers per window

    uint64_t fwd[W] = {0}, rc[W] = {0};
    uint32_t mm = 0;  // rolling 2m-bit m-mer
    // monotonic deque of (m-mer position, norm): front = window min
    std::vector<int64_t> dq_pos(win + 1);
    std::vector<uint32_t> dq_val(win + 1);
    size_t dq_h = 0, dq_t = 0;
    int64_t last_bad = -1;
    for (int64_t i = 0; i < seq_len; ++i) {
        uint64_t c = code[seq[i]];
        bool bad = c >= 4;
        if (bad) {
            last_bad = i;
            c = 0;
        }
        for (uint32_t w = 0; w + 1 < W; ++w)
            fwd[w] = (fwd[w] << 2) | (fwd[w + 1] >> 62);
        fwd[W - 1] = (fwd[W - 1] << 2) | c;
        fwd[0] &= top_mask;
        for (uint32_t w = W - 1; w > 0; --w)
            rc[w] = (rc[w] >> 2) | (rc[w - 1] << 62);
        rc[0] >>= 2;
        rc[ins_word] |= (3 - c) << ins_bit;
        mm = ((mm << 2) | (uint32_t)c) & mmask;
        int64_t mpos = i - (int64_t)m + 1;  // m-mer ending at i
        if (m && mpos >= 0) {
            // norm of this m-mer (bad m-mers only ever reach bad windows)
            uint32_t v = bad ? ~0u : norms[mm];
            while (dq_t > dq_h && dq_val[dq_t - 1] >= v) --dq_t;
            if (dq_t == dq_pos.size()) {  // compact (bounded by win+1 live)
                size_t n_live = dq_t - dq_h;
                memmove(dq_pos.data(), dq_pos.data() + dq_h,
                        n_live * sizeof(int64_t));
                memmove(dq_val.data(), dq_val.data() + dq_h,
                        n_live * sizeof(uint32_t));
                dq_h = 0;
                dq_t = n_live;
            }
            dq_pos[dq_t] = mpos;
            dq_val[dq_t] = v;
            ++dq_t;
        }
        int64_t wpos = i - (int64_t)k + 1;  // k-window ending at i
        if (wpos < 0) continue;
        while (dq_h < dq_t && dq_pos[dq_h] < wpos) ++dq_h;  // expire front
        if (last_bad >= wpos) {
            out[wpos] = 0;
            continue;
        }
        int32_t bin = 0;
        if (m) {
            const uint32_t sig = dq_val[dq_h];  // window min norm
            bin = sig_map[sig];
            if (bin < 0) {
                out[wpos] = 0;
                continue;
            }
        }
        const uint64_t* v = fwd;
        if (both_strands) {
            for (uint32_t w = 0; w < W; ++w) {
                if (rc[w] < fwd[w]) { v = rc; break; }
                if (rc[w] > fwd[w]) break;
            }
        }
        // big-endian needle: per-word byte swap, then the last kb bytes
        uint64_t bew[W];
        for (uint32_t w = 0; w < W; ++w)
            bew[w] = __builtin_bswap64(v[w]);
        const uint8_t* need = (const uint8_t*)bew + (8 * W - kb);
        uint64_t prefix = 0;
        for (uint32_t j = 0; j < pb; ++j)
            prefix = (prefix << 8) | need[j];
        const uint64_t idx =
            ((uint64_t)bin << (2 * lut_prefix_len)) | prefix;
        if (aux_luts) {
            // pipelined path: stage the aux index + needle; lookups run
            // in later prefetch-ahead passes (the two dependent DRAM
            // misses per window overlap ACROSS windows instead of
            // serializing within one)
            idx2_buf[wpos] =
                (idx << aux_bits) | (need[pb] >> (8 - aux_bits));
            memcpy(need_buf + (size_t)wpos * sb, need + pb, sb);
            continue;
        }
        uint64_t lo = luts[idx], hi = luts[idx + 1];
        if (hi > n_records) hi = n_records;
        uint32_t c_out = 0;
        const uint8_t* sfx = need + pb;
        while (lo < hi) {
            uint64_t mid = (lo + hi) / 2;
            int cmp = memcmp(records + mid * rec_bytes, sfx, sb);
            if (cmp < 0) lo = mid + 1;
            else if (cmp > 0) hi = mid;
            else {
                // byte-wise LE decode: an 8-byte load would overrun the
                // records buffer at the final record (no slack bytes)
                uint32_t cc = counter_size ? 0 : 1;
                for (int32_t j = (int32_t)counter_size - 1; j >= 0; --j)
                    cc = (cc << 8)
                         | records[mid * rec_bytes + sb + (uint32_t)j];
                c_out = cc;
                break;
            }
        }
        out[wpos] = c_out;
    }
}

}  // namespace

extern "C" {

// op: 0 copy (single input), 1 union, 2 intersect, 3 kmers_subtract,
//     4 counters_subtract.  mode: 0 min, 1 max, 2 sum, 3 diff, 4 left,
//     5 right.  set_value >= 0: fixed counter (set_counts).
// out_format 0: writes "KMCS"+records+"KMCS" to out_path and accumulates
// the output prefix histogram into lut_hist (4^out_lpl zeroed slots).
// out_format 1: appends KFF raw records (BE k-mer + BE counter) to the
// existing file at out_offset (lut_hist unused).
// Returns the record count, or -1 on error.
void kst_set_threads(int32_t t) {
    g_threads.store(t >= 0 ? t : 1, std::memory_order_relaxed);
}

int64_t kst_op(const InputSpec* a, const InputSpec* b, int32_t op,
               int32_t mode, const char* out_path, uint32_t out_format,
               uint64_t out_offset, uint32_t out_lpl,
               uint32_t out_cs, uint64_t out_ci, uint64_t out_cx,
               uint64_t out_csmax, int64_t set_value, uint64_t* lut_hist) {
    const int32_t threads = resolve_threads();
    if (threads > 1 && a->format == 0 && (op == 0 || (b && b->format == 0))
        && a->lut_prefix_len > 0
        && (op == 0 || b->lut_prefix_len > 0)) {
        // chunk-parallel path (KMC-format inputs carry the LUTs the
        // planner and prefix clamps need; KFF inputs stay serial)
        uint32_t plan_lpl = a->lut_prefix_len;
        if (op != 0) plan_lpl = std::min(plan_lpl, b->lut_prefix_len);
        if (plan_lpl > 8) plan_lpl = 8;
        const InputSpec* ins[2] = {a, b};
        auto bounds = plan_chunk_bounds(ins, op == 0 ? 1 : 2, plan_lpl,
                                        threads);
        FILE* f;
        if (out_format) {
            f = fopen(out_path, "r+b");
            if (!f) return -1;
            if (fseeko(f, (off_t)out_offset, SEEK_SET) != 0) {
                fclose(f);
                return -1;
            }
        } else {
            f = fopen(out_path, "wb");
            if (!f) return -1;
            if (fwrite("KMCS", 1, 4, f) != 4) {
                fclose(f);
                return -1;
            }
        }
        OpWorker proto;
        proto.a = a;
        proto.b = op == 0 ? nullptr : b;
        proto.op = op;
        proto.mode = mode;
        proto.set_value = set_value;
        proto.plan_lpl = plan_lpl;
        proto.out_lpl = out_lpl;
        proto.out_cs = out_cs;
        proto.out_fmt = out_format;
        proto.out_ci = out_ci;
        proto.out_cx = out_cx;
        proto.out_csmax = out_csmax;
        int64_t n = run_chunked(bounds, threads, f, lut_hist, proto);
        bool ok = n >= 0;
        if (out_format == 0 && ok && fwrite("KMCS", 1, 4, f) != 4)
            ok = false;
        if (fclose(f) != 0) ok = false;
        return ok ? n : -1;
    }
    Reader ra;
    if (!ra.open(a)) { ra.close(); return -1; }
    Writer w;
    if (!w.open(out_path, out_format, out_offset, a->kmer_len, out_lpl,
                out_cs, out_ci, out_cx, out_csmax, set_value, lut_hist)) {
        ra.close();
        return -1;
    }
    if (op == 0) {
        op_loop(ra, nullptr, op, mode, set_value, w);
    } else {
        Reader rb;
        if (!b || !rb.open(b)) {
            ra.close();
            rb.close();
            w.close();
            return -1;
        }
        op_loop(ra, &rb, op, mode, set_value, w);
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
// sorted_order != 0: globally sorted merge (chunk-parallel under -t);
// 0: file (listing) order (inherently serial: bin-major order).
int64_t kst_dump(const InputSpec* a, const char* out_path,
                 int32_t sorted_order) {
    const int32_t threads = resolve_threads();
    if (threads > 1 && sorted_order != 0 && a->format == 0
        && a->lut_prefix_len > 0) {
        uint32_t plan_lpl = std::min<uint32_t>(a->lut_prefix_len, 8);
        const InputSpec* ins[1] = {a};
        auto bounds = plan_chunk_bounds(ins, 1, plan_lpl, threads);
        FILE* f = fopen(out_path, "wb");
        if (!f) return -1;
        DumpWorker proto;
        proto.a = a;
        proto.plan_lpl = plan_lpl;
        int64_t n = run_chunked(bounds, threads, f, nullptr, proto);
        if (fclose(f) != 0) n = -1;
        return n;
    }
    Reader r;
    r.sequential = sorted_order == 0;
    if (!r.open(a)) { r.close(); return -1; }
    FILE* f = fopen(out_path, "wb");
    if (!f) { r.close(); return -1; }
    std::vector<uint8_t> buf(OUT_BUF_BYTES);
    size_t pos = 0;
    TextFmt fmt;
    fmt.init(r.k, r.kw, r.kb, r.pad);
    int64_t n = 0;
    bool ok = true;
    while (r.has) {
        if (pos + fmt.k + 32 > buf.size()) {
            if (fwrite(buf.data(), 1, pos, f) != pos) { ok = false; break; }
            pos = 0;
        }
        pos += fmt.emit(r.key(), r.cnt(), buf.data() + pos);
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
    const uint32_t k = a->kmer_len, cs = a->counter_size;
    const uint32_t kb = (k + 3) / 4;
    const uint32_t sb = a->format ? kb : (k - a->lut_prefix_len) / 4;
    const uint32_t rec_bytes = sb + cs;
    const uint64_t ci = a->ci ? a->ci : 1, cx = a->cx;
    const uint64_t cnt_mask = cs >= 8 ? ~0ull : ((1ull << (8 * cs)) - 1);
    int64_t n = 0;
    std::vector<uint8_t> buf((4u << 20) / rec_bytes * rec_bytes + 8);
    // section spans: KMC = one global record range; KFF = per-section
    uint64_t n_spans = a->format ? a->n_sections : 1;
    for (uint64_t si = 0; si < n_spans; ++si) {
        uint64_t lo, hi;
        off_t base;
        if (a->format) {
            lo = 0;
            hi = a->sec_counts[si];
            base = (off_t)a->sec_offsets[si];
        } else {
            uint8_t marker[4];
            if (pread(fd, marker, 4, 0) != 4
                || memcmp(marker, "KMCS", 4) != 0) {
                ::close(fd);
                return -1;
            }
            lo = a->luts[0];
            hi = a->luts[a->n_sections * a->lut_size];
            base = 4;
        }
        for (uint64_t pos = lo; pos < hi;) {
            uint64_t want = (buf.size() - 8) / rec_bytes;
            if (want > hi - pos) want = hi - pos;
            ssize_t got = pread(fd, buf.data(), want * rec_bytes,
                                base + (off_t)pos * rec_bytes);
            if (got < (ssize_t)(want * rec_bytes)) { ::close(fd); return -1; }
            const uint8_t* p = buf.data() + sb;
            for (uint64_t i = 0; i < want; ++i, p += rec_bytes) {
                uint64_t c = 1;
                if (cs)
                    c = a->format ? (load_be64(p) >> (64 - 8 * cs))
                                  : (load_le64(p) & cnt_mask);
                if (c < ci || c > cx) continue;
                ++hist[c < hist_len ? c : hist_len - 1];
                ++n;
            }
            pos += want;
        }
    }
    ::close(fd);
    return n;
}

// ACGT->2-bit code table shared by the seq-counter entry points.  These
// are called GIL-released from multiple Python threads, so the table is
// built under C++11 magic-statics (thread-safe one-time init) instead of
// an unsynchronized `static bool init` flag.
static const uint8_t* kst_code_table() {
    struct Tbl {
        uint8_t code[256];
        Tbl() {
            memset(code, 4, sizeof(code));
            code['A'] = code['a'] = 0;
            code['C'] = code['c'] = 1;
            code['G'] = code['g'] = 2;
            code['T'] = code['t'] = 3;
        }
    };
    static const Tbl tbl;
    return tbl.code;
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
    const uint8_t* code = kst_code_table();
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

// Wide-key variant of kst_counters_for_seq for k in (32, 256]: the same
// windowed lookup the reference serves through multi-word CKmerAPI keys
// (kmc_api/kmc_file.cpp:1193, kmer_api.h:28-35).  The RA index here is
// the raw sorted (n_keys x kb) byte-row array of the API's packing
// (k codes right-aligned in kb = ceil(k/4) big-endian bytes), so
// lexicographic memcmp == numeric compare and no key re-encoding is
// needed.  Rolling state: W = ceil(k/32) u64 words per strand, word 0
// most significant; the canonical needle is serialized big-endian and
// binary-searched with memcmp, narrowed by the idx16 jump on the first
// two needle bytes (same table shape as the k<=32 path).
// keys0 (optional, else null): per-row big-endian u64 of the first 8 row
// bytes — the binary search runs on u64 compares (the same inner loop as
// the k<=32 path) and only the rare equal-keys0 run falls back to tail
// memcmp.  Measured 4x over the all-memcmp search at k=55.
int64_t kst_counters_for_seq_wide(const uint8_t* seq, int64_t seq_len,
                                  uint32_t k, int32_t both_strands,
                                  const uint8_t* key_rows, uint32_t kb,
                                  const uint32_t* counts, uint64_t n_keys,
                                  const uint64_t* idx16,
                                  const uint64_t* keys0, uint32_t* out) {
    if (k < 33 || k > 256 || seq_len < (int64_t)k) return 0;
    if (kb != (k + 3) / 4) return -1;
    const uint8_t* code = kst_code_table();
    const uint32_t W = (k + 31) / 32;
    const int64_t n = seq_len - k + 1;
    std::atomic<bool> bad_w{false};
    auto run_span = [&](int64_t w0, int64_t w1) {
#define KST_WIDE_CASE(WW)                                                 \
    case WW:                                                              \
        wide_scan<WW>(seq + w0, (w1 - w0) + (int64_t)k - 1, k,            \
                      both_strands, key_rows, kb, counts, n_keys, idx16,  \
                      keys0, out + w0, code);                             \
        break;
        switch (W) {
            KST_WIDE_CASE(2)
            KST_WIDE_CASE(3)
            KST_WIDE_CASE(4)
            KST_WIDE_CASE(5)
            KST_WIDE_CASE(6)
            KST_WIDE_CASE(7)
            KST_WIDE_CASE(8)
            default: bad_w = true; return;
        }
#undef KST_WIDE_CASE
    };
    const int32_t threads = resolve_threads();
    const int64_t MIN_SPAN = 1 << 19;
    int64_t n_spans =
        threads > 1 ? std::min<int64_t>(threads, n / MIN_SPAN) : 1;
    if (n_spans > 1) {
        const int64_t per = (n + n_spans - 1) / n_spans;
        std::vector<std::thread> pool;
        for (int64_t t = 0; t < n_spans; ++t) {
            int64_t w0 = t * per, w1 = std::min(n, w0 + per);
            if (w0 >= w1) break;
            pool.emplace_back(run_span, w0, w1);
        }
        for (auto& th : pool) th.join();
    } else {
        run_span(0, n);
    }
    return bad_w ? 0 : n;
}

// Binned windowed lookup over the RAW KMC2 on-disk layout — the exact
// query shape of the reference's CKMCFile::GetCountersForRead
// (kmc_file.cpp:1193 -> per-k-mer CheckKmer, :1321): per-window
// signature (sliding min of canonical m-mer norms) -> sig_map bin ->
// prefix LUT range -> binary search over the suffix bytes of a few
// records.  No global sort, no row materialization: `records` is the
// .kmc_suf body as stored (suffix+counter rows, bin-major), `luts` the
// cumulative per-(bin, prefix) boundaries, `norms` the 4^m canonical
// norm table (built by kmc_tpu/signatures.py::norm_table — identical
// semantics guaranteed by construction).  Serves ANY k (multi-word
// rolling window).  Windows broken by non-ACGT get counter 0.
// aux_luts (optional, else null): cumulative boundaries extended by the
// first aux_bits (1..8) bits of suffix byte 0 — up to 256x finer than
// the on-disk LUT, so the typical search range is 0-2 records (one
// memcmp) instead of the ~4^(9-lpl) a coarse lpl leaves.  Built by
// native_tools.build_aux_luts in one vectorized pass at open.
int64_t kst_counters_for_seq_binned(
        const uint8_t* seq, int64_t seq_len, uint32_t k,
        int32_t both_strands, const uint32_t* norms, uint32_t sig_len,
        const int32_t* sig_map, const uu64* luts,
        uint32_t lut_prefix_len, const uint8_t* records,
        uint64_t n_records, uint32_t counter_size,
        const uint64_t* aux_luts, uint32_t aux_bits, uint32_t* out) {
    // sig_len == 0: KMC1 layout — no signature routing, the LUT is
    // prefix-only (bin 0); otherwise the KMC2 signature->bin chain
    if (sig_len && k < sig_len) return 0;
    if (k < 2 || k > 256 || seq_len < (int64_t)k) return 0;
    const uint8_t* code = kst_code_table();
    const uint32_t m = sig_len;
    const uint32_t sb = (k - lut_prefix_len) / 4;  // suffix bytes
    const uint32_t rec_bytes = sb + counter_size;
    const uint32_t W = (k + 31) / 32;
    const int64_t n = seq_len - k + 1;
    // Blocked execution: the aux-mode staging buffers (idx2/lo/hi/needle
    // per window) are allocated ONCE at block size and reused — sizing
    // them to the whole call costs more in page faults + cold writes
    // than the lookups themselves on multi-MB sequences.  Each block
    // re-warms k-1 rolling bytes (negligible) and resolves its windows
    // while the staging bytes are still cache-warm.  Window spans are
    // independent, so spans fan out across resolve_threads() workers
    // (same -t plumbing as the chunk-parallel tools drivers).
    const int64_t BLOCK = 1 << 19;  // windows per block
    std::atomic<bool> bad_w{false};  // W out of range (same for all spans)
    auto run_span = [&](int64_t w0, int64_t w1) {
        const int64_t span_n = w1 - w0;
        const int64_t nb_max =
            (aux_luts && span_n > BLOCK) ? BLOCK : span_n;
        // per-window aux index (~0 = broken/absent window, counter
        // stays 0) + suffix needle
        std::vector<uint64_t> idx2_buf, lo_buf, hi_buf;
        std::vector<uint8_t> need_buf;
        if (aux_luts) {
            idx2_buf.resize(nb_max);
            lo_buf.resize(nb_max);
            hi_buf.resize(nb_max);
            need_buf.resize((size_t)nb_max * sb);
        }
        for (int64_t s0 = w0; s0 < w1; s0 += nb_max) {
            const int64_t nb = (w1 - s0 < nb_max) ? w1 - s0 : nb_max;
            if (aux_luts) {
                std::fill(idx2_buf.begin(), idx2_buf.begin() + nb, ~0ull);
                memset(out + s0, 0, (size_t)nb * 4);
            }
#define KST_BINNED_CASE(WW)                                               \
    case WW:                                                              \
        binned_scan<WW>(seq + s0, nb + (int64_t)k - 1, k, both_strands,   \
                        norms, m, sig_map, luts, lut_prefix_len, records, \
                        n_records, counter_size, aux_luts, aux_bits,      \
                        out + s0, code, idx2_buf.data(),                  \
                        need_buf.data());                                 \
        break;
            switch (W) {
                KST_BINNED_CASE(1)
                KST_BINNED_CASE(2)
                KST_BINNED_CASE(3)
                KST_BINNED_CASE(4)
                KST_BINNED_CASE(5)
                KST_BINNED_CASE(6)
                KST_BINNED_CASE(7)
                KST_BINNED_CASE(8)
                default: bad_w = true; return;
            }
#undef KST_BINNED_CASE
            if (!aux_luts) continue;
            constexpr int64_t PF = 24;
            const uint64_t SKIP = ~0ull;
            uint32_t* out_b = out + s0;
            // pass B1: aux ranges, prefetched ahead; prefetch each
            // range's first record row as its bounds arrive
            for (int64_t j = 0; j < nb; ++j) {
                if (j + PF < nb && idx2_buf[j + PF] != SKIP)
                    __builtin_prefetch(&aux_luts[idx2_buf[j + PF]]);
                const uint64_t x = idx2_buf[j];
                if (x == SKIP) continue;
                uint64_t lo = aux_luts[x], hi = aux_luts[x + 1];
                if (hi > n_records) hi = n_records;
                lo_buf[j] = lo;
                hi_buf[j] = hi;
                if (lo < hi)
                    __builtin_prefetch(records + lo * rec_bytes);
            }
            // pass B2: resolve (ranges ~1 record; rows usually cached)
            for (int64_t j = 0; j < nb; ++j) {
                if (idx2_buf[j] == SKIP) continue;
                uint64_t lo = lo_buf[j], hi = hi_buf[j];
                const uint8_t* sfx = need_buf.data() + (size_t)j * sb;
                uint32_t c_out = 0;
                while (lo < hi) {
                    uint64_t mid = (lo + hi) / 2;
                    int cmp = memcmp(records + mid * rec_bytes, sfx, sb);
                    if (cmp < 0) lo = mid + 1;
                    else if (cmp > 0) hi = mid;
                    else {
                        uint32_t cc = counter_size ? 0 : 1;
                        for (int32_t t = (int32_t)counter_size - 1;
                             t >= 0; --t)
                            cc = (cc << 8)
                                 | records[mid * rec_bytes + sb
                                           + (uint32_t)t];
                        c_out = cc;
                        break;
                    }
                }
                out_b[j] = c_out;
            }
        }
    };
    const int32_t threads = resolve_threads();
    int64_t n_spans =
        threads > 1 ? std::min<int64_t>(threads, n / BLOCK) : 1;
    if (n_spans > 1) {
        const int64_t per = (n + n_spans - 1) / n_spans;
        std::vector<std::thread> pool;
        for (int64_t t = 0; t < n_spans; ++t) {
            int64_t w0 = t * per, w1 = std::min(n, w0 + per);
            if (w0 >= w1) break;
            pool.emplace_back(run_span, w0, w1);
        }
        for (auto& th : pool) th.join();
    } else {
        run_span(0, n);
    }
    return bad_w ? 0 : n;
}

// Single-pass complex-expression evaluation: the parenthesized set
// algebra runs as a pull-based merger network (each internal node is an
// incremental 2-stream merge; leaves are Readers) — the reference's
// CInput-over-CInput operation trees (expression_node.h:26-196,
// bundle.h:18-245) without intermediate databases.
// prog: n_nodes * 4 int32s [kind, a, b, mode]; kind 0 = leaf (a = input
// index), kind 1..4 = union/intersect/kmers_subtract/counters_subtract
// over child NODE ids a and b (topological order, root last).
extern "C"
int64_t kst_expr(const InputSpec* inputs, const int32_t* prog,
                 int32_t n_nodes, const char* out_path, uint32_t out_format,
                 uint64_t out_offset, uint32_t out_lpl, uint32_t out_cs,
                 uint64_t out_ci, uint64_t out_cx, uint64_t out_csmax,
                 uint64_t* lut_hist) {
    const int32_t threads = resolve_threads();
    if (threads > 1 && n_nodes > 0) {
        // chunk-parallel when every leaf is KMC-format (carries a LUT)
        uint32_t plan_lpl = 0xFF;
        bool eligible = true;
        std::vector<const InputSpec*> leaves;
        for (int32_t i = 0; i < n_nodes; ++i) {
            if (prog[4 * i] != 0) continue;
            const InputSpec* in = &inputs[prog[4 * i + 1]];
            leaves.push_back(in);
            if (in->format != 0 || in->lut_prefix_len == 0) eligible = false;
            else plan_lpl = std::min(plan_lpl, in->lut_prefix_len);
        }
        if (eligible && !leaves.empty()) {
            if (plan_lpl > 8) plan_lpl = 8;
            auto bounds = plan_chunk_bounds(leaves.data(), leaves.size(),
                                            plan_lpl, threads);
            FILE* f;
            if (out_format) {
                f = fopen(out_path, "r+b");
                if (!f) return -1;
                if (fseeko(f, (off_t)out_offset, SEEK_SET) != 0) {
                    fclose(f);
                    return -1;
                }
            } else {
                f = fopen(out_path, "wb");
                if (!f) return -1;
                if (fwrite("KMCS", 1, 4, f) != 4) {
                    fclose(f);
                    return -1;
                }
            }
            ExprWorker proto;
            proto.inputs = inputs;
            proto.prog = prog;
            proto.n_nodes = n_nodes;
            proto.plan_lpl = plan_lpl;
            proto.out_lpl = out_lpl;
            proto.out_cs = out_cs;
            proto.out_fmt = out_format;
            proto.out_ci = out_ci;
            proto.out_cx = out_cx;
            proto.out_csmax = out_csmax;
            int64_t n = run_chunked(bounds, threads, f, lut_hist, proto);
            bool ok = n >= 0;
            if (out_format == 0 && ok && fwrite("KMCS", 1, 4, f) != 4)
                ok = false;
            if (fclose(f) != 0) ok = false;
            return ok ? n : -1;
        }
    }
    std::vector<ENode> nodes(n_nodes);
    std::vector<Reader*> readers;  // one per LEAF occurrence
    bool open_ok = true;
    uint32_t kw = 0;
    for (int32_t i = 0; i < n_nodes; ++i) {
        const int32_t kind = prog[4 * i];
        if (kind == 0) {
            Reader* rd = new Reader();
            readers.push_back(rd);
            if (!rd->open(&inputs[prog[4 * i + 1]])) open_ok = false;
            nodes[i].rd = rd;
            kw = rd->kw;
        } else {
            nodes[i].op = kind;
            nodes[i].mode = prog[4 * i + 3];
            nodes[i].l = &nodes[prog[4 * i + 1]];
            nodes[i].r = &nodes[prog[4 * i + 2]];
        }
    }
    int64_t result = -1;
    if (open_ok && n_nodes > 0) {
        Writer w;
        uint32_t k = inputs[0].kmer_len;
        if (w.open(out_path, out_format, out_offset, k, out_lpl, out_cs,
                   out_ci, out_cx, out_csmax, -1, lut_hist)) {
            ENode& root = nodes[n_nodes - 1];
            root.init(kw);
            while (root.has) {
                w.put(root.key, root.cnt);
                root.adv(kw);
            }
            bool rd_ok = true;
            for (Reader* rd : readers) rd_ok = rd_ok && rd->ok;
            if (w.close() && rd_ok) result = (int64_t)w.n;
        }
    }
    for (Reader* rd : readers) {
        rd->close();
        delete rd;
    }
    return result;
}

// Benchmark helper: drain one sorted stream, returning record count and
// a checksum (keeps the loop honest under -O3).
int64_t kst_drain(const InputSpec* a, uint64_t* checksum) {
    Reader r;
    if (!r.open(a)) { r.close(); return -1; }
    int64_t n = 0;
    uint64_t sum = 0;
    while (r.has) {
        sum += r.key().w[0] + r.cnt();
        ++n;
        r.pop();
    }
    if (checksum) *checksum = sum;
    bool ok = r.ok;
    r.close();
    return ok ? n : -1;
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
