// kmc_tpu native host runtime: input parsing, gzip inflate, 2-bit encoding.
//
// TPU-native role split: the device owns all counting compute (extract,
// sort, merge — see kmc_tpu/ops/*); this library owns the host side that
// feeds it — the equivalent of the reference's reader/splitter front half
// (/root/reference/kmc_core/binary_reader.h, fastq_reader.cpp), redesigned
// as a single-pass byte->code translator emitting one flat sentinel-
// separated code stream instead of per-read record objects.
//
// Exposed via ctypes (see kmc_tpu/io/native.py).  All functions are plain C
// ABI, single-threaded, and carry explicit resumable state so Python can
// stream arbitrarily large files through fixed-size buffers.
//
// Codes: A/a->0 C/c->1 G/g->2 T/t->3, everything else -> 4 (sentinel that
// breaks k-mers; newlines/headers/qualities all map to it implicitly by
// never being emitted, with one sentinel emitted per record boundary).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <zlib.h>

#if defined(__SSE2__)
#include <immintrin.h>
#endif

// ---------------------------------------------------------------------------
// SIMD inner loops (x86).  The library is built with -march=native into a
// per-machine content-hash-keyed cache (kmc_tpu/io/native.py), so
// compile-time feature macros are the right dispatch: the binary never
// travels to another microarchitecture.  Scalar tails/fallbacks keep
// non-x86 builds working unchanged.
// ---------------------------------------------------------------------------

static uint8_t CODE_LUT[256];

// byte -> A/C/G/T code translation, len bytes; returns bytes processed
// (callers run the scalar LUT over the remainder).
static inline int64_t translate_simd(const uint8_t* in, int64_t len,
                                     uint8_t* out) {
    int64_t j = 0;
#if defined(__AVX512BW__)
    // 64-byte lanes with mask-register compares: code built by masked
    // moves, one store per 64 input bytes
    {
        const __m512i zcase = _mm512_set1_epi8((char)0xDF);
        const __m512i zA = _mm512_set1_epi8('A'), zC = _mm512_set1_epi8('C');
        const __m512i zG = _mm512_set1_epi8('G'), zT = _mm512_set1_epi8('T');
        const __m512i z1 = _mm512_set1_epi8(1), z2 = _mm512_set1_epi8(2),
                      z3 = _mm512_set1_epi8(3), z4 = _mm512_set1_epi8(4);
        for (; j + 64 <= len; j += 64) {
            __m512i v = _mm512_loadu_si512((const void*)(in + j));
            __m512i u = _mm512_and_si512(v, zcase);  // a/c/g/t -> A/C/G/T
            __mmask64 mA = _mm512_cmpeq_epi8_mask(u, zA);
            __mmask64 mC = _mm512_cmpeq_epi8_mask(u, zC);
            __mmask64 mG = _mm512_cmpeq_epi8_mask(u, zG);
            __mmask64 mT = _mm512_cmpeq_epi8_mask(u, zT);
            __m512i code = _mm512_maskz_mov_epi8(mC, z1);
            code = _mm512_mask_mov_epi8(code, mG, z2);
            code = _mm512_mask_mov_epi8(code, mT, z3);
            code = _mm512_mask_mov_epi8(code, ~(mA | mC | mG | mT), z4);
            _mm512_storeu_si512((void*)(out + j), code);
        }
    }
#endif
#if defined(__SSE2__)
    const __m128i case_mask = _mm_set1_epi8((char)0xDF);
    const __m128i vA = _mm_set1_epi8('A'), vC = _mm_set1_epi8('C');
    const __m128i vG = _mm_set1_epi8('G'), vT = _mm_set1_epi8('T');
    const __m128i v1 = _mm_set1_epi8(1), v2 = _mm_set1_epi8(2),
                  v3 = _mm_set1_epi8(3), v4 = _mm_set1_epi8(4);
    for (; j + 16 <= len; j += 16) {
        __m128i v = _mm_loadu_si128((const __m128i*)(in + j));
        __m128i u = _mm_and_si128(v, case_mask);  // a/c/g/t -> A/C/G/T
        __m128i eqA = _mm_cmpeq_epi8(u, vA);
        __m128i eqC = _mm_cmpeq_epi8(u, vC);
        __m128i eqG = _mm_cmpeq_epi8(u, vG);
        __m128i eqT = _mm_cmpeq_epi8(u, vT);
        __m128i code = _mm_and_si128(eqC, v1);
        code = _mm_or_si128(code, _mm_and_si128(eqG, v2));
        code = _mm_or_si128(code, _mm_and_si128(eqT, v3));
        __m128i valid = _mm_or_si128(_mm_or_si128(eqA, eqC),
                                     _mm_or_si128(eqG, eqT));
        code = _mm_or_si128(code, _mm_andnot_si128(valid, v4));
        _mm_storeu_si128((__m128i*)(out + j), code);
    }
#else
    (void)in; (void)len; (void)out;
#endif
    return j;
}

static inline void translate_codes(const uint8_t* in, int64_t len,
                                   uint8_t* out) {
    int64_t j = translate_simd(in, len, out);
    for (; j < len; ++j) out[j] = CODE_LUT[in[j]];
}

#if defined(__SSSE3__)
// 16 codes -> 4 packed bytes (2 bits each, big-endian within byte) via the
// madd ladder: pairs*(64,16)+(4,1), add adjacent, take low bytes.
static inline uint32_t pack16_ssse3(__m128i v) {
    const __m128i W = _mm_set1_epi32(0x01041040);  // bytes {64,16,4,1}
    const __m128i SHUF = _mm_setr_epi8(0, 4, 8, 12, -1, -1, -1, -1, -1, -1,
                                       -1, -1, -1, -1, -1, -1);
    __m128i x = _mm_and_si128(v, _mm_set1_epi8(3));
    __m128i t = _mm_maddubs_epi16(x, W);
    __m128i s = _mm_madd_epi16(t, _mm_set1_epi16(1));
    return (uint32_t)_mm_cvtsi128_si32(_mm_shuffle_epi8(s, SHUF));
}

#if defined(__AVX512BW__)
// 64 codes -> 16 packed bytes: the same madd ladder across four 128-bit
// lanes, then one VPMOVDB truncating the 16 dword sums to bytes in order
static inline __m128i pack64_avx512(__m512i v) {
    const __m512i W = _mm512_set1_epi32(0x01041040);  // bytes {64,16,4,1}
    __m512i x = _mm512_and_si512(v, _mm512_set1_epi8(3));
    __m512i t = _mm512_maddubs_epi16(x, W);
    __m512i s = _mm512_madd_epi16(t, _mm512_set1_epi16(1));
    return _mm512_cvtepi32_epi8(s);
}
#endif

// bit-reverse of a byte (movemask bit i = lane i, the mask format wants
// MSB-first)
static const uint8_t BITREV8[256] = {
#define R2(n) n, n + 2 * 64, n + 1 * 64, n + 3 * 64
#define R4(n) R2(n), R2(n + 2 * 16), R2(n + 1 * 16), R2(n + 3 * 16)
#define R6(n) R4(n), R4(n + 2 * 4), R4(n + 1 * 4), R4(n + 3 * 4)
    R6(0), R6(2), R6(1), R6(3)
#undef R2
#undef R4
#undef R6
};
#endif

extern "C" {

// ---------------------------------------------------------------------------
// byte -> code LUT (declared above the SIMD helpers)
// ---------------------------------------------------------------------------
static bool lut_init_done = false;

static void init_lut() {
    if (lut_init_done) return;
    memset(CODE_LUT, 4, sizeof(CODE_LUT));
    CODE_LUT[(unsigned char)'A'] = 0; CODE_LUT[(unsigned char)'a'] = 0;
    CODE_LUT[(unsigned char)'C'] = 1; CODE_LUT[(unsigned char)'c'] = 1;
    CODE_LUT[(unsigned char)'G'] = 2; CODE_LUT[(unsigned char)'g'] = 2;
    CODE_LUT[(unsigned char)'T'] = 3; CODE_LUT[(unsigned char)'t'] = 3;
    lut_init_done = true;
}

// ---------------------------------------------------------------------------
// FASTQ parser: resumable single-pass state machine.
//
// state[0] = current line phase (0 header, 1 seq, 2 plus, 3 qual)
// state[1] = number of sequence lines seen (n_reads)
//
// Sequence-line bytes emit their code; the newline terminating a sequence
// line emits one sentinel (4).  Other lines emit nothing.  Matches the
// semantics of kmc_tpu/io/readers.py::_fastq_codes.
// ---------------------------------------------------------------------------
int64_t parse_fastq(const uint8_t* buf, int64_t n, uint8_t* out,
                    int64_t* state) {
    init_lut();
    int64_t phase = state[0];
    int64_t n_reads = state[1];
    int64_t m = 0;
    int64_t i = 0;
    while (i < n) {
        if (phase == 1) {
            // copy sequence bytes until newline
            const uint8_t* nl = (const uint8_t*)memchr(buf + i, '\n', (size_t)(n - i));
            int64_t end = nl ? (int64_t)(nl - buf) : n;
            translate_codes(buf + i, end - i, out + m);
            m += end - i;
            if (nl) {
                out[m++] = 4;  // record separator
                phase = 2;
                n_reads++;
                i = end + 1;
            } else {
                i = n;
            }
        } else {
            const uint8_t* nl = (const uint8_t*)memchr(buf + i, '\n', (size_t)(n - i));
            if (!nl) break;  // phase unchanged; caller resumes mid-line? no:
            // non-seq lines spanning chunks are fine because we only advance
            // phase at newlines; bytes before the newline are skipped.
            phase = (phase + 1) & 3;
            i = (int64_t)(nl - buf) + 1;
        }
    }
    state[0] = phase;
    state[1] = n_reads;
    return m;
}

// ---------------------------------------------------------------------------
// FASTA parser (single- and multi-line records).
//
// state[0] = 1 if currently inside a header line, else 0
// state[1] = n_sequences (number of '>' seen)
// Header lines emit exactly one sentinel (for the '>'); sequence bytes emit
// codes; newlines inside sequences emit nothing (records stay contiguous).
// Matches kmc_tpu/io/readers.py::_fasta_codes.
// ---------------------------------------------------------------------------
int64_t parse_fasta(const uint8_t* buf, int64_t n, uint8_t* out,
                    int64_t* state) {
    init_lut();
    int64_t in_header = state[0];
    int64_t n_seqs = state[1];
    int64_t m = 0;
    int64_t i = 0;
    while (i < n) {
        uint8_t b = buf[i];
        if (in_header) {
            const uint8_t* nl = (const uint8_t*)memchr(buf + i, '\n', (size_t)(n - i));
            if (!nl) { i = n; break; }
            in_header = 0;
            i = (int64_t)(nl - buf) + 1;
        } else if (b == '>') {
            out[m++] = 4;
            n_seqs++;
            in_header = 1;
            i++;
        } else if (b == '\n') {
            i++;
        } else {
            // sequence bytes until newline or '>'
            const uint8_t* nl = (const uint8_t*)memchr(buf + i, '\n', (size_t)(n - i));
            int64_t end = nl ? (int64_t)(nl - buf) : n;
            translate_codes(buf + i, end - i, out + m);
            m += end - i;
            i = end;  // newline handled next iteration
        }
    }
    state[0] = in_header;
    state[1] = n_seqs;
    return m;
}

// ---------------------------------------------------------------------------
// Homopolymer compression (reference splitter.cpp:424-435): collapse runs of
// identical codes in place-compatible fashion.  prev_last carries the last
// emitted code across chunk boundaries (-1 initially).
// ---------------------------------------------------------------------------
int64_t homopolymer_compress(const uint8_t* in, int64_t n, uint8_t* out,
                             int64_t* prev_last) {
    int64_t m = 0;
    int last = (int)*prev_last;
    for (int64_t i = 0; i < n; ++i) {
        if ((int)in[i] != last) {
            out[m++] = in[i];
            last = in[i];
        }
    }
    *prev_last = last;
    return m;
}

// ---------------------------------------------------------------------------
// gzip/zlib streaming inflate.  Supports multi-member gzip files (BGZF and
// pigz outputs are concatenated members).
// ---------------------------------------------------------------------------
typedef struct {
    z_stream zs;
    FILE* f;
    uint8_t* in_buf;
    int64_t in_cap;
    int64_t in_len;
    int64_t in_pos;
    int eof;
    int initialized;
    int mid_member;  // compressed bytes consumed since the last member end
} gz_reader_t;

void* gz_open(const char* path, int64_t in_buf_bytes) {
    gz_reader_t* r = (gz_reader_t*)calloc(1, sizeof(gz_reader_t));
    if (!r) return nullptr;
    r->f = fopen(path, "rb");
    if (!r->f) { free(r); return nullptr; }
    r->in_cap = in_buf_bytes > 0 ? in_buf_bytes : (1 << 20);
    r->in_buf = (uint8_t*)malloc((size_t)r->in_cap);
    if (!r->in_buf) { fclose(r->f); free(r); return nullptr; }
    memset(&r->zs, 0, sizeof(r->zs));
    // 15+16: gzip container; +32 would auto-detect zlib too
    if (inflateInit2(&r->zs, 15 + 16) != Z_OK) {
        fclose(r->f); free(r->in_buf); free(r);
        return nullptr;
    }
    r->initialized = 1;
    return r;
}

// Returns bytes written to out (0 on clean EOF, -1 on error).
int64_t gz_read(void* handle, uint8_t* out, int64_t out_cap) {
    gz_reader_t* r = (gz_reader_t*)handle;
    if (!r || !r->initialized) return -1;
    int64_t total = 0;
    while (total < out_cap) {
        if (r->in_pos >= r->in_len && !r->eof) {
            r->in_len = (int64_t)fread(r->in_buf, 1, (size_t)r->in_cap, r->f);
            r->in_pos = 0;
            if (r->in_len == 0) r->eof = 1;
        }
        r->zs.next_in = r->in_buf + r->in_pos;
        r->zs.avail_in = (uInt)(r->in_len - r->in_pos);
        r->zs.next_out = out + total;
        r->zs.avail_out = (uInt)(out_cap - total);
        int ret = inflate(&r->zs, Z_NO_FLUSH);
        int64_t consumed = (int64_t)(r->in_len - r->in_pos) - (int64_t)r->zs.avail_in;
        r->in_pos += consumed;
        int64_t produced = (out_cap - total) - (int64_t)r->zs.avail_out;
        total += produced;
        if (consumed > 0 || produced > 0) r->mid_member = 1;
        if (ret == Z_STREAM_END) {
            // multi-member gzip: restart for the next member
            r->mid_member = 0;
            if (inflateReset2(&r->zs, 15 + 16) != Z_OK) return -1;
            if (r->in_pos >= r->in_len && r->eof) break;
            continue;
        }
        if (ret != Z_OK && ret != Z_BUF_ERROR) return -1;
        if (r->eof && r->in_pos >= r->in_len) {
            // input exhausted mid-member: the file is TRUNCATED — an
            // error, not EOF (silently stopping would emit a partial,
            // wrong count; the reference's readers error here too)
            if (r->mid_member) return -1;
            break;
        }
        if (produced == 0 && consumed == 0 && r->eof) {
            if (r->mid_member) return -1;
            break;
        }
    }
    return total;
}

void gz_close(void* handle) {
    gz_reader_t* r = (gz_reader_t*)handle;
    if (!r) return;
    if (r->initialized) inflateEnd(&r->zs);
    if (r->f) fclose(r->f);
    free(r->in_buf);
    free(r);
}

// ---------------------------------------------------------------------------
// Device-feed packing: codes (0..3 base, >=4 sentinel) -> 2-bit packed bases
// (4/byte, big-endian within byte, sentinel packs as 0) + validity bitmask
// (8 codes/byte, MSB-first: bit 7 = first code, 1 = real base).  Cuts the
// host->device bytes per code from 1 to 0.375 — the tunnel H2D link is the
// scarce resource, not the TPU.
// n must be a multiple of 8 (callers pad batches).
// ---------------------------------------------------------------------------
void pack_codes(const uint8_t* codes, int64_t n, uint8_t* packed,
                uint8_t* mask) {
    int64_t i = 0;
#if defined(__AVX512BW__) && defined(__SSSE3__)
    {
        const __m512i z4 = _mm512_set1_epi8(4);
        for (; i + 64 <= n; i += 64) {
            __m512i v = _mm512_loadu_si512((const void*)(codes + i));
            _mm_storeu_si128((__m128i*)(packed + (i >> 2)), pack64_avx512(v));
            uint64_t mm = (uint64_t)_mm512_cmplt_epu8_mask(v, z4);
            for (int b = 0; b < 8; ++b)
                mask[(i >> 3) + b] = BITREV8[(mm >> (8 * b)) & 0xFF];
        }
    }
#endif
#if defined(__SSSE3__)
    const __m128i v4 = _mm_set1_epi8(4);
    for (; i + 16 <= n; i += 16) {
        __m128i v = _mm_loadu_si128((const __m128i*)(codes + i));
        *(uint32_t*)(packed + (i >> 2)) = pack16_ssse3(v);
        // valid = code < 4; movemask bit j = lane j, mask wants MSB-first
        int mm = _mm_movemask_epi8(_mm_cmplt_epi8(v, v4));
        mask[i >> 3] = BITREV8[mm & 0xFF];
        mask[(i >> 3) + 1] = BITREV8[(mm >> 8) & 0xFF];
    }
#endif
    for (; i < n; i += 8) {
        uint8_t c0 = codes[i], c1 = codes[i + 1], c2 = codes[i + 2],
                c3 = codes[i + 3], c4 = codes[i + 4], c5 = codes[i + 5],
                c6 = codes[i + 6], c7 = codes[i + 7];
        packed[i >> 2] = (uint8_t)(((c0 & 3) << 6) | ((c1 & 3) << 4) |
                                   ((c2 & 3) << 2) | (c3 & 3));
        packed[(i >> 2) + 1] = (uint8_t)(((c4 & 3) << 6) | ((c5 & 3) << 4) |
                                         ((c6 & 3) << 2) | (c7 & 3));
        mask[i >> 3] = (uint8_t)(((c0 < 4) << 7) | ((c1 < 4) << 6) |
                                 ((c2 < 4) << 5) | ((c3 < 4) << 4) |
                                 ((c4 < 4) << 3) | ((c5 < 4) << 2) |
                                 ((c6 < 4) << 1) | (c7 < 4));
    }
}

// ---------------------------------------------------------------------------
// BAM record parser: resumable over inflated BGZF bytes.
//
// The caller feeds inflated chunks; the parser consumes only COMPLETE
// structures and reports how many input bytes it consumed — the caller
// carries the unconsumed tail into the next call (records are ~100s of
// bytes, so the carry stays tiny).  Mirrors the reference's semantics
// (fastq_reader.cpp:203-310, splitter.cpp:329-420): secondary (flag bit 8)
// and supplementary (bit 11) alignments are excluded; in single-strand mode
// reverse-complemented alignments (bit 4) are undone; 4-bit codes 1/2/4/8
// map to A/C/G/T, everything else breaks k-mers.
//
// state[0] = phase: 0 magic+l_text, 1 skip text, 2 n_ref, 3 ref l_name,
//                   4 skip ref name+l_ref, 5 records
// state[1] = bytes left to skip (phases 1/4)
// state[2] = refs remaining (phases 3/4)
// state[3] = n_reads emitted
// state[4] = both_strands flag (set by caller before first call)
// Returns the number of codes written to out (caller sizes out at
// 2*n + n/16 + 64); *consumed gets the bytes eaten from buf; -1 = bad BAM.
// ---------------------------------------------------------------------------
static inline int64_t rd_i32(const uint8_t* p) {
    uint32_t v = (uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                 ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
    return (int64_t)(int32_t)v;
}

int64_t parse_bam(const uint8_t* buf, int64_t n, uint8_t* out,
                  int64_t* state, int64_t* consumed) {
    static const uint8_t NIB[16] = {4, 0, 1, 4, 2, 4, 4, 4, 3, 4, 4, 4, 4, 4, 4, 4};
    static const uint8_t NIB_RC[16] = {4, 3, 2, 4, 1, 4, 4, 4, 0, 4, 4, 4, 4, 4, 4, 4};
    int64_t phase = state[0];
    int64_t to_skip = state[1];
    int64_t refs_left = state[2];
    int64_t n_reads = state[3];
    const int both_strands = (int)state[4];
    int64_t i = 0, m = 0;
    for (;;) {
        if (phase == 0) {
            if (n - i < 8) break;
            if (memcmp(buf + i, "BAM\x01", 4) != 0) { *consumed = i; return -1; }
            to_skip = rd_i32(buf + i + 4);
            i += 8;
            phase = 1;
        } else if (phase == 1 || phase == 4) {
            int64_t take = to_skip < (n - i) ? to_skip : (n - i);
            i += take;
            to_skip -= take;
            if (to_skip > 0) break;
            if (phase == 1) phase = 2;
            else phase = (--refs_left > 0) ? 3 : 5;
        } else if (phase == 2) {
            if (n - i < 4) break;
            refs_left = rd_i32(buf + i);
            i += 4;
            phase = refs_left > 0 ? 3 : 5;
        } else if (phase == 3) {
            if (n - i < 4) break;
            to_skip = rd_i32(buf + i) + 4;  // name + l_ref
            i += 4;
            phase = 4;
        } else {  // phase 5: records
            if (n - i < 4) break;
            int64_t block_size = rd_i32(buf + i);
            // sanity cap: a corrupt length would otherwise make the caller
            // accumulate carry bytes forever waiting for the "record"
            if (block_size < 32 || block_size > (1 << 28)) {
                *consumed = i;
                return -1;
            }
            if (n - i < 4 + block_size) break;
            const uint8_t* rec = buf + i + 4;
            int64_t l_read_name = rec[8];
            int64_t n_cigar_op = (int64_t)rec[12] | ((int64_t)rec[13] << 8);
            int64_t flags = (int64_t)rec[14] | ((int64_t)rec[15] << 8);
            int64_t l_seq = rd_i32(rec + 16);
            int exclude = ((flags >> 8) & 1) || ((flags >> 11) & 1);
            int64_t seq_off = 32 + l_read_name + 4 * n_cigar_op;
            if (!exclude && l_seq > 0 && seq_off + (l_seq + 1) / 2 <= block_size) {
                const uint8_t* sq = rec + seq_off;
                int is_rc = (flags >> 4) & 1;
                if (!both_strands && is_rc) {
                    // undo the aligner's reverse complement
                    for (int64_t j = l_seq - 1; j >= 0; --j) {
                        uint8_t nib = (j & 1) ? (sq[j >> 1] & 15)
                                              : (sq[j >> 1] >> 4);
                        out[m++] = NIB_RC[nib];
                    }
                } else {
                    for (int64_t j = 0; j < l_seq; ++j) {
                        uint8_t nib = (j & 1) ? (sq[j >> 1] & 15)
                                              : (sq[j >> 1] >> 4);
                        out[m++] = NIB[nib];
                    }
                }
                out[m++] = 4;  // read separator
                n_reads++;
            }
            i += 4 + block_size;
        }
    }
    state[0] = phase;
    state[1] = to_skip;
    state[2] = refs_left;
    state[3] = n_reads;
    *consumed = i;
    return m;
}

// One fused device-feed buffer: packed codes followed by the validity mask
// (out must hold n/4 + n/8 bytes).  One H2D transfer instead of two — the
// per-transfer setup on the dev tunnel is significant.
void pack_codes_fused(const uint8_t* codes, int64_t n, uint8_t* out) {
    pack_codes(codes, n, out, out + (n >> 2));
}

// Boundary-delta device feed: 2-bit packed codes followed by little-endian
// u16 deltas of the sentinel (code >= 4) positions in [0, tail_start)
// (position = prefix-sum of deltas - 1; trailing zero deltas are padding).
// 0.28 B/code instead of the 0.375 of packed+mask: sentinels are sparse in
// read data (one per read + rare Ns), and the batch-padding suffix is
// reconstructed on device from the tail_start scalar.  Returns the number
// of boundaries, or -1 when the encoding doesn't fit (more than max_b
// sentinels, or a gap over 65535 — degenerate inputs fall back to the
// masked format).
int64_t pack_codes_boundaries(const uint8_t* codes, int64_t n,
                              uint8_t* out, int64_t max_b,
                              int64_t* tail_start_out) {
    // a trailing run of sentinels (batch padding, or genuinely trailing
    // separators — same semantics) is reconstructed on device from this
    // scalar instead of being listed
    int64_t tail_start = n;
    while (tail_start > 0 && codes[tail_start - 1] >= 4) tail_start--;
    *tail_start_out = tail_start;
    int64_t i = 0;
#if defined(__AVX512BW__) && defined(__SSSE3__)
    for (; i + 64 <= n; i += 64) {
        __m512i v = _mm512_loadu_si512((const void*)(codes + i));
        _mm_storeu_si128((__m128i*)(out + (i >> 2)), pack64_avx512(v));
    }
#endif
#if defined(__SSSE3__)
    for (; i + 16 <= n; i += 16) {
        __m128i v = _mm_loadu_si128((const __m128i*)(codes + i));
        *(uint32_t*)(out + (i >> 2)) = pack16_ssse3(v);
    }
#endif
    for (; i < n; i += 8) {
        uint8_t c0 = codes[i], c1 = codes[i + 1], c2 = codes[i + 2],
                c3 = codes[i + 3], c4 = codes[i + 4], c5 = codes[i + 5],
                c6 = codes[i + 6], c7 = codes[i + 7];
        out[i >> 2] = (uint8_t)(((c0 & 3) << 6) | ((c1 & 3) << 4) |
                                ((c2 & 3) << 2) | (c3 & 3));
        out[(i >> 2) + 1] = (uint8_t)(((c4 & 3) << 6) | ((c5 & 3) << 4) |
                                      ((c6 & 3) << 2) | (c7 & 3));
    }
    uint8_t* deltas = out + (n >> 2);
    int64_t b = 0;
    int64_t prev = -1;
    i = 0;
#if defined(__AVX512BW__)
    // sentinels are one-per-read (sparse): one 64-bit compare mask per
    // 64 codes, ctz-walk its set bits
    {
        const __m512i z3 = _mm512_set1_epi8(3);
        for (; i + 64 <= tail_start; i += 64) {
            __m512i v = _mm512_loadu_si512((const void*)(codes + i));
            uint64_t mm = (uint64_t)_mm512_cmpgt_epu8_mask(v, z3);
            while (mm) {
                int64_t pos = i + __builtin_ctzll(mm);
                mm &= mm - 1;
                int64_t gap = pos - prev;
                if (b >= max_b || gap > 65535) return -1;
                deltas[2 * b] = (uint8_t)(gap & 0xFF);
                deltas[2 * b + 1] = (uint8_t)(gap >> 8);
                prev = pos;
                b++;
            }
        }
    }
#endif
#if defined(__SSSE3__)
    // sentinels are one-per-read (sparse): skip 16 codes at a time when the
    // block holds none, walk set bits via ctz otherwise
    const __m128i v3s = _mm_set1_epi8(3);
    for (; i + 16 <= tail_start; i += 16) {
        __m128i v = _mm_loadu_si128((const __m128i*)(codes + i));
        int mm = _mm_movemask_epi8(_mm_cmpgt_epi8(v, v3s));
        while (mm) {
            int64_t pos = i + __builtin_ctz((unsigned)mm);
            mm &= mm - 1;
            int64_t gap = pos - prev;
            if (b >= max_b || gap > 65535) return -1;
            deltas[2 * b] = (uint8_t)(gap & 0xFF);
            deltas[2 * b + 1] = (uint8_t)(gap >> 8);
            prev = pos;
            b++;
        }
    }
#endif
    for (; i < tail_start; ++i) {
        if (codes[i] >= 4) {
            int64_t gap = i - prev;
            if (b >= max_b || gap > 65535) return -1;
            deltas[2 * b] = (uint8_t)(gap & 0xFF);
            deltas[2 * b + 1] = (uint8_t)(gap >> 8);
            prev = i;
            b++;
        }
    }
    memset(deltas + 2 * b, 0, (size_t)(2 * (max_b - b)));
    return b;
}

// ---------------------------------------------------------------------------
// 2-bit pack/unpack helpers (used by format writers for big arrays).
// rows: (n, kb*4) codes right-aligned -> (n, kb) big-endian packed bytes.
// ---------------------------------------------------------------------------
void pack_2bit_rows(const uint8_t* codes, int64_t n, int64_t kb, uint8_t* out) {
    for (int64_t r = 0; r < n; ++r) {
        const uint8_t* c = codes + r * kb * 4;
        uint8_t* o = out + r * kb;
        for (int64_t j = 0; j < kb; ++j)
            o[j] = (uint8_t)((c[4 * j] << 6) | (c[4 * j + 1] << 4) |
                             (c[4 * j + 2] << 2) | c[4 * j + 3]);
    }
}

void unpack_2bit_rows(const uint8_t* rows, int64_t n, int64_t kb, uint8_t* out) {
    for (int64_t r = 0; r < n; ++r) {
        const uint8_t* in = rows + r * kb;
        uint8_t* o = out + r * kb * 4;
        for (int64_t j = 0; j < kb; ++j) {
            uint8_t b = in[j];
            o[4 * j] = (uint8_t)(b >> 6);
            o[4 * j + 1] = (uint8_t)((b >> 4) & 3);
            o[4 * j + 2] = (uint8_t)((b >> 2) & 3);
            o[4 * j + 3] = (uint8_t)(b & 3);
        }
    }
}

}  // extern "C"
