// Native host-side sequence kernels for downpore_tpu.
//
// The reference implements its host hot loops in hand-written amd64
// assembly (ref: sequence/asm_amd64.s, util/asm_amd64.s).  On the TPU
// build, device work goes through XLA/Pallas; the host-side preprocessing
// that feeds it — ASCII -> 2-bit encoding, rolling k-mer extraction,
// seed-table scans and fastq record indexing — lives here as portable
// C++ that the compiler auto-vectorizes.  Exposed with C linkage for
// ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC seqscan.cpp -o libseqscan.so
#include <cstdint>
#include <cstddef>

extern "C" {

// ASCII base -> 2-bit code, the reference's ((b>>1)^((b&4)>>2))&3 trick
// (ref: sequence/sequence.go:59)
void encode_bases(const uint8_t* in, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; i++) {
        uint8_t b = in[i];
        out[i] = ((b >> 1) ^ ((b & 4) >> 2)) & 3;
    }
}

// rolling k-mers over 2-bit codes; out has n-k+1 entries
// (ref: sequence/sequence.go:444-453, asm packedKmerAt)
void rolling_kmers(const uint8_t* codes, int64_t n, int32_t k,
                   int32_t* out) {
    if (n < k) return;
    int32_t mask = (int32_t)((1u << (2 * k)) - 1);
    int32_t v = 0;
    for (int32_t i = 0; i < k; i++) v = (v << 2) | codes[i];
    out[0] = v;
    for (int64_t i = k; i < n; i++) {
        v = ((v << 2) | codes[i]) & mask;
        out[i - k + 1] = v;
    }
}

// count positions whose rolling k-mer is flagged in table[4^k]
// (ref: sequence/asm_amd64.s packedCountKmers)
int64_t count_seed_kmers(const uint8_t* codes, int64_t n, int32_t k,
                         const uint8_t* table, int64_t up_to) {
    if (n < k) return 0;
    int32_t mask = (int32_t)((1u << (2 * k)) - 1);
    int32_t v = 0;
    for (int32_t i = 0; i < k; i++) v = (v << 2) | codes[i];
    int64_t count = table[v] ? 1 : 0;
    for (int64_t i = k; i < n && count < up_to; i++) {
        v = ((v << 2) | codes[i]) & mask;
        count += table[v] ? 1 : 0;
    }
    return count;
}

// gapped-seed extraction: writes (gap, kmer) pairs plus a trailing gap
// Returns the number of seeds found.  gaps has capacity n+1, kmers n.
// (ref: sequence/asm_amd64.s packedWriteSegments, scalar at
//  sequence/sequence.go:308-324)
int64_t write_segments(const uint8_t* codes, int64_t n, int32_t k,
                       const uint8_t* table, int32_t* gaps,
                       int32_t* kmers) {
    if (n < k) { gaps[0] = (int32_t)n; return 0; }
    int32_t mask = (int32_t)((1u << (2 * k)) - 1);
    int32_t v = 0;
    for (int32_t i = 0; i < k; i++) v = (v << 2) | codes[i];
    int64_t count = 0;
    int64_t prev = 0;
    int64_t idx = 0;  // kmer start index
    if (table[v]) {
        gaps[count] = 0;
        kmers[count] = v;
        prev = k;
        count++;
    }
    for (int64_t i = k; i < n; i++) {
        v = ((v << 2) | codes[i]) & mask;
        idx = i - k + 1;
        if (table[v]) {
            gaps[count] = (int32_t)(idx - prev);
            kmers[count] = v;
            prev = idx + k;
            count++;
        }
    }
    gaps[count] = (int32_t)(n - prev);
    return count;
}

// index single-line fastq records in a memory buffer: for each record,
// emit (seq_offset, seq_len, name_offset, name_len, qual_offset).
// Returns the number of records found, or -1 on malformed input.
// (the native analogue of the reference's two-pass reader,
//  ref: sequence/seqio.go:106-276)
int64_t index_fastq(const uint8_t* buf, int64_t n, int64_t max_records,
                    int64_t* seq_off, int64_t* seq_len,
                    int64_t* name_off, int64_t* name_len,
                    int64_t* qual_off) {
    int64_t i = 0, rec = 0;
    while (i < n && rec < max_records) {
        if (buf[i] != '@') return -1;
        int64_t name_start = i + 1;
        while (i < n && buf[i] != '\n') i++;
        int64_t name_end = i;
        while (name_end > name_start && (buf[name_end - 1] == '\r')) name_end--;
        i++;  // past newline
        int64_t s_start = i;
        while (i < n && buf[i] != '\n') i++;
        int64_t s_end = i;
        while (s_end > s_start && buf[s_end - 1] == '\r') s_end--;
        i++;
        if (i >= n || buf[i] != '+') return -1;
        while (i < n && buf[i] != '\n') i++;
        i++;
        int64_t q_start = i;
        i += (s_end - s_start);
        if (i > n) return -1;
        // skip to end of quality line
        while (i < n && buf[i] != '\n') i++;
        i++;
        seq_off[rec] = s_start;
        seq_len[rec] = s_end - s_start;
        name_off[rec] = name_start;
        name_len[rec] = name_end - name_start;
        qual_off[rec] = q_start;
        rec++;
    }
    return rec;
}

}  // extern "C"
