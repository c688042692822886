/*
 * kmer_native.c — host-side native runtime: validation, 2-bit encoding,
 * FASTA/CSV ingest.
 *
 * The reference implements its hot host paths in C inside a Postgres
 * backend (validate_sequence at kmer.c:20-41; per-tuple text I/O at
 * kmer.c:84-199).  The TPU engine's equivalent native layer is this
 * data loader: it turns raw ASCII read files into dense 2-bit code
 * arrays at memory bandwidth so the host never bottlenecks the device
 * pipeline.  Exposed to Python via ctypes (kmer_tpu/native.py); every
 * function has a pure-numpy fallback so the engine still works without
 * a C toolchain.
 *
 * Build: cc -O3 -shared -fPIC -o libkmer_native.so kmer_native.c
 */

#include <stdint.h>
#include <stddef.h>

/* ASCII -> 2-bit code; 0xFF = invalid. Matches kmer_tpu.codec.CODE_LUT. */
static const uint8_t CODE_LUT[256] = {
    [0 ... 255] = 0xFF,
    ['a'] = 0, ['A'] = 0,
    ['c'] = 1, ['C'] = 1,
    ['g'] = 2, ['G'] = 2,
    ['t'] = 3, ['T'] = 3,
};

/*
 * Validate + encode an ASCII DNA sequence into 2-bit codes.
 * Returns -1 on success, else the index of the first invalid byte
 * (mirrors validate_sequence's reject-on-first-bad-char, kmer.c:26-38).
 */
long long kn_encode_validate(const char *in, long long n, uint8_t *out)
{
    for (long long i = 0; i < n; i++) {
        uint8_t c = CODE_LUT[(uint8_t)in[i]];
        if (c == 0xFF)
            return i;
        out[i] = c;
    }
    return -1;
}

/*
 * Encode, skipping invalid characters (e.g. 'N' runs in real FASTA).
 * Returns the number of codes written.
 */
long long kn_encode_skip(const char *in, long long n, uint8_t *out)
{
    long long w = 0;
    for (long long i = 0; i < n; i++) {
        uint8_t c = CODE_LUT[(uint8_t)in[i]];
        if (c != 0xFF)
            out[w++] = c;
    }
    return w;
}

/*
 * Pack 2-bit codes into big-endian-within-word uint32 lanes
 * (16 bases per word, first base in the top bits — the same
 * left-aligned layout as codec.pack_key64 truncated to 32 bits).
 */
void kn_pack2bit(const uint8_t *codes, long long n, uint32_t *words)
{
    long long nwords = (n + 15) / 16;
    for (long long w = 0; w < nwords; w++) {
        uint32_t acc = 0;
        long long base = w * 16;
        long long lim = n - base < 16 ? n - base : 16;
        for (long long j = 0; j < lim; j++)
            acc |= (uint32_t)codes[base + j] << (30 - 2 * j);
        words[w] = acc;
    }
}

/*
 * One-pass FASTA scan + encode.
 *
 * buf/n:        raw file bytes
 * codes:        output code stream (capacity >= n)
 * offsets:      per-read start offsets into codes (capacity max_reads+1);
 *               offsets[r]..offsets[r+1] delimit read r
 * max_reads:    capacity of offsets
 * skip_invalid: nonzero -> drop non-ACGT bases; zero -> abort on them
 *
 * Returns number of reads parsed, or -(byte index)-1 on an invalid
 * base when skip_invalid == 0, or -n-1 style overflow if max_reads hit.
 */
long long kn_fasta_encode(const char *buf, long long n, uint8_t *codes,
                          long long *offsets, long long max_reads,
                          int skip_invalid)
{
    long long nreads = 0, w = 0, i = 0;
    while (i < n) {
        if (buf[i] == '>') {            /* header line */
            while (i < n && buf[i] != '\n')
                i++;
            i++;
            if (nreads >= max_reads)
                return -((long long)1) - n;  /* capacity overflow sentinel */
            offsets[nreads++] = w;
            continue;
        }
        char ch = buf[i];
        if (ch == '\n' || ch == '\r') {
            i++;
            continue;
        }
        if (nreads == 0) {              /* sequence data before any header */
            offsets[nreads++] = w;
        }
        uint8_t c = CODE_LUT[(uint8_t)ch];
        if (c == 0xFF) {
            if (!skip_invalid)
                return -i - 1;
        } else {
            codes[w++] = c;
        }
        i++;
    }
    offsets[nreads] = w;
    return nreads;
}

/*
 * One-pass FASTQ scan + encode (strict 4-line records: @header,
 * sequence, '+' separator, quality).  Same contract as kn_fasta_encode;
 * quality bytes are skipped by sequence length, so '@'-leading quality
 * lines cannot be misparsed as headers.
 */
long long kn_fastq_encode(const char *buf, long long n, uint8_t *codes,
                          long long *offsets, long long max_reads,
                          int skip_invalid)
{
    long long nreads = 0, w = 0, i = 0;
    while (i < n) {
        if (buf[i] == '\n' || buf[i] == '\r') {  /* blank trailing lines */
            i++;
            continue;
        }
        if (buf[i] != '@')              /* record must open with @header */
            return -i - 1;
        while (i < n && buf[i] != '\n')
            i++;
        i++;
        if (nreads >= max_reads)
            return -((long long)1) - n;  /* capacity overflow sentinel */
        offsets[nreads++] = w;
        long long seq_len = 0;          /* chars on the sequence line */
        while (i < n && buf[i] != '\n') {
            char ch = buf[i];
            if (ch != '\r') {
                uint8_t c = CODE_LUT[(uint8_t)ch];
                if (c == 0xFF) {
                    if (!skip_invalid)
                        return -i - 1;
                } else {
                    codes[w++] = c;
                }
                seq_len++;
            }
            i++;
        }
        i++;
        if (i < n) {                    /* '+' separator line */
            if (buf[i] != '+')
                return -i - 1;
            while (i < n && buf[i] != '\n')
                i++;
            i++;
        }
        long long q = 0;                /* quality: exactly seq_len chars */
        while (i < n && q < seq_len) {
            if (buf[i] != '\r' && buf[i] != '\n')
                q++;
            i++;
        }
    }
    offsets[nreads] = w;
    return nreads;
}

/*
 * Batch-encode newline-separated sequences (one read per line — the
 * shape of a CSV column already isolated by the Python side).
 */
long long kn_lines_encode(const char *buf, long long n, uint8_t *codes,
                          long long *offsets, long long max_reads)
{
    long long nreads = 0, w = 0, i = 0;
    offsets[0] = 0;
    while (i < n && nreads < max_reads) {
        if (buf[i] == '\n') {
            offsets[++nreads] = w;
            i++;
            continue;
        }
        uint8_t c = CODE_LUT[(uint8_t)buf[i]];
        if (c == 0xFF)
            return -i - 1;
        codes[w++] = c;
        i++;
    }
    if (i >= n && (nreads == 0 || offsets[nreads] != w))
        offsets[++nreads] = w;
    return nreads;
}
