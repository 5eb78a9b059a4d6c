// Native serialization codec: coefficient bit-packing + CRC32.
//
// The reference's serializer/runtime layer is native C++
// (cpp/src/key_serializer.cpp, streaming_processor.cpp); this is the
// TPU-framework equivalent for the host-side data path: ballots and keys
// with q < 2^64 pack their coefficients to ceil(log2 q) bits (a 41-bit
// modulus stores 1.56x smaller than raw u64 — the <10KB ballot budget,
// key_serializer.h:392), and CRC32 runs at memory speed.
//
// Exposed via ctypes (node_fhe_accelerate_tpu/native/__init__.py), with a
// pure-numpy fallback when the shared object is unavailable.

#include <cstdint>
#include <cstddef>
#include <cstring>

extern "C" {

// CRC-32 (IEEE, zlib-compatible), slice-by-one with a lazily built table.
static uint32_t crc_table[256];
static bool crc_ready = false;

static void build_table() {
    for (uint32_t i = 0; i < 256; ++i) {
        uint32_t c = i;
        for (int k = 0; k < 8; ++k)
            c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        crc_table[i] = c;
    }
    crc_ready = true;
}

uint32_t nfa_crc32(const uint8_t* data, size_t len, uint32_t seed) {
    if (!crc_ready) build_table();
    uint32_t c = seed ^ 0xFFFFFFFFu;
    for (size_t i = 0; i < len; ++i)
        c = crc_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

// Pack n little-endian u64 words to `bits` bits each (bits in [1, 64]).
// out must hold at least (n*bits + 7)/8 bytes. Returns bytes written.
size_t nfa_pack_words(const uint64_t* in, size_t n, uint32_t bits,
                      uint8_t* out) {
    size_t out_len = (n * bits + 7) / 8;
    std::memset(out, 0, out_len);
    size_t bitpos = 0;
    for (size_t i = 0; i < n; ++i) {
        uint64_t v = (bits == 64) ? in[i]
                                  : (in[i] & ((1ULL << bits) - 1ULL));
        size_t byte = bitpos >> 3;
        unsigned shift = bitpos & 7;
        // write up to 9 bytes
        uint8_t* p = out + byte;
        uint64_t cur = v << shift;
        for (int b = 0; b < 8; ++b)
            p[b] |= (uint8_t)(cur >> (8 * b));
        if (shift + bits > 64)
            p[8] |= (uint8_t)(v >> (64 - shift));
        bitpos += bits;
    }
    return out_len;
}

// Unpack n words of `bits` bits each from the packed stream.
void nfa_unpack_words(const uint8_t* in, size_t n, uint32_t bits,
                      uint64_t* out) {
    size_t bitpos = 0;
    uint64_t mask = (bits == 64) ? ~0ULL : ((1ULL << bits) - 1ULL);
    for (size_t i = 0; i < n; ++i) {
        size_t byte = bitpos >> 3;
        unsigned shift = bitpos & 7;
        uint64_t v = 0;
        const uint8_t* p = in + byte;
        for (int b = 0; b < 8; ++b)
            v |= ((uint64_t)p[b]) << (8 * b);
        v >>= shift;
        if (shift + bits > 64)
            v |= ((uint64_t)p[8]) << (64 - shift);
        out[i] = v & mask;
        bitpos += bits;
    }
}

}  // extern "C"
