// Native FASTQ loader: gzipped/plain FASTQ -> fixed-shape int8 base codes.
//
// The reference pipeline leans on external C tools (samtools fastq, gzip)
// for its IO path; here the hot host-side loop — decompress, parse, encode
// to the aligner's int8 layout — is a small C++ library driven from Python
// via ctypes (see kir_graph_tpu/native_io.py).
//
// Strategy: decompress the whole file into memory once (gzread with a big
// buffer), then parse records straight out of the buffer — no per-line
// allocation, no second decompression for counting.
//
// C ABI:
//   kgt_open(path) -> handle (>=0) or -1; decompresses and counts records
//   kgt_num_reads(handle) -> record count
//   kgt_fill(handle, max_len, codes_out, lens_out, cap) -> n written;
//     frees the handle afterwards. codes_out int8[cap*max_len] pad=4.
//   kgt_pack2bit(codes, n, max_len, out)

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

constexpr int8_t kPad = 4;

int8_t g_encode[256];
struct EncodeInit {
    EncodeInit() {
        for (int i = 0; i < 256; ++i) g_encode[i] = kPad;
        g_encode['A'] = g_encode['a'] = 0;
        g_encode['C'] = g_encode['c'] = 1;
        g_encode['G'] = g_encode['g'] = 2;
        g_encode['T'] = g_encode['t'] = 3;
    }
} g_encode_init;

struct Loaded {
    std::vector<char> data;
    long n_reads = 0;
};

std::mutex g_mu;
std::unordered_map<long, Loaded> g_handles;
long g_next_handle = 0;

bool decompressAll(const char* path, std::vector<char>& out) {
    gzFile f = gzopen(path, "rb");
    if (!f) return false;
    gzbuffer(f, 1 << 20);
    out.clear();
    out.reserve(1 << 22);
    std::vector<char> chunk(1 << 22);
    int got;
    while ((got = gzread(f, chunk.data(), static_cast<unsigned>(chunk.size()))) > 0)
        out.insert(out.end(), chunk.data(), chunk.data() + got);
    gzclose(f);
    return got == 0;
}

}  // namespace

extern "C" {

long kgt_open(const char* path) {
    Loaded loaded;
    if (!decompressAll(path, loaded.data)) return -1;
    long lines = 0;
    for (char c : loaded.data)
        if (c == '\n') ++lines;
    if (!loaded.data.empty() && loaded.data.back() != '\n') ++lines;
    loaded.n_reads = lines / 4;
    std::lock_guard<std::mutex> lock(g_mu);
    long h = g_next_handle++;
    g_handles[h] = std::move(loaded);
    return h;
}

long kgt_num_reads(long handle) {
    std::lock_guard<std::mutex> lock(g_mu);
    auto it = g_handles.find(handle);
    return it == g_handles.end() ? -1 : it->second.n_reads;
}

long kgt_fill(long handle, int max_len, int8_t* codes_out, int32_t* lens_out,
              long cap) {
    Loaded loaded;
    {
        std::lock_guard<std::mutex> lock(g_mu);
        auto it = g_handles.find(handle);
        if (it == g_handles.end()) return -1;
        loaded = std::move(it->second);
        g_handles.erase(it);
    }
    const char* p = loaded.data.data();
    const char* end = p + loaded.data.size();
    long n = 0;
    int line_no = 0;
    while (p < end && n < cap) {
        const char* nl = static_cast<const char*>(
            memchr(p, '\n', static_cast<size_t>(end - p)));
        const char* line_end = nl ? nl : end;
        if (line_no % 4 == 1) {  // sequence line
            int L = static_cast<int>(line_end - p);
            if (L > 0 && line_end[-1] == '\r') --L;
            if (L > max_len) L = max_len;
            int8_t* row = codes_out + n * static_cast<long>(max_len);
            for (int i = 0; i < L; ++i)
                row[i] = g_encode[static_cast<unsigned char>(p[i])];
            for (int i = L; i < max_len; ++i) row[i] = kPad;
            lens_out[n] = L;
            ++n;
        }
        line_no = (line_no + 1) % 4;
        p = line_end + 1;
    }
    return n;
}

void kgt_pack2bit(const int8_t* codes, long n, int max_len, uint8_t* out) {
    int words = (max_len + 3) / 4;
    for (long r = 0; r < n; ++r) {
        const int8_t* row = codes + r * static_cast<long>(max_len);
        uint8_t* orow = out + r * static_cast<long>(words);
        for (int w = 0; w < words; ++w) {
            uint8_t v = 0;
            for (int k = 0; k < 4; ++k) {
                int i = w * 4 + k;
                int8_t c = (i < max_len) ? row[i] : kPad;
                if (c >= 4) c = 0;
                v |= static_cast<uint8_t>(c) << (2 * k);
            }
            orow[w] = v;
        }
    }
}

}  // extern "C"
