// Columnar tokenizer for 4DN .pairs / .pairs.gz alignment files — the
// native fast path of haphic_tpu.io.pairs.PairsReader.
//
// The ingest pass is the reference's top wall-clock hot loop
// (scripts/HapHiC_cluster.py:1539-1583, one Python dict update per read
// pair); our Python block tokenizer already vectorizes it, but at 10M+
// pairs the str.split + numpy-str conversion still costs tens of
// seconds of host time (VERDICT r3: ingest 34 s of the 16k-fragment
// cluster stage). This parser scans the byte stream once, resolves
// contig names through an open-addressing hash table, and writes the
// four output columns (ref id, 0-based pos, mate ref id, mate pos)
// straight into caller-provided buffers. Called through ctypes, which
// releases the GIL — wrapped in io.pairs.prefetch the parse genuinely
// overlaps the numpy link aggregation on a second core.
//
// Format semantics mirror the Python reader exactly:
//   * lines starting with '#' are comments (header) and skipped
//   * fields are split on runs of spaces/tabs
//   * lines with fewer than 5 fields (incl. whitespace-only) skipped
//   * positions are 1-based in the file, 0-based in the output
//   * unknown contig names resolve to -1
// zlib's gz* layer reads both gzipped and plain files transparently.

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr size_t kReadBlock = 8u << 20;  // bytes per gzread

struct NameTable {
    // open addressing, power-of-two capacity, FNV-1a hash
    std::vector<int64_t> slot;   // offset into arena, -1 empty
    std::vector<int32_t> id;
    std::vector<uint32_t> len;
    std::string arena;
    size_t mask = 0;

    static uint64_t hash(const char* s, size_t n) {
        uint64_t h = 1469598103934665603ull;
        for (size_t i = 0; i < n; ++i) {
            h ^= static_cast<unsigned char>(s[i]);
            h *= 1099511628211ull;
        }
        return h;
    }

    void build(const char* const* names, int64_t count) {
        size_t cap = 16;
        while (cap < static_cast<size_t>(count) * 2) cap <<= 1;
        mask = cap - 1;
        slot.assign(cap, -1);
        id.assign(cap, -1);
        len.assign(cap, 0);
        for (int64_t i = 0; i < count; ++i) {
            size_t n = std::strlen(names[i]);
            size_t pos = hash(names[i], n) & mask;
            while (slot[pos] != -1) pos = (pos + 1) & mask;
            slot[pos] = static_cast<int64_t>(arena.size());
            id[pos] = static_cast<int32_t>(i);
            len[pos] = static_cast<uint32_t>(n);
            arena.append(names[i], n);
        }
    }

    int32_t lookup(const char* s, size_t n) const {
        size_t pos = hash(s, n) & mask;
        while (true) {
            int64_t off = slot[pos];
            if (off == -1) return -1;
            if (len[pos] == n
                && std::memcmp(arena.data() + off, s, n) == 0)
                return id[pos];
            pos = (pos + 1) & mask;
        }
    }
};

struct PairsHandle {
    gzFile f = nullptr;
    NameTable table;
    std::vector<char> buf;     // window of the stream
    size_t head = 0;           // first unconsumed byte
    size_t size = 0;           // valid bytes in buf
    bool eof = false;
    bool error = false;
};

inline bool is_sep(char c) { return c == '\t' || c == ' '; }

// Parse one line [p, end). Returns true if a record was produced.
inline bool parse_line(const char* p, const char* end,
                       const NameTable& table, int32_t* ref,
                       int64_t* pos, int32_t* mref, int64_t* mpos) {
    // field 0 (read id)
    while (p < end && is_sep(*p)) ++p;
    if (p >= end || *p == '#') return false;
    while (p < end && !is_sep(*p)) ++p;
    // field 1: ref name
    while (p < end && is_sep(*p)) ++p;
    const char* f1 = p;
    while (p < end && !is_sep(*p)) ++p;
    if (p >= end || p == f1) return false;
    size_t n1 = static_cast<size_t>(p - f1);
    // field 2: pos
    while (p < end && is_sep(*p)) ++p;
    if (p >= end) return false;
    int64_t v2 = 0;
    bool any2 = false, neg2 = false;
    if (*p == '-') { neg2 = true; ++p; }
    while (p < end && *p >= '0' && *p <= '9') {
        v2 = v2 * 10 + (*p - '0');
        ++p;
        any2 = true;
    }
    if (!any2 || (p < end && !is_sep(*p))) return false;
    // field 3: mate ref name
    while (p < end && is_sep(*p)) ++p;
    const char* f3 = p;
    while (p < end && !is_sep(*p)) ++p;
    if (p >= end || p == f3) return false;
    size_t n3 = static_cast<size_t>(p - f3);
    // field 4: mate pos
    while (p < end && is_sep(*p)) ++p;
    if (p >= end) return false;
    int64_t v4 = 0;
    bool any4 = false, neg4 = false;
    if (*p == '-') { neg4 = true; ++p; }
    while (p < end && *p >= '0' && *p <= '9') {
        v4 = v4 * 10 + (*p - '0');
        ++p;
        any4 = true;
    }
    if (!any4 || (p < end && !is_sep(*p))) return false;
    *ref = table.lookup(f1, n1);
    *mref = table.lookup(f3, n3);
    *pos = (neg2 ? -v2 : v2) - 1;
    *mpos = (neg4 ? -v4 : v4) - 1;
    return true;
}

}  // namespace

extern "C" {

void* pairs_open(const char* path, const char* const* names,
                 int64_t n_names) {
    PairsHandle* h = new PairsHandle();
    h->f = gzopen(path, "rb");
    if (h->f == nullptr) {
        delete h;
        return nullptr;
    }
    gzbuffer(h->f, 1u << 20);
    h->table.build(names, n_names);
    h->buf.reserve(kReadBlock * 2);
    return h;
}

// Fill up to cap records. Returns number filled; 0 at clean EOF;
// -1 on read error.
int64_t pairs_next(void* handle, int32_t* ref, int64_t* pos,
                   int32_t* mref, int64_t* mpos, int64_t cap) {
    PairsHandle* h = static_cast<PairsHandle*>(handle);
    if (h->error) return -1;
    int64_t out = 0;
    while (out < cap) {
        const char* data = h->buf.data();
        const char* nl = static_cast<const char*>(
            memchr(data + h->head, '\n', h->size - h->head));
        if (nl != nullptr) {
            if (parse_line(data + h->head, nl, h->table, ref + out,
                           pos + out, mref + out, mpos + out))
                ++out;
            h->head = static_cast<size_t>(nl - data) + 1;
            continue;
        }
        if (!h->eof) {
            // compact once, then refill a whole block
            if (h->head > 0) {
                std::memmove(h->buf.data(), data + h->head,
                             h->size - h->head);
                h->size -= h->head;
                h->head = 0;
            }
            h->buf.resize(h->size + kReadBlock);
            int got = gzread(h->f, h->buf.data() + h->size,
                             static_cast<unsigned>(kReadBlock));
            if (got < 0) {
                h->error = true;
                return -1;
            }
            if (got == 0) h->eof = true;
            h->size += static_cast<size_t>(got);
            continue;
        }
        // EOF: final unterminated line (if any)
        if (h->head < h->size) {
            if (parse_line(data + h->head, data + h->size, h->table,
                           ref + out, pos + out, mref + out, mpos + out))
                ++out;
            h->head = h->size;
        }
        break;
    }
    return out;
}

void pairs_close(void* handle) {
    PairsHandle* h = static_cast<PairsHandle*>(handle);
    if (h->f != nullptr) gzclose(h->f);
    delete h;
}

}  // extern "C"
