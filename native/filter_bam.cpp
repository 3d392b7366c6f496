// filter_bam — native read-pair filter for name-ordered Hi-C BAM.
//
// Equivalent of the reference's native utils/filter_bam (stripped blob;
// Python twin at utils/filter_bam.py): keeps read pairs whose MAPQ and
// NM pass the cutoffs, dropping duplicates/singletons on request.
// Unlike the reference (which streams SAM text through samtools twice),
// this writes the filtered BAM directly: kept records are copied
// verbatim and re-wrapped in BGZF blocks.
//
// Usage: filter_bam <in.bam> <mapq> [--nm N] [--remove_dup]
//                   [--remove_singletons] [--single_end_mapq_filtering]
//                   [-o out.bam]
//
// Build: g++ -O3 -o filter_bam filter_bam.cpp -lz

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---------------- BGZF input ----------------------------------------

struct BgzfReader {
  FILE* f;
  std::vector<uint8_t> buf;
  size_t off = 0;

  explicit BgzfReader(FILE* file) : f(file) {}

  bool read_block() {
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f) != 12) return false;
    if (hdr[0] != 0x1f || hdr[1] != 0x8b) return false;
    uint16_t xlen = hdr[10] | (hdr[11] << 8);
    std::vector<uint8_t> extra(xlen);
    if (fread(extra.data(), 1, xlen, f) != xlen) return false;
    int bsize = -1;
    for (size_t p = 0; p + 4 <= extra.size();) {
      uint16_t slen = extra[p + 2] | (extra[p + 3] << 8);
      if (extra[p] == 'B' && extra[p + 1] == 'C' && slen == 2)
        bsize = (extra[p + 4] | (extra[p + 5] << 8)) + 1;
      p += 4 + slen;
    }
    if (bsize < 0) return false;
    size_t clen = bsize - 12 - xlen - 8;
    std::vector<uint8_t> cdata(clen);
    if (fread(cdata.data(), 1, clen, f) != clen) return false;
    uint8_t tail[8];
    if (fread(tail, 1, 8, f) != 8) return false;
    uint32_t isize = tail[4] | (tail[5] << 8) | (tail[6] << 16) |
                     (uint32_t(tail[7]) << 24);
    size_t old = buf.size() - off;
    if (off > 0) {
      memmove(buf.data(), buf.data() + off, old);
      buf.resize(old);
      off = 0;
    }
    size_t base = buf.size();
    buf.resize(base + isize);
    if (isize == 0) return true;
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    inflateInit2(&zs, -15);
    zs.next_in = cdata.data();
    zs.avail_in = static_cast<uInt>(clen);
    zs.next_out = buf.data() + base;
    zs.avail_out = isize;
    int ret = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    return ret == Z_STREAM_END || ret == Z_OK;
  }

  bool fill(size_t need) {
    while (buf.size() - off < need)
      if (!read_block()) return false;
    return true;
  }

  const uint8_t* take(size_t n) {
    const uint8_t* p = buf.data() + off;
    off += n;
    return p;
  }
};

// ---------------- BGZF output ---------------------------------------

struct BgzfWriter {
  FILE* f;
  std::vector<uint8_t> pending;

  explicit BgzfWriter(FILE* file) : f(file) {}

  void write(const uint8_t* data, size_t n) {
    pending.insert(pending.end(), data, data + n);
    while (pending.size() >= 0xff00) flush_block(0xff00);
  }

  void flush_block(size_t n) {
    if (n == 0) return;
    std::vector<uint8_t> cdata(n + 1024);
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    deflateInit2(&zs, 6, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY);
    zs.next_in = pending.data();
    zs.avail_in = static_cast<uInt>(n);
    zs.next_out = cdata.data();
    zs.avail_out = static_cast<uInt>(cdata.size());
    deflate(&zs, Z_FINISH);
    size_t clen = cdata.size() - zs.avail_out;
    deflateEnd(&zs);
    uint32_t crc = crc32(0, pending.data(), static_cast<uInt>(n));
    uint16_t bsize = static_cast<uint16_t>(clen + 12 + 6 + 8 - 1);
    uint8_t hdr[18] = {0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff,
                       6, 0, 'B', 'C', 2, 0,
                       static_cast<uint8_t>(bsize & 0xff),
                       static_cast<uint8_t>(bsize >> 8)};
    fwrite(hdr, 1, 18, f);
    fwrite(cdata.data(), 1, clen, f);
    uint8_t tail[8];
    memcpy(tail, &crc, 4);
    uint32_t isize = static_cast<uint32_t>(n);
    memcpy(tail + 4, &isize, 4);
    fwrite(tail, 1, 8, f);
    pending.erase(pending.begin(), pending.begin() + n);
  }

  void close() {
    while (!pending.empty())
      flush_block(pending.size() > 0xff00 ? 0xff00 : pending.size());
    static const uint8_t eof[28] = {
        0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00,
        0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
        0, 0, 0, 0, 0, 0, 0, 0};
    fwrite(eof, 1, 28, f);
  }
};

struct Record {
  std::vector<uint8_t> raw;   // includes the leading block_size field
  std::string name;
  uint16_t flag = 0;
  uint8_t mapq = 0;
  int64_t nm = -1;
};

int64_t find_nm(const uint8_t* aux, size_t len) {
  size_t p = 0;
  while (p + 3 <= len) {
    char t1 = aux[p], t2 = aux[p + 1], type = aux[p + 2];
    p += 3;
    size_t size = 0;
    switch (type) {
      case 'A': case 'c': case 'C': size = 1; break;
      case 's': case 'S': size = 2; break;
      case 'i': case 'I': case 'f': size = 4; break;
      case 'Z': case 'H': {
        size_t q = p;
        while (q < len && aux[q]) ++q;
        size = q - p + 1;
        break;
      }
      case 'B': {
        if (p + 5 > len) return -1;
        char sub = aux[p];
        uint32_t cnt;
        memcpy(&cnt, aux + p + 1, 4);
        size_t esz = (sub == 'c' || sub == 'C') ? 1
                     : (sub == 's' || sub == 'S') ? 2 : 4;
        size = 5 + esz * cnt;
        break;
      }
      default: return -1;
    }
    if (p + size > len) return -1;
    if (t1 == 'N' && t2 == 'M') {
      switch (type) {
        case 'c': return *reinterpret_cast<const int8_t*>(aux + p);
        case 'C': return aux[p];
        case 's': { int16_t v; memcpy(&v, aux + p, 2); return v; }
        case 'S': { uint16_t v; memcpy(&v, aux + p, 2); return v; }
        case 'i': { int32_t v; memcpy(&v, aux + p, 4); return v; }
        case 'I': { uint32_t v; memcpy(&v, aux + p, 4); return v; }
        default: return -1;
      }
    }
    p += size;
  }
  return -1;
}

bool read_record(BgzfReader& in, Record* rec) {
  if (!in.fill(4)) return false;
  uint32_t block_size;
  memcpy(&block_size, in.buf.data() + in.off, 4);
  if (!in.fill(4 + block_size)) return false;
  const uint8_t* p = in.take(4 + block_size) ;
  rec->raw.assign(p, p + 4 + block_size);
  const uint8_t* r = p + 4;
  uint8_t l_read_name = r[8];
  rec->mapq = r[9];
  uint16_t n_cigar;
  memcpy(&n_cigar, r + 12, 2);
  memcpy(&rec->flag, r + 14, 2);
  uint32_t l_seq;
  memcpy(&l_seq, r + 16, 4);
  rec->name.assign(reinterpret_cast<const char*>(r + 32), l_read_name - 1);
  size_t fixed = 32 + l_read_name + 4 * n_cigar + (l_seq + 1) / 2 + l_seq;
  rec->nm = (fixed <= block_size)
                ? find_nm(r + fixed, block_size - fixed) : -1;
  return true;
}

}  // namespace

int main(int argc, char** argv) {
  const char* usage =
      "usage: filter_bam <in.bam> <mapq> [--nm N] [--remove_dup]\n"
      "                  [--remove_singletons] [--single_end_mapq_filtering]\n"
      "                  [-o out.bam (default: stdout)]\n";
  if (argc < 3) {
    fputs(usage, stderr);
    return 2;
  }
  const char* in_path = argv[1];
  int mapq = atoi(argv[2]);
  long nm_cutoff = -1;
  bool remove_dup = false, remove_singletons = false, single_end = false;
  const char* out_path = nullptr;
  for (int i = 3; i < argc; ++i) {
    if (!strcmp(argv[i], "--nm") || !strcmp(argv[i], "--NM")) {
      nm_cutoff = atol(argv[++i]);
    } else if (!strcmp(argv[i], "--remove_dup")) {
      remove_dup = true;
    } else if (!strcmp(argv[i], "--remove_singletons")) {
      remove_singletons = true;
    } else if (!strcmp(argv[i], "--single_end_mapq_filtering")) {
      single_end = true;
    } else if (!strcmp(argv[i], "-o")) {
      out_path = argv[++i];
    } else if (!strcmp(argv[i], "--threads")) {
      ++i;  // accepted for CLI compatibility; IO is streaming
    } else {
      fprintf(stderr, "unknown option: %s\n%s", argv[i], usage);
      return 2;
    }
  }

  FILE* fin = fopen(in_path, "rb");
  if (!fin) { perror(in_path); return 1; }
  FILE* fout = out_path ? fopen(out_path, "wb") : stdout;
  if (!fout) { perror(out_path); return 1; }

  BgzfReader in(fin);
  BgzfWriter out(fout);

  // copy the header verbatim
  if (!in.fill(8)) { fprintf(stderr, "truncated BAM\n"); return 1; }
  if (memcmp(in.buf.data(), "BAM\1", 4) != 0) {
    fprintf(stderr, "%s is not a BAM file\n", in_path);
    return 1;
  }
  uint32_t l_text;
  memcpy(&l_text, in.buf.data() + 4, 4);
  if (!in.fill(8 + l_text + 4)) return 1;
  uint32_t n_ref;
  memcpy(&n_ref, in.buf.data() + 8 + l_text, 4);
  size_t hdr_len = 8 + l_text + 4;
  in.off = hdr_len;
  out.write(in.buf.data(), hdr_len);
  for (uint32_t i = 0; i < n_ref; ++i) {
    if (!in.fill(4)) return 1;
    uint32_t l_name;
    memcpy(&l_name, in.buf.data() + in.off, 4);
    if (!in.fill(4 + l_name + 4)) return 1;
    out.write(in.buf.data() + in.off, 4 + l_name + 4);
    in.take(4 + l_name + 4);
  }

  Record a, b;
  bool have_a = false;
  uint64_t kept = 0, seen = 0;
  for (;;) {
    Record rec;
    if (!read_record(in, &rec)) break;
    ++seen;
    if (remove_dup && (rec.flag & 1024)) continue;
    if (!have_a) {
      a = std::move(rec);
      have_a = true;
      continue;
    }
    b = std::move(rec);
    if (a.name != b.name) {
      if (remove_singletons) {
        a = std::move(b);
        continue;
      }
      fprintf(stderr,
              "BAM may be coord-sorted or has singletons. Sort it by "
              "read name or try --remove_singletons\n");
      return 1;
    }
    have_a = false;
    if (nm_cutoff >= 0 &&
        ((a.nm >= 0 && a.nm >= nm_cutoff) ||
         (b.nm >= 0 && b.nm >= nm_cutoff)))
      continue;
    bool pass = single_end ? (a.mapq >= mapq || b.mapq >= mapq)
                           : (a.mapq >= mapq && b.mapq >= mapq);
    if (!pass) continue;
    out.write(a.raw.data(), a.raw.size());
    out.write(b.raw.data(), b.raw.size());
    kept += 2;
  }
  out.close();
  if (fout != stdout) fclose(fout);
  fclose(fin);
  fprintf(stderr, "filter_bam: kept %llu of %llu records\n",
          static_cast<unsigned long long>(kept),
          static_cast<unsigned long long>(seen));
  return 0;
}
