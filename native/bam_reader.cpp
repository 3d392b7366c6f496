// Native BAM/BGZF decoder for Hi-C alignment ingest.
//
// Replaces the reference's pysam/htslib dependency
// (pysam.AlignmentFile with decoder threads, reference
// scripts/HapHiC_cluster.py:1586-1593, :2862) and the native
// utils/filter_bam binary (a stripped large blob in the reference;
// Python twin at utils/filter_bam.py).
//
// Design: BGZF blocks are decompressed by a worker pool (the htslib
// `threads=` equivalent); the record walk extracts only the columns the
// pipeline needs (refID, pos, next_refID, next_pos, flag, mapq, NM) into
// caller-provided arrays — the Python side never touches per-record
// bytes. Exposed via a C ABI consumed with ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libbamreader.so bam_reader.cpp -lz -lpthread

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <map>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr size_t kMaxBlock = 0x10000;  // 64 KiB uncompressed BGZF block

struct CompressedBlock {
  std::vector<uint8_t> data;   // raw deflate payload
  size_t isize = 0;            // uncompressed size
  uint64_t seq = 0;
};

struct DecodedBlock {
  std::vector<uint8_t> data;
  uint64_t seq = 0;
};

// ---------------- BGZF block reader (file -> compressed payloads) ----

class BgzfScanner {
 public:
  explicit BgzfScanner(FILE* f) : f_(f) {}

  // Returns false on EOF. Fills the raw deflate payload + isize.
  bool next(CompressedBlock* out) {
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f_) != 12) return false;
    if (hdr[0] != 0x1f || hdr[1] != 0x8b) return false;
    uint16_t xlen = hdr[10] | (hdr[11] << 8);
    std::vector<uint8_t> extra(xlen);
    if (fread(extra.data(), 1, xlen, f_) != xlen) return false;
    int bsize = -1;
    for (size_t p = 0; p + 4 <= extra.size();) {
      uint8_t si1 = extra[p], si2 = extra[p + 1];
      uint16_t slen = extra[p + 2] | (extra[p + 3] << 8);
      if (si1 == 'B' && si2 == 'C' && slen == 2) {
        bsize = (extra[p + 4] | (extra[p + 5] << 8)) + 1;
      }
      p += 4 + slen;
    }
    if (bsize < 0) return false;  // not BGZF
    size_t cdata_len = bsize - 12 - xlen - 8;
    out->data.resize(cdata_len);
    if (fread(out->data.data(), 1, cdata_len, f_) != cdata_len) return false;
    uint8_t tail[8];
    if (fread(tail, 1, 8, f_) != 8) return false;
    out->isize = tail[4] | (tail[5] << 8) | (tail[6] << 16) |
                 (uint32_t(tail[7]) << 24);
    return true;
  }

 private:
  FILE* f_;
};

bool inflate_raw(const std::vector<uint8_t>& in, std::vector<uint8_t>* out,
                 size_t isize) {
  out->resize(isize);
  if (isize == 0) return true;
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  zs.next_out = out->data();
  zs.avail_out = static_cast<uInt>(out->size());
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return ret == Z_STREAM_END || ret == Z_OK;
}

// ---------------- multithreaded block pipeline ----------------------

class BlockPipeline {
 public:
  BlockPipeline(FILE* f, int nthreads)
      : scanner_(f), nthreads_(nthreads > 0 ? nthreads : 1) {
    for (int i = 0; i < nthreads_; ++i) {
      workers_.emplace_back([this] { worker(); });
    }
    reader_ = std::thread([this] { read_loop(); });
  }

  ~BlockPipeline() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
      cv_in_.notify_all();
      cv_out_.notify_all();
    }
    if (reader_.joinable()) reader_.join();
    for (auto& t : workers_) t.join();
  }

  // Next decoded block in file order; false at EOF.
  bool next(std::vector<uint8_t>* out) {
    std::unique_lock<std::mutex> lk(mu_);
    for (;;) {
      auto it = done_.find(next_seq_);
      if (it != done_.end()) {
        *out = std::move(it->second);
        done_.erase(it);
        ++next_seq_;
        cv_in_.notify_all();
        return true;
      }
      if (eof_ && pending_ == 0 && done_.empty()) return false;
      cv_out_.wait(lk);
    }
  }

 private:
  void read_loop() {
    uint64_t seq = 0;
    for (;;) {
      CompressedBlock blk;
      {
        // backpressure: keep at most 4 blocks in flight per worker
        std::unique_lock<std::mutex> lk(mu_);
        cv_in_.wait(lk, [this] {
          return stop_ || pending_ + done_.size() <
                              static_cast<size_t>(4 * nthreads_);
        });
        if (stop_) break;
      }
      if (!scanner_.next(&blk)) break;
      blk.seq = seq++;
      {
        std::lock_guard<std::mutex> lk(mu_);
        queue_.push(std::move(blk));
        ++pending_;
      }
      cv_work_.notify_one();
    }
    {
      std::lock_guard<std::mutex> lk(mu_);
      eof_ = true;
    }
    cv_work_.notify_all();
    cv_out_.notify_all();
  }

  void worker() {
    for (;;) {
      CompressedBlock blk;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [this] { return stop_ || eof_ || !queue_.empty(); });
        if (stop_) return;
        if (queue_.empty()) {
          if (eof_) return;
          continue;
        }
        blk = std::move(queue_.front());
        queue_.pop();
      }
      std::vector<uint8_t> out;
      inflate_raw(blk.data, &out, blk.isize);
      {
        std::lock_guard<std::mutex> lk(mu_);
        done_.emplace(blk.seq, std::move(out));
        --pending_;
      }
      cv_out_.notify_all();
    }
  }

  BgzfScanner scanner_;
  int nthreads_;
  std::thread reader_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_in_, cv_work_, cv_out_;
  std::queue<CompressedBlock> queue_;
  std::map<uint64_t, std::vector<uint8_t>> done_;
  size_t pending_ = 0;
  uint64_t next_seq_ = 0;
  bool eof_ = false;
  bool stop_ = false;
};

// ---------------- BAM stream ----------------------------------------

struct BamFile {
  FILE* f = nullptr;
  BlockPipeline* pipe = nullptr;
  std::string header_text;
  std::vector<std::string> ref_names;
  std::vector<int64_t> ref_lens;
  std::vector<uint8_t> buf;     // decoded bytes not yet consumed
  size_t off = 0;               // read offset into buf
  bool eof = false;
  std::string error;

  bool fill(size_t need) {
    // ensure buf has >= need unread bytes; compact + append blocks
    while (buf.size() - off < need) {
      std::vector<uint8_t> blk;
      if (!pipe->next(&blk)) return false;
      if (off > 0 && off == buf.size()) {
        buf.clear();
        off = 0;
      }
      buf.insert(buf.end(), blk.begin(), blk.end());
    }
    return true;
  }

  template <typename T>
  T read_scalar() {
    T v;
    memcpy(&v, buf.data() + off, sizeof(T));
    off += sizeof(T);
    return v;
  }
};

int64_t find_nm_tag(const uint8_t* aux, size_t len) {
  // walk the aux fields; returns NM value or -1
  size_t p = 0;
  while (p + 3 <= len) {
    char t1 = aux[p], t2 = aux[p + 1], type = aux[p + 2];
    p += 3;
    int64_t val = 0;
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
        uint32_t n;
        memcpy(&n, aux + p + 1, 4);
        size_t esz = (sub == 'c' || sub == 'C') ? 1
                     : (sub == 's' || sub == 'S') ? 2 : 4;
        size = 5 + esz * n;
        break;
      }
      default:
        return -1;
    }
    if (p + size > len) return -1;
    if (t1 == 'N' && t2 == 'M' && size <= 4 && type != 'Z' && type != 'H' &&
        type != 'B' && type != 'f') {
      switch (type) {
        case 'c': val = *reinterpret_cast<const int8_t*>(aux + p); break;
        case 'C': val = aux[p]; break;
        case 's': { int16_t x; memcpy(&x, aux + p, 2); val = x; break; }
        case 'S': { uint16_t x; memcpy(&x, aux + p, 2); val = x; break; }
        case 'i': { int32_t x; memcpy(&x, aux + p, 4); val = x; break; }
        case 'I': { uint32_t x; memcpy(&x, aux + p, 4); val = x; break; }
        default: val = -1;
      }
      return val;
    }
    p += size;
  }
  return -1;
}

}  // namespace

extern "C" {

void* bam_open(const char* path, int nthreads) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* b = new BamFile();
  b->f = f;
  b->pipe = new BlockPipeline(f, nthreads);
  // header: magic, l_text, text, n_ref, (l_name name l_ref)*
  if (!b->fill(8)) { delete b; fclose(f); return nullptr; }
  if (memcmp(b->buf.data() + b->off, "BAM\1", 4) != 0) {
    delete b->pipe; delete b; fclose(f); return nullptr;
  }
  b->off += 4;
  uint32_t l_text = b->read_scalar<uint32_t>();
  if (!b->fill(l_text + 4)) { delete b->pipe; delete b; fclose(f); return nullptr; }
  b->header_text.assign(reinterpret_cast<const char*>(b->buf.data() + b->off),
                        l_text);
  b->off += l_text;
  uint32_t n_ref = b->read_scalar<uint32_t>();
  for (uint32_t i = 0; i < n_ref; ++i) {
    if (!b->fill(4)) break;
    uint32_t l_name = b->read_scalar<uint32_t>();
    if (!b->fill(l_name + 4)) break;
    b->ref_names.emplace_back(
        reinterpret_cast<const char*>(b->buf.data() + b->off), l_name - 1);
    b->off += l_name;
    b->ref_lens.push_back(b->read_scalar<uint32_t>());
  }
  return b;
}

int bam_nrefs(void* h) {
  return static_cast<int>(static_cast<BamFile*>(h)->ref_names.size());
}

const char* bam_ref_name(void* h, int i) {
  return static_cast<BamFile*>(h)->ref_names[i].c_str();
}

int64_t bam_ref_len(void* h, int i) {
  return static_cast<BamFile*>(h)->ref_lens[i];
}

const char* bam_header_text(void* h) {
  return static_cast<BamFile*>(h)->header_text.c_str();
}

// Read up to max_records records into the supplied arrays.
// Returns the number filled; 0 at EOF; -1 on error.
int64_t bam_read_chunk(void* h, int64_t max_records, int32_t* ref,
                       int64_t* pos, int32_t* mref, int64_t* mpos,
                       uint16_t* flag, uint8_t* mapq, int32_t* nm) {
  auto* b = static_cast<BamFile*>(h);
  int64_t n = 0;
  while (n < max_records) {
    if (!b->fill(4)) break;
    uint32_t block_size = b->read_scalar<uint32_t>();
    if (!b->fill(block_size)) { b->error = "truncated record"; return -1; }
    const uint8_t* rec = b->buf.data() + b->off;
    int32_t refid, p, next_refid, next_pos;
    memcpy(&refid, rec, 4);
    memcpy(&p, rec + 4, 4);
    uint8_t l_read_name = rec[8];
    uint8_t q = rec[9];
    uint16_t n_cigar;
    memcpy(&n_cigar, rec + 12, 2);
    uint16_t fl;
    memcpy(&fl, rec + 14, 2);
    uint32_t l_seq;
    memcpy(&l_seq, rec + 16, 4);
    memcpy(&next_refid, rec + 20, 4);
    memcpy(&next_pos, rec + 24, 4);
    if (nm != nullptr) {
      size_t fixed = 32 + l_read_name + 4 * n_cigar + (l_seq + 1) / 2 + l_seq;
      nm[n] = (fixed <= block_size)
                  ? static_cast<int32_t>(
                        find_nm_tag(rec + fixed, block_size - fixed))
                  : -1;
    }
    b->off += block_size;
    ref[n] = refid;
    pos[n] = p;
    mref[n] = next_refid;
    mpos[n] = next_pos;
    flag[n] = fl;
    mapq[n] = q;
    ++n;
  }
  return n;
}

void bam_close(void* h) {
  auto* b = static_cast<BamFile*>(h);
  delete b->pipe;
  fclose(b->f);
  delete b;
}

}  // extern "C"
