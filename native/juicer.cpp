// juicer — native Juicebox curation round-trip (pre/post).
//
// Same CLI and file contract as the reference's bundled YaHS `utils/juicer`
// binary (invoked from juicebox.sh, reference scripts/HapHiC_build.py:182-200)
// and as this repo's Python twin haphic_tpu/post/juicer.py:
//
//   juicer pre [-a] [-q MQ] [-o PREFIX] <aln.bam|pairs[.gz]> <scaffolds.agp>
//              [contigs.fai]
//       -> PREFIX.txt (juicer_tools "short" pairs in assembly coords),
//          PREFIX.assembly + PREFIX.liftover.agp (with -a),
//          stderr "[I::juicer_pre] PRE_C_SIZE: assembly <N>"
//   juicer post [-o PREFIX] <review.assembly> <liftover.agp> [contigs.fa]
//       -> PREFIX.agp (+ PREFIX.fa), honoring JBAT ':::fragment_N' /
//          ':::debris' splits.
//
// The pre hot path (BAM decode) shares the threaded BGZF pipeline with
// libbamreader (bam_reader.cpp).

#include <zlib.h>

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {
void* bam_open(const char* path, int nthreads);
int bam_nrefs(void* h);
const char* bam_ref_name(void* h, int i);
const char* bam_header_text(void* h);
int64_t bam_read_chunk(void* h, int64_t max_records, int32_t* ref,
                       int64_t* pos, int32_t* mref, int64_t* mpos,
                       uint16_t* flag, uint8_t* mapq, int32_t* nm);
void bam_close(void* h);
}

namespace {

struct Seg {
  int32_t ctg;
  int64_t raw_s, raw_e;    // 1-based inclusive raw contig coords
  int64_t grp_start;       // 1-based start within the AGP object
  int32_t grp;
  bool fwd;
};

struct Agp {
  std::vector<std::string> ctg_names;
  std::unordered_map<std::string, int32_t> ctg_id;
  std::vector<std::string> grp_names;
  std::unordered_map<std::string, int32_t> grp_id;
  std::vector<int64_t> grp_size;     // object length incl. gaps
  std::vector<Seg> segs;             // sorted by (ctg, raw_s)
  std::vector<int64_t> grp_offset;   // assembly-axis offset per object
  int64_t total = 0;

  int32_t intern_ctg(const std::string& s) {
    auto it = ctg_id.find(s);
    if (it != ctg_id.end()) return it->second;
    int32_t id = (int32_t)ctg_names.size();
    ctg_names.push_back(s);
    ctg_id.emplace(s, id);
    return id;
  }
  int32_t intern_grp(const std::string& s) {
    auto it = grp_id.find(s);
    if (it != grp_id.end()) return it->second;
    int32_t id = (int32_t)grp_names.size();
    grp_names.push_back(s);
    grp_id.emplace(s, id);
    grp_size.push_back(0);
    return id;
  }
};

std::vector<std::string> split_ws(const std::string& line) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < line.size()) {
    while (i < line.size() && std::isspace((unsigned char)line[i])) ++i;
    size_t j = i;
    while (j < line.size() && !std::isspace((unsigned char)line[j])) ++j;
    if (j > i) out.emplace_back(line, i, j - i);
    i = j;
  }
  return out;
}

bool parse_agp(const char* path, Agp* agp) {
  FILE* f = fopen(path, "r");
  if (!f) return false;
  char buf[1 << 16];
  while (fgets(buf, sizeof buf, f)) {
    if (buf[0] == '#' || buf[0] == '\n') continue;
    auto cols = split_ws(buf);
    if (cols.size() < 6) continue;
    int32_t g = agp->intern_grp(cols[0]);
    int64_t obj_end = atoll(cols[2].c_str());
    if (obj_end > agp->grp_size[g]) agp->grp_size[g] = obj_end;
    if (cols[4] != "W" || cols.size() < 9) continue;
    Seg s;
    s.ctg = agp->intern_ctg(cols[5]);
    s.grp = g;
    s.grp_start = atoll(cols[1].c_str());
    s.raw_s = atoll(cols[6].c_str());
    s.raw_e = atoll(cols[7].c_str());
    s.fwd = cols[8] == "+";
    agp->segs.push_back(s);
  }
  fclose(f);
  std::stable_sort(agp->segs.begin(), agp->segs.end(),
                   [](const Seg& a, const Seg& b) {
                     return a.ctg != b.ctg ? a.ctg < b.ctg
                                           : a.raw_s < b.raw_s;
                   });
  agp->grp_offset.assign(agp->grp_size.size(), 0);
  int64_t acc = 0;
  for (size_t i = 0; i < agp->grp_size.size(); ++i) {
    agp->grp_offset[i] = acc;
    acc += agp->grp_size[i];
  }
  agp->total = acc;
  return true;
}

// (ctg, 1-based raw pos) -> 1-based assembly coordinate, or -1.
int64_t map_pos(const Agp& agp, int32_t ctg, int64_t pos) {
  Seg key;
  key.ctg = ctg;
  key.raw_s = pos;
  auto it = std::upper_bound(agp.segs.begin(), agp.segs.end(), key,
                             [](const Seg& a, const Seg& b) {
                               return a.ctg != b.ctg ? a.ctg < b.ctg
                                                     : a.raw_s < b.raw_s;
                             });
  if (it == agp.segs.begin()) return -1;
  const Seg& s = *(it - 1);
  if (s.ctg != ctg || pos < s.raw_s || pos > s.raw_e) return -1;
  int64_t gpos = s.fwd ? s.grp_start + (pos - s.raw_s)
                       : s.grp_start + (s.raw_e - pos);
  return agp.grp_offset[s.grp] + gpos;
}

void write_assembly_files(const Agp& agp, const std::string& prefix) {
  // contig full length (derivable from the AGP: max raw_e per contig)
  std::vector<int64_t> ctg_len(agp.ctg_names.size(), 0);
  for (const Seg& s : agp.segs)
    if (s.raw_e > ctg_len[s.ctg]) ctg_len[s.ctg] = s.raw_e;

  // fragments = W lines in (group, grp_start) order
  std::vector<const Seg*> order;
  for (const Seg& s : agp.segs) order.push_back(&s);
  std::stable_sort(order.begin(), order.end(),
                   [](const Seg* a, const Seg* b) {
                     return a->grp != b->grp ? a->grp < b->grp
                                             : a->grp_start < b->grp_start;
                   });
  FILE* fa = fopen((prefix + ".assembly").c_str(), "w");
  FILE* fl = fopen((prefix + ".liftover.agp").c_str(), "w");
  std::map<int32_t, std::vector<std::string>> tour;
  for (size_t i = 0; i < order.size(); ++i) {
    const Seg& s = *order[i];
    int64_t frag_len = s.raw_e - s.raw_s + 1;
    const std::string& ctg = agp.ctg_names[s.ctg];
    char name[4096];
    if (s.raw_s == 1 && ctg_len[s.ctg] == frag_len)
      snprintf(name, sizeof name, "%s", ctg.c_str());
    else
      snprintf(name, sizeof name, "%s:%lld-%lld", ctg.c_str(),
               (long long)s.raw_s, (long long)s.raw_e);
    fprintf(fa, ">%s %zu %lld\n", name, i + 1, (long long)frag_len);
    fprintf(fl, "%s\t1\t%lld\t1\tW\t%s\t%lld\t%lld\t+\n", name,
            (long long)frag_len, ctg.c_str(), (long long)s.raw_s,
            (long long)s.raw_e);
    tour[s.grp].push_back((s.fwd ? "" : "-") + std::to_string(i + 1));
  }
  for (auto& kv : tour) {
    for (size_t i = 0; i < kv.second.size(); ++i)
      fprintf(fa, "%s%s", i ? " " : "", kv.second[i].c_str());
    fputc('\n', fa);
  }
  fclose(fa);
  fclose(fl);
}

void emit_pair(FILE* out, int64_t a, int64_t b) {
  if (a > b) std::swap(a, b);
  fprintf(out, "0 assembly %lld 0 1 assembly %lld 1\n", (long long)a,
          (long long)b);
}

int64_t pre_from_bam(const Agp& agp, const char* path, int mapq,
                     FILE* out) {
  void* h = bam_open(path, 8);
  if (!h) {
    fprintf(stderr, "[E::juicer_pre] cannot open %s\n", path);
    return -1;
  }
  // BAM refid -> AGP ctg id
  int nref = bam_nrefs(h);
  std::vector<int32_t> remap(nref, -1);
  for (int i = 0; i < nref; ++i) {
    auto it = agp.ctg_id.find(bam_ref_name(h, i));
    if (it != agp.ctg_id.end()) remap[i] = it->second;
  }
  const int64_t CH = 1 << 20;
  std::vector<int32_t> ref(CH), mref(CH);
  std::vector<int64_t> pos(CH), mpos(CH);
  std::vector<uint16_t> flag(CH);
  std::vector<uint8_t> mq(CH);
  int64_t n_out = 0;
  for (;;) {
    int64_t n = bam_read_chunk(h, CH, ref.data(), pos.data(), mref.data(),
                               mpos.data(), flag.data(), mq.data(),
                               nullptr);
    if (n <= 0) break;
    for (int64_t i = 0; i < n; ++i) {
      if (!(flag[i] & 0x40)) continue;          // read1 only
      if (mq[i] < mapq) continue;
      if (ref[i] < 0 || mref[i] < 0) continue;
      int32_t c1 = remap[ref[i]], c2 = remap[mref[i]];
      if (c1 < 0 || c2 < 0) continue;
      int64_t a = map_pos(agp, c1, pos[i] + 1);
      int64_t b = map_pos(agp, c2, mpos[i] + 1);
      if (a <= 0 || b <= 0) continue;
      emit_pair(out, a, b);
      ++n_out;
    }
  }
  bam_close(h);
  return n_out;
}

int64_t pre_from_pairs(const Agp& agp, const char* path, FILE* out) {
  gzFile f = gzopen(path, "rb");   // reads plain text too
  if (!f) {
    fprintf(stderr, "[E::juicer_pre] cannot open %s\n", path);
    return -1;
  }
  char buf[1 << 16];
  int64_t n_out = 0;
  while (gzgets(f, buf, sizeof buf)) {
    if (buf[0] == '#' || buf[0] == '\n') continue;
    auto cols = split_ws(buf);
    if (cols.size() < 5) continue;
    auto i1 = agp.ctg_id.find(cols[1]);
    auto i2 = agp.ctg_id.find(cols[3]);
    if (i1 == agp.ctg_id.end() || i2 == agp.ctg_id.end()) continue;
    int64_t a = map_pos(agp, i1->second, atoll(cols[2].c_str()));
    int64_t b = map_pos(agp, i2->second, atoll(cols[4].c_str()));
    if (a <= 0 || b <= 0) continue;
    emit_pair(out, a, b);
    ++n_out;
  }
  gzclose(f);
  return n_out;
}

bool ends_with(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  return s.size() >= n && s.compare(s.size() - n, n, suf) == 0;
}

int cmd_pre(int argc, char** argv) {
  std::string prefix = "out_JBAT";
  int mapq = 1;
  bool assembly_mode = false;
  std::vector<std::string> pos_args;
  for (int i = 0; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "-a") assembly_mode = true;
    else if (a == "-q" && i + 1 < argc) mapq = atoi(argv[++i]);
    else if (a == "-o" && i + 1 < argc) prefix = argv[++i];
    else pos_args.push_back(a);
  }
  if (pos_args.size() < 2) {
    fprintf(stderr,
            "Usage: juicer pre [-a] [-q MQ] [-o PREFIX] "
            "<aln.bam|pairs[.gz]> <scaffolds.agp> [contigs.fai]\n");
    return 2;
  }
  Agp agp;
  if (!parse_agp(pos_args[1].c_str(), &agp)) {
    fprintf(stderr, "[E::juicer_pre] cannot open %s\n",
            pos_args[1].c_str());
    return 1;
  }
  if (assembly_mode) write_assembly_files(agp, prefix);
  FILE* out = fopen((prefix + ".txt").c_str(), "w");
  if (!out) return 1;
  int64_t n = ends_with(pos_args[0], ".bam")
                  ? pre_from_bam(agp, pos_args[0].c_str(), mapq, out)
                  : pre_from_pairs(agp, pos_args[0].c_str(), out);
  fclose(out);
  if (n < 0) return 1;
  fprintf(stderr, "[I::juicer_pre] PRE_C_SIZE: assembly %lld\n",
          (long long)agp.total);
  fprintf(stderr, "[I::juicer_pre] %lld pairs written to %s.txt\n",
          (long long)n, prefix.c_str());
  return 0;
}

// ---------------------------------------------------------------------------
// post

struct Lift {
  std::string ctg;
  int64_t s, e;
  char ori;
};

std::string revcomp(const std::string& s) {
  std::string out(s.rbegin(), s.rend());
  for (char& c : out) {
    switch (c) {
      case 'A': c = 'T'; break; case 'a': c = 't'; break;
      case 'T': c = 'A'; break; case 't': c = 'a'; break;
      case 'C': c = 'G'; break; case 'c': c = 'g'; break;
      case 'G': c = 'C'; break; case 'g': c = 'c'; break;
    }
  }
  return out;
}

int cmd_post(int argc, char** argv) {
  std::string prefix = "out_JBAT.FINAL";
  const int64_t Ns = 100;
  std::vector<std::string> pos_args;
  for (int i = 0; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "-o" && i + 1 < argc) prefix = argv[++i];
    else pos_args.push_back(a);
  }
  if (pos_args.size() < 2) {
    fprintf(stderr,
            "Usage: juicer post [-o PREFIX] <review.assembly> "
            "<liftover.agp> [contigs.fa]\n");
    return 2;
  }
  // liftover map: fragment name -> raw coords
  std::unordered_map<std::string, Lift> lift;
  {
    FILE* f = fopen(pos_args[1].c_str(), "r");
    if (!f) return 1;
    char buf[1 << 16];
    while (fgets(buf, sizeof buf, f)) {
      auto cols = split_ws(buf);
      if (cols.size() < 9 || cols[4] != "W") continue;
      lift[cols[0]] = {cols[5], atoll(cols[6].c_str()),
                       atoll(cols[7].c_str()), cols[8][0]};
    }
    fclose(f);
  }
  // reviewed assembly: fragments + tours
  std::vector<std::pair<std::string, int64_t>> frags;
  std::vector<std::vector<int64_t>> tours;
  {
    FILE* f = fopen(pos_args[0].c_str(), "r");
    if (!f) return 1;
    char buf[1 << 20];
    while (fgets(buf, sizeof buf, f)) {
      auto cols = split_ws(buf);
      if (cols.empty()) continue;
      if (cols[0][0] == '>') {
        frags.emplace_back(cols[0].substr(1), atoll(cols[2].c_str()));
      } else {
        tours.emplace_back();
        for (auto& c : cols) tours.back().push_back(atoll(c.c_str()));
      }
    }
    fclose(f);
  }
  // resolve JBAT splits (':::fragment_N' consumes sequentially; the
  // base fragment's display orientation decides the raw direction)
  std::vector<Lift> resolved(frags.size());
  std::unordered_map<std::string, int64_t> consumed;
  for (size_t i = 0; i < frags.size(); ++i) {
    const std::string& name = frags[i].first;
    int64_t len = frags[i].second;
    std::string base = name.substr(0, name.find(":::"));
    const Lift& L = lift.at(base);
    if (name == base) {
      resolved[i] = L;
      continue;
    }
    int64_t off = consumed[base];
    consumed[base] = off + len;
    if (L.ori == '+')
      resolved[i] = {L.ctg, L.s + off, L.s + off + len - 1, '+'};
    else
      resolved[i] = {L.ctg, L.e - off - len + 1, L.e - off, '-'};
  }
  // optional contig FASTA
  std::unordered_map<std::string, std::string> seqs;
  bool have_fa = pos_args.size() > 2 && !ends_with(pos_args[2], ".fai");
  if (have_fa) {
    FILE* f = fopen(pos_args[2].c_str(), "r");
    if (!f) return 1;
    char buf[1 << 16];
    std::string cur;
    while (fgets(buf, sizeof buf, f)) {
      if (buf[0] == '>') {
        auto cols = split_ws(buf + 1);
        cur = cols.empty() ? "" : cols[0];
      } else {
        size_t n = strlen(buf);
        while (n && (buf[n - 1] == '\n' || buf[n - 1] == '\r')) --n;
        seqs[cur].append(buf, n);
      }
    }
    fclose(f);
  }
  FILE* agp = fopen((prefix + ".agp").c_str(), "w");
  FILE* fa = have_fa ? fopen((prefix + ".fa").c_str(), "w") : nullptr;
  for (size_t t = 0; t < tours.size(); ++t) {
    char scaf[64];
    snprintf(scaf, sizeof scaf, "scaffold_%zu", t + 1);
    int64_t acc = 0;
    int part = 0;
    std::string seq;
    for (size_t k = 0; k < tours[t].size(); ++k) {
      int64_t signed_id = tours[t][k];
      size_t fid = (size_t)(signed_id < 0 ? -signed_id : signed_id) - 1;
      const Lift& L = resolved[fid];
      char ori = signed_id < 0 ? (L.ori == '+' ? '-' : '+') : L.ori;
      if (k) {
        ++part;
        fprintf(agp,
                "%s\t%lld\t%lld\t%d\tU\t%lld\tscaffold\tyes\t"
                "proximity_ligation\n",
                scaf, (long long)(acc + 1), (long long)(acc + Ns), part,
                (long long)Ns);
        acc += Ns;
        if (fa) seq.append(Ns, 'N');
      }
      ++part;
      int64_t len = L.e - L.s + 1;
      fprintf(agp, "%s\t%lld\t%lld\t%d\tW\t%s\t%lld\t%lld\t%c\n", scaf,
              (long long)(acc + 1), (long long)(acc + len), part,
              L.ctg.c_str(), (long long)L.s, (long long)L.e, ori);
      acc += len;
      if (fa) {
        std::string sub = seqs.at(L.ctg).substr(L.s - 1, len);
        seq += ori == '+' ? sub : revcomp(sub);
      }
    }
    if (fa) {
      fprintf(fa, ">%s\n", scaf);
      for (size_t i = 0; i < seq.size(); i += 60)
        fprintf(fa, "%s\n", seq.substr(i, 60).c_str());
    }
  }
  fclose(agp);
  if (fa) fclose(fa);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "Usage: juicer pre|post ...\n");
    return 2;
  }
  std::string cmd = argv[1];
  if (cmd == "pre") return cmd_pre(argc - 2, argv + 2);
  if (cmd == "post") return cmd_post(argc - 2, argv + 2);
  fprintf(stderr, "unknown command: %s\n", cmd.c_str());
  return 2;
}
