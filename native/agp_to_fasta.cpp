// agp_to_fasta — materialize scaffold FASTA from an AGP + contig FASTA.
//
// Native equivalent of the reference's bundled YaHS utility
// (reference utils/agp_to_fasta, an ELF blob; AGP spec validation per
// https://www.ncbi.nlm.nih.gov/assembly/agp/AGP_Specification/).
//
// Usage: agp_to_fasta <scaffolds.agp> <contigs.fa[.gz]> [-l width] [-o out.fa]
//
// Build: g++ -O3 -o agp_to_fasta agp_to_fasta.cpp -lz

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

char comp(char c) {
  switch (c) {
    case 'A': return 'T'; case 'T': return 'A';
    case 'C': return 'G'; case 'G': return 'C';
    case 'a': return 't'; case 't': return 'a';
    case 'c': return 'g'; case 'g': return 'c';
    default: return c == 'n' ? 'n' : 'N';
  }
}

bool read_fasta(const char* path,
                std::unordered_map<std::string, std::string>* seqs) {
  gzFile f = gzopen(path, "rb");
  if (!f) return false;
  std::string name, seq;
  char buf[1 << 16];
  std::string line;
  auto flush = [&]() {
    if (!name.empty()) (*seqs)[name] = std::move(seq);
    seq.clear();
  };
  while (gzgets(f, buf, sizeof(buf))) {
    line = buf;
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
      line.pop_back();
    if (line.empty()) continue;
    if (line[0] == '>') {
      flush();
      size_t sp = line.find_first_of(" \t");
      name = line.substr(1, sp == std::string::npos ? sp : sp - 1);
    } else {
      seq += line;
    }
  }
  flush();
  gzclose(f);
  return true;
}

struct Writer {
  FILE* f;
  int width;
  int col = 0;

  void header(const std::string& name) {
    if (col) fputc('\n', f);
    col = 0;
    fprintf(f, ">%s\n", name.c_str());
  }

  void emit(const char* s, size_t n) {
    while (n) {
      size_t take = std::min(n, static_cast<size_t>(width - col));
      fwrite(s, 1, take, f);
      s += take;
      n -= take;
      col += static_cast<int>(take);
      if (col == width) {
        fputc('\n', f);
        col = 0;
      }
    }
  }

  void finish() {
    if (col) fputc('\n', f);
    col = 0;
  }
};

}  // namespace

int main(int argc, char** argv) {
  const char* usage =
      "usage: agp_to_fasta <scaffolds.agp> <contigs.fa[.gz]> "
      "[-l width] [-o out.fa]\n";
  if (argc < 3) {
    fputs(usage, stderr);
    return 2;
  }
  const char* agp_path = argv[1];
  const char* fa_path = argv[2];
  int width = 60;
  const char* out_path = nullptr;
  for (int i = 3; i < argc; ++i) {
    if (!strcmp(argv[i], "-l")) width = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-o")) out_path = argv[++i];
    else { fprintf(stderr, "unknown option %s\n%s", argv[i], usage); return 2; }
  }
  if (width <= 0) width = 60;

  std::unordered_map<std::string, std::string> seqs;
  if (!read_fasta(fa_path, &seqs)) {
    fprintf(stderr, "cannot read FASTA %s\n", fa_path);
    return 1;
  }

  FILE* agp = fopen(agp_path, "r");
  if (!agp) { perror(agp_path); return 1; }
  FILE* fout = out_path ? fopen(out_path, "w") : stdout;
  Writer w{fout, width};

  char line[1 << 16];
  std::string cur;
  long expect = 1;
  long lineno = 0;
  std::string rc;
  while (fgets(line, sizeof(line), agp)) {
    ++lineno;
    if (line[0] == '#' || line[0] == '\n') continue;
    char obj[4096], type[16], f6[4096], f7[64], f8[64], f9[64];
    long ostart, oend;
    int part;
    int n = sscanf(line, "%4095s %ld %ld %d %15s %4095s %63s %63s %63s",
                   obj, &ostart, &oend, &part, type, f6, f7, f8, f9);
    if (n < 8) {
      fprintf(stderr, "AGP parse error at line %ld\n", lineno);
      return 1;
    }
    if (cur != obj) {
      cur = obj;
      expect = 1;
      w.header(cur);
    }
    if (ostart != expect) {
      fprintf(stderr,
              "AGP validation error at line %ld: object_beg %ld != "
              "expected %ld\n", lineno, ostart, expect);
      return 1;
    }
    expect = oend + 1;
    if (type[0] == 'W') {
      long cstart = atol(f7), cend = atol(f8);
      auto it = seqs.find(f6);
      if (it == seqs.end()) {
        fprintf(stderr, "contig %s not found in FASTA\n", f6);
        return 1;
      }
      const std::string& s = it->second;
      if (cstart < 1 || cend > static_cast<long>(s.size()) ||
          cend - cstart != oend - ostart) {
        fprintf(stderr,
                "AGP validation error at line %ld: component coords\n",
                lineno);
        return 1;
      }
      if (n >= 9 && f9[0] == '-') {
        rc.assign(s.rbegin() + (s.size() - cend),
                  s.rbegin() + (s.size() - cstart + 1));
        for (auto& c : rc) c = comp(c);
        w.emit(rc.data(), rc.size());
      } else {
        w.emit(s.data() + cstart - 1, cend - cstart + 1);
      }
    } else if (type[0] == 'N' || type[0] == 'U') {
      long gap = atol(f6);
      std::string ns(gap, 'N');
      w.emit(ns.data(), ns.size());
    }  // other component types (A/D/F/G/O/P) are treated as W by spec
  }
  w.finish();
  if (fout != stdout) fclose(fout);
  fclose(agp);
  return 0;
}
