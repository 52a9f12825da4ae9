// Fast ratings-file parser for the data plane (SURVEY.md N12, §7 hard part 6).
//
// The reference's data layer is scipy CSR built from Python parsing; at
// ML-25M/100M scale the text decode dominates ingest, so this framework
// carries a small native parser: mmap-free single-pass scan that extracts the
// first three numeric fields of each line (user, item, rating) regardless of
// delimiter ("\t", ",", "::"). Exposed over a C ABI for ctypes (no pybind11
// in this environment).
//
// Build: see build.sh / the lazy auto-build in native/__init__.py.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

inline bool is_num_start(char c) {
  return (c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.';
}

}  // namespace

extern "C" {

// Parses `path`, writing an interleaved [user, item, rating] * n_rows buffer.
// Returns the number of rows parsed, or -1 on error. Caller must free *out
// with free_buffer(). Lines with fewer than 3 numeric fields are skipped.
long parse_ratings(const char* path, int skip_header, double** out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 0) {
    std::fclose(f);
    return -1;
  }
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
  std::fclose(f);
  buf[got] = '\0';

  std::vector<double> rows;
  rows.reserve(1 << 20);

  const char* p = buf.data();
  const char* end = buf.data() + got;
  if (skip_header) {
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }
  while (p < end) {
    double fields[3];
    int nf = 0;
    // scan one line
    while (p < end && *p != '\n') {
      if (nf < 3 && is_num_start(*p)) {
        char* next = nullptr;
        double v = std::strtod(p, &next);
        if (next != p) {
          fields[nf++] = v;
          p = next;
          continue;
        }
      }
      ++p;
    }
    if (p < end) ++p;  // consume '\n'
    if (nf == 3) {
      rows.push_back(fields[0]);
      rows.push_back(fields[1]);
      rows.push_back(fields[2]);
    }
  }

  long n = static_cast<long>(rows.size() / 3);
  double* result = static_cast<double*>(std::malloc(rows.size() * sizeof(double)));
  if (!result) return -1;
  std::memcpy(result, rows.data(), rows.size() * sizeof(double));
  *out = result;
  return n;
}

void free_buffer(double* p) { std::free(p); }

}  // extern "C"
