// Fast ratings-file parser for the data plane (SURVEY.md N12, §7 hard part 6).
//
// The reference's data layer is scipy CSR built from Python parsing; at
// ML-25M/100M scale the text decode dominates ingest, so this framework
// carries a small native parser: a streaming chunked scan that extracts the
// first three numeric fields of each line (user, item, rating) regardless of
// delimiter ("\t", ",", "::"). Exposed over a C ABI for ctypes (no pybind11
// in this environment).
//
// Memory: the round-1 parser buffered the WHOLE file plus a growing vector
// plus a copy (~3x file size peak). This version reads fixed 4 MB chunks
// (carrying partial lines across chunk boundaries) and appends straight into
// one geometrically realloc-grown output buffer, so peak memory is the
// output itself (24 B/row) + one chunk, independent of file size.
//
// Build: lazy auto-build in native/__init__.py (g++ -O3 -shared).

#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

inline bool is_num_start(char c) {
  return (c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.';
}

constexpr size_t kChunk = 4u << 20;  // 4 MB read blocks

struct Out {
  double* data = nullptr;
  size_t len = 0;  // doubles used
  size_t cap = 0;  // doubles allocated

  bool reserve3() {
    if (len + 3 <= cap) return true;
    size_t ncap = cap ? cap + cap / 2 : (1u << 18);
    if (ncap < len + 3) ncap = len + 3;
    double* nd = static_cast<double*>(
        std::realloc(data, ncap * sizeof(double)));
    if (!nd) return false;
    data = nd;
    cap = ncap;
    return true;
  }
};

// Parse complete lines in [p, end); `end` points just past the final
// newline (or at a '\0'-terminated final partial line at EOF).
bool parse_window(const char* p, const char* end, Out& out) {
  while (p < end) {
    double fields[3];
    int nf = 0;
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
      if (!out.reserve3()) return false;
      out.data[out.len++] = fields[0];
      out.data[out.len++] = fields[1];
      out.data[out.len++] = fields[2];
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Parses `path`, writing an interleaved [user, item, rating] * n_rows buffer.
// Returns the number of rows parsed, or -1 on error. Caller must free *out
// with free_buffer(). Lines with fewer than 3 numeric fields are skipped.
long parse_ratings(const char* path, int skip_header, double** out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  size_t buf_cap = kChunk + 1;
  char* buf = static_cast<char*>(std::malloc(buf_cap));
  if (!buf) {
    std::fclose(f);
    return -1;
  }

  Out rows;
  size_t have = 0;  // carried partial-line bytes at the buffer head
  bool skipped = !skip_header;
  bool ok = true;

  for (;;) {
    size_t want = buf_cap - 1 - have;
    if (want == 0) {
      // one line longer than the buffer: grow it (pathological input)
      buf_cap *= 2;
      char* nb = static_cast<char*>(std::realloc(buf, buf_cap));
      if (!nb) {
        ok = false;
        break;
      }
      buf = nb;
      want = buf_cap - 1 - have;
    }
    size_t got = std::fread(buf + have, 1, want, f);
    size_t len = have + got;
    bool eof = got < want;
    buf[len] = '\0';

    if (!skipped) {
      // discard bytes up to and including the header's newline; a header
      // spanning chunks is discarded piecewise (no carry needed)
      char* nl = static_cast<char*>(std::memchr(buf, '\n', len));
      if (nl == nullptr) {
        have = 0;
        if (eof) break;
        continue;
      }
      size_t off = static_cast<size_t>(nl - buf) + 1;
      std::memmove(buf, buf + off, len - off);
      len -= off;
      buf[len] = '\0';
      skipped = true;
    }

    size_t proc = len;
    if (!eof) {
      // only complete lines; carry the trailing fragment to the next chunk
      while (proc > 0 && buf[proc - 1] != '\n') --proc;
      if (proc == 0) {  // no newline in the whole buffer: need a bigger one
        have = len;
        continue;
      }
    }
    // Complete lines end in '\n', so strtod never scans past the window;
    // the final partial line at EOF is handled below behind its own '\0'.
    if (!parse_window(buf, buf + proc, rows)) {
      ok = false;
      break;
    }
    have = len - proc;
    if (have) std::memmove(buf, buf + proc, have);
    if (eof) {
      if (have) {
        buf[have] = '\0';
        ok = parse_window(buf, buf + have, rows) && ok;
      }
      break;
    }
  }

  std::free(buf);
  std::fclose(f);
  if (!ok) {
    std::free(rows.data);
    return -1;
  }
  if (rows.data == nullptr) rows.data = static_cast<double*>(std::malloc(8));
  *out = rows.data;
  return static_cast<long>(rows.len / 3);
}

void free_buffer(double* p) { std::free(p); }

}  // extern "C"
