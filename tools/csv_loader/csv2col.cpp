// csv2col: native CSV → binary columnar loader.
//
// The TPU engine's analog of the reference's parallel CSV scanner
// (/root/reference/src/execution/operator/csv_scanner/ — state-machine
// tokenizer + multithreaded chunk boundaries): this tool tokenizes with a
// branch-light state machine over large read buffers, splits the file into
// per-thread byte ranges aligned to row boundaries, and emits the same
// binary-columnar directory format dbgen_tbl produces (meta.json +
// <col>.i64/.i32/.f64 + string .len/.bytes), which the Python engine maps
// straight into padded device arrays.
//
// Usage: csv2col <input.csv> <outdir> <colspec> [--delim C] [--header 0|1]
//   colspec: comma-separated name:kind pairs, kind ∈ i64,i32,f64,str,date,
//   dec<scale> (e.g. dec2). date parses YYYY-MM-DD into int32 days since
//   1970-01-01. dec<scale> parses decimal text EXACTLY in integer
//   arithmetic into scaled int64 (no float64 round-trip — the reference
//   parses decimals digit-by-digit too, src/common/operator/
//   cast_operators; float64 loses exactness past 2^53).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct ColSpec {
  std::string name;
  std::string kind;
};

// Exact decimal-text → scaled int64 (integer arithmetic only).
int64_t parse_decimal_scaled(const char *s, int scale) {
  bool neg = false;
  if (*s == '+' || *s == '-') neg = (*s++ == '-');
  int64_t v = 0;
  while (*s >= '0' && *s <= '9') v = v * 10 + (*s++ - '0');
  int frac_seen = 0;
  if (*s == '.') {
    ++s;
    while (*s >= '0' && *s <= '9' && frac_seen < scale) {
      v = v * 10 + (*s++ - '0');
      ++frac_seen;
    }
    // round-half-up on the first excess digit, then skip the rest
    if (*s >= '5' && *s <= '9') ++v;
    while (*s >= '0' && *s <= '9') ++s;
  }
  for (; frac_seen < scale; ++frac_seen) v *= 10;
  return neg ? -v : v;
}

int days_from_civil(int y, int m, int d) {
  y -= m <= 2;
  const int era = (y >= 0 ? y : y - 399) / 400;
  const unsigned yoe = static_cast<unsigned>(y - era * 400);
  const unsigned doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
  const unsigned doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
  return era * 146097 + static_cast<int>(doe) - 719468;
}

struct ShardOut {
  std::vector<std::vector<int64_t>> i64;
  std::vector<std::vector<int32_t>> i32;
  std::vector<std::vector<double>> f64;
  std::vector<std::vector<uint32_t>> slen;
  std::vector<std::string> sbytes;
  std::vector<std::vector<uint8_t>> valid;  // per column validity
  size_t rows = 0;
};

void parse_range(const char *data, size_t begin, size_t end,
                 const std::vector<ColSpec> &cols, char delim, ShardOut *out) {
  const size_t ncol = cols.size();
  out->i64.resize(ncol);
  out->i32.resize(ncol);
  out->f64.resize(ncol);
  out->slen.resize(ncol);
  out->sbytes.resize(ncol);
  out->valid.resize(ncol);
  size_t pos = begin;
  std::string field;
  while (pos < end) {
    for (size_t c = 0; c < ncol; ++c) {
      // tokenize one field (RFC-4180 quoting)
      field.clear();
      bool quoted = false;
      if (pos < end && data[pos] == '"') {
        quoted = true;
        ++pos;
        while (pos < end) {
          char ch = data[pos];
          if (ch == '"') {
            if (pos + 1 < end && data[pos + 1] == '"') {
              field.push_back('"');
              pos += 2;
            } else {
              ++pos;
              break;
            }
          } else {
            field.push_back(ch);
            ++pos;
          }
        }
      }
      size_t start = pos;
      while (pos < end && data[pos] != delim && data[pos] != '\n' &&
             data[pos] != '\r')
        ++pos;
      if (!quoted) field.assign(data + start, pos - start);
      bool is_null = !quoted && field.empty();
      const std::string &k = cols[c].kind;
      out->valid[c].push_back(is_null ? 0 : 1);
      if (k == "i64") {
        out->i64[c].push_back(is_null ? 0 : strtoll(field.c_str(), nullptr, 10));
      } else if (k == "i32") {
        out->i32[c].push_back(is_null ? 0 : (int32_t)strtol(field.c_str(), nullptr, 10));
      } else if (k == "f64") {
        out->f64[c].push_back(is_null ? 0.0 : strtod(field.c_str(), nullptr));
      } else if (k.compare(0, 3, "dec") == 0) {
        int scale = atoi(k.c_str() + 3);
        out->i64[c].push_back(
            is_null ? 0 : parse_decimal_scaled(field.c_str(), scale));
      } else if (k == "date") {
        int32_t v = 0;
        if (!is_null && field.size() >= 10) {
          int y = atoi(field.substr(0, 4).c_str());
          int m = atoi(field.substr(5, 2).c_str());
          int d = atoi(field.substr(8, 2).c_str());
          v = days_from_civil(y, m, d);
        }
        out->i32[c].push_back(v);
      } else {  // str
        out->slen[c].push_back((uint32_t)field.size());
        out->sbytes[c].append(field);
      }
      if (pos < end && data[pos] == delim) ++pos;
    }
    // consume line ending
    while (pos < end && (data[pos] == '\r' || data[pos] == '\n')) {
      if (data[pos] == '\n') {
        ++pos;
        break;
      }
      ++pos;
    }
    ++out->rows;
  }
}

void write_all(FILE *f, const void *p, size_t n) {
  if (fwrite(p, 1, n, f) != n) {
    perror("fwrite");
    exit(1);
  }
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 4) {
    fprintf(stderr,
            "usage: csv2col <input.csv> <outdir> <name:kind,...> "
            "[--delim C] [--header 0|1]\n");
    return 1;
  }
  const char *path = argv[1];
  std::string outdir = argv[2];
  char delim = ',';
  bool header = true;
  std::vector<ColSpec> cols;
  {
    std::string spec = argv[3];
    size_t p = 0;
    while (p < spec.size()) {
      size_t comma = spec.find(',', p);
      if (comma == std::string::npos) comma = spec.size();
      std::string item = spec.substr(p, comma - p);
      size_t colon = item.find(':');
      cols.push_back({item.substr(0, colon), item.substr(colon + 1)});
      p = comma + 1;
    }
  }
  for (int i = 4; i < argc; ++i) {
    if (!strcmp(argv[i], "--delim") && i + 1 < argc) delim = argv[++i][0];
    if (!strcmp(argv[i], "--header") && i + 1 < argc) header = atoi(argv[++i]);
  }

  int fd = open(path, O_RDONLY);
  if (fd < 0) {
    perror("open");
    return 1;
  }
  struct stat st;
  fstat(fd, &st);
  size_t size = (size_t)st.st_size;
  std::vector<char> buf(size);
  size_t off = 0;
  while (off < size) {
    ssize_t r = read(fd, buf.data() + off, size - off);
    if (r <= 0) break;
    off += (size_t)r;
  }
  close(fd);
  const char *data = buf.data();

  size_t begin = 0;
  if (header) {
    while (begin < size && data[begin] != '\n') ++begin;
    if (begin < size) ++begin;
  }

  // split into N ranges aligned to newline boundaries (the reference's
  // parallel boundary-splitting scanner idea, csv_scanner/)
  unsigned nthreads = std::thread::hardware_concurrency();
  if (nthreads == 0 || size - begin < (1u << 20)) nthreads = 1;
  std::vector<size_t> bounds{begin};
  for (unsigned t = 1; t < nthreads; ++t) {
    size_t target = begin + (size - begin) * t / nthreads;
    while (target < size && data[target] != '\n') ++target;
    if (target < size) ++target;
    bounds.push_back(target);
  }
  bounds.push_back(size);

  std::vector<ShardOut> shards(nthreads);
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < nthreads; ++t)
    threads.emplace_back(parse_range, data, bounds[t], bounds[t + 1],
                         std::cref(cols), delim, &shards[t]);
  for (auto &th : threads) th.join();

  mkdir(outdir.c_str(), 0755);
  size_t total_rows = 0;
  for (auto &s : shards) total_rows += s.rows;

  std::string meta = "{\"rows\": " + std::to_string(total_rows) +
                     ", \"columns\": [";
  for (size_t c = 0; c < cols.size(); ++c) {
    if (c) meta += ", ";
    meta += "{\"name\": \"" + cols[c].name + "\", \"kind\": \"" +
            cols[c].kind + "\"}";
  }
  meta += "]}";
  FILE *mf = fopen((outdir + "/meta.json").c_str(), "w");
  write_all(mf, meta.data(), meta.size());
  fclose(mf);

  for (size_t c = 0; c < cols.size(); ++c) {
    const std::string &k = cols[c].kind;
    std::string base = outdir + "/" + cols[c].name;
    bool any_null = false;
    for (auto &s : shards)
      for (uint8_t v : s.valid[c])
        if (!v) any_null = true;
    if (k == "str") {
      FILE *lf = fopen((base + ".len").c_str(), "w");
      FILE *bf = fopen((base + ".bytes").c_str(), "w");
      for (auto &s : shards) {
        write_all(lf, s.slen[c].data(), s.slen[c].size() * 4);
        write_all(bf, s.sbytes[c].data(), s.sbytes[c].size());
      }
      fclose(lf);
      fclose(bf);
    } else if (k == "i64" || k.compare(0, 3, "dec") == 0) {
      FILE *f = fopen((base + ".i64").c_str(), "w");
      for (auto &s : shards) write_all(f, s.i64[c].data(), s.i64[c].size() * 8);
      fclose(f);
    } else if (k == "f64") {
      FILE *f = fopen((base + ".f64").c_str(), "w");
      for (auto &s : shards) write_all(f, s.f64[c].data(), s.f64[c].size() * 8);
      fclose(f);
    } else {  // i32 / date
      FILE *f = fopen((base + ".i32").c_str(), "w");
      for (auto &s : shards) write_all(f, s.i32[c].data(), s.i32[c].size() * 4);
      fclose(f);
    }
    if (any_null) {
      FILE *f = fopen((base + ".valid").c_str(), "w");
      for (auto &s : shards)
        write_all(f, s.valid[c].data(), s.valid[c].size());
      fclose(f);
    }
  }
  fprintf(stderr, "csv2col: %zu rows, %zu cols, %u threads\n", total_rows,
          cols.size(), nthreads);
  return 0;
}
