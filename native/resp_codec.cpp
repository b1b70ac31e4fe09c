// Native RESP wire-protocol codec: streaming command parser + reply
// framing helpers.
//
// TPU-native equivalent of the reference's C protocol layer (the module
// command argv machinery in src/module.c and the RESP2/RESP3 reply
// builder in src/reply.c).  The asyncio server feeds raw socket bytes in
// and gets complete commands out as (offset, length) argv slices into a
// stable internal buffer — no Python-side byte scanning on the hot path.
//
// Protocol grammar handled (client -> server commands):
//   *<argc>\r\n  then argc x ( $<len>\r\n <bytes> \r\n )
//   inline commands (plain text line, space-separated)
//
// Build: g++ -O3 -shared -fPIC -o libresp_codec.so resp_codec.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Parser {
  std::string buf;      // pending unparsed bytes
  size_t pos = 0;       // parse cursor into buf
  // last parsed command: offsets/lengths into `stable`
  std::string stable;   // argv bytes of the last complete command
  std::vector<int64_t> offs;
  std::vector<int64_t> lens;
  bool error = false;

  void compact() {
    if (pos > 0 && pos == buf.size()) {
      buf.clear();
      pos = 0;
    } else if (pos > 1 << 20) {   // avoid unbounded front garbage
      buf.erase(0, pos);
      pos = 0;
    }
  }
};

// find CRLF starting at `from`; returns index of '\r' or npos
size_t find_crlf(const std::string& b, size_t from) {
  size_t i = b.find('\r', from);
  while (i != std::string::npos) {
    if (i + 1 < b.size()) {
      if (b[i + 1] == '\n') return i;
      i = b.find('\r', i + 1);
    } else {
      return std::string::npos;  // need more bytes
    }
  }
  return std::string::npos;
}

}  // namespace

extern "C" {

void* resp_parser_new() { return new Parser(); }
void resp_parser_free(void* p) { delete static_cast<Parser*>(p); }

void resp_parser_feed(void* vp, const char* data, int64_t len) {
  auto* p = static_cast<Parser*>(vp);
  p->buf.append(data, static_cast<size_t>(len));
}

// Try to parse one complete command.
// Returns: 1 = command ready (use resp_parser_argc/argv), 0 = need more
// bytes, -1 = protocol error (connection should close).
int resp_parser_next(void* vp) {
  auto* p = static_cast<Parser*>(vp);
  if (p->error) return -1;
  const std::string& b = p->buf;
  size_t i = p->pos;
  if (i >= b.size()) return 0;

  p->offs.clear();
  p->lens.clear();

  if (b[i] != '*') {
    // inline command: a plain text line
    size_t eol = find_crlf(b, i);
    size_t end;
    if (eol == std::string::npos) {
      size_t nl = b.find('\n', i);
      if (nl == std::string::npos) return 0;
      eol = nl;
      end = nl + 1;
    } else {
      end = eol + 2;
    }
    p->stable.assign(b, i, eol - i);
    // split on spaces
    size_t s = 0;
    const std::string& st = p->stable;
    while (s < st.size()) {
      while (s < st.size() && st[s] == ' ') s++;
      if (s >= st.size()) break;
      size_t e = s;
      while (e < st.size() && st[e] != ' ') e++;
      p->offs.push_back(static_cast<int64_t>(s));
      p->lens.push_back(static_cast<int64_t>(e - s));
      s = e;
    }
    p->pos = end;
    p->compact();
    return p->offs.empty() ? 0 : 1;
  }

  // array of bulk strings
  size_t eol = find_crlf(b, i);
  if (eol == std::string::npos) return 0;
  long argc = 0;
  for (size_t j = i + 1; j < eol; j++) {
    char c = b[j];
    if (c < '0' || c > '9') { p->error = true; return -1; }
    argc = argc * 10 + (c - '0');
    if (argc > 1 << 20) { p->error = true; return -1; }
  }
  size_t cur = eol + 2;
  std::vector<std::pair<size_t, size_t>> parts;
  parts.reserve(static_cast<size_t>(argc));
  for (long a = 0; a < argc; a++) {
    if (cur >= b.size()) return 0;
    if (b[cur] != '$') { p->error = true; return -1; }
    size_t el = find_crlf(b, cur);
    if (el == std::string::npos) return 0;
    long blen = 0;
    for (size_t j = cur + 1; j < el; j++) {
      char c = b[j];
      if (c < '0' || c > '9') { p->error = true; return -1; }
      blen = blen * 10 + (c - '0');
      if (blen > (1l << 31)) { p->error = true; return -1; }
    }
    size_t dstart = el + 2;
    if (dstart + static_cast<size_t>(blen) + 2 > b.size()) return 0;
    parts.emplace_back(dstart, static_cast<size_t>(blen));
    cur = dstart + static_cast<size_t>(blen) + 2;
  }
  // complete: copy argv bytes into the stable buffer
  size_t total = 0;
  for (auto& pr : parts) total += pr.second;
  p->stable.clear();
  p->stable.reserve(total);
  for (auto& pr : parts) {
    p->offs.push_back(static_cast<int64_t>(p->stable.size()));
    p->lens.push_back(static_cast<int64_t>(pr.second));
    p->stable.append(b, pr.first, pr.second);
  }
  p->pos = cur;
  p->compact();
  return 1;
}

int64_t resp_parser_argc(void* vp) {
  return static_cast<int64_t>(static_cast<Parser*>(vp)->offs.size());
}

const char* resp_parser_data(void* vp) {
  return static_cast<Parser*>(vp)->stable.data();
}

const int64_t* resp_parser_offs(void* vp) {
  return static_cast<Parser*>(vp)->offs.data();
}

const int64_t* resp_parser_lens(void* vp) {
  return static_cast<Parser*>(vp)->lens.data();
}

// ---------------------------------------------------------------------
// Reply framing: build a flat RESP2 array-of-bulk-strings reply from a
// packed (data, offsets, lens) triple — the hot FT.SEARCH reply shape
// [total, key, [f, v, ...], ...] is assembled by the Python layer as a
// token stream; this frames it in one pass.
//   kinds[i]: 0 = bulk string, 1 = integer (data holds ascii digits),
//             2 = array header (lens[i] = element count),
//             3 = simple status, 4 = double-as-bulk
// Returns the number of bytes written (or required size if out == null).
int64_t resp_encode_stream(const char* data, const int64_t* offs,
                           const int64_t* lens, const int8_t* kinds,
                           int64_t n, char* out, int64_t cap) {
  std::string tmp;
  tmp.reserve(static_cast<size_t>(cap > 0 ? cap : 4096));
  char hdr[32];
  for (int64_t i = 0; i < n; i++) {
    const char* d = data + offs[i];
    int64_t l = lens[i];
    switch (kinds[i]) {
      case 1:
        tmp += ':';
        tmp.append(d, static_cast<size_t>(l));
        tmp += "\r\n";
        break;
      case 2: {
        int m = snprintf(hdr, sizeof hdr, "*%lld\r\n",
                         static_cast<long long>(l));
        tmp.append(hdr, static_cast<size_t>(m));
        break;
      }
      case 3:
        tmp += '+';
        tmp.append(d, static_cast<size_t>(l));
        tmp += "\r\n";
        break;
      default: {
        int m = snprintf(hdr, sizeof hdr, "$%lld\r\n",
                         static_cast<long long>(l));
        tmp.append(hdr, static_cast<size_t>(m));
        tmp.append(d, static_cast<size_t>(l));
        tmp += "\r\n";
        break;
      }
    }
  }
  if (out == nullptr || static_cast<int64_t>(tmp.size()) > cap) {
    return static_cast<int64_t>(tmp.size());
  }
  std::memcpy(out, tmp.data(), tmp.size());
  return static_cast<int64_t>(tmp.size());
}

}  // extern "C"
