// Native batch-response JSON renderer.
//
// The serving decomposition at 1M docs (STATUS r4) put ~28 ms of every
// 512-query batch into the Python render loop + json.dumps — the single
// biggest host cost after the reference-parity work was vectorized. This
// renderer emits the per-query response objects (the same shape as
// src/api_server.cpp:137-177's JSON, key order matching engine.py's render)
// straight into one byte buffer:
//
//   {"query":q,"k":K,"segments":S,"results":[{"score":f,"segment":s,
//    "docId":i,"cord_uid":s,"title"?:s,"url"?:s,"publish_time"?:s,
//    "author"?:s},...],"found":F}
//
// Doc info (segment name, cord_uid) is registered once per reload from the
// engine's arrays; metadata rows are fetched from metadata.csv by byte
// offset (reference: src/api_metadata.cpp:188-249) and the rendered,
// escaped field suffix is cached per doc — a Zipf result stream re-renders
// head docs constantly. Escaping matches json.dumps(ensure_ascii=True).
//
// C ABI consumed via ctypes (native/__init__.py NativeRenderer); field
// parity with the Python renderer is enforced by tests/test_native.py.

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>
#include <string_view>
#include <vector>

namespace {

// utils/csvutil.csv_row: quote-toggling splitter (quotes consumed, commas
// inside quotes literal) — reference src/api_metadata.cpp:13-42.
std::vector<std::string> csv_row_cpp(std::string_view line) {
  std::vector<std::string> out;
  std::string cur;
  bool inq = false;
  for (char c : line) {
    if (c == '"') {
      inq = !inq;
      continue;
    }
    if (!inq && c == ',') {
      out.push_back(cur);
      cur.clear();
      continue;
    }
    cur.push_back(c);
  }
  out.push_back(cur);
  return out;
}

inline bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\v' ||
         c == '\f';
}

std::string_view strip(std::string_view s) {
  size_t a = 0, b = s.size();
  while (a < b && is_space(static_cast<unsigned char>(s[a]))) a++;
  while (b > a && is_space(static_cast<unsigned char>(s[b - 1]))) b--;
  return s.substr(a, b - a);
}

// utils/csvutil.first_author_et_al — reference src/api_metadata.cpp:60-106.
std::string first_author_et_al(std::string_view authors_raw) {
  std::string_view s = strip(authors_raw);
  if (s.empty()) return "";
  size_t semi = s.find(';');
  std::string_view first = (semi == std::string_view::npos) ? s : s.substr(0, semi);
  first = strip(first);
  while (!first.empty() &&
         (first.back() == ',' ||
          is_space(static_cast<unsigned char>(first.back()))))
    first.remove_suffix(1);
  first = strip(first);
  if (first.empty()) return "";
  if (first.front() == '(') {
    size_t close = first.find(')');
    if (close != std::string_view::npos && close > 1) {
      std::string_view inside = strip(first.substr(1, close - 1));
      if (!inside.empty()) first = inside;
    }
  }
  size_t comma = first.find(',');
  std::string_view surname;
  if (comma != std::string_view::npos) {
    surname = strip(first.substr(0, comma));
  } else {
    std::string_view tmp = strip(first);
    size_t sp = tmp.find_last_of(" \t");
    surname = (sp == std::string_view::npos) ? tmp : strip(tmp.substr(sp + 1));
  }
  surname = strip(surname);
  if (surname.empty()) return "";
  return std::string(surname) + " et al.";
}

void append_u16_escape(std::string& out, unsigned cp) {
  char buf[8];
  std::snprintf(buf, sizeof(buf), "\\u%04x", cp);
  out += buf;
}

// json.dumps(ensure_ascii=True) escaping: short escapes for \" \\ \n \r \t
// \b \f, \u00xx for other chars outside 0x20..0x7e, non-ASCII decoded from
// UTF-8 to \uXXXX (surrogate pairs above the BMP; invalid bytes -> U+FFFD
// like Python's errors="replace" decode of the CSV).
void json_escape_append(std::string& out, std::string_view s) {
  size_t i = 0, n = s.size();
  while (i < n) {
    unsigned char c = static_cast<unsigned char>(s[i]);
    if (c == '"') {
      out += "\\\"";
      i++;
    } else if (c == '\\') {
      out += "\\\\";
      i++;
    } else if (c == '\n') {
      out += "\\n";
      i++;
    } else if (c == '\r') {
      out += "\\r";
      i++;
    } else if (c == '\t') {
      out += "\\t";
      i++;
    } else if (c == '\b') {
      out += "\\b";
      i++;
    } else if (c == '\f') {
      out += "\\f";
      i++;
    } else if (c < 0x20 || c == 0x7f) {
      append_u16_escape(out, c);
      i++;
    } else if (c < 0x80) {
      out.push_back(static_cast<char>(c));
      i++;
    } else {
      // UTF-8 decode (2-4 bytes); invalid -> U+FFFD, advance 1
      unsigned cp = 0xFFFD;
      size_t len = 1;
      if ((c & 0xE0) == 0xC0 && i + 1 < n &&
          (s[i + 1] & 0xC0) == 0x80) {
        cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
        len = 2;
        if (cp < 0x80) cp = 0xFFFD;
      } else if ((c & 0xF0) == 0xE0 && i + 2 < n &&
                 (s[i + 1] & 0xC0) == 0x80 && (s[i + 2] & 0xC0) == 0x80) {
        cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) |
             (s[i + 2] & 0x3F);
        len = 3;
        if (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)) cp = 0xFFFD, len = 1;
        if (cp == 0xFFFD && len == 1) len = 1;
      } else if ((c & 0xF8) == 0xF0 && i + 3 < n &&
                 (s[i + 1] & 0xC0) == 0x80 && (s[i + 2] & 0xC0) == 0x80 &&
                 (s[i + 3] & 0xC0) == 0x80) {
        cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
             ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
        len = 4;
        if (cp < 0x10000 || cp > 0x10FFFF) cp = 0xFFFD, len = 1;
      }
      if (cp >= 0x10000) {
        cp -= 0x10000;
        append_u16_escape(out, 0xD800 + (cp >> 10));
        append_u16_escape(out, 0xDC00 + (cp & 0x3FF));
      } else {
        append_u16_escape(out, cp);
      }
      i += len;
    }
  }
}

// Shortest round-trip double like Python repr (both shortest; exponent
// style may differ — value-identical, always valid JSON).
void append_double(std::string& out, double v) {
  char buf[32];
  auto res = std::to_chars(buf, buf + sizeof(buf), v);
  out.append(buf, res.ptr);
}

struct SegInfo {
  std::string name_escaped;  // pre-escaped JSON content of the name
  int64_t base = 0;
  int64_t n_docs = 0;
  std::vector<int64_t> uid_offs;  // n_docs + 1
  std::string uid_blob;
  std::vector<int64_t> meta_off;  // per doc; -1 = no metadata row
  std::vector<int32_t> meta_len;
  // rendered meta field suffix per doc, cached after first fetch
  std::vector<std::unique_ptr<std::string>> meta_cache;

  std::string_view uid(int64_t d) const {
    return std::string_view(uid_blob)
        .substr(uid_offs[d], uid_offs[d + 1] - uid_offs[d]);
  }
};

struct Renderer {
  std::string csv_path;
  int url_i = -1, time_i = -1, auth_i = -1, title_i = -1;
  bool header_parsed = false;
  std::vector<SegInfo> segs;
  std::string out;
  std::string rowbuf;

  void parse_header() {
    header_parsed = true;
    FILE* f = std::fopen(csv_path.c_str(), "rb");
    if (!f) return;
    std::string line;
    int ch;
    while ((ch = std::fgetc(f)) != EOF && ch != '\n') line.push_back((char)ch);
    std::fclose(f);
    auto cols = csv_row_cpp(line);
    for (size_t i = 0; i < cols.size(); ++i) {
      if (cols[i] == "url") url_i = (int)i;
      else if (cols[i] == "publish_time") time_i = (int)i;
      else if (cols[i] == "authors") auth_i = (int)i;
      else if (cols[i] == "title") title_i = (int)i;
    }
  }

  // Fetch + render the optional metadata fields for (seg, doc) into the
  // cached suffix string (engine.py render: title, url-cut-at-';',
  // publish_time, author — keys omitted when empty).
  const std::string& meta_suffix(SegInfo& sg, int64_t d) {
    auto& slot = sg.meta_cache[d];
    if (slot) return *slot;
    slot = std::make_unique<std::string>();
    if (sg.meta_off[d] < 0) return *slot;
    if (!header_parsed) parse_header();
    FILE* f = std::fopen(csv_path.c_str(), "rb");
    if (!f) return *slot;
    rowbuf.resize(static_cast<size_t>(sg.meta_len[d]));
    size_t got = 0;
    if (std::fseek(f, static_cast<long>(sg.meta_off[d]), SEEK_SET) == 0)
      got = std::fread(rowbuf.data(), 1, rowbuf.size(), f);
    std::fclose(f);
    std::string_view line(rowbuf.data(), got);
    size_t nl = line.find('\n');
    if (nl != std::string_view::npos) line = line.substr(0, nl);
    auto r = csv_row_cpp(line);
    auto get = [&](int i) -> std::string_view {
      return (i >= 0 && (size_t)i < r.size()) ? std::string_view(r[i])
                                              : std::string_view();
    };
    std::string& s = *slot;
    std::string_view title = get(title_i);
    if (!title.empty()) {
      s += ",\"title\":\"";
      json_escape_append(s, title);
      s += '"';
    }
    std::string_view url = get(url_i);
    size_t semi = url.find(';');
    if (semi != std::string_view::npos) url = url.substr(0, semi);
    if (!url.empty()) {
      s += ",\"url\":\"";
      json_escape_append(s, url);
      s += '"';
    }
    std::string_view pt = get(time_i);
    if (!pt.empty()) {
      s += ",\"publish_time\":\"";
      json_escape_append(s, pt);
      s += '"';
    }
    std::string author = first_author_et_al(get(auth_i));
    if (!author.empty()) {
      s += ",\"author\":\"";
      json_escape_append(s, author);
      s += '"';
    }
    return *slot;
  }

  SegInfo* locate(int64_t slot, int64_t* doc_out) {
    // segments are registered in base order; linear scan is fine (few segs)
    for (size_t i = segs.size(); i-- > 0;) {
      if (slot >= segs[i].base) {
        *doc_out = slot - segs[i].base;
        return &segs[i];
      }
    }
    return nullptr;
  }
};

}  // namespace

extern "C" {

void* nsr_new(const char* csv_path, uint64_t csv_path_len) {
  auto* r = new Renderer();
  r->csv_path.assign(csv_path, csv_path_len);
  return r;
}

void nsr_free(void* h) { delete static_cast<Renderer*>(h); }

void nsr_add_segment(void* h, const char* name, uint64_t name_len,
                     int64_t base, int64_t n_docs, const char* uid_blob,
                     uint64_t uid_blob_len, const int64_t* uid_offs,
                     const int64_t* meta_off, const int32_t* meta_len) {
  auto* r = static_cast<Renderer*>(h);
  SegInfo sg;
  json_escape_append(sg.name_escaped, std::string_view(name, name_len));
  sg.base = base;
  sg.n_docs = n_docs;
  sg.uid_blob.assign(uid_blob, uid_blob_len);
  sg.uid_offs.assign(uid_offs, uid_offs + n_docs + 1);
  sg.meta_off.assign(meta_off, meta_off + n_docs);
  sg.meta_len.assign(meta_len, meta_len + n_docs);
  sg.meta_cache.resize(n_docs);
  r->segs.push_back(std::move(sg));
}

// Render nq per-query response objects into the internal buffer; returns
// total byte length. scores/slots are flat [sum(counts)] arrays.
int64_t nsr_render(void* h, int32_t nq, int32_t seg_count,
                   const char* q_blob, const int64_t* q_offs,
                   const int32_t* ks, const int32_t* founds,
                   const int32_t* counts, const float* scores,
                   const int32_t* slots, int64_t* frag_offs) {
  auto* r = static_cast<Renderer*>(h);
  std::string& out = r->out;
  out.clear();
  int64_t pos = 0;
  for (int32_t qi = 0; qi < nq; ++qi) {
    frag_offs[qi] = (int64_t)out.size();
    out += "{\"query\":\"";
    json_escape_append(
        out, std::string_view(q_blob + q_offs[qi],
                              (size_t)(q_offs[qi + 1] - q_offs[qi])));
    out += "\",\"k\":";
    {
      char buf[16];
      auto res = std::to_chars(buf, buf + sizeof(buf), ks[qi]);
      out.append(buf, res.ptr);
    }
    out += ",\"segments\":";
    {
      char buf[16];
      auto res = std::to_chars(buf, buf + sizeof(buf), seg_count);
      out.append(buf, res.ptr);
    }
    out += ",\"results\":[";
    for (int32_t j = 0; j < counts[qi]; ++j) {
      if (j) out.push_back(',');
      double score = (double)scores[pos + j];
      int64_t slot = (int64_t)slots[pos + j];
      int64_t d = 0;
      SegInfo* sg = r->locate(slot, &d);
      out += "{\"score\":";
      append_double(out, score);
      if (sg && d >= 0 && d < sg->n_docs) {
        out += ",\"segment\":\"";
        out += sg->name_escaped;
        out += "\",\"docId\":";
        char buf[24];
        auto res = std::to_chars(buf, buf + sizeof(buf), d);
        out.append(buf, res.ptr);
        out += ",\"cord_uid\":\"";
        json_escape_append(out, sg->uid(d));
        out += '"';
        out += r->meta_suffix(*sg, d);
      }
      out.push_back('}');
    }
    pos += counts[qi];
    out += "],\"found\":";
    {
      char buf[16];
      auto res = std::to_chars(buf, buf + sizeof(buf), founds[qi]);
      out.append(buf, res.ptr);
    }
    out.push_back('}');
  }
  frag_offs[nq] = (int64_t)out.size();
  return (int64_t)out.size();
}

const char* nsr_buf(void* h) { return static_cast<Renderer*>(h)->out.data(); }

}  // extern "C"
