// Native LongGenBench answer extraction (evaluator hot path).
//
// Reproduces the exact semantics of the reference's extraction regexes
// (eval_longgenbench.py:16-62) over multi-thousand-token generations:
//   gsm8k : r"Answer_\d+:\s*.*?answer is (\d+)"            (DOTALL)
//   mmlu  : r"Answer_\d+:\s*.*?answer is \((.*?)\)"        (no DOTALL)
//   csqa  : r"Answer_\d+:\s*.*?\s*The answer is\s*\(([A-Z])\)"
// implemented as hand-rolled scans (std::regex is both slow and not
// semantics-identical to Python re).  Python-side equivalence is
// fuzz-tested in tests/test_native_scorer.py.
//
// C ABI: extracted matches are written NUL-separated into the caller's
// buffer; the return value is the number of matches (or -1 on overflow).

#include <cctype>
#include <cstring>
#include <string_view>

namespace {

using sv = std::string_view;

inline bool is_ws(char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v';
}

// Position just past "Answer_<digits>:" starting at or after `from`;
// npos if none.  Sets match_start to the position of 'A'.
size_t find_answer_tag(sv s, size_t from, size_t* match_start) {
  static constexpr sv tag = "Answer_";
  while (true) {
    size_t p = s.find(tag, from);
    if (p == sv::npos) return sv::npos;
    size_t q = p + tag.size();
    size_t d = q;
    while (d < s.size() && std::isdigit(static_cast<unsigned char>(s[d])))
      ++d;
    if (d > q && d < s.size() && s[d] == ':') {
      *match_start = p;
      return d + 1;
    }
    from = p + 1;
  }
}

struct Out {
  char* buf;
  int cap;
  int used = 0;
  int count = 0;
  bool overflow = false;

  void emit(sv m) {
    if (used + static_cast<int>(m.size()) + 1 > cap) {
      overflow = true;
      return;
    }
    std::memcpy(buf + used, m.data(), m.size());
    used += static_cast<int>(m.size());
    buf[used++] = '\0';
    ++count;
  }
};

}  // namespace

extern "C" {

// gsm8k: after each Answer_N:, lazily find the first "answer is " that is
// immediately followed by digits (DOTALL: may cross lines); capture the
// maximal digit run; resume scanning after it.
int scope_extract_gsm8k(const char* pred_c, char* out_buf, int out_cap) {
  sv s(pred_c);
  Out out{out_buf, out_cap};
  static constexpr sv marker = "answer is ";
  size_t pos = 0;
  while (true) {
    size_t tag_start;
    size_t p = find_answer_tag(s, pos, &tag_start);
    if (p == sv::npos) break;
    // Lazy scan: earliest "answer is <digit>" at or after p.
    size_t m = p;
    size_t hit = sv::npos;
    while (true) {
      m = s.find(marker, m);
      if (m == sv::npos) break;
      size_t d = m + marker.size();
      if (d < s.size() && std::isdigit(static_cast<unsigned char>(s[d]))) {
        hit = d;
        break;
      }
      ++m;
    }
    if (hit == sv::npos) break;  // nothing later can match either
    size_t e = hit;
    while (e < s.size() && std::isdigit(static_cast<unsigned char>(s[e])))
      ++e;
    out.emit(s.substr(hit, e - hit));
    if (out.overflow) return -1;
    pos = e;  // findall resumes after the full match
  }
  return out.count;
}

// mmlu: no DOTALL — after Answer_N: skip whitespace; "answer is (" must
// lie on the line where the whitespace run ends; capture lazily to the
// first ')' on that line.
int scope_extract_mmlu(const char* pred_c, char* out_buf, int out_cap) {
  sv s(pred_c);
  Out out{out_buf, out_cap};
  static constexpr sv marker = "answer is (";
  size_t pos = 0;
  while (true) {
    size_t tag_start;
    size_t p = find_answer_tag(s, pos, &tag_start);
    if (p == sv::npos) break;
    size_t q = p;
    while (q < s.size() && is_ws(s[q])) ++q;
    size_t eol = s.find('\n', q);
    if (eol == sv::npos) eol = s.size();
    size_t m = s.substr(0, eol).find(marker, q);
    if (m == sv::npos) {
      pos = p;  // try the next Answer_ tag
      continue;
    }
    size_t cap_start = m + marker.size();
    size_t close = s.substr(0, eol).find(')', cap_start);
    if (close == sv::npos) {
      pos = p;
      continue;
    }
    out.emit(s.substr(cap_start, close - cap_start));
    if (out.overflow) return -1;
    pos = close + 1;
  }
  return out.count;
}

// csqa: Answer_N:\s*  .*? (one non-newline chunk)  \s*  "The answer is"
// \s* "(" [A-Z] ")".  The second \s* lets "The answer is" sit on a later
// line as long as only whitespace intervenes after the chunk's line.
int scope_extract_csqa(const char* pred_c, char* out_buf, int out_cap) {
  sv s(pred_c);
  Out out{out_buf, out_cap};
  static constexpr sv marker = "The answer is";
  size_t pos = 0;
  while (true) {
    size_t tag_start;
    size_t p = find_answer_tag(s, pos, &tag_start);
    if (p == sv::npos) break;
    size_t q = p;
    while (q < s.size() && is_ws(s[q])) ++q;
    size_t matched_end = sv::npos;
    char letter = 0;
    // Try occurrences of "The answer is" in order (regex backtracking).
    for (size_t m = s.find(marker, q); m != sv::npos;
         m = s.find(marker, m + 1)) {
      // Backtrack whitespace before the marker.
      size_t b = m;
      while (b > q && is_ws(s[b - 1])) --b;
      // [q, b) must be newline-free (it's the lazy .*? chunk).
      if (s.substr(q, b - q).find('\n') != sv::npos) break;
      // After the marker: \s* then "(" [A-Z] ")".
      size_t a = m + marker.size();
      while (a < s.size() && is_ws(s[a])) ++a;
      if (a + 2 < s.size() && s[a] == '(' && s[a + 1] >= 'A' &&
          s[a + 1] <= 'Z' && s[a + 2] == ')') {
        letter = s[a + 1];
        matched_end = a + 3;
        break;
      }
      // else: regex backtracks to a later "The answer is" — but only if
      // it is still reachable, which the newline-free check governs on
      // the next iteration.
    }
    if (matched_end == sv::npos) {
      pos = p;
      continue;
    }
    char one[2] = {letter, '\0'};
    out.emit(sv(one, 1));
    if (out.overflow) return -1;
    pos = matched_end;
  }
  return out.count;
}

}  // extern "C"
