// Native bulk indexing path: tokenizer + forward index + CSR postings.
//
// TPU-native equivalent of the reference's C write path (src/tokenize.c,
// src/forward_index.c, src/indexer.c): documents stream through a
// tokenizer into per-doc forward tables, which are merged into term-major
// CSR posting arrays that Python hands to the device untouched.  This is
// the host-side "data loader" of the framework — the device never sees
// strings.
//
// Tokenization rules mirror redisearch_tpu/analysis/tokenizer.py:
//   - separators: ASCII punctuation + whitespace (same set)
//   - backslash escapes a separator into the token
//   - casefold: ASCII tolower (non-ASCII bytes pass through; the Python
//     path handles full Unicode casefolding for the incremental API)
//   - stopwords consume a position but are not indexed
//   - stemming: Porter (same algorithm as analysis/porter.py) for tokens
//     of length >= 4, emitted as '+'-prefixed terms
//
// Build: g++ -O3 -shared -fPIC -o libbulk_indexer.so bulk_indexer.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ---------------------------------------------------------------- tokenizer
bool is_sep(unsigned char c) {
  if (c >= 128) return false;
  static const bool table[128] = {
      // control chars + space are separators; letters/digits are not
      1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,  // 0x00-0x0f
      1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,  // 0x10-0x1f
      1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,  // ' '..'/'
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1,  // '0'-'9',':'..'?'
      1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,  // '@','A'-'O'
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 0,  // 'P'-'Z','['..'_'
      1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,  // '`','a'-'o'
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1,  // 'p'-'z','{'..DEL
  };
  return table[c];
}

// ------------------------------------------------------------ porter stemmer
// Implemented from the published Porter (1980) algorithm; mirrors
// analysis/porter.py so native and Python stems agree.
struct Porter {
  static bool is_cons(const std::string& w, int i) {
    char c = w[i];
    if (c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u')
      return false;
    if (c == 'y') return i == 0 ? true : !is_cons(w, i - 1);
    return true;
  }
  static int measure(const std::string& w) {
    int m = 0;
    bool prev_cons = true, started = false;
    for (int i = 0; i < (int)w.size(); i++) {
      bool c = is_cons(w, i);
      if (!c) started = true;
      else if (started && !prev_cons) m++;
      prev_cons = c;
    }
    return m;
  }
  static bool has_vowel(const std::string& w) {
    for (int i = 0; i < (int)w.size(); i++)
      if (!is_cons(w, i)) return true;
    return false;
  }
  static bool ends_double_cons(const std::string& w) {
    int n = w.size();
    return n >= 2 && w[n - 1] == w[n - 2] && is_cons(w, n - 1);
  }
  static bool cvc(const std::string& w) {
    int n = w.size();
    if (n < 3) return false;
    char last = w[n - 1];
    return is_cons(w, n - 3) && !is_cons(w, n - 2) && is_cons(w, n - 1) &&
           last != 'w' && last != 'x' && last != 'y';
  }
  static bool ends(const std::string& w, const char* s) {
    size_t l = strlen(s);
    return w.size() >= l && w.compare(w.size() - l, l, s) == 0;
  }
  static void cut(std::string& w, int n) { w.resize(w.size() - n); }

  static std::string stem(const std::string& word) {
    if (word.size() <= 2) return word;
    std::string w = word;
    // 1a
    if (ends(w, "sses")) cut(w, 2);
    else if (ends(w, "ies")) cut(w, 2);
    else if (ends(w, "ss")) {}
    else if (ends(w, "s")) cut(w, 1);
    // 1b
    if (ends(w, "eed")) {
      std::string st = w.substr(0, w.size() - 3);
      if (measure(st) > 0) cut(w, 1);
    } else {
      bool flag = false;
      if (ends(w, "ed") && has_vowel(w.substr(0, w.size() - 2))) {
        cut(w, 2); flag = true;
      } else if (ends(w, "ing") && has_vowel(w.substr(0, w.size() - 3))) {
        cut(w, 3); flag = true;
      }
      if (flag) {
        if (ends(w, "at") || ends(w, "bl") || ends(w, "iz")) w += 'e';
        else if (ends_double_cons(w) && !ends(w, "l") && !ends(w, "s") &&
                 !ends(w, "z")) cut(w, 1);
        else if (measure(w) == 1 && cvc(w)) w += 'e';
      }
    }
    // 1c
    if (ends(w, "y") && has_vowel(w.substr(0, w.size() - 1)))
      w[w.size() - 1] = 'i';
    // 2
    static const struct { const char* a; const char* b; } s2[] = {
        {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"},
        {"anci", "ance"}, {"izer", "ize"}, {"abli", "able"}, {"alli", "al"},
        {"entli", "ent"}, {"eli", "e"}, {"ousli", "ous"},
        {"ization", "ize"}, {"ation", "ate"}, {"ator", "ate"},
        {"alism", "al"}, {"iveness", "ive"}, {"fulness", "ful"},
        {"ousness", "ous"}, {"aliti", "al"}, {"iviti", "ive"},
        {"biliti", "ble"}, {"logi", "log"}};
    for (auto& r : s2) {
      if (ends(w, r.a)) {
        std::string st = w.substr(0, w.size() - strlen(r.a));
        if (measure(st) > 0) w = st + r.b;
        break;
      }
    }
    // 3
    static const struct { const char* a; const char* b; } s3[] = {
        {"icate", "ic"}, {"ative", ""}, {"alize", "al"}, {"iciti", "ic"},
        {"ical", "ic"}, {"ful", ""}, {"ness", ""}};
    for (auto& r : s3) {
      if (ends(w, r.a)) {
        std::string st = w.substr(0, w.size() - strlen(r.a));
        if (measure(st) > 0) w = st + r.b;
        break;
      }
    }
    // 4
    static const char* s4[] = {"al", "ance", "ence", "er", "ic", "able",
                               "ible", "ant", "ement", "ment", "ent", "ion",
                               "ou", "ism", "ate", "iti", "ous", "ive",
                               "ize"};
    for (auto* suf : s4) {
      if (ends(w, suf)) {
        std::string st = w.substr(0, w.size() - strlen(suf));
        if (!strcmp(suf, "ion") &&
            (st.empty() || (st.back() != 's' && st.back() != 't')))
          continue;
        if (measure(st) > 1) w = st;
        break;
      }
    }
    // 5a
    if (ends(w, "e")) {
      std::string st = w.substr(0, w.size() - 1);
      int m = measure(st);
      if (m > 1 || (m == 1 && !cvc(st))) w = st;
    }
    // 5b
    if (measure(w) > 1 && ends_double_cons(w) && ends(w, "l")) cut(w, 1);
    return w;
  }
};

// ------------------------------------------------------------- the builder
struct Builder {
  int stem_enabled;
  std::unordered_set<std::string> stopwords;
  std::unordered_map<std::string, int32_t> term_ids;
  std::vector<std::string> terms;
  // flat forward entries (sorted into CSR at finish)
  std::vector<int32_t> e_term;
  std::vector<int32_t> e_doc;
  std::vector<float> e_freq;
  std::vector<int32_t> e_mask;
  std::vector<int64_t> e_pos_start;  // into positions pool
  std::vector<int32_t> e_pos_len;
  std::vector<int32_t> positions;
  std::vector<float> doc_lens;
  std::vector<float> max_freqs;
  int32_t max_pos = 0;
  int64_t max_postings = 0;
  // per-doc scratch
  std::unordered_map<std::string, int32_t> fwd;  // term -> entry idx in doc
  std::vector<int32_t> fwd_entries;

  int32_t term_id(const std::string& t) {
    auto it = term_ids.find(t);
    if (it != term_ids.end()) return it->second;
    int32_t id = terms.size();
    term_ids.emplace(t, id);
    terms.push_back(t);
    return id;
  }

  void fwd_add(const std::string& t, int32_t doc, float w, int32_t fbit,
               int32_t pos) {
    auto it = fwd.find(t);
    if (it == fwd.end()) {
      int32_t idx = e_term.size();
      fwd.emplace(t, idx);
      fwd_entries.push_back(idx);
      e_term.push_back(term_id(t));
      e_doc.push_back(doc);
      e_freq.push_back(w);
      e_mask.push_back(fbit);
      e_pos_start.push_back(positions.size());
      e_pos_len.push_back(1);
      positions.push_back(pos);
    } else {
      int32_t idx = it->second;
      e_freq[idx] += w;
      e_mask[idx] |= fbit;
      // positions for this entry must stay contiguous: entries are created
      // in token order, but a repeated term interleaves.  Store positions
      // in a per-entry chain instead: we append and fix up at finish by
      // sorting (positions within a doc are few).  Simpler: push to pool
      // and record count; finish() re-gathers per entry via stable order.
      positions.push_back(pos);
      e_pos_len[idx]++;
      // mark pool slot owner via parallel vector (filled below)
    }
  }
};

}  // namespace

extern "C" {

void* bulk_new(const char* stopwords_blob, int stem_enabled) {
  auto* b = new Builder();
  b->stem_enabled = stem_enabled;
  const char* p = stopwords_blob;
  while (p && *p) {
    const char* nl = strchr(p, '\n');
    size_t len = nl ? (size_t)(nl - p) : strlen(p);
    if (len) b->stopwords.emplace(p, len);
    p = nl ? nl + 1 : nullptr;
  }
  return b;
}

// Positions-pool ownership fix: because interleaved repeated terms break
// contiguity, we track pool owners per doc and compact at doc end.
// add_doc processes ALL text fields of one document.
//   texts: concatenated field texts; field_off[i]..field_off[i+1] bounds
//   field_ids/weights: per field
// Returns the document's token count (doclen).
double bulk_add_doc(void* handle, int32_t doc, const char* texts,
                    const int64_t* field_off, const int32_t* field_ids,
                    const float* weights, int n_fields) {
  auto* b = (Builder*)handle;
  b->fwd.clear();
  b->fwd_entries.clear();
  int64_t pool_start = b->positions.size();
  // owners parallel to positions appended this doc
  static thread_local std::vector<int32_t> owners;
  owners.clear();

  double doclen = 0.0;
  int32_t pos_base = 0;
  std::string tok, stemmed;
  for (int f = 0; f < n_fields; f++) {
    const char* s = texts + field_off[f];
    const char* end = texts + field_off[f + 1];
    int32_t fbit = 1 << field_ids[f];
    float w = weights[f];
    int32_t pos = 0;
    int n_tok = 0;
    while (s < end) {
      while (s < end && is_sep((unsigned char)*s)) s++;
      if (s >= end) break;
      tok.clear();
      while (s < end) {
        unsigned char c = (unsigned char)*s;
        if (c == '\\' && s + 1 < end && is_sep((unsigned char)s[1])) {
          tok += s[1];
          s += 2;
          continue;
        }
        if (is_sep(c)) break;
        tok += (char)(c < 128 ? tolower(c) : c);
        s++;
      }
      if (tok.empty()) continue;
      pos++;
      n_tok++;
      if (b->stopwords.count(tok)) continue;
      int32_t gpos = pos_base + pos;
      if (gpos > b->max_pos) b->max_pos = gpos;
      // emit token
      size_t before = b->positions.size();
      b->fwd_add(tok, doc, w, fbit, gpos);
      while (owners.size() < b->positions.size() - pool_start)
        owners.push_back(b->fwd.at(tok));
      if (b->stem_enabled && tok.size() >= 4) {
        stemmed = Porter::stem(tok);
        // match the Python builder: only index a stem term when it
        // differs from the token (analysis/stemmer.py Stemmer.stem)
        if (stemmed != tok) {
          stemmed = "+" + stemmed;
          b->fwd_add(stemmed, doc, w, fbit, gpos);
          while (owners.size() < b->positions.size() - pool_start)
            owners.push_back(b->fwd.at(stemmed));
        }
      }
      (void)before;
    }
    doclen += n_tok;
    pos_base += n_tok + 1;
  }

  // compact this doc's positions so each entry's positions are contiguous
  // (entries were interleaved in token order)
  size_t n_new = b->positions.size() - pool_start;
  if (n_new) {
    static thread_local std::vector<int32_t> tmp;
    tmp.assign(b->positions.begin() + pool_start, b->positions.end());
    // bucket by owner entry, preserving order
    size_t cursor = pool_start;
    for (int32_t idx : b->fwd_entries) {
      b->e_pos_start[idx] = cursor;
      int32_t cnt = 0;
      for (size_t j = 0; j < n_new; j++) {
        if (owners[j] == idx) {
          b->positions[cursor++] = tmp[j];
          cnt++;
        }
      }
      b->e_pos_len[idx] = cnt;
    }
  }

  // doc stats
  float mf = 1.0f;
  for (int32_t idx : b->fwd_entries)
    if (b->e_freq[idx] > mf) mf = b->e_freq[idx];
  b->doc_lens.push_back((float)doclen);
  b->max_freqs.push_back(mf);
  return doclen;
}

// finish phase 1: report sizes so Python can allocate numpy outputs
void bulk_sizes(void* handle, int64_t* out) {
  auto* b = (Builder*)handle;
  out[0] = (int64_t)b->terms.size();
  out[1] = (int64_t)b->e_term.size();   // nnz
  out[2] = (int64_t)b->positions.size();
  int64_t blob = 0;
  for (auto& t : b->terms) blob += (int64_t)t.size() + 1;
  out[3] = blob;
  out[4] = b->max_pos;
  out[5] = (int64_t)b->doc_lens.size();
}

// finish phase 2: export CSR (term-major, doc order preserved within term)
void bulk_export(void* handle, int32_t* term_offsets, int32_t* doc_ids,
                 float* freqs, int32_t* masks, int64_t* pos_offsets,
                 int32_t* out_positions, char* terms_blob, float* doc_lens,
                 float* max_freqs, int64_t* out_max_postings) {
  auto* b = (Builder*)handle;
  int64_t n_terms = b->terms.size();
  int64_t nnz = b->e_term.size();
  // counting sort by term id (entries already in doc order)
  std::vector<int64_t> counts(n_terms + 1, 0);
  for (int64_t i = 0; i < nnz; i++) counts[b->e_term[i] + 1]++;
  int64_t maxp = 0;
  for (int64_t t = 0; t < n_terms; t++)
    if (counts[t + 1] > maxp) maxp = counts[t + 1];
  *out_max_postings = maxp;
  for (int64_t t = 0; t < n_terms; t++) counts[t + 1] += counts[t];
  for (int64_t t = 0; t <= n_terms; t++) term_offsets[t] = (int32_t)counts[t];
  std::vector<int64_t> fill(counts.begin(), counts.end() - 1);
  // first pass: place postings + compute per-slot position lengths
  std::vector<int32_t> slot_poslen(nnz);
  std::vector<int64_t> slot_possrc(nnz);
  for (int64_t i = 0; i < nnz; i++) {
    int64_t at = fill[b->e_term[i]]++;
    doc_ids[at] = b->e_doc[i];
    freqs[at] = b->e_freq[i];
    masks[at] = b->e_mask[i];
    slot_poslen[at] = b->e_pos_len[i];
    slot_possrc[at] = b->e_pos_start[i];
  }
  // positions CSR aligned with the sorted postings
  int64_t pat = 0;
  for (int64_t at = 0; at < nnz; at++) {
    pos_offsets[at] = pat;
    memcpy(out_positions + pat, b->positions.data() + slot_possrc[at],
           slot_poslen[at] * sizeof(int32_t));
    pat += slot_poslen[at];
  }
  pos_offsets[nnz] = pat;
  // term strings (NUL separated)
  char* p = terms_blob;
  for (auto& t : b->terms) {
    memcpy(p, t.data(), t.size());
    p += t.size();
    *p++ = '\0';
  }
  memcpy(doc_lens, b->doc_lens.data(), b->doc_lens.size() * sizeof(float));
  memcpy(max_freqs, b->max_freqs.data(),
         b->max_freqs.size() * sizeof(float));
}

void bulk_free(void* handle) { delete (Builder*)handle; }

}  // extern "C"

// ---------------------------------------------------------------------------
// Term-dictionary expansion scans (reference: trie Levenshtein automaton
// src/trie/levenshtein.c, wildcard src/wildcard/, suffix trie src/suffix.c —
// here linear scans over the NUL-separated term blob with banded DP /
// glob matching; the dictionary stays host-side per SURVEY.md §7.3).
// ---------------------------------------------------------------------------

extern "C" {

// Banded Levenshtein <= maxd between query q and term t (byte-wise).
static inline bool lev_le(const char* q, int lq, const char* t, int lt,
                          int maxd) {
  if (lq - lt > maxd || lt - lq > maxd) return false;
  // rolling rows; band of width 2*maxd+1
  static thread_local std::vector<int> prev_v, cur_v;
  prev_v.resize(lt + 1);
  cur_v.resize(lt + 1);
  int* prev = prev_v.data();
  int* cur = cur_v.data();
  for (int j = 0; j <= lt; j++) prev[j] = j;
  for (int i = 1; i <= lq; i++) {
    int lo = i - maxd < 1 ? 1 : i - maxd;
    int hi = i + maxd > lt ? lt : i + maxd;
    cur[lo - 1] = (lo - 1 == 0) ? i : maxd + 1;
    int rowmin = cur[lo - 1];
    for (int j = lo; j <= hi; j++) {
      int sub = prev[j - 1] + (q[i - 1] != t[j - 1]);
      int del = prev[j] + 1;
      int ins = cur[j - 1] + 1;
      int v = sub < del ? sub : del;
      if (ins < v) v = ins;
      cur[j] = v;
      if (v < rowmin) rowmin = v;
    }
    if (hi < lt) cur[hi + 1] = maxd + 1;
    if (rowmin > maxd) return false;
    std::swap(prev, cur);
  }
  return prev[lt] <= maxd;
}

// Scan the NUL-separated blob; fill out_idx with term ordinals whose
// Levenshtein distance from q is <= maxd.  Returns the match count.
int64_t fuzzy_scan(const char* blob, int64_t blob_len, const char* q,
                   int maxd, int32_t* out_idx, int64_t max_out) {
  int lq = strlen(q);
  int64_t n = 0, ord = 0;
  const char* p = blob;
  const char* end = blob + blob_len;
  while (p < end && n < max_out) {
    int lt = strlen(p);
    char c0 = p[0];
    // skip internal-marker terms (stem '+', phonetic \x01, synonym '~')
    if (c0 != '+' && c0 != '\x01' && c0 != '~'
        && lev_le(q, lq, p, lt, maxd)) {
      out_idx[n++] = (int32_t)ord;
    }
    p += lt + 1;
    ord++;
  }
  return n;
}

// Glob match: '*' any run, '?' single char.
static bool glob_match(const char* pat, const char* s) {
  const char* star = nullptr;
  const char* ss = nullptr;
  while (*s) {
    if (*pat == '?' || *pat == *s) {
      pat++; s++;
    } else if (*pat == '*') {
      star = pat++;
      ss = s;
    } else if (star) {
      pat = star + 1;
      s = ++ss;
    } else {
      return false;
    }
  }
  while (*pat == '*') pat++;
  return *pat == '\0';
}

int64_t wildcard_scan(const char* blob, int64_t blob_len, const char* pat,
                      int32_t* out_idx, int64_t max_out) {
  int64_t n = 0, ord = 0;
  const char* p = blob;
  const char* end = blob + blob_len;
  while (p < end && n < max_out) {
    char c0 = p[0];
    if (c0 != '+' && c0 != '\x01' && c0 != '~' && glob_match(pat, p))
      out_idx[n++] = (int32_t)ord;
    p += strlen(p) + 1;
    ord++;
  }
  return n;
}

// mode 0: *suffix (ends-with), mode 1: *infix* (contains)
int64_t affix_scan(const char* blob, int64_t blob_len, const char* text,
                   int mode, int32_t* out_idx, int64_t max_out) {
  int lt = strlen(text);
  int64_t n = 0, ord = 0;
  const char* p = blob;
  const char* end = blob + blob_len;
  while (p < end && n < max_out) {
    char c0 = p[0];
    if (c0 != '+' && c0 != '\x01' && c0 != '~') {
      int lp = strlen(p);
      bool hit = false;
      if (mode == 0) {
        hit = lp >= lt && memcmp(p + lp - lt, text, lt) == 0;
      } else {
        hit = lp >= lt && strstr(p, text) != nullptr;
      }
      if (hit) out_idx[n++] = (int32_t)ord;
      p += lp + 1;
    } else {
      p += strlen(p) + 1;
    }
    ord++;
  }
  return n;
}

}  // extern "C"
