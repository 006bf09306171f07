// Native host runtime for domain_rag_system_tpu.
//
// The indexing host path — corpus tokenization + vocabulary construction —
// is the only CPU-bound loop left around the device programs (the reference
// spends it inside rank_bm25/sentence-transformers; SURVEY.md §3.1 "HOT
// LOOP 3"). This module implements it natively with a C ABI consumed via
// ctypes (no pybind11 in this image).
//
// Tokenization semantics match the Python RegexTokenizer exactly for the
// data this framework indexes: lowercase, maximal runs of word characters
// (ASCII alphanumerics + '_' + any UTF-8 multibyte sequence, mirroring
// Python's re.UNICODE \w over letters), drop tokens shorter than 2 chars
// unless listed as preserved. Parity is enforced by tests that compare
// native and Python tokenization over the recovered corpora.
//
// Build: g++ -O3 -shared -fPIC -o libdrsnative.so drs_native.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Corpus {
  std::vector<std::string> vocab;            // sorted terms
  std::vector<int32_t> doc_token_ids;        // all docs concatenated
  std::vector<int64_t> doc_offsets;          // n_docs + 1 offsets into ids
};

// Decode one UTF-8 codepoint at p (p < end); advances p. Invalid bytes
// decode as U+FFFD and advance by one byte.
inline uint32_t decode_utf8(const char*& p, const char* end) {
  unsigned char c0 = static_cast<unsigned char>(*p);
  if (c0 < 0x80) { ++p; return c0; }
  int extra; uint32_t cp;
  if ((c0 & 0xE0) == 0xC0) { extra = 1; cp = c0 & 0x1F; }
  else if ((c0 & 0xF0) == 0xE0) { extra = 2; cp = c0 & 0x0F; }
  else if ((c0 & 0xF8) == 0xF0) { extra = 3; cp = c0 & 0x07; }
  else { ++p; return 0xFFFD; }
  if (p + extra >= end + 1 && p + extra > end) { ++p; return 0xFFFD; }
  const char* q = p + 1;
  for (int i = 0; i < extra; ++i, ++q) {
    unsigned char cc = static_cast<unsigned char>(*q);
    if ((cc & 0xC0) != 0x80) { ++p; return 0xFFFD; }
    cp = (cp << 6) | (cc & 0x3F);
  }
  p = q;
  return cp;
}

inline void append_utf8(std::string& out, uint32_t cp) {
  if (cp < 0x80) { out.push_back(static_cast<char>(cp)); }
  else if (cp < 0x800) {
    out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out.push_back(static_cast<char>(0xF0 | (cp >> 18)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// Python re.UNICODE \w semantics for the codepoint ranges that occur in
// biomedical text: letters/digits/underscore are word characters; spaces,
// punctuation and symbol blocks are not. Unknown high ranges default to
// word (matching \w for CJK and other letters).
inline bool is_word_cp(uint32_t cp) {
  if (cp < 0x80) {
    return (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
           (cp >= '0' && cp <= '9') || cp == '_';
  }
  // Latin-1 punctuation/symbols (NBSP, ·, ±, °, «, », ...) except the
  // letters µ (B5), ª (AA), º (BA).
  if (cp >= 0xA0 && cp <= 0xBF) return cp == 0xB5 || cp == 0xAA || cp == 0xBA;
  if (cp == 0xD7 || cp == 0xF7) return false;          // × ÷
  if (cp >= 0x2000 && cp <= 0x206F) return false;       // general punctuation
  if (cp >= 0x2070 && cp <= 0x209F) return false;       // super/subscripts
  if (cp >= 0x20A0 && cp <= 0x20CF) return false;       // currency
  if (cp >= 0x2100 && cp <= 0x2BFF) return false;       // letterlike/arrows/math/symbols
  if (cp >= 0x2E00 && cp <= 0x2E7F) return false;       // supplemental punct
  if (cp >= 0x3000 && cp <= 0x303F) return false;       // CJK punctuation
  if (cp >= 0xFE30 && cp <= 0xFE4F) return false;       // CJK compat forms
  if (cp >= 0xFF01 && cp <= 0xFF20) return false;       // fullwidth punct
  if (cp >= 0xFFF0 && cp <= 0xFFFF) return false;       // specials incl. U+FFFD
  return true;
}

// Case folding for ASCII plus the non-ASCII ranges seen in biomedical
// corpora (Latin-1, Latin Extended-A, Greek, Cyrillic).
inline uint32_t lower_cp(uint32_t cp) {
  if (cp >= 'A' && cp <= 'Z') return cp + 0x20;
  if (cp >= 0xC0 && cp <= 0xDE && cp != 0xD7) return cp + 0x20;
  if (cp >= 0x100 && cp <= 0x177 && (cp & 1) == 0) return cp + 1;   // Ext-A pairs
  if (cp >= 0x179 && cp <= 0x17D && (cp & 1) == 1) return cp + 1;
  if (cp >= 0x391 && cp <= 0x3AB && cp != 0x3A2) return cp + 0x20;  // Greek
  if (cp >= 0x410 && cp <= 0x42F) return cp + 0x20;                 // Cyrillic
  if (cp >= 0x400 && cp <= 0x40F) return cp + 0x50;
  return cp;
}

}  // namespace

extern "C" {

// Tokenize a corpus. `buf` holds all documents back to back (UTF-8);
// `offsets` has n_docs+1 entries delimiting each document. `preserved`
// is a '\n'-joined list of lowercase tokens exempt from the length-2
// minimum (may be empty).
void* drs_corpus_tokenize(const char* buf, const int64_t* offsets,
                          int64_t n_docs, const char* preserved) {
  auto* corpus = new Corpus();

  std::unordered_set<std::string> preserved_set;
  if (preserved != nullptr && preserved[0] != '\0') {
    const char* p = preserved;
    while (*p) {
      const char* e = strchr(p, '\n');
      size_t len = e ? static_cast<size_t>(e - p) : strlen(p);
      if (len) preserved_set.emplace(p, len);
      if (!e) break;
      p = e + 1;
    }
  }

  std::unordered_map<std::string, int32_t> term_ids;
  term_ids.reserve(1 << 16);
  std::vector<std::vector<int32_t>> docs(n_docs);
  std::string token;
  std::string lowered;

  for (int64_t d = 0; d < n_docs; ++d) {
    const char* start = buf + offsets[d];
    const char* end = buf + offsets[d + 1];
    auto& out = docs[d];
    // Preserved terms apply only when present in the lowered text; with
    // the default medical-abbreviation list every preserved term is >= 2
    // chars, so this stays cheap: only check when a short token appears.
    lowered.clear();
    if (!preserved_set.empty()) {
      lowered.reserve(end - start);
      for (const char* p = start; p < end;) {
        append_utf8(lowered, lower_cp(decode_utf8(p, end)));
      }
    }
    for (const char* p = start; p < end;) {
      const char* probe = p;
      uint32_t cp = decode_utf8(probe, end);
      if (!is_word_cp(cp)) { p = probe; continue; }
      token.clear();
      while (p < end) {
        probe = p;
        cp = decode_utf8(probe, end);
        if (!is_word_cp(cp)) break;
        append_utf8(token, lower_cp(cp));
        p = probe;
      }
      // NB: token length is in CODEPOINTS for the >=2 filter; ASCII-only
      // short tokens dominate, so byte length equals cp length except for
      // rare single multibyte letters — count codepoints exactly.
      size_t cp_len = 0;
      for (const char* t = token.data(); t < token.data() + token.size();) {
        decode_utf8(t, token.data() + token.size());
        ++cp_len;
      }
      if (cp_len < 2) {
        if (preserved_set.empty() || !preserved_set.count(token) ||
            lowered.find(token) == std::string::npos) {
          continue;
        }
      }
      auto it = term_ids.find(token);
      int32_t id;
      if (it == term_ids.end()) {
        id = static_cast<int32_t>(term_ids.size());
        term_ids.emplace(token, id);
      } else {
        id = it->second;
      }
      out.push_back(id);
    }
  }

  // Remap term ids to sorted-vocabulary order (Python Vocabulary parity).
  corpus->vocab.resize(term_ids.size());
  for (auto& kv : term_ids) corpus->vocab[kv.second] = kv.first;
  std::vector<int32_t> order(corpus->vocab.size());
  std::vector<std::string> sorted_vocab = corpus->vocab;
  std::sort(sorted_vocab.begin(), sorted_vocab.end());
  std::unordered_map<std::string, int32_t> sorted_ids;
  sorted_ids.reserve(sorted_vocab.size());
  for (size_t i = 0; i < sorted_vocab.size(); ++i)
    sorted_ids.emplace(sorted_vocab[i], static_cast<int32_t>(i));
  for (size_t i = 0; i < corpus->vocab.size(); ++i)
    order[i] = sorted_ids[corpus->vocab[i]];
  corpus->vocab = std::move(sorted_vocab);

  corpus->doc_offsets.reserve(n_docs + 1);
  corpus->doc_offsets.push_back(0);
  int64_t total = 0;
  for (auto& doc : docs) total += static_cast<int64_t>(doc.size());
  corpus->doc_token_ids.reserve(total);
  for (auto& doc : docs) {
    for (int32_t id : doc) corpus->doc_token_ids.push_back(order[id]);
    corpus->doc_offsets.push_back(
        static_cast<int64_t>(corpus->doc_token_ids.size()));
  }
  return corpus;
}

int64_t drs_vocab_size(void* handle) {
  return static_cast<int64_t>(static_cast<Corpus*>(handle)->vocab.size());
}

int64_t drs_vocab_bytes(void* handle) {
  auto* c = static_cast<Corpus*>(handle);
  int64_t total = 0;
  for (auto& t : c->vocab) total += static_cast<int64_t>(t.size()) + 1;
  return total;
}

void drs_copy_vocab(void* handle, char* out) {
  auto* c = static_cast<Corpus*>(handle);
  for (auto& t : c->vocab) {
    memcpy(out, t.data(), t.size());
    out += t.size();
    *out++ = '\n';
  }
}

int64_t drs_total_tokens(void* handle) {
  return static_cast<int64_t>(
      static_cast<Corpus*>(handle)->doc_token_ids.size());
}

void drs_copy_tokens(void* handle, int32_t* out_ids, int64_t* out_offsets) {
  auto* c = static_cast<Corpus*>(handle);
  memcpy(out_ids, c->doc_token_ids.data(),
         c->doc_token_ids.size() * sizeof(int32_t));
  memcpy(out_offsets, c->doc_offsets.data(),
         c->doc_offsets.size() * sizeof(int64_t));
}

void drs_free(void* handle) { delete static_cast<Corpus*>(handle); }

}  // extern "C"

// ---------------------------------------------------------------------------
// WordPiece encoding (greedy longest-match-first), matching the Python
// WordPieceTokenizer: BERT basic tokenization (lowercase via lower_cp, NFD
// diacritic folding for Latin-1/Ext-A, punctuation isolation) then greedy
// wordpiece with '##' continuations. Used for corpus encoding with trained
// encoders — the host-side bottleneck of BERT index builds.

namespace {

struct WordPiece {
  std::unordered_set<std::string> vocab;
  std::unordered_map<std::string, int32_t> ids;
  int32_t unk_id = 0, cls_id = 0, sep_id = 0, pad_id = 0;
  size_t max_chars = 100;
};

// Fold Latin-1 / Latin-Ext-A letters to their base ASCII letter (NFD strip).
inline uint32_t fold_diacritic(uint32_t cp) {
  if (cp >= 0xC0 && cp <= 0xFF) {
    static const char* map =
        // 0xC0..0xFF lowercase-folded base letters ('?' = keep)
        "aaaaaa?ceeeeiiii"   // C0-CF (Æ,Ð kept)
        "?nooooo?ouuuuy??"   // D0-DF (×,Ø,Þ,ß kept)
        "aaaaaa?ceeeeiiii"   // E0-EF
        "?nooooo?ouuuuy?y";  // F0-FF
    char c = map[cp - 0xC0];
    if (c != '?') return static_cast<uint32_t>(c);
  }
  if (cp >= 0x100 && cp <= 0x17F) {
    switch (cp) {  // Ext-A letters with NO canonical decomposition stay as-is
      case 0x110: case 0x111: case 0x126: case 0x127: case 0x131:
      case 0x138: case 0x141: case 0x142: case 0x14A: case 0x14B:
      case 0x152: case 0x153: case 0x166: case 0x167: case 0x17F:
        return cp;
    }
    // Latin Extended-A: base letter cycles; approximate via pairs table
    static const char* base =
        "aaaaaaccccccccddddeeeeeeeeeegggggggghhhhiiiiiiiiii"
        "jjkkklllllllllnnnnnnnnnoooooooorrrrrrsssssssstttttt"
        "uuuuuuuuuuuuwwyyyzzzzzz?";
    size_t idx = (cp - 0x100) / 2 * 2 + ((cp - 0x100) & 1);
    if (idx < strlen(base) && base[idx] != '?')
      return static_cast<uint32_t>(base[idx]);
  }
  return cp;
}

// Python's BERT basic tokenization splits on category-P punctuation ONLY —
// symbols (™ ° ±, category S) stay inside words. Match that.
inline bool is_punct_cp(uint32_t cp) {
  if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) return true;
  switch (cp) {  // Latin-1 Po/Pi/Pf
    case 0xA1: case 0xA7: case 0xAB: case 0xB6: case 0xB7: case 0xBB:
    case 0xBF: return true;
  }
  if (cp >= 0x2010 && cp <= 0x2027) return true;   // dashes, quotes, ellipsis
  if (cp >= 0x2030 && cp <= 0x205E) return true;   // permille, daggers, ...
  if (cp >= 0x3001 && cp <= 0x3011) return true;   // CJK punctuation
  if (cp >= 0xFF01 && cp <= 0xFF0F) return true;   // fullwidth punct
  if (cp >= 0xFF1A && cp <= 0xFF20) return true;
  if (cp >= 0xFF3B && cp <= 0xFF40) return true;
  if (cp >= 0xFF5B && cp <= 0xFF65) return true;
  return false;
}

// Python str.isspace() codepoints that occur in practice.
inline bool is_space_cp(uint32_t cp) {
  if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
      cp == '\f' || cp == '\v') return true;
  if (cp == 0x85 || cp == 0xA0 || cp == 0x1680) return true;
  if (cp >= 0x2000 && cp <= 0x200A) return true;
  return cp == 0x2028 || cp == 0x2029 || cp == 0x202F ||
         cp == 0x205F || cp == 0x3000;
}

}  // namespace

extern "C" {

void* drs_wordpiece_create(const char* vocab_blob) {
  auto* wp = new WordPiece();
  const char* p = vocab_blob;
  int32_t id = 0;
  while (*p) {
    const char* e = strchr(p, '\n');
    size_t len = e ? static_cast<size_t>(e - p) : strlen(p);
    std::string tok(p, len);
    wp->vocab.insert(tok);
    wp->ids.emplace(tok, id);
    if (tok == "[UNK]") wp->unk_id = id;
    else if (tok == "[CLS]") wp->cls_id = id;
    else if (tok == "[SEP]") wp->sep_id = id;
    else if (tok == "[PAD]") wp->pad_id = id;
    ++id;
    if (!e) break;
    p = e + 1;
  }
  return wp;
}

// Encode documents into [n_docs, max_length] ids + attention mask.
void drs_wordpiece_encode(void* handle, const char* buf,
                          const int64_t* offsets, int64_t n_docs,
                          int32_t max_length, int32_t* out_ids,
                          int32_t* out_mask) {
  auto* wp = static_cast<WordPiece*>(handle);
  std::string word;
  std::vector<int32_t> pieces;

  for (int64_t d = 0; d < n_docs; ++d) {
    const char* start = buf + offsets[d];
    const char* end = buf + offsets[d + 1];
    int32_t* ids = out_ids + d * max_length;
    int32_t* mask = out_mask + d * max_length;
    int32_t pos = 0;
    ids[pos] = wp->cls_id;
    mask[pos++] = 1;
    int32_t budget = max_length - 2;  // room for [CLS] and [SEP]

    auto flush_word = [&]() {
      if (word.empty() || pos - 1 >= budget + 0) { word.clear(); return; }
      pieces.clear();
      if (word.size() > wp->max_chars) {
        pieces.push_back(wp->unk_id);
      } else {
        size_t s = 0;
        bool bad = false;
        while (s < word.size()) {
          size_t e2 = word.size();
          int32_t pid = -1;
          while (s < e2) {
            std::string cand = (s > 0 ? "##" : "") + word.substr(s, e2 - s);
            auto it = wp->ids.find(cand);
            if (it != wp->ids.end()) { pid = it->second; break; }
            --e2;
          }
          if (pid < 0) { bad = true; break; }
          pieces.push_back(pid);
          s = e2;
        }
        if (bad) { pieces.clear(); pieces.push_back(wp->unk_id); }
      }
      for (int32_t pid : pieces) {
        if (pos - 1 >= budget) break;
        ids[pos] = pid;
        mask[pos++] = 1;
      }
      word.clear();
    };

    for (const char* p = start; p < end;) {
      uint32_t cp = lower_cp(decode_utf8(p, end));
      cp = fold_diacritic(cp);
      if (is_space_cp(cp)) {
        flush_word();
      } else if (cp >= 0x300 && cp <= 0x36F) {
        // combining marks are stripped (NFD semantics)
      } else if (is_punct_cp(cp)) {
        flush_word();
        word.clear();
        append_utf8(word, cp);
        flush_word();
      } else {
        append_utf8(word, cp);
      }
    }
    flush_word();
    ids[pos] = wp->sep_id;
    mask[pos++] = 1;
    for (; pos < max_length; ++pos) { ids[pos] = wp->pad_id; mask[pos] = 0; }
  }
}

void drs_wordpiece_free(void* handle) { delete static_cast<WordPiece*>(handle); }

}  // extern "C"
