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

inline bool is_word_byte(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9') || c == '_' || c >= 0x80;
}

inline char lower_ascii(unsigned char c) {
  return (c >= 'A' && c <= 'Z') ? static_cast<char>(c + 32)
                                : static_cast<char>(c);
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
      for (const char* p = start; p < end; ++p) lowered.push_back(lower_ascii(*p));
    }
    for (const char* p = start; p < end;) {
      if (!is_word_byte(static_cast<unsigned char>(*p))) { ++p; continue; }
      token.clear();
      while (p < end && is_word_byte(static_cast<unsigned char>(*p))) {
        token.push_back(lower_ascii(static_cast<unsigned char>(*p)));
        ++p;
      }
      if (token.size() < 2) {
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
