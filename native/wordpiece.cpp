// Batch WordPiece tokenizer (C++), the native data-loader hot path.
//
// The reference tokenizes every batch with a Python HF BertTokenizer on the
// training critical path (reference image_Retrieval_caption.py:46-61;
// SURVEY.md §3.2 flags it as the host bottleneck).  leccr_tpu pre-tokenizes
// offline, and this library makes that pass (and any online/serving
// tokenization) native: basic tokenization (control stripping, whitespace,
// CJK isolation, punctuation split, optional ASCII lowercase) + greedy
// longest-match WordPiece over a vocab.txt, emitting [CLS] ... [SEP] id rows
// padded to a fixed width.
//
// Exposed as a C ABI for ctypes (leccr_tpu/data/native_tokenizer.py).
// Parity with the Python WordPieceTokenizer is enforced in
// tests/test_native_tokenizer.py.

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  bool lowercase = false;
  int32_t cls_id = -1, sep_id = -1, unk_id = -1, pad_id = 0;
};

// ---- UTF-8 helpers -------------------------------------------------------

// Decode next codepoint starting at s[i]; advances i past it.
uint32_t next_cp(const std::string& s, size_t& i) {
  unsigned char c = s[i];
  uint32_t cp;
  size_t len;
  if (c < 0x80) { cp = c; len = 1; }
  else if ((c >> 5) == 0x6) { cp = c & 0x1F; len = 2; }
  else if ((c >> 4) == 0xE) { cp = c & 0x0F; len = 3; }
  else if ((c >> 3) == 0x1E) { cp = c & 0x07; len = 4; }
  else { ++i; return 0xFFFD; }
  if (i + len > s.size()) { ++i; return 0xFFFD; }
  for (size_t k = 1; k < len; ++k) cp = (cp << 6) | (s[i + k] & 0x3F);
  i += len;
  return cp;
}

bool is_whitespace(uint32_t cp) {
  return cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
         cp == 0x00A0 || cp == 0x2000 || (cp >= 0x2000 && cp <= 0x200A) ||
         cp == 0x202F || cp == 0x205F || cp == 0x3000;
}

bool is_control(uint32_t cp) {
  if (cp == '\t' || cp == '\n' || cp == '\r') return false;
  return cp < 0x20 || cp == 0x7F || (cp >= 0x80 && cp <= 0x9F) ||
         (cp >= 0x200B && cp <= 0x200F) || cp == 0xFEFF;
}

bool is_cjk(uint32_t cp) {
  return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
         (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
         (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
         (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F);
}

bool is_punct(uint32_t cp) {
  if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126))
    return true;
  // common unicode punctuation blocks (approximation of category P;
  // exact-parity corpus is ASCII+CJK — see module header)
  return (cp >= 0x2010 && cp <= 0x2027) || (cp >= 0x2030 && cp <= 0x205E) ||
         (cp >= 0x3001 && cp <= 0x3011) || (cp >= 0xFF01 && cp <= 0xFF0F) ||
         (cp >= 0xFF1A && cp <= 0xFF20) || (cp >= 0xFF3B && cp <= 0xFF40) ||
         (cp >= 0xFF5B && cp <= 0xFF65);
}

void append_cp(std::string& out, uint32_t cp) {
  if (cp < 0x80) out.push_back(static_cast<char>(cp));
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

// basic tokenization -> words (as codepoint vectors, utf8-encoded per cp)
void basic_tokenize(const Tokenizer& tok, const std::string& text,
                    std::vector<std::vector<std::string>>& words) {
  std::vector<std::string> cur;
  size_t i = 0;
  auto flush = [&]() {
    if (!cur.empty()) { words.push_back(cur); cur.clear(); }
  };
  while (i < text.size()) {
    uint32_t cp = next_cp(text, i);
    if (cp == 0 || cp == 0xFFFD || is_control(cp)) continue;
    if (is_whitespace(cp)) { flush(); continue; }
    if (tok.lowercase && cp >= 'A' && cp <= 'Z') cp += 32;
    std::string enc;
    append_cp(enc, cp);
    if (is_cjk(cp) || is_punct(cp)) {
      flush();
      words.push_back({enc});
    } else {
      cur.push_back(enc);
    }
  }
  flush();
}

// greedy longest-match wordpiece over codepoint chunks
void wordpiece(const Tokenizer& tok, const std::vector<std::string>& word,
               std::vector<int32_t>& out) {
  if (word.size() > 100) { out.push_back(tok.unk_id); return; }
  std::vector<int32_t> pieces;
  size_t start = 0;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t id = -1;
    while (start < end) {
      std::string sub = start > 0 ? "##" : "";
      for (size_t k = start; k < end; ++k) sub += word[k];
      auto it = tok.vocab.find(sub);
      if (it != tok.vocab.end()) { id = it->second; break; }
      --end;
    }
    if (id < 0) { out.push_back(tok.unk_id); return; }
    pieces.push_back(id);
    start = end;
  }
  out.insert(out.end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

void* wp_create(const char* vocab_path, int lowercase) {
  auto* tok = new Tokenizer();
  tok->lowercase = lowercase != 0;
  std::ifstream in(vocab_path);
  if (!in) { delete tok; return nullptr; }
  std::string line;
  int32_t id = 0;
  while (std::getline(in, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    tok->vocab.emplace(line, id++);
  }
  auto get = [&](const char* k) {
    auto it = tok->vocab.find(k);
    return it == tok->vocab.end() ? -1 : it->second;
  };
  tok->cls_id = get("[CLS]");
  tok->sep_id = get("[SEP]");
  tok->unk_id = get("[UNK]");
  int32_t pad = get("[PAD]");
  tok->pad_id = pad < 0 ? 0 : pad;
  if (tok->cls_id < 0 || tok->sep_id < 0 || tok->unk_id < 0) {
    delete tok;
    return nullptr;
  }
  return tok;
}

void wp_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encode n texts into ids/mask [n, width] (int32, caller-allocated).
// Sequences are truncated to max_len tokens incl. [CLS]/[SEP].
int wp_encode_batch(void* handle, const char** texts, int n, int max_len,
                    int width, int32_t* out_ids, int32_t* out_mask) {
  auto* tok = static_cast<Tokenizer*>(handle);
  if (!tok || max_len < 2 || width < max_len) return -1;
  for (int row = 0; row < n; ++row) {
    std::vector<std::vector<std::string>> words;
    basic_tokenize(*tok, texts[row], words);
    std::vector<int32_t> ids;
    ids.push_back(tok->cls_id);
    for (const auto& w : words) {
      wordpiece(*tok, w, ids);
      if (static_cast<int>(ids.size()) >= max_len - 1) break;
    }
    if (static_cast<int>(ids.size()) > max_len - 1)
      ids.resize(max_len - 1);
    ids.push_back(tok->sep_id);
    int32_t* idr = out_ids + static_cast<size_t>(row) * width;
    int32_t* mkr = out_mask + static_cast<size_t>(row) * width;
    for (int j = 0; j < width; ++j) {
      idr[j] = j < static_cast<int>(ids.size()) ? ids[j] : tok->pad_id;
      mkr[j] = j < static_cast<int>(ids.size()) ? 1 : 0;
    }
  }
  return 0;
}

}  // extern "C"
