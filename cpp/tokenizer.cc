// Byte-level BPE tokenizer with incremental (streaming) decode.
//
// Native replacement for the Rust `tokenizers` wheel the reference pins
// (requirements.txt:154) — the last native dependency the TPU rebuild kept
// host-side in round 1 (PARITY N13).  Scope:
//   * encode: byte-level BPE (no pre-tokenization regex; the framework's
//     own tokenizers are trained with ByteLevel(use_regex=False), so the
//     merge loop over the raw byte sequence is exact parity),
//   * decode: id -> bytes concatenation,
//   * streaming decode: per-sequence state that consumes one token id at a
//     time and emits only the newly appended bytes — the engines' stop-word
//     check becomes O(new bytes) instead of re-decoding the whole
//     generation every chunk (reference KeyWordsCriteria semantics,
//     eval/utils.py:7-122).
//
// C ABI for ctypes (no pybind11 in the image).  Table layout documented at
// each entry point; built by pdec/cpp/tokenizer.py.

#include <cstdint>
#include <cstring>
#include <functional>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::vector<std::string> id_to_bytes;          // token id -> raw bytes
  std::unordered_map<uint64_t, int64_t> merges;  // (l<<32|r) -> rank<<32|id
  int32_t byte_to_id[256];
};

inline uint64_t pair_key(int32_t l, int32_t r) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(l)) << 32) |
         static_cast<uint32_t>(r);
}

struct Stream {
  const Tokenizer* tok;
};

}  // namespace

extern "C" {

// vocab_blob: n_tokens(i32) then per token [len(i32), bytes...].
// merges: n_merges triples (left_id, right_id, merged_id); rank = position.
void* pdec_tok_new(const uint8_t* vocab_blob, long long vocab_len,
                   const int32_t* merges, long long n_merges) {
  auto* t = new Tokenizer();
  const uint8_t* p = vocab_blob;
  const uint8_t* end = vocab_blob + vocab_len;
  if (p + 4 > end) { delete t; return nullptr; }
  int32_t n_tokens;
  std::memcpy(&n_tokens, p, 4);
  p += 4;
  t->id_to_bytes.reserve(n_tokens);
  for (int32_t i = 0; i < n_tokens; ++i) {
    if (p + 4 > end) { delete t; return nullptr; }
    int32_t len;
    std::memcpy(&len, p, 4);
    p += 4;
    if (p + len > end || len < 0) { delete t; return nullptr; }
    t->id_to_bytes.emplace_back(reinterpret_cast<const char*>(p), len);
    p += len;
  }
  for (int b = 0; b < 256; ++b) t->byte_to_id[b] = -1;
  for (int32_t i = 0; i < n_tokens; ++i) {
    if (t->id_to_bytes[i].size() == 1) {
      const int b = static_cast<uint8_t>(t->id_to_bytes[i][0]);
      if (t->byte_to_id[b] < 0) t->byte_to_id[b] = i;
    }
  }
  t->merges.reserve(static_cast<size_t>(n_merges) * 2);
  for (long long m = 0; m < n_merges; ++m) {
    const int32_t l = merges[3 * m], r = merges[3 * m + 1],
                  id = merges[3 * m + 2];
    const uint64_t key = pair_key(l, r);
    if (t->merges.find(key) == t->merges.end()) {
      t->merges[key] = (static_cast<int64_t>(m) << 32) |
                       static_cast<uint32_t>(id);
    }
  }
  return t;
}

void pdec_tok_free(void* h) { delete static_cast<Tokenizer*>(h); }

// Encode UTF-8 bytes; returns token count (or -1 if out buffer too small,
// -2 if a byte has no base token).
long long pdec_tok_encode(void* h, const uint8_t* text, long long n,
                          int32_t* out, long long max_out) {
  const auto* t = static_cast<Tokenizer*>(h);
  std::vector<int32_t> ids;
  ids.reserve(n);
  for (long long i = 0; i < n; ++i) {
    const int32_t id = t->byte_to_id[text[i]];
    if (id < 0) return -2;
    ids.push_back(id);
  }
  // Greedy lowest-rank merge via a lazy min-heap: pop the globally best
  // (rank, leftmost) candidate, revalidate against the live linked list,
  // apply, and push the two pairs the merge created.  O(n log n) vs the
  // naive rescan-per-merge O(n * merges) — the difference between seconds
  // and an hour when tokenizing a 65k-row corpus.  Identical output to the
  // rescan loop: both always apply the global (rank, position) minimum.
  const long long m = static_cast<long long>(ids.size());
  std::vector<long long> next(m), prev(m);
  for (long long i = 0; i < m; ++i) { next[i] = i + 1; prev[i] = i - 1; }

  struct Cand {
    int64_t rank;
    long long pos;
    int32_t l, r;  // pair snapshot for lazy invalidation
    bool operator>(const Cand& o) const {
      return rank != o.rank ? rank > o.rank : pos > o.pos;
    }
  };
  std::priority_queue<Cand, std::vector<Cand>, std::greater<Cand>> heap;
  auto push_pair = [&](long long i) {
    if (i < 0 || i >= m) return;  // head-of-list merges pass prev[i] == -1
    const long long j = next[i];
    if (j >= m) return;
    const auto it = t->merges.find(pair_key(ids[i], ids[j]));
    if (it != t->merges.end()) {
      heap.push({it->second >> 32, i, ids[i], ids[j]});
    }
  };
  std::vector<bool> dead(m, false);
  for (long long i = 0; i + 1 < m; ++i) push_pair(i);
  while (!heap.empty()) {
    const Cand c = heap.top();
    heap.pop();
    const long long i = c.pos, j = next[i];
    // stale if either node died or the pair's token ids changed
    if (dead[i] || j >= m || dead[j] || ids[i] != c.l || ids[j] != c.r) {
      continue;
    }
    const auto it = t->merges.find(pair_key(ids[i], ids[j]));
    ids[i] = static_cast<int32_t>(it->second & 0xffffffff);
    dead[j] = true;
    next[i] = next[j];
    if (next[j] < m) prev[next[j]] = i;
    push_pair(prev[i]);
    push_pair(i);
  }
  long long count = 0;
  for (long long i = 0; i != m && i >= 0; i = next[i]) {
    if (count >= max_out) return -1;
    out[count++] = ids[i];
  }
  return count;
}

// Decode ids to bytes; returns byte count (-1 if buffer too small; unknown
// ids are skipped).
long long pdec_tok_decode(void* h, const int32_t* ids, long long n,
                          uint8_t* out, long long max_out) {
  const auto* t = static_cast<Tokenizer*>(h);
  long long written = 0;
  for (long long i = 0; i < n; ++i) {
    const int32_t id = ids[i];
    if (id < 0 || id >= static_cast<int32_t>(t->id_to_bytes.size())) continue;
    const std::string& b = t->id_to_bytes[id];
    if (written + static_cast<long long>(b.size()) > max_out) return -1;
    std::memcpy(out + written, b.data(), b.size());
    written += b.size();
  }
  return written;
}

// Streaming decode: one token id in, its bytes out (suffix only).
void* pdec_stream_new(void* h) {
  auto* s = new Stream();
  s->tok = static_cast<Tokenizer*>(h);
  return s;
}

void pdec_stream_free(void* s) { delete static_cast<Stream*>(s); }

long long pdec_stream_feed(void* sv, int32_t id, uint8_t* out,
                           long long max_out) {
  auto* s = static_cast<Stream*>(sv);
  const auto& table = s->tok->id_to_bytes;
  if (id < 0 || id >= static_cast<int32_t>(table.size())) return 0;
  const std::string& b = table[id];
  if (static_cast<long long>(b.size()) > max_out) return -1;
  std::memcpy(out, b.data(), b.size());
  return b.size();
}

}  // extern "C"
