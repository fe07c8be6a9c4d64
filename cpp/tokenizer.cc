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

// ---- training ---------------------------------------------------------
//
// Native byte-level BPE trainer: greedy max-count pair merging over raw
// byte rows — no pre-tokenization, pairs never cross row boundaries
// (parity with the ByteLevel(use_regex=False) setup the framework trains
// under; closes the one N13 gap left in round 2, where learning a new
// vocab still delegated to the in-image HF trainer).
//
// Incremental algorithm: a linked list over the whole corpus, a pair ->
// count map, a pair -> positions index (append-only, validated lazily),
// and a lazy max-heap of (count, pair) snapshots re-pushed on staleness.
// Each merge touches only its occurrences' neighborhoods, so total work is
// O(corpus + sum of occurrence-list lengths), not O(corpus x merges).
//
// Ids in the trainer's numbering: bytes are 0..255 in byte order, merge k
// gets id 256+k (the Python wrapper shifts for special tokens).  Ties
// break deterministically: count desc, then (left id, right id) asc.
// Returns the number of merges learned — may stop early when no pair
// occurs twice.  out_merges must hold 3*n_merges_target int32s.
long long pdec_tok_train(const uint8_t* corpus, long long corpus_len,
                         const long long* row_lens, long long n_rows,
                         long long n_merges_target, int32_t* out_merges) {
  long long total = 0;
  for (long long r = 0; r < n_rows; ++r) total += row_lens[r];
  if (total != corpus_len || total < 0) return -1;

  std::vector<int32_t> ids(total);
  std::vector<long long> nxt(total), prv(total);
  std::vector<char> dead(total, 0);
  long long off = 0;
  for (long long r = 0; r < n_rows; ++r) {
    const long long len = row_lens[r];
    for (long long i = 0; i < len; ++i) {
      ids[off + i] = corpus[off + i];
      prv[off + i] = i > 0 ? off + i - 1 : -1;
      nxt[off + i] = i + 1 < len ? off + i + 1 : -1;  // -1 ends the row
    }
    off += len;
  }

  std::unordered_map<uint64_t, long long> cnt;
  std::unordered_map<uint64_t, std::vector<long long>> pos;
  cnt.reserve(1 << 16);
  for (long long i = 0; i < total; ++i) {
    if (nxt[i] >= 0) {
      const uint64_t k = pair_key(ids[i], ids[nxt[i]]);
      ++cnt[k];
      pos[k].push_back(i);
    }
  }

  struct TCand {
    long long count;
    uint64_t key;
    bool operator<(const TCand& o) const {
      if (count != o.count) return count < o.count;
      return key > o.key;  // smaller (left, right) wins ties
    }
  };
  std::priority_queue<TCand> heap;
  for (const auto& kv : cnt) {
    if (kv.second >= 2) heap.push({kv.second, kv.first});
  }

  int32_t next_id = 256;
  long long n_done = 0;
  while (n_done < n_merges_target && !heap.empty()) {
    const TCand c = heap.top();
    heap.pop();
    const auto it = cnt.find(c.key);
    if (it == cnt.end() || it->second < 2) continue;
    if (it->second != c.count) {  // stale snapshot: requeue at live count
      heap.push({it->second, c.key});
      continue;
    }
    const int32_t a = static_cast<int32_t>(c.key >> 32);
    const int32_t b = static_cast<int32_t>(c.key & 0xffffffff);
    const int32_t m = next_id++;
    out_merges[3 * n_done] = a;
    out_merges[3 * n_done + 1] = b;
    out_merges[3 * n_done + 2] = m;
    ++n_done;

    auto bump = [&](int32_t l, int32_t r, long long at, long long delta) {
      const uint64_t k = pair_key(l, r);
      long long& v = cnt[k];
      v += delta;
      if (delta > 0) {
        pos[k].push_back(at);
        if (v >= 2) heap.push({v, k});
      }
    };

    // move the list out: bump() may rehash `pos` mid-iteration
    const std::vector<long long> plist = std::move(pos[c.key]);
    for (const long long i : plist) {
      if (dead[i] || ids[i] != a) continue;
      const long long j = nxt[i];
      if (j < 0 || dead[j] || ids[j] != b) continue;
      const long long p = prv[i], k2 = nxt[j];
      if (p >= 0) bump(ids[p], a, p, -1);
      if (k2 >= 0) bump(b, ids[k2], j, -1);
      ids[i] = m;
      dead[j] = 1;
      nxt[i] = k2;
      if (k2 >= 0) prv[k2] = i;
      if (p >= 0) bump(ids[p], m, p, +1);
      if (k2 >= 0) bump(m, ids[k2], i, +1);
    }
    cnt.erase(c.key);
    pos.erase(c.key);
  }
  return n_done;
}

}  // extern "C"
