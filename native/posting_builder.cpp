// Native batch posting builder — the document-indexing hot path.
//
// The reference extracts postings with rayon-parallel extractors feeding
// hash-partitioned caches (milli/src/update/new/extract/, extract.rs:34,
// cache.rs:1-60). This box has one core, so the win is not thread
// parallelism but eliminating the per-token Python interpreter cost: one
// call per document batch tokenizes every searchable field (reusing
// mstpu_tokenize from tokenizer.cpp), accumulates per-key docid lists in
// C++ hash maps, and returns a single serialized buffer the Python store
// merges with bulk set.update() calls.
//
// Semantics mirror IndexStore._index_document_content exactly
// (meilisearch_tpu/index/store.py): per-fid position chaining across
// leaves with the hard-separator gap, MAX_POSITION cap, bucketed
// positions (milli lib.rs:248-260), pair proximities < MAX_DISTANCE with
// per-document minimum dedup (extract_word_pair_proximity_docids.rs),
// per-fid word counts <= 30 (lib.rs:151), exact-attribute split, stop
// words filtered after position assignment. A document containing any
// field the native tokenizer cannot fold byte-identically is reported
// back and indexed by the Python path instead, so the two implementations
// can never diverge.
//
// Output buffer layout (little-endian int32 words unless noted):
//   header[14]: magic, n_words, words_blob_bytes, n_fallback,
//               nk_wd, total_wd, nk_wf, total_wf, nk_wp, total_wp,
//               nk_pp, total_pp, nk_fc, total_fc
//   word_offsets[n_words + 1]
//   words_blob (padded to 4 bytes)
//   fallback_docids[n_fallback]
//   wd: wid_flag[nk_wd] (wid*2 + exact), lens[nk_wd], docids[total_wd]
//   wf: wid[nk_wf], fid[nk_wf], lens[nk_wf], docids[total_wf]
//   wp: wid[nk_wp], bucket[nk_wp], lens[nk_wp], docids[total_wp]
//   pp: prox[nk_pp], w1[nk_pp], w2[nk_pp], lens[nk_pp], docids[total_pp]
//   fc: fid[nk_fc], count[nk_fc], lens[nk_fc], docids[total_fc]

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

extern "C" int mstpu_tokenize(
    const char* text, int32_t len,
    int32_t* raw_starts, int32_t* raw_lens, int32_t* positions,
    int32_t* norm_lens, char* norm_buf, int32_t norm_buf_cap,
    int32_t max_tokens);

namespace {

constexpr int32_t MAGIC = 0x4D535042;  // "MSPB"
constexpr int HARD_GAP = 4;            // tokenizer HARD_SEPARATOR_GAP
constexpr int MAX_POSITION = 1 << 16;  // milli lib.rs:148
constexpr int MAX_COUNTED_WORDS = 30;  // milli lib.rs:151
constexpr int MAX_DISTANCE = 4;        // milli proximity.rs:7
constexpr int MAX_WORD_LENGTH = 250;   // milli lib.rs:146
constexpr int MAX_TOKENS = 4096;
constexpr int NORM_CAP = 1 << 16;

inline int32_t bucketed(int32_t rel) {
    // milli lib.rs:248-260: exact < 16, then 24, then powers of two
    if (rel < 16) return rel;
    if (rel < 24) return 24;
    int32_t b = 32;
    while (b < rel) b <<= 1;
    return b;
}

inline int32_t proximity(int32_t lhs, int32_t rhs) {
    // milli proximity.rs:10-17
    if (lhs <= rhs) return std::min(rhs - lhs, MAX_DISTANCE);
    return std::min(lhs - rhs + 1, MAX_DISTANCE);
}

using Postings = std::unordered_map<int64_t, std::vector<int32_t>>;

inline void push(Postings& table, int64_t key, int32_t docid) {
    auto& v = table[key];
    // docids arrive in ascending order: per-document dedup is a tail check
    if (v.empty() || v.back() != docid) v.push_back(docid);
}

struct Builder {
    std::unordered_map<std::string, int32_t> word_ids;
    std::vector<std::string> words;
    Postings wd, wf, wp, pp, fc;
    std::vector<int32_t> fallback_docs;

    int32_t intern(const char* s, int32_t len) {
        std::string key(s, len);
        auto it = word_ids.find(key);
        if (it != word_ids.end()) return it->second;
        int32_t id = (int32_t)words.size();
        words.push_back(key);
        word_ids.emplace(std::move(key), id);
        return id;
    }
};

struct TokenBufs {
    int32_t raw_starts[MAX_TOKENS];
    int32_t raw_lens[MAX_TOKENS];
    int32_t positions[MAX_TOKENS];
    int32_t norm_lens[MAX_TOKENS];
    char norm_buf[NORM_CAP];
};

// serialize one section: keys as N int32 columns + lens + docids
size_t section_size(const Postings& t) {
    size_t total = 0;
    for (const auto& kv : t) total += kv.second.size();
    return total;
}

}  // namespace

extern "C" {

// Build postings for a batch. entries: 5 int32 per entry
// (docid, fid, exact_flag, text_off, text_len), ordered by document;
// all entries of one document are consecutive. Returns the malloc'd
// output length in bytes via *out_len and the buffer via *out_buf, or a
// negative value on error.
int64_t mstpu_build_postings(
    const char* texts, int64_t texts_len,
    const int32_t* entries, int32_t n_entries,
    const char* stop_blob, const int32_t* stop_offs, int32_t n_stop,
    uint8_t** out_buf) {
    (void)texts_len;
    Builder b;
    // heuristic reserves: ~10 tokens per entry; rehash churn dominates the
    // map cost otherwise
    size_t hint = (size_t)n_entries + 1024;
    b.word_ids.reserve(hint);
    b.wd.reserve(hint);
    b.wf.reserve(hint);
    b.wp.reserve(hint);
    b.pp.reserve(hint);
    std::unordered_set<std::string> stop_words;
    for (int32_t i = 0; i < n_stop; i++) {
        stop_words.emplace(stop_blob + stop_offs[i],
                           stop_offs[i + 1] - stop_offs[i]);
    }
    TokenBufs* bufs = new TokenBufs();

    // per-document scratch
    std::unordered_map<int32_t, std::vector<std::pair<int32_t, int32_t>>>
        scratch;  // fid -> (wid, pos)
    std::unordered_map<int32_t, int32_t> last_pos;  // fid -> last position
    std::unordered_map<int32_t, int32_t> fid_exact;
    std::unordered_map<int64_t, int32_t> local_pairs;  // (w1,w2) -> min prox

    int32_t i = 0;
    while (i < n_entries) {
        int32_t docid = entries[i * 5];
        scratch.clear();
        last_pos.clear();
        fid_exact.clear();
        bool fallback = false;
        int32_t j = i;
        for (; j < n_entries && entries[j * 5] == docid; j++) {
            int32_t fid = entries[j * 5 + 1];
            int32_t exact = entries[j * 5 + 2];
            int32_t off = entries[j * 5 + 3];
            int32_t tlen = entries[j * 5 + 4];
            fid_exact[fid] = exact;
            if (fallback) continue;  // still consume the doc's entries
            auto lp = last_pos.find(fid);
            int32_t base = (lp == last_pos.end()) ? 0 : lp->second + HARD_GAP;
            if (base >= MAX_POSITION) continue;
            int n = mstpu_tokenize(texts + off, tlen, bufs->raw_starts,
                                   bufs->raw_lens, bufs->positions,
                                   bufs->norm_lens, bufs->norm_buf, NORM_CAP,
                                   MAX_TOKENS);
            if (n < 0) {
                fallback = true;
                continue;
            }
            int32_t last = base;
            int32_t norm_off = 0;
            auto& vec = scratch[fid];
            for (int t = 0; t < n; t++) {
                int32_t nl = bufs->norm_lens[t];
                int32_t word_off = norm_off;
                norm_off += nl;
                int32_t pos = base + bufs->positions[t];
                if (pos >= MAX_POSITION) break;
                if (nl == 0 || nl > MAX_WORD_LENGTH) continue;
                if (!stop_words.empty()) {
                    std::string raw(texts + off + bufs->raw_starts[t],
                                    (size_t)bufs->raw_lens[t]);
                    if (stop_words.count(raw)) continue;
                }
                int32_t wid = b.intern(bufs->norm_buf + word_off, nl);
                vec.emplace_back(wid, pos);
                last = pos;
            }
            last_pos[fid] = last;
        }

        if (fallback) {
            b.fallback_docs.push_back(docid);
        } else {
            for (auto& kv : scratch) {
                int32_t fid = kv.first;
                auto& vec = kv.second;
                if (vec.empty()) continue;
                int32_t exact = fid_exact[fid];
                for (auto& wp_ : vec) {
                    int32_t wid = wp_.first, pos = wp_.second;
                    push(b.wd, (int64_t)wid * 2 + exact, docid);
                    push(b.wf, ((int64_t)wid << 20) | (uint32_t)fid, docid);
                    int32_t bpos = pos < 0xFFFF ? pos : 0xFFFF;
                    push(b.wp,
                         ((int64_t)wid << 20) | (uint32_t)bucketed(bpos),
                         docid);
                }
                if ((int32_t)vec.size() <= MAX_COUNTED_WORDS) {
                    push(b.fc, ((int64_t)fid << 8) | (int64_t)vec.size(),
                         docid);
                }
                // sliding-window pair proximities (store.py
                // _pairs_from_positions; extract_word_pair_proximity:504)
                local_pairs.clear();
                {
                    size_t win_start = 0;
                    for (size_t k = 0; k < vec.size(); k++) {
                        while (win_start < k &&
                               proximity(vec[win_start].second,
                                         vec[k].second) >= MAX_DISTANCE) {
                            // flush head: pair with every later member of
                            // the window [win_start+1 .. k-1]
                            for (size_t m = win_start + 1; m < k; m++) {
                                int32_t prox = proximity(
                                    vec[win_start].second, vec[m].second);
                                if (prox > 0 && prox < MAX_DISTANCE) {
                                    int64_t key =
                                        ((int64_t)vec[win_start].first << 24) |
                                        (int64_t)vec[m].first;
                                    auto it = local_pairs.find(key);
                                    if (it == local_pairs.end() ||
                                        prox < it->second)
                                        local_pairs[key] = prox;
                                }
                            }
                            win_start++;
                        }
                    }
                    // drain the remaining window
                    for (size_t h = win_start; h < vec.size(); h++) {
                        for (size_t m = h + 1; m < vec.size(); m++) {
                            int32_t prox =
                                proximity(vec[h].second, vec[m].second);
                            if (prox > 0 && prox < MAX_DISTANCE) {
                                int64_t key = ((int64_t)vec[h].first << 24) |
                                              (int64_t)vec[m].first;
                                auto it = local_pairs.find(key);
                                if (it == local_pairs.end() ||
                                    prox < it->second)
                                    local_pairs[key] = prox;
                            }
                        }
                    }
                }
                for (auto& pkv : local_pairs) {
                    int64_t key = ((int64_t)pkv.second << 48) | pkv.first;
                    push(b.pp, key, docid);
                }
            }
        }
        i = j;
    }
    delete bufs;

    // ---- serialize -------------------------------------------------------
    size_t words_blob = 0;
    for (auto& w : b.words) words_blob += w.size();
    size_t blob_padded = (words_blob + 3) & ~size_t(3);
    size_t n_words = b.words.size();
    size_t tot_wd = section_size(b.wd), tot_wf = section_size(b.wf),
           tot_wp = section_size(b.wp), tot_pp = section_size(b.pp),
           tot_fc = section_size(b.fc);
    size_t n_i32 = 14 + (n_words + 1) + blob_padded / 4 +
                   b.fallback_docs.size() +
                   (b.wd.size() * 2 + tot_wd) + (b.wf.size() * 3 + tot_wf) +
                   (b.wp.size() * 3 + tot_wp) + (b.pp.size() * 4 + tot_pp) +
                   (b.fc.size() * 3 + tot_fc);
    uint8_t* buf = (uint8_t*)std::malloc(n_i32 * 4);
    if (!buf) return -1;
    int32_t* p = (int32_t*)buf;
    auto w32 = [&](int64_t v) { *p++ = (int32_t)v; };
    w32(MAGIC);
    w32((int64_t)n_words);
    w32((int64_t)words_blob);
    w32((int64_t)b.fallback_docs.size());
    w32((int64_t)b.wd.size());
    w32((int64_t)tot_wd);
    w32((int64_t)b.wf.size());
    w32((int64_t)tot_wf);
    w32((int64_t)b.wp.size());
    w32((int64_t)tot_wp);
    w32((int64_t)b.pp.size());
    w32((int64_t)tot_pp);
    w32((int64_t)b.fc.size());
    w32((int64_t)tot_fc);
    // word offsets + blob
    int32_t off_acc = 0;
    for (auto& w : b.words) {
        w32(off_acc);
        off_acc += (int32_t)w.size();
    }
    w32(off_acc);
    char* blob = (char*)p;
    for (auto& w : b.words) {
        std::memcpy(blob, w.data(), w.size());
        blob += w.size();
    }
    std::memset(blob, 0, blob_padded - words_blob);
    p += blob_padded / 4;
    for (int32_t d : b.fallback_docs) w32(d);

    auto emit = [&](Postings& t, int key_cols,
                    void (*unpack)(int64_t, int32_t*)) {
        // deterministic order: sort keys (also gives the Python merge
        // locality on its dict lookups)
        std::vector<int64_t> keys;
        keys.reserve(t.size());
        for (auto& kv : t) keys.push_back(kv.first);
        std::sort(keys.begin(), keys.end());
        int32_t cols[4];
        for (int c = 0; c < key_cols; c++) {
            for (int64_t k : keys) {
                unpack(k, cols);
                w32(cols[c]);
            }
        }
        for (int64_t k : keys) w32((int64_t)t[k].size());
        for (int64_t k : keys)
            for (int32_t d : t[k]) w32(d);
    };

    emit(b.wd, 1, [](int64_t k, int32_t* c) { c[0] = (int32_t)k; });
    emit(b.wf, 2, [](int64_t k, int32_t* c) {
        c[0] = (int32_t)(k >> 20);
        c[1] = (int32_t)(k & 0xFFFFF);
    });
    emit(b.wp, 2, [](int64_t k, int32_t* c) {
        c[0] = (int32_t)(k >> 20);
        c[1] = (int32_t)(k & 0xFFFFF);
    });
    emit(b.pp, 3, [](int64_t k, int32_t* c) {
        c[0] = (int32_t)(k >> 48);
        c[1] = (int32_t)((k >> 24) & 0xFFFFFF);
        c[2] = (int32_t)(k & 0xFFFFFF);
    });
    emit(b.fc, 2, [](int64_t k, int32_t* c) {
        c[0] = (int32_t)(k >> 8);
        c[1] = (int32_t)(k & 0xFF);
    });

    *out_buf = buf;
    return (int64_t)((uint8_t*)p - buf);
}

void mstpu_free(uint8_t* ptr) { std::free(ptr); }

}  // extern "C"
