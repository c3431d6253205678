// Native host runtime for verbatim-rag-tpu.
//
// The TPU owns all scoring math; these are the host-side hot loops that feed
// it (SURVEY.md §2.8 — the reference outsources this work to Milvus's C++):
//
//   project_rows   SpMM sketching of forward-index rows against the random
//                  projection matrix (the ingest-time hot loop of the
//                  projected sparse path; ~nnz·d_p·4B of memory traffic).
//   exact_rescore  exact sparse scores for (query, candidate) pairs — the
//                  query-time host hot loop of the projected path.
//   analyze_text   BM25 analyzer: lowercase word tokenization + FNV-1a
//                  hashing into a fixed vocab (ingest-time, replaces a
//                  Python regex + blake2 loop).
//
// Plain C ABI for ctypes; no Python headers needed.

#include <cstdint>
#include <cstring>
#include <cctype>
#include <algorithm>

extern "C" {

// out[n, d] = sum_j w[n, j] * P[ids[n, j], d]
void project_rows(const int32_t* ids, const float* w, int64_t n, int64_t m,
                  const float* P, int64_t V, int64_t d, float* out) {
    for (int64_t i = 0; i < n; ++i) {
        float* acc = out + i * d;
        std::memset(acc, 0, sizeof(float) * d);
        const int32_t* row_ids = ids + i * m;
        const float* row_w = w + i * m;
        for (int64_t j = 0; j < m; ++j) {
            const float weight = row_w[j];
            if (weight == 0.0f) continue;
            const int32_t t = row_ids[j];
            if (t < 0 || t >= V) continue;
            const float* p_row = P + (int64_t)t * d;
            // Compilers vectorize this loop (contiguous fma).
            for (int64_t k = 0; k < d; ++k) acc[k] += weight * p_row[k];
        }
    }
}

// scores[b, c] = sum_j w[rows[b,c], j] * q[b, ids[rows[b,c], j]]
// rows may contain -1 (missing candidate) -> score = -inf.
void exact_rescore(const int64_t* rows, int64_t B, int64_t C,
                   const int32_t* ids, const float* w, int64_t n, int64_t m,
                   const float* q, int64_t V, float* scores) {
    const float neg_inf = -3.0e38f;
    for (int64_t b = 0; b < B; ++b) {
        const float* qb = q + b * V;
        for (int64_t c = 0; c < C; ++c) {
            const int64_t row = rows[b * C + c];
            if (row < 0 || row >= n) { scores[b * C + c] = neg_inf; continue; }
            const int32_t* row_ids = ids + row * m;
            const float* row_w = w + row * m;
            float acc = 0.0f;
            for (int64_t j = 0; j < m; ++j) {
                const float weight = row_w[j];
                if (weight != 0.0f) acc += weight * qb[row_ids[j]];
            }
            scores[b * C + c] = acc;
        }
    }
}

static inline uint32_t fnv1a(const char* s, int len) {
    uint32_t h = 2166136261u;
    for (int i = 0; i < len; ++i) { h ^= (uint8_t)s[i]; h *= 16777619u; }
    return h;
}

// Tokenize [a-z0-9]+ runs of `text` (ASCII lowercased), hash each token into
// [1, vocab), and accumulate term frequencies into the caller's buffers.
// Returns document length (token count). term_ids/term_tfs must have
// capacity max_terms; the number of unique terms is written to *n_terms.
// Hashing matches HashTokenizer-style slot layout: slot 0 reserved for pad.
int64_t analyze_text(const char* text, int64_t text_len, int64_t vocab,
                     int32_t* term_ids, int32_t* term_tfs, int64_t max_terms,
                     int64_t* n_terms) {
    int64_t dl = 0;
    int64_t unique = 0;
    int64_t i = 0;
    char buf[256];
    while (i < text_len) {
        char c = (char)std::tolower((unsigned char)text[i]);
        if (!std::isalnum((unsigned char)c)) { ++i; continue; }
        int len = 0;
        while (i < text_len) {
            c = (char)std::tolower((unsigned char)text[i]);
            if (!std::isalnum((unsigned char)c)) break;
            if (len < (int)sizeof(buf)) buf[len++] = c;
            ++i;
        }
        ++dl;
        const int32_t slot = (int32_t)(fnv1a(buf, len) % (uint32_t)(vocab - 1)) + 1;
        // Linear probe over the collected terms (docs have few uniques).
        bool found = false;
        for (int64_t t = 0; t < unique; ++t) {
            if (term_ids[t] == slot) { ++term_tfs[t]; found = true; break; }
        }
        if (!found && unique < max_terms) {
            term_ids[unique] = slot;
            term_tfs[unique] = 1;
            ++unique;
        }
    }
    *n_terms = unique;
    return dl;
}

}  // extern "C"
