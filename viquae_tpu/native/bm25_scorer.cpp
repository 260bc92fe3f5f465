// Native BM25 batch scorer — the sparse-retrieval hot loop.
//
// Role: the reference's sparse path runs inside Elasticsearch/Lucene (Java
// native, meerqat/ir/search.py:268-293). This framework's in-repo BM25
// (viquae_tpu/ops/bm25.py) scores with vectorized numpy; this C++ core
// replaces the per-term scatter-accumulate + top-k with a single pass over
// CSR postings using a touched-docs accumulator and a bounded partial sort,
// matching Lucene's BM25Similarity math bit-for-bit with the Python path:
//     idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))
//     s(t,d) = idf(t) * qtf * tf / (tf + k1 * (1 - b + b * dl/avgdl))
// Ties break by ascending doc id (the framework's FAISS-flat contract).
//
// Built by viquae_tpu/native/build.py (g++ -O3 -shared), loaded via ctypes.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Score one query against the index.
//   offsets[v], docs[nnz], tfs[nnz]: postings CSR grouped by term
//   idf[v]: per-term idf; norm[d]: k1 * (1 - b + b * dl/avgdl) per doc
//   query_terms/query_tfs[q_len]: the query's term ids + repetition counts
//   out_scores/out_indices[k]: top-k results (score desc, ties by doc asc)
// Returns the number of hits written (<= k).
int32_t bm25_score_query(
    const int64_t* offsets,
    const int32_t* docs,
    const float* tfs,
    const float* idf,
    const float* norm,
    int64_t n_docs,
    const int32_t* query_terms,
    const float* query_tfs,
    int64_t q_len,
    int32_t k,
    float* accumulator,       // caller-provided (n_docs) scratch, zeroed
    int32_t* touched,         // caller-provided (n_docs) scratch
    float* out_scores,
    int32_t* out_indices) {
  int64_t n_touched = 0;
  for (int64_t t = 0; t < q_len; ++t) {
    const int32_t term = query_terms[t];
    const float term_idf = idf[term] * query_tfs[t];
    const int64_t lo = offsets[term];
    const int64_t hi = offsets[term + 1];
    for (int64_t p = lo; p < hi; ++p) {
      const int32_t d = docs[p];
      const float tf = tfs[p];
      if (accumulator[d] == 0.0f) {
        touched[n_touched++] = d;
      }
      accumulator[d] += term_idf * tf / (tf + norm[d]);
    }
  }
  // exact top-k over touched docs: nth_element + sort, ties by doc id asc
  auto better = [&](int32_t a, int32_t b) {
    const float sa = accumulator[a];
    const float sb = accumulator[b];
    if (sa != sb) return sa > sb;
    return a < b;
  };
  const int64_t keep = std::min<int64_t>(k, n_touched);
  if (keep > 0 && keep < n_touched) {
    std::nth_element(touched, touched + keep, touched + n_touched, better);
  }
  std::sort(touched, touched + keep, better);
  int32_t written = 0;
  for (int64_t i = 0; i < keep; ++i) {
    const int32_t d = touched[i];
    if (accumulator[d] <= 0.0f) break;  // drop zero/negative (not retrieved)
    out_scores[written] = accumulator[d];
    out_indices[written] = d;
    ++written;
  }
  // reset only the touched entries for the next query
  for (int64_t i = 0; i < n_touched; ++i) {
    accumulator[touched[i]] = 0.0f;
  }
  return written;
}

// Batch driver: queries flattened CSR-style via query_offsets.
void bm25_score_batch(
    const int64_t* offsets,
    const int32_t* docs,
    const float* tfs,
    const float* idf,
    const float* norm,
    int64_t n_docs,
    const int32_t* query_terms,
    const float* query_tfs,
    const int64_t* query_offsets,
    int64_t n_queries,
    int32_t k,
    float* out_scores,     // (n_queries, k)
    int32_t* out_indices,  // (n_queries, k)
    int32_t* out_counts) { // (n_queries,)
  std::vector<float> accumulator(static_cast<size_t>(n_docs), 0.0f);
  std::vector<int32_t> touched(static_cast<size_t>(n_docs));
  for (int64_t q = 0; q < n_queries; ++q) {
    const int64_t lo = query_offsets[q];
    const int64_t hi = query_offsets[q + 1];
    out_counts[q] = bm25_score_query(
        offsets, docs, tfs, idf, norm, n_docs,
        query_terms + lo, query_tfs + lo, hi - lo, k,
        accumulator.data(), touched.data(),
        out_scores + q * k, out_indices + q * k);
  }
}

}  // extern "C"
