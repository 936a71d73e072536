// Native variant-annotation core (mirrors the vectorised numpy oracle in
// kir_graph_tpu/align/annotate.py:annotateArrays, which in turn fuses the
// reference's BAM round-trip CIGAR/MD/Zs parsing + positive/negative
// variant extraction, hisat2.py:279-515,716-800).
//
// Why native: the per-batch [reads, read_len] classification is pure host
// work; a C++ single pass with persistent arenas does it allocation-free,
// which keeps the product path immune to the host page-fault stalls that
// dominate allocation-heavy array code on virtualised hosts (and is ~10x
// faster than the numpy oracle even on a quiet machine).
//
// Contract (kgt_annotate): classify every mapped pair's mates, returning
//   - per-mate NM + per-pair pass flags
//   - per-mate positive variant lists (known SNPs by column, then known
//     deletions, then novel SNVs — the oracle's CSR order)
//   - per-mate negative variant lists (catalog span minus positives,
//     N-column SNPs and read-end deletions excluded)
//   - novel SNVs in first-occurrence order (global registration)
//   - depth/pileup over passing unique pairs (raw bases)
// All semantics (error correction, exon_only, thresholds) match the
// oracle bit-for-bit; tests/test_native_annotate.py asserts equality.

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// Worker-thread helpers.  Row work is fully independent in the
// parallelised passes (every write goes to a row-indexed or
// thread-indexed slot), so plain range splitting is safe.  KGT_THREADS
// overrides the thread count; small batches stay single-threaded
// (thread spawn ~50us).  KGT_MIN_ROWS lowers the small-batch cutoff so
// tests can force the threaded path on fixture-sized inputs.
unsigned threadCount(int64_t n) {
  unsigned hw = std::thread::hardware_concurrency();
  if (const char* env = std::getenv("KGT_THREADS")) {
    long v = std::strtol(env, nullptr, 10);
    if (v > 0) hw = (unsigned)v;
  }
  int64_t min_rows = 4096;
  if (const char* env = std::getenv("KGT_MIN_ROWS")) {
    long v = std::strtol(env, nullptr, 10);
    if (v > 0) min_rows = (int64_t)v;
  }
  unsigned T = hw ? (hw > 16 ? 16 : hw) : 1;
  return (T <= 1 || n < min_rows) ? 1 : T;
}

// Run fn(tid, lo, hi) over [0, n) split into T contiguous ranges.
template <typename F>
void runRanges(int64_t n, unsigned T, F fn) {
  if (T <= 1) { fn(0u, (int64_t)0, n); return; }
  std::vector<std::thread> ts;
  int64_t step = (n + T - 1) / T;
  for (unsigned t = 0; t < T; ++t) {
    int64_t lo = (int64_t)t * step, hi = lo + step < n ? lo + step : n;
    if (lo >= hi) break;
    ts.emplace_back(fn, t, lo, hi);
  }
  for (auto& th : ts) th.join();
}

template <typename F>
void parallelRows(int64_t n, F fn) {
  runRanges(n, threadCount(n),
            [&](unsigned, int64_t lo, int64_t hi) { fn(lo, hi); });
}

// Thread count for histogram passes: each extra thread costs a full
// O(hist_size) zero + reduce, so never use more threads than the actual
// increment work (~rows * RL) amortises.  KGT_MIN_ROWS (the test-only
// small-batch override) also bypasses the cap so fixture-sized batches
// exercise the threaded histogram path.
unsigned histThreadCount(int64_t rows, int64_t work, int64_t hist_size) {
  unsigned T = threadCount(rows);
  if (std::getenv("KGT_MIN_ROWS")) return T;
  int64_t cap = work / (hist_size > 0 ? hist_size : 1);
  if (cap < 1) cap = 1;
  if ((int64_t)T > cap) T = (unsigned)cap;
  return T;
}

struct Scratch {
  // per-row variable-size collections, reused across calls
  std::vector<std::vector<int64_t>> known;    // known SNP gidx (col order)
  std::vector<std::vector<int64_t>> dels;     // known deletion gidx
  std::vector<std::vector<int64_t>> novel;    // packed (col<<2)|base
  std::vector<std::vector<int32_t>> ncols;    // N-mismatch columns
  std::vector<std::vector<int64_t>> pos_row;  // per-row emitted positives
  std::vector<std::vector<int64_t>> neg_row;  // per-row emitted negatives
  std::vector<int32_t> nm, n_ins, left, right;
  std::vector<uint8_t> any_cons, overhang, ev_empty;
  std::unordered_map<int64_t, int64_t> novel_rank;
  std::vector<int64_t> novel_keys;
  std::vector<int32_t> ec_pileup;
  std::vector<int32_t> pileup_tl;  // per-thread pileup histograms

  void reset(size_t rows) {
    if (known.size() < rows) {
      known.resize(rows); dels.resize(rows);
      novel.resize(rows); ncols.resize(rows);
      pos_row.resize(rows); neg_row.resize(rows);
    }
    for (size_t r = 0; r < rows; ++r) {
      known[r].clear(); dels[r].clear(); novel[r].clear(); ncols[r].clear();
      pos_row[r].clear(); neg_row[r].clear();
    }
    nm.assign(rows, 0); n_ins.assign(rows, 0);
    left.assign(rows, 0); right.assign(rows, 0);
    any_cons.assign(rows, 0); overhang.assign(rows, 0);
    ev_empty.assign(rows, 0);
    novel_rank.clear();
    novel_keys.clear();
  }
};

// thread_local: the harness runs concurrent per-sample chains (ctypes
// releases the GIL), so every thread gets its own arenas
thread_local Scratch g_scratch;

inline int64_t delKey(int64_t g, int64_t p, int64_t l, int64_t span,
                      int64_t ml) {
  int64_t lc = l < ml - 1 ? l : ml - 1;
  return (g * span + p) * ml + lc;
}

inline int64_t delFind(const int64_t* keys, const int64_t* vals, int64_t nd,
                       int64_t key) {
  int64_t lo = 0, hi = nd;
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (keys[mid] < key) lo = mid + 1; else hi = mid;
  }
  return (lo < nd && keys[lo] == key) ? vals[lo] : -1;
}

}  // namespace

extern "C" {

// Returns 0 on success, or the required capacity (>0) when pos_cap /
// neg_cap / novel_cap is too small (caller re-allocates and retries).
long kgt_annotate(
    // dims / flags
    int64_t n_mapped, int32_t RL, int32_t Gt, int64_t Lmax, int64_t Vtot,
    int32_t num_editdist, int32_t exon_only, int32_t error_correction,
    // per-pair inputs ([N, RL] row-major full arrays + mapped indices)
    const int64_t* map_pairs,
    const int32_t* cols_l, const int8_t* bases_l, const int32_t* len_l,
    const int32_t* cols_r, const int8_t* bases_r, const int32_t* len_r,
    const int32_t* gene,  // [N] pair gene (valid at map_pairs)
    const int32_t* nh,    // [N]
    // catalog tables
    const int8_t* seq_g,          // [Gt, Lmax]
    const int32_t* snp_lookup,    // [Gt, Lmax, 4] global idx or -1
    const uint8_t* g_ignore,      // [Vtot]
    const uint8_t* g_in_exon,     // [Vtot]
    const uint8_t* g_is_del,      // [Vtot]
    const int64_t* g_pos,         // [Vtot]
    const int64_t* g_val,         // [Vtot] deletion length (SNPs: any)
    const int64_t* lo_at,         // [Gt, Lmax+2]
    const int64_t* hi_at,         // [Gt, Lmax+2]
    const int64_t* del_keys, const int64_t* del_vals, int64_t n_del_keys,
    int64_t del_span, int64_t del_maxlen,
    // outputs
    int32_t* nm_out,        // [2*n_mapped] mate-interleaved
    uint8_t* pass_out,      // [n_mapped]
    int64_t* pos_cnt,       // [2*n_mapped]
    int64_t* pos_vals, int64_t pos_cap,
    int64_t* neg_cnt,       // [2*n_mapped]
    int64_t* neg_vals, int64_t neg_cap,
    int64_t* novel_keys_out, int64_t novel_cap, int64_t* n_novel_out,
    int32_t* pileup_out     // [Gt, Lmax, 5], caller-zeroed
) {
  const int64_t rows = 2 * n_mapped;
  Scratch& S = g_scratch;
  S.reset(rows);

  auto rowPtr = [&](int64_t r, const int32_t** cp, const int8_t** bp,
                    int32_t* ln) {
    int64_t p = map_pairs[r / 2];
    if (r % 2 == 0) {
      *cp = cols_l + p * RL; *bp = bases_l + p * RL; *ln = len_l[p];
    } else {
      *cp = cols_r + p * RL; *bp = bases_r + p * RL; *ln = len_r[p];
    }
  };

  // --- optional error-correction pileup (all mapped pairs, raw bases;
  // oracle annotate.py:261-286)
  const int32_t* ec = nullptr;
  if (error_correction) {
    const int64_t HS = (int64_t)Gt * Lmax * 5;
    S.ec_pileup.assign((size_t)HS, 0);
    auto accum = [&](int64_t r_lo, int64_t r_hi, int32_t* hist) {
      for (int64_t r = r_lo; r < r_hi; ++r) {
        const int32_t* cp; const int8_t* bp; int32_t ln;
        rowPtr(r, &cp, &bp, &ln);
        int64_t g = gene[map_pairs[r / 2]];
        for (int32_t i = 0; i < ln; ++i) {
          if (cp[i] >= 0) {
            int8_t b = bp[i] < 4 ? bp[i] : 4;
            ++hist[(g * Lmax + cp[i]) * 5 + b];
          }
        }
      }
    };
    unsigned T = histThreadCount(rows, rows * (int64_t)RL, HS);
    if (T <= 1) {
      accum(0, rows, S.ec_pileup.data());
    } else {
      S.pileup_tl.assign((size_t)T * HS, 0);
      runRanges(rows, T, [&](unsigned tid, int64_t lo, int64_t hi) {
        accum(lo, hi, S.pileup_tl.data() + (int64_t)tid * HS);
      });
      runRanges(HS, T, [&](unsigned, int64_t lo, int64_t hi) {
        for (unsigned t = 0; t < T; ++t) {
          const int32_t* h = S.pileup_tl.data() + (int64_t)t * HS;
          for (int64_t i = lo; i < hi; ++i) S.ec_pileup[i] += h[i];
        }
      });
    }
    ec = S.ec_pileup.data();
  }

  // --- pass A: per-mate classification (parallel: every write below is
  // to a slot indexed by r)
  parallelRows(rows, [&](int64_t r_lo, int64_t r_hi) {
  for (int64_t r = r_lo; r < r_hi; ++r) {
    const int32_t* cp; const int8_t* bp; int32_t ln;
    rowPtr(r, &cp, &bp, &ln);
    const int64_t g = gene[map_pairs[r / 2]];
    const int8_t* seq = seq_g + g * Lmax;
    const int32_t* snp = snp_lookup + g * Lmax * 4;

    int32_t novel_snp = 0, n_pos = 0, ignored = 0, ins = 0;
    int64_t novel_del_len = 0;
    int32_t prev_col = -1, first = -1, last = -1;
    bool ovh = false;
    for (int32_t i = 0; i < ln; ++i) {
      int32_t c = cp[i];
      if (c == -2) { ++ins; continue; }
      if (c == -3) { ovh = true; continue; }
      if (c < 0) continue;
      if (first < 0) first = c;
      last = c;
      // deletion run between consecutive consumed columns
      if (prev_col >= 0 && c - prev_col - 1 > 0) {
        int64_t start0 = prev_col + 1, len = c - prev_col - 1;
        int64_t canon = start0;
        while (canon > 0 && seq[canon - 1] == seq[canon + len - 1]) --canon;
        int64_t d = delFind(del_keys, del_vals, n_del_keys,
                            delKey(g, canon, len, del_span, del_maxlen));
        if (d < 0)
          d = delFind(del_keys, del_vals, n_del_keys,
                      delKey(g, start0, len, del_span, del_maxlen));
        if (d >= 0) S.dels[r].push_back(d);
        else novel_del_len += len;
      }
      prev_col = c;
      int8_t b = bp[i];
      if (error_correction && b != seq[c] && b < 4) {
        const int32_t* cnt = ec + (g * Lmax + c) * 5;
        int32_t tot = cnt[0] + cnt[1] + cnt[2] + cnt[3];
        if (tot >= 20 && cnt[b] * 5 <= tot) {  // own <= 0.2
          int32_t maj = 0;
          for (int k = 1; k < 4; ++k) if (cnt[k] > cnt[maj]) maj = k;
          b = (cnt[maj] * 5 >= tot * 4) ? (int8_t)maj : (int8_t)4;  // >=0.8
        }
      }
      if (b >= 4) {
        // N base never equals an in-reference backbone code (0..3)
        ++n_pos;
        S.ncols[r].push_back(c);
        continue;
      }
      if (b == seq[c]) continue;
      int32_t gi = snp[c * 4 + b];
      if (gi >= 0) {
        S.known[r].push_back(gi);
        if (g_ignore[gi]) ++ignored;
      } else {
        ++novel_snp;
        S.novel[r].push_back(((int64_t)c << 2) | b);
      }
    }
    S.any_cons[r] = first >= 0;
    S.overhang[r] = ovh;
    S.n_ins[r] = ins;
    S.left[r] = first;
    S.right[r] = last + 1;
    int64_t nm = novel_snp + n_pos + ins + novel_del_len + ignored;
    if (first < 0) nm = 99;
    S.nm[r] = (int32_t)nm;
    S.ev_empty[r] = (ins > 0) || (novel_del_len > 0) || ovh;
    nm_out[r] = (int32_t)nm;
  }
  });
  for (int64_t p = 0; p < n_mapped; ++p)
    pass_out[p] =
        (S.nm[2 * p] <= num_editdist) && (S.nm[2 * p + 1] <= num_editdist);

  // --- pass B: novel registration (first occurrence, row-major over all
  // no-indel mates; oracle annotate.py:361-375) + emission
  int64_t pos_n = 0, neg_n = 0;
  long need = 0;
  for (int64_t r = 0; r < rows; ++r) {
    if (S.ev_empty[r]) { continue; }
    for (int64_t pk : S.novel[r]) {
      const int64_t g = gene[map_pairs[r / 2]];
      int64_t key = (g * Lmax + (pk >> 2)) * 4 + (pk & 3);
      if (!S.novel_rank.count(key)) {
        int64_t rank = (int64_t)S.novel_keys.size();
        S.novel_rank.emplace(key, rank);
        S.novel_keys.push_back(key);
      }
    }
  }
  *n_novel_out = (int64_t)S.novel_keys.size();
  if ((int64_t)S.novel_keys.size() > novel_cap)
    need = (long)S.novel_keys.size();
  else
    std::memcpy(novel_keys_out, S.novel_keys.data(),
                S.novel_keys.size() * sizeof(int64_t));

  // phase 1 (parallel): build each row's pos/neg lists into row-indexed
  // scratch (novel_rank is read-only from here on)
  parallelRows(rows, [&](int64_t r_lo, int64_t r_hi) {
  for (int64_t r = r_lo; r < r_hi; ++r) {
    bool pass_row = pass_out[r / 2] && !S.ev_empty[r];
    auto& prow = S.pos_row[r];
    auto& nrow = S.neg_row[r];
    // positives: known SNPs (col order), known dels, novel SNVs
    if (pass_row) {
      const int64_t g = gene[map_pairs[r / 2]];
      for (int64_t gi : S.known[r]) {
        if (exon_only && !g_in_exon[gi]) continue;
        prow.push_back(gi);
      }
      for (int64_t gi : S.dels[r]) {
        if (exon_only && !g_in_exon[gi]) continue;
        prow.push_back(gi);
      }
      if (!exon_only) {
        for (int64_t pk : S.novel[r]) {
          int64_t key = (g * Lmax + (pk >> 2)) * 4 + (pk & 3);
          prow.push_back(Vtot + S.novel_rank.find(key)->second);
        }
      }
    }
    // negatives: catalog span minus positives (oracle annotate.py:424-467)
    if (pass_row && S.any_cons[r]) {
      const int64_t g = gene[map_pairs[r / 2]];
      int64_t li = S.left[r]; if (li < 0) li = 0; if (li > Lmax + 1) li = Lmax + 1;
      int64_t ri = S.right[r]; if (ri < 0) ri = 0; if (ri > Lmax + 1) ri = Lmax + 1;
      int64_t lo = lo_at[g * (Lmax + 2) + li];
      int64_t hi = hi_at[g * (Lmax + 2) + ri];
      if (hi < lo) hi = lo;
      for (int64_t gi = lo; gi < hi; ++gi) {
        bool is_pos = false;
        for (int64_t k : S.known[r]) if (k == gi) { is_pos = true; break; }
        if (!is_pos)
          for (int64_t k : S.dels[r]) if (k == gi) { is_pos = true; break; }
        if (is_pos) continue;
        if (!g_is_del[gi]) {
          bool at_n = false;
          for (int32_t nc : S.ncols[r])
            if (nc == g_pos[gi]) { at_n = true; break; }
          if (at_n) continue;
        } else if (g_pos[gi] + g_val[gi] + 10 >= S.right[r]) {
          continue;
        }
        if (exon_only && !g_in_exon[gi]) continue;
        nrow.push_back(gi);
      }
    }
  }
  });
  // phase 2 (sequential): CSR counts + concatenation into the caller's
  // capacity-checked buffers (same need/retry contract as before)
  for (int64_t r = 0; r < rows; ++r) {
    const auto& prow = S.pos_row[r];
    const auto& nrow = S.neg_row[r];
    pos_cnt[r] = (int64_t)prow.size();
    neg_cnt[r] = (int64_t)nrow.size();
    if (pos_n + (int64_t)prow.size() <= pos_cap)
      std::memcpy(pos_vals + pos_n, prow.data(),
                  prow.size() * sizeof(int64_t));
    pos_n += (int64_t)prow.size();
    if (neg_n + (int64_t)nrow.size() <= neg_cap)
      std::memcpy(neg_vals + neg_n, nrow.data(),
                  nrow.size() * sizeof(int64_t));
    neg_n += (int64_t)nrow.size();
  }
  if (pos_n > pos_cap && pos_n > need) need = (long)pos_n;
  if (neg_n > neg_cap && neg_n > need) need = (long)neg_n;

  // --- depth/pileup over passing unique pairs (raw bases;
  // oracle annotate.py:472-480).  Parallel via per-thread histograms
  // (pair order never matters: counts are commutative), reduced in
  // parallel over the histogram span.
  {
    const int64_t HS = (int64_t)Gt * Lmax * 5;
    auto accum = [&](int64_t p_lo, int64_t p_hi, int32_t* hist) {
      for (int64_t p = p_lo; p < p_hi; ++p) {
        if (!pass_out[p] || nh[map_pairs[p]] != 1) continue;
        const int64_t g = gene[map_pairs[p]];
        for (int m = 0; m < 2; ++m) {
          const int32_t* cp; const int8_t* bp; int32_t ln;
          rowPtr(2 * p + m, &cp, &bp, &ln);
          for (int32_t i = 0; i < ln; ++i)
            if (cp[i] >= 0) {
              int8_t b = bp[i] < 4 ? bp[i] : 4;
              ++hist[(g * Lmax + cp[i]) * 5 + b];
            }
        }
      }
    };
    unsigned T = histThreadCount(
        2 * n_mapped, 2 * n_mapped * (int64_t)RL, HS);
    if (T <= 1) {
      accum(0, n_mapped, pileup_out);
    } else {
      S.pileup_tl.assign((size_t)T * HS, 0);
      runRanges(n_mapped, T, [&](unsigned tid, int64_t lo, int64_t hi) {
        accum(lo, hi, S.pileup_tl.data() + (int64_t)tid * HS);
      });
      runRanges(HS, T, [&](unsigned, int64_t lo, int64_t hi) {
        for (unsigned t = 0; t < T; ++t) {
          const int32_t* h = S.pileup_tl.data() + (int64_t)t * HS;
          for (int64_t i = lo; i < hi; ++i) pileup_out[i] += h[i];
        }
      });
    }
  }
  return need;
}

// Finalize traceback columns for winner jobs, mirroring the numpy passes
// in align/pipeline.py (easy-path synthesis, DP delta decode, the
// out-of-reference -3 marking, the pseudo-ref -> true-backbone shift and
// the scatter into the per-mate column buffers) in one threaded pass.
//
// Per job j: writes RL int32 columns into
//   (dest_which[j] ? dst1 : dst0) + dest_row[j] * RL.
// easy[j] != 0 -> pure-diagonal synthesis from w0+off; else decode the
// delta stream (delta<0 -> -1 pad, 0 -> -2 insertion, >0 -> advance).
// start_col/delta may be NULL when every job is easy.  delta rows are
// delta_stride elements apart (>= RL: the packed traceback download
// carries 2 trailer bytes per row).
void kgt_finalize_cols(
    int64_t n_jobs, int32_t RL, int64_t delta_stride,
    const uint8_t* easy,       // [n_jobs]
    const int32_t* gene,       // [n_jobs] pseudo-row ids (>= 0)
    const int32_t* w0,         // [n_jobs] window origin
    const int32_t* off,        // [n_jobs] diagonal end offset (easy path)
    const int32_t* lens,       // [n_jobs]
    const int32_t* start_col,  // [n_jobs] window coords (hard path)
    const int8_t* delta,       // [n_jobs, delta_stride] (hard path)
    const int64_t* glen,       // [G_rows] pseudo-row reference lengths
    const int64_t* row_pos,    // [G_rows] pseudo-ref junction position
    const int64_t* row_len,    // [G_rows] junction shift amount
    const int64_t* dest_row,   // [n_jobs]
    const uint8_t* dest_which, // [n_jobs] 0 -> dst0, 1 -> dst1
    int32_t* dst0, int32_t* dst1) {
  parallelRows(n_jobs, [&](int64_t j_lo, int64_t j_hi) {
    for (int64_t j = j_lo; j < j_hi; ++j) {
      int32_t* out = (dest_which[j] ? dst1 : dst0) + dest_row[j] * RL;
      const int64_t g = gene[j] >= 0 ? gene[j] : 0;  // defensive clamp
      //  (mapped winners always have gene >= 0; mirror the numpy
      //  fallback's np.clip rather than read out of bounds)
      const int64_t gl = glen[g];
      const int64_t rp = row_pos[g], shift = row_len[g];
      const int32_t ln = lens[j];
      if (easy[j]) {
        const int64_t base = (int64_t)w0[j] + off[j];
        for (int32_t i = 0; i < RL; ++i) {
          if (i >= ln) { out[i] = -1; continue; }
          int64_t c = base + i;
          if (c < 0 || c >= gl) { out[i] = -3; continue; }
          out[i] = (int32_t)(c >= rp ? c + shift : c);
        }
      } else {
        const int8_t* d = delta + j * delta_stride;
        int64_t c = (int64_t)start_col[j] - 1;
        for (int32_t i = 0; i < RL; ++i) {
          const int8_t dv = d[i];
          if (dv > 0) c += dv;
          if (dv < 0) { out[i] = -1; continue; }
          if (dv == 0) { out[i] = -2; continue; }
          if (c < 0) {  // negative non-marker cols pass through unshifted
            out[i] = (int32_t)c;
            continue;
          }
          const int64_t a = c + w0[j];
          if (a < 0 || a >= gl) { out[i] = -3; continue; }
          out[i] = (int32_t)(a >= rp ? a + shift : a);
        }
      }
    }
  });
}

// Build the aligner's fused upload buffer: both mates' codes nibble-
// packed (2 codes/byte, lossless for 0..15) plus a 2-byte little-endian
// length trailer per read — one threaded pass instead of numpy's
// concatenate + zero-init + shift/or chain.  L must be even.
// out is [2n, L/2 + 2] row-major: rows [0,n) = mate 1, [n,2n) = mate 2.
void kgt_pack_reads(
    int64_t n, int32_t L,
    const int8_t* c1, const int8_t* c2,    // [n, L] each
    const int32_t* l1, const int32_t* l2,  // [n] each
    uint8_t* out) {
  const int32_t H = L / 2, W = H + 2;
  parallelRows(2 * n, [&](int64_t r_lo, int64_t r_hi) {
    for (int64_t r = r_lo; r < r_hi; ++r) {
      const int8_t* src = r < n ? c1 + r * L : c2 + (r - n) * L;
      const int32_t len = r < n ? l1[r] : l2[r - n];
      uint8_t* o = out + r * W;
      for (int32_t i = 0; i < H; ++i)
        o[i] = (uint8_t)src[2 * i] | ((uint8_t)src[2 * i + 1] << 4);
      o[H] = (uint8_t)(len & 0xFF);
      o[H + 1] = (uint8_t)((len >> 8) & 0xFF);
    }
  });
}

// 2-bit variant of kgt_pack_reads: 4 codes/byte (code & 3, so N packs
// as 0) plus the same 2-byte length trailer, and a flat r*L+i exception
// index for every true N base (code 4) inside a read's length — the
// device restores those to code 4 with one scatter-add.  Threads append
// exceptions through an atomic cursor (order is irrelevant to the
// scatter); the return value is the TOTAL N count, which may exceed
// `eb` — the caller falls back to nibbles then.  L must be a multiple
// of 4.
int64_t kgt_pack_reads2(
    int64_t n, int32_t L,
    const int8_t* c1, const int8_t* c2,    // [n, L] each
    const int32_t* l1, const int32_t* l2,  // [n] each
    uint8_t* out,                          // [2n, L/4 + 2]
    int32_t* exc, int64_t eb) {
  const int32_t Q = L / 4, W = Q + 2;
  std::atomic<int64_t> cursor{0};
  parallelRows(2 * n, [&](int64_t r_lo, int64_t r_hi) {
    int32_t local[64];
    int32_t nloc = 0;
    auto flush = [&]() {
      if (!nloc) return;
      int64_t at = cursor.fetch_add(nloc);
      for (int32_t j = 0; j < nloc && at + j < eb; ++j)
        exc[at + j] = local[j];
      nloc = 0;
    };
    for (int64_t r = r_lo; r < r_hi; ++r) {
      const int8_t* src = r < n ? c1 + r * L : c2 + (r - n) * L;
      const int32_t len = r < n ? l1[r] : l2[r - n];
      uint8_t* o = out + r * W;
      for (int32_t i = 0; i < Q; ++i) {
        const int8_t* s = src + 4 * i;
        o[i] = (uint8_t)((s[0] & 3) | ((s[1] & 3) << 2) |
                         ((s[2] & 3) << 4) | ((s[3] & 3) << 6));
      }
      o[Q] = (uint8_t)(len & 0xFF);
      o[Q + 1] = (uint8_t)((len >> 8) & 0xFF);
      for (int32_t i = 0; i < len; ++i)
        if (src[i] == 4) {
          if (nloc == 64) flush();
          local[nloc++] = (int32_t)(r * (int64_t)L + i);
        }
    }
    flush();
  });
  return cursor.load();
}

// Winner-oriented read buffer: out[r] = flags[r] ? revcomp(codes[r])
// : codes[r], pad (code 4) kept at the row tail — one threaded pass
// replacing numpy's full-buffer copy + fancy-indexed revcomp on the
// rc-winning rows (alignPairs' orient_bufs segment).
void kgt_orient_rows(
    int64_t n, int32_t L,
    const int8_t* codes,   // [n, L]
    const int32_t* lens,   // [n]
    const uint8_t* flags,  // [n] 1 -> reverse-complement the row
    int8_t* out) {         // [n, L]
  parallelRows(n, [&](int64_t r_lo, int64_t r_hi) {
    for (int64_t r = r_lo; r < r_hi; ++r) {
      const int8_t* src = codes + (int64_t)r * L;
      int8_t* dst = out + (int64_t)r * L;
      if (!flags[r]) {
        std::memcpy(dst, src, (size_t)L);
        continue;
      }
      const int32_t ln = lens[r];
      for (int32_t i = 0; i < ln; ++i) {
        const int8_t c = src[ln - 1 - i];
        dst[i] = c < 4 ? (int8_t)(3 - c) : c;
      }
      for (int32_t i = ln; i < L; ++i) dst[i] = 4;
    }
  });
}

}  // extern "C"
