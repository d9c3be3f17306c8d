// Single-core timed oracle of the reference MCHap inner loops.
//
// Role: an honest "numba-class" CPU baseline for bench.py.  numba is not
// available in this image, so the reference cannot be timed directly;
// -O3 C++ of the same loops is the same performance class as numba's
// LLVM output (both compile the identical scalar float loops).
//
// Faithfully reproduced from the reference (operation counts and memory
// access patterns — the quantities that determine throughput):
//  * log_likelihood triple loop over reads x ploidy x positions with a
//    mean over haplotypes and count-weighted log-sum over reads
//    (mchap/assemble/likelihood.py:17-70).
//  * genotype-keyed log-likelihood cache, hit = hash lookup
//    (mchap/assemble/arraymap.py, mchap/calling/likelihood.py:36-78; the
//    reference enables both by default at bench shapes).
//  * de novo compound step = shuffled mutation sweep scoring every
//    alternative allele per (haplotype, position) site, recombination +
//    partial dosage interval sweeps (p=0.5 each) enumerating the C(P,2)
//    pair / P(P-1) ordered-pair option tables, and a full-length dosage
//    step (mchap/assemble/mutation.py:164-246, structural.py:433-673,
//    mcmc.py:268-426).  MH bookkeeping is simplified where it does not
//    change operation counts (acceptance ratios still computed).
//  * calling Gibbs compound step = shuffled ploidy slots, scoring ALL
//    panel alleles per slot through the cached likelihood
//    (mchap/calling/mcmc.py:143-327).
//
// Output: one JSON line with single-core compound steps/s for both
// samplers.  bench.py multiplies by the reference deployment's core
// count (64) to form the published baseline.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <chrono>
#include <random>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

std::mt19937_64 rng(42);

double urand() {
  return std::uniform_real_distribution<double>(0.0, 1.0)(rng);
}

// ---------------------------------------------------------------- denovo

struct Denovo {
  int R, P, NB, A;
  std::vector<double> reads;           // [R, NB, A]
  std::vector<int8_t> genotype;        // [P, NB]
  std::vector<double> read_counts;     // [R]
  std::unordered_map<std::string, double> cache;
  long long llk_evals = 0, cache_hits = 0;

  double read_p(int r, int j, int a) const {
    return reads[(r * NB + j) * A + a];
  }

  // reference assemble/likelihood.py:17-70
  double log_likelihood() const {
    double llk = 0.0;
    for (int r = 0; r < R; ++r) {
      double pread = 0.0;
      for (int k = 0; k < P; ++k) {
        double p = 1.0;
        const int8_t* hap = &genotype[k * NB];
        for (int j = 0; j < NB; ++j) p *= read_p(r, j, hap[j]);
        pread += p;
      }
      llk += read_counts[r] * std::log(pread / P);
    }
    return llk;
  }

  // reference likelihood cache (arraymap): genotype bytes -> llk
  double llk_cached() {
    std::string key(reinterpret_cast<const char*>(genotype.data()),
                    genotype.size());
    auto it = cache.find(key);
    if (it != cache.end()) {
      ++cache_hits;
      return it->second;
    }
    ++llk_evals;
    double v = log_likelihood();
    if (cache.size() > (1u << 16)) cache.clear();  // arraymap self-empty
    cache.emplace(std::move(key), v);
    return v;
  }

  // mutation.compound_step: shuffled sweep over P*NB sites, scoring
  // every alternative allele (mutation.py:14-246)
  double mutation_sweep(double llk) {
    std::vector<int> order(P * NB);
    for (int i = 0; i < P * NB; ++i) order[i] = i;
    std::shuffle(order.begin(), order.end(), rng);
    for (int site : order) {
      int h = site / NB, j = site % NB;
      int cur = genotype[h * NB + j];
      int n_options = A - 1;
      double best_llk = llk;
      int choice = cur;
      double total_accept = 0.0;
      for (int a = 0; a < A; ++a) {
        if (a == cur) continue;
        genotype[h * NB + j] = (int8_t)a;
        double llk_a = llk_cached();
        double accept =
            std::min(1.0, std::exp(llk_a - llk)) / std::max(n_options, 1);
        total_accept += accept;
        if (urand() < accept) {  // inverse-CDF over options (simplified)
          choice = a;
          best_llk = llk_a;
          break;
        }
      }
      genotype[h * NB + j] = (int8_t)choice;
      llk = best_llk;
      (void)total_accept;
    }
    return llk;
  }

  // structural interval step: enumerate option table, score each option
  // via the interval-restricted likelihood ratio (structural.py:433-587;
  // cost model: each option's llk goes through the cache)
  double interval_step(double llk, int start, int end, bool dosage_step) {
    int n_pairs = dosage_step ? P * (P - 1) : P * (P - 1) / 2;
    std::vector<int8_t> saved(genotype);
    double best = llk;
    int accepted = -1;
    for (int opt = 0; opt < n_pairs; ++opt) {
      int h0, h1;
      if (dosage_step) {
        h0 = opt / (P - 1);
        h1 = opt % (P - 1);
        if (h1 >= h0) ++h1;
      } else {
        // unrank the C(P,2) pair
        int c = opt, i = 0;
        while (c >= P - 1 - i) { c -= P - 1 - i; ++i; }
        h0 = i;
        h1 = i + 1 + c;
      }
      // validity: segments must differ (labels; structural.py:121-307)
      bool differ = false;
      for (int j = start; j < end; ++j)
        if (saved[h0 * NB + j] != saved[h1 * NB + j]) { differ = true; break; }
      if (!differ) continue;
      // apply option: swap (recombination) or overwrite (dosage)
      for (int j = start; j < end; ++j) {
        if (dosage_step) {
          genotype[h0 * NB + j] = saved[h1 * NB + j];
        } else {
          genotype[h0 * NB + j] = saved[h1 * NB + j];
          genotype[h1 * NB + j] = saved[h0 * NB + j];
        }
      }
      double llk_o = llk_cached();
      double accept = std::min(1.0, std::exp(llk_o - llk)) / n_pairs;
      if (urand() < accept) {
        accepted = opt;
        best = llk_o;
        break;
      }
      std::memcpy(genotype.data(), saved.data(), genotype.size());
    }
    if (accepted < 0) std::memcpy(genotype.data(), saved.data(), genotype.size());
    return best;
  }

  double structural_sweep(double llk, bool dosage_step) {
    // random interval partition; break count ~ discretized Beta(1,3)
    // (mcmc.py:211-217, structural.py:22-71)
    int n_breaks = (int)(std::pow(urand(), 1.0 / 3.0) * 0 + urand() * (NB / 4));
    std::vector<int> points;
    points.push_back(0);
    for (int b = 0; b < n_breaks; ++b)
      points.push_back(1 + (int)(urand() * (NB - 1)));
    points.push_back(NB);
    std::sort(points.begin(), points.end());
    for (size_t i = 0; i + 1 < points.size(); ++i)
      if (points[i] < points[i + 1])
        llk = interval_step(llk, points[i], points[i + 1], dosage_step);
    return llk;
  }

  double compound_step(double llk) {
    llk = mutation_sweep(llk);
    if (urand() < 0.5) llk = structural_sweep(llk, false);  // recombination
    if (urand() < 0.5) llk = structural_sweep(llk, true);   // partial dosage
    llk = interval_step(llk, 0, NB, true);                  // full dosage
    return llk;
  }
};

// ---------------------------------------------------------------- calling

struct Calling {
  int R, P, NB, A, H;
  std::vector<double> reads;       // [R, NB, A]
  std::vector<int8_t> haplotypes;  // [H, NB]
  std::vector<int> genotype;       // [P] sorted panel indices
  std::vector<double> read_counts;
  std::unordered_map<int64_t, double> cache;
  long long llk_evals = 0, cache_hits = 0;

  double read_p(int r, int j, int a) const {
    return reads[(r * NB + j) * A + a];
  }

  // assemble/likelihood.py:17-70 applied to gathered panel haplotypes
  double log_likelihood() const {
    double llk = 0.0;
    for (int r = 0; r < R; ++r) {
      double pread = 0.0;
      for (int k = 0; k < P; ++k) {
        double p = 1.0;
        const int8_t* hap = &haplotypes[genotype[k] * NB];
        for (int j = 0; j < NB; ++j) p *= read_p(r, j, hap[j]);
        pread += p;
      }
      llk += read_counts[r] * std::log(pread / P);
    }
    return llk;
  }

  // calling/likelihood.py:36-78: dict cache keyed by the VCF genotype
  // index (combinadic over sorted alleles, jitutils.py:253-276)
  int64_t genotype_index() const {
    std::vector<int> sorted(genotype);
    std::sort(sorted.begin(), sorted.end());
    int64_t idx = 0;
    for (int i = 0; i < P; ++i) {
      // comb(a + i, i + 1)
      int64_t n = sorted[i] + i, k = i + 1, c = 1;
      for (int64_t d = 1; d <= k; ++d) c = c * (n - k + d) / d;
      idx += c;
    }
    return idx;
  }

  double llk_cached() {
    int64_t key = genotype_index();
    auto it = cache.find(key);
    if (it != cache.end()) {
      ++cache_hits;
      return it->second;
    }
    ++llk_evals;
    double v = log_likelihood();
    cache.emplace(key, v);
    return v;
  }

  // calling/mcmc.py:232-327 Gibbs compound step: shuffled slots, score
  // all H panel alleles per slot, categorical draw from the posterior
  double compound_step(double llk) {
    std::vector<int> slots(P);
    for (int i = 0; i < P; ++i) slots[i] = i;
    std::shuffle(slots.begin(), slots.end(), rng);
    std::vector<double> llks(H);
    for (int slot : slots) {
      int cur = genotype[slot];
      double mx = -1e300;
      for (int a = 0; a < H; ++a) {
        genotype[slot] = a;
        llks[a] = llk_cached();
        if (llks[a] > mx) mx = llks[a];
      }
      double z = 0.0;
      for (int a = 0; a < H; ++a) z += std::exp(llks[a] - mx);
      double u = urand() * z, acc = 0.0;
      int choice = cur;
      for (int a = 0; a < H; ++a) {
        acc += std::exp(llks[a] - mx);
        if (u <= acc) { choice = a; break; }
      }
      genotype[slot] = choice;
      llk = llks[choice];
    }
    return llk;
  }
};

// ---------------------------------------------------------------- pedigree
//
// Single-core oracle of the reference's joint pedigree Gibbs sampler
// (mchap/pedigree/mcmc.py:658-814): per compound step, a shuffled sweep
// over samples x allele slots where every panel allele is scored as
// llk_cached + markov-blanket prior; the blanket evaluates the sample's
// own trio pmf plus one trio pmf per child (mchap/pedigree/prior.py:
// 484-722 trio_log_pmf — the gamete-dosage-split enumeration via
// set_initial_dosage/increment_dosage with the four-way parental-error
// mixture), then the parental-pair allele-swap MH move (mcmc.py:503-655).
// Simplification in the oracle's favor (baseline runs FASTER than the
// reference, understating our ratio): the target sample's own term uses
// trio_log_pmf rather than trio_allele_log_pmf, which does ~3x the pmf
// evaluations per dosage split (prior.py:956-1297).

struct Pedigree {
  int R, P, NB, A, H, S, tau;
  double lam = 0.0, err = 0.1;
  std::vector<double> reads;        // [S, R, NB, A]
  std::vector<int8_t> haplotypes;   // [H, NB]
  std::vector<int> genotypes;       // [S, P]
  std::vector<double> read_counts;  // [S, R]
  std::vector<int> parents;         // [S, 2], -1 = unknown
  std::vector<std::vector<int>> children;  // per sample
  std::vector<double> log_freqs;    // [H]
  std::unordered_map<int64_t, double> cache;
  long long llk_evals = 0, cache_hits = 0, trio_evals = 0;

  double read_p(int s, int r, int j, int a) const {
    return reads[(((size_t)s * R + r) * NB + j) * A + a];
  }

  double log_likelihood(int s) const {
    double llk = 0.0;
    const int* g = &genotypes[s * P];
    for (int r = 0; r < R; ++r) {
      double pread = 0.0;
      for (int k = 0; k < P; ++k) {
        double p = 1.0;
        const int8_t* hap = &haplotypes[g[k] * NB];
        for (int j = 0; j < NB; ++j) p *= read_p(s, r, j, hap[j]);
        pread += p;
      }
      llk += read_counts[(size_t)s * R + r] * std::log(pread / P);
    }
    return llk;
  }

  // pedigree/likelihood.py:8-56: cache keyed by (sample, genotype index)
  double llk_cached(int s) {
    std::vector<int> sorted(genotypes.begin() + s * P,
                            genotypes.begin() + (s + 1) * P);
    std::sort(sorted.begin(), sorted.end());
    int64_t idx = 0;
    for (int i = 0; i < P; ++i) {
      int64_t n = sorted[i] + i, k = i + 1, c = 1;
      for (int64_t d = 1; d <= k; ++d) c = c * (n - k + d) / d;
      idx += c;
    }
    int64_t key = (int64_t)s * 1000000 + idx;
    auto it = cache.find(key);
    if (it != cache.end()) { ++cache_hits; return it->second; }
    ++llk_evals;
    double v = log_likelihood(s);
    cache.emplace(key, v);
    return v;
  }

  static double add_log(double x, double y) {
    if (x == -1e300) return y;
    if (y == -1e300) return x;
    double m = std::max(x, y);
    return m + std::log(std::exp(x - m) + std::exp(y - m));
  }

  static int64_t comb_ii(int n, int k) {
    if (k < 0 || k > n) return 0;
    int64_t c = 1;
    for (int d = 1; d <= k; ++d) c = c * (n - k + d) / d;
    return c;
  }

  // prior.py:170-202 / 297-326
  static int64_t dosage_permutations(const int* gd, const int* pd, int n) {
    int64_t c = 1;
    for (int i = 0; i < n; ++i) c *= comb_ii(pd[i], gd[i]);
    return c;
  }
  static int64_t dr_permutations(const int* gd, const int* pd, int n) {
    int64_t out = 0;
    for (int i = 0; i < n; ++i) {
      if (gd[i] == 2) out = pd[i];
      else if (gd[i] != 0) return 0;
    }
    return out;
  }

  // prior.py:329-373
  double gamete_log_pmf(const int* gd, int gploidy, const int* pd,
                        int pploidy, double glam) const {
    double prob =
        (double)dosage_permutations(gd, pd, P) / comb_ii(pploidy, gploidy);
    prob *= (1.0 - glam);
    if (glam > 0.0) prob += (double)dr_permutations(gd, pd, P) / pploidy * glam;
    return prob == 0.0 ? -1e300 : std::log(prob);
  }

  // prior.py:116-138 (multinomial unknown-origin prior)
  double log_unknown_dosage_prior(const int* dose, const double* dlf) const {
    int total = 0;
    double lperms = 0.0, lfreq = 0.0;
    for (int i = 0; i < P; ++i) total += dose[i];
    lperms = std::lgamma(total + 1.0);
    for (int i = 0; i < P; ++i)
      if (dose[i] > 0) {
        lperms -= std::lgamma(dose[i] + 1.0);
        lfreq += dlf[i] * dose[i];
      }
    return lperms + lfreq;
  }

  // prior.py:205-294
  static void set_initial_dosage(int ploidy, const int* constraint, int* out,
                                 int n) {
    for (int i = 0; i < n; ++i) {
      int count = std::min(ploidy, constraint[i]);
      out[i] = count;
      ploidy -= count;
    }
  }
  static bool increment_dosage(int* dosage, const int* constraint, int n) {
    int i = n - 1, change = 0;
    while (dosage[i] == 0) --i;
    dosage[i] -= 1;
    change += 1;
    int j = i + 1;
    while (j < n && change > 0) {
      if (dosage[j] < constraint[j]) { dosage[j] += 1; change -= 1; }
      ++j;
    }
    if (change > 0) {
      change += dosage[i];
      dosage[i] = 0;
      int space = constraint[i];
      while (true) {
        --i;
        if (i < 0) return false;  // final dosage
        if (dosage[i] > 0 && space > change) {
          dosage[i] -= 1;
          change += 1;
          break;
        }
        space += constraint[i];
        change += dosage[i];
        dosage[i] = 0;
      }
      j = i + 1;
      while (change > 0) {
        int value = std::min(constraint[j] - dosage[j], change);
        dosage[j] += value;
        change -= value;
        ++j;
      }
    }
    return true;
  }

  // prior.py:484-722 (four-way parental-error mixture over gamete splits)
  double trio_log_pmf(int s) {
    ++trio_evals;
    const int* prog = &genotypes[s * P];
    int pi = parents[s * 2], qi = parents[s * 2 + 1];
    int dosage[8], dosage_p[8], dosage_q[8];
    int constraint_p[8], constraint_q[8], gam_p[8], gam_q[8];
    double dlf[8];
    for (int i = 0; i < P; ++i) {
      dosage[i] = 0;
      dlf[i] = log_freqs[prog[i]];
    }
    for (int i = 0; i < P; ++i)
      for (int j = 0; j <= i; ++j)
        if (prog[j] == prog[i]) { dosage[j] += 1; break; }
    auto parental_copies = [&](int parent, int* out) {
      for (int i = 0; i < P; ++i) out[i] = 0;
      if (parent < 0) return;
      const int* par = &genotypes[parent * P];
      for (int i = 0; i < P; ++i)
        for (int j = 0; j < P; ++j)
          if (par[i] == prog[j]) { out[j] += 1; break; }
    };
    parental_copies(pi, dosage_p);
    parental_copies(qi, dosage_q);
    for (int i = 0; i < P; ++i) {
      constraint_p[i] = std::min(dosage[i], dosage_p[i]);
      constraint_q[i] = std::min(dosage[i], dosage_q[i]);
    }
    if (lam > 0.0)
      for (int i = 0; i < P; ++i) {
        if (dosage[i] >= 2 && constraint_p[i] == 1) constraint_p[i] = 2;
        if (dosage[i] >= 2 && constraint_q[i] == 1) constraint_q[i] = 2;
      }
    double error_p = pi < 0 ? 1.0 : err, error_q = qi < 0 ? 1.0 : err;
    double lerr_p = std::log(error_p), lerr_q = std::log(error_q);
    double lcor_p = error_p < 1.0 ? std::log(1 - error_p) : -1e300;
    double lcor_q = error_q < 1.0 ? std::log(1 - error_q) : -1e300;
    int sum_p = 0, sum_q = 0;
    for (int i = 0; i < P; ++i) { sum_p += constraint_p[i]; sum_q += constraint_q[i]; }
    bool valid_p = sum_p >= tau && tau > 0 && error_p < 1.0;
    bool valid_q = sum_q >= tau && tau > 0 && error_q < 1.0;
    double lprob = -1e300;
    if (valid_p && valid_q) {
      set_initial_dosage(tau, constraint_p, gam_p, P);
      for (int i = 0; i < P; ++i) gam_q[i] = dosage[i] - gam_p[i];
      while (true) {
        double lp = gamete_log_pmf(gam_p, tau, dosage_p, P, lam) + lcor_p;
        double lq = gamete_log_pmf(gam_q, tau, dosage_q, P, lam) + lcor_q;
        lprob = add_log(lprob, lp + lq);
        // p-valid, q-error leg rides the same gamete enumeration
        double lq_err = log_unknown_dosage_prior(gam_q, dlf) + lerr_q;
        lprob = add_log(lprob, lp + lq_err);
        if (!increment_dosage(gam_p, constraint_p, P)) break;
        for (int i = 0; i < P; ++i) gam_q[i] = dosage[i] - gam_p[i];
      }
    } else if (valid_p) {
      set_initial_dosage(tau, constraint_p, gam_p, P);
      for (int i = 0; i < P; ++i) gam_q[i] = dosage[i] - gam_p[i];
      while (true) {
        double lp = gamete_log_pmf(gam_p, tau, dosage_p, P, lam) + lcor_p;
        double lq_err = log_unknown_dosage_prior(gam_q, dlf) + lerr_q;
        lprob = add_log(lprob, lp + lq_err);
        if (!increment_dosage(gam_p, constraint_p, P)) break;
        for (int i = 0; i < P; ++i) gam_q[i] = dosage[i] - gam_p[i];
      }
    }
    if (valid_q) {
      set_initial_dosage(tau, constraint_q, gam_q, P);
      for (int i = 0; i < P; ++i) gam_p[i] = dosage[i] - gam_q[i];
      while (true) {
        double lp_err = log_unknown_dosage_prior(gam_p, dlf) + lerr_p;
        double lq = gamete_log_pmf(gam_q, tau, dosage_q, P, lam) + lcor_q;
        lprob = add_log(lprob, lp_err + lq);
        if (!increment_dosage(gam_q, constraint_q, P)) break;
        for (int i = 0; i < P; ++i) gam_p[i] = dosage[i] - gam_q[i];
      }
    }
    lprob = add_log(lprob, log_unknown_dosage_prior(dosage, dlf) + lerr_p + lerr_q);
    return lprob;
  }

  // mcmc.py:1300-1454 markov blanket: own trio + one trio per child
  double blanket(int s) {
    double l = trio_log_pmf(s);
    for (int c : children[s]) l += trio_log_pmf(c);
    return l;
  }

  // mcmc.py:145-304 Gibbs slot update scoring every panel allele
  void gibbs_slot(int s, int slot) {
    int cur = genotypes[s * P + slot];
    std::vector<double> scores(H);
    double mx = -1e300;
    for (int a = 0; a < H; ++a) {
      genotypes[s * P + slot] = a;
      scores[a] = llk_cached(s) + blanket(s);
      if (scores[a] > mx) mx = scores[a];
    }
    double z = 0.0;
    for (int a = 0; a < H; ++a) z += std::exp(scores[a] - mx);
    double u = urand() * z, acc = 0.0;
    int choice = cur;
    for (int a = 0; a < H; ++a) {
      acc += std::exp(scores[a] - mx);
      if (u <= acc) { choice = a; break; }
    }
    genotypes[s * P + slot] = choice;
  }

  // mcmc.py:503-655 parental-pair allele swap over the pair blanket
  void pair_swap(int p, int q) {
    int ip = (int)(urand() * P), iq = (int)(urand() * P);
    double before = llk_cached(p) + llk_cached(q) + blanket(p) + blanket(q);
    for (int c : children[p]) before += trio_log_pmf(c);
    std::swap(genotypes[p * P + ip], genotypes[q * P + iq]);
    double after = llk_cached(p) + llk_cached(q) + blanket(p) + blanket(q);
    for (int c : children[p]) after += trio_log_pmf(c);
    if (urand() >= std::exp(std::min(0.0, after - before)))
      std::swap(genotypes[p * P + ip], genotypes[q * P + iq]);  // reject
  }

  // mcmc.py:362-412 compound step
  void compound_step() {
    std::vector<int> order(S);
    for (int i = 0; i < S; ++i) order[i] = i;
    std::shuffle(order.begin(), order.end(), rng);
    std::vector<int> slots(P);
    for (int s : order) {
      for (int i = 0; i < P; ++i) slots[i] = i;
      std::shuffle(slots.begin(), slots.end(), rng);
      for (int slot : slots) gibbs_slot(s, slot);
    }
    pair_swap(0, 1);  // the single bi-parental founder pair
  }
};

template <typename F>
double time_steps(F&& body, int steps) {
  auto t0 = std::chrono::steady_clock::now();
  body(steps);
  auto t1 = std::chrono::steady_clock::now();
  return std::chrono::duration<double>(t1 - t0).count();
}

void make_reads(std::vector<double>& reads, int R, int NB, int A,
                double p_correct) {
  reads.resize((size_t)R * NB * A);
  for (int r = 0; r < R; ++r)
    for (int j = 0; j < NB; ++j) {
      int truth = (int)(urand() * A);
      for (int a = 0; a < A; ++a)
        reads[(r * NB + j) * A + a] =
            (a == truth) ? p_correct : (1 - p_correct) / (A - 1);
    }
}

}  // namespace

int main(int argc, char** argv) {
  int R = 64, P = 4, NB = 16, A = 2, H = 16, steps = 2000;
  if (argc > 1) steps = std::atoi(argv[1]);

  // de novo oracle
  Denovo d;
  d.R = R; d.P = P; d.NB = NB; d.A = A;
  make_reads(d.reads, R, NB, A, 0.99);
  d.genotype.assign(P * NB, 0);
  d.read_counts.assign(R, 1.0);
  double llk = d.log_likelihood();
  // warmup then timed run
  for (int s = 0; s < 50; ++s) llk = d.compound_step(llk);
  double llk_d = llk;
  double secs_d = time_steps(
      [&](int n) { for (int s = 0; s < n; ++s) llk_d = d.compound_step(llk_d); },
      steps);

  // calling oracle
  Calling c;
  c.R = R; c.P = P; c.NB = NB; c.A = A; c.H = H;
  make_reads(c.reads, R, NB, A, 0.99);
  c.haplotypes.resize((size_t)H * NB);
  for (auto& x : c.haplotypes) x = (int8_t)(urand() * A);
  c.genotype.assign(P, 0);
  c.read_counts.assign(R, 1.0);
  double cllk = c.log_likelihood();
  for (int s = 0; s < 50; ++s) cllk = c.compound_step(cllk);
  double cllk2 = cllk;
  double secs_c = time_steps(
      [&](int n) { for (int s = 0; s < n; ++s) cllk2 = c.compound_step(cllk2); },
      steps);

  // pedigree oracle: 22-sample bi-parental pedigree (2 founders + 20
  // progeny — the realistic example's structure), same read shapes
  Pedigree pd;
  pd.R = R; pd.P = P; pd.NB = NB; pd.A = A; pd.H = H; pd.S = 22; pd.tau = P / 2;
  pd.reads.resize((size_t)pd.S * R * NB * A);
  for (int s = 0; s < pd.S; ++s) {
    std::vector<double> one;
    make_reads(one, R, NB, A, 0.99);
    std::copy(one.begin(), one.end(), pd.reads.begin() + (size_t)s * R * NB * A);
  }
  pd.haplotypes = c.haplotypes;
  pd.genotypes.assign((size_t)pd.S * P, 0);
  pd.read_counts.assign((size_t)pd.S * R, 1.0);
  pd.parents.assign((size_t)pd.S * 2, -1);
  pd.children.resize(pd.S);
  for (int s = 2; s < pd.S; ++s) {
    pd.parents[s * 2] = 0;
    pd.parents[s * 2 + 1] = 1;
    pd.children[0].push_back(s);
    pd.children[1].push_back(s);
  }
  pd.log_freqs.assign(H, std::log(1.0 / H));
  int ped_steps = std::max(steps / 20, 10);
  for (int s = 0; s < 3; ++s) pd.compound_step();
  double secs_p = time_steps(
      [&](int n) { for (int s = 0; s < n; ++s) pd.compound_step(); },
      ped_steps);

  std::printf(
      "{\"denovo_steps_per_s_1core\": %.1f, \"calling_steps_per_s_1core\": "
      "%.1f, \"pedigree_steps_per_s_1core\": %.2f, "
      "\"denovo_cache_hit_rate\": %.3f, \"calling_cache_hit_rate\": %.3f, "
      "\"pedigree_cache_hit_rate\": %.3f, \"pedigree_trio_evals\": %lld, "
      "\"R\": %d, \"P\": %d, \"NB\": %d, \"A\": %d, \"H\": %d, \"S\": %d}\n",
      steps / secs_d, steps / secs_c, ped_steps / secs_p,
      (double)d.cache_hits / std::max(1LL, d.cache_hits + d.llk_evals),
      (double)c.cache_hits / std::max(1LL, c.cache_hits + c.llk_evals),
      (double)pd.cache_hits / std::max(1LL, pd.cache_hits + pd.llk_evals),
      pd.trio_evals, R, P, NB, A, H, pd.S);
  return 0;
}
