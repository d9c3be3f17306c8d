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

  std::printf(
      "{\"denovo_steps_per_s_1core\": %.1f, \"calling_steps_per_s_1core\": "
      "%.1f, \"denovo_cache_hit_rate\": %.3f, \"calling_cache_hit_rate\": "
      "%.3f, \"R\": %d, \"P\": %d, \"NB\": %d, \"A\": %d, \"H\": %d}\n",
      steps / secs_d, steps / secs_c,
      (double)d.cache_hits / std::max(1LL, d.cache_hits + d.llk_evals),
      (double)c.cache_hits / std::max(1LL, c.cache_hits + c.llk_evals),
      R, P, NB, A, H);
  return 0;
}
