// Randomized multi-tenant soak of the native scheduler + page allocator.
//
// Round 2's heap-buffer-overflow in the prefix-cache allocator hid for a
// full round inside green unit tests; this driver churns the whole C API
// (submit/admit/decode/evict/prefix-share, tens of thousands of ops,
// randomized but seeded) and is built with -fsanitize=address by the test
// harness (tests/test_native_runtime.py) so memory errors fail loudly in
// CI fashion rather than corrupting silently.
//
// Exit code 0 = clean; any ASAN report aborts the process non-zero.
// Usage: soak [iters] [seed]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <set>
#include <vector>

extern "C" {
void* ccq_alloc_create(int32_t, int32_t);
void ccq_alloc_destroy(void*);
int32_t ccq_alloc_free_pages(void*);
int32_t ccq_seq_create(void*, int32_t, int32_t);
int32_t ccq_seq_create_cached(void*, int32_t, int32_t*, int32_t);
void ccq_alloc_cache_stats(void*, int64_t*, int64_t*);
int32_t ccq_seq_append(void*, int32_t);
int32_t ccq_seq_length(void*, int32_t);
int32_t ccq_seq_page_table(void*, int32_t, int32_t*, int32_t);
int32_t ccq_seq_free(void*, int32_t);
void* ccq_sched_create(int32_t);
void ccq_sched_destroy(void*);
void ccq_sched_submit(void*, int32_t, int32_t, int32_t);
void ccq_sched_submit_pri(void*, int32_t, int32_t, int32_t, int32_t,
                          int32_t);
int32_t ccq_sched_queue_len(void*);
int32_t ccq_sched_active_count(void*);
int32_t ccq_sched_admit(void*, void*, int32_t*, int32_t*, int32_t);
int32_t ccq_sched_admit_nocreate(void*, void*, int32_t*, int32_t*, int32_t);
int32_t ccq_sched_record_token(void*, void*, int32_t, int32_t);
int32_t ccq_sched_finish(void*, void*, int32_t);
}

#define CHECK(cond)                                                        \
  do {                                                                     \
    if (!(cond)) {                                                         \
      std::fprintf(stderr, "SOAK INVARIANT FAILED at %s:%d: %s\n",         \
                   __FILE__, __LINE__, #cond);                             \
      std::exit(2);                                                        \
    }                                                                      \
  } while (0)

int main(int argc, char** argv) {
  const int64_t iters = argc > 1 ? std::atoll(argv[1]) : 50000;
  const uint32_t seed = argc > 2 ? std::atoi(argv[2]) : 1234;
  std::mt19937 rng(seed);

  const int32_t num_pages = 256, page_size = 16, max_slots = 8;
  void* alloc = ccq_alloc_create(num_pages, page_size);
  void* sched = ccq_sched_create(max_slots);
  CHECK(alloc && sched);

  // a pool of shared prompt prefixes to exercise the prefix cache
  std::vector<std::vector<int32_t>> prefixes;
  for (int i = 0; i < 6; ++i) {
    std::vector<int32_t> p(16 + (rng() % 80));
    for (auto& t : p) t = rng() % 64;
    prefixes.push_back(p);
  }

  int32_t next_uid = 1;
  std::set<int32_t> active;        // scheduler-admitted uids
  std::set<int32_t> raw_seqs;      // directly created allocator seqs
  std::vector<int32_t> uids(max_slots), slots(max_slots);
  std::vector<int32_t> table(num_pages);

  for (int64_t it = 0; it < iters; ++it) {
    int op = rng() % 100;
    if (op < 25) {                                   // submit
      int32_t uid = next_uid++;
      if (rng() % 2) {
        ccq_sched_submit_pri(sched, uid, 1 + rng() % 96, 1 + rng() % 24,
                             (int32_t)(rng() % 5) - 2, rng() % 4);
      } else {
        ccq_sched_submit(sched, uid, 1 + rng() % 96, 1 + rng() % 24);
      }
    } else if (op < 40) {                            // admit (both modes)
      int32_t cap = 1 + rng() % max_slots;
      int32_t n;
      if (rng() % 3 == 0) {
        n = ccq_sched_admit_nocreate(sched, alloc, uids.data(),
                                     slots.data(), cap);
        // caller creates the sequences, half via the prefix cache
        for (int32_t i = 0; i < n; ++i) {
          auto& p = prefixes[rng() % prefixes.size()];
          int32_t r = ccq_seq_create_cached(alloc, uids[i], p.data(),
                                            (int32_t)p.size());
          if (r < 0) {  // OOM on cached create: try a minimal sequence
            r = ccq_seq_create(alloc, uids[i], 1);
            if (r < 0) {  // still OOM: roll the admission back
              ccq_sched_finish(sched, alloc, uids[i]);
              continue;
            }
          }
          active.insert(uids[i]);
        }
      } else {
        n = ccq_sched_admit(sched, alloc, uids.data(), slots.data(), cap);
        for (int32_t i = 0; i < n; ++i) active.insert(uids[i]);
      }
      CHECK(n <= cap);
    } else if (op < 70 && !active.empty()) {         // decode a random seq
      auto itr = active.begin();
      std::advance(itr, rng() % active.size());
      int32_t uid = *itr;
      int32_t r = ccq_sched_record_token(sched, alloc, uid,
                                         rng() % 16 == 0);
      if (r == 1 || r < 0) {
        ccq_sched_finish(sched, alloc, uid);
        active.erase(uid);
      }
    } else if (op < 75 && !active.empty()) {         // early cancel
      auto itr = active.begin();
      std::advance(itr, rng() % active.size());
      ccq_sched_finish(sched, alloc, *itr);
      active.erase(itr);
    } else if (op < 85) {                            // raw cached seq churn
      int32_t sid = 1000000 + (int32_t)(rng() % 64);
      if (raw_seqs.count(sid)) {
        if (rng() % 2) {
          ccq_seq_append(alloc, sid);
          int32_t len = ccq_seq_length(alloc, sid);
          CHECK(len >= 0);
          int32_t n = ccq_seq_page_table(alloc, sid, table.data(),
                                         num_pages);
          CHECK(n >= 0 && n <= num_pages);
        } else {
          CHECK(ccq_seq_free(alloc, sid) == 0);
          raw_seqs.erase(sid);
        }
      } else {
        auto& p = prefixes[rng() % prefixes.size()];
        // extend a shared prefix with unique tokens (partial-page shares)
        std::vector<int32_t> toks(p);
        int32_t extra = (int32_t)(rng() % 40);
        for (int32_t i = 0; i < extra; ++i) toks.push_back(rng() % 1024);
        int32_t r = ccq_seq_create_cached(alloc, sid, toks.data(),
                                          (int32_t)toks.size());
        if (r >= 0) raw_seqs.insert(sid);
      }
    } else {                                         // invariants / stats
      int32_t fp = ccq_alloc_free_pages(alloc);
      CHECK(fp >= 0 && fp <= num_pages);
      int64_t hits = 0, lookups = 0;
      ccq_alloc_cache_stats(alloc, &hits, &lookups);
      CHECK(hits >= 0 && hits <= lookups);
      CHECK(ccq_sched_active_count(sched) == (int32_t)active.size());
      CHECK(ccq_sched_queue_len(sched) >= 0);
    }
  }

  // drain: finish everything; all pages must come back (cached pages are
  // evictable, so available_pages returns to the full pool)
  for (int32_t uid : active) ccq_sched_finish(sched, alloc, uid);
  for (int32_t sid : raw_seqs) ccq_seq_free(alloc, sid);
  CHECK(ccq_alloc_free_pages(alloc) == num_pages);
  ccq_sched_destroy(sched);
  ccq_alloc_destroy(alloc);
  std::printf("SOAK OK: %lld ops, seed %u\n", (long long)iters, seed);
  return 0;
}
