// Native serving runtime: paged-KV block allocator + continuous-batching
// scheduler.
//
// The reference has no serving runtime at all (stock HF generate,
// reference main.py:358). This is the host-side hot path of the TPU serving
// engine: admission control and page-table management run in C++ so the
// Python scheduler tick does no per-token allocation work; the device side
// consumes the page tables produced here (serve/paged.py).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
//
// Design:
//  - PageAllocator: fixed pool of `num_pages` KV pages of `page_size`
//    tokens. Free list is a stack (LIFO reuse keeps pages warm in cache).
//    Each sequence owns a growable page list; append-token either fits in
//    the last page or grabs a new one.
//  - Scheduler: request queue + fixed slot pool. A request is admitted
//    when a slot is free AND the allocator can cover its prompt plus one
//    decode page (reservation avoids mid-decode OOM thrash); finished
//    sequences release pages and slot in O(pages). Admission order is
//    priority-aware with aging and per-tenant fairness (see
//    ccq_sched_submit_pri / ccq_sched_admit).
//  - Prefix cache: full prompt pages are registered under a chained 64-bit
//    FNV-1a hash of the token prefix (vLLM-style). A new prompt sharing a
//    page-aligned prefix with a cached sequence reuses those pages
//    (refcounted, never written again: partial pages are always fresh and
//    appends past a full page allocate a new page, so no copy-on-write is
//    needed). Unreferenced cached pages sit on an LRU list and are evicted
//    only when the free list runs dry.

#include <cstdint>
#include <cstring>
#include <deque>
#include <list>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Page allocator + prefix cache
// ---------------------------------------------------------------------------

struct Sequence {
  std::vector<int32_t> pages;
  int32_t length = 0;  // tokens written
};

struct CachedPage {
  uint64_t hash = 0;            // chained prefix hash this page completes
  bool registered = false;      // present in the prefix-cache map
  std::list<int32_t>::iterator lru_it;  // valid iff on the LRU list
  bool on_lru = false;
};

struct PageAllocator {
  int32_t page_size;
  int32_t num_pages;
  std::vector<int32_t> free_list;
  std::unordered_map<int32_t, Sequence> seqs;
  // prefix cache
  std::vector<int32_t> refcount;             // per page
  std::vector<CachedPage> meta;              // per page
  std::unordered_map<uint64_t, int32_t> cache;   // chained hash -> page
  std::list<int32_t> lru;                    // refcount==0 cached pages,
                                             // front = oldest
  int64_t cache_hits = 0;                    // tokens served from cache
  int64_t cache_lookups = 0;                 // tokens eligible
};

static uint64_t chain_hash(uint64_t prev, const int32_t* toks, int32_t n) {
  uint64_t h = prev ? prev : 1469598103934665603ull;  // FNV offset basis
  for (int32_t i = 0; i < n; ++i) {
    uint64_t v = static_cast<uint64_t>(static_cast<uint32_t>(toks[i]));
    for (int b = 0; b < 4; ++b) {
      h ^= (v >> (8 * b)) & 0xff;
      h *= 1099511628211ull;                          // FNV prime
    }
  }
  return h ? h : 1;  // 0 is the "no hash" sentinel
}

// Take one writable page: free list first, then evict the oldest
// unreferenced cached page. Returns -1 when truly out of memory.
static int32_t acquire_page(PageAllocator* a) {
  if (!a->free_list.empty()) {
    int32_t p = a->free_list.back();
    a->free_list.pop_back();
    return p;
  }
  if (!a->lru.empty()) {
    int32_t p = a->lru.front();
    a->lru.pop_front();
    CachedPage& m = a->meta[p];
    m.on_lru = false;
    if (m.registered) {
      a->cache.erase(m.hash);
      m.registered = false;
    }
    m.hash = 0;
    return p;
  }
  return -1;
}

// Pages available for new allocations (free + evictable).
static int32_t available_pages(const PageAllocator* a) {
  return static_cast<int32_t>(a->free_list.size() + a->lru.size());
}

static void release_page(PageAllocator* a, int32_t p) {
  CachedPage& m = a->meta[p];
  if (m.registered) {       // keep for prefix reuse; evictable via LRU
    a->lru.push_back(p);
    m.lru_it = --a->lru.end();
    m.on_lru = true;
  } else {
    a->free_list.push_back(p);
  }
}

void* ccq_alloc_create(int32_t num_pages, int32_t page_size) {
  auto* a = new PageAllocator();
  a->page_size = page_size;
  a->num_pages = num_pages;
  a->free_list.reserve(num_pages);
  for (int32_t i = num_pages - 1; i >= 0; --i) a->free_list.push_back(i);
  a->refcount.assign(num_pages, 0);
  a->meta.assign(num_pages, CachedPage{});
  return a;
}

void ccq_alloc_destroy(void* ptr) { delete static_cast<PageAllocator*>(ptr); }

int32_t ccq_alloc_free_pages(void* ptr) {
  // pages available for NEW allocations: truly free + evictable cached
  return available_pages(static_cast<PageAllocator*>(ptr));
}

static int32_t pages_for(int32_t tokens, int32_t page_size) {
  return (tokens + page_size - 1) / page_size;
}

// Create a sequence with `prompt_len` tokens already written.
// Returns 0 on success, -1 if out of pages (nothing allocated), -2 if the
// seq_id already exists.
int32_t ccq_seq_create(void* ptr, int32_t seq_id, int32_t prompt_len) {
  auto* a = static_cast<PageAllocator*>(ptr);
  if (a->seqs.count(seq_id)) return -2;
  int32_t need = pages_for(prompt_len, a->page_size);
  if (available_pages(a) < need) return -1;
  Sequence s;
  s.length = prompt_len;
  s.pages.reserve(need);
  for (int32_t i = 0; i < need; ++i) {
    int32_t p = acquire_page(a);
    a->refcount[p] = 1;
    s.pages.push_back(p);
  }
  a->seqs.emplace(seq_id, std::move(s));
  return 0;
}

// Create a sequence, reusing cached pages for any page-aligned prompt
// prefix previously registered (prefix cache). `tokens` is the prompt.
// Shared pages are refcounted and never rewritten; the remainder is
// allocated fresh, and every FULL prompt page of this sequence is
// registered for future reuse. At least one trailing token is always
// left uncached so the caller can recompute last-position logits.
// Returns the number of prompt tokens covered by the cache (multiple of
// page_size), or -1 out of pages / -2 duplicate id.
int32_t ccq_seq_create_cached(void* ptr, int32_t seq_id,
                              const int32_t* tokens, int32_t prompt_len) {
  auto* a = static_cast<PageAllocator*>(ptr);
  if (a->seqs.count(seq_id)) return -2;
  const int32_t P = a->page_size;
  int32_t full_pages = prompt_len / P;
  // cap: leave >= 1 token to prefill
  int32_t max_shared = (prompt_len - 1) / P;

  // 1) walk the chained hashes while pages are cached
  std::vector<uint64_t> hashes(full_pages, 0);
  uint64_t h = 0;
  for (int32_t k = 0; k < full_pages; ++k) {
    h = chain_hash(h, tokens + k * P, P);
    hashes[k] = h;
  }
  int32_t shared = 0;
  while (shared < max_shared) {
    auto it = a->cache.find(hashes[shared]);
    if (it == a->cache.end()) break;
    ++shared;
  }
  a->cache_lookups += max_shared;
  a->cache_hits += shared;

  // Shared pages currently parked on the LRU count as "available" but are
  // resurrected (removed from the LRU) in step 2 — they must NOT be counted
  // toward the fresh-page budget, or step 3 can run dry after the check
  // (acquire_page() == -1 -> refcount[-1] heap corruption; found by ASAN).
  int32_t resurrect = 0;
  for (int32_t k = 0; k < shared; ++k) {
    int32_t p = a->cache.at(hashes[k]);
    if (a->refcount[p] == 0 && a->meta[p].on_lru) ++resurrect;
  }
  int32_t need = pages_for(prompt_len, P) - shared;
  if (available_pages(a) - resurrect < need) return -1;

  Sequence s;
  s.length = prompt_len;
  s.pages.reserve(pages_for(prompt_len, P));
  // 2) share the cached prefix pages
  for (int32_t k = 0; k < shared; ++k) {
    int32_t p = a->cache.at(hashes[k]);
    if (a->refcount[p] == 0 && a->meta[p].on_lru) {
      a->lru.erase(a->meta[p].lru_it);      // resurrect from LRU
      a->meta[p].on_lru = false;
    }
    a->refcount[p] += 1;
    s.pages.push_back(p);
  }
  // 3) allocate the rest; register new FULL prompt pages for reuse
  int32_t total = pages_for(prompt_len, P);
  for (int32_t k = shared; k < total; ++k) {
    int32_t p = acquire_page(a);
    if (p < 0) {
      // unreachable with the corrected precheck; roll back defensively
      // rather than corrupting refcount[-1]. Fresh pages registered earlier
      // in this loop hold no KV yet — unregister before releasing so no
      // future prompt can "share" garbage.
      for (size_t j = 0; j < s.pages.size(); ++j) {
        int32_t q = s.pages[j];
        if (static_cast<int32_t>(j) >= shared && a->meta[q].registered) {
          a->cache.erase(a->meta[q].hash);
          a->meta[q].registered = false;
          a->meta[q].hash = 0;
        }
        if (--a->refcount[q] == 0) release_page(a, q);
      }
      return -1;
    }
    a->refcount[p] = 1;
    if (k < full_pages && !a->cache.count(hashes[k])) {
      a->cache[hashes[k]] = p;
      a->meta[p].hash = hashes[k];
      a->meta[p].registered = true;
    }
    s.pages.push_back(p);
  }
  a->seqs.emplace(seq_id, std::move(s));
  return shared * P;
}

// tokens served from cache / tokens eligible, since creation.
void ccq_alloc_cache_stats(void* ptr, int64_t* hits, int64_t* lookups) {
  auto* a = static_cast<PageAllocator*>(ptr);
  *hits = a->cache_hits * a->page_size;
  *lookups = a->cache_lookups * a->page_size;
}

// Append one token; allocates a page on boundary crossings.
// Returns the page index the token lands in, or -1 if out of pages,
// -2 unknown seq.
int32_t ccq_seq_append(void* ptr, int32_t seq_id) {
  auto* a = static_cast<PageAllocator*>(ptr);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -2;
  Sequence& s = it->second;
  if (s.length % a->page_size == 0) {  // need a fresh page
    int32_t p = acquire_page(a);
    if (p < 0) return -1;
    a->refcount[p] = 1;
    s.pages.push_back(p);
  }
  int32_t page = s.pages[s.length / a->page_size];
  s.length += 1;
  return page;
}

int32_t ccq_seq_length(void* ptr, int32_t seq_id) {
  auto* a = static_cast<PageAllocator*>(ptr);
  auto it = a->seqs.find(seq_id);
  return it == a->seqs.end() ? -2 : it->second.length;
}

// Copy the page table into `out` (capacity `max`); returns #pages or -2.
int32_t ccq_seq_page_table(void* ptr, int32_t seq_id, int32_t* out,
                           int32_t max) {
  auto* a = static_cast<PageAllocator*>(ptr);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -2;
  const auto& pages = it->second.pages;
  int32_t n = static_cast<int32_t>(pages.size());
  if (n > max) n = max;
  std::memcpy(out, pages.data(), n * sizeof(int32_t));
  return static_cast<int32_t>(pages.size());
}

int32_t ccq_seq_free(void* ptr, int32_t seq_id) {
  auto* a = static_cast<PageAllocator*>(ptr);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -2;
  for (int32_t p : it->second.pages) {
    if (--a->refcount[p] == 0) release_page(a, p);
  }
  a->seqs.erase(it);
  return 0;
}

// ---------------------------------------------------------------------------
// Continuous-batching scheduler
// ---------------------------------------------------------------------------

struct PendingReq {
  int32_t uid;
  int32_t prompt_len;
  int32_t max_new_tokens;
  int32_t priority;        // higher admits first
  int32_t tenant;
  int64_t submit_tick;
};

struct ActiveSeq {
  int32_t uid;
  int32_t slot;
  int32_t generated = 0;
  int32_t max_new_tokens;
  int32_t tenant = 0;
};

struct Scheduler {
  int32_t max_slots;
  std::deque<PendingReq> queue;
  std::vector<int32_t> free_slots;                 // stack
  std::unordered_map<int32_t, ActiveSeq> active;   // by uid
  std::unordered_map<int32_t, int64_t> tenant_tokens;  // fairness ledger
  int64_t tick = 0;
};

void* ccq_sched_create(int32_t max_slots) {
  auto* s = new Scheduler();
  s->max_slots = max_slots;
  for (int32_t i = max_slots - 1; i >= 0; --i) s->free_slots.push_back(i);
  return s;
}

void ccq_sched_destroy(void* ptr) { delete static_cast<Scheduler*>(ptr); }

void ccq_sched_submit(void* ptr, int32_t uid, int32_t prompt_len,
                      int32_t max_new_tokens) {
  auto* s = static_cast<Scheduler*>(ptr);
  s->queue.push_back(
      {uid, prompt_len, max_new_tokens, 0, 0, s->tick});
}

// Priority/tenant-aware submission. `priority` dominates admission order;
// within a priority level, tenants that have generated fewer tokens win
// (fair sharing), with FIFO age as the tiebreaker.
void ccq_sched_submit_pri(void* ptr, int32_t uid, int32_t prompt_len,
                          int32_t max_new_tokens, int32_t priority,
                          int32_t tenant) {
  auto* s = static_cast<Scheduler*>(ptr);
  s->queue.push_back(
      {uid, prompt_len, max_new_tokens, priority, tenant, s->tick});
}

int32_t ccq_sched_queue_len(void* ptr) {
  return static_cast<int32_t>(static_cast<Scheduler*>(ptr)->queue.size());
}

int32_t ccq_sched_active_count(void* ptr) {
  return static_cast<int32_t>(static_cast<Scheduler*>(ptr)->active.size());
}

// Pick the next request to admit: highest priority first, then the tenant
// with the smallest generated-token ledger (fair share), then FIFO age.
static size_t best_candidate(Scheduler* s) {
  size_t best = 0;
  for (size_t i = 1; i < s->queue.size(); ++i) {
    const PendingReq& a = s->queue[i];
    const PendingReq& b = s->queue[best];
    if (a.priority != b.priority) {
      if (a.priority > b.priority) best = i;
      continue;
    }
    int64_t ua = s->tenant_tokens.count(a.tenant)
                     ? s->tenant_tokens[a.tenant] : 0;
    int64_t ub = s->tenant_tokens.count(b.tenant)
                     ? s->tenant_tokens[b.tenant] : 0;
    if (ua != ub) {
      if (ua < ub) best = i;
      continue;
    }
    if (a.submit_tick < b.submit_tick) best = i;
  }
  return best;
}

// Admit queued requests while slots and pages are available, in
// priority/fairness order (see best_candidate). Writes up to `max`
// admitted (uid, slot, prompt_len) triples; out_prompt_lens may be null.
// Reserves prompt pages + one decode page per admitted request. Stops at
// the first non-fitting candidate (no starvation of large requests).
static int32_t admit_impl(Scheduler* s, PageAllocator* a, int32_t* out_uids,
                          int32_t* out_slots, int32_t max,
                          int32_t create_seqs) {
  s->tick += 1;
  int32_t admitted = 0;
  while (!s->queue.empty() && !s->free_slots.empty() && admitted < max) {
    size_t idx = best_candidate(s);
    const PendingReq req = s->queue[idx];
    int32_t need = pages_for(req.prompt_len, a->page_size) + 1;
    if (available_pages(a) < need) break;  // wait; keeps admission order
    if (create_seqs && ccq_seq_create(a, req.uid, req.prompt_len) != 0)
      break;
    int32_t slot = s->free_slots.back();
    s->free_slots.pop_back();
    ActiveSeq seq;
    seq.uid = req.uid;
    seq.slot = slot;
    seq.max_new_tokens = req.max_new_tokens;
    seq.tenant = req.tenant;
    s->active.emplace(req.uid, seq);
    out_uids[admitted] = req.uid;
    out_slots[admitted] = slot;
    ++admitted;
    s->queue.erase(s->queue.begin() + idx);
  }
  return admitted;
}

int32_t ccq_sched_admit(void* sched_ptr, void* alloc_ptr, int32_t* out_uids,
                        int32_t* out_slots, int32_t max) {
  return admit_impl(static_cast<Scheduler*>(sched_ptr),
                    static_cast<PageAllocator*>(alloc_ptr), out_uids,
                    out_slots, max, /*create_seqs=*/1);
}

// Variant that admits WITHOUT creating allocator sequences: the caller
// creates them with ccq_seq_create_cached (prefix reuse needs the token
// ids, which the scheduler does not hold). Page reservation is checked
// conservatively (as if nothing were cached).
int32_t ccq_sched_admit_nocreate(void* sched_ptr, void* alloc_ptr,
                                 int32_t* out_uids, int32_t* out_slots,
                                 int32_t max) {
  return admit_impl(static_cast<Scheduler*>(sched_ptr),
                    static_cast<PageAllocator*>(alloc_ptr), out_uids,
                    out_slots, max, /*create_seqs=*/0);
}

// Record one generated token for `uid`. Returns 1 if the sequence is now
// finished (hit max_new_tokens), 0 if still running, negative on error
// (-1 page OOM, -2 unknown uid).
int32_t ccq_sched_record_token(void* sched_ptr, void* alloc_ptr, int32_t uid,
                               int32_t is_eos) {
  auto* s = static_cast<Scheduler*>(sched_ptr);
  auto it = s->active.find(uid);
  if (it == s->active.end()) return -2;
  int32_t page = ccq_seq_append(alloc_ptr, uid);
  if (page < 0) return page;
  ActiveSeq& seq = it->second;
  seq.generated += 1;
  s->tenant_tokens[seq.tenant] += 1;      // fairness ledger
  if (is_eos || seq.generated >= seq.max_new_tokens) return 1;
  return 0;
}

// Finish a sequence: free pages, release the slot. Returns the slot or -2.
int32_t ccq_sched_finish(void* sched_ptr, void* alloc_ptr, int32_t uid) {
  auto* s = static_cast<Scheduler*>(sched_ptr);
  auto it = s->active.find(uid);
  if (it == s->active.end()) return -2;
  int32_t slot = it->second.slot;
  ccq_seq_free(alloc_ptr, uid);
  s->free_slots.push_back(slot);
  s->active.erase(it);
  return slot;
}

}  // extern "C"
