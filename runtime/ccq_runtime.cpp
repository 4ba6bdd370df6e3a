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
//  - Scheduler: FIFO request queue + fixed slot pool. A request is admitted
//    when a slot is free AND the allocator can cover its prompt plus one
//    decode page (reservation avoids mid-decode OOM thrash); finished
//    sequences release pages and slot in O(pages).

#include <cstdint>
#include <cstring>
#include <deque>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Page allocator
// ---------------------------------------------------------------------------

struct Sequence {
  std::vector<int32_t> pages;
  int32_t length = 0;  // tokens written
};

struct PageAllocator {
  int32_t page_size;
  int32_t num_pages;
  std::vector<int32_t> free_list;
  std::unordered_map<int32_t, Sequence> seqs;
};

void* ccq_alloc_create(int32_t num_pages, int32_t page_size) {
  auto* a = new PageAllocator();
  a->page_size = page_size;
  a->num_pages = num_pages;
  a->free_list.reserve(num_pages);
  for (int32_t i = num_pages - 1; i >= 0; --i) a->free_list.push_back(i);
  return a;
}

void ccq_alloc_destroy(void* ptr) { delete static_cast<PageAllocator*>(ptr); }

int32_t ccq_alloc_free_pages(void* ptr) {
  return static_cast<int32_t>(
      static_cast<PageAllocator*>(ptr)->free_list.size());
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
  if (static_cast<int32_t>(a->free_list.size()) < need) return -1;
  Sequence s;
  s.length = prompt_len;
  s.pages.reserve(need);
  for (int32_t i = 0; i < need; ++i) {
    s.pages.push_back(a->free_list.back());
    a->free_list.pop_back();
  }
  a->seqs.emplace(seq_id, std::move(s));
  return 0;
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
    if (a->free_list.empty()) return -1;
    s.pages.push_back(a->free_list.back());
    a->free_list.pop_back();
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
  for (int32_t p : it->second.pages) a->free_list.push_back(p);
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
};

struct ActiveSeq {
  int32_t uid;
  int32_t slot;
  int32_t generated = 0;
  int32_t max_new_tokens;
};

struct Scheduler {
  int32_t max_slots;
  std::deque<PendingReq> queue;
  std::vector<int32_t> free_slots;                 // stack
  std::unordered_map<int32_t, ActiveSeq> active;   // by uid
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
  static_cast<Scheduler*>(ptr)->queue.push_back(
      {uid, prompt_len, max_new_tokens});
}

int32_t ccq_sched_queue_len(void* ptr) {
  return static_cast<int32_t>(static_cast<Scheduler*>(ptr)->queue.size());
}

int32_t ccq_sched_active_count(void* ptr) {
  return static_cast<int32_t>(static_cast<Scheduler*>(ptr)->active.size());
}

// Admit queued requests while slots and pages are available.
// Writes up to `max` admitted (uid, slot) pairs into out_uids/out_slots.
// Reserves prompt pages + one decode page per admitted request.
int32_t ccq_sched_admit(void* sched_ptr, void* alloc_ptr, int32_t* out_uids,
                        int32_t* out_slots, int32_t max) {
  auto* s = static_cast<Scheduler*>(sched_ptr);
  auto* a = static_cast<PageAllocator*>(alloc_ptr);
  int32_t admitted = 0;
  while (!s->queue.empty() && !s->free_slots.empty() && admitted < max) {
    const PendingReq& req = s->queue.front();
    int32_t need = pages_for(req.prompt_len, a->page_size) + 1;
    if (static_cast<int32_t>(a->free_list.size()) < need) break;  // HOL wait
    if (ccq_seq_create(a, req.uid, req.prompt_len) != 0) break;
    int32_t slot = s->free_slots.back();
    s->free_slots.pop_back();
    ActiveSeq seq;
    seq.uid = req.uid;
    seq.slot = slot;
    seq.max_new_tokens = req.max_new_tokens;
    s->active.emplace(req.uid, seq);
    out_uids[admitted] = req.uid;
    out_slots[admitted] = slot;
    ++admitted;
    s->queue.pop_front();
  }
  return admitted;
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
