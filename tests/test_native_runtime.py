"""Native C++ runtime (page allocator + scheduler) and paged serving tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.serve.runtime import (
    NativeScheduler, PageAllocator, load_library)
from ee274_convexcaldera_llm_quantization_tpu.serve import paged
from ee274_convexcaldera_llm_quantization_tpu.serve.paged_engine import (
    PagedServingEngine)
from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
    Request, ServingEngine)
from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY


class TestAsanSoak:
    """Randomized multi-tenant soak of the whole C API under
    AddressSanitizer (VERDICT round 2: the prefix-cache heap overflow hid
    for a full round inside green unit tests — memory errors must fail
    loudly in-suite, not corrupt silently)."""

    def test_soak_asan_clean(self, tmp_path):
        import shutil
        import subprocess
        import os
        gxx = shutil.which("g++")
        if gxx is None:
            pytest.skip("g++ not available")
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        binary = str(tmp_path / "ccq_soak")
        subprocess.check_call(
            [gxx, "-O1", "-g", "-fsanitize=address", "-std=c++17",
             os.path.join(root, "runtime", "ccq_runtime.cpp"),
             os.path.join(root, "runtime", "soak_main.cpp"),
             "-o", binary])
        for seed in (1234, 7):
            out = subprocess.run([binary, "30000", str(seed)],
                                 capture_output=True, text=True,
                                 timeout=300)
            assert out.returncode == 0, (out.stdout, out.stderr)
            assert "SOAK OK" in out.stdout


class TestPageAllocator:
    def test_create_and_page_accounting(self):
        a = PageAllocator(num_pages=10, page_size=4)
        assert a.free_pages == 10
        assert a.create_seq(1, prompt_len=9)   # 3 pages (9 tokens / 4)
        assert a.free_pages == 7
        assert a.length(1) == 9
        assert len(a.page_table(1)) == 3

    def test_append_allocates_on_boundary(self):
        a = PageAllocator(num_pages=4, page_size=4)
        a.create_seq(7, prompt_len=4)          # exactly 1 full page
        assert a.free_pages == 3
        a.append(7)                            # crosses boundary -> new page
        assert a.free_pages == 2
        assert a.length(7) == 5
        for _ in range(3):
            a.append(7)                        # fills page 2
        assert a.free_pages == 2
        a.append(7)                            # new page again
        assert a.free_pages == 1

    def test_free_returns_pages(self):
        a = PageAllocator(num_pages=4, page_size=4)
        a.create_seq(1, 8)
        a.create_seq(2, 8)
        assert a.free_pages == 0
        assert not a.create_seq(3, 1)          # OOM
        a.free_seq(1)
        assert a.free_pages == 2
        assert a.create_seq(3, 5)

    def test_oom_on_append_raises(self):
        a = PageAllocator(num_pages=1, page_size=2)
        a.create_seq(1, 2)
        with pytest.raises(MemoryError):
            a.append(1)

    def test_unknown_seq_raises(self):
        a = PageAllocator(4, 4)
        with pytest.raises(KeyError):
            a.append(99)
        with pytest.raises(KeyError):
            a.page_table(99)

    def test_pages_are_disjoint(self):
        a = PageAllocator(num_pages=8, page_size=2)
        a.create_seq(1, 4)
        a.create_seq(2, 4)
        p1 = set(a.page_table(1).tolist())
        p2 = set(a.page_table(2).tolist())
        assert not (p1 & p2)


class TestNativeScheduler:
    def test_admission_respects_slots_and_pages(self):
        a = PageAllocator(num_pages=6, page_size=4)
        s = NativeScheduler(max_slots=2, allocator=a)
        for uid in range(4):
            s.submit(uid, prompt_len=4, max_new_tokens=4)
        admitted = s.admit()
        # slots limit to 2 even though pages would allow 3
        assert len(admitted) == 2
        assert s.queue_len == 2
        assert {slot for _, slot in admitted} == {0, 1}

    def test_admission_blocks_on_pages(self):
        a = PageAllocator(num_pages=2, page_size=4)
        s = NativeScheduler(max_slots=4, allocator=a)
        s.submit(0, prompt_len=4, max_new_tokens=4)   # needs 1+1 reserve
        s.submit(1, prompt_len=4, max_new_tokens=4)
        admitted = s.admit()
        assert len(admitted) == 1                      # second can't reserve
        assert s.queue_len == 1

    def test_record_and_finish_cycle(self):
        a = PageAllocator(num_pages=8, page_size=4)
        s = NativeScheduler(max_slots=1, allocator=a)
        s.submit(0, prompt_len=2, max_new_tokens=3)
        (uid, slot), = s.admit()
        assert not s.record_token(uid)
        assert not s.record_token(uid)
        assert s.record_token(uid)                     # 3rd token -> finished
        released = s.finish(uid)
        assert released == slot
        assert s.active_count == 0
        assert a.free_pages == 8

    def test_slot_reuse_after_finish(self):
        a = PageAllocator(num_pages=16, page_size=4)
        s = NativeScheduler(max_slots=1, allocator=a)
        s.submit(0, 4, 1)
        s.submit(1, 4, 1)
        (u0, slot0), = s.admit()
        assert s.admit() == []                         # no slot free
        s.record_token(u0)
        s.finish(u0)
        (u1, slot1), = s.admit()
        assert slot1 == slot0


@pytest.fixture(scope="module")
def tiny_model():
    return llama.init_params(jax.random.PRNGKey(0), TINY)


class TestPagedDecode:
    def test_paged_matches_slotted_engine(self, tiny_model):
        rng = np.random.default_rng(0)
        prompts = [rng.integers(0, TINY.vocab_size, size=5),
                   rng.integers(0, TINY.vocab_size, size=7)]
        slotted = ServingEngine(tiny_model, TINY, max_slots=2,
                                max_seq_len=32)
        for uid, p in enumerate(prompts):
            slotted.submit(Request(uid=uid, prompt=p, max_new_tokens=5))
        ref = {c.uid: c.tokens for c in slotted.run()}

        pag = PagedServingEngine(tiny_model, TINY, max_slots=2,
                                 num_pages=16, page_size=4,
                                 max_pages_per_seq=8)
        for uid, p in enumerate(prompts):
            pag.submit(Request(uid=uid, prompt=p, max_new_tokens=5))
        out = {c.uid: c.tokens for c in pag.run()}
        assert out == ref

    def test_more_requests_than_slots(self, tiny_model):
        rng = np.random.default_rng(1)
        pag = PagedServingEngine(tiny_model, TINY, max_slots=2,
                                 num_pages=12, page_size=4,
                                 max_pages_per_seq=4)
        for uid in range(5):
            pag.submit(Request(uid=uid,
                               prompt=rng.integers(0, TINY.vocab_size,
                                                   size=4),
                               max_new_tokens=4))
        done = pag.run()
        assert sorted(c.uid for c in done) == list(range(5))
        assert all(len(c.tokens) == 4 for c in done)
        assert pag.allocator.free_pages == 12          # all pages returned

    def test_capacity_rejection(self, tiny_model):
        pag = PagedServingEngine(tiny_model, TINY, max_slots=1,
                                 num_pages=4, page_size=4,
                                 max_pages_per_seq=2)
        with pytest.raises(ValueError):
            pag.submit(Request(uid=0, prompt=np.zeros(6, np.int32),
                               max_new_tokens=4))

    def test_oversized_prompt_rejected_not_hung(self, tiny_model):
        # a prompt needing more pages than the whole pool must be rejected
        # at submit, not spin forever in run() (head-of-line starvation)
        pag = PagedServingEngine(tiny_model, TINY, max_slots=1,
                                 num_pages=1, page_size=4,
                                 max_pages_per_seq=4)
        with pytest.raises(ValueError):
            pag.submit(Request(uid=0, prompt=np.zeros(8, np.int32),
                               max_new_tokens=2))
