"""Persistent whole-layer decode megakernel (ONE Pallas call per step).

Round-2 measurement located the decode gap: the projection chain ran
7.38 ms against ~4.8 ms of compulsory weight reads, with only 0.9 us of
fixed cost per launch — the loss is distributed pipeline inefficiency
around ~160 kernel boundaries (each ``pallas_call`` drains its DMA
pipeline before the next one refills it, and XLA glue ops sit in
between). This kernel removes ALL of those boundaries: the entire
32-layer decode stack — rmsnorm -> fused qkv -> rope -> KV quantize ->
flash attention -> o_proj -> rmsnorm -> gate/up -> silu-mul -> streaming
requant -> down_proj, with every low-rank factor contraction in-kernel —
runs as ONE ``pallas_call`` over a ``(layers, programs_per_layer)`` grid,
so Mosaic's automatic double-buffering streams weight DMAs continuously
across stage AND layer boundaries. The hidden state lives in VMEM
scratch for the whole step and never round-trips HBM.

Key design rules (all proven on this chip by the round-2 megakernels):

- dynamic *lane* offsets only, always ``pl.multiple_of`` >= 128; never a
  dynamic sublane offset (attention grids over HEAD blocks, not batch
  rows, so every per-head access is a 128-aligned lane slice); (B, N)
  batch-row results scatter back to TM-row scratch via one-hot
  expansion matmuls (sub-8-row concatenates MISCOMPILE under Mosaic);
- gate and up weights arrive INTERLEAVED by block so one program
  computes both halves and applies silu-mul immediately; the bf16
  intermediate is requantized per-ROW by one DQ transition program, so
  the down contraction runs large-chunk int8 dots (per-group scales
  would force 128-col chunk-dots: measured ~13 ms/step of overhead);
- per-layer slabs fetched once (the R factors) advance their BlockSpec
  index to layer ``l+1`` right after their last use in layer ``l``;
- scale blocks carry ``block_t`` as their last dim, weight and L-factor
  row scales merge into one (N, 2) operand per family, and every block
  obeys the Mosaic last-two-dims rule.

MEASURED VERDICT (round 3, llama2-7b B8 ctx256): correct (bit-exact vs
interpret; argmax-identical to the fused path) but SLOWER than the
per-kernel fused path — per-GRID-STEP bookkeeping with ~33 operands
costs ~0.9 us/program (= the per-launch floor), so the ~6k programs a
whole-step kernel needs repay the boundary savings. Kept as a correct,
tested alternative path (``bench.py --decode-path mega``) and as the
measured negative result for the round-2 "persistent kernel" plan; see
MEASUREMENTS_r3.md for the optimization ladder.

The reference has no serving path at all (it materializes dense weights
back into an HF module, reference ``main.py:197-199``); this is pure
TPU-serving design. Numerics match ``models.fused.decode_step_fused``
(staged-KV path) to f32 rounding except the documented bf16
intermediate staging (logits rel ~7e-4 at 7B, greedy argmax identical).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ee274_convexcaldera_llm_quantization_tpu.ops.kernels import (
    _pack_factor, _unpack_chunk_planes)

Array = jax.Array

_NEG_INF = -1e30


class _Plan:
    """Static program-layout plan for the (L, P) grid."""

    def __init__(self, *, h: int, im: int, qdim: int, kvdim: int, KVH: int,
                 D: int, rank: int, num_bits: int, B: int, T: int,
                 bnq: int = 256, bno: int = 256, bng: int = 256,
                 bnd: int = 128, rchunk: int = 512,
                 kv_slab_budget: int = 1 << 20):
        # VMEM budget note: the 16 MB scoped-vmem limit is the binding
        # constraint at the llama2-7b shape (three OOM iterations recorded
        # in MEASUREMENTS_r3.md); 512-col R chunks, the bf16 silu-mul
        # staging, (B, h) x0/xout, a 256-col gate+up chunk, and the
        # chunked DQ pass fit with ~1 MB headroom. KVHb must be a multiple of 8 (or the full KVH): the
        # scale blocks carry it second-minor.
        f = _pack_factor(num_bits)
        self.h, self.im, self.qdim, self.kvdim = h, im, qdim, kvdim
        self.KVH, self.D, self.rank, self.num_bits = KVH, D, rank, num_bits
        self.f = f
        self.B, self.T = B, T
        self.TM = 32                          # int8 sublane tile
        self.sumNq = qdim + 2 * kvdim
        self.rchunk = min(rchunk, h)
        while h % self.rchunk:
            self.rchunk //= 2
        self.bnq = self._bn(bnq, self.sumNq)
        self.bno = self._bn(bno, h)
        self.bng = self._bn(bng, im)
        self.bnd = self._bn(bnd, h)
        # token blocks: 128-wide (scale blocks carry bt as last dim)
        self.bt = T if T <= 128 or T % 128 else 128
        self.nt = T // self.bt
        # head blocks: bound the int8 KV slab; KVHb must stay a multiple
        # of 8 or equal KVH (Mosaic second-minor rule on the scale blocks)
        self.KVHb = KVH
        while (self.KVHb > 8
               and B * self.KVHb * self.bt * D > kv_slab_budget):
            cands = [d for d in range(8, self.KVHb)
                     if KVH % d == 0 and d % 8 == 0]
            if not cands:
                break
            self.KVHb = max(cands)
        self.nkh = KVH // self.KVHb
        # chunking of the packed planes
        self.plane_q = h // f
        self.chunk_q = min(1024, self.plane_q)
        while self.plane_q % self.chunk_q:
            self.chunk_q //= 2
        self.plane_o = qdim // f
        self.chunk_o = min(1024, self.plane_o)
        while self.plane_o % self.chunk_o:
            self.chunk_o //= 2
        # the interleaved gate+up phase unpacks (2*bng, chunk) at once;
        # its i32-widened chunk temporary is the kernel's stack peak —
        # halve the chunk to keep it at ~1 MB (scoped-vmem limit)
        self.chunk_gu = min(256, self.plane_q)
        while self.plane_q % self.chunk_gu:
            self.chunk_gu //= 2
        self.plane_d = im // f
        # largest divisor <= 1024 (plane lengths like 5504 = 2^7*43 have
        # non-power-of-two divisors — 688 here; tiny chunks cost ~16x the
        # loop iterations and measured ~13 ms/step of pure per-chunk
        # overhead in the first on-chip build)
        self.chunk_d = max(d for d in range(1, min(1024, self.plane_d) + 1)
                           if self.plane_d % d == 0)
        self.groups_d = im // self.bng        # per-UP-block absmax columns
        assert self.groups_d <= 128           # sm scratch is (TM, 128)

        self.nRq = h // self.rchunk
        self.rchunk_o = min(self.rchunk, qdim)
        while qdim % self.rchunk_o:
            self.rchunk_o //= 2
        self.nRo = qdim // self.rchunk_o
        self.nqkv = self.sumNq // self.bnq
        self.natt = self.nkh * self.nt
        self.no = h // self.bno
        self.ng = im // self.bng
        self.nd = h // self.bnd

        p = 0
        self.p_pre = p; p += 1
        self.p_xrq = p; p += self.nRq
        self.p_qkv = p; p += self.nqkv
        self.p_rope = p; p += 1
        self.p_attn = p; p += self.natt
        self.p_fin = p; p += 1
        self.p_xro = p; p += self.nRo
        self.p_o = p; p += self.no
        self.p_mlp = p; p += 1
        self.p_xrg = p; p += self.nRq
        self.p_gu = p; p += self.ng        # interleaved gate+up blocks
        self.p_dq = p; p += 1
        self.p_down = p; p += self.nd
        self.P = p

    @staticmethod
    def _bn(bn: int, N: int) -> int:
        bn = min(bn, N)
        while N % bn:
            bn //= 2
        return bn

    def supported(self) -> bool:
        return (self.D % 128 == 0 and self.rank % 128 == 0
                and self.qdim == self.kvdim          # MHA
                and self.f >= 2 and self.B <= self.TM
                and min(self.bnq, self.bno, self.bng, self.bnd) >= 128
                and self.groups_d <= 128 and self.bng % 128 == 0)


def _megastep_kernel(pos_ref, lastb_ref, gs_ref,
                     x0_ref, an_ref, mn_ref,
                     qw_ref, qs_ref, qR_ref, qRs_ref, qL_ref,
                     cos_ref, sin_ref, prot_ref,
                     kc_ref, ksc_ref, vc_ref, vsc_ref, posv_ref,
                     ow_ref, os_ref, oR_ref, oRs_ref, oL_ref,
                     gw_ref, gss_ref, gR_ref, gRs_ref, gL_ref,
                     dw_ref, ds_ref, dR_ref, dRs_ref, dL_ref,
                     xout_ref, k8_ref, ks8_ref, v8_ref, vs8_ref,
                     x_ref, y8_ref, sy_ref, rsy_ref, xr_ref, qkv_ref,
                     kf_ref, vf_ref, msc_ref, ssc_ref, g_ref, m8_ref,
                     sm_ref, xrd_ref, *, plan: _Plan, eps: float):
    P = plan
    l = pl.program_id(0)
    p = pl.program_id(1)
    f, maxq = P.f, 2 ** (P.num_bits - 1) - 1
    TM, B, D, r = P.TM, P.B, P.D, P.rank
    qdim = P.qdim
    scale = 1.0 / (D ** 0.5)

    def _int8_acc(w_ref, xq, rs, plane, chunk):
        """Unsigned-code int8 matmul accumulation + rank-1 bias removal."""
        TN = w_ref.shape[1]
        acc = jnp.zeros((TM, TN), jnp.int32)
        for c in range(plane // chunk):
            ch = w_ref[0, :, c * chunk:(c + 1) * chunk]
            for pp, u in enumerate(_unpack_chunk_planes(ch, P.num_bits)):
                koff = pp * plane + c * chunk
                acc += jax.lax.dot_general(
                    xq[:, koff:koff + chunk], u,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
        return acc - maxq * rs

    def _w4a8_block(w_ref, s2_ref, xq, rs, sx, plane, chunk, L_ref,
                    xr_win, gsi):
        """Standard W4A8 output block + L-factor add + global scale.
        ``s2_ref``: (1, TN, 2) — weight row scales and L-factor row scales
        merged into ONE operand (fewer per-program index-map/DMA checks;
        the ~1 us/program bookkeeping floor scales with operand count)."""
        acc = _int8_acc(w_ref, xq, rs, plane, chunk)
        Lb = L_ref[0].astype(jnp.float32).astype(jnp.bfloat16)   # (TN, r)
        ylr = jax.lax.dot_general(
            xr_win.astype(jnp.bfloat16), Lb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = (acc.astype(jnp.float32) * s2_ref[0, :, 0][None, :] * sx
               + ylr * s2_ref[0, :, 1][None, :])
        return out * gsi

    def _quantize_rows(y):
        """Per-row int8 activation quantization (+ scale, rowsum)."""
        amax = jnp.maximum(jnp.max(jnp.abs(y), axis=1, keepdims=True),
                           1e-12)
        sx = amax / 127.0
        x8 = jnp.clip(jnp.round(y / sx), -127, 127)
        rs = jnp.sum(x8, axis=1, keepdims=True).astype(jnp.int32)
        return x8.astype(jnp.int8), sx, rs

    # ---------------- PRE: attn norm + activation quant -----------------
    @pl.when(p == P.p_pre)
    def _pre():
        @pl.when(l == 0)
        def _init_x():
            # scatter the (B, h) embedding rows into the TM-row residual
            # scratch with a one-hot expansion (pad rows zero); sub-8-row
            # concat/pad paths miscompile under Mosaic
            expandf = (jax.lax.broadcasted_iota(jnp.int32, (TM, B), 0)
                       == jax.lax.broadcasted_iota(jnp.int32, (TM, B), 1)
                       ).astype(jnp.float32)
            x_ref[:] = jax.lax.dot_general(
                expandf, x0_ref[:].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            g_ref[:] = jnp.zeros_like(g_ref)

        x = x_ref[:]
        var = jnp.mean(x * x, axis=1, keepdims=True)
        y = x * jax.lax.rsqrt(var + eps) * an_ref[0]
        x8, sx, rs = _quantize_rows(y)
        y8_ref[:, :x8.shape[1]] = x8
        sy_ref[:] = jnp.broadcast_to(sx, sy_ref.shape)
        rsy_ref[:] = jnp.broadcast_to(rs, rsy_ref.shape)
        xr_ref[:] = jnp.zeros_like(xr_ref)

    # ---------------- XRQ: xr_qkv += y @ R_chunk.T ----------------------
    @pl.when((p >= P.p_xrq) & (p < P.p_xrq + P.nRq))
    def _xrq():
        x = x_ref[:]
        var = jnp.mean(x * x, axis=1, keepdims=True)
        c = p - P.p_xrq
        col = pl.multiple_of(c * P.rchunk, P.rchunk)
        xc = x_ref[:, pl.ds(col, P.rchunk)]
        anc = an_ref[0, :, pl.ds(col, P.rchunk)]          # (1, rchunk)
        y = (xc * jax.lax.rsqrt(var + eps) * anc).astype(jnp.bfloat16)
        Rc = (qR_ref[0].astype(jnp.float32)
              .astype(jnp.bfloat16))                    # (3r, rchunk)
        xr = jax.lax.dot_general(
            y, Rc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (TM, 3r)
        xr_ref[:, :3 * r] += xr * qRs_ref[0, :, 0][None, :]

    # ---------------- QKV blocks ----------------------------------------
    @pl.when((p >= P.p_qkv) & (p < P.p_qkv + P.nqkv))
    def _qkv():
        j = p - P.p_qkv
        col0 = j * P.bnq
        pid = ((col0 >= qdim).astype(jnp.int32)
               + (col0 >= qdim + P.kvdim).astype(jnp.int32))
        out = _w4a8_block(qw_ref, qs_ref, y8_ref[:], rsy_ref[:, :1],
                          sy_ref[:, :1], P.plane_q, P.chunk_q, qL_ref,
                          xr_ref[:, pl.ds(pl.multiple_of(pid * r, r), r)],
                          gs_ref[l, pid])
        qkv_ref[:, pl.ds(pl.multiple_of(col0, P.bnq), P.bnq)] = out

    # ---------------- ROPE + KV quantize + staging ----------------------
    @pl.when(p == P.p_rope)
    def _rope():
        cosf = cos_ref[:]                               # (TM, D)
        sinf = sin_ref[:]
        prot = prot_ref[:]                              # (D, D)
        ks_acc = jnp.zeros((TM, 128), jnp.float32)
        vs_acc = jnp.zeros((TM, 128), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TM, 128), 1)
        for kvh in range(P.KVH):
            qh = qkv_ref[:, kvh * D:(kvh + 1) * D]
            kh = qkv_ref[:, qdim + kvh * D:qdim + (kvh + 1) * D]
            vh = qkv_ref[:, 2 * qdim + kvh * D:2 * qdim + (kvh + 1) * D]
            qr = qh * cosf + jax.lax.dot_general(
                qh, prot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * sinf
            kr = kh * cosf + jax.lax.dot_general(
                kh, prot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * sinf
            qkv_ref[:, kvh * D:(kvh + 1) * D] = qr
            # int8 KV quantization per (row, head) — llama.quantize_kv
            kamax = jnp.maximum(
                jnp.max(jnp.abs(kr), axis=1, keepdims=True), 1e-12)
            ksch = kamax / 127.0
            k8 = jnp.clip(jnp.round(kr / ksch), -127, 127).astype(jnp.int8)
            vamax = jnp.maximum(
                jnp.max(jnp.abs(vh), axis=1, keepdims=True), 1e-12)
            vsch = vamax / 127.0
            v8 = jnp.clip(jnp.round(vh / vsch), -127, 127).astype(jnp.int8)
            k8_ref[0, :, kvh, :] = k8[:B]
            v8_ref[0, :, kvh, :] = v8[:B]
            # dequantized staging for the in-kernel current-token update
            kf_ref[:, kvh * D:(kvh + 1) * D] = (
                k8[:B].astype(jnp.float32) * ksch[:B])
            vf_ref[:, kvh * D:(kvh + 1) * D] = (
                v8[:B].astype(jnp.float32) * vsch[:B])
            ks_acc = jnp.where(lane == kvh,
                               jnp.broadcast_to(ksch, (TM, 128)), ks_acc)
            vs_acc = jnp.where(lane == kvh,
                               jnp.broadcast_to(vsch, (TM, 128)), vs_acc)
        ks8_ref[0] = ks_acc[:B, :P.KVH]
        vs8_ref[0] = vs_acc[:B, :P.KVH]

    # ---------------- ATTENTION (head-block x token-block grid) ---------
    @pl.when((p >= P.p_attn) & (p < P.p_attn + P.natt))
    def _attn():
        a = p - P.p_attn
        ki = a // P.nt                      # head-block index
        t = a % P.nt                        # token-block index
        kh0 = ki * P.KVHb
        posc = posv_ref[:, :1]              # (TM, 1) i32
        lane = jax.lax.broadcasted_iota(jnp.int32, (TM, 128), 1)
        # (B -> TM) row expansion as a matmul: sub-8-row concatenates
        # miscompile under Mosaic (observed: row 0 exact, row 1 corrupt at
        # B=2), so batch-row results are scattered back to the TM-row
        # scratch with a one-hot expansion dot (pad rows land 0 — only
        # rows < B are ever read back)
        expandf = (jax.lax.broadcasted_iota(jnp.int32, (TM, B), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (TM, B), 1)
                   ).astype(jnp.float32)

        def _expand(v):                      # (B, N) -> (TM, N)
            return jax.lax.dot_general(
                expandf, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(t == 0)
        def _init():
            for i in range(P.KVHb):
                colsel = lane == (kh0 + i)
                msc_ref[:] = jnp.where(colsel, _NEG_INF, msc_ref[:])
                ssc_ref[:] = jnp.where(colsel, 0.0, ssc_ref[:])
                acc0 = pl.multiple_of((kh0 + i) * D, D)
                qkv_ref[:, pl.ds(qdim + acc0, D)] = jnp.zeros(
                    (TM, D), jnp.float32)

        live = (t <= lastb_ref[0])

        @pl.when(live)
        def _blocks():
            tok = t * P.bt + jax.lax.broadcasted_iota(
                jnp.int32, (TM, P.bt), 1)
            valid = tok < posc                          # staged: cache<pos
            for i in range(P.KVHb):
                colsel = lane == (kh0 + i)
                qcol = pl.multiple_of((kh0 + i) * D, D)
                q = qkv_ref[:, pl.ds(qcol, D)]          # (TM, D) f32
                k = kc_ref[0, :, i].astype(jnp.float32)  # (B, bt, D)
                ks = ksc_ref[0, :, i]                    # (B, bt)
                # Mosaic's dot lowering needs a free dim on BOTH operands
                # (a rank-2 lhs with batch+contract only fails to parse);
                # give q a unit free dim and drop it after
                logits = jax.lax.dot_general(
                    q[:B][:, None, :], k,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, 0]
                logits = logits * (ks * scale)
                logits = jnp.where(valid[:B], logits, _NEG_INF)
                m_prev = jnp.max(
                    jnp.where(colsel, msc_ref[:], _NEG_INF),
                    axis=1, keepdims=True)              # (TM, 1)
                m_new = jnp.maximum(
                    m_prev[:B], jnp.max(logits, axis=1, keepdims=True))
                alpha = jnp.exp(m_prev[:B] - m_new)
                pv = jnp.where(valid[:B], jnp.exp(logits - m_new), 0.0)
                s_prev = jnp.sum(jnp.where(colsel, ssc_ref[:], 0.0),
                                 axis=1, keepdims=True)
                s_new = s_prev[:B] * alpha + jnp.sum(pv, axis=1,
                                                     keepdims=True)
                v = vc_ref[0, :, i].astype(jnp.float32)
                vs = vsc_ref[0, :, i]
                pvv = pv * vs
                upd = jax.lax.dot_general(
                    pvv[:, None, :], v,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, 0]  # (B, D)
                acc_old = qkv_ref[:, pl.ds(qdim + qcol, D)]
                accB = acc_old[:B] * alpha + upd
                qkv_ref[:, pl.ds(qdim + qcol, D)] = _expand(accB)
                mfull = _expand(m_new)                    # (TM, 1)
                sfull = _expand(s_new)
                msc_ref[:] = jnp.where(
                    colsel, jnp.broadcast_to(mfull, (TM, 128)), msc_ref[:])
                ssc_ref[:] = jnp.where(
                    colsel, jnp.broadcast_to(sfull, (TM, 128)), ssc_ref[:])

        @pl.when(t == P.nt - 1)
        def _fin_heads():
            # current token's staged K/V: one extra online-softmax update,
            # then normalize and land the head in the ao region
            for i in range(P.KVHb):
                colsel = lane == (kh0 + i)
                qcol = pl.multiple_of((kh0 + i) * D, D)
                q = qkv_ref[:, pl.ds(qcol, D)][:B]       # (B, D)
                kn = kf_ref[:, pl.ds(qcol, D)]           # (B, D)
                logit = jnp.sum(q * kn, axis=1, keepdims=True) * scale
                m_prev = jnp.max(
                    jnp.where(colsel, msc_ref[:], _NEG_INF),
                    axis=1, keepdims=True)[:B]
                m_new = jnp.maximum(m_prev, logit)
                alpha = jnp.exp(m_prev - m_new)
                pv = jnp.exp(logit - m_new)
                s_prev = jnp.sum(jnp.where(colsel, ssc_ref[:], 0.0),
                                 axis=1, keepdims=True)[:B]
                s = s_prev * alpha + pv
                vn = vf_ref[:, pl.ds(qcol, D)]
                acc = qkv_ref[:, pl.ds(qdim + qcol, D)][:B]
                out = (acc * alpha + pv * vn) / s        # (B, D)
                # land the finished head in the (consumed) V region
                qkv_ref[:, pl.ds(2 * qdim + qcol, D)] = _expand(out)

    # ---------------- FIN: requantize attention output ------------------
    @pl.when(p == P.p_fin)
    def _fin():
        ao = qkv_ref[:, 2 * qdim:3 * qdim]
        x8, sx, rs = _quantize_rows(ao)
        y8_ref[:, :x8.shape[1]] = x8
        sy_ref[:] = jnp.broadcast_to(sx, sy_ref.shape)
        rsy_ref[:] = jnp.broadcast_to(rs, rsy_ref.shape)
        xr_ref[:] = jnp.zeros_like(xr_ref)

    # ---------------- XRO: xr_o chunks ----------------------------------
    @pl.when((p >= P.p_xro) & (p < P.p_xro + P.nRo))
    def _xro():
        c = p - P.p_xro
        col = pl.multiple_of(c * P.rchunk_o, P.rchunk_o)
        aoc = qkv_ref[:, pl.ds(2 * qdim + col,
                               P.rchunk_o)].astype(jnp.bfloat16)
        Rc = oR_ref[0].astype(jnp.float32).astype(jnp.bfloat16)  # (r, rc)
        xr = jax.lax.dot_general(
            aoc, Rc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        xr_ref[:, :r] += xr * oRs_ref[0, :, 0][None, :]

    # ---------------- O blocks + residual -------------------------------
    @pl.when((p >= P.p_o) & (p < P.p_o + P.no))
    def _o():
        j = p - P.p_o
        out = _w4a8_block(ow_ref, os_ref, y8_ref[:], rsy_ref[:, :1],
                          sy_ref[:, :1], P.plane_o, P.chunk_o,
                          oL_ref, xr_ref[:, :r], gs_ref[l, 3])
        col = pl.multiple_of(j * P.bno, P.bno)
        x_ref[:, pl.ds(col, P.bno)] += out

    # ---------------- MLP: norm + quant ---------------------------------
    @pl.when(p == P.p_mlp)
    def _mlp():
        x = x_ref[:]
        var = jnp.mean(x * x, axis=1, keepdims=True)
        y = x * jax.lax.rsqrt(var + eps) * mn_ref[0]
        x8, sx, rs = _quantize_rows(y)
        y8_ref[:, :x8.shape[1]] = x8
        sy_ref[:] = jnp.broadcast_to(sx, sy_ref.shape)
        rsy_ref[:] = jnp.broadcast_to(rs, rsy_ref.shape)
        xr_ref[:] = jnp.zeros_like(xr_ref)
        xrd_ref[:] = jnp.zeros_like(xrd_ref)
        sm_ref[:] = jnp.zeros_like(sm_ref)    # per-up-block absmax slots

    # ---------------- XRG: xr_gateup chunks ------------------------------
    @pl.when((p >= P.p_xrg) & (p < P.p_xrg + P.nRq))
    def _xrg():
        x = x_ref[:]
        var = jnp.mean(x * x, axis=1, keepdims=True)
        c = p - P.p_xrg
        col = pl.multiple_of(c * P.rchunk, P.rchunk)
        xc = x_ref[:, pl.ds(col, P.rchunk)]
        mnc = mn_ref[0, :, pl.ds(col, P.rchunk)]          # (1, rchunk)
        y = (xc * jax.lax.rsqrt(var + eps) * mnc).astype(jnp.bfloat16)
        Rc = gR_ref[0].astype(jnp.float32).astype(jnp.bfloat16)  # (2r, rc)
        xr = jax.lax.dot_general(
            y, Rc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        xr_ref[:, :2 * r] += xr * gRs_ref[0, :, 0][None, :]

    # ---------------- GATE+UP interleaved blocks -------------------------
    @pl.when((p >= P.p_gu) & (p < P.p_gu + P.ng))
    def _gu():
        # the gate/up weights arrive INTERLEAVED by bng-row blocks
        # ([g_j ++ u_j]; see persistent.prepare_gateup_interleaved), so
        # ONE program computes both halves with a single (TM, 2*bng)
        # int8 matmul, applies silu-mul immediately, and stages the
        # intermediate — half the programs and no gate staging round trip
        # vs the separate GATE/UP phases of the first build
        j = p - P.p_gu
        acc = _int8_acc(gw_ref, y8_ref[:], rsy_ref[:, :1], P.plane_q,
                        P.chunk_gu)                      # (TM, 2*bng)
        base = acc.astype(jnp.float32) * gss_ref[0, :, 0][None, :] \
            * sy_ref[:, :1]
        Lg = gL_ref[0, :P.bng].astype(jnp.float32).astype(jnp.bfloat16)
        Lu = gL_ref[0, P.bng:].astype(jnp.float32).astype(jnp.bfloat16)
        ylr_g = jax.lax.dot_general(
            xr_ref[:, :r].astype(jnp.bfloat16), Lg,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ylr_u = jax.lax.dot_general(
            xr_ref[:, pl.ds(r, r)].astype(jnp.bfloat16), Lu,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ylr = jnp.concatenate([ylr_g, ylr_u], axis=1)
        out = base + ylr * gss_ref[0, :, 1][None, :]
        gate = out[:, :P.bng] * gs_ref[l, 4]
        up = out[:, P.bng:] * gs_ref[l, 5]
        m = (gate * jax.lax.logistic(gate)) * up         # silu(g) * up
        # down R contribution streams with the producing block
        Rb = dR_ref[0].astype(jnp.float32).astype(jnp.bfloat16)  # (r, bng)
        xrd_ref[:] += jax.lax.dot_general(
            m.astype(jnp.bfloat16), Rb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * dRs_ref[0, :, 0][None, :]
        # bf16 staging + per-block absmax; ONE DQ transition then does the
        # per-ROW int8 requant (per-group-in-block requant forced 128-col
        # chunk-dots in DOWN — measured ~13 ms/step of loop overhead)
        col = pl.multiple_of(j * P.bng, P.bng)
        g_ref[:, pl.ds(col, P.bng)] = m.astype(jnp.bfloat16)
        amax = jnp.max(jnp.abs(m), axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TM, 128), 1)
        sm_ref[:] = jnp.where(lane == j,
                              jnp.broadcast_to(amax, (TM, 128)), sm_ref[:])

    # ---------------- DQ: per-row int8 requant of the intermediate -------
    @pl.when(p == P.p_dq)
    def _dq():
        # row absmax from the per-block maxes (garbage columns were
        # zeroed at MLP), then quantize the bf16 staging in column chunks
        # (a whole-array f32 materialization of the (TM, im) intermediate
        # would be ~3 MB of kernel stack — the scoped-vmem peak)
        amax = jnp.maximum(jnp.max(sm_ref[:], axis=1, keepdims=True),
                           1e-12)
        sx = amax / 127.0
        cq = P.im
        while cq > 2048:
            cq //= 2
        rs = jnp.zeros((TM, 1), jnp.float32)
        for c in range(P.im // cq):
            m = g_ref[:, c * cq:(c + 1) * cq].astype(jnp.float32)
            m8 = jnp.clip(jnp.round(m / sx), -127, 127)
            m8_ref[:, c * cq:(c + 1) * cq] = m8.astype(jnp.int8)
            rs = rs + jnp.sum(m8, axis=1, keepdims=True)
        sy_ref[:] = jnp.broadcast_to(sx, sy_ref.shape)
        rsy_ref[:] = jnp.broadcast_to(rs.astype(jnp.int32), rsy_ref.shape)

    # ---------------- DOWN blocks + residual -----------------------------
    @pl.when((p >= P.p_down) & (p < P.p_down + P.nd))
    def _down():
        j = p - P.p_down
        out = _w4a8_block(dw_ref, ds_ref, m8_ref[:], rsy_ref[:, :1],
                          sy_ref[:, :1], P.plane_d, P.chunk_d,
                          dL_ref, xrd_ref[:], gs_ref[l, 6])
        col = pl.multiple_of(j * P.bnd, P.bnd)
        xn = x_ref[:, pl.ds(col, P.bnd)] + out
        x_ref[:, pl.ds(col, P.bnd)] = xn
        xout_ref[:, pl.ds(col, P.bnd)] = xn[:B]


@functools.partial(
    jax.jit,
    static_argnames=("num_bits", "rank", "eps", "interpret", "kvhd"))
def megastep(x0: Array, pos: Array,
             attn_norm: Array, mlp_norm: Array,
             qkv_packed: Array, qkv_scales: Array, qkv_R: Array,
             qkv_Rs: Array, qkv_L: Array, qkv_Ls: Array,
             o_packed: Array, o_scales: Array, o_R: Array, o_Rs: Array,
             o_L: Array, o_Ls: Array,
             gu_packed: Array, gu_scales: Array, gu_R: Array, gu_Rs: Array,
             gu_L: Array, gu_Ls: Array,
             dn_packed: Array, dn_scales: Array, dn_R: Array, dn_Rs: Array,
             dn_L: Array, dn_Ls: Array,
             gs_all: Array,
             kc: Array, ksc: Array, vc: Array, vsc: Array,
             cos: Array, sin: Array,
             num_bits: int, rank: int, eps: float, kvhd: Tuple[int, int],
             interpret: bool = False):
    """Run the whole 32-layer decode stack as ONE pallas_call.

    Arrays as stacked by :mod:`models.fused` (factor_kernel='l' layout:
    int8 R with row scales, N-concatenated int8 L), EXCEPT the gate/up
    family (``gu_packed``/``gu_scales``/``gu_L``/``gu_Ls``), which must be
    INTERLEAVED by ``bng``-row blocks (``[gate_j ++ up_j]`` — see
    ``models.persistent.prepare_gateup_interleaved``; pre-compute it ONCE
    at load, the packed array is GB-scale). ``gs_all`` is ``(L, 8)`` f32
    global scales ``[q, k, v, o, gate, up, down, 0]``. ``cos``/``sin``
    are the (B, D/2) rope tables of the CURRENT position.

    Returns ``(x_out (B, h) f32, k8 (L, B, KVH, D) i8, ks (L, B, KVH) f32,
    v8, vs)`` — the final hidden state (pre-final-norm) plus this step's
    staged KV for the caller's end-of-step cache commit (staged-KV
    semantics: the cache passed in must hold tokens ``< pos`` only).
    """
    KVH, D = kvhd
    Lk, B = kc.shape[0], x0.shape[0]
    T = kc.shape[3]
    h = x0.shape[1]
    qdim = KVH * D
    im = dn_packed.shape[2] * _pack_factor(num_bits)
    plan = _Plan(h=h, im=im, qdim=qdim, kvdim=qdim, KVH=KVH, D=D,
                 rank=rank, num_bits=num_bits, B=B, T=T)
    assert plan.supported(), "megastep constraints violated"
    TM = plan.TM
    # merge (weight row scales, L row scales) into ONE (L, N, 2) operand
    # per family — ~9% fewer per-program index-map/DMA checks (the
    # scales are MB-scale, so the per-call concat is noise)
    qs2 = jnp.concatenate([qkv_scales, qkv_Ls], axis=2).astype(jnp.float32)
    os2 = jnp.concatenate([o_scales, o_Ls], axis=2).astype(jnp.float32)
    gs2 = jnp.concatenate([gu_scales, gu_Ls], axis=2).astype(jnp.float32)
    ds2 = jnp.concatenate([dn_scales, dn_Ls], axis=2).astype(jnp.float32)

    x0p = x0.astype(jnp.float32)                  # (B, h); expanded in-kernel
    # full-width rope tables (rotate-half form): duplicate halves, padded
    cosf = jnp.zeros((TM, D), jnp.float32).at[:B].set(
        jnp.concatenate([cos, cos], axis=-1).astype(jnp.float32))
    sinf = jnp.zeros((TM, D), jnp.float32).at[:B].set(
        jnp.concatenate([sin, sin], axis=-1).astype(jnp.float32))
    # rotate-half permutation as a matmul: out = x @ Prot
    half = D // 2
    i = jnp.arange(D)
    j = jnp.arange(D)
    Prot = (jnp.where((i[:, None] == j[None, :] + half) & (j[None, :] < half),
                      -1.0, 0.0)
            + jnp.where((i[:, None] + half == j[None, :]), 1.0, 0.0)
            ).astype(jnp.float32)
    posv = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32)[:, None], (B, 128))
    posv = jnp.zeros((TM, 128), jnp.int32).at[:B].set(posv)
    lastb = (jnp.max(jnp.maximum(pos - 1, 0)) // plan.bt).astype(
        jnp.int32).reshape(1)

    P = plan

    # --- index maps (args: l, p, then prefetch refs pos, lastb, gs) -----
    def _const2(l, p, *_):
        return (0, 0)

    def _qkv_j(l, p, *_):
        return jnp.clip(p - P.p_qkv, 0, P.nqkv - 1)

    def _o_j(l, p, *_):
        return jnp.clip(p - P.p_o, 0, P.no - 1)

    def _g_j(l, p, *_):
        # interleaved gate+up blocks: one (2*bng)-row block per program
        return jnp.clip(p - P.p_gu, 0, P.ng - 1)

    def _d_j(l, p, *_):
        return jnp.clip(p - P.p_down, 0, P.nd - 1)

    def _dR_j(l, p, *_):
        return jnp.clip(p - P.p_gu, 0, P.ng - 1)

    # fetch-once R slabs: advance to layer l+1 after their last use so the
    # next layer's slab streams in behind the remaining programs
    def _qR_idx(l, p, *_):
        lsel = jnp.where(p >= P.p_qkv, jnp.minimum(l + 1, Lk - 1), l)
        c = jnp.clip(p - P.p_xrq, 0, P.nRq - 1)
        return (lsel, 0, c)

    def _qRs_idx(l, p, *_):
        lsel = jnp.where(p >= P.p_qkv, jnp.minimum(l + 1, Lk - 1), l)
        return (lsel, 0, 0)

    def _oR_idx(l, p, *_):
        lsel = jnp.where(p >= P.p_o, jnp.minimum(l + 1, Lk - 1), l)
        c = jnp.clip(p - P.p_xro, 0, P.nRo - 1)
        return (lsel, 0, c)

    def _oRs_idx(l, p, *_):
        lsel = jnp.where(p >= P.p_o, jnp.minimum(l + 1, Lk - 1), l)
        return (lsel, 0, 0)

    def _gR_idx(l, p, *_):
        lsel = jnp.where(p >= P.p_gu, jnp.minimum(l + 1, Lk - 1), l)
        c = jnp.clip(p - P.p_xrg, 0, P.nRq - 1)
        return (lsel, 0, c)

    def _gRs_idx(l, p, *_):
        lsel = jnp.where(p >= P.p_gu, jnp.minimum(l + 1, Lk - 1), l)
        return (lsel, 0, 0)

    # clamp token index past the live blocks (DMA elision); LB is the
    # SECOND prefetch ref (pos, lastb, gs)
    def _k_idx(l, p, PS, LB, GS):
        a = jnp.clip(p - P.p_attn, 0, P.natt - 1)
        ki = a // P.nt
        t = jnp.minimum(a % P.nt, LB[0])
        return (l, 0, ki, t, 0)

    def _ks_idx(l, p, PS, LB, GS):
        a = jnp.clip(p - P.p_attn, 0, P.natt - 1)
        ki = a // P.nt
        t = jnp.minimum(a % P.nt, LB[0])
        return (l, 0, ki, t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Lk, P.P),
        in_specs=[
            pl.BlockSpec((B, h), _const2),                        # x0
            # norms ride as (L, 1, h): a (1, h) block of (L, h) violates
            # the Mosaic second-minor rule (1 is neither 8-divisible nor
            # the full L dim); with the unit axis it IS the full dim
            pl.BlockSpec((1, 1, h), lambda l, p, *_: (l, 0, 0)),  # attn_norm
            pl.BlockSpec((1, 1, h), lambda l, p, *_: (l, 0, 0)),  # mlp_norm
            pl.BlockSpec((1, P.bnq, P.plane_q),
                         lambda l, p, *_: (l, _qkv_j(l, p), 0)),  # qw
            pl.BlockSpec((1, P.bnq, 2),
                         lambda l, p, *_: (l, _qkv_j(l, p), 0)),  # qs2
            pl.BlockSpec((1, 3 * rank, P.rchunk), _qR_idx),       # qR
            pl.BlockSpec((1, 3 * rank, 1), _qRs_idx),             # qRs
            pl.BlockSpec((1, P.bnq, rank),
                         lambda l, p, *_: (l, _qkv_j(l, p), 0)),  # qL
            pl.BlockSpec((TM, D), _const2),                       # cos
            pl.BlockSpec((TM, D), _const2),                       # sin
            pl.BlockSpec((D, D), _const2),                        # prot
            pl.BlockSpec((1, B, P.KVHb, P.bt, D), _k_idx),        # kc
            pl.BlockSpec((1, B, P.KVHb, P.bt), _ks_idx),          # ksc
            pl.BlockSpec((1, B, P.KVHb, P.bt, D), _k_idx),        # vc
            pl.BlockSpec((1, B, P.KVHb, P.bt), _ks_idx),          # vsc
            pl.BlockSpec((TM, 128), _const2),                     # posv
            pl.BlockSpec((1, P.bno, P.plane_o),
                         lambda l, p, *_: (l, _o_j(l, p), 0)),    # ow
            pl.BlockSpec((1, P.bno, 2),
                         lambda l, p, *_: (l, _o_j(l, p), 0)),    # os2
            pl.BlockSpec((1, rank, P.rchunk_o), _oR_idx),         # oR
            pl.BlockSpec((1, rank, 1), _oRs_idx),                 # oRs
            pl.BlockSpec((1, P.bno, rank),
                         lambda l, p, *_: (l, _o_j(l, p), 0)),    # oL
            pl.BlockSpec((1, 2 * P.bng, P.plane_q),
                         lambda l, p, *_: (l, _g_j(l, p), 0)),    # gw
            pl.BlockSpec((1, 2 * P.bng, 2),
                         lambda l, p, *_: (l, _g_j(l, p), 0)),    # gs2
            pl.BlockSpec((1, 2 * rank, P.rchunk), _gR_idx),       # gR
            pl.BlockSpec((1, 2 * rank, 1), _gRs_idx),             # gRs
            pl.BlockSpec((1, 2 * P.bng, rank),
                         lambda l, p, *_: (l, _g_j(l, p), 0)),    # gL
            pl.BlockSpec((1, P.bnd, P.plane_d),
                         lambda l, p, *_: (l, _d_j(l, p), 0)),    # dw
            pl.BlockSpec((1, P.bnd, 2),
                         lambda l, p, *_: (l, _d_j(l, p), 0)),    # ds2
            pl.BlockSpec((1, rank, P.bng),
                         lambda l, p, *_: (l, 0, _dR_j(l, p))),   # dR
            pl.BlockSpec((1, rank, 1),
                         lambda l, p, *_: (l, 0, 0)),             # dRs
            pl.BlockSpec((1, P.bnd, rank),
                         lambda l, p, *_: (l, _d_j(l, p), 0)),    # dL
        ],
        out_specs=[
            pl.BlockSpec((B, h), _const2),                        # xout
            pl.BlockSpec((1, B, KVH, D), lambda l, p, *_: (l, 0, 0, 0)),
            pl.BlockSpec((1, B, KVH), lambda l, p, *_: (l, 0, 0)),
            pl.BlockSpec((1, B, KVH, D), lambda l, p, *_: (l, 0, 0, 0)),
            pl.BlockSpec((1, B, KVH), lambda l, p, *_: (l, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TM, h), jnp.float32),          # x (residual)
            pltpu.VMEM((TM, max(h, qdim)), jnp.int8),  # y8 / a8
            pltpu.VMEM((TM, 128), jnp.float32),        # sy
            pltpu.VMEM((TM, 128), jnp.int32),          # rsy
            pltpu.VMEM((TM, 3 * rank), jnp.float32),   # xr
            pltpu.VMEM((TM, 3 * qdim), jnp.float32),   # qkv: q|k->acc|v->ao
            pltpu.VMEM((B, qdim), jnp.float32),        # kf staging
            pltpu.VMEM((B, qdim), jnp.float32),        # vf staging
            pltpu.VMEM((TM, 128), jnp.float32),        # attn running max
            pltpu.VMEM((TM, 128), jnp.float32),        # attn running sum
            pltpu.VMEM((TM, im), jnp.bfloat16),        # silu-mul staging (m)
            pltpu.VMEM((TM, im), jnp.int8),            # m8
            pltpu.VMEM((TM, 128), jnp.float32),        # per-gu-block absmax
            pltpu.VMEM((TM, rank), jnp.float32),       # xrd
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, h), jnp.float32),
        jax.ShapeDtypeStruct((Lk, B, KVH, D), jnp.int8),
        jax.ShapeDtypeStruct((Lk, B, KVH), jnp.float32),
        jax.ShapeDtypeStruct((Lk, B, KVH, D), jnp.int8),
        jax.ShapeDtypeStruct((Lk, B, KVH), jnp.float32),
    ]
    xo, k8, ks8, v8, vs8 = pl.pallas_call(
        functools.partial(_megastep_kernel, plan=plan, eps=eps),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32), lastb,
      gs_all.astype(jnp.float32),
      x0p, attn_norm.astype(jnp.float32)[:, None, :],
      mlp_norm.astype(jnp.float32)[:, None, :],
      qkv_packed, qs2, qkv_R,
      qkv_Rs.astype(jnp.float32), qkv_L,
      cosf, sinf, Prot,
      kc, ksc.astype(jnp.float32), vc, vsc.astype(jnp.float32), posv,
      o_packed, os2, o_R,
      o_Rs.astype(jnp.float32), o_L,
      gu_packed, gs2, gu_R,
      gu_Rs.astype(jnp.float32), gu_L,
      dn_packed, ds2, dn_R,
      dn_Rs.astype(jnp.float32), dn_L)
    return xo, k8, ks8, v8, vs8
