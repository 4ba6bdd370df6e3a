"""E8 lattice codebook quantization (QuIP#-style ``e8p``, 2 bits/weight).

The reference framework's 2-bit regime uses scalar absmax/NF codebooks; its
Hadamard incoherence path (reference ``main.py:75-133``) rotates weights into
a Gaussian-like basis but then quantizes with the same scalar quantizers —
which, as measured in PERFORMANCE.md, *loses* to unrotated quantization
because 3-level absmax on a Gaussianized matrix is worse than letting
per-block scales absorb sparse spikes. Incoherence processing pays off only
with a distribution-matched *vector* codebook. This module supplies one:

- **Codebook**: the 2^16 smallest-norm points of the shifted lattice
  ``E8 + 1/4`` (Gosset lattice; densest sphere packing in 8 dims). Each
  16-bit code indexes an 8-dim codeword, i.e. exactly 2 bits/weight — the
  same rate as the reference's 2-bit quantizers, with ~0.65 dB shaping +
  packing gain on Gaussian sources.
- **Encode**: exact nearest-codeword search. The hot path is the classic
  Conway–Sloane nearest-point algorithm in E8 (round to D8 with a parity
  fix, for both cosets), which is exact whenever the nearest lattice point
  lies inside the codebook ball; the rare out-of-ball vectors fall back to
  a brute-force MXU argmin over the full codebook (distance expansion
  ``||y||^2 - 2 y.C^T + ||c||^2`` — a matmul, so the fallback also runs at
  MXU speed). Everything is jittable with static shapes.
- **Scale search**: per-block scale chosen from a small RMS-relative
  candidate grid by measured reconstruction error (vectorized over
  candidates), since the optimal load factor of a bounded codebook depends
  on the block's distribution shape.

E8 facts used here (Conway & Sloane, SPLAG ch. 4 + ch. 20):
``E8 = D8 ∪ (D8 + 1/2·1)`` where ``D8 = {x ∈ Z^8 : Σx even}``; nearest
point in ``Z^8`` is coordinate-wise rounding, and nearest in ``D8`` is that
rounding with the worst coordinate re-rounded the other way when the
coordinate sum is odd.

No reference-file counterpart exists (the reference has no vector/lattice
quantizer); this extends the §2.3 quantizer family beyond parity.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

CODEBOOK_BITS = 16
DIM = 8

# Default per-block scale candidates, relative to the block RMS. Measured on
# N(0,1) blocks: gamma=0.95-1.0 is optimal (MSE 0.090 vs Lloyd-Max scalar
# 0.1175); smaller gammas win on heavy-tailed blocks (clipping protection).
DEFAULT_SCALE_GRID = (0.7, 0.8, 0.9, 1.0, 1.1, 1.3)

_CODEBOOK_CACHE: Optional[np.ndarray] = None


def _enumerate_shifted_coset(delta: float, r2: float) -> np.ndarray:
    """All vectors ``k + delta`` (k ∈ Z^8, Σk even) with squared norm ≤ r2.

    Incremental prefix extension with norm pruning — pure NumPy, runs once
    at first use (~1 s host time), cached.
    """
    kmax = int(np.floor(np.sqrt(r2) - delta)) + 1
    kmin = -int(np.floor(np.sqrt(r2) + delta)) - 1
    coords = np.arange(kmin, kmax + 1, dtype=np.int32)
    vals = coords.astype(np.float64) + delta
    keep = vals * vals <= r2
    coords, vals = coords[keep], vals[keep]

    prefixes = coords[:, None]                       # (P, d) int32
    norms = vals * vals                              # (P,)
    for _ in range(DIM - 1):
        norms = (norms[:, None] + (vals * vals)[None, :]).reshape(-1)
        prefixes = np.concatenate(
            [np.repeat(prefixes, len(coords), axis=0),
             np.tile(coords[:, None], (len(prefixes), 1))], axis=1)
        keep = norms <= r2
        prefixes, norms = prefixes[keep], norms[keep]
    even = prefixes.sum(axis=1) % 2 == 0
    return (prefixes[even].astype(np.float64) + delta)


def build_e8p_codebook(num_entries: int = 1 << CODEBOOK_BITS,
                       r2: float = 14.0) -> np.ndarray:
    """The ``num_entries`` smallest-norm points of ``E8 + 1/4·1``.

    ``E8 + 1/4`` splits into integer+1/4 and half-integer+1/4 coordinates,
    i.e. the two shifted cosets ``(Z^8 + 0.25)`` and ``(Z^8 + 0.75)`` with
    even integer-part sum. Ties at equal norm break lexicographically so the
    codebook is deterministic. r2=14 yields ~1.6e5 candidates ≥ 2^16.
    """
    pts = np.concatenate([_enumerate_shifted_coset(0.25, r2),
                          _enumerate_shifted_coset(0.75, r2)], axis=0)
    if len(pts) < num_entries:
        raise ValueError(
            f"ball r2={r2} holds only {len(pts)} lattice points < "
            f"{num_entries}; increase r2")
    norms = (pts * pts).sum(axis=1)
    order = np.lexsort(tuple(pts[:, d] for d in range(DIM - 1, -1, -1))
                       + (norms,))
    return np.ascontiguousarray(pts[order[:num_entries]], dtype=np.float32)


def e8p_codebook() -> np.ndarray:
    """Cached 2^16 x 8 float32 codebook (2 MB)."""
    global _CODEBOOK_CACHE
    if _CODEBOOK_CACHE is None:
        _CODEBOOK_CACHE = build_e8p_codebook()
    return _CODEBOOK_CACHE


def codebook_radius2() -> float:
    cb = e8p_codebook()
    return float((cb * cb).sum(axis=1).max())


# ---------------------------------------------------------------------------
# Conway-Sloane nearest point in E8 (vectorized, jittable)
# ---------------------------------------------------------------------------

def _nearest_d8(y: Array) -> Array:
    """Nearest point of D8 = {x ∈ Z^8 : Σx even} to each row of y."""
    f = jnp.round(y)
    # If the coordinate sum is odd, re-round the coordinate with the largest
    # rounding error in the other direction (cost-minimal parity fix).
    err = y - f
    worst = jnp.argmax(jnp.abs(err), axis=-1)
    flip = jnp.where(err[jnp.arange(y.shape[0]), worst] >= 0, 1.0, -1.0)
    odd = (jnp.sum(f, axis=-1).astype(jnp.int32) % 2) != 0
    fixed = f.at[jnp.arange(y.shape[0]), worst].add(
        jnp.where(odd, flip, 0.0))
    return fixed


def nearest_e8(y: Array) -> Array:
    """Nearest point of E8 to each row of ``y`` (N, 8), exactly."""
    half = jnp.asarray(0.5, y.dtype)
    cand0 = _nearest_d8(y)
    cand1 = _nearest_d8(y - half) + half
    d0 = jnp.sum((y - cand0) ** 2, axis=-1)
    d1 = jnp.sum((y - cand1) ** 2, axis=-1)
    return jnp.where((d0 <= d1)[:, None], cand0, cand1)


# ---------------------------------------------------------------------------
# Encode / decode
# ---------------------------------------------------------------------------

_HASH_CACHE: Optional[Tuple[int, np.ndarray, np.ndarray]] = None


def _hash_table() -> Tuple[int, np.ndarray, np.ndarray]:
    """(multiplier, sorted codebook hash keys, sort order) — host-cached.

    4*(E8 + 1/4) has small integer coordinates; the full 8-coordinate
    positional code needs ~40 bits, which JAX lacks without x64. A 32-bit
    multiplicative mix suffices as long as it is collision-free on the 2^16
    actual codebook entries — verified (and bumped if needed) host-side once.
    Pre-sorting host-side keeps a 65536-element argsort out of every XLA
    compile (it constant-folds for ~2 s otherwise).
    """
    global _HASH_CACHE
    if _HASH_CACHE is None:
        q = (np.round(e8p_codebook() * 4).astype(np.int64) + 16).astype(
            np.uint32)
        for mult in (2654435761, 2246822519, 3266489917, 668265263):
            k = np.zeros(q.shape[0], np.uint32)
            for d in range(DIM):
                k = (k ^ q[:, d]) * np.uint32(mult)
            if len(np.unique(k)) == q.shape[0]:
                order = np.argsort(k).astype(np.int32)
                _HASH_CACHE = (mult, k[order], order)
                break
        else:  # pragma: no cover - astronomically unlikely
            raise RuntimeError("no collision-free codebook hash multiplier")
    return _HASH_CACHE


def _codeword_index(points: Array) -> Array:
    """Map exact lattice points (N, 8) to canonical-codebook row indices.

    O(N log M) searchsorted on a mixing hash that is collision-free on the
    codebook (see ``_hash_table``); callers verify the result by equality,
    so a hash miss for an out-of-codebook point is harmless. Only valid for
    the canonical :func:`e8p_codebook` ordering.
    """
    mult, sorted_keys, order = _hash_table()
    mult = jnp.uint32(mult)

    q = (jnp.round(points * 4).astype(jnp.int32) + 16).astype(jnp.uint32)
    k = jnp.zeros(points.shape[0], jnp.uint32)
    for d in range(DIM):
        k = (k ^ q[:, d]) * mult

    pos = jnp.searchsorted(jnp.asarray(sorted_keys), k)
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    return jnp.asarray(order)[pos].astype(jnp.uint32)


def _brute_force_encode(y: Array, codebook: Array,
                        chunk: int = 512) -> Array:
    """Exact argmin_{c in codebook} ||y - c||^2 via MXU matmul, chunked."""
    c_norm = jnp.sum(codebook * codebook, axis=1)      # (M,)
    n = y.shape[0]
    pad = (-n) % chunk
    yp = jnp.pad(y, ((0, pad), (0, 0)))

    def body(yc):
        scores = c_norm[None, :] - 2.0 * jnp.dot(
            yc, codebook.T, preferred_element_type=jnp.float32)
        return jnp.argmin(scores, axis=1).astype(jnp.uint32)

    idx = jax.lax.map(body, yp.reshape(-1, chunk, DIM))
    return idx.reshape(-1)[:n]


_ROOTS_CACHE: Optional[np.ndarray] = None


def e8_roots() -> np.ndarray:
    """The 240 minimal vectors of E8 (norm^2 = 2): all coordinate-pair
    sign combinations ``(+-1, +-1, 0^6)`` (112) plus ``(+-1/2)^8`` with an
    even number of minus signs (128). These generate the lattice's
    nearest-neighbor graph: ``c`` and ``c'`` are adjacent codewords iff
    ``c' = c + v`` for a root ``v``."""
    global _ROOTS_CACHE
    if _ROOTS_CACHE is None:
        roots = []
        for i in range(DIM):
            for j in range(i + 1, DIM):
                for si in (1.0, -1.0):
                    for sj in (1.0, -1.0):
                        v = np.zeros(DIM, np.float32)
                        v[i], v[j] = si, sj
                        roots.append(v)
        for bits in range(256):
            signs = np.asarray([(0.5 if (bits >> d) & 1 == 0 else -0.5)
                                for d in range(DIM)], np.float32)
            if bin(bits).count("1") % 2 == 0:
                roots.append(signs)
        _ROOTS_CACHE = np.stack(roots)
    return _ROOTS_CACHE


def _shell_radii2() -> Tuple[float, float]:
    """(safe_r2, full_r2): norm^2 of the largest COMPLETE codebook shell
    and of the boundary shell. The codebook is the 2^16 smallest-norm
    lattice points, so only the outermost shell can be partial
    (lex-tie-broken); points with norm^2 <= safe_r2 are guaranteed
    members, points on the full_r2 shell need a membership check."""
    norms = np.round((e8p_codebook().astype(np.float64) ** 2).sum(1) * 4)
    full = norms.max()
    safe = norms[norms < full].max()
    return float(safe) / 4.0, float(full) / 4.0


def _member_ok(pts: Array, codebook: Array) -> Tuple[Array, Array]:
    """(idx, ok): canonical indices for lattice points and whether each is
    actually a codebook entry (hash lookup verified by equality)."""
    idx = _codeword_index(pts)
    ok = jnp.all(
        jnp.abs(codebook[idx.astype(jnp.int32)] - pts) < 1e-4, axis=1)
    return idx, ok


def _encode_core(y: Array, codebook: Array, n_iter: int) -> Array:
    """Greedy-descent encode of one slab (see :func:`e8p_encode`)."""
    quarter = jnp.asarray(0.25, jnp.float32)
    p0 = nearest_e8(y - quarter) + quarter
    idx0, ok0 = _member_ok(p0, codebook)

    safe_r2, full_r2 = _shell_radii2()
    safe_r2 += 1e-6
    full_r2 += 1e-6
    roots = jnp.asarray(e8_roots())

    # Start point: the exact CS round where it is a member, else the CS
    # round of the row shrunk toward the ball until it lands on a
    # complete shell (terminates: as t -> 0 the round reaches the
    # minimum-norm all-(+-1/4) shell, always in the codebook).
    r = float(np.sqrt(codebook_radius2()))
    norm = jnp.linalg.norm(y, axis=1)
    base = jnp.minimum(1.0, (r - 1e-3) / jnp.maximum(norm, 1e-12))

    def scond(state):
        _, t, done = state
        return jnp.logical_and(~jnp.all(done), t > 0.01)

    def sbody(state):
        b, t, done = state
        pt = nearest_e8(y * (base * t)[:, None] - quarter) + quarter
        okn = jnp.sum(pt * pt, axis=1) <= safe_r2
        b = jnp.where((~done & okn)[:, None], pt, b)
        return b, t * 0.9, done | okn

    b0 = jnp.where(ok0[:, None], p0, 0.0)
    b, _, _ = jax.lax.while_loop(scond, sbody,
                                 (b0, jnp.float32(1.0), ok0))

    best = b
    best_d = jnp.sum((y - best) ** 2, axis=1)
    for _ in range(n_iter):
        bn = jnp.sum(best * best, axis=1)
        cand_n = bn[:, None] + 2.0 * (best @ roots.T) + 2.0   # ||b+v||^2
        cand_d = (best_d[:, None] - 2.0 * ((y - best) @ roots.T)
                  + 2.0)                                      # ||y-b-v||^2
        # optimistic pass: allow the (possibly partial) boundary shell,
        # verify the winner by hash; fallback pass: complete shells only
        d_opt = jnp.where(cand_n <= full_r2, cand_d, jnp.inf)
        j_opt = jnp.argmin(d_opt, axis=1)
        d_o = jnp.take_along_axis(d_opt, j_opt[:, None], 1)[:, 0]
        cand_o = best + roots[j_opt]
        _, ok_o = _member_ok(cand_o, codebook)
        d_safe = jnp.where(cand_n <= safe_r2, cand_d, jnp.inf)
        j_safe = jnp.argmin(d_safe, axis=1)
        d_s = jnp.take_along_axis(d_safe, j_safe[:, None], 1)[:, 0]
        cand_s = best + roots[j_safe]
        use_o = ok_o & jnp.isfinite(d_o)
        cand = jnp.where(use_o[:, None], cand_o, cand_s)
        d_new = jnp.where(use_o, d_o, d_s)
        imp = d_new < best_d
        best = jnp.where(imp[:, None], cand, best)
        best_d = jnp.where(imp, d_new, best_d)

    idx, okf = _member_ok(best, codebook)
    # every accepted move was membership-checked, so okf holds; idx0 is a
    # valid entry either way (belt and braces for f32 edge rounding)
    return jnp.where(okf, idx, idx0)


@functools.partial(jax.jit,
                   static_argnames=("chunk", "exact", "n_iter", "slab"))
def e8p_encode(y: Array, codebook: Array, chunk: int = 512,
               exact: bool = False, n_iter: int = 3,
               slab: int = 131072) -> Array:
    """Nearest-codeword indices for vectors ``y`` (N, 8).

    Fast path (both modes): Conway-Sloane nearest point in the shifted
    lattice, accepted when it is a codebook entry (hash-verified) — then
    it is THE nearest codeword, since the nearest point over the whole
    lattice lies in the codebook subset.

    Fallback for rows whose lattice-nearest point falls outside the
    codebook ball (common at aggressive scales — a gamma=0.7 load factor
    puts most rows outside):

    - ``exact=False`` (default): greedy descent over the E8 neighbor
      graph. Start from a guaranteed member (the Conway-Sloane round of
      the row shrunk to the complete-shell ball), then ``n_iter`` times
      move to the best in-codebook neighbor ``b + v`` over the 240 roots
      ``v``. Candidate membership is decided by norm (complete shells)
      with a single hash check per iteration for boundary-shell argmins,
      so an iteration is two (N, 240) matmuls — no 2^16-point scan. The
      old brute-force fallback made the LDLQ-e8p flagship encode take
      hours at 512-dim on CPU (round-3 ROADMAP); this is ~100x faster
      and near-exact (measured: 0% mismatch at load <= 1.0, <0.1% at
      1.3, MSE excess <~3e-5 — tests/test_lattice.py).
    - ``exact=True``: brute-force MXU argmin over the full codebook for
      all rows whenever any row needs it. Use for exactness tests and
      one-off references.

    ``slab``: rows are processed in ``lax.map`` slabs of this size when
    ``N > slab`` (non-exact path). The local-search temporaries are
    (N, 240) f32 — at 7B-projection block counts (N ~ 5.6M for
    4096x11008) the unslabbed graph peaks over 25 GB of HBM temps and
    OOMs a 16 GB chip; slabbing bounds the peak at ~150 MB with
    bit-identical per-row results (the descent is row-independent).
    """
    y = y.astype(jnp.float32)

    if exact:
        quarter = jnp.asarray(0.25, jnp.float32)
        p0 = nearest_e8(y - quarter) + quarter
        idx0, ok0 = _member_ok(p0, codebook)

        def slow(_):
            return _brute_force_encode(y, codebook, chunk)

        def fast(_):
            return idx0

        idx = jax.lax.cond(jnp.all(ok0), fast, slow, operand=None)
        return jnp.where(ok0, idx0, idx)

    n = y.shape[0]
    if slab and n > slab:
        pad = (-n) % slab
        yp = jnp.pad(y, ((0, pad), (0, 0)))
        idx = jax.lax.map(
            lambda ys: _encode_core(ys, codebook, n_iter),
            yp.reshape(-1, slab, DIM))
        return idx.reshape(-1)[:n]
    return _encode_core(y, codebook, n_iter)


def e8p_decode(idx: Array, codebook: Array) -> Array:
    return codebook[idx.astype(jnp.int32)]


# ---------------------------------------------------------------------------
# Blockwise quantization with per-block scale search
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("scale_grid", "chunk"))
def e8p_quantize_blocks(
        blocks: Array,
        scale_grid: Tuple[float, ...] = DEFAULT_SCALE_GRID,
        chunk: int = 512) -> Tuple[Array, Array]:
    """Quantize (nb, bs) blocks to E8P codes with per-block scale search.

    bs must be a multiple of 8. Returns ``(codes, scale)`` with codes
    (nb, bs//8) uint16 codebook indices (exactly 2 bits/weight) and scale
    (nb, 1) float32; reconstruction is ``scale * codebook[codes]``.
    """
    nb, bs = blocks.shape
    if bs % DIM != 0:
        raise ValueError(f"block size {bs} not a multiple of {DIM}")
    cb = jnp.asarray(e8p_codebook())
    blocks = blocks.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(blocks * blocks, axis=1, keepdims=True))
    rms = jnp.maximum(rms, 1e-8)

    def try_scale(gamma):
        s = rms * gamma                                  # (nb, 1)
        y = (blocks / s).reshape(-1, DIM)
        idx = e8p_encode(y, cb, chunk=chunk)
        rec = (e8p_decode(idx, cb).reshape(nb, bs)) * s
        err = jnp.sum((rec - blocks) ** 2, axis=1)       # (nb,)
        return idx.reshape(nb, bs // DIM), s, err

    results = [try_scale(g) for g in scale_grid]
    errs = jnp.stack([r[2] for r in results], axis=0)    # (G, nb)
    best = jnp.argmin(errs, axis=0)                      # (nb,)
    codes = jnp.stack([r[0] for r in results], axis=0)   # (G, nb, bs//8)
    scales = jnp.stack([r[1] for r in results], axis=0)  # (G, nb, 1)
    take = functools.partial(jnp.take_along_axis, axis=0)
    codes = take(codes, best[None, :, None])[0].astype(jnp.uint16)
    scale = take(scales, best[None, :, None])[0]
    return codes, scale


@functools.partial(jax.jit, static_argnames=("chunk",))
def e8p_recover_codes(blocks: Array, chunk: int = 512) -> Tuple[Array, Array]:
    """Recover ``(codes, scale)`` from blocks that already lie on the e8p
    grid (e.g. the dequantized ``Q`` component of a CALDERA solve).

    Every codeword coordinate is an odd multiple of 1/4, so a block's max
    magnitude satisfies ``max|v| = s * (2M+1)/4`` for some integer
    ``M in [0, 6]`` (``|c| <= sqrt(11.5) < 13/4 * ...``). Trying the seven
    candidate scales ``s_M = 4 * max|v| / (2M+1)`` guarantees one of them
    equals the original block scale exactly, and nearest-codeword encoding
    at that scale reproduces the block to f32 rounding — unlike
    :func:`e8p_quantize_blocks`, whose RMS-relative scale grid shifts once
    the block statistics are those of the *dequantized* values. This is the
    exact-round-trip path behind ``CalderaDecomposition.quantized_codes``
    for e8p (reference parity with ``Q_idxs``, ref ``dataclasses.py:87-106``).
    """
    nb, bs = blocks.shape
    if bs % DIM != 0:
        raise ValueError(f"block size {bs} not a multiple of {DIM}")
    cb = jnp.asarray(e8p_codebook())
    blocks = blocks.astype(jnp.float32)
    g = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1, keepdims=True), 1e-12)

    def try_scale(s):
        y = (blocks / s).reshape(-1, DIM)
        idx = e8p_encode(y, cb, chunk=chunk)
        rec = (e8p_decode(idx, cb).reshape(nb, bs)) * s
        err = jnp.sum((rec - blocks) ** 2, axis=1)
        return idx.reshape(nb, bs // DIM), s, err

    results = [try_scale(4.0 * g / (2 * M + 1)) for M in range(7)]
    errs = jnp.stack([r[2] for r in results], axis=0)
    best = jnp.argmin(errs, axis=0)
    codes = jnp.stack([r[0] for r in results], axis=0)
    scales = jnp.stack([r[1] for r in results], axis=0)
    take = functools.partial(jnp.take_along_axis, axis=0)
    codes = take(codes, best[None, :, None])[0].astype(jnp.uint16)
    scale = take(scales, best[None, :, None])[0]
    return codes, scale


def e8p_dequantize_blocks(codes: Array, scale: Array) -> Array:
    """Reconstruct (nb, bs) blocks from (nb, bs//8) codes + (nb, 1) scales."""
    cb = jnp.asarray(e8p_codebook())
    nb, nv = codes.shape
    rec = e8p_decode(codes.reshape(-1), cb).reshape(nb, nv * DIM)
    return rec * scale


# ---------------------------------------------------------------------------
# Lossless repack into the int4 W4A8 serving layout
# ---------------------------------------------------------------------------

@jax.jit
def e8p_pack_rowscale(W: Array) -> Tuple[Array, Array, Array]:
    """Row-blocked e8p quantization repacked losslessly as int4 + rank-1.

    Every E8+1/4 codeword coordinate is an odd multiple of 1/4 with
    ``|c| <= sqrt(11.5) < 15/4``, so ``4c = 2m + 1`` with ``m in [-7, 6]``
    — i.e. the lattice reconstruction ``s*c = m*(s/2) + (s/4)`` fits the
    symmetric-int4 W4A8 serving layout exactly, with per-row scale ``s/2``
    and a constant per-row offset ``s/4`` that callers fold into the
    low-rank factors as a rank-1 term ``(s/4) @ ones(1, K)``. TPU Mosaic
    cannot gather from a 2^16-entry VMEM codebook, so this repack is how
    lattice-quantized weights ride the existing int8-MXU kernels: 2-bit
    information rate (the uint16 codes are the storage form), int4 HBM
    residency at serve time, zero extra quantization error.

    Returns ``(packed (N, K/2) uint8 global-plane layout, half_scales
    (N, 1) f32, offsets (N, 1) f32)``.
    """
    N, K = W.shape
    codes, s = e8p_quantize_blocks(W.astype(jnp.float32))
    packed = codes_to_int4_planes(codes, K)
    return packed, s / 2.0, s / 4.0


def codes_to_int4_planes(codes: Array, K: int) -> Array:
    """(..., N, K/8) uint16 e8p codes -> (..., N, K/2) uint8 global-plane
    int4 pack (the W4A8 serving layout; see :func:`e8p_pack_rowscale`).
    Leading dims (e.g. a stacked layer axis) pass through."""
    cb = jnp.asarray(e8p_codebook())
    lead = codes.shape[:-1]
    c = e8p_decode(codes.reshape(-1), cb).reshape(*lead, K)
    m = jnp.round(2.0 * c - 0.5)                      # (4c - 1) / 2
    u = (m + 7.0).astype(jnp.uint8)                   # offset-binary int4
    planes = u.reshape(*lead, 2, K // 2)
    return (planes[..., 0, :] << 4) | planes[..., 1, :]


def int4_planes_to_codes(packed: Array) -> Array:
    """Inverse of :func:`codes_to_int4_planes`: recover the (..., N, K/8)
    uint16 e8p codes from the int4 serving pack — the 2-bit
    checkpoint/storage form. Raises if the unpacked values are not unit
    E8+1/4 codewords (i.e. the pack did not come from an e8p linear)."""
    K = packed.shape[-1] * 2
    u = jnp.concatenate([(packed >> 4) & 0xF, packed & 0xF], axis=-1)
    c = (2.0 * (u.astype(jnp.float32) - 7.0) + 1.0) / 4.0
    pts = c.reshape(-1, DIM)
    idx = _codeword_index(pts)
    cb = jnp.asarray(e8p_codebook())
    ok = jnp.all(jnp.abs(cb[idx.astype(jnp.int32)] - pts) < 1e-4)
    if not bool(ok):
        raise ValueError("int4 pack is not a lattice-codeword stream")
    return idx.reshape(*packed.shape[:-1], K // DIM).astype(jnp.uint16)
