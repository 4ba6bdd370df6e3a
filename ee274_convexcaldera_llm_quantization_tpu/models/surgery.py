"""Model surgery: per-layer CALDERA compression of a transformer.

The TPU-native equivalent of the reference's
``apply_CALDERA_quantization`` (``main.py:135-251``): walk the model's
projection matrices, run the CALDERA solver with that layer's Hessian,
apply the relative-error quality gate (skip the layer — keep it dense — if
the decomposition error exceeds the threshold, ``main.py:11,212-218``), and
store the result bit-packed in serving layout instead of materializing it
dense (which is all the reference does, ``main.py:197-199``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams, caldera)
from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as _K
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    DenseLinear, Linear, compress_linear)
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    LayerParams, ModelParams)

# The projections the reference targets (``main.py:147-162``).
PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
              "gate_proj", "up_proj", "down_proj")


def caldera_with_hadamard(
    caldera_params: CalderaParams,
    W: jnp.ndarray,
    H: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, float]:
    """CALDERA in a two-sided Hadamard-rotated basis (incoherence processing).

    The reference's off-by-default Hadamard path (``main.py:75-133,221-240``):
    pad ``W`` to powers of two, rotate ``W' = H1 W H2`` with orthonormal
    Hadamard matrices, decompose in the rotated basis, rotate the
    reconstruction back. Rotation spreads outliers across entries, which
    helps aggressive (2-bit) quantization. The input-side Hessian is rotated
    consistently: ``H' = H2^T H_pad H2`` (columns of ``W'`` see inputs
    ``H2^T x``). Implemented with the O(n log n) FWHT, not dense Hadamard
    matmuls. Returns ``(W_hat, relative_error)`` — like the reference, the
    result is materialized dense (the rotated basis is not servable without
    runtime activation rotation).
    """
    m, n = W.shape
    Wr, m2, n2 = _K.hadamard_sandwich(W.astype(jnp.float32))
    if H is not None:
        H = jnp.asarray(H, jnp.float32)
        if H.ndim == 1:
            H = jnp.diag(H)
        Hp = jnp.zeros((n2, n2), jnp.float32)
        # pad with identity so padded (zero-weight) inputs stay conditioned
        Hp = Hp.at[:n, :n].set(H)
        Hp = Hp.at[jnp.arange(n, n2), jnp.arange(n, n2)].set(1.0)
        # H2^T Hp H2 via two FWHTs (orthonormal Hadamard is symmetric)
        Hr = _K.fwht(_K.fwht(Hp, axis=0), axis=1) / jnp.float32(n2)
        Hr = (Hr + Hr.T) / 2
    else:
        Hr = None
    decomp = caldera(caldera_params, Wr, H=Hr, scale_W=False)
    W_hat = _K.hadamard_unsandwich(decomp.reconstruct(), m, n)
    err = float(jnp.linalg.norm(W_hat - W) / jnp.linalg.norm(W))
    return W_hat, err


def _rotate_hessian(H: Optional[jnp.ndarray], n: int) -> Optional[jnp.ndarray]:
    """``H' = H2 H H2`` for the orthonormal Hadamard H2 (inputs to the
    rotated weight are ``H2 x``)."""
    if H is None:
        return None
    H = jnp.asarray(H, jnp.float32)
    if H.ndim == 1:
        H = jnp.diag(H)
    Hr = _K.fwht(_K.fwht(H, axis=0), axis=1) / jnp.float32(n)
    return (Hr + Hr.T) / 2


def compress_linear_rotated(
    caldera_params: CalderaParams,
    W: jnp.ndarray,
    H: Optional[jnp.ndarray] = None,
    serving_bits: Optional[int] = None,
    serving_mode: str = "grouped",
    bias: Optional[jnp.ndarray] = None,
    q_method: str = "uniform",
):
    """CALDERA in a Hadamard-rotated basis, packed for SERVABLE rotated
    inference (:class:`compressed.RotatedLinear`).

    Unlike :func:`caldera_with_hadamard` (the reference-equivalent path
    that must materialize dense weights, ``main.py:221-240``), this keeps
    the rotated ``Q' + L'R'`` bit-packed and rotates *activations* at run
    time with O(n log n) FWHTs. Each side is rotated only if its dimension
    is a power of two (no padding: for Llama-2, q/k/v/o rotate both sides,
    gate/up input-only, down output-only — the input side, which drives
    activation-aware quantization, is the one that matters).

    Returns ``(RotatedLinear, relative_error)`` with the error measured in
    the original basis (orthonormal rotations preserve Frobenius norms).

    Measured caveat (see PERFORMANCE.md): with the absmax-uniform serving
    quantizers (``q_method="uniform"``) rotation does not reduce error on
    synthetic outlier/heavy-tail regimes — incoherence processing pays off
    with the distribution-matched lattice codebook, ``q_method="e8p"``
    (QuIP#-style rotate-then-lattice-quantize; requires
    ``serving_mode="w4a8"``), which is the recommended 2-bit configuration.
    """
    from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
        RotatedLinear)

    m, n = W.shape
    rot_out = (m & (m - 1)) == 0
    rot_in = (n & (n - 1)) == 0
    Wf = W.astype(jnp.float32)
    Wr = Wf
    if rot_out:
        Wr = _K.fwht(Wr, axis=0) / jnp.sqrt(jnp.float32(m))
    if rot_in:
        Wr = _K.fwht(Wr, axis=1) / jnp.sqrt(jnp.float32(n))
    Hr = _rotate_hessian(H, n) if rot_in else H
    decomp = caldera(caldera_params, Wr, H=Hr, scale_W=False)
    if (caldera_params.compute_quantized_component
            and caldera_params.q_update != "ldlq"):
        q_src = Wr / decomp.global_scale - decomp.L @ decomp.R
    else:
        # LDLQ: pack the solver's Q — re-RTN of the raw residual would
        # silently discard the error-feedback gains
        q_src = decomp.Q
    inner = compress_linear(q_src, decomp.L, decomp.R,
                            serving_bits or caldera_params.Q_bits,
                            global_scale=decomp.global_scale,
                            mode=serving_mode, q_method=q_method)
    rl = RotatedLinear(inner=inner, b=bias, rot_in=rot_in, rot_out=rot_out)
    err = float(jnp.linalg.norm(rl.materialize() - Wf)
                / jnp.linalg.norm(Wf))
    return rl, err


@dataclasses.dataclass
class SurgeryReport:
    """Per-layer compression outcomes."""

    errors: Dict[str, float] = dataclasses.field(default_factory=dict)
    skipped: List[str] = dataclasses.field(default_factory=list)
    compressed: List[str] = dataclasses.field(default_factory=list)
    total_bits: int = 0
    total_params: int = 0

    @property
    def avg_bits_per_param(self) -> float:
        return self.total_bits / max(self.total_params, 1)


def compress_model(
    params: ModelParams,
    caldera_params: CalderaParams,
    hessians: Optional[Dict[str, np.ndarray]] = None,
    layer_range: Optional[Tuple[int, int]] = None,
    proj_filter: Sequence[str] = PROJ_NAMES,
    error_threshold: float = 0.99,
    min_dim: int = 0,
    serving_bits: Optional[int] = None,
    serving_mode: str = "grouped",
    use_hadamard=False,    # False | True (dense, reference-like) | "servable"
    serving_quant: str = "uniform",   # "uniform" | "e8p" (needs w4a8)
    progress: Optional[Callable[[str, float], None]] = None,
) -> Tuple[ModelParams, SurgeryReport]:
    """Compress the selected projections of a model.

    ``serving_quant="e8p"`` packs each residual with the 2-bit E8 lattice
    codebook served through the int4 W4A8 layout (see
    ``compressed.compress_linear``); bit accounting counts the 2-bit
    information rate plus one fp16 scale per row (the serving-resident HBM
    form is 4-bit).

    ``hessians`` maps ``"layers.{i}.{proj}"`` to a diagonal (1-D) or full
    (2-D) input-activation second moment — the schema of the reference's
    ``diag_Hessians.pt`` (SURVEY.md section 2.9). Missing entries fall back
    to the identity. ``layer_range`` is an inclusive (start, end) block
    range like the reference's layers 17-23 default (``main.py:6-11``);
    ``min_dim`` skips projections with any dimension smaller (reference
    uses 500, ``main.py:154``). ``serving_bits`` overrides the bit width of
    the packed serving representation (defaults to ``caldera_params.Q_bits``;
    2-bit codes pack exactly into the 2-bit serving layout, etc.).
    ``serving_mode``: "grouped" (per-group scales, bf16 kernel, max
    fidelity) or "w4a8" (per-row scales + int8 activations, ~3x faster
    decode).
    """
    report = SurgeryReport()
    sbits = serving_bits or caldera_params.Q_bits
    new_layers = []
    for i, lp in enumerate(params.layers):
        in_range = layer_range is None or (
            layer_range[0] <= i <= layer_range[1])
        fields = {}
        for proj in LayerParams._fields:
            lin = getattr(lp, proj)
            if (proj not in proj_filter or not in_range
                    or not isinstance(lin, DenseLinear)):
                fields[proj] = lin
                continue
            W = lin.w.astype(jnp.float32)
            m, n = W.shape
            name = f"layers.{i}.{proj}"
            if min(m, n) <= min_dim:
                fields[proj] = lin
                continue
            H = None
            if hessians is not None and name in hessians:
                H = jnp.asarray(np.asarray(hessians[name]), jnp.float32)
            if use_hadamard == "servable":
                # Rotated basis kept bit-packed; activations rotate at run
                # time (compressed.RotatedLinear) — see
                # ``compress_linear_rotated``.
                rl, err = compress_linear_rotated(
                    caldera_params, W, H=H, serving_bits=sbits,
                    serving_mode=serving_mode, bias=lin.b,
                    q_method=serving_quant)
                report.errors[name] = err
                if progress is not None:
                    progress(name, err)
                if err > error_threshold:
                    report.skipped.append(name)
                    fields[proj] = lin
                    report.total_bits += m * n * 16
                else:
                    report.compressed.append(name)
                    fields[proj] = rl
                    rank = rl.inner.L.shape[1]
                    qbits = 2 if serving_quant == "e8p" else sbits
                    report.total_bits += (m * n * qbits
                                          + rank * (m + n) * 16
                                          + (m * 16 if serving_quant == "e8p"
                                             else 0))
                report.total_params += m * n
                continue
            if use_hadamard:
                # Reference's incoherence path (``main.py:75-133``): the
                # rotated basis is not servable without runtime activation
                # rotation, so — like the reference — the result stays a
                # dense materialized weight; this path trades serving
                # compression for outlier robustness of the decomposition.
                W_hat, err = caldera_with_hadamard(caldera_params, W, H=H)
                report.errors[name] = err
                if progress is not None:
                    progress(name, err)
                if err > error_threshold:
                    report.skipped.append(name)
                    fields[proj] = lin
                else:
                    report.compressed.append(name)
                    fields[proj] = DenseLinear(
                        w=W_hat.astype(lin.w.dtype), b=lin.b)
                report.total_bits += m * n * 16
                report.total_params += m * n
                continue
            decomp = caldera(caldera_params, W, H=H, scale_W=False)
            # Serving form re-quantizes the *unquantized* residual
            # W/gs - L @ R with per-(row, group) scales — a strictly finer
            # grid than the solver's single global absmax scale
            # (``alg.py:247`` quirk), so the served weights are at least as
            # accurate as the solver's own reconstruction. Exception: LDLQ
            # Q updates are packed as-is — re-RTN of the raw residual would
            # discard the error feedback.
            if (caldera_params.compute_quantized_component
                    and caldera_params.q_update != "ldlq"):
                q_src = W / decomp.global_scale - decomp.L @ decomp.R
            else:
                q_src = decomp.Q
            clin = compress_linear(q_src, decomp.L, decomp.R, sbits,
                                   global_scale=decomp.global_scale,
                                   bias=lin.b, mode=serving_mode,
                                   q_method=serving_quant)
            W_hat = clin.materialize()
            err = float(jnp.linalg.norm(W_hat - W) / jnp.linalg.norm(W))
            report.errors[name] = err
            if progress is not None:
                progress(name, err)
            if err > error_threshold:
                # Quality gate: keep the original dense weight
                # (reference ``main.py:212-218``).
                report.skipped.append(name)
                fields[proj] = lin
                report.total_bits += m * n * 16
            else:
                report.compressed.append(name)
                fields[proj] = clin
                rank = decomp.L.shape[1]
                qbits = 2 if serving_quant == "e8p" else sbits
                report.total_bits += (m * n * qbits + rank * (m + n) * 16
                                      + (m * 16 if serving_quant == "e8p"
                                         else 0))
            report.total_params += m * n
        new_layers.append(LayerParams(**fields))
    new_params = ModelParams(embed=params.embed, layers=new_layers,
                             final_norm=params.final_norm,
                             lm_head=params.lm_head)
    return new_params, report


def compress_model_batched(
    params: ModelParams,
    caldera_params: CalderaParams,
    hessians: Optional[Dict[str, np.ndarray]] = None,
    layer_range: Optional[Tuple[int, int]] = None,
    proj_filter: Sequence[str] = PROJ_NAMES,
    error_threshold: float = 0.99,
    serving_bits: Optional[int] = None,
    serving_mode: str = "grouped",
    progress: Optional[Callable[[str, float], None]] = None,
) -> Tuple[ModelParams, SurgeryReport]:
    """Like :func:`compress_model`, but solves all layers of each projection
    type in ONE vmapped CALDERA call.

    The reference processes its 224 projections serially
    (``main.py:147-199``); grouping by shape and vmapping the solver keeps
    the MXU busy across the whole stack — the decomposition of a
    transformer block becomes a handful of batched eigh/SVD/matmul
    pipelines instead of hundreds of small sequential ones. Results are
    numerically equivalent to the serial path (same jitted solver under
    vmap).
    """
    from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
        caldera_batched)

    report = SurgeryReport()
    sbits = serving_bits or caldera_params.Q_bits
    n_layers = len(params.layers)

    def in_range(i):
        return layer_range is None or layer_range[0] <= i <= layer_range[1]

    # group (projection name) -> list of layer indices with identical shapes
    new_linears: Dict[Tuple[int, str], Linear] = {}
    for proj in proj_filter:
        idxs = [i for i in range(n_layers)
                if in_range(i) and isinstance(
                    getattr(params.layers[i], proj), DenseLinear)]
        if not idxs:
            continue
        shapes = {getattr(params.layers[i], proj).w.shape for i in idxs}
        assert len(shapes) == 1, f"heterogeneous shapes for {proj}: {shapes}"
        m, n = next(iter(shapes))
        Ws = jnp.stack([getattr(params.layers[i], proj).w.astype(jnp.float32)
                        for i in idxs])
        hs = []
        for i in idxs:
            name = f"layers.{i}.{proj}"
            if hessians is not None and name in hessians:
                h = np.asarray(hessians[name])
                hs.append(np.diag(h) if h.ndim == 1 else h)
            else:
                hs.append(np.eye(n))
        Hs = jnp.asarray(np.stack(hs), jnp.float32)
        Q, L, R, _, scales = caldera_batched(caldera_params, Ws, Hs,
                                             scale_W=False)
        for j, i in enumerate(idxs):
            lin = getattr(params.layers[i], proj)
            name = f"layers.{i}.{proj}"
            W = Ws[j]
            if (caldera_params.compute_quantized_component
                    and caldera_params.q_update != "ldlq"):
                q_src = W - L[j] @ R[j]
            else:
                q_src = Q[j]
            clin = compress_linear(q_src, L[j], R[j], sbits,
                                   global_scale=1.0, bias=lin.b,
                                   mode=serving_mode)
            W_hat = clin.materialize()
            err = float(jnp.linalg.norm(W_hat - W) / jnp.linalg.norm(W))
            report.errors[name] = err
            if progress is not None:
                progress(name, err)
            if err > error_threshold:
                report.skipped.append(name)
                new_linears[(i, proj)] = lin
                report.total_bits += m * n * 16
            else:
                report.compressed.append(name)
                new_linears[(i, proj)] = clin
                rank = L.shape[2]
                report.total_bits += m * n * sbits + rank * (m + n) * 16
            report.total_params += m * n

    new_layers = []
    for i, lp in enumerate(params.layers):
        fields = {name: new_linears.get((i, name), getattr(lp, name))
                  for name in LayerParams._fields}
        new_layers.append(LayerParams(**fields))
    return ModelParams(embed=params.embed, layers=new_layers,
                       final_norm=params.final_norm,
                       lm_head=params.lm_head), report


def compress_model_with_budget(
    params: ModelParams,
    caldera_params: CalderaParams,
    B_tot: float,
    hessians: Optional[Dict[str, np.ndarray]] = None,
    menu: Sequence[int] = (2, 4, 8),
    layer_range: Optional[Tuple[int, int]] = None,
    proj_filter: Sequence[str] = PROJ_NAMES,
    error_threshold: float = 0.99,
    serving_mode: str = "grouped",
    use_e8p_at_2bit: bool = False,
    progress: Optional[Callable[[str, float], None]] = None,
):
    """Mixed-precision surgery under a global bit budget.

    ``use_e8p_at_2bit`` upgrades every group the allocator assigns 2 bits
    to the E8 lattice codebook (``ops.lattice``) at the same rate — the
    lattice's ~2.3 dB shaping gain over the best scalar quantizer comes
    free within the budget (requires ``serving_mode="w4a8"``).

    The reference documents this objective (per-group bit-widths ``b_g``
    under ``sum_g p_g b_g <= B_tot``, reference ``README.md:87-93``) but
    never implements it (``CONVEX_CALDERA_IMPLEMENTATION.md:163-177``).
    Here each projection is an allocation group: its rate-distortion
    constant comes from the weight variance (``c = 0.1 Var``, mirroring
    ``convex_caldera.py:123``) and its distortion weight from the mean
    diagonal Hessian (input-activation sensitivity). The optimal discrete
    menu allocation (``allocate.multigroup``) assigns per-projection
    ``Q_bits``, then CALDERA runs per layer at its allocated width.

    Note the budget covers the quantized component only; the rank-r factors
    add ``rank * (m + n) * 16 / (m * n)`` bits/param on top (reported in
    the SurgeryReport). Returns (new_params, report, allocation).
    """
    from ee274_convexcaldera_llm_quantization_tpu.allocate.multigroup import (
        GroupSpec, allocate_bits_discrete)

    specs = []
    for i, lp in enumerate(params.layers):
        in_range = layer_range is None or (
            layer_range[0] <= i <= layer_range[1])
        if not in_range:
            continue
        for proj in proj_filter:
            lin = getattr(lp, proj)
            if not isinstance(lin, DenseLinear):
                continue
            name = f"layers.{i}.{proj}"
            W = np.asarray(lin.w, np.float32)
            weight = 1.0
            if hessians is not None and name in hessians:
                h = np.asarray(hessians[name])
                weight = float(np.mean(h)) if h.ndim == 1 else float(
                    np.mean(np.diag(h)))
            specs.append(GroupSpec(name=name, num_params=W.size,
                                   c=0.1 * float(np.var(W)), k=1.0,
                                   weight=max(weight, 1e-12)))
    allocation = allocate_bits_discrete(specs, B_tot, menu=menu)

    # run per-layer surgery at the allocated bit widths
    report = SurgeryReport()
    new_layers = []
    for i, lp in enumerate(params.layers):
        fields = {}
        for proj in LayerParams._fields:
            lin = getattr(lp, proj)
            name = f"layers.{i}.{proj}"
            if name not in allocation.bits or not isinstance(lin,
                                                             DenseLinear):
                fields[proj] = lin
                continue
            bits = int(allocation.bits[name])
            e8p_here = use_e8p_at_2bit and bits == 2
            if e8p_here and serving_mode != "w4a8":
                raise ValueError("use_e8p_at_2bit requires "
                                 "serving_mode='w4a8'")
            cp = dataclasses.replace(caldera_params, Q_bits=bits)
            if e8p_here:
                from ee274_convexcaldera_llm_quantization_tpu.quant import (
                    quantizers as _q)
                cp = dataclasses.replace(
                    cp, quant_factory_Q=_q.QuantizerFactory(
                        method="e8p", block_size="global"))
            W = lin.w.astype(jnp.float32)
            m, n = W.shape
            H = None
            if hessians is not None and name in hessians:
                H = jnp.asarray(np.asarray(hessians[name]), jnp.float32)
            decomp = caldera(cp, W, H=H, scale_W=False)
            if (cp.compute_quantized_component
                    and cp.q_update != "ldlq"):
                q_src = W / decomp.global_scale - decomp.L @ decomp.R
            else:
                q_src = decomp.Q
            clin = compress_linear(q_src, decomp.L, decomp.R,
                                   4 if e8p_here else bits,
                                   global_scale=decomp.global_scale,
                                   bias=lin.b, mode=serving_mode,
                                   q_method="e8p" if e8p_here
                                   else "uniform")
            W_hat = clin.materialize()
            err = float(jnp.linalg.norm(W_hat - W) / jnp.linalg.norm(W))
            report.errors[name] = err
            if progress is not None:
                progress(name, err)
            if err > error_threshold:
                report.skipped.append(name)
                fields[proj] = lin
                report.total_bits += m * n * 16
            else:
                report.compressed.append(name)
                fields[proj] = clin
                rank = clin.L.shape[1]   # includes the e8p rank-1 offset
                report.total_bits += m * n * bits + rank * (m + n) * 16
            report.total_params += m * n
        new_layers.append(LayerParams(**fields))
    new_params = ModelParams(embed=params.embed, layers=new_layers,
                             final_norm=params.final_norm,
                             lm_head=params.lm_head)
    return new_params, report, allocation


def hessian_key_map_from_reference(torch_state_keys: Sequence[str]
                                   ) -> Dict[str, str]:
    """Map reference ``diag_Hessians.pt`` keys to our ``layers.{i}.{proj}``.

    Reference keys look like
    ``language_model.model.layers.17.self_attn.q_proj`` or
    ``...layers.17.mlp.down_proj`` (SURVEY.md section 2.9).
    """
    out = {}
    for key in torch_state_keys:
        parts = key.split(".")
        if "layers" not in parts:
            continue
        li = parts[parts.index("layers") + 1]
        proj = parts[-1]
        if proj in PROJ_NAMES:
            out[key] = f"layers.{li}.{proj}"
    return out
