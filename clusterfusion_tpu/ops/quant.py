"""Weight-only quantization (INT8 per-channel, INT4 group-wise) and FP8 KV
cache — capabilities beyond the reference (which is fp16-only,
`kernel.cuh:58-62`), planned for in the layer boundaries from day one
(SURVEY.md §7 step 6).

Design:

- ``QuantizedTensor`` is a registered pytree (q, s) + static (kind, axis,
  group_size), so quantized weights ride ``lax.scan`` xs, ``jax.jit``
  arguments, and ``shard_map`` like plain arrays.
- INT8 is symmetric per-*output-channel*: the scale is constant along the
  reduction axis, so dequantization commutes with the matmul —
  ``x @ (q·s) == (x @ q)·s`` — and the kernels apply the scale to the
  [1, N] *result*, not the [K, N] weight tile.  Fused dequant is therefore
  ~free: the kernel's HBM traffic halves and the MXU consumes the int8 tile
  cast to bf16 (integers ≤127 are exact in bf16).
- INT4 is symmetric group-wise along the reduction axis (default group 128),
  two nibbles packed per int8 byte.  Packing pairs row r with row r+K/2 so
  in-kernel unpacking is ``concat(lo, hi, axis=reduction)`` — no interleave
  / gather, pure VPU shifts.  The scale depends on the reduction position,
  so the kernel dequantizes the tile (unpack → ·scale → bf16) before the
  dot; HBM traffic quarters.
- FP8 KV cache: allocate the cache as ``float8_e4m3fn`` (``init_cache``
  dtype); the megakernels cast KV tiles to bf16 at the dot and new K/V is
  rounded to fp8 on append.  No scale is needed at e4m3 range (±448) for
  post-RoPE K and V.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Int8KV(NamedTuple):
    """INT8 KV cache: the TPU-native 8-bit KV format.

    v5e has no fp8 ALU, so an fp8 cache pays a slow e4m3→bf16 software
    convert at every dot (measured 2.5× decode slowdown at 8K ctx); int8
    converts to bf16 natively on the VPU — the same cheap cast the INT8
    *weight* path rides.  Per-(head, position) symmetric scales make the
    scale algebra commute with the attention dots:

        scores[:, j] = (q · k8_j) · sk_j      (row scale on scores)
        o = Σ_j (p_j · sv_j) · v8_j           (scale folded into p)

    q: int8 ``[L, H, S, hd]`` (same layout as a bf16 cache).
    s: f32 ``[L, H, R, 128]`` with R = max(ceil(S/128), 8) — position p's
       scale lives at ``[l, h, p//128, p%128]``.  The 2-D tile layout keeps
       every kernel access legal: chunk reads are (…, chunk//128, 128)
       blocks, and the in-kernel append is the same 8-sublane RMW window
       the KV rows use (R ≥ 8 guarantees the window fits).
    """

    q: jnp.ndarray
    s: jnp.ndarray

    @property
    def dtype(self):          # duck-type jnp.ndarray for cache callers
        return jnp.int8

    @property
    def shape(self):
        return self.q.shape


def init_kv_int8(n_layers: int, kv_heads: int, cap: int,
                 head_dim: int) -> Int8KV:
    rows = max(-(-cap // 128), 8)
    return Int8KV(jnp.zeros((n_layers, kv_heads, cap, head_dim), jnp.int8),
                  jnp.ones((n_layers, kv_heads, rows, 128), jnp.float32))


def kv_scales_flat(s: jnp.ndarray, cap: int) -> jnp.ndarray:
    """[L, H, R, 128] → [L, H, cap] per-position scales (eager/oracle use)."""
    L, H, R, _ = s.shape
    return s.reshape(L, H, R * 128)[..., :cap]


def quantize_kv_rows(x: jnp.ndarray):
    """Symmetric int8 row quantization over the trailing dim.
    x [..., hd] → (q int8 [..., hd], s f32 [...])."""
    xa = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xa), axis=-1), 1e-8) * (1.0 / 127.0)
    q = jnp.round(xa / s[..., None]).astype(jnp.int8)
    return q, s


def cache_fill_rows(cache, rows, pos0):
    """Write ``[L, kv, T, hd]`` freshly-computed KV rows at positions
    pos0..pos0+T-1 of a stacked cache — bf16/fp8 by dtype cast, Int8KV by
    per-row quantization with the scale landing in the [L, H, R, 128]
    plane at ``[l, h, p // 128, p % 128]``.  The single owner of the
    Int8KV scale-plane write layout (used by both the model-level prefill/
    eager append and the stack megakernel's deferred hd<128 append)."""
    if isinstance(cache, Int8KV):
        q8, s = quantize_kv_rows(rows)                 # s [L, kv, T]
        qc = jax.lax.dynamic_update_slice(cache.q, q8, (0, 0, pos0, 0))
        L, H, R, _ = cache.s.shape
        sflat = jax.lax.dynamic_update_slice(
            cache.s.reshape(L, H, R * 128), s.astype(cache.s.dtype),
            (0, 0, pos0))
        return Int8KV(qc, sflat.reshape(L, H, R, 128))
    return jax.lax.dynamic_update_slice(
        cache, rows.astype(cache.dtype), (0, 0, pos0, 0))


# ---- FP8 (e4m3) KV fast decode -------------------------------------------
#
# v5e has no fp8 ALU: XLA's e4m3->bf16 `convert` lowers to a long software
# chain (measured ~2.5x decode slowdown at 8K ctx when done per dot).  But
# e4m3's fields embed exactly into bf16's: placing the 7 magnitude bits at
# bit 4 puts the 4-bit exponent into the LOW nibble of bf16's 8-bit exponent
# field and the 3-bit mantissa at the top of bf16's 7-bit mantissa.  Adding
# 64 to the exponent field re-biases 2^(e-7) -> 2^(e-63), i.e. the bf16
# pattern holds value * 2**-56 — EXACTLY, for every normal e4m3 value
# (verified over all 256 bit patterns).  The 2**56 fixup is folded into the
# [group, chunk] scores / [group, hd] pv products by the kernels, where it
# costs one VPU multiply on a tile ~128x smaller than the KV tile.  e4m3
# denormals (|v| <= 0.0136) flush to zero — below e4m3's own quantization
# step (0.0625 at magnitude ~1), so no accuracy is lost vs the storage
# format itself.
FP8_DECODE_FIX = 2.0 ** 56


def fp8_decode_scaled(x: jnp.ndarray) -> jnp.ndarray:
    """float8_e4m3fn tile -> bf16 tile holding ``value * 2**-56``.

    ~10 native VPU int ops per element instead of XLA's software convert
    chain; pair with a single ``* FP8_DECODE_FIX`` on the dot RESULT (the
    scale commutes with the dot).  Exact for all normal e4m3 values;
    denormals flush to 0 (see module comment)."""
    i = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    mag = i & 0x7F
    u16 = (mag << 4) + (64 << 7)           # exponent re-bias: +64
    u16 = jnp.where(mag < 8, 0, u16)       # e4m3 denormals -> 0
    u16 = u16 | ((i & 0x80) << 8)          # sign to bit 15
    return jax.lax.bitcast_convert_type(u16.astype(jnp.uint16), jnp.bfloat16)


def _norm_axis(axis: int, ndim: int) -> int:
    """Normalize to a NEGATIVE index: ``lax.scan`` slices the leading layer
    axis off stacked weight leaves while the static aux data is shared, so
    axes must count from the end to survive the rank change."""
    return axis if axis < 0 else axis - ndim


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """Weight-only quantized tensor.

    q: int8 payload.  INT8: same shape as the original.  INT4: ``pack_axis``
       is halved (ADJACENT elements 2b / 2b+1 in one byte's lo/hi nibble —
       exactly the layout ``pltpu.bitcast(int4)`` unpacks, so the kernels'
       unpack is one hardware conversion instead of a mask/shift chain;
       adjacent pairing also keeps any even-sized block of the pack axis
       locally unpackable).
    s: float32 scales.  INT8: reduction axis collapsed to 1 (per output
       channel).  INT4: reduction axis of size K/group_size.
    kind: "int8" | "int4" (static).
    axis: reduction axis of the original tensor (static, stored negative so
       ``lax.scan`` slicing a leading layer axis keeps it valid).
    group_size: INT4 quantization group along the reduction axis (static).
    pack_axis: INT4 nibble-packing axis (static, negative; == axis unless
       the kernel blocks the reduction axis).
    """

    q: jnp.ndarray
    s: jnp.ndarray
    kind: str
    axis: int
    group_size: int
    pack_axis: int = -1

    def tree_flatten(self):
        return (self.q, self.s), (self.kind, self.axis, self.group_size,
                                  self.pack_axis)

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, s = children
        return cls(q, s, *aux)

    # -- convenience -------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        shp = list(self.q.shape)
        if self.kind == "int4":
            shp[self.pack_axis] *= 2
        return tuple(shp)

    @property
    def ndim(self) -> int:
        return self.q.ndim

    def dequantize(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        if self.kind == "int8":
            return (self.q.astype(jnp.float32) * self.s).astype(dtype)
        w = unpack_int4(self.q, self.pack_axis)
        s = expand_group_scales(self.s, self.axis, self.group_size)
        return (w.astype(jnp.float32) * s).astype(dtype)


def quantize_int8(w: jnp.ndarray, axis: int) -> QuantizedTensor:
    """Symmetric per-output-channel INT8 over reduction ``axis``."""
    axis = _norm_axis(axis, w.ndim)
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q, s, "int8", axis, 0, axis)


def quantize_int4(w: jnp.ndarray, axis: int, group_size: int = 128,
                  pack_axis: int | None = None) -> QuantizedTensor:
    """Symmetric group-wise INT4 over reduction ``axis`` (values in
    [-7, 7]; -8 unused to keep the grid symmetric), nibble-packed along
    ``pack_axis`` (default: the reduction axis)."""
    axis = _norm_axis(axis, w.ndim)
    pack_axis = axis if pack_axis is None else _norm_axis(pack_axis, w.ndim)
    K = w.shape[axis]
    assert K % group_size == 0, (K, group_size)
    assert w.shape[pack_axis] % 2 == 0, (pack_axis, w.shape)
    wf = jnp.moveaxis(w.astype(jnp.float32), axis, 0)      # [K, ...]
    grp = wf.reshape(K // group_size, group_size, *wf.shape[1:])
    amax = jnp.max(jnp.abs(grp), axis=1)                   # [K/gs, ...]
    s = jnp.maximum(amax, 1e-8) / 7.0
    # group scales stream through the kernels as bf16 (they're 8/gs of the
    # packed bytes — f32 would waste ~3% of the weight stream), so round s
    # to bf16 BEFORE computing the codes: the (code, streamed-scale) pair
    # is then exactly the one chosen here and the bf16 rounding costs no
    # accuracy (codes re-optimize against the rounded scale).
    s = s.astype(jnp.bfloat16).astype(jnp.float32)
    s_rep = jnp.repeat(s, group_size, axis=0)              # [K, ...]
    q = jnp.clip(jnp.round(wf / s_rep), -7, 7).astype(jnp.int32)
    q = jnp.moveaxis(q, 0, axis)
    qp = jnp.moveaxis(q, pack_axis, 0)
    # adjacent pairing: byte b = (row 2b lo, row 2b+1 hi) — the layout
    # pltpu.bitcast(int4) produces, so in-kernel unpack is one hw convert
    lo, hi = qp[0::2], qp[1::2]
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.int8)
    packed = jnp.moveaxis(packed, 0, pack_axis)
    s = jnp.moveaxis(s, 0, axis)
    return QuantizedTensor(packed, s, "int4", axis, group_size, pack_axis)


def unpack_int4(packed: jnp.ndarray, axis: int) -> jnp.ndarray:
    """int8-packed nibbles [..K/2..] → int32 values [..K..] (rows in natural
    order: byte b holds rows 2b (lo) and 2b+1 (hi) — adjacent pairing).

    Host/generic path (checkpoints, oracles, the exact bf16 fallback).
    Inside Pallas kernels use :func:`unpack_int4_bitcast` instead — on TPU
    the adjacent layout IS ``pltpu.bitcast(int4)``'s layout, so the whole
    mask/shift/interleave chain collapses into one hardware conversion.

    Nibble op mix (for this path): hi in ONE arithmetic shift
    (``p >> 4 == floor(p/16)`` is the sign-extended top nibble); lo via
    mask+xor+sub (``((p & 15) ^ 8) - 8``), measured cheapest on v5e."""
    axis = _norm_axis(axis, packed.ndim)
    p = jnp.moveaxis(packed, axis, 0).astype(jnp.int32)    # [K/2, ...]
    lo = ((p & 15) ^ 8) - 8
    hi = jnp.right_shift(p, 4)
    out = jnp.stack([lo, hi], axis=1).reshape((-1,) + p.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def unpack_int4_bitcast(packed2d: jnp.ndarray) -> jnp.ndarray:
    """In-kernel unpack of a 2D tile packed along the SUBLANE axis (axis 0):
    [K/2, N] int8 → [K, N] int8, rows in natural order.

    ``pltpu.bitcast(int4)`` doubles the second-minor dim with exactly the
    adjacent-pair layout :func:`quantize_int4` writes (verified on-chip and
    in interpret mode), and the int4→int8 convert is a native lane op —
    the microbenched mask/xor/sub chain (scripts/microbench_int4.py v0)
    loses ~2 µs per 4096² tile to it."""
    from jax.experimental.pallas import tpu as pltpu
    assert packed2d.ndim == 2, packed2d.shape
    return pltpu.bitcast(packed2d, jnp.int4).astype(jnp.int8)


def w4a8_int4_dot(x: jnp.ndarray, packed: jnp.ndarray, s: jnp.ndarray,
                  gs: int) -> jnp.ndarray:
    """Fused W4A8 dequant-matmul — the INT4 *fast path* selected by
    ``KernelConfig.int4_w4a8``.

    ``x [M, K]`` (bf16/f32) · int4-packed weights ``[K/2, N]`` (adjacent
    pairing, sublane pack axis) with group-wise scales ``s [K/gs, N]``
    (f32) → f32 ``[M, N]``.  Exact grouped semantics.

    Two measured facts shape this (scripts/microbench_int4.py,
    micro_head2head.py, v5e):
    - the exact bf16 tile-dequant path is VPU-issue-bound (~34 µs per
      4096² tile vs a ~11 µs HBM floor — round-1 INT4 sat at ~48 % SoL);
    - a GROUPED batched int8 dot ([NG,1,gs]×[NG,gs,N]) is itself
      overhead-bound at M=1: 256 tiny matmuls per tile cost ~2× the
      stream time even with NO unpack at all (floor_dot ≈ 15.8 µs vs
      floor_flat ≈ 14.6 µs vs v0 ≈ 19 µs).

    So: the activation is quantized to int8 per row (symmetric absmax/127),
    weights unpack in ONE hardware conversion (:func:`unpack_int4_bitcast`),
    and at M=1 each group's x8 slice is placed on the diagonal of a
    block-diagonal ``X_bd [NG, K]`` so the whole tile is ONE flat
    [NG, K]×[K, N] int8 MXU matmul — P[g, n] = Σ_{k∈g} x_k w_kn — followed
    by the f32 scale-weighted column sum Σ_g P[g,n]·s[g,n].  The NG×
    redundant MACs on zeros are free: decode is HBM-bound and the MXU is
    ~30× under-occupied at M=1 (head-to-head median 16.5 µs ≈ the
    streaming floor).  At M>1 the grouped batched dot already has M MXU
    rows per entry and block-diagonal MAC inflation (M·NG rows) would
    exceed the stream time, so the [NG, M, gs]×[NG, gs, N] form is kept.
    This is the TPU analogue of the reference's in-register dequant feeding
    wgmma (`kernel.cuh:141-267`), with the group-scale algebra moved past
    the MXU so dequant commutes with the dot like the INT8 path."""
    assert gs % 128 == 0, (
        f"w4a8_int4_dot needs a lane-aligned group size (multiple of 128), "
        f"got {gs} — callers gate on this and fall back to the exact path")
    w8 = unpack_int4_bitcast(packed)                       # [K, N] int8
    K, N = w8.shape
    ng = K // gs
    M = x.shape[0]
    xa = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xa), axis=-1, keepdims=True),
                     1e-8) * (1.0 / 127.0)                 # [M, 1]
    x8 = jnp.round(xa / xs).astype(jnp.int8)
    if M == 1:
        # block-diagonal X: mask/where in int32 (Mosaic has no int8 select)
        row = jax.lax.broadcasted_iota(jnp.int32, (ng, K), 0)
        grp = jax.lax.broadcasted_iota(jnp.int32, (ng, K), 1) // gs
        xbd = jnp.where(row == grp,
                        jnp.broadcast_to(x8.astype(jnp.int32), (ng, K)),
                        0).astype(jnp.int8)
        part = jax.lax.dot_general(
            xbd, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # [ng, N]
        y = jnp.sum(part.astype(jnp.float32) * s, axis=0, keepdims=True)
        return y * xs
    wg = w8.reshape(ng, gs, N)
    xg = x8.reshape(M, ng, gs).swapaxes(0, 1)              # [ng, M, gs]
    part = jax.lax.dot_general(
        xg, wg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                  # [ng, M, N]
    y = jnp.sum(part.astype(jnp.float32) * s[:, None, :], axis=0)
    return y * xs


def expand_group_scales(s: jnp.ndarray, axis: int,
                        group_size: int) -> jnp.ndarray:
    """[..K/gs..] → [..K..] with each scale row repeated ``gs`` times
    consecutively, via broadcast+reshape (no gather — Pallas-safe)."""
    axis = _norm_axis(axis, s.ndim)
    s = jnp.moveaxis(s, axis, 0)                           # [K/gs, ...]
    ng = s.shape[0]
    out = jnp.broadcast_to(s[:, None], (ng, group_size) + s.shape[1:])
    out = out.reshape(ng * group_size, *s.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def quantize(w: jnp.ndarray, kind: str, axis: int, group_size: int = 128,
             pack_axis: int | None = None) -> QuantizedTensor:
    if kind == "int8":
        return quantize_int8(w, axis)
    if kind == "int4":
        return quantize_int4(w, axis, group_size, pack_axis)
    raise ValueError(f"unknown quantization kind {kind!r}")


# (reduction axis, int4 pack axis) of the fused-layout weight tensors, as
# negative indices so both stacked [L, ...] and single-layer trees work.
# w2 [f, hidden] is consumed in f-blocks by the FFN kernel, so int4 packs
# along hidden (the output axis) to keep each block self-contained.
# (reduction axis, pack axis).  With ADJACENT nibble pairing every even-
# sized block of the pack axis unpacks locally, so w2 packs along its
# reduction axis (f) like everything else — the kernels' f-blocks cover
# whole byte pairs and unpack via one bitcast.
_WEIGHT_AXES = {"wqkv_f": (-2, -2), "wo_f": (-2, -2),
                "w13": (-2, -2), "w2": (-2, -2),
                # DeepSeek MLA stacks (models.deepseek layouts): reduction
                # is the second-minor axis everywhere, same as llama
                "wproj": (-2, -2),   # [L, hidden, n_proj]
                "wuk": (-2, -2),     # [L, h, nope, lora]
                "wuv": (-2, -2),     # [L, h, lora, nope]
                "wo_t": (-2, -2),    # [L, h*nope, hidden]
                # routed-expert stacks (ops.moe gathered formulation)
                "w13_e": (-2, -2),   # [L, E, 2, hidden, f]
                "w2_e": (-2, -2)}    # [L, E, f, hidden]


def quantize_deepseek_params(params, kind: str = "int8",
                             group_size: int = 128, lm_head: bool = False):
    """Weight-only quantization of a DeepSeek MLA param tree: the four
    attention projections (wproj/wuk/wuv/wo_t — the reference's five GEMVs,
    `deepseek/kernel.cuh:128-288`, fused here as proj+absorb+expand+O), the
    dense/shared-expert FFN (w13/w2), and — when present — the
    routed-expert stacks (w13_e/w2_e: int8 streams per-expert with
    scale-after-dot in ops.moe; int4 dequantizes only the gathered top-k
    experts).  The router and norms / embed stay bf16."""
    targets = ["wproj", "wuk", "wuv", "wo_t", "w13", "w2"]
    if "w13_e" in params["layers"]:
        targets += ["w13_e", "w2_e"]
    return quantize_llama_params(params, kind, group_size,
                                 targets=tuple(targets), lm_head=lm_head)


def quantize_llama_params(params, kind: str = "int8", group_size: int = 128,
                          targets=("wqkv_f", "wo_f", "w13", "w2"),
                          lm_head: bool = False):
    """Quantize the per-layer projection weights of a Llama param tree
    (embed / norms stay bf16, standard weight-only practice).  Works on
    both stacked [L, ...] trees and single-layer trees.

    ``lm_head=True`` also quantizes the LM head per-output-column INT8
    (regardless of ``kind`` — the [hidden, V] matrix has no grouped-int4
    kernel path and per-column int8 already halves its stream)."""
    layers = dict(params["layers"])
    for name in targets:
        w = layers[name]
        if isinstance(w, QuantizedTensor):
            continue
        axis, pack_axis = _WEIGHT_AXES[name]
        layers[name] = quantize(w, kind, axis, group_size, pack_axis)
    out = dict(params)
    out["layers"] = layers
    if lm_head and not isinstance(out["lm_head"], QuantizedTensor):
        out["lm_head"] = quantize_int8(out["lm_head"], axis=-2)
    return out


def maybe_dequantize(w, dtype=jnp.bfloat16):
    return w.dequantize(dtype) if isinstance(w, QuantizedTensor) else w
