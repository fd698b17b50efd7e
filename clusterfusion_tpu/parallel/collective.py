"""Chip-scope collective primitives — the TPU re-statement of the
reference's DSM collective layer (`include/dsm.cuh:20-171`).

The reference gives its megakernels a *named, stage-specialized* collective
(`cluster_reduce<CLUSTER_SIZE, Stage>` with Stage::LINEAR / ATTN / FFN /
QUK_DEEPSEEK ..., `dsm.cuh:11-25`) over distributed shared memory between
the CTAs of a cluster.  On TPU one core's VMEM is uniformly visible, so the
*intra-core* role of DSM vanishes into scratch accumulation (see
ops.decoder_layer); the collective problem reappears **between chips** on
the ICI mesh (SURVEY.md §2.2 item 1, §2.4).  This module is that layer:

- ``Stage`` — the reference's stage taxonomy, kept as documentation of
  *where* in the fused layer each collective sits (LINEAR: partial-QKV
  reduce; ATTN: head-output reduce; FFN: down-projection reduce with
  optional fused activation, `dsm.cuh:140-153`; QUK: all-gather of absorbed
  q@W_UK, `dsm.cuh:31-79`).
- ``cluster_reduce(x, axis_name, stage)`` — all-reduce (sum) over a mesh
  axis inside ``shard_map``.
- ``cluster_gather(x, axis_name)`` — all-gather over a mesh axis.

Two interchangeable backends:

- ``"xla"``: `lax.psum` / `lax.all_gather` — XLA inserts the ICI collective
  and schedules it.  Default; correct on any backend (including the CPU
  simulation meshes used in tests).
- ``"pallas"``: in-kernel ring collectives over `make_async_remote_copy` +
  semaphores — the literal DSM-equivalent craft (the reference's
  accumulating ring, `dsm.cuh:89-169`, re-expressed as ICI remote DMA).
  Gives the kernel author explicit control of hop scheduling so collectives
  can be overlapped with compute.  Executes compiled on multi-chip TPU and
  under the Pallas TPU *interpret simulation* everywhere else (remote DMAs
  + semaphores are simulated with device threads), so it is numerically
  tested on the virtual CPU mesh.  Explicitly opt-in (``backend="auto"``
  resolves to XLA until the rings have run compiled on real multi-chip
  hardware).

Both are bit-compatible reductions (deterministic hop order, fp32
accumulation).
"""

from __future__ import annotations

import enum
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class Stage(enum.Enum):
    """Where in the fused decoder layer the collective sits — the
    reference's `Stage` enum (`dsm.cuh:11-18`).  On TPU all reduce-stages
    share one implementation; FFN optionally fuses an activation on the
    last hop like `dsm.cuh:140-153` (a shipped capability there, unused by
    the reference's kernels)."""

    LINEAR = "linear"            # partial-QKV all-reduce (dsm.cuh Stage::LINEAR)
    ATTN = "attn"                # head-output all-reduce (Stage::ATTN)
    FFN = "ffn"                  # down-proj all-reduce + optional act (Stage::FFN)
    LINEAR_DEEPSEEK = "linear_deepseek"
    ATTN_DEEPSEEK = "attn_deepseek"
    QUK_DEEPSEEK = "quk_deepseek"   # all-gather (dsm.cuh:31-79)


def _resolve_backend(backend: str) -> str:
    # "auto" resolves to XLA everywhere: the pallas rings are numerically
    # validated (race-detector-clean) only under the interpret simulation —
    # until they have run COMPILED on real multi-chip hardware they stay
    # explicitly opt-in (backend="pallas"), so production decode never rides
    # an untested-in-prod hot path (VERDICT.md round 1, weak #5).
    if backend == "auto":
        return "xla"
    return backend


def _interpret():
    """Compiled on TPU; TPU-interpret simulation (threads + simulated remote
    DMA/semaphores) elsewhere."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except RuntimeError:  # pragma: no cover
        on_tpu = False
    return False if on_tpu else pltpu.InterpretParams()


# --------------------------------------------------------------------------
# Pallas ring kernels (the DSM-equivalent craft: explicit remote DMA hops)
# --------------------------------------------------------------------------


def _ring_all_reduce_kernel(x_ref, out_ref, recv_ref, send_sem, recv_sem,
                            ack_sem, *, axis_name: str,
                            final_op: Optional[str]):
    """Accumulating unidirectional ring all-reduce, N-1 hops.

    Hop i: every chip sends the shard it received at hop i-1 to its right
    neighbor and adds it into the fp32 accumulator — the TPU re-expression
    of the reference's accumulating DSM ring (`dsm.cuh:89-169`; there each
    CTA pushes partials to `(rank+i)%N`, here the ring direction is fixed
    and the payload travels).  Deterministic: every chip accumulates
    contributions in the same origin order my, my-1, ..., my-(N-1) (mod N)
    — bit-identical *across chips*, which is the property the softmax-merge
    algebra needs.

    recv_ref layout: [2, ...x] ping-pong — the chunk being forwarded is
    never the chunk being received (the rule the reference's TileLang port
    documents, `tilelang_llama.py:44-59`).  Ping-pong alone is not enough:
    my hop-i write lands in the buffer the *receiver* sends from at hop
    i-1, so each hop-i send (i≥1) first waits for the receiver's ack that
    its hop-(i-1) send completed (`ack_sem`, signaled leftward) — the DSM
    analogue is the remote-mbarrier arrive/expect_tx pairing
    (`dsm.cuh:96-112`).
    """
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    dst = jax.lax.rem(my + 1, n)
    left = jax.lax.rem(my - 1 + n, n)

    out_ref[...] = x_ref[...]
    recv_ref[0] = x_ref[...]

    def hop(i, _):
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i > 0)
        def _():
            pltpu.semaphore_wait(ack_sem, 1)

        rdma = pltpu.make_async_remote_copy(
            src_ref=recv_ref.at[slot],
            dst_ref=recv_ref.at[nslot],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id={axis_name: dst},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rdma.start()
        rdma.wait()
        out_ref[...] += recv_ref[nslot]

        # my hop-i send has completed → my left neighbor may overwrite
        # recv[slot] (its hop-(i+1) target).  Skipped on the last hop so
        # all semaphores drain to zero.
        @pl.when(i < n - 2)
        def _():
            pltpu.semaphore_signal(
                ack_sem, inc=1, device_id={axis_name: left},
                device_id_type=pltpu.DeviceIdType.MESH)

        return 0

    jax.lax.fori_loop(0, n - 1, hop, 0)
    if final_op == "relu":
        out_ref[...] = jnp.maximum(out_ref[...], 0)


def _ring_all_gather_kernel(x_ref, out_ref, send_sem, recv_sem, ack_sem,
                            *, axis_name: str):
    """Ring all-gather: chip r starts with shard r in slot r of the output
    and forwards the chunk received last hop — the TPU twin of the
    reference's DSM all-gather broadcast (`dsm.cuh:31-79`, there each CTA
    `mapa`s its slice into every peer; a ring uses the same total bytes
    without N× fan-out contention).

    The ack handshake (signal leftward after each completed hop) bounds
    ring skew to one hop, so a fast sender can never write into a slot its
    receiver's in-flight send is still reading."""
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    dst = jax.lax.rem(my + 1, n)
    left = jax.lax.rem(my - 1 + n, n)
    chunk = x_ref.shape[0]

    out_ref[pl.ds(my * chunk, chunk)] = x_ref[...]

    def hop(i, _):
        @pl.when(i > 0)
        def _():
            pltpu.semaphore_wait(ack_sem, 1)

        src_origin = jax.lax.rem(my - i + n, n)
        rdma = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[pl.ds(src_origin * chunk, chunk)],
            dst_ref=out_ref.at[pl.ds(src_origin * chunk, chunk)],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id={axis_name: dst},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rdma.start()
        rdma.wait()

        @pl.when(i < n - 2)
        def _():
            pltpu.semaphore_signal(
                ack_sem, inc=1, device_id={axis_name: left},
                device_id_type=pltpu.DeviceIdType.MESH)

        return 0

    jax.lax.fori_loop(0, n - 1, hop, 0)


def _pallas_all_reduce(x, axis_name: str, final_op: Optional[str],
                       interpret=None):
    if interpret is None:
        interpret = _interpret()
    return pl.pallas_call(
        functools.partial(_ring_all_reduce_kernel, axis_name=axis_name,
                          final_op=final_op),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2,) + x.shape, x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=0),
        interpret=interpret,
    )(x)


def _pallas_all_gather(x, axis_name: str, axis_size: int, interpret=None):
    if interpret is None:
        interpret = _interpret()
    out_shape = (x.shape[0] * axis_size,) + x.shape[1:]
    return pl.pallas_call(
        functools.partial(_ring_all_gather_kernel, axis_name=axis_name),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=1),
        interpret=interpret,
    )(x)


def ring_reduce_scratch(buf_ref, recv_ref, send_sem, recv_sem, ack_sem,
                        axis_name: str, first, last):
    """Accumulating ring all-reduce of a VMEM *scratch* buffer, for calling
    INSIDE another Pallas kernel — the device-scope analogue of the
    reference fusing its DSM reduce into the megakernel's pipeline
    (`dsm.cuh:89-169` overlapping hops with GEMV stages).  After the call
    every chip's ``buf_ref`` holds the sum over ``axis_name``.

    The caller embeds this at a phase boundary of a multi-phase kernel; the
    Pallas pipeline keeps streaming the NEXT phase's weight blocks from HBM
    while the N-1 ICI hops fly — the overlap the between-kernel ``psum``
    can never get.

    ``first``/``last`` are traced booleans marking the first/last ring
    invocation within ONE kernel launch.  They drive the cross-invocation
    handshake: hop 0 of every invocation after the first waits TWO acks,
    and the final hop of every invocation except the last signals TWO —
    proving the receiver finished the previous invocation entirely before
    anyone writes its ping-pong slots again (with one ack, a chip one full
    invocation ahead could overwrite the slot its neighbor's final
    accumulate still reads when N is even).  Per invocation each chip waits
    and signals (N-2) + 2 semaphore units, so everything drains to zero at
    kernel exit.  Intra-invocation hops keep the one-hop-skew ack of
    ``_ring_all_reduce_kernel``.

    buf_ref: [*dims] f32 scratch (reduced in place);
    recv_ref: [2, *dims] f32 ping-pong scratch;
    send_sem/recv_sem: DMA semaphores; ack_sem: REGULAR semaphore.
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return
    my = jax.lax.axis_index(axis_name)
    dst = jax.lax.rem(my + 1, n)
    left = jax.lax.rem(my - 1 + n, n)
    first = jnp.asarray(first, jnp.bool_)
    last = jnp.asarray(last, jnp.bool_)

    recv_ref[0] = buf_ref[...]

    def hop(i, _):
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)
        waits = jnp.where(i > 0, 1, jnp.where(first, 0, 2))

        @pl.when(waits >= 1)
        def _():
            pltpu.semaphore_wait(ack_sem, 1)

        @pl.when(waits == 2)
        def _():
            pltpu.semaphore_wait(ack_sem, 1)

        rdma = pltpu.make_async_remote_copy(
            src_ref=recv_ref.at[slot],
            dst_ref=recv_ref.at[nslot],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id={axis_name: dst},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rdma.start()
        rdma.wait()
        buf_ref[...] += recv_ref[nslot]

        sigs = jnp.where(i < n - 2, 1, jnp.where(last, 0, 2))

        @pl.when(sigs >= 1)
        def _():
            pltpu.semaphore_signal(
                ack_sem, inc=1, device_id={axis_name: left},
                device_id_type=pltpu.DeviceIdType.MESH)

        @pl.when(sigs == 2)
        def _():
            pltpu.semaphore_signal(
                ack_sem, inc=1, device_id={axis_name: left},
                device_id_type=pltpu.DeviceIdType.MESH)

        return 0

    jax.lax.fori_loop(0, n - 1, hop, 0)


# --------------------------------------------------------------------------
# Public API (call inside shard_map over the named mesh axis)
# --------------------------------------------------------------------------


def cluster_reduce(x, axis_name: str, stage: Stage = Stage.LINEAR,
                   backend: str = "auto"):
    """All-reduce (sum) over ``axis_name`` — the chip-scope
    `cluster_reduce` (`dsm.cuh:20-25`).  Accumulates in fp32 regardless of
    input dtype (the reference accumulates partials in fp32 registers,
    `kernel.cuh:58-62`).  Stage::FFN fuses a ReLU on the final hop
    (`dsm.cuh:140-153`)."""
    final_op = "relu" if stage == Stage.FFN else None
    dt = x.dtype
    xf = x.astype(jnp.float32)
    if _resolve_backend(backend) == "pallas":
        out = _pallas_all_reduce(xf, axis_name, final_op)
    else:
        out = jax.lax.psum(xf, axis_name)
        if final_op == "relu":
            out = jnp.maximum(out, 0)
    return out.astype(dt)


def cluster_gather(x, axis_name: str, stage: Stage = Stage.QUK_DEEPSEEK,
                   backend: str = "auto"):
    """All-gather over ``axis_name`` along axis 0 (shards concatenated in
    rank order) — the chip-scope `Stage::QUK_DEEPSEEK` gather
    (`dsm.cuh:31-79`)."""
    del stage
    if _resolve_backend(backend) == "pallas":
        return _pallas_all_gather(x, axis_name, jax.lax.axis_size(axis_name))
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
