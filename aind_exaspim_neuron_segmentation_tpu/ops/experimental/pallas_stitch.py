"""EXPERIMENTAL -- not on any production path.

Pallas TPU kernel: fused overlap-blend scatter-accumulate. Compiled-TPU
use is blocked by a Mosaic constraint (HBM DMA slices need provably
128-lane-aligned last-dim offsets, and the blend writes at arbitrary
``start + trim`` offsets); aligned widened-window workarounds cost ~3x
the HBM traffic of XLA's dynamic-update-slice loop, so
:mod:`..stitch` (XLA) is the production path (see BASELINE.md "Pallas
kernel findings"). Kept here, interpreter-validated, as the starting
point for a future aligned variant on full-bandwidth hardware.

Replaces the XLA ``fori_loop`` of paired dynamic_slice /
dynamic_update_slice in :mod:`.stitch` with one kernel that walks the
patch batch on a sequential TPU grid: for each trimmed patch it DMAs the
target accumulator block HBM->VMEM, adds the patch probabilities, and
DMAs the block back -- the read-modify-write stays on-chip and patches
that overlap within a batch remain correct because TPU grid steps
execute in order.

The patch start coordinates ride the scalar-prefetch channel
(``PrefetchScalarGridSpec``) so the DMA addresses are known before each
grid step's body runs. The accumulator is aliased input->output
(``input_output_aliases``), i.e. updated in place.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, acc_ref, probs_ref, out_ref, vm_acc, vm_probs,
            sems, *, trim, channels):
    i = pl.program_id(0)
    z = starts_ref[i, 0] + trim
    y = starts_ref[i, 1] + trim
    x = starts_ref[i, 2] + trim
    cz, cy, cx = vm_acc.shape[1:]

    del acc_ref  # aliased with out_ref; all access goes through out_ref
    # so each grid step observes the previous steps' writes.
    for ch in range(channels):
        load = pltpu.make_async_copy(
            out_ref.at[ch, pl.ds(z, cz), pl.ds(y, cy), pl.ds(x, cx)],
            vm_acc.at[0],
            sems.at[0],
        )
        load_p = pltpu.make_async_copy(
            probs_ref.at[i, ch], vm_probs.at[0], sems.at[1]
        )
        load.start()
        load_p.start()
        load.wait()
        load_p.wait()
        vm_acc[0] = vm_acc[0] + vm_probs[0]
        store = pltpu.make_async_copy(
            vm_acc.at[0],
            out_ref.at[ch, pl.ds(z, cz), pl.ds(y, cy), pl.ds(x, cx)],
            sems.at[2],
        )
        store.start()
        store.wait()


@functools.partial(
    jax.jit,
    donate_argnums=(0,),
    static_argnames=("trim", "interpret"),
)
def pallas_scatter_batch(acc, probs, starts, *, trim, interpret=False):
    """In-place blend of (B, C, c, c, c) trimmed patches into ``acc``.

    Drop-in replacement for :func:`..ops.stitch.scatter_batch`;
    ``interpret=True`` runs the Pallas interpreter (CPU testing).
    """
    batch, channels = probs.shape[0], probs.shape[1]
    core = probs.shape[2:]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.VMEM((1,) + core, jnp.float32),
            pltpu.VMEM((1,) + core, jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    kernel = functools.partial(_kernel, trim=trim, channels=channels)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, acc, probs)
