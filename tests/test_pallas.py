"""Pallas kernel correctness (interpreter mode on the CPU harness)."""

import numpy as np

import jax.numpy as jnp

from aind_exaspim_neuron_segmentation_tpu.ops.experimental.pallas_stitch import (
    pallas_scatter_batch,
)
from aind_exaspim_neuron_segmentation_tpu.ops.stitch import scatter_batch


class TestPallasScatter:
    def test_matches_xla_with_overlaps(self):
        rng = np.random.default_rng(0)
        B, C, c, trim = 4, 3, 8, 2
        acc0 = rng.standard_normal((C, 32, 32, 32)).astype(np.float32)
        probs = rng.standard_normal((B, C, c, c, c)).astype(np.float32)
        # includes a duplicated start: sequential grid-order accumulation
        starts = np.array(
            [[0, 0, 0], [4, 4, 4], [4, 4, 4], [20, 16, 12]], np.int32
        )
        want = scatter_batch(
            jnp.asarray(acc0.copy()), jnp.asarray(probs),
            jnp.asarray(starts), trim=trim,
        )
        got = pallas_scatter_batch(
            jnp.asarray(acc0.copy()), jnp.asarray(probs),
            jnp.asarray(starts), trim=trim, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_untouched_regions_preserved(self):
        rng = np.random.default_rng(1)
        acc0 = rng.standard_normal((1, 16, 16, 16)).astype(np.float32)
        probs = np.ones((1, 1, 4, 4, 4), np.float32)
        starts = np.array([[2, 2, 2]], np.int32)
        got = np.asarray(pallas_scatter_batch(
            jnp.asarray(acc0.copy()), jnp.asarray(probs),
            jnp.asarray(starts), trim=0, interpret=True,
        ))
        np.testing.assert_array_equal(got[0, 10:], acc0[0, 10:])
        np.testing.assert_allclose(
            got[0, 2:6, 2:6, 2:6], acc0[0, 2:6, 2:6, 2:6] + 1.0
        )
