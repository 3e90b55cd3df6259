"""Serving export round-trip: StableHLO artifact == live predict.

Covers utils/serving.py: the exported FTN+STN predictor (params baked in,
symbolic batch dim) deserializes in a fresh call path and reproduces the
live ``CooperativeTripletSolver.predict`` numerics at multiple batch sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (
    CooperativeTripletSolver,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.serving import (
    export_predictor,
    load_predictor,
)

HW = (64, 64)


@pytest.fixture(scope="module")
def solver_state():
    solver = CooperativeTripletSolver(network_type="FCN_16_standard",
                                      image_ch=1, num_classes=4, input_hw=HW)
    state = solver.init_state(jax.random.PRNGKey(0))
    return solver, state


def test_export_roundtrip_batch_polymorphic(solver_state, tmp_path):
    solver, state = solver_state
    path = export_predictor(solver, state.params, state.batch_stats,
                            str(tmp_path / "predictor"), input_hw=HW,
                            image_ch=1, n_iter=2, softmax=True,
                            platforms=("cpu",))
    assert path.endswith(".stablehlo")
    served = load_predictor(path)
    for batch in (3, 5):  # one artifact, multiple batch sizes
        x = jax.random.uniform(jax.random.PRNGKey(batch), (batch, *HW, 1))
        live = solver.predict(state.params, state.batch_stats, x,
                              n_iter=2, softmax=True)
        out = served(x)
        assert out.shape == (batch, *HW, 4)
        # symbolic-batch lowering picks different fusions/reduction orders
        # than the static-shape jit -> f32 reorder noise through 5 conv stacks
        np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                                   atol=1e-3, rtol=1e-3)
        # probabilities sum to 1
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-4)


def test_export_logits_mode(solver_state, tmp_path):
    solver, state = solver_state
    path = export_predictor(solver, state.params, state.batch_stats,
                            str(tmp_path / "logits.stablehlo"), input_hw=HW,
                            image_ch=1, n_iter=1, softmax=False,
                            platforms=("cpu",))
    served = load_predictor(path)
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, *HW, 1))
    live = solver.predict(state.params, state.batch_stats, x,
                          n_iter=1, softmax=False)
    np.testing.assert_allclose(np.asarray(served(x)), np.asarray(live),
                               atol=5e-3, rtol=1e-3)
