"""Generic LM solver: convergence, freezing, and Ceres-style termination
(ref: the reference drives every optimization through ceres::Solver with
max_num_iterations + default function_tolerance 1e-6)."""

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.solvers.gauss_newton import (
    levenberg_marquardt,
    retract_euclidean,
)


def _rosenbrock_residual(x):
    return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])


class TestLevenbergMarquardt:
    def test_converges(self):
        x0 = jnp.array([-1.2, 1.0], jnp.float32)
        result = levenberg_marquardt(
            _rosenbrock_residual, x0, retract_euclidean, tangent_dim=2,
            num_iterations=200,
        )
        np.testing.assert_allclose(np.asarray(result.x), [1.0, 1.0], atol=1e-3)
        assert float(result.final_cost) < 1e-8

    def test_stops_early_at_nonzero_optimum(self):
        # Inconsistent linear system: the optimum cost is bounded away from
        # zero, so the relative-decrease test (Ceres function_tolerance)
        # fires once steps stop improving meaningfully. (Zero-residual
        # problems keep halving the cost forever and run to the cap —
        # same as Ceres, which then relies on its other tolerances.)
        def residual(x):
            return jnp.stack([x[0] - 1.0, x[1] - 2.0, x[0] + x[1] - 3.5])

        x0 = jnp.zeros(2, jnp.float32)
        result = levenberg_marquardt(
            residual, x0, retract_euclidean, tangent_dim=2, num_iterations=200
        )
        np.testing.assert_allclose(
            np.asarray(result.x), [1.1667, 2.1667], atol=1e-3
        )
        assert int(result.num_iterations) < 50

    def test_zero_tolerance_runs_full_count(self):
        x0 = jnp.array([-1.2, 1.0], jnp.float32)
        result = levenberg_marquardt(
            _rosenbrock_residual, x0, retract_euclidean, tangent_dim=2,
            num_iterations=30, function_tolerance=0.0, parameter_tolerance=0.0,
        )
        assert int(result.num_iterations) == 30

    def test_fixed_mask_freezes_coordinates(self):
        x0 = jnp.array([-1.2, 1.0], jnp.float32)
        result = levenberg_marquardt(
            _rosenbrock_residual, x0, retract_euclidean, tangent_dim=2,
            num_iterations=100, fixed_mask=jnp.array([True, False]),
        )
        np.testing.assert_allclose(float(result.x[0]), -1.2, atol=1e-6)
        # y converges to the conditional optimum y = x0^2.
        np.testing.assert_allclose(float(result.x[1]), 1.44, atol=1e-3)
