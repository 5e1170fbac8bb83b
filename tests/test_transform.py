"""Tests mirroring the reference's transform tests
(ref: cartographer/transform/rigid_transform_test.cc, transform_test.cc,
timestamped_transform_test.cc, transform_interpolation_buffer_test.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hectorgrapher_tpu.transform import (
    Rigid2,
    Rigid3,
    TransformInterpolationBuffer,
    apply2,
    apply_single,
    compose,
    compose2,
    inverse,
    inverse2,
    interpolate,
    matrix_to_quat,
    quat_angle,
    quat_from_axis_angle,
    quat_from_yaw,
    quat_multiply,
    quat_rotate,
    quat_slerp,
    quat_to_axis_angle,
    quat_to_matrix,
    quat_yaw,
)


def random_quat(rng):
    q = rng.normal(size=4)
    return jnp.asarray(q / np.linalg.norm(q))


def random_rigid3(rng):
    return Rigid3(translation=jnp.asarray(rng.normal(size=3)), rotation=random_quat(rng))


class TestQuaternions:
    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            q = random_quat(rng)
            v = jnp.asarray(rng.normal(size=3))
            np.testing.assert_allclose(quat_rotate(q, v), quat_to_matrix(q) @ v, atol=1e-6)

    def test_multiply_consistent_with_rotation_composition(self):
        rng = np.random.default_rng(1)
        a, b = random_quat(rng), random_quat(rng)
        v = jnp.asarray(rng.normal(size=3))
        np.testing.assert_allclose(
            quat_rotate(quat_multiply(a, b), v), quat_rotate(a, quat_rotate(b, v)), atol=1e-6
        )

    def test_axis_angle_round_trip(self):
        rng = np.random.default_rng(2)
        for scale in [1e-8, 1e-4, 0.1, 1.0, 3.0]:
            aa = jnp.asarray(rng.normal(size=3))
            aa = aa / jnp.linalg.norm(aa) * scale
            np.testing.assert_allclose(quat_to_axis_angle(quat_from_axis_angle(aa)), aa, atol=1e-6)

    def test_matrix_round_trip(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            q = random_quat(rng)
            q2 = matrix_to_quat(quat_to_matrix(q))
            # q and -q are the same rotation
            assert min(float(jnp.linalg.norm(q - q2)), float(jnp.linalg.norm(q + q2))) < 1e-6

    def test_yaw(self):
        np.testing.assert_allclose(quat_yaw(quat_from_yaw(0.7)), 0.7, atol=1e-7)
        np.testing.assert_allclose(quat_angle(quat_from_yaw(-0.3)), 0.3, atol=1e-7)

    def test_slerp_endpoints_and_midpoint(self):
        qa = quat_from_yaw(0.0)
        qb = quat_from_yaw(1.0)
        np.testing.assert_allclose(quat_slerp(qa, qb, 0.0), qa, atol=1e-7)
        np.testing.assert_allclose(np.abs(np.sum(np.asarray(quat_slerp(qa, qb, 1.0)) * np.asarray(qb))), 1.0, atol=1e-7)
        np.testing.assert_allclose(quat_yaw(quat_slerp(qa, qb, 0.5)), 0.5, atol=1e-6)


class TestRigid3:
    def test_compose_inverse_is_identity(self):
        rng = np.random.default_rng(4)
        p = random_rigid3(rng)
        ident = compose(p, inverse(p))
        np.testing.assert_allclose(ident.translation, np.zeros(3), atol=1e-6)
        np.testing.assert_allclose(np.abs(ident.rotation[0]), 1.0, atol=1e-6)

    def test_apply_matches_compose(self):
        rng = np.random.default_rng(5)
        a, b = random_rigid3(rng), random_rigid3(rng)
        pts = jnp.asarray(rng.normal(size=(7, 3)))
        np.testing.assert_allclose(
            apply_single(compose(a, b), pts),
            apply_single(a, apply_single(b, pts)),
            atol=1e-6,
        )

    def test_interpolate(self):
        a = Rigid3.from_translation(jnp.array([0.0, 0.0, 0.0]))
        b = Rigid3(translation=jnp.array([2.0, 0.0, 0.0]), rotation=quat_from_yaw(1.0))
        mid = interpolate(a, b, 0.5)
        np.testing.assert_allclose(mid.translation, [1.0, 0.0, 0.0], atol=1e-7)
        np.testing.assert_allclose(quat_yaw(mid.rotation), 0.5, atol=1e-6)


class TestRigid2:
    def test_compose_inverse(self):
        p = Rigid2(translation=jnp.array([1.0, 2.0]), angle=jnp.asarray(0.7))
        ident = compose2(p, inverse2(p))
        np.testing.assert_allclose(ident.translation, np.zeros(2), atol=1e-7)
        np.testing.assert_allclose(ident.angle, 0.0, atol=1e-7)

    def test_apply(self):
        p = Rigid2(translation=jnp.array([1.0, 0.0]), angle=jnp.asarray(np.pi / 2))
        pts = jnp.array([[1.0, 0.0]])
        np.testing.assert_allclose(apply2(p, pts), [[1.0, 1.0]], atol=1e-7)


class TestInterpolationBuffer:
    def test_lookup_interpolates(self):
        buf = TransformInterpolationBuffer()
        buf.push(0.0, Rigid3.from_translation(jnp.array([0.0, 0.0, 0.0])))
        buf.push(1.0, Rigid3.from_translation(jnp.array([2.0, 0.0, 0.0])))
        assert buf.has(0.5)
        np.testing.assert_allclose(buf.lookup(0.5).translation, [1.0, 0.0, 0.0], atol=1e-7)

    def test_size_limit(self):
        buf = TransformInterpolationBuffer(buffer_size_limit=2)
        for i in range(5):
            buf.push(float(i), Rigid3.from_translation(jnp.array([float(i), 0.0, 0.0])))
        assert len(buf) == 2
        assert buf.earliest_time == 3.0

    def test_lookup_until_delta_translation(self):
        buf = TransformInterpolationBuffer()
        for i in range(10):
            buf.push(i * 0.1, Rigid3.from_translation(jnp.array([i * 0.05, 0.0, 0.0])))
        t = buf.lookup_until_delta(0.0, max_delta_translation=0.12, max_delta_rotation=10.0,
                                   min_delta_time=0.0, max_delta_time=5.0)
        assert t == pytest.approx(0.3)

    def test_lookup_until_delta_max_time(self):
        buf = TransformInterpolationBuffer()
        for i in range(10):
            buf.push(i * 0.1, Rigid3.identity())
        t = buf.lookup_until_delta(0.0, 100.0, 100.0, min_delta_time=0.0, max_delta_time=0.25)
        assert t == pytest.approx(0.25)
