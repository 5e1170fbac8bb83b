"""Math helpers (ref: cartographer/common/math.h:1-86)."""

from __future__ import annotations

import jax.numpy as jnp


def clamp(value, low, high):
    return jnp.clip(value, low, high)


def pow2(a):
    return a * a


def normalize_angle_difference(angle):
    """Wrap angle to (-pi, pi] (ref: common/math.h NormalizeAngleDifference
    — the reference's while-loop form leaves exactly +pi unchanged)."""
    two_pi = 2.0 * jnp.pi
    wrapped = angle - two_pi * jnp.floor((angle + jnp.pi) / two_pi)
    # floor() puts the boundary at -pi; the reference keeps it at +pi.
    return jnp.where(wrapped <= -jnp.pi, wrapped + two_pi, wrapped)


def atan2(y, x):
    return jnp.arctan2(y, x)


def round_to_int(x):
    return jnp.round(x).astype(jnp.int32)


def logit(probability):
    return jnp.log(probability / (1.0 - probability))


def round_up_to_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
