"""Device (JAX) flow-fitness metrics over fixed-K masked vector sets.

XLA needs static shapes, so the variable-length vector lists of the reference
(fitness_calculator.py) become a fixed-size ``(K, 4)`` array of
``[x, y, dx, dy]`` rows plus a boolean validity mask.  Every function here is
jittable and vmappable over a population axis, and computes the same math as
the host-exact :mod:`.metrics_np` versions (the tests assert equality on
random masked sets).

These power the fully-fused on-device fitness path; the default scoring path
pulls the (tiny) vector sets to the host and scores with float64 numpy for
bit-compatible rankings (SURVEY.md §7 "fitness-gate divergence").
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = [
    "plausibility_mask",
    "strength_number",
    "horizontal_symmetry_score",
    "swarm_score",
    "rotation_symmetry_score",
    "score_vectors_jax",
]


def _masked_mean(x, mask, count):
    return jnp.sum(jnp.where(mask, x, 0.0)) / count


def _masked_var(x, mask, count):
    m = _masked_mean(x, mask, count)
    return jnp.sum(jnp.where(mask, (x - m) ** 2, 0.0)) / count


def plausibility_mask(vectors, mask, limit):
    """Validity mask of vectors whose flow norm is <= limit.

    Device analogue of ``plausibility_ratio`` (fitness_calculator.py:18-27);
    returns the refined mask instead of a filtered list.
    """
    norms = jnp.sqrt(vectors[:, 2] ** 2 + vectors[:, 3] ** 2)
    return mask & ~(norms > limit)


def strength_number(vectors, mask, max_norm):
    """Masked version of fitness_calculator.py:32-41 (x-mean only quirk)."""
    count = jnp.maximum(jnp.sum(mask), 1)
    mx = _masked_mean(jnp.abs(vectors[:, 2]), mask, count)
    norms = jnp.sqrt(vectors[:, 2] ** 2 + vectors[:, 3] ** 2)
    var = _masked_var(norms, mask, count)
    return mx / max_norm * (1.0 - jnp.minimum(var, 1.0))


def horizontal_symmetry_score(vectors, mask, limits):
    """Masked version of fitness_calculator.py:81-120 with its quirks.

    Below-middle rows contribute ``[ndx, ndx]`` (the reference's broadcast of
    the 1-element slice), at/above contribute ``[-ndx, ndy]``.  Returns 0
    when no vector falls inside ``limits``.
    """
    middle = int(limits[1] / 2)
    sel = mask & ~((vectors[:, 1] < limits[0]) | (vectors[:, 1] > limits[1]))
    count = jnp.sum(sel)
    safe_count = jnp.maximum(count, 1)
    norm = jnp.sqrt(vectors[:, 2] ** 2 + vectors[:, 3] ** 2)
    norm = jnp.where(norm == 0, 1.0, norm)
    ndx = vectors[:, 2] / norm
    ndy = vectors[:, 3] / norm
    below = vectors[:, 1] < middle
    col_x = jnp.where(below, ndx, -ndx)
    col_y = jnp.where(below, ndx, ndy)
    var_x = _masked_var(col_x, sel, safe_count)
    mean_x = jnp.abs(_masked_mean(col_x, sel, safe_count))
    mean_y = jnp.abs(_masked_mean(col_y, sel, safe_count))
    score = ((1.0 - var_x) + mean_x + (1.0 - mean_y)) / 3.0
    return jnp.where(count == 0, 0.0, score)


def swarm_score(vectors, mask):
    """Masked O(K^2) version of fitness_calculator.py:124-159.

    Keeps the reference's precedence quirk: the "optimal" neighbor angle is
    ``((angle_a + df*pi) % 2) * pi`` (:154).  ``n`` is the number of valid
    vectors; invalid rows contribute nothing to any sum.
    """
    n = jnp.maximum(jnp.sum(mask), 1)
    norms = jnp.sqrt(vectors[:, 2] ** 2 + vectors[:, 3] ** 2)
    norms = jnp.where(norms == 0, 1.0, norms)
    ndx = jnp.clip(vectors[:, 2] / norms, -1.0, 1.0)
    angles = jnp.arccos(ndx)

    dx = vectors[None, :, 0] - vectors[:, None, 0]
    dy = vectors[None, :, 1] - vectors[:, None, 1]
    df = jnp.minimum((dx * dx + dy * dy) / 1.0e4, 1.0)
    close = jnp.where(df < 1.0, 1.0, 0.0)
    pair = mask[:, None] & mask[None, :]

    optimal = jnp.mod(angles[:, None] + df * math.pi, 2.0) * math.pi
    loss = jnp.where(pair, close * jnp.abs(angles[None, :] - optimal), 0.0)
    temp = math.pi - loss.sum(axis=1) / n
    score = jnp.sum(jnp.where(mask, temp / math.pi, 0.0))
    return score / n


def rotation_symmetry_score(vectors, mask, w, h, limits):
    """Masked version of fitness_calculator.py:166-215.

    Drops vectors whose recentered radius is outside ``limits`` or exactly 0,
    rotates each flow so its origin lies on the +x axis, and scores
    ``((1-var_x)^2 + (1-var_y)^2)/2``.  Returns 0 when fewer than 2 survive.
    """
    cx, cy = w / 2.0, h / 2.0
    vcx = vectors[:, 0] - cx
    vcy = vectors[:, 1] - cy
    dist = jnp.sqrt(vcx * vcx + vcy * vcy)
    sel = mask & ~((dist < limits[0]) | (dist > limits[1]) | (dist == 0))
    count = jnp.sum(sel)
    safe_count = jnp.maximum(count, 1)
    safe_dist = jnp.where(dist == 0, 1.0, dist)

    norms = jnp.sqrt(vectors[:, 2] ** 2 + vectors[:, 3] ** 2)
    norms = jnp.where(norms == 0, 1.0, norms)
    fdx = vectors[:, 2] / norms
    fdy = vectors[:, 3] / norms
    x_1 = vcx + fdx
    y_1 = vcy + fdy
    rx_1 = (x_1 * vcx + y_1 * vcy) / safe_dist
    ry_1 = (-x_1 * vcy + y_1 * vcx) / safe_dist
    var_x = _masked_var(rx_1 - dist, sel, safe_count)
    var_y = _masked_var(ry_1, sel, safe_count)
    score = ((1.0 - var_x) ** 2 + (1.0 - var_y) ** 2) / 2.0
    return jnp.where(count < 2, 0.0, score)


def score_vectors_jax(structure, vectors, mask, w, h):
    """Device analogue of the population-loop switch.

    Mirrors generate_illusion.py:564-609: plausibility gate (0.15/0.3/0.4),
    the >24 vector count gate for circles, and the per-structure score
    blends.  ``structure`` must be static (Python int / StructureType) — the
    structure family is fixed for a whole run, so there is no reason to trace
    it.
    """
    from ...structure import StructureType

    structure = StructureType(int(structure))
    if structure == StructureType.Bands:
        good = plausibility_mask(vectors, mask, 0.15)
        count = jnp.sum(good)
        step = h / 4.0
        score = horizontal_symmetry_score(vectors, good, [0, step * 2])
        return jnp.where(count > 0, score, 0.0)
    if structure in (StructureType.Circles, StructureType.CirclesFree):
        max_strength = 0.3
        good = plausibility_mask(vectors, mask, max_strength)
        count = jnp.sum(good)
        score_direction = rotation_symmetry_score(vectors, good, w, h, [0, h / 2.0])
        score_strength = strength_number(vectors, good, max_strength)
        score = 0.7 * score_direction + 0.3 * score_strength
        return jnp.where(count > 24, score, 0.0)
    if structure == StructureType.Free:
        max_strength = 0.4
        good = plausibility_mask(vectors, mask, max_strength)
        count = jnp.sum(good)
        score_strength = strength_number(vectors, good, max_strength)
        score_number = jnp.minimum(count, 15) / 15.0
        score_s = swarm_score(vectors, good)
        score = 0.5 * score_s + 0.1 * score_strength + 0.4 * score_number
        return jnp.where(count > 0, score, 0.0)
    raise ValueError(f"unsupported structure for device scoring: {structure}")
