"""Independent, loop-based oracles for the fitness metrics.

These transcribe the reference math (fitness_calculator.py) as plain
per-vector Python loops — deliberately a different style from the vectorized
implementations under test — so the unit tests have genuine redundancy.
"""

import math

import numpy as np


def plausibility_oracle(vectors, limit):
    kept = []
    for v in vectors:
        if math.sqrt(v[2] * v[2] + v[3] * v[3]) > limit:
            continue
        kept.append(list(v))
    return len(kept) / len(vectors), kept


def strength_oracle(vectors, max_norm):
    v = np.asarray(vectors, dtype=float)
    mx = np.mean(abs(v[:, 2]))
    norms = np.sqrt(v[:, 2] * v[:, 2] + v[:, 3] * v[:, 3])
    var = np.var(norms)
    return mx / max_norm * (1 - min(var, 1))


def horizontal_symmetry_oracle(vectors, limits):
    middle = int(limits[1] / 2)
    mirrored = np.zeros((len(vectors), 2))
    count = 0
    for v in vectors:
        v = np.asarray(v, dtype=float)
        if (v[1] < limits[0]) or (v[1] > limits[1]):
            continue
        normalized = v / np.sqrt(v[2] * v[2] + v[3] * v[3])
        if v[1] < middle:
            mirrored[count] = normalized[2:3]  # numpy broadcasts into both cols
        else:
            mirrored[count] = [-normalized[2], normalized[3]]
        count += 1
    if count == 0:
        return 0
    mirrored = mirrored[:count, :]
    var_x = np.var(mirrored[:, 0])
    mean_x = abs(np.mean(mirrored[:, 0]))
    mean_y = abs(np.mean(mirrored[:, 1]))
    return ((1 - var_x) + mean_x + (1 - mean_y)) / 3


def swarm_oracle(vectors):
    max_distance = 100
    score = 0
    n = len(vectors)
    norm_vectors = np.array(vectors, dtype=float)
    norms = np.sqrt(norm_vectors[:, 2] ** 2 + norm_vectors[:, 3] ** 2)
    norm_vectors[:, 2] = norm_vectors[:, 2] / norms
    norm_vectors[:, 3] = norm_vectors[:, 3] / norms
    angles = np.arccos(norm_vectors[:, 2])
    for v_a in norm_vectors:
        x = norm_vectors[:, 0] - v_a[0]
        y = norm_vectors[:, 1] - v_a[1]
        distances = np.multiply(x, x) + np.multiply(y, y)
        distance_factors = distances / (max_distance * max_distance)
        distance_factors = np.where(distance_factors > 1, 1, distance_factors)
        close = 1 - np.where(distance_factors < 1, 0, distance_factors)
        v_angle = math.acos(v_a[2])
        optimal = (v_angle + distance_factors * math.pi) % 2 * math.pi
        loss = close * abs(angles - optimal)
        temp = math.pi - (sum(loss) / n)
        score = score + (temp / math.pi)
    return score / n


def rotation_symmetry_oracle(vectors, w, h, limits):
    rotated = np.zeros((len(vectors), 4))
    dists = np.zeros((len(vectors)))
    count = 0
    center = [w / 2, h / 2]
    for v in vectors:
        vc = [v[0] - center[0], v[1] - center[1]]
        distance = np.sqrt(vc[0] * vc[0] + vc[1] * vc[1])
        if limits is not None:
            if (distance < limits[0]) or (distance > limits[1]) or distance == 0:
                continue
        rotated[count] = [vc[0], vc[1], v[2], v[3]]
        dists[count] = distance
        count += 1
    if count < 2:
        return 0
    rotated = rotated[:count, :]
    dists = dists[:count]
    norms = np.sqrt(rotated[:, 2] ** 2 + rotated[:, 3] ** 2)
    rotated[:, 2] = rotated[:, 2] / norms
    rotated[:, 3] = rotated[:, 3] / norms
    x_1 = rotated[:, 0] + rotated[:, 2]
    y_1 = rotated[:, 1] + rotated[:, 3]
    rx_1 = (x_1 * rotated[:, 0] + y_1 * rotated[:, 1]) / dists
    ry_1 = (-x_1 * rotated[:, 1] + y_1 * rotated[:, 0]) / dists
    r_v = np.array([rx_1 - dists, ry_1]).transpose()
    var_x = np.var(r_v[:, 0])
    var_y = np.var(r_v[:, 1])
    return ((1 - var_x) * (1 - var_x) + (1 - var_y) * (1 - var_y)) / 2


def inside_outside_oracle(vectors, width, height):
    step = width / 5
    w = int(width / step) + 1
    h = int(height / step) + 1
    flow_array = np.zeros((w, h, 2))
    count_array = np.ones((w, h))
    agreement_array = np.zeros((w, h, 2))
    norm_sum_array = np.zeros((w, h))
    for v in vectors:
        i = int(v[0] / step)
        j = int(v[1] / step)
        flow_array[i, j, 0] += v[2]
        flow_array[i, j, 1] += v[3]
        count_array[i, j] += 1
        norm_sum_array[i, j] += np.sqrt(v[2] * v[2] + v[3] * v[3])
    flow_array[:, :, 0] = flow_array[:, :, 0] / count_array
    flow_array[:, :, 1] = flow_array[:, :, 1] / count_array
    norm_sum_array = norm_sum_array / count_array
    for v in vectors:
        i = int(v[0] / step)
        j = int(v[1] / step)
        agreement_array[i, j, 0] += (flow_array[i, j, 0] - v[2]) ** 2
        agreement_array[i, j, 1] += (flow_array[i, j, 1] - v[3]) ** 2
    agreement_array[:, :, 0] = agreement_array[:, :, 0] / count_array
    agreement_array[:, :, 1] = agreement_array[:, :, 1] / count_array
    score_agreement = -(min(np.mean(agreement_array), 10))
    score_size = min(10, np.mean(norm_sum_array))
    sum_d = 0
    for i in range(0, w):
        for j in range(0, h):
            vx = flow_array[i, j, 0]
            vy = flow_array[i, j, 1]
            if vx != 0 or vy != 0:
                norm_v = np.sqrt(vx * vx + vy * vy)
                vx, vy = vx / norm_v, vy / norm_v
            min_i, max_i = max(0, i - 1), min(w, i + 1)
            min_j, max_j = max(0, j - 1), min(h, i + 1)
            plus = minus = 0
            for x in range(min_i, max_i):
                for y in range(min_j, max_j):
                    if i == x and j == y:
                        continue
                    wx = flow_array[x, y, 0]
                    wy = flow_array[x, y, 1]
                    if wx != 0 or wy != 0:
                        norm_w = np.sqrt(wx * wx + wy * wy)
                        wx, wy = wx / norm_w, wy / norm_w
                        if vx * wx + vy * wy > 0:
                            plus += 1
                        else:
                            minus += 1
            sum_d += (min(2, plus) + min(2, minus)) / 4
    sum_d = sum_d / (w * h) * 10
    return (score_agreement + score_size + sum_d) / 30
