"""Cell-graph adjacency tests: vectorized builder vs a direct per-pair
oracle implementing the reference predicates, plus sanity layouts."""

import numpy as np
import pytest

from msau_tpu.data.cellgraph import Cell, build_adjacency, get_list_cells, neighbor_lists


def overlap(a1, s1, a2, s2):
    return max(min(a1 + s1, a2 + s2) - max(a1, a2), 0.0)


def oracle_adjacency(boxes):
    """Straight per-pair translation of the reference heuristics
    (graph_building_utils.py:133-192, :279-398)."""
    n = len(boxes)
    adj = np.zeros((n, n, 6), np.uint8)
    x, y, w, h = np.asarray(boxes, float).T
    x2, y2 = x + w, y + h

    def h_ov(i, j):
        return overlap(y[i], h[i], y[j], h[j])

    def v_ov(i, j):
        return overlap(x[i], w[i], x[j], w[j])

    # rights
    for i in range(n):
        collide = [
            j for j in range(n)
            if j != i and x[j] >= x[i] and h_ov(i, j) > 0
            and h_ov(i, j) > 0.3 * min(h[i], h[j])
        ]
        for j in collide:
            # is_left_of(i, j, collide)
            if h_ov(i, j) > 0.9 * min(h[i], h[j]) and x[j] - x[i] < 0.1 * min(w[i], w[j]):
                adj[i, j, 1] = 1
                adj[j, i, 0] = 1
                continue
            blockers = [
                k for k in collide
                if h_ov(i, k) > 0
                and x2[k] < x[j] + 0.1 * w[j]
                and x[k] >= x[i] + 0.8 * w[i]
                and h_ov(i, k) > min(h[i], h[k]) / 5
                and (h_ov(k, j) > h[j] / 2 or h_ov(i, k) > 0.8 * min(h[k], h[i]))
            ]
            if not blockers:
                adj[i, j, 1] = 1
                adj[j, i, 0] = 1

    # bottoms
    for i in range(n):
        collide = [
            j for j in range(n)
            if j != i and y[j] > y2[i] and v_ov(i, j) > 0
        ]
        for j in collide:
            if v_ov(i, j) < min(w[i], w[j]) / 5:
                continue
            blockers = [
                k for k in collide
                if v_ov(i, k) > 0
                and y2[k] < y[j] + 0.1 * h[j]
                and y[k] >= y[i] + 0.8 * h[i]
                and v_ov(i, k) > min(w[i], w[k]) / 5
                and (v_ov(k, j) > w[j] / 2 or v_ov(i, k) > 0.8 * min(w[i], w[k]))
            ]
            if not blockers:
                adj[i, j, 3] = 1
                adj[j, i, 2] = 1

    # containment
    area = w * h
    for i in range(n):
        for j in range(n):
            if i == j or area[j] < area[i]:
                continue
            contains = (
                y[i] >= y[j] - 0.1 * h[j] and x2[j] > x2[i] and y2[j] > y2[i]
            )
            almost = (
                y[i] >= y[j] - 0.2 * h[j]
                and v_ov(i, j) * h_ov(i, j) > 0.8 * w[i] * h[i]
            )
            if contains or almost:
                adj[i, j, 4] = 1
                adj[j, i, 5] = 1
    return adj


class TestAdjacency:
    def test_matches_oracle_random(self, rng):
        boxes = np.stack(
            [
                rng.uniform(0, 400, 40),
                rng.uniform(0, 500, 40),
                rng.uniform(10, 120, 40),
                rng.uniform(8, 24, 40),
            ],
            -1,
        )
        got = build_adjacency(boxes, chunk=7)
        want = oracle_adjacency(boxes)
        np.testing.assert_array_equal(got, want)

    def test_simple_row(self):
        # three cells left-to-right on one line: direct neighbors only
        boxes = np.array([[0, 0, 30, 10], [50, 0, 30, 10], [100, 0, 30, 10]], float)
        adj = build_adjacency(boxes)
        assert adj[0, 1, 1] == 1        # 0 -> right -> 1
        assert adj[1, 2, 1] == 1
        assert adj[0, 2, 1] == 0        # blocked by middle cell
        assert adj[1, 0, 0] == 1

    def test_column(self):
        boxes = np.array([[0, 0, 30, 10], [0, 30, 30, 10], [0, 60, 30, 10]], float)
        adj = build_adjacency(boxes)
        assert adj[0, 1, 3] == 1
        assert adj[1, 2, 3] == 1
        assert adj[0, 2, 3] == 0        # blocked

    def test_containment(self):
        boxes = np.array([[0, 0, 100, 100], [10, 10, 20, 10]], float)
        adj = build_adjacency(boxes)
        assert adj[1, 0, 4] == 1        # big box is parent of small
        assert adj[0, 1, 5] == 1

    def test_cells_api(self):
        cells = get_list_cells([[0, 0, 10, 5]], ["hi"])
        assert cells[0].ocr_value == "hi"
        nl = neighbor_lists(build_adjacency(np.array([[0, 0, 10, 5], [20, 0, 10, 5]], float)))
        assert nl[0]["rights"] == [1]
