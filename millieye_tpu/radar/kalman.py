"""9-state constant-velocity Kalman filter for radar clusters.

Replaces the reference's filterpy dependency (tracking.py:95-174) with a
direct numpy implementation of the same model:

  state  x = (px, py, pz, vx, vy, vz, sx, sy, sz)   (u, v, depth order)
  obs    z = (px, py, pz, vz, sx, sy, sz)           (7 observations)

with the reference's covariance tuning: position (x, y) x10, unobservable
velocities/sizes x1000, Q *= .03 (sizes *= .05 further), R = I.
"""
from __future__ import annotations

import numpy as np


class ClusterKalman:
    def __init__(self, center, avg_v, size, dt):
        f = np.eye(9)
        f[0, 3] = f[1, 4] = f[2, 5] = dt
        self.F = f
        h = np.zeros((7, 9))
        for row, col in enumerate((0, 1, 2, 5, 6, 7, 8)):
            h[row, col] = 1.0
        self.H = h

        p = np.eye(9)
        p[0:2, 0:2] *= 10.0
        p[3:5, 3:5] *= 1000.0
        p[6:, 6:] *= 1000.0
        self.P = p
        q = np.eye(9) * 0.03
        q[6:, 6:] *= 0.05
        self.Q = q
        self.R = np.eye(7)

        self.x = np.zeros(9)
        self.x[0:3] = center
        self.x[5] = avg_v
        self.x[6:9] = size

    def predict(self):
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q

    def update(self, center, avg_v, size):
        z = np.concatenate([center, [avg_v], size])
        y = z - self.H @ self.x
        s = self.H @ self.P @ self.H.T + self.R
        k = self.P @ self.H.T @ np.linalg.inv(s)
        self.x = self.x + k @ y
        self.P = (np.eye(9) - k @ self.H) @ self.P

    @property
    def center(self):
        return self.x[0:3].copy()

    @property
    def avg_v(self):
        return float(self.x[5])

    @property
    def size(self):
        return self.x[6:9].copy()
