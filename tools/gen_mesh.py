"""Generate the package's quadrotor mesh asset (original, procedural).

The reference ships a hand-modeled STL (quad_simple_scaled.stl, rendered by
quadrotor_ilqr.py:186-253). Our asset is generated from primitives instead
— a rectangular body, four diagonal arms, and four rotor disks — so the
repo carries no copied binary content and the mesh is reproducible:

    python tools/gen_mesh.py  # rewrites quadrotorilqr_tpu/assets/quadrotor.stl

Binary STL, little-endian: 80-byte header, uint32 triangle count, then per
triangle (normal f4x3, vertices f4x3x3, attr u2).
"""

from __future__ import annotations

import os
import struct

import numpy as np


def _box(center, half):
    """12 triangles of an axis-aligned box."""
    cx, cy, cz = center
    hx, hy, hz = half
    v = np.array(
        [
            [cx - hx, cy - hy, cz - hz],
            [cx + hx, cy - hy, cz - hz],
            [cx + hx, cy + hy, cz - hz],
            [cx - hx, cy + hy, cz - hz],
            [cx - hx, cy - hy, cz + hz],
            [cx + hx, cy - hy, cz + hz],
            [cx + hx, cy + hy, cz + hz],
            [cx - hx, cy + hy, cz + hz],
        ]
    )
    faces = [
        (0, 2, 1), (0, 3, 2),  # bottom
        (4, 5, 6), (4, 6, 7),  # top
        (0, 1, 5), (0, 5, 4),  # -y
        (2, 3, 7), (2, 7, 6),  # +y
        (1, 2, 6), (1, 6, 5),  # +x
        (3, 0, 4), (3, 4, 7),  # -x
    ]
    return [v[list(f)] for f in faces]


def _rot_z(deg):
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _disk(center, radius, thickness, segments=16):
    """Thin cylinder (rotor): top/bottom fans + side wall."""
    cx, cy, cz = center
    ang = np.linspace(0.0, 2.0 * np.pi, segments, endpoint=False)
    lo, hi = cz - thickness / 2.0, cz + thickness / 2.0
    ring = np.stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)], 1)
    tris = []
    for i in range(segments):
        j = (i + 1) % segments
        a, b = ring[i], ring[j]
        tris.append(np.array([[cx, cy, hi], [*a, hi], [*b, hi]]))
        tris.append(np.array([[cx, cy, lo], [*b, lo], [*a, lo]]))
        tris.append(np.array([[*a, lo], [*b, lo], [*b, hi]]))
        tris.append(np.array([[*a, lo], [*b, hi], [*a, hi]]))
    return tris


def build_quadrotor(arm_length=1.0):
    """Triangle soup for a + -configuration quadrotor (arms along ±x, ±y,
    matching the moment-arm matrix convention, quadrotor_model.cc:15-18)."""
    L = arm_length
    tris = []
    tris += _box((0.0, 0.0, 0.0), (0.22 * L, 0.22 * L, 0.09 * L))  # body
    for deg in (0.0, 90.0, 180.0, 270.0):
        r = _rot_z(deg)
        arm = _box((0.5 * L, 0.0, 0.0), (0.5 * L, 0.035 * L, 0.02 * L))
        tris += [t @ r.T for t in arm]
        tris += [
            t @ r.T
            for t in _disk((L, 0.0, 0.05 * L), 0.28 * L, 0.02 * L)
        ]
    return np.asarray(tris)


def write_stl(path, tris, name=b"quadrotorilqr_tpu procedural quadrotor"):
    tris = np.asarray(tris, np.float64)
    with open(path, "wb") as f:
        f.write(name.ljust(80, b"\0")[:80])
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            n = np.cross(t[1] - t[0], t[2] - t[0])
            norm = np.linalg.norm(n)
            n = n / norm if norm > 0 else n
            f.write(struct.pack("<3f", *n))
            for v in t:
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))


if __name__ == "__main__":
    out = os.path.join(
        os.path.dirname(__file__), "..", "quadrotorilqr_tpu", "assets",
        "quadrotor.stl",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tris = build_quadrotor()
    write_stl(out, tris)
    print(f"wrote {out}: {len(tris)} triangles")
