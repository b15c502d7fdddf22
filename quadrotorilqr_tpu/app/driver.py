"""Demo driver — equivalent of the reference application
(/root/reference/src/quadrotor_ilqr.py:256-355): builds the climbing-square
desired trajectory, solves, and renders the 7-panel temporal plots, the
cost-vs-iteration semilog, and the 3D animation, with the same CLI flags
(--show_plots, --plot_iters, --save_anim_path).

Plotting imports are lazy so headless/bench environments never pay for them.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax.numpy as jnp
import numpy as np

from ..api import QuadrotorILQR
from ..io import debug_from_proto, debug_to_proto
from ..solver.options import ConvergenceCriteria, ILQROptions, LineSearchParams
from . import workloads


def quat_to_euler_xyz(quat):
    """wxyz quaternion(s) -> extrinsic xyz Euler angles (for the plots)."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return np.stack([roll, pitch, yaw], axis=-1)


def plot_temporal_trajectories(traj_dict):
    """quadrotor_ilqr.py:109-177."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(7, 1, figsize=(9, 12), sharex=True)
    for label, traj in traj_dict.items():
        t = np.asarray(traj.times)
        trans = np.asarray(traj.states.pose.trans)
        euler = quat_to_euler_xyz(np.asarray(traj.states.pose.quat))
        ctrl = np.asarray(traj.controls)
        for k in range(3):
            ax[k].plot(t, trans[:, k], label=label)
        ax[3].plot(t, np.unwrap(euler[:, 0]), label=label)
        ax[4].plot(t, euler[:, 1], label=label)
        ax[5].plot(t, euler[:, 2], label=label)
        ax[6].plot(t, ctrl, label=label)
    for axis, name in zip(
        ax,
        [
            "x translation [m]",
            "y translation [m]",
            "z translation [m]",
            "roll [rad]",
            "pitch [rad]",
            "yaw [rad]",
            "control",
        ],
    ):
        axis.set_ylabel(name)
        axis.legend()
    fig.align_ylabels()
    ax[-1].set_xlabel("time [s]")
    return fig


def plot_costs(costs):
    """quadrotor_ilqr.py:179-183."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(9, 9))
    ax.semilogy(costs)
    ax.set_xlabel("iteration")
    ax.set_ylabel("cost")
    return fig


# The reference renders a quadrotor mesh asset in the 3D animation
# (quadrotor_ilqr.py:186-253, quad_simple_scaled.stl). We ship our OWN
# procedurally-generated mesh (tools/gen_mesh.py -> assets/quadrotor.stl);
# QILQR_MESH_PATH overrides it (e.g. to point at the reference's STL);
# if neither loads, the animation falls back to a 4-arm glyph.
DEFAULT_MESH_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "quadrotor.stl",
)


def load_stl_mesh(path):
    """Minimal binary-STL reader -> (n_tri, 3, 3) float64 vertex array.

    80-byte header, uint32 triangle count, then 50-byte records of
    (normal f4x3, vertices f4x3x3, attr u2). No external STL dependency.
    """
    import struct

    with open(path, "rb") as f:
        data = f.read()
    n = struct.unpack("<I", data[80:84])[0]
    rec = np.dtype(
        [("normal", "<f4", (3,)), ("verts", "<f4", (3, 3)), ("attr", "<u2")]
    )
    assert rec.itemsize == 50
    tris = np.frombuffer(data, dtype=rec, count=n, offset=84)
    return tris["verts"].astype(np.float64)


def animate_trajectories(traj_dict, plot_3d_key, mesh_path=None):
    """quadrotor_ilqr.py:186-253 — 3D path + animated quadrotor body: the
    reference's STL mesh when the asset is available (rigidly transformed
    per frame), a 4-arm glyph otherwise."""
    import os

    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    from ..lie import so3

    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(projection="3d")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    for label, traj in traj_dict.items():
        trans = np.asarray(traj.states.pose.trans)
        ax.plot3D(trans[:, 0], trans[:, 1], trans[:, 2], label=label)

    target = traj_dict[plot_3d_key]
    quat = np.asarray(target.states.pose.quat)
    trans = np.asarray(target.states.pose.trans)

    if mesh_path is None:
        mesh_path = os.environ.get("QILQR_MESH_PATH", DEFAULT_MESH_PATH)
    mesh = None
    if mesh_path and os.path.exists(mesh_path):
        try:
            mesh = load_stl_mesh(mesh_path)
        except Exception:
            mesh = None

    if mesh is not None:
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        coll = Poly3DCollection(
            np.zeros((0, 3, 3)), facecolor="dimgray", edgecolor="none"
        )
        ax.add_collection3d(coll)

        def update(i):
            r = np.asarray(so3.quat_to_matrix(jnp.asarray(quat[i])))
            verts = mesh @ r.T + trans[i]
            coll.set_verts(verts)
            return [coll]

    else:
        # fallback glyph: 4 arms along +-x, +-y in body frame
        arms = np.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0]], dtype=np.float64
        )
        lines = [ax.plot3D([], [], [], "k-", lw=2)[0] for _ in range(4)]

        def update(i):
            r = np.asarray(so3.quat_to_matrix(jnp.asarray(quat[i])))
            for j, line in enumerate(lines):
                tip = trans[i] + r @ arms[j]
                line.set_data([trans[i, 0], tip[0]], [trans[i, 1], tip[1]])
                line.set_3d_properties([trans[i, 2], tip[2]])
            return lines

    ax.legend(bbox_to_anchor=(1.5, 0.5), loc="center right", ncol=2)
    fig.tight_layout()
    return animation.FuncAnimation(
        fig, update, frames=quat.shape[0], blit=False
    )


def main(show_plots: bool = True, plot_iters: bool = False, save_anim_path: str | None = None):
    """quadrotor_ilqr.py:256-323 equivalent."""
    dt_s = 0.1
    desired_traj = workloads.demo_desired_trajectory(dt_s=dt_s)
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 100),
        convergence_criteria=ConvergenceCriteria(1e-12, 1e-12, 100),
        populate_debug=True,
    )
    q, r = workloads.demo_weights()
    ilqr = QuadrotorILQR(
        mass_kg=1.0,
        inertia=np.eye(3),
        arm_length_m=1.0,
        torque_to_thrust_ratio_m=0.0,
        g_mpss=9.81,
        Q=q,
        R=r,
        desired_traj=desired_traj,
        dt_s=dt_s,
        options=options,
    )
    # solve once natively, then cross the proto boundary for the outputs
    # (the reference binding's round trip, without re-running the solve)
    result = ilqr.solve_pytree(desired_traj)
    debug_proto = debug_to_proto(result.debug)

    debug_trajs, costs = debug_from_proto(debug_proto)
    traj_dict = {"desired": desired_traj, "optimized": result.trajectory}
    if plot_iters:
        for i, traj in enumerate(debug_trajs):
            traj_dict[f"iter {i}"] = traj

    print(
        f"solved: cost={float(result.cost):.6e} iterations={int(result.iterations)} "
        f"status={int(result.status)} horizon={desired_traj.horizon}"
    )

    if show_plots:
        import matplotlib.pyplot as plt

        plot_temporal_trajectories(traj_dict)
        plot_costs(costs)
        anim = animate_trajectories(traj_dict, plot_3d_key="optimized")
        if save_anim_path:
            print(f"Saving animation to {save_anim_path}...", end=" ", flush=True)
            anim.save(save_anim_path, writer="pillow", fps=int(1 / dt_s))
            print("Done!")
        plt.show()
    return result


def parse_args(args):
    """quadrotor_ilqr.py:326-349."""
    parser = argparse.ArgumentParser(
        description="Run the TPU-native Quadrotor iLQR Trajectory Generator."
    )
    parser.add_argument(
        "--show_plots",
        action="store_true",
        help="Show the plots after generating the trajectory",
    )
    parser.add_argument(
        "--plot_iters",
        action="store_true",
        help="Plot the intermediate trajectories generated during optimization.",
    )
    parser.add_argument(
        "--save_anim_path",
        type=str,
        default=None,
        help="Path to save the result animation (requires --show_plots).",
    )
    return parser.parse_args(args)


def cli():
    """Console entry point (pyproject `quadrotor-ilqr`).

    Self-configures float64 (the reference demo solves at rtol=atol=1e-12,
    quadrotor_ilqr.py:272-284 — unreachable in float32, where the demo
    stalls with a line-search failure around 1 f32 ulp of the cost).
    Library callers (tests, notebooks) configure JAX themselves."""
    import jax

    jax.config.update("jax_enable_x64", True)
    parsed = parse_args(sys.argv[1:])
    main(parsed.show_plots, parsed.plot_iters, parsed.save_anim_path)


if __name__ == "__main__":
    cli()
